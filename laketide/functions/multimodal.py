"""Multimodal (binary-payload) plumbing: opaque ``binary`` columns with
typed metadata, decoded / feature-extracted by actor-pool stages.

The image/audio decode libraries are NOT in this container, so the decode
kernel is STUBBED with a clearly-marked deterministic fake (and a
``NotImplementedError`` path for the real codec); everything Ray-side —
schema, batch sizing, actor signature, output layout — is real and
tested. Payload bytes here come from encoding ``documents.text`` (no
external data).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from laketide.functions.reads import cpu_min_blocks, scrubbed_read

FEATURE_DIM = 16


def _binary_buffers(col: pa.Array) -> tuple[np.ndarray, memoryview]:
    """Zero-copy (value_offsets, data) view of a (non-null) BinaryArray:
    per-row slices come from numpy offset arithmetic + one memoryview,
    never from per-row ``.as_py()`` byte copies."""
    bufs = col.buffers()
    if bufs[1] is None:  # zero-length array: no offsets/data buffers
        return np.zeros(1, dtype=np.int64), memoryview(b"")
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return offs, data


def blob_table(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload: binary, n_bytes) — the opaque-blob
    column layout used for image/audio payloads."""
    ds = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )

    def f(t: pa.Table) -> pa.Table:
        payload = pc.cast(t["text"], pa.binary())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": payload,
                "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def blob_meta(sf_dir: str) -> rd.Dataset:
    """Typed metadata projection of the blob column (SQL-checkable)."""
    return blob_table(sf_dir).select_columns(["doc_id", "n_bytes"])


class StubDecoder:
    """Actor-pool decode/feature-extract stage (model-load-once pattern,
    ST1). ``real_codec=True`` raises NotImplementedError — the marked stub
    for the absent image/audio libraries; the default produces a
    deterministic fake feature vector from the payload bytes so the
    distributed plumbing (batch size, actor signature, list<float> output
    schema) is exercised end-to-end."""

    def __init__(self, real_codec: bool = False, feature_dim: int = FEATURE_DIM):
        if real_codec:
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "run with real_codec=False for the deterministic stub"
            )
        self.feature_dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        # the hash itself is per-payload (no vectorized blake2b exists —
        # STUB: blake2b(payload) bytes -> bounded floats, deterministic),
        # but everything around it is batched: zero-copy buffer views in
        # (no per-row .as_py() byte copies), one uint8->float32 matrix op
        # and an offsets-built list array out — the pattern a real
        # decoder kernel should follow. Null payloads yield NULL feature
        # lists, never a fabricated empty-blob decode.
        import pyarrow.compute as pc

        col = t["payload"].combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        offs, data = _binary_buffers(col)
        fd = self.feature_dim
        digests = b"".join(
            hashlib.blake2b(data[offs[i] : offs[i + 1]], digest_size=fd).digest()
            for i in np.flatnonzero(valid)
        )
        feats = np.frombuffer(digests, dtype=np.uint8).astype(np.float32) / 255.0
        n = len(col)
        off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(valid.astype(np.int32) * fd, out=off[1:])
        off_arr = pa.array(off, pa.int32(), mask=np.concatenate([~valid, [False]]))
        features = pa.ListArray.from_arrays(off_arr, pa.array(feats, pa.float32()))
        return pa.table(
            {"doc_id": t["doc_id"], "n_bytes": t["n_bytes"], "features": features}
        )


def multimodal_decode(sf_dir: str) -> rd.Dataset:
    """Decode pipeline: blob table -> actor-pool StubDecoder -> features.
    Small batch_size on purpose — binary payloads are wide rows."""
    return blob_table(sf_dir).map_batches(
        StubDecoder, batch_format="pyarrow", batch_size=256, concurrency=2
    )


def frame_sample(sf_dir: str, n_frames: int = 4, frame_bytes: int = 32) -> rd.Dataset:
    """Frame-sampling plumbing for video-like payloads: slice each opaque
    blob into ``n_frames`` evenly-spaced fixed-width windows ("frames")
    and emit one row per frame with its sha256 checksum — the real
    decode would replace the slicing kernel; the Ray-side layout (explode
    to per-frame rows, binary slicing, actor-friendly batch shape) is
    what a production video pipeline needs. sha256 (not blake2b) so the
    DuckDB oracle (substring over encode(text) + sha256) can verify the
    exact frames."""
    ds = blob_table(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        # frame offsets are pure arithmetic: one (rows x frames) numpy
        # grid, then each frame hashes from a zero-copy buffer slice
        # (sha256 itself stays per-frame — no vectorized kernel exists)
        import pyarrow.compute as pc

        col = t["payload"].combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        offs, data = _binary_buffers(col)
        n = len(col)
        lens = offs[1:] - offs[:-1]  # (n,)
        fi = np.arange(n_frames, dtype=np.int64)  # (frames,)
        rel = np.where(
            lens[:, None] <= frame_bytes,
            0,
            (fi[None, :] * np.maximum(1, lens - frame_bytes)[:, None])
            // max(1, n_frames - 1),
        )
        starts = (offs[:-1][:, None] + rel).ravel()
        ends = np.minimum(starts + frame_bytes, np.repeat(offs[1:], n_frames))
        row_of = np.repeat(np.arange(n), n_frames)
        # null payload -> the frame rows exist (oracle CROSS JOIN shape)
        # but their sha is NULL (sha256(substring(NULL)) IS NULL)
        checksums = [
            hashlib.sha256(data[s:e]).hexdigest() if valid[row_of[j]] else None
            for j, (s, e) in enumerate(zip(starts, ends))
        ]
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_frames), pa.int64()),
                "frame_idx": pa.array(np.tile(fi, n), pa.int64()),
                "frame_sha": pa.array(checksums, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def blob_resize(
    sf_dir: str, target_bytes: int = 64, hex_output: bool = False
) -> rd.Dataset:
    """Resize plumbing for image-like payloads: deterministically
    down-sample each opaque blob to ``target_bytes`` evenly-spaced bytes
    (the real image resize would replace the sampling kernel; the
    Ray-side layout — binary output column, batch shaping — is real).
    Payloads already at or under ``target_bytes`` pass through unchanged
    (no NUL padding: keeps the kernel exactly expressible in the DuckDB
    oracle, which cannot hold NUL bytes in VARCHAR). ``hex_output``
    emits ``resized_hex: string`` instead of ``resized: binary`` — used
    by the correctness-gate registration because DuckDB BLOBs round-trip
    to unhashable ``bytearray`` in pandas, which breaks the driver's
    sort+hash compare; the bytes are identical either way."""
    if target_bytes < 2:
        raise ValueError("target_bytes must be >= 2 (sampling needs two anchors)")
    ds = blob_table(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        col = t["payload"].combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        offs, data = _binary_buffers(col)
        raw = np.frombuffer(data, dtype=np.uint8)
        pos = np.arange(target_bytes, dtype=np.int64)
        outs = []
        for i in range(len(col)):
            if not valid[i]:
                outs.append(None)  # null blob -> null resize (oracle: NULL)
                continue
            lo, hi = offs[i], offs[i + 1]
            n = hi - lo
            if n <= target_bytes:
                outs.append(bytes(data[lo:hi]))
            else:
                # vectorized byte gather from the shared buffer view
                idx = lo + (pos * (n - 1)) // (target_bytes - 1)
                outs.append(raw[idx].tobytes())
        if hex_output:
            col = {
                "resized_hex": pa.array(
                    [b.hex() if b is not None else None for b in outs], pa.string()
                )
            }
        else:
            col = {"resized": pa.array(outs, pa.binary())}
        return pa.table({"doc_id": t["doc_id"], **col, "orig_bytes": t["n_bytes"]})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


_CHUNK_BYTES = 64


def blob_chunk_dedup(sf_dir: str, chunk_bytes: int = _CHUNK_BYTES) -> pa.Table:
    """Chunk-level blob deduplication (storage-dedup style): split every
    payload into fixed-size chunks, count total vs distinct chunks and
    the resulting dedup ratio. The chunk boundaries come from one
    vectorized offsets grid over the zero-copy buffer view; each chunk's
    sha256 stands in for its bytes through the distinct-count exchange
    (32-byte rows instead of payload bytes — collision-free in
    practice, the same injective-whp argument as the hashed-shingle
    Jaccard kernels). Distinct counting reuses the exact pair-dedup
    coarse-shuffle scheme.

    Reference analog: data-hash computation + dedup short-circuit
    (internal/merger/merger.go:118-133), applied per chunk."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    n_parts = _coarse_n_parts()

    def chunks(t: pa.Table) -> pa.Table:
        payload = t["payload"].combine_chunks()
        valid = payload.filter(pc.is_valid(payload))
        if len(valid) == 0:
            return pa.table(
                {
                    "sha": pa.array([], pa.binary()),
                    "chunk_part": pa.array([], pa.int64()),
                }
            )
        offs, data = _binary_buffers(valid)
        shas = []
        for i in range(len(valid)):
            lo, hi = offs[i], offs[i + 1]
            for c0 in range(lo, hi, chunk_bytes):
                shas.append(hashlib.sha256(data[c0 : min(c0 + chunk_bytes, hi)]).digest())
        sha_arr = pa.array(shas, pa.binary())
        # partition key straight from the digest bytes: one buffer view,
        # every 4th u64 word is a digest's first 8 bytes
        h = np.frombuffer(b"".join(shas), dtype=np.uint64)[::4].copy()
        part = _coarse_parts(h, n_parts=n_parts)
        return pa.table({"sha": sha_arr, "chunk_part": pa.array(part, pa.int64())})

    def count_partial(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["chunk_part"])
        if t.num_rows == 0:
            return pa.table(
                {"total_p": pa.array([], pa.int64()), "distinct_p": pa.array([], pa.int64())}
            )
        uniq = t.group_by(["sha"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "total_p": pa.array([t.num_rows], pa.int64()),
                "distinct_p": pa.array([uniq.num_rows], pa.int64()),
            }
        )

    rows = (
        blob_table(sf_dir)
        .map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("chunk_part")
        .map_groups(count_partial, batch_format="pyarrow")
        .take_all()
    )  # a handful of tiny partial rows
    total = sum(int(r["total_p"]) for r in rows)
    distinct = sum(int(r["distinct_p"]) for r in rows)
    ratio = float(distinct) / float(total) if total else None
    return pa.table(
        {
            "total_chunks": pa.array([total], pa.int64()),
            "distinct_chunks": pa.array([distinct], pa.int64()),
            "distinct_ratio": pa.array([ratio], pa.float64()),
        }
    )
