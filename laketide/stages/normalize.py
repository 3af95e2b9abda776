"""Event normalization — the stateless per-batch projection stage.

Reference analogs (semantics, not code):
- parse + validate + drop-if-no-id:
  /root/reference/internal/fetchers/osv/fetcher.go:523-561 (M1)
- NormalizeOSV/GitLab/CVE canonical projection:
  /root/reference/internal/merger/normalizer.go:28-310 (M7-M9)
- content data-hash: /root/reference/internal/merger/normalizer.go:359-372
  (M11) — here sha256 over ``content`` alone, which is the per-row
  invariant the oracle checks (BASELINE.json input_hint).
- malformed tolerance: one bad record never fails the sync
  (/root/reference/internal/fetchers/osv/fetcher.go:481-483, I6) —
  malformed rows are flagged, counted in per-partition metrics, dropped.

Runs as ``map_batches(NormalizeEvents(...), batch_format="pyarrow",
zero_copy_batch=True)`` — pure, stateless, fully vectorized. The sha256
data-hash is NOT computed here: the reduce side hashes per-key winners
only (``apply.ensure_sha``), which is ~(events/keys)x cheaper per epoch
with byte-identical stored state; ``sha256_hex_column`` lives here as
the shared kernel.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from laketide import schema as S
from laketide.stages.partition import assign_partitions

__all__ = ["NormalizeEvents", "sha256_hex_column"]


def sha256_hex_column(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex sha256 per row; null content (tombstones) -> null.

    SHA-256 itself is irreducible per row (the stored value is a tested
    contract), but the loop matters: slicing one shared memoryview at
    python-int offsets is ~3x faster than iterating Arrow scalars
    (each ``chunk[i].as_buffer()`` allocates a Buffer object). This is
    the single hottest kernel on the replay path (M11 data hash)."""
    out: list[str | None] = []
    sha = hashlib.sha256
    if isinstance(content, pa.ChunkedArray):
        chunks = content.chunks
    else:
        chunks = [content]
    for chunk in chunks:
        n = len(chunk)
        if n == 0:
            continue
        if chunk.null_count == n:
            out.extend([None] * n)
            continue
        # large_binary: 64-bit offsets + a data buffer; cast also
        # compacts away any slice offset so buffer math is direct
        arr = chunk.cast(pa.large_binary())
        if arr.offset != 0:
            arr = pa.concat_arrays([arr])  # compact sliced arrays
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1).tolist()
        mv = memoryview(bufs[2])[: offs[-1]]
        if chunk.null_count == 0:
            out.extend(
                sha(mv[s:e]).hexdigest() for s, e in zip(offs[:-1], offs[1:])
            )
        else:
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False).tolist()
            out.extend(
                sha(mv[s:e]).hexdigest() if ok else None
                for s, e, ok in zip(offs[:-1], offs[1:], valid)
            )
    return pa.array(out, pa.string())


class NormalizeEvents:
    """Callable batch transform: validate ops/keys, default missing op to
    'update' (upsert), compute ``content_sha256`` when absent, assign the
    key-hash partition, flag malformed rows."""

    def __init__(self, num_partitions: int, payload_columns: dict[str, pa.DataType]):
        self.num_partitions = num_partitions
        self.payload_columns = dict(payload_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from laketide.stages.apply import limit_arrow_threads

        limit_arrow_threads(1)
        n = batch.num_rows
        target = pa.schema(
            [pa.field(c, S.CORE_TYPES[c]) for c in S.CORE_COLUMNS]
            + [pa.field(c, t) for c, t in self.payload_columns.items()]
            + [pa.field(S.SHA_COLUMN, pa.string())]
        )
        batch = S.conform(batch, target)

        op = pc.fill_null(batch[S.OP_COLUMN], S.DEFAULT_OP)
        valid_op = pc.is_in(op, value_set=pa.array(S.VALID_OPS))

        def _blank(col):
            # CSV-borne missing fields arrive as "" (not null): both are
            # an absent key (M1 drop-if-no-id), never a phantom "" key
            return pc.or_(pc.is_null(col), pc.equal(pc.cast(col, pa.string()), ""))

        missing_key = pc.or_(
            pc.or_(_blank(batch["repo"]), _blank(batch["path"])),
            pc.or_(_blank(batch["commit"]), pc.is_null(batch["seq"])),
        )
        malformed = pc.or_(pc.invert(valid_op), pc.fill_null(missing_key, True))

        # content_sha256 is NOT computed here: the reduce side fills it
        # on the per-key WINNERS only (apply.ensure_sha) — at the bench
        # workload that is ~75x fewer sha256 calls (8.4M events -> 111k
        # winners per epoch), and losers' hashes are never observable
        # (M11's per-row invariant is over STORED state rows). Shas
        # provided by the source pass through untouched.
        batch = batch.set_column(
            batch.column_names.index(S.OP_COLUMN), S.OP_COLUMN, op
        )
        batch = batch.append_column(S.PART_COLUMN, assign_partitions(batch, self.num_partitions))
        batch = batch.append_column(S.MALFORMED_COLUMN, malformed)
        return batch
