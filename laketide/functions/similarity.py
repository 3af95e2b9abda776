"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_cosine``: brute-force cosine top-k — the exact baseline. The query
  matrix is broadcast once (ray.put) and each batch does one numpy matmul
  (vectorized, zero Python-per-row).
- ``knn_lsh``: random-hyperplane LSH bucketed ANN — the scale path: only
  buckets colliding with the query are scanned.

Query vectors are derived deterministically (seeded) so results are
reproducible and the DuckDB oracle can embed the same literal vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from laketide.functions.reads import collect_tables

EMBED_DIM = 64
_QUERY_SEED = 123


def query_vector(dim: int = EMBED_DIM, seed: int = _QUERY_SEED) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal(dim)


def query_vector_sql_literal(dim: int = EMBED_DIM, seed: int = _QUERY_SEED) -> str:
    """The same query vector as a DuckDB list literal (float64 repr
    round-trips exactly)."""
    q = query_vector(dim, seed)
    return "[" + ", ".join(repr(float(x)) for x in q) + "]"


def _emb(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    from laketide.functions.reads import cpu_min_blocks, scrubbed_read

    return scrubbed_read(
        f"{sf_dir}/embeddings.parquet", columns=columns, min_blocks=cpu_min_blocks()
    )


def _embed_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — zero-copy
    flatten + reshape (replaces np.stack over to_pandas(), one Python
    object per row). Callers must EXCLUDE null rows first
    (_drop_null_embeddings): a null is not a candidate, and any fill
    value would mis-rank it vs the NULLS-LAST SQL ordering — so nulls
    here raise. Ragged lists violate the embeddings contract and raise
    a clear error instead of an obscure stack failure."""
    import pyarrow.compute as _pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            "null embeddings must be excluded before scoring "
            "(_drop_null_embeddings)"
        )
    n = len(col)
    if n == 0:
        return np.zeros((0, EMBED_DIM), dtype=np.float64)
    lens = _pc.list_value_length(col)
    if _pc.min(lens).as_py() != _pc.max(lens).as_py():
        raise ValueError(
            "embedding lists must be rectangular (one fixed dim); got "
            f"lengths in [{_pc.min(lens).as_py()}, {_pc.max(lens).as_py()}]"
        )
    return (
        _pc.list_flatten(col)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64, copy=False)
        .reshape(n, -1)
    )


def _drop_null_embeddings(t: pa.Table) -> pa.Table:
    """A null embedding is not a similarity candidate: the SQL oracle's
    list_cosine_similarity(NULL, q) is NULL and DESC ordering puts NULLS
    LAST, below even negative scores — so null rows must be EXCLUDED,
    never scored (a zero-fill would rank 0.0 above negative matches)."""
    import pyarrow.compute as _pc

    if "embedding" in t.column_names and t["embedding"].null_count:
        return t.filter(_pc.is_valid(t["embedding"]))
    return t


def _local_topk(ids: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by (score desc, vec_id asc) — the same total order as the
    final merge, so per-batch pruning is exact."""
    if len(ids) > k:
        # kth-largest score as threshold; keep ALL boundary ties so the
        # vec_id tiebreak stays exact, then order and cut
        thresh = np.partition(scores, len(scores) - k)[len(scores) - k]
        cand = np.flatnonzero(scores >= thresh)
        order = np.lexsort((ids[cand], -scores[cand]))[:k]
        sel = cand[order]
    else:
        sel = np.lexsort((ids, -scores))
    return ids[sel], scores[sel]


_EMPTY_SCORED = {
    "vec_id": pa.array([], pa.int64()),
    "score": pa.array([], pa.float64()),
}


def _probe_set(qsig: int, n_planes: int, probe_hamming: int) -> frozenset:
    """Every signature within ``probe_hamming`` bit flips of ``qsig``
    (multi-probe). Shared by the engine AND the SQL-oracle builder so
    neither can silently under-probe the other (the old inline version
    ignored probe_hamming >= 2 in both — identically, so the oracle
    could never catch it)."""
    from itertools import combinations

    probes = {qsig}
    for h in range(1, max(0, probe_hamming) + 1):
        for bits in combinations(range(n_planes), h):
            x = qsig
            for b in bits:
                x ^= 1 << b
            probes.add(x)
    return frozenset(probes)


def _merge_topk(scored: rd.Dataset, k: int) -> pa.Table:
    """Driver merge of the per-batch top-k rows (k x num_blocks rows —
    tiny), replacing a full sort shuffle."""
    from laketide.functions.dedup import _gather_nonempty_blocks

    parts = _gather_nonempty_blocks(scored.materialize())
    t = pa.concat_tables(parts, promote_options="default") if parts else None
    if t is None:
        return pa.table({"vec_id": pa.array([], pa.int64())})
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    scores = t["score"].to_numpy(zero_copy_only=False)
    ids, _ = _local_topk(ids, scores, k)
    return pa.table({"vec_id": pa.array(ids, pa.int64())})


def knn_cosine(sf_dir: str, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k ids for the deterministic query vector.
    Returns ids only (float scores are engine-order-sensitive; the id
    ranking is robust for non-degenerate data)."""
    q = query_vector()
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    # plain task, not an actor pool: the only state is the broadcast
    # query vector (a cheap local object-store read per batch) and a
    # fresh actor pool costs ~1.5s startup per query
    def score(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.table(_EMPTY_SCORED)
        qv = ray.get(q_ref)
        mat = _embed_matrix(t["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        scores = (mat @ qv) / norms
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-batch top-k: only k rows leave each batch — no global
        # sort shuffle for a 10-row answer
        ids, scores = _local_topk(ids, scores, k)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "score": pa.array(scores, pa.float64())}
        )

    scored = _emb(sf_dir, ["vec_id", "embedding"]).map_batches(score, batch_format="pyarrow")
    return _merge_topk(scored, k)


def knn_lsh(sf_dir: str, k: int = 10, n_planes: int = 8, probe_hamming: int = 1) -> pa.Table:
    """LSH-bucketed ANN: random-hyperplane signatures partition vectors
    into 2^n_planes buckets; only buckets within ``probe_hamming`` of the
    query signature are scanned (multi-probe). At scale the bucket id is
    the shuffle/partition key and the probe touches a fraction of data."""
    rng = np.random.RandomState(777)
    planes = rng.standard_normal((n_planes, EMBED_DIM))
    q = query_vector()
    qn = q / np.linalg.norm(q)
    # general bit packing (works for ANY n_planes <= 62, matching the
    # oracle's bit-by-bit signature; packbits[:, 0] silently truncated
    # to the first 8 planes)
    weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
    qsig = int(((planes @ q > 0).astype(np.uint64) * weights).sum())
    state = ray.put((planes, qn, _probe_set(qsig, n_planes, probe_hamming), weights))

    def bucket_score(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.table(_EMPTY_SCORED)
        planes_v, qv, probe_v, w = ray.get(state)
        mat = _embed_matrix(t["embedding"])
        sigs = ((mat @ planes_v.T > 0).astype(np.uint64) * w[None, :]).sum(axis=1)
        mask = np.isin(sigs, list(probe_v))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
        sub = mat[mask]
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0] = 1.0
        scores = (sub @ qv) / norms
        ids = t["vec_id"].to_numpy(zero_copy_only=False)[mask].astype(np.int64)
        ids, scores = _local_topk(ids, scores, k)
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "score": pa.array(scores, pa.float64())})

    scored = _emb(sf_dir, ["vec_id", "embedding"]).map_batches(bucket_score, batch_format="pyarrow")
    return _merge_topk(scored, k)


def _train_centroids(
    sf_dir: str, n_centroids: int, iters: int = 10, seed: int = 55
) -> np.ndarray:
    """Deterministic mini k-means for the IVF coarse quantizer: a
    hash-sampled subset (layout-independent) is collected driver-side,
    seeded init, fixed iterations, unit-norm centroids. The sample
    percentage adapts to the corpus — ~64 training points per centroid,
    so at 100 TB the fraction is tiny and the training set stays
    bounded."""
    total = max(_emb(sf_dir, ["vec_id"]).count(), 1)
    sample_pct = min(100, max(1, (64 * n_centroids * 100) // total))

    def sample(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids * np.int64(2654435761)) % 100 < sample_pct
        return t.filter(pa.array(keep))

    tbl = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(sample, batch_format="pyarrow")
        .to_pandas()
    )
    if len(tbl) == 0:
        return np.zeros((0, EMBED_DIM), dtype=np.float64)
    # block-arrival order is nondeterministic and the seeded init picks
    # POSITIONS — canonicalize by vec_id or two runs train different
    # quantizers (observed as a knn_ivf determinism flake)
    tbl = tbl.sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    n_centroids = min(n_centroids, len(mat))
    cent = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / np.maximum(np.linalg.norm(v), 1e-12)
    return cent


def _ivf_index_dir(sf_dir: str, n_centroids: int) -> str:
    """Persisted IVF index location (shared keying policy:
    ``artifacts.fingerprint_dir``; salt = the centroid count)."""
    import os

    from laketide.functions.artifacts import fingerprint_dir

    return fingerprint_dir(
        "ivf",
        "ivf",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"c{n_centroids}",
    )


def ivf_index_build(
    sf_dir: str, n_centroids: int = 16, index_dir: str | None = None
) -> str:
    """Build (or reuse) the PERSISTED IVF index artifact: one parquet
    file set per centroid bucket (vec_id, embedding — raw vectors, so
    the rerank is exactly knn_cosine's arithmetic) plus an INDEX.json
    manifest (centroids, bucket->files, row counts). Published with the
    lake's atomic-publish discipline (staging dir -> one os.replace), so
    a crashed build can never serve a half-written index; an existing
    artifact with the same source fingerprint is reused as-is.

    At scale this is the difference between an ANN QUERY costing a full
    corpus scan (rebuild per call) and costing nprobe/n_centroids of
    one: the bucket files are the partition layout, and a probe reads
    only its buckets' files."""
    import json as _json
    import os
    import uuid

    import pyarrow.parquet as _pq

    final = index_dir or _ivf_index_dir(sf_dir, n_centroids)
    if os.path.exists(os.path.join(final, "INDEX.json")):
        return final
    cent = _train_centroids(sf_dir, n_centroids)
    tmp = f"{final}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    if len(cent) == 0:
        meta = {"n_centroids": 0, "centroids": [], "buckets": {}, "rows": 0}
        with open(os.path.join(tmp, "INDEX.json"), "w") as fh:
            fh.write(_json.dumps(meta, sort_keys=True))
        try:
            os.replace(tmp, final)
        except OSError:
            # a concurrent build published first: theirs is equivalent
            import shutil as _sh

            _sh.rmtree(tmp, ignore_errors=True)
        return final
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            # derive the embedding type from the input batch — hardcoding
            # list<float32> diverges from a list<float64> corpus and
            # splits block schemas mid-pipeline
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], t.schema.field("embedding").type),
                }
            )
        cent_v = ray.get(cent_ref)
        mat = _embed_matrix(t["embedding"])
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        b = ((mat / norms[:, None]) @ cent_v.T).argmax(axis=1)
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int64)),
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "embedding": t["embedding"],
            }
        )

    def write_bucket_files(g: pa.Table) -> pa.Table:
        # one file per (bucket, group-call): multiple files per bucket
        # are fine — the manifest lists them all
        if g.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "file": pa.array([], pa.string()), "rows": pa.array([], pa.int64())}
            )
        b = int(g["bucket"][0].as_py())
        name = f"bucket-{b:05d}-{uuid.uuid4().hex[:8]}.parquet"
        _pq.write_table(g.drop_columns(["bucket"]), os.path.join(tmp, name))
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([name], pa.string()),
                "rows": pa.array([g.num_rows], pa.int64()),
            }
        )

    summaries = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket_files, batch_format="pyarrow")
        .take_all()
    )  # <= n_centroids x blocks tiny rows
    buckets: dict = {}
    rows = 0
    for r in summaries:
        buckets.setdefault(str(int(r["bucket"])), []).append(r["file"])
        rows += int(r["rows"])
    meta = {
        "n_centroids": int(len(cent)),
        "centroids": [[float(x) for x in c] for c in cent],
        "buckets": {k: sorted(v) for k, v in buckets.items()},
        "rows": rows,
    }
    with open(os.path.join(tmp, "INDEX.json"), "w") as fh:
        fh.write(_json.dumps(meta, sort_keys=True))
    try:
        os.replace(tmp, final)
    except OSError:
        # a concurrent build published first: theirs is equivalent
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
    return final


def knn_ivf(
    sf_dir: str, k: int = 10, n_centroids: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF ANN served from the PERSISTED index artifact
    (``ivf_index_build``): the query ranks centroids, then reads ONLY
    the ``nprobe`` nearest buckets' parquet files and exact-reranks
    inside them — nprobe/n_centroids of the corpus per query instead of
    a full scan + rebuild per call. Deterministic (seeded k-means,
    fingerprint-cached artifact); recall asserted by pytest against the
    brute-force baseline (approximate op — no SQL oracle)."""
    import json as _json
    import os

    import ray.data as _rd

    idx = ivf_index_build(sf_dir, n_centroids)
    with open(os.path.join(idx, "INDEX.json")) as fh:
        meta = _json.load(fh)
    if not meta["n_centroids"]:
        # nothing sampled (tiny corpus whose ids all miss the sample
        # filter): no quantizer to probe — brute force IS the answer
        return knn_cosine(sf_dir, k)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    q = query_vector()
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(cent @ qn))[:nprobe].tolist()
    files = [
        os.path.join(idx, f)
        for b in probe
        for f in meta["buckets"].get(str(int(b)), [])
    ]
    if not files:
        return pa.table(_EMPTY_SCORED)
    qref = ray.put(qn)

    def rerank(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.table(_EMPTY_SCORED)
        qv = ray.get(qref)
        mat = _embed_matrix(t["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        scores = (mat / norms[:, None]) @ qv
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, scores = _local_topk(ids, scores, k)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "score": pa.array(scores, pa.float64())}
        )

    scored = _rd.read_parquet(files).map_batches(rerank, batch_format="pyarrow")
    return _merge_topk(scored, k)


def knn_lsh_oracle_sql(k: int = 10, n_planes: int = 8, probe_hamming: int = 1) -> str:
    """DuckDB equivalent of ``knn_lsh``: the SAME seeded hyperplanes as
    SQL list literals, the signature rebuilt bit-by-bit with
    list_dot_product, the probe set inlined, cosine ordering on the same
    literal query vector. float64 repr round-trips exactly, so both
    engines compute identical dot products on identical constants."""
    rng = np.random.RandomState(777)
    planes = rng.standard_normal((n_planes, EMBED_DIM))
    q = query_vector()
    weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
    qsig = int(((planes @ q > 0).astype(np.uint64) * weights).sum())
    probe = _probe_set(qsig, n_planes, probe_hamming)

    def lit(v) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    sig = " + ".join(
        f"(CASE WHEN list_dot_product(embedding, {lit(planes[i])}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    probes = ", ".join(str(p) for p in sorted(probe))
    # MATERIALIZED fence: DuckDB's list kernels reject null-containing
    # column batches even under a WHERE embedding IS NOT NULL
    return (
        "WITH m AS MATERIALIZED "
        "(SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL) "
        f"SELECT vec_id FROM m WHERE ({sig}) IN ({probes}) "
        f"ORDER BY list_cosine_similarity(embedding, {query_vector_sql_literal()}) DESC, "
        f"vec_id LIMIT {k}"
    )


def embedding_label_count(sf_dir: str) -> rd.Dataset:
    from ray.data.aggregate import Count

    return _emb(sf_dir, ["label"]).groupby("label").aggregate(Count(alias_name="n"))


_ND_BANDS = 4
_ND_PLANES_PER_BAND = 8
_ND_MAX_BUCKET = 512


class _UnitVectors:
    """(vec_id, unit: binary) for CANDIDATE vectors only — the id set is
    broadcast via ray.put (cheap local object-store read per batch); the
    unit vector is packed to binary because Arrow hash joins reject list
    payload columns. Plain function object, not an actor pool (actor
    CPUs + join aggregator actors can deadlock small clusters)."""

    def __init__(self, need_ref):
        self.need_ref = need_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        needed = ray.get(self.need_ref)
        t = _drop_null_embeddings(t)
        t = t.filter(pc.is_in(pc.cast(t["vec_id"], pa.int64()), value_set=needed))
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "unit": pa.array([], pa.binary())}
            )
        mat = _embed_matrix(t["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "unit": pa.array([unit[i].tobytes() for i in range(len(unit))], pa.binary()),
            }
        )


def _emblsh_index_dir(sf_dir: str) -> str:
    """Persisted embedding-LSH signature artifact location (shared
    keying policy: ``artifacts.fingerprint_dir``; salt = the
    signature-shaping constants — bands, planes per band, plane seed,
    dim)."""
    import os

    from laketide.functions.artifacts import fingerprint_dir

    return fingerprint_dir(
        "emblsh",
        "el",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"b{_ND_BANDS}p{_ND_PLANES_PER_BAND}s4242d{EMBED_DIM}",
    )


def embedding_lsh_signature_build(sf_dir: str, index_dir: str | None = None) -> str:
    """Build (or reuse) the persisted embedding-LSH signature artifact —
    (band, band_val, vec_id, bucket_part) parquet rows plus INDEX.json,
    published atomically (staging dir -> one ``os.replace``; the minhash
    artifact discipline). The matmul against the hyperplanes over every
    stored vector dominates each near-dup call's bucketing phase; the
    persisted rows are 32 bytes x 4 bands per vector."""
    from laketide.functions.artifacts import publish_rows_artifact
    from laketide.functions.dedup import _coarse_n_parts

    return publish_rows_artifact(
        index_dir or _emblsh_index_dir(sf_dir),
        lambda: _emblsh_rows(sf_dir, from_index=False),
        {
            "bands": _ND_BANDS,
            "planes_per_band": _ND_PLANES_PER_BAND,
            "seed": 4242,
            "dim": EMBED_DIM,
            "n_parts": _coarse_n_parts(),
        },
    )


def _emblsh_rows(sf_dir: str, from_index: bool) -> "rd.Dataset":
    """Banded (band, band_val, vec_id, bucket_part) hyperplane-signature
    rows — computed from the embeddings, or read back from the persisted
    artifact (``from_index=True``; builds it on first use). ONE signing
    implementation feeds both paths, so equal output is structural."""
    if from_index:
        from laketide.functions.artifacts import read_rows_artifact

        return read_rows_artifact(
            embedding_lsh_signature_build(sf_dir),
            pa.schema(
                [
                    ("band", pa.int64()),
                    ("band_val", pa.int64()),
                    ("vec_id", pa.int64()),
                    ("bucket_part", pa.int64()),
                ]
            ),
        )
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts

    n_parts = _coarse_n_parts()
    rng = np.random.RandomState(4242)
    planes_ref = ray.put(rng.standard_normal((_ND_BANDS * _ND_PLANES_PER_BAND, EMBED_DIM)))

    def sign(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "band_val": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                }
            )
        planes_v = ray.get(planes_ref)
        mat = _embed_matrix(t["embedding"])
        n = mat.shape[0]
        bits = (mat @ planes_v.T > 0).astype(np.uint8)  # (n, 32)
        sig = np.packbits(
            bits.reshape(n, _ND_BANDS, _ND_PLANES_PER_BAND),
            axis=2,
            bitorder="little",
        )[:, :, 0].astype(np.int64)  # (n, bands)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(_ND_BANDS, dtype=np.int64), n)),
                "band_val": pa.array(sig.reshape(-1)),
                "vec_id": pa.array(np.repeat(ids, _ND_BANDS)),
            }
        )

    def sign_with_part(t: pa.Table) -> pa.Table:
        out = sign(t)
        part = _coarse_parts(
            out["band"].to_numpy(zero_copy_only=False),
            out["band_val"].to_numpy(zero_copy_only=False),
            n_parts=n_parts,
        )
        return out.append_column("bucket_part", pa.array(part, pa.int64()))

    return _emb(sf_dir, ["vec_id", "embedding"]).map_batches(
        sign_with_part, batch_format="pyarrow"
    )


def embedding_near_dup(
    sf_dir: str, threshold: float = 0.92, from_index: bool = False
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: BANDED random-hyperplane
    LSH (4 bands x 8 planes) buckets candidate vectors — a pair of
    near-dups collides in >=1 band with high probability (recall ~0.9 at
    cos 0.95, ~1.0 above 0.99), unlike single-signature collision.

    Scale shape (r2 verdict fix): the bucketing shuffle carries ONLY
    (band, band_val, vec_id) — 24-byte rows — instead of replicating
    each serialized unit vector x4 bands through the exchange. Buckets
    emit candidate id pairs (hot buckets capped, logged); the pairs then
    REJOIN the unit vectors (packed binary, computed once per candidate
    id) via Dataset hash joins — the minhash-verify pattern — and exact
    cosine verifies per batch. Deterministic (seeded planes).
    ``from_index=True`` serves the banded signatures from the persisted
    artifact (built on first use) instead of re-signing every vector."""
    import logging

    import pyarrow.compute as pc

    logger = logging.getLogger(__name__)
    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    from laketide.functions.dedup import _int64_table, _iter_buckets

    def grouped_bucket_pairs(t: pa.Table) -> pa.Table:
        # all (band, band_val) buckets of one coarse partition in one
        # vectorized call (shared dedup._iter_buckets core) — not one
        # UDF invocation per mostly-singleton bucket
        cols = ["vec_a", "vec_b"]
        if t.num_rows == 0:
            return _int64_table([], cols)
        acc = []
        for (vids,) in _iter_buckets(t, ["band", "band_val"], ["vec_id"]):
            ids = np.unique(vids.astype(np.int64))
            n = len(ids)
            if n < 2:
                continue
            if n > _ND_MAX_BUCKET:
                logger.warning(
                    "embedding_near_dup hot bucket: %d members > cap %d; "
                    "verifying only the first %d (dropping %d pairs)",
                    n, _ND_MAX_BUCKET, _ND_MAX_BUCKET,
                    n * (n - 1) // 2 - _ND_MAX_BUCKET * (_ND_MAX_BUCKET - 1) // 2,
                )
                ids = ids[:_ND_MAX_BUCKET]
                n = len(ids)
            iu = np.triu_indices(n, k=1)
            acc.append(np.stack([ids[iu[0]], ids[iu[1]]], axis=1))
        return _int64_table(acc, cols)

    signed = _emblsh_rows(sf_dir, from_index)
    from laketide.functions.dedup import _gather_nonempty_blocks

    cand_blocks = _gather_nonempty_blocks(
        signed.groupby("bucket_part")
        .map_groups(
            lambda g: grouped_bucket_pairs(g.drop_columns(["bucket_part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if not cand_blocks:
        return empty
    cand_tbl = pa.concat_tables(cand_blocks, promote_options="default")
    # cross-band duplicate candidates collapse here (tiny id pairs)
    cand_pd = (
        cand_tbl.select(["vec_a", "vec_b"])
        .to_pandas()
        .drop_duplicates(["vec_a", "vec_b"])
    )
    cands = rd.from_arrow(
        pa.table(
            {
                "vec_a": pa.array(cand_pd["vec_a"].astype("int64")),
                "vec_b": pa.array(cand_pd["vec_b"].astype("int64")),
            }
        )
    )
    need = pc.unique(
        pa.concat_arrays(
            [
                pa.array(cand_pd["vec_a"].astype("int64")),
                pa.array(cand_pd["vec_b"].astype("int64")),
            ]
        )
    )
    need_ref = ray.put(need)
    units = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(_UnitVectors(need_ref), batch_format="pyarrow")
        .materialize()
    )

    # ---- adaptive small-side broadcast (planner behavior): when the
    # candidate id set is small, gather its unit vectors once (bounded:
    # <= cap x 8B x EMBED_DIM), ray.put the packed matrix, and verify
    # per pair batch with an index_in lookup — skipping BOTH hash joins
    # (~2s of aggregator latency at bench scale). Above the cap, fall
    # through to the shuffle joins (the 100 TB path).
    import os as _os2

    broadcast_max = int(_os2.environ.get("LAKETIDE_NEARDUP_BROADCAST_MAX", "200000"))
    if len(need) <= broadcast_max:
        from laketide.functions.dedup import _gather_nonempty_blocks

        ublocks = _gather_nonempty_blocks(units)
        if not ublocks:
            return empty
        utbl = pa.concat_tables(ublocks, promote_options="default")
        from laketide.functions.multimodal import _binary_buffers

        uids = utbl["vec_id"].combine_chunks()
        offs_u, data_u = _binary_buffers(utbl["unit"].combine_chunks())
        umat = np.frombuffer(
            data_u[offs_u[0] : offs_u[-1]], dtype=np.float64
        ).reshape(len(uids), -1)
        mat_ref = ray.put((uids, umat))
        thr_b = float(threshold)

        def verify_broadcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            ids_b, m = ray.get(mat_ref)
            ia = pc.index_in(pc.cast(t["vec_a"], pa.int64()), value_set=ids_b)
            ib = pc.index_in(pc.cast(t["vec_b"], pa.int64()), value_set=ids_b)
            ia_np = ia.to_numpy(zero_copy_only=False)
            ib_np = ib.to_numpy(zero_copy_only=False)
            ok = ~(np.isnan(ia_np.astype(np.float64)) | np.isnan(ib_np.astype(np.float64)))
            ia_np = ia_np[ok].astype(np.int64)
            ib_np = ib_np[ok].astype(np.int64)
            cos = np.einsum("ij,ij->i", m[ia_np], m[ib_np])
            keep = cos >= thr_b
            va = pc.cast(t["vec_a"], pa.int64()).to_numpy(zero_copy_only=False)[ok]
            vb = pc.cast(t["vec_b"], pa.int64()).to_numpy(zero_copy_only=False)[ok]
            return pa.table(
                {
                    "vec_a": pa.array(va[keep], pa.int64()),
                    "vec_b": pa.array(vb[keep], pa.int64()),
                    "cosine": pa.array(cos[keep].round(6), pa.float64()),
                }
            )

        parts = _gather_nonempty_blocks(
            cands.map_batches(verify_broadcast, batch_format="pyarrow").materialize()
        )
        if not parts:
            return empty
        out = pa.concat_tables(parts, promote_options="default")
        return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])

    u_a = units.map_batches(
        lambda t: t.rename_columns(["vec_a", "unit_a"]), batch_format="pyarrow"
    )
    u_b = units.map_batches(
        lambda t: t.rename_columns(["vec_b", "unit_b"]), batch_format="pyarrow"
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # distinct name from the coarse-shuffle n_parts above: sign_with_part
    # captures n_parts by closure and a rebind here would silently
    # shrink the bucket shuffle
    join_parts = max(2, min(8, cpus // 2))
    agg_args = {"num_cpus": 0.5}
    joined = cands.join(
        u_a,
        join_type="inner",
        num_partitions=join_parts,
        on=("vec_a",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        u_b,
        join_type="inner",
        num_partitions=join_parts,
        on=("vec_b",),
        aggregator_ray_remote_args=agg_args,
    )
    thr = float(threshold)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        # zero-copy: fixed-width packed vectors tile contiguously in the
        # binary column's data buffer (the multimodal._binary_buffers
        # idiom) — no per-row to_pylist byte copies
        from laketide.functions.multimodal import _binary_buffers

        def mat(col: pa.ChunkedArray) -> np.ndarray:
            offs, data = _binary_buffers(col.combine_chunks())
            return np.frombuffer(
                data[offs[0] : offs[-1]], dtype=np.float64
            ).reshape(len(offs) - 1, -1)

        a = mat(t["unit_a"])
        b = mat(t["unit_b"])
        cos = np.einsum("ij,ij->i", a, b)
        # threshold on the UNROUNDED value (rounding first would admit
        # pairs in [thr-5e-7, thr)); round only the reported score
        keep = cos >= thr
        return pa.table(
            {
                "vec_a": pc.cast(t["vec_a"], pa.int64()).filter(pa.array(keep)),
                "vec_b": pc.cast(t["vec_b"], pa.int64()).filter(pa.array(keep)),
                "cosine": pa.array(cos[keep].round(6), pa.float64()),
            }
        )

    parts = _gather_nonempty_blocks(
        joined.map_batches(verify, batch_format="pyarrow").materialize()
    )
    if not parts:
        return empty
    out = pa.concat_tables(parts, promote_options="default")
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


def kmeans_cluster_stats(sf_dir: str, n_centroids: int = 16) -> pa.Table:
    """Distributed k-means clustering surface (the IVF quantizer as a
    first-class op): every embedding assigns to its nearest cosine
    centroid (per-batch matmul+argmax against the broadcast centroid
    matrix); the output is per-cluster size plus the majority label and
    its count — the label-purity view an embedding-curation pipeline
    inspects. The shuffle carries only (cluster, label, count) partials
    (bounded by n_centroids x n_labels, never corpus-sized). Seeded,
    deterministic; approximate op (k-means is not SQL-expressible), so
    correctness is pytest: partition totals + determinism +
    majority-label consistency vs a driver-side recompute."""
    cent = _train_centroids(sf_dir, n_centroids)
    empty = pa.schema(
        [
            ("cluster", pa.int64()),
            ("n_vecs", pa.int64()),
            ("top_label", pa.int64()),
            ("top_label_n", pa.int64()),
        ]
    ).empty_table()
    if len(cent) == 0:
        return empty
    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.schema(
                [("cluster", pa.int64()), ("label", pa.int64()), ("c", pa.int64())]
            ).empty_table()
        cent_v = ray.get(cref)
        mat = _embed_matrix(t["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        a = (unit @ cent_v.T).argmax(axis=1).astype(np.int64)
        g = (
            pa.table(
                {
                    "cluster": pa.array(a),
                    "label": pc.cast(t["label"], pa.int64()),
                }
            )
            .group_by(["cluster", "label"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cluster", "label", "c"])

    from ray.data.aggregate import Sum

    agg = (
        _emb(sf_dir, ["vec_id", "embedding", "label"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("c", alias_name="n"))
    )
    import pyarrow.compute as pc

    parts = collect_tables(agg)
    if not parts:
        return empty
    # (cluster, label, n) is bounded by n_centroids x n_labels — the
    # driver-side finish is O(that), independent of corpus size
    t = pa.concat_tables(parts).sort_by(
        [("cluster", "ascending"), ("n", "descending"), ("label", "ascending")]
    )
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
    first = np.concatenate([[True], cl[1:] != cl[:-1]])
    totals = np.add.reduceat(n, np.flatnonzero(first))
    return pa.table(
        {
            "cluster": pa.array(cl[first], pa.int64()),
            "n_vecs": pa.array(totals.astype(np.int64)),
            "top_label": t["label"].filter(pa.array(first)),
            "top_label_n": pa.array(n[first]),
        }
    )


def vector_norm_stats_by_label(sf_dir: str) -> pa.Table:
    """Per-label embedding-norm statistics over EXACT integer
    milli-units: each coordinate rounds to round(x*1000) (half away
    from zero, = DuckDB ROUND), the squared L2 norm becomes an int64
    sum — order-independent, so the grouped sums are bit-exact against
    the SQL list_transform oracle under any block split (a float
    norm would depend on summation order). Labels are dimension-scale:
    per-batch Arrow partials collapse before one tiny final groupby.
    Null embeddings are excluded (not candidates); null labels form
    their own group, matching SQL GROUP BY."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("label", pa.int64()),
                    ("s", pa.int64()),
                    ("mn", pa.int64()),
                    ("mx", pa.int64()),
                    ("n", pa.int64()),
                ]
            ).empty_table()
        m = _embed_matrix(t["embedding"]) * 1000.0
        # round with the SAME kernel the oracle's ROUND uses (Arrow
        # half_towards_infinity == DuckDB std-round): the floor(|m|+0.5)
        # trick over-rounds doubles one ulp below k+0.5 (review fuzz:
        # floor-trick(0.49999999999999994)=1, DuckDB ROUND=0)
        flat = pc.round(
            pa.array(m.reshape(-1)), ndigits=0, round_mode="half_towards_infinity"
        )
        r = (
            pc.cast(flat, pa.int64())
            .to_numpy(zero_copy_only=False)
            .reshape(m.shape)
        )
        nsq = (r * r).sum(axis=1)
        g = (
            pa.table(
                {
                    "label": pc.cast(t["label"], pa.int64()),
                    "nsq": pa.array(nsq, pa.int64()),
                }
            )
            .group_by(["label"])
            .aggregate([("nsq", "sum"), ("nsq", "min"), ("nsq", "max"), ([], "count_all")])
        )
        return g.rename_columns(["label", "s", "mn", "mx", "n"])

    agg = (
        _emb(sf_dir, ["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(
            Sum("s", alias_name="s_f"),
            Min("mn", alias_name="mn_f"),
            Max("mx", alias_name="mx_f"),
            Sum("n", alias_name="n_f"),
        )
    )
    parts = collect_tables(agg)
    if not parts:
        return pa.schema(
            [
                ("label", pa.int64()),
                ("n_vecs", pa.int64()),
                ("sum_normsq_milli", pa.int64()),
                ("min_normsq_milli", pa.int64()),
                ("max_normsq_milli", pa.int64()),
            ]
        ).empty_table()
    t = pa.concat_tables([p.replace_schema_metadata(None) for p in parts])
    return pa.table(
        {
            "label": t["label"],
            "n_vecs": pc.cast(t["n_f"], pa.int64()),
            "sum_normsq_milli": pc.cast(t["s_f"], pa.int64()),
            "min_normsq_milli": pc.cast(t["mn_f"], pa.int64()),
            "max_normsq_milli": pc.cast(t["mx_f"], pa.int64()),
        }
    ).sort_by([("label", "ascending")])


def embedding_quantize_stats(sf_dir: str) -> pa.Table:
    """INT8 scalar-quantization audit per label — the memory-cut check
    before serving ANN from quantized vectors (4x smaller residency
    than float32, 8x than float64): each coordinate quantizes to
    q = clip(round(x*127), -127, 127) and the table reports, per label,
    the vector count, the count of CLIPPED coordinates (|round(x*127)|
    > 127 — out-of-range inputs the codebook can't represent) and the
    max absolute reconstruction error |x - q/127|.

    Exactness scheme: rounding uses Arrow half_towards_infinity (==
    DuckDB ROUND — the floor(|x|+0.5) trick over-rounds one ulp below
    k+0.5), counters are int64 sums, and the error statistic is a MAX
    (order-independent), so the result is bit-exact against the SQL
    oracle under any block split — a float SUM would depend on
    summation order. Labels are dimension-scale: per-batch Arrow
    partials collapse before one tiny final groupby. Null embeddings
    are excluded (not candidates)."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("label", pa.int64()),
                    ("n", pa.int64()),
                    ("nc", pa.int64()),
                    ("me", pa.float64()),
                ]
            ).empty_table()
        m = _embed_matrix(t["embedding"])  # float64, exact from float32
        s = m * 127.0
        q = (
            pc.round(
                pa.array(s.reshape(-1)), ndigits=0, round_mode="half_towards_infinity"
            )
            .to_numpy(zero_copy_only=False)
            .reshape(s.shape)
        )
        clipped = (np.abs(q) > 127.0).sum(axis=1).astype(np.int64)
        qc = np.clip(q, -127.0, 127.0)
        err = np.abs(m - qc / 127.0).max(axis=1)
        g = (
            pa.table(
                {
                    "label": pc.cast(t["label"], pa.int64()),
                    "nc": pa.array(clipped, pa.int64()),
                    "me": pa.array(err, pa.float64()),
                }
            )
            .group_by(["label"])
            .aggregate([("nc", "sum"), ("me", "max"), ([], "count_all")])
        )
        return g.rename_columns(["label", "nc", "me", "n"])

    agg = (
        _emb(sf_dir, ["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(
            Sum("n", alias_name="n_f"),
            Sum("nc", alias_name="nc_f"),
            Max("me", alias_name="me_f"),
        )
    )
    parts = collect_tables(agg)
    out_schema = pa.schema(
        [
            ("label", pa.int64()),
            ("n_vecs", pa.int64()),
            ("n_clipped", pa.int64()),
            ("max_abs_err", pa.float64()),
        ]
    )
    if not parts:
        return out_schema.empty_table()
    t = pa.concat_tables([p.replace_schema_metadata(None) for p in parts])
    return pa.table(
        {
            "label": t["label"],
            "n_vecs": pc.cast(t["n_f"], pa.int64()),
            "n_clipped": pc.cast(t["nc_f"], pa.int64()),
            "max_abs_err": pc.cast(t["me_f"], pa.float64()),
        }
    ).sort_by([("label", "ascending")])


def embedding_centroid_by_label(sf_dir: str) -> pa.Table:
    """Per-label centroid (class prototype) over EXACT integer
    micro-units: coordinates round to round(x*1e6) int64 (Arrow
    half_towards_infinity == DuckDB ROUND), per-label per-dimension
    sums are order-independent int64, and the mean is ONE double
    division written identically in the oracle — bit-exact under any
    block split. Labels are dimension-scale, so per-batch partials
    (label, n, 64 dim-sums) collapse before a driver-side merge; the
    output columns are flat c0..c63 means in micro-units. Null
    embeddings are excluded; null labels form their own group (SQL
    GROUP BY)."""
    import pyarrow.compute as pc

    from laketide.functions.reads import collect_tables

    dims = 64
    sum_cols = [f"c{i}" for i in range(dims)]
    aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]

    def partial(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        schema = pa.schema(
            [("label", pa.int64())]
            + [(c, pa.int64()) for c in sum_cols]
            + [("n", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        m = _embed_matrix(t["embedding"]) * 1_000_000.0
        flat = pc.round(
            pa.array(m.reshape(-1)), ndigits=0, round_mode="half_towards_infinity"
        )
        r = pc.cast(flat, pa.int64()).to_numpy(zero_copy_only=False).reshape(m.shape)
        cols = {"label": pc.cast(t["label"], pa.int64())}
        for i, c in enumerate(sum_cols):
            cols[c] = pa.array(r[:, i], pa.int64())
        g = pa.table(cols).group_by(["label"]).aggregate(aggs)
        return g.rename_columns(["label"] + sum_cols + ["n"])

    parts = collect_tables(
        _emb(sf_dir, ["label", "embedding"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    out_schema = pa.schema(
        [("label", pa.int64()), ("n_vectors", pa.int64())]
        + [(c, pa.float64()) for c in sum_cols]
    )
    if not parts:
        return out_schema.empty_table()
    g = (
        pa.concat_tables([p.cast(parts[0].schema) for p in parts])
        .group_by(["label"])
        # merge partials: n SUMS here (count_all would count partial rows)
        .aggregate([(c, "sum") for c in sum_cols] + [("n", "sum")])
        .rename_columns(["label"] + sum_cols + ["n"])
    )
    n_f = pc.cast(g["n"], pa.float64())
    out = {"label": g["label"], "n_vectors": g["n"]}
    for c in sum_cols:
        out[c] = pc.divide(pc.cast(g[c], pa.float64()), n_f)
    return pa.table(out).cast(out_schema).sort_by([("label", "ascending")])


def _quantize_milli(t: pa.Table) -> pa.Table:
    """Milli-unit integer quantization of the embedding column —
    IDENTICAL expression to the oracle: ROUND(CAST(x AS DOUBLE) * 1000.0)
    with half-away-from-zero rounding. Shared by the semantic-dedup
    component clustering and the incremental edge scan so the two can
    never drift. Null vec_id rows drop here too: the SQL oracles' NULL
    comparisons (a.vec_id < b.vec_id, vec_id % mod) exclude them, while
    a NaN->int64 cast would hand them a garbage id (the doc_id sampler
    class of bug)."""
    t = _drop_null_embeddings(t)
    t = t.filter(pc.is_valid(t["vec_id"]))
    if t.num_rows == 0:
        return pa.schema(
            [("vec_id", pa.int64()), ("iv", pa.list_(pa.int64()))]
        ).empty_table()
    col = t["embedding"].combine_chunks()
    flat = pc.list_flatten(col)
    q = pc.cast(
        pc.round(
            pc.multiply(pc.cast(flat, pa.float64()), 1000.0),
            ndigits=0,
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    lists = pa.ListArray.from_arrays(col.offsets, q)
    return pa.table({"vec_id": pc.cast(t["vec_id"], pa.int64()), "iv": lists})


def _quant_guard_stats(qds: rd.Dataset, num: int, den: int) -> tuple[int, int, int]:
    """(total_rows, max_el, dim) of a quantized dataset, raising BEFORE
    any int64 norm/dot math if the exact edge test could wrap (norms
    computed from already-wrapped elements could pass a post-hoc check
    exactly in the cases the guard exists to catch); the bound also
    keeps every element far below 2^53, so float64 list round-trips
    stay exact. Per-batch partials (one tiny row each) — the guard
    never collects the corpus."""
    guard_schema = pa.schema(
        [("max_el", pa.int64()), ("dim", pa.int64()), ("n", pa.int64())]
    )

    def guard_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return guard_schema.empty_table()
        iv = t["iv"].combine_chunks()
        flat = pc.list_flatten(iv)
        max_el = int(pc.max(pc.abs(flat)).as_py() or 0) if len(flat) else 0
        dim = int(pc.max(pc.list_value_length(iv)).as_py() or 0)
        return pa.table(
            {
                "max_el": pa.array([max_el], pa.int64()),
                "dim": pa.array([dim], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    gparts = collect_tables(
        qds.map_batches(guard_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    if not gparts:
        return 0, 0, 0
    gt = pa.concat_tables([p.cast(guard_schema) for p in gparts])
    total_rows = int(pc.sum(gt["n"]).as_py() or 0)
    if total_rows == 0:
        return 0, 0, 0
    max_el = int(pc.max(gt["max_el"]).as_py() or 0)
    dim = int(pc.max(gt["dim"]).as_py() or 0)
    _check_quant_bound(num, den, max_el, dim)
    return total_rows, max_el, dim


def _check_quant_bound(num: int, den: int, max_el: int, dim: int) -> None:
    """Raise unless the exact int64 edge test provably cannot wrap
    (bound computed in exact Python ints)."""
    nn_bound = dim * max_el * max_el
    if max(num, den) * nn_bound * nn_bound >= 2**63:
        raise ValueError(
            f"quantized elements too large for exact int64 edge tests "
            f"(max |component| = {max_el}, dim {dim}); lower the "
            "quantization scale"
        )


def embedding_dup_edges_incremental(
    sf_dir: str,
    threshold_sq: tuple[int, int] = (49, 400),
    mod: int = 20,
) -> rd.Dataset:
    """EXACT semantic-dedup edges for an ingest batch: every cosine
    edge (same integer predicate as ``embedding_dup_components``) with
    at least one ARRIVAL-slice member (``vec_id % mod == 0`` — the
    deterministic benchmark stand-in for a newly-arrived batch). This
    is the ingest-time shape where exactness is affordable: the arrival
    matrix is batch-sized, so it broadcasts whole via ``ray.put`` and
    every corpus batch computes ONE int64 matmul block against it —
    O(|new| x N) compute streaming over the corpus, never O(N^2), and
    nothing corpus-sized on the driver. Completeness has NO recall
    caveat (unlike the LSH candidate streams): the arrival side is
    exhaustively compared. Exactly-once emission: a corpus-side row
    that is itself an arrival pairs only when broadcast_id < batch_id
    (new x new would otherwise appear from both directions); new x old
    pairs exist in one direction only. Oracle: the HUGEINT all-pairs
    edge SQL restricted to arrival pairs."""
    num, den = threshold_sq
    qds = _emb(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        _quantize_milli, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    edge_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])

    # ONE fused pass serves both the overflow guard and the arrival
    # broadcast (this is the per-ingest hot path — a separate stats
    # scan would be a whole extra pass over the quantized corpus): each
    # batch emits its arrival rows plus one MARKER row — vec_id NULL
    # (real null ids dropped at quantize) carrying [max_el, dim, n]
    def arrivals_and_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        iv = t["iv"].combine_chunks()
        flat = pc.list_flatten(iv)
        max_el = int(pc.max(pc.abs(flat)).as_py() or 0) if len(flat) else 0
        dim = int(pc.max(pc.list_value_length(iv)).as_py() or 0)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = t.filter(pa.array(ids % mod == 0))
        stats = pa.table(
            {
                "vec_id": pa.array([None], pa.int64()),
                "iv": pa.array([[max_el, dim, t.num_rows]], pa.list_(pa.int64())),
            }
        )
        return pa.concat_tables([arr.cast(stats.schema), stats])

    parts = collect_tables(
        qds.map_batches(
            arrivals_and_stats, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return rd.from_arrow(edge_schema.empty_table())
    both = pa.concat_tables(parts)
    stats_t = both.filter(pc.is_null(both["vec_id"]))
    svals = [row for row in stats_t["iv"].to_pylist()]
    total_rows = sum(int(s[2]) for s in svals)
    if total_rows == 0:
        return rd.from_arrow(edge_schema.empty_table())
    _check_quant_bound(
        num, den,
        max(int(s[0]) for s in svals),
        max(int(s[1]) for s in svals),
    )
    new_t = both.filter(pc.is_valid(both["vec_id"]))
    if new_t.num_rows == 0:
        return rd.from_arrow(edge_schema.empty_table())
    new_t = new_t.sort_by([("vec_id", "ascending")])
    new_ids = new_t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    new_mat = _embed_matrix(new_t["iv"]).astype(np.int64)
    new_nn = np.einsum("ij,ij->i", new_mat, new_mat)
    bref = ray.put((new_ids, new_mat, new_nn))
    modv = np.int64(mod)
    numv, denv = np.int64(num), np.int64(den)

    def edge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        nids, nmat, nnn = ray.get(bref)
        cid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cmat = _embed_matrix(t["iv"]).astype(np.int64)
        cnn = np.einsum("ij,ij->i", cmat, cmat)
        dots = nmat @ cmat.T  # exact int64 (guarded above)
        ok = (dots > 0) & (denv * dots * dots >= numv * np.outer(nnn, cnn))
        # exactly-once: an arrival on the corpus side pairs only with a
        # smaller broadcast id; a non-arrival pairs in this direction
        # always (it is never on the broadcast side)
        batch_is_new = cid % modv == 0
        ok &= np.where(
            batch_is_new[None, :],
            nids[:, None] < cid[None, :],
            nids[:, None] != cid[None, :],
        )
        r, c = np.nonzero(ok)
        a = np.minimum(nids[r], cid[c])
        b = np.maximum(nids[r], cid[c])
        return pa.table(
            {"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())}
        )

    return qds.map_batches(
        edge_block, batch_format="pyarrow", zero_copy_batch=True
    )


def embedding_dup_components(
    sf_dir: str,
    threshold_sq: tuple[int, int] = (49, 400),
    driver_budget_rows: int = 2_000_000,
    path: str = "auto",
    broadcast_budget_rows: int = 500_000,
    n_centroids: int = 16,
    assign_probes: int = 2,
) -> "pa.Table | rd.Dataset":
    """SemDeDup-style semantic-dedup clustering: connected components
    over EXACT cosine-similarity edges (cos >= 0.35 by default, as the
    rational 49/400 = 0.35^2) computed on milli-unit-quantized
    embeddings, so the edge test is pure int64 arithmetic —
    ``dot > 0 and 400*dot^2 >= 49*|a|^2*|b|^2`` — and matches the DuckDB
    HUGEINT oracle bit-for-bit (a float cosine threshold would flip
    borderline edges between engines and change component structure).
    Returns (vec_id, component = min vec_id in the cluster) for every
    vector with at least one semantic near-duplicate.

    Two execution paths sharing one quantization and one clustering
    core, selected by ``path`` ("auto" picks by corpus size vs
    ``broadcast_budget_rows``):

    - **broadcast** (the oracle regime): the quantized matrix broadcasts
      once via ``ray.put`` (int64 x dim per vector); each batch computes
      ONE integer matmul row-block against it and ships only passing
      (i < j) edges. Complete — every qualifying pair is found — but
      O(N^2) compute and O(N*dim) driver/broadcast residency, so it is
      gated behind the row budget.
    - **bucketed** (the scale path): a seeded k-means coarse quantizer
      (the ``knn_ivf`` trainer) assigns every vector to its
      ``assign_probes`` nearest centroids; the exact int64 edge test
      runs WITHIN each bucket group only (row-blocked matmul inside
      ``groupby("bucket").map_groups``), and a pair co-assigned to
      several buckets is emitted exactly once — by the bucket equal to
      the MIN of the two probe-sets' intersection, computable in-group
      because each row carries its probe list. Nothing corpus-sized
      ever lands on the driver: the shuffle ships ``assign_probes`` x
      (quantized vector + probe list) per row, buckets are
      ~N/n_centroids rows (size n_centroids to the corpus so a bucket
      fits a worker), and compute drops from O(N^2) to
      O(sum_b m_b^2).

      Recall statement: the bucketed path finds a pair iff the two
      vectors share at least one of their ``assign_probes`` nearest
      centroids. Near-duplicates (cos >= ~0.9 — the SemDeDup regime)
      co-assign with probability ~1 (their centroid rankings agree);
      planted-corpus recall is 1.0 in
      ``test_embedding_dup_components_bucketed_matches_broadcast``.
      Pairs barely above a LOW threshold (e.g. the 0.35 default) that
      straddle a centroid boundary can be missed — multi-probe
      (``assign_probes`` >= 2) recovers boundary pairs whose
      second-nearest centroids overlap. The broadcast path remains the
      complete/oracle-exact reference and the equivalence test pins the
      two paths equal on planted near-duplicate data.

    Clustering reuses the adaptive ``dup_components`` core either way:
    driver min-label fixpoint under ``driver_budget_rows`` edges,
    large-star/small-star contraction above it (both tolerate — and the
    bucketed emitter avoids — duplicate edges)."""
    if path not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"unknown path {path!r}")
    num, den = threshold_sq
    base = _emb(sf_dir, columns=["vec_id", "embedding"])
    quantize = _quantize_milli

    # quantize ONCE: the materialized dataset serves the overflow guard,
    # and then either the driver broadcast collect (small regime) or the
    # bucketed edge pass (no second parquet read or round/cast over the
    # corpus)
    qds = base.map_batches(
        quantize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    out_schema = pa.schema([("vec_id", pa.int64()), ("component", pa.int64())])

    # row count from block metadata — no scan. The overflow guard runs
    # per-branch: a full guard pass here would scan the quantized corpus
    # a second time on the (default) broadcast path, which collects the
    # same data to the driver anyway and can check the bound for free.
    total_rows = qds.count()
    if total_rows == 0:
        return out_schema.empty_table()

    edge_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def _edge_mask(
        rid: np.ndarray,
        rmat: np.ndarray,
        rn: np.ndarray,
        cid: np.ndarray,
        cmat: np.ndarray,
        cn: np.ndarray,
    ) -> np.ndarray:
        """The exact integer edge predicate for a (rows x cols) block:
        dot > 0 and den*dot^2 >= num*|a|^2*|b|^2, ordered rid < cid.
        Shared verbatim by both paths so they cannot drift."""
        dots = rmat @ cmat.T  # exact int64 (guarded above)
        ok = (dots > 0) & (den * dots * dots >= num * np.outer(rn, cn))
        ok &= rid[:, None] < cid[None, :]
        return ok

    edges: rd.Dataset | None = None
    if path == "bucketed" or (path == "auto" and total_rows > broadcast_budget_rows):
        if path == "auto":
            # the cutover trades completeness for scale: pairs barely
            # above a LOW threshold that straddle every shared probe
            # centroid can be missed (docstring recall statement) — make
            # the silent switch visible to the caller
            import logging as _logging

            _logging.getLogger(__name__).warning(
                "embedding_dup_components: %d rows > broadcast budget %d; "
                "auto-switching to the IVF-bucketed path (complete for "
                "near-duplicates; borderline low-threshold pairs may be "
                "missed — pass path='broadcast' to force completeness)",
                total_rows, broadcast_budget_rows,
            )
        # guard BEFORE any distributed int64 math (norms computed from
        # already-wrapped elements could pass a post-hoc check) — the
        # scan cost is fine here: the bucketed branch never collects
        # the corpus, so this is its only full pass over qds
        _quant_guard_stats(qds, num, den)
        cent = _train_centroids(sf_dir, n_centroids)
        # empty quantizer (degenerate tiny corpus whose ids all miss the
        # training sample): fall through to the broadcast path below
        if len(cent):
            edges = _bucketed_semantic_edges(
                qds, cent, assign_probes, _edge_mask, edge_schema
            ).materialize()
    if edges is None:
        parts = collect_tables(qds)
        if not parts:
            return out_schema.empty_table()
        qt = pa.concat_tables(parts)
        # deterministic layout: block arrival order is nondeterministic
        qt = qt.sort_by([("vec_id", "ascending")])
        ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embed_matrix(qt["iv"]).astype(np.int64)
        # the guard, from the already-collected table (free): still
        # BEFORE the first int64 product
        _check_quant_bound(
            num,
            den,
            int(np.abs(mat).max()) if mat.size else 0,
            int(mat.shape[1]) if mat.size else 0,
        )
        norms = (mat * mat).sum(axis=1)
        bc = ray.put((ids, mat, norms))

        def edges_of(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return edge_schema.empty_table()
            all_ids, all_mat, all_n = ray.get(bc)
            rid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            rmat = _embed_matrix(t["iv"]).astype(np.int64)
            rn = (rmat * rmat).sum(axis=1)
            ok = _edge_mask(rid, rmat, rn, all_ids, all_mat, all_n)
            ri, ci = np.nonzero(ok)
            return pa.table(
                {
                    "doc_a": pa.array(rid[ri], pa.int64()),
                    "doc_b": pa.array(all_ids[ci], pa.int64()),
                }
            )

        edges = qds.map_batches(
            edges_of, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["vec_id", "component"])

    from laketide.functions.dedup import _components_minlabel, _components_star

    if edges.count() <= driver_budget_rows:
        eparts = collect_tables(edges)
        if not eparts:
            return out_schema.empty_table()
        return _rename(_components_minlabel(pa.concat_tables(eparts)))
    return _components_star(edges).map_batches(
        _rename, batch_format="pyarrow", zero_copy_batch=True
    )


def _bucketed_semantic_edges(
    qds: rd.Dataset,
    cent: np.ndarray,
    assign_probes: int,
    edge_mask,
    edge_schema: pa.Schema,
    row_block: int = 4096,
) -> rd.Dataset:
    """IVF-bucketed candidate generation for ``embedding_dup_components``:
    each quantized vector fans out to its ``assign_probes`` nearest
    centroid buckets (carrying its probe list), a bucket-keyed shuffle
    co-locates candidates, and the exact int64 edge test runs within
    each bucket only — row-blocked so a (row_block x bucket) int64
    matmul bounds peak memory regardless of bucket size. A pair sharing
    several buckets is emitted exactly once: only by the bucket equal to
    min(probes_a & probes_b), which both sides can compute in-group.

    Partitioning assumption (documented contract): one bucket's rows fit
    a worker — size ``n_centroids`` ~ corpus_rows / target_bucket_rows.
    The shuffle ships assign_probes x (quantized vector + probe list)
    rows; nothing corpus-sized touches the driver."""
    p = max(1, int(assign_probes))
    p = min(p, len(cent))
    cent_ref = ray.put(cent)

    def fan_out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "iv": pa.array([], pa.list_(pa.int64())),
                    "probes": pa.array([], pa.list_(pa.int64())),
                }
            )
        cent_v = ray.get(cent_ref)
        mat = _embed_matrix(t["iv"])  # float64 view of the int lists
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        sims = (mat / norms[:, None]) @ cent_v.T
        # top-p centroids per row, ordered ascending by centroid id for a
        # deterministic probe list (ranking order is irrelevant to the
        # min-intersection rule)
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p].astype(np.int64)
        top = np.sort(top, axis=1)
        n = t.num_rows
        probe_list = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * p), pa.array(top.reshape(-1))
        )
        rep = np.repeat(np.arange(n), p)
        out = pa.table(
            {
                "bucket": pa.array(top.reshape(-1), pa.int64()),
                "vec_id": pc.cast(t["vec_id"], pa.int64()).take(pa.array(rep)),
                "iv": t["iv"].combine_chunks().take(pa.array(rep)),
                "probes": probe_list.take(pa.array(rep)),
            }
        )
        return out

    def bucket_edges(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return edge_schema.empty_table()
        bucket = int(g["bucket"][0].as_py())
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embed_matrix(g["iv"]).astype(np.int64)
        nrm = (mat * mat).sum(axis=1)
        probes = _embed_matrix(g["probes"]).astype(np.int64)  # (m, p)
        m = len(ids)
        big = np.iinfo(np.int64).max
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for lo in range(0, m, row_block):
            hi = min(lo + row_block, m)
            ok = edge_mask(ids[lo:hi], mat[lo:hi], nrm[lo:hi], ids, mat, nrm)
            if not ok.any():
                continue
            # exactly-once emission: this bucket owns the pair iff it is
            # the MIN of the two probe sets' intersection
            shared = np.full((hi - lo, m), big, dtype=np.int64)
            for s in range(probes.shape[1]):
                for u in range(probes.shape[1]):
                    mask = probes[lo:hi, s][:, None] == probes[:, u][None, :]
                    np.minimum(
                        shared,
                        np.where(mask, probes[lo:hi, s][:, None], big),
                        out=shared,
                    )
            ok &= shared == bucket
            ri, ci = np.nonzero(ok)
            if len(ri):
                out_a.append(ids[lo:hi][ri])
                out_b.append(ids[ci])
        if not out_a:
            return edge_schema.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return (
        qds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_edges, batch_format="pyarrow")
    )


def decontaminate_embeddings_semantic(
    sf_dir: str, threshold_sq: tuple[int, int] = (49, 400)
) -> rd.Dataset:
    """Semantic decontamination — the embedding-space cousin of the
    n-gram ``decontaminate_docs`` family (SemDeDup / benchmark-leakage
    sweeps run this before training): every corpus vector is checked
    against the BENCHMARK set (label 0 — the held-out-eval stand-in in
    the synthetic table) and flagged when its exact cosine meets the
    threshold against ANY benchmark vector. Returns per corpus vector
    (vec_id, n_bench_hits, contaminated) — verdicts stay visible like
    ``gopher_quality_filter``'s, so the drop is auditable.

    Exactness: the same milli-unit integer predicate as
    ``embedding_dup_components`` (``_quantize_milli`` + den*dot^2 >=
    num*nn_a*nn_b with dot > 0), so the oracle is HUGEINT-exact.
    ``threshold_sq`` defaults to cos >= 0.35 (49/400) — the dup-family
    threshold, non-vacuous on the synthetic corpus (49/450 corpus
    vectors flag at sf0.01); production decontamination runs ~0.9+.

    Scale shape (the gram-set decontamination contract): ONE pass
    collects the benchmark rows (bounded by the BENCHMARK size, the
    small side by construction — never the corpus) fused with the
    overflow-guard stats partials; the benchmark matrix broadcasts via
    ``ray.put``; the verdict pass is shuffle-free — one int64 matmul
    block per corpus batch, O(corpus x bench) compute spread across the
    cluster with nothing corpus-scale on the driver. A null label is a
    CORPUS row (SQL ``label IS DISTINCT FROM 0``), a null vec_id /
    embedding drops on both sides."""
    import ray

    from laketide.functions.reads import collect_tables

    num, den = threshold_sq
    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("n_bench_hits", pa.int64()),
            ("contaminated", pa.bool_()),
        ]
    )
    ds = _emb(sf_dir, columns=["vec_id", "embedding", "label"])

    def q_with_label(t: pa.Table) -> pa.Table:
        # same null drops as _quantize_milli, applied FIRST so the label
        # column stays row-aligned with the quantized output
        t = _drop_null_embeddings(t)
        t = t.filter(pc.is_valid(t["vec_id"]))
        q = _quantize_milli(t)
        return q.append_column("label", pc.cast(t["label"], pa.int64()))

    qds = ds.map_batches(
        q_with_label, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # one pass: benchmark rows + guard-stat partials (the fused
    # arrivals_and_stats shape from embedding_dup_edges_incremental —
    # stats ride as vec_id-null marker rows)
    def bench_and_stats(t: pa.Table) -> pa.Table:
        bench = t.filter(pc.equal(t["label"], 0))
        m = _embed_matrix(t["iv"]).astype(np.int64)
        stats = pa.table(
            {
                "vec_id": pa.array([None], pa.int64()),
                "iv": pa.array(
                    [
                        [
                            int(np.abs(m).max()) if m.size else 0,
                            int(m.shape[1]) if m.size else 0,
                            int(t.num_rows),
                        ]
                    ],
                    pa.list_(pa.int64()),
                ),
                "label": pa.array([None], pa.int64()),
            }
        )
        return pa.concat_tables([bench.cast(stats.schema), stats])

    parts = [
        p
        for p in collect_tables(
            qds.map_batches(
                bench_and_stats, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        if p.num_rows
    ]
    if not parts:
        return rd.from_arrow(out_schema.empty_table())
    both = pa.concat_tables(parts)
    svals = both.filter(pc.is_null(both["vec_id"]))["iv"].to_pylist()
    if sum(int(s[2]) for s in svals) == 0:
        return rd.from_arrow(out_schema.empty_table())
    _check_quant_bound(
        num, den,
        max(int(s[0]) for s in svals),
        max(int(s[1]) for s in svals),
    )
    bench_t = both.filter(pc.is_valid(both["vec_id"]))
    bmat = _embed_matrix(bench_t["iv"]).astype(np.int64)
    bnn = np.einsum("ij,ij->i", bmat, bmat)
    bref = ray.put((bmat, bnn))
    numv, denv = np.int64(num), np.int64(den)

    def verdict_block(t: pa.Table) -> pa.Table:
        # corpus = NOT the benchmark label; null label is corpus
        t = t.filter(
            pc.fill_null(pc.not_equal(t["label"], 0), True)
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        bm, bn = ray.get(bref)
        cmat = _embed_matrix(t["iv"]).astype(np.int64)
        cnn = np.einsum("ij,ij->i", cmat, cmat)
        if bm.size:
            dots = cmat @ bm.T  # exact int64 (guarded above)
            ok = (dots > 0) & (denv * dots * dots >= numv * np.outer(cnn, bn))
            hits = ok.sum(axis=1).astype(np.int64)
        else:
            hits = np.zeros(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "n_bench_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(hits > 0),
            }
        )

    return qds.map_batches(
        verdict_block, batch_format="pyarrow", zero_copy_batch=True
    )


def knn_batch_cosine(
    sf_dir: str, k: int = 10, n_queries: int = 8
) -> pa.Table:
    """Batched brute-force cosine top-k: ONE corpus pass serves a whole
    query MATRIX (the production retrieval shape — queries arrive in
    batches, and re-scanning the corpus per query multiplies the read
    cost by |queries|). Queries are the deterministic
    ``query_vector(seed=_QUERY_SEED + i)`` family; returns
    (query_id, vec_id) — ids only, the ``knn_cosine`` robustness rule
    (float scores are summation-order-sensitive; the id ranking is not,
    for non-degenerate data).

    Scale shape: the normalized query matrix broadcasts via ``ray.put``
    (|queries| x dim — bounded by the request batch, never the corpus);
    each corpus batch computes one (n x Q) matmul and emits at most
    k rows PER QUERY (the ``_local_topk`` boundary-tie rule per
    column), so the driver merge folds Q x k x num_blocks tiny rows —
    no global sort, no per-query rescan."""
    qmat = np.stack(
        [query_vector(seed=_QUERY_SEED + i) for i in range(n_queries)]
    )
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put(qmat)

    empty = {
        "query_id": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    }

    def score(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t)
        t = t.filter(pc.is_valid(t["vec_id"]))
        if t.num_rows == 0:
            return pa.table(empty)
        qm = ray.get(q_ref)
        mat = _embed_matrix(t["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        scores = (mat @ qm.T) / norms[:, None]  # (n, Q)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qcol, icol, scol = [], [], []
        for qi in range(scores.shape[1]):
            tids, tsc = _local_topk(ids, scores[:, qi], k)
            qcol.append(np.full(len(tids), qi, dtype=np.int64))
            icol.append(tids)
            scol.append(tsc)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qcol), pa.int64()),
                "vec_id": pa.array(np.concatenate(icol), pa.int64()),
                "score": pa.array(np.concatenate(scol), pa.float64()),
            }
        )

    scored = _emb(sf_dir, ["vec_id", "embedding"]).map_batches(
        score, batch_format="pyarrow"
    )
    from laketide.functions.dedup import _gather_nonempty_blocks

    parts = _gather_nonempty_blocks(scored.materialize())
    if not parts:
        return pa.table({"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64())})
    t = pa.concat_tables(parts, promote_options="default")
    qs = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = t["score"].to_numpy(zero_copy_only=False)
    out_q, out_i = [], []
    for qi in range(n_queries):
        m = qs == qi
        tids, _ = _local_topk(ids[m], sc[m], k)
        out_q.append(np.full(len(tids), qi, dtype=np.int64))
        out_i.append(tids)
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_i), pa.int64()),
        }
    )
