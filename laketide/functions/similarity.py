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
import ray
import ray.data as rd

EMBED_DIM = 64
_QUERY_SEED = 123


def query_vector(dim: int = EMBED_DIM, seed: int = _QUERY_SEED) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal(dim)


def query_vector_sql_literal(dim: int = EMBED_DIM, seed: int = _QUERY_SEED) -> str:
    """The same query vector as a DuckDB list literal (float64 repr
    round-trips exactly)."""
    q = query_vector(dim, seed)
    return "[" + ", ".join(repr(float(x)) for x in q) + "]"


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def knn_cosine(sf_dir: str, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k ids for the deterministic query vector.
    Returns ids only (float scores are engine-order-sensitive; the id
    ranking is robust for non-degenerate data)."""
    q = query_vector()
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            scores = (mat @ self.q) / norms
            return pa.table(
                {"vec_id": t["vec_id"], "score": pa.array(scores, pa.float64())}
            )

    scored = _emb(sf_dir).map_batches(Score, batch_format="pyarrow", concurrency=2)
    top = scored.sort(["score", "vec_id"], descending=[True, False]).limit(k).to_pandas()
    return pa.table({"vec_id": pa.array(top["vec_id"].tolist(), pa.int64())})


def knn_lsh(sf_dir: str, k: int = 10, n_planes: int = 8, probe_hamming: int = 1) -> pa.Table:
    """LSH-bucketed ANN: random-hyperplane signatures partition vectors
    into 2^n_planes buckets; only buckets within ``probe_hamming`` of the
    query signature are scanned (multi-probe). At scale the bucket id is
    the shuffle/partition key and the probe touches a fraction of data."""
    rng = np.random.RandomState(777)
    planes = rng.standard_normal((n_planes, EMBED_DIM))
    q = query_vector()
    qn = q / np.linalg.norm(q)
    qsig = int(np.packbits((planes @ q > 0).astype(np.uint8), bitorder="little")[0])
    probe = {qsig}
    if probe_hamming >= 1:
        probe |= {qsig ^ (1 << i) for i in range(n_planes)}
    state = ray.put((planes, qn, frozenset(probe)))

    class BucketScore:
        def __init__(self):
            self.planes, self.q, self.probe = ray.get(state)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            sigs = np.packbits((mat @ self.planes.T > 0).astype(np.uint8), axis=1, bitorder="little")[:, 0]
            mask = np.isin(sigs, list(self.probe))
            if not mask.any():
                return pa.table({"vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
            sub = mat[mask]
            norms = np.linalg.norm(sub, axis=1)
            norms[norms == 0] = 1.0
            scores = (sub @ self.q) / norms
            ids = t["vec_id"].to_numpy(zero_copy_only=False)[mask]
            return pa.table({"vec_id": pa.array(ids, pa.int64()), "score": pa.array(scores, pa.float64())})

    scored = _emb(sf_dir).map_batches(BucketScore, batch_format="pyarrow", concurrency=2)
    top = scored.sort(["score", "vec_id"], descending=[True, False]).limit(k).to_pandas()
    return pa.table({"vec_id": pa.array(top["vec_id"].tolist(), pa.int64())})


def embedding_label_count(sf_dir: str) -> rd.Dataset:
    from ray.data.aggregate import Count

    return _emb(sf_dir).select_columns(["label"]).groupby("label").aggregate(Count(alias_name="n"))


def embedding_near_dup(sf_dir: str, threshold: float = 0.92, n_planes: int = 10) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    buckets candidate vectors (collision on the full signature), exact
    cosine verifies. The bucket id is the shuffle key at scale — only
    same-bucket pairs are compared. Deterministic (seeded planes)."""
    rng = np.random.RandomState(4242)
    planes = rng.standard_normal((n_planes, EMBED_DIM))
    planes_ref = ray.put(planes)

    class Sign:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            bits = (mat @ self.planes.T > 0).astype(np.uint8)
            sig = np.packbits(bits, axis=1, bitorder="little")[:, :2]
            bucket = sig[:, 0].astype(np.int64) | (sig[:, 1].astype(np.int64) << 8)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            return pa.table(
                {
                    "bucket": pa.array(bucket, pa.int64()),
                    "vec_id": t["vec_id"],
                    "unit": pa.array(list(unit), pa.list_(pa.float64())),
                }
            )

    import pandas as pd

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id")
        ids = df["vec_id"].to_numpy()
        units = np.stack(df["unit"].to_numpy())
        out_a, out_b, out_c = [], [], []
        if len(ids) > 1:
            sims = units @ units.T
            iu = np.triu_indices(len(ids), k=1)
            hits = sims[iu] >= threshold
            out_a = ids[iu[0][hits]].tolist()
            out_b = ids[iu[1][hits]].tolist()
            out_c = sims[iu][hits].round(6).tolist()
        return pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cosine": out_c})

    signed = _emb(sf_dir).map_batches(Sign, batch_format="pyarrow", concurrency=2)
    out = signed.groupby("bucket").map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty or "vec_a" not in out.columns:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    out = out.drop_duplicates(["vec_a", "vec_b"]).sort_values(["vec_a", "vec_b"])
    return pa.table(
        {
            "vec_a": pa.array(out["vec_a"].astype("int64")),
            "vec_b": pa.array(out["vec_b"].astype("int64")),
            "cosine": pa.array(out["cosine"].astype("float64")),
        }
    )
