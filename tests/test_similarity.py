"""Similarity search: per-batch top-k equals the brute-force global
order; banded-LSH embedding near-dup finds planted high-cosine pairs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from laketide.functions import similarity as S


@pytest.fixture(scope="module")
def planted_embeddings(tmp_path_factory):
    d = tmp_path_factory.mktemp("emb")
    rng = np.random.RandomState(11)
    base = rng.standard_normal((100, S.EMBED_DIM))
    vecs, plants = list(base), []
    next_id = len(vecs)
    for p in range(10):
        v = base[p * 5]
        dup = v + 0.02 * rng.standard_normal(S.EMBED_DIM)  # cosine ~0.999
        vecs.append(dup)
        plants.append((p * 5, next_id))
        next_id += 1
    t = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
            "label": pa.array([i % 10 for i in range(len(vecs))], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d), plants, np.stack(vecs)


def test_knn_topk_matches_bruteforce(planted_embeddings):
    sf_dir, _, mat = planted_embeddings
    q = S.query_vector()
    qn = q / np.linalg.norm(q)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = unit @ qn
    ref = np.lexsort((np.arange(len(mat)), -scores))[:10].tolist()
    got = S.knn_cosine(sf_dir, k=10)["vec_id"].to_pylist()
    assert got == ref


def test_local_topk_boundary_ties():
    ids = np.array([5, 3, 9, 1, 7], dtype=np.int64)
    scores = np.array([1.0, 0.5, 0.5, 0.5, 0.2])
    top_ids, top_scores = S._local_topk(ids, scores, 3)
    # ties at 0.5 break by smaller vec_id: 1 then 3 (9 excluded)
    assert top_ids.tolist() == [5, 1, 3]


def test_embedding_near_dup_planted_recall(planted_embeddings):
    sf_dir, plants, _ = planted_embeddings
    out = S.embedding_near_dup(sf_dir, threshold=0.95)
    found = {(a, b) for a, b in zip(out["vec_a"].to_pylist(), out["vec_b"].to_pylist())}
    for a, b in plants:
        assert (a, b) in found or (b, a) in found, f"planted pair {(a, b)} missed"


def test_embedding_near_dup_broadcast_and_join_paths_agree(
    planted_embeddings, monkeypatch
):
    """The adaptive small-side broadcast verify and the shuffle-join
    verify (the 100 TB fallback) must return identical pairs."""
    sf_dir, _, _ = planted_embeddings
    fast = S.embedding_near_dup(sf_dir, threshold=0.95)
    monkeypatch.setenv("LAKETIDE_NEARDUP_BROADCAST_MAX", "0")  # force joins
    slow = S.embedding_near_dup(sf_dir, threshold=0.95)
    assert fast.equals(slow)
    # all reported pairs genuinely exceed the threshold
    assert all(c >= 0.95 for c in fast["cosine"].to_pylist())


def test_knn_ivf_recall_vs_bruteforce(planted_embeddings):
    """IVF probe (4 of 16 centroid buckets) must recover most of the
    brute-force top-10 for the deterministic query; deterministic data +
    seeded k-means => a stable recall number."""
    sf_dir, _, mat = planted_embeddings
    q = S.query_vector()
    qn = q / np.linalg.norm(q)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = unit @ qn
    ref = set(np.lexsort((np.arange(len(mat)), -scores))[:10].tolist())
    got = set(S.knn_ivf(sf_dir, k=10, nprobe=6)["vec_id"].to_pylist())
    recall = len(got & ref) / 10
    # 110 unclustered gaussian vectors are IVF's worst case (neighbors
    # spread uniformly over buckets) — at sf0.01 the same op measures
    # recall 0.9; this asserts the deterministic fixture floor
    assert recall >= 0.6, f"IVF recall {recall} too low"
    # every returned id must be genuinely high-scoring (no junk)
    floor = sorted((scores[i] for i in ref))[0]
    assert all(scores[i] >= floor - 0.2 for i in got)


def test_kmeans_cluster_stats_partition_and_determinism():
    """Cluster sizes must partition the non-null-embedding corpus, the
    majority label must be consistent with a driver-side recompute, and
    two runs must be identical (seeded training + argmax assignment)."""
    import numpy as np
    import pyarrow.compute as pc

    from laketide.functions.similarity import (
        _drop_null_embeddings,
        _embed_matrix,
        _train_centroids,
        kmeans_cluster_stats,
    )

    sf = "/root/testdata/sf0.01"
    a = kmeans_cluster_stats(sf)
    b = kmeans_cluster_stats(sf)
    assert a.to_pydict() == b.to_pydict()

    import pyarrow.parquet as pq

    emb = _drop_null_embeddings(pq.read_table(f"{sf}/embeddings.parquet"))
    assert sum(a["n_vecs"].to_pylist()) == emb.num_rows
    assert all(x >= 1 for x in a["top_label_n"].to_pylist())

    # driver recompute of the assignment -> same per-cluster majority
    cent = _train_centroids(sf, 16)
    mat = _embed_matrix(emb["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    assign = ((mat / norms[:, None]) @ cent.T).argmax(axis=1)
    labels = pc.cast(emb["label"], "int64").to_numpy(zero_copy_only=False)
    got = dict(zip(a["cluster"].to_pylist(), a["top_label"].to_pylist()))
    for c in set(assign.tolist()):
        ls, cnts = np.unique(labels[assign == c], return_counts=True)
        order = np.lexsort((ls, -cnts))  # count desc, label asc tie-break
        assert got[int(c)] == int(ls[order[0]]), c
