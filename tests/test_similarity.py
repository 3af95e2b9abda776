"""Similarity search: per-batch top-k equals the brute-force global
order; banded-LSH embedding near-dup finds planted high-cosine pairs."""

import os

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


def test_ivf_index_persisted_reused_and_fingerprinted(planted_embeddings, tmp_path):
    """The IVF index is a PERSISTED lake artifact: the first knn_ivf
    builds it (atomic publish), the second serves from it unchanged
    (same INDEX.json inode mtime, identical results); a changed
    embeddings file fingerprints to a DIFFERENT artifact so a stale
    index can never serve; the served result cross-checks against
    knn_cosine (every returned id scores near the exact top-k floor)."""
    import json
    import shutil

    sf_dir, _, mat = planted_embeddings
    idx = S.ivf_index_build(sf_dir, n_centroids=16)
    meta_path = os.path.join(idx, "INDEX.json")
    assert os.path.exists(meta_path)
    with open(meta_path) as fh:
        meta = json.load(fh)
    assert meta["rows"] == len(mat)  # every non-null vector indexed once
    # bucket files exist and partition the corpus
    listed = [f for files in meta["buckets"].values() for f in files]
    assert listed and all(os.path.exists(os.path.join(idx, f)) for f in listed)

    mtime = os.path.getmtime(meta_path)
    r1 = S.knn_ivf(sf_dir, k=10, nprobe=6)
    r2 = S.knn_ivf(sf_dir, k=10, nprobe=6)  # served from the artifact
    assert os.path.getmtime(meta_path) == mtime  # no rebuild
    assert r1["vec_id"].to_pylist() == r2["vec_id"].to_pylist()

    # knn_cosine cross-check: served ids are genuinely high-scoring
    qn = S.query_vector()
    qn = qn / np.linalg.norm(qn)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = unit @ qn
    exact = S.knn_cosine(sf_dir, k=10)
    floor = min(scores[i] for i in exact["vec_id"].to_pylist())
    assert all(scores[i] >= floor - 0.2 for i in r1["vec_id"].to_pylist())

    # a CHANGED corpus fingerprints to a different artifact dir
    d2 = tmp_path / "sf2"
    d2.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"), str(d2 / "embeddings.parquet")
    )
    os.utime(str(d2 / "embeddings.parquet"), (1, 1))
    assert S.ivf_index_build(str(d2)) != idx


def test_embedding_dup_components_planted(tmp_path):
    """Exact semantic clustering: two planted cosine-similar groups form
    two components labeled by their min vec_id; an isolated vector and a
    null embedding emit nothing; transitivity chains A~B~C into one
    component even when A~C alone is below threshold."""
    import pyarrow.parquet as pq

    from laketide.functions.similarity import embedding_dup_components

    rng = np.random.RandomState(3)
    dim = 64

    def jitter(v, eps):
        w = v + eps * rng.randn(dim)
        return (w / np.linalg.norm(w)).astype(np.float32)

    a = rng.randn(dim); a /= np.linalg.norm(a)
    b = rng.randn(dim); b /= np.linalg.norm(b)
    vecs = [
        jitter(a, 0.01),   # 0: cluster A
        jitter(a, 0.01),   # 1: cluster A
        jitter(a, 0.01),   # 2: cluster A
        jitter(b, 0.01),   # 3: cluster B
        jitter(b, 0.01),   # 4: cluster B
        (rng.randn(dim) / 10).astype(np.float32),  # 5: isolated
        None,              # 6: null embedding -> excluded
    ]
    t = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(
                [None if v is None else [float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = embedding_dup_components(str(tmp_path))
    comp = {r["vec_id"]: r["component"] for r in out.to_pylist()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_embedding_dup_components_bucketed_matches_broadcast(tmp_path):
    """Broadcast-vs-bucketed equivalence on a planted near-dup corpus:
    4 tight clusters (cos ~0.999 within) + isolated vectors + a null.
    The bucketed path (IVF co-assignment + in-bucket exact int64 edge
    tests + min-shared-bucket exactly-once emission) must produce the
    SAME components as the complete broadcast path — recall 1.0 in the
    near-duplicate regime the scale path is built for."""
    from laketide.functions.similarity import embedding_dup_components

    rng = np.random.RandomState(7)
    dim = S.EMBED_DIM
    vecs: list = []
    expected: dict[int, int] = {}
    vid = 0
    for c in range(4):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        first = vid
        for _ in range(8):
            w = center + 0.01 * rng.standard_normal(dim)
            vecs.append((w / np.linalg.norm(w)).astype(np.float64))
            expected[vid] = first
            vid += 1
    for _ in range(5):  # isolated: orthogonal-ish noise, below threshold
        vecs.append((rng.standard_normal(dim) / 50.0).astype(np.float64))
        vid += 1
    t = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs) + 1)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs] + [None], pa.list_(pa.float64())
            ),
            "label": pa.array([0] * (len(vecs) + 1), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    broad = embedding_dup_components(str(tmp_path), path="broadcast")
    buck = embedding_dup_components(
        str(tmp_path), path="bucketed", n_centroids=4, assign_probes=2
    )
    bd = {r["vec_id"]: r["component"] for r in broad.to_pylist()}
    bk = {r["vec_id"]: r["component"] for r in buck.to_pylist()}
    # isolated vectors are too short to pass the 0.35 threshold against
    # anything, so only the planted clusters appear — and identically
    assert bd == expected
    assert bk == bd
    # auto switches to the bucketed path above the broadcast budget and
    # still agrees
    auto = embedding_dup_components(
        str(tmp_path), path="auto", broadcast_budget_rows=4, n_centroids=4
    )
    assert {r["vec_id"]: r["component"] for r in auto.to_pylist()} == bd


def test_artifact_root_rejects_untrusted_dirs(tmp_path, monkeypatch):
    """The artifact cache root must be per-user 0700 and never trust a
    squatted path: a plain file, a foreign-looking permission set
    (group/other-writable), or a symlink in its place raises instead of
    silently serving attacker-controlled artifacts; the env override
    wins for managed setups."""
    import os
    import stat

    from laketide.functions.artifacts import _ensure_private_dir, artifact_root

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        root = artifact_root("minhash")
        base = os.path.dirname(root)
        assert base.startswith(str(tmp_path))
        assert stat.S_IMODE(os.stat(base).st_mode) == 0o700
        # idempotent reuse of our own private dir
        assert artifact_root("minhash") == root

        # squatted plain file
        f = tmp_path / "squat-file"
        f.write_text("x")
        with pytest.raises(RuntimeError, match="not a directory"):
            _ensure_private_dir(str(f))
        # group/other-writable dir
        d = tmp_path / "loose"
        d.mkdir()
        os.chmod(str(d), 0o777)
        with pytest.raises(RuntimeError, match="writable"):
            _ensure_private_dir(str(d))
        # symlink to elsewhere
        target = tmp_path / "target"
        target.mkdir()
        link = tmp_path / "link"
        os.symlink(str(target), str(link))
        with pytest.raises(RuntimeError, match="not a directory"):
            _ensure_private_dir(str(link))

        # operator override bypasses the per-user policy
        managed = tmp_path / "managed"
        monkeypatch.setenv("LAKETIDE_INDEX_DIR", str(managed))
        assert artifact_root("ivf") == str(managed / "ivf")
    finally:
        tempfile.tempdir = None


def test_embedding_lsh_signature_artifact_equal_output(planted_embeddings):
    """embedding_near_dup(from_index=True) serves the hyperplane
    signatures from the persisted artifact and must return exactly the
    direct path's pairs (non-vacuous: the planted corpus produces
    near-dups); the rebuild call reuses the published artifact."""
    import shutil

    from laketide.functions.similarity import (
        _emblsh_index_dir,
        embedding_lsh_signature_build,
    )

    sf_dir, plants, _ = planted_embeddings
    shutil.rmtree(_emblsh_index_dir(sf_dir), ignore_errors=True)
    direct = {
        (a, b, c)
        for a, b, c in zip(
            *[S.embedding_near_dup(sf_dir, threshold=0.95)[k].to_pylist()
              for k in ("vec_a", "vec_b", "cosine")]
        )
    }
    idx = embedding_lsh_signature_build(sf_dir)
    assert os.path.exists(os.path.join(idx, "INDEX.json"))
    mtime = os.path.getmtime(os.path.join(idx, "INDEX.json"))
    via_index = {
        (a, b, c)
        for a, b, c in zip(
            *[S.embedding_near_dup(sf_dir, threshold=0.95, from_index=True)[k].to_pylist()
              for k in ("vec_a", "vec_b", "cosine")]
        )
    }
    assert via_index == direct and direct
    assert embedding_lsh_signature_build(sf_dir) == idx
    assert os.path.getmtime(os.path.join(idx, "INDEX.json")) == mtime
    shutil.rmtree(idx, ignore_errors=True)


def test_embedding_dup_edges_incremental_exact_and_once(tmp_path):
    """The incremental exact edge scan equals a numpy brute-force
    reference restricted to arrival pairs (>=1 side with vec_id % 20 ==
    0) — no recall caveat — and each unordered pair is emitted exactly
    once (new x new pairs are visible from both matmul directions; the
    broadcast_id < batch_id rule must dedup them)."""
    import pyarrow.parquet as _pq

    rng = np.random.RandomState(13)
    base = rng.standard_normal((80, S.EMBED_DIM))
    vecs = list(base)
    for p in range(8):
        vecs.append(base[p * 5] + 0.02 * rng.standard_normal(S.EMBED_DIM))
    mat = np.stack(vecs)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)  # unit vectors
    t = pa.table(
        {
            "vec_id": pa.array(list(range(len(mat))), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float64())),
            "label": pa.array([i % 4 for i in range(len(mat))], pa.int64()),
        }
    )
    _pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    # engine-identical quantization (half-away-from-zero)
    iv = (np.sign(mat) * np.floor(np.abs(mat.astype(np.float64) * 1000.0) + 0.5)).astype(np.int64)
    nn = np.einsum("ij,ij->i", iv, iv)
    dots = iv @ iv.T
    n = len(iv)
    expect = set()
    for a in range(n):
        for b in range(a + 1, n):
            if a % 20 and b % 20:
                continue
            d = int(dots[a, b])
            if d > 0 and 400 * d * d >= 49 * int(nn[a]) * int(nn[b]):
                expect.add((a, b))
    got = [
        (r["vec_a"], r["vec_b"])
        for r in S.embedding_dup_edges_incremental(str(tmp_path)).take_all()
    ]
    assert len(got) == len(set(got)), "duplicate pair emitted"
    assert set(got) == expect
    # planted pair (0, 80): both ends arrival-slice, cosine ~0.999
    assert (0, 80) in set(got)


def test_decontaminate_embeddings_semantic_planted(tmp_path):
    """A corpus vector aligned with a benchmark (label-0) vector flags
    with the right hit count; an orthogonal one stays clean; a
    null-label vector is CORPUS (SQL IS DISTINCT FROM), and benchmark
    rows never appear in the output."""
    import pyarrow.parquet as _pq

    from laketide.functions.similarity import decontaminate_embeddings_semantic

    rows = [
        # two identical benchmark vectors along e0
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0], "label": 0},
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0], "label": 0},
        # corpus: aligned with the benchmark -> 2 hits
        {"vec_id": 2, "embedding": [0.9, 0.1, 0.0], "label": 3},
        # corpus: orthogonal -> clean
        {"vec_id": 3, "embedding": [0.0, 0.0, 1.0], "label": 3},
        # null label = corpus; anti-aligned (dot < 0) -> clean
        {"vec_id": 4, "embedding": [-1.0, 0.0, 0.0], "label": None},
        # null embedding / null vec_id: dropped on both sides
        {"vec_id": 5, "embedding": None, "label": 3},
        {"vec_id": None, "embedding": [1.0, 0.0, 0.0], "label": 3},
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r["embedding"] for r in rows], pa.list_(pa.float64())
            ),
            "label": pa.array([r["label"] for r in rows], pa.int64()),
        }
    )
    _pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = {
        r["vec_id"]: r
        for r in decontaminate_embeddings_semantic(str(tmp_path)).take_all()
    }
    assert set(out) == {2, 3, 4}  # corpus only, benchmark rows absent
    assert out[2]["contaminated"] and out[2]["n_bench_hits"] == 2
    assert not out[3]["contaminated"] and out[3]["n_bench_hits"] == 0
    assert not out[4]["contaminated"]  # dot < 0 can never flag


def test_knn_batch_cosine_matches_single_query():
    """query_id 0 of the batched pass IS knn_cosine's query (same seed
    family) — the one-pass batch must return the identical id ranking;
    every query returns exactly k ids."""
    from laketide.functions.similarity import knn_batch_cosine, knn_cosine

    sf = "/root/testdata/sf0.001"
    k = 7
    batch = knn_batch_cosine(sf, k=k, n_queries=3)
    single = knn_cosine(sf, k=k)["vec_id"].to_pylist()
    per_q = {}
    for r in batch.to_pylist():
        per_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert set(per_q) == {0, 1, 2}
    assert all(len(v) == k for v in per_q.values())
    assert per_q[0] == single  # ordered identically (score desc, id)
