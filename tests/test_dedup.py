"""Dedup suite: planted near-duplicates must be found (recall=1.0 on
plants), hot LSH buckets are capped with star topology (logged, bounded),
and the vectorized hash kernels are deterministic."""

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from laketide.functions import dedup

SF_DIR = "/root/testdata/sf0.01"

_WORDS = [f"w{i:03d}" for i in range(400)]


def _rand_text(rng, n=60):
    return " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), size=n))


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """200 distinct docs + 10 planted near-dup pairs (one word changed)."""
    d = tmp_path_factory.mktemp("planted")
    rng = np.random.RandomState(7)
    texts, plants = [], []
    for i in range(200):
        texts.append(_rand_text(rng))
    next_id = len(texts)
    for p in range(10):
        base = texts[p * 3]
        toks = base.split()
        toks[len(toks) // 2] = "zzchanged"
        texts.append(" ".join(toks))
        plants.append((p * 3, next_id))
        next_id += 1
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d), plants


def test_minhash_planted_recall(planted_docs):
    sf_dir, plants = planted_docs
    v = dedup.minhash_dedup_verified(sf_dir, threshold=0.7).to_pandas()
    found = set(zip(v["doc_a"], v["doc_b"]))
    for a, b in plants:
        assert (a, b) in found or (b, a) in found, f"planted pair {(a, b)} missed"
    # jaccard of a one-word-changed 60-token doc is high but < 1
    jmap = {(r.doc_a, r.doc_b): r.jaccard for r in v.itertuples()}
    for a, b in plants:
        j = jmap.get((a, b), jmap.get((b, a)))
        assert 0.7 <= j < 1.0


def test_minhash_verify_survives_empty_schema_blocks(planted_docs, monkeypatch):
    """Regression (CORRECTNESS_r02): at sf0.01 the band-groupby emits
    zero-row blocks with an EMPTY schema; ``pa.concat_tables`` over the
    raw block list raised ``ArrowInvalid: Schema at index 2 was
    different``. The planted fixture never produces such a block, so
    inject one directly into the candidate Dataset and assert the verify
    path still returns the planted pairs."""
    import ray.data as rd

    sf_dir, plants = planted_docs
    real = dedup.minhash_lsh_candidates

    def with_empty_block(d):
        cands = real(d)
        pairs = pa.table(
            {
                "doc_a": cands.to_pandas()["doc_a"].astype("int64"),
                "doc_b": cands.to_pandas()["doc_b"].astype("int64"),
            }
        )
        # pa.table({}) is a zero-row, zero-COLUMN table — exactly the
        # empty-schema block shape Ray Data's shuffle emits
        return rd.from_arrow([pairs.slice(0, 1), pa.table({}), pairs.slice(1)])

    monkeypatch.setattr(dedup, "minhash_lsh_candidates", with_empty_block)
    v = dedup.minhash_dedup_verified(sf_dir, threshold=0.7).to_pandas()
    found = set(zip(v["doc_a"], v["doc_b"]))
    for a, b in plants:
        assert (a, b) in found or (b, a) in found


def test_minhash_verify_all_blocks_empty(monkeypatch, tmp_path):
    """All-empty candidate blocks (no pairs at all) must yield an empty
    typed result, not a crash."""
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha beta gamma delta", "wholly different words here"]),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(
        dedup,
        "minhash_lsh_candidates",
        lambda d: rd.from_arrow([pa.table({}), pa.table({})]),
    )
    ds = dedup.minhash_dedup_verified(str(tmp_path), threshold=0.7)
    assert ds.count() == 0
    # NB: Dataset.to_pandas() drops column names at 0 rows; the Dataset
    # schema itself is the contract
    assert sorted(ds.schema().names) == ["doc_a", "doc_b", "jaccard"]


def test_simhash_planted_recall(planted_docs):
    sf_dir, plants = planted_docs
    s = dedup.simhash_dedup(sf_dir, max_hamming=6).to_pandas()
    found = set(zip(s["doc_a"], s["doc_b"]))
    hit = sum((a, b) in found or (b, a) in found for a, b in plants)
    assert hit >= 8  # simhash is lossier than minhash; most plants found


def test_iter_buckets_boundaries_and_payload_alignment():
    """The shared multi-bucket core: boundaries split exactly on the key
    columns, singleton buckets are skipped, payload columns stay aligned
    with each other through the lexsort."""
    t = pa.table(
        {
            "band": pa.array([1, 0, 0, 1, 0, 2], pa.int64()),
            "bh": pa.array([5, 7, 7, 5, 7, 9], pa.int64()),
            "doc_id": pa.array([30, 10, 20, 40, 10, 99], pa.int64()),
            "aux": pa.array([300, 100, 200, 400, 101, 990], pa.int64()),
        }
    )
    got = [
        (ids.tolist(), aux.tolist())
        for ids, aux in dedup._iter_buckets(t, ["band", "bh"], ["doc_id", "aux"])
    ]
    # bucket (0,7): ids 10,10,20 sorted with aligned aux (dup id keeps
    # both rows — dedup is the caller's policy); bucket (1,5): 30,40;
    # bucket (2,9) is a singleton and must not appear
    assert got == [([10, 10, 20], [100, 101, 200]), ([30, 40], [300, 400])]
    assert list(dedup._iter_buckets(t.slice(0, 0), ["band", "bh"], ["doc_id"])) == []
    # one bucket spanning the whole batch
    one = pa.table(
        {
            "band": pa.array([0, 0, 0], pa.int64()),
            "bh": pa.array([1, 1, 1], pa.int64()),
            "doc_id": pa.array([3, 1, 2], pa.int64()),
        }
    )
    assert [ids.tolist() for (ids,) in dedup._iter_buckets(one, ["band", "bh"], ["doc_id"])] == [[1, 2, 3]]


def test_hot_bucket_capped_topology(tmp_path, caplog):
    """A bucket over the cap emits all-pairs among the first cap members
    plus representative-vs-rest — O(cap^2 + n), not O(n^2) — and logs
    the drop (no silent caps). The in-head pairs keep genuine duplicates
    connected even when a verify filter drops low-similarity rep edges."""
    cap = dedup._MAX_BUCKET
    n = cap + 44
    expected = cap * (cap - 1) // 2 + (n - cap)
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["identical content for every doc here"] * n),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    with caplog.at_level(logging.WARNING, logger="laketide.functions.dedup"):
        pairs = dedup.minhash_lsh_candidates(str(tmp_path)).to_pandas()
    assert len(pairs) == expected
    # tail members connect through the representative
    tail = pairs[pairs["doc_b"] >= cap]
    assert set(tail["doc_a"]) == {0} and len(tail) == n - cap
    # kernel check (map_groups runs in workers, caplog can't see them)
    ids = np.arange(n, dtype=np.int64)
    a, b = dedup._emit_pairs(ids, "test")
    assert len(a) == expected


def test_gram_hash_kernel_vectorized_matches_reference():
    """The vectorized k-gram kernel equals a straightforward per-doc
    reimplementation (boundary handling: short docs, empty docs)."""
    import pandas as pd

    texts = ["a b c d e", "a b", "x", "", "q r s", "a b c d e"]
    arr = pa.array(texts, pa.string())
    grams, counts = dedup._gram_hashes(arr, k=3)
    assert counts.tolist() == [3, 1, 1, 0, 1, 3]
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    def ref_doc(text):
        toks = text.split()
        h = pd.util.hash_array(np.array(toks, dtype=object), categorize=False).astype(
            np.uint64
        ) if toks else np.empty(0, np.uint64)
        L = len(toks)
        out = []
        if L == 0:
            return out
        # the scalar reference intentionally wraps mod 2^64, like the
        # vectorized kernel it checks
        with np.errstate(over="ignore"):
            for s in range(max(L - 2, 1)):
                g = np.uint64(0)
                for j in range(3):
                    v = h[s + j] if s + j < L else np.uint64(0)
                    g += v * dedup._K[j]
                out.append(int(g))
        return out

    for i, text in enumerate(texts):
        assert grams[offs[i] : offs[i + 1]].tolist() == ref_doc(text), text
    # identical docs produce identical gram sequences
    assert grams[offs[0] : offs[1]].tolist() == grams[offs[5] : offs[6]].tolist()


def test_simhash_kernel_matches_scalar_reference():
    texts = ["alpha beta gamma", "alpha beta gamma", "delta", ""]
    hasher = dedup.SimHasher()
    out = hasher.simhash_batch(pa.array(texts, pa.string()))
    assert out[0] == out[1] != 0
    assert out[3] == 0
    # scalar reference for one doc
    import pandas as pd

    toks = texts[0].split()
    h = pd.util.hash_array(np.array(toks, dtype=object), categorize=False).astype(np.uint64)
    acc = np.zeros(64, dtype=np.int64)
    for v in h:
        for bit in range(64):
            acc[bit] += 1 if (int(v) >> bit) & 1 else -1
    ref = np.uint64(0)
    for bit in range(64):
        if acc[bit] > 0:
            ref |= np.uint64(1) << np.uint64(bit)
    assert out[0] == ref


def test_doc_fingerprint_vectorized_matches_scalar(tmp_path):
    import pandas as pd
    import ray

    from laketide.functions import text as T

    texts = ["alpha beta gamma delta", "", "one", "alpha beta gamma delta"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = T.doc_fingerprint(str(tmp_path)).to_pandas().sort_values("doc_id")
    fps = out["fingerprint"].tolist()
    assert fps[0] == fps[3] and fps[1] == "0" * 16 and fps[0] != fps[2]

    # scalar rolling-hash reference (mod 2^64)
    def ref(text):
        h = 0
        for tok in text.split():
            th = int(
                pd.util.hash_array(np.array([tok], dtype=object), categorize=False)[0]
            )
            h = (h * 1_000_003 + th) % (1 << 64)
        return f"{h:016x}"

    for i, s in enumerate(texts):
        assert fps[i] == ref(s), texts[i]


def test_ngram_jaccard_join_exact_vs_bruteforce(tmp_path_factory):
    """Completeness + exactness of the prefix-filtered similarity join:
    the FULL pair listing at a low threshold (0.35 — below where LSH
    recall is dependable) must equal brute-force all-pairs trigram
    Jaccard, on a corpus with mid-similarity plants, exact duplicates,
    short (1-/2-token), empty and null docs."""
    d = tmp_path_factory.mktemp("njj")
    rng = np.random.RandomState(11)
    texts = [_rand_text(rng, n=60) for i in range(120)]
    # plants across the similarity spectrum: replacing k spaced tokens
    # of 60 kills ~3k of 58 trigrams -> J ~ (58-3k)/(58+3k): 0.90, 0.73,
    # 0.59, 0.41, 0.32 — straddling the 0.35 threshold
    for p, k in enumerate([1, 3, 5, 8, 10]):
        toks = texts[p * 9].split()
        for j in range(k):
            toks[(j * 5) % len(toks)] = f"alt{p}x{j}"
        texts.append(" ".join(toks))
    texts += [texts[4], "", "solo", "two tokens", "two tokens", None]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))

    def grams(s):
        toks = (s or "").split()
        if not toks:
            return frozenset()
        if len(toks) < 3:
            return frozenset([" ".join(toks)])
        return frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )

    gs = [grams(s) for s in texts]
    thr = 0.35
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            u = len(gs[a] | gs[b])
            if u and len(gs[a] & gs[b]) / u >= thr:
                want[(a, b)] = len(gs[a] & gs[b]) / u
    assert len(want) >= 4  # plants at k=2/6/10 + exact-dup pairs qualify

    out = dedup.ngram_jaccard_join(str(d), threshold=thr).to_pandas()
    got = {
        (int(r.doc_a), int(r.doc_b)): float(r.jaccard)
        for r in out.itertuples()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_components_minlabel_vs_star_equivalence():
    """The driver min-label fixpoint and the distributed star
    contraction must produce identical components — including multi-hop
    chains (a path graph needs log-rounds of propagation, which a
    single-round implementation would get wrong)."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(5)
    edges = []
    # a 60-node path graph: one long component rooted at 0
    edges += [(i, i + 1) for i in range(60)]
    # random small clusters on higher ids
    for base in range(100, 400, 20):
        k = rng.randint(2, 6)
        members = base + rng.choice(20, size=k, replace=False)
        members.sort()
        edges += [(int(members[0]), int(m)) for m in members[1:]]
    a = pa.array([min(e) for e in edges], pa.int64())
    b = pa.array([max(e) for e in edges], pa.int64())
    et = pa.table({"doc_a": a, "doc_b": b})

    local = dedup._components_minlabel(et).to_pandas()
    star = (
        dedup._components_star(rd.from_arrow(et))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    local = local.sort_values("doc_id").reset_index(drop=True)
    assert local.equals(star)
    # the path graph collapsed to root 0
    assert (local[local.doc_id <= 60].component == 0).all()


def test_dup_components_distributed_path_matches_fast_path():
    got_fast = dedup.dup_components(SF_DIR).to_pandas()
    got_star = dedup.dup_components(SF_DIR, force_distributed=True).to_pandas()
    f = got_fast.sort_values("doc_id").reset_index(drop=True)
    s = got_star.sort_values("doc_id").reset_index(drop=True)
    assert f.equals(s)
    assert len(f) > 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=120,
    )
)
def test_property_minlabel_components_vs_unionfind(edges):
    """The numpy min-label fixpoint equals a plain union-find reference
    on arbitrary small graphs (multi-edges, cycles, chains)."""
    import pyarrow as pa

    a = pa.array([min(e) for e in edges], pa.int64())
    b = pa.array([max(e) for e in edges], pa.int64())
    got = {
        r["doc_id"]: r["component"]
        for r in dedup._components_minlabel(pa.table({"doc_a": a, "doc_b": b})).to_pylist()
    }

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        parent[find(x)] = find(y)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {}
    for members in comps.values():
        root = min(members)
        for m in members:
            want[m] = root
    assert got == want


def test_edit1_mask_matches_scalar_levenshtein():
    """Vectorized <=1 edit-distance verify == scalar DP reference on
    adversarial cases: transpositions (distance 2 but shared deletion
    variant), empty strings, pure prefixes, equal strings, first/last
    char edits."""
    import numpy as np

    from laketide.functions.dedup import _edit1_mask

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cases = [
        ("ab", "ba"), ("abc", "abd"), ("abc", "ab"), ("abc", "bc"),
        ("", "a"), ("", ""), ("a", "a"), ("abc", "abc"),
        ("abc", "abcd"), ("abc", "xabc"), ("abc", "axc"), ("abc", "abx"),
        ("xbc", "abc"), ("aab", "ab"), ("ab", "aab"), ("aaa", "aba"),
        ("Customer#1", "Customer#2"), ("Customer#1", "Customer#12"),
        ("abcdef", "abcfed"), ("ax", "xa"), ("aa", "aaa"), ("ba", "ab"),
    ]
    a = [x for x, _ in cases]
    b = [y for _, y in cases]
    got = _edit1_mask(a, b)
    # the operator only ever sees DISTINCT pairs, but the kernel itself
    # must classify equal strings as distance 0 (not 1)
    want = np.array([lev(x, y) == 1 for x, y in cases])
    assert got.tolist() == want.tolist(), list(zip(cases, got.tolist(), want.tolist()))


def test_fuzzy_name_pairs_planted(tmp_path):
    """Planted vocabulary: insertion, deletion, substitution pairs are
    found; a transposition (distance 2) is not."""
    import pyarrow.parquet as pq

    from laketide.functions.dedup import fuzzy_name_pairs

    names = ["alpha", "alphax", "alpa", "alpha1", "aplha", "beta", "betta", "zz", "zz2"]
    pq.write_table(pa.table({"c_name": pa.array(names), "c_custkey": pa.array(range(len(names)))}),
                   tmp_path / "customer.parquet")
    t = fuzzy_name_pairs(str(tmp_path))
    got = set(zip(t["name_a"].to_pylist(), t["name_b"].to_pylist()))
    assert ("alpha", "alphax") in got      # insertion at end
    assert ("alpa", "alpha") in got        # deletion
    assert ("alpha", "alpha1") in got      # insertion
    assert ("beta", "betta") in got        # insertion mid
    assert ("zz", "zz2") in got
    assert ("alpha", "aplha") not in got   # transposition = distance 2
    for x, y in got:
        assert x < y


def test_lsh_stats_surface_hot_bucket_truncation(tmp_path):
    """A bucket larger than the hot-bucket cap is thinned to
    head-all-pairs + rep-vs-rest; minhash_lsh_stats must surface the
    truncation (bucket count + exact dropped-pair count from
    _pair_budget) so consumers see capped recall, and the candidate
    stream's deduped pair count must equal the budget's kept count."""
    cap = dedup._MAX_BUCKET
    n_hot = cap + 44
    texts = ["identical text body for the hot bucket case"] * n_hot + [
        "a completely different first document body here",
        "and a second unrelated document body over there",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    stats = dedup.minhash_lsh_stats(str(tmp_path)).to_pylist()[0]
    kept, dropped = dedup._pair_budget(n_hot)
    # identical docs share every band -> the hot bucket appears once per band
    n_bands = dedup._BANDS
    assert stats["truncated_buckets"] == n_bands
    assert stats["dropped_pairs"] == n_bands * dropped
    assert stats["emitted_pairs"] >= n_bands * kept
    assert stats["multi_buckets"] >= n_bands

    pairs = dedup.minhash_lsh_candidates(str(tmp_path)).to_pandas()
    hot = pairs[(pairs["doc_a"] < n_hot) & (pairs["doc_b"] < n_hot)]
    assert len(hot) == kept  # deduped across bands: exactly the budget

    # no truncation below the cap: stats report a complete stream
    t2 = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(["same text everywhere"] * 10, pa.string()),
        }
    )
    d2 = tmp_path / "small"
    d2.mkdir()
    pq.write_table(t2, str(d2 / "documents.parquet"))
    s2 = dedup.minhash_lsh_stats(str(d2)).to_pylist()[0]
    assert s2["truncated_buckets"] == 0 and s2["dropped_pairs"] == 0
    assert s2["emitted_pairs"] == dedup._BANDS * (10 * 9 // 2)


def test_duplicated_ngram_share_planted(tmp_path):
    """Cross-corpus duplication profile: an exact duplicate pair scores
    dup_share 1.0; a fully unique doc scores 0.0; a half-overlapping doc
    sits strictly between; short docs (<3 tokens) fold to one gram."""
    from laketide.functions.text import duplicated_ngram_share

    dup = "alpha beta gamma delta epsilon zeta"
    half = "alpha beta gamma delta QQ RR SS TT"  # shares 2 of its 6 grams
    uniq = "one two three four five six seven"
    texts = [dup, dup, half, uniq, "tiny doc", None]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = duplicated_ngram_share(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "dup_share"] == 1.0 and out.loc[1, "dup_share"] == 1.0
    assert out.loc[0, "n_grams"] == 4  # 6 tokens -> 4 trigram windows
    assert out.loc[3, "dup_share"] == 0.0
    assert 0.0 < out.loc[2, "dup_share"] < 1.0
    assert out.loc[2, "n_shared"] == 2  # 'alpha beta gamma', 'beta gamma delta'
    assert out.loc[4, "n_grams"] == 1 and out.loc[4, "dup_share"] == 0.0
    assert 5 not in out.index  # null text emits nothing, like the SQL


def test_minhash_candidates_from_persisted_signatures(planted_docs):
    """Candidates served from the persisted signature artifact equal the
    direct (re-shingle) path exactly; the artifact is fingerprint-cached
    (second build returns the same dir without rebuilding)."""
    import os
    import shutil

    from laketide.functions.dedup import (
        _minhash_index_dir,
        minhash_lsh_candidates,
        minhash_signature_build,
    )

    sf_dir, _ = planted_docs
    shutil.rmtree(_minhash_index_dir(sf_dir), ignore_errors=True)
    direct = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(sf_dir).take_all()
    }
    idx = minhash_signature_build(sf_dir)
    assert os.path.exists(os.path.join(idx, "INDEX.json"))
    mtime = os.path.getmtime(os.path.join(idx, "INDEX.json"))
    via_index = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(sf_dir, from_index=True).take_all()
    }
    assert via_index == direct and direct
    # cached: the rebuild call reuses the artifact untouched
    assert minhash_signature_build(sf_dir) == idx
    assert os.path.getmtime(os.path.join(idx, "INDEX.json")) == mtime
    shutil.rmtree(idx, ignore_errors=True)


def test_minhash_index_empty_corpus(tmp_path):
    """Empty corpus: the artifact publishes with zero row files and the
    index read path returns an empty typed stream, not a crash (and the
    cached artifact keeps working on later calls)."""
    import shutil

    from laketide.functions.dedup import _minhash_index_dir, minhash_lsh_candidates

    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    shutil.rmtree(_minhash_index_dir(str(tmp_path)), ignore_errors=True)
    assert minhash_lsh_candidates(str(tmp_path), from_index=True).count() == 0
    assert minhash_lsh_candidates(str(tmp_path), from_index=True).count() == 0
    shutil.rmtree(_minhash_index_dir(str(tmp_path)), ignore_errors=True)


def test_simhash_signature_artifact_equal_output(planted_docs):
    """simhash_dedup(from_index=True) serves the banded signatures from
    the persisted artifact and must return exactly the direct path's
    pairs (ONE signing implementation feeds both); the rebuild call
    reuses the published artifact untouched."""
    import os
    import shutil

    from laketide.functions.dedup import (
        _simhash_index_dir,
        simhash_dedup,
        simhash_signature_build,
    )

    sf_dir, _ = planted_docs
    shutil.rmtree(_simhash_index_dir(sf_dir), ignore_errors=True)
    direct = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_dedup(sf_dir).take_all()
    }
    idx = simhash_signature_build(sf_dir)
    assert os.path.exists(os.path.join(idx, "INDEX.json"))
    mtime = os.path.getmtime(os.path.join(idx, "INDEX.json"))
    via_index = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_dedup(sf_dir, from_index=True).take_all()
    }
    assert via_index == direct and direct
    assert simhash_signature_build(sf_dir) == idx
    assert os.path.getmtime(os.path.join(idx, "INDEX.json")) == mtime
    shutil.rmtree(idx, ignore_errors=True)


def test_minhash_incremental_matches_restricted_direct(planted_docs):
    """Incremental ingest candidates (arrival slice = doc_id % 20 == 0
    probed against the persisted artifact) equal the DIRECT full-corpus
    candidate set restricted to pairs with >=1 arrival member — and the
    verified variant finds the planted arrival-slice near-dup."""
    import shutil

    from laketide.functions.dedup import (
        _minhash_index_dir,
        minhash_dedup_incremental,
        minhash_lsh_candidates,
        minhash_lsh_candidates_incremental,
    )

    sf_dir, plants = planted_docs
    shutil.rmtree(_minhash_index_dir(sf_dir), ignore_errors=True)
    direct = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(sf_dir).take_all()
    }
    expect = {(a, b) for a, b in direct if a % 20 == 0 or b % 20 == 0}
    inc = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates_incremental(sf_dir).take_all()
    }
    assert inc == expect and inc
    # plant (0, 200): both ends are arrival-slice docs; the verified
    # incremental stream must confirm it with exact Jaccard
    v = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_incremental(sf_dir).take_all()
    }
    assert (0, 200) in v
    shutil.rmtree(_minhash_index_dir(sf_dir), ignore_errors=True)


def test_minhash_incremental_uses_artifact_n_parts(planted_docs, monkeypatch):
    """The new-arrival rows must band into the ARTIFACT'S bucket_part
    scheme (n_parts pinned in INDEX.json): with a drifted cluster-derived
    n_parts, pairs would silently de-co-locate. Build at the real
    n_parts, then drift _coarse_n_parts and assert the pair set is
    unchanged."""
    import shutil

    from laketide.functions import dedup as D

    sf_dir, _ = planted_docs
    shutil.rmtree(D._minhash_index_dir(sf_dir), ignore_errors=True)
    before = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates_incremental(sf_dir).take_all()
    }
    assert before
    monkeypatch.setattr(D, "_coarse_n_parts", lambda: 7)
    after = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates_incremental(sf_dir).take_all()
    }
    assert after == before
    shutil.rmtree(D._minhash_index_dir(sf_dir), ignore_errors=True)


def test_winnow_planted_guarantee(planted_docs):
    """The winnowing guarantee (Schleimer et al. §2): two docs sharing a
    verbatim token run of >= w + k - 1 tokens MUST share at least one
    selected fingerprint. The planted pairs differ by ONE mid-doc word
    in 60 tokens, leaving shared runs ~29 tokens on each side — far
    above the w + k - 1 = 8 token guarantee window — so every plant
    must surface in winnow_match_pairs."""
    sf_dir, plants = planted_docs
    pairs = dedup.winnow_match_pairs(sf_dir).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    for a, b in plants:
        assert (a, b) in found or (b, a) in found, f"planted pair {(a, b)} missed"


def test_winnow_fingerprints_shape_and_bounds(planted_docs):
    sf_dir, _ = planted_docs
    s = dedup.winnow_fingerprints(sf_dir).to_pandas()
    assert len(s) == 210  # every doc has >= k tokens
    # n_fingerprints is bounded by the window count and >= 1
    n_win = np.maximum(s["n_grams"] - dedup._WINNOW_W + 1, 1)
    assert (s["n_fingerprints"] >= 1).all()
    assert (s["n_fingerprints"] <= n_win).all()
    assert (s["min_fp"] <= s["max_fp"]).all()


def test_winnow_short_and_null_docs(tmp_path):
    """Docs shorter than k tokens emit nothing; a doc with k tokens and
    fewer than w grams emits exactly ONE fingerprint (the single clamped
    window = min of all grams); null doc_id/text rows are dropped."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, None], pa.int64()),
            "text": pa.array(
                ["a b c", "a b c d", "a b c d e f", None, "a b c d e"],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    s = dedup.winnow_fingerprints(str(tmp_path)).to_pandas().set_index("doc_id")
    assert set(s.index) == {2, 3}  # doc 1 too short, doc 4 null text, null id dropped
    assert s.loc[2, "n_grams"] == 1 and s.loc[2, "n_fingerprints"] == 1
    assert s.loc[3, "n_grams"] == 3 and s.loc[3, "n_fingerprints"] == 1
    assert s.loc[3, "min_fp"] == "a b c d"  # min of the 3 grams


def test_winnow_max_df_excludes_boilerplate(tmp_path):
    """A fingerprint shared by more than max_df docs is non-discriminative
    and must not generate pairs (the MOSS common-fingerprint exclusion)."""
    shared = " ".join(f"t{i}" for i in range(10))
    texts = [shared] * 6  # same doc 6 times -> every fp shared by 6 docs
    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    wide = dedup.winnow_match_pairs(str(tmp_path), max_df=50).to_pandas()
    assert len(wide) == 15  # all C(6,2) pairs found at the default cap
    capped = dedup.winnow_match_pairs(str(tmp_path), max_df=5).to_pandas()
    assert len(capped) == 0  # df=6 > max_df=5: excluded everywhere


def test_winnow_artifact_equal_output(planted_docs, monkeypatch, tmp_path):
    """winnow_match_pairs(from_index=True) serves the fingerprint rows
    from the persisted artifact and must be row-identical to the direct
    path; a second call reuses the published artifact (no rebuild); a
    non-default k/w with from_index is rejected."""
    monkeypatch.setenv("LAKETIDE_INDEX_DIR", str(tmp_path))
    sf_dir, _ = planted_docs
    canon = lambda df: df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    direct = canon(dedup.winnow_match_pairs(sf_dir).to_pandas())
    served = canon(dedup.winnow_match_pairs(sf_dir, from_index=True).to_pandas())
    assert direct.equals(served)
    idx = dedup.winnow_index_build(sf_dir)
    assert os.path.exists(os.path.join(idx, "INDEX.json"))
    assert dedup.winnow_index_build(sf_dir) == idx  # cache hit, no rebuild
    again = canon(dedup.winnow_match_pairs(sf_dir, from_index=True).to_pandas())
    assert direct.equals(again)
    with pytest.raises(ValueError):
        dedup.winnow_match_pairs(sf_dir, w=9, from_index=True)


def test_dedup_keep_best_prefers_longest(tmp_path):
    """keep-best drops the SHORTER near-duplicate even when it has the
    smaller doc_id (where keep-canonical would keep it), tie-breaking
    equal lengths by min doc_id."""
    from laketide.functions.dedup import dedup_keep_best, dedup_keep_canonical

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 10, 11], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g h",            # 8 tokens, cluster A
                    "a b c d e f g h i j",        # 10 tokens, cluster A winner
                    "zz yy xx ww vv uu",          # untouched
                    "p q r s t u v w",            # 8 tokens, cluster B (tie)
                    "p q r s t u v w",            # 8 tokens, cluster B
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 5, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    best = sorted(
        r["doc_id"] for r in dedup_keep_best(str(tmp_path)).take_all()
    )
    # cluster A: doc 2 (longest) wins; cluster B: tie -> min doc_id 10
    assert best == [2, 3, 10]
    canon = sorted(
        r["doc_id"] for r in dedup_keep_canonical(str(tmp_path)).take_all()
    )
    assert canon == [1, 3, 10]


def test_winnow_non_ascii_text(tmp_path):
    """Non-ASCII documents must fingerprint, not crash (the bytes-dtype
    cast encoded with the ascii codec), and the selected min fingerprint
    must follow UTF-8 byte order like DuckDB's varchar min()."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["café au lait très bon vraiment super bien",
                 "z zz über straße naïve fiancée déjà vu encore"],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    s = dedup.winnow_fingerprints(str(tmp_path)).to_pandas().set_index("doc_id")
    assert set(s.index) == {1, 2}
    assert (s["n_fingerprints"] >= 1).all()
    # code-point (== UTF-8 byte) order: ASCII-leading grams sort below
    # accented ones, so doc 1's min fp starts with an ASCII token
    assert s.loc[1, "min_fp"] <= s.loc[1, "max_fp"]


def test_edit1_mask_non_ascii():
    """The edit-distance kernel must operate on CODE POINTS (DuckDB
    levenshtein's unit) and not crash on non-ASCII names (the bytes
    dtype encoded ascii). Substitution/insert/delete of an accented
    character each count as exactly one edit."""
    from laketide.functions.dedup import _edit1_mask

    a = ["café", "café", "café", "über", "naïve", "résumé"]
    b = ["cafe", "cafés", "caf", "uber", "naive", "résumé"]
    got = _edit1_mask(a, b).tolist()
    #        sub    ins     del    sub    sub=1? naïve->naive is 1 sub; equal -> False
    assert got == [True, True, True, True, True, False]
