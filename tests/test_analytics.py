"""Unit coverage for the analytics operator family beyond the
oracle-compare suite: HLL accuracy bound, broadcast-join vs shuffle-free
invariants, bottom-k collect associativity."""

import numpy as np
import pyarrow as pa

from laketide.functions import analytics

SF_DIR = "/root/testdata/sf0.01"


def test_hll_within_error_bound():
    """HLL estimate must land within 5% of the exact distinct count
    (standard error at m=4096 is ~1.6%; 5% is > 3 sigma)."""
    import duckdb

    est = analytics.hll_distinct_users(SF_DIR)["n_users_est"][0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert exact > 0
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_deterministic():
    a = analytics.hll_distinct_users(SF_DIR)["n_users_est"][0].as_py()
    b = analytics.hll_distinct_users(SF_DIR)["n_users_est"][0].as_py()
    assert a == b


def test_cms_bounds_vs_exact():
    """Count-Min guarantees: estimate >= true count (always) and
    <= true + eps*N (w=8192 -> eps*N ~ 0.03% of the token stream;
    assert the loose 1% bound)."""
    import duckdb

    toks = ("the", "data", "is")
    out = analytics.cms_token_counts(SF_DIR, check_tokens=toks).to_pandas()
    exact = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT token, count(*) FROM (SELECT unnest(string_split(text,' ')) "
            f"AS token FROM read_parquet('{SF_DIR}/documents.parquet')) "
            f"WHERE token IN {toks} GROUP BY token"
        ).fetchall()
    }
    n_stream = int(out["n_stream"][0])
    assert n_stream > 0
    for _, row in out.iterrows():
        true = exact.get(row["token"], 0)
        assert row["est_count"] >= true, row["token"]
        assert row["est_count"] <= true + 0.01 * n_stream, row["token"]


def test_smallest_k_per_key_associative():
    """Pruning per batch then pruning the merged survivors must equal
    the global bottom-k (the combiner contract)."""
    rng = np.random.RandomState(7)
    key = rng.randint(0, 20, size=500)
    val = rng.randint(0, 10**6, size=500)
    t = pa.table({"k": pa.array(key, pa.int64()), "v": pa.array(val, pa.int64())})
    whole = analytics._smallest_k_per_key(t, "k", "v", 5)
    halves = [
        analytics._smallest_k_per_key(t.slice(0, 250), "k", "v", 5),
        analytics._smallest_k_per_key(t.slice(250), "k", "v", 5),
    ]
    merged = analytics._smallest_k_per_key(pa.concat_tables(halves), "k", "v", 5)
    assert whole.sort_by([("k", "ascending"), ("v", "ascending")]).equals(
        merged.sort_by([("k", "ascending"), ("v", "ascending")])
    )


def test_funnel_strictly_after_planted():
    """Planted sequences: user 1 completes the funnel, user 2's click
    ties the view timestamp (strict > rejects it), user 3 purchases
    BEFORE clicking (rejected at stage 3)."""
    import tempfile

    import pyarrow.parquet as pq

    rows = [
        # user 1: view@10, click@20, purchase@30 -> full funnel
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: click at the SAME us as the first view -> no stage 2
        (2, "view", 10), (2, "click", 10), (2, "purchase", 40),
        # user 3: purchase precedes the qualifying click -> no stage 3
        (3, "view", 10), (3, "purchase", 15), (3, "click", 20),
        # user 4: view only
        (4, "view", 5),
    ]
    n = len(rows)
    ev = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * n),
            "props": pa.array([""] * n),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(ev, f"{d}/events.parquet")
        out = analytics.funnel_view_click_purchase(d)
    assert out["n_view"][0].as_py() == 4
    assert out["n_click"][0].as_py() == 2  # users 1 and 3
    assert out["n_purchase"][0].as_py() == 1  # user 1 only


def test_corr_matches_numpy_reference():
    import duckdb
    import pandas as pd

    got = analytics.corr_qty_price(SF_DIR).to_pandas().set_index("l_returnflag")
    df = duckdb.sql(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT) x, "
        f"CAST(ROUND(l_extendedprice) AS BIGINT) y "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).df()
    for flag, grp in df.groupby("l_returnflag"):
        ref = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert abs(got.loc[flag, "corr_qty_price"] - ref) < 1e-9, flag


def test_q3_broadcast_and_join_paths_agree():
    """The adaptive broadcast path and the hash-join fallback must
    produce the identical top-10 (same rows, same order)."""
    from laketide.functions.relational import q3_shipping_priority

    bc = q3_shipping_priority(SF_DIR)
    jn = q3_shipping_priority(SF_DIR, broadcast_budget_rows=0)
    assert bc.to_pydict() == jn.to_pydict()
    assert bc.num_rows == 10


def test_outliers_planted_spike():
    """A user with tightly clustered values plus one huge spike flags
    exactly the spike; a uniform user flags nothing."""
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq

    vals = [10.0] * 30 + [10.5] * 30 + [500.0]  # user 1: spike at the end
    vals2 = [float(v) for v in range(40)]  # user 2: uniform, no 3-sigma
    n = len(vals) + len(vals2)
    ev = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * n, pa.timestamp("us")),
            "user_id": pa.array([1] * len(vals) + [2] * len(vals2), pa.int64()),
            "event_type": pa.array(["x"] * n),
            "value": pa.array(vals + vals2),
            "props": pa.array([""] * n),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(ev, f"{d}/events.parquet")
        out = analytics.user_value_outliers(d).to_pandas()
    assert dict(zip(out["user_id"], out["n_outliers"])) == {1: 1}


def test_q3_empty_selectivity_returns_empty():
    """No BUILDING customer / no qualifying order must yield an EMPTY
    top-10 table, not an ArrowInvalid from concatenating zero blocks."""
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq

    from laketide.functions.relational import q3_shipping_priority

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {"c_custkey": pa.array([1, 2], pa.int64()), "c_mktsegment": pa.array(["MACHINERY", "FURNITURE"])}
            ),
            f"{d}/customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10], pa.int64()),
                    "o_custkey": pa.array([1], pa.int64()),
                    "o_orderdate": pa.array([pd.Timestamp("1997-01-01")], pa.timestamp("us")),
                }
            ),
            f"{d}/orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([10], pa.int64()),
                    "l_extendedprice": pa.array([100.0]),
                    "l_discount": pa.array([0.0]),
                    "l_shipdate": pa.array([pd.Timestamp("1999-01-01")], pa.timestamp("us")),
                }
            ),
            f"{d}/lineitem.parquet",
        )
        out = q3_shipping_priority(d)
    assert out.num_rows == 0
    assert out.column_names == ["l_orderkey", "revenue_cents", "o_orderdate"]


def test_corr_zero_variance_group_is_null():
    """A constant-x group must yield NULL (the oracle's x/0.0 in DuckDB),
    not a ZeroDivisionError."""
    import tempfile

    import pyarrow.parquet as pq

    li = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "Z"]),
            "l_quantity": pa.array([5.0, 5.0, 3.0]),  # A: zero variance
            "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(li, f"{d}/lineitem.parquet")
        out = analytics.corr_qty_price(d).to_pandas().set_index("l_returnflag")
    assert np.isnan(out.loc["A", "corr_qty_price"])
    assert np.isnan(out.loc["Z", "corr_qty_price"])  # single row: da=db=0


def test_gaps_reduce_matches_pandas():
    """The reduceat gap kernel vs a plain pandas groupby-diff reference
    on a corpus with ties and singleton users."""
    import pandas as pd

    rng = np.random.RandomState(11)
    n = 300
    user = rng.randint(0, 12, size=n)
    ts = rng.randint(0, 10**7, size=n) * 1_000_000  # us
    ts[user == 3] = 42  # one user: all-tied timestamps -> zero gaps
    eid = np.arange(n)
    import laketide.functions.analytics as A

    df = pd.DataFrame({"user_id": user, "ts": pd.to_datetime(ts, unit="us"), "event_id": eid})
    ref = (
        df.sort_values(["user_id", "ts", "event_id"])
        .assign(gap=lambda d: d.groupby("user_id")["ts"].diff().dt.total_seconds() * 1e6)
        .dropna(subset=["gap"])
        .groupby("user_id")["gap"]
        .agg(n_gaps="count", total_gap_us="sum", max_gap_us="max")
        .reset_index()
    )

    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        ev = pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(user, pa.int64()),
                "event_type": pa.array(["x"] * n),
                "value": pa.array(np.ones(n)),
                "props": pa.array([""] * n),
            }
        )
        pq.write_table(ev, f"{d}/events.parquet")
        got = A.user_event_gaps(d).to_pandas().sort_values("user_id").reset_index(drop=True)
    ref = ref.sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got["n_gaps"], ref["n_gaps"])
    np.testing.assert_array_equal(got["total_gap_us"], ref["total_gap_us"].astype(np.int64))
    np.testing.assert_array_equal(got["max_gap_us"], ref["max_gap_us"].astype(np.int64))


def test_q4_q12_q10_broadcast_and_join_paths_agree():
    """Each adaptive join's broadcast path and hash-join fallback must
    produce identical results (q4's fallback additionally exercises the
    global key dedup — per-batch distinct keys are NOT globally
    distinct and would double-count without it)."""
    from laketide.functions.relational import (
        q4_order_priority,
        q10_returned_items,
        q12_line_priority,
    )

    for fn in (q4_order_priority, q12_line_priority, q10_returned_items):
        bc = fn(SF_DIR)
        jn = fn(SF_DIR, broadcast_budget_rows=0)
        assert bc.to_pydict() == jn.to_pydict(), fn.__name__


class TestValueQuantileSketch:
    """HDR quantile sketch: deterministic under block splits, mergeable,
    and within its documented 2^-5 relative-error bound vs the exact
    quantiles (upper-edge readout never undershoots)."""

    SF = "/root/testdata/sf0.001"

    def test_error_bound_vs_exact(self):
        import duckdb
        import numpy as np

        from laketide.functions.analytics import value_quantile_sketch

        got = value_quantile_sketch(self.SF).to_pandas()
        con = duckdb.connect()
        exact = con.execute(
            "SELECT quantile_disc(c, 0.5), quantile_disc(c, 0.9), quantile_disc(c, 0.99) "
            "FROM (SELECT CAST(ROUND(value*100) AS BIGINT) AS c FROM "
            f"read_parquet('{self.SF}/events.parquet') WHERE value IS NOT NULL)"
        ).fetchone()
        for (q, est), true in zip(
            got[["q", "est_cents"]].itertuples(index=False), exact
        ):
            assert est >= true, (q, est, true)
            assert est - true <= max(true, 1) * 2**-5 + 1, (q, est, true)

    def test_deterministic_across_runs(self):
        from laketide.functions.analytics import value_quantile_sketch

        a = value_quantile_sketch(self.SF).to_pandas()
        b = value_quantile_sketch(self.SF).to_pandas()
        assert a.equals(b)

    def test_mergeable_bucket_counts(self, tmp_path):
        """sketch(A ∪ B) bucket counts == elementwise merge of the two
        halves' counts — the property that makes the sketch safe under
        ANY partitioning (kernel-level check, no rank sampling)."""
        import numpy as np

        from laketide.functions.analytics import _hdr_bucket

        rng = np.random.RandomState(11)
        v = rng.randint(0, 10**9, size=50_000).astype(np.int64)
        ids_all, n_all = np.unique(_hdr_bucket(v), return_counts=True)
        merged = {}
        for half in (v[:20_000], v[20_000:]):
            ids, n = np.unique(_hdr_bucket(half), return_counts=True)
            for i, c in zip(ids, n):
                merged[i] = merged.get(i, 0) + int(c)
        assert dict(zip(ids_all.tolist(), n_all.tolist())) == merged

    def test_negative_values_mirror_exactly(self, tmp_path):
        """Refund-style negative values must keep the bound (r3 review:
        a silent clamp to bucket 0 returned wrong quantiles): the full
        sketch path over a mostly-negative corpus stays within 2^-5 of
        the exact quantiles and never undershoots."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from laketide.functions.analytics import value_quantile_sketch

        rng = np.random.RandomState(3)
        vals = np.concatenate(
            [-rng.exponential(500, size=3000), rng.exponential(50, size=1000)]
        )
        pq.write_table(
            pa.table({"value": pa.array(vals, pa.float64())}),
            tmp_path / "events.parquet",
        )
        got = value_quantile_sketch(str(tmp_path)).to_pandas()
        exact = duckdb.connect().execute(
            "SELECT quantile_disc(c, 0.5), quantile_disc(c, 0.9), quantile_disc(c, 0.99) "
            "FROM (SELECT CAST(ROUND(value*100) AS BIGINT) AS c FROM "
            f"read_parquet('{tmp_path}/events.parquet'))"
        ).fetchone()
        for (q, est), true in zip(
            got[["q", "est_cents"]].itertuples(index=False), exact
        ):
            assert est >= true, (q, est, true)
            assert est - true <= abs(true) * 2**-5 + 1, (q, est, true)


def test_prepare_corpus_partitioned_output_and_resume_skip(tmp_path):
    """The composed corpus pipeline's shard output: deterministic
    doc_id-keyed dirs with _SUCCESS completion markers; a resumed run
    rewrites ONLY marker-less (partial/missing) shards — never appends
    to complete ones — and refuses a partition-count change."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq
    import pytest

    from laketide.functions.corpus import prepare_corpus

    def shard_counts(out):
        got = {}
        for p in sorted(glob.glob(out + "/part=*")):
            files = glob.glob(os.path.join(p, "*.parquet"))
            got[os.path.basename(p)] = sum(
                pq.ParquetFile(f).metadata.num_rows for f in files
            )
        return got

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    surviving = prepare_corpus(sf, out_dir=out, partitions=4).to_pandas()
    parts = sorted(glob.glob(out + "/part=*"))
    assert len(parts) == 4
    assert all(os.path.exists(os.path.join(p, "_SUCCESS")) for p in parts)
    counts = shard_counts(out)
    assert sum(counts.values()) == len(surviving)

    # resume after a missing shard: only that shard is rewritten
    shutil.rmtree(parts[0])
    prepare_corpus(sf, out_dir=out, partitions=4)
    assert shard_counts(out) == counts

    # resume after a PARTIAL shard (files present, no marker): the
    # partial dir is deleted and rewritten, not silently skipped or
    # double-appended
    os.remove(os.path.join(parts[1], "_SUCCESS"))
    prepare_corpus(sf, out_dir=out, partitions=4)
    assert shard_counts(out) == counts
    assert os.path.exists(os.path.join(parts[1], "_SUCCESS"))

    # a partition-count change on resume is refused
    with pytest.raises(ValueError, match="partitions"):
        prepare_corpus(sf, out_dir=out, partitions=8)


def test_pack_sequences_multiblock_prefix_sum(tmp_path):
    """pack_sequences' seq_id assignment is a global exclusive prefix
    sum in doc_id order. Plant a 6000-doc corpus written SHUFFLED across
    many small row groups (multiple read blocks, so the cross-block
    carry path actually runs) and check every label against a numpy
    reference; sequence sizes must respect the offset-packing rule."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions.corpus import pack_sequences

    rng = np.random.RandomState(17)
    n = 6000
    toks = rng.randint(1, 40, n)
    texts = [" ".join(["w"] * k) for k in toks]
    texts[100] = ""  # empty doc -> 0 tokens
    toks[100] = 0
    order = rng.permutation(n)  # file order != doc_id order
    t = pa.table(
        {
            "doc_id": pa.array(order, pa.int64()),
            "text": pa.array([texts[i] for i in order]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet", row_group_size=250)

    got = pack_sequences(sf, budget=64).to_pandas().sort_values("doc_id")
    assert len(got) == n
    start = np.cumsum(toks) - toks  # exclusive prefix in doc_id order
    want_seq = start // 64
    assert (got["n_tokens"].to_numpy() == toks).all()
    assert (got["seq_id"].to_numpy() == want_seq).all()
    # offset rule: consecutive docs' seq_ids are non-decreasing and the
    # packing uses every sequence up to the last
    assert got["seq_id"].is_monotonic_increasing
    assert got["seq_id"].iloc[-1] == (start[-1] // 64)


def test_dedup_text_segments_planted(tmp_path):
    """Global first-occurrence span dedup with reconstruction: a later
    doc repeating an earlier doc's segment loses it; a doc that is
    entirely duplicate material still emits a (n_kept=0, '') row; a
    within-doc repeat keeps only the first position."""
    import pyarrow.parquet as pq

    from laketide.functions.text import dedup_text_segments

    seg_a = "a b c d e f g h i j"  # exactly one 10-token segment
    seg_b = "k l m n o p q r s t"
    texts = [
        seg_a + " " + seg_b,  # doc 0: owns both segments
        seg_b,  # doc 1: fully duplicate -> empty
        seg_a + " tail words here",  # doc 2: loses seg_a, keeps its tail
        "u v w x y z aa bb cc dd " * 2,  # doc 3: repeats its own segment
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        dedup_text_segments(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_segments"] == 2 and out.loc[0, "n_kept"] == 2
    assert out.loc[0, "cleaned_text"] == texts[0]
    assert out.loc[1, "n_kept"] == 0 and out.loc[1, "cleaned_text"] == ""
    assert out.loc[2, "n_kept"] == 1 and out.loc[2, "cleaned_text"] == "tail words here"
    # doc 3: "... dd u" bridges the repeat, so segment 2 of 3 differs;
    # the final short segment ("cc dd") is the only exact re-occurrence
    assert out.loc[3, "n_segments"] == 3
    assert out.loc[3, "n_kept"] == 2


def test_gopher_quality_filter_planted(tmp_path):
    """Each Gopher rule trips independently: too-short doc fails the
    token window, digit-soup doc fails... (short words fail the
    mean-word-length floor), stopword-free doc fails the stopword rule,
    and a well-formed doc passes all three."""
    import pyarrow.parquet as pq

    from laketide.functions.text import gopher_quality_filter

    good = " ".join(["the quick brown foxes jumped over lazy dogs of iron"] * 4)  # 40 toks
    short = "the of tiny doc"  # 4 tokens -> fails token window
    tiny_words = " ".join(["a of to in is"] * 8)  # 40 toks, mean wlen < 4
    no_stop = " ".join(["zebra quartz jumbo whisk"] * 10)  # 40 toks, 0 stopwords
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([good, short, tiny_words, no_stop]),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        gopher_quality_filter(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    assert bool(out.loc[0, "passes"])
    assert not out.loc[1, "pass_token_count"] and out.loc[1, "pass_stopwords"]
    assert not out.loc[2, "pass_word_len"] and out.loc[2, "pass_token_count"]
    assert not out.loc[3, "pass_stopwords"] and out.loc[3, "pass_word_len"]
    assert not out.loc[[1, 2, 3], "passes"].any()


def test_fieldwise_fold_inputs_survive_sliced_batch():
    """pyarrow 16 if_else regression: a non-zero-offset string slice +
    null SCALAR else-branch emits a corrupt binary array ("First or last
    binary offset out of bounds"), which Ray's zero-copy block slices
    feed the fieldwise derives at sf>=0.1. The shared helper must
    produce fully-valid arrays from a sliced input table."""
    import pyarrow.compute as pc

    from laketide.functions.relational import _fieldwise_fold_inputs

    n = 500
    t = pa.table(
        {
            "event_type": pa.array(["view", "click", "purchase"] * n)[: 3 * n],
            "value": pa.array([float(i) for i in range(3 * n)]),
            "props": pa.array(
                ['{"k": %d}' % i if i % 3 else "x" * 50 for i in range(3 * n)]
            ),
        }
    )
    s = t.slice(700, 600)  # non-zero offset slice, like a Ray block view
    assert s["props"].chunk(0).offset > 0
    v, p = _fieldwise_fold_inputs(s)
    out = pa.table({"v": v, "p": p})
    out.validate(full=True)  # raised ArrowInvalid before the fix
    # spot-check semantics on the slice
    assert pc.sum(pc.is_valid(p)).as_py() == 200  # every i%3==0 row
    # value is null exactly on view rows, cents elsewhere
    is_view = pc.equal(s["event_type"], "view")
    assert pc.all(pc.equal(pc.is_null(v), is_view)).as_py()
    first_nonview = pc.index(is_view, False).as_py()
    assert v[first_nonview].as_py() == round(
        s["value"][first_nonview].as_py() * 100
    )


def test_remove_boilerplate_segments_planted(tmp_path):
    """Boilerplate rule vs the C4 first-occurrence rule: a segment in
    >= 2 DISTINCT docs vanishes from BOTH (including the first
    occurrence), while a within-doc repeat is kept at every position
    (dedup_text_segments keeps only the first)."""
    import pyarrow.parquet as pq

    from laketide.functions.text import remove_boilerplate_segments

    seg_a = "a b c d e f g h i j"  # exactly one 10-token segment
    rep = "u v w x y z aa bb cc dd"
    texts = [
        seg_a + " only one owner tail",  # doc 0: loses seg_a too
        seg_a,  # doc 1: fully boilerplate -> empty
        rep + " " + rep,  # doc 2: within-doc repeat, kept twice
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        remove_boilerplate_segments(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_segments"] == 2 and out.loc[0, "n_kept"] == 1
    assert out.loc[0, "cleaned_text"] == "only one owner tail"
    assert out.loc[1, "n_kept"] == 0 and out.loc[1, "cleaned_text"] == ""
    assert out.loc[2, "n_segments"] == 2 and out.loc[2, "n_kept"] == 2
    assert out.loc[2, "cleaned_text"] == texts[2]


def test_unigram_logppl_planted_floor_engages(tmp_path):
    """Rarer tokens cost more, AND the KenLM frequency floor engages:
    the three corpus-singleton tokens fall below min_tf=2, so each is
    priced at the POOLED <unk> cost floor(-ln(rare_mass/N)*1e6) — one
    shared cost for all of them (cheaper per token than a true
    singleton cost, bounding the vocabulary the driver holds) — while
    the common token keeps its exact tf-based cost."""
    import math

    import pyarrow.parquet as pq

    from laketide.functions.text import _unigram_cost_table, unigram_logppl

    texts = ["common common common common", "common rare1 rare2 rare3"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = unigram_logppl(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    n = 8
    c_common = math.floor(-math.log(5 / n) * 1e6)
    c_unk = math.floor(-math.log(3 / n) * 1e6)  # pooled rare mass = 3
    assert out.loc[0, "nll_micro"] == 4 * c_common
    # all three singletons share the ONE pooled <unk> cost
    assert out.loc[1, "nll_micro"] == c_common + 3 * c_unk
    assert out.loc[1, "avg_nll_micro"] > out.loc[0, "avg_nll_micro"]
    assert (out["n_tokens"] == 4).all()
    # the floor actually engaged: the kept vocabulary holds ONLY the
    # above-floor token — the driver never collected the singletons
    tok_arr, cost_np, unk_cost = _unigram_cost_table(str(tmp_path))
    assert tok_arr.to_pylist() == ["common"]
    assert unk_cost == c_unk


def test_doc_chunk_windows_overlap(tmp_path):
    """64/48 sliding windows: a 100-token doc yields ceil(100/48)=3
    chunks with the overlap region repeated; short docs yield one chunk
    equal to the whole text."""
    import pyarrow.parquet as pq

    from laketide.functions.text import doc_chunk_windows

    toks = [f"t{i}" for i in range(100)]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([" ".join(toks), "just three tokens"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        doc_chunk_windows(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert list(d0.n_chunk_tokens) == [64, 52, 4]
    assert d0.iloc[0].chunk_text == " ".join(toks[0:64])
    assert d0.iloc[1].chunk_text == " ".join(toks[48:100])
    assert d0.iloc[2].chunk_text == " ".join(toks[96:100])
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0].chunk_text == "just three tokens"
    assert d1.iloc[0].n_chunk_tokens == 3


def test_entropy_by_event_type_planted(tmp_path):
    """A type dominated by one user scores near-zero entropy; a type
    spread evenly over k users scores ~ln(k) micro-nats."""
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    rows = []
    # 'bot': user 1 fires 99 events, user 2 fires 1 -> entropy ~ 0
    rows += [{"user_id": 1, "event_type": "bot"}] * 99
    rows += [{"user_id": 2, "event_type": "bot"}]
    # 'organic': 10 users x 10 events -> entropy ~ ln(10)
    for u in range(10):
        rows += [{"user_id": 100 + u, "event_type": "organic"}] * 10
    df = pd.DataFrame(rows)
    df["event_id"] = range(len(df))
    df["ts"] = pd.Timestamp("2024-01-01")
    df["value"] = 1.0
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = (
        analytics.entropy_by_event_type(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["bot", "n_users"] == 2
    assert out.loc["organic", "n_users"] == 10
    ln10_micro = math.log(10) * 1e6
    assert abs(out.loc["organic", "entropy_micro"] - ln10_micro) < 20
    assert out.loc["bot", "entropy_micro"] < 0.1 * ln10_micro
    assert out.loc["bot", "entropy_micro"] < out.loc["organic", "entropy_micro"]


def test_decontaminate_bloom_one_sided_and_close_to_exact():
    """Bloom decontamination must (a) never KEEP a doc the exact filter
    drops (one-sided error), (b) drop at most a small extra fraction to
    false positives, (c) be deterministic across runs."""
    from laketide.functions.text import decontaminate_docs, decontaminate_docs_bloom

    exact = set(
        decontaminate_docs(SF_DIR).to_pandas()["doc_id"]
    )
    bloom_df = decontaminate_docs_bloom(SF_DIR).to_pandas()
    bloom = set(bloom_df["doc_id"])
    assert bloom <= exact  # one-sided: never keeps a contaminated doc
    assert len(bloom) >= 0.95 * len(exact), (len(bloom), len(exact))
    again = set(decontaminate_docs_bloom(SF_DIR).to_pandas()["doc_id"])
    assert again == bloom


def test_bloom_partial_bitmaps_merge_associatively():
    """OR-merging per-block partial bitmaps equals one global build —
    the property that lets the bench-gram pass stream at scale."""
    import numpy as np

    from laketide.functions.text import _BLOOM_BITS, _bloom_set, _bloom_test

    rng = np.random.RandomState(7)
    h = rng.randint(0, 2**63, size=1000).astype(np.uint64)
    full = np.zeros(_BLOOM_BITS >> 3, np.uint8)
    _bloom_set(full, h)
    merged = np.zeros(_BLOOM_BITS >> 3, np.uint8)
    for chunk in np.array_split(h, 7):
        part = np.zeros(_BLOOM_BITS >> 3, np.uint8)
        _bloom_set(part, chunk)
        merged |= part
    assert np.array_equal(full, merged)
    assert bool(_bloom_test(full, h).all())
    other = rng.randint(0, 2**63, size=2000).astype(np.uint64)
    fpr = float(_bloom_test(full, other).mean())
    assert fpr < 0.01, fpr


def test_shuffle_positions_domain_guard(tmp_path):
    """uint64-wrap vs signed-modulo divergence guard: negative doc_ids
    are filtered (like the oracle's WHERE doc_id >= 0), ids >= 2^31
    refuse loudly, and positions are a 0..n-1 permutation."""
    import pyarrow.parquet as pq
    import pytest

    from laketide.functions.corpus import shuffle_positions

    t = pa.table(
        {
            "doc_id": pa.array([5, -3, 0, 17, None], pa.int64()),
            "text": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["s"] * 5, pa.string()),
            "n_chars": pa.array([1] * 5, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = shuffle_positions(str(tmp_path)).to_pandas()
    assert set(out["doc_id"]) == {0, 5, 17}
    assert sorted(out["position"]) == [0, 1, 2]
    big = pa.table(
        {
            "doc_id": pa.array([1 << 31], pa.int64()),
            "text": pa.array(["x"], pa.string()),
        }
    )
    d2 = tmp_path / "big"
    d2.mkdir()
    pq.write_table(big, str(d2 / "documents.parquet"))
    with pytest.raises(Exception, match="2\\^31"):
        shuffle_positions(str(d2)).to_pandas()


def test_mixture_sample_explicit_weights(tmp_path):
    """Explicit-weights data mixing: realized shares track W_s/sum(W)
    within hash noise, the scarcest-relative source keeps 100% (its
    threshold saturates — no upsampling ever), and a zero-weight source
    is excluded entirely."""
    import pyarrow.parquet as pq

    from laketide.functions.text import mixture_sample

    n = {"web": 6000, "wiki": 1500, "books": 500, "junk": 800}
    ids, srcs = [], []
    i = 0
    for s, k in n.items():
        for _ in range(k):
            ids.append(i)
            srcs.append(s)
            i += 1
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(srcs, pa.string()),
            "text": pa.array(["x"] * len(ids), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    w = {"web": 5, "wiki": 3, "books": 2, "junk": 0}
    out = mixture_sample(str(tmp_path), weights=w).to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got.get("junk", 0) == 0
    # scarcest source per weight unit: books 500/2=250 < wiki 500 < web
    # 1200 -> books keeps everything
    assert got["books"] == 500
    total = sum(got.values())
    for s, ws in (("web", 5), ("wiki", 3), ("books", 2)):
        share = got[s] / total
        target = ws / 10
        assert abs(share - target) < 0.05, (s, share, target)
    # deterministic: a second run returns the identical id set
    out2 = mixture_sample(str(tmp_path), weights=w).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_bm25_index_matches_scan_and_caches():
    """bm25_search(from_index=True) serves from the persisted inverted
    index and is BIT-EQUAL to the full-corpus scan (same idf/tf/dl
    integers into the same float expression tree); the second build
    call reuses the published artifact untouched."""
    import os
    import shutil

    from laketide.functions import text

    idx_dir = text._bm25_index_dir(SF_DIR)
    shutil.rmtree(idx_dir, ignore_errors=True)
    scan = text.bm25_search(SF_DIR)
    via_index = text.bm25_search(SF_DIR, from_index=True)
    assert scan.equals(via_index) and scan.num_rows == 10
    idx = text.bm25_index_build(SF_DIR)
    mtime = os.path.getmtime(os.path.join(idx, "INDEX.json"))
    assert text.bm25_index_build(SF_DIR) == idx
    assert os.path.getmtime(os.path.join(idx, "INDEX.json")) == mtime
    shutil.rmtree(idx_dir, ignore_errors=True)


def test_bm25_index_zero_fill_matches_scan(tmp_path):
    """Fewer matching docs than k: the indexed path fills the remaining
    slots with zero-score documents in doc_id order, exactly like the
    full-corpus scan ranks non-matching documents."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions import text

    # 12 docs, only two contain query tokens ("data", "join"); one null text
    texts = ["alpha beta gamma"] * 12
    texts[3] = "data join data"
    texts[7] = "join stream"
    texts[10] = None
    t = pa.table(
        {
            "doc_id": pa.array(list(range(100, 112)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    shutil.rmtree(text._bm25_index_dir(str(tmp_path)), ignore_errors=True)
    scan = text.bm25_search(str(tmp_path))
    via_index = text.bm25_search(str(tmp_path), from_index=True)
    assert scan.equals(via_index)
    assert via_index.num_rows == 10
    # the two matching docs lead, zero-score docs follow in id order
    ids = via_index["doc_id"].to_pylist()
    assert set(ids[:2]) == {103, 107}
    assert ids[2:] == [100, 101, 102, 104, 105, 106, 108, 109]
    assert via_index["score"].to_pylist()[2:] == [0.0] * 8
    shutil.rmtree(text._bm25_index_dir(str(tmp_path)), ignore_errors=True)


def test_bm25_index_empty_corpus(tmp_path):
    """Empty corpus: the artifact publishes with zero row files and the
    indexed search returns the typed empty result, twice (cached)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions import text

    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    shutil.rmtree(text._bm25_index_dir(str(tmp_path)), ignore_errors=True)
    for _ in range(2):
        out = text.bm25_search(str(tmp_path), from_index=True)
        assert out.num_rows == 0
        assert out.schema.names == ["doc_id", "score"]
    shutil.rmtree(text._bm25_index_dir(str(tmp_path)), ignore_errors=True)


def test_dsir_weights_separate_target_like_docs(tmp_path):
    """Docs written in the target language's vocabulary score positive
    lw_micro, docs in the disjoint other vocabulary score negative, and
    a sub-floor token (tf < 2) is priced through the pooled unk bucket
    (the score still computes, no KeyError/zero-prob blowup)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laketide.functions.text import dsir_importance_weights

    en = "the cat sat on the mat and the dog ran"
    de = "der hund lief und die katze sass auf der matte"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [en, en + " again", de, de + " nochmal", "the cat UNIQUETOKEN"],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "de", "de", None], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["lw_micro"]
        for r in dsir_importance_weights(str(tmp_path)).take_all()
    }
    assert len(out) == 5
    assert out[1] > 0 and out[2] > 0, "target-vocabulary docs score positive"
    assert out[3] < 0 and out[4] < 0, "raw-only vocabulary docs score negative"
    # doc 5 contains a tf=1 token -> unk-priced, en words dominate
    assert out[5] > out[3]


def test_bigram_logppl_planted_backoff_and_order(tmp_path):
    """Kept bigrams (c2 >= 2) price at exact -ln(c2/c1(w1)); a
    corpus-singleton bigram backs off to floor(-ln(0.4)*1e6) + the
    unigram <unk>/vocab cost of w2 — and a doc whose tokens appear in
    an unseen ORDER scores worse than one in the common order (the
    property the unigram model cannot express)."""
    import math

    import pyarrow.parquet as pq

    from laketide.functions.text import bigram_logppl

    texts = ["x y x y x y", "x z"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = bigram_logppl(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    # unigram tf: x=4 y=3 z=1, N=8; bigrams: "x y"=3, "y x"=2, "x z"=1
    n = 8
    c_xy = math.floor(-math.log(3 / 4) * 1e6)  # c1(x)=4
    c_yx = math.floor(-math.log(2 / 3) * 1e6)  # c1(y)=3
    unk = math.floor(-math.log(1 / n) * 1e6)  # pooled rare mass = z alone
    backoff = math.floor(-math.log(0.4) * 1e6)
    assert out.loc[0, "n_bigrams"] == 5
    assert out.loc[0, "nll2_micro"] == 3 * c_xy + 2 * c_yx
    assert out.loc[1, "n_bigrams"] == 1
    assert out.loc[1, "nll2_micro"] == backoff + unk
    # order sensitivity: the unseen-order doc is strictly more
    # surprising per bigram than the common-order one
    assert out.loc[1, "avg_nll2_micro"] > out.loc[0, "avg_nll2_micro"]
