"""Null-key / null-text robustness: every affected query must match its
DuckDB oracle on a corpus CONTAINING nulls (regressions from the r3
review: NaN != NaN split null numeric keys into per-row groups, null
text crashed np.repeat, n_stop returned 0 where SQL returns NULL, and
count(DISTINCT) counted the null-user group)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

_NULLABLE_QUERIES = [
    "cdc_lww_latest",
    "cdc_first_event_per_user_type",
    "cdc_coalesce_fieldwise",
    "lww_longest_props",
    "events_stats_view",
    "hwm_per_user",
    "value_cents_by_user_type",
    "user_event_pivot",
    "user_event_gaps",
    "mode_event_type_per_user",
    "distinct_users_by_type",
    "funnel_view_click_purchase",
    "daily_active_users",
    "user_retention_7d",
    "user_value_outliers",
    "hopping_window_counts",
    "event_type_transitions",
    "blob_chunk_dedup",
    "value_histogram",
    "events_per_user_quantiles",
    "session_counts",
    "rolling_count_1h",
    "doc_quality",
    "top_tokens_by_lang",
    "doc_normalize",
    "dedup_keep_canonical",
    "dedup_keep_best",
    "lookup_join_overlap",
    "token_counts",
    "doc_summary",
    "blob_meta",
    "frame_sample",
    "blob_resize",
    "knn_cosine",
    "knn_lsh",
    "embedding_label_count",
    "doc_frequency",
    "doc_rare_token_stats",
    "top_bigrams",
    "benchmark_contamination",
    "dedup_events_window",
    "user_value_mad",
    "tfidf_top_terms",
    "bigram_pmi",
    "vector_norm_stats_by_label",
    "event_share_by_day",
    "purchase_attribution",
    "docs_containing",
    "user_type_bitmask",
    "user_pivot_unpivot",
    "events_grouping_sets",
    "doc_token_diversity",
    "doc_bigram_repetition",
    "customer_orders_full_outer",
    "orders_price_percent_rank",
    "embedding_centroid_by_label",
    "dedup_text_segments",
    "remove_boilerplate_segments",
    "gopher_quality_filter",
    "unigram_logppl",
    "dsir_importance_weights",
    "ppl_bucket_docs",
    "bm25_search",
    "bm25_search_indexed",
    "doc_chunk_windows",
    "entropy_by_event_type",
    "events_cube",
    "bigram_logppl",
    "token_freq_spectrum",
    "tokenizer_fertility_by_lang",
    "knn_batch_cosine",
    # decontaminate_embeddings_semantic is NOT here for the same reason
    # as its siblings embedding_dup_components / _edges_incremental:
    # this fixture's unnormalized vectors (milli-quantized |el| ~3500,
    # dim 64) correctly trip the int64 overflow guard. Null vec_id /
    # embedding / label handling is covered by the planted test in
    # tests/test_similarity.py instead.
]


def test_dedup_kernels_survive_null_text(nullable_sf_dir):
    """minhash/simhash signature kernels must treat null text as zero
    tokens, not NaN lengths that explode np.repeat (r3 review: fixed in
    text.py but not in the dedup kernels)."""
    from laketide.functions import dedup

    cands = dedup.minhash_lsh_candidates(nullable_sf_dir).to_pandas()
    sim = dedup.simhash_dedup(nullable_sf_dir).to_pandas()
    ver = dedup.minhash_dedup_verified(nullable_sf_dir).to_pandas()
    assert len(cands) >= 0 and len(sim) >= 0 and len(ver) >= 0


@pytest.fixture(scope="module")
def nullable_sf_dir(tmp_path_factory):
    """events with 10% null user_id / null value / null props, documents
    with null text rows — same schemas as the driver tables."""
    d = tmp_path_factory.mktemp("nullable_sf")
    rng = np.random.RandomState(99)
    n = 400
    uid = rng.randint(0, 25, size=n).astype("float64")
    uid[rng.rand(n) < 0.1] = np.nan
    val = rng.rand(n) * 100
    val[rng.rand(n) < 0.1] = np.nan
    ts = pd.Series(
        pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, size=n), unit="s")
    )
    ts[rng.rand(n) < 0.08] = pd.NaT  # null event times (oracle: lag gap NULL)
    props = pd.Series([f"p{i % 7}" for i in range(n)], dtype="object")
    props[rng.rand(n) < 0.15] = None
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": pd.array(
                [None if np.isnan(u) else int(u) for u in uid], dtype="Int64"
            ),
            "event_type": [f"t{i % 5}" for i in range(n)],
            "value": val,
            "props": props,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(ev, preserve_index=False), str(d / "events.parquet")
    )
    # include OVERLAP_RULES tokens so lookup_join_overlap produces rows
    words = ["alpha", "beta", "join", "the", "of", "sort", "stream", "delta."]
    texts = pd.Series(
        [" ".join(rng.choice(words, size=12)) for _ in range(120)], dtype="object"
    )
    texts[rng.rand(120) < 0.1] = None
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype="int64"),
            "text": texts,
            "lang": [["en", "de", "fr"][i % 3] for i in range(120)],
            "source": [f"s{i % 4}" for i in range(120)],
            "n_chars": [len(t) if t is not None else 0 for t in texts],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), str(d / "documents.parquet")
    )
    # embeddings with null rows: null vectors must be EXCLUDED from
    # similarity (oracle: list_cosine_similarity(NULL, q) sorts last)
    dim = 64
    m = 80
    emb = [
        None if rng.rand() < 0.1 else rng.standard_normal(dim).tolist()
        for _ in range(m)
    ]
    et = pa.table(
        {
            "vec_id": pa.array(list(range(m)), pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
            # 5% null labels: SQL GROUP BY keeps the null group — the
            # centroid/norm group paths must not die or drop it
            "label": pa.array(
                [None if rng.rand() < 0.05 else i % 7 for i in range(m)], pa.int64()
            ),
        }
    )
    pq.write_table(et, str(d / "embeddings.parquet"))
    # orders/customer with null + dangling keys: FULL OUTER right-only
    # rows and the percent_rank null-price exclusion need them
    no = 300
    ok = rng.randint(0, 40, size=no).astype("float64")
    ok[rng.rand(no) < 0.1] = np.nan
    price = rng.rand(no) * 1000
    price[rng.rand(no) < 0.1] = np.nan
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(no, dtype="int64"),
            "o_custkey": pd.array(
                [None if np.isnan(x) else int(x) for x in ok], dtype="Int64"
            ),
            "o_orderstatus": [["F", "O", "P"][i % 3] for i in range(no)],
            "o_totalprice": price,
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, size=no), unit="s"),
            "o_orderpriority": [f"{i % 3}-X" for i in range(no)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False), str(d / "orders.parquet")
    )
    cust = pd.DataFrame(
        {
            # keys 0..24 only: custkeys 25..39 dangle (right-only rows)
            "c_custkey": pd.array([None] + list(range(25)), dtype="Int64"),
            "c_name": [f"c{i}" for i in range(26)],
            "c_nationkey": pd.array([i % 5 for i in range(26)], dtype="Int64"),
            "c_acctbal": rng.rand(26) * 100,
            "c_mktsegment": pd.Series(
                [None if i % 9 == 0 else f"SEG{i % 3}" for i in range(26)],
                dtype="object",
            ),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(cust, preserve_index=False), str(d / "customer.parquet")
    )
    return str(d)


from test_queries_vs_oracle import _canon  # shared canonicalizer (nullable-safe)


@pytest.mark.parametrize("name", _NULLABLE_QUERIES)
def test_query_matches_oracle_with_nulls(name, nullable_sf_dir):
    ray_df = QUERIES[name](nullable_sf_dir)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nullable_sf_dir}/{t}.parquet')"
        )
    duck_df = con.execute(ORACLES[name]).df()
    assert len(ray_df) == len(duck_df), f"{name}: rows {len(ray_df)} vs {len(duck_df)}"
    a, b = _canon(ray_df), _canon(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_text_segments",
        "remove_boilerplate_segments",
        "unigram_logppl",
        "bigram_logppl",
        "dsir_importance_weights",
        "ppl_bucket_docs",
        "bm25_search",
        "bm25_search_indexed",
        "doc_chunk_windows",
        # the hash-threshold samplers share the same NaN-cast exposure:
        # a null doc_id would bucket by garbage while the oracle's NULL
        # comparison drops the row
        "temperature_sample",
        "stratified_sample_docs",
        "mixture_sample",
    ],
)
def test_null_doc_id_groups_dropped_like_oracle(name, tmp_path):
    """doc_id NULL rows must be DROPPED, not NaN-coerced to an arbitrary
    int64 group (r4 advisory): these ops' to_numpy fast paths would
    otherwise emit a group the oracle never has. The shared nullable
    fixture keeps doc_id non-null, so this corpus plants null doc_ids
    directly — including duplicate segments so the dedup is non-vacuous
    and the null doc's tokens still count toward the LM training mass on
    both sides."""
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, size=25)) for _ in range(40)]
    texts[5] = texts[3]  # duplicate spans across docs (incl. a null doc)
    texts[9] = texts[3]
    doc_id = pd.array(
        [None if i % 7 == 3 else i for i in range(40)], dtype="Int64"
    )
    docs = pa.Table.from_pandas(
        pd.DataFrame(
            {
                "doc_id": doc_id,
                "text": texts,
                # lang/source strata for the sampler ops (non-null so the
                # only null key under test is doc_id)
                "lang": [["en", "de", "fr"][i % 3] for i in range(40)],
                "source": [f"src{i % 4}" for i in range(40)],
            }
        ),
        preserve_index=False,
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    ray_df = QUERIES[name](str(d))
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    assert not ray_df["doc_id"].isna().any()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    duck_df = con.execute(ORACLES[name]).df()
    assert len(ray_df) == len(duck_df), f"{name}: rows {len(ray_df)} vs {len(duck_df)}"
    a, b = _canon(ray_df), _canon(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def test_osv_normalizer_survives_malformed_shapes(tmp_path):
    """I6: odd 'affected' shapes yield zero events (or drop the odd
    record), never a KeyError/ArrowTypeError that kills the sync."""
    import json

    from laketide.pipelines.cdc import LakeTable
    from laketide.sources import registry

    # all records missing 'affected' entirely -> inferred null type
    p1 = str(tmp_path / "no_affected.jsonl")
    with open(p1, "w") as fh:
        fh.write(json.dumps({"id": "X-1", "modified": "2024-01-01"}) + "\n")
    assert registry.read_source("osv-jsonl", p1).count() == 0

    # affected entries without a 'package' field
    p2 = str(tmp_path / "no_package.jsonl")
    with open(p2, "w") as fh:
        fh.write(
            json.dumps(
                {"id": "X-2", "modified": "2024-01-01", "details": "d",
                 "affected": [{"ranges": [{"events": [{"introduced": "0"}]}]}]}
            )
            + "\n"
        )
    assert registry.read_source("osv-jsonl", p2).count() == 0

    # mixed: one good record, one missing package -> good one survives
    p3 = str(tmp_path / "mixed.jsonl")
    with open(p3, "w") as fh:
        fh.write(
            json.dumps(
                {"id": "X-3", "modified": "2024-01-02", "details": "ok",
                 "affected": [{"package": {"ecosystem": "PyPI", "name": "frob"}}]}
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {"id": "X-4", "modified": "2024-01-02", "details": "bad",
                 "affected": [{"ranges": []}]}
            )
            + "\n"
        )
    t = LakeTable(str(tmp_path / "t"), num_partitions=2)
    t.apply_epoch(registry.read_source("osv-jsonl", p3))
    st = t.state_table()
    # canonicalized ecosystem: 'PyPI' -> 'pypi' (the gitlab-source
    # mapping), so cross-source merges key identically
    assert {(r["repo"], r["path"]) for r in st.to_pylist()} == {("pypi", "frob")}


def test_osv_gitlab_same_key_after_canonicalization(tmp_path):
    """The advertised cross-source merge can only fire if both sources
    canonicalize ecosystems identically."""
    import json

    from laketide.sources import registry

    osv = str(tmp_path / "o.jsonl")
    with open(osv, "w") as fh:
        fh.write(
            json.dumps(
                {"id": "O-1", "modified": "2024-01-01", "details": "x",
                 "affected": [{"package": {"ecosystem": "RubyGems", "name": "rails"}}]}
            )
            + "\n"
        )
    gl = str(tmp_path / "g.jsonl")
    with open(gl, "w") as fh:
        fh.write(
            json.dumps(
                {"identifier": "G-1", "package_slug": "gem/rails",
                 "description": "y", "date": "2024-01-02"}
            )
            + "\n"
        )
    ot = registry.read_source("osv-jsonl", osv).to_pandas()
    gt = registry.read_source("gitlab-jsonl", gl).to_pandas()
    assert ot["repo"].iloc[0] == gt["repo"].iloc[0] == "rubygems"
    assert ot["path"].iloc[0] == gt["path"].iloc[0] == "rails"
