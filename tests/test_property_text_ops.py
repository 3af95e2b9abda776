"""Hypothesis property suite for the round-4 text operators: span dedup
with reconstruction, unigram log-perplexity and window chunking must
match DuckDB on RANDOM corpora — tiny vocabularies (forcing heavy span
duplication), empty texts, single-token docs, whitespace-only shapes —
not just the fixed testdata."""

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings

import __ray_entry__ as entrymod
from tests.test_queries_vs_oracle import _canon, _to_pandas

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
_VOCAB = ["a", "b", "cc", "dd", "eee"]


def _random_docs(rng: np.random.RandomState, tmpdir: str) -> None:
    n = int(rng.randint(1, 30))
    texts = []
    for _ in range(n):
        k = int(rng.randint(0, 35))
        # tiny vocab + short docs -> many exact duplicate segments
        texts.append(" ".join(rng.choice(_VOCAB, size=k)) if k else "")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            # multi-lang incl. a null group: fertility/lang-grouped ops
            # must match SQL GROUP BY null semantics, not just 'en'
            "lang": [
                rng.choice(["en", "de", "xx"]) if rng.rand() > 0.15 else None
                for _ in range(n)
            ],
            "source": ["hyp"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None),
        f"{tmpdir}/documents.parquet",
    )


def _check(name: str, sf_dir: str) -> None:
    got = _canon(_to_pandas(QUERIES[name](sf_dir)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = _canon(con.execute(ORACLES[name]).fetch_arrow_table().to_pandas())
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_dedup_text_segments_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"seg{seed}"))
    _random_docs(rng, d)
    _check("dedup_text_segments", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_remove_boilerplate_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"boil{seed}"))
    _random_docs(rng, d)
    _check("remove_boilerplate_segments", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_gopher_quality_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"goph{seed}"))
    _random_docs(rng, d)
    _check("gopher_quality_filter", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_unigram_logppl_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"ppl{seed}"))
    _random_docs(rng, d)
    _check("unigram_logppl", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_doc_chunk_windows_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"chw{seed}"))
    _random_docs(rng, d)
    _check("doc_chunk_windows", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_bigram_logppl_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"bppl{seed}"))
    _random_docs(rng, d)
    _check("bigram_logppl", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_token_freq_spectrum_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"spec{seed}"))
    _random_docs(rng, d)
    _check("token_freq_spectrum", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_tokenizer_fertility_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"fert{seed}"))
    _random_docs(rng, d)
    _check("tokenizer_fertility_by_lang", d)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_property_bpe_merge_candidates_vs_duckdb(seed, tmp_path_factory):
    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp(f"bpe{seed}"))
    _random_docs(rng, d)
    _check("bpe_merge_candidates", d)
