"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline companions of the normalizers (SURVEY.md §2.2):
sha256 fingerprints (M10/M11), token counting, quality scoring,
n-gram language ID, rolling-hash document fingerprints.

All hot paths are vectorized (pyarrow.compute / pandas str kernels);
stateful pieces (compiled regexes, frequency tables) live in actor-pool
classes (``__init__`` once per actor).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from laketide.functions.reads import collect_tables
from laketide.stages.normalize import sha256_hex_column


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    from laketide.functions.reads import cpu_min_blocks, scrubbed_read

    return scrubbed_read(
        f"{sf_dir}/documents.parquet", columns=columns, min_blocks=cpu_min_blocks()
    )


def doc_sha256(sf_dir: str) -> rd.Dataset:
    """Per-row content hash (M11 analog — the per-row oracle invariant)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "sha": sha256_hex_column(t["text"])})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def docs_by_lang(sf_dir: str) -> rd.Dataset:
    """Grouped counts by lang (A3 ecosystem-count analog)."""
    return (
        _docs(sf_dir, columns=["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="total_chars"))
    )


def exact_dedup_docs(sf_dir: str) -> rd.Dataset:
    """Exact dedup: hash content, keep min doc_id per hash — the
    hash-partition + per-group-first pattern (reference analog: data-hash
    short-circuit R1 + deterministic identity M10)."""
    from laketide.functions.relational import keep_extreme

    ds = doc_sha256(sf_dir)

    def first(t: pa.Table) -> pa.Table:
        return keep_extreme(t, ["sha"], ["doc_id"], keep="first")

    return (
        ds.map_batches(first, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sha")
        .map_groups(first, batch_format="pyarrow")
    )


def token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per doc (split on single space to match the
    SQL oracle ``len(string_split(text, ' '))`` exactly)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def top_tokens(sf_dir: str) -> rd.Dataset:
    """Explode-then-group (A2: ``unnest(source) GROUP BY``): flatten
    tokens, pre-count per batch, small shuffle, top-50."""
    ds = _docs(sf_dir, columns=["text"])

    def pre(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        vc = pc.value_counts(toks)  # Arrow-native, no pandas round-trip
        return pa.table(
            {
                "token": pc.struct_field(vc, "values"),
                "c": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(50)
    )


_PUNCT_RE = r"[,.;:!?]"
# Fixed English stopword list, shared verbatim with the SQL oracle.
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "for", "on", "with")


def _stopword_counts(toks: "pa.Array | pa.ChunkedArray", lengths: np.ndarray):
    """Per-document stopword-hit counts from a token-list column: flatten
    once, vectorized set membership, per-doc segment sums (shared by
    ``doc_quality`` and ``gopher_quality_filter`` so the two quality
    queries cannot drift). ``lengths`` must partition the flattened
    values array (null lists as 0)."""
    from laketide.functions.dedup import _segment_sums

    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    return _segment_sums(is_stop.astype(np.int64), lengths)


def doc_quality(sf_dir: str) -> rd.Dataset:
    """Quality-scoring features: char/token counts, punctuation count and
    ratio, stopword count and ratio (deterministic int-derived doubles,
    bit-identical to the SQL oracle's division)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        stripped = pc.replace_substring_regex(t["text"], _PUNCT_RE, "")
        n_punct = pc.subtract(n_chars, pc.cast(pc.utf8_length(stripped), pa.int64()))
        ratio = pc.divide(
            pc.cast(n_punct, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())), pa.float64()),
        )
        # null text -> zero segment for the sums, but the OUTPUT stays
        # null (the oracle's list_sum over string_split(NULL) is NULL;
        # the other columns already propagate null through pc kernels)
        valid = pc.is_valid(t["text"]).to_numpy(zero_copy_only=False)
        lengths = (
            pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_stop = _stopword_counts(toks, lengths)
        stop_ratio = n_stop / np.maximum(lengths, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "punct_ratio": ratio,
                "n_stop": pa.array(n_stop, pa.int64(), mask=~valid),
                "stop_ratio": pa.array(stop_ratio, pa.float64(), mask=~valid),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LangIdNgram:
    """Character-n-gram heuristic language ID — a stateful actor-pool stage
    (profiles built once per actor in __init__, ST1 pattern). Deterministic;
    no oracle (non-SQL op) — driver records a rows-only check."""

    PROFILES = {
        "en": ["the", "and", "ing", "ion", " th", "er ", " of", "is "],
        "de": ["der", "ein", "ich", "sch", "und", "die", "en ", "ung"],
        "fr": ["les", "ent", "de ", "que", "ion", "une", " le", "eur"],
        "es": ["que", "de ", "la ", "cion", "os ", "ent", " el", "ado"],
    }

    def __init__(self):
        self.profiles = {k: list(v) for k, v in self.PROFILES.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].str.lower()
        scores = {}
        for lang, grams in self.profiles.items():
            s = np.zeros(len(df), dtype=np.int64)
            for g in grams:
                s += text.str.count(re.escape(g)).to_numpy()
            scores[lang] = s
        mat = np.stack([scores[k] for k in sorted(scores)], axis=1)
        langs = np.array(sorted(scores))
        best = langs[mat.argmax(axis=1)]
        best = np.where(mat.max(axis=1) == 0, "und", best)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "lang_pred": best, "lang_score": mat.max(axis=1)}
        )


def langid_oracle_sql() -> str:
    """DuckDB equivalent of ``langid_ngram``: each gram's occurrence
    count as a replace-length diff (non-overlapping, same as the regex
    count), argmax with alphabetical tie-break (numpy argmax picks the
    first maximum over the alphabetically-sorted lang axis), zero-score
    docs -> 'und'."""
    langs = sorted(LangIdNgram.PROFILES)

    def score(lang: str) -> str:
        terms = " + ".join(
            f"CAST((length(lower(text)) - length(replace(lower(text), '{g}', ''))) "
            f"// {len(g)} AS BIGINT)"
            for g in LangIdNgram.PROFILES[lang]
        )
        return f"({terms})"

    scores = ", ".join(f"{score(l)} AS s_{l}" for l in langs)
    cols = ", ".join(f"s_{l}" for l in langs)
    m = "greatest(" + cols + ")"
    case = " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in langs)
    return (
        f"SELECT doc_id, CASE WHEN m = 0 THEN 'und' {case} END AS lang_pred, "
        "m AS lang_score FROM ("
        f"SELECT doc_id, {cols}, {m} AS m FROM ("
        f"SELECT doc_id, {scores} FROM documents))"
    )


def langid_ngram(sf_dir: str) -> rd.Dataset:
    # instance closure: profiles build once on the driver and ship with
    # the task fn (actor pools reserved for heavy state)
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        LangIdNgram(), batch_format="pandas"
    )


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Rolling polynomial hash fingerprint over tokens (document
    fingerprinting for fast similarity bucketing). Deterministic,
    no SQL oracle.

    Fully vectorized: token hashes via pandas' C-level siphash, then
    h = sum(th[i] * BASE^(L-1-i)) mod 2^64 — numpy uint64 wraparound
    gives the modulus for free; per-doc sums via add.reduceat. No
    per-token (let alone per-character) Python."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    BASE = np.uint64(1_000_003)

    def f(t: pa.Table) -> pa.Table:
        from laketide.functions.dedup import _token_hashes

        th, lengths = _token_hashes(t["text"])
        n_docs = t.num_rows
        fp = np.zeros(n_docs, dtype=np.uint64)
        if len(th):
            max_len = int(lengths.max())
            pw = np.ones(max_len, dtype=np.uint64)
            np.multiply.accumulate(
                np.full(max_len, BASE, dtype=np.uint64)[: max(max_len - 1, 0)],
                out=pw[1:] if max_len > 1 else pw[:0],
            )
            from laketide.functions.dedup import _segment_sums

            offs = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
            local = np.arange(len(th), dtype=np.int64) - np.repeat(offs, lengths)
            expo = np.repeat(lengths, lengths) - 1 - local
            fp = _segment_sums(th * pw[expo], lengths)
        hexes = np.char.mod("%016x", fp)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(hexes.tolist(), pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def docs_filter_en(sf_dir: str) -> rd.Dataset:
    """Predicate filter + projection pushdown (M2/M6 ecosystem/state
    filter analog): the lang predicate is evaluated by the parquet scan."""
    import pyarrow.dataset as pds

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
        filter=(pds.field("lang") == "en") & (pds.field("n_chars") > 200),
    )


def doc_summary(sf_dir: str) -> rd.Dataset:
    """Preferred-description summary projection over the corpus (M8/M9
    analog; reference normalizer.go:339-356): short texts pass through,
    else the first '. '-sentence if it fits 100 chars (dot restored),
    else a 97-char truncation + '...'. Reuses the vectorized
    summarize_description kernel; oracle-checked against the same CASE
    in DuckDB."""
    from laketide.sources.registry import summarize_description

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "summary": summarize_description(t["text"])}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def docs_by_source(sf_dir: str) -> rd.Dataset:
    """Grouped counts by source (A2 count-by-source analog)."""
    return (
        _docs(sf_dir, columns=["source"]).groupby("source").aggregate(Count(alias_name="n"))
    )


def dedup_stats(sf_dir: str) -> pa.Table:
    """Corpus dedup summary (the headline number a dedup pass reports):
    total docs, distinct contents, duplicate count and ratio. ONE pass
    over the corpus (sha256 is the cost): the grouped per-sha counts
    yield both totals — n_unique = group count, n_docs = sum of counts."""
    from ray.data.aggregate import Count

    grouped = doc_sha256(sf_dir).groupby("sha").aggregate(Count(alias_name="c"))

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array([t.num_rows], pa.int64()),
                "n": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64()),
            }
        )

    parts = grouped.map_batches(partial, batch_format="pyarrow").take_all()
    n_unique = sum(p["u"] for p in parts)
    n_docs = sum(p["n"] for p in parts)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_unique": pa.array([n_unique], pa.int64()),
            "n_dups": pa.array([n_docs - n_unique], pa.int64()),
            "dup_ratio": pa.array(
                [(n_docs - n_unique) / max(n_docs, 1)], pa.float64()
            ),
        }
    )


def quantile_read(hist, val_col: str, qs) -> dict:
    """Driver read-off of an exact value-count histogram (pandas frame
    sorted by ``val_col`` with count column ``n``): for each q the
    smallest value whose cumulative count reaches ceil(q*n) — DuckDB
    ``quantile_disc`` rank semantics (verified empirically). Shared by
    every quantile operator so the rank rule lives in ONE place."""
    import math

    total = int(hist["n"].sum())
    cum = hist["n"].cumsum()
    out = {}
    for q in qs:
        rank = max(1, math.ceil(q * total)) if total else 0
        idx = (cum >= rank).idxmax() if total else None
        out[f"q{int(q*100)}"] = int(hist.loc[idx, val_col]) if total else None
    return out


def doc_length_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95)) -> pa.Table:
    """EXACT length quantiles via a distributed value-count histogram:
    per-batch (n_chars -> count) partials, one tiny grouped sum, then
    the quantile read off the cumulative histogram on the driver.
    Exact at ANY corpus size because distinct lengths are bounded (a
    histogram, not a sample) — no approximate-quantile sketch needed.
    Matches DuckDB ``quantile_disc`` (lower interpolation)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        import numpy as np

        vals, counts = np.unique(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table({"len": pa.array(vals), "c": pa.array(counts.astype(np.int64))})

    hist = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("len")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
        .sort_values("len")
    )
    out = quantile_read(hist, "len", qs)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in out.items()})


def length_quantiles_by_lang(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95)) -> pa.Table:
    """Grouped exact quantiles (stratified corpus stats): the
    doc_length_quantiles value-count-histogram scheme, keyed by lang —
    per-batch (lang, len) -> count partials via Arrow group_by, one tiny
    grouped sum, per-lang cumulative read-off on the driver. Exact at
    any corpus size; the shuffle carries only the histogram."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["lang", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"], "len": pc.cast(t["n_chars"], pa.int64())})
            .group_by(["lang", "len"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "len", "c"])

    hist = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "len"])
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "len"])
    )
    rows = {f"q{int(q*100)}": [] for q in qs}
    langs = []
    for lang, grp in hist.groupby("lang", dropna=False, sort=True):
        langs.append(lang)
        got = quantile_read(grp, "len", qs)
        for k, v in got.items():
            rows[k].append(v)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            **{k: pa.array(v, pa.int64()) for k, v in rows.items()},
        }
    )


def stratified_sample_docs(sf_dir: str, per_10k: int = 10_000) -> rd.Dataset:
    """Stratified deterministic sampling: every lang stratum is
    downsampled to ~the SMALLEST stratum's size (class balancing for
    training mixes). Two passes: a tiny per-lang count aggregate fixes
    each stratum's keep-rate, then the doc_sample_hash uint64-wraparound
    hash filters reproducibly — no RNG, layout-independent, and the
    oracle recomputes the identical rates with window counts."""
    counts = (
        _docs(sf_dir, columns=["lang"])
        .groupby("lang")
        .count()
        .to_pandas()
    )
    n_by_lang = dict(zip(counts["lang"], counts["count()"].astype(int)))
    target = min(n_by_lang.values()) if n_by_lang else 0
    # integer floor division, mirrored by the oracle's // — a float rate
    # would diverge on the boundary hash values
    thresh = {l: (target * per_10k) // n for l, n in n_by_lang.items()}

    ds = _docs(sf_dir, columns=["doc_id", "lang"])

    def f(t: pa.Table) -> pa.Table:
        # null doc_id would NaN-cast to an arbitrary uint64 bucket; the
        # SQL oracle's NULL comparison drops the row — filter to agree
        t = t.filter(pc.is_valid(t["doc_id"]))
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(per_10k)
        # vectorized per-stratum threshold: one boolean mask per lang
        # (strata are few), no per-row Python
        langs_np = t["lang"].to_numpy(zero_copy_only=False)
        th = np.zeros(t.num_rows, dtype=np.uint64)
        for l, v in thresh.items():
            th[langs_np == l] = v
        return t.filter(pa.array(h < th))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def doc_sample_hash(sf_dir: str) -> rd.Dataset:
    """Deterministic hash-based 5% sampling (reproducible sampling for
    training-data pipelines — NOT random_sample, which is seed+layout
    dependent)."""
    ds = _docs(sf_dir, columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        # uint64 wraparound (mod 2^64) — int64 multiply would wrap
        # SILENTLY to a negative at doc_id >= ~3.5e9 and numpy's floored
        # % then diverges from SQL's truncated %; the oracle mirrors the
        # wrap explicitly via HUGEINT % 2^64 (ids are non-negative)
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        keep = (ids * np.uint64(2654435761)) % np.uint64(100) < 5
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class BpeishTokenizer:
    """BPE-ish regex token counting. The count is ONE vectorized RE2
    kernel over the zero-copy Arrow column (pc.count_substring_regex
    counts the same non-overlapping left-to-right matches re.findall
    did — with no Python loop per row). ASCII-only classes so RE2 and
    DuckDB agree exactly; null text stays null (the oracle's
    len(regexp_extract_all(NULL, ...)))."""

    PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

    def __call__(self, t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], self.PATTERN), pa.int64()
                ),
            }
        )


def token_counts_bpe(sf_dir: str) -> rd.Dataset:
    """Sub-word-ish token counting with a vectorized regex (the
    BPE-shaped companion to whitespace ``token_counts``)."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        BpeishTokenizer(), batch_format="pyarrow", zero_copy_batch=True
    )


def top_tokens_by_lang(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Grouped explode-then-top-k: the k most frequent tokens per lang
    (n desc, token asc ties). Counts must complete BEFORE any pruning,
    so the plan is: per-batch (lang, token) count partials -> one
    grouped sum -> per-batch top-k prune (valid post-aggregation,
    associative) -> tiny per-lang reduce on a coarse lang partition."""
    import numpy as np

    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
    from laketide.functions.relational import _head_k_per_key, _key_hash_u64

    ds = _docs(sf_dir, columns=["lang", "text"])
    n_parts = _coarse_n_parts()

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["lang"]))
        toks_list = pc.split_pattern(t["text"], " ")
        lens = (
            pc.fill_null(pc.list_value_length(toks_list), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lang_rep = np.repeat(
            t["lang"].to_numpy(zero_copy_only=False), lens
        )
        g = (
            pa.table(
                {"lang": pa.array(lang_rep, pa.string()), "token": pc.list_flatten(toks_list)}
            )
            .group_by(["lang", "token"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "token", "c"])

    counts = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "token"])
        .aggregate(Sum("c", alias_name="n"))
    )

    def prune(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.column_names.index("n"), "n", pc.cast(t["n"], pa.int64())
        )
        t = _head_k_per_key(t, "lang", "n", k, descending=True, tiebreak="token")
        part = _coarse_parts(_key_hash_u64(t["lang"]), n_parts=n_parts)
        return t.append_column("_cpart", pa.array(part, pa.int64()))

    def final(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_cpart"])
        if t.num_rows == 0:
            return pa.schema(
                [("lang", pa.string()), ("token", pa.string()), ("n", pa.int64())]
            ).empty_table()
        return _head_k_per_key(t, "lang", "n", k, descending=True, tiebreak="token")

    return (
        counts.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(final, batch_format="pyarrow")
    )


def doc_normalize(sf_dir: str) -> rd.Dataset:
    """Text normalization (the pre-tokenization cleanup every training
    corpus runs): lowercase, strip the punctuation class, collapse
    whitespace runs, trim. Pure Arrow kernels per batch — zero-copy in,
    no Python strings. Emits the normalized text plus its length so the
    oracle can verify content and derived stats in one row."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, pattern=_PUNCT_RE, replacement="")
        x = pc.replace_substring_regex(x, pattern=" +", replacement=" ")
        x = pc.utf8_trim(x, " ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": x,
                "n_chars_norm": pc.cast(pc.utf8_length(x), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# --- IR / index-building operators -----------------------------------------
# Inverted-index primitives a retrieval or dedup pipeline needs on top of
# the raw token counts: document frequency, posting lists, n-gram counts.


def _doc_token_pairs(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, token) pairs for one batch — each document row
    lives in exactly ONE batch, so per-batch distinct pairs are globally
    distinct and partial document-frequency counts sum exactly."""
    toks = pc.split_pattern(t["text"], " ")
    lens = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    doc_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
    pairs = pa.table(
        {"doc_id": pa.array(doc_rep, pa.int64()), "token": pc.list_flatten(toks)}
    )
    return pairs.group_by(["doc_id", "token"]).aggregate([])


def _df_counts(sf_dir: str) -> rd.Dataset:
    """token -> document frequency: per-batch distinct-pair partials,
    one small (token, df) shuffle. Reference analog: the per-source
    vulnerability counters (A5) generalized to an IR statistic."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def pre(t: pa.Table) -> pa.Table:
        g = _doc_token_pairs(t).group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "c"])

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="df"))
    )


def doc_frequency(sf_dir: str, k: int = 100) -> rd.Dataset:
    """Top-k tokens by document frequency (distinct docs containing the
    token), df desc / token asc."""
    counts = _df_counts(sf_dir)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"token": t["token"], "df": pc.cast(t["df"], pa.int64())})

    return (
        counts.map_batches(cast, batch_format="pyarrow")
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
    )


def token_postings(sf_dir: str, n_tokens: int = 20, k_docs: int = 50) -> pa.Table:
    """Inverted index for the ``n_tokens`` highest-df tokens: posting
    list = the first ``k_docs`` doc_ids ascending, comma-joined, plus
    the token's full df. Two passes: (1) the tiny df top-k lands on the
    driver and the token set is captured by value into the second scan
    (a broadcast lookup, not a shuffle join); (2) per-batch distinct
    pairs -> bottom-k prune per token (associative, caps the exchange
    at k rows/token/batch) -> per-token list fold via Arrow ``list``
    agg + ``binary_join``. Posting lists are CAPPED so a stop-word's
    postings can never materialize the whole corpus on one reducer."""
    from laketide.functions.analytics import _cpart_col, _smallest_k_per_key

    import ray

    parts = collect_tables(doc_frequency(sf_dir, k=n_tokens))
    if not parts:
        return pa.schema(
            [("token", pa.string()), ("df", pa.int64()), ("posting", pa.string())]
        ).empty_table()
    top_t = pa.concat_tables(parts)
    tok_set = pa.array(top_t["token"].to_pylist(), pa.string())
    df_map = dict(zip(top_t["token"].to_pylist(), top_t["df"].to_pylist()))

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def pre(t: pa.Table) -> pa.Table:
        pairs = _doc_token_pairs(t)
        pairs = pairs.filter(pc.is_in(pairs["token"], value_set=tok_set))
        pairs = _smallest_k_per_key(pairs, "token", "doc_id", k_docs)
        return _cpart_col(pairs, "token")

    def final(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_cpart"])
        if t.num_rows == 0:
            return pa.schema(
                [("token", pa.string()), ("posting", pa.string())]
            ).empty_table()
        t = _smallest_k_per_key(t, "token", "doc_id", k_docs)
        # sorted (token, doc_id) — the list agg preserves row order
        t = t.set_column(
            t.column_names.index("doc_id"),
            "d_str",
            pc.cast(t["doc_id"], pa.string()),
        )
        lists = t.group_by(["token"]).aggregate([("d_str", "list")])
        return pa.table(
            {
                "token": lists["token"],
                "posting": pc.binary_join(lists["d_str_list"], ","),
            }
        )

    posted = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(final, batch_format="pyarrow")
    )
    out_parts = collect_tables(posted)
    if not out_parts:
        return pa.schema(
            [("token", pa.string()), ("df", pa.int64()), ("posting", pa.string())]
        ).empty_table()
    out = pa.concat_tables(out_parts).sort_by([("token", "ascending")])
    dfs = pa.array([df_map[tk] for tk in out["token"].to_pylist()], pa.int64())
    return pa.table(
        {"token": out["token"], "df": dfs, "posting": out["posting"]}
    )


def top_bigrams(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Top-k word bigrams (adjacent token pairs within a document):
    vectorized bigram construction from the flattened token array —
    positions whose successor starts a new document are masked out via
    the list offsets; ``binary_join_element_wise`` builds the pair
    strings without a Python loop. Per-batch count partials, one small
    (bigram, n) shuffle, top-k."""
    ds = _docs(sf_dir, columns=["text"])

    def pre(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        n = len(flat)
        if n < 2:
            return pa.schema(
                [("bigram", pa.string()), ("c", pa.int64())]
            ).empty_table()
        lens = (
            pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.cumsum(lens)[:-1]  # flat index where each next doc begins
        keep = np.ones(n - 1, dtype=bool)
        keep[starts[(starts > 0) & (starts <= n - 1)] - 1] = False
        left = flat.slice(0, n - 1).filter(pa.array(keep))
        right = flat.slice(1, n - 1).filter(pa.array(keep))
        bg = pc.binary_join_element_wise(left, right, " ")
        vc = pc.value_counts(bg)
        return pa.table(
            {
                "bigram": pc.struct_field(vc, "values"),
                "c": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("c", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


def doc_rare_token_stats(sf_dir: str) -> rd.Dataset:
    """Per-document rarity statistics against the GLOBAL document
    frequency table — the two-pass broadcast-statistics pattern a
    quality-filtering pipeline uses (rare-word ratio): pass 1 builds
    (token, df) + the corpus doc count (small: one row per vocab term —
    broadcastable via ray.put even for multi-million-term vocabularies;
    for larger vocabs, broadcast only the sub-threshold rare set);
    pass 2 rescans docs and resolves every stat with one index_in +
    reduceat per batch. All-integer outputs, so the oracle is exact:
    n_tokens, sum_df, min_df, and n_rare (df*10 <= n_docs)."""
    import ray

    dfs = _df_counts(sf_dir)
    parts = collect_tables(dfs)
    if not parts:
        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("sum_df", pa.int64()),
                    ("min_df", pa.int64()),
                    ("n_rare", pa.int64()),
                ]
            ).empty_table()
        )
    dft = pa.concat_tables(parts)
    tok_arr = dft["token"].combine_chunks()
    df_np = (
        pc.cast(dft["df"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    )

    def count_pre(t: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.is_valid(t["text"])).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    n_docs = int(
        _docs(sf_dir, columns=["text"])
        .map_batches(count_pre, batch_format="pyarrow", zero_copy_batch=True)
        .sum("n")
        or 0
    )
    bc = ray.put((tok_arr, df_np))

    def stats(t: pa.Table) -> pa.Table:
        toks_bc, dfv_bc = ray.get(bc)
        t = t.filter(pc.is_valid(t["text"]))
        toks = pc.split_pattern(t["text"], " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if len(lens) == 0:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("sum_df", pa.int64()),
                    ("min_df", pa.int64()),
                    ("n_rare", pa.int64()),
                ]
            ).empty_table()
        idx = pc.index_in(pc.list_flatten(toks), value_set=toks_bc)
        dfv = dfv_bc[idx.combine_chunks().to_numpy(zero_copy_only=False)]
        # split("") yields [""], so every kept doc has >= 1 token and
        # reduceat segments are never empty
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        rare = (dfv * 10 <= n_docs).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(lens),
                "sum_df": pa.array(np.add.reduceat(dfv, starts)),
                "min_df": pa.array(np.minimum.reduceat(dfv, starts)),
                "n_rare": pa.array(np.add.reduceat(rare, starts)),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def _word_trigram_rows(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, gram) word-trigram rows for one batch,
    matching the repo's shared trigram rule (dedup kernels + SQL
    `_TRIGRAM_GRAMS_CTE`): docs with >= 3 tokens emit every adjacent
    3-token window; shorter non-empty docs emit ONE gram joining all
    their tokens; null text emits nothing. Fully vectorized — the
    trigram windows are gathered from the flattened token array via a
    ragged-arange index, no per-doc Python."""
    t = t.filter(pc.is_valid(t["text"]))
    if t.num_rows == 0:
        return pa.schema([("doc_id", pa.int64()), ("gram", pa.string())]).empty_table()
    toks = pc.split_pattern(t["text"], " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_np = t["doc_id"].to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).combine_chunks()
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)

    short = lens < 3
    short_grams = pc.binary_join(
        toks.filter(pa.array(short)).combine_chunks(), " "
    )
    short_ids = pa.array(doc_np[short], pa.int64())

    tri_n = np.maximum(lens - 2, 0)
    tot = int(tri_n.sum())
    if tot:
        off = np.concatenate([[0], np.cumsum(tri_n)[:-1]]).astype(np.int64)
        base = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(off, tri_n)
            + np.repeat(starts, tri_n)
        )
        l = flat.take(pa.array(base))
        m = flat.take(pa.array(base + 1))
        r = flat.take(pa.array(base + 2))
        tri = pc.binary_join_element_wise(l, m, r, " ")
        tri_ids = pa.array(np.repeat(doc_np, tri_n), pa.int64())
    else:
        tri = pa.array([], pa.string())
        tri_ids = pa.array([], pa.int64())

    rows = pa.table(
        {
            "doc_id": pa.concat_arrays([tri_ids, short_ids]),
            "gram": pa.concat_arrays(
                [tri.combine_chunks() if isinstance(tri, pa.ChunkedArray) else tri,
                 short_grams.combine_chunks() if isinstance(short_grams, pa.ChunkedArray) else short_grams]
            ),
        }
    )
    return rows.group_by(["doc_id", "gram"]).aggregate([])


def benchmark_contamination(sf_dir: str, n_bench: int = 20) -> rd.Dataset:
    """Benchmark-contamination scan (the decontamination step of a
    training-data pipeline): for every corpus doc, how many DISTINCT
    word trigrams it shares with a held-out benchmark set (here: docs
    with doc_id < n_bench). The benchmark gram set is built from one
    tiny filtered read and broadcast via ray.put (at 100 TB the
    benchmark side — eval suites — stays small; the corpus side streams
    and never shuffles: per-batch is_in filter + per-doc distinct
    count). Docs sharing nothing are omitted, like the SQL inner join."""
    import ray

    def bench_filter(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.fill_null(pc.less(t["doc_id"], pa.scalar(n_bench)), False)
        )

    parts = collect_tables(
        _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
            bench_filter, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if parts:
        bench_rows = _word_trigram_rows(pa.concat_tables(parts))
        bench_set = pc.unique(bench_rows["gram"].combine_chunks())
    else:
        bench_set = pa.array([], pa.string())
    bc = ray.put(bench_set)

    def scan(t: pa.Table) -> pa.Table:
        bset = ray.get(bc)
        t = t.filter(
            pc.and_kleene(
                pc.is_valid(t["doc_id"]),
                pc.greater_equal(t["doc_id"], pa.scalar(n_bench)),
            )
        )
        rows = _word_trigram_rows(t)
        rows = rows.filter(pc.is_in(rows["gram"], value_set=bset))
        g = rows.group_by(["doc_id"]).aggregate([([], "count_all")])
        g = g.rename_columns(["doc_id", "n_shared"])
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "n_shared": pc.cast(g["n_shared"], pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )


def _decontaminate_pass(
    sf_dir: str,
    n_bench: int,
    hit_mask_fn,
    out_columns: tuple[str, ...] = ("doc_id", "lang", "n_chars"),
) -> rd.Dataset:
    """Shared decontamination corpus pass: stream the corpus
    shuffle-free, drop every doc with ANY benchmark-gram hit.
    ``hit_mask_fn(gram_array) -> boolean array`` is the one point the
    exact and bloom variants differ on (set membership vs bitmap
    probe). Null text emits no grams -> never dirty -> kept, like the
    SQL NOT EXISTS."""
    cols = sorted({"doc_id", "text", *out_columns})
    out = list(out_columns)

    def keep_clean(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_kleene(
                pc.is_valid(t["doc_id"]),
                pc.greater_equal(t["doc_id"], pa.scalar(n_bench)),
            )
        )
        if t.num_rows == 0:
            return t.select(out)
        rows = _word_trigram_rows(t)
        if rows.num_rows:
            hits = hit_mask_fn(rows["gram"].combine_chunks())
            dirty = pc.unique(rows["doc_id"].combine_chunks().filter(hits))
            t = t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=dirty)))
        return t.select(out)

    return _docs(sf_dir, columns=cols).map_batches(
        keep_clean, batch_format="pyarrow", zero_copy_batch=True
    )


def _bench_gram_set(sf_dir: str, n_bench: int) -> pa.Array:
    """Distinct word trigrams of the held-out benchmark docs
    (doc_id < n_bench) — the tiny broadcast side of decontamination."""

    def bench_filter(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.fill_null(pc.less(t["doc_id"], pa.scalar(n_bench)), False)
        )

    parts = collect_tables(
        _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
            bench_filter, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if parts:
        bench_rows = _word_trigram_rows(pa.concat_tables(parts))
        return pc.unique(bench_rows["gram"].combine_chunks())
    return pa.array([], pa.string())


def decontaminate_docs(sf_dir: str, n_bench: int = 20) -> rd.Dataset:
    """The decontamination FILTER (complement of the
    ``benchmark_contamination`` scan): keep only corpus docs sharing NO
    word trigram with the held-out benchmark set (doc_id < n_bench) —
    what a training-data pipeline actually ships to the tokenizer.
    Returns the surviving (doc_id, lang, n_chars) rows.

    Same scale shape as the scan: the benchmark gram set is one tiny
    filtered read broadcast via ray.put; the corpus side streams
    shuffle-free (per-batch is_in + per-doc any-hit fold)."""
    import ray

    bc = ray.put(_bench_gram_set(sf_dir, n_bench))
    return _decontaminate_pass(
        sf_dir, n_bench, lambda grams: pc.is_in(grams, value_set=ray.get(bc))
    )


def duplicated_ngram_share(sf_dir: str) -> rd.Dataset:
    """Per-document CROSS-CORPUS duplication profile (the
    RefinedWeb/MassiveText-style near-dup *signal*, as distinct from the
    within-doc repetition of ``doc_bigram_repetition`` and the
    benchmark-only scan of ``benchmark_contamination``): for every doc,
    the fraction of its distinct word trigrams that also appear in at
    least one OTHER document. Returns
    (doc_id, n_grams, n_shared, dup_share).

    Scale shape: trigram rows shuffle ONCE on a coarse gram-hash
    partition (every occurrence of a gram co-locates, so the per-gram
    doc count is exact within its partition — no per-gram map_groups),
    then per-doc partials fold through a second small coarse reduce
    keyed on doc_id (O(docs x partitions) rows, not O(gram rows)). At
    100 TB the gram exchange is the inherent cost of a cross-corpus
    count; rows are (doc_id, gram) pairs only — dictionary-encoding the
    gram column cuts the exchange further if needed."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
    from laketide.functions.relational import _coarse_key_reduce, _key_hash_u64

    n_parts = _coarse_n_parts()
    partial_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_shared", pa.int64()), ("n_grams", pa.int64())]
    )

    def gram_rows(t: pa.Table) -> pa.Table:
        rows = _word_trigram_rows(t)
        part = _coarse_parts(_key_hash_u64(rows["gram"]), n_parts=n_parts)
        return rows.append_column("_cpart", pa.array(part, pa.int64()))

    def per_part(t: pa.Table) -> pa.Table:
        # one co-located partition = many whole gram groups: count docs
        # per gram (rows are distinct per (doc, gram)), flag shared>=2,
        # fold to per-doc partials — all Arrow kernels, no per-key UDF
        if t.num_rows == 0 or "gram" not in t.column_names:
            return partial_schema.empty_table()
        counts = t.group_by(["gram"]).aggregate([([], "count_all")])
        idx = pc.index_in(
            t["gram"].combine_chunks(), value_set=counts["gram"].combine_chunks()
        )
        n_docs = counts["count_all"].combine_chunks().take(idx)
        shared = pc.cast(pc.greater_equal(n_docs, 2), pa.int64())
        p = pa.table({"doc_id": t["doc_id"], "shared": shared})
        g = p.group_by(["doc_id"]).aggregate([("shared", "sum"), ([], "count_all")])
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "n_shared": pc.cast(g["shared_sum"], pa.int64()),
                "n_grams": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(
            lambda g: per_part(g.drop_columns(["_cpart"])), batch_format="pyarrow"
        )
    )

    def fold(t: pa.Table) -> pa.Table:
        # associative: share is re-derived from the summed counters, so
        # running this as both the batch pre-reduce and the final
        # per-partition reduce is exact
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return partial_schema.empty_table().append_column(
                "dup_share", pa.array([], pa.float64())
            )
        g = t.group_by(["doc_id"]).aggregate(
            [("n_shared", "sum"), ("n_grams", "sum")]
        )
        ns = pc.cast(g["n_shared_sum"], pa.int64())
        ng = pc.cast(g["n_grams_sum"], pa.int64())
        share = pc.divide(pc.cast(ns, pa.float64()), pc.cast(ng, pa.float64()))
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "n_shared": ns,
                "n_grams": ng,
                "dup_share": share,
            }
        )

    return _coarse_key_reduce(partials, ["doc_id"], fold)


def tfidf_top_terms(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-document top-k TF-IDF terms (the IR ranking primitive a
    training-data pipeline uses for keyword extraction / quality
    weighting). Two streaming passes: (1) the global (token, df) table
    + corpus doc count (vocab-scale -> ray.put broadcast, the
    doc_rare_token_stats pattern); (2) rescan docs, compute per-doc
    term frequencies batch-locally (each doc lives wholly in one row),
    score tf * ln(n_docs/df), keep the per-doc top-k (score desc,
    token asc — _head_k_per_key is exact per batch because a doc never
    spans batches).

    idf is computed with ``math.log`` per VOCAB entry on the driver —
    bit-identical to DuckDB's ``ln()`` (both call libm log), where
    numpy's vectorized log can differ in the last ulp and flip the
    value hash."""
    import math

    import ray

    from laketide.functions.relational import _head_k_per_key

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("token", pa.string()), ("tfidf", pa.float64())]
    )
    parts = collect_tables(_df_counts(sf_dir))
    if not parts:
        return rd.from_arrow(out_schema.empty_table())
    dft = pa.concat_tables(parts)
    tok_arr = dft["token"].combine_chunks()
    df_np = (
        pc.cast(dft["df"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    )

    def count_pre(t: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.is_valid(t["text"])).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    n_docs = int(
        _docs(sf_dir, columns=["text"])
        .map_batches(count_pre, batch_format="pyarrow", zero_copy_batch=True)
        .sum("n")
        or 0
    )
    idf_np = np.fromiter(
        (math.log(n_docs / d) for d in df_np.tolist()), np.float64, len(df_np)
    )
    bc = ray.put((tok_arr, idf_np))

    def score(t: pa.Table) -> pa.Table:
        toks_bc, idf_bc = ray.get(bc)
        t = t.filter(pc.is_valid(t["text"]))
        if t.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(t["text"], " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        doc_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        tf_t = (
            pa.table(
                {"doc_id": pa.array(doc_rep, pa.int64()), "token": pc.list_flatten(toks)}
            )
            .group_by(["doc_id", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "token", "tf"])
        )
        idx = pc.index_in(tf_t["token"], value_set=toks_bc)
        # every scanned token is in the pass-1 vocabulary by construction
        pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        tf = (
            pc.cast(tf_t["tf"], pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        scored = pa.table(
            {
                "doc_id": tf_t["doc_id"],
                "token": tf_t["token"],
                "tfidf": pa.array(tf * idf_bc[pos], pa.float64()),
            }
        )
        return _head_k_per_key(scored, "doc_id", "tfidf", k, tiebreak="token")

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def bigram_pmi(sf_dir: str, k: int = 50) -> pa.Table:
    """Pointwise mutual information of the top-k bigrams:
    pmi = ln( (c_xy/N_bi) / ((c_x/N_uni) * (c_y/N_uni)) ) — the
    collocation-strength score an n-gram phrase miner uses. Pass A
    builds bigram count partials ONCE (materialized: counts, not
    content), serving both the top-k and the exact N_bi total; pass B
    rescans docs for the unigram counts of only the <=2k tokens the top
    bigrams mention (broadcast membership filter) plus the exact N_uni,
    folded into one scan via a null-token total row. PMI itself is
    driver math over exact integer counts with libm log — bit-equal to
    the oracle's ln() (the tfidf_top_terms precedent)."""
    import math

    import ray

    out_schema = pa.schema(
        [("bigram", pa.string()), ("n_bigram", pa.int64()), ("pmi", pa.float64())]
    )
    ds = _docs(sf_dir, columns=["text"])

    def bigram_pre(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        n = len(flat)
        if n < 2:
            return pa.schema([("bigram", pa.string()), ("c", pa.int64())]).empty_table()
        lens = (
            pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.cumsum(lens)[:-1]
        keep = np.ones(n - 1, dtype=bool)
        keep[starts[(starts > 0) & (starts <= n - 1)] - 1] = False
        left = flat.slice(0, n - 1).filter(pa.array(keep))
        right = flat.slice(1, n - 1).filter(pa.array(keep))
        vc = pc.value_counts(pc.binary_join_element_wise(left, right, " "))
        return pa.table(
            {
                "bigram": pc.struct_field(vc, "values"),
                "c": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    partials = ds.map_batches(
        bigram_pre, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_bi = int(partials.sum("c") or 0)
    if n_bi == 0:
        return out_schema.empty_table()
    top_parts = collect_tables(
            partials.groupby("bigram")
            .aggregate(Sum("c", alias_name="n"))
            .sort(["n", "bigram"], descending=[True, False])
            .limit(k)

        )
    top = pa.concat_tables([p.replace_schema_metadata(None) for p in top_parts])
    bigrams = top["bigram"].to_pylist()
    c_xy = pc.cast(top["n"], pa.int64()).to_pylist()
    pair_toks = [b.split(" ") for b in bigrams]
    needed = sorted({tok for pair in pair_toks for tok in pair})
    need_set = pa.array(needed, pa.string())
    bc = ray.put(need_set)

    def uni_pre(t: pa.Table) -> pa.Table:
        from laketide.functions.asof import _arr

        flat = pc.list_flatten(pc.split_pattern(t["text"], " ")).combine_chunks()
        total = len(flat)
        hits = flat.filter(pc.is_in(flat, value_set=ray.get(bc)))
        vc = pc.value_counts(hits)
        n = len(pc.struct_field(vc, "values"))
        # the is_total row carries this batch's total token count — one
        # scan serves both aggregates (an explicit flag, NOT a null
        # token key: Ray's aggregate sort dies on null string keys)
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [_arr(pc.struct_field(vc, "values")), pa.array([""], pa.string())]
                ),
                "is_total": pa.array([False] * n + [True], pa.bool_()),
                "c": pa.concat_arrays(
                    [
                        _arr(pc.cast(pc.struct_field(vc, "counts"), pa.int64())),
                        pa.array([total], pa.int64()),
                    ]
                ),
            }
        )

    uni_parts = collect_tables(
            ds.map_batches(uni_pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["token", "is_total"])
            .aggregate(Sum("c", alias_name="n"))

        )
    ut = pa.concat_tables([p.replace_schema_metadata(None) for p in uni_parts])
    counts: dict = {}
    n_uni = 0
    for tok, is_total, c in zip(
        ut["token"].to_pylist(),
        ut["is_total"].to_pylist(),
        pc.cast(ut["n"], pa.int64()).to_pylist(),
    ):
        if is_total:
            n_uni = c
        else:
            counts[tok] = c
    pmi = [
        math.log(
            (cxy / n_bi) / ((counts[x] / n_uni) * (counts[y] / n_uni))
        )
        for cxy, (x, y) in zip(c_xy, pair_toks)
    ]
    return pa.table(
        {
            "bigram": pa.array(bigrams, pa.string()),
            "n_bigram": pa.array(c_xy, pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        }
    )


_BM25_K1, _BM25_B = 1.5, 0.75
_BM25_QUERY = ("data", "stream", "fast", "join")


def bm25_search(sf_dir: str, k: int = 10, from_index: bool = False) -> pa.Table:
    """BM25 retrieval (Robertson/Lucene idf variant) of the corpus
    against a fixed token query — the scoring core of a search /
    contamination-lookup pipeline. Two streaming scans: (1) one-row
    per-batch corpus statistics (doc count, total tokens, per-query-
    token document frequencies — docs never span batches, so the
    partials sum exactly); (2) vectorized per-doc term frequencies
    (equality mask + reduceat over the flattened token array), the
    BM25 formula evaluated with the SAME expression tree as the SQL
    oracle (exact integer inputs -> bit-equal doubles), per-batch
    top-k, driver merge.

    ``from_index=True`` serves the query from the PERSISTED inverted
    index (:func:`bm25_index_build`; builds it on first use): only the
    query tokens' posting lists leave storage instead of the corpus
    text — the scale path for repeated retrieval over a fixed corpus."""
    import math

    import ray

    if from_index:
        return _bm25_search_indexed(sf_dir, k)

    out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    q_toks = _BM25_QUERY

    def stats_pre(t: pa.Table) -> pa.Table:
        t, lens, flat = _bm25_tokens(t)
        cols = {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "total_tokens": pa.array([int(lens.sum())], pa.int64()),
        }
        if len(lens):
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            for i, tok in enumerate(q_toks):
                eq = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
                per_doc = np.add.reduceat(eq.astype(np.int64), starts) * (lens > 0)
                cols[f"df{i}"] = pa.array([int((per_doc > 0).sum())], pa.int64())
        else:
            for i in range(len(q_toks)):
                cols[f"df{i}"] = pa.array([0], pa.int64())
        return pa.table(cols)

    stats = ds.map_batches(stats_pre, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n_docs", "total_tokens"] + [f"df{i}" for i in range(len(q_toks))]
    )
    n_docs = int(stats["sum(n_docs)"] or 0)
    if n_docs == 0:
        return out_schema.empty_table()
    total_tokens = int(stats["sum(total_tokens)"])
    avgdl = float(total_tokens) / float(n_docs)
    idf = [
        math.log((float(n_docs) - stats[f"sum(df{i})"] + 0.5)
                 / (stats[f"sum(df{i})"] + 0.5) + 1.0)
        for i in range(len(q_toks))
    ]
    bc = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(bc)
        t, lens, flat = _bm25_tokens(t)
        if t.num_rows == 0:
            return out_schema.empty_table()
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        dl = lens.astype(np.float64)
        sc = np.zeros(t.num_rows, np.float64)
        denom_base = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl_))
        for i, tok in enumerate(q_toks):
            eq = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
            tf = (np.add.reduceat(eq.astype(np.int64), starts) * (lens > 0)).astype(
                np.float64
            )
            sc += idf_[i] * (tf * (_BM25_K1 + 1.0)) / (tf + denom_base)
        out = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        ).sort_by([("score", "descending"), ("doc_id", "ascending")])
        return out.slice(0, k)

    parts = collect_tables(
            ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

        )
    if not parts:
        return out_schema.empty_table()
    return (
        pa.concat_tables(parts)
        .sort_by([("score", "descending"), ("doc_id", "ascending")])
        .slice(0, k)
    )


_BM25_POSTINGS_SCHEMA = pa.schema(
    [
        ("token", pa.string()),
        ("doc_id", pa.int64()),
        ("dl", pa.int64()),
        ("tf", pa.int64()),
    ]
)
_BM25_DOCLEN_SCHEMA = pa.schema([("doc_id", pa.int64()), ("dl", pa.int64())])


def _bm25_index_dir(sf_dir: str) -> str:
    from laketide.functions.artifacts import fingerprint_dir
    import os

    return fingerprint_dir(
        "bm25", "bm", os.path.join(sf_dir, "documents.parquet"), "tok-space-v1"
    )


def _bm25_tokens(t: pa.Table):
    """Shared tokenizer of the BM25 family (whitespace split on the
    single-space separator; null text AND null doc_id rows dropped —
    the repo-wide null-key rule: a null doc_id would NaN-cast to an
    arbitrary int64 in the postings build) — build and scan paths MUST
    tokenize identically or tf/dl diverge. Returns the filtered table,
    per-doc lengths (int64 numpy) and the flattened token array."""
    t = t.filter(pc.and_(pc.is_valid(t["text"]), pc.is_valid(t["doc_id"])))
    toks = pc.split_pattern(t["text"], " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).combine_chunks()
    return t, lens, flat


def _bm25_postings(sf_dir: str) -> rd.Dataset:
    """(token, doc_id, dl, tf) posting rows, one per distinct
    (token, document) pair, globally SORTED by token so every parquet
    row group covers a narrow token range and a query's pushed-down
    ``token IN (...)`` predicate prunes at the footer level. ``dl`` is
    denormalized into the posting row (one extra int64) so scoring
    needs no doc-length join at query time."""

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        t, lens, flat = _bm25_tokens(t)
        if t.num_rows == 0 or len(flat) == 0:
            return _BM25_POSTINGS_SCHEMA.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    "token": flat,
                    "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
                    "dl": pa.array(np.repeat(lens, lens), pa.int64()),
                }
            )
            .group_by(["token", "doc_id", "dl"])
            .aggregate([([], "count_all")])
            .rename_columns(["token", "doc_id", "dl", "tf"])
        )
        # "" tokens (adjacent separators) count toward dl exactly like
        # the scan path's reduceat, but can never match a query token —
        # don't store their postings
        return g.filter(pc.not_equal(g["token"], ""))

    return ds.map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    ).sort("token")


def _bm25_doclens(sf_dir: str) -> rd.Dataset:
    """(doc_id, dl) for every valid-text document — the doc universe a
    query needs only when fewer than k documents match any query token
    (zero-score fill keeps the indexed path's output identical to the
    full-corpus scan's)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t, lens, _ = _bm25_tokens(t)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "dl": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def bm25_index_build(sf_dir: str) -> str:
    """Build (or reuse) the PERSISTED BM25 inverted-index artifact:
    token-sorted posting rows plus the doc-length table plus an
    INDEX.json manifest carrying the exact corpus statistics (n_docs,
    total_tokens), published with the lake's atomic-publish discipline
    (staging dir -> one os.replace). The cache key is the corpus
    fingerprint (path|size|mtime + tokenizer salt) ONLY — no caller-
    supplied location that could serve a stale index after the corpus
    changes. At 100 TB the corpus tokenization is the dominant cost of
    every retrieval call; persisting the postings turns each query into
    a footer-pruned read of the query tokens' posting lists (reference
    analog: the alias-cache lookup structure,
    VULNERABILITY_DATA_FLOW.md 10-100x dedup speedup — precompute once,
    probe many)."""
    import os

    from laketide.functions.artifacts import publish_dirs_artifact

    final = _bm25_index_dir(sf_dir)
    if os.path.exists(os.path.join(final, "INDEX.json")):
        return final

    # the doc-length dataset is the stats source (n_docs = row count,
    # total_tokens = sum(dl)) — no separate stats pass; materialized
    # once (16-byte rows) so the publish factory doesn't re-tokenize
    dl_ds = _bm25_doclens(sf_dir).materialize()
    n_docs = dl_ds.count()
    total = dl_ds.sum("dl") if n_docs else 0
    return publish_dirs_artifact(
        final,
        {
            "rows": lambda: _bm25_postings(sf_dir),
            "doclen": lambda: dl_ds,
        },
        {
            "kind": "bm25",
            "tokenizer": "tok-space-v1",
            "n_docs": int(n_docs),
            "total_tokens": int(total or 0),
        },
    )


def _bm25_search_indexed(sf_dir: str, k: int) -> pa.Table:
    """BM25 top-k served from the persisted inverted index. Reads ONLY
    the query tokens' posting lists (predicate pushed into the parquet
    read; the build-time token sort makes row-group min/max stats
    selective), pivots tf per document with an exact integer groupby,
    then evaluates the SAME float expression tree as the scan path —
    the two paths are bit-equal, equivalence-tested in
    tests/test_analytics.py. When fewer than k documents match any query
    token, the remaining slots are zero-score documents in doc_id
    order, exactly as the full-corpus scan ranks them."""
    import math

    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Max, Sum

    from laketide.functions.artifacts import read_artifact_meta, read_rows_artifact

    out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])
    idx = bm25_index_build(sf_dir)
    meta = read_artifact_meta(idx)
    n_docs, total_tokens = int(meta["n_docs"]), int(meta["total_tokens"])
    if n_docs == 0:
        return out_schema.empty_table()
    q_toks = _BM25_QUERY
    avgdl = float(total_tokens) / float(n_docs)

    # per-doc tf pivot: one-hot partials per batch, exact integer sums
    # across blocks (a document's different tokens live in different
    # token-sorted blocks). ONE pruned read of the posting lists,
    # materialized (O(matched docs) skinny rows — the same budget the
    # posting lists themselves cost) so the df pass below doesn't
    # re-open the parquet
    def pivot_pre(t: pa.Table) -> pa.Table:
        cols = {"doc_id": pc.cast(t["doc_id"], pa.int64()), "dl": t["dl"]}
        for i, tok in enumerate(q_toks):
            cols[f"tf{i}"] = pc.multiply(
                pc.cast(pc.equal(t["token"], tok), pa.int64()), t["tf"]
            )
        return pa.table(cols)

    piv = (
        read_rows_artifact(
            idx,
            _BM25_POSTINGS_SCHEMA,
            filter=pads.field("token").isin(list(q_toks)),
        )
        .map_batches(pivot_pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(
            Max("dl", alias_name="dl"),
            *[Sum(f"tf{i}", alias_name=f"tf{i}") for i in range(len(q_toks))],
        )
        .materialize()
    )

    # document frequencies from the pivot (each (token, doc) posting is
    # unique, so docs-with-tf_i>0 ARE the dfs the scan path computes)
    def df_pre(t: pa.Table) -> pa.Table:
        cols = {}
        for i in range(len(q_toks)):
            cols[f"df{i}"] = pa.array(
                [
                    int(
                        pc.sum(
                            pc.cast(pc.greater(t[f"tf{i}"], 0), pa.int64())
                        ).as_py()
                        or 0
                    )
                ],
                pa.int64(),
            )
        return pa.table(cols)

    s = piv.map_batches(df_pre, batch_format="pyarrow", zero_copy_batch=True).sum(
        [f"df{i}" for i in range(len(q_toks))]
    )
    dfs = [int((s or {}).get(f"sum(df{i})") or 0) for i in range(len(q_toks))]
    # identical idf expression to the scan path (exact ints in -> same doubles)
    idf = [
        math.log((float(n_docs) - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
        for i in range(len(q_toks))
    ]
    bc = ray.put((idf, avgdl))

    def score_piv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idf_, avgdl_ = ray.get(bc)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        sc = np.zeros(t.num_rows, np.float64)
        denom_base = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl_))
        for i in range(len(q_toks)):
            tf = t[f"tf{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
            sc += idf_[i] * (tf * (_BM25_K1 + 1.0)) / (tf + denom_base)
        out = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        ).sort_by([("score", "descending"), ("doc_id", "ascending")])
        return out.slice(0, k)

    parts = [
        p
        for p in collect_tables(
            piv.map_batches(score_piv, batch_format="pyarrow", zero_copy_batch=True)
        )
        if p.num_rows
    ]
    top = (
        pa.concat_tables([p.replace_schema_metadata(None) for p in parts])
        .sort_by([("score", "descending"), ("doc_id", "ascending")])
        .slice(0, k)
        if parts
        else out_schema.empty_table()
    )
    # matched docs always score > 0 (idf > 0, tf > 0); the scan path
    # ranks every OTHER document at exactly 0.0, tie-broken by doc_id —
    # fill remaining slots from the doc-length table only when needed
    if top.num_rows < k and top.num_rows < n_docs:
        need = k - top.num_rows
        matched = ray.put(np.sort(top["doc_id"].to_numpy(zero_copy_only=False)))

        def min_unmatched(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            keep = pc.invert(
                pc.is_in(ids, value_set=pa.array(ray.get(matched), pa.int64()))
            )
            sel = ids.filter(keep)
            return pa.table({"doc_id": sel}).sort_by("doc_id").slice(0, need)

        fill_parts = [
            p
            for p in collect_tables(
                read_rows_artifact(
                    idx, _BM25_DOCLEN_SCHEMA, subdir="doclen", columns=["doc_id"]
                ).map_batches(
                    min_unmatched, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            if p.num_rows
        ]
        if fill_parts:
            fill = (
                pa.concat_tables([p.replace_schema_metadata(None) for p in fill_parts])
                .sort_by("doc_id")
                .slice(0, need)
            )
            top = pa.concat_tables(
                [
                    top,
                    pa.table(
                        {
                            "doc_id": fill["doc_id"],
                            "score": pa.array(
                                np.zeros(fill.num_rows, np.float64), pa.float64()
                            ),
                        }
                    ),
                ]
            )
    return top.sort_by([("score", "descending"), ("doc_id", "ascending")]).slice(0, k)


def dataset_split_assign(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test split assignment — the reproducible
    80/10/10 partitioner a training pipeline runs before export
    (hash-based, NOT random_sample: identical at any parallelism or
    block layout). Same uint64-wraparound hash as doc_sample_hash;
    output is the per-(split, lang) count matrix."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "lang"])

    def pre(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(100)
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        g = (
            pa.table({"split": pa.array(split, pa.string()), "lang": t["lang"]})
            .group_by(["split", "lang"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["split", "lang", "c"])

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["split", "lang"])
        .aggregate(Sum("c", alias_name="n_f"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"split": t["split"], "lang": t["lang"], "n": pc.cast(t["n_f"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def langid_confusion(sf_dir: str) -> rd.Dataset:
    """Model-eval confusion matrix: labeled lang vs the n-gram
    classifier's prediction, counted per (lang, lang_pred) cell — the
    quality-report join a labeling pipeline emits. One scan: the
    classifier runs per batch (instance closure, profiles built once)
    and the per-batch count partials collapse to at most |langs|^2
    rows before the tiny final groupby."""
    import pandas as _pd

    from ray.data.aggregate import Sum

    clf = LangIdNgram()
    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def pre(df: "_pd.DataFrame") -> "_pd.DataFrame":
        pred = clf(df[["doc_id", "text"]])
        out = _pd.DataFrame({"lang": df["lang"].to_numpy(), "lang_pred": pred["lang_pred"].to_numpy()})
        g = out.groupby(["lang", "lang_pred"], dropna=False).size().reset_index(name="c")
        return g

    agg = (
        ds.map_batches(pre, batch_format="pandas")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("c", alias_name="n_f"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "lang_pred": t["lang_pred"],
                "n": pc.cast(t["n_f"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def docs_containing(sf_dir: str, pattern: str = "stream") -> rd.Dataset:
    """Literal containment scan: docs containing ``pattern`` with their
    non-overlapping hit counts — the predicate-pushdown-shaped filter a
    corpus grep runs (Arrow count_substring, zero Python per row; the
    oracle's replace-length diff counts the same non-overlapping
    occurrences)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        hits = pc.cast(pc.count_substring(t["text"], pattern), pa.int64())
        out = pa.table({"doc_id": t["doc_id"], "n_hits": hits})
        return out.filter(pc.fill_null(pc.greater(hits, 0), False))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def doc_token_diversity(sf_dir: str) -> rd.Dataset:
    """Per-document lexical-diversity quality signals: token count,
    distinct-token count, type-token ratio and top-token ratio (the
    Gopher-style 'fraction of tokens that are the single most frequent
    token' repetition filter). Each document row lives in exactly one
    batch, so everything is per-batch Arrow group_by — no shuffle,
    embarrassingly parallel at any scale. Null doc_id/text rows are
    excluded (they carry no trainable text and a null group key would
    collapse distinct null docs)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["text"])))
        toks = pc.split_pattern(t["text"], " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        lens = n_tokens.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        counts = (
            pa.table(
                {"doc_id": pa.array(doc_rep, pa.int64()), "token": pc.list_flatten(toks)}
            )
            .group_by(["doc_id", "token"])
            .aggregate([([], "count_all")])
        )
        per_doc = counts.group_by(["doc_id"]).aggregate(
            [("count_all", "max"), ([], "count_all")]
        )
        # per_doc columns: doc_id, count_all_max (top token), count_all (distinct)
        keys, top_c = _map_sorted(per_doc, "doc_id", "count_all_max")
        _, n_dist = _map_sorted(per_doc, "doc_id", "count_all")
        pos = np.searchsorted(keys, t["doc_id"].to_numpy(zero_copy_only=False))
        nt = pc.cast(n_tokens, pa.float64())
        nd = pc.cast(pa.array(n_dist[pos], pa.int64()), pa.float64())
        tc = pc.cast(pa.array(top_c[pos], pa.int64()), pa.float64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n_tokens,
                "n_distinct": pc.cast(nd, pa.int64()),
                "ttr": pc.divide(nd, nt),
                "top_token_ratio": pc.divide(tc, nt),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# Gopher-rule thresholds (Rae et al. 2021 §A1.1), rescaled to the
# synthetic corpus (10-99 tokens/doc) so every rule is non-vacuous:
# token-count window, minimum mean word length, minimum stopword hits.
_GOPHER_MIN_TOKENS = 30
_GOPHER_MAX_TOKENS = 90
_GOPHER_MIN_MEAN_WLEN = 4.0
_GOPHER_MIN_STOPWORDS = 2


def gopher_quality_filter(sf_dir: str) -> rd.Dataset:
    """Gopher/MassiveText-style composite quality gate: per document,
    boolean verdicts for each rule — token count in
    [``_GOPHER_MIN_TOKENS``, ``_GOPHER_MAX_TOKENS``], mean word length
    >= ``_GOPHER_MIN_MEAN_WLEN``, at least ``_GOPHER_MIN_STOPWORDS``
    stopword occurrences — plus the AND of all rules (`passes`).
    Returns (doc_id, n_tokens, mean_word_len, n_stop, pass_token_count,
    pass_word_len, pass_stopwords, passes).

    mean_word_len is (chars excluding spaces) / n_tokens computed as ONE
    integer subtraction + ONE float division, so it is bit-identical to
    the oracle's division. One shuffle-free map_batches pass; every rule
    is vectorized Arrow/numpy (stopword membership reuses the
    ``doc_quality`` segment-sum kernel)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        toks = pc.split_pattern(txt, " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        n_sp = pc.cast(pc.count_substring(txt, " "), pa.int64())
        wchars = pc.subtract(pc.cast(pc.utf8_length(txt), pa.int64()), n_sp)
        nt_np = n_tokens.to_numpy(zero_copy_only=False).astype(np.int64)
        mean_wlen = wchars.to_numpy(zero_copy_only=False) / np.maximum(nt_np, 1)
        n_stop = _stopword_counts(toks, nt_np)
        p_tok = (nt_np >= _GOPHER_MIN_TOKENS) & (nt_np <= _GOPHER_MAX_TOKENS)
        p_wlen = mean_wlen >= _GOPHER_MIN_MEAN_WLEN
        p_stop = n_stop >= _GOPHER_MIN_STOPWORDS
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n_tokens,
                "mean_word_len": pa.array(mean_wlen, pa.float64()),
                "n_stop": pa.array(n_stop, pa.int64()),
                "pass_token_count": pa.array(p_tok),
                "pass_word_len": pa.array(p_wlen),
                "pass_stopwords": pa.array(p_stop),
                "passes": pa.array(p_tok & p_wlen & p_stop),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _map_sorted(t: pa.Table, key: str, val: str):
    """(sorted_keys, vals_aligned) numpy pair from an Arrow group_by
    result, for positional gathers back onto the source rows."""
    s = t.sort_by([(key, "ascending")])
    return (
        s[key].to_numpy(zero_copy_only=False),
        s[val].to_numpy(zero_copy_only=False),
    )


def doc_bigram_repetition(sf_dir: str) -> rd.Dataset:
    """Per-document duplicate word-bigram fraction (the Gopher 'dup
    2-gram fraction' repetition filter): 1 - distinct/total bigrams,
    0.0 for docs with fewer than two tokens. Bigrams are built
    vectorized from the flattened token stream (one binary_join over
    shifted views, document boundaries masked out) — per-batch only,
    no shuffle."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["text"])))
        toks = pc.split_pattern(t["text"], " ")
        lens = (
            pc.fill_null(pc.list_value_length(toks), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        n = len(flat)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_bi = np.maximum(lens - 1, 0)
        out_tbl = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(n_bi, pa.int64()),
            }
        )
        if n < 2:
            zero = pa.array(np.zeros(t.num_rows), pa.float64())
            return out_tbl.append_column(
                "n_distinct", pa.array(n_bi, pa.int64())
            ).append_column("dup_fraction", zero)
        # mask: position i starts a bigram iff i and i+1 are in the
        # same document == i is not the last token of its document
        ends = np.cumsum(lens) - 1  # last-token index per doc (len>0)
        keep = np.ones(n - 1, dtype=bool)
        valid_ends = ends[(lens > 0) & (ends < n - 1)]
        keep[valid_ends] = False
        bi = pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1), " ")
        doc_rep = np.repeat(doc_ids, lens)[: n - 1][keep]
        pairs = pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "bg": bi.filter(pa.array(keep)),
            }
        )
        per_doc = (
            pairs.group_by(["doc_id", "bg"])
            .aggregate([])
            .group_by(["doc_id"])
            .aggregate([([], "count_all")])
        )
        keys, n_dist = _map_sorted(per_doc, "doc_id", "count_all")
        # docs with zero bigrams are absent from per_doc: clamp + mask
        if len(keys):
            pos = np.minimum(np.searchsorted(keys, doc_ids), len(keys) - 1)
            hit = keys[pos] == doc_ids
            nd = np.where(hit, n_dist[pos], 0).astype(np.int64)
        else:
            nd = np.zeros(t.num_rows, np.int64)
        nb_f = n_bi.astype(np.float64)
        dup = np.where(n_bi > 0, 1.0 - nd / np.maximum(nb_f, 1.0), 0.0)
        return out_tbl.append_column(
            "n_distinct", pa.array(nd, pa.int64())
        ).append_column("dup_fraction", pa.array(dup, pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# PII classes scrubbed by pii_redact: (name, RE2 pattern, replacement).
# Arrow's replace_substring_regex / count_substring_regex and DuckDB's
# regexp_* both run RE2, so the oracle is hash-exact by construction.
PII_PATTERNS = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\b555-\d{4}\b", "<PHONE>"),
)


def pii_redact(sf_dir: str) -> rd.Dataset:
    """PII scrub — the redaction stage of a training-data pipeline
    (strip emails / IPv4s / phone-shaped tokens before training; the
    C4 / ROOTS-style cleanup step). The synthetic corpus carries no PII,
    so the pipeline first APPENDS a deterministic doc_id-derived PII
    suffix (email when doc_id%3>0, IP when doc_id%2=0, phone when
    doc_id%5>1 — the small-scale synthesis rule; at production scale
    this injection step is absent and the scrubber runs on raw text),
    then counts and redacts each class with vectorized RE2 kernels.

    Scale: ONE streaming ``map_batches`` pass, no shuffle, no state —
    at 100 TB this is embarrassingly parallel and the regex kernels run
    at C speed over Arrow buffers. Returns per doc the per-class match
    counts and the redacted text (hash-checked against the DuckDB
    oracle running the identical injection + regexp_replace chain)."""

    def f(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        s = pc.cast(did, pa.string())

        def _mod(n: int) -> pa.Array:
            return pc.subtract(did, pc.multiply(pc.divide(did, n), n))

        email = pc.if_else(
            pc.greater(_mod(3), 0),
            pc.binary_join_element_wise(" contact user", s, "@example.com", ""),
            "",
        )
        ip = pc.if_else(
            pc.equal(_mod(2), 0),
            pc.binary_join_element_wise(
                " at 10.", pc.cast(_mod(200), pa.string()), ".0.7", ""
            ),
            "",
        )
        phone = pc.if_else(
            pc.greater(_mod(5), 1),
            pc.binary_join_element_wise(
                " call 555-", pc.utf8_lpad(pc.cast(_mod(10000), pa.string()), 4, "0"), ""
            ),
            "",
        )
        aug = pc.binary_join_element_wise(
            pc.fill_null(t["text"], ""), email, ip, phone, ""
        )
        out = {"doc_id": pc.cast(did, pa.int64())}
        red = aug
        for name, pat, repl in PII_PATTERNS:
            out[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(aug, pattern=pat), pa.int64()
            )
            red = pc.replace_substring_regex(red, pattern=pat, replacement=repl)
        out["redacted"] = red
        return pa.table(out)

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def temperature_sample(sf_dir: str, alpha: float = 0.5) -> rd.Dataset:
    """Temperature-balanced corpus sampling (the multilingual rebalance
    step of a training-data pipeline: downsample dominant languages so
    share ~ n_lang^alpha). Deterministic, layout-independent: per-lang
    acceptance rate r_l = (n_min / n_l)^(1-alpha) (rarest language keeps
    100%), a doc keeps iff its Knuth-hash bucket < floor(r_l * 1e6) —
    an INTEGER threshold, so the DuckDB oracle is exact (sqrt/divide are
    IEEE correctly-rounded in both engines; no float accumulation).

    Scale: pass 1 is a per-batch (lang, count) partial collected on the
    driver (vocabulary-of-languages scale — bytes); pass 2 streams with
    the tiny threshold map in the closure. No shuffle anywhere."""
    if alpha != 0.5:
        raise NotImplementedError("alpha fixed at 0.5 (sqrt rule) for the oracle")
    thr = _sqrt_rule_thresholds(_docs(sf_dir, columns=["lang"]), "lang") or {}

    def f(t: pa.Table) -> pa.Table:
        # null doc_id would NaN-cast to an arbitrary uint64 bucket; the
        # SQL oracle's NULL comparison drops the row — filter to agree
        t = t.filter(pc.and_(pc.is_valid(t["lang"]), pc.is_valid(t["doc_id"])))
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        bucket = (ids * np.uint64(2654435761)) % np.uint64(1_000_000)
        limits = _threshold_limits(t["lang"], thr)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
            }
        ).filter(pa.array(bucket < limits))

    return _docs(sf_dir, columns=["doc_id", "lang"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def _sqrt_rule_thresholds(ds: rd.Dataset, key_col: str) -> dict[str, int] | None:
    """Per-stratum Knuth-hash acceptance thresholds for the sqrt rule
    (temperature alpha=0.5): floor(sqrt(n_min / n_stratum) * 1e6), from
    dimension-scale per-batch count partials folded on the driver.
    Returns None when the dataset has no non-null strata. Shared by
    ``temperature_sample`` and ``corpus_training_mix`` — the IEEE
    expression must stay identical to both DuckDB oracles."""

    def counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        g = t.group_by([key_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "n"])

    parts = collect_tables(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    )
    totals: dict[str, int] = {}
    for p in parts:
        for k, n in zip(p[key_col].to_pylist(), p["n"].to_pylist()):
            totals[k] = totals.get(k, 0) + int(n)
    if not totals:
        return None
    n_min = min(totals.values())
    return {
        k: int(np.floor(np.sqrt(np.float64(n_min) / np.float64(n)) * 1e6))
        for k, n in totals.items()
    }


def _threshold_limits(col, thr: dict[str, int]) -> np.ndarray:
    """Vectorized stratum→acceptance-threshold lookup for the hash
    samplers: one ``pc.index_in`` against the (dimension-scale)
    threshold vocabulary + one numpy gather, instead of a per-row
    Python dict lookup — the samplers' keep test runs over every
    surviving corpus row, so the lookup must not be a Python loop.
    Strata absent from ``thr`` (and nulls) get threshold 0 (never
    kept), exactly like ``thr.get(s, 0)``."""
    if not thr:
        return np.zeros(len(col), np.uint64)
    keys = pa.array(list(thr.keys()), pa.string())
    vals = np.fromiter(thr.values(), np.uint64, count=len(thr))
    idx = (
        pc.fill_null(pc.index_in(col, value_set=keys), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return np.where(idx >= 0, vals[np.clip(idx, 0, None)], np.uint64(0))


def mixture_sample(
    sf_dir: str, weights: dict[str, int] | None = None
) -> rd.Dataset:
    """Target-mixture corpus sampling (the data-mixing step of a
    training-data pipeline: combine sources at chosen proportions, e.g.
    web 50% / wiki 30% / books 20%). Given integer source weights
    ``W_s``, the sample realizes shares ``W_s / sum(W)`` at the maximal
    total size that needs NO upsampling: docs-per-weight-unit
    ``m = min_s(n_s / W_s)``, per-source keep rate ``W_s * m / n_s``
    (the scarcest source relative to its weight keeps 100%). A doc
    keeps iff its Knuth-hash bucket < ``floor(m * W_s / n_s * 1e6)`` —
    the same INTEGER-threshold discipline as ``temperature_sample``, so
    the DuckDB oracle is exact (one division, one multiply chain,
    identical association order in both engines).

    ``weights=None`` uses the benchmark default — weight class
    ``1 + ascii(last char of source) % 3`` — purely so the fixed test
    tables exercise a non-uniform mixture; real pipelines pass explicit
    weights. Scale: pass 1 is a per-batch (source, count) partial
    collected on the driver (source-vocabulary scale — bytes); pass 2
    streams with the tiny threshold map in the closure. No shuffle."""

    def source_counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["source"]))
        g = t.group_by(["source"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "n"])

    parts = collect_tables(
        _docs(sf_dir, columns=["source"]).map_batches(
            source_counts, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    totals: dict[str, int] = {}
    for p in parts:
        for src, n in zip(p["source"].to_pylist(), p["n"].to_pylist()):
            totals[src] = totals.get(src, 0) + int(n)

    def weight_of(src: str) -> int:
        if weights is not None:
            return int(weights.get(src, 0))
        return 1 + (ord(src[-1]) % 3) if src else 1

    thr: dict[str, int] = {}
    pairs = [(s, w) for s in totals if (w := weight_of(s)) > 0]
    if pairs:
        m = min(np.float64(totals[s]) / np.float64(w) for s, w in pairs)
        thr = {
            s: int(np.floor(m * np.float64(w) / np.float64(totals[s]) * 1e6))
            for s, w in pairs
        }

    def f(t: pa.Table) -> pa.Table:
        # null doc_id would NaN-cast to an arbitrary uint64 bucket; the
        # SQL oracle's NULL comparison drops the row — filter to agree
        t = t.filter(pc.and_(pc.is_valid(t["source"]), pc.is_valid(t["doc_id"])))
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        bucket = (ids * np.uint64(2654435761)) % np.uint64(1_000_000)
        limits = _threshold_limits(t["source"], thr)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
            }
        ).filter(pa.array(bucket < limits))

    return _docs(sf_dir, columns=["doc_id", "source"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------------------
# C4-style duplicate-span removal, unigram LM scoring, chunking
# ------------------------------------------------------------------

# Span width for dedup_text_segments. The C4 rule removes "all but one
# of any three-sentence span occurring more than once"; the synthetic
# corpus has no sentence boundaries, so the span unit here is a fixed
# 10-token contiguous segment (same dedup semantics, word-window span).
_SEG_W = 10


def _segment_rows(t: pa.Table) -> pa.Table:
    """(doc_id, pos, seg, nseg) rows: contiguous ``_SEG_W``-token
    segments per document, matching the oracle's 1-based list-slice
    rule exactly. Non-overlapping segments partition the flattened
    token values array, so the segment list array reuses ``flat``
    directly — zero gather."""
    txt = pc.fill_null(t["text"], "")
    toks = pc.split_pattern(txt, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    nseg = -(-lens // _SEG_W)  # ceil; lens >= 1 (split of '' -> [''])
    doc_np = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(nseg.sum())
    doc_rep = np.repeat(doc_np, nseg)
    pos = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(nseg) - nseg, nseg)
    flat = pc.list_flatten(toks).combine_chunks()
    seg_lens = np.minimum((pos + 1) * _SEG_W, np.repeat(lens, nseg)) - pos * _SEG_W
    offsets = np.zeros(total + 1, np.int32)
    np.cumsum(seg_lens, out=offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    seg = pc.binary_join(lists, " ")
    return pa.table(
        {
            "doc_id": pa.array(doc_rep, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "seg": seg,
            "nseg": pa.array(np.repeat(nseg, nseg), pa.int64()),
        }
    )


def _span_dedup_pipeline(
    docs: rd.Dataset,
    carry_lang: bool = False,
    boilerplate_k: "int | None" = None,
) -> rd.Dataset:
    """Core of ``dedup_text_segments``, reusable over ANY (doc_id, text
    [, lang]) Dataset (the composed corpus pipeline feeds it a
    decontaminated corpus). ONE pass over ``docs``: segment rows and
    the per-doc totals markers (pos = -1) ride the same map, so an
    expensive upstream (decontamination) is never re-executed.
    Returns (doc_id[, lang], n_segments, n_kept, cleaned_text).

    Two keep rules share the plumbing: ``boilerplate_k=None`` keeps the
    globally FIRST occurrence of every segment (C4 span dedup);
    ``boilerplate_k=k`` drops ALL occurrences of any segment seen in
    >= k distinct documents (CCNet/RefinedWeb boilerplate-line removal
    mapped onto the word-window segments) and keeps everything else,
    including within-document repeats."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
    from laketide.functions.relational import _key_hash_u64

    n_parts = _coarse_n_parts()
    row_fields = [
        ("doc_id", pa.int64()),
        ("pos", pa.int64()),
        ("seg", pa.string()),
        ("nseg", pa.int64()),
    ]
    if carry_lang:
        row_fields.append(("lang", pa.string()))
    row_schema = pa.schema(row_fields)
    out_fields = [("doc_id", pa.int64())]
    if carry_lang:
        out_fields.append(("lang", pa.string()))
    out_fields += [
        ("n_segments", pa.int64()),
        ("n_kept", pa.int64()),
        ("cleaned_text", pa.string()),
    ]
    out_schema = pa.schema(out_fields)

    def seg_part(t: pa.Table) -> pa.Table:
        # ONE corpus pass: segment rows AND the per-doc (pos=-1) totals
        # marker ride the same map — segment rows co-locate by
        # segment-hash (first-occurrence dedup needs it), markers by
        # doc-hash (they skip dedup, and keying them on their seg=""
        # would funnel every marker into one hot partition).
        # NULL doc_id rows are dropped up front (the oracle's
        # WHERE doc_id IS NOT NULL): to_numpy would otherwise coerce
        # NULL -> NaN -> an arbitrary int64 group the oracle never has
        t = t.filter(pc.is_valid(t["doc_id"]))
        rows = _segment_rows(t)
        if carry_lang:
            rows = rows.append_column("lang", pa.nulls(rows.num_rows, pa.string()))
        part = _coarse_parts(_key_hash_u64(rows["seg"]), n_parts=n_parts)
        rows = rows.append_column("_cpart", pa.array(part, pa.int64()))
        markers = totals(t)
        mpart = _coarse_parts(_key_hash_u64(markers["doc_id"]), n_parts=n_parts)
        markers = markers.append_column("_cpart", pa.array(mpart, pa.int64()))
        return pa.concat_tables([rows, markers])

    def first_per_seg(t: pa.Table) -> pa.Table:
        # all occurrences of a segment share this partition: the local
        # first occurrence by (doc_id, pos) is the global one. Marker
        # rows (pos = -1) pass through unconditionally.
        if t.num_rows == 0:
            return row_schema.empty_table()
        pos = t["pos"].to_numpy(zero_copy_only=False)
        seg_mask = pos >= 0
        markers = t.filter(pa.array(~seg_mask))
        t = t.filter(pa.array(seg_mask))
        if t.num_rows == 0:
            return markers
        seg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(seg, sort=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        if boilerplate_k is not None:
            # distinct-doc count per segment code, decided locally (all
            # occurrences of a segment share this partition): count
            # (code, doc) boundary transitions in one lexsort
            order = np.lexsort((doc, codes))
            c_s = codes[order]
            d_s = doc[order]
            new_pair = np.r_[True, (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])]
            ndocs = np.bincount(c_s[new_pair])
            kept = t.filter(pa.array(ndocs[codes] < boilerplate_k))
            return pa.concat_tables([kept, markers])
        order = np.lexsort((pos, doc))
        first = ~pd.Series(codes[order]).duplicated().to_numpy()
        kept = t.take(pa.array(np.sort(order[first]), pa.int64()))
        return pa.concat_tables([kept, markers])

    def doc_part(t: pa.Table) -> pa.Table:
        part = _coarse_parts(_key_hash_u64(t["doc_id"]), n_parts=n_parts)
        return t.append_column("_cpart", pa.array(part, pa.int64()))

    def rebuild(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc))
        doc_s = doc[order]
        pos_s = pos[order]
        seg_s = t["seg"].combine_chunks().take(pa.array(order, pa.int64()))
        nseg_s = t["nseg"].to_numpy(zero_copy_only=False)[order]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        ends = np.r_[starts[1:], len(doc_s)]
        # the pos=-1 totals row sorts first within each doc group
        n_kept = (ends - starts - 1).astype(np.int64)
        vals = seg_s.filter(pa.array(pos_s >= 0))
        offsets = np.zeros(len(starts) + 1, np.int32)
        np.cumsum(n_kept, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        cleaned = pc.fill_null(pc.binary_join(lists, " "), "")
        cols = {"doc_id": pa.array(doc_s[starts], pa.int64())}
        if carry_lang:
            cols["lang"] = (
                t["lang"].combine_chunks()
                .take(pa.array(order, pa.int64()))
                .take(pa.array(starts, pa.int64()))
            )
        cols["n_segments"] = pa.array(nseg_s[starts], pa.int64())
        cols["n_kept"] = pa.array(n_kept, pa.int64())
        cols["cleaned_text"] = cleaned
        return pa.table(cols)

    def totals(t: pa.Table) -> pa.Table:
        # one (doc_id, pos=-1) marker row per doc: ceil(token count / W)
        # from a substring count — no split needed on this branch
        txt = pc.fill_null(t["text"], "")
        n_toks = pc.add(pc.count_substring(txt, " "), 1)
        n_np = pc.cast(n_toks, pa.int64()).to_numpy(zero_copy_only=False)
        nseg = -(-n_np // _SEG_W)
        n = t.num_rows
        cols = {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "pos": pa.array(np.full(n, -1, np.int64)),
            "seg": pa.array([""] * n, pa.string()),
            "nseg": pa.array(nseg, pa.int64()),
        }
        if carry_lang:
            cols["lang"] = pc.cast(t["lang"], pa.string())
        return pa.table(cols)

    return (
        docs.map_batches(seg_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(
            lambda g: first_per_seg(g.drop_columns(["_cpart"])),
            batch_format="pyarrow",
        )
        .map_batches(doc_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cpart")
        .map_groups(
            lambda g: rebuild(g.drop_columns(["_cpart"])), batch_format="pyarrow"
        )
    )


def dedup_text_segments(sf_dir: str) -> rd.Dataset:
    """Global duplicate-span removal with text reconstruction — the C4
    cleanup rule ("discard all but one of any span occurring more than
    once", Raffel et al. 2020) mapped onto fixed 10-token segments. For
    every document: split into contiguous segments, keep only segments
    whose globally FIRST occurrence (ordered by doc_id, then position)
    lives in this document at this position, and rebuild the cleaned
    text from the kept segments in document order. Returns
    (doc_id, n_segments, n_kept, cleaned_text).

    Scale shape: two coarse shuffles, both on ~4xCPU partitions —
    (1) segment rows co-locate by segment-hash, so the global first
    occurrence per distinct segment is decided partition-locally with
    one ``pd.factorize`` + lexsort (exact string identity — no
    hash-collision exposure); (2) the kept rows (plus one tiny totals
    row per doc, so fully-duplicated docs still emit a row) co-locate
    by doc_id and the text is rebuilt with one ``binary_join`` per
    partition. No per-group UDFs, no driver materialization; at 100 TB
    the segment exchange is the inherent cost of a global dedup and
    ships (doc_id, pos, seg) rows only."""
    return _span_dedup_pipeline(_docs(sf_dir, columns=["doc_id", "text"]))


# Boilerplate threshold for remove_boilerplate_segments: a segment seen
# in >= this many DISTINCT documents is dropped everywhere. 2 is the
# strictest (any cross-document repeat is boilerplate); CCNet uses
# higher cutoffs on web-scale corpora — it's a parameter, not a law.
_BOILER_K = 2


def remove_boilerplate_segments(sf_dir: str) -> rd.Dataset:
    """CCNet/RefinedWeb-style boilerplate removal mapped onto the repo's
    fixed 10-token segments (the corpus has no newlines, so the "line"
    unit is the same word-window segment ``dedup_text_segments`` uses):
    drop ALL occurrences of any segment that appears in >=
    ``_BOILER_K`` DISTINCT documents; keep everything else, including
    within-document repeats (unlike the C4 first-occurrence rule).
    Returns (doc_id, n_segments, n_kept, cleaned_text).

    Reference analog: the reference's row-sanitation family (M12,
    internal/pipeline/process.go) drops known-bad content rows; this is
    the corpus-level generalisation training-data pipelines use.
    Scale shape: identical to ``dedup_text_segments`` — segment rows
    co-locate by segment-hash, the distinct-doc count per segment is
    decided partition-locally with one lexsort + bincount, then one
    doc-hash shuffle rebuilds the text. No driver materialization."""
    return _span_dedup_pipeline(
        _docs(sf_dir, columns=["doc_id", "text"]), boilerplate_k=_BOILER_K
    )


def _tf_counts(sf_dir: str, lang: str | None = None) -> rd.Dataset:
    """token -> corpus TERM frequency (every occurrence, unlike
    ``_df_counts``'s per-document frequency): per-batch value_counts
    partials, one vocabulary-scale shuffle. ``lang`` restricts the
    stream to one language's documents (null lang never matches, like
    SQL ``WHERE lang = ...``)."""
    cols = ["text"] if lang is None else ["text", "lang"]
    ds = _docs(sf_dir, columns=cols)

    def pre(t: pa.Table) -> pa.Table:
        if lang is not None:
            t = t.filter(pc.equal(t["lang"], lang))
        toks = pc.list_flatten(pc.split_pattern(pc.fill_null(t["text"], ""), " "))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": pc.struct_field(vc, "values"),
                "c": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
    )


def _bounded_tf_fold(
    agg: rd.Dataset, min_tf: int
) -> "tuple[pa.Array, np.ndarray, int, int]":
    """(kept tokens, kept counts, total mass, below-floor mass) from a
    materialized (token, c) term-frequency Dataset under the KenLM
    frequency floor. The driver only ever collects tokens AT/ABOVE the
    floor — the below-floor mass arrives as per-block (n, rare) partial
    sums — so the fold stays bounded at web scale where the distinct-
    token set (typos, URLs) grows without bound. The ONE bounded-
    vocabulary fold, shared by ``_unigram_cost_table`` and
    ``dsir_importance_weights`` so the floor semantics cannot drift."""

    def kept_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["c"], min_tf))

    def mass_partial(t: pa.Table) -> pa.Table:
        c = pc.cast(t["c"], pa.int64())
        rare = pc.if_else(pc.less(c, min_tf), c, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "n": pa.array([int(pc.sum(c).as_py() or 0)], pa.int64()),
                "rare": pa.array([int(pc.sum(rare).as_py() or 0)], pa.int64()),
            }
        )

    mass = collect_tables(
        agg.map_batches(mass_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    n_total = sum(int(pc.sum(p["n"]).as_py() or 0) for p in mass)
    rare_total = sum(int(pc.sum(p["rare"]).as_py() or 0) for p in mass)
    parts = collect_tables(
        agg.map_batches(kept_only, batch_format="pyarrow", zero_copy_batch=True)
    )
    if parts:
        tf = pa.concat_tables([p.replace_schema_metadata(None) for p in parts])
        tok_arr = tf["token"].combine_chunks()
        c_np = (
            pc.cast(tf["c"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )
    else:
        tok_arr = pa.array([], pa.string())
        c_np = np.zeros(0, dtype=np.int64)
    return tok_arr, c_np, n_total, rare_total


# The ONE KenLM frequency floor for the whole LM family (unigram cost
# table, bigram table, DSIR fold). bigram_logppl's c1 lookup PROVES
# kept-bigram w1 membership from "tf(w1) >= c2 >= floor" — valid only
# while the unigram and bigram folds share this constant. The oracles
# pin the literal 2; change both together.
_LM_MIN_TF = 2


def _micro_nat_costs(
    c_np: np.ndarray, n_total: int, rare_total: int
) -> "tuple[np.ndarray, int]":
    """(per-entry integer micro-nat costs floor(-ln(c/N)*1e6), pooled
    <unk> cost) — ``math.log`` per entry (libm, the DuckDB-``ln()``
    bit-parity requirement; numpy's vectorized log is not). The ONE
    cost rule, shared by the unigram table and the bigram backoff
    table so the micro-nat math cannot drift."""
    import math

    cost_np = np.fromiter(
        (math.floor(-math.log(c / n_total) * 1e6) for c in c_np.tolist()),
        np.int64,
        len(c_np),
    )
    unk_cost = (
        math.floor(-math.log(rare_total / n_total) * 1e6) if rare_total else 0
    )
    return cost_np, unk_cost


def _unigram_cost_table(
    sf_dir: str, min_tf: int = _LM_MIN_TF
) -> "tuple[pa.Array, np.ndarray, int] | None":
    """(vocab tokens, per-token integer micro-nat costs, <unk> cost)
    trained on the FULL corpus. None on an empty corpus. BOUNDED
    vocabulary (the standard KenLM frequency floor): tokens with tf <
    ``min_tf`` collapse into one ``<unk>`` bucket whose cost is the
    POOLED below-floor mass, floor(-ln(rare/N)*1e6); the fold itself
    is ``_bounded_tf_fold``, the cost math ``_micro_nat_costs``."""
    tok_arr, c_np, n_total, rare_total = _bounded_tf_fold(
        _tf_counts(sf_dir).materialize(), min_tf
    )
    if n_total == 0:
        return None
    cost_np, unk_cost = _micro_nat_costs(c_np, n_total, rare_total)
    return tok_arr, cost_np, unk_cost


def _unigram_token_costs(
    flat: pa.Array, tok_bc: pa.Array, cost_bc: np.ndarray, unk_cost: int
) -> np.ndarray:
    """Per-token integer costs for a flat token array: vocabulary
    lookup via one index_in, below-floor misses priced at the pooled
    <unk> cost. Shared by unigram_logppl and the composed pipeline so
    the floor semantics cannot drift."""
    idx = pc.index_in(flat, value_set=tok_bc)
    hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    base = cost_bc[pos] if len(cost_bc) else np.zeros(len(pos), dtype=np.int64)
    return np.where(hit, base, np.int64(unk_cost))


def unigram_logppl(sf_dir: str) -> rd.Dataset:
    """Unigram language-model quality scoring — the KenLM-style
    perplexity filter of a training-data pipeline (CCNet / RedPajama
    discard high-perplexity docs), with the LM reduced to the corpus
    unigram distribution so the oracle is exact. Per document:
    n_tokens, the summed negative log-likelihood in integer MICRO-NATS
    (each token costs floor(-ln(tf/N) * 1e6) — integers sum exactly in
    any order, so the distributed fold is hash-stable where a float
    sum would not be), and the mean cost per token (one double
    division at the end).

    Scale shape: pass 1 builds the (token, tf) vocabulary with
    per-batch ``value_counts`` partials + one vocabulary-scale shuffle;
    the driver folds only vocabulary-sized partials and broadcasts the
    cost table via ``ray.put``. Pass 2 is a shuffle-free streaming scan
    (index_in + one reduceat per batch). Per-entry costs use
    ``math.log`` (libm — bit-identical to DuckDB ``ln()``; numpy's
    vectorized log is not, the tfidf lesson)."""
    import math

    import ray

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("nll_micro", pa.int64()),
            ("avg_nll_micro", pa.float64()),
        ]
    )
    built = _unigram_cost_table(sf_dir)
    if built is None:
        return rd.from_arrow(out_schema.empty_table())
    bc = ray.put(built)

    def score(t: pa.Table) -> pa.Table:
        # NULL doc_id rows can't be scored to a real group — drop them
        # like the oracle's WHERE doc_id IS NOT NULL (their text still
        # counted toward the training distribution, on both sides)
        t = t.filter(pc.is_valid(t["doc_id"]))
        if t.num_rows == 0:
            return out_schema.empty_table()
        tok_bc, cost_bc, unk_cost = ray.get(bc)
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        # below-floor tokens miss the kept vocabulary -> pooled <unk>
        costs = _unigram_token_costs(flat, tok_bc, cost_bc, unk_cost)
        starts = np.cumsum(lens) - lens  # lens >= 1 per doc
        nll = np.add.reduceat(costs, starts).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "nll_micro": pa.array(nll, pa.int64()),
                "avg_nll_micro": pa.array(
                    nll.astype(np.float64) / lens.astype(np.float64), pa.float64()
                ),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def ppl_bucket_docs(sf_dir: str) -> rd.Dataset:
    """CCNet-style perplexity bucketing: split the corpus into
    head / middle / tail thirds by language-model perplexity (CCNet,
    Wenzek et al. 2020 — the head feeds training, the tail is
    discarded or down-weighted). Per-document scores come from
    ``unigram_logppl``'s exact integer micro-nat NLL; the bucket key is
    the integer ``nll_micro // n_tokens`` so the tercile thresholds are
    EXACT ``quantile_disc`` values (``quantile_read``'s one shared rank
    rule) and the assignment is oracle-checkable.

    Scale shape: the per-doc score dataset (24-byte rows) materializes
    once so the LM scoring pass doesn't run twice; the threshold read
    is a value-count histogram shuffle (bounded by DISTINCT integer
    averages, corpus-independent in the limit), then bucket assignment
    is a shuffle-free map with the two thresholds closed over."""
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("avg_nll_int", pa.int64()),
            ("bucket", pa.string()),
        ]
    )

    def to_avg(t: pa.Table) -> pa.Table:
        nll = t["nll_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "avg_nll_int": pa.array(nll // n, pa.int64()),
            }
        )

    avg = (
        unigram_logppl(sf_dir)
        .map_batches(to_avg, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def hist_pre(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            t["avg_nll_int"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "v": pa.array(vals, pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        avg.map_batches(hist_pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    if hist.empty:
        return rd.from_arrow(out_schema.empty_table())
    th = quantile_read(hist, "v", (1 / 3, 2 / 3))
    q1, q2 = th["q33"], th["q66"]

    def bucketize(t: pa.Table) -> pa.Table:
        v = t["avg_nll_int"].to_numpy(zero_copy_only=False)
        b = np.where(v <= q1, "head", np.where(v <= q2, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "avg_nll_int": t["avg_nll_int"],
                "bucket": pa.array(b, pa.string()),
            }
        )

    return avg.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)


def dsir_importance_weights(
    sf_dir: str, target_lang: str = "en", min_tf: int = 2
) -> rd.Dataset:
    """DSIR-style importance weighting for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by the log-likelihood ratio of a
    TARGET unigram distribution (here: the ``target_lang`` slice, the
    deterministic stand-in for a curated target corpus) against the RAW
    pool distribution. Positive ``lw_micro`` = more target-like;
    resampling/top-k selection composes on top. DSIR's hashed n-gram
    bucketing is replaced by the repo's bounded-vocabulary discipline
    (the KenLM frequency floor + pooled ``<unk>``, as in
    ``unigram_logppl``) so the weights are EXACT and oracle-checkable:
    per-token integer micro-nat weights
    ``floor((ln((ct+1)/(T+K)) - ln((cr+1)/(R+K))) * 1e6)`` (Laplace
    smoothing; K = kept-vocabulary size + 1 for the unk bucket) sum
    exactly in any order.

    Scale shape: two vocabulary-scale shuffles (raw + target term
    frequencies), driver folds bounded by the KEPT vocabulary (tokens
    under the raw floor arrive only as pooled partial sums), one
    ``ray.put`` broadcast, then a shuffle-free streaming scoring pass
    (index_in + one reduceat per batch). Per-entry weights use
    ``math.log`` (libm — bit-identical to DuckDB ``ln()``)."""
    import math

    import ray

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("lw_micro", pa.int64()),
        ]
    )
    kept_tok, kept_cr, r_total, raw_rare = _bounded_tf_fold(
        _tf_counts(sf_dir).materialize(), min_tf
    )
    if r_total == 0:
        return rd.from_arrow(out_schema.empty_table())
    n_kept = len(kept_cr)

    # target counts: kept-token rows collected (bounded by the kept
    # vocabulary), below-floor target mass as pooled per-block partials
    tgt = _tf_counts(sf_dir, lang=target_lang).materialize()
    kept_ref = ray.put(kept_tok)

    def tgt_fused(t: pa.Table) -> pa.Table:
        # ONE membership probe per block serves both outputs: the kept
        # rows ride through, and the block's below-floor mass rides as
        # a single null-token marker row (tf tokens are never null, so
        # the marker is unambiguous) — no second pass over the target
        # tf dataset. t_total reconstructs on the driver as
        # sum(kept c) + sum(marker c).
        hit = pc.is_valid(pc.index_in(t["token"], value_set=ray.get(kept_ref)))
        c = pc.cast(t["c"], pa.int64())
        rare = pc.if_else(pc.invert(hit), c, pa.scalar(0, pa.int64()))
        kept = pa.table({"token": t["token"], "c": c}).filter(hit)
        marker = pa.table(
            {
                "token": pa.array([None], pa.string()),
                "c": pa.array([int(pc.sum(rare).as_py() or 0)], pa.int64()),
            }
        )
        return pa.concat_tables([kept, marker])

    tparts = collect_tables(
        tgt.map_batches(tgt_fused, batch_format="pyarrow", zero_copy_batch=True)
    )
    ct = np.zeros(n_kept, dtype=np.int64)
    t_total, tgt_rare = 0, 0
    if tparts:
        allt = pa.concat_tables([p.replace_schema_metadata(None) for p in tparts])
        tgt_rare = int(
            pc.sum(allt.filter(pc.is_null(allt["token"]))["c"]).as_py() or 0
        )
        tt = allt.filter(pc.is_valid(allt["token"]))
        t_total = tgt_rare + int(pc.sum(tt["c"]).as_py() or 0)
        pos = (
            pc.index_in(tt["token"].combine_chunks(), value_set=kept_tok)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ct[pos] = (
            pc.cast(tt["c"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        )

    k_size = n_kept + 1  # + the pooled <unk> bucket
    tk = float(t_total + k_size)
    rk = float(r_total + k_size)
    w = np.fromiter(
        (
            math.floor(
                (math.log((c_t + 1) / tk) - math.log((c_r + 1) / rk)) * 1e6
            )
            for c_t, c_r in zip(ct.tolist(), kept_cr.tolist())
        ),
        np.int64,
        n_kept,
    )
    unk_w = math.floor(
        (math.log((tgt_rare + 1) / tk) - math.log((raw_rare + 1) / rk)) * 1e6
    )
    bc = ray.put((kept_tok, w, unk_w))

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["doc_id"]))
        if t.num_rows == 0:
            return out_schema.empty_table()
        tok_bc, w_bc, unk = ray.get(bc)
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        costs = _unigram_token_costs(flat, tok_bc, w_bc, unk)
        starts = np.cumsum(lens) - lens  # lens >= 1 per doc
        lw = np.add.reduceat(costs, starts).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "lw_micro": pa.array(lw, pa.int64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_chunk_windows(sf_dir: str, width: int = 64, stride: int = 48) -> rd.Dataset:
    """Fixed-token-window chunking with overlap — the pretraining
    chunker that slices each document into ``width``-token windows every
    ``stride`` tokens (GPT-style context packing with overlap, the
    sliding-window complement of ``pack_sequences``). Emits
    (doc_id, chunk_id, n_chunk_tokens, chunk_text) for every window
    start in [0, n) stepping by ``stride``.

    Scale shape: ONE shuffle-free streaming pass; the overlapping
    window gather is a single vectorized ``take`` + ``binary_join`` per
    batch (overlap factor width/stride bounds the memory amplification
    at ~1.33x for the 64/48 default)."""
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("n_chunk_tokens", pa.int64()),
            ("chunk_text", pa.string()),
        ]
    )

    def f(t: pa.Table) -> pa.Table:
        # NULL doc_id -> dropped (oracle: WHERE doc_id IS NOT NULL);
        # to_numpy would otherwise alias NaN to an arbitrary int64 doc
        t = t.filter(pc.is_valid(t["doc_id"]))
        if t.num_rows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        k = -(-lens // stride)  # ceil; lens >= 1
        total = int(k.sum())
        doc_rep = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), k
        )
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
        doc_off = np.repeat(np.cumsum(lens) - lens, k)
        n_rep = np.repeat(lens, k)
        cstart = chunk_id * stride
        clen = np.minimum(cstart + width, n_rep) - cstart
        tot_v = int(clen.sum())
        gidx = (
            np.arange(tot_v, dtype=np.int64)
            - np.repeat(np.cumsum(clen) - clen, clen)
            + np.repeat(doc_off + cstart, clen)
        )
        vals = flat.take(pa.array(gidx, pa.int64()))
        offsets = np.zeros(total + 1, np.int32)
        np.cumsum(clen, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "n_chunk_tokens": pa.array(clen, pa.int64()),
                "chunk_text": pc.binary_join(lists, " "),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


# Bloom-filter decontamination: bitmap size / hash count. 2^20 bits =
# 128 KiB broadcast; k=4 double-hashed probes. FPR ~ (1-e^{-kn/m})^k —
# ~0.0001 at n=25k grams, one-sided (may DROP a clean doc, never keeps
# a contaminated one).
_BLOOM_BITS = 1 << 20
_BLOOM_K = 4


def _bloom_positions(h: np.ndarray) -> np.ndarray:
    """(n, k) bit positions via double hashing over uint64 gram hashes —
    deterministic, so the filter output is layout-independent."""
    h1 = h
    h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    ks = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(_BLOOM_BITS)).astype(
        np.int64
    )


def _bloom_set(bitmap: np.ndarray, h: np.ndarray) -> None:
    pos = _bloom_positions(h).ravel()
    # bitwise_or.at, NOT bitmap[idx] |= v: fancy-indexed |= collapses
    # duplicate byte indices to one write and silently drops bits
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def _bloom_test(bitmap: np.ndarray, h: np.ndarray) -> np.ndarray:
    """True where ALL k probe bits are set (possible member)."""
    pos = _bloom_positions(h)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def decontaminate_docs_bloom(sf_dir: str, n_bench: int = 20) -> rd.Dataset:
    """Bloom-filter variant of ``decontaminate_docs`` — the 100 TB
    broadcast path: the benchmark gram set ships as a FIXED 128 KiB
    bitmap instead of an exact string set that grows with the benchmark
    (per-batch partial bitmaps OR-merge, so the build is one streaming
    pass too; batches with no benchmark rows ship ZERO rows, not a
    zeroed bitmap). One-sided error: a false positive can only DROP a
    clean doc (bounded by the pytest against the exact filter), never
    keep a contaminated one — the safe direction for decontamination.
    Deterministic (hash-defined), rows-only by construction."""
    import ray

    from laketide.functions.relational import _key_hash_u64

    bm_schema = pa.schema([("bm", pa.binary())])

    def bench_bitmap(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(pc.less(t["doc_id"], pa.scalar(n_bench)), False))
        if t.num_rows == 0:
            return bm_schema.empty_table()
        rows = _word_trigram_rows(t)
        if rows.num_rows == 0:
            return bm_schema.empty_table()
        bm = np.zeros(_BLOOM_BITS >> 3, np.uint8)
        _bloom_set(bm, _key_hash_u64(rows["gram"]))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = collect_tables(
        _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
            bench_bitmap, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    bitmap = np.zeros(_BLOOM_BITS >> 3, np.uint8)
    for p in parts:
        for buf in p["bm"].to_pylist():
            bitmap |= np.frombuffer(buf, np.uint8)
    bc = ray.put(bitmap)

    return _decontaminate_pass(
        sf_dir,
        n_bench,
        lambda grams: pa.array(_bloom_test(ray.get(bc), _key_hash_u64(grams))),
    )


def source_quality_summary(sf_dir: str) -> rd.Dataset:
    """Per-SOURCE quality dashboard — the rollup a data curator reads
    before deciding mixture weights: doc counts and exact integer sums
    of the ``doc_quality`` features per source, plus two derived means
    (single final divisions — no float accumulation anywhere, so the
    distributed fold is hash-exact). Per-batch grouped partials, one
    dimension-scale shuffle."""
    from laketide.functions.dedup import _segment_sums

    ds = _docs(sf_dir, columns=["source", "text"])

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["source"]))
        txt = t["text"]
        nc = pc.fill_null(pc.cast(pc.utf8_length(txt), pa.int64()), 0)
        toks = pc.split_pattern(pc.fill_null(txt, ""), " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # null text has no tokens, matching the oracle's coalesce(...,0)
        valid = pc.is_valid(txt).to_numpy(zero_copy_only=False)
        nt = np.where(valid, lens, 0)
        stripped = pc.replace_substring_regex(pc.fill_null(txt, ""), _PUNCT_RE, "")
        npunct = pc.fill_null(
            pc.subtract(nc, pc.cast(pc.utf8_length(stripped), pa.int64())), 0
        )
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
            zero_copy_only=False
        )
        ns = np.where(valid, _segment_sums(is_stop.astype(np.int64), lens), 0)
        g = (
            pa.table(
                {
                    "source": t["source"],
                    "nc": nc,
                    "nt": pa.array(nt, pa.int64()),
                    "np": npunct,
                    "ns": pa.array(ns, pa.int64()),
                }
            )
            .group_by(["source"])
            .aggregate([("nc", "sum"), ("nt", "sum"), ("np", "sum"), ("ns", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["source", "nc", "nt", "np", "ns", "n"])

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("nc", alias_name="sum_chars"),
            Sum("nt", alias_name="sum_tokens"),
            Sum("np", alias_name="sum_punct"),
            Sum("ns", alias_name="sum_stop"),
            Sum("n", alias_name="n_docs"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_docs"], pa.int64()).to_numpy(zero_copy_only=False)
        st = pc.cast(t["sum_tokens"], pa.int64()).to_numpy(zero_copy_only=False)
        ss = pc.cast(t["sum_stop"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(n, pa.int64()),
                "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
                "sum_tokens": pa.array(st, pa.int64()),
                "sum_punct": pc.cast(t["sum_punct"], pa.int64()),
                "sum_stop": pa.array(ss, pa.int64()),
                "avg_tokens": pa.array(
                    st.astype(np.float64) / n.astype(np.float64), pa.float64()
                ),
                "stop_share": pa.array(
                    ss.astype(np.float64) / np.maximum(st, 1).astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def token_freq_spectrum(sf_dir: str) -> rd.Dataset:
    """Zipf/Heaps frequency-spectrum diagnostic: for each term
    frequency ``tf``, the number of DISTINCT tokens occurring exactly
    ``tf`` times in the corpus (the count-of-counts vector — what
    Zipf-law plots, Good-Turing smoothing and vocabulary-growth
    estimates are computed from; the standard corpus health check
    before committing to a tokenizer or an LM frequency floor).

    Scale shape: the vocabulary-scale shuffle is ``_tf_counts``'s
    (shared with the LM family); each post-shuffle block then collapses
    to at most |distinct tf values in the block| rows via one
    ``value_counts`` partial, and the final groupby is spectrum-sized
    (tens of rows at any corpus size — frequency values repeat), so
    nothing vocabulary-scale ever reaches the driver.

    Reference analog: the reference's stats views (A4,
    /root/reference/internal/database/database.go) aggregate corpus
    shape for operators; this is the token-level equivalent."""

    def spectrum_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.cast(t["c"], pa.int64()))
        return pa.table(
            {
                "tf": pc.struct_field(vc, "values"),
                "n_tokens": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return (
        _tf_counts(sf_dir)
        .map_batches(spectrum_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tf")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
    )


def tokenizer_fertility_by_lang(sf_dir: str) -> rd.Dataset:
    """Tokenizer fertility per language: subword-ish (BPE-regex) token
    count divided by whitespace word count — the standard check that a
    tokenizer doesn't explode low-resource languages (fertility ~1 for
    the language the tokenizer fits, >>1 where it fragments). Exact
    integer sums per language, ONE double division at the end (the
    ``source_quality_summary`` discipline), so the distributed fold is
    hash-stable.

    Scale shape: shuffle-free per-batch grouped partials (two
    vectorized kernels per batch: one RE2 ``count_substring_regex``,
    one split-length), then a dimension-scale (|langs|) final groupby.
    Null text counts as the empty string on both sides; a null lang is
    its own group (SQL GROUP BY semantics)."""

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        ws = pc.cast(pc.list_value_length(pc.split_pattern(txt, " ")), pa.int64())
        bpe = pc.cast(
            pc.count_substring_regex(txt, BpeishTokenizer.PATTERN), pa.int64()
        )
        g = pa.table(
            {
                "lang": t["lang"],
                "d": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "ws": ws,
                "bpe": bpe,
            }
        ).group_by("lang")
        a = g.aggregate([("d", "sum"), ("ws", "sum"), ("bpe", "sum")])
        # select by NAME — pyarrow's aggregate column order differs
        # across versions (keys first vs last)
        return pa.table(
            {
                "lang": a["lang"],
                "d": a["d_sum"],
                "ws": a["ws_sum"],
                "bpe": a["bpe_sum"],
            }
        )

    agg = (
        _docs(sf_dir, columns=["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("d", alias_name="n_docs"),
            Sum("ws", alias_name="n_ws_tokens"),
            Sum("bpe", alias_name="n_bpe_tokens"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = pc.cast(t["n_ws_tokens"], pa.int64()).to_numpy(zero_copy_only=False)
        bpe = pc.cast(t["n_bpe_tokens"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_ws_tokens": pa.array(ws, pa.int64()),
                "n_bpe_tokens": pa.array(bpe, pa.int64()),
                # every doc contributes >= 1 whitespace token ("" splits
                # to ['']), so ws >= n_docs >= 1 per group: no /0 guard
                "fertility": pa.array(
                    bpe.astype(np.float64) / ws.astype(np.float64), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _doc_bigrams(
    texts: "pa.Array | pa.ChunkedArray",
) -> "tuple[pa.Array, pa.Array, np.ndarray] | None":
    """(w1, w2, per-doc token lengths) for the within-document
    consecutive token pairs of a text column; None when the batch has
    no bigram at all. THE one tokens-to-bigrams rule (split, doc-final
    mask, flat gather) — training counts and scoring keys both build
    on it, so the two can never desynchronize."""
    toks = pc.split_pattern(pc.fill_null(texts, ""), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(lens) == 0:
        return None
    offs = np.cumsum(lens)
    mask = np.ones(int(offs[-1]), dtype=bool)
    mask[offs - 1] = False  # doc-final token starts no bigram
    i1 = np.flatnonzero(mask)
    if len(i1) == 0:
        return None
    flat = pc.list_flatten(toks).combine_chunks()
    w1 = flat.take(pa.array(i1, pa.int64()))
    w2 = flat.take(pa.array(i1 + 1, pa.int64()))
    return w1, w2, lens


def _bigram_counts(sf_dir: str) -> rd.Dataset:
    """bigram ("w1 w2", space-joined — unambiguous because whitespace
    tokens can never contain a space) -> corpus frequency. Same shape
    as ``_tf_counts``: per-batch value_counts partials, one
    bigram-vocabulary-scale shuffle. Columns named (token, c) so
    ``_bounded_tf_fold`` applies unchanged."""
    ds = _docs(sf_dir, columns=["text"])

    def pre(t: pa.Table) -> pa.Table:
        bgs = _doc_bigrams(t["text"])
        if bgs is None:
            return pa.table(
                {"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        w1, w2, _ = bgs
        vc = pc.value_counts(pc.binary_join_element_wise(w1, w2, " "))
        return pa.table(
            {
                "token": pc.struct_field(vc, "values"),
                "c": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
    )


def bigram_logppl(sf_dir: str) -> rd.Dataset:
    """Bigram language-model scoring with Stupid Backoff (Brants et al.
    2007 — the web-scale LM rule: no discounting to tune, score
    s(w2|w1) = c(w1 w2)/c(w1) when the bigram is frequent enough, else
    0.4 * the unigram probability of w2). The order-1 upgrade of
    ``unigram_logppl``: a doc full of real words in an impossible ORDER
    now scores badly too. Per document (>= 2 tokens): n_bigrams, the
    summed cost in integer MICRO-NATS, and the mean cost per bigram.

    Exactness discipline (the unigram family's): kept-bigram cost =
    floor(-ln(c2/c1(w1)) * 1e6); backoff cost = floor(-ln(0.4) * 1e6)
    + the unigram micro-nat cost of w2 (same pooled-<unk> table as
    ``unigram_logppl``). Integer costs sum exactly in any order;
    per-entry ``math.log`` keeps libm/DuckDB-``ln()`` bit parity.

    Scale shape: the bigram vocabulary gets the SAME KenLM frequency
    floor as the unigram table (``_LM_MIN_TF``, pinned at 2 by the
    oracle; raise both together for web corpora) — a kept bigram's w1
    occurs >= c2 >= floor times, so c1 always resolves inside the kept
    unigram table and the driver never folds an unbounded set. Pass 2
    is shuffle-free (one index_in against the broadcast bigram table,
    one against the unigram table for backoff, one reduceat)."""
    import math

    import ray

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bigrams", pa.int64()),
            ("nll2_micro", pa.int64()),
            ("avg_nll2_micro", pa.float64()),
        ]
    )
    tok_arr, c1_np, n_total, rare_total = _bounded_tf_fold(
        _tf_counts(sf_dir).materialize(), _LM_MIN_TF
    )
    if n_total == 0:
        return rd.from_arrow(out_schema.empty_table())
    ucost, unk_cost = _micro_nat_costs(c1_np, n_total, rare_total)
    bg_arr, c2_np, _, _ = _bounded_tf_fold(
        _bigram_counts(sf_dir).materialize(), _LM_MIN_TF
    )
    if len(c2_np):
        w1 = pc.list_element(pc.split_pattern(bg_arr, " "), 0)
        pos1 = pc.index_in(w1, value_set=tok_arr)
        if pos1.null_count:
            # tf(w1) >= c2 >= _LM_MIN_TF guarantees membership; a miss
            # means the two folds ran at different floors — an
            # unchecked NaN->int64 gather would price bigrams silently
            # wrong instead
            raise RuntimeError(
                "bigram floor diverged from the unigram floor: kept-bigram "
                "w1 missing from the kept unigram vocabulary"
            )
        c1 = c1_np[pos1.to_numpy(zero_copy_only=False).astype(np.int64)]
        bcost = np.fromiter(
            (
                math.floor(-math.log(c2 / c1i) * 1e6)
                for c2, c1i in zip(c2_np.tolist(), c1.tolist())
            ),
            np.int64,
            len(c2_np),
        )
    else:
        bcost = np.zeros(0, dtype=np.int64)
    backoff_micro = math.floor(-math.log(0.4) * 1e6)
    bc = ray.put((bg_arr, bcost, tok_arr, ucost, unk_cost))

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["doc_id"]))
        if t.num_rows == 0:
            return out_schema.empty_table()
        bg_bc, bcost_bc, tok_bc, ucost_bc, unk = ray.get(bc)
        pairs = _doc_bigrams(t["text"])
        if pairs is None:
            return out_schema.empty_table()
        w1, w2, lens = pairs
        bgs = pc.binary_join_element_wise(w1, w2, " ")
        idx = pc.index_in(bgs, value_set=bg_bc)
        hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        kept = bcost_bc[pos] if len(bcost_bc) else np.zeros(len(pos), dtype=np.int64)
        back = np.int64(backoff_micro) + _unigram_token_costs(
            w2, tok_bc, ucost_bc, unk
        )
        costs = np.where(hit, kept, back)
        nb = lens - 1
        sel = nb > 0
        nb2 = nb[sel]
        starts = np.cumsum(nb2) - nb2
        nll2 = np.add.reduceat(costs, starts).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                    pa.array(sel)
                ),
                "n_bigrams": pa.array(nb2, pa.int64()),
                "nll2_micro": pa.array(nll2, pa.int64()),
                "avg_nll2_micro": pa.array(
                    nll2.astype(np.float64) / nb2.astype(np.float64), pa.float64()
                ),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def bpe_merge_candidates(sf_dir: str, k: int = 50) -> pa.Table:
    """BPE vocabulary induction, round one (Sennrich et al. 2016): the
    top-k adjacent CHARACTER pairs by corpus frequency — each word
    weighted by its term frequency — i.e. the first k merge candidates
    a BPE tokenizer trainer would score. The tokenizer-TRAINING
    counterpart of ``token_counts_bpe`` (which applies a fixed rule).

    Exactness: integer pair counts; ties at the k boundary break by
    pair string ascending on both sides (ORDER BY n DESC, pair).

    Scale shape: the heavy lifting happens on the VOCABULARY (the
    ``_tf_counts`` shuffle output), not the corpus — each tf block
    explodes its distinct words into weighted char pairs with one 'U1'
    matrix gather (no Python loop) and pre-groups locally; the final
    groupby and the driver's top-k sort are PAIR-scale (bounded by
    |alphabet|^2, corpus-independent)."""
    out_schema = pa.schema([("pair", pa.string()), ("n", pa.int64())])

    def pairs_partial(t: pa.Table) -> pa.Table:
        w = t["token"].to_numpy(zero_copy_only=False).astype(str)
        c = pc.cast(t["c"], pa.int64()).to_numpy(zero_copy_only=False)
        lens = np.char.str_len(w)
        keep = lens >= 2
        w, c, lens = w[keep], c[keep], lens[keep]
        if not len(w):
            return out_schema.empty_table()
        width = max(w.dtype.itemsize // 4, 2)
        M = np.frombuffer(
            w.astype(f"U{width}").tobytes(), dtype="U1"
        ).reshape(len(w), width)
        npairs = (lens - 1).astype(np.int64)
        off = np.cumsum(npairs) - npairs
        tot = int(npairs.sum())
        row = np.repeat(np.arange(len(w), dtype=np.int64), npairs)
        col = np.arange(tot, dtype=np.int64) - np.repeat(off, npairs)
        pair = np.char.add(M[row, col], M[row, col + 1])
        weight = np.repeat(c, npairs)
        uniq, inv = np.unique(pair, return_inverse=True)
        n = np.bincount(inv, weights=weight).astype(np.int64)
        return pa.table(
            {"pair": pa.array(uniq.tolist(), pa.string()), "n": pa.array(n, pa.int64())}
        )

    agg = (
        _tf_counts(sf_dir)
        .map_batches(pairs_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
    )
    parts = collect_tables(agg)  # pair-scale: bounded by |alphabet|^2
    if not parts:
        return out_schema.empty_table()
    t = pa.concat_tables([p.replace_schema_metadata(None) for p in parts])
    t = pa.table({"pair": t["pair"], "n": pc.cast(t["n"], pa.int64())})
    order = pc.sort_indices(
        t, sort_keys=[("n", "descending"), ("pair", "ascending")]
    )
    return t.take(order.slice(0, k))
