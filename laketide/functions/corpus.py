"""Composed end-to-end training-corpus preparation pipeline: the ops
library's quality signals, repetition filters and exact dedup glued
into ONE streaming Ray Data pipeline with resumable partitioned output
— what a user actually runs to turn a raw document dump into a
training shard set.

Stages (all previously oracle-verified in isolation, composed here and
oracle-verified END-TO-END):

1. per-doc lexical stats (token count, top-token ratio, duplicate
   word-bigram fraction) — per-batch Arrow, shuffle-free
2. quality gate: ``n_tokens >= min_tokens``, Gopher-style
   ``top_token_ratio <= max_top_ratio`` and
   ``dup_fraction <= max_dup_fraction``
3. exact dedup on the full text (sha256-keyed, keep lowest doc_id) —
   the only shuffle in the pipeline (coarse key-hash co-partition)
4. optional partitioned parquet output: one directory per doc_id
   range so a failed run resumes by skipping finished partitions

Reference parity: the reference's end-to-end flow is fetch ->
normalize -> dedupe/merge -> upsert (SURVEY.md §1); this is the same
composition discipline applied to the corpus-side operators.

Scale notes: stages 1-2 are embarrassingly parallel; stage 3 moves one
skinny (sha, doc_id) pre-reduced stream through the exchange and
rejoins winners by doc_id membership, so full text never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _tbl(t) -> pa.Table:
    """Coerce a fanned-out block (Arrow or pandas) to an Arrow table —
    shared by the per-block remote tasks of the prefix-sum schemes."""
    if not isinstance(t, pa.Table):
        t = pa.Table.from_pandas(t, preserve_index=False)
    return t


def prepare_corpus(
    sf_dir: str,
    min_tokens: int = 20,
    max_top_ratio: float = 0.2,
    max_dup_fraction: float = 0.3,
    out_dir: str | None = None,
    partitions: int = 16,
    broadcast_budget_rows: int = 50_000_000,
) -> rd.Dataset:
    """The composed pipeline; returns the surviving documents
    (doc_id, lang, n_tokens — the stable audit projection; ``doc_id``
    is assumed unique, the documents table's key — duplicate ids would
    make the per-doc stats depend on block boundaries). With
    ``out_dir`` the full surviving rows are ALSO written as
    ``part=K/`` partitioned parquet keyed on ``doc_id % partitions``:
    a shard dir is complete only once its ``_SUCCESS`` marker exists; a
    resumed run deletes marker-less (partial) shard dirs and rewrites
    exactly those, and refuses a ``partitions`` value that differs from
    the recorded first run. Dedup keeps the winner-id broadcast under
    ``broadcast_budget_rows`` (skinny ids only — text never shuffles);
    above it, the full rows fall back to one sha-keyed co-partition
    exchange."""
    from laketide.functions.dedup import _coarse_n_parts, _coarse_parts
    from laketide.functions.relational import _key_hash_u64, keep_extreme
    from laketide.functions.text import _docs
    from laketide.stages.normalize import sha256_hex_column

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def stats_gate(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["text"])))
        toks = pc.split_pattern(t["text"], " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        lens = n_tokens.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).combine_chunks()
        doc_rep = np.repeat(doc_ids, lens)
        counts = (
            pa.table({"doc_id": pa.array(doc_rep, pa.int64()), "token": flat})
            .group_by(["doc_id", "token"])
            .aggregate([([], "count_all")])
        )
        per_doc = counts.group_by(["doc_id"]).aggregate([("count_all", "max")])
        s = per_doc.sort_by([("doc_id", "ascending")])
        pos = np.searchsorted(
            s["doc_id"].to_numpy(zero_copy_only=False), doc_ids
        )
        top_c = s["count_all_max"].to_numpy(zero_copy_only=False)[pos]
        nt_f = lens.astype(np.float64)
        top_ratio = top_c / np.maximum(nt_f, 1.0)
        # duplicate-bigram fraction (doc_bigram_repetition's kernel)
        n = len(flat)
        n_bi = np.maximum(lens - 1, 0)
        if n >= 2:
            ends = np.cumsum(lens) - 1
            keep_m = np.ones(n - 1, dtype=bool)
            valid_ends = ends[(lens > 0) & (ends < n - 1)]
            keep_m[valid_ends] = False
            bi = pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1), " ")
            bg_doc = doc_rep[: n - 1][keep_m]
            pairs = (
                pa.table(
                    {"doc_id": pa.array(bg_doc, pa.int64()), "bg": bi.filter(pa.array(keep_m))}
                )
                .group_by(["doc_id", "bg"])
                .aggregate([])
                .group_by(["doc_id"])
                .aggregate([([], "count_all")])
                .sort_by([("doc_id", "ascending")])
            )
            bkeys = pairs["doc_id"].to_numpy(zero_copy_only=False)
            bnd = pairs["count_all"].to_numpy(zero_copy_only=False)
            if len(bkeys):
                bpos = np.minimum(np.searchsorted(bkeys, doc_ids), len(bkeys) - 1)
                hit = bkeys[bpos] == doc_ids
                nd = np.where(hit, bnd[bpos], 0).astype(np.int64)
            else:
                nd = np.zeros(t.num_rows, np.int64)
        else:
            nd = n_bi.copy()
        dup = np.where(n_bi > 0, 1.0 - nd / np.maximum(n_bi.astype(np.float64), 1.0), 0.0)
        mask = (
            (lens >= min_tokens) & (top_ratio <= max_top_ratio) & (dup <= max_dup_fraction)
        )
        out = t.append_column("n_tokens", n_tokens).filter(pa.array(mask))
        return out.append_column(
            "sha", sha256_hex_column(pc.cast(out["text"], pa.string()))
        )

    # materialize ONCE: three consumers follow (winner ids, the shard
    # write, the returned projection) — without this the parquet read +
    # stats kernels would re-execute per consumer
    gated = ds.map_batches(
        stats_gate, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    n_parts = _coarse_n_parts()

    def _doc_count(path: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows

    if _doc_count(f"{sf_dir}/documents.parquet") <= broadcast_budget_rows:
        # exact dedup: skinny (sha, doc_id) pre-reduce through ONE
        # coarse exchange; winners broadcast back as a doc_id membership
        # filter so the text column itself never shuffles
        def skinny(t: pa.Table) -> pa.Table:
            s = keep_extreme(
                t.select(["sha", "doc_id"]), ["sha"], ["doc_id"], keep="first"
            )
            part = _coarse_parts(
                _key_hash_u64(s["sha"].combine_chunks()), n_parts=n_parts
            )
            return s.append_column("_cpart", pa.array(part, pa.int64()))

        winners_ds = (
            gated.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_cpart")
            .map_groups(
                lambda g: keep_extreme(
                    g.drop_columns(["_cpart"]), ["sha"], ["doc_id"], keep="first"
                ),
                batch_format="pyarrow",
            )
        )
        from laketide.functions.reads import collect_tables

        wparts = collect_tables(winners_ds)
        win_ids = (
            np.sort(
                pa.concat_tables([p.select(["doc_id"]) for p in wparts])["doc_id"]
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            if wparts
            else np.array([], np.int64)
        )
        w_ref = ray.put(win_ids)

        def keep_winners(t: pa.Table) -> pa.Table:
            from laketide.functions.relational import _sorted_member

            hit, _ = _sorted_member(
                ray.get(w_ref), pc.cast(t["doc_id"], pa.int64()).combine_chunks()
            )
            return t.filter(pa.array(hit))

        surviving = gated.map_batches(
            keep_winners, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # over-budget fallback: dedup the FULL rows through one
        # sha-keyed co-partition exchange (text shuffles once — the
        # price of not being able to broadcast the winner ids)
        def full_route(t: pa.Table) -> pa.Table:
            s = keep_extreme(t, ["sha"], ["doc_id"], keep="first")
            part = _coarse_parts(
                _key_hash_u64(s["sha"].combine_chunks()), n_parts=n_parts
            )
            return s.append_column("_cpart", pa.array(part, pa.int64()))

        surviving = (
            gated.map_batches(full_route, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_cpart")
            .map_groups(
                lambda g: keep_extreme(
                    g.drop_columns(["_cpart"]), ["sha"], ["doc_id"], keep="first"
                ),
                batch_format="pyarrow",
            )
        )

    if out_dir is not None:
        # deterministic doc_id-keyed shards: one directory per shard. A
        # shard counts as DONE only if its _SUCCESS marker exists
        # (markers are written after the whole write completes, so a
        # crash mid-write leaves none for this run); resume deletes
        # marker-less partial dirs, rewrites exactly those shards, and
        # refuses a partition-count change (silent drop/duplication).
        import glob as _glob
        import json as _json
        import os as _os
        import shutil as _shutil

        meta_path = _os.path.join(out_dir, "_META.json")
        if _os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = _json.load(fh)
            if meta.get("partitions") != partitions:
                raise ValueError(
                    f"out_dir was written with partitions={meta.get('partitions')}; "
                    f"resuming with partitions={partitions} would drop or "
                    "duplicate documents"
                )
        else:
            _os.makedirs(out_dir, exist_ok=True)
            with open(meta_path, "w") as fh:
                _json.dump({"partitions": partitions}, fh)
        done = set()
        for p in _glob.glob(_os.path.join(out_dir, "part=*")):
            k = int(_os.path.basename(p).split("=")[1])
            if _os.path.exists(_os.path.join(p, "_SUCCESS")):
                done.add(k)
            else:
                _shutil.rmtree(p)  # partial shard from a crashed run
        done_ref = ray.put(np.array(sorted(done), np.int64))

        def add_part(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
            part = ids % np.int64(partitions)
            keep = ~np.isin(part, ray.get(done_ref))
            return t.append_column(
                "part", pa.array(part, pa.int64())
            ).filter(pa.array(keep))

        surviving.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(out_dir, partition_cols=["part"])
        # the write returned: mark every shard of THIS run complete
        # (incl. empty shards, recorded as marker-only dirs)
        for k in range(partitions):
            if k in done:
                continue
            pdir = _os.path.join(out_dir, f"part={k}")
            _os.makedirs(pdir, exist_ok=True)
            with open(_os.path.join(pdir, "_SUCCESS"), "w") as fh:
                fh.write("")

    return surviving.map_batches(
        lambda t: t.select(["doc_id", "lang", "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pack_sequences(sf_dir: str, budget: int = 256) -> pa.Table:
    """Sequence packing — the pre-training step that concatenates
    documents into fixed token-budget training sequences (GPT-style
    packing). Rule (deterministic, order = doc_id): a doc starting at
    global token offset ``o`` joins sequence ``o // budget`` — the
    streaming next-fit-by-offset approximation of bin packing (exact
    greedy packing is inherently sequential; offset packing is what a
    distributed pipeline actually ships).

    Scale shape: per-doc token counts are one shuffle-free pass; the
    global offset is a TWO-PASS DISTRIBUTED PREFIX SUM over doc_id-range
    -sorted blocks (pass 1: per-block row/token stats — tiny; pass 2:
    each block gets its exclusive carry and labels its docs) — the
    revenue_pareto scan pattern (analytics.py). No step materializes the
    corpus; the driver holds one (rows, tokens) pair per block.

    Returns (doc_id, n_tokens, seq_id); oracle = the same rule via a SQL
    window exclusive cumsum."""
    from laketide.functions.reads import collect_block_refs
    from laketide.functions.text import _docs

    def tok(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        n = pc.list_value_length(pc.split_pattern(txt, " "))
        n = pc.if_else(pc.equal(txt, ""), pa.scalar(0, pa.int32()), n)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    per_doc = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )
    refs = collect_block_refs(per_doc)

    @ray.remote
    def block_stats(t) -> int:
        t = _tbl(t)
        if t.num_rows == 0 or "n_tokens" not in t.column_names:
            return 0
        return int(pc.sum(t["n_tokens"]).as_py() or 0)

    @ray.remote
    def block_label(t, carry: int, budget: int) -> pa.Table:
        t = _tbl(t)
        if t.num_rows == 0 or "n_tokens" not in t.column_names:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("seq_id", pa.int64()),
                ]
            ).empty_table()
        n = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        start = carry + np.cumsum(n) - n  # exclusive prefix within block
        return t.append_column("seq_id", pa.array(start // budget, pa.int64()))

    sums = ray.get([block_stats.remote(r) for r in refs])
    carry, offsets = 0, []
    for s in sums:
        offsets.append(carry)
        carry += s
    parts = ray.get(
        [block_label.remote(r, off, budget) for r, off in zip(refs, offsets)]
    )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("seq_id", pa.int64())]
        ).empty_table()
    return pa.concat_tables(parts)


def prepare_corpus_llm(
    sf_dir: str,
    n_bench: int = 20,
    max_nll_micro: int = 3_407_000,
) -> rd.Dataset:
    """The round-4 composed LLM data pipeline — three previously
    oracle-verified operators chained end-to-end and oracle-verified as
    a whole:

    1. DECONTAMINATE: drop every doc sharing a word trigram with the
       held-out benchmark docs (doc_id < ``n_bench``); drop the
       benchmark docs themselves.
    2. SPAN DEDUP (C4 rule): global first-occurrence dedup of 10-token
       segments with text reconstruction; fully-duplicate docs
       (n_kept = 0) are dropped.
    3. PERPLEXITY GATE: score the CLEANED text against the unigram LM
       trained on the FULL original corpus (integer micro-nat costs,
       order-free exact sums); keep docs with mean cost <=
       ``max_nll_micro``.

    Returns (doc_id, lang, n_tokens, nll_micro, avg_nll_micro,
    cleaned_text). Scale shape: two tiny broadcasts (bench gram set,
    vocabulary cost table) + the span-dedup pair of coarse shuffles;
    every other stage is shuffle-free streaming."""
    from laketide.functions.text import (
        _bench_gram_set,
        _decontaminate_pass,
        _span_dedup_pipeline,
        _unigram_cost_table,
        _unigram_token_costs,
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("n_tokens", pa.int64()),
            ("nll_micro", pa.int64()),
            ("avg_nll_micro", pa.float64()),
            ("cleaned_text", pa.string()),
        ]
    )
    bench_bc = ray.put(_bench_gram_set(sf_dir, n_bench))
    built = _unigram_cost_table(sf_dir)
    if built is None:
        return rd.from_arrow(out_schema.empty_table())
    cost_bc = ray.put(built)

    clean_docs = _decontaminate_pass(
        sf_dir,
        n_bench,
        lambda grams: pc.is_in(grams, value_set=ray.get(bench_bc)),
        out_columns=("doc_id", "text", "lang"),
    )  # single-consumer: the span-dedup pipeline emits segment rows
    # and totals markers in ONE pass, so the decontamination scan
    # (the dominant corpus pass) runs exactly once, fully streaming
    deduped = _span_dedup_pipeline(clean_docs, carry_lang=True)

    def score_gate(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_kept"], 0))
        if t.num_rows == 0:
            return out_schema.empty_table()
        tok_bc, cost_np, unk_cost = ray.get(cost_bc)
        toks = pc.split_pattern(t["cleaned_text"], " ")
        lens = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        # below-floor tokens miss the kept vocabulary -> pooled <unk>
        costs = _unigram_token_costs(flat, tok_bc, cost_np, unk_cost)
        starts = np.cumsum(lens) - lens
        nll = np.add.reduceat(costs, starts).astype(np.int64)
        avg = nll.astype(np.float64) / lens.astype(np.float64)
        out = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": pc.cast(t["lang"], pa.string()),
                "n_tokens": pa.array(lens, pa.int64()),
                "nll_micro": pa.array(nll, pa.int64()),
                "avg_nll_micro": pa.array(avg, pa.float64()),
                "cleaned_text": t["cleaned_text"],
            }
        )
        return out.filter(pa.array(avg <= float(max_nll_micro)))

    return deduped.map_batches(
        score_gate, batch_format="pyarrow", zero_copy_batch=True
    )


def shuffle_positions(sf_dir: str) -> rd.Dataset:
    """Deterministic global corpus shuffle — the training-order
    permutation step of a pretraining run: every doc gets a
    pseudo-random but REPRODUCIBLE position (rank under a
    Knuth-multiplicative hash of doc_id, doc_id tiebreak), identical
    across runs, cluster sizes and block layouts — the property that
    makes a resumed/re-sharded training job see the same data order.
    Returns (doc_id, shuffle_key, position).

    Scale shape: one distributed ``Dataset.sort`` on the 16-byte
    (key, doc_id) rows (text never moves), then global positions via
    the ``pack_sequences`` two-pass prefix-sum scheme — per-block row
    counts to the driver (O(blocks) ints), exclusive carries back, each
    block labels locally."""
    from laketide.functions.text import _docs

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("shuffle_key", pa.int64()),
            ("position", pa.int64()),
        ]
    )

    def key(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_kleene(
                pc.is_valid(t["doc_id"]), pc.greater_equal(t["doc_id"], 0)
            )
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.max()) >= (1 << 31):
            # uint64 wraparound vs the oracle's signed BIGINT modulo —
            # refuse ids outside the domain where both agree
            raise ValueError("shuffle_positions requires doc_id < 2^31")
        k = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "shuffle_key": pa.array(k.astype(np.int64), pa.int64()),
            }
        )

    keyed = (
        _docs(sf_dir, columns=["doc_id"])
        .map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["shuffle_key", "doc_id"])
    )
    return _label_positions(keyed, out_schema)


def _label_positions(keyed: rd.Dataset, out_schema: pa.Schema) -> rd.Dataset:
    """Append a 0-based global ``position`` column to an already-SORTED
    Dataset via the two-pass prefix-sum scheme: per-block row counts
    come from the RefBundle metadata (no counting pass touches the
    blocks), exclusive carries fan back out, each block labels locally
    and projects to ``out_schema``. Stays distributed — the driver only
    ever holds the per-block counts. Shared tail of
    ``shuffle_positions`` and ``corpus_training_mix``."""
    import ray

    from laketide.functions.reads import collect_block_refs_with_counts

    refs, counts = collect_block_refs_with_counts(keyed)

    @ray.remote
    def block_label(t, carry: int) -> pa.Table:
        t = _tbl(t)
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        pos = carry + np.arange(t.num_rows, dtype=np.int64)
        t = t.append_column("position", pa.array(pos, pa.int64()))
        return t.select(out_schema.names)

    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    carry, offsets = 0, []
    for c in counts:
        offsets.append(carry)
        carry += c
    return rd.from_arrow_refs(
        [block_label.remote(r, off) for r, off in zip(refs, offsets)]
    )


def corpus_training_mix(
    sf_dir: str,
    n_bench: int = 20,
    max_nll_micro: int = 3_407_000,
) -> rd.Dataset:
    """The round-5 composed pipeline — the full training-mix build,
    chaining FIVE previously oracle-verified operators end-to-end:

    1-3. ``prepare_corpus_llm``: decontaminate -> C4 span dedup with
       reconstruction -> unigram-LM perplexity gate.
    4. LANGUAGE REBALANCE over the SURVIVORS: ``temperature_sample``'s
       sqrt rule applied to the post-gate language counts (rebalancing
       before the gates would recount docs the gates then drop) —
       integer-threshold Knuth-hash acceptance, deterministic.
    5. DETERMINISTIC TRAINING ORDER: ``shuffle_positions``' rank under
       the Knuth-multiplicative hash (doc_id tiebreak), 0-based.

    Returns (position, doc_id, lang, n_tokens, avg_nll_micro) — the mix
    MANIFEST. cleaned_text is deliberately excluded: positions come from
    one distributed sort of 16-byte key rows (text never rides the
    sort); a shard writer gathers text by doc_id per position range.
    Scale shape: the prepare stages' two broadcasts + span-dedup shuffle
    pair, one dimension-scale lang-count partial fold, one skinny-row
    sort with RefBundle-metadata prefix sums."""
    from laketide.functions.text import _sqrt_rule_thresholds, _threshold_limits

    out_schema = pa.schema(
        [
            ("position", pa.int64()),
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("n_tokens", pa.int64()),
            ("avg_nll_micro", pa.float64()),
        ]
    )

    # project the manifest columns BEFORE materializing: cleaned_text is
    # the dominant bytes of the prep output and neither the lang-count
    # fold nor the sampler reads it — pinning it in the object store for
    # the whole mix build would contradict the "text never rides" design
    base = (
        prepare_corpus_llm(sf_dir, n_bench, max_nll_micro)
        .select_columns(["doc_id", "lang", "n_tokens", "avg_nll_micro"])
        .materialize()
    )
    thr = _sqrt_rule_thresholds(base, "lang")
    if thr is None:
        return rd.from_arrow(out_schema.empty_table())

    def sample_and_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_kleene(pc.is_valid(t["lang"]), pc.is_valid(t["doc_id"])))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.max()) >= (1 << 31):
            # same domain rule as shuffle_positions: uint64 wraparound
            # would diverge from the oracle's signed BIGINT modulo
            raise ValueError("corpus_training_mix requires doc_id < 2^31")
        bucket = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1_000_000)
        limits = _threshold_limits(t["lang"], thr)
        keep = bucket < limits
        t = t.filter(pa.array(keep))
        kid = ids[keep]
        k = (kid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": pc.cast(t["lang"], pa.string()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "avg_nll_micro": pc.cast(t["avg_nll_micro"], pa.float64()),
                "shuffle_key": pa.array(k.astype(np.int64), pa.int64()),
            }
        )

    keyed = base.map_batches(
        sample_and_key, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["shuffle_key", "doc_id"])
    return _label_positions(keyed, out_schema)
