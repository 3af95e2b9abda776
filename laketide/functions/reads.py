"""Shared table-read helper for the query layer.

pandas-written parquet carries dict-valued schema metadata that Ray's
shuffle/join planners cannot hash ("Failed to hash the schemas (for
deduplication)" log storms, and schema-dedup silently disabled).
Passing an explicitly metadata-scrubbed schema to ``read_parquet``
cleans the blocks AT THE READ OPERATOR itself — a post-read scrub map
only fixed downstream stages, while the read's own SplitBlocks output
still warned on every task.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


# Compressed bytes per read block. Ray's read planner targets its
# parallelism heuristic (~200 tasks) rather than block SIZE, so a 2 MB
# table shatters into 64 ~1500-row blocks — and every downstream
# sort-shuffle inherits that width, paying a 64x64 task exchange to
# move kilobytes (~1.5-2 s of pure scheduling per query at 32 CPUs,
# measured). Sizing blocks by bytes instead is scale-safe by
# construction: block count GROWS with input bytes (8 MiB compressed
# ~ 30-60 MiB in heap), it never caps parallelism on big data.
_READ_BLOCK_BYTES = 8 * 1024 * 1024
# A forced CPU fan-out (min_blocks) only pays when each block carries
# enough rows to amortize a task AND the downstream shuffle width it
# creates: Ray's sort shuffle sets num_outputs = input block count and
# samples boundaries with one task PER block, so a 5k-row corpus split
# 32 ways costs ~1.3 s of scheduling per groupby to move kilobytes
# (measured; capping it to rows/512 cut ngram_jaccard_join 2.9->1.2 s,
# bigram_pmi 1.6->0.6 s at sf0.1/32 CPUs with identical results). At
# scale the size-based term dominates long before this floor binds.
_MIN_SPLIT_ROWS = 512


def scrubbed_read(
    path: str, columns: list[str] | None = None, min_blocks: int | None = None
) -> rd.Dataset:
    """Metadata-scrubbed, SIZE-partitioned parquet read.

    ``min_blocks`` keeps map parallelism for callers whose per-row
    kernels are CPU-heavy (shingling, hashing, matmuls): a 600 KB
    documents table is one I/O block but still wants cluster-wide
    compute, so those readers pass ``min_blocks=<cluster CPUs>``.
    Relational/analytic readers leave it unset — their per-batch Arrow
    kernels are microseconds, so the shuffle width IS the cost. The
    forced fan-out is capped at one block per ``_MIN_SPLIT_ROWS`` rows
    — sub-MB inputs must not inherit a CPU-count split into every
    downstream sort shuffle."""
    import math
    import os

    meta = pq.ParquetFile(path)  # one footer read serves schema AND row count
    full = meta.schema_arrow.remove_metadata()
    schema = (
        pa.schema([full.field(c) for c in columns]) if columns is not None else full
    )
    n_rows = meta.metadata.num_rows
    floor = min(min_blocks or 1, max(1, math.ceil(n_rows / _MIN_SPLIT_ROWS)))
    nb = max(floor, math.ceil(os.path.getsize(path) / _READ_BLOCK_BYTES))
    # never split below ~1 row per block (tiny dimension tables)
    nb = min(nb, max(1, n_rows))
    return rd.read_parquet(path, schema=schema, columns=columns, override_num_blocks=nb)


def cpu_min_blocks() -> int:
    """min_blocks for CPU-heavy readers: the cluster CPU count (falls
    back to 8 before ray.init)."""
    import ray

    if not ray.is_initialized():
        return 8
    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def collect_tables(ds: rd.Dataset) -> list[pa.Table]:
    """Driver-side collect of a SMALL Dataset (final aggregates,
    dimension-scale results) as non-empty Arrow tables.

    Streams the internal ref bundles instead of calling
    ``Dataset.to_arrow_refs()``: to_arrow_refs materializes the dataset
    into a MaterializedDataset first, which costs ~1.5s of fixed
    overhead per call at 32 CPUs (measured at sf0.1 — 3.2s vs 1.7s for
    the identical pipeline). Zero-row blocks are dropped here because
    Ray emits them with EMPTY schemas from shuffle groups (concat would
    raise ArrowInvalid). Blocks that arrive as pandas (pandas-format
    map_groups outputs) are converted with the schema metadata
    scrubbed."""
    import ray

    refs = [r for b in ds.iter_internal_ref_bundles() for r in b.block_refs]
    out = []
    for blk in ray.get(refs):
        if not isinstance(blk, pa.Table):
            blk = pa.Table.from_pandas(
                blk, preserve_index=False
            ).replace_schema_metadata(None)
        if blk.num_rows:
            out.append(blk)
    return out


def collect_block_refs(ds: rd.Dataset) -> list:
    """Block ObjectRefs of an executed Dataset WITHOUT pulling them to
    the driver (for fan-out over blocks via remote tasks). Same
    rationale as ``collect_tables``: streams internal ref bundles to
    skip to_arrow_refs' MaterializedDataset overhead."""
    return [r for b in ds.iter_internal_ref_bundles() for r in b.block_refs]


def collect_block_refs_with_counts(ds: rd.Dataset) -> tuple[list, list[int]]:
    """(block refs, per-block row counts) — the counts come FREE from
    the RefBundle block metadata, so prefix-sum position/label schemes
    need no extra per-block counting pass over the cluster. Blocks
    whose metadata lacks a row count (Ray does not guarantee it for
    every operator) fall back to ONE counting task each — coercing an
    unknown to 0 would silently corrupt a prefix sum."""
    import ray

    refs, counts = [], []
    unknown = []
    for b in ds.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            refs.append(ref)
            n = meta.num_rows
            counts.append(-1 if n is None else int(n))
            if n is None:
                unknown.append(len(refs) - 1)
    if unknown:

        @ray.remote
        def _count(t) -> int:
            return len(t)  # rows for both Arrow tables and DataFrames

        got = ray.get([_count.remote(refs[i]) for i in unknown])
        for i, n in zip(unknown, got):
            counts[i] = int(n)
    return refs, counts
