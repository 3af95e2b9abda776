"""Near-duplicate detection over ``documents`` — MinHash+LSH, SimHash and
exact-Jaccard verification, built the Ray-Data way:

  shingle -> signature (vectorized numpy kernels in map_batches)
    -> explode to (band, band_hash, doc_id)  (flat projection)
    -> groupby(band, band_hash)              (ONE shuffle of tiny rows)
    -> candidate pairs per bucket            (map_groups, hot-bucket capped)
    -> verify (exact Jaccard)                (distributed: shingle-set
                                              Dataset joined to pairs)

At 100 TB the banded rows are a few dozen bytes each, so the shuffle is
tiny relative to the corpus. The verify stage broadcasts ONLY the
candidate id set (8 bytes/id); shingle sets stay distributed and meet the
pairs through Dataset joins — nothing content-sized ever lands on the
driver. No oracle SQL (non-relational ops) — the driver records
rows-only checks; determinism is guaranteed by fixed hash seeds.

Hash kernels are numpy-vectorized end-to-end: token hashes via pandas'
C-level siphash (``hash_array``), k-gram shingles and 64-permutation
multiply-shift MinHash as uint64 wraparound arithmetic (mod 2**64), never
a per-shingle Python loop.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from laketide.functions.reads import collect_tables, cpu_min_blocks, scrubbed_read

logger = logging.getLogger(__name__)

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS_PER_BAND = _N_PERM // _BANDS
_SHINGLE_K = 3
# Hot-bucket cap: an LSH bucket larger than this emits a STAR topology
# (first id paired to every other member) instead of all pairs — O(n)
# rows, same connected components for dedup, and the drop is logged
# (no silent caps). A popular band hash at scale is otherwise O(n^2).
# NOTE: above the cap, pairs not incident to the representative are not
# individually Jaccard-verified — the right trade for dedup (components
# survive) but NOT an exact pair listing; raise LAKETIDE_MAX_LSH_BUCKET
# when an exact verified pair set over hot buckets is required.
import os as _os

_MAX_BUCKET = int(_os.environ.get("LAKETIDE_MAX_LSH_BUCKET", "256"))

# Odd 64-bit mixing constants (splitmix64-derived); uint64 wraparound
# arithmetic == arithmetic mod 2**64.
_K = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0x2545F4914F6CDD1D],
    dtype=np.uint64,
)


def _mix_constants(k: int) -> np.ndarray:
    """First ``k`` odd mixing constants — the fixed 4 above (stable
    hashes for the default shingle sizes), extended deterministically by
    a splitmix64-style recurrence for larger k."""
    if k <= len(_K):
        return _K[:k]
    out = np.empty(k, dtype=np.uint64)
    out[: len(_K)] = _K
    x = _K[-1]
    for i in range(len(_K), k):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        out[i] = x | np.uint64(1)
    return out


def _perm_params(n_perm: int = _N_PERM, seed: int = 12345):
    """Multiply-shift universal-hash family params: odd multipliers."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)  # odd
    b = rng.randint(0, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _segment_sums(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Per-doc sums of a flat per-token array — the one place the
    reduceat empty-segment pitfall is handled (zero-length docs yield 0,
    not the neighbouring segment's first element)."""
    out = np.zeros(len(lengths), dtype=values.dtype)
    nz = lengths > 0
    if nz.any() and len(values):
        offs = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        out[nz] = np.add.reduceat(values, offs[nz])
    return out


def _token_hashes(texts: pa.ChunkedArray | pa.Array):
    """Whitespace-split every text, hash every token (C-level siphash).

    Returns ``(hashes uint64[total_tokens], lengths int64[n_docs])``.
    """
    toks = pc.utf8_split_whitespace(texts)
    # null text -> null length -> NaN -> garbage int64 (negative repeat
    # counts downstream); a null doc simply has zero tokens — same fix
    # as text.py's doc_quality
    lengths = (
        pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), lengths
    # Arrow's split yields "" tokens for empty/edge-whitespace text where
    # Python's str.split() yields none — drop them and fix the counts.
    nonempty = flat != ""
    if not nonempty.all():
        offs = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        empties = np.zeros(len(lengths), dtype=np.int64)
        nz = lengths > 0
        if nz.any():
            empties[nz] = np.add.reduceat((~nonempty).astype(np.int64), offs[nz])
        lengths = lengths - empties
        flat = flat[nonempty]
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), lengths
    # categorize=False: the categorize fast path is layout-dependent;
    # plain elementwise siphash is deterministic across processes.
    h = pd.util.hash_array(flat, categorize=False).astype(np.uint64)
    return h, lengths


def _gram_hashes(texts, k: int = _SHINGLE_K):
    """k-gram shingle hashes per doc, fully vectorized.

    Docs shorter than ``k`` tokens produce ONE shingle over the available
    tokens (missing positions hash as 0). Returns
    ``(grams uint64[total_grams], gram_counts int64[n_docs])``.
    """
    h, lengths = _token_hashes(texts)
    n_docs = len(lengths)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64), lengths
    pad = k - 1
    # Zero-pad k-1 slots between docs so windows never cross a boundary
    # and short docs fall out of the same windowed formula.
    padded = np.zeros(len(h) + pad * n_docs, dtype=np.uint64)
    doc_of_token = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    padded[np.arange(len(h), dtype=np.int64) + pad * doc_of_token] = h
    g = np.maximum(lengths - pad, np.minimum(lengths, 1))  # grams per doc
    total_g = int(g.sum())
    if total_g == 0:
        return np.empty(0, dtype=np.uint64), g
    new_off = np.concatenate([[0], np.cumsum(lengths + pad)[:-1]]).astype(np.int64)
    g_off = np.concatenate([[0], np.cumsum(g)[:-1]]).astype(np.int64)
    # grouped arange: window start index per gram
    starts = (
        np.arange(total_g, dtype=np.int64)
        - np.repeat(g_off, g)
        + np.repeat(new_off, g)
    )
    grams = np.zeros(total_g, dtype=np.uint64)
    K = _mix_constants(k)
    for j in range(k):
        grams += padded[starts + j] * K[j]
    return grams, g


def _minhash_signatures(grams: np.ndarray, gram_counts: np.ndarray, a, b):
    """(n_docs, n_perm) MinHash matrix via multiply-shift + reduceat.

    Chunked over docs so the (n_perm x grams) intermediate stays ~16 MB.
    Docs with zero grams get an all-zeros signature."""
    n_docs = len(gram_counts)
    n_perm = len(a)
    sig = np.zeros((n_docs, n_perm), dtype=np.uint64)
    if len(grams) == 0:
        return sig
    g_off = np.concatenate([[0], np.cumsum(gram_counts)]).astype(np.int64)
    chunk_grams = 32_768
    d0 = 0
    while d0 < n_docs:
        d1 = d0
        while d1 < n_docs and g_off[d1 + 1] - g_off[d0] <= chunk_grams:
            d1 += 1
        d1 = max(d1, d0 + 1)  # always take at least one doc
        lo, hi = g_off[d0], g_off[d1]
        if hi > lo:
            sub = grams[lo:hi]
            vals = a[:, None] * sub[None, :] + b[:, None]  # uint64 wrap
            counts = gram_counts[d0:d1]
            nz = counts > 0
            offs = (g_off[d0:d1] - lo)[nz].astype(np.int64)
            if offs.size:
                mins = np.minimum.reduceat(vals, offs, axis=1)  # (n_perm, nz)
                sig[np.arange(d0, d1)[nz]] = mins.T
        d0 = d1
    return sig


def _band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_docs, _BANDS) bucket keys: mix each band's rows (uint64 wrap)."""
    n_docs = sig.shape[0]
    banded = sig.reshape(n_docs, _BANDS, _ROWS_PER_BAND)
    out = np.zeros((n_docs, _BANDS), dtype=np.uint64)
    for j in range(_ROWS_PER_BAND):
        out += (banded[:, :, j] + np.uint64(j + 1)) * _K[j % len(_K)]
    return out


class MinHasher:
    """Stateful batch fn: permutation parameters built ONCE (on the
    driver; the instance ships with the task closure) — emits the banded
    LSH rows (band, band_hash, doc_id) per input doc."""

    def __init__(self, n_perm: int = _N_PERM, k: int = _SHINGLE_K, seed: int = 12345):
        self.a, self.b = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        grams, g_counts = _gram_hashes(t["text"], self.k)
        sig = _minhash_signatures(grams, g_counts, self.a, self.b)
        bh = _band_hashes(sig)
        n = t.num_rows
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(_BANDS, dtype=np.int64), n)),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(doc_ids, _BANDS)),
            }
        )


def _pair_budget(n: int, cap: int | None = None) -> tuple[int, int]:
    """(kept, dropped) candidate-pair counts for a bucket of ``n``
    members under the hot-bucket cap: all-pairs below the cap; above it,
    all-pairs among the first ``cap`` members + representative-vs-rest
    (exactly what ``_emit_pairs`` emits). The single source of truth for
    the cap arithmetic — ``minhash_lsh_stats`` surfaces these counts so
    capped recall is visible to consumers, not just the log."""
    cap = _MAX_BUCKET if cap is None else cap
    full = n * (n - 1) // 2
    if n <= cap:
        return full, 0
    kept = cap * (cap - 1) // 2 + (n - cap)
    return kept, full - kept


def _emit_pairs(ids: np.ndarray, what: str) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs below the cap; above it, all-pairs among the first
    ``_MAX_BUCKET`` members PLUS representative-vs-rest (logged). The
    extra in-head pairs matter when pairs are Jaccard-VERIFIED
    downstream: a pure star through a low-similarity representative
    (hash-collision outlier) would lose every one of its edges at the
    verify filter and disconnect genuine duplicates."""
    n = len(ids)
    if n > _MAX_BUCKET:
        head = _MAX_BUCKET
        kept, dropped = _pair_budget(n)
        logger.warning(
            "%s hot bucket: %d members > cap %d; emitting all-pairs among "
            "first %d + rep-vs-rest (%d pairs), dropping %d",
            what, n, _MAX_BUCKET, head, kept, dropped,
        )
        iu = np.triu_indices(head, k=1)
        ia = np.concatenate([iu[0], np.zeros(n - head, dtype=np.int64)])
        ib = np.concatenate([iu[1], np.arange(head, n, dtype=np.int64)])
        return ids[ia], ids[ib]
    iu = np.triu_indices(n, k=1)
    return ids[iu[0]], ids[iu[1]]


_BUCKET_MIX = np.uint64(0x9E3779B97F4A7C15)


def _coarse_n_parts() -> int:
    """Coarse-shuffle fan-out: ~4x the cluster CPUs (floor 32). One
    definition — five pipelines key their shuffles on it."""
    import ray as _ray

    return max(32, int(_ray.cluster_resources().get("CPU", 8)) * 4)


def _coarse_parts(*cols: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic coarse shuffle key from uint64 column mixes: buckets
    sharing the key co-locate, so one UDF call can process MANY buckets
    vectorized (wraparound multiply-xor mix, then mod)."""
    acc = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        acc = (acc ^ c.astype(np.uint64)) * _BUCKET_MIX
    return (acc % np.uint64(n_parts)).astype(np.int64)


def _iter_buckets(t: pa.Table, key_cols: list[str], payload_cols: list[str]):
    """Yield payload slices for every MULTI-member bucket in one
    co-located group-batch: a single lexsort (keys, then the first
    payload column) finds all bucket boundaries vectorized; only buckets
    with >=2 rows (rare — true collisions) reach the caller's loop.
    The shared core of the minhash / simhash / embedding candidate
    stages — replaces one-pandas-UDF-call-per-bucket map_groups, which
    cost ~700us x n_buckets of pure overhead (50 CPU-s at sf0.1 against
    a 0.25s signature kernel)."""
    keys = [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in key_cols]
    payloads = [t[c].to_numpy(zero_copy_only=False) for c in payload_cols]
    # np.lexsort: LAST key is primary — order by keys, then payload[0]
    order = np.lexsort(tuple([payloads[0]] + list(reversed(keys))))
    keys = [k[order] for k in keys]
    payloads = [p[order] for p in payloads]
    change = np.zeros(max(len(order) - 1, 0), dtype=bool)
    for k in keys:
        change |= k[1:] != k[:-1]
    bounds = np.concatenate([[0], np.flatnonzero(change) + 1, [len(order)]])
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi - lo < 2:
            continue
        yield tuple(p[lo:hi] for p in payloads)


def _int64_table(rows: list[np.ndarray], cols: list[str]) -> pa.Table:
    """Stack per-bucket row blocks, np.unique-dedup, emit int64 columns;
    typed empty table when nothing collided."""
    if not rows:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    m = np.unique(np.concatenate(rows).astype(np.int64), axis=0)
    return pa.table({c: pa.array(m[:, i], pa.int64()) for i, c in enumerate(cols)})


def _grouped_bucket_pairs(t: pa.Table, what: str = "minhash-lsh") -> pa.Table:
    """Candidate pairs for every (band, band_hash) bucket in one
    group-batch (see _iter_buckets); cross-band duplicates already
    visible in this group pre-dedup here."""
    cols = ["doc_a", "doc_b"]
    if t.num_rows == 0:
        return _int64_table([], cols)
    out: list[np.ndarray] = []
    for (ids,) in _iter_buckets(t, ["band", "band_hash"], ["doc_id"]):
        u = np.unique(ids)
        if len(u) < 2:
            continue
        a, b = _emit_pairs(u, what)
        out.append(np.stack([a, b], axis=1))
    return _int64_table(out, cols)


def _dedup_pairs_group(t: pa.Table, part_col: str = "pair_part") -> pa.Table:
    """Vectorized exact row dedup within a co-located group-batch (all
    remaining columns must be integral)."""
    if part_col in t.column_names:
        t = t.drop_columns([part_col])
    cols = t.column_names
    if t.num_rows == 0:
        return _int64_table([], cols)
    m = np.stack(
        [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in cols], axis=1
    )
    return _int64_table([m], cols)


def minhash_lsh_candidates(sf_dir: str, from_index: bool = False) -> rd.Dataset:
    """Candidate near-dup pairs from MinHash-LSH banding (deduped).

    Shuffle shape: both exchanges key on a COARSE deterministic partition
    (hash of the bucket / pair mod ~4xCPUs) so each map_groups call
    handles thousands of buckets vectorized instead of one pandas UDF
    call per bucket; (band, band_hash) buckets still co-locate inside
    their coarse partition, so pair emission and dedup stay exact.

    ``from_index=True`` serves from the persisted banded-signature
    artifact (``minhash_signature_build``; built on first use) instead
    of re-shingling the corpus — the instance-closure MinHasher stays
    the direct path (perm params rebuild in microseconds; the artifact
    saves the CORPUS scan, not the hasher setup)."""
    banded = _banded_rows(sf_dir, from_index)
    pairs = banded.groupby("bucket_part").map_groups(
        lambda g: _grouped_bucket_pairs(g.drop_columns(["bucket_part"])),
        batch_format="pyarrow",
    )
    return _dedup_pair_stream(pairs)


def _dedup_pair_stream(pairs: rd.Dataset) -> rd.Dataset:
    """Dedup (doc_a, doc_b) pairs found in multiple coarse partitions
    (cross-band collisions): one more tiny-row coarse shuffle with
    vectorized in-group dedup — the shared tail of the LSH candidate
    pipelines."""
    n_parts = _coarse_n_parts()

    def pair_with_part(t: pa.Table) -> pa.Table:
        part = _coarse_parts(
            t["doc_a"].to_numpy(zero_copy_only=False).view(np.uint64),
            t["doc_b"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        return t.append_column("pair_part", pa.array(part, pa.int64()))

    return (
        pairs.map_batches(pair_with_part, batch_format="pyarrow")
        .groupby("pair_part")
        .map_groups(
            lambda g: _dedup_pairs_group(g.drop_columns(["pair_part"])),
            batch_format="pyarrow",
        )
    )


def minhash_lsh_stats(sf_dir: str) -> pa.Table:
    """Bucket-size / truncation diagnostics for the LSH candidate
    stream: the hot-bucket cap (``LAKETIDE_MAX_LSH_BUCKET``) silently
    thins pairs from oversized buckets (disclosed in the worker log);
    this companion query makes capped recall VISIBLE to a consumer of
    ``minhash_lsh_candidates``. One row (pre-dedup, i.e. per
    (band, band_hash) bucket): ``multi_buckets`` (buckets with >=2
    members), ``truncated_buckets``, ``emitted_pairs``,
    ``dropped_pairs``. dropped_pairs == 0 means the candidate stream is
    the complete banded pair set. Same banding + coarse shuffle as the
    candidate pipeline; the per-bucket counters come from
    ``_pair_budget`` — the exact arithmetic ``_emit_pairs`` uses."""
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    n_parts = _coarse_n_parts()
    hasher = MinHasher()
    cap = _MAX_BUCKET  # captured driver-side: workers see one consistent cap

    def band_with_part(t: pa.Table) -> pa.Table:
        out = hasher(t)
        part = _coarse_parts(
            out["band"].to_numpy(zero_copy_only=False),
            out["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        return out.append_column("bucket_part", pa.array(part, pa.int64()))

    def bucket_stats(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket_part"])
        multi = trunc = emitted = dropped = 0
        for (ids,) in _iter_buckets(g, ["band", "band_hash"], ["doc_id"]):
            n = len(np.unique(ids))
            if n < 2:
                continue
            multi += 1
            kept, drop = _pair_budget(n, cap)
            emitted += kept
            dropped += drop
            if drop:
                trunc += 1
        return pa.table(
            {
                "multi_buckets": pa.array([multi], pa.int64()),
                "truncated_buckets": pa.array([trunc], pa.int64()),
                "emitted_pairs": pa.array([emitted], pa.int64()),
                "dropped_pairs": pa.array([dropped], pa.int64()),
            }
        )

    partials = (
        docs.map_batches(band_with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket_part")
        .map_groups(bucket_stats, batch_format="pyarrow")
    )
    # bounded driver materialization: one 4-int row per coarse partition
    tbls = [t for t in collect_tables(partials) if t.num_rows]
    cols = ["multi_buckets", "truncated_buckets", "emitted_pairs", "dropped_pairs"]
    if not tbls:
        return pa.table({c: pa.array([0], pa.int64()) for c in cols})
    cat = pa.concat_tables(tbls)
    return pa.table(
        {c: pa.array([pc.sum(cat[c]).as_py() or 0], pa.int64()) for c in cols}
    )


class _ShingleSets:
    """Per-doc sorted unique shingle sets for candidate docs only; the
    candidate id set (ints) is broadcast via ray.put and read from the
    local object store per call (cheap); a plain function, NOT an actor
    pool — reserving actor CPUs here can deadlock small clusters when
    combined with the join aggregator actors downstream."""

    def __init__(self, need_ref):
        self.need_ref = need_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        needed = ray.get(self.need_ref)
        t = t.filter(pc.is_in(t["doc_id"], value_set=needed))
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.binary()),
                }
            )
        grams, g_counts = _gram_hashes(t["text"])
        offs = np.concatenate([[0], np.cumsum(g_counts)]).astype(np.int64)
        # packed as little-endian uint64 bytes: Arrow's hash join supports
        # binary payloads but not list<> ones
        sets = [
            np.unique(grams[offs[i] : offs[i + 1]]).tobytes()
            for i in range(t.num_rows)
        ]
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "sh": pa.array(sets, pa.binary()),
            }
        )


def _exact_jaccard_batch(t: pa.Table) -> pa.Table:
    """Exact n-gram Jaccard per candidate row from the two joined
    packed sorted-unique shingle sets."""
    sh_a = t["sh_a"].to_pylist()
    sh_b = t["sh_b"].to_pylist()
    jac = np.zeros(t.num_rows, dtype=np.float64)
    for i in range(t.num_rows):
        sa = np.frombuffer(sh_a[i] or b"", dtype=np.uint64)
        sb = np.frombuffer(sh_b[i] or b"", dtype=np.uint64)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        jac[i] = (inter / union) if union else 0.0
    return pa.table(
        {
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "jaccard": pa.array(jac),
        }
    )


def _gather_nonempty_blocks(ds: rd.Dataset) -> list:
    """Fetch a (small) materialized Dataset's blocks, dropping zero-row
    ones BEFORE any ``pa.concat_tables``: Ray Data emits zero-row blocks
    with an EMPTY schema (no columns at all) from shuffle groups that
    produce no output, and concat raises ``ArrowInvalid: Schema at index
    N was different`` on them (observed at sf0.01 driver scale; the
    planted test fixtures are too small to hit it). Same idiom as
    ``similarity._merge_topk``."""
    import ray

    return collect_tables(ds)


def minhash_dedup_verified(sf_dir: str, threshold: float = 0.7) -> rd.Dataset:
    """LSH candidates verified with exact n-gram Jaccard (see
    ``_verify_pairs_exact`` for the distributed verify shape)."""
    return _verify_pairs_exact(
        minhash_lsh_candidates(sf_dir).materialize(), sf_dir, threshold
    )


def _verify_pairs_exact(
    cands: rd.Dataset, sf_dir: str, threshold: float
) -> rd.Dataset:
    """Exact n-gram-Jaccard verification of a (doc_a, doc_b) candidate
    Dataset — the shared tail of ``minhash_dedup_verified`` and
    ``ngram_jaccard_join``:

    1. candidate id set (two int64 columns, tiny) -> broadcast via ray.put
    2. shingle-set Dataset over ONLY candidate docs (semi-join filter in
       map_batches; content never leaves the tasks)
    3. pairs ⋈ shingles(doc_a) ⋈ shingles(doc_b) (Dataset joins), or an
       adaptive small-side broadcast below a byte budget
    4. exact Jaccard per pair in map_batches, filter by threshold

    No driver-side dict of shingle sets; the only driver materialization
    is the candidate id list."""
    import ray

    parts = _gather_nonempty_blocks(cands)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return rd.from_arrow(empty)
    id_tbl = pa.concat_tables(parts, promote_options="default")
    if id_tbl.num_rows == 0:
        return rd.from_arrow(empty)
    need = pc.unique(
        pa.concat_arrays(
            [
                pc.cast(id_tbl["doc_a"], pa.int64()).combine_chunks(),
                pc.cast(id_tbl["doc_b"], pa.int64()).combine_chunks(),
            ]
        )
    )
    need_ref = ray.put(need)

    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    # task-based stage (no reserved actors), computed ONCE and reused by
    # both join sides
    shingles = docs.map_batches(
        _ShingleSets(need_ref), batch_format="pyarrow"
    ).materialize()
    thr = float(threshold)

    # ---- adaptive small-side broadcast (planner behavior, mirrors
    # similarity.embedding_near_dup): when the candidate docs' packed
    # shingle sets fit a byte budget, broadcast them once and verify per
    # pair batch by lookup — skipping both hash joins' aggregator
    # latency. Above the budget the shuffle joins (the 100 TB shape)
    # run unchanged.
    broadcast_max = int(
        _os.environ.get("LAKETIDE_VERIFY_BROADCAST_MAX_BYTES", str(64 << 20))
    )
    if (shingles.size_bytes() or 0) <= broadcast_max:
        sh_blocks = _gather_nonempty_blocks(shingles)
        sh_tbl = (
            pa.concat_tables(sh_blocks, promote_options="default")
            if sh_blocks
            else None
        )
        if sh_tbl is None or sh_tbl.num_rows == 0:
            return rd.from_arrow(empty)
        sh_ref = ray.put(sh_tbl.combine_chunks())

        def verify_broadcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            sh = ray.get(sh_ref)
            ia = pc.index_in(pc.cast(t["doc_a"], pa.int64()), value_set=sh["doc_id"])
            ib = pc.index_in(pc.cast(t["doc_b"], pa.int64()), value_set=sh["doc_id"])
            joined_t = pa.table(
                {
                    "doc_a": t["doc_a"],
                    "doc_b": t["doc_b"],
                    "sh_a": pc.take(sh["sh"], ia),
                    "sh_b": pc.take(sh["sh"], ib),
                }
            )
            out = _exact_jaccard_batch(joined_t)
            return out.filter(pc.greater_equal(out["jaccard"], thr))

        return cands.map_batches(verify_broadcast, batch_format="pyarrow")

    def _ren(suffix):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([f"doc_{suffix}", f"sh_{suffix}"])

        return f

    sh_a = shingles.map_batches(_ren("a"), batch_format="pyarrow")
    sh_b = shingles.map_batches(_ren("b"), batch_format="pyarrow")
    # join fan-out sized to the cluster: hash-shuffle aggregator actors
    # reserve a CPU each, and TWO joins run concurrently — oversizing
    # deadlocks a small cluster (observed at num_cpus=4 with 8+8 actors)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_parts = max(2, min(8, cpus // 2))
    agg_args = {"num_cpus": 0.5}
    joined = cands.join(
        sh_a,
        join_type="inner",
        num_partitions=n_parts,
        on=("doc_a",),
        aggregator_ray_remote_args=agg_args,
    ).join(
        sh_b,
        join_type="inner",
        num_partitions=n_parts,
        on=("doc_b",),
        aggregator_ray_remote_args=agg_args,
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        out = _exact_jaccard_batch(t)
        return out.filter(pc.greater_equal(out["jaccard"], thr))

    return joined.map_batches(verify, batch_format="pyarrow")


_NGRAM_JOIN_MAX_BUCKET = int(
    _os.environ.get("LAKETIDE_NGRAM_JOIN_MAX_BUCKET", "0")
)  # 0 = uncapped (exact); capping trades completeness for hot-key safety


def _doc_sorted_unique_grams(
    grams: np.ndarray, g_counts: np.ndarray, secondary: np.ndarray | None = None
):
    """Per-doc sorted-unique gram rows, one lexsort + shift-compare
    dedup (shared by the df pre-pass and the prefix emitter so the
    dedup semantics can never diverge). Sort order within a doc is
    (secondary, gram-hash) when ``secondary`` is given (duplicate grams
    share both keys, so neighbour-dedup still sees them adjacent), else
    gram-hash. Returns ``(g2, d2)``: gram and doc-ordinal arrays."""
    n = len(g_counts)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), g_counts)
    keys = (
        (grams, doc_of) if secondary is None else (grams, secondary, doc_of)
    )
    order = np.lexsort(keys)
    g2, d2 = grams[order], doc_of[order]
    keep = np.ones(len(g2), dtype=bool)
    keep[1:] = (d2[1:] != d2[:-1]) | (g2[1:] != g2[:-1])
    return g2[keep], d2[keep]


def _gram_df_top(docs: rd.Dataset, top_c: int = 1 << 16) -> pa.Table:
    """Global document frequencies of the ``top_c`` most common trigram
    hashes — the one extra pass that makes prefix filtering selective
    (Bayardo et al.'s frequency ordering). Rows through the shuffle are
    (gram uint64, df int64) pre-aggregated per batch (per-doc unique,
    then per-batch unique+count), so the exchange is vocabulary-sized,
    not corpus-sized; the driver merge is bounded at top_c per count
    block (each gram's count is fully co-located after the groupby, so
    per-block top-C contains the global top-C).

    Adaptive planner (same pattern as the verify broadcast): when the
    partial count tables sum to few rows, the groupby's fixed shuffle
    cost dwarfs the work — merge the partials on the driver in one
    numpy pass instead. Above the row budget
    (``LAKETIDE_DF_DRIVER_MERGE_MAX_ROWS``, default 4M rows ≈ 64 MB)
    the distributed groupby runs unchanged — the 100 TB shape."""

    def emit(t: pa.Table) -> pa.Table:
        grams, g_counts = _gram_hashes(t["text"])
        if len(grams) == 0:
            return pa.table(
                {"gram": pa.array([], pa.int64()), "df": pa.array([], pa.int64())}
            )
        g2, _ = _doc_sorted_unique_grams(grams, g_counts)
        u, c = np.unique(g2, return_counts=True)
        return pa.table(
            {"gram": pa.array(u.view(np.int64)), "df": pa.array(c.astype(np.int64))}
        )

    n_parts = _coarse_n_parts()

    def with_part(t: pa.Table) -> pa.Table:
        part = _coarse_parts(
            t["gram"].to_numpy(zero_copy_only=False).view(np.uint64), n_parts=n_parts
        )
        return t.append_column("bucket_part", pa.array(part, pa.int64()))

    def sum_topc(t: pa.Table) -> pa.Table:
        """Vectorized per-partition count merge + top-C (each gram is
        fully co-located, so per-partition top-C contains the global
        top-C); one call handles thousands of grams (coarse-partition
        idiom, not one UDF call per gram)."""
        empty = pa.table(
            {"gram": pa.array([], pa.int64()), "df": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        g = t["gram"].to_numpy(zero_copy_only=False)
        d = t["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, d = g[order], d[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(g[1:] != g[:-1]) + 1]
        ).astype(np.int64)
        sums = np.add.reduceat(d, bounds)
        u = g[bounds]
        if len(u) > top_c:
            idx = np.argpartition(sums, len(sums) - top_c)[-top_c:]
            u, sums = u[idx], sums[idx]
        return pa.table({"gram": pa.array(u), "df": pa.array(sums)})

    partials = docs.map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    driver_max = int(
        _os.environ.get("LAKETIDE_DF_DRIVER_MERGE_MAX_ROWS", str(4 << 20))
    )
    if partials.count() <= driver_max:
        blocks = _gather_nonempty_blocks(partials)
        if not blocks:
            return pa.table(
                {"gram": pa.array([], pa.int64()), "df": pa.array([], pa.int64())}
            )
        parts = [sum_topc(pa.concat_tables(blocks, promote_options="default"))]
    else:
        counts = (
            partials.map_batches(with_part, batch_format="pyarrow")
            .groupby("bucket_part")
            .map_groups(
                lambda g: sum_topc(g.drop_columns(["bucket_part"])),
                batch_format="pyarrow",
            )
        )
        parts = _gather_nonempty_blocks(counts)
    if not parts:
        return pa.table(
            {"gram": pa.array([], pa.int64()), "df": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(parts, promote_options="default").combine_chunks()
    if merged.num_rows > top_c:
        df = merged["df"].to_numpy(zero_copy_only=False)
        idx = np.argpartition(df, len(df) - top_c)[-top_c:]
        merged = merged.take(np.sort(idx))
    # sorted by gram for searchsorted lookups in the map tasks
    g = merged["gram"].to_numpy(zero_copy_only=False).view(np.uint64)
    o = np.argsort(g)
    return merged.take(o)


def _prefix_rows(t: pa.Table, thr: float, top_df: pa.Table | None = None) -> pa.Table:
    """Prefix-filter emission (AllPairs/PPJoin, Bayardo et al. 2007 /
    Xiao et al. 2008, public algorithms): per doc, the sorted-unique
    trigram-hash set of size s contributes only its FIRST
    ``p = s - ceil(thr*s) + 1`` grams under a fixed global total order.
    Two docs with Jaccard >= thr MUST share a gram inside both prefixes
    (if all common grams sat outside A's prefix, |A∩B| <= ceil(thr*|A|)-1
    < thr*|A| <= |A∩B| — contradiction), so pairing docs per shared
    prefix gram is COMPLETE — exact similarity join, no LSH recall loss.

    The total order is ascending (df, hash) where df is the gram's
    global document frequency per the broadcast ``top_df`` table
    (grams outside the bounded top-C common set count as df=0): prefixes
    hold the RAREST grams, so two docs sharing only common trigrams
    almost never become a candidate pair — the classical frequency
    ordering refinement, worth ~3 orders of magnitude of candidate
    selectivity on repetitive corpora (measured 428k -> ~1k candidates
    for 256 true pairs at sf0.1). ANY fixed global order is complete;
    frequency order only prunes. With ``top_df=None`` the order
    degrades to pure hash (single-pass mode).

    Emission is ASYMMETRIC (the full All-Pairs scheme): every doc emits
    ALL its grams, flagged ``in_prefix`` for the first-p ones. Candidates
    pair a PROBE doc (any gram) with an INDEX doc (prefix gram), so the
    per-pair multiplicity m(A,B) = |A ∩ prefix(B)| is countable
    downstream and the overlap lower bound
    ``m >= thr/(1+thr)*(|A|+|B|) - ceil(thr*|B|) + 1`` (Jaccard>=thr
    forces |A∩B| >= thr/(1+thr)*(|A|+|B|), and at most ceil(thr*|B|)-1
    common grams sit outside B's prefix) prunes chance collisions that a
    shared-one-gram rule keeps — decisive on small-vocabulary corpora
    where every gram bucket is populated (measured 310k -> ~1k
    candidates for 256 true pairs at sf0.1).

    Fully vectorized: one lexsort groups-and-sorts grams per doc, a
    shift-compare mask dedups, bincount gives set sizes, and a rank <
    prefix-length mask flags the prefix rows. Emits
    ``(gram, doc_id, set_size, in_prefix)``; zero-gram docs emit nothing
    (an empty set can never reach a positive threshold)."""
    grams, g_counts = _gram_hashes(t["text"])
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(g_counts)
    out_empty = pa.table(
        {
            "gram": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "set_size": pa.array([], pa.int64()),
            "in_prefix": pa.array([], pa.int64()),
        }
    )
    if len(grams) == 0 or n == 0:
        return out_empty
    if top_df is not None and top_df.num_rows:
        tg = top_df["gram"].to_numpy(zero_copy_only=False).view(np.uint64)
        tdf = top_df["df"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(tg, grams)
        pos[pos >= len(tg)] = 0
        dfk = np.where(tg[pos] == grams, tdf[pos], 0).astype(np.int64)
    else:
        dfk = np.zeros(len(grams), dtype=np.int64)
    # per-doc order: df (rare first), then hash
    g2, d2 = _doc_sorted_unique_grams(grams, g_counts, secondary=dfk)
    s = np.bincount(d2, minlength=n).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(s)[:-1]]).astype(np.int64)
    rank = np.arange(len(g2), dtype=np.int64) - offs[d2]
    # -1e-9: float dust must only ever SHRINK the ceil (longer prefix =
    # more candidates = still complete; a too-short prefix loses pairs)
    p = s - np.ceil(thr * s - 1e-9).astype(np.int64) + 1
    in_prefix = (rank < p[d2]).astype(np.int64)
    return pa.table(
        {
            "gram": pa.array(g2.view(np.int64)),
            "doc_id": pa.array(doc_ids[d2]),
            "set_size": pa.array(s[d2]),
            "in_prefix": pa.array(in_prefix),
        }
    )


def _probe_index_bucket_rows(t: pa.Table, thr: float) -> pa.Table:
    """Per gram bucket, emit one row per (probe doc, index doc) pair —
    probe = any member, index = members whose ``in_prefix`` flag is set —
    canonicalized as (lo, hi, dir, s_lo, s_hi) where dir=1 means the
    INDEX side was hi. Row multiplicity across gram buckets is exactly
    m = |probe ∩ prefix(index)| (each doc emits each gram once), which
    the downstream count filter thresholds. Length filter applied here:
    Jaccard >= thr forces thr*max(|A|,|B|) <= |A∩B| <= min(|A|,|B|);
    it is a pure per-pair predicate, so it drops ALL or NONE of a pair's
    occurrences and cannot skew the counts. A gram bucket larger than
    the cap (when set) is dropped whole — stop-word semantics, logged,
    exactness lost for that gram only."""
    cols = ["lo", "hi", "dir", "s_lo", "s_hi"]
    if t.num_rows == 0:
        return _int64_table([], cols)
    out: list[np.ndarray] = []
    for ids, sizes, flags in _iter_buckets(
        t, ["gram"], ["doc_id", "set_size", "in_prefix"]
    ):
        n = len(ids)
        if _NGRAM_JOIN_MAX_BUCKET and n > _NGRAM_JOIN_MAX_BUCKET:
            logger.warning(
                "ngram-join hot gram bucket: %d members > cap %d; "
                "dropping the gram (stop-word) — the pair listing is NO "
                "LONGER guaranteed exact",
                n,
                _NGRAM_JOIN_MAX_BUCKET,
            )
            continue
        idx = np.flatnonzero(flags == 1)
        if len(idx) == 0 or n < 2:
            continue
        i_ids = np.repeat(ids[idx], n)
        i_sz = np.repeat(sizes[idx], n)
        p_ids = np.tile(ids, len(idx))
        p_sz = np.tile(sizes, len(idx))
        ok = i_ids != p_ids
        sa, sb = i_sz.astype(np.float64), p_sz.astype(np.float64)
        ok &= np.minimum(sa, sb) >= thr * np.maximum(sa, sb) - 1e-9
        if not ok.any():
            continue
        i_ids, i_sz, p_ids, p_sz = i_ids[ok], i_sz[ok], p_ids[ok], p_sz[ok]
        swap = i_ids > p_ids  # dir=1: index side is hi
        lo = np.where(swap, p_ids, i_ids)
        hi = np.where(swap, i_ids, p_ids)
        s_lo = np.where(swap, p_sz, i_sz)
        s_hi = np.where(swap, i_sz, p_sz)
        out.append(
            np.stack([lo, hi, swap.astype(np.int64), s_lo, s_hi], axis=1)
        )
    # NOTE: no np.unique dedup here — multiplicity IS the signal; stack
    # without the _int64_table unique
    if not out:
        return _int64_table([], cols)
    m = np.concatenate(out).astype(np.int64)
    return pa.table({c: pa.array(m[:, i]) for i, c in enumerate(cols)})


def _count_filter_pairs(t: pa.Table, thr: float) -> pa.Table:
    """Aggregate per-pair directional multiplicities for every
    co-located (lo, hi) group in one lexsort pass and keep pairs meeting
    the overlap lower bound in BOTH directions (a qualifying pair
    satisfies each, so requiring both is still complete — and strictly
    sharper than either alone):

      m_dir >= thr/(1+thr)*(s_lo+s_hi) - ceil(thr*s_index) + 1

    (dust subtracted so float error only ever RELAXES the bound)."""
    cols = ["doc_a", "doc_b"]
    if t.num_rows == 0:
        return _int64_table([], cols)
    lo = t["lo"].to_numpy(zero_copy_only=False)
    hi = t["hi"].to_numpy(zero_copy_only=False)
    dr = t["dir"].to_numpy(zero_copy_only=False)
    s_lo = t["s_lo"].to_numpy(zero_copy_only=False)
    s_hi = t["s_hi"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dr, hi, lo))
    lo, hi, dr, s_lo, s_hi = (
        lo[order], hi[order], dr[order], s_lo[order], s_hi[order]
    )
    change = np.zeros(max(len(lo) - 1, 0), dtype=bool)
    change |= lo[1:] != lo[:-1]
    change |= hi[1:] != hi[:-1]
    bounds = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
    seg_len = np.diff(np.concatenate([bounds, [len(lo)]]))
    m1 = np.add.reduceat(dr, bounds)
    m0 = seg_len - m1
    plo, phi = lo[bounds], hi[bounds]
    pslo = s_lo[bounds].astype(np.float64)
    pshi = s_hi[bounds].astype(np.float64)
    alpha = thr / (1.0 + thr) * (pslo + pshi)
    b0 = alpha - np.ceil(thr * pslo - 1e-9) + 1 - 1e-9  # index side = lo
    b1 = alpha - np.ceil(thr * pshi - 1e-9) + 1 - 1e-9  # index side = hi
    keep = (m0 >= np.maximum(1, b0)) & (m1 >= np.maximum(1, b1))
    if not keep.any():
        return _int64_table([], cols)
    return pa.table(
        {"doc_a": pa.array(plo[keep]), "doc_b": pa.array(phi[keep])}
    )


def ngram_jaccard_join(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """EXACT n-gram Jaccard similarity self-join over ``documents`` —
    every pair with word-trigram-set Jaccard >= ``threshold``, plus the
    similarity. Unlike the MinHash/SimHash paths this is complete (no
    probabilistic recall): prefix filtering (``_prefix_rows``) bounds the
    candidate set without dropping any qualifying pair, and every
    candidate is exact-verified.

    Reference analog: the duplicate-detection merge step
    (/root/reference/internal/merger/merger.go — match-then-merge over
    candidate records), generalized to set-similarity self-join.

    Shuffle shape (100 TB lens): the exchanged rows are (gram, doc_id,
    set_size, in_prefix) quads — ~32 bytes x gram volume, a small
    fraction of corpus bytes and independent of content size — keyed on
    a COARSE partition (hash mod ~4xCPUs, one vectorized multi-bucket
    UDF call per partition), then a tiny-row per-pair count exchange
    whose volume is Σ_gram probe_df x index_df (frequency ordering keeps
    index_df near zero for common grams), then the shared
    broadcast-or-join exact verify (content never leaves the map tasks,
    nothing content-sized on the driver). Plus the vocabulary-sized
    frequency pre-pass (``_gram_df_top``)."""
    import ray

    thr = float(threshold)
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    n_parts = _coarse_n_parts()
    # frequency pre-pass -> bounded common-gram table, broadcast ONCE
    # via ray.put and read from the local object store in every map task
    top_ref = ray.put(_gram_df_top(docs))

    def emit(t: pa.Table) -> pa.Table:
        out = _prefix_rows(t, thr, ray.get(top_ref))
        part = _coarse_parts(
            out["gram"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        return out.append_column("bucket_part", pa.array(part, pa.int64()))

    gram_rows = docs.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    pair_rows = gram_rows.groupby("bucket_part").map_groups(
        lambda g: _probe_index_bucket_rows(g.drop_columns(["bucket_part"]), thr),
        batch_format="pyarrow",
    )

    def pair_with_part(t: pa.Table) -> pa.Table:
        part = _coarse_parts(
            t["lo"].to_numpy(zero_copy_only=False).view(np.uint64),
            t["hi"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        return t.append_column("pair_part", pa.array(part, pa.int64()))

    cands = (
        pair_rows.map_batches(pair_with_part, batch_format="pyarrow")
        .groupby("pair_part")
        .map_groups(
            lambda g: _count_filter_pairs(g.drop_columns(["pair_part"]), thr),
            batch_format="pyarrow",
        )
    )
    return _verify_pairs_exact(cands.materialize(), sf_dir, thr)


class SimHasher:
    """64-bit SimHash over token hashes; bands 4x16 bits for bucketing.
    Fully vectorized: token siphashes -> ±1 bit matrix -> per-doc
    reduceat sums -> packed uint64."""

    def __init__(self):
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash_batch(self, texts) -> np.ndarray:
        h, lengths = _token_hashes(texts)
        n_docs = len(lengths)
        out = np.zeros(n_docs, dtype=np.uint64)
        if len(h) == 0:
            return out
        offs_all = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        # chunk on doc boundaries: the (tokens x 64) ±1 matrix is 128 B
        # per token, so bound it at ~8 MB instead of one huge intermediate
        chunk_tokens = 65_536
        d0 = 0
        while d0 < n_docs:
            d1 = d0
            while d1 < n_docs and offs_all[d1 + 1] - offs_all[d0] <= chunk_tokens:
                d1 += 1
            d1 = max(d1, d0 + 1)
            lo, hi = offs_all[d0], offs_all[d1]
            if hi > lo:
                sub = h[lo:hi]
                # int32: a reduceat sum over one huge doc must not wrap
                bits = ((sub[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(
                    np.int32
                )
                signed = 2 * bits - 1  # (chunk_tokens, 64) of ±1
                counts = lengths[d0:d1]
                nz = counts > 0
                offs = (offs_all[d0:d1] - lo)[nz]
                if offs.size:
                    sums = np.add.reduceat(signed, offs, axis=0)  # (nz, 64)
                    packed = ((sums > 0).astype(np.uint64) << self.bit_idx[None, :]).sum(
                        axis=1, dtype=np.uint64
                    )
                    out[np.arange(d0, d1)[nz]] = packed
            d0 = d1
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = self.simhash_batch(t["text"])
        n = t.num_rows
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        band_val = ((hs[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, 4)),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
                "band_val": pa.array(band_val.reshape(-1)),
                "simhash": pa.array(np.repeat(hs, 4)),
            }
        )


def _simhash_index_dir(sf_dir: str) -> str:
    """Persisted SimHash signature artifact location (shared keying
    policy: ``artifacts.fingerprint_dir``; salt = the signature-shaping
    constants)."""
    import os

    from laketide.functions.artifacts import fingerprint_dir

    return fingerprint_dir(
        "simhash", "sh", os.path.join(sf_dir, "documents.parquet"), "sim64b4x16"
    )


def simhash_signature_build(sf_dir: str, index_dir: str | None = None) -> str:
    """Build (or reuse) the persisted SimHash signature artifact —
    (doc_id, band, band_val, simhash, bucket_part) parquet rows plus an
    INDEX.json manifest, published atomically (staging dir -> one
    ``os.replace``; the minhash artifact discipline). The token-hash +
    bit-vote pass over the raw text dominates every simhash query; the
    persisted rows are fixed-width and corpus-row-bounded (x4 bands)."""
    from laketide.functions.artifacts import publish_rows_artifact

    return publish_rows_artifact(
        index_dir or _simhash_index_dir(sf_dir),
        lambda: _simhash_rows(sf_dir, from_index=False),
        {"bits": 64, "bands": 4, "bits_per_band": 16, "n_parts": _coarse_n_parts()},
    )


def _simhash_rows(sf_dir: str, from_index: bool) -> "rd.Dataset":
    """Banded (doc_id, band, band_val, simhash, bucket_part) rows —
    computed from the corpus, or read back from the persisted artifact
    (``from_index=True``; builds it on first use). ONE implementation
    feeds both paths, so equal output is structural."""
    if from_index:
        from laketide.functions.artifacts import read_rows_artifact

        return read_rows_artifact(
            simhash_signature_build(sf_dir),
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band", pa.int64()),
                    ("band_val", pa.int64()),
                    ("simhash", pa.uint64()),
                    ("bucket_part", pa.int64()),
                ]
            ),
        )
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    n_parts = _coarse_n_parts()
    hasher = SimHasher()

    def band_with_part(t: pa.Table) -> pa.Table:
        out = hasher(t)
        part = _coarse_parts(
            out["band"].to_numpy(zero_copy_only=False),
            out["band_val"].to_numpy(zero_copy_only=False),
            n_parts=n_parts,
        )
        return out.append_column("bucket_part", pa.array(part, pa.int64()))

    return docs.map_batches(band_with_part, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dedup(
    sf_dir: str, max_hamming: int = 6, from_index: bool = False
) -> rd.Dataset:
    """Near-dup pairs whose 64-bit SimHashes differ by <= max_hamming bits;
    candidates generated by 16-bit band collision (any band equal).
    Hot buckets are capped: all-pairs within the first ``_MAX_BUCKET``
    members plus representative-vs-rest, with the drop logged.
    ``from_index=True`` serves the banded signatures from the persisted
    artifact (built on first use) instead of re-hashing the corpus."""
    n_parts = _coarse_n_parts()
    banded = _simhash_rows(sf_dir, from_index)

    def bucket_pairs(ids: np.ndarray, hs: np.ndarray) -> tuple:
        n = len(ids)
        if n > _MAX_BUCKET:
            head = _MAX_BUCKET
            dropped = n * (n - 1) // 2 - (head * (head - 1) // 2 + (n - head))
            logger.warning(
                "simhash hot bucket: %d members > cap %d; verifying "
                "all-pairs among first %d + rep-vs-rest, dropping %d pairs",
                n, _MAX_BUCKET, head, dropped,
            )
            iu = np.triu_indices(head, k=1)
            ia = np.concatenate([iu[0], np.zeros(n - head, dtype=np.int64)])
            ib = np.concatenate([iu[1], np.arange(head, n, dtype=np.int64)])
        else:
            iu = np.triu_indices(n, k=1)
            ia, ib = iu[0], iu[1]
        xor = hs[ia] ^ hs[ib]
        # vectorized popcount via byte-view + unpackbits
        dist = (
            np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
            if len(xor)
            else np.empty(0, dtype=np.int64)
        )
        keep = dist <= max_hamming
        return ids[ia[keep]], ids[ib[keep]], dist[keep]

    def grouped_pairs(t: pa.Table) -> pa.Table:
        # all (band, band_val) buckets of one coarse partition in one
        # call (shared _iter_buckets core)
        cols = ["doc_a", "doc_b", "hamming"]
        if t.num_rows == 0:
            return _int64_table([], cols)
        acc = []
        for ids, hs in _iter_buckets(t, ["band", "band_val"], ["doc_id", "simhash"]):
            # same doc delivered twice into one bucket: keep the first
            # (simhash is a function of the doc, so duplicates agree)
            u, idx = np.unique(ids.astype(np.int64), return_index=True)
            if len(u) < 2:
                continue
            a, b, d = bucket_pairs(u, hs[idx].astype(np.uint64))
            if len(a):
                acc.append(np.stack([a, b, d], axis=1))
        return _int64_table(acc, cols)

    out = banded.groupby("bucket_part").map_groups(
        lambda g: grouped_pairs(g.drop_columns(["bucket_part"])),
        batch_format="pyarrow",
    )

    def pair_with_part(t: pa.Table) -> pa.Table:
        part = _coarse_parts(
            t["doc_a"].to_numpy(zero_copy_only=False).view(np.uint64),
            t["doc_b"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        return t.append_column("pair_part", pa.array(part, pa.int64()))

    return (
        out.map_batches(pair_with_part, batch_format="pyarrow")
        .groupby("pair_part")
        .map_groups(_dedup_pairs_group, batch_format="pyarrow")
    )


# ------------------------------------------------------- dedup clustering
_COMP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("component", pa.int64())])


def _components_minlabel(et: pa.Table) -> pa.Table:
    """Driver fast path: min-label propagation with pointer jumping over
    a COLLECTED edge table (numpy fixpoint — no Python per-edge loop).
    Used when the edge set fits the driver budget; the distributed
    star-contraction path handles the rest."""
    a = et["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = et["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(label[ea], label[eb])
        new = label.copy()
        np.minimum.at(new, ea, m)
        np.minimum.at(new, eb, m)
        new = new[new]  # pointer jump: labels are node indices
        if np.array_equal(new, label):
            break
        label = new
    while not np.array_equal(label, label[label]):
        label = label[label]
    return pa.table(
        {"doc_id": pa.array(nodes, pa.int64()), "component": pa.array(nodes[label], pa.int64())}
    )


def _star_emit(t: pa.Table, which: str, n_parts: int) -> pa.Table:
    """Map side of a star half-round: orient each undirected edge into
    (center u, neighbor v) rows — both directions for large-star, only
    larger-endpoint centers for small-star — keyed on a coarse hash of
    u so each reduce call handles MANY centers vectorized."""
    a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if which == "large":
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
    else:
        u = np.maximum(a, b)
        v = np.minimum(a, b)
    part = _coarse_parts(u.view(np.uint64), n_parts=n_parts)
    return pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "star_part": pa.array(part, pa.int64()),
        }
    )


def _star_reduce(g: pa.Table, which: str) -> pa.Table:
    """Reduce side of a star half-round (Kiveris et al., "Connected
    Components in MapReduce and Beyond" — public algorithm): per center
    u with neighbor set G(u), m = min(G(u) + {u}); large-star rewires
    every neighbor v > u to m, small-star rewires every v in
    G(u) + {u} except m to m. One lexsort + boundary pass for ALL
    centers in the partition; output edges re-normalized to
    doc_a < doc_b and deduped."""
    if "star_part" in g.column_names:
        g = g.drop_columns(["star_part"])
    if g.num_rows == 0:
        return _int64_table([], ["doc_a", "doc_b"])
    t = g.sort_by([("u", "ascending"), ("v", "ascending")])
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(u)
    newg = np.ones(n, dtype=bool)
    newg[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(newg)
    counts = np.append(starts[1:], n) - starts
    centers = u[starts]
    vmin = v[starts]  # sorted by v within center -> first is min
    m = np.minimum(centers, vmin)
    m_rows = np.repeat(m, counts)
    if which == "large":
        keep = v > u
        lo, hi = m_rows[keep], v[keep]
    else:
        keep = v != m_rows
        lo, hi = m_rows[keep], v[keep]
        # plus the center itself (centers are > their vmin by
        # construction, so u != m always on rows that exist here)
        lo = np.concatenate([lo, m])
        hi = np.concatenate([hi, centers])
    pairs = np.stack([np.minimum(lo, hi), np.maximum(lo, hi)], axis=1)
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    return _int64_table([pairs], ["doc_a", "doc_b"])


def _edges_checksum(edges: rd.Dataset) -> tuple[int, int]:
    """(count, order-independent u64 checksum) of a canonical edge
    Dataset — the distributed convergence test for the star loop (the
    edge multiset is never driver-collected)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        mix = ((a * _BUCKET_MIX) ^ (b * np.uint64(0x9E3779B97F4A7C15))) * _BUCKET_MIX
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                # store the u64 partial as its i64 bit pattern (pa.array
                # would overflow on values >= 2^63)
                "chk": pa.array(
                    [int(np.sum(mix, dtype=np.uint64).astype(np.int64))], pa.int64()
                ),
            }
        )

    rows = edges.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    chk = 0
    for r in rows:
        chk = (chk + int(r["chk"])) & 0xFFFFFFFFFFFFFFFF
    return n, chk


def _components_star(edges: rd.Dataset, max_rounds: int = 64) -> rd.Dataset:
    """Distributed connected components by alternating large-star /
    small-star contractions — O(log n) rounds of coarse-keyed shuffles
    over the EDGE list only (no giant label join per hop); at fixpoint
    every component is a star centered at its min node."""
    n_parts = _coarse_n_parts()

    def half(ds: rd.Dataset, which: str) -> rd.Dataset:
        return (
            ds.map_batches(
                lambda t, w=which: _star_emit(t, w, n_parts),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("star_part")
            .map_groups(
                lambda g, w=which: _star_reduce(g, w), batch_format="pyarrow"
            )
            .materialize()
        )

    prev = _edges_checksum(edges)
    for _ in range(max_rounds):
        edges = half(half(edges, "large"), "small")
        cur = _edges_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("star contraction did not converge")

    def to_mapping(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.concatenate([b, a])  # children -> root, root -> itself
        comp = np.concatenate([a, a])
        part = _coarse_parts(doc.view(np.uint64), n_parts=n_parts)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "component": pa.array(comp, pa.int64()),
                "map_part": pa.array(part, pa.int64()),
            }
        )

    return (
        edges.map_batches(to_mapping, batch_format="pyarrow")
        .groupby("map_part")
        .map_groups(
            lambda g: _dedup_pairs_group(g, part_col="map_part"),
            batch_format="pyarrow",
        )
    )


def dup_components(
    sf_dir: str,
    threshold: float = 0.5,
    driver_budget_rows: int = 2_000_000,
    force_distributed: bool = False,
) -> pa.Table | rd.Dataset:
    """Duplicate-cluster assignment: connected components over the EXACT
    n-gram Jaccard edges (``ngram_jaccard_join``), labeling every doc
    that has at least one near-duplicate with its component id (= min
    doc_id in the cluster) — the step a training-data dedup pipeline
    runs after pair generation to pick one canonical doc per cluster.

    Adaptive like the verify stages: the edge list (O(dup pairs), tiny
    relative to the corpus) is counted first; under the driver budget a
    numpy min-label fixpoint finishes locally, otherwise the
    large-star/small-star contraction runs fully distributed. Both
    paths are equivalence-tested, including multi-hop chain graphs."""
    edges = ngram_jaccard_join(sf_dir, threshold).select_columns(["doc_a", "doc_b"])
    edges = edges.materialize()
    if not force_distributed and edges.count() <= driver_budget_rows:
        import ray

        parts = collect_tables(edges)
        if not parts:
            return _COMP_SCHEMA.empty_table()
        return _components_minlabel(pa.concat_tables(parts))
    return _components_star(edges)


def _collected_components(sf_dir: str, threshold: float) -> pa.Table:
    """``dup_components`` as ONE driver table — the keep-rule selectors
    run on O(near-duplicate docs) rows, and the distributed path's
    output is that same bounded set. Shared by the keep-canonical and
    keep-best removal passes so the collect/empty-fallback cannot
    drift."""
    comp = dup_components(sf_dir, threshold)
    if not isinstance(comp, pa.Table):  # distributed path returned a Dataset
        parts = collect_tables(comp)
        comp = pa.concat_tables(parts) if parts else _COMP_SCHEMA.empty_table()
    return comp


def _keep_minus(sf_dir: str, drop_ids: np.ndarray) -> rd.Dataset:
    """The shared removal tail: one column-pruned corpus scan
    anti-filtering a broadcast SORTED drop-id array (``_sorted_member``
    binary search per batch) — the corpus never shuffles and the drop
    set broadcasts once via ray.put."""
    import ray

    from laketide.functions.relational import _sorted_member

    drop_ref = ray.put(np.sort(np.asarray(drop_ids, dtype=np.int64)))
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang"],
        min_blocks=cpu_min_blocks(),
    )

    def keep(t: pa.Table) -> pa.Table:
        hit, _ = _sorted_member(ray.get(drop_ref), t["doc_id"].combine_chunks())
        return t.filter(pa.array(~hit))

    return docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def dedup_keep_canonical(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """The end-to-end near-dup REMOVAL pass: run pair generation +
    connected components (``dup_components``), keep every document that
    is either untouched or its cluster's canonical (min doc_id) member.
    The drop set is O(near-duplicate docs) — broadcast once via ray.put
    as a sorted id array and anti-filtered inside the map tasks; the
    corpus itself never shuffles.

    Reference analog: the merge step's "withdraw duplicates, keep the
    canonical record" behavior (internal/merger/merger.go:74-133)."""
    comp = _collected_components(sf_dir, threshold)
    drop = comp.filter(pc.not_equal(comp["doc_id"], comp["component"]))
    return _keep_minus(
        sf_dir, drop["doc_id"].to_numpy(zero_copy_only=False)
    )


def dedup_keep_best(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """Near-dup removal keeping the BEST cluster member instead of the
    min-id one: rank members by token count (descending, tie-break min
    doc_id) — the selection rule production dedup pipelines actually use
    (keep the longest / highest-quality near-duplicate, drop the rest).

    Scale shape mirrors ``dedup_keep_canonical``: representative
    selection runs on the O(near-duplicate docs) component table; member
    token counts are gathered in ONE column-pruned corpus scan against a
    broadcast member-id set; the final keep pass anti-filters a
    broadcast drop set. The corpus itself never shuffles and the driver
    holds only cluster-member rows (same budget regime the component
    step already enforces)."""
    import ray

    from laketide.functions.relational import _sorted_member

    comp = _collected_components(sf_dir, threshold)

    if comp.num_rows:
        member_ids = np.sort(comp["doc_id"].to_numpy(zero_copy_only=False))
        mref = ray.put(member_ids)
        tok_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])

        def member_tokens(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64()).combine_chunks()
            hit, _ = _sorted_member(ray.get(mref), ids)
            t = t.filter(pa.array(hit))
            if t.num_rows == 0:
                return tok_schema.empty_table()
            toks = pc.split_pattern(t["text"], " ")
            return pa.table(
                {
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
                }
            )

        tparts = [
            p
            for p in collect_tables(
                scrubbed_read(
                    f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"],
                    min_blocks=cpu_min_blocks(),
                ).map_batches(
                    member_tokens, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            if p.num_rows
        ]
        tok = (
            pa.concat_tables([p.replace_schema_metadata(None) for p in tparts])
            if tparts
            else tok_schema.empty_table()
        )
        # O(dup docs) winner pick: lexsort by (component, -n_tokens,
        # doc_id), first row per component wins, everything else drops
        order = np.argsort(tok["doc_id"].to_numpy(zero_copy_only=False))
        tok_ids = tok["doc_id"].to_numpy(zero_copy_only=False)[order]
        tok_n = tok["n_tokens"].to_numpy(zero_copy_only=False)[order]
        did = comp["doc_id"].to_numpy(zero_copy_only=False)
        cid = comp["component"].to_numpy(zero_copy_only=False)
        ntok = tok_n[np.searchsorted(tok_ids, did)]
        o = np.lexsort((did, -ntok, cid))
        cid_s, did_s = cid[o], did[o]
        is_winner = np.concatenate([[True], cid_s[1:] != cid_s[:-1]])
        drop_ids = did_s[~is_winner]
    else:
        drop_ids = np.array([], np.int64)
    return _keep_minus(sf_dir, drop_ids)


def _edit1_mask(a: list, b: list) -> np.ndarray:
    """Vectorized exact Levenshtein<=1 check for candidate string pairs.
    'U' (unicode) dtype throughout: one cell per CODE POINT, matching
    DuckDB ``levenshtein``'s character unit exactly — and the old
    bytes dtype crashed on any non-ASCII name (numpy's object->'S'
    cast uses the ascii codec). Equal-length pairs: exactly one
    differing position. Length-diff-1 pairs: the longer string with
    its first-mismatch character deleted equals the shorter (one
    padded char matrix, a shifted equality grid and a suffix-AND — no
    per-pair Python)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    aa = np.asarray(a, dtype=str)
    bb = np.asarray(b, dtype=str)
    la = np.char.str_len(aa)
    lb = np.char.str_len(bb)
    # itemsize is 4 bytes per UCS4 code point for 'U' arrays
    w = max(int(aa.dtype.itemsize) // 4, int(bb.dtype.itemsize) // 4, 2)
    A = np.frombuffer(aa.astype(f"U{w}").tobytes(), dtype="U1").reshape(n, w)
    B = np.frombuffer(bb.astype(f"U{w}").tobytes(), dtype="U1").reshape(n, w)
    out = np.zeros(n, dtype=bool)

    same_len = la == lb
    if same_len.any():
        out[same_len] = (A[same_len] != B[same_len]).sum(axis=1) == 1

    diff1 = np.abs(la - lb) == 1
    if diff1.any():
        idx = np.flatnonzero(diff1)
        # orient: L = longer, S = shorter
        swap = lb[idx] > la[idx]
        L = np.where(swap[:, None], B[idx], A[idx])
        S = np.where(swap[:, None], A[idx], B[idx])
        ls = np.minimum(la[idx], lb[idx])
        mism = L != S
        k = np.argmax(mism, axis=1)  # first mismatch (always exists: pads differ)
        # E[:, j] == (L[j+1] == S[j]); positions j >= len(S) vacuously ok
        E = L[:, 1:] == S[:, :-1]
        E |= np.arange(w - 1)[None, :] >= ls[:, None]
        suffix_all = np.flip(
            np.logical_and.accumulate(np.flip(E, axis=1), axis=1), axis=1
        )
        kk = np.minimum(k, w - 2)
        out[idx] = np.where(k >= ls, True, suffix_all[np.arange(len(idx)), kk])
    return out


def fuzzy_name_pairs(sf_dir: str) -> pa.Table:
    """Fuzzy entity matching: all DISTINCT customer-name pairs within
    Levenshtein distance 1 — the blocking + verify shape of a record-
    linkage pipeline (reference analog: the alias/ID reconciliation in
    the merger, internal/merger/merger.go key matching, generalized to
    approximate keys). SymSpell-style deletion neighborhood: every name
    emits itself plus each single-character deletion as a blocking key
    (COMPLETE for distance<=1: an insertion pairs the shorter string
    with the longer's deletion, a substitution pairs the two same-
    position deletions); candidates co-locate via one coarse hashed
    shuffle, pair-generate per sorted segment with a bounded shifted-
    compare loop, dedup with one grouped pass, then the exact
    vectorized <=1 verify drops the distance-2 collisions (shared
    variant at different positions, e.g. 'ab'/'ba')."""
    import ray

    from laketide.functions.relational import _key_hash_u64, _segments

    out_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])
    names = scrubbed_read(
        f"{sf_dir}/customer.parquet", columns=["c_name"], min_blocks=cpu_min_blocks()
    )

    def distinct_pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["c_name"]))
        return t.group_by(["c_name"]).aggregate([])

    from ray.data.aggregate import Count

    vocab = (
        names.map_batches(distinct_pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_name")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["c_name"])
    )

    n_parts = _coarse_n_parts()

    def variants(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_name" not in t.column_names:
            return pa.schema(
                [("part", pa.int64()), ("var", pa.string()), ("name", pa.string())]
            ).empty_table()
        col = t["c_name"].combine_chunks()
        lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        max_len = int(lens.max()) if len(lens) else 0
        outs = [pa.table({"var": col, "name": col})]  # 0-deletion: the name itself
        for i in range(max_len):
            m = pa.array(lens > i)
            sub = col.filter(m)
            var = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, i),
                pc.utf8_slice_codeunits(sub, i + 1, 2**30),
                "",
            )
            outs.append(pa.table({"var": var, "name": sub}))
        v = pa.concat_tables(outs)
        part = _coarse_parts(_key_hash_u64(v["var"].combine_chunks()), n_parts=n_parts)
        return v.add_column(0, "part", pa.array(part, pa.int64()))

    def pair_gen(g: pa.Table) -> pa.Table:
        """Within-segment candidate pairs, batch-deduped, re-keyed on a
        pair hash for the dedup+verify partition. A pair can still
        appear in MULTIPLE parts (its shared variants hash apart), so
        the cross-part dedup happens in verify_part — but via a coarse
        shuffle + one Arrow group_by per partition, not a Ray per-key
        aggregate over ~1M pair groups (which was 6.4s of the query at
        sf0.1)."""
        empty = pa.schema(
            [("part2", pa.int64()), ("name_a", pa.string()), ("name_b", pa.string())]
        ).empty_table()
        if g.num_rows < 2 or "var" not in g.column_names:
            return empty
        g = g.sort_by([("var", "ascending"), ("name", "ascending")])
        var = g["var"].combine_chunks()
        name = g["name"].combine_chunks()
        starts, counts = _segments(var)
        seg_id = np.repeat(np.arange(len(starts)), counts)
        max_c = int(counts.max()) if len(counts) else 0
        names_np = name.to_numpy(zero_copy_only=False)
        outs_a, outs_b = [], []
        for d in range(1, max_c):
            same = seg_id[:-d] == seg_id[d:]
            if same.any():
                outs_a.append(names_np[:-d][same])
                outs_b.append(names_np[d:][same])
        if not outs_a:
            return empty
        t = (
            pa.table(
                {
                    "name_a": pa.array(np.concatenate(outs_a), pa.string()),
                    "name_b": pa.array(np.concatenate(outs_b), pa.string()),
                }
            )
            .group_by(["name_a", "name_b"])
            .aggregate([])
        )
        part2 = _coarse_parts(
            _key_hash_u64(t["name_a"].combine_chunks()),
            _key_hash_u64(t["name_b"].combine_chunks()),
            n_parts=n_parts,
        )
        return t.add_column(0, "part2", pa.array(part2, pa.int64()))

    def verify_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "name_a" not in g.column_names:
            return out_schema.empty_table()
        t = (
            g.drop_columns(["part2"])
            .group_by(["name_a", "name_b"])
            .aggregate([])
        )
        ok = _edit1_mask(t["name_a"].to_pylist(), t["name_b"].to_pylist())
        return t.filter(pa.array(ok)).cast(out_schema)

    parts = collect_tables(
            vocab.map_batches(variants, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("part")
            .map_groups(pair_gen, batch_format="pyarrow")
            .groupby("part2")
            .map_groups(verify_part, batch_format="pyarrow")

        )
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts).sort_by(
        [("name_a", "ascending"), ("name_b", "ascending")]
    )


def _minhash_index_dir(sf_dir: str) -> str:
    """Persisted banded MinHash signature artifact location (shared
    keying policy: ``artifacts.fingerprint_dir``; salt = every constant
    that shapes the signatures — shingling, permutations, seeding — so
    a code change there must miss the cache)."""
    import os

    from laketide.functions.artifacts import fingerprint_dir

    return fingerprint_dir(
        "minhash",
        "mh",
        os.path.join(sf_dir, "documents.parquet"),
        f"b{_BANDS}r{_ROWS_PER_BAND}k{_SHINGLE_K}p{_N_PERM}s12345",
    )


def minhash_signature_build(sf_dir: str, index_dir: str | None = None) -> str:
    """Build (or reuse) the PERSISTED banded-signature artifact:
    (doc_id, band, band_hash, bucket_part) rows as parquet plus an
    INDEX.json manifest, published with the lake's atomic-publish
    discipline (staging dir -> one os.replace). At 100 TB the shingle +
    minhash pass over the raw text is the dominant cost of every LSH
    query; persisting the banded rows turns each subsequent candidate /
    stats / verify call into a scan of the (tiny, fixed-width)
    signature table instead of the corpus."""
    from laketide.functions.artifacts import publish_rows_artifact

    # ONE banding implementation: the artifact persists exactly what the
    # direct path computes, so the equal-output guarantee is structural
    return publish_rows_artifact(
        index_dir or _minhash_index_dir(sf_dir),
        lambda: _banded_rows(sf_dir, from_index=False),
        {
            "bands": _BANDS,
            "rows_per_band": _ROWS_PER_BAND,
            "n_parts": _coarse_n_parts(),
        },
    )


def _banded_rows(sf_dir: str, from_index: bool) -> "rd.Dataset":
    """Banded (doc_id, band, band_hash, bucket_part) rows — computed
    from the corpus, or read back from the persisted signature artifact
    (``from_index=True``; builds it on first use)."""
    if from_index:
        from laketide.functions.artifacts import read_rows_artifact

        return read_rows_artifact(
            minhash_signature_build(sf_dir),
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band", pa.int64()),
                    ("band_hash", pa.int64()),
                    ("bucket_part", pa.int64()),
                ]
            ),
        )
    n_parts = _coarse_n_parts()
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    hasher = MinHasher()

    def band_with_part(t: pa.Table) -> pa.Table:
        out = hasher(t)
        part = _coarse_parts(
            out["band"].to_numpy(zero_copy_only=False),
            out["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        return out.append_column("bucket_part", pa.array(part, pa.int64()))

    return docs.map_batches(
        band_with_part, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Ingest-time incremental near-dup (new arrivals vs the standing corpus)
# ---------------------------------------------------------------------------

# Benchmark arrival slice: doc_id % _ARRIVAL_MOD == 0 rows play the part
# of a newly-arrived ingest batch; the rest is the standing corpus. A
# deterministic slice keeps the operator oracle-checkable on the fixed
# test tables (no external data).
_ARRIVAL_MOD = 20


def _grouped_bucket_pairs_incremental(t: pa.Table) -> pa.Table:
    """Candidate pairs restricted to >=1 NEW member per (band, band_hash)
    bucket: new x corpus (all cross) + new x new (via ``_emit_pairs``,
    cap-disciplined) — never corpus x corpus. The standing corpus is
    already deduped against itself, so re-pairing it is exactly the
    O(bucket^2) cost the incremental path exists to avoid; the emitted
    work is O(|new| x bucket). Hot buckets cap the CORPUS partner list
    at ``_MAX_BUCKET`` (logged), mirroring ``_emit_pairs``."""
    cols = ["doc_a", "doc_b"]
    if t.num_rows == 0:
        return _int64_table([], cols)
    out: list[np.ndarray] = []
    for ids, newf in _iter_buckets(
        t, ["band", "band_hash"], ["doc_id", "is_new"]
    ):
        u, first = np.unique(ids, return_index=True)
        nf = newf[first].astype(bool)
        new_ids = u[nf]
        if len(new_ids) == 0 or len(u) < 2:
            continue
        old_ids = u[~nf]
        if len(old_ids) > _MAX_BUCKET:
            logger.warning(
                "minhash-lsh-incremental hot bucket: %d corpus members > "
                "cap %d; keeping first %d partners per new doc",
                len(old_ids), _MAX_BUCKET, _MAX_BUCKET,
            )
            old_ids = old_ids[:_MAX_BUCKET]
        blocks = []
        if len(old_ids):
            a = np.repeat(new_ids, len(old_ids))
            b = np.tile(old_ids, len(new_ids))
            blocks.append(
                np.stack([np.minimum(a, b), np.maximum(a, b)], axis=1)
            )
        if len(new_ids) >= 2:
            na, nb = _emit_pairs(new_ids, "minhash-lsh-incremental")
            blocks.append(np.stack([na, nb], axis=1))
        out.append(np.concatenate(blocks))
    return _int64_table(out, cols)


_INC_BANDED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("band", pa.int64()),
        ("band_hash", pa.int64()),
        ("bucket_part", pa.int64()),
        ("is_new", pa.int64()),
    ]
)


def minhash_lsh_candidates_incremental(
    sf_dir: str, mod: int = _ARRIVAL_MOD
) -> rd.Dataset:
    """Near-dup CANDIDATES for an ingest batch against the standing
    corpus — without re-shingling the corpus. Docs with
    ``doc_id % mod == 0`` are the newly-arrived slice; the rest is the
    corpus, served from the persisted banded-signature artifact
    (``minhash_signature_build``). The new slice is shingled + banded
    directly (it is batch-sized, not corpus-sized) into the ARTIFACT'S
    ``bucket_part`` scheme (n_parts pinned in INDEX.json — a drifting
    partition count would silently de-co-locate buckets and drop
    pairs); pairs are restricted to >=1 new member. This is the 100 TB
    ingest shape: per arrival batch the corpus cost is one scan of the
    fixed-width signature table, no raw corpus text. After acceptance
    the new rows would be appended to the artifact; the benchmark slice
    keeps the operator deterministic instead."""
    from laketide.functions.artifacts import read_artifact_meta

    idx_dir = minhash_signature_build(sf_dir)
    n_parts = int(
        read_artifact_meta(idx_dir).get("n_parts") or _coarse_n_parts()
    )
    modv = np.int64(mod)

    def corpus_rows(t: pa.Table) -> pa.Table:
        # the artifact covers ALL docs; dropping the arrival slice
        # reconstructs "the corpus before this batch arrived"
        t = t.filter(pc.is_valid(t["doc_id"]))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % modv != 0))
        t = t.append_column(
            "is_new", pa.array(np.zeros(t.num_rows, np.int64))
        )
        return t.select(_INC_BANDED_SCHEMA.names)

    corpus = _banded_rows(sf_dir, from_index=True).map_batches(
        corpus_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    hasher = MinHasher()

    def band_new(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["doc_id"]))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % modv == 0))
        out = hasher(t)
        part = _coarse_parts(
            out["band"].to_numpy(zero_copy_only=False),
            out["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
            n_parts=n_parts,
        )
        out = out.append_column("bucket_part", pa.array(part, pa.int64()))
        out = out.append_column(
            "is_new", pa.array(np.ones(out.num_rows, np.int64))
        )
        return out.select(_INC_BANDED_SCHEMA.names)

    new_banded = docs.map_batches(
        band_new, batch_format="pyarrow", zero_copy_batch=True
    )

    pairs = (
        corpus.union(new_banded)
        .groupby("bucket_part")
        .map_groups(
            lambda g: _grouped_bucket_pairs_incremental(
                g.drop_columns(["bucket_part"])
            ),
            batch_format="pyarrow",
        )
    )
    return _dedup_pair_stream(pairs)


def minhash_dedup_incremental(
    sf_dir: str, threshold: float = 0.7, mod: int = _ARRIVAL_MOD
) -> rd.Dataset:
    """Ingest-time VERIFIED near-dups: the incremental candidate stream
    confirmed with exact n-gram Jaccard (``_verify_pairs_exact``) — the
    pairs an ingest pipeline would act on (reject / canonicalize the
    arrival). Oracle: brute-force trigram Jaccard restricted to pairs
    with >=1 arrival-slice member (the same >=0.7 recall argument as
    ``minhash_dedup_verified``: pairs on this data sit at J >= 0.95
    where banded-LSH recall is 1 - ~4e-12)."""
    return _verify_pairs_exact(
        minhash_lsh_candidates_incremental(sf_dir, mod).materialize(),
        sf_dir,
        threshold,
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
# algorithm): the third near-dup family member next to MinHash and SimHash.
# Guarantee: any shared token run spanning >= w + k - 1 tokens yields at
# least one SHARED selected fingerprint, so long verbatim overlaps cannot
# be missed — unlike MinHash (probabilistic) or SimHash (distance bound).

_WINNOW_K = 4  # tokens per gram
_WINNOW_W = 5  # grams per winnowing window
_WINNOW_SCHEMA = pa.schema([("doc_id", pa.int64()), ("fp", pa.string())])


def _winnow_rows(t: pa.Table, k: int, w: int) -> pa.Table:
    """Distinct (doc_id, fp) winnowed-fingerprint rows for one batch of
    whole documents, fully vectorized: k-gram strings are gathered from
    the flattened token array via a ragged arange (the
    ``_word_trigram_rows`` pattern), and every winnowing window's
    lexicographic min is one numpy reduction over a clamped index
    matrix — no per-doc Python. Selection rule (mirrored verbatim in the
    SQL oracle): docs with < k tokens emit nothing; a doc with G grams
    has max(G - w + 1, 1) windows; window s covers grams s..s+w-1
    clamped to the doc's last gram; the fingerprint is the window's
    MIN GRAM STRING (byte order == DuckDB varchar order on this ASCII
    corpus — a hash would need an identical SQL hash to stay
    oracle-exact; min-gram keeps the winnowing guarantee)."""
    t = t.filter(pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["text"])))
    if t.num_rows == 0:
        return _WINNOW_SCHEMA.empty_table()
    toks = pc.split_pattern(t["text"], " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_np = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).combine_chunks()
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)

    g_n = np.maximum(lens - k + 1, 0)
    tot = int(g_n.sum())
    if tot == 0:
        return _WINNOW_SCHEMA.empty_table()
    goff = np.concatenate([[0], np.cumsum(g_n)[:-1]]).astype(np.int64)
    base = (
        np.arange(tot, dtype=np.int64)
        - np.repeat(goff, g_n)
        + np.repeat(starts, g_n)
    )
    parts = [flat.take(pa.array(base + j)) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    # 'U' (unicode) dtype, NOT bytes: numpy's object->'S' cast encodes
    # with the ascii codec and raises on any non-ASCII document. numpy
    # sorts 'U' in code-point order, which equals UTF-8 byte order
    # (UTF-8 is order-preserving), so the lexicographic-min fingerprint
    # still matches DuckDB's binary varchar min().
    gs = grams.to_numpy(zero_copy_only=False).astype(str)

    n_win = np.where(g_n > 0, np.maximum(g_n - w + 1, 1), 0)
    wtot = int(n_win.sum())
    woff = np.concatenate([[0], np.cumsum(n_win)[:-1]]).astype(np.int64)
    wstart = (
        np.arange(wtot, dtype=np.int64)
        - np.repeat(woff, n_win)
        + np.repeat(goff, n_win)
    )
    doc_last = np.repeat(goff + g_n - 1, n_win)
    idx = np.minimum(
        wstart[:, None] + np.arange(w, dtype=np.int64)[None, :],
        doc_last[:, None],
    )
    # np.minimum has no loop for bytes dtypes — a row-wise np.sort of the
    # w-wide matrix is the vectorized lexicographic min
    fps = np.sort(gs[idx], axis=1)[:, 0]
    out = pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_np, n_win), pa.int64()),
            "fp": pc.cast(pa.array(fps), pa.string()),
        }
    )
    # docs are whole rows, so per-batch distinct IS per-doc distinct
    return out.group_by(["doc_id", "fp"]).aggregate([])


def winnow_fingerprints(
    sf_dir: str, k: int = _WINNOW_K, w: int = _WINNOW_W
) -> rd.Dataset:
    """Per-document winnowing summary: (doc_id, n_grams,
    n_fingerprints, min_fp, max_fp). n_grams counts the gram SEQUENCE
    (not distinct); n_fingerprints is the distinct selected set; the
    extremes pin the set's identity for the exact oracle.

    Scale shape: completely shuffle-free — a document is one row, so
    every doc's fingerprint set is computed and summarized inside its
    own batch. Reference analog: the per-record content fingerprint
    used for change detection (internal/utils/utils.go:21-28), upgraded
    to a positional fingerprint SET so partial overlap is detectable."""
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_grams", pa.int64()),
            ("n_fingerprints", pa.int64()),
            ("min_fp", pa.string()),
            ("max_fp", pa.string()),
        ]
    )

    def summary(t: pa.Table) -> pa.Table:
        rows = _winnow_rows(t, k, w)
        if rows.num_rows == 0:
            return out_schema.empty_table()
        g = rows.group_by(["doc_id"]).aggregate(
            [([], "count_all"), ("fp", "min"), ("fp", "max")]
        )
        # gram counts recomputed from the SAME validity rule
        tt = t.filter(pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["text"])))
        lens = pc.list_value_length(pc.split_pattern(tt["text"], " "))
        g_n = np.maximum(
            lens.to_numpy(zero_copy_only=False).astype(np.int64) - k + 1, 0
        )
        doc_np = tt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = g_n > 0
        gram_tbl = pa.table(
            {
                "doc_id": pa.array(doc_np[keep], pa.int64()),
                "n_grams": pa.array(g_n[keep], pa.int64()),
            }
        )
        idx = pc.index_in(
            g["doc_id"].combine_chunks(), value_set=gram_tbl["doc_id"].combine_chunks()
        )
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "n_grams": gram_tbl["n_grams"].combine_chunks().take(idx),
                "n_fingerprints": pc.cast(g["count_all"], pa.int64()),
                "min_fp": g["fp_min"],
                "max_fp": g["fp_max"],
            }
        )

    return docs.map_batches(summary, batch_format="pyarrow", zero_copy_batch=True)


_WINNOW_ROWS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("fp", pa.string()), ("bucket_part", pa.int64())]
)


def _winnow_index_dir(sf_dir: str) -> str:
    """Persisted winnowed-fingerprint artifact location (shared keying
    policy: ``artifacts.fingerprint_dir``; salt = the k/w selection
    constants)."""
    import os

    from laketide.functions.artifacts import fingerprint_dir

    return fingerprint_dir(
        "winnow",
        "wf",
        os.path.join(sf_dir, "documents.parquet"),
        f"k{_WINNOW_K}w{_WINNOW_W}",
    )


def winnow_index_build(sf_dir: str, index_dir: str | None = None) -> str:
    """Build (or reuse) the persisted winnowed-fingerprint artifact —
    (doc_id, fp, bucket_part) parquet rows plus an INDEX.json manifest,
    published atomically (staging dir -> one ``os.replace``; the
    minhash artifact discipline). The tokenize + gram-gather + window
    min pass over the raw text dominates every winnowing query; the
    persisted rows are O(selected fingerprints), ~1/w of the grams."""
    from laketide.functions.artifacts import publish_rows_artifact

    return publish_rows_artifact(
        index_dir or _winnow_index_dir(sf_dir),
        lambda: _winnow_fp_ds(sf_dir, _WINNOW_K, _WINNOW_W),
        {"k": _WINNOW_K, "w": _WINNOW_W, "n_parts": _coarse_n_parts()},
    )


def _winnow_fp_ds(sf_dir: str, k: int, w: int) -> rd.Dataset:
    """Partitioned (doc_id, fp, bucket_part) fingerprint rows computed
    from the corpus — the one implementation behind both the direct and
    the artifact-served paths, so equal output is structural."""
    from laketide.functions.relational import _key_hash_u64

    n_parts = _coarse_n_parts()
    docs = scrubbed_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        min_blocks=cpu_min_blocks(),
    )

    def fp_rows(t: pa.Table) -> pa.Table:
        rows = _winnow_rows(t, k, w)
        part = _coarse_parts(_key_hash_u64(rows["fp"]), n_parts=n_parts)
        return rows.append_column("bucket_part", pa.array(part, pa.int64()))

    return docs.map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True)


def winnow_match_pairs(
    sf_dir: str,
    k: int = _WINNOW_K,
    w: int = _WINNOW_W,
    max_df: int = 50,
    min_shared: int = 2,
    from_index: bool = False,
) -> rd.Dataset:
    """MOSS-style match detection: document pairs sharing >= min_shared
    winnowed fingerprints, counting only DISCRIMINATIVE fingerprints
    (shared by 2..max_df docs — the MOSS move of ignoring fingerprints
    common to many documents, which on this corpus are the planted
    boilerplate segments). Returns (doc_a, doc_b, n_shared).

    Scale shape: one coarse shuffle of the (doc_id, fp) rows keyed on a
    fp-hash partition (every holder of a fingerprint co-locates, so the
    per-fp doc list is exact within its partition), pair emission
    bounded by max_df^2 per fingerprint, then a small pair-keyed coarse
    reduce summing shared counts; the >= min_shared gate runs AFTER the
    sum so partials can never drop a qualifying pair.

    ``from_index=True`` serves the fingerprint rows from the persisted
    artifact (built on first use) instead of re-tokenizing the corpus —
    only valid at the artifact's baked k/w constants."""
    from laketide.functions.relational import _coarse_key_reduce

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_shared", pa.int64())]
    )
    if from_index:
        if (k, w) != (_WINNOW_K, _WINNOW_W):
            raise ValueError(
                "from_index=True serves the persisted artifact, which is "
                f"baked at k={_WINNOW_K}, w={_WINNOW_W}"
            )
        from laketide.functions.artifacts import read_rows_artifact

        rows = read_rows_artifact(winnow_index_build(sf_dir), _WINNOW_ROWS_SCHEMA)
    else:
        rows = _winnow_fp_ds(sf_dir, k, w)

    def per_part(t: pa.Table) -> pa.Table:
        # one co-located partition = many whole fp groups: sort by fp,
        # keep groups sized 2..max_df, emit all within-group pairs via
        # a repeat/arange gather — no per-fp Python loop
        if t.num_rows == 0 or "fp" not in t.column_names:
            return pair_schema.empty_table()
        order = pc.sort_indices(
            t, sort_keys=[("fp", "ascending"), ("doc_id", "ascending")]
        )
        fp = t["fp"].take(order).combine_chunks()
        ids = t["doc_id"].take(order).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        diff = pc.not_equal(fp.slice(1, n - 1), fp.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        bnd = np.flatnonzero(np.concatenate([[True], diff]))
        sizes = np.diff(np.concatenate([bnd, [n]]))
        ok = (sizes >= 2) & (sizes <= max_df)
        if not ok.any():
            return pair_schema.empty_table()
        gstart = bnd[ok].astype(np.int64)
        gsize = sizes[ok].astype(np.int64)
        # gather the kept groups' members contiguously, then emit every
        # (i, j<i..s-1) pair with two ragged aranges — ids are sorted
        # ascending within a group, so doc_a < doc_b by construction
        sel_tot = int(gsize.sum())
        soff = np.concatenate([[0], np.cumsum(gsize)[:-1]]).astype(np.int64)
        member = (
            np.arange(sel_tot, dtype=np.int64)
            - np.repeat(soff, gsize)
            + np.repeat(gstart, gsize)
        )
        rank = np.arange(sel_tot, dtype=np.int64) - np.repeat(soff, gsize)
        c = np.repeat(gsize, gsize) - 1 - rank  # pairs led by each element
        tot = int(c.sum())
        if tot == 0:
            return pair_schema.empty_table()
        coff = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
        left = np.repeat(np.arange(sel_tot, dtype=np.int64), c)
        right = left + (np.arange(tot, dtype=np.int64) - np.repeat(coff, c)) + 1
        pairs = pa.table(
            {
                "doc_a": pa.array(ids[member[left]], pa.int64()),
                "doc_b": pa.array(ids[member[right]], pa.int64()),
            }
        )
        g = pairs.group_by(["doc_a", "doc_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_a": pc.cast(g["doc_a"], pa.int64()),
                "doc_b": pc.cast(g["doc_b"], pa.int64()),
                "n_shared": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = rows.groupby("bucket_part").map_groups(
        lambda g: per_part(g.drop_columns(["bucket_part"])), batch_format="pyarrow"
    )

    def fold(t: pa.Table) -> pa.Table:
        # associative sum only — the >= min_shared gate runs after
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return pair_schema.empty_table()
        g = t.group_by(["doc_a", "doc_b"]).aggregate([("n_shared", "sum")])
        return pa.table(
            {
                "doc_a": pc.cast(g["doc_a"], pa.int64()),
                "doc_b": pc.cast(g["doc_b"], pa.int64()),
                "n_shared": pc.cast(g["n_shared_sum"], pa.int64()),
            }
        )

    reduced = _coarse_key_reduce(partials, ["doc_a", "doc_b"], fold)
    return reduced.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_shared"], min_shared)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
