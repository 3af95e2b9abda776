"""Near-duplicate detection over ``documents`` — MinHash+LSH, SimHash and
exact-Jaccard verification, built the Ray-Data way:

  shingle -> signature (vectorized map_batches)
    -> explode to (band, band_hash, doc_id)  (flat projection)
    -> groupby(band, band_hash)              (ONE shuffle of tiny rows)
    -> candidate pairs per bucket            (map_groups)
    -> verify (exact Jaccard / hamming)      (broadcast shingle sets)

At 100 TB the banded rows are a few dozen bytes each, so the shuffle is
tiny relative to the corpus; the verify stage broadcasts only candidate
doc shingle-sets. No oracle SQL (non-relational ops) — the driver records
rows-only checks; determinism is guaranteed by fixed hash seeds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows


def _perm_params(n_perm: int = _N_PERM, seed: int = 12345):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles -> stable uint64 hashes (blake2b-derived)."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
        )
    return out


class MinHasher:
    """Actor-pool stage: permutation parameters built once per actor."""

    def __init__(self, n_perm: int = _N_PERM, k: int = 3, seed: int = 12345):
        self.a, self.b = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (a*h + b) mod p, min over shingles — vectorized (n_perm x n_shingles)
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows_band, rows_hash, rows_doc = [], [], []
        rpb = self.n_perm // _BANDS
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text)
            for band in range(_BANDS):
                chunk = sig[band * rpb : (band + 1) * rpb]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                rows_band.append(band)
                rows_hash.append(h)
                rows_doc.append(doc_id)
        return pd.DataFrame({"band": rows_band, "band_hash": rows_hash, "doc_id": rows_doc})


def _pairs_from_bucket(df: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(df["doc_id"].tolist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_lsh_candidates(sf_dir: str) -> rd.Dataset:
    """Candidate near-dup pairs from MinHash-LSH banding (deduped)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    banded = docs.map_batches(MinHasher, batch_format="pandas", concurrency=2)
    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        _pairs_from_bucket, batch_format="pandas"
    )
    # dedup pairs found in multiple bands: keep first per (doc_a, doc_b)
    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])

    return pairs.map_batches(first, batch_format="pandas").groupby(["doc_a", "doc_b"]).map_groups(
        first, batch_format="pandas"
    )


def minhash_dedup_verified(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """LSH candidates verified with exact n-gram Jaccard. The shingle sets
    of candidate docs only are fetched via a broadcast point-lookup
    (semi-join pattern: candidate id set -> filter -> driver dict)."""
    import ray

    cands = minhash_lsh_candidates(sf_dir).to_pandas()
    if len(cands) == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    need = sorted(set(cands["doc_a"]) | set(cands["doc_b"]))
    need_ref = ray.put(pa.array(need, pa.int64()))

    def collect(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        needed = ray.get(need_ref)
        return t.filter(pc.is_in(t["doc_id"], value_set=needed))

    docs = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(collect, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    sets = {int(r.doc_id): set(_shingles(r.text).tolist()) for r in docs.itertuples()}
    out_a, out_b, out_j = [], [], []
    for r in cands.itertuples():
        sa, sb = sets.get(int(r.doc_a), set()), sets.get(int(r.doc_b), set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            out_a.append(int(r.doc_a))
            out_b.append(int(r.doc_b))
            out_j.append(j)
    return pa.table(
        {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())}
    )


class SimHasher:
    """64-bit SimHash over token hashes; bands 4x16 bits for bucketing."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in text.split():
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
            acc += np.where(bits[:64] > 0, 1, -1)
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << i
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        hs = [self.simhash(t) for t in df["text"]]
        rows = {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), 4),
            "band": np.tile(np.arange(4), len(df)),
            "band_val": np.array(
                [(h >> (16 * b)) & 0xFFFF for h in hs for b in range(4)], dtype=np.int64
            ),
            "simhash": np.repeat(np.array(hs, dtype=np.uint64), 4),
        }
        return pd.DataFrame(rows)


def simhash_dedup(sf_dir: str, max_hamming: int = 6) -> rd.Dataset:
    """Near-dup pairs whose 64-bit SimHashes differ by <= max_hamming bits;
    candidates generated by 16-bit band collision (any band equal)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    banded = docs.map_batches(SimHasher, batch_format="pandas", concurrency=2)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = df.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].to_numpy()
        hs = rows["simhash"].to_numpy()
        a, b, d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                dist = bin(int(hs[i]) ^ int(hs[j])).count("1")
                if dist <= max_hamming:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
                    d.append(dist)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": d})

    out = banded.groupby(["band", "band_val"]).map_groups(pairs, batch_format="pandas")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])

    return out.map_batches(dedup, batch_format="pandas").groupby(["doc_a", "doc_b"]).map_groups(
        dedup, batch_format="pandas"
    )
