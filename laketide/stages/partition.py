"""Key-hash partitioning for the lake table.

Partition id = ``stable_hash(repo + "\\0" + path) % P``. The hash is over
the FULL key, so a hot repo's files spread across partitions naturally
("salting" that can never split one ``(repo, path)`` key — splitting a key
would break per-key LWW ordering; SURVEY.md §7.4 risk 4). P is fixed per
table generation so event partition i always co-locates with snapshot
partition i (co-partitioning, SURVEY.md §7.4 risk 5).

Reference analog: the deterministic key that routes every record of the
same identity to the same row/upsert target
(/root/reference/internal/utils/id_generator.go:67-78).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["key_hash", "assign_partitions"]

DEFAULT_NUM_PARTITIONS = 32


def key_hash(repo: pa.ChunkedArray | pa.Array, path: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized stable uint64 hash of the (repo, path) key.

    Uses pandas' siphash-based ``hash_pandas_object`` (C-vectorized,
    process-independent, fixed key) over ``repo || '\\0' || path``. Nulls
    hash like empty strings (malformed rows are flagged separately and
    dropped before apply).
    """
    joined = pc.binary_join_element_wise(
        pc.fill_null(repo, ""), pc.fill_null(path, ""), "\x00"
    )
    s = joined.to_pandas()
    # categorize=False is REQUIRED: the categorize fast path hashes the
    # dictionary codes' positions, giving different hashes for the same
    # value in different series — which would scatter one key across
    # partitions and silently break per-key LWW.
    return pd.util.hash_pandas_object(s, index=False, categorize=False).to_numpy()


def assign_partitions(batch: pa.Table, num_partitions: int) -> pa.Array:
    h = key_hash(batch["repo"], batch["path"])
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64), pa.int64())
