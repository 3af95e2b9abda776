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


def scrubbed_read(path: str, columns: list[str] | None = None) -> rd.Dataset:
    full = pq.read_schema(path).remove_metadata()
    schema = (
        pa.schema([full.field(c) for c in columns]) if columns is not None else full
    )
    return rd.read_parquet(path, schema=schema, columns=columns)
