"""Shared table-read helper for the query layer.

pandas-written parquet carries dict-valued schema metadata that Ray's
shuffle/join planners cannot hash ("Failed to hash the schemas (for
deduplication)" log storms, and schema-dedup silently disabled). Scrub
the metadata at the read — the scrub map fuses with the parquet read
task, so it costs nothing — and every downstream op sees a clean,
hashable schema.
"""

from __future__ import annotations

import ray.data as rd


def scrubbed_read(path: str, columns: list[str] | None = None) -> rd.Dataset:
    ds = rd.read_parquet(path, columns=columns)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
