"""Arrow schemas + unification for the laketide CDC engine.

Reference analogs (cited for parity, not ported):
- canonical record shape: /root/reference/internal/types/types.go:10-28
- additive / relaxing schema evolution (nullable summary migration):
  /root/reference/migrations/002_fix_nullable_summary.up.sql:1-6
  -> generalized here to Arrow schema unification when a new payload
  column (e.g. ``lang``) appears mid-stream.
"""

from __future__ import annotations

import pyarrow as pa

# Core identity / version columns of every change event.
# Key = (repo, path); version order = (commit, seq) lexicographic on the
# zero-padded commit string, then seq (reference analog: deterministic
# VULN ID keying + source-priority ordering,
# /root/reference/internal/utils/id_generator.go:67-78,
# /root/reference/internal/merger/merger.go:24-29).
KEY_COLUMNS = ("repo", "path")
VERSION_COLUMNS = ("commit", "seq")
OP_COLUMN = "op"
CORE_COLUMNS = KEY_COLUMNS + VERSION_COLUMNS + (OP_COLUMN,)

SHA_COLUMN = "content_sha256"
APPLIED_EPOCH_COLUMN = "applied_epoch"
# Tombstone retention marker: deleted keys stay in the partition as
# flagged rows (filtered from every read surface) so a late-arriving
# OLDER event can never resurrect a deleted key, even under fully
# arbitrary cross-epoch delivery. Purged only by explicit maintenance
# (purge_tombstones) — the Hudi/Delta tombstone-retention analog of the
# reference's hard DELETE (sql/vulnerabilities.sql:101-102).
DELETED_COLUMN = "deleted"

# Internal helper columns added by the normalize stage.
PART_COLUMN = "_part"
MALFORMED_COLUMN = "_malformed"
# merge='coalesce' reduce marker: the winner's key history contained a
# tombstone this epoch, so it REPLACES the stored row instead of
# field-merging with it (write-side only, never persisted).
RESET_COLUMN = "_reset"
HELPER_COLUMNS = (PART_COLUMN, MALFORMED_COLUMN, RESET_COLUMN)

VALID_OPS = ("insert", "update", "delete")
DEFAULT_OP = "update"  # reference upsert semantics: missing op == upsert

CORE_TYPES: dict[str, pa.DataType] = {
    "repo": pa.string(),
    "path": pa.string(),
    "commit": pa.string(),
    "seq": pa.int64(),
    "op": pa.string(),
}


def event_schema(payload_columns: dict[str, pa.DataType] | None = None) -> pa.Schema:
    """Schema of a normalized change event batch."""
    payload = payload_columns or {"lang": pa.string(), "content": pa.string()}
    fields = [pa.field(c, CORE_TYPES[c]) for c in CORE_COLUMNS]
    fields += [pa.field(c, t) for c, t in payload.items()]
    fields.append(pa.field(SHA_COLUMN, pa.string()))
    return pa.schema(fields)


def snapshot_schema(payload_columns: dict[str, pa.DataType] | None = None) -> pa.Schema:
    """Schema of a materialized lake-table partition file."""
    payload = payload_columns or {"lang": pa.string(), "content": pa.string()}
    fields = [pa.field(c, CORE_TYPES[c]) for c in KEY_COLUMNS + VERSION_COLUMNS]
    fields += [pa.field(c, t) for c, t in payload.items()]
    fields.append(pa.field(SHA_COLUMN, pa.string()))
    fields.append(pa.field(APPLIED_EPOCH_COLUMN, pa.int64()))
    fields.append(pa.field(DELETED_COLUMN, pa.bool_()))
    return pa.schema(fields)


def payload_columns_of(schema: pa.Schema) -> dict[str, pa.DataType]:
    """Payload = everything that is not core/helper/lineage.

    This is what makes schema evolution *additive by construction*: a new
    column arriving in the event stream is simply a new payload column.
    """
    skip = set(CORE_COLUMNS) | set(HELPER_COLUMNS) | {SHA_COLUMN, APPLIED_EPOCH_COLUMN, DELETED_COLUMN}
    return {f.name: f.type for f in schema if f.name not in skip}


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` to ``schema``: add missing columns as nulls, cast
    mismatched types, order columns. The Arrow analog of the reference's
    relaxing migration (summary -> nullable)."""
    cols = []
    n = table.num_rows
    names = set(table.column_names)
    for field in schema:
        if field.name in names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def unify(a: pa.Schema, b: pa.Schema) -> pa.Schema:
    """Unified schema: fields of ``a`` in order, then new fields of ``b``.

    Colliding field names TYPE-PROMOTE (null -> anything, int -> float,
    ...): a payload column that first appears all-null (inferred
    ``null``) or narrower must not pin its type forever — the next
    epoch's real values would fail conform()'s cast mid-replay."""
    try:
        return pa.unify_schemas([a, b], promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        # genuinely incompatible (e.g. string vs struct): keep the
        # first-seen type; conform() will surface the cast error with
        # the offending column name
        fields = list(a)
        seen = {f.name for f in a}
        for f in b:
            if f.name not in seen:
                fields.append(f)
        return pa.schema(fields)
