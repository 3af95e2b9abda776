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
# merge='priority' reduce markers: one `_prio_r_<field>` int64 per scalar
# payload fold column = the rank of the source that supplied that field's
# winning value this epoch (write-side only, never persisted).
PRIO_RANK_PREFIX = "_prio_r_"
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
    return {
        f.name: f.type
        for f in schema
        if f.name not in skip and not f.name.startswith(PRIO_RANK_PREFIX)
    }


def _is_listish(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def _wrap_scalar_as_list(col: pa.ChunkedArray, target: pa.DataType) -> pa.ChunkedArray:
    """Promote a SCALAR column to ``list<value>``: each non-null value
    becomes a single-element list, nulls stay null. The Arrow analog of
    the reference's FlexibleStringArray scalar-or-list YAML decode
    (/root/reference/internal/types/types.go:247-271). Vectorized:
    offsets from a cumulative validity sum; a null offset marks a null
    list."""
    import numpy as np
    import pyarrow.compute as pc

    chunks = []
    for chunk in (col.chunks if isinstance(col, pa.ChunkedArray) else [col]):
        valid = pc.is_valid(chunk).to_numpy(zero_copy_only=False)
        values = chunk.filter(pa.array(valid))
        if values.type != target.value_type:
            values = values.cast(target.value_type)
        offs = np.zeros(len(chunk) + 1, dtype=np.int32)
        np.cumsum(valid, out=offs[1:])
        # a null at offsets[i] marks ELEMENT i null (Arrow convention);
        # offs[:n] is the prefix-sum start of each element — built
        # vectorized via the numpy mask path
        mask = np.concatenate([~valid, [False]])
        off_arr = pa.array(offs, pa.int32(), mask=mask)
        chunks.append(pa.ListArray.from_arrays(off_arr, values).cast(target))
    return pa.chunked_array(chunks, target)


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` to ``schema``: add missing columns as nulls, cast
    mismatched types (wrapping scalars as single-element lists when the
    target is a list type), order columns. The Arrow analog of the
    reference's relaxing migration (summary -> nullable)."""
    cols = []
    n = table.num_rows
    names = set(table.column_names)
    for field in schema:
        if field.name in names:
            col = table.column(field.name)
            if col.type != field.type:
                if (
                    _is_listish(field.type)
                    and not _is_listish(col.type)
                    and not pa.types.is_null(col.type)
                ):
                    col = _wrap_scalar_as_list(col, field.type)
                else:
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
    epoch's real values would fail conform()'s cast mid-replay.

    Scalar vs ``list<T>`` collisions promote to the LIST side (the
    reference's FlexibleStringArray scalar-or-list rule,
    /root/reference/internal/types/types.go:247-271); conform() then
    wraps scalars as single-element lists."""
    try:
        return pa.unify_schemas([a, b], promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        # field-wise: list-vs-scalar promotes to list of the promoted
        # value type; anything still incompatible (e.g. string vs
        # struct) keeps the first-seen type and conform() surfaces the
        # cast error with the offending column name
        b_by_name = {f.name: f for f in b}
        fields = []
        for f in a:
            other = b_by_name.get(f.name)
            fields.append(
                f if other is None else pa.field(f.name, _promote_pair(f.type, other.type))
            )
        seen = {f.name for f in a}
        for f in b:
            if f.name not in seen:
                fields.append(f)
        return pa.schema(fields)


def _promote_pair(ta: pa.DataType, tb: pa.DataType) -> pa.DataType:
    """Promote two colliding field types; list-vs-scalar widens to
    ``list<promoted value type>``. Falls back to the first-seen type."""
    if ta.equals(tb):
        return ta
    if _is_listish(ta) or _is_listish(tb):
        va = ta.value_type if _is_listish(ta) else ta
        vb = tb.value_type if _is_listish(tb) else tb
        inner = _promote_pair(va, vb)
        # preserve 64-bit offsets: collapsing large_list to list would
        # overflow int32 offsets on >2GB chunks at conform()'s cast
        if pa.types.is_large_list(ta) or pa.types.is_large_list(tb):
            return pa.large_list(inner)
        return pa.list_(inner)
    try:
        return pa.unify_schemas(
            [pa.schema([("x", ta)]), pa.schema([("x", tb)])],
            promote_options="permissive",
        ).field("x").type
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        return ta
