"""Pluggable source registry — the rebuild of the reference's fetcher
interface (E1/E2):

- every source implements ``New(cfg)`` + ``FetchAll`` in the reference
  (/root/reference/internal/fetchers/{osv,gitlab,cve}/fetcher.go); here a
  ``Source`` = (reader, normalizer) pair registered under a name.
- ``ENABLED_SOURCES`` env-driven selection
  (/root/reference/internal/config/config.go:171-187) maps to
  ``enabled_sources()``.

Three formats ship (the reference also consumes three: OSV JSON, GitLab
YAML, CVE JSON): parquet (native), jsonl, csv. Each reader returns a
``ray.data.Dataset``; each normalizer is a vectorized ``map_batches``
transform projecting the source's shape onto the canonical event schema
(reference normalizers M7-M9,
/root/reference/internal/merger/normalizer.go:28-310). The scalar->list
/ type-promotion coercions of the reference's FlexibleStringArray
(/root/reference/internal/types/types.go:247-271) map to the cast rules
in ``laketide.schema.conform``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from laketide import schema as S

__all__ = ["Source", "register", "get", "enabled_sources", "read_source"]


@dataclass(frozen=True)
class Source:
    name: str
    reader: Callable[[str], "rd.Dataset"]  # path(s) -> Dataset
    normalizer: Callable[[pa.Table], pa.Table] | None = None  # batch projection

    def read(self, path: str) -> "rd.Dataset":
        ds = self.reader(path)
        if self.normalizer is not None:
            ds = ds.map_batches(self.normalizer, batch_format="pyarrow")
        return ds


_REGISTRY: dict[str, Source] = {}


def register(source: Source) -> Source:
    _REGISTRY[source.name] = source
    return source


def get(name: str) -> Source:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown source {name!r}; registered: {sorted(_REGISTRY)}") from None


def enabled_sources() -> list[str]:
    """ENABLED_SOURCES env selection (reference E2); default: all.
    Unknown names raise — a config typo must be a loud startup error,
    not a silently-disabled source."""
    env = os.environ.get("LAKETIDE_ENABLED_SOURCES", "").strip()
    if not env:
        return sorted(_REGISTRY)
    names = [s.strip() for s in env.split(",") if s.strip()]
    unknown = [s for s in names if s not in _REGISTRY]
    if unknown:
        raise ValueError(
            f"LAKETIDE_ENABLED_SOURCES names unknown sources {unknown}; "
            f"registered: {sorted(_REGISTRY)}"
        )
    return names


def read_source(name: str, path: str) -> "rd.Dataset":
    return get(name).read(path)


# --------------------------------------------------------------- normalizers
_CANON = pa.schema(
    [pa.field(c, S.CORE_TYPES[c]) for c in S.CORE_COLUMNS]
    + [pa.field("lang", pa.string()), pa.field("content", pa.string())]
)


def _canonical_normalizer(batch: pa.Table) -> pa.Table:
    """Project a loosely-typed batch onto the canonical event shape:
    add missing columns as nulls, cast (e.g. csv int-as-string seq),
    default op (the upsert rule). EXTRA columns are kept as payload —
    schema evolution is additive by construction, and source-tag list
    columns (``sources``) ride through to the merge."""
    extras = [
        f for f in batch.schema
        if f.name not in set(_CANON.names) and f.name not in S.HELPER_COLUMNS
    ]
    batch = S.conform(batch, pa.schema(list(_CANON) + extras))
    # CSV represents missing as "" (not null): promote both to the
    # default op (the reference's scalar-coercion rule, M4 analog).
    op = pc.fill_null(batch[S.OP_COLUMN], S.DEFAULT_OP)
    op = pc.if_else(pc.equal(op, ""), pa.scalar(S.DEFAULT_OP), op)
    return batch.set_column(batch.column_names.index(S.OP_COLUMN), S.OP_COLUMN, op)


def _read_orc(path: str) -> "rd.Dataset":
    """ORC-file source: one Ray task per file (the warehouse-export
    format the reference's bulk readers never needed, but a lake engine
    meets in the wild). Files list out like the zip expander's members;
    each task decodes its file with pyarrow's ORC reader into Arrow
    batches — no pandas hop. At scale, parallelism = file count, the
    same contract as ``read_zip_jsonl``."""
    import glob as _glob

    files = sorted(
        _glob.glob(os.path.join(path, "*.orc"))
        if os.path.isdir(path)
        else _glob.glob(path)
    )
    if not files:
        raise FileNotFoundError(f"no ORC files at {path!r}")

    def load(t: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc

        return pa.concat_tables(
            [
                _orc.ORCFile(f).read().replace_schema_metadata(None)
                for f in t["file"].to_pylist()
            ]
        )

    return rd.from_items([{"file": f} for f in files]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


register(Source("parquet", lambda p: rd.read_parquet(p), None))
register(Source("jsonl", lambda p: rd.read_json(p), _canonical_normalizer))
register(
    Source(
        "csv",
        lambda p: rd.read_csv(p),
        _canonical_normalizer,
    )
)
register(Source("orc", _read_orc, _canonical_normalizer))


def read_zip_jsonl(zip_path: str, max_member_bytes: int = 100 << 20) -> "rd.Dataset":
    """ZIP-archive source (reference S3/S6: OSV/CVE zip expanders,
    /root/reference/internal/fetchers/osv/fetcher.go:272-352 and
    /root/reference/internal/fetchers/cve/fetcher.go:114-250): list the
    archive's ``*.jsonl``/``*.json`` members, fan the member list out to
    tasks, parse each member to canonical event batches.

    Guards mirrored from the reference: per-member decompressed size cap
    (100 MB decompression-bomb guard, cve/fetcher.go:22-24) and zip-slip
    path check (cve/fetcher.go:205-214)."""
    import json as _json
    import zipfile

    with zipfile.ZipFile(zip_path) as zf:
        members = [
            i.filename
            for i in zf.infolist()
            if i.filename.endswith((".json", ".jsonl"))
            and not i.is_dir()
            and i.file_size <= max_member_bytes
            and ".." not in i.filename
            and not i.filename.startswith("/")
        ]

    def parse(batch: pa.Table) -> pa.Table:
        import io

        import pyarrow.json as pj

        tables: list[pa.Table] = []
        rows: list[dict] = []
        with zipfile.ZipFile(zip_path) as zf:
            for member in batch["member"].to_pylist():
                with zf.open(member) as fh:
                    data = fh.read(max_member_bytes + 1)
                if len(data) > max_member_bytes:
                    continue  # bomb guard: skip, never fail the sync (I6)
                try:
                    # fast path: Arrow's C++ NDJSON reader (vectorized)
                    tables.append(pj.read_json(io.BytesIO(data)))
                except Exception:
                    # tolerant path (I6): a malformed line must never kill
                    # the member — fall back to per-line parse, skip bad
                    for line in data.splitlines():
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            rows.append(_json.loads(line))
                        except Exception:
                            continue
        if rows:
            tables.append(pa.Table.from_pylist(rows))
        if not tables:
            return _CANON.empty_table()
        # Members may carry different extra columns / inferred types
        # (extras are preserved by the normalizer now) — unify the
        # normalized schemas and conform each before concat, or one odd
        # member would kill the whole batch (the I6 contract).
        normed = [_canonical_normalizer(t) for t in tables]
        schema = normed[0].schema
        for t in normed[1:]:
            schema = S.unify(schema, t.schema)
        return pa.concat_tables([S.conform(t, schema) for t in normed])

    ds = rd.from_items([{"member": m} for m in sorted(members)])
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=16)


register(Source("zip-jsonl", read_zip_jsonl, None))


# ----------------------------------------------- multi-format timestamps (M13)
# The reference's normalizers each try several layouts per date field
# (/root/reference/internal/merger/normalizer.go:67-78,146-155,245-256).
# Same idea, vectorized: one strptime pass per format, first success wins.
TIMESTAMP_FORMATS = (
    "%Y-%m-%dT%H:%M:%SZ",   # RFC3339 Zulu
    "%Y-%m-%dT%H:%M:%S",    # ISO, no zone
    "%Y-%m-%d %H:%M:%S",    # space-separated
    "%Y-%m-%d",             # date-only
)


def parse_timestamp_multi(
    col: "pa.ChunkedArray | pa.Array", formats: tuple[str, ...] = TIMESTAMP_FORMATS
) -> "pa.ChunkedArray":
    """Parse a string column that mixes timestamp layouts row-by-row:
    each format is tried vectorized (``strptime(error_is_null=True)``)
    and the first success per row wins; unparseable rows stay null (the
    record-level tolerance rule I6 — the malformed filter downstream
    decides their fate).

    Fractional seconds (``...:04.568308Z``, which Arrow's strptime
    cannot parse) are handled by stripping the fraction for the strptime
    pass and adding it back as microseconds."""
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp("us"))
    col = pc.cast(col, pa.string())
    parsed = [
        pc.strptime(col, format=f, unit="us", error_is_null=True) for f in formats
    ]
    out = pc.coalesce(*parsed) if len(parsed) > 1 else parsed[0]
    # fractional-seconds path: strip ".NNN" and retry, then add micros
    frac = pc.extract_regex(col, r"\.(?P<frac>[0-9]{1,9})")
    has_frac = pc.is_valid(frac)
    if pc.sum(pc.and_(has_frac, pc.is_null(out))).as_py():
        stripped = pc.replace_substring_regex(col, r"\.[0-9]{1,9}", "")
        reparsed = [
            pc.strptime(stripped, format=f, unit="us", error_is_null=True)
            for f in formats
        ]
        base = pc.coalesce(*reparsed) if len(reparsed) > 1 else reparsed[0]
        digits = pc.utf8_slice_codeunits(
            pc.utf8_rpad(pc.struct_field(frac, "frac"), 6, "0"), 0, 6
        )
        micros = pc.cast(
            pc.fill_null(pc.cast(digits, pa.int64()), 0), pa.int64()
        )
        with_frac = pc.add(
            pc.cast(base, pa.int64()), micros
        )
        out = pc.coalesce(
            out, pc.cast(with_frac, pa.timestamp("us"))
        )
    return out


def timestamp_normalizer(columns: list[str], base=_canonical_normalizer):
    """Wrap a normalizer so the named payload columns parse from mixed
    string layouts to ``timestamp[us]`` (M13)."""

    def f(batch: pa.Table) -> pa.Table:
        for c in columns:
            if c in batch.column_names:
                parsed = parse_timestamp_multi(batch[c])
                batch = batch.set_column(
                    batch.column_names.index(c), c, parsed
                )
        return base(batch) if base is not None else batch

    return f


# ------------------------------------------------ nested-struct source (M7)
def explode_nested(
    t: pa.Table, column: str, parent_cols: list[str]
) -> pa.Table:
    """One row per element of a list<struct> column, carrying the chosen
    parent columns (vectorized: list_parent_indices + take + flatten) —
    the building block for OSV-shaped deep projections
    (/root/reference/internal/merger/normalizer.go:28-117)."""
    col = t[column].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parent_idx = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    out = {p: t[p].combine_chunks().take(parent_idx) for p in parent_cols}
    if pa.types.is_struct(flat.type):
        for field in flat.type:
            out[f"{column}_{field.name}"] = pc.struct_field(flat, field.name)
    else:
        out[column] = flat
    return pa.table(out)


def osv_like_normalizer(batch: pa.Table) -> pa.Table:
    """Project deeply nested OSV-shaped records
    (``affected[] -> package{ecosystem,name}, ranges[] -> events[]``)
    onto the canonical event schema: repo = ecosystem, path = package
    name, version = (modified-timestamp-derived commit, seq), content =
    details. Multi-format ``modified`` strings parse via M13. A batch
    missing any required column entirely yields zero events (I6: odd
    shapes never kill the sync; per-row nulls flow to the malformed
    filter downstream)."""
    required = ("id", "modified", "affected")
    if batch.num_rows == 0 or any(c not in batch.column_names for c in required):
        return _CANON.empty_table()
    ts = parse_timestamp_multi(batch["modified"])
    micros = pc.cast(ts, pa.int64())
    commit = pc.binary_join_element_wise(
        pa.array(["c"] * batch.num_rows),
        pc.utf8_lpad(pc.cast(micros, pa.string()), 20, "0"),
        "",
    )
    # I6 guards: an 'affected' column that is not a usable list<struct>
    # (inferred null type when every record omits it, scalar shapes, or
    # structs lacking package) yields zero events instead of killing the
    # whole sync; per-ROW oddities flow through as nulls to the
    # malformed filter downstream.
    aff_type = batch["affected"].type
    if not (pa.types.is_list(aff_type) or pa.types.is_large_list(aff_type)):
        return _CANON.empty_table()
    base = pa.table(
        {
            "osv_id": batch["id"],
            "commit": commit,
            "content": batch["details"] if "details" in batch.column_names
            else pa.nulls(batch.num_rows, pa.string()),
            "affected": batch["affected"],
        }
    )
    ex = explode_nested(base, "affected", ["osv_id", "commit", "content"])
    if "affected_package" not in ex.column_names:
        return _CANON.empty_table()
    pkg = ex["affected_package"].combine_chunks()
    if not pa.types.is_struct(pkg.type) or not {"ecosystem", "name"} <= {
        f.name for f in pkg.type
    }:
        return _CANON.empty_table()
    n = ex.num_rows
    # seq must be globally deterministic (not a per-batch counter): a
    # stable positive hash of the record id keeps replays idempotent
    import numpy as np
    import pandas as pd

    seq = (
        pd.util.hash_array(
            ex["osv_id"].combine_chunks().to_numpy(zero_copy_only=False),
            categorize=False,
        ).astype(np.uint64)
        >> np.uint64(2)
    ).astype(np.int64)
    # canonicalize through the SAME mapping the gitlab-like source uses:
    # the cross-source merge (sources: [osv, gitlab] union) keys on
    # (repo, path), and 'PyPI' (osv raw) vs 'pypi' (gitlab slug-derived)
    # would silently never merge
    eco = slug_to_ecosystem(pc.struct_field(pkg, "ecosystem"))
    out = pa.table(
        {
            "repo": eco,
            "path": pc.struct_field(pkg, "name"),
            "commit": ex["commit"],
            "seq": pa.array(seq),
            "op": pa.array(["update"] * n, pa.string()),
            "lang": eco,
            "content": ex["content"],
            # source tag: under merge='coalesce' these union across
            # sources — the reference's merged `source: ["osv","gitlab"]`
            # array (VULNERABILITY_DATA_FLOW.md:485-526)
            "sources": pa.array([["osv"]] * n, pa.list_(pa.string())),
        }
    )
    return _canonical_normalizer(out)


register(Source("osv-jsonl", lambda p: rd.read_json(p), osv_like_normalizer))


# -------------------------------------- path-derived-column source (M8)
# Package-manager slug prefix -> canonical ecosystem, the reference's
# extractEcosystemFromPackageSlug mapping
# (/root/reference/internal/merger/normalizer.go:313-336; the fetcher
# applies the same derivation to file paths, gitlab/fetcher.go:249-255).
_ECOSYSTEM_KEYS = pa.array(
    ["gem", "ruby", "npm", "node", "pip", "python", "pypi",
     "go", "golang", "maven", "java", "nuget", "dotnet", ".net"]
)
_ECOSYSTEM_VALS = pa.array(
    ["rubygems", "rubygems", "npm", "npm", "pypi", "pypi", "pypi",
     "go", "go", "maven", "maven", "nuget", "nuget", "nuget"]
)


def slug_to_ecosystem(col: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """Derive the ecosystem from a package slug's FIRST path segment via
    the mapping table; unmapped prefixes pass through lowercased, null
    slugs become 'unknown'. Fully vectorized (split + index_in + take)."""
    col = pc.cast(col, pa.string())
    first = pc.utf8_lower(pc.list_element(pc.split_pattern(col, "/"), 0))
    mapped = pc.take(_ECOSYSTEM_VALS, pc.index_in(first, value_set=_ECOSYSTEM_KEYS))
    return pc.coalesce(mapped, first, pa.scalar("unknown"))


def summarize_description(col: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """Preferred-description projection (M8/M9 analog, reference
    normalizer.go:339-356): short descriptions pass through; otherwise
    the first '. '-sentence if it fits in 100 chars (dot restored), else
    a 97-char truncation with '...'. Vectorized."""
    col = pc.cast(col, pa.string())
    n_chars = pc.utf8_length(col)
    first = pc.list_element(pc.split_pattern(col, ". "), 0)
    first_dot = pc.binary_join_element_wise(first, ".", "")
    trunc = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(col, 0, 97), "...", ""
    )
    return pc.if_else(
        pc.less_equal(n_chars, 100),
        col,
        pc.if_else(pc.less_equal(pc.utf8_length(first), 100), first_dot, trunc),
    )


def gitlab_like_normalizer(batch: pa.Table) -> pa.Table:
    """Project GitLab-advisory-shaped records (identifier, package_slug,
    description, date) onto canonical events: repo/lang = slug-derived
    ecosystem, path = the slug minus its package-manager prefix, commit
    from the multi-format date (M13), content = the summarized
    description. A batch missing any required column yields zero events
    (I6)."""
    required = ("identifier", "package_slug")
    if batch.num_rows == 0 or any(c not in batch.column_names for c in required):
        return _CANON.empty_table()
    n = batch.num_rows
    slug = pc.cast(batch["package_slug"], pa.string())
    eco = slug_to_ecosystem(slug)
    # path = slug with the leading "<manager>/" stripped; a one-segment
    # slug keeps itself as the name
    name = pc.replace_substring_regex(slug, r"^[^/]*/", "")
    date_col = (
        batch["date"]
        if "date" in batch.column_names
        else pa.nulls(n, pa.string())
    )
    ts = parse_timestamp_multi(date_col)
    micros = pc.cast(pc.fill_null(pc.cast(ts, pa.int64()), 0), pa.int64())
    commit = pc.binary_join_element_wise(
        pa.array(["c"] * n), pc.utf8_lpad(pc.cast(micros, pa.string()), 20, "0"), ""
    )
    desc = (
        summarize_description(batch["description"])
        if "description" in batch.column_names
        else pa.nulls(n, pa.string())
    )
    import numpy as np
    import pandas as pd

    seq = (
        pd.util.hash_array(
            pc.cast(batch["identifier"], pa.string())
            .combine_chunks()
            .to_numpy(zero_copy_only=False),
            categorize=False,
        ).astype(np.uint64)
        >> np.uint64(2)
    ).astype(np.int64)
    out = pa.table(
        {
            "repo": eco,
            "path": name,
            "commit": commit,
            "seq": pa.array(seq),
            "op": pa.array(["update"] * n, pa.string()),
            "lang": eco,
            "content": desc,
            "sources": pa.array([["gitlab"]] * n, pa.list_(pa.string())),
        }
    )
    return _canonical_normalizer(out)


register(Source("gitlab-jsonl", lambda p: rd.read_json(p), gitlab_like_normalizer))
