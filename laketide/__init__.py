"""laketide — a Ray-Data-native CDC / incremental-ingest engine.

Built from scratch on Ray Data + Apache Arrow with the query and
data-processing capabilities of the reference system (vchan-in/vuln-datasync,
a Go keyed-record sync service: normalize -> dedupe/merge -> idempotent
upsert into a master table with versioned exports; see SURVEY.md).

Re-expressed Ray-natively: replay a changelog of insert/update/delete
events keyed by ``(repo, path)`` with ``commit`` as the monotonically
increasing version onto a hash-partitioned Parquet lake table, with
last-writer-wins merge, content-hash no-op skip, per-partition
high-water-mark replay dedup, additive schema evolution, and an
idempotent two-phase (staging + atomic manifest swap) sink.

IMPORTANT (driver contract): nothing in this package calls
``ray.init()`` / ``ray.shutdown()``.
"""

from laketide.pipelines.cdc import LakeTable  # noqa: F401
from laketide.pipelines.views import (  # noqa: F401
    DerivedJoinView,
    IncrementalAggView,
    IncrementalCountView,
)
from laketide.sources.changelog import generate_changelog  # noqa: F401

__version__ = "0.1.0"
