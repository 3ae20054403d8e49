"""TableFormat — the storage seam between the CDC engine and a table format.

The engine's writers (``cdc.merge.merge_into``, ``cdc.scd2.apply_history``,
``CdcPipeline``) never touch files; they drive a table through this
protocol.  :class:`~.laketable.LakeTable` is the in-repo implementation
(parquet + JSON snapshots + CAS commits, Iceberg-style);
:class:`~.deltalog.DeltaLogTable` is a second, independently-laid-out
binding (ordered JSON action log, Delta-style) that pins the seam.  A
real-Iceberg deployment implements the same protocol over a catalog —
the table below gives the SQL each method maps to.  Extracting the
seam is what makes the engine portable to Iceberg/Delta without
touching the operator code — the round-2 review's ask.

Method → Iceberg mapping:

=================  =====================================================
Protocol method    Iceberg equivalent
=================  =====================================================
read               ``spark.table(name)`` (+ ``VERSION AS OF`` for
                   time travel); bucket pruning comes free from the
                   ``bucket(N, key)`` partition transform + predicate
replace_buckets    copy-on-write ``MERGE INTO``/``REPLACE WHERE`` over
                   the bucket predicate (one atomic snapshot commit)
append             ``df.writeTo(name).append()``
merge_append       merge-on-read commit: new data files + equality-
                   delete/patch delta files in one snapshot (Iceberg
                   v2 row-level deletes / Hudi MoR delta commit)
append_rows        driver-side small append (Iceberg writers commit
                   tiny metadata-lane rows the same way)
record_batch       snapshot summary properties on an empty commit
                   (``snapshot.summary['batch-key']``)
has_batch          scan snapshot summaries / a watermark table
add_columns        ``ALTER TABLE name ADD COLUMNS (...)``
compact            ``CALL catalog.system.rewrite_data_files(name)``
fold_delta_lane    minor compaction: ``rewrite_position_delete_files``
                   (Iceberg) / log compaction (Hudi) — collapse the
                   delta lane without rewriting base files
expire_snapshots   ``CALL catalog.system.expire_snapshots(name)``
=================  =====================================================

Concurrency contract (both implementations): commits are optimistic —
the writer rebases over concurrent commits where semantics allow
(appends, manifest-only commits, disjoint bucket replacements) and
raises on true conflicts (same-bucket replacement), mirroring Iceberg's
validation-failure semantics.  ``has_batch``/``batch_key`` give
cross-writer exactly-once.
"""

from __future__ import annotations

from typing import Any, Iterable, Protocol, runtime_checkable

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


@runtime_checkable
class TableFormat(Protocol):
    """Structural protocol — any object with these members can back the
    CDC engine.  ``runtime_checkable`` covers presence, not signatures;
    tests/test_laketable.py pins LakeTable's conformance explicitly."""

    # identity / layout -------------------------------------------------
    @property
    def schema(self) -> StructType: ...

    @property
    def key_col(self) -> str: ...

    @property
    def n_buckets(self) -> int: ...

    def bucket_of(self, key_col: str | None = None): ...

    # read --------------------------------------------------------------
    def read(
        self,
        buckets: Iterable[int] | None = None,
        version: int | None = None,
        with_deltas: bool = True,
    ) -> DataFrame: ...

    # write / commit ----------------------------------------------------
    def replace_buckets(
        self,
        df: DataFrame,
        buckets: Iterable[int],
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
        prepartitioned: bool = False,
    ) -> None: ...

    def append(
        self,
        df: DataFrame,
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
    ) -> None: ...

    # merge-on-read lane --------------------------------------------------
    @property
    def merge_on_read(self) -> dict[str, Any] | None: ...

    def merge_append(
        self,
        new_rows: DataFrame | None,
        delta: DataFrame | None,
        buckets: Iterable[int],
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
        prepartitioned: bool = False,
    ) -> None: ...

    def record_batch(
        self, batch_key: str, batch_info: dict[str, Any] | None = None
    ) -> None: ...

    def has_batch(self, batch_key: str) -> bool: ...

    # schema evolution --------------------------------------------------
    def add_columns(self, new_fields) -> bool: ...

    # planning stats (driver-side manifest lookups, no Spark job) --------
    def base_file_stats(self) -> dict[int, int]: ...

    def delta_bytes(self) -> dict[int, int]: ...

    # maintenance -------------------------------------------------------
    def compact(
        self,
        max_files_per_bucket: int = 8,
        max_delta_bytes_per_bucket: int | None = None,
    ) -> list[int]: ...

    def fold_delta_lane(
        self,
        buckets: Iterable[int] | None = None,
        min_files: int = 2,
    ) -> list[int]: ...

    def expire_snapshots(self, keep_last: int = 2) -> int: ...
