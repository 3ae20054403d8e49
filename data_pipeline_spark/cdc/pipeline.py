"""CdcPipeline — the per-batch apply path (the foreachBatch body).

One micro-batch of raw change events goes through (SURVEY.md §3.2
re-expression):

  1. validation split → dead_letter (T9; parsers.py:114-158 analogue)
  2. SCHEMA records → additive schema evolution on target+history (C8)
  3. bucket-pruned MERGE (C1/C9) whose per-(bucket, key) max_by IS both
     the arrival dedup (W1/T2) and the LWW reduce (W2) — map-side
     partial aggregation salts hot keys
  4. all versions → SCD2 history append + closure (C5/C6)
  5. per-partition lineage/metrics row (C10) + dead-letter append
  6. periodic small-file compaction (north_rule)

Exactly-once: every table commit carries the batch epoch as its
batch_key inside the atomic snapshot commit (commit manifest, C3).  On
restart after a crash anywhere in 1-7, the replayed batch skips the
tables that already recorded the epoch and re-applies the rest —
each step is idempotent, so the final state is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table.laketable import LakeTable
from .merge import merge_into
from .scd2 import apply_history
from .schema import (
    DEAD_LETTER_SCHEMA,
    HISTORY_SCHEMA_BASE,
    LINEAGE_SCHEMA,
    TARGET_SCHEMA_BASE,
    parse_ddl,
    stamp_batch_id as _stamp,
)

VALID_OPS = ("I", "U", "D")


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        n_buckets: int = 16,
        salt_buckets: int = 16,
        enable_history: bool = True,
        collect_metrics: bool = True,
        compact_every: int = 8,
        max_files_per_bucket: int = 8,
        max_delta_bytes_per_bucket: int = 128 * 1024 * 1024,
        expire_snapshots: bool = False,
        scd2_check_cols: list[str] | None = None,
        lineage_mode: str = "partition",
        storage: str = "mor",
        table_format=None,
    ):
        self.spark = spark
        self.base_dir = os.path.abspath(base_dir)
        self.salt_buckets = salt_buckets
        self.enable_history = enable_history
        self.collect_metrics = collect_metrics
        self.compact_every = compact_every
        self.max_files_per_bucket = max_files_per_bucket
        # lane-SIZE compaction trigger, checked EVERY batch (a manifest
        # dict sum, no Spark job): a delta lane that outruns the
        # batch-count cadence — hot buckets, bursty batches, a raised
        # compact_every — is folded on bytes before its read-side
        # resolution degrades toward mor.py's forced-broadcast ceiling
        self.max_delta_bytes_per_bucket = max_delta_bytes_per_bucket
        self.expire_snapshots = expire_snapshots
        # optional check-cols SCD2 (C4): only attr-hash-changed updates
        # open history versions; None = version every distinct lsn
        self.scd2_check_cols = scd2_check_cols
        # lineage granularity: "partition" = per-kafka-partition rows
        # via a (column-pruned) aggregation job per batch; "observed" =
        # one global row whose metrics ride the merge / dead-letter
        # actions via observe() — zero extra aggregation jobs
        # (SURVEY.md §2.4).  Observed mode cannot produce per-partition
        # breakdowns or exact distinct counts (observe() has no groupBy
        # and no count_distinct), so rows_deduped is null there.
        assert lineage_mode in ("partition", "observed")
        self.lineage_mode = lineage_mode
        # storage: "mor" (default) = merge-on-read — batches commit as
        # base-append + delta files, per-batch write volume O(batch),
        # compaction folds the lane; "cow" = copy-on-write — touched
        # buckets are rewritten wholesale per batch (simpler reads, the
        # round-3 review's write-amplification scale-killer at uniform
        # key batches).  A table's mode is fixed at creation; loading an
        # existing warehouse keeps whatever its metadata says.
        assert storage in ("mor", "cow")
        self.storage = storage
        # table_format: the TableFormat binding backing the warehouse —
        # LakeTable (Iceberg-style snapshots, default) or DeltaLogTable
        # (Delta-style action log); the pipeline drives either through
        # the same protocol (table/format.py)
        self.table_format = table_format or LakeTable
        self._batches_applied = 0
        # per-batch phase walls (seconds), appended by apply_batch.
        # Cost: a handful of perf_counter calls — always on.  This is
        # the N→4N decomposition instrument: phases whose wall does NOT
        # shrink with executors are the pipeline's Amdahl constant.
        self.phase_times: list[dict] = []

        fmt = self.table_format

        def tbl(name: str, schema, key: str, nb: int, mor=None):
            path = os.path.join(self.base_dir, name)
            if fmt.exists(path):
                return fmt.load(spark, path)
            return fmt.create(
                spark, path, schema, key_col=key, n_buckets=nb,
                merge_on_read=mor if storage == "mor" else None,
            )

        self.target = tbl(
            "target", TARGET_SCHEMA_BASE, "doc_id", n_buckets,
            mor={"mode": "upsert", "row_id_cols": ["doc_id"],
                 "order_cols": ["lsn"]},
        )
        self.history = (
            tbl(
                "history", HISTORY_SCHEMA_BASE, "doc_id", n_buckets,
                mor={"mode": "patch", "row_id_cols": ["doc_id", "lsn"],
                     "patch_cols": ["valid_to_utc", "is_current"]},
            )
            if enable_history
            else None
        )
        self.lineage = tbl("lineage", LINEAGE_SCHEMA, "batch_id", 1)
        self.dead_letter = tbl("dead_letter", DEAD_LETTER_SCHEMA, "batch_id", 1)

    # ------------------------------------------------------------------
    def apply_batch(self, df: DataFrame, batch_id: int) -> dict:
        """Apply one micro-batch; safe to call again with the same
        batch_id after a crash (exactly-once via commit manifests)."""
        import time as _time

        bkey = str(batch_id)
        _t0 = _time.perf_counter()
        _ph: dict = {"batch_id": batch_id}
        # NOTE: df is deliberately NOT persisted or pre-deduplicated —
        # merge and history each reduce the batch on their own shuffle
        # (duplicates collapse there), and the remaining consumers (ddl
        # scan, dead-letter filter, lineage agg) are column-pruned, so
        # re-scanning parquet beats materializing the full-width batch
        # (token arrays) into a cache.
        is_schema = F.col("op") == "SCHEMA"
        failure = (
            F.when(F.col("op").isNull() | ~F.col("op").isin(*VALID_OPS), "unknown_op")
            .when(F.col("doc_id").isNull(), "null_key")
            .when(F.col("lsn").isNull(), "null_lsn")
            .when(F.col("op").isin("I", "U") & F.col("tokens").isNull(), "null_payload")
        )

        # -- 1.5 fused planning probe: ONE column-pruned job computes
        # every driver-side planning input for the whole batch — the
        # DDL set (schema evolution), the touched bucket set (merge +
        # history pruning), the distinct-key count (history broadcast
        # gate) and the dead-row count (dead-letter skip).  These were
        # three separate batch scans in round 2; per-batch planning jobs
        # are pure Amdahl constant (they don't shrink with executors),
        # so they are fused into one.
        valid = ~is_schema & failure.isNull()
        probe = df.agg(
            F.collect_set(F.when(is_schema, F.col("ddl"))).alias("ddls"),
            F.collect_set(F.when(valid, self.target.bucket_of("doc_id"))).alias(
                "bs"
            ),
            # HLL, not exact count_distinct: nd only gates the history
            # broadcast decision (order-of-magnitude), and the exact
            # version builds a per-partition hash set over every key —
            # measured 18-21 s/batch at 8.3M events vs ~0 for the sketch
            F.approx_count_distinct(
                F.when(valid, F.col("doc_id")), 0.02
            ).alias("nd"),
            F.sum(
                F.when(~is_schema & failure.isNotNull(), 1).otherwise(0)
            ).alias("n_dead"),
            F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
            F.min(F.when(valid, F.col("lsn"))).alias("min_lsn"),
            F.max(F.when(valid, F.col("lsn"))).alias("max_lsn"),
        ).first()
        _ph["probe"] = round(_time.perf_counter() - _t0, 3)
        _ph["rows"] = int((probe["n_valid"] or 0) + (probe["n_dead"] or 0))
        ddls = sorted(d for d in probe["ddls"] if d)
        affected = [int(b) for b in probe["bs"]]
        n_docs = int(probe["nd"] or 0)
        n_dead = int(probe["n_dead"] or 0)
        n_valid = int(probe["n_valid"] or 0)

        # -- 2. additive schema evolution (metadata-only) ----------
        for ddl in ddls:
            fields = list(parse_ddl(ddl))
            self.target.add_columns(fields)
            if self.history is not None:
                self.history.add_columns(fields)

        non_schema = df.filter(~is_schema)
        events = non_schema.filter(failure.isNull())
        dead = non_schema.filter(failure.isNotNull())
        # the fused probe's bucket set is valid for the history table
        # only when its bucket function matches the target's
        history_probe_ok = self.history is not None and (
            self.history.n_buckets == self.target.n_buckets
            and self.history.key_col == self.target.key_col
        )

        # NOTE: no separate arrival-dedup pass — at-least-once duplicate
        # deliveries collapse inside the merge's max_by reduce (payload-
        # identical copies) and inside the history apply's kernel +
        # bucket-exchange reduce (first arrival wins), so the batch is
        # scanned rather than materialized into a 3×-copied cache.

        # -- 4-6. four independent table applies, submitted from
        # concurrent driver threads: each is its own chain of Spark jobs
        # (plan → execute → commit) against a DIFFERENT LakeTable, so
        # driver-side planning/codegen/commit latency overlaps with
        # cluster compute instead of serializing after it.  Exactly-once
        # stays per-table (each commit carries the batch manifest).
        stats: dict = {"batch_id": batch_id}

        observed = (
            self.collect_metrics and self.lineage_mode == "observed"
        )

        def _merge():
            # the merge's per-(bucket, key) max_by reduce IS the LWW:
            # multiple versions of a key collapse map-side (partial
            # aggregation = natural salting for hot keys) before the one
            # merge shuffle — no separate lww_reduce pass needed.
            if not self.target.has_batch(bkey):
                obs = None
                if observed:
                    from pyspark.sql import Observation

                    obs = Observation(f"merge-{bkey}")
                stats["merge"] = merge_into(
                    self.target, events, batch_id, observation=obs,
                    affected=affected,
                )
                if obs is not None and stats["merge"]["buckets"]:
                    # the merge action has completed → get() is immediate
                    stats["observed_merge"] = obs.get

        def _history():
            if self.history is not None and not self.history.has_batch(bkey):
                stats["history"] = apply_history(
                    self.history, events, batch_id,
                    check_cols=self.scd2_check_cols,
                    affected=affected if history_probe_ok else None,
                    n_docs=n_docs if history_probe_ok else None,
                )

        def _dead_letter():
            if self.dead_letter.has_batch(bkey):
                return
            if n_dead == 0:
                # nothing to quarantine: record the epoch with a
                # manifest-only commit — no Spark job (the common case
                # on a healthy stream, and a per-batch constant saved)
                self.dead_letter.record_batch(bkey, {"rows": 0})
                return
            dl = dead.select(
                F.lit(_stamp(batch_id)).cast("long").alias("batch_id"),
                "doc_id",
                "lsn",
                "op",
                F.to_json(F.struct(*[c for c in dead.columns])).alias("raw"),
                failure.alias("failure_reason"),
                F.current_timestamp().alias("quarantined_at"),
            )
            self.dead_letter.append(dl, batch_key=bkey)

        def _lineage():
            if not self.collect_metrics or self.lineage_mode == "observed":
                return
            if self.lineage.has_batch(bkey):
                return
            # min/max_lsn span VALID rows only — same definition in both
            # lineage modes (observed mode can only see rows that reach
            # the merge), so gap checks don't report phantom gaps when a
            # deployment switches modes.  Valid-only is also the right
            # semantic for continuity: a quarantined row was not applied,
            # so its lsn must not extend the applied span.
            per_part = non_schema.groupBy("partition").agg(
                F.count("*").alias("_all"),
                F.sum(F.when(failure.isNotNull(), 1).otherwise(0)).alias(
                    "rows_dead_letter"
                ),
                F.count_distinct(F.col("doc_id"), F.col("lsn")).alias("_distinct"),
                F.min(F.when(failure.isNull(), F.col("lsn"))).alias("min_lsn"),
                F.max(F.when(failure.isNull(), F.col("lsn"))).alias("max_lsn"),
            )
            lin = per_part.select(
                F.lit(_stamp(batch_id)).cast("long").alias("batch_id"),
                F.col("partition"),
                F.col("_all").cast("long").alias("rows_in"),
                (F.col("_all") - F.col("_distinct")).cast("long").alias("rows_deduped"),
                F.col("rows_dead_letter").cast("long"),
                "min_lsn",
                "max_lsn",
                F.current_timestamp().alias("applied_at"),
            )
            self.lineage.append(lin, batch_key=bkey)

        from concurrent.futures import ThreadPoolExecutor

        _tables = [
            t for t in (self.target, self.history, self.lineage, self.dead_letter)
            if t is not None
        ]
        _bytes0 = sum(getattr(t, "bytes_written_total", 0) for t in _tables)

        def _timed(fn):
            def run():
                s = _time.perf_counter()
                try:
                    fn()
                finally:
                    _ph[fn.__name__.lstrip("_")] = round(
                        _time.perf_counter() - s, 3
                    )
            return run

        with ThreadPoolExecutor(max_workers=4) as pool:
            futures = [
                pool.submit(_timed(fn))
                for fn in (_merge, _history, _dead_letter, _lineage)
            ]
            for f in futures:
                f.result()  # re-raise the first failure
        _ph["applies"] = round(_time.perf_counter() - _t0, 3)

        # observed-mode lineage: one global row per batch, built from
        # the fused probe (identical numbers ride the merge action via
        # observe() — stats["observed_merge"] — but the probe is always
        # available, including on crash-replay where the merge commit is
        # manifest-skipped).  The write is a driver-side pyarrow
        # micro-append: ZERO Spark jobs for lineage in this mode.
        if observed and not self.lineage.has_batch(bkey):
            rows_in = n_valid + n_dead
            if rows_in == 0:
                # empty batch: record the epoch without a zero row
                # (matches partition mode, whose groupBy emits no rows)
                self.lineage.record_batch(bkey, {"rows": 0})
            else:
                from datetime import datetime, timezone

                self.lineage.append_rows(
                    [
                        {
                            "batch_id": _stamp(batch_id),
                            "partition": -1,
                            "rows_in": rows_in,
                            "rows_deduped": None,
                            "rows_dead_letter": n_dead,
                            "min_lsn": probe["min_lsn"],
                            "max_lsn": probe["max_lsn"],
                            "applied_at": datetime.now(timezone.utc),
                        }
                    ],
                    batch_key=bkey,
                )

        # -- 7. maintenance ----------------------------------------
        self._batches_applied += 1
        cadence_due = bool(
            self.compact_every
            and self._batches_applied % self.compact_every == 0
        )

        def _hot_buckets(t) -> list[int]:
            # manifest-carried byte totals — a dict sum, zero Spark jobs
            if t is None:
                return []
            return [
                b
                for b, nbytes in t.delta_bytes().items()
                if nbytes > self.max_delta_bytes_per_bucket
            ]

        hot = [
            (t, bs)
            for t in (self.target, self.history)
            for bs in [_hot_buckets(t)]
            if bs
        ]
        if cadence_due or hot:
            _tc = _time.perf_counter()
            if hot and not cadence_due:
                # lane-BYTES trigger between cadences: try the O(lane)
                # MINOR fold first (hot keys collapse to one survivor
                # per id, no base rewrite); escalate to a full bucket
                # rewrite only for buckets still over the threshold —
                # i.e. lanes of genuinely distinct keys
                for t, bs in hot:
                    t.fold_delta_lane(buckets=bs)
                    still = _hot_buckets(t)
                    if still:
                        t.compact(
                            10**9,
                            max_delta_bytes_per_bucket=(
                                self.max_delta_bytes_per_bucket
                            ),
                        )
            if cadence_due:
                stats["compacted"] = self.target.compact(
                    self.max_files_per_bucket,
                    max_delta_bytes_per_bucket=self.max_delta_bytes_per_bucket,
                )
                if self.history is not None:
                    self.history.compact(
                        self.max_files_per_bucket,
                        max_delta_bytes_per_bucket=(
                            self.max_delta_bytes_per_bucket
                        ),
                    )
                if self.expire_snapshots:
                    self.target.expire_snapshots(keep_last=2)
                    if self.history is not None:
                        self.history.expire_snapshots(keep_last=2)
            # compaction wall is reported separately: it is the MoR
            # lane's amortized rewrite cost, paid every compact_every
            # batches instead of every batch (BENCH.md steady-state)
            _ph["compact"] = round(_time.perf_counter() - _tc, 3)

        _ph["total"] = round(_time.perf_counter() - _t0, 3)
        # write-amplification instrument: bytes materialised this batch
        # across all four tables (applies + compaction).  O(batch) under
        # merge-on-read; grows toward a full-table rewrite per batch
        # under copy-on-write at uniformly-hashed keys.
        _ph["bytes_written"] = (
            sum(getattr(t, "bytes_written_total", 0) for t in _tables) - _bytes0
        )
        self.phase_times.append(_ph)
        # bounded for continuous deployments: a months-long query must
        # not grow driver memory with one dict per trigger
        if len(self.phase_times) > 4096:
            del self.phase_times[:-2048]
        return stats


    # ------------------------------------------------------------------
    def current_state(self) -> DataFrame:
        return self.target.refresh().read()

    def history_df(self) -> DataFrame:
        assert self.history is not None
        return self.history.refresh().read()
