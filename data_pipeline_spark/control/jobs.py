"""Control jobs over the lineage table (SURVEY.md §7.2 phase 5).

The reference runs these as scheduled dbt models over control metadata
(dbt_project/models/control/streaming_sequence_gaps.sql:20-70,
source_completeness.sql:49-106) plus `dbt source freshness` thresholds
(docs/testing.md:131-147, test_freshness_soft.sql:1-10).  Here they are
DataFrame transforms over the engine's own lineage LakeTable, persisted
as control LakeTables by :class:`ControlRunner` after each epoch (or on
demand) — monitoring is data too, with the same snapshot/commit
semantics as everything else.

Scale: all three jobs read the narrow lineage table (one row per
(batch, partition)), never the data tables — cost is O(batches ×
partitions), independent of corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.windows import consecutive_missing_streaks
from ..table.laketable import LakeTable

GAP_SCHEMA = StructType(
    [
        StructField("control_epoch", LongType()),
        StructField("partition", IntegerType()),
        StructField("gap_start", LongType()),
        StructField("gap_end", LongType()),
        StructField("gap_size", LongType()),
        StructField("severity", StringType()),
    ]
)

COMPLETENESS_SCHEMA = StructType(
    [
        StructField("control_epoch", LongType()),
        StructField("partition", IntegerType()),
        StructField("batch_id", LongType()),
        StructField("rows_in", LongType()),
        StructField("status", StringType()),
        StructField("reset_group", LongType()),
        StructField("consecutive_missing", LongType()),
    ]
)

FRESHNESS_SCHEMA = StructType(
    [
        StructField("control_epoch", LongType()),
        StructField("partition", IntegerType()),
        StructField("last_applied_at", TimestampType()),
        StructField("lag_seconds", LongType()),
        StructField("status", StringType()),
    ]
)


def lineage_sequence_gaps(lineage: DataFrame) -> DataFrame:
    """Missing-lsn windows per kafka partition, from the lineage table's
    per-batch [min_lsn, max_lsn] spans (streaming_sequence_gaps.sql:20-70
    recast: the lineage row IS the pre-aggregated sequence span, so the
    lag-based scan runs over batches, not events).

    A gap = next batch's min_lsn > previous batch's max_lsn + 1 for the
    same partition.  With a globally-assigned lsn interleaved across
    partitions, per-partition gaps are EXPECTED background noise; the
    signal a reconciliation job alerts on is gap_size drift / CRITICAL
    severity, exactly like the reference model."""
    from pyspark.sql.window import Window

    spans = lineage.select(
        F.col("partition"), F.col("min_lsn"), F.col("max_lsn"), F.col("batch_id")
    )
    # lag over (partition ORDER BY batch_id): robust to a partition
    # skipping a batch entirely (a batch_id+1 self-join would not be)
    w = Window.partitionBy("partition").orderBy(F.col("batch_id").asc())
    prev_end = F.lag(F.col("max_lsn")).over(w)
    joined = spans.select(
        "partition",
        (prev_end + 1).alias("gap_start"),
        (F.col("min_lsn") - 1).alias("gap_end"),
        (F.col("min_lsn") - prev_end - 1).alias("gap_size"),
    )
    from ..operators.windows import gap_severity

    return joined.filter(
        F.col("gap_size").isNotNull() & (F.col("gap_size") > 0)
    ).withColumn("severity", gap_severity(F.col("gap_size")))


def batch_completeness(lineage: DataFrame) -> DataFrame:
    """Per (partition × applied-batch spine) arrival check — the
    source_completeness.sql:49-106 pattern with batches in place of
    business dates: a partition absent from a batch it should have
    contributed to is MISSING, with consecutive-missing streaks via the
    gaps-and-islands running sum."""
    per = lineage.groupBy("partition", "batch_id").agg(
        F.sum("rows_in").alias("rows_in")
    )
    parts = per.select("partition").distinct()
    batches = per.select("batch_id").distinct()
    expected = parts.crossJoin(batches)
    joined = expected.join(per, on=["partition", "batch_id"], how="left").select(
        "partition",
        "batch_id",
        F.coalesce("rows_in", F.lit(0)).alias("rows_in"),
    )
    status = joined.withColumn(
        "status",
        F.when(F.col("rows_in") == 0, "MISSING").otherwise("COMPLETE"),
    ).withColumn("is_missing", F.when(F.col("rows_in") == 0, 1).otherwise(0))
    out = consecutive_missing_streaks(status, "partition", "batch_id", "is_missing")
    return out.drop("is_missing")


def freshness_check(
    lineage: DataFrame,
    now,
    warn_after_seconds: int = 3600,
    error_after_seconds: int = 6 * 3600,
) -> DataFrame:
    """Per-partition freshness: seconds since the partition's last
    applied batch vs warn/error thresholds — `dbt source freshness`
    semantics (docs/testing.md:131-147) on `applied_at`.  `now` is an
    explicit timestamp so the check is deterministic and testable."""
    now_ts = F.lit(now).cast("timestamp")
    agg = lineage.groupBy("partition").agg(
        F.max("applied_at").alias("last_applied_at")
    )
    # cast("timestamp"): the input may be TIMESTAMP_NTZ (parquet), which
    # unix_seconds rejects; session tz is pinned UTC so the cast is exact
    lag = (
        F.unix_seconds(now_ts)
        - F.unix_seconds(F.col("last_applied_at").cast("timestamp"))
    ).cast("long")
    return agg.select(
        "partition",
        "last_applied_at",
        lag.alias("lag_seconds"),
        F.when(lag >= error_after_seconds, "ERROR")
        .when(lag >= warn_after_seconds, "WARN")
        .otherwise("OK")
        .alias("status"),
    )


class ControlRunner:
    """Runs the three control jobs over a pipeline's lineage table and
    persists their output as LakeTables under <base_dir>/control/.

    Each run is stamped with a control_epoch and committed with batch
    key ``control-<epoch>`` — idempotent under replays exactly like the
    data tables (a crashed control run re-executes and the manifest
    skips the tables that already recorded the epoch)."""

    def __init__(self, pipeline, warn_after_seconds=3600, error_after_seconds=21600):
        self.pipeline = pipeline
        self.warn = warn_after_seconds
        self.error = error_after_seconds
        spark = pipeline.spark
        cdir = os.path.join(pipeline.base_dir, "control")

        def tbl(name, schema, key):
            path = os.path.join(cdir, name)
            if LakeTable.exists(path):
                return LakeTable.load(spark, path)
            return LakeTable.create(spark, path, schema, key_col=key, n_buckets=1)

        self.gaps = tbl("sequence_gaps", GAP_SCHEMA, "partition")
        self.completeness = tbl("completeness", COMPLETENESS_SCHEMA, "partition")
        self.freshness = tbl("freshness", FRESHNESS_SCHEMA, "partition")

    def run(self, control_epoch: int, now=None) -> dict:
        bkey = f"control-{control_epoch}"
        lineage = self.pipeline.lineage.refresh().read()
        if now is None:
            now_row = lineage.agg(F.max("applied_at").alias("m")).first()
            now = now_row["m"]
        stamp = F.lit(control_epoch).cast("long").alias("control_epoch")
        stats: dict = {"control_epoch": control_epoch}

        if not self.gaps.has_batch(bkey):
            g = lineage_sequence_gaps(lineage).select(
                stamp, "partition", "gap_start", "gap_end", "gap_size", "severity"
            )
            self.gaps.append(g, batch_key=bkey)
        if not self.completeness.has_batch(bkey):
            c = batch_completeness(lineage).select(
                stamp,
                "partition",
                "batch_id",
                "rows_in",
                "status",
                F.col("reset_group").cast("long").alias("reset_group"),
                "consecutive_missing",
            )
            self.completeness.append(c, batch_key=bkey)
        if not self.freshness.has_batch(bkey):
            f = freshness_check(lineage, now, self.warn, self.error).select(
                stamp, "partition", "last_applied_at", "lag_seconds", "status"
            )
            self.freshness.append(f, batch_key=bkey)
        return stats

    def latest(self, table: LakeTable) -> DataFrame:
        df = table.refresh().read()
        mx = df.agg(F.max("control_epoch").alias("m")).first()["m"]
        return df.filter(F.col("control_epoch") == mx)
