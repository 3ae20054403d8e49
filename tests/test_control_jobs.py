"""Control jobs wired over a real pipeline's lineage table.

The reference runs sequence-gap / completeness / freshness models as
scheduled dbt jobs over control metadata; here ControlRunner persists
the same checks as LakeTables after a replay, idempotently per epoch.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.cdc.pipeline import CdcPipeline
from data_pipeline_spark.cdc.stream import replay_batches
from data_pipeline_spark.control.jobs import (
    ControlRunner,
    batch_completeness,
    freshness_check,
    lineage_sequence_gaps,
)


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    from data_pipeline_spark.cdc.synth import generate_change_log

    log = tmp_path_factory.mktemp("ctl-log")
    wh = tmp_path_factory.mktemp("ctl-wh")
    generate_change_log(str(log), n_docs=200, seed=11, n_files=4)
    pipe = CdcPipeline(spark, str(wh), n_buckets=4, compact_every=0)
    # one file per batch: the synth log's final file carries late
    # out-of-order events, so coarser batches would overlap in lsn and
    # (correctly) yield no positive inter-batch gaps to assert on
    replay_batches(spark, str(log), pipe, files_per_batch=1)
    return pipe


def test_runner_persists_all_three_tables(spark, replayed):
    runner = ControlRunner(replayed)
    runner.run(control_epoch=0)
    gaps = runner.latest(runner.gaps)
    comp = runner.latest(runner.completeness)
    fresh = runner.latest(runner.freshness)
    # completeness: one row per (partition × batch spine), all applied
    n_parts = replayed.lineage.read().select("partition").distinct().count()
    n_batches = replayed.lineage.read().select("batch_id").distinct().count()
    assert comp.count() == n_parts * n_batches
    assert comp.filter(F.col("status") == "MISSING").count() == 0
    # freshness: one row per partition, OK against its own max applied_at
    assert fresh.count() == n_parts
    assert {r.status for r in fresh.collect()} == {"OK"}
    # gaps: with a global interleaved lsn, per-partition gaps exist
    assert gaps.count() > 0
    assert set(gaps.columns) >= {"partition", "gap_start", "gap_end", "gap_size"}


def test_runner_is_idempotent_per_epoch(spark, replayed):
    runner = ControlRunner(replayed)
    runner.run(control_epoch=1)
    rows_before = runner.gaps.refresh().read().count()
    v_before = runner.gaps.version
    runner.run(control_epoch=1)  # replay of the same control epoch
    assert runner.gaps.refresh().read().count() == rows_before
    assert runner.gaps.version == v_before


def test_lineage_gap_math(spark):
    lineage = spark.createDataFrame(
        [
            (0, 0, 1, 10, 10, datetime.datetime(2024, 1, 1)),
            (0, 1, 15, 20, 6, datetime.datetime(2024, 1, 1, 1)),
            (1, 0, 11, 14, 4, datetime.datetime(2024, 1, 1)),
            (1, 1, 2015, 2020, 6, datetime.datetime(2024, 1, 1, 1)),
        ],
        "partition int, batch_id long, min_lsn long, max_lsn long, "
        "rows_in long, applied_at timestamp",
    )
    got = {
        (r.partition, r.gap_start, r.gap_end, r.gap_size, r.severity)
        for r in lineage_sequence_gaps(lineage).collect()
    }
    assert got == {
        (0, 11, 14, 4, "LOW"),
        (1, 15, 2014, 2000, "CRITICAL"),
    }


def test_completeness_detects_partition_missing_from_batch(spark):
    lineage = spark.createDataFrame(
        [
            (0, 0, 1, 5, 5, datetime.datetime(2024, 1, 1)),
            (0, 1, 6, 9, 4, datetime.datetime(2024, 1, 1)),
            (0, 2, 10, 12, 3, datetime.datetime(2024, 1, 1)),
            (1, 0, 1, 5, 5, datetime.datetime(2024, 1, 1)),
            # partition 1 missing from batches 1 and 2
        ],
        "partition int, batch_id long, min_lsn long, max_lsn long, "
        "rows_in long, applied_at timestamp",
    )
    out = batch_completeness(lineage)
    missing = {
        (r.partition, r.batch_id, r.consecutive_missing)
        for r in out.filter(F.col("status") == "MISSING").collect()
    }
    assert missing == {(1, 1, 1), (1, 2, 2)}  # streak counts up


def test_freshness_thresholds(spark):
    t = datetime.datetime(2024, 1, 1, 0, 0, 0)
    lineage = spark.createDataFrame(
        [
            (0, 0, 1, 5, 5, t),                                      # 26h stale
            (1, 0, 1, 5, 5, t + datetime.timedelta(hours=25)),       # 1h stale
            (2, 0, 1, 5, 5, t - datetime.timedelta(days=10)),        # very stale
        ],
        "partition int, batch_id long, min_lsn long, max_lsn long, "
        "rows_in long, applied_at timestamp",
    )
    out = freshness_check(
        lineage,
        now=t + datetime.timedelta(hours=26),
        warn_after_seconds=24 * 3600,
        error_after_seconds=72 * 3600,
    )
    got = {r.partition: r.status for r in out.collect()}
    assert got == {0: "WARN", 1: "OK", 2: "ERROR"}
