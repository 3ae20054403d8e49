"""Streaming-state dedup (dropDuplicatesWithinWatermark wrapper):

* a re-delivery of the same (doc_id, lsn) inside the watermark delay is
  dropped — including ACROSS triggers (state persisted between
  micro-batches);
* once the watermark passes the original, its state is evicted and a
  later re-delivery is re-admitted — bounded state is the point; the
  batch-layer merge reduce de-dupes such late duplicates downstream.
  (The Spark contract only GUARANTEES dedup within the delay; dropping
  beyond it is best-effort.  This test pins the eviction behaviour so
  a Spark upgrade that changes it is surfaced, because the engine's
  composition argument — stream layer bounded, batch layer exact —
  relies on re-admitted duplicates being possible.)

Trigger ordering is forced with one file per trigger and a file source
(oldest-first by modification time; writes below are sequential).
"""

from __future__ import annotations

import datetime as dt
import os
import time

from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA
from data_pipeline_spark.cdc.stream import dedup_within_watermark


def _write_file(spark, path, rows):
    # the file source lists FLAT files only — write via a temp dir and
    # move the single part file up as <path>.parquet
    import glob
    import shutil

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    data = [
        (doc, lsn, "U", [1, 2, 3], 3, None, None, 0,
         base + dt.timedelta(minutes=mins))
        for doc, lsn, mins in rows
    ]
    tmp = path + ".tmpdir"
    spark.createDataFrame(data, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, path + ".parquet")
    shutil.rmtree(tmp)
    time.sleep(1.1)  # distinct mtimes → deterministic trigger order


def test_dedup_within_watermark_cross_trigger_and_expiry(spark, tmp_path):
    log = str(tmp_path / "log")
    os.makedirs(log)
    # trigger 1: d1@1 twice IN-batch (one survives), d2@1 once
    _write_file(spark, os.path.join(log, "f1"), [
        ("d1", 1, 0), ("d1", 1, 0), ("d2", 1, 1),
    ])
    # trigger 2 (+2 min, inside the 10-min delay): d1@1 again → dropped
    # by state persisted ACROSS the trigger boundary; d1@2 (new lsn) kept
    _write_file(spark, os.path.join(log, "f2"), [
        ("d1", 1, 2), ("d1", 2, 2),
    ])
    # triggers 3+4: event time advances to +60 → the watermark
    # (60 - 10 = +50) passes the originals (+0..2).  TWO advancing
    # triggers because state cleanup runs at trigger end with the
    # watermark computed from the PREVIOUS trigger's data — eviction
    # of the +0..2 entries lands at the end of trigger 4
    _write_file(spark, os.path.join(log, "f3"), [("adv", 1, 60)])
    _write_file(spark, os.path.join(log, "f4"), [("adv", 2, 65)])
    # trigger 5: the same (d1, 1) re-arrives AFTER eviction → re-admitted
    _write_file(spark, os.path.join(log, "f5"), [("d1", 1, 66)])

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(log)
    )
    q = (
        dedup_within_watermark(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = [
        (r.doc_id, r.lsn, r.ingest_ts.minute)
        for r in spark.table("dedup_stream")
        .select("doc_id", "lsn", "ingest_ts")
        .orderBy("ingest_ts", "doc_id", "lsn")
        .collect()
    ]
    assert got == [
        ("d1", 1, 0),    # first arrival survives (in-batch dupe dropped)
        ("d2", 1, 1),
        ("d1", 2, 2),    # new lsn is not a duplicate
        ("adv", 1, 0),   # minute 0 of 13:00
        ("adv", 2, 5),
        ("d1", 1, 6),    # re-delivery after state eviction, re-admitted
    ], got

    # schema passes through unchanged
    assert [f.name for f in spark.table("dedup_stream").schema.fields] == [
        f.name for f in CHANGE_EVENT_SCHEMA.fields
    ]
