"""Streaming replay: change-log tail → foreachBatch → CdcPipeline.

In production the source is Kafka (`spark.readStream.format("kafka")`,
SURVEY.md S8/T6) — the sandbox has no Kafka broker or connector jar, so
the log tail is a **file stream source** over the chunked parquet log
(each file ≈ one producer segment).  The two sources share the exact
contract that matters: checkpointed offsets, ordered micro-batches with
stable batch_ids, and replay of the in-flight batch after a crash —
which is what the exactly-once commit manifest is tested against.

``run_stream`` uses Trigger.AvailableNow (drain the backlog then stop);
``maxFilesPerTrigger`` bounds batch size (the reference bridge's
backpressure knob, bridge.py:55-58 ≈ maxOffsetsPerTrigger).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from .pipeline import CdcPipeline
from .schema import CHANGE_EVENT_SCHEMA


def run_stream(
    spark: SparkSession,
    log_dir: str,
    pipeline: CdcPipeline,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
    available_now: bool = True,
    stop_after_batches: int | None = None,
) -> int:
    """Replay the log through Structured Streaming; returns batches run.

    stop_after_batches simulates a crash mid-replay (kill-and-resume
    test): the query is stopped after N foreachBatch commits; restarting
    with the same checkpoint_dir resumes from the next batch (and
    re-delivers any in-flight one — idempotent under the manifests).
    """
    n_batches = {"n": 0, "stopped": False}

    class _StopEarly(Exception):
        pass

    def _apply(df, batch_id: int):
        pipeline.apply_batch(df, batch_id)
        n_batches["n"] += 1
        if stop_after_batches is not None and n_batches["n"] >= stop_after_batches:
            # flag BEFORE raising: Spark rewraps the exception (possibly
            # losing the message), so detection must not depend on the
            # exception text surviving the JVM round-trip
            n_batches["stopped"] = True
            raise _StopEarly()

    reader = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    try:
        q.awaitTermination()
    except Exception:  # noqa: BLE001 — surface real errors, swallow the probe
        if not n_batches["stopped"]:
            raise
    finally:
        if q.isActive:
            q.stop()
    return n_batches["n"]


def replay_batches(
    spark: SparkSession,
    log_dir: str,
    pipeline: CdcPipeline,
    files_per_batch: int = 2,
    start_batch_id: int = 0,
) -> int:
    """Batch-mode replay (no streaming machinery): group the log files
    into deterministic epochs and apply each through the same pipeline.
    Used by bench.py — identical semantics, minus checkpoint overhead."""
    files = sorted(glob.glob(os.path.join(log_dir, "*.parquet")))
    batch_id = start_batch_id
    for i in range(0, len(files), files_per_batch):
        chunk = files[i : i + files_per_batch]
        df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(*chunk)
        pipeline.apply_batch(df, batch_id)
        batch_id += 1
    return batch_id - start_batch_id
