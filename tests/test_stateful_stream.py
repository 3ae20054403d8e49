"""applyInPandasWithState custom stateful operator: per-doc running
state maintained across micro-batches in the streaming state store.

Drives a real streaming query (file source, one file per trigger →
multiple micro-batches) into a memory sink and checks the FINAL state
per doc against a batch-computed oracle; n_events must count across
batches, proving state actually persisted between triggers.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA
from data_pipeline_spark.cdc.stateful import running_doc_state


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    from data_pipeline_spark.cdc.synth import generate_change_log

    d = tmp_path_factory.mktemp("state-log")
    generate_change_log(str(d), n_docs=120, seed=23, n_files=4)
    return str(d)


def test_running_state_across_batches(spark, log_dir, tmp_path):
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
        .filter(F.col("op").isin("I", "U", "D"))
    )
    q = (
        running_doc_state(stream)
        .writeStream.format("memory")
        .queryName("running_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode memory sink appends every per-batch emission;
    # n_events is monotone per doc, so the final state is the max row
    got = (
        spark.table("running_state")
        .groupBy("doc_id")
        .agg(
            F.max_by(F.struct("lsn", "n_events", "deleted"), "n_events").alias("s")
        )
        .select("doc_id", "s.*")
    )
    got_map = {r.doc_id: (r.lsn, r.n_events, r.deleted) for r in got.collect()}

    # batch oracle over the whole log
    batch = (
        spark.read.schema(CHANGE_EVENT_SCHEMA)
        .parquet(*sorted(glob.glob(log_dir + "/*.parquet")))
        .filter(F.col("op").isin("I", "U", "D"))
    )
    exp = (
        batch.groupBy("doc_id")
        .agg(
            F.max("lsn").alias("lsn"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max_by(F.col("op"), F.col("lsn")) == "D").alias("deleted"),
        )
    )
    exp_map = {r.doc_id: (r.lsn, r.n_events, r.deleted) for r in exp.collect()}

    assert set(got_map) == set(exp_map)
    mismatches = {
        k: (got_map[k], exp_map[k])
        for k in exp_map
        if got_map[k][:2] != exp_map[k][:2]
    }
    assert not mismatches, list(mismatches.items())[:5]
    # deleted flag: compare only where the max-lsn op is unambiguous
    # (synth never duplicates distinct ops at one lsn, so compare all)
    flag_mismatch = {k for k in exp_map if got_map[k][2] != exp_map[k][2]}
    assert not flag_mismatch

    # multiple batches actually ran (state crossed triggers)
    n_updates = spark.table("running_state").count()
    n_docs = len(exp_map)
    assert n_updates > n_docs  # docs appeared in >1 micro-batch


def test_update_counts_malformed_rows_in_n_events():
    """RUNNING_STATE_SCHEMA documents n_events as 'events seen (incl.
    dups)' — malformed null-lsn rows are seen, so they count, while
    staying excluded from lsn/tombstone ordering (review finding)."""
    import pandas as pd

    from data_pipeline_spark.cdc.stateful import _update

    class _FakeState:
        exists = False

        def update(self, v):
            self.value = v

    state = _FakeState()
    pdf = pd.DataFrame(
        {"doc_id": ["d1"] * 3, "lsn": [5.0, None, 7.0], "op": ["U", "X", "D"]}
    )
    out = list(_update(("d1",), iter([pdf]), state))
    assert state.value == (7, 3, True)  # 3 rows seen, max lsn 7, delete
    assert out[0]["n_events"].iloc[0] == 3
