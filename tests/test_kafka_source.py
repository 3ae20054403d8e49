"""Kafka source contract: value decode on literal Kafka-shaped rows.

No broker/connector jar exists in the sandbox, so the streaming reader
itself cannot run; the decode transform (the part with logic) is tested
on a batch frame with Kafka's exact record shape — binary key/value,
topic/partition/offset/timestamp — including metadata backfill and the
malformed-value path.
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_pipeline_spark.cdc.stream import decode_kafka_value, kafka_reader_options

KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _rec(payload: dict | bytes, partition=0, offset=0, ts=T0, key=b"k"):
    value = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    return (key, value, "cdc.docs", partition, offset, ts, 0)


def test_decode_full_payload(spark):
    ev = {
        "doc_id": "d1",
        "lsn": 42,
        "op": "U",
        "tokens": [1, 2, 3],
        "n_tok": 3,
        "source": "crawl",
        "partition": 7,
        "ingest_ts": "2024-03-01T11:59:00",
    }
    raw = spark.createDataFrame([_rec(ev, partition=3, offset=900)], KAFKA_RECORD_SCHEMA)
    (row,) = decode_kafka_value(raw).collect()
    assert row.doc_id == "d1"
    assert row.lsn == 42          # payload lsn wins over kafka offset
    assert row.op == "U"
    assert row.tokens == [1, 2, 3]
    assert row.n_tok == 3
    assert row.source == "crawl"
    assert row.partition == 7     # payload partition wins
    assert row.ingest_ts == datetime.datetime(2024, 3, 1, 11, 59, 0)


def test_decode_backfills_kafka_metadata(spark):
    """lsn ← offset, partition ← kafka partition, ingest_ts ← record
    timestamp when the payload omits them (bridge.py:241-245)."""
    ev = {"doc_id": "d2", "op": "I", "tokens": [9], "n_tok": 1}
    raw = spark.createDataFrame(
        [_rec(ev, partition=5, offset=1234, ts=T0)], KAFKA_RECORD_SCHEMA
    )
    (row,) = decode_kafka_value(raw).collect()
    assert row.lsn == 1234
    assert row.partition == 5
    assert row.ingest_ts == T0


def test_decode_malformed_value_yields_quarantinable_row(spark):
    """A non-JSON value must not kill the stream: from_json yields NULL
    fields, which the pipeline's validation split dead-letters (T9)."""
    raw = spark.createDataFrame(
        [_rec(b"\xff\xfenot-json", partition=1, offset=77)], KAFKA_RECORD_SCHEMA
    )
    (row,) = decode_kafka_value(raw).collect()
    assert row.doc_id is None          # → null_key dead-letter
    assert row.lsn == 77               # metadata still backfilled
    assert row.partition == 1
    # schema matches the change-event contract exactly
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    assert decode_kafka_value(raw).schema == CHANGE_EVENT_SCHEMA


def test_reader_options():
    opts = kafka_reader_options(
        "broker:9092", "cdc.docs", "latest", max_offsets_per_trigger=50_000
    )
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "cdc.docs"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["failOnDataLoss"] == "true"


def test_encode_decode_roundtrip_identity(spark):
    """decode(encode(df)) == df for every CHANGE_EVENT_SCHEMA frame,
    nulls included (offset/timestamp mirror lsn/ingest_ts, so the
    coalesce backfill reproduces nulls instead of resurrecting them)."""
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA
    from data_pipeline_spark.cdc.stream import encode_kafka_value

    rows = [
        ("d1", 5, "U", [1, 2], 2, "crawl", None, 3, T0),
        ("d2", None, "I", None, None, None, None, None, None),  # malformed
        (None, 9, "D", None, None, None, None, 0, T0),  # null key
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    back = decode_kafka_value(encode_kafka_value(df))
    assert back.schema == CHANGE_EVENT_SCHEMA
    # repr() as sort key: None-safe total order over mixed tuples
    assert sorted(map(tuple, back.collect()), key=repr) == sorted(
        map(tuple, df.collect()), key=repr
    )


def test_kafka_shaped_stream_end_to_end(spark, tmp_path):
    """VERDICT r2 #3: exercise decode_kafka_value INSIDE a real
    Structured Streaming query (file stream of Kafka-wire-shaped
    records, no broker needed), through foreachBatch → CdcPipeline,
    with a crash mid-replay and a resume — final table must equal the
    reference reducer's expected state, token-for-token."""
    from data_pipeline_spark.cdc.oracle import (
        assert_tokens_equal,
        expected_final_state,
        load_log,
    )
    from data_pipeline_spark.cdc.pipeline import CdcPipeline
    from data_pipeline_spark.cdc.stream import (
        KAFKA_RECORD_SCHEMA,
        encode_kafka_value,
    )
    from data_pipeline_spark.cdc.synth import generate_change_log

    log_dir = str(tmp_path / "log")
    wire_dir = str(tmp_path / "wire")
    generate_change_log(log_dir, n_docs=80, seed=31, n_files=6)

    # producer side: re-publish each log segment as one Kafka-wire file
    # (file ≈ topic segment; preserves segment boundaries → same
    # micro-batching as the file-stream replay)
    import glob as _glob

    for f in sorted(_glob.glob(log_dir + "/*.parquet")):
        seg = spark.read.parquet(f)
        encode_kafka_value(seg).coalesce(1).write.mode("append").parquet(wire_dir)

    def run(pipe, stop_after=None):
        n = {"n": 0, "stopped": False}

        class _Stop(Exception):
            pass

        def _apply(df, batch_id):
            pipe.apply_batch(decode_kafka_value(df), batch_id)
            n["n"] += 1
            if stop_after is not None and n["n"] >= stop_after:
                n["stopped"] = True
                raise _Stop()

        q = (
            spark.readStream.schema(KAFKA_RECORD_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(wire_dir)
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception:
            if not n["stopped"]:
                raise
        finally:
            if q.isActive:
                q.stop()

    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=8)
    run(pipe, stop_after=1)  # crash after first micro-batch commit
    pipe2 = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=8)
    run(pipe2)  # resume from checkpoint (re-delivers in-flight batch)

    got = pipe2.current_state().select("doc_id", "tokens", "n_tok", "source")
    assert_tokens_equal(got.toPandas(), expected_final_state(load_log(log_dir)))
