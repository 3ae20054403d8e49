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
