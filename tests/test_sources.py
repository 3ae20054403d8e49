"""Validated source readers + file sinks (SURVEY.md S1-S3, S11-S12).

Mirrors the reference's parser tests (docs/testing.md:237-309): typed
CSV/JSON reads with per-field constraint checks, bad rows quarantined
with reasons while good rows proceed, `_load_id` lineage stamping, and
the windowed extract sink.
"""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from data_pipeline_spark.sources.readers import (
    FieldSpec,
    read_csv_validated,
    read_json_validated,
)
from data_pipeline_spark.sources.rules import Rule
from data_pipeline_spark.sources.sinks import extract_window_df, write_extract

SPECS = [
    FieldSpec("trade_id", "string", nullable=False),
    FieldSpec("quantity", "long", min_value=1),
    FieldSpec("price", "double"),
    FieldSpec("side", "string", allowed_values=["BUY", "SELL"]),
]

CSV_ROWS = [
    "trade_id,quantity,price,side",
    "t1,100,9.5,BUY",        # valid
    "t2,notanum,9.5,SELL",   # quantity cast failure
    "t3,-5,9.5,BUY",         # min_value violation
    "t4,10,1.25,HOLD",       # allowed_values violation
    ",10,1.25,SELL",         # not-null violation
    "t6,7,,SELL",            # null price is fine (nullable)
]


def test_csv_validated_quarantine_split(spark, tmp_path):
    p = tmp_path / "trades.csv"
    p.write_text("\n".join(CSV_ROWS) + "\n")
    out = read_csv_validated(spark, str(p), SPECS, load_id="load-1")

    valid = {r["trade_id"]: r for r in out.valid.collect()}
    assert set(valid) == {"t1", "t6"}
    assert valid["t1"]["quantity"] == 100 and valid["t1"]["price"] == 9.5
    assert valid["t6"]["price"] is None
    assert all(r["_load_id"] == "load-1" for r in valid.values())

    quar = {r["trade_id"]: r["failure_reasons"] for r in out.quarantined.collect()}
    assert quar["t2"] == "quantity:cast"
    assert "quantity:min" in quar["t3"]
    assert "side:allowed" in quar["t4"]
    assert any("not_null" in r for r in quar.values())
    assert out.quarantined.count() == 4


def test_csv_extra_rules_warning_path(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("trade_id,quantity,price,side\nt1,100,9.5,BUY\nt2,2,0.5,SELL\n")
    out = read_csv_validated(
        spark, str(p), SPECS, rules=[Rule("price > 1", "warning", "price_low")]
    )
    assert out.valid.count() == 2  # warnings never drop rows
    warns = out.warnings.collect()
    assert len(warns) == 1 and warns[0]["trade_id"] == "t2"


def test_jsonl_validated(spark, tmp_path):
    p = tmp_path / "trades.jsonl"
    rows = [
        {"trade_id": "j1", "quantity": "5", "price": "1.5", "side": "BUY"},
        {"trade_id": "j2", "quantity": "oops", "price": "1.5", "side": "SELL"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = read_json_validated(spark, str(p), SPECS)
    assert [r["trade_id"] for r in out.valid.collect()] == ["j1"]
    assert [r["trade_id"] for r in out.quarantined.collect()] == ["j2"]


def test_extract_window_and_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("a", "2024-03-01 00:00:00"),
            ("b", "2024-03-09 12:00:00"),
            ("c", "2024-03-10 00:00:00"),
        ],
        "id string, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))

    win = extract_window_df(df, "ts", window_days=7)
    assert {r["id"] for r in win.collect()} == {"b", "c"}

    out_dir = str(tmp_path / "extract")
    write_extract(df, out_dir, ts_col="ts", window_days=7)
    files = glob.glob(os.path.join(out_dir, "*.json.gz"))
    assert files, "expected gzip JSONL part files"
    ids = set()
    for f in files:
        with gzip.open(f, "rt") as fh:
            for line in fh:
                ids.add(json.loads(line)["id"])
    assert ids == {"b", "c"}


def test_arrow_roundtrip(spark):
    """S7 — Arrow table in, Arrow table out, values and schema intact."""
    import pyarrow as pa

    from data_pipeline_spark.sources.readers import df_to_arrow, load_arrow

    t = pa.table(
        {
            "k": pa.array(["a", "b", "c"]),
            "v": pa.array([1, 2, 3], type=pa.int64()),
            "tokens": pa.array([[1, 2], [3], []], type=pa.list_(pa.int32())),
        }
    )
    df = load_arrow(spark, t)
    assert df.count() == 3
    assert dict(df.dtypes)["tokens"] == "array<int>"
    back = df_to_arrow(df.orderBy("k"))
    assert back.column("k").to_pylist() == ["a", "b", "c"]
    assert back.column("tokens").to_pylist() == [[1, 2], [3], []]
