"""SCD2 / bi-temporal history maintenance (SURVEY.md C4-C7, J7, W8).

The history table keeps EVERY (doc_id, lsn) version — including delete
tombstones — with validity ranges:

    valid_from_utc = the version's ingest timestamp
    valid_to_utc   = next version's valid_from - 1s, else END_OF_TIME
    is_current     = last version && op != 'D'

This is the reference's scd2_merge + close_prior_versions flow
(basic_orchestrator/dbt/macros/scd2/scd2_merge.sql:44-108,
close_prior_versions.sql:13-75): inserting a new version must close the
previously-current row, and a late-arriving older version slots into the
middle of the chain (bi-temporal correction) — so closure is recomputed
for every affected key.

The closure kernel runs as **groupBy(bucket).applyInPandas over Arrow
batches** (north_star requirement).  Grouping by storage bucket rather
than by doc_id keeps groups large (thousands of keys per Arrow batch,
vectorized pandas inside — no per-row Python and no per-key UDF-call
overhead), and aligns the shuffle with the table's bucket layout so the
rewrite needs no second shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..table.laketable import BUCKET_COL, LakeTable
from .schema import END_OF_TIME

_END_OF_TIME_TS = pd.Timestamp(END_OF_TIME).as_unit("us")


def _close_versions(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized validity-range closure for one bucket of keys.

    valid_to = lead(valid_from) over (partition by doc_id order by lsn)
    minus 1s (close_prior_versions.sql:22,44); last version stays open at
    END_OF_TIME and is current unless it is a delete tombstone.

    Timestamps are handled in microsecond units throughout: Spark
    timestamps are µs-precision and the 9999-12-31 sentinel overflows
    pandas' default datetime64[ns].
    """
    import numpy as np

    pdf = pdf.sort_values(["doc_id", "lsn"], kind="mergesort")
    pdf["valid_from_utc"] = pdf["valid_from_utc"].astype("datetime64[us]")
    nxt = (
        pdf.groupby("doc_id")["valid_from_utc"]
        .shift(-1)
        .to_numpy(dtype="datetime64[us]")
    )
    missing = pd.isna(nxt)
    valid_to = nxt - np.timedelta64(1, "s")
    valid_to[missing] = np.datetime64(END_OF_TIME.replace(" ", "T"), "us")
    pdf["valid_to_utc"] = valid_to
    pdf["is_current"] = missing & (pdf["op"] != "D").to_numpy()
    return pdf


def apply_history(
    history: LakeTable,
    new_versions: DataFrame,
    batch_id: int | str,
) -> dict:
    """Append this batch's versions and re-close affected buckets.

    `new_versions` must be arrival-deduped (one row per (doc_id, lsn))
    and carry doc_id, lsn, op, payload columns, and ingest_ts.
    """
    key = history.key_col
    payload_cols = [
        f.name
        for f in history.schema.fields
        if f.name in new_versions.columns
        and f.name not in (key, "lsn", "op", "valid_from_utc", "valid_to_utc", "is_current")
    ]

    nv = new_versions.select(
        key,
        "lsn",
        "op",
        *payload_cols,
        F.col("ingest_ts").alias("valid_from_utc"),
    )
    nv = nv.withColumn("_b", history.bucket_of(key))
    affected = [r[0] for r in nv.select("_b").distinct().collect()]
    if not affected:
        history.record_batch(str(batch_id), {"versions": 0})
        return {"buckets": []}

    existing = history.read(buckets=affected).drop("valid_to_utc", "is_current")
    nv = nv.drop("_b")
    for f in history.schema.fields:
        if f.name not in nv.columns and f.name not in ("valid_to_utc", "is_current"):
            nv = nv.withColumn(f.name, F.lit(None).cast(f.dataType))
    nv = nv.select(*existing.columns)

    combined = existing.unionByName(nv)
    # a replayed batch may re-deliver versions already in the table —
    # idempotent under this dedup (first copy wins; copies are identical)
    combined = combined.dropDuplicates([key, "lsn"])
    combined = combined.withColumn(BUCKET_COL, history.bucket_of(key))

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(history.schema.fields) + [StructField(BUCKET_COL, IntegerType())]
    )
    closed = combined.groupBy(BUCKET_COL).applyInPandas(
        _close_versions, schema=out_schema
    ).drop(BUCKET_COL)

    history.replace_buckets(
        closed,
        affected,
        batch_key=str(batch_id),
        batch_info={"buckets": sorted(affected)},
    )
    return {"buckets": sorted(affected)}


def as_of(history_df: DataFrame, ts) -> DataFrame:
    """Time-travel predicate (basic_orchestrator/dbt/macros/time_travel.sql:22-24):
    the version visible at `ts`, excluding delete tombstones."""
    t = F.lit(ts).cast("timestamp")
    return history_df.filter(
        (F.col("valid_from_utc") <= t) & (F.col("valid_to_utc") >= t) & (F.col("op") != "D")
    )


def current(history_df: DataFrame) -> DataFrame:
    """The `_current` view (fact_futures_order_event_current.sql:67-68)."""
    return history_df.filter(F.col("is_current"))
