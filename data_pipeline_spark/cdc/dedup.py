"""Dedup operators: at-least-once arrival dedup + last-writer-wins reduce.

Reference semantics:
* W1 first-arrival dedup — `row_number() over (partition by rfq_id order
  by _ingestion_time) = 1` (dbt_project/models/staging/stg_rfqs.sql:17-27);
* W2 last-writer-wins — `row_number() over (partition by trade_id order
  by amendment_version desc) = 1` (docs/identity.md:168-177).

Scale design: the LWW reduce is the shuffle that precedes the MERGE, and
hot doc_ids (zipf skew) would funnel into single reduce tasks.  We salt:
phase 1 reduces per (key, salt) — salt derived from the ordering column,
so a hot key's events split across `salt_buckets` tasks and are combined
by max_by partial aggregation map-side; phase 2 reduces the ≤salt_buckets
survivors per key.  This is the classic two-level aggregation; AQE skew
handling complements it for the join side (north_rule "skewed hot keys
are salted before the merge shuffle").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_arrivals(
    df: DataFrame,
    key_cols: list[str] = ["doc_id", "lsn"],
    arrival_col: str = "ingest_ts",
) -> DataFrame:
    """Collapse duplicate deliveries of the same (doc_id, lsn): first
    arrival wins.  Payloads of true duplicates are identical, so this is
    a correctness-neutral, deterministic pick (min arrival_col).

    Implemented as min_by aggregation rather than a row_number window:
    an aggregate gets map-side partial combine (no full sort per key),
    which matters when duplicates are rare and keys are many.
    """
    others = [c for c in df.columns if c not in key_cols]
    packed = F.struct(*[F.col(c) for c in others])
    # min_by skips rows whose ordering value is NULL — coalesce to the
    # epoch floor so records without an ingest timestamp still survive
    order = F.coalesce(
        F.col(arrival_col), F.lit("1900-01-01 00:00:00").cast("timestamp")
    )
    out = df.groupBy(*key_cols).agg(F.min_by(packed, order).alias("_row"))
    return out.select(*key_cols, "_row.*")


def lww_reduce(
    df: DataFrame,
    key_col: str = "doc_id",
    order_col: str = "lsn",
    salt_buckets: int = 16,
) -> DataFrame:
    """Last-writer-wins: one row per key — the one with max order_col.

    Two-phase salted max_by (see module docstring).  Ties on order_col
    are broken by ingest_ts then deterministically by the packed struct
    itself (duplicates carry identical payloads, so any pick is equal).
    """
    others = [c for c in df.columns if c != key_col]
    packed = F.struct(*[F.col(c) for c in others])
    tie = (
        F.coalesce(F.col("ingest_ts"), F.lit("1900-01-01 00:00:00").cast("timestamp"))
        if "ingest_ts" in df.columns
        else F.col(order_col)
    )
    order_key = F.struct(F.col(order_col).alias("o1"), tie.alias("o2"))

    # Each phase aggregates with max_by ONLY: mixing max_by (typed-
    # imperative) with a declarative max(struct) forces SortAggregate —
    # a per-partition sort of the full batch.  Pure max_by runs as
    # ObjectHashAggregate (hash-based, map-side combine); phase 2
    # recomputes the ordering from the packed struct instead of carrying
    # a second aggregate.
    def _reorder(row: F.Column) -> F.Column:
        tie2 = (
            F.coalesce(
                row["ingest_ts"], F.lit("1900-01-01 00:00:00").cast("timestamp")
            )
            if "ingest_ts" in df.columns
            else row[order_col]
        )
        return F.struct(row[order_col].alias("o1"), tie2.alias("o2"))

    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets))
        phase1 = df.groupBy(F.col(key_col), salt.alias("_salt")).agg(
            F.max_by(packed, order_key).alias("_row")
        )
        out = phase1.groupBy(key_col).agg(
            F.max_by(F.col("_row"), _reorder(F.col("_row"))).alias("_row")
        )
    else:
        out = df.groupBy(key_col).agg(F.max_by(packed, order_key).alias("_row"))
    return out.select(key_col, "_row.*")
