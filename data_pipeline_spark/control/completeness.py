"""Source-completeness control model (SURVEY.md A1/J8/J9/W4).

Re-expression of dbt_project/models/control/source_completeness.sql:
expected (source × date-spine) left-joined to actual arrivals; status
MISSING / PARTIAL / COMPLETE; consecutive-missing streaks via the
gaps-and-islands running-sum pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import date_spine
from ..operators.windows import consecutive_missing_streaks


def source_completeness(
    arrivals: DataFrame,
    source_col: str,
    date_col: str,
    start: str,
    end: str,
    min_rows_per_day: int = 1,
) -> DataFrame:
    """arrivals: any event-level DataFrame with a source column and a
    date (or timestamp) column.  Returns one row per (source, day) with
    arrival counts, status, and consecutive-missing streaks."""
    spark = arrivals.sparkSession
    per_day = arrivals.groupBy(
        F.col(source_col).alias("source"),
        F.to_date(F.col(date_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("rows_received"))

    sources = per_day.select("source").distinct()
    spine = date_spine(spark, start, end)
    expected = sources.crossJoin(spine.withColumnRenamed("d", "day"))

    joined = expected.join(per_day, on=["source", "day"], how="left").select(
        "source",
        "day",
        F.coalesce("rows_received", F.lit(0)).alias("rows_received"),
    )
    status = joined.withColumn(
        "status",
        F.when(F.col("rows_received") == 0, "MISSING")
        .when(F.col("rows_received") < min_rows_per_day, "PARTIAL")
        .otherwise("COMPLETE"),
    ).withColumn(
        "is_missing", F.when(F.col("status") == "MISSING", 1).otherwise(0)
    )
    return consecutive_missing_streaks(status, "source", "day", "is_missing")
