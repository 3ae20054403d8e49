"""Join operators (SURVEY.md §2.3).

The scale commitments: equi-keys first so Catalyst picks hash/SMJ joins
(range predicates ride along as join-condition filters, never turning
the join into a cartesian); dimension sides get broadcast() hints when
small (J3/J11); AQE's skew-join splitting covers residual hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    valid_from_col: str = "valid_from_utc",
    valid_to_col: str = "valid_to_utc",
    broadcast_dim: bool = True,
    how: str = "left",
) -> DataFrame:
    """J1 — point-in-time join to an SCD2 dimension
    (trades_enriched.sql:194-197): equi on key + fact ts within the
    dim row's validity interval (open-ended when valid_to is null).

    The equi key keeps this a hash join; the interval check is a join
    condition evaluated on matches only."""
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = (
        (facts[key] == d[key])
        & (facts[ts_col] >= d[valid_from_col])
        & (d[valid_to_col].isNull() | (facts[ts_col] < d[valid_to_col]))
    )
    return facts.join(d, cond, how)


def two_stage_fallback_join(
    facts: DataFrame,
    dim: DataFrame,
    id_key: str,
    name_key_fact: Column,
    name_key_dim: Column,
    value_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J2 — join by id when present, else by normalised name; results
    coalesced (trades_enriched.sql:199-212)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    by_id = facts.join(
        d.select(F.col(id_key), F.col(value_col).alias("_v_id")),
        on=(facts[id_key].isNotNull()) & (facts[id_key] == d[id_key]),
        how="left",
    ).drop(d[id_key])
    d2 = (F.broadcast(dim) if broadcast_dim else dim).select(
        name_key_dim.alias("_nk"), F.col(value_col).alias("_v_name")
    )
    both = by_id.join(
        d2,
        on=(by_id[id_key].isNull()) & (name_key_fact == d2["_nk"]),
        how="left",
    ).drop("_nk")
    return both.withColumn(
        value_col + "_resolved", F.coalesce("_v_id", "_v_name")
    ).drop("_v_id", "_v_name")


def date_spine(spark, start: str, end: str) -> DataFrame:
    """J8/F8 — date series [start, end] inclusive
    (dbt date_spine / generate_date_array)."""
    return spark.sql(
        f"SELECT explode(sequence(date'{start}', date'{end}', interval 1 day)) AS d"
    )
