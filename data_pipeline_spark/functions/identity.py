"""Deterministic identity functions (SURVEY.md F1-F3).

The reference's idempotency keystone is a namespaced md5 business key
(dbt_project/macros/generate_trade_id.sql:39-51, docs/identity.md:23-57):
same input → same id → MERGE overwrites → replay-safe.  These are the
Spark equivalents; all JVM-side expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NAMESPACE = "data-pipeline-spark"  # engine's own namespace (immutable, like the reference's UUID)


def deterministic_id(*parts: Column | str, namespace: str = NAMESPACE) -> Column:
    """md5 hex of 'namespace:part:part:...' — the generate_trade_id analogue."""
    cols = [F.lit(namespace)] + [
        F.coalesce((F.col(p) if isinstance(p, str) else p).cast("string"), F.lit(""))
        for p in parts
    ]
    return F.md5(F.concat_ws(":", *cols))


def surrogate_key_md5(*parts: Column | str, sep: str = "|") -> Column:
    """64-bit int surrogate key with exact parity to the reference's
    BigQuery branch (md5-hex prefix → int): first 15 hex chars → BIGINT
    (60 bits, always positive; cross_db/sk.sql:17-32).

    15 (not 16) chars so the value fits signed int64 in every engine —
    DuckDB mirrors it as ('0x' || substr(md5(x),1,15))::BIGINT.
    """
    concat = F.concat_ws(
        sep,
        *[
            F.coalesce((F.col(p) if isinstance(p, str) else p).cast("string"), F.lit(""))
            for p in parts
        ],
    )
    return F.conv(F.substring(F.md5(concat), 1, 15), 16, 10).cast("long")


def surrogate_key_xxhash(*parts: Column | str) -> Column:
    """Cheaper engine-internal surrogate key (no cross-engine parity):
    xxhash64 of the parts — used for bucketing and salting."""
    return F.xxhash64(*[(F.col(p) if isinstance(p, str) else p) for p in parts])
