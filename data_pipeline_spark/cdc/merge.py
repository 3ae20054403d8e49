"""Key-partitioned MERGE upsert into a LakeTable (SURVEY.md C1/C2/C9).

Semantics of one merge (the dbt-incremental / Iceberg MERGE INTO
analogue, trades_enriched.sql:2-13 + docs/identity.md:70-87):

    MERGE INTO target t USING deduped_changes s ON t.doc_id = s.doc_id
    WHEN MATCHED  AND s.lsn > t.lsn AND s.op =  'D' THEN DELETE
    WHEN MATCHED  AND s.lsn > t.lsn AND s.op != 'D' THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

The lsn guard makes replays and late/duplicate batches no-ops (T4),
which is what makes the whole pipeline idempotent and exactly-once
composable with the commit manifest.

Scale design: changes are reduced to one row per key BEFORE the join
(lww_reduce, salted), then only the hash-buckets containing affected
keys are read and rewritten (copy-on-write at bucket granularity —
per-batch cost ∝ touched data, not table size).  The join itself is a
full-outer on doc_id between the touched buckets and the (small,
per-key-reduced) change set; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..table.laketable import LakeTable


def merge_into(
    table: LakeTable,
    changes: DataFrame,
    batch_id: int | str,
    extra_stamp_cols: dict | None = None,
) -> dict:
    """Apply a per-key-reduced change set to the table; returns metrics.

    `changes` must have exactly one row per doc_id (use lww_reduce) and
    carry: doc_id, lsn, op, and the table's payload columns.
    """
    key = table.key_col
    payload_cols = [
        f.name
        for f in table.schema.fields
        if f.name not in (key, "lsn") and not f.name.startswith("_")
    ]

    d = changes.withColumn("_b", table.bucket_of(key))
    affected = [r[0] for r in d.select("_b").distinct().collect()]
    if not affected:
        table.record_batch(str(batch_id), {"rows_upserted": 0, "rows_deleted": 0})
        return {"rows_upserted": 0, "rows_deleted": 0, "buckets": []}

    t = table.read(buckets=affected)

    joined = t.alias("t").join(d.alias("d"), on=key, how="full_outer")
    d_exists = F.col("d.lsn").isNotNull()
    t_exists = F.col("t.lsn").isNotNull()
    take_d = d_exists & (~t_exists | (F.col("d.lsn") > F.col("t.lsn")))
    is_delete = take_d & (F.col("d.op") == "D")
    keep = ~is_delete & (t_exists | (d_exists & (F.col("d.op") != "D")))

    stamp = {
        "_batch_id": F.lit(int(batch_id) if str(batch_id).isdigit() else None).cast("long"),
        "_applied_at": F.current_timestamp(),
        **(extra_stamp_cols or {}),
    }
    select_cols = [F.col(key)]
    for c in payload_cols:
        d_val = F.col(f"d.{c}") if c in changes.columns else F.lit(None)
        select_cols.append(
            F.when(take_d, d_val).otherwise(F.col(f"t.{c}")).alias(c)
        )
    select_cols.append(
        F.when(take_d, F.col("d.lsn")).otherwise(F.col("t.lsn")).alias("lsn")
    )
    for name in [f.name for f in table.schema.fields if f.name.startswith("_")]:
        select_cols.append(
            F.when(take_d, stamp[name]).otherwise(F.col(f"t.{name}")).alias(name)
        )

    merged = joined.filter(keep).select(*select_cols)

    table.replace_buckets(
        merged,
        affected,
        batch_key=str(batch_id),
        batch_info={"buckets": sorted(affected)},
    )
    return {"buckets": sorted(affected)}
