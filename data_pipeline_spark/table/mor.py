"""Merge-on-read delta resolution — shared by every TableFormat binding.

The STORAGE protocol (how commits are published, how state is
reconstructed, where files live) is what distinguishes one table format
from another — :class:`~.laketable.LakeTable` (Iceberg-style snapshots
+ CAS pointer) and :class:`~.deltalog.DeltaLogTable` (Delta-style
ordered action log + checkpoints) each implement their own.  The
SCAN-side semantics of a delta lane, however, are format-independent
(Iceberg v2 readers and Hudi MoR readers agree on them), so both
bindings delegate here:

* ``patch`` mode — delta rows overwrite ``patch_cols`` of the base row
  identified by ``row_id_cols``; the latest commit (``_dseq``) wins.
* ``upsert`` mode — delta rows are whole row versions / tombstones;
  one survivor per row id (highest ``order_cols``, base-wins-ties via
  earliest ``_dseq``, last arrival by ``_ord_ts`` within a commit),
  then an order-guarded LWW against the base scan.

Plan shape in both modes: the delta side is reduced first and is
O(batches since last compaction), so Spark's size-based planning
broadcasts it — the base scan never shuffles at read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# delta-lane system columns
DSEQ_COL = "_dseq"        # commit-order stamp: later patches win per row id
DOP_COL = "_op"           # upsert mode: I/U/D of the delta row
DORD_COL = "_ord_ts"      # upsert mode: arrival tie-break at equal order key
DINBASE_COL = "_in_base"  # upsert mode: row id existed in base at write


def validate_mor(cfg: dict, schema: StructType, key_col: str) -> None:
    mode = cfg.get("mode")
    if mode not in ("patch", "upsert"):
        raise ValueError(f"merge_on_read.mode must be patch|upsert, got {mode!r}")
    names = {f.name for f in schema.fields}
    ids = cfg.get("row_id_cols") or []
    if not ids or any(c not in names for c in ids) or ids[0] != key_col:
        raise ValueError(
            f"merge_on_read.row_id_cols {ids} must be schema columns led by "
            f"the bucket key {key_col!r}"
        )
    if mode == "patch":
        pcols = cfg.get("patch_cols") or []
        if not pcols or any(c not in names or c in ids for c in pcols):
            raise ValueError(f"merge_on_read.patch_cols invalid: {pcols}")
    else:
        ocols = cfg.get("order_cols") or []
        if not ocols or any(c not in names for c in ocols):
            raise ValueError(f"merge_on_read.order_cols invalid: {ocols}")


def delta_schema(schema: StructType, mor: dict) -> StructType:
    """On-disk schema of a delta file for the given table schema/mode."""
    by_name = {f.name: f for f in schema.fields}
    if mor["mode"] == "patch":
        return StructType(
            [by_name[c] for c in mor["row_id_cols"]]
            + [by_name[c] for c in mor["patch_cols"]]
            + [StructField(DSEQ_COL, LongType())]
        )
    return StructType(
        list(schema.fields)
        + [
            StructField(DOP_COL, StringType()),
            StructField(DORD_COL, TimestampType()),
            StructField(DINBASE_COL, BooleanType()),
            StructField(DSEQ_COL, LongType()),
        ]
    )


# force-broadcast ceiling for the reduced delta side: Spark's own
# auto-broadcast cuts off at 10 MB, but a shuffle of the (much larger)
# base to join a 10-200 MB delta is exactly the wrong trade — the lane
# is bounded by compaction cadence, so a generous explicit ceiling
# keeps the read map-side between folds.  (On object storage the bytes
# would come from commit manifests instead of os.stat.)
BROADCAST_DELTA_MAX_BYTES = 256 * 1024 * 1024


def resolve_deltas(
    spark: SparkSession,
    schema: StructType,
    mor: dict,
    base: DataFrame,
    dpaths: list[str],
) -> DataFrame:
    """Merge a delta lane into a base scan; returns exactly `schema`."""
    import os

    ids = list(mor["row_id_cols"])
    delta = spark.read.schema(delta_schema(schema, mor)).parquet(*dpaths)
    try:
        dbytes = sum(os.path.getsize(p) for p in dpaths)
    except OSError:
        dbytes = None
    bcast = (
        F.broadcast
        if dbytes is not None and dbytes < BROADCAST_DELTA_MAX_BYTES
        else (lambda df: df)
    )
    if mor["mode"] == "patch":
        pcols = list(mor["patch_cols"])
        latest = (
            delta.groupBy(*ids)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in pcols]), F.col(DSEQ_COL)
                ).alias("_p")
            )
            .select(
                *ids,
                *[F.col(f"_p.{c}").alias(f"_patch_{c}") for c in pcols],
                F.lit(True).alias("_patched"),
            )
        )
        return base.join(bcast(latest), ids, "left").select(
            *[
                F.when(F.col("_patched"), F.col(f"_patch_{f.name}"))
                .otherwise(F.col(f.name))
                .alias(f.name)
                if f.name in pcols
                else F.col(f.name)
                for f in schema.fields
            ]
        )

    # upsert mode: delta rows are whole row versions / tombstones.
    ocols = list(mor["order_cols"])
    # one surviving delta row per id: highest order key wins; at an
    # equal order key the EARLIEST commit wins (it became "the target"
    # first — identical to copy-on-write target-wins-ties), then last
    # arrival by ingest tie-break within a commit
    pick = F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(ocols)],
        (-F.col(DSEQ_COL)).alias("oseq"),
        F.col(DORD_COL).alias("ots"),
    )
    payload = F.struct(
        *[F.col(f.name) for f in schema.fields],
        F.col(DOP_COL),
        F.col(DINBASE_COL),
    )
    dr = (
        delta.groupBy(*ids)
        .agg(F.max_by(payload, pick).alias("_row"))
        .select("_row.*")
    )
    upd = dr.filter(F.col(DINBASE_COL)).select(
        *[F.col(f.name).alias(f"_u_{f.name}") for f in schema.fields],
        F.col(DOP_COL).alias("_u_op"),
        *[F.col(f"_u_{c}").alias(c) for c in ids],
    )
    ins = dr.filter(~F.col(DINBASE_COL) & (F.col(DOP_COL) != "D")).select(
        *[F.col(f.name) for f in schema.fields]
    )
    newer = F.col("_u_op").isNotNull() & (
        F.struct(*[F.col(f"_u_{c}") for c in ocols])
        > F.struct(*[F.col(c) for c in ocols])
    )
    merged = (
        base.join(bcast(upd), ids, "left")
        .filter(~(newer & (F.col("_u_op") == "D")).eqNullSafe(F.lit(True)))
        .select(
            *[
                (
                    F.when(newer, F.col(f"_u_{f.name}"))
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                    if f.name not in ids
                    else F.col(f.name)
                )
                for f in schema.fields
            ]
        )
    )
    return merged.unionByName(ins)
