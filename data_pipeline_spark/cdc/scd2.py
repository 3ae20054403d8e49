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

Scale design — the closure kernel is NARROW and its input is the
CHAIN SUFFIX.  Token payloads never cross the JVM↔Python boundary and
the full-width data is shuffled exactly once per batch:

  1. per-key ``min(incoming lsn)`` (batch-sized, broadcast);
  2. existing versions projected to (key, lsn, op, valid_from, stored
     validity) — a column-pruned scan — PRUNED to rows with
     lsn >= min(incoming lsn) plus the single insertion-predecessor
     row per key (round 4): closure is invariant for anything older,
     so per-batch kernel volume is O(batch) for in-order streams
     instead of O(full history of affected keys);
  3. replay guard: cross-batch re-deliveries of versions already in
     the table collapse inside the reduces — the narrow kernel and the
     full-width min_by both pick the STORED row over a re-delivered
     copy (``_is_new`` sorts stored-first), so no anti-join pass is
     needed;
  4. **groupBy().applyInPandas over Arrow batches** (north_star
     requirement) computes lead(valid_from)-1s per key on the narrow
     frame — thousands of keys per Arrow batch, vectorized pandas, no
     per-row Python;
  5. the closure delta (changed rows only, flagged insert-vs-stored)
     drives the write:

     * merge-on-read history (default): new versions append as base
       files already carrying final validity; stored-row validity
       changes become per-bucket PATCH delta files
       (:func:`_apply_history_mor`) — per-batch write volume O(batch);
     * copy-on-write: the delta joins back onto the full-width union
       with zero extra exchange and the touched buckets are rewritten.

For enormous batches (more changed keys than is broadcastable) the
``broadcast_max_docs`` gate falls back to a shuffle-based variant of
the same algorithm.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..table.laketable import BUCKET_COL, LakeTable
from .schema import END_OF_TIME

_END_OF_TIME_TS = pd.Timestamp(END_OF_TIME).as_unit("us")


def _make_close_kernel(key: str, group_col: str):
    """Vectorized validity-range closure over a narrow (key, lsn, op,
    valid_from) frame — one group = many keys (kept large by grouping on
    a hash of the key, so Arrow batch + pandas-vector costs amortize).

    valid_to = lead(valid_from) over (partition by key order by lsn)
    minus 1s (close_prior_versions.sql:22,44); last version stays open at
    END_OF_TIME and is current unless it is a delete tombstone.

    Timestamps are microsecond-unit throughout: Spark timestamps are µs
    and the 9999-12-31 sentinel overflows pandas' datetime64[ns].
    """
    import numpy as np

    def _close(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=[group_col])
        # dedup inside the kernel: at-least-once delivery duplicates of
        # the same (key, lsn) — and replay re-deliveries of rows already
        # in the table — collapse to ONE version: the stored row when
        # present (_is_new=False sorts first), else the first-arrival
        # copy (min valid_from = min ingest_ts).  The full-width reduce
        # in apply_history makes the identical pick.
        pdf = pdf.sort_values(
            [key, "lsn", "_is_new", "valid_from_utc"], kind="mergesort"
        )
        pdf = pdf.drop_duplicates([key, "lsn"], keep="first")
        pdf["valid_from_utc"] = pdf["valid_from_utc"].astype("datetime64[us]")
        nxt = (
            pdf.groupby(key)["valid_from_utc"]
            .shift(-1)
            .to_numpy(dtype="datetime64[us]")
        )
        missing = pd.isna(nxt)
        valid_to = nxt - np.timedelta64(1, "s")
        valid_to[missing] = np.datetime64(END_OF_TIME.replace(" ", "T"), "us")
        is_current = missing & (pdf["op"] != "D").to_numpy()
        # DELTA output: only rows whose validity actually changed — new
        # versions and neighbours of inserts.  In an append-mostly
        # stream that is O(batch), not O(history of affected keys),
        # which keeps the join-back broadcast small.  Stored validity
        # arrives as exact int64 µs (-1 for new rows): the 9999-12-31
        # sentinel overflows a ns-datetime and loses precision in
        # float64, int64 µs does neither.
        stored_vt_us = pdf["_stored_vt_us"].to_numpy(dtype="int64")
        stored_ic = pdf["_stored_ic"].to_numpy(dtype="bool")
        valid_to_us = valid_to.astype("datetime64[us]").astype("int64")
        changed = (
            pdf["_is_new"].to_numpy(dtype="bool")
            | (stored_vt_us != valid_to_us)
            | (stored_ic != is_current)
        )
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy()[changed],
                "lsn": pdf["lsn"].to_numpy()[changed],
                "valid_to_utc": valid_to[changed],
                "is_current": is_current[changed],
                # is_insert: the surviving copy is NEW (not stored) — the
                # merge-on-read path appends these as base rows and turns
                # the rest (changed validity of STORED rows) into patch
                # deltas; re-delivered stored rows are never re-inserted
                "is_insert": pdf["_is_new"].to_numpy(dtype="bool")[changed],
            }
        )

    return _close


def _closure_schema(key: str) -> StructType:
    return StructType(
        [
            StructField(key, StringType()),
            StructField("lsn", LongType()),
            StructField("valid_to_utc", TimestampType()),
            StructField("is_current", BooleanType()),
            StructField("is_insert", BooleanType()),
        ]
    )


def _change_gate(
    existing: DataFrame, nv: DataFrame, key: str, check_cols: list[str]
) -> DataFrame:
    """Attr-hash change detection (C4/J5 check-cols variant, reference
    basic_orchestrator/dbt/macros/scd2/scd2_merge.sql:46-50): a new
    version opens ONLY when xxhash64(check_cols) differs from the
    version it would succeed — the stored current row for the first
    incoming version of a key, the previous incoming version after
    that (lag over lsn; hash equality is transitive so lag-over-all
    equals lag-over-survivors).  Delete tombstones always pass (they
    close chains), and only incoming rows are ever dropped.

    Mid-chain late arrivals are compared conservatively (kept unless
    they match the current row's hash position in lsn order) — the
    reference merge has no bi-temporal path at all, so matching its
    gate on the sequential case is the parity target."""
    from pyspark.sql.window import Window

    def _attr_hash(df: DataFrame):
        # a check column missing on one side (pre-schema-evolution
        # history rows) hashes as null — identical to a present-but-
        # null value, so evolution does not spuriously open versions
        return F.xxhash64(
            *[
                F.col(c) if c in df.columns else F.lit(None).cast("string")
                for c in check_cols
            ]
        )

    # bound the window input to the batch's keys: without the semi-join
    # every current row of every touched bucket would ride the shuffle
    # (bucket-sized, not batch-sized)
    batch_keys = nv.select(key).distinct()
    cur = (
        existing.filter(F.col("is_current"))
        .join(batch_keys, key, "semi")
        .select(
            F.col(key),
            F.col("lsn"),
            _attr_hash(existing).alias("_h"),
            F.lit("C").alias("_gop"),
            F.lit(False).alias("_gnew"),
        )
    )
    inc = nv.select(
        F.col(key),
        F.col("lsn"),
        _attr_hash(nv).alias("_h"),
        F.col("op").alias("_gop"),
        F.lit(True).alias("_gnew"),
    )
    w = Window.partitionBy(key).orderBy("lsn", "_gnew", "_h")
    lagged = (
        cur.unionByName(inc)
        .withColumn("_prev_h", F.lag("_h").over(w))
        .withColumn("_prev_op", F.lag("_gop").over(w))
    )
    keep = lagged.filter(
        F.col("_gnew")
        & (
            (F.col("_gop") == "D")
            # a row succeeding a tombstone ALWAYS opens a version: the
            # delete closed the chain, so "unchanged attrs" vs the
            # tombstone's (all-null) hash must not suppress a re-insert
            | (F.col("_prev_op") == "D")
            | F.col("_prev_h").isNull()
            | (F.col("_prev_h") != F.col("_h"))
        )
    ).select(key, "lsn")
    return nv.join(keep, [key, "lsn"], "semi")


def apply_history(
    history: LakeTable,
    new_versions: DataFrame,
    batch_id: int | str,
    broadcast_max_docs: int = 500_000,
    closure_groups: int = 64,
    shuffle_partitions: int | None = None,
    check_cols: list[str] | None = None,
    affected: list[int] | None = None,
    n_docs: int | None = None,
    plan_out: dict | None = None,
) -> dict:
    """Append this batch's versions and re-close affected keys.

    affected/n_docs: precomputed planning inputs (touched buckets +
    distinct-key count) from the caller's fused probe — when given, no
    probe job runs here.  Only valid when the caller's bucket function
    matches this table's (same key_col + n_buckets); CdcPipeline checks
    that before passing them.

    `new_versions` is the RAW validated event stream — it may contain
    at-least-once duplicate deliveries of a (doc_id, lsn) and replays of
    versions already in the table; both collapse here (first arrival /
    stored row wins) with no separate dedup pass: the narrow closure
    kernel dedups in pandas, and the full-width reduce rides the write's
    repartition-by-bucket exchange, so the whole apply still costs ONE
    full-width shuffle.

    check_cols: optional attr-change gate — when set, an update whose
    tracked attributes hash-match the version it would succeed opens NO
    new history row (the reference's check-cols SCD2).  Off by default:
    the lsn-versioned mode keeps every distinct (key, lsn).
    """
    key = history.key_col
    derived = (key, "lsn", "op", "valid_from_utc", "valid_to_utc", "is_current")
    payload_cols = [
        f.name
        for f in history.schema.fields
        if f.name in new_versions.columns and f.name not in derived
    ]

    nv = new_versions.select(
        key,
        "lsn",
        "op",
        *payload_cols,
        F.col("ingest_ts").alias("valid_from_utc"),
    ).withColumn(BUCKET_COL, history.bucket_of(key))
    if affected is None or n_docs is None:
        # one driver job for both planning inputs: buckets + key count
        # (HLL — nd only gates the broadcast decision, and exact
        # count_distinct hash-sets every key per partition)
        probe = nv.agg(
            F.collect_set(BUCKET_COL).alias("bs"),
            F.approx_count_distinct(F.col(key), 0.02).alias("nd"),
        ).first()
        affected, n_docs = list(probe["bs"]), int(probe["nd"])
    else:
        affected, n_docs = [int(b) for b in affected], int(n_docs)
    if not affected:
        history.record_batch(str(batch_id), {"versions": 0})
        return {"buckets": []}

    small = n_docs <= broadcast_max_docs
    maybe_bcast = F.broadcast if small else (lambda df: df)

    mor_cfg = history.merge_on_read
    patch_mor = mor_cfg is not None and mor_cfg.get("mode") == "patch"
    # Under patch-mode merge-on-read the kernel input can skip the
    # delta-lane resolution join entirely: patches only ever rewrite
    # DERIVED columns (valid_to_utc/is_current), and the kernel
    # recomputes those from the immutable (lsn, valid_from) chain — the
    # stored values are used solely to filter UNCHANGED rows out of the
    # delta output.  Reading the un-patched base makes that filter
    # conservative (a predecessor row whose patch already landed
    # re-emits an identical-value patch at a higher _dseq — harmless,
    # folded at the next compaction) and saves a per-batch reduce +
    # broadcast-exchange of the whole un-folded lane.  check_cols mode
    # keeps the resolution: its gate reads is_current semantically.
    existing = history.read(
        buckets=affected,
        with_deltas=bool(check_cols) or not patch_mor,
    )
    if check_cols:
        # pre-gate `affected` stays the bucket superset (a fully-gated
        # bucket is rewritten unchanged — correct, just not pruned)
        nv = _change_gate(existing, nv, key, check_cols)

    # CHAIN-SUFFIX pruning (round 4): the closure of a stored version
    # can only change if a version is inserted at-or-before it in lsn
    # order, so the kernel needs, per key, only the rows with
    # lsn >= min(incoming lsn) PLUS the single insertion predecessor
    # (the largest stored lsn below it — for in-order streams that is
    # exactly the stored current row).  Everything older is closure-
    # invariant and skipped.  This turns per-batch kernel volume from
    # O(full history of affected keys) — which at uniformly-hashed CDC
    # batches is the whole table — into O(batch) for in-order streams,
    # while staying exact for mid-chain (bi-temporal) late arrivals.
    min_new = nv.groupBy(key).agg(F.min("lsn").alias("_min_new"))
    ex_aff = (
        existing.select(
            key,
            "lsn",
            "op",
            "valid_from_utc",
            F.coalesce(F.unix_micros("valid_to_utc"), F.lit(-1)).alias(
                "_stored_vt_us"
            ),
            F.coalesce(F.col("is_current"), F.lit(False)).alias("_stored_ic"),
        )
        .join(maybe_bcast(min_new), key, "inner")
        .persist()
    )
    pred = (
        ex_aff.filter(F.col("lsn") < F.col("_min_new"))
        .groupBy(key)
        .agg(F.max("lsn").alias("_pred"))
    )
    ex_narrow = (
        ex_aff.join(maybe_bcast(pred), key, "left")
        .filter(
            (F.col("lsn") >= F.col("_min_new"))
            | F.col("lsn").eqNullSafe(F.col("_pred"))
        )
        .drop("_min_new", "_pred")
        .withColumn("_is_new", F.lit(False))
    )
    all_narrow = ex_narrow.unionByName(
        nv.select(
            key,
            "lsn",
            "op",
            "valid_from_utc",
            F.lit(-1).cast("long").alias("_stored_vt_us"),
            F.lit(False).alias("_stored_ic"),
            F.lit(True).alias("_is_new"),
        )
    ).withColumn("_g", F.pmod(F.xxhash64(F.col(key)), F.lit(closure_groups)))

    closure = all_narrow.groupBy("_g").applyInPandas(
        _make_close_kernel(key, "_g"), schema=_closure_schema(key)
    )

    nparts = shuffle_partitions or max(
        2 * history.n_buckets,
        int(new_versions.sparkSession.conf.get("spark.sql.shuffle.partitions")),
    )
    mor = history.merge_on_read
    if mor is not None and mor.get("mode") == "patch":
        try:
            return _apply_history_mor(
                history, nv, closure, affected, n_docs, batch_id, nparts,
                plan_out,
            )
        finally:
            ex_aff.unpersist()

    # full-width union (duplicates still present), reduced to one row
    # per (key, lsn) on the write's bucket exchange: stored row wins,
    # else first-arrival copy — the same pick as the kernel's dedup
    nv_full = nv.drop(BUCKET_COL)
    for f in history.schema.fields:
        if f.name not in nv_full.columns:
            nv_full = nv_full.withColumn(f.name, F.lit(None).cast(f.dataType))
    width_cols = [f.name for f in history.schema.fields]
    combined = (
        existing.withColumn("_is_new", F.lit(False))
        .select(*width_cols, "_is_new")
        .unionByName(
            nv_full.withColumn("_is_new", F.lit(True)).select(*width_cols, "_is_new")
        )
        .withColumn(BUCKET_COL, history.bucket_of(key))
    )
    rest_cols = [c for c in combined.columns if c not in (key, "lsn", BUCKET_COL)]
    packed = F.struct(*[F.col(c) for c in rest_cols])
    order_key = F.struct(F.col("_is_new").alias("o1"), F.col("valid_from_utc").alias("o2"))
    reduced = (
        combined.repartition(nparts, BUCKET_COL)
        .groupBy(BUCKET_COL, key, "lsn")
        .agg(F.min_by(packed, order_key).alias("_row"))
        .select(F.col(BUCKET_COL), F.col(key), F.col("lsn"), "_row.*")
        .drop("_is_new")
    )

    # join-back of the closure delta WITHOUT a driver broadcast (the
    # delta is batch-sized — collecting it would be data-proportional
    # serial time): both sides are hash-partitioned by bucket with the
    # same partition count, and the reduce's sort-aggregate output is
    # already ordered by (bucket, key, lsn), so joining on
    # [bucket, key, lsn] adds NO exchange and no re-sort of the wide
    # side — only the narrow delta shuffles.
    x = (
        closure.drop("is_insert")
        .withColumnsRenamed(
            {"valid_to_utc": "_new_vt", "is_current": "_new_ic"}
        )
        .withColumn(BUCKET_COL, history.bucket_of(key))
        .repartition(nparts, F.col(BUCKET_COL))
    )
    closed = reduced.join(x, [BUCKET_COL, key, "lsn"], "left").select(
        *[
            F.coalesce(F.col("_new_vt"), F.col("valid_to_utc")).alias("valid_to_utc")
            if f.name == "valid_to_utc"
            else F.coalesce(F.col("_new_ic"), F.col("is_current")).alias("is_current")
            if f.name == "is_current"
            else F.col(f.name)
            for f in history.schema.fields
        ],
        F.col(BUCKET_COL),
    )

    if plan_out is not None:
        # plan-audit hook (tests/test_plans.py): expose the pre-write
        # frame so the zero-extra-exchange / no-wide-re-sort claim above
        # is pinned against the actual executed plan, not the docstring
        plan_out["closed"] = closed

    try:
        history.replace_buckets(
            closed,
            affected,
            batch_key=str(batch_id),
            batch_info={"buckets": sorted(affected)},
            prepartitioned=True,
        )
    finally:
        ex_aff.unpersist()
    # changed_docs is an HLL estimate (±2%) when derived from the probe
    return {"buckets": sorted(affected), "changed_docs": n_docs}


def _apply_history_mor(
    history: LakeTable,
    nv: DataFrame,
    closure: DataFrame,
    affected: list[int],
    n_docs: int,
    batch_id: int | str,
    nparts: int,
    plan_out: dict | None,
) -> dict:
    """Merge-on-read history apply: per-batch WRITE volume is O(batch).

    Copy-on-write (`apply_history`'s default tail) reads and rewrites
    every touched bucket wholesale — at uniformly-hashed CDC keys that
    is the whole, monotonically-growing history table per micro-batch
    (the round-3 review's one remaining scale-killer).  Here instead:

    * the batch's genuinely-new versions (closure rows flagged
      ``is_insert``) are appended as base files, already carrying their
      final validity;
    * validity changes to STORED rows (close-on-insert, bi-temporal
      corrections) become a small (key, lsn, valid_to, is_current)
      PATCH delta per bucket — Iceberg v2 equality-delete / Hudi MoR
      analogue (reference analogue: the dbt incremental merge never
      rewrites the table per run, trades_enriched.sql:2-5);
    * ``LakeTable.read`` resolves patches at scan time (latest _dseq
      per (key, lsn)); ``compact()`` folds them back into the base on
      the small-file trigger, amortising the rewrite.

    Plan shape: ONE batch-sized wide shuffle (the repartition-by-bucket
    reduce, whose exchange the (bucket, key, lsn) groupBy and the
    bucketed write both reuse) + the narrow closure join — the same
    zero-extra-exchange join-back as the CoW path, minus the full-width
    table rewrite.
    """
    key = history.key_col

    # the closure feeds BOTH writes (new base rows + patch deltas);
    # without a persist the second write re-executes the entire narrow
    # scan + kernel DAG — measured as ~2× the history wall.  The frame
    # is narrow and batch-sized: memory-only cache, freed in `finally`.
    closure = closure.persist()

    # full width, deduped to one row per (key, lsn): first arrival wins
    # (same pick as the kernel), on the write's bucket exchange
    nv_full = nv
    for f in history.schema.fields:
        if f.name not in nv_full.columns:
            nv_full = nv_full.withColumn(f.name, F.lit(None).cast(f.dataType))
    width_cols = [f.name for f in history.schema.fields]
    nv_full = nv_full.select(*width_cols, BUCKET_COL)
    rest_cols = [c for c in width_cols if c not in (key, "lsn")]
    packed = F.struct(*[F.col(c) for c in rest_cols])
    reduced = (
        nv_full.repartition(nparts, BUCKET_COL)
        .groupBy(BUCKET_COL, key, "lsn")
        .agg(F.min_by(packed, F.col("valid_from_utc")).alias("_row"))
        .select(F.col(BUCKET_COL), F.col(key), F.col("lsn"), "_row.*")
    )

    # genuinely-new versions keep only closure-flagged inserts (inner
    # join drops cross-batch re-deliveries of stored rows) and pick up
    # their final validity; the narrow side shuffles, the wide side
    # reuses the reduce's partitioning and sort order
    x = (
        closure.filter(F.col("is_insert"))
        .select(key, "lsn", F.col("valid_to_utc").alias("_new_vt"),
                F.col("is_current").alias("_new_ic"))
        .withColumn(BUCKET_COL, history.bucket_of(key))
        .repartition(nparts, F.col(BUCKET_COL))
    )
    new_rows = reduced.join(x, [BUCKET_COL, key, "lsn"], "inner").select(
        *[
            F.col("_new_vt").alias("valid_to_utc")
            if c == "valid_to_utc"
            else F.col("_new_ic").alias("is_current")
            if c == "is_current"
            else F.col(c)
            for c in width_cols
        ],
        F.col(BUCKET_COL),
    )

    patches = closure.filter(~F.col("is_insert")).select(
        key, "lsn", "valid_to_utc", "is_current"
    )

    if plan_out is not None:
        plan_out["mor_new_rows"] = new_rows

    try:
        history.merge_append(
            new_rows,
            patches,
            buckets=affected,
            batch_key=str(batch_id),
            batch_info={"buckets": sorted(affected), "mor": True},
            prepartitioned=True,
        )
    finally:
        closure.unpersist()
    return {"buckets": sorted(affected), "changed_docs": n_docs}


def as_of(history_df: DataFrame, ts) -> DataFrame:
    """Time-travel predicate (basic_orchestrator/dbt/macros/time_travel.sql:22-24):
    the version visible at `ts`, excluding delete tombstones.

    DELIBERATE divergence from the reference: the macro uses a strict
    ``valid_to > ts`` while this engine uses a closed ``valid_to >= ts``.
    Versions are closed at next.valid_from − 1 s, so the reference's
    half-open predicate leaves a 1-second hole in which NO version is
    visible (ts exactly on a closed valid_to); the closed interval makes
    every instant in [first valid_from, ∞) resolve to exactly one live
    version.  Pinned by test_as_of_closed_interval_boundary."""
    t = F.lit(ts).cast("timestamp")
    return history_df.filter(
        (F.col("valid_from_utc") <= t) & (F.col("valid_to_utc") >= t) & (F.col("op") != "D")
    )


def current(history_df: DataFrame) -> DataFrame:
    """The `_current` view (fact_futures_order_event_current.sql:67-68)."""
    return history_df.filter(F.col("is_current"))
