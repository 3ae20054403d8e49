"""Physical-plan audits — the plan IS the product at 100 TB.

These tests pin the optimizer properties the engine's scale story
depends on: parquet filter pushdown + column pruning, broadcast hash
joins for dimension enrichment, and the single-exchange merge shape
(groupBy(bucket, key) reusing the repartition-by-bucket exchange so a
MERGE costs one wide shuffle, see cdc/merge.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark):
    return spark.read.parquet(os.path.join(SF, "events.parquet"))


def test_filter_pushdown_reaches_scan(spark):
    df = _events(spark).filter(F.col("event_type") == "click").select("event_id")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "EqualTo(event_type,click)" in plan


def test_column_pruning_reaches_scan(spark):
    df = _events(spark).select("event_id", "user_id")
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "user_id"}, f"scan reads extra columns: {cols}"


def test_dim_join_is_broadcast(spark):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    p = spark.read.parquet(os.path.join(SF, "part.parquet"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).groupBy("p_brand").count()
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_merge_shape_single_exchange(spark, tmp_path):
    """The union + repartition(bucket) + groupBy(bucket, key) merge must
    produce exactly ONE exchange: hash partitioning on a subset of the
    grouping keys satisfies the aggregation's distribution."""
    from data_pipeline_spark.table.laketable import BUCKET_COL, bucket_expr

    t = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.lit("T").alias("op"),
    )
    d = spark.range(100).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") + 5000).alias("lsn"),
        F.lit("U").alias("op"),
    )
    combined = t.unionByName(d).withColumn(BUCKET_COL, bucket_expr("doc_id", 16))
    packed = F.struct("lsn", "op")
    merged = (
        combined.repartition(32, BUCKET_COL)
        .groupBy(BUCKET_COL, "doc_id")
        .agg(F.max_by(packed, F.col("lsn")).alias("_row"))
    )
    plan = _plan(merged)
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{plan}"


def test_lww_salted_aggregation_two_phase(spark):
    """The salted LWW reduce must be aggregation with map-side partial
    combine (partial_max_by before each exchange), never a global window
    sort.  (max_by over a struct buffer runs as SortAggregate — the sort
    is per-partition, bounded by the salt; what matters is that the
    reduction happens BEFORE the shuffle.)"""
    from data_pipeline_spark.cdc.dedup import lww_reduce

    ev = _events(spark)
    out = lww_reduce(ev, key_col="user_id", order_col="event_id", salt_buckets=8)
    plan = _plan(out)
    assert "Window" not in plan
    assert "partial_max_by" in plan  # map-side combine present
    # two-phase: (key, salt) reduce then (key) reduce
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_jaccard_df_cap_is_broadcast_anti_join(spark):
    """The hot-shingle guard must be a broadcast LEFT ANTI join (the hot
    set is tiny by construction), not a shuffled join of all shingles."""
    from data_pipeline_spark.operators.dedupe import ngram_jaccard_pairs

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = ngram_jaccard_pairs(docs, "doc_id", "text", max_doc_freq=100)
    plan = _plan(out)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan) or re.search(
        r"BroadcastNestedLoopJoin .*LeftAnti", plan
    )


def test_ivf_cluster_cap_is_broadcast_anti_join(spark):
    from data_pipeline_spark.operators.similarity import ivf_threshold_pairs

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    out = ivf_threshold_pairs(
        emb, "vec_id", "embedding", threshold=0.5, dim=64, max_cluster=100
    )
    plan = _plan(out)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan)


def test_observed_merge_same_result(spark, tmp_path):
    """observe() metrics ride the existing merge action — the merged
    table must be identical with and without the observation node."""
    from pyspark.sql import Observation

    from data_pipeline_spark.cdc.merge import merge_into
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA, TARGET_SCHEMA_BASE
    from data_pipeline_spark.table.laketable import LakeTable

    rows = [("d%d" % i, i, "I", [1, i], 2, None, None, 0, None) for i in range(50)]
    changes = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    def run(obs):
        t = LakeTable.create(
            spark,
            str(tmp_path / ("t-obs" if obs else "t-plain")),
            TARGET_SCHEMA_BASE,
            key_col="doc_id",
            n_buckets=4,
        )
        o = Observation("m") if obs else None
        merge_into(t, changes, 0, observation=o)
        return t

    plain = run(False)
    observed = run(True)
    assert (
        plain.read().count() == observed.read().count() == 50
    )


def test_scd2_joinback_no_extra_exchange_no_wide_resort(spark, tmp_path):
    """Pins cdc/scd2.py's claim: the closure-delta join-back adds NO
    exchange and NO re-sort on the wide (reduced-history) side — the
    SortMergeJoin reuses the reduce's bucket partitioning and its
    SortAggregate's (bucket, key, lsn) order.  Requires
    spark.sql.requireAllClusterKeysForCoPartition=false (build_session
    sets it): Spark 3.3+'s default silently re-shuffles BOTH sides
    full-width when the co-partitioning is on a prefix of the join keys.
    """
    from data_pipeline_spark.cdc.pipeline import CdcPipeline
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA
    from data_pipeline_spark.cdc.scd2 import apply_history

    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=4, storage="cow")
    mk = lambda rows: spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    apply_history(
        pipe.history,
        mk([(f"d{i}", i, "I", [1, i], 2, None, None, 0, None) for i in range(50)]),
        0,
    )
    po = {}
    apply_history(
        pipe.history,
        mk([(f"d{i}", 100 + i, "U", [2, i], 2, None, None, 0, None) for i in range(20)]),
        1,
        plan_out=po,
    )
    plan = _plan(po["closed"])
    # carve out the wide side: everything between SortMergeJoin and the
    # reduce's own REPARTITION_BY_NUM exchange
    m = re.search(
        r"SortMergeJoin.*?\n(.*?)Exchange hashpartitioning\(_bucket#\d+, \d+\), "
        r"REPARTITION_BY_NUM",
        plan,
        re.S,
    )
    assert m, plan
    wide = m.group(1)
    assert "SortAggregate" in wide  # we captured the reduce side
    # between the join and the reduce aggregate: nothing may shuffle or
    # re-sort (the aggregate's OWN input sort sits below it and is fine)
    join_to_agg = wide.split("SortAggregate")[0]
    assert "Exchange" not in join_to_agg, f"extra exchange on wide side:\n{plan}"
    assert "Sort " not in join_to_agg, f"re-sort of the wide side:\n{plan}"
    # exactly 2 shuffled exchanges feed the join: the reduce's and the
    # narrow delta's (the closure's _g exchange + semi-join build are
    # upstream of the delta's repartition)
    head = plan.split("FlatMapGroupsInPandas")[0]
    assert len(re.findall(r"Exchange hashpartitioning", head)) == 2, plan


def test_mor_history_apply_no_extra_exchange(spark, tmp_path):
    """Merge-on-read history apply (the round-4 write path): the
    insert-filter join-back must reuse the batch reduce's bucket
    partitioning and sort order exactly like the CoW pin above — one
    batch-sized wide exchange on the full-width side, the narrow
    closure side shuffling alone."""
    from data_pipeline_spark.cdc.pipeline import CdcPipeline
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA
    from data_pipeline_spark.cdc.scd2 import apply_history

    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=4, storage="mor")
    mk = lambda rows: spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    apply_history(
        pipe.history,
        mk([(f"d{i}", i, "I", [1, i], 2, None, None, 0, None) for i in range(50)]),
        0,
    )
    po = {}
    apply_history(
        pipe.history,
        mk([(f"d{i}", 100 + i, "U", [2, i], 2, None, None, 0, None) for i in range(20)]),
        1,
        plan_out=po,
    )
    plan = _plan(po["mor_new_rows"])
    m = re.search(
        r"SortMergeJoin.*?\n(.*?)Exchange hashpartitioning\(_bucket#\d+, \d+\), "
        r"REPARTITION_BY_NUM",
        plan,
        re.S,
    )
    assert m, plan
    wide = m.group(1)
    assert "SortAggregate" in wide or "HashAggregate" in wide
    join_to_agg = re.split(r"SortAggregate|HashAggregate", wide)[0]
    assert "Exchange" not in join_to_agg, f"extra exchange on wide side:\n{plan}"
    assert "Sort " not in join_to_agg, f"re-sort of the wide side:\n{plan}"
