"""End-to-end replay-equivalence tests: engine vs pandas oracle.

The analogue of the reference's snapshot-fixture + idempotency tests
(docs/identity.md:243-256): replay a deterministic change log, assert
the final table matches the oracle row-by-row with EXACT token-array
equality per doc_id (BASELINE.json invariant).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.cdc.oracle import (
    assert_tokens_equal,
    expected_final_state,
    load_log,
)
from data_pipeline_spark.cdc.pipeline import CdcPipeline
from data_pipeline_spark.cdc.stream import replay_batches


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    from data_pipeline_spark.cdc.synth import generate_change_log

    d = tmp_path_factory.mktemp("cdclog")
    stats = generate_change_log(str(d), n_docs=300, seed=7, n_files=6)
    assert stats["total_events"] > 1500
    return str(d)


def _final_pandas(pipeline):
    df = pipeline.current_state().select("doc_id", "tokens", "n_tok", "source")
    return df.toPandas()


@pytest.mark.parametrize(
    "fmt,storage,compact_every",
    [
        ("lake", "mor", 2),   # default storage + mid-replay lane fold
        ("lake", "cow", 0),   # round-1..3 copy-on-write path
        ("delta", "mor", 2),  # second TableFormat binding (seam proof)
    ],
    ids=["lake-mor", "lake-cow", "delta-mor"],
)
def test_replay_matches_oracle(spark, log_dir, tmp_path, fmt, storage, compact_every):
    from data_pipeline_spark.table import DeltaLogTable, LakeTable

    cls = {"lake": LakeTable, "delta": DeltaLogTable}[fmt]
    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"), n_buckets=8, compact_every=compact_every,
        storage=storage, table_format=cls,
    )
    n = replay_batches(spark, log_dir, pipe, files_per_batch=2)
    assert n == 3
    expected = expected_final_state(load_log(log_dir))
    assert_tokens_equal(_final_pandas(pipe), expected)
    # history closure invariant holds across formats/storages: exactly
    # one current row per live doc
    cur = pipe.history_df().filter("is_current").groupBy("doc_id").count()
    assert cur.filter("count > 1").count() == 0


def test_replay_single_big_batch_same_result(spark, log_dir, tmp_path):
    """Batch boundaries must not affect the final state (LWW within and
    across batches agree)."""
    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=8, compact_every=0)
    replay_batches(spark, log_dir, pipe, files_per_batch=100)
    expected = expected_final_state(load_log(log_dir))
    assert_tokens_equal(_final_pandas(pipe), expected)


def test_idempotent_replay_of_same_batch(spark, log_dir, tmp_path):
    """Reference idempotency test: apply the same epoch twice → state
    unchanged (manifest skip + lsn-guarded MERGE)."""
    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=8, compact_every=0)
    replay_batches(spark, log_dir, pipe, files_per_batch=2)
    v_before = pipe.target.version
    # replay every batch a second time with the same epoch ids
    replay_batches(spark, log_dir, pipe, files_per_batch=2, start_batch_id=0)
    expected = expected_final_state(load_log(log_dir))
    assert_tokens_equal(_final_pandas(pipe), expected)
    # manifest guard: no new data commits for target merges
    applied = pipe.target.snapshot.applied_batches
    assert set(applied.keys()) == {"0", "1", "2"}
    assert pipe.target.version >= v_before


def test_schema_evolution_mid_stream(spark, log_dir, tmp_path):
    """`source` column appears mid-stream via a SCHEMA record: target
    starts without it, ends with it; pre-evolution rows read NULL."""
    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=8, compact_every=0)
    files = sorted(__import__("glob").glob(log_dir + "/*.parquet"))
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    first = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(files[0])
    pipe.apply_batch(first, 0)
    assert "source" not in [f.name for f in pipe.target.schema.fields]
    for i, f in enumerate(files[1:], start=1):
        pipe.apply_batch(spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(f), i)
    assert "source" in [f.name for f in pipe.target.schema.fields]
    final = pipe.current_state()
    assert final.filter(F.col("source").isNotNull()).count() > 0
    expected = expected_final_state(load_log(log_dir))
    assert_tokens_equal(_final_pandas(pipe), expected)


def test_dead_letter_and_lineage(spark, tmp_path):
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    rows = [
        ("d1", 1, "I", [1, 2], 2, None, None, 0, None),
        ("d1", 2, "X", [1], 1, None, None, 0, None),     # unknown op
        (None, 3, "I", [1], 1, None, None, 1, None),     # null key
        ("d2", None, "I", [1], 1, None, None, 1, None),  # null lsn
        ("d3", 4, "U", None, None, None, None, 1, None), # null payload
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=4, compact_every=0)
    pipe.apply_batch(df, 0)
    dl = pipe.dead_letter.read().toPandas()
    assert sorted(dl["failure_reason"]) == [
        "null_key", "null_lsn", "null_payload", "unknown_op",
    ]
    assert pipe.current_state().count() == 1  # only d1 survives
    lin = pipe.lineage.read().toPandas()
    assert lin["rows_in"].sum() == 5
    assert lin["rows_dead_letter"].sum() == 4


def test_lww_and_delete_semantics(spark, tmp_path):
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    base_ts = __import__("datetime").datetime(2024, 1, 1)

    def ts(s):
        return base_ts + __import__("datetime").timedelta(seconds=s)

    rows = [
        ("a", 10, "I", [1], 1, None, None, 0, ts(10)),
        ("a", 20, "U", [2], 1, None, None, 0, ts(20)),
        ("a", 20, "U", [2], 1, None, None, 0, ts(99)),   # duplicate delivery
        ("b", 11, "I", [3], 1, None, None, 0, ts(11)),
        ("b", 21, "D", None, None, None, None, 0, ts(21)),
        ("c", 12, "I", [4], 1, None, None, 0, ts(12)),
        ("c", 22, "D", None, None, None, None, 0, ts(22)),
        ("c", 32, "I", [5], 1, None, None, 0, ts(32)),   # re-insert after delete
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=4, compact_every=0)
    pipe.apply_batch(df, 0)
    got = {r.doc_id: (r.tokens, r.lsn) for r in pipe.current_state().collect()}
    assert got == {"a": ([2], 20), "c": ([5], 32)}  # b deleted, c re-inserted

    # a late batch with an OLDER lsn must be a no-op (T4)
    late = spark.createDataFrame(
        [("a", 15, "U", [9], 1, None, None, 0, ts(15))], CHANGE_EVENT_SCHEMA
    )
    pipe.apply_batch(late, 1)
    got = {r.doc_id: r.tokens for r in pipe.current_state().collect()}
    assert got["a"] == [2]


def test_same_lsn_distinct_payload_tiebreak_is_deterministic(spark, tmp_path):
    """Malformed upstream: two DISTINCT payloads under the same
    (doc_id, lsn).  The merge order key (lsn, _prio, ingest_ts) must
    pick the LAST arrival by ingest_ts — deterministically, regardless
    of partitioning or arrival order within the batch."""
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    base_ts = __import__("datetime").datetime(2024, 1, 1)

    def ts(s):
        return base_ts + __import__("datetime").timedelta(seconds=s)

    rows = [
        ("x", 5, "I", [7, 7], 2, None, None, 0, ts(50)),   # later arrival
        ("x", 5, "I", [1, 1], 2, None, None, 0, ts(10)),   # earlier arrival
    ]
    for attempt, order in enumerate([rows, rows[::-1]]):
        df = spark.createDataFrame(order, CHANGE_EVENT_SCHEMA).repartition(4)
        pipe = CdcPipeline(
            spark, str(tmp_path / f"wh{attempt}"), n_buckets=4, compact_every=0
        )
        pipe.apply_batch(df, 0)
        (row,) = pipe.current_state().collect()
        assert row.tokens == [7, 7], "last writer by ingest_ts must win"


def test_bitemporal_midchain_late_arrival_closure(spark, tmp_path):
    """C6 pin for the round-4 chain-suffix pruning: a LATE version whose
    lsn slots mid-chain must re-close its predecessor (which the pruned
    kernel only sees via the insertion-predecessor row) and itself close
    at the successor's valid_from.  Exercised across batches so the
    predecessor is a STORED row patched through the MoR delta lane."""
    import datetime

    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA, END_OF_TIME

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=2, compact_every=0)
    pipe.apply_batch(
        spark.createDataFrame(
            [
                ("k", 10, "I", [1], 1, None, None, 0, ts(1)),
                ("k", 30, "U", [3], 1, None, None, 0, ts(3)),
            ],
            CHANGE_EVENT_SCHEMA,
        ),
        0,
    )
    # late mid-chain arrival: lsn 20 lands AFTER lsn 30 was applied
    pipe.apply_batch(
        spark.createDataFrame(
            [("k", 20, "U", [2], 1, None, None, 0, ts(99))], CHANGE_EVENT_SCHEMA
        ),
        1,
    )
    hist = {
        r.lsn: (r.valid_to_utc, r.is_current)
        for r in pipe.history_df().collect()
    }
    eot = datetime.datetime.fromisoformat(END_OF_TIME)
    assert hist == {
        10: (ts(99) - datetime.timedelta(seconds=1), False),
        20: (ts(3) - datetime.timedelta(seconds=1), False),
        30: (eot, True),
    }


def test_as_of_closed_interval_boundary(spark, tmp_path):
    """as_of uses a CLOSED valid_to (>=), diverging from the reference
    macro's strict `>` (time_travel.sql:22-24): with −1 s closure the
    strict form has a 1-second visibility hole exactly on a closed
    valid_to.  Every instant must resolve to exactly one version."""
    import datetime

    from data_pipeline_spark.cdc.scd2 import as_of
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", 1, "I", [1], 1, None, None, 0, t0),
        ("k", 2, "U", [2], 1, None, None, 0, t0 + datetime.timedelta(seconds=10)),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    pipe = CdcPipeline(spark, str(tmp_path / "wh"), n_buckets=2, compact_every=0)
    pipe.apply_batch(df, 0)
    hist = pipe.history_df()
    # version 1 is closed at t0+9s; the boundary instant itself must
    # still see version 1 (closed interval), and t0+10s sees version 2
    at_boundary = as_of(hist, t0 + datetime.timedelta(seconds=9)).collect()
    assert [r.lsn for r in at_boundary] == [1]
    at_next = as_of(hist, t0 + datetime.timedelta(seconds=10)).collect()
    assert [r.lsn for r in at_next] == [2]


def test_scd2_check_cols_gate(spark, tmp_path):
    """C4 check-cols variant (scd2_merge.sql:46-50): a payload-identical
    update opens NO new history version when the gate is on; a changed
    payload still does; deletes always close the chain.  Spans two
    batches so the gate is exercised against STORED current rows too."""
    import datetime

    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"), n_buckets=2, compact_every=0,
        scd2_check_cols=["tokens", "n_tok", "source"],
    )
    batch0 = spark.createDataFrame(
        [
            ("a", 1, "I", [1, 2], 2, None, None, 0, ts(1)),
            ("a", 2, "U", [1, 2], 2, None, None, 0, ts(2)),   # no-op update
            ("a", 3, "U", [3, 4], 2, None, None, 0, ts(3)),   # real change
            ("b", 1, "I", [9], 1, None, None, 0, ts(1)),
        ],
        CHANGE_EVENT_SCHEMA,
    )
    pipe.apply_batch(batch0, 0)
    hist = {
        (r.doc_id, r.lsn) for r in pipe.history_df().collect()
    }
    assert hist == {("a", 1), ("a", 3), ("b", 1)}  # lsn 2 gated out

    # batch 1: no-op vs STORED current (gated), then delete (kept)
    batch1 = spark.createDataFrame(
        [
            ("a", 4, "U", [3, 4], 2, None, None, 0, ts(4)),   # no-op vs stored
            ("b", 2, "D", None, None, None, None, 0, ts(4)),
        ],
        CHANGE_EVENT_SCHEMA,
    )
    pipe.apply_batch(batch1, 1)
    hist = {(r.doc_id, r.lsn) for r in pipe.history_df().collect()}
    assert hist == {("a", 1), ("a", 3), ("b", 1), ("b", 2)}
    # closure still correct: a@3 is current, b tombstoned
    cur = {r.doc_id: r.lsn for r in pipe.history_df().filter("is_current").collect()}
    assert cur == {"a": 3}
    # target table is UNaffected by the gate (merge keeps lsn-LWW)
    tgt = {r.doc_id: r.lsn for r in pipe.current_state().collect()}
    assert tgt == {"a": 4}


def test_observed_lineage_mode(spark, tmp_path):
    """lineage_mode='observed': per-batch metrics ride the merge and
    dead-letter actions via observe() — no aggregation job — and land
    as one global lineage row per batch."""
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    rows = [
        ("d1", 1, "I", [1, 2], 2, None, None, 0, None),
        ("d1", 2, "U", [3], 1, None, None, 0, None),
        ("d2", 5, "I", [9], 1, None, None, 1, None),
        ("d2", 6, "D", None, None, None, None, 1, None),
        (None, 7, "I", [1], 1, None, None, 1, None),     # dead: null key
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"), n_buckets=4, compact_every=0,
        lineage_mode="observed",
    )
    stats = pipe.apply_batch(df, 0)
    assert stats["observed_merge"]["rows_in"] == 4
    assert stats["observed_merge"]["min_lsn"] == 1
    assert stats["observed_merge"]["max_lsn"] == 6
    assert stats["observed_merge"]["deletes"] == 1
    (lin,) = pipe.lineage.read().collect()
    assert lin.partition == -1
    assert lin.rows_in == 5           # 4 valid + 1 dead
    assert lin.rows_dead_letter == 1
    assert (lin.min_lsn, lin.max_lsn) == (1, 6)
    assert lin.rows_deduped is None
    # idempotent replay of the same epoch: no duplicate lineage row
    pipe.apply_batch(df, 0)
    assert pipe.lineage.refresh().read().count() == 1


def test_check_cols_gate_reinsert_after_delete(spark, tmp_path):
    """A version following a tombstone must ALWAYS open a history row,
    even when its tracked attrs hash equals the tombstone's all-null
    hash (review finding)."""
    import datetime

    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"), n_buckets=2, compact_every=0,
        scd2_check_cols=["source"],   # nullable col: I rows may hash like D rows
    )
    batch = spark.createDataFrame(
        [
            ("k", 1, "I", [1], 1, None, None, 0, ts(1)),
            ("k", 2, "D", None, None, None, None, 0, ts(2)),
            ("k", 3, "I", [2], 1, None, None, 0, ts(3)),  # source null like the D
        ],
        CHANGE_EVENT_SCHEMA,
    )
    pipe.apply_batch(batch, 0)
    hist = {(r.doc_id, r.lsn, r.op) for r in pipe.history_df().collect()}
    assert hist == {("k", 1, "I"), ("k", 2, "D"), ("k", 3, "I")}
    cur = [r.lsn for r in pipe.history_df().filter("is_current").collect()]
    assert cur == [3]


def test_string_batch_id_stamps_deterministic_hash(spark, tmp_path):
    """A non-numeric batch key must stamp a deterministic non-null
    _batch_id digest (review finding: NULL lost row-level lineage for
    string-epoch deployments); the manifest keeps the original key."""
    from data_pipeline_spark.cdc.merge import merge_into
    from data_pipeline_spark.cdc.schema import CHANGE_EVENT_SCHEMA, TARGET_SCHEMA_BASE
    from data_pipeline_spark.table.laketable import LakeTable

    rows = [("d1", 1, "I", [1, 2], 2, None, None, 0, None)]
    changes = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA_BASE, key_col="doc_id", n_buckets=2
    )
    merge_into(t, changes, "epoch-2026-08-17T00")
    (row,) = t.read().collect()
    assert row._batch_id is not None
    assert t.has_batch("epoch-2026-08-17T00")
    # deterministic: a second table stamps the identical digest
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), TARGET_SCHEMA_BASE, key_col="doc_id", n_buckets=2
    )
    merge_into(t2, changes, "epoch-2026-08-17T00")
    (row2,) = t2.read().collect()
    assert row2._batch_id == row._batch_id
