"""Custom stateful streaming operator via applyInPandasWithState.

The CdcPipeline is deliberately stateless across batches (SURVEY.md
T7) — all cross-batch truth lives in the lake tables, which is what
makes exactly-once replay possible.  But a serving/monitoring consumer
sometimes wants a RUNNING per-key summary maintained inside the stream
itself, without re-reading the table every batch; the north_star names
``applyInPandasWithState`` as the engine's custom-stateful path, and
this module is that operator: a per-doc running state (latest lsn,
event count, tombstone flag) kept in Spark's state store across
micro-batches, updated with vectorized pandas (no per-row Python in
the hot path — one pandas reduction per key-group per batch).

Scale notes: state is partitioned by the grouping key across the
cluster (RocksDB-backed store in production configs); the per-key
payload here is three scalars, so state size is O(distinct keys) ×
~tens of bytes.  A watermark + timeout (GroupStateTimeout) would bound
state for expiring keys; the CDC key space is the document id, which
is long-lived, so the default is NoTimeout.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("lsn", LongType()),         # latest applied lsn
        StructField("n_events", LongType()),    # events seen (incl. dups)
        StructField("deleted", BooleanType()),  # latest op is a tombstone
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("lsn", LongType()),
        StructField("n_events", LongType()),
        StructField("deleted", BooleanType()),
    ]
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    lsn, n_events, deleted = (
        state.get if state.exists else (-1, 0, False)
    )
    for pdf in pdfs:
        # tolerate malformed rows (the raw stream contains them by
        # contract — the pipeline quarantines null-lsn rows, a monitor
        # must not die on them): count them, ignore them for ordering
        n_events += int(len(pdf))
        pdf = pdf[pdf["lsn"].notna()]
        if len(pdf) == 0:
            continue
        batch_max = int(pdf["lsn"].max())
        if batch_max > lsn:
            lsn = batch_max
            # LWW within the batch: the op of the max-lsn row decides
            # the tombstone flag (ties: any of the max rows — the merge
            # path's ingest_ts tie-break matters for payloads, not for
            # this monitoring flag)
            top = pdf.loc[pdf["lsn"].idxmax()]
            deleted = str(top["op"]) == "D"
    state.update((lsn, n_events, deleted))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "lsn": [lsn],
            "n_events": [n_events],
            "deleted": [deleted],
        }
    )


def running_doc_state(events: DataFrame) -> DataFrame:
    """Streaming per-doc running summary.  `events` must be a STREAMING
    DataFrame with at least (doc_id, lsn, op); emits one updated row
    per doc per micro-batch in which the doc appeared."""
    return (
        events.select("doc_id", "lsn", "op")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
