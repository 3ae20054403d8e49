"""Deterministic synthetic CDC change-log generator (FIXTURES.md §1).

Properties (all seeded, fully reproducible):
* zipf-ish hot keys — a small fraction of doc_ids carry ~50× the events
  (exercises skew salting, north_rule);
* 5–20 events per doc (insert then updates), deletes followed by
  re-inserts for some keys;
* ~1% duplicate deliveries — same (doc_id, lsn, payload), later
  ingest_ts (at-least-once, reference stg_rfqs.sql:17-27);
* out-of-order arrival within each log file chunk;
* one SCHEMA change record mid-stream adding the `source` column
  (mirrors the reference's `..._extra_attribute.csv` drift fixture);
* global lsn strictly increasing with gaps (gap-detection fixture).

Generation is numpy-vectorized and writes chunked parquet directly via
pyarrow — no Spark needed, so tests and bench can synthesize logs fast.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257  # GPT-2-ish vocab size for token ids
SCHEMA_DOC_ID = "__schema__"
DDL_SOURCE = "source:string"


def generate_change_log(
    out_dir: str,
    n_docs: int = 500,
    seed: int = 42,
    n_partitions: int = 4,
    n_files: int = 8,
    dup_rate: float = 0.01,
    delete_doc_frac: float = 0.10,
    hot_doc_frac: float = 0.002,
    hot_multiplier: int = 50,
    min_tok: int = 8,
    max_tok: int = 64,
    evolution_frac: float = 0.5,
    overwrite: bool = True,
) -> dict:
    """Write a change log as parquet chunks under out_dir; return stats."""
    rng = np.random.default_rng(seed)

    # --- events per doc, with hot keys -------------------------------
    per_doc = rng.integers(5, 21, size=n_docs).astype(np.int64)
    n_hot = max(1, int(n_docs * hot_doc_frac)) if n_docs >= 100 else 1
    hot_docs = rng.choice(n_docs, size=n_hot, replace=False)
    per_doc[hot_docs] *= hot_multiplier
    total = int(per_doc.sum())

    doc_idx = np.repeat(np.arange(n_docs), per_doc)
    version = np.concatenate([np.arange(c) for c in per_doc])
    is_last = np.concatenate(
        [np.r_[np.zeros(c - 1, bool), True] for c in per_doc]
    )

    # --- ops: insert, updates, delete(+reinsert) ----------------------
    op = np.where(version == 0, "I", "U").astype(object)
    # some docs get a delete mid-stream (re-insert happens naturally as
    # the next version is re-marked I), some end deleted (drop from final)
    del_docs = rng.choice(n_docs, size=max(1, int(n_docs * delete_doc_frac)), replace=False)
    end_del_docs = set(del_docs[: len(del_docs) // 2].tolist())
    mid_del_docs = set(del_docs[len(del_docs) // 2 :].tolist())
    for d in mid_del_docs:
        idxs = np.flatnonzero(doc_idx == d)
        if len(idxs) >= 3:
            k = idxs[len(idxs) // 2]
            op[k] = "D"
            op[k + 1] = "I"  # re-insert after delete
    for d in end_del_docs:
        idxs = np.flatnonzero(doc_idx == d)
        op[idxs[-1]] = "D"

    # --- global arrival order: random interleave, per-doc version order
    # rows are laid out grouped by doc with version ascending; draw a
    # random arrival coordinate per event, then re-sort each doc's draws
    # ascending so arrival order preserves per-doc version order.
    u = rng.random(total)
    u2 = np.empty(total)
    sort_u_in_doc = np.lexsort((u, doc_idx))
    u2[np.lexsort((version, doc_idx))] = u[sort_u_in_doc]
    # arrival[r] = row index arriving at global rank r
    arrival = np.argsort(u2, kind="stable")

    # --- lsn: strictly increasing along arrival, with gaps ------------
    gaps = rng.integers(1, 4, size=total)
    lsn_by_rank = np.cumsum(gaps)
    lsn = np.empty(total, dtype=np.int64)
    lsn[arrival] = lsn_by_rank

    # --- tokens --------------------------------------------------------
    lens = rng.integers(min_tok, max_tok + 1, size=total)
    flat = rng.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    # --- evolution point + source --------------------------------------
    evo_rank = int(total * evolution_frac)
    evo_lsn = int(lsn_by_rank[evo_rank])
    post_evo = lsn > evo_lsn
    source = np.array(
        [f"src{int(d) % 5}" if p else None for d, p in zip(doc_idx, post_evo)],
        dtype=object,
    )

    # --- assemble in arrival order -------------------------------------
    a = arrival
    is_del = op[a] == "D"
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "doc_id": np.char.add("doc", np.char.zfill(doc_idx[a].astype(str), 8)),
            "lsn": lsn[a],
            "op": op[a],
            "source": source[a],
            "ddl": None,
            "partition": (doc_idx[a] % n_partitions).astype(np.int32),
            "ingest_ts": base_ts + lsn[a].astype("timedelta64[s]"),
        }
    )
    tokens_list = [
        None if is_del[i] else flat[offsets[a[i]] : offsets[a[i]] + lens[a[i]]]
        for i in range(total)
    ]
    df["tokens"] = tokens_list
    df["n_tok"] = [None if t is None else len(t) for t in tokens_list]

    # --- SCHEMA record at the evolution point ---------------------------
    schema_row = pd.DataFrame(
        {
            "doc_id": [SCHEMA_DOC_ID],
            "lsn": [evo_lsn],  # shares the boundary lsn; op disambiguates
            "op": ["SCHEMA"],
            "source": [None],
            "ddl": [DDL_SOURCE],
            "partition": [np.int32(0)],
            "ingest_ts": [base_ts + np.timedelta64(evo_lsn, "s")],
            "tokens": [None],
            "n_tok": [None],
        }
    )
    df = pd.concat(
        [df.iloc[:evo_rank], schema_row, df.iloc[evo_rank:]], ignore_index=True
    )

    # --- duplicates (same doc_id/lsn/payload, later ingest_ts) ----------
    n_dup = int(len(df) * dup_rate)
    if n_dup:
        dup_idx = rng.choice(len(df), size=n_dup, replace=False)
        dups = df.iloc[np.sort(dup_idx)].copy()
        dups = dups[dups["op"] != "SCHEMA"]
        dups["ingest_ts"] = dups["ingest_ts"] + np.timedelta64(7200, "s")
        # splice each duplicate ~later in the stream: append then do the
        # chunk-local shuffle below
        df = pd.concat([df, dups], ignore_index=True)
        # keep duplicates near the end (they arrived later) but shuffle
        # chunk-locally like everything else

    # --- chunk into files, shuffling locally (out-of-order delivery) ----
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    n = len(df)
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    arrow_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("lsn", pa.int64()),
            ("op", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("ddl", pa.string()),
            ("partition", pa.int32()),
            ("ingest_ts", pa.timestamp("us")),
        ]
    )
    for i in range(n_files):
        chunk = df.iloc[bounds[i] : bounds[i + 1]]
        perm = rng.permutation(len(chunk))  # local out-of-order
        chunk = chunk.iloc[perm]
        tbl = pa.Table.from_arrays(
            [
                pa.array(chunk["doc_id"], type=pa.string()),
                pa.array(chunk["lsn"], type=pa.int64()),
                pa.array(chunk["op"], type=pa.string()),
                pa.array(
                    [None if t is None else t for t in chunk["tokens"]],
                    type=pa.list_(pa.int32()),
                ),
                pa.array(
                    [None if pd.isna(v) else int(v) for v in chunk["n_tok"]],
                    type=pa.int32(),
                ),
                pa.array(
                    [None if (v is None or (isinstance(v, float) and pd.isna(v))) else v
                     for v in chunk["source"]],
                    type=pa.string(),
                ),
                pa.array(
                    [None if (v is None or (isinstance(v, float) and pd.isna(v))) else v
                     for v in chunk["ddl"]],
                    type=pa.string(),
                ),
                pa.array(chunk["partition"], type=pa.int32()),
                pa.array(chunk["ingest_ts"], type=pa.timestamp("us")),
            ],
            schema=arrow_schema,
        )
        pq.write_table(tbl, os.path.join(out_dir, f"log-{i:05d}.parquet"))

    return {
        "total_events": int(len(df)),
        "n_docs": n_docs,
        "n_files": n_files,
        "evolution_lsn": evo_lsn,
        "duplicates": int(n_dup),
        "hot_docs": [f"doc{int(d):08d}" for d in hot_docs],
    }
