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

Generation is fully vectorized — numpy for the scalar columns and a
pyarrow ListArray + take() for the token payloads (no per-row Python),
so multi-million-event logs for the scaling bench synthesize in
seconds.  No Spark needed; chunked parquet is written via pyarrow.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB = 50257  # GPT-2-ish vocab size for token ids
SCHEMA_DOC_ID = "__schema__"
DDL_SOURCE = "source:string"

ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("tokens", pa.large_list(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("ddl", pa.string()),
        ("partition", pa.int32()),
        ("ingest_ts", pa.timestamp("us")),
    ]
)


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

    # --- ops: insert, updates, delete(+reinsert) ----------------------
    op = np.where(version == 0, "I", "U").astype(object)
    # some docs get a delete mid-stream (re-insert happens naturally as
    # the next version is re-marked I), some end deleted (drop from final)
    del_docs = rng.choice(n_docs, size=max(1, int(n_docs * delete_doc_frac)), replace=False)
    end_del_docs = del_docs[: len(del_docs) // 2]
    mid_del_docs = del_docs[len(del_docs) // 2 :]
    doc_start = np.r_[0, np.cumsum(per_doc)[:-1]]
    # mid-stream delete at the doc's middle version, re-insert right after
    mid_ok = per_doc[mid_del_docs] >= 3
    mids = mid_del_docs[mid_ok]
    mid_pos = doc_start[mids] + per_doc[mids] // 2
    op[mid_pos] = "D"
    op[mid_pos + 1] = "I"
    # end-deleted docs: final version is a delete
    end_pos = doc_start[end_del_docs] + per_doc[end_del_docs] - 1
    op[end_pos] = "D"

    # --- global arrival order: random interleave, per-doc version order
    # rows are laid out grouped by doc with version ascending; draw a
    # random arrival coordinate per event, then re-sort each doc's draws
    # ascending so arrival order preserves per-doc version order.
    u = rng.random(total)
    u2 = np.empty(total)
    sort_u_in_doc = np.lexsort((u, doc_idx))
    u2[np.lexsort((version, doc_idx))] = u[sort_u_in_doc]
    # arrival[r] = layout row index arriving at global rank r
    arrival = np.argsort(u2, kind="stable")

    # --- lsn: strictly increasing along arrival, with gaps ------------
    gaps = rng.integers(1, 4, size=total)
    lsn_by_rank = np.cumsum(gaps)
    lsn = np.empty(total, dtype=np.int64)
    lsn[arrival] = lsn_by_rank

    # --- tokens (layout order, contiguous) ----------------------------
    lens = rng.integers(min_tok, max_tok + 1, size=total).astype(np.int64)
    flat = rng.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    tokens_layout = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat))

    # --- evolution point + source --------------------------------------
    evo_rank = int(total * evolution_frac)
    evo_lsn = int(lsn_by_rank[evo_rank])

    # --- assemble in arrival order (vectorized take) --------------------
    a = arrival
    is_del = op[a] == "D"
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    post_evo = lsn[a] > evo_lsn

    doc_ids = np.char.add(
        "doc", np.char.zfill(doc_idx[a].astype("U8"), 8)
    )
    src_vals = np.char.add("src", (doc_idx[a] % 5).astype("U1"))
    take_idx = pa.array(a, mask=is_del)  # null index → null tokens

    main = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "lsn": pa.array(lsn[a]),
            "op": pa.array(op[a].astype("U1"), type=pa.string()),
            "tokens": pc.take(tokens_layout, take_idx),
            "n_tok": pa.array(lens[a].astype(np.int32), mask=is_del),
            "source": pa.array(src_vals, type=pa.string(), mask=~post_evo),
            "ddl": pa.nulls(total, pa.string()),
            "partition": pa.array((doc_idx[a] % n_partitions).astype(np.int32)),
            "ingest_ts": pa.array(
                base_ts + lsn[a].astype("timedelta64[s]"), type=pa.timestamp("us")
            ),
        },
        schema=ARROW_SCHEMA,
    )

    # --- SCHEMA record at the evolution point ---------------------------
    schema_row = pa.table(
        {
            "doc_id": pa.array([SCHEMA_DOC_ID]),
            # shares the boundary lsn; op disambiguates
            "lsn": pa.array([evo_lsn], type=pa.int64()),
            "op": pa.array(["SCHEMA"]),
            "tokens": pa.nulls(1, pa.large_list(pa.int32())),
            "n_tok": pa.nulls(1, pa.int32()),
            "source": pa.nulls(1, pa.string()),
            "ddl": pa.array([DDL_SOURCE]),
            "partition": pa.array([0], type=pa.int32()),
            "ingest_ts": pa.array(
                [base_ts + np.timedelta64(evo_lsn, "s")], type=pa.timestamp("us")
            ),
        },
        schema=ARROW_SCHEMA,
    )
    tbl = pa.concat_tables(
        [main.slice(0, evo_rank), schema_row, main.slice(evo_rank)]
    )

    # --- duplicates (same doc_id/lsn/payload, later ingest_ts) ----------
    n_dup = int(tbl.num_rows * dup_rate)
    if n_dup:
        dup_idx = rng.choice(tbl.num_rows, size=n_dup, replace=False)
        dup_idx = np.sort(dup_idx)
        dups = tbl.take(pa.array(dup_idx))
        dups = dups.filter(pc.not_equal(dups["op"], "SCHEMA"))
        n_dup = dups.num_rows
        shifted = pc.add(
            dups["ingest_ts"], pa.scalar(7_200_000_000, pa.duration("us"))
        ).cast(pa.timestamp("us"))
        dups = dups.set_column(
            dups.schema.get_field_index("ingest_ts"), "ingest_ts", shifted
        )
        # duplicates arrived later: append at the end, then the chunk-
        # local shuffle below spreads them within the final chunks
        tbl = pa.concat_tables([tbl, dups])

    # --- chunk into files, shuffling locally (out-of-order delivery) ----
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    for i in range(n_files):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        perm = rng.permutation(hi - lo)  # local out-of-order
        chunk = tbl.slice(lo, hi - lo).take(pa.array(perm))
        pq.write_table(chunk, os.path.join(out_dir, f"log-{i:05d}.parquet"))

    return {
        "total_events": int(n),
        "n_docs": n_docs,
        "n_files": n_files,
        "evolution_lsn": evo_lsn,
        "duplicates": int(n_dup),
        "hot_docs": [f"doc{int(d):08d}" for d in hot_docs],
    }
