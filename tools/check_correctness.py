#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

For each named query (default: all), runs the Spark DataFrame from
``__spark_entry__.queries()`` and the DuckDB twin from ``oracle_sql()``
on the same parquet tables, then compares row count, column-name set,
and the full value multiset (columns sorted by name, rows sorted).

Usage:  python tools/check_correctness.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as em
    from data_pipeline_spark.session import build_session

    qs = em.queries()
    oracles = em.oracle_sql()
    names = args.queries or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    con.execute("SET TimeZone='UTC'")

    spark = build_session("check-correctness", cpus=8, shuffle_partitions=8)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: no_oracle (spark_rows={len(srows)})")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            failures += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_vals = ok_rows and ok_schema and _rowset(scols, srows) == _rowset(
            ocols, orows
        )
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{name}: FAIL rows={len(srows)}/{len(orows)} "
                f"schema={ok_schema} ({sorted(scols)} vs {sorted(ocols)}) "
                f"values={ok_vals}"
            )
            if ok_rows and ok_schema and not ok_vals:
                a, b = _rowset(scols, srows), _rowset(ocols, orows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"   spark={x}\n   duck ={y}")
        else:
            print(f"{name}: PASS ({len(srows)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
