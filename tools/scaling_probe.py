#!/usr/bin/env python
"""Substrate probe for the N→4N scaling evidence (BENCH.md).

Runs two control workloads at the same confined core counts as the
engine bench, in the same window, to separate the engine's scaling
from the host's:

  shuffle  — plain range → hash → groupBy-sum with NO engine code:
             measures the host's Spark byte-moving ceiling.
  cpu      — N independent pure-Python busy loops (no Spark, no
             memory traffic): measures raw core scaling.

If the engine's measured efficiency ≈ the shuffle probe's efficiency
in the same window, the engine adds no scaling penalty beyond the
substrate; the cpu probe shows whether the cores themselves scale.

Usage: python tools/scaling_probe.py [--levels 2,8] [--rows 100000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _shuffle_worker(cpus: int, rows: int) -> None:
    sys.path.insert(0, REPO_ROOT)
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName(f"probe-{cpus}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(8 * cpus))
        .config("spark.driver.memory", f"{2 * cpus + 4}g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # warm-up (JIT/codegen) then timed run
    for i, n in enumerate((rows // 10, rows)):
        t0 = time.perf_counter()
        (
            spark.range(n, numPartitions=8 * cpus)
            .withColumn("k", F.xxhash64("id") % 10_000_000)
            .groupBy("k")
            .agg(F.sum("id").alias("s"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "elapsed": dt, "rows_per_sec": rows / dt}))
    spark.stop()


def _busy(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def _cpu_worker(cpus: int, iters: int) -> None:
    import multiprocessing as mp

    busy = _busy
    t0 = time.perf_counter()
    with mp.Pool(cpus) as pool:
        pool.map(busy, [iters] * cpus)
    dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "elapsed": dt, "work_per_sec": cpus * iters / dt}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--iters", type=int, default=30_000_000)
    ap.add_argument("--worker", choices=["shuffle", "cpu"], default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    if args.worker == "shuffle":
        _shuffle_worker(args.cpus, args.rows)
        return
    if args.worker == "cpu":
        _cpu_worker(args.cpus, args.iters)
        return

    levels = [int(x) for x in args.levels.split(",")]
    have_taskset = shutil.which("taskset") is not None
    out: dict = {"levels": levels, "confinement": "taskset" if have_taskset else "none"}
    for kind, metric in (("shuffle", "rows_per_sec"), ("cpu", "work_per_sec")):
        res = {}
        for cpus in levels:
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--worker", kind, "--cpus", str(cpus),
                "--rows", str(args.rows), "--iters", str(args.iters),
            ]
            if have_taskset:
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            r = subprocess.run(cmd, capture_output=True, text=True, check=True)
            res[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
        lo, hi = min(levels), max(levels)
        eff = res[hi][metric] / (hi / lo * res[lo][metric])
        out[kind] = {str(c): res[c] for c in levels}
        out[f"{kind}_efficiency"] = round(eff, 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
