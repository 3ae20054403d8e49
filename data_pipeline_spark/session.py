"""SparkSession factory with the engine's required configuration.

Scale posture: these confs are what we would set on a 1000-executor
cluster too — AQE for runtime re-planning + skew-join splitting, Arrow
for all pandas-UDF transport (SURVEY.md §4), UTC session timezone so
results are engine-independent (matches the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession configured for the engine.

    cpus: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to cpus so one reduce wave saturates
    the cores without tiny-task overhead at sandbox scale; on a real
    cluster this is sized to keep post-shuffle partitions ~128-256 MB.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cpus}]"
        ncores = cpus
    if shuffle_partitions is None:
        shuffle_partitions = max(ncores, 4)

    # Ship this package to python workers: foreachBatch / pandas-UDF
    # closures reference the module, so executors must import it.  On a
    # cluster this is `spark-submit --py-files dps.zip` (north_rule);
    # in local mode the workers inherit PYTHONPATH from the driver env.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # max_by/min_by (the LWW + merge reduce) are typed-imperative
        # aggregates → ObjectHashAggregateExec; the default sort-based
        # fallback kicks in at 128 distinct keys per task, silently
        # turning every reduce into a per-partition SORT.  Raise it so
        # the hash path holds for realistic per-task key counts (object
        # buffers are one packed row per group — bounded by task rows).
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # file-source partition sizing: at 100 TB this is the knob that
        # keeps scan tasks ~128 MB; harmless at sandbox scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
