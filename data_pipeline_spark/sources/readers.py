"""Validated file sources (SURVEY.md S1-S3, S12).

The reference parses CSV/JSON with per-field type+constraint checks and
quarantines failing rows (orchestrator/orchestrator/parsers.py:68-227).
Spark-first version: read everything as string (no silent inference,
like the reference's infer_schema_length=0), then try_cast per field —
rows where a non-null input failed its cast are quarantined, valid rows
proceed (docs/design.md:539-553 "bad rows never block good rows").
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .rules import Rule, apply_rules


@dataclass
class FieldSpec:
    name: str
    dtype: str = "string"          # spark type name: long, double, timestamp, ...
    nullable: bool = True
    allowed_values: list | None = None
    min_value: float | None = None
    max_value: float | None = None
    xpath: str | None = None       # XML sources only (S4): extraction path


@dataclass
class ValidatedRead:
    valid: DataFrame
    quarantined: DataFrame
    warnings: DataFrame


def _constraint_rules(specs: list[FieldSpec]) -> list[Rule]:
    rules: list[Rule] = []
    for s in specs:
        if not s.nullable:
            rules.append(Rule(f"{s.name} is not null", "error", f"{s.name}:not_null"))
        if s.allowed_values:
            vals = ", ".join(f"'{v}'" for v in s.allowed_values)
            rules.append(Rule(f"{s.name} in ({vals})", "error", f"{s.name}:allowed"))
        if s.min_value is not None:
            rules.append(Rule(f"{s.name} >= {s.min_value}", "error", f"{s.name}:min"))
        if s.max_value is not None:
            rules.append(Rule(f"{s.name} <= {s.max_value}", "error", f"{s.name}:max"))
    return rules


def _typed_split(raw: DataFrame, specs: list[FieldSpec], extra_rules: list[Rule]) -> ValidatedRead:
    """try_cast each declared column; a row quarantines when a non-null
    raw value casts to null (P4 safe-cast semantics), then constraint
    rules run on the typed rows."""
    typed = raw
    cast_fail = F.lit(False)
    fail_reasons = []
    for s in specs:
        if s.dtype != "string":
            typed = typed.withColumn(
                s.name, F.expr(f"try_cast(`{s.name}` AS {s.dtype})")
            )
            bad = F.col(f"`_raw_{s.name}`").isNotNull() & F.col(s.name).isNull()
            fail_reasons.append(F.when(bad, F.lit(f"{s.name}:cast")))
            cast_fail = cast_fail | bad

    reason = F.concat_ws(";", *fail_reasons) if fail_reasons else F.lit("")
    typed = typed.withColumn("_cast_err", reason)
    cast_ok = typed.filter(F.col("_cast_err") == "").drop("_cast_err")
    cast_bad = typed.filter(F.col("_cast_err") != "").withColumnRenamed(
        "_cast_err", "failure_reasons"
    )
    cast_ok = cast_ok.drop(*[c for c in cast_ok.columns if c.startswith("_raw_")])
    valid, quarantined, warnings = apply_rules(cast_ok, _constraint_rules(specs) + extra_rules)
    quarantined = quarantined.drop(*[c for c in quarantined.columns if c.startswith("_raw_")])
    cast_bad = cast_bad.drop(*[c for c in cast_bad.columns if c.startswith("_raw_")])
    all_quarantined = quarantined.unionByName(cast_bad, allowMissingColumns=True)
    return ValidatedRead(valid=valid, quarantined=all_quarantined, warnings=warnings)


def read_csv_validated(
    spark: SparkSession,
    path: str,
    specs: list[FieldSpec],
    rules: list[Rule] | None = None,
    delimiter: str = ",",
    load_id: str | None = None,
) -> ValidatedRead:
    """S2 — typed+validated CSV scan with quarantine split.

    All columns are read as string first (the reference's
    infer_schema_length=0, main.py:261), keeping the raw value for the
    failure report, then cast+validated in one scan."""
    all_str = StructType([StructField(s.name, StringType()) for s in specs])
    raw = spark.read.schema(all_str).option("header", True).option("sep", delimiter).csv(path)
    for s in specs:
        if s.dtype != "string":
            raw = raw.withColumn(f"_raw_{s.name}", F.col(s.name))
    out = _typed_split(raw, specs, rules or [])
    if load_id is not None:
        # lineage stamp per load (reference _load_id, main.py:290)
        out = ValidatedRead(
            valid=out.valid.withColumn("_load_id", F.lit(load_id)),
            quarantined=out.quarantined.withColumn("_load_id", F.lit(load_id)),
            warnings=out.warnings.withColumn("_load_id", F.lit(load_id)),
        )
    return out


def read_json_validated(
    spark: SparkSession,
    path: str,
    specs: list[FieldSpec],
    rules: list[Rule] | None = None,
    load_id: str | None = None,
) -> ValidatedRead:
    """S3 — JSON/JSONL scan (spark.read.json handles both modes), same
    cast+constraint quarantine split."""
    all_str = StructType([StructField(s.name, StringType()) for s in specs])
    raw = spark.read.schema(all_str).json(path)
    for s in specs:
        if s.dtype != "string":
            raw = raw.withColumn(f"_raw_{s.name}", F.col(s.name))
    out = _typed_split(raw, specs, rules or [])
    if load_id is not None:
        out = ValidatedRead(
            valid=out.valid.withColumn("_load_id", F.lit(load_id)),
            quarantined=out.quarantined.withColumn("_load_id", F.lit(load_id)),
            warnings=out.warnings.withColumn("_load_id", F.lit(load_id)),
        )
    return out


def load_arrow(spark: SparkSession, table) -> DataFrame:
    """S7 — zero-copy Arrow load (reference loader.py:114-134: DuckDB
    registers the Arrow table and INSERT-SELECTs from it without a row
    conversion).  Spark 4 accepts a pyarrow.Table directly in
    createDataFrame — the data crosses into the JVM as Arrow IPC
    batches, no per-row Python materialisation; older Sparks fall back
    to the Arrow-accelerated pandas path (same wire format)."""
    try:
        return spark.createDataFrame(table)
    except TypeError:
        return spark.createDataFrame(table.to_pandas())


def df_to_arrow(df: DataFrame):
    """The return path: DataFrame → pyarrow.Table via the Arrow
    collect endpoint (toArrow in Spark 4; _collect_as_arrow before),
    for handing results to DuckDB / parquet writers driver-side.
    Driver-memory-bound by definition — extracts and reports, never in
    the hot path."""
    if hasattr(df, "toArrow"):
        return df.toArrow()
    import pyarrow as pa

    return pa.Table.from_batches(df._collect_as_arrow())  # noqa: SLF001
