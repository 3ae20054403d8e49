"""Row-level validation rule engine (SURVEY.md P8/P9).

The reference implements a mini-DSL interpreted per row in Python
(orchestrator/orchestrator/rules.py:26-302).  Here each rule string
compiles to a Column expression — evaluated JVM-side inside whole-stage
codegen, so validation costs one scan regardless of rule count (the
100 TB-safe formulation; no UDFs, no per-row Python).

Supported rule forms (the reference's DSL, rules.py:26-302 +
source_specs/trading/murex_trades.yaml:150-176):

    field is not null
    field > N / >= / < / <= / == / != N
    field in ('A', 'B', ...)
    field matches 'regex'
    field <= current_timestamp()

Severity: error → quarantine the row; warning → keep but count.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULE_RES = [
    (re.compile(r"^(\w+)\s+is\s+not\s+null$", re.I), "notnull"),
    (re.compile(r"^(\w+)\s*(>=|<=|!=|==|=|>|<)\s*current_timestamp\(\)$", re.I), "now_cmp"),
    (re.compile(r"^(\w+)\s*(>=|<=|!=|==|=|>|<)\s*('[^']*'|[-\d.]+)$", re.I), "cmp"),
    (re.compile(r"^(\w+)\s+in\s+\((.+)\)$", re.I), "in"),
    (re.compile(r"^(\w+)\s+matches\s+'(.+)'$", re.I), "matches"),
]

_OPS = {
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "=": lambda c, v: c == v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


@dataclass
class Rule:
    expr: str
    severity: str = "error"  # error → quarantine; warning → count only
    name: str | None = None


def _lit(raw: str):
    raw = raw.strip()
    if raw.startswith("'"):
        return F.lit(raw.strip("'"))
    return F.lit(float(raw) if "." in raw else int(raw))


def compile_rule(rule: str) -> Column:
    """Compile one rule string to a boolean Column (True = passes)."""
    r = rule.strip()
    for rex, kind in _RULE_RES:
        m = rex.match(r)
        if not m:
            continue
        col = F.col(m.group(1))
        if kind == "notnull":
            return col.isNotNull()
        if kind == "now_cmp":
            return _OPS[m.group(2)](col, F.current_timestamp())
        if kind == "cmp":
            return _OPS[m.group(2)](col, _lit(m.group(3)))
        if kind == "in":
            vals = [v.strip().strip("'") for v in m.group(2).split(",")]
            return col.isin(*vals)
        if kind == "matches":
            return col.rlike(m.group(2))
    raise ValueError(f"unparseable rule: {rule!r}")


def apply_rules(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Evaluate all rules in one scan.  Returns (valid, quarantined,
    warnings): quarantined rows carry `failure_reasons` (all failed
    error-rules, concat); warnings rows carry `warning_reasons`.
    Mirrors parsers.py:114-158 severity split."""
    err_checks, warn_checks = [], []
    for i, rule in enumerate(rules):
        c = compile_rule(rule.expr)
        name = rule.name or f"rule_{i}:{rule.expr}"
        target = err_checks if rule.severity == "error" else warn_checks
        target.append((name, c))

    def reasons(checks):
        return F.concat_ws(
            ";",
            *[F.when(~F.coalesce(c, F.lit(False)), F.lit(n)) for n, c in checks],
        )

    err_reason = reasons(err_checks) if err_checks else F.lit("")
    warn_reason = reasons(warn_checks) if warn_checks else F.lit("")

    tagged = df.withColumn("_err", err_reason).withColumn("_warn", warn_reason)
    valid = tagged.filter(F.col("_err") == "").drop("_err", "_warn")
    quarantined = (
        tagged.filter(F.col("_err") != "")
        .withColumnRenamed("_err", "failure_reasons")
        .drop("_warn")
    )
    warnings = (
        tagged.filter((F.col("_err") == "") & (F.col("_warn") != ""))
        .withColumnRenamed("_warn", "warning_reasons")
        .drop("_err")
    )
    return valid, quarantined, warnings
