"""Declarative source specs: YAML loading + file→spec glob dispatch.

The reference's whole ingest surface is driven by YAML specs — schema
fields with type/nullable/allowed_values/min_value, a row-level rules
block, and a path glob the validator matches incoming files against
(source_specs/trading/murex_trades.yaml:34-176,
orchestrator/orchestrator/validator.py:314-328).  This module loads
that spec shape into the engine's FieldSpec/Rule model so a user
declares sources in YAML instead of hand-building specs in Python.

PyYAML is not guaranteed in the runtime, so a small YAML-subset parser
(indentation maps, lists of maps, inline lists, quoted scalars,
comments — everything the spec shape uses) is built in; when the real
`yaml` module is importable it is preferred.
"""

from __future__ import annotations

import fnmatch
import os
from dataclasses import dataclass, field

from .readers import FieldSpec, ValidatedRead, read_csv_validated, read_json_validated
from .rules import Rule

# ----------------------------------------------------------------------
# Minimal YAML subset parser
# ----------------------------------------------------------------------


def _strip_comment(line: str) -> str:
    out = []
    quote = None
    for ch in line:
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            out.append(ch)
        elif ch == "#":
            break
        else:
            out.append(ch)
    return "".join(out)


def _scalar(s: str):
    s = s.strip()
    if not s:
        return None
    if s[0] in "\"'" and s.endswith(s[0]) and len(s) >= 2:
        return s[1:-1]
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1].strip()
        if not inner:
            return []
        return [_scalar(p) for p in _split_inline(inner)]
    low = s.lower()
    if low in ("null", "~"):
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _split_inline(inner: str) -> list[str]:
    parts, buf, quote = [], [], None
    for ch in inner:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch == ",":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" "))


def _split_kv(s: str) -> tuple[str, str] | None:
    """Split `key: value` respecting quotes; None if not a mapping."""
    quote = None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == ":" and (i + 1 == len(s) or s[i + 1] in " \t"):
            return s[:i].strip(), s[i + 1 :].strip()
        elif ch == ":" and i + 1 == len(s) - 0:
            return s[:i].strip(), ""
    if s.endswith(":"):
        return s[:-1].strip(), ""
    return None


def _parse_block(lines: list[str], i: int, indent: int):
    if lines[i].lstrip().startswith("- "):
        return _parse_list(lines, i, indent)
    return _parse_map(lines, i, indent)


def _parse_map(lines: list[str], i: int, indent: int):
    out: dict = {}
    while i < len(lines):
        line = lines[i]
        if _indent(line) != indent or line.lstrip().startswith("- "):
            break
        kv = _split_kv(line.strip())
        if kv is None:
            raise ValueError(f"unparseable line: {line!r}")
        k, v = kv
        if v:
            out[k] = _scalar(v)
            i += 1
        else:
            i += 1
            if i < len(lines) and _indent(lines[i]) > indent:
                out[k], i = _parse_block(lines, i, _indent(lines[i]))
            elif i < len(lines) and lines[i].lstrip().startswith("- ") and _indent(
                lines[i]
            ) == indent:
                # lists are commonly indented at the SAME level as their key
                out[k], i = _parse_list(lines, i, indent)
            else:
                out[k] = None
    return out, i


def _parse_list(lines: list[str], i: int, indent: int):
    out: list = []
    while i < len(lines):
        line = lines[i]
        if _indent(line) != indent or not line.lstrip().startswith("-"):
            break
        item = line.lstrip()[1:].strip()
        if not item:
            i += 1
            if i < len(lines) and _indent(lines[i]) > indent:
                val, i = _parse_block(lines, i, _indent(lines[i]))
                out.append(val)
            else:
                out.append(None)
            continue
        kv = _split_kv(item)
        if kv is None:
            out.append(_scalar(item))
            i += 1
            continue
        # list item that is a map: `- name: x` then continuation keys
        # at a deeper indent than the dash
        d: dict = {}
        k, v = kv
        item_indent = _indent(line) + (len(line.lstrip()) - len(item))
        if v:
            d[k] = _scalar(v)
            i += 1
        else:
            i += 1
            if i < len(lines) and _indent(lines[i]) > item_indent:
                d[k], i = _parse_block(lines, i, _indent(lines[i]))
            else:
                d[k] = None
        while (
            i < len(lines)
            and _indent(lines[i]) > indent
            and not lines[i].lstrip().startswith("- ")
        ):
            cont, i = _parse_map(lines, i, _indent(lines[i]))
            d.update(cont)
        out.append(d)
    return out, i


def parse_yaml(text: str) -> dict:
    """Parse the spec-shaped YAML subset (PyYAML when available)."""
    try:
        import yaml  # type: ignore

        return yaml.safe_load(text)
    except ImportError:
        pass
    lines = [
        _strip_comment(raw).rstrip()
        for raw in text.splitlines()
    ]
    lines = [ln for ln in lines if ln.strip() and ln.strip() != "---"]
    if not lines:
        return {}
    val, idx = _parse_block(lines, 0, _indent(lines[0]))
    if idx != len(lines):
        raise ValueError(f"trailing unparsed content at line {idx}: {lines[idx]!r}")
    return val


# ----------------------------------------------------------------------
# Spec model
# ----------------------------------------------------------------------

# reference type vocabulary (murex_trades.yaml) → spark type names
_TYPE_MAP = {
    "STRING": "string",
    "INT64": "long",
    "INTEGER": "long",
    "NUMERIC": "double",
    "FLOAT64": "double",
    "BOOL": "boolean",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp",
    "DATE": "date",
}


@dataclass
class SourceSpec:
    name: str
    path_pattern: str
    format: str = "csv"
    fields: list[FieldSpec] = field(default_factory=list)
    rules: list[Rule] = field(default_factory=list)
    encoding: str = "utf-8"
    expectations: dict = field(default_factory=dict)
    raw: dict = field(default_factory=dict)


def spec_from_dict(d: dict) -> SourceSpec:
    src = d.get("source", {}) or {}
    fields = []
    for f in d.get("schema", []) or []:
        fields.append(
            FieldSpec(
                name=f["name"],
                dtype=_TYPE_MAP.get(str(f.get("type", "STRING")).upper(), "string"),
                nullable=bool(f.get("nullable", True)),
                allowed_values=f.get("allowed_values"),
                min_value=f.get("min_value"),
                max_value=f.get("max_value"),
                xpath=f.get("xpath"),
            )
        )
    rules = []
    validation = d.get("validation", {}) or {}
    for r in validation.get("row_level", []) or []:
        rules.append(
            Rule(
                expr=r["rule"],
                severity=str(r.get("severity", "error")),
                name=r.get("name"),
            )
        )
    return SourceSpec(
        name=d.get("name", "unnamed"),
        path_pattern=src.get("path_pattern", "*"),
        format=str(src.get("format", "csv")).lower(),
        fields=fields,
        rules=rules,
        encoding=src.get("encoding", "utf-8"),
        expectations=d.get("expectations", {}) or {},
        raw=d,
    )


def load_spec(path: str) -> SourceSpec:
    with open(path, encoding="utf-8") as fh:
        return spec_from_dict(parse_yaml(fh.read()))


def load_spec_dir(spec_dir: str) -> dict[str, SourceSpec]:
    """Load every *.yaml / *.yml under spec_dir (recursively), keyed by
    spec name — the reference's source_specs/ tree."""
    out: dict[str, SourceSpec] = {}
    for root, _dirs, files in os.walk(spec_dir):
        for fn in sorted(files):
            if fn.endswith((".yaml", ".yml")):
                spec = load_spec(os.path.join(root, fn))
                out[spec.name] = spec
    return out


def match_spec(path: str, specs: dict[str, SourceSpec]) -> SourceSpec | None:
    """File → spec dispatch by glob (validator.py:314-328).

    Two phases across ALL specs: exact full-path glob first (with any
    landing/ prefix stripped from both sides), then a basename-only
    fallback.  Interleaving the fallback per-spec would let the first
    spec whose FILENAME pattern happens to match shadow another spec's
    exact directory match (e.g. desk/trades_*.csv vs ops/trades_*.csv
    both ending in trades_*.csv)."""
    def _strip_landing(p: str) -> str:
        # strip only a LEADING landing/ prefix: a substring replace
        # would mangle patterns like 'prod-landing/trades_*.csv' into
        # 'prod-trades_*.csv', which then matches nothing
        return p[len("landing/"):] if p.startswith("landing/") else p

    rel = _strip_landing(path.lstrip("/"))
    for spec in specs.values():
        if fnmatch.fnmatch(rel, _strip_landing(spec.path_pattern)):
            return spec
    for spec in specs.values():
        pattern = _strip_landing(spec.path_pattern)
        if fnmatch.fnmatch(os.path.basename(rel), os.path.basename(pattern)):
            return spec
    return None


def read_with_spec(spark, path: str, spec: SourceSpec, load_id=None) -> ValidatedRead:
    """Read + validate a file according to its spec (format dispatch)."""
    if spec.format == "csv":
        return read_csv_validated(
            spark, path, spec.fields, rules=spec.rules, load_id=load_id
        )
    if spec.format in ("json", "jsonl"):
        return read_json_validated(
            spark, path, spec.fields, rules=spec.rules, load_id=load_id
        )
    if spec.format == "xml":
        from .xml import read_xml_validated

        src = spec.raw.get("source", {}) or {}
        xml_cfg = spec.raw.get("xml_config", {}) or {}
        return read_xml_validated(
            spark,
            path,
            spec.fields,
            row_element=src.get("row_element", "row"),
            namespaces=xml_cfg.get("namespaces"),
            rules=spec.rules,
            load_id=load_id,
        )
    raise ValueError(f"unsupported source format {spec.format!r}")
