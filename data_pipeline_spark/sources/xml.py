"""XML source (SURVEY.md S4) — the reference's last uncovered scan.

The reference parses XML with lxml iterparse, matching a row element
(with namespace strictness) and extracting each field by XPath
(orchestrator/orchestrator/parsers.py:256-331).  Re-expressed
Spark-side without the spark-xml jar (not in the sandbox):

* `spark.read.format("binaryFile")` lists and distributes the files —
  one row per file, read parallelism = file count (the natural unit:
  an XML document's grammar is sequential, files are not);
* a `mapInPandas` stage runs stdlib ElementTree **iterparse** over
  each file's bytes, emitting one all-string row per matched row
  element with `elem.clear()` after each (bounded memory per file,
  the reference's streaming mode);
* the same try_cast + rule validation split as CSV/JSON
  (`_typed_split`) types and quarantines the rows.

XPath subset supported (everything the reference specs use): relative
element paths `a/b`, optional namespace prefixes `mx:a/mx:b` resolved
via the `namespaces` map, a trailing `/text()`, and `@attr` leafs.
Very large single files parse on one executor core — the reference has
the same constraint (`streaming_threshold_mb`); split such feeds
upstream.
"""

from __future__ import annotations

import io
from typing import Iterator
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .readers import FieldSpec, ValidatedRead, _typed_split
from .rules import Rule


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _compile_xpath(xpath: str, namespaces: dict[str, str] | None):
    """'mx:A/mx:B/text()' → (element path for ElementTree.find, leaf).

    leaf is 'text' or an attribute name ('@id' → 'id')."""
    ns = namespaces or {}
    parts = [p for p in xpath.strip().strip("/").split("/") if p]
    leaf = "text"
    if parts and parts[-1] == "text()":
        parts = parts[:-1]
    elif parts and parts[-1].startswith("@"):
        leaf = parts[-1][1:]
        parts = parts[:-1]
    resolved = []
    for p in parts:
        if ":" in p:
            prefix, name = p.split(":", 1)
            uri = ns.get(prefix)
            resolved.append(f"{{{uri}}}{name}" if uri else name)
        else:
            resolved.append(p)
    return "/".join(resolved), leaf


def _extract(elem, path: str, leaf: str):
    target = elem if not path else elem.find(path)
    if target is None:
        # lenient fallback: retry ignoring namespaces (reference specs
        # sometimes omit prefixes for default-namespace documents)
        if path:
            want = [_local(p) for p in path.split("/")]
            target = elem
            for name in want:
                target = next(
                    (c for c in target if _local(c.tag) == name), None
                )
                if target is None:
                    return None
        else:
            return None
    if leaf == "text":
        text = (target.text or "").strip()
        return text if text else None
    return target.get(leaf)


def parse_xml_rows(
    content: bytes,
    row_element: str,
    fields: list[tuple[str, str, str]],
) -> Iterator[dict]:
    """iterparse one document; yields {field: str|None} per row element
    (matched by LOCAL name, like the reference's namespace-lenient
    mode).  fields = (name, element_path, leaf)."""
    # bounded memory: elem.clear() alone leaves O(rows) element shells
    # (and non-row headers) attached to the growing tree root, so track
    # the root from the first start event and clear its children after
    # each processed row — the standard iterparse streaming pattern.
    # Safe here because extraction only navigates WITHIN the completed
    # row element, never back up the tree.
    it = ElementTree.iterparse(io.BytesIO(content), events=("start", "end"))
    root = None
    for event, elem in it:
        if event == "start":
            if root is None:
                root = elem
            continue
        if _local(elem.tag) == row_element:
            yield {n: _extract(elem, p, leaf) for n, p, leaf in fields}
            elem.clear()
            if root is not None and root is not elem:
                root.clear()


def read_xml_validated(
    spark: SparkSession,
    path: str,
    specs: list[FieldSpec],
    row_element: str,
    namespaces: dict[str, str] | None = None,
    rules: list[Rule] | None = None,
    load_id: str | None = None,
) -> ValidatedRead:
    """S4 — XML scan with the standard typed+validated quarantine split."""
    import pandas as pd

    compiled = [
        (s.name, *_compile_xpath(s.xpath or s.name, namespaces)) for s in specs
    ]
    names = [s.name for s in specs]
    out_schema = StructType([StructField(n, StringType()) for n in names])

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                r
                for content in pdf["content"]
                for r in parse_xml_rows(bytes(content), row_element, compiled)
            ]
            yield pd.DataFrame(rows, columns=names, dtype=object)

    files = spark.read.format("binaryFile").load(path).select("content")
    raw = files.mapInPandas(_parse, schema=out_schema)
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
