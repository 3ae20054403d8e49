"""S4 — XML scan: iterparse row extraction + typed/validated split.

Mirrors the reference XmlParser contract (parsers.py:256-331): row
elements matched inside a namespaced document, per-field XPath
extraction with a /text() leaf, missing elements → NULL, and the same
cast/constraint quarantine as CSV/JSON — driven end-to-end through a
YAML spec with format: xml.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark.sources.readers import FieldSpec
from data_pipeline_spark.sources.specs import parse_yaml, read_with_spec, spec_from_dict
from data_pipeline_spark.sources.xml import read_xml_validated

NS = "http://example.invalid/schema/v1"

XML_DOC = f"""<?xml version="1.0" encoding="utf-8"?>
<Confirmations xmlns:t="{NS}">
  <t:Trade>
    <t:Id>T1</t:Id>
    <t:Qty>10</t:Qty>
    <t:Side>BUY</t:Side>
    <t:Book><t:Name>alpha</t:Name></t:Book>
  </t:Trade>
  <t:Trade>
    <t:Id>T2</t:Id>
    <t:Qty>not-a-number</t:Qty>
    <t:Side>SELL</t:Side>
    <t:Book><t:Name>beta</t:Name></t:Book>
  </t:Trade>
  <t:Trade>
    <t:Id>T3</t:Id>
    <t:Qty>5</t:Qty>
    <t:Side>HOLD</t:Side>
  </t:Trade>
</Confirmations>
"""

SPECS = [
    FieldSpec("trade_id", "string", nullable=False, xpath="t:Id/text()"),
    FieldSpec("quantity", "long", min_value=1, xpath="t:Qty/text()"),
    FieldSpec("side", "string", allowed_values=["BUY", "SELL"], xpath="t:Side/text()"),
    FieldSpec("book", "string", xpath="t:Book/t:Name/text()"),
]


@pytest.fixture()
def xml_file(tmp_path):
    p = tmp_path / "trades_20240301.xml"
    p.write_text(XML_DOC)
    return str(p)


def test_xml_rows_extracted_and_validated(spark, xml_file):
    out = read_xml_validated(
        spark, xml_file, SPECS, row_element="Trade", namespaces={"t": NS}
    )
    valid = {r.trade_id: r for r in out.valid.collect()}
    assert set(valid) == {"T1"}
    assert valid["T1"].quantity == 10 and valid["T1"].book == "alpha"
    bad = {r.trade_id: r.failure_reasons for r in out.quarantined.collect()}
    assert "quantity:cast" in bad["T2"]
    assert "side:allowed" in bad["T3"]


def test_xml_missing_nested_element_is_null(spark, xml_file):
    out = read_xml_validated(
        spark, xml_file, SPECS, row_element="Trade", namespaces={"t": NS}
    )
    t3 = [r for r in out.quarantined.collect() if r.trade_id == "T3"][0]
    assert t3.book is None  # no <Book> under T3


def test_xml_via_yaml_spec(spark, xml_file):
    spec_yaml = f"""\
name: xml_trades
source:
  path_pattern: "trades_*.xml"
  format: xml
  row_element: "Trade"
xml_config:
  namespaces:
    t: "{NS}"
schema:
  - name: trade_id
    xpath: "t:Id/text()"
    type: STRING
    nullable: false
  - name: quantity
    xpath: "t:Qty/text()"
    type: INT64
    min_value: 1
  - name: side
    xpath: "t:Side/text()"
    type: STRING
    allowed_values: ["BUY", "SELL"]
validation:
  row_level:
    - rule: "quantity > 0"
      severity: error
"""
    spec = spec_from_dict(parse_yaml(spec_yaml))
    assert spec.format == "xml"
    out = read_with_spec(spark, xml_file, spec, load_id="L9")
    valid = out.valid.collect()
    assert [r.trade_id for r in valid] == ["T1"]
    assert valid[0]._load_id == "L9"
    assert out.quarantined.count() == 2
