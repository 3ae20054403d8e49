"""YAML source-spec loading + glob dispatch + spec-driven validation.

Mirrors the reference flow: a murex-shaped YAML spec
(source_specs/trading/murex_trades.yaml:34-176) is loaded into
FieldSpec/Rule, an incoming file is matched by path glob
(validator.py:314-328), and the read quarantines the same violations
the hand-built specs in test_sources.py cover.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark.sources.specs import (
    load_spec_dir,
    match_spec,
    parse_yaml,
    read_with_spec,
    spec_from_dict,
)

SPEC_YAML = """\
# Source Specification: desk trades (test fixture, murex-shaped)
name: desk_trades
description: Trade confirmations from the desk system
owner: desk-systems@example.invalid
domain: markets

source:
  path_pattern: "desk/trades_*.csv"
  format: csv
  encoding: utf-8

schema:
  - name: trade_id
    description: native trade identifier
    type: STRING
    nullable: false

  - name: quantity
    description: trade quantity
    type: INT64
    nullable: false
    min_value: 1

  - name: price
    description: execution price
    type: NUMERIC
    nullable: false
    min_value: 0

  - name: side
    description: trade direction
    type: STRING
    nullable: false
    allowed_values: ["BUY", "SELL"]

expectations:
  frequency: daily
  expected_by: "06:00"
  min_files_per_day: 1
  typical_row_count:
    min: 5
    max: 100

validation:
  row_level:
    - rule: "trade_id is not null"
      severity: error

    - rule: "quantity > 0"
      severity: error

    - rule: "price > 100"
      severity: warning
"""


def test_yaml_subset_parser():
    d = parse_yaml(SPEC_YAML)
    assert d["name"] == "desk_trades"
    assert d["source"]["path_pattern"] == "desk/trades_*.csv"
    assert d["schema"][1]["min_value"] == 1
    assert d["schema"][3]["allowed_values"] == ["BUY", "SELL"]
    assert d["expectations"]["typical_row_count"] == {"min": 5, "max": 100}
    assert d["expectations"]["expected_by"] == "06:00"  # quoted scalar stays str
    assert len(d["validation"]["row_level"]) == 3
    assert d["validation"]["row_level"][2]["severity"] == "warning"


def test_spec_model_mapping():
    spec = spec_from_dict(parse_yaml(SPEC_YAML))
    assert spec.name == "desk_trades"
    assert spec.format == "csv"
    by_name = {f.name: f for f in spec.fields}
    assert by_name["quantity"].dtype == "long" and by_name["quantity"].min_value == 1
    assert by_name["price"].dtype == "double"
    assert by_name["side"].allowed_values == ["BUY", "SELL"]
    assert not by_name["trade_id"].nullable
    assert [r.severity for r in spec.rules] == ["error", "error", "warning"]


@pytest.fixture()
def spec_dir(tmp_path):
    d = tmp_path / "source_specs" / "trading"
    d.mkdir(parents=True)
    (d / "desk_trades.yaml").write_text(SPEC_YAML)
    other = SPEC_YAML.replace("desk_trades", "other_feed").replace(
        "desk/trades_*.csv", "other/feed_*.jsonl"
    )
    (d / "other_feed.yaml").write_text(other)
    return str(tmp_path / "source_specs")


def test_glob_dispatch(spec_dir):
    specs = load_spec_dir(spec_dir)
    assert set(specs) == {"desk_trades", "other_feed"}
    assert match_spec("desk/trades_20240301.csv", specs).name == "desk_trades"
    assert match_spec("landing/desk/trades_20240301.csv", specs).name == "desk_trades"
    assert match_spec("other/feed_20240301.jsonl", specs).name == "other_feed"
    assert match_spec("unknown/nope.csv", specs) is None


def test_spec_driven_read_quarantines_violations(spark, tmp_path, spec_dir):
    p = tmp_path / "trades_20240301.csv"
    p.write_text(
        "trade_id,quantity,price,side\n"
        "T1,10,101.5,BUY\n"       # valid (price>100 warning passes)
        "T2,0,99.0,SELL\n"        # quantity min + rule fail; price warning
        "T3,5,50.0,HOLD\n"        # side not allowed
        ",7,120.0,BUY\n"          # null trade_id
        "T5,oops,10.0,SELL\n"     # quantity cast failure
    )
    specs = load_spec_dir(spec_dir)
    spec = match_spec("desk/" + p.name, specs)
    out = read_with_spec(spark, str(p), spec, load_id="L1")
    valid = out.valid.collect()
    assert [r.trade_id for r in valid] == ["T1"]
    assert valid[0].quantity == 10 and valid[0]._load_id == "L1"
    quarantined = {r.trade_id: r.failure_reasons for r in out.quarantined.collect()}
    assert "quantity:min" in quarantined["T2"]
    assert "side:allowed" in quarantined["T3"]
    assert any("not_null" in v for k, v in quarantined.items() if k is None)
    assert "quantity:cast" in quarantined["T5"]


def test_glob_dispatch_directory_beats_basename(spec_dir, tmp_path):
    """A spec whose FILENAME glob happens to match must not shadow
    another spec's exact directory match (review finding)."""
    import pathlib

    d = pathlib.Path(spec_dir) / "trading"
    ops = SPEC_YAML.replace("desk_trades", "ops_trades").replace(
        "desk/trades_*.csv", "ops/trades_*.csv"
    )
    (d / "ops_trades.yaml").write_text(ops)
    from data_pipeline_spark.sources.specs import load_spec_dir, match_spec

    specs = load_spec_dir(spec_dir)
    assert match_spec("ops/trades_20240301.csv", specs).name == "ops_trades"
    assert match_spec("desk/trades_20240301.csv", specs).name == "desk_trades"
    assert match_spec("landing/ops/trades_20240301.csv", specs).name == "ops_trades"
    # basename fallback still works for bare filenames
    assert match_spec("trades_20240301.csv", specs) is not None


def test_glob_dispatch_strips_only_leading_landing(spec_dir):
    """'landing/' must be stripped only as a path PREFIX: a pattern like
    'prod-landing/trades_*.csv' must keep matching its own files
    (review finding: substring replace mangled it to 'prod-trades_*')."""
    import pathlib

    d = pathlib.Path(spec_dir) / "trading"
    prod = SPEC_YAML.replace("desk_trades", "prod_trades").replace(
        "desk/trades_*.csv", "prod-landing/trades_*.csv"
    )
    (d / "prod_trades.yaml").write_text(prod)
    specs = load_spec_dir(spec_dir)
    assert match_spec("prod-landing/trades_1.csv", specs).name == "prod_trades"
    # the leading-prefix strip still works
    assert match_spec("landing/prod-landing/trades_1.csv", specs).name == "prod_trades"
