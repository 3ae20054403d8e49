from .readers import (
    FieldSpec,
    ValidatedRead,
    df_to_arrow,
    load_arrow,
    read_csv_validated,
    read_json_validated,
)
from .rules import compile_rule, apply_rules
from .specs import (
    SourceSpec,
    load_spec,
    load_spec_dir,
    match_spec,
    parse_yaml,
    read_with_spec,
    spec_from_dict,
)

__all__ = [
    "read_csv_validated",
    "FieldSpec",
    "df_to_arrow",
    "load_arrow",
    "read_json_validated",
    "ValidatedRead",
    "compile_rule",
    "apply_rules",
    "SourceSpec",
    "load_spec",
    "load_spec_dir",
    "match_spec",
    "parse_yaml",
    "read_with_spec",
    "spec_from_dict",
]
