from .readers import read_csv_validated, read_json_validated, ValidatedRead
from .rules import compile_rule, apply_rules

__all__ = [
    "read_csv_validated",
    "read_json_validated",
    "ValidatedRead",
    "compile_rule",
    "apply_rules",
]
