from .completeness import source_completeness
from .jobs import (
    ControlRunner,
    batch_completeness,
    freshness_check,
    lineage_sequence_gaps,
)

__all__ = [
    "source_completeness",
    "ControlRunner",
    "batch_completeness",
    "freshness_check",
    "lineage_sequence_gaps",
]
