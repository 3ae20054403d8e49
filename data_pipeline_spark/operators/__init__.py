from .windows import (
    dedup_first_arrival,
    latest_per_key,
    detect_sequence_gaps,
    scd2_close_windowed,
)
from .joins import pit_join, date_spine, two_stage_fallback_join

__all__ = [
    "dedup_first_arrival",
    "latest_per_key",
    "detect_sequence_gaps",
    "scd2_close_windowed",
    "pit_join",
    "date_spine",
    "two_stage_fallback_join",
]
