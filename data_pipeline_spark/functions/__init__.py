from .identity import deterministic_id, surrogate_key_md5, surrogate_key_xxhash
from .text import (
    normalize_entity_name,
    token_count_ws,
    token_count_bpe_ish,
    fingerprint_md5,
    quality_metrics,
    langid_scores,
)

__all__ = [
    "deterministic_id",
    "surrogate_key_md5",
    "surrogate_key_xxhash",
    "normalize_entity_name",
    "token_count_ws",
    "token_count_bpe_ish",
    "fingerprint_md5",
    "quality_metrics",
    "langid_scores",
]
