"""Text-analysis functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs in the hot path.  Formulas are chosen to be mirrorable in ANSI SQL
so the DuckDB oracle can verify them value-for-value.

normalize_entity_name is the reference's counterparty normalisation
(dbt_project/models/curation/trades_enriched.sql:55-65); the rest are the
training-data extensions (language-ID, quality scoring, token counting,
fingerprinting) the engine adds for 100 TB corpus work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEGAL_SUFFIX = r"\s+(LTD|LIMITED|PLC|LLC|INC|CORP|CO|COMPANY|GMBH|SA|AG)\.?$"

# tiny deterministic stopword lists for the n-gram language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
}


def normalize_entity_name(c: Column | str) -> Column:
    """upper/trim, strip legal suffixes, collapse whitespace (F4)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(
        F.regexp_replace(F.upper(F.trim(col)), _LEGAL_SUFFIX, ""), r"\s+", " "
    )


def token_count_ws(c: Column | str) -> Column:
    """Whitespace token count. size(split(trim(x), '\\s+')) with empty-string guard."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def token_count_bpe_ish(c: Column | str) -> Column:
    """BPE-ish token estimate: count of word-piece matches
    ([A-Za-z]+ | digit | punctuation run) — a deterministic regex proxy
    for subword tokenizers, cheap enough for 100 TB scans."""
    col = F.col(c) if isinstance(c, str) else c
    pat = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def fingerprint_md5(c: Column | str) -> Column:
    """Document fingerprint: md5 of the casefolded, whitespace-collapsed
    text — exact-dup detection key (deterministic, engine-portable)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def quality_metrics(c: Column | str) -> dict[str, Column]:
    """Heuristic quality signals: length, word count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio."""
    col = F.col(c) if isinstance(c, str) else c
    n_chars = F.length(col)
    n_words = token_count_ws(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(col, F.lit(r"[A-Z]"), 0))
    en_sw = "|".join(LANG_STOPWORDS["en"])
    n_stop = F.size(F.regexp_extract_all(F.lower(col), F.lit(rf"\b({en_sw})\b"), 0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": F.round(n_chars / F.greatest(n_words, F.lit(1)), 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        "upper_ratio": F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop / F.greatest(n_words, F.lit(1)), 4),
    }


def langid_scores(c: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts; argmax is the predicted lang.
    A deterministic n-gram-heuristic language ID (no external models)."""
    col = F.lower(F.col(c) if isinstance(c, str) else c)
    return {
        lang: F.size(
            F.regexp_extract_all(col, F.lit(r"\b(" + "|".join(words) + r")\b"), 0)
        )
        for lang, words in LANG_STOPWORDS.items()
    }


def predict_lang(c: Column | str) -> Column:
    """argmax over langid_scores with deterministic tie-break (lang asc)."""
    scores = langid_scores(c)
    ordered = sorted(scores.items())
    # struct comparison is lexicographic: (score, preference) — preference
    # descends with lang rank so ties pick the alphabetically-first lang
    candidates = F.array(
        *[
            F.struct(
                s.alias("score"),
                F.lit(len(ordered) - i).alias("pref"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, s) in enumerate(ordered)
        ]
    )
    return F.array_max(candidates)["lang"]
