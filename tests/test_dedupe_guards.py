"""Scale guards on the dedup stack: the hot-shingle df-cap.

A boilerplate shingle shared by d documents contributes d² rows to the
Jaccard intersection self-join; the df-cap must drop it from every
shingle set before sizes/intersections so the join stays bounded and
the scores stay self-consistent.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark.operators.dedupe import ngram_jaccard_pairs


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # 8 docs that all share the same 5-word boilerplate prefix (→ three
    # hot 3-shingles with df=8) plus unique bodies; docs 0 and 1 share
    # their body (a real near-dup pair).
    boiler = "accept all cookies to continue"
    rows = []
    for i in range(8):
        body = "alpha beta gamma delta" if i < 2 else f"unique{i} words here now"
        rows.append((f"d{i}", f"{boiler} {body}"))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_df_cap_drops_boilerplate_only_pairs(spark, boilerplate_docs):
    # Uncapped: every doc pair shares the boilerplate shingles → 28
    # candidate pairs enter the join (8 choose 2).
    uncapped = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", threshold=0.0, max_doc_freq=None
    )
    assert uncapped.count() == 28

    # Capped below the planted df: boilerplate shingles are removed
    # from the sets entirely, so only the genuinely-duplicated body
    # still intersects — ONE pair survives, with Jaccard computed over
    # the capped sets (identical 2-shingle bodies → 1.0).
    capped = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", threshold=0.0, max_doc_freq=4
    )
    rows = capped.collect()
    assert len(rows) == 1
    (r,) = rows
    assert {r["id_a"], r["id_b"]} == {"d0", "d1"}
    assert r["jaccard"] == 1.0


def test_df_cap_above_fixture_df_is_a_noop(spark, boilerplate_docs):
    lo = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", threshold=0.5, max_doc_freq=None
    )
    hi = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", threshold=0.5, max_doc_freq=100
    )
    assert sorted(map(tuple, lo.collect())) == sorted(map(tuple, hi.collect()))
