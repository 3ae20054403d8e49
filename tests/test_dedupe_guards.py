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


def test_ivf_self_contained_and_cluster_cap(spark):
    """IVF without a precomputed label: the sign-LSH quantizer derives
    clusters from the data; a degenerate cluster above max_cluster is
    dropped from the pair join instead of going quadratic."""
    import numpy as np

    from data_pipeline_spark.operators.similarity import ivf_threshold_pairs

    rng = np.random.default_rng(3)
    # 30 vectors: 20 copies of one direction (one degenerate cluster)
    # + 10 random others
    base = rng.normal(size=8)
    rows = [(f"v{i}", (base + rng.normal(scale=0.01, size=8)).tolist())
            for i in range(20)]
    rows += [(f"r{i}", rng.normal(size=8).tolist()) for i in range(10)]
    df = spark.createDataFrame(rows, "id string, vec array<double>")

    uncapped = ivf_threshold_pairs(
        df, "id", "vec", threshold=0.99, dim=8, n_planes=2, max_cluster=None
    )
    n_unc = uncapped.count()
    assert n_unc >= 20 * 19 / 2  # the near-identical copies all pair up

    capped = ivf_threshold_pairs(
        df, "id", "vec", threshold=0.99, dim=8, n_planes=2, max_cluster=10
    )
    got = capped.collect()
    # the degenerate cluster (>10 members) is dropped entirely
    assert all(not (r.id_a.startswith("v") and r.id_b.startswith("v")) for r in got)
    assert len(got) < n_unc


def test_dedup_components_chain_and_islands(spark):
    """Min-label propagation must cross chains (diameter > 1) and keep
    disjoint islands separate."""
    from data_pipeline_spark.operators.dedupe import dedup_components

    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"),   # chain a-b-c-d (diameter 3)
         ("x", "y")],                           # separate island
        "id_a string, id_b string",
    )
    got = {r.id: r.component for r in dedup_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}
