"""Embedding similarity search over array<float> columns.

Brute-force cosine is the correctness baseline (one scan, JVM-side
higher-order functions — F.aggregate/zip_with dot product, no UDF).
The scale paths:

* threshold pairs within a coarse partition (IVF-style, using a
  precomputed cluster id — here the `label` column) — turns the O(N²)
  pair join into per-cluster joins;
* sign-LSH bucketing via deterministic pseudo-random hyperplanes
  (seeded md5-derived weights) for ANN at corpus scale.

All floating math is done in double and rounded before emission so an
independent engine (the DuckDB oracle) reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.  Deterministic
    tie-break on id so results are engine-reproducible."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_digits).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def ivf_threshold_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str | None = None,
    threshold: float = 0.5,
    *,  # the quantizer knobs are keyword-only: the round-1 signature had
    # round_digits in this position, and a silent positional re-bind to
    # dim would change callers' output precision without an error
    dim: int | None = None,
    n_planes: int = 4,
    seed: int = 7,
    max_cluster: int | None = 100_000,
    round_digits: int = 4,
    quantizer: str = "lsh",
    k_clusters: int = 16,
    sample_n: int = 2048,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold, searched only within the
    same coarse cluster (IVF-style) — self-contained.

    cluster_col=None (the default) derives the coarse partition from
    the data itself via `quantizer`:
      * ``"lsh"`` — deterministic sign-LSH (n_planes md5-derived
        hyperplanes → 2^n_planes cells); zero training, engine-
        reproducible (the DuckDB oracle inlines the planes).
      * ``"kmeans"`` — sampled spherical k-means (`kmeans_assign`):
        data-adaptive cells, better recall at equal candidate budget
        (pinned by the recall test); driver-side fit over a bounded
        sample, JVM-side assignment.
    A precomputed assignment (category ids, an external index) can
    still be passed via cluster_col; either way the quadratic join runs
    per cluster only.

    max_cluster is the degenerate-cluster guard (mirrors the LSH path's
    max_bucket): a cluster larger than the cap — a failure of the
    quantizer, or a hostile label column — would reintroduce the
    all-pairs blow-up, so it is dropped from the pair join entirely
    (its ids are few distinct values → broadcast anti-join)."""
    if cluster_col is None:
        if quantizer == "kmeans":
            clustered = df.join(
                kmeans_assign(
                    df, id_col, vec_col, k=k_clusters,
                    sample_n=sample_n, seed=seed,
                ).withColumnRenamed("cluster", "_c"),
                on=id_col,
            )
        elif quantizer == "lsh":
            if dim is None:
                raise ValueError("dim is required when cluster_col is None")
            clustered = df.join(
                sign_lsh_buckets(df, id_col, vec_col, dim, n_planes, seed).
                withColumnRenamed("lsh_bucket", "_c"),
                on=id_col,
            )
        else:
            raise ValueError(f"unknown quantizer {quantizer!r}")
        cluster_col = "_c"
    else:
        clustered = df.withColumn("_c", F.col(cluster_col))
        cluster_col = "_c"
    if max_cluster is not None:
        big = (
            clustered.groupBy("_c")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_cluster)
            .select("_c")
        )
        clustered = clustered.join(F.broadcast(big), "_c", "anti")
    a = clustered.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_c"
    )
    b = clustered.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_c"
    )
    pairs = a.join(b, on=["_c"]).filter(F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= threshold)


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    sample_n: int = 2048,
    iters: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Sampled k-means coarse quantizer: (id, cluster) assignment.

    IVF's trained alternative to sign-LSH cells: hyperplane cells are
    data-oblivious, so a corpus whose density doesn't straddle the
    fixed planes gets lopsided cells and poor recall at a fixed
    candidate budget; k-means centroids follow the density.

    Scale shape: the FIT is driver-side over a bounded deterministic
    sample (`sample_n` rows picked by xxhash64(id) order — stable
    across runs and partitionings, no RNG state), spherical k-means
    (cosine) with k-means++-style seeded init, pure numpy — a planning
    lookup, not a data-proportional collect.  The ASSIGN is JVM-side:
    k dot-products per row via the same higher-order-function exprs as
    the rest of this module (array_max over (sim, -idx) structs — ties
    break to the LOWEST cluster id), one scan, no UDF, no shuffle.
    """
    import numpy as np

    sample = [
        r[0]
        for r in df.select(F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_n)
        .collect()
    ]
    if not sample:
        raise ValueError("kmeans_assign: empty input")
    X = np.asarray(sample, dtype=np.float64)
    # spherical: normalize rows; cosine argmax == dot argmax
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(k, len(X))
    rng = np.random.RandomState(seed)
    # k-means++ init on the sample
    centroids = [X[rng.randint(len(X))]]
    for _ in range(1, k):
        d2 = np.min(
            [1.0 - X @ c for c in centroids], axis=0
        )  # cosine distance to nearest centroid
        d2 = np.maximum(d2, 0)
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centroids.append(X[rng.choice(len(X), p=probs)])
    C = np.asarray(centroids)
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[j] = m / n

    cells = F.array(
        *[
            F.struct(
                dot(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in C[j]]),
                ).alias("s"),
                F.lit(-j).alias("ni"),  # struct max tie-breaks to low id
            )
            for j in range(k)
        ]
    )
    return df.select(
        F.col(id_col),
        (-F.array_max(cells).getField("ni")).cast("int").alias("cluster"),
    )


def _hyperplane(seed: int, j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 — no RNG
    state, reproducible across engines and runs."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()
        # map first 8 hex chars to [-1, 1)
        vals.append((int(h[:8], 16) / 0x80000000) - 1.0)
    return vals


def sign_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH: bucket = bit vector of sign(v · plane_j).  Vectors in
    the same bucket are ANN candidates; planes are deterministic."""
    bucket = None
    for j in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(seed, j, dim)])
        bit = F.when(dot(F.col(vec_col), plane) > 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return df.select(F.col(id_col), bucket.cast("long").alias("lsh_bucket"))


def lsh_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k: restrict the scan to the query's LSH bucket, then
    exact cosine inside it.  The scale path for similarity search —
    bucket selectivity ~2^-n_planes of the corpus."""
    import hashlib  # noqa: F401  (planes derived in _hyperplane)

    # compute the query's bucket driver-side with the same planes
    qb = 0
    for j in range(n_planes):
        plane = _hyperplane(seed, j, dim)
        if sum(p * float(x) for p, x in zip(plane, query_vec)) > 0:
            qb += 2**j
    buckets = sign_lsh_buckets(df, id_col, vec_col, dim, n_planes, seed)
    cand = df.join(buckets.filter(F.col("lsh_bucket") == qb), on=id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_digits).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)
