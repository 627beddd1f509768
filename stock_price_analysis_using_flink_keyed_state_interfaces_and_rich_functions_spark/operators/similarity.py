"""Similarity search over embedding columns (``array<float>``) —
brief-mandated LLM-data operator family (SURVEY.md §2.6).

Two tiers:

- **Brute-force cosine top-k** — exact; the query side broadcasts
  (BroadcastNestedLoopJoin), so the big side streams once with no
  shuffle. This is the oracle-checkable baseline and is also the right
  plan whenever |queries| is small — even at 100 TB of vectors.
- **Random-hyperplane LSH** — the scale path for vector×vector
  workloads (near-dup by cosine, all-pairs-ish search): bucket by sign
  signature, equi-join buckets, rank within bucket. Candidate
  generation never builds a cartesian product.

Dot products are Catalyst higher-order functions (``zip_with`` +
``aggregate``) accumulating in double — JVM-side, no Python. The LSH
signature uses a seeded pandas UDF (Arrow-vectorized numpy matmul),
which is the documented slow-path exception.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = [
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "brute_force_topk",
    "cosine_dup_pairs",
    "hyperplane_signature_udf",
    "lsh_bucketed_topk",
]


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with a double accumulator (element order = array order,
    so the result is bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_dp: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` (small) is broadcast; each vectors-partition scans once
    — no shuffle of the big side until the final per-query top-k window
    (keyed on query_id, tiny). Self-matches (same id) are excluded.
    Ties break on neighbor id after rounding, making ranks
    deterministic and oracle-comparable.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("_qv"), F.col("_nv")), round_dp))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    ``exact=True`` runs the all-pairs check (oracle path, small data
    only). Default routes candidates through the hyperplane-LSH bucket
    join: only pairs with identical sign signature are compared —
    sound for very high thresholds where near-dups almost surely agree
    on every hyperplane, and never quadratic.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        sig = hyperplane_signature_udf(num_planes=num_planes, seed=seed)
        sa = vectors.select(F.col(id_col).alias("id_a"), sig(F.col(vec_col)).alias("_bucket"))
        sb = vectors.select(F.col(id_col).alias("id_b"), sig(F.col(vec_col)).alias("_bucket"))
        cand = sa.join(sb, "_bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        pairs = cand.join(a, "id_a").join(b, "id_b")
    return (
        pairs.withColumn("cosine", F.round(cosine_expr(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_signature_udf(num_planes: int = 16, seed: int = 42, dim: int | None = None):
    """Seeded random-hyperplane signature as an Arrow-vectorized pandas
    UDF: sign bits of V·P packed into an int64 bucket id. The plane
    matrix is derived from ``numpy.random.RandomState(seed)`` at worker
    import time — deterministic across executors and runs."""
    import numpy as np

    if not 1 <= num_planes <= 62:
        raise ValueError("num_planes must be in [1, 62]")

    @F.pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series([], dtype="int64")
        planes = np.random.RandomState(seed).standard_normal((mat.shape[1], num_planes))
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(num_planes, dtype=np.int64))
        return pd.Series(bits @ weights, dtype="int64")

    return _sig


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict each query's candidates to vectors in
    the same hyperplane bucket, then exact-rank within the bucket.
    Recall < 1 by construction (tested against :func:`brute_force_topk`);
    cost is |bucket| per query instead of |vectors|."""
    from pyspark.sql import Window

    sig = hyperplane_signature_udf(num_planes=num_planes, seed=seed)
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"), sig(F.col(vec_col)).alias("_bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), sig(F.col(vec_col)).alias("_bucket"))
    scored = (
        v.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("_qv"), F.col("_nv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
