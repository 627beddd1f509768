"""Set operations and duplicate elimination (SURVEY.md §2.6 — extension).

union is a no-shuffle concat; intersect/except/distinct each imply one
hash-aggregate shuffle. dropDuplicates on a key subset keeps an arbitrary
survivor — ``dedup_keep_first`` pins the survivor deterministically
(needed for reproducible pipelines / the driver's value-hash checks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "union_all",
    "union_distinct",
    "intersect",
    "intersect_all",
    "except_all",
    "except_distinct",
    "dedup_keep_first",
]


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT ALL — multiset intersection: each row survives
    min(count_a, count_b) times."""
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT ALL — multiset difference, duplicates preserved."""
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT (DISTINCT) — set difference."""
    return a.subtract(b)


def dedup_keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str | Column],
) -> DataFrame:
    """Deterministic dropDuplicates: per key, keep the first row under
    ``order_cols``. One shuffle + per-key sort."""
    if "_rn" in df.columns:
        raise ValueError("dedup_keep_first: '_rn' column name is reserved")
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
