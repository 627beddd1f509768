"""Data-distribution diagnostics — the measurement step before every
skew decision (salting width, AQE thresholds, broadcast viability) on a
100 TB table. Pure aggregates over key counts: the corpus shuffles once
into per-key counts, everything after runs on the (much smaller) key
histogram.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_stats"]


def key_skew_stats(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One-row skew profile of a key: number of distinct keys, total
    rows, max/median/p75 per-key counts, and ``skew_ratio`` =
    max / median — the number that decides between a plain equi-join
    (≈1), AQE skew-split (10–100), and explicit salting (≫100).

    Quantiles use p ∈ {0.5, 0.75} over integer counts, where every
    interpolation term is exactly representable — the cross-engine
    determinism contract shared with the quantile filter (each emitted
    quantile is ×4 an integer, so it is exported as ``*_x4`` BIGINTs).
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").cast("long").alias("_cnt"))
    return counts.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("_cnt").cast("long").alias("total_rows"),
        F.max("_cnt").cast("long").alias("max_cnt"),
        F.round(F.percentile(F.col("_cnt"), F.lit(0.5)) * 4).cast("long").alias("median_cnt_x4"),
        F.round(F.percentile(F.col("_cnt"), F.lit(0.75)) * 4).cast("long").alias("p75_cnt_x4"),
        F.round(
            F.max("_cnt") / F.percentile(F.col("_cnt"), F.lit(0.5)), 4
        ).alias("skew_ratio"),
    )
