"""Sort / limit / top-k (SURVEY.md §2.6 — extension; reference has none).

Global top-n compiles to TakeOrderedAndProjectExec (per-partition heap +
driver merge — no global sort at any scale). Per-group top-k uses
row_number over a partitioned window; with a bounded frame Spark 3.5+
pushes a per-group limit into the sort (WindowGroupLimit), so the full
per-group sort output never materializes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_n", "top_k_per_group"]


def top_n(df: DataFrame, order_cols: Sequence[Column | str], n: int) -> DataFrame:
    return df.orderBy(*order_cols).limit(n)


def top_k_per_group(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
