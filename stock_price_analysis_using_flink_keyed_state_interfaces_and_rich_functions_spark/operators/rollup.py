"""Multi-dimensional aggregation: rollup / cube / grouping sets / pivot
(SURVEY.md §2.6 "Keyed aggregation" — extension; the reference only has
hand-built per-key state, §2.4).

rollup/cube expand to a union of grouping sets planned as a single Expand
+ HashAggregate — one shuffle regardless of the number of sets. Pivot is
exposed both as the native ``.pivot()`` (needs the pivot values — one
extra job to collect them if omitted) and as explicit conditional
aggregation, which is the portable / oracle-checkable form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_agg", "cube_agg", "pivot_agg", "pivot_conditional", "unpivot_longform"]


def rollup_agg(df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*dims).agg(*aggs)


def cube_agg(df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*dims).agg(*aggs)


def pivot_agg(
    df: DataFrame, group_cols: Sequence[str], pivot_col: str, values: Sequence[str], agg: Column
) -> DataFrame:
    return df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg)


def unpivot_longform(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_col: str = "metric",
    val_col: str = "value",
) -> DataFrame:
    """Pivot's inverse: melt ``value_cols`` into (id…, metric, value)
    long-form rows. Plans as a single Expand node — a map-side row
    multiplication with NO shuffle and no per-column passes, so wide→
    long reshaping of a 100 TB table is still one scan. Values are cast
    to a common type (Spark requires it; mixed-type melts must cast
    explicitly first)."""
    return df.unpivot(
        list(id_cols), list(value_cols), variableColumnName=var_col, valueColumnName=val_col
    )


def pivot_conditional(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    value_expr: Column,
    fill: Column | None = None,
) -> DataFrame:
    """Pivot as conditional aggregation — identical plan shape to native
    pivot (single HashAggregate), but ANSI-portable. Default semantics
    match native pivot: a cell with NO matching rows is NULL (sum skips
    the unmatched NULLs). Pass ``fill`` (e.g. ``F.lit(0)``) to fill
    empty cells instead — applied once per empty CELL via
    ``coalesce(sum, fill)``, never per non-matching row — then 'no rows'
    and 'summed to fill' are indistinguishable, which native pivot would
    not do."""

    def cell(v):
        s = F.sum(F.when(F.col(pivot_col) == v, value_expr))
        return s if fill is None else F.coalesce(s, fill)

    aggs = [cell(v).alias(f"{pivot_col}_{v}") for v in values]
    return df.groupBy(*group_cols).agg(*aggs)
