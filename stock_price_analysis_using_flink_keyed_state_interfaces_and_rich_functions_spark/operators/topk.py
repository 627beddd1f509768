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

__all__ = ["top_n", "top_k_per_group", "ranked_top_n", "skyline_2d"]


def top_n(df: DataFrame, order_cols: Sequence[Column | str], n: int) -> DataFrame:
    return df.orderBy(*order_cols).limit(n)


def ranked_top_n(
    df: DataFrame,
    order_keys: Sequence[tuple[str, bool]],
    n: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Global top-n WITH a 1-based rank column — and NO window anywhere.

    ``row_number()`` over an unpartitioned window moves the whole input
    to one task (Spark's "No Partition Defined" WindowExec warning — the
    r5 verdict's scale-killer finding, and partitioning by a literal
    doesn't help: Catalyst folds constant partition keys away, the
    warning stays). Instead:

    1. ``orderBy + limit`` → TakeOrderedAndProjectExec (per-partition
       heaps + driver merge of n rows — no global sort at any scale);
       the n survivors are materialized once (eager localCheckpoint, an
       n-row frame) so step 2 doesn't recompute the full pipeline per
       join side.
    2. rank RELATIONALLY over the n survivors: a broadcast self-join
       counting, per row, the survivors that strictly precede it in the
       same ordering — rank = that count + 1. Requires the ordering key
       tuple to be UNIQUE (every caller's contract here: last key is an
       id tiebreak), so rank ≡ row_number. n² comparisons at n = 20 is
       nothing, and no stage ever holds more than n rows per task.

    ``order_keys`` is [(col, is_desc), ...]; all columns must exist in
    ``df`` and survive into the output.
    """
    cols = [F.desc(c) if d else F.asc(c) for c, d in order_keys]
    top = df.orderBy(*cols).limit(n).localCheckpoint(eager=True)
    names = [c for c, _ in order_keys]
    other = top.select(*[F.col(c).alias(f"_r_{c}") for c in names])
    # lexicographic "other precedes me": OR over prefixes (strict at the
    # last position of each prefix, equality before it).
    precedes = F.lit(False)
    for i in range(len(order_keys)):
        c, is_desc = order_keys[i]
        strict = F.col(f"_r_{c}") > F.col(c) if is_desc else F.col(f"_r_{c}") < F.col(c)
        clause = strict
        for pc, _ in order_keys[:i]:
            clause = clause & (F.col(f"_r_{pc}") == F.col(pc))
        precedes = precedes | clause
    return (
        top.join(F.broadcast(other), precedes, "left")
        .groupBy(*top.columns)
        .agg((F.count(f"_r_{names[0]}") + 1).cast("long").alias(rank_col))
    )


def top_k_per_group(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """2-D skyline (Pareto frontier): the distinct (min_col, max_col)
    points not DOMINATED by any other point, where point b dominates a
    iff b.min_col <= a.min_col AND b.max_col >= a.max_col with at least
    one strict. Multi-objective top-k — "cheapest for its size class"
    — the Börzsönyi et al. (ICDE 2001) SKYLINE operator, which Spark
    has no built-in for.

    Scale shape: the naive formulation is a quadratic NOT-EXISTS self
    join (that stays our ORACLE — an independent algorithm certifying
    this one). Here the classic sort-based 2-D reduction runs in two
    linear passes with no single-task window:

    1. Distinct points + per-min_col max: after ``groupBy(min_col)``
       only |distinct min_col| rows survive — one candidate per price.
    2. A point (p, s) is in the skyline iff s is the max over ALL
       points with min_col <= p AND s strictly exceeds the max over
       points with min_col < p. Both conditions collapse to ONE
       exclusive global running max over per-price maxima
       (:func:`~.windows.distributed_running_max` — range-partitioned,
       offsets broadcast, exact).

    Returns the skyline POINTS (min_col, max_col) only; callers join
    back to the point table for per-point payload (counts, ids) —
    that join is on the skyline, which is O(|frontier|) rows.
    """
    from .windows import distributed_running_max

    per_min = df.groupBy(min_col).agg(F.max(max_col).alias(max_col))
    ran = distributed_running_max(
        per_min,
        [(min_col, False)],
        max_col,
        out_col="_sky_prev",
        exclusive=True,
        num_partitions=num_partitions,
    )
    return ran.filter(
        F.col("_sky_prev").isNull() | (F.col(max_col) > F.col("_sky_prev"))
    ).drop("_sky_prev")
