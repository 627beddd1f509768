"""Window analytics — the idiomatic generalization of the reference's
running-emission pattern (SURVEY.md §2.6 "Running/window analytics").

The reference emits running state on every row (W1/W4,
MaximumClosingPrice.java:57-64). The general family is ordered-partition
window functions: ranking, offsets, running and moving aggregates, and
gap-based sessionization (the time-gap cousin of W3's marker sessions).

Scale: WindowExec = one hash exchange on the partition keys + in-partition
sort; sort is spillable. Moving frames (rowsBetween(-k, 0)) evaluate
incrementally. rangeBetween frames need the order column physically sorted
anyway — no extra cost over rowsBetween.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "distributed_global_rank",
    "distributed_running_sum",
    "distributed_running_max",
    "with_row_number",
    "with_rank_columns",
    "with_lag_lead",
    "moving_avg",
    "running_sum",
    "range_running_sum",
    "sessionize_by_gap",
]

ColsLike = Sequence[str | Column]


def _w(key_cols: ColsLike, order_cols: ColsLike):
    return Window.partitionBy(*key_cols).orderBy(*order_cols)


def with_row_number(df: DataFrame, key_cols: ColsLike, order_cols: ColsLike, out_col: str = "rn") -> DataFrame:
    return df.withColumn(out_col, F.row_number().over(_w(key_cols, order_cols)))


def with_rank_columns(
    df: DataFrame, key_cols: ColsLike, order_cols: ColsLike, ntile: int | None = None
) -> DataFrame:
    """The full rank-function family in one window pass; pass ``ntile``
    to add an n-bucket assignment (equal-frequency binning)."""
    w = _w(key_cols, order_cols)
    out = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("cdist", F.cume_dist().over(w))
    )
    if ntile is not None:
        if ntile < 1:
            raise ValueError(f"ntile must be >= 1, got {ntile}")
        out = out.withColumn("bucket", F.ntile(ntile).over(w))
    return out


def with_lag_lead(
    df: DataFrame, key_cols: ColsLike, order_cols: ColsLike, value_col: str, offset: int = 1
) -> DataFrame:
    w = _w(key_cols, order_cols)
    return df.withColumn("prev_value", F.lag(value_col, offset).over(w)).withColumn(
        "next_value", F.lead(value_col, offset).over(w)
    )


def moving_avg(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    value_col: str,
    window_rows: int = 50,
    out_col: str = "moving_avg",
) -> DataFrame:
    """True *rolling* k-row average — what the reference's
    'RollingAverageHighPrice' name promises but doesn't implement (its
    windows are disjoint; SURVEY.md §2.4 W2 note). Frame: current row and
    the k-1 preceding rows, partial at the head of each key."""
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    w = _w(key_cols, order_cols).rowsBetween(-(window_rows - 1), Window.currentRow)
    return df.withColumn(out_col, F.avg(value_col).over(w))


def running_sum(
    df: DataFrame, key_cols: ColsLike, order_cols: ColsLike, value_col: str, out_col: str = "running_sum"
) -> DataFrame:
    w = _w(key_cols, order_cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def range_running_sum(
    df: DataFrame,
    key_cols: ColsLike,
    order_col: str,
    value_col: str,
    preceding: int,
    out_col: str = "range_sum",
) -> DataFrame:
    """Value-range frame: sum over rows whose order value lies within
    ``preceding`` of the current row's (RANGE BETWEEN n PRECEDING AND
    CURRENT ROW)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col).rangeBetween(-preceding, 0)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def sessionize_by_gap(
    df: DataFrame,
    key_cols: ColsLike,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when the gap
    to the previous event exceeds ``gap_seconds``. Classic lag + prefix-sum
    — the same construction as W3's marker sessions with the marker derived
    from time instead of value (SURVEY.md §2.6 "Count & marker windows").
    Streaming equivalent: ``session_window`` in streaming/windows.py."""
    w = _w(key_cols, [ts_col])
    # timestampdiff is wall-clock arithmetic on the operands themselves —
    # no session-timezone hop, so NTZ inputs behave identically in UTC
    # and DST-shifting sessions (a cast-to-epoch formulation merges
    # sessions across fall-back and splits them across spring-forward).
    # MICROSECOND, not SECOND: whole-second truncation would merge a
    # gap of gap_seconds + 0.9s into one session.
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    new_session = (prev_ts.isNull() | (gap_us > int(gap_seconds) * 1_000_000)).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(wsum))


def distributed_global_rank(
    df: DataFrame,
    order_keys: Sequence[tuple[str, bool]],
    rank_col: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """EXACT global row_number for EVERY row — with no single-task sort
    anywhere (the r5-verdict fix generalized from the two-phase decile):

    1. ``repartitionByRange`` on the ordering keys → range-disjoint
       partitions whose order respects the global order. The key tuple
       must be UNIQUE (caller contract: last key is an id/tiebreak), so
       no tie can straddle a boundary; AQE coalescing merges only
       ADJACENT ranges, preserving the property.
    2. The ranged frame is materialized ONCE (eager localCheckpoint) —
       partition ids must mean the same thing in every consumer, and
       RangePartitioner boundary sampling is not guaranteed bit-stable
       across re-executions.
    3. Each partition numbers its own rows in parallel (window
       partitioned by partition id); a |partitions|-row offset table
       (cumulative counts — parallelism-bounded, never data-bounded) is
       broadcast back: rank = local row_number + offset.

    Use :func:`~..topk.ranked_top_n` instead when only the top k rows
    need ranks — it avoids materializing the frame at all.

    ``order_keys`` is [(col, is_desc), ...]. Internal staging columns
    are dropped from the output; all input columns survive.
    """
    cols = [F.desc(c) if d else F.asc(c) for c, d in order_keys]
    for reserved in ("_gr_pid", "_gr_lrn", "_gr_off"):
        if reserved in df.columns:
            raise ValueError(f"input already has a {reserved} column (reserved)")
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wl = Window.partitionBy("_gr_pid").orderBy(*cols)
    local = ranged.withColumn("_gr_lrn", F.row_number().over(wl).cast("long"))
    wo = Window.orderBy("_gr_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranged.groupBy("_gr_pid")
        .agg(F.count(F.lit(1)).cast("long").alias("_gr_cnt"))
        .withColumn(
            "_gr_off", F.coalesce(F.sum("_gr_cnt").over(wo), F.lit(0)).cast("long")
        )
        .select("_gr_pid", "_gr_off")
    )
    return (
        local.join(F.broadcast(offs), "_gr_pid")
        .withColumn(rank_col, (F.col("_gr_lrn") + F.col("_gr_off")).cast("long"))
        .drop("_gr_pid", "_gr_lrn", "_gr_off")
    )


def distributed_running_sum(
    df: DataFrame,
    order_keys: Sequence[tuple[str, bool]],
    value_col: str,
    out_col: str = "running_sum",
    rank_col: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """EXACT global running sum (and optionally the global row_number)
    along a total order — with no single-task sort anywhere. The
    :func:`distributed_global_rank` recipe with VALUE offsets: range-
    disjoint partitions cumsum locally in parallel; a parallelism-
    bounded offset table (each partition's preceding-partitions value
    total) is broadcast back and added. Same caller contract: the
    ordering key tuple must be UNIQUE (tiebreak last), and the ranged
    frame is materialized once so partition ids are stable across the
    offset and local passes.

    This is the primitive behind Pareto/coverage analyses ("how many
    top-k cover p% of the total") at fact-table scale — the naive form
    is an unpartitioned ORDER BY window, the r5-verdict scale-killer.
    """
    cols = [F.desc(c) if d else F.asc(c) for c, d in order_keys]
    for reserved in ("_rs_pid", "_rs_lcs", "_rs_off", "_rs_lrn"):
        if reserved in df.columns:
            raise ValueError(f"input already has a {reserved} column (reserved)")
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_rs_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wl = (
        Window.partitionBy("_rs_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_rs_lcs", F.sum(value_col).over(wl).cast("long")
    )
    if rank_col is not None:
        local = local.withColumn(
            "_rs_lrn",
            F.row_number().over(Window.partitionBy("_rs_pid").orderBy(*cols)).cast("long"),
        )
    wo = Window.orderBy("_rs_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranged.groupBy("_rs_pid")
        .agg(
            F.sum(value_col).cast("long").alias("_rs_sum"),
            F.count(F.lit(1)).cast("long").alias("_rs_cnt"),
        )
        .withColumn(
            "_rs_off", F.coalesce(F.sum("_rs_sum").over(wo), F.lit(0)).cast("long")
        )
        .withColumn(
            "_rs_roff", F.coalesce(F.sum("_rs_cnt").over(wo), F.lit(0)).cast("long")
        )
        .select("_rs_pid", "_rs_off", "_rs_roff")
    )
    out = local.join(F.broadcast(offs), "_rs_pid").withColumn(
        out_col, (F.col("_rs_lcs") + F.col("_rs_off")).cast("long")
    )
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col("_rs_lrn") + F.col("_rs_roff")).cast("long")
        )
    return out.drop("_rs_pid", "_rs_lcs", "_rs_off", "_rs_roff", "_rs_lrn")


def distributed_running_max(
    df: DataFrame,
    order_keys: Sequence[tuple[str, bool]],
    value_col: str,
    out_col: str = "running_max",
    exclusive: bool = False,
    num_partitions: int = 32,
) -> DataFrame:
    """EXACT global running MAX along a total order — the MAX twin of
    :func:`distributed_running_sum`, same two-phase recipe: range-
    disjoint partitions compute their local running max in parallel; a
    parallelism-bounded offset table (each partition's preceding-
    partitions max) is broadcast back and combined with ``greatest``.
    Caller contract is identical: the ordering key tuple must be UNIQUE
    (tiebreak last) and the ranged frame is materialized once so
    partition ids agree between the local and offset passes.

    ``exclusive=True`` gives the STRICTLY-PRECEDING-rows max (NULL for
    the global first row) — the form skyline/frontier pruning needs
    ("is this row's value above everything before it in the order?").
    This is the primitive behind the 2-D skyline operator
    (:func:`~..topk.skyline_2d`): max is associative/commutative so the
    partition-offset decomposition is exact, no floats involved.
    """
    cols = [F.desc(c) if d else F.asc(c) for c, d in order_keys]
    for reserved in ("_rm_pid", "_rm_lmx", "_rm_off"):
        if reserved in df.columns:
            raise ValueError(f"input already has a {reserved} column (reserved)")
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_rm_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    hi = Window.currentRow if not exclusive else -1
    wl = (
        Window.partitionBy("_rm_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = ranged.withColumn("_rm_lmx", F.max(value_col).over(wl))
    # Offset for partition p = max over ALL rows of every preceding
    # partition — exclusive of p itself in both modes (partition-local
    # rows are already covered by the local pass).
    wo = Window.orderBy("_rm_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranged.groupBy("_rm_pid")
        .agg(F.max(value_col).alias("_rm_pmx"))
        .withColumn("_rm_off", F.max("_rm_pmx").over(wo))
        .select("_rm_pid", "_rm_off")
    )
    # greatest() ignores NULLs (returns the non-NULL operand), which is
    # exactly right: NULL local (exclusive first row) + non-NULL offset
    # = offset; both NULL (global first row, exclusive) = NULL.
    return (
        local.join(F.broadcast(offs), "_rm_pid")
        .withColumn(out_col, F.greatest(F.col("_rm_lmx"), F.col("_rm_off")))
        .drop("_rm_pid", "_rm_lmx", "_rm_off")
    )
