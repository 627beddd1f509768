"""Time-series resampling operators — the batch twins of the price
analytics the reference's DataStream jobs compute row-at-a-time
(reference: MaximumClosingPrice.java:47-82 folds per-key extrema;
these operators generalize that to full OHLC resampling and gap
repair, expressed as Catalyst aggregates instead of per-record state).

Scale shape: both operators are single-exchange. ``ohlc_bars`` is a
plain groupBy — map-side partial ``min/max/min_by/max_by`` aggregates
mean each (key, bucket) group reduces to one tiny struct before the
shuffle, so skewed keys cost nothing (the partial agg absorbs them).
``fill_forward`` is one window pass per key; for hot keys compose it
with segment carries like the other running forms (see
``stateful.segmented_running_sum`` — the carried state here is "last
non-null", which is associative: segment-carry = coalesce(local last,
previous segments' last)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ohlc_bars",
    "fill_forward",
    "last_touch_attribution",
    "coalesce_intervals",
    "kaplan_meier",
]


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    bucket: str = "hour",
    tiebreak_cols: Sequence[str] = (),
    bucket_out: str = "bucket_start",
) -> DataFrame:
    """Resample a value stream into OHLC candle bars per key and
    ``date_trunc`` bucket: open = first value in the bar, high/low =
    extrema, close = last value, volume = row count.

    First/last are ``min_by``/``max_by`` over a (ts, *tiebreak) struct —
    total order required, so pass tie-break columns whenever ``ts_col``
    can collide (struct comparison is lexicographic, same semantics as
    DuckDB's ``arg_min``/``arg_max`` over a composite, which is what
    makes the op oracle-checkable). ``date_trunc`` rather than
    ``F.window()`` keeps the bucket a plain column both engines compute
    identically.
    """
    order = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    return (
        df.groupBy(
            *key_cols, F.date_trunc(bucket, F.col(ts_col)).alias(bucket_out)
        )
        .agg(
            F.min_by(F.col(value_col), order).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), order).alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        )
    )


def fill_forward(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "filled",
) -> DataFrame:
    """Per-key forward-fill: each NULL takes the most recent non-NULL
    value along the key's order (NULL until the first observation) —
    the canonical gap-repair step before any rolling analytic.

    One window pass: ``last(value, ignorenulls=True)`` over rows
    unbounded-preceding..current — stays in the JVM window evaluator,
    no UDF. Same hot-key ceiling as every running form; the carried
    state ("last non-null seen") is associative, so the segment-carry
    pattern lifts it when a key's history outgrows one task.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(F.col(value_col), ignorenulls=True).over(w))


def last_touch_attribution(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    type_col: str,
    conversion_type: str,
    out_col: str = "channel",
    default: str = "direct",
) -> DataFrame:
    """Last-touch marketing attribution: every conversion event is
    credited to the most recent PRECEDING non-conversion event type
    ("touch") in the same key's ordered history — the standard
    attribution model a growth-analytics pipeline runs over a
    clickstream. Conversions with no prior touch credit ``default``.

    Attribution does NOT reset at a conversion: a second purchase with
    no touches in between credits the same channel as the first (the
    industry-standard reading; a reset variant is one extra
    ``when`` on a session/conversion-count window).

    One window pass — ``last(ignorenulls=True)`` over the running
    frame, exactly the :func:`fill_forward` kernel with the carried
    value being "last non-conversion type". Same associative-carry
    scale note applies: hot keys lift to the segment-carry form. The
    current row is safely inside the frame because a conversion row
    contributes NULL to the carry.

    Returns the conversion rows only, with ``out_col`` attached.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    return (
        df.withColumn(
            out_col,
            F.coalesce(F.last(touch, ignorenulls=True).over(w), F.lit(default)),
        )
        .filter(F.col(type_col) == conversion_type)
    )


def conversion_paths(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    type_col: str,
    conversion_type: str,
    depth: int = 3,
    out_col: str = "path",
    default: str = "direct",
) -> DataFrame:
    """Per-conversion touch path: each conversion row gains the ordered
    '>'-joined path of its last ≤``depth`` preceding touches (oldest
    first); no touches → ``default``. The journey-analytics primitive
    behind path reports and Markov attribution.

    NO list-typed window state: touches get a per-key running TOUCH
    NUMBER (one running-sum window), each conversion carries its
    preceding-touch count, and the ``depth`` path slots resolve by
    ``depth`` equi-joins on (key, touch_no−k) — linear shuffle joins at
    any scale, where a collect_list window would carry unbounded
    per-row array state. ``concat_ws`` skips NULL slots, so shorter
    histories collapse to shorter paths.

    Returns the conversion rows: key cols + order cols + ``out_col``.
    """
    is_touch = F.when(F.col(type_col) != conversion_type, 1).otherwise(0)
    keys = list(key_cols)
    order = list(order_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = df.select(
        *keys,
        *order,
        F.col(type_col),
        is_touch.alias("_is_touch"),
        F.sum(is_touch).over(w).cast("long").alias("_t_cnt"),
    )
    touches = numbered.filter(F.col("_is_touch") == 1).select(
        *keys,
        F.col(type_col).alias("_touch_type"),
        F.col("_t_cnt").alias("_touch_no"),
    )
    out = numbered.filter(F.col(type_col) == conversion_type).select(
        *keys, *order, "_t_cnt"
    )
    slot_cols = []
    for k in range(depth - 1, -1, -1):  # oldest slot first
        a = f"_slot{k}"
        tk = touches.select(
            *[F.col(c).alias(f"{a}_{c}") for c in keys],
            F.col("_touch_no").alias(f"{a}_no"),
            F.col("_touch_type").alias(a),
        )
        cond = (F.col(f"{a}_no") == out._t_cnt - k)
        for c in keys:
            cond = cond & (F.col(f"{a}_{c}") == out[c])
        out = out.join(tk, cond, "left").drop(
            f"{a}_no", *[f"{a}_{c}" for c in keys]
        )
        slot_cols.append(a)
    return out.select(
        *keys,
        *order,
        F.coalesce(
            F.nullif(F.concat_ws(">", *slot_cols), F.lit("")), F.lit(default)
        ).alias(out_col),
    )


def coalesce_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    tiebreak_cols: Sequence[str] = (),
    span_start_col: str = "span_start",
    span_end_col: str = "span_end",
    n_col: str = "n_intervals",
) -> DataFrame:
    """Merge overlapping-or-touching [start, end] intervals per key
    into maximal spans — the interval-coalesce / "activity islands"
    warehouse primitive (PACK in the temporal-SQL literature).

    Gaps-and-islands in two window passes over ONE exchange: order
    intervals by (start, end, tiebreak); a new island starts where the
    interval's start exceeds the running max of all PRIOR ends
    (exclusive frame — running max handles the contained-interval case
    a lag(end) formulation gets wrong); prefix-sum the island flags
    into span ids; group. Touching counts as merged (start == prior
    end ⇒ same span) — half-open callers pass end-1.

    Output: one row per span — key cols, span_start (min start),
    span_end (max end), n_intervals merged.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        start_col, end_col, *tiebreak_cols
    )
    prior_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_iv_new",
        (prior_max_end.isNull() | (F.col(start_col) > prior_max_end)).cast("long"),
    ).withColumn(
        "_iv_span",
        F.sum("_iv_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        flagged.groupBy(*key_cols, "_iv_span")
        .agg(
            F.min(start_col).alias(span_start_col),
            F.max(end_col).alias(span_end_col),
            F.count(F.lit(1)).cast("long").alias(n_col),
        )
        .drop("_iv_span")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    out_time: str = "t",
) -> DataFrame:
    """Kaplan–Meier survival curve over (duration, event) observations
    (event=1 observed, 0 right-censored): per distinct event time t,
    the at-risk count n_t = |{duration ≥ t}|, event count d_t, and
    S(t) = Π_{t'≤t} (1 − d/n) — the product-limit estimator (Kaplan &
    Meier 1958), e.g. "probability a customer survives g days without
    reordering".

    Portability scheme (the BM25/bigram-LM integer-snap precedent,
    applied to a PRODUCT): each factor becomes one fixed-order double
    ln((n−d)/n) over exact BIGINTs, SNAPPED to integer micro-nats
    before the prefix sum — so the cumulative product is an exact
    integer sum inside exp(), and float association can never differ.
    S hits exactly 0 where d = n (ln undefined): the running "has
    zeroed" flag is integer too.

    Scale shape: observations aggregate to the distinct-time table
    FIRST (one groupBy); n_t needs no self-join — it is total_obs minus
    the EXCLUSIVE prefix sum of (d_t + c_t) over times ascending. The
    windows run over the distinct-duration aggregate (calendar-bounded
    cardinality), never the observation stream; the only 1-part window
    is therefore bounded by the value domain, not the data.
    """
    per_t = df.groupBy(F.col(duration_col).alias(out_time)).agg(
        F.sum(F.col(event_col).cast("long")).cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col(event_col).cast("long")).cast("long").alias("c_censored"),
    )
    w = Window.orderBy(out_time)
    prior = F.coalesce(
        F.sum(F.col("d_events") + F.col("c_censored")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    # total observations via a broadcast one-row aggregate — the repo
    # convention (never a driver collect in plan construction)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("_km_total"))
    n_at = (F.col("_km_total") - prior).cast("long")
    stepped = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn("n_at_risk", n_at)
        .drop("_km_total")
        .filter(F.col("d_events") > 0)
    )
    ln_micro = F.when(
        F.col("d_events") >= F.col("n_at_risk"), F.lit(None)
    ).otherwise(
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("d_events")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * 1000000
        ).cast("long")
    )
    w2 = Window.orderBy(out_time).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zeroed = F.max((F.col("_ln_m").isNull()).cast("long")).over(w2)
    acc = F.sum("_ln_m").over(w2)
    return (
        stepped.withColumn("_ln_m", ln_micro)
        .withColumn(
            "km_micro",
            F.when(zeroed > 0, F.lit(0).cast("long")).otherwise(
                F.round(F.exp(acc.cast("double") / 1000000) * 1000000).cast("long")
            ),
        )
        .select(out_time, "n_at_risk", "d_events", "km_micro")
    )
