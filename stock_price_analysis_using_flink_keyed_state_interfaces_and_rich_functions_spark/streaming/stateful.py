"""Streaming ports of the reference's four keyed-state operators with
exact per-row emission semantics, via ``applyInPandasWithState``
(SURVEY.md §2.4; the batch window-function forms live in
``operators/stateful.py``).

The reference emits incrementally as rows arrive — e.g. the running max
is emitted on EVERY input row (MaximumClosingPrice.java:57-64), and the
count-window average is emitted mid-stream when the 51st row of a cycle
arrives (RollingAverageHighPrice.java:80-87). Batch window functions
reproduce the final values; these functions reproduce the *emission
stream*: one micro-batch at a time, per-key state carried in Spark's
state store exactly as Flink carried it in its keyed state backend.

Ordering: within each micro-batch, a key's rows are CONCATENATED across
Arrow chunks and sorted by ``order_cols`` once before the state fold
(Flink gives arrival order; we make the order explicit). Chunk-wise
sorting would silently misorder keys whose per-batch volume exceeds
``spark.sql.execution.arrow.maxRecordsPerBatch``. The concat bounds
memory at one key's micro-batch volume — exactly what a sort needs
anyway. Cross-batch order is the micro-batch sequence — same contract
as any at-least-once streaming ingestion sorted at source.

NULL values follow the batch operators' semantics: running max ignores
them (emitting the unchanged max, like ``F.max``), W2's average skips
them in numerator and denominator (like ``F.avg``), W3 counts them as
non-breach rows (NULL ≥ threshold is false in both forms). Emitted
"no value yet" cells are genuine NULLs, not float NaN: outputs are
built as pandas nullable ``Float64`` arrays so ``pd.NA`` round-trips
to a Spark NULL through Arrow (NaN and NULL are distinct in Spark
joins/sorts/aggregates, so batch↔stream parity requires real NULLs).

State size is O(1) per key for all four operators (the W3 ListState is
deliberately reduced to a counter — only the length was ever used,
DaysSincePriceThreshold.java:73-79).
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "running_max_stream",
    "session_close_stream",
    "fill_forward_stream",
    "running_agg_update_stream",
    "tumbling_count_window_avg_stream",
    "rows_between_breaches_stream",
    "running_max_transform_with_state",
    "ewma_stream",
    "ewma_integer_stream",
    "holt_integer_stream",
    "cusum_integer_stream",
    "last_touch_attribution_stream",
    "first_touch_attribution_stream",
    "conversion_paths_stream",
    "transition_census_stream",
    "holt_winters_integer_stream",
    "funnel_stage_stream",
    "burst_rate_stream",
]


def _nullable_float(values: Sequence[float | None]) -> pd.arrays.FloatingArray:
    """NaN→NULL-preserving output column: Arrow maps ``pd.NA`` in a
    nullable Float64 array to a Spark NULL, where a plain float64 NaN
    would surface as NaN (a distinct value in Spark semantics)."""
    import math

    return pd.array(
        [None if v is None or math.isnan(v) else v for v in values], dtype="Float64"
    )


def _key_fields(df: DataFrame, key_cols: Sequence[str]) -> list[StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [StructField(k, by_name[k].dataType) for k in key_cols]


def running_max_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_max",
) -> DataFrame:
    """W1/W4 streaming: per-key running max, ONE OUTPUT ROW PER INPUT ROW
    (ValueState fold; MaximumClosingPrice.java:47-82 / the MapState twin
    MaxTradeVolumePerYearPerMonth.java:53-91 — composite key = more key
    columns)."""
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(value_col, DoubleType()), StructField(out_col, DoubleType())]
    )
    state_schema = StructType([StructField("cur_max", DoubleType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (cur,) = state.get if state.exists else (None,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            outs = []
            vals = pdf[value_col].astype(float)
            for v in vals:
                if not math.isnan(v):
                    cur = v if cur is None else max(cur, v)
                outs.append(cur)
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out[value_col] = _nullable_float(vals)
            out[out_col] = _nullable_float(outs)
            yield out
        state.update((cur,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def fill_forward_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "filled",
) -> DataFrame:
    """Streaming forward-fill: each NULL emits the key's most recent
    non-NULL value, carried across micro-batches in one float of
    ValueState — the on-ingest twin of the batch
    ``operators/timeseries.py:fill_forward`` (window ``last IGNORE
    NULLS``), same NULL contract: NULL until the key's first
    observation. State is O(1) per key; chunked replay equals batch
    replay because the carried state is exactly one value."""
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(value_col, DoubleType()), StructField(out_col, DoubleType())]
    )
    state_schema = StructType([StructField("last_seen", DoubleType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (cur,) = state.get if state.exists else (None,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            outs = []
            vals = pdf[value_col].astype(float)
            for v in vals:
                if not math.isnan(v):
                    cur = v
                outs.append(cur)
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out[value_col] = _nullable_float(vals)
            out[out_col] = _nullable_float(outs)
            yield out
        state.update((cur,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def running_agg_update_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Sequence,
) -> DataFrame:
    """The IDIOMATIC Spark form of W1/W4's "current state per key":
    a plain streaming ``groupBy().agg()`` consumed in UPDATE output
    mode — each micro-batch emits one refreshed row per key that
    changed, and Spark's incremental HashAggregate state does what the
    reference's ValueState did, with map-side partial aggregation and
    no per-row Python.

    Trade vs :func:`running_max_stream`: that port reproduces the
    reference's one-output-row-PER-INPUT-ROW emission exactly (needed
    for parity); this form emits per (key, micro-batch) — the shape a
    production dashboard actually wants, at a fraction of the output
    volume and with no ordering requirement at all. Use the per-row
    port for replay parity, this for live aggregates.

    The caller's sink must run with ``outputMode("update")`` (or
    "complete"); append mode rejects unbounded keyed aggregates.
    """
    return df.groupBy(*key_cols).agg(*aggs)


def running_max_transform_with_state(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_max",
) -> DataFrame:
    """W1 on the Spark 4 ``transformWithStateInPandas`` API — the
    closest structural analog to the reference's RichFlatMapFunction:
    an ``init``/``handleInputRows``/``close`` lifecycle with typed state
    handles registered up front (``getValueState`` ↔ the
    ``ValueStateDescriptor`` dance in MaximumClosingPrice.java:68-81).

    Semantically identical to :func:`running_max_stream`; exists so both
    stateful-streaming APIs are exercised (applyInPandasWithState is the
    3.4+ surface, transformWithState the 4.x one with finer state
    kinds + timers).

    Runtime requirements: RocksDB state store (set below) and a working
    ``google.protobuf`` install for the TWS driver worker — environments
    without protobuf should use :func:`running_max_stream`, which has no
    extra dependencies and identical semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState requires the RocksDB state store provider (the
    # default HDFS-backed store cannot host its typed state handles).
    # SIDE EFFECT: this is a session-wide conf — streaming queries
    # started afterwards also get RocksDB. Only set when the session is
    # still on the default provider; a session already pinned elsewhere
    # is respected (start such sessions with RocksDB yourself).
    _prov_key = "spark.sql.streaming.stateStore.providerClass"
    _rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    _cur = df.sparkSession.conf.get(_prov_key, "")
    if "RocksDB" not in _cur and ("HDFSBackedStateStoreProvider" in _cur or not _cur):
        df.sparkSession.conf.set(_prov_key, _rocks)

    keys = list(key_cols)
    order = list(order_cols)
    out_schema = StructType(
        _key_fields(df, keys)
        + [StructField(value_col, DoubleType()), StructField(out_col, DoubleType())]
    )

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._max = handle.getValueState("cur_max", "cur double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: N803
            import math

            cur = self._max.get()[0] if self._max.exists() else None
            chunks = [c for c in rows if len(c)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
                outs = []
                vals = pdf[value_col].astype(float)
                for v in vals:
                    if not math.isnan(v):
                        cur = v if cur is None else max(cur, v)
                    outs.append(cur)
                out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
                out[value_col] = _nullable_float(vals)
                out[out_col] = _nullable_float(outs)
                yield out
            self._max.update((cur,))

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        RunningMax(), outputStructType=out_schema, outputMode="Append", timeMode="None"
    )


def tumbling_count_window_avg_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_size: int = 50,
    out_col: str = "avg_value",
) -> DataFrame:
    """W2 streaming: per-key (count, sum) state; rows 1..N accumulate,
    row N+1 triggers emission of sum/N and resets — the trigger row's
    value never enters any window (RollingAverageHighPrice.java:68-88).
    Emission is mid-stream and data-driven, exactly like the reference.
    """
    out_schema = StructType(
        _key_fields(df, key_cols) + [StructField(out_col, DoubleType())]
    )
    state_schema = StructType(
        [
            StructField("cnt", LongType()),
            StructField("nn", LongType()),
            StructField("acc", DoubleType()),
        ]
    )
    keys = list(key_cols)
    order = list(order_cols)

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        # cnt = window position (every row advances it, NULL or not);
        # nn/acc = non-null count and sum, so the emitted average skips
        # NULLs exactly like the batch form's F.avg.
        cnt, nn, acc = state.get if state.exists else (0, 0, 0.0)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            emitted = []
            for v in pdf[value_col].astype(float):
                if cnt < window_size:
                    cnt += 1
                    if not math.isnan(v):
                        nn += 1
                        acc += v
                else:  # (window_size+1)-th row: emit & reset; v is discarded
                    emitted.append(acc / nn if nn else None)
                    cnt, nn, acc = 0, 0, 0.0
            if emitted:
                out = pd.DataFrame({k: [kv] * len(emitted) for k, kv in zip(keys, key)})
                out[out_col] = _nullable_float(emitted)
                yield out
        state.update((cnt, nn, acc))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def rows_between_breaches_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    threshold: float,
    emit_col: str,
    out_col: str = "rows_since_prev_breach",
) -> DataFrame:
    """W3 streaming: per-key counter state; a breach (value ≥ threshold)
    emits the count of non-breach rows since the previous breach and
    resets; non-breach rows increment (DaysSincePriceThreshold.java:61-102
    — the reference's ListState is over-retention, only its length is
    read, so the state here is a single counter). ``emit_col`` is the
    column carried through on emission (the reference emits the date)."""
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(emit_col, by_name[emit_col].dataType), StructField(out_col, LongType())]
    )
    state_schema = StructType([StructField("cnt", LongType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (cnt,) = state.get if state.exists else (0,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            emit_vals, counts = [], []
            for v, tag in zip(pdf[value_col].astype(float), pdf[emit_col]):
                if v >= threshold:  # NaN compares False: NULL = non-breach, as in batch
                    emit_vals.append(tag)
                    counts.append(cnt)
                    cnt = 0
                else:
                    cnt += 1
            if emit_vals:
                out = pd.DataFrame({k: [kv] * len(emit_vals) for k, kv in zip(keys, key)})
                out[emit_col] = emit_vals
                out[out_col] = counts
                yield out
        state.update((cnt,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def ewma_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Streaming twin of ``operators/stateful.py:ewma`` — per-key
    exponential decay with ONE float of carried state, one output row
    per input row.

    Bit-exact chunked replay: the carried state is the last emitted
    mean, and each micro-batch PREPENDS it to the new values and runs
    the SAME pandas ``ewm(alpha, adjust=False, ignore_na=True)`` kernel
    (dropping the first row). Since ``ignore_na=True`` makes the
    recursion depend only on the last valid mean, restarting from that
    scalar reproduces the unchunked fold double-for-double — pinned by
    the batch↔stream parity test.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(value_col, DoubleType()), StructField(out_col, DoubleType())]
    )
    state_schema = StructType([StructField("cur_mean", DoubleType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        (cur,) = state.get if state.exists else (None,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            vals = pdf[value_col].astype("float64")
            if cur is not None and not math.isnan(cur):
                series = pd.concat([pd.Series([cur]), vals], ignore_index=True)
                means = series.ewm(alpha=alpha, adjust=False, ignore_na=True).mean().iloc[1:]
            else:
                means = vals.ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
            means = means.reset_index(drop=True)
            last_valid = means[~means.isna()]
            if len(last_valid):
                cur = float(last_valid.iloc[-1])
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out[value_col] = _nullable_float(vals)
            out[out_col] = _nullable_float(means)
            yield out
        state.update((cur,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def ewma_integer_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha_pct: int = 20,
    out_col: str = "ewma_int",
) -> DataFrame:
    """Streaming twin of ``operators/stateful.py:ewma_integer`` — the
    ORACLE-EXACT integer EWMA with ONE BIGINT of carried state per key,
    one output row per input row, bit-identical to the batch fold at
    any micro-batch chunking (integer arithmetic has no reassociation
    error, so chunked replay is EXACTLY the unchunked fold — stronger
    than the float twin, which relies on the last-mean restart being
    sufficient).

    Values travel as exact int64 through the same explicit null-mask
    staging as the batch form (Arrow renders nullable int64 as float64,
    which silently loses units above 2^53); NULL values emit the
    carried state and never update it. Emits (keys..., value, out).
    """
    if not 1 <= alpha_pct <= 100:
        raise ValueError(f"alpha_pct must be in [1, 100], got {alpha_pct}")
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType, LongType

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, LongType) and vtype.simpleString() not in ("int", "smallint", "tinyint"):
        raise TypeError(
            f"ewma_integer_stream needs an integer value column, got {vtype.simpleString()}"
        )
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(value_col, LongType()), StructField(out_col, LongType())]
    )
    state_schema = StructType([StructField("y", LongType())])
    keys = list(key_cols)
    order = list(order_cols)
    a = int(alpha_pct)
    vcol = value_col

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (y,) = state.get if state.exists else (None,)
        if y is not None:
            y = int(y)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            out_vals = []
            xs_out = []
            for xf, xn in zip(pdf["_xf"], pdf["_xn"]):
                if bool(xn):
                    xs_out.append(None)
                    out_vals.append(y)
                    continue
                x = int(xf)
                y = x if y is None else ((100 - a) * y + a * x) // 100
                xs_out.append(x)
                out_vals.append(y)
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out[vcol] = pd.array(xs_out, dtype="Int64")
            out[out_col] = pd.array(out_vals, dtype="Int64")
            yield out
        state.update((y,))

    if "_xf" in df.columns or "_xn" in df.columns:
        raise ValueError("input already has a _xf/_xn column (reserved staging names)")
    staged = df.withColumn(
        "_xf", F.coalesce(F.col(vcol).cast("long"), F.lit(0).cast("long"))
    ).withColumn("_xn", F.col(vcol).isNull())
    return staged.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def holt_integer_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha_pct: int = 20,
    beta_pct: int = 10,
    level_col: str = "level_int",
    trend_col: str = "trend_int",
) -> DataFrame:
    """Streaming twin of ``operators/stateful.py:holt_linear_integer``
    — Holt level+trend smoothing with TWO BIGINTs of carried state per
    key, one output row per input row, bit-identical to the batch fold
    at any micro-batch chunking (pure integer arithmetic: chunked
    replay IS the unchunked fold, the same exactness argument as
    :func:`ewma_integer_stream`; the trend state swings negative on
    downswings and Python ``//`` floors identically in both twins).

    Same explicit null-mask staging (Arrow nullable-int64 hazard);
    NULLs emit the carried (level, trend) and never update them.
    Emits (keys..., value, level, trend).
    """
    if not 1 <= alpha_pct <= 100 or not 0 <= beta_pct <= 100:
        raise ValueError("alpha_pct in [1,100], beta_pct in [0,100] required")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, LongType) and vtype.simpleString() not in ("int", "smallint", "tinyint"):
        raise TypeError(
            f"holt_integer_stream needs an integer value column, got {vtype.simpleString()}"
        )
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [
            StructField(value_col, LongType()),
            StructField(level_col, LongType()),
            StructField(trend_col, LongType()),
        ]
    )
    state_schema = StructType([StructField("l", LongType()), StructField("t", LongType())])
    keys = list(key_cols)
    order = list(order_cols)
    a = int(alpha_pct)
    b = int(beta_pct)
    vcol = value_col

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        L, T = state.get if state.exists else (None, None)
        if L is not None:
            L, T = int(L), int(T)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            xs_out, lv, tv = [], [], []
            for xf, xn in zip(pdf["_hx"], pdf["_hn"]):
                if bool(xn):
                    xs_out.append(None)
                    lv.append(L)
                    tv.append(T)
                    continue
                x = int(xf)
                if L is None:
                    L, T = x, 0
                else:
                    L2 = (a * x + (100 - a) * (L + T)) // 100
                    T = (b * (L2 - L) + (100 - b) * T) // 100
                    L = L2
                xs_out.append(x)
                lv.append(L)
                tv.append(T)
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out[vcol] = pd.array(xs_out, dtype="Int64")
            out[level_col] = pd.array(lv, dtype="Int64")
            out[trend_col] = pd.array(tv, dtype="Int64")
            yield out
        state.update((L, T))

    if "_hx" in df.columns or "_hn" in df.columns:
        raise ValueError("input already has a _hx/_hn column (reserved staging names)")
    staged = df.withColumn(
        "_hx", F.coalesce(F.col(vcol).cast("long"), F.lit(0).cast("long"))
    ).withColumn("_hn", F.col(vcol).isNull())
    return staged.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def holt_winters_integer_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    period: int = 7,
    alpha_pct: int = 20,
    beta_pct: int = 10,
    gamma_pct: int = 10,
    level_col: str = "level_int",
    trend_col: str = "trend_int",
    season_col: str = "season_int",
) -> DataFrame:
    """Streaming twin of ``operators/stateful.py:holt_winters_integer``
    — additive triple smoothing with (2 + period) BIGINTs of carried
    state per key (level, trend, the seasonal ring serialized as a
    CSV string — GroupState rows keep to scalar fields — plus the
    non-NULL step counter that addresses the ring), one output row per
    input row, bit-identical to the batch fold at any micro-batch
    chunking (pure integer arithmetic: chunked replay IS the unchunked
    fold). NULLs emit the carried (level, trend) with a NULL seasonal
    and advance nothing, the batch contract."""
    if not 1 <= alpha_pct <= 100:
        raise ValueError(f"alpha_pct in [1,100] required, got {alpha_pct}")
    if not 0 <= beta_pct <= 100 or not 0 <= gamma_pct <= 100:
        raise ValueError("beta_pct and gamma_pct in [0,100] required")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, LongType) and vtype.simpleString() not in ("int", "smallint", "tinyint"):
        raise TypeError(
            f"holt_winters_integer_stream needs an integer value column, got {vtype.simpleString()}"
        )
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [
            StructField(value_col, LongType()),
            StructField(level_col, LongType()),
            StructField(trend_col, LongType()),
            StructField(season_col, LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("l", LongType()),
            StructField("t", LongType()),
            StructField("n", LongType()),
            StructField("s", StringType()),
        ]
    )
    keys = list(key_cols)
    order = list(order_cols)
    a, b, g, m = int(alpha_pct), int(beta_pct), int(gamma_pct), int(period)
    vcol = value_col

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            L, T, n, s_csv = state.get
            # A key whose first micro-batch held only NULL values stores
            # L=T=None (n=0); restore must keep them None — int(None)
            # would kill the streaming query (same guard as
            # holt_integer_stream above).
            if L is not None:
                L, T = int(L), int(T)
            n = int(n)
            S = [int(v) for v in s_csv.split(",")]
        else:
            L = T = None
            n = 0
            S = [0] * m
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            xs_out, lv, tv, sv = [], [], [], []
            for xf, xn in zip(pdf["_hx"], pdf["_hn"]):
                if bool(xn):
                    xs_out.append(None)
                    lv.append(L)
                    tv.append(T)
                    sv.append(None)
                    continue
                x = int(xf)
                if L is None:
                    L, T, n = x, 0, 1
                    xs_out.append(x)
                    lv.append(L)
                    tv.append(T)
                    sv.append(0)
                    continue
                idx = n % m
                L2 = (a * (x - S[idx]) + (100 - a) * (L + T)) // 100
                T = (b * (L2 - L) + (100 - b) * T) // 100
                S[idx] = (g * (x - L2) + (100 - g) * S[idx]) // 100
                L = L2
                n += 1
                xs_out.append(x)
                lv.append(L)
                tv.append(T)
                sv.append(S[idx])
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out[vcol] = pd.array(xs_out, dtype="Int64")
            out[level_col] = pd.array(lv, dtype="Int64")
            out[trend_col] = pd.array(tv, dtype="Int64")
            out[season_col] = pd.array(sv, dtype="Int64")
            yield out
        state.update((L, T, n, ",".join(str(v) for v in S)))

    if "_hx" in df.columns or "_hn" in df.columns:
        raise ValueError("input already has a _hx/_hn column (reserved staging names)")
    staged = df.withColumn(
        "_hx", F.coalesce(F.col(vcol).cast("long"), F.lit(0).cast("long"))
    ).withColumn("_hn", F.col(vcol).isNull())
    return staged.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def cusum_integer_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    target_col: str,
    slack: int = 0,
    out_col: str = "cusum_int",
) -> DataFrame:
    """Streaming twin of ``operators/stateful.py:cusum_integer`` — the
    one-sided integer CUSUM with ONE BIGINT of carried state per key.
    max-with-zero over integers is exactly replayable at any
    micro-batch chunking (no reassociation, no division), so parity
    with the batch fold is bit-exact. NULL value/target rows emit the
    carried S and never update it. Emits (keys..., value, out).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for c in (value_col, target_col):
        vtype = df.schema[c].dataType
        if not isinstance(vtype, LongType) and vtype.simpleString() not in ("int", "smallint", "tinyint"):
            raise TypeError(
                f"cusum_integer_stream needs integer columns, got {c}: {vtype.simpleString()}"
            )
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(value_col, LongType()), StructField(out_col, LongType())]
    )
    state_schema = StructType([StructField("s", LongType())])
    keys = list(key_cols)
    order = list(order_cols)
    k = int(slack)
    vcol = value_col

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (s,) = state.get if state.exists else (None,)
        if s is not None:
            s = int(s)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            xs_out, out_vals = [], []
            for xf, tf, xn in zip(pdf["_cx"], pdf["_ct"], pdf["_cn"]):
                if bool(xn):
                    xs_out.append(None)
                    out_vals.append(s)
                    continue
                s = max(0, (s or 0) + int(xf) - int(tf) - k)
                xs_out.append(int(xf))
                out_vals.append(s)
            out = pd.DataFrame({kk: [kv] * len(pdf) for kk, kv in zip(keys, key)})
            out[vcol] = pd.array(xs_out, dtype="Int64")
            out[out_col] = pd.array(out_vals, dtype="Int64")
            yield out
        state.update((s,))

    for reserved in ("_cx", "_ct", "_cn"):
        if reserved in df.columns:
            raise ValueError(f"input already has a {reserved} column (reserved)")
    staged = (
        df.withColumn("_cx", F.coalesce(F.col(vcol).cast("long"), F.lit(0).cast("long")))
        .withColumn("_ct", F.coalesce(F.col(target_col).cast("long"), F.lit(0).cast("long")))
        .withColumn("_cn", F.col(vcol).isNull() | F.col(target_col).isNull())
    )
    return staged.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def session_close_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    gap: str = "30 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Gap-session aggregation with EVENT-TIME STATE TIMEOUTS — the one
    keyed-state capability the other streaming ports don't exercise
    (they all run ``GroupStateTimeout.NoTimeout``): a key's session is
    CLOSED and emitted either (a) by data — a new event arrives more
    than ``gap`` after the session's last event, which closes the old
    session and opens a new one — or (b) by timer — the key goes
    silent and the watermark passes ``last_event + gap``, at which
    point Spark invokes the handler with ``state.hasTimedOut`` and no
    data, the session is emitted, and the state is REMOVED. (b) is
    what bounds state on unbounded streams for keys that simply stop:
    without timeouts, a departed key's state lives forever.

    Emits (key..., n_events, sum_value, first_ts, last_ts) per CLOSED
    session; sessions still open when the stream ends are never
    emitted (the honest semantics of timeout-driven emission).
    Timeout granularity is the micro-batch: a timer fires in the first
    batch whose watermark exceeds it, so emission timing (not content)
    depends on batch boundaries.
    """
    out_fields = _key_fields(df, key_cols) + [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
    out_schema = StructType(out_fields)
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("first_ts", TimestampType()),
            StructField("last_ts", TimestampType()),
        ]
    )
    keys = list(key_cols)
    gap_ms = _duration_to_ms(gap)
    # Captured at plan-build time on the driver and shipped in the UDF
    # closure: the timezone Spark renders its NAIVE pandas Timestamps
    # in. Needed to convert last_ts back to epoch ms for
    # setTimeoutTimestamp without assuming UTC (r4 advisor finding).
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def fold(key, pdfs, state: GroupState):
        import datetime

        def emit(n, total, first_ts, last_ts):
            out = pd.DataFrame({k: [kv] for k, kv in zip(keys, key)})
            out["n_events"] = pd.array([n], dtype="Int64")
            out["sum_value"] = [total]
            out["first_ts"] = [first_ts]
            out["last_ts"] = [last_ts]
            return out

        if state.hasTimedOut:
            n, total, first_ts, last_ts = state.get
            state.remove()
            yield emit(n, total, first_ts, last_ts)
            return

        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            # Defensive (r10 ADVICE): Spark shouldn't invoke a
            # non-timed-out key with only empty chunks, but if it ever
            # does, pd.concat([]) raises ValueError. Nothing to fold —
            # return without touching state; the state row (and any
            # event-time timer stored with it) persists unchanged.
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
        cur = list(state.get) if state.exists else None
        for _, row in pdf.iterrows():
            ts = row[ts_col]
            v = float(row[value_col])
            if cur is not None and (ts - cur[3]).total_seconds() * 1000 > gap_ms:
                yield emit(*cur)
                cur = None
            if cur is None:
                cur = [1, v, ts, ts]
            else:
                cur[0] += 1
                cur[1] += v
                cur[3] = ts
        state.update(tuple(cur))
        # close the session when the watermark passes last_ts + gap.
        # Spark hands applyInPandasWithState NAIVE pandas Timestamps in
        # the SESSION timezone, while setTimeoutTimestamp wants epoch
        # ms — localize with the tz captured from the driver's session
        # conf so .timestamp() cannot silently assume UTC for a
        # non-UTC session (r4 advisor finding: with e.g.
        # spark.sql.session.timeZone=Asia/Tokyo the naive
        # interpretation would fire the timer 9 h off). session.
        # get_spark pins UTC, making this a no-op there, but the
        # operator no longer depends on that.
        last = cur[3]
        if last.tzinfo is None:
            last = last.tz_localize(session_tz)
        deadline = last + datetime.timedelta(milliseconds=gap_ms)
        deadline_ms = int(deadline.timestamp() * 1000)
        # If the watermark has ALREADY passed last+gap (a quiet key whose
        # data arrived in a late micro-batch), setting the timer would
        # throw INVALID_TIMEOUT_TIMESTAMP — and the session is provably
        # closed anyway (any future event has ts >= watermark >= last+gap
        # and would open a NEW session), so emit it now.
        if deadline_ms <= state.getCurrentWatermarkMs():
            state.remove()
            yield emit(*cur)
            return
        state.setTimeoutTimestamp(deadline_ms)

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def _duration_to_ms(duration: str) -> int:
    """'30 seconds' / '5 minutes' / '250 milliseconds' → ms."""
    qty, unit = duration.split()
    factor = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(qty) * factor


def last_touch_attribution_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    type_col: str,
    conversion_type: str,
    out_col: str = "channel",
    default: str = "direct",
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.py:last_touch_attribution``
    — on-ingest last-touch conversion attribution. State is ONE string
    per key (the most recent non-conversion event type), carried across
    micro-batches; each conversion row is emitted immediately with the
    channel it credits (no prior touch ever → ``default``).

    Chunked replay equals batch replay because the carried state is
    exactly the fill-forward carry ("last non-conversion type") — the
    same argument as :func:`fill_forward_stream`. Same ordering
    contract as every per-key replay twin here: rows arrive key-ordered
    across micro-batches; within a batch the fold sorts on
    ``order_cols``. Output keeps the order columns so parity against
    the batch operator is exact per conversion row.
    """
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [df.schema[c] for c in order_cols]
        + [StructField(out_col, StringType())]
    )
    state_schema = StructType([StructField("last_touch", StringType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (cur,) = state.get if state.exists else (None,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            emitted: list[dict] = []
            for _, row in pdf.iterrows():
                t = row[type_col]
                if t != conversion_type:
                    if t is not None:
                        cur = t
                else:
                    rec = {k: kv for k, kv in zip(keys, key)}
                    for c in order:
                        rec[c] = row[c]
                    rec[out_col] = cur if cur is not None else default
                    emitted.append(rec)
            if emitted:
                yield pd.DataFrame(emitted, columns=keys + order + [out_col])
        state.update((cur,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def first_touch_attribution_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    type_col: str,
    conversion_type: str,
    out_col: str = "channel",
    default: str = "direct",
) -> DataFrame:
    """Streaming twin of the batch FIRST-touch attribution
    (__spark_entry__.events_first_touch_attribution's window carry) —
    state is ONE string per key, LATCHED at the key's earliest
    non-conversion event and never overwritten; every conversion row
    is emitted immediately with the channel that first acquired the
    user (no prior touch ever → ``default``). Chunked replay equals
    batch replay because a latch is order-insensitive once set — the
    same carry argument as :func:`last_touch_attribution_stream`, with
    the write-once direction flipped. Same ordering contract as every
    per-key replay twin here."""
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [df.schema[c] for c in order_cols]
        + [StructField(out_col, StringType())]
    )
    state_schema = StructType([StructField("first_touch", StringType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (cur,) = state.get if state.exists else (None,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            emitted: list[dict] = []
            for _, row in pdf.iterrows():
                t = row[type_col]
                if t != conversion_type:
                    if t is not None and cur is None:
                        cur = t
                else:
                    rec = {k: kv for k, kv in zip(keys, key)}
                    for c in order:
                        rec[c] = row[c]
                    rec[out_col] = cur if cur is not None else default
                    emitted.append(rec)
            if emitted:
                yield pd.DataFrame(emitted, columns=keys + order + [out_col])
        state.update((cur,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def transition_census_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    type_col: str,
) -> DataFrame:
    """Streaming twin of the Markov-chain transition NUMERATOR
    (events_markov_stationary's lag-pair aggregate): per key, emit
    (from_type, to_type, count) partials per micro-batch, with ONE
    string of state (the key's last seen type) carrying transitions
    across batch boundaries — the pair straddling two micro-batches is
    exactly what a stateless per-batch lag would drop. Partials are
    ADDITIVE, so the drained stream group-summed equals the batch lag
    pairs bit-for-bit (the Count-Min/PSI-census additive-merge
    pattern); the stationary power iteration is batch post-processing
    over the summed census either way. NULL types are skipped without
    breaking the chain (the carry survives a NULL row) — note the
    batch lag treats a NULL type as a value, so parity holds on
    NULL-free type columns (the events fixture's case); a NULL-bearing
    feed should filter first on both sides."""
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [
            StructField("from_t", StringType()),
            StructField("to_t", StringType()),
            StructField("cnt", LongType()),
        ]
    )
    state_schema = StructType([StructField("last_type", StringType())])
    keys = list(key_cols)
    order = list(order_cols)

    def fold(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (cur,) = state.get if state.exists else (None,)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            counts: dict[tuple[str, str], int] = {}
            for t in pdf[type_col]:
                if t is None:
                    continue
                if cur is not None:
                    pair = (cur, t)
                    counts[pair] = counts.get(pair, 0) + 1
                cur = t
            if counts:
                out = pd.DataFrame(
                    [
                        {**{k: kv for k, kv in zip(keys, key)},
                         "from_t": f, "to_t": t2, "cnt": c}
                        for (f, t2), c in counts.items()
                    ],
                    columns=keys + ["from_t", "to_t", "cnt"],
                )
                yield out
        state.update((cur,))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def conversion_paths_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    type_col: str,
    conversion_type: str,
    depth: int = 3,
    out_col: str = "path",
    default: str = "direct",
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.py:conversion_paths`` —
    on-ingest journey paths. State per key is a RING of the ``depth``
    most recent touch types (``depth`` strings — O(depth), not the
    unbounded history); each conversion row emits immediately with its
    '>'-joined path (oldest touch first), or ``default`` when the ring
    is empty.

    Chunked replay equals batch replay because the ring after any
    prefix of the key's history is a pure function of that prefix —
    the same carry argument as :func:`last_touch_attribution_stream`,
    generalized from one string to ``depth``. Output keeps the order
    columns so parity against the batch operator is exact per row.
    """
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [df.schema[c] for c in order_cols]
        + [StructField(out_col, StringType())]
    )
    state_schema = StructType(
        [StructField(f"t{i}", StringType()) for i in range(depth)]
    )
    keys = list(key_cols)
    order = list(order_cols)

    def fold(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ring = [t for t in (state.get if state.exists else ()) if t is not None]
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            emitted: list[dict] = []
            for _, row in pdf.iterrows():
                t = row[type_col]
                if t != conversion_type:
                    if t is not None:
                        ring = (ring + [t])[-depth:]
                else:
                    rec = {k: kv for k, kv in zip(keys, key)}
                    for c in order:
                        rec[c] = row[c]
                    rec[out_col] = ">".join(ring) if ring else default
                    emitted.append(rec)
            if emitted:
                yield pd.DataFrame(emitted, columns=keys + order + [out_col])
        padded = ring + [None] * (depth - len(ring))
        state.update(tuple(padded[:depth]))

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def funnel_stage_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    type_col: str,
    stages: Sequence[str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming funnel stage machine — the on-ingest face of the batch
    events_funnel_conversion semantics: per key, stage k is entered by
    the FIRST event of stage-k type at/after the stage-(k−1) entry
    (stage 0 by its first event, full stop). State is one epoch-micros
    BIGINT per stage; each micro-batch emits the key's CURRENT stage
    snapshot (one row per key per batch that touched it — take the last
    per key for the final funnel table). Events of a stage type that
    arrive before the prior stage's entry do NOT advance the machine
    (the batch contract: a click before the first view doesn't count),
    and chunked replay equals the one-shot fold because entries are
    first-hit latches over a total order."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    n_stages = len(stages)
    if n_stages < 2:
        raise ValueError("need at least two stages")
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [StructField(f"stage{i}_us", LongType()) for i in range(n_stages)]
        + [StructField("stage_reached", LongType())]
    )
    state_schema = StructType(
        [StructField(f"s{i}", LongType()) for i in range(n_stages)]
    )
    keys = list(key_cols)
    order = list(order_cols)
    stage_of = {s: i for i, s in enumerate(stages)}

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        st = [None] * n_stages
        if state.exists:
            st = [None if v is None else int(v) for v in state.get]
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order)
            for ts_us, etype in zip(pdf["_f_us"], pdf[type_col]):
                i = stage_of.get(etype)
                if i is None or pd.isna(ts_us):
                    # NULL order-timestamp → NULL _f_us; int(pd.NA)
                    # would raise and kill the stream (every other
                    # kernel in this file stages an explicit null
                    # mask). A stage event with no timestamp cannot
                    # order, so it is skipped.
                    continue
                t = int(ts_us)
                if i == 0:
                    if st[0] is None:
                        st[0] = t
                elif st[i] is None and st[i - 1] is not None and t >= st[i - 1]:
                    st[i] = t
            out = pd.DataFrame({k: [kv] for k, kv in zip(keys, key)})
            for i in range(n_stages):
                out[f"stage{i}_us"] = pd.array([st[i]], dtype="Int64")
            reached = 0
            for i in range(n_stages):
                if st[i] is not None:
                    reached = i + 1
            out["stage_reached"] = pd.array([reached], dtype="Int64")
            yield out
        state.update(tuple(st))

    if "_f_us" in df.columns:
        raise ValueError("input already has a _f_us column (reserved staging name)")
    staged = df.withColumn("_f_us", F.unix_micros(F.col(order[0]).cast("timestamp")))
    return staged.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def burst_rate_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_s: int = 60,
) -> DataFrame:
    """Streaming twin of the burst-rate anomaly screen
    (events_rate_anomaly): per key, the count of events inside the
    trailing ``window_s``-second window at each event, plus the
    running maximum — the live bot detector. State is the per-second
    count table WITHIN the trailing window (bounded: ≤ window_s
    entries per key) plus the running max; everything older than the
    newest second − (window_s − 1) is evicted on every fold, so state
    never grows with the stream.

    Matches the batch RANGE frame's peer semantics: rows sharing a
    truncated epoch second all see the count AFTER the whole second
    arrived (a RANGE frame includes peers). Like the other twins, the
    fold assumes per-batch order columns replay the stream in event
    order; NULL timestamps are skipped (NULL burst, carried max).
    Cross-batch out-of-order events are handled EXPLICITLY: the state
    carries the high-water second per key, and an event whose second
    is at or below it is emitted as late (NULL burst, carried max)
    instead of folding — a strictly-earlier second would sum
    already-seen FUTURE seconds into its trailing window, and a
    same-second boundary straddle would contradict that second's
    already-emitted peer rows. The folded sequence is strictly
    increasing; boundary-straddling seconds surface as late rows
    (conservative counts, never self-contradictory ones)."""
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [
            StructField("epoch_s", LongType()),
            StructField("burst", LongType()),
            StructField("max_burst", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("max_burst", LongType()),
            StructField("recent", StringType()),
            StructField("hwm", LongType()),
        ]
    )
    keys = list(key_cols)
    w = int(window_s)

    def fold(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            max_b, recent_csv, hwm = state.get
            max_b = int(max_b) if max_b is not None else 0
            hwm = int(hwm) if hwm is not None else None
            recent = (
                [tuple(int(x) for x in p.split(":")) for p in recent_csv.split(",")]
                if recent_csv
                else []
            )
        else:
            max_b, recent, hwm = 0, [], None
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("_b_s")
            secs, bursts, maxes = [], [], []
            # group contiguous runs of the same epoch second: peers see
            # the count after the full second arrived
            i, vals = 0, pdf["_b_s"].tolist()
            nulls = pdf["_b_n"].tolist()
            while i < len(vals):
                if bool(nulls[i]):
                    secs.append(None)
                    bursts.append(None)
                    maxes.append(max_b)
                    i += 1
                    continue
                t = int(vals[i])
                j = i
                while j < len(vals) and not bool(nulls[j]) and int(vals[j]) == t:
                    j += 1
                n_here = j - i
                if hwm is not None and t <= hwm:
                    # late arrival at or before the second state has
                    # already folded past. STRICTLY-earlier seconds
                    # would sum future seconds into their window;
                    # EQUAL seconds (a second split across micro-batch
                    # boundaries) would append a duplicate (t, c)
                    # entry whose rows contradict the already-emitted
                    # peers of that second (they saw a smaller count).
                    # Both are marked late (NULL burst, carried max):
                    # the folded second sequence stays strictly
                    # increasing, so every emitted burst honors the
                    # peers-see-the-whole-second contract — counts for
                    # boundary-straddling seconds are conservative by
                    # design rather than self-contradictory.
                    for _ in range(i, j):
                        secs.append(t)
                        bursts.append(None)
                        maxes.append(max_b)
                    i = j
                    continue
                hwm = t
                recent = [(s, c) for (s, c) in recent if s > t - w]
                recent.append((t, n_here))
                burst = sum(c for (_, c) in recent)
                max_b = max(max_b, burst)
                for _ in range(i, j):
                    secs.append(t)
                    bursts.append(burst)
                    maxes.append(max_b)
                i = j
            out = pd.DataFrame({k: [kv] * len(pdf) for k, kv in zip(keys, key)})
            out["epoch_s"] = pd.array(secs, dtype="Int64")
            out["burst"] = pd.array(bursts, dtype="Int64")
            out["max_burst"] = pd.array(maxes, dtype="Int64")
            yield out
        state.update(
            (max_b, ",".join(f"{s}:{c}" for (s, c) in recent), hwm)
        )

    from pyspark.sql import functions as F

    if "_b_s" in df.columns or "_b_n" in df.columns:
        raise ValueError("input already has a _b_s/_b_n column (reserved staging names)")
    staged = df.withColumn(
        "_b_s",
        F.coalesce(F.unix_timestamp(F.col(ts_col).cast("timestamp")), F.lit(0)),
    ).withColumn("_b_n", F.col(ts_col).isNull())
    return staged.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def session_entry_exit_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    type_col: str,
    gap: str = "30 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Gap-session ENTRY/EXIT tracker — session_close_stream's
    landing/exit-surface sibling (that one folds counts and sums; this
    carries the first and last event TYPE so the live system can feed
    the entry→exit matrix the batch side computes in
    events_session_entry_exit_matrix): per closed session,
    (key..., entry_type, exit_type).

    Same event-time-timeout contract as session_close_stream: a
    session closes by data (next event past gap) or by timer
    (watermark past last + gap), and open sessions are never emitted.
    First/last tracking orders by (ts, id) — the SAME total order the
    batch twin's two first_value windows use — so chunked replay
    equals batch replay even when a micro-batch splits a tie."""
    import datetime

    out_schema = StructType(
        _key_fields(df, key_cols)
        + [
            StructField("entry_type", StringType()),
            StructField("exit_type", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("entry_type", StringType()),
            StructField("exit_type", StringType()),
            StructField("first_ts", TimestampType()),
            StructField("first_id", LongType()),
            StructField("last_ts", TimestampType()),
            StructField("last_id", LongType()),
        ]
    )
    keys = list(key_cols)
    gap_ms = _duration_to_ms(gap)
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def fold(key, pdfs, state: GroupState):
        def emit(cur):
            out = pd.DataFrame({k: [kv] for k, kv in zip(keys, key)})
            out["entry_type"] = [cur[0]]
            out["exit_type"] = [cur[1]]
            return out

        if state.hasTimedOut:
            cur = list(state.get)
            state.remove()
            yield emit(cur)
            return

        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            # Defensive (r10 ADVICE): Spark shouldn't invoke a
            # non-timed-out key with only empty chunks, but if it ever
            # does, pd.concat([]) raises ValueError. Nothing to fold —
            # return without touching state; the state row (and any
            # event-time timer stored with it) persists unchanged.
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, id_col])
        cur = list(state.get) if state.exists else None
        for _, row in pdf.iterrows():
            ts = row[ts_col]
            eid = int(row[id_col])
            et = row[type_col]
            if cur is not None and (ts - cur[4]).total_seconds() * 1000 > gap_ms:
                yield emit(cur)
                cur = None
            if cur is None:
                cur = [et, et, ts, eid, ts, eid]
            else:
                # ties inside one batch are pre-sorted; across batches the
                # (ts, id) comparison keeps the earliest/latest winner
                if (ts, eid) < (cur[2], cur[3]):
                    cur[0], cur[2], cur[3] = et, ts, eid
                if (ts, eid) >= (cur[4], cur[5]):
                    cur[1], cur[4], cur[5] = et, ts, eid
        state.update(tuple(cur))
        last = cur[4]
        if last.tzinfo is None:
            last = last.tz_localize(session_tz)
        deadline = last + datetime.timedelta(milliseconds=gap_ms)
        deadline_ms = int(deadline.timestamp() * 1000)
        # same late-key clamp as session_close_stream: a deadline the
        # watermark already passed is a provably closed session — emit
        # now instead of throwing INVALID_TIMEOUT_TIMESTAMP
        if deadline_ms <= state.getCurrentWatermarkMs():
            state.remove()
            yield emit(cur)
            return
        state.setTimeoutTimestamp(deadline_ms)

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def feature_asof_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    type_col: str,
    value_col: str,
    label_type: str = "purchase",
) -> DataFrame:
    """Streaming twin of the batch events_feature_asof_snapshot — the
    ON-INGEST leak-free feature snapshot: per key the state is exactly
    the strictly-prior running (count, value-cents sum), and every
    label row is emitted the moment it arrives with the features AS OF
    that moment. Because the carried state IS the prefix aggregate,
    chunked replay equals batch replay (the fill-forward-carry
    argument); within a batch the fold sorts on (ts, id), the same
    total order as the batch window.

    Emits (key..., id, n_prior_events, prior_value_cents) per label
    row. NoTimeout state — the prefix aggregate for a departed key is
    two integers, the honest minimum."""
    out_schema = StructType(
        _key_fields(df, key_cols)
        + [
            StructField(id_col, LongType()),
            StructField("n_prior_events", LongType()),
            StructField("prior_value_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )
    keys = list(key_cols)

    def fold(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, id_col])
            emitted = []
            for _, row in pdf.iterrows():
                if row[type_col] == label_type:
                    emitted.append(
                        dict(
                            zip(keys, key),
                            **{
                                id_col: int(row[id_col]),
                                "n_prior_events": int(n),
                                "prior_value_cents": int(cents),
                            },
                        )
                    )
                n += 1
                # HALF_UP, not Python round()'s half-to-even: the batch
                # twin (events_feature_asof_snapshot) and its DuckDB
                # oracle both round half AWAY from zero (Spark F.round /
                # DuckDB round), so a value whose *100 lands exactly on
                # .5 must go up here too or bit-parity breaks (r10
                # ADVICE). math.floor(v*100+0.5) == HALF_UP for the
                # non-negative cent amounts this fold sees.
                cents += int(math.floor(float(row[value_col]) * 100 + 0.5))
            state.update((int(n), int(cents)))
            if emitted:
                yield pd.DataFrame(emitted)

    return df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
