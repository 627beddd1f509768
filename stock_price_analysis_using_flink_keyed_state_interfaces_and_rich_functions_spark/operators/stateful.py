"""Batch forms of the reference's four keyed-state operators (SURVEY.md §2.4).

The reference builds each of these by hand inside a RichFlatMapFunction with
a managed-state primitive; here each is a declarative window/agg composition
that Catalyst plans (hash exchange on the key + per-partition sorted window
evaluation — the same single-shuffle topology the Flink jobs had, but
vectorized and codegen'd).

Ordering: the reference is arrival-order-defined and therefore
nondeterministic under parallel reads (SURVEY.md §3). Every operator here
takes explicit ``order_cols``; callers pass (event-time, unique-id) so
results are deterministic at any parallelism.

Scale notes (100 TB posture):
- All four are one hash exchange on the key followed by a per-key sorted
  window — the minimal shuffle count for keyed ordered state.
- WindowExec sorts within partitions; with millions of keys the sort is
  (key, order) over each shuffle partition — spillable, no driver state.
- A single hot key (the reference's single-ticker keyBy degenerates to
  parallelism 1) is fundamental to *running* semantics; for final
  (order-insensitive) aggregates we instead use groupBy, which does
  map-side partial aggregation and is skew-tolerant under AQE.

Streaming equivalents with exact per-row emission live in
``streaming/stateful.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "running_max",
    "running_max_segmented",
    "running_agg",
    "final_max",
    "segmented_row_number",
    "segmented_running_sum",
    "tumbling_count_window_avg",
    "rows_between_breaches",
    "ewma",
    "ewma_segmented",
    "next_higher_mark",
    "holt_linear_integer",
    "cusum_integer",
]

ColsLike = Sequence[str | Column]


def _ordered_window(key_cols: ColsLike, order_cols: ColsLike):
    return Window.partitionBy(*key_cols).orderBy(*order_cols)


def _key_names(key_cols: ColsLike, context: str) -> list[str]:
    """Extract plain column names, rejecting Column objects.

    ``str(Column)`` yields ``Column<'...'>`` which silently no-ops in
    ``withColumnRenamed`` / breaks ``select`` — so paths that need *names*
    (key_out renaming, emit-column fallbacks) require string keys.
    """
    names: list[str] = []
    for c in key_cols:
        if not isinstance(c, str):
            raise TypeError(
                f"{context} requires string key column names (got {type(c).__name__}); "
                "pass names, not Column expressions, when using key_out/emit fallbacks"
            )
        names.append(c)
    return names


def running_agg(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    agg: Column,
    out_col: str,
) -> DataFrame:
    """Generic running (prefix) aggregate per key — one output per input row.

    Generalizes the reference's ValueState pattern: state ← f(state, x),
    emit state on every element.
    """
    w = _ordered_window(key_cols, order_cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, agg.over(w))


def running_max(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    value_col: str,
    out_col: str = "running_max",
) -> DataFrame:
    """W1/W4 — running max per key, emitted on every row.

    Reference parity: ValueState running max
    (MaximumClosingPrice.java:47-82, key = year) and its MapState twin
    (MaxTradeVolumePerYearPerMonth.java:53-91, key = (year, month) — the
    MapState there holds at most one entry per key, i.e. ValueState in
    disguise; SURVEY.md §2.4 W4). Composite keys are just multiple columns.
    """
    return running_agg(df, key_cols, order_cols, F.max(value_col), out_col)


def running_max_segmented(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    value_col: str,
    segment_col: str,
    out_col: str = "running_max",
) -> DataFrame:
    """W1/W4 running max with the hot-key ceiling removed: a two-pass
    segmented prefix max whose parallelism is |keys| × |segments|
    instead of |keys|.

    The plain :func:`running_max` sorts each key's entire history in ONE
    task (the reference degenerates identically — its keyBy(year) runs
    each year through one subtask, MaximumClosingPrice.java:40-42). At
    100 TB with ~7 distinct years that is a 7-core plan. This form:

    1. *Local pass* — running max within each (key, segment) partition
       (parallelism = keys × segments, each sort bounded by one
       segment's rows).
    2. *Carry pass* — per-(key, segment) final max (map-side partial
       agg), then an EXCLUSIVE prefix max over segments within the key
       — a window over the tiny (key, segment) aggregate table, never
       the data.
    3. *Merge* — broadcast the carry table back and take
       ``greatest(local, carry)``; ``greatest`` skips NULLs, so a
       segment's all-NULL prefix inherits the carry and the first
       segment (NULL carry) keeps the local value — exactly the plain
       form's NULL semantics.

    PRECONDITION: ``segment_col`` must be non-decreasing along
    ``order_cols`` within each key (e.g. key=year, segment=month,
    order=(shipdate, …)). A segment column uncorrelated with the order
    silently computes a different (wrong) prefix — pick the segment
    FROM the leading order column.

    Bit-identical to :func:`running_max` on the same inputs (pinned by
    the ``w1_running_max_segmented`` oracle row, which shares the plain
    form's SQL).
    """
    keys = _key_names(key_cols, "running_max_segmented")
    local_w = Window.partitionBy(*keys, segment_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = df.withColumn("_local_max", F.max(value_col).over(local_w))
    seg_max = df.groupBy(*keys, segment_col).agg(F.max(value_col).alias("_seg_max"))
    carry_w = Window.partitionBy(*keys).orderBy(segment_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # |keys|×|segments| rows — an aggregate of the data, broadcastable by
    # construction (e.g. years×months over a century is ~1200 rows).
    carry = seg_max.select(
        *keys, segment_col, F.max("_seg_max").over(carry_w).alias("_carry")
    )
    return (
        local.join(F.broadcast(carry), [*keys, segment_col], "left")
        .withColumn(out_col, F.greatest("_local_max", "_carry"))
        .drop("_local_max", "_carry")
    )


def final_max(
    df: DataFrame,
    key_cols: ColsLike,
    value_col: str,
    out_col: str = "max_value",
) -> DataFrame:
    """Order-insensitive final per-key max — the end-of-stream view of W1/W4.

    groupBy gives partial (map-side) + final aggregation, so this scales to
    arbitrarily skewed keys, unlike the running variant.
    """
    return df.groupBy(*key_cols).agg(F.max(value_col).alias(out_col))


def segmented_row_number(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    segment_col: str,
    out_col: str = "_rn",
) -> DataFrame:
    """Per-key row_number (1-based) computed with |keys| × |segments|
    parallelism instead of |keys| — the numbering primitive behind the
    segmented W2/W3 forms.

    Plain ``row_number() OVER (PARTITION BY key ORDER BY ...)`` sorts
    each key's entire history in one task. This form: (1) local
    row_number within (key, segment); (2) per-(key, segment) row COUNTS
    (map-side partial agg) with an EXCLUSIVE prefix sum over segments —
    a window over the tiny aggregate table; (3) broadcast the offsets
    back and add. Same precondition as :func:`running_max_segmented`:
    ``segment_col`` must be non-decreasing along ``order_cols`` within
    each key. Bit-identical to the plain numbering (pinned by the
    segmented W2/W3 equivalence tests).
    """
    keys = _key_names(key_cols, "segmented_row_number")
    local_w = Window.partitionBy(*keys, segment_col).orderBy(*order_cols)
    counts = df.groupBy(*keys, segment_col).agg(F.count(F.lit(1)).alias("_seg_n"))
    carry_w = Window.partitionBy(*keys).orderBy(segment_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        *keys,
        segment_col,
        F.coalesce(F.sum("_seg_n").over(carry_w), F.lit(0)).alias("_seg_off"),
    )
    return (
        df.join(F.broadcast(offsets), [*keys, segment_col], "inner")
        .withColumn(out_col, F.row_number().over(local_w) + F.col("_seg_off"))
        .drop("_seg_off")
    )


def segmented_running_sum(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    segment_col: str,
    value_col: str,
    out_col: str = "_run",
) -> DataFrame:
    """Per-key running SUM computed with |keys| × |segments| parallelism
    instead of |keys| — the generalization of
    :func:`segmented_row_number` from counting 1s to summing an
    arbitrary (integer) column. The fix for low-cardinality running
    sums (e.g. a 3-value key would otherwise serialize a third of the
    table per task): (1) local running sum within (key, segment);
    (2) per-(key, segment) totals (map-side partial agg) with an
    EXCLUSIVE prefix sum over segments — a window over the tiny
    aggregate table; (3) broadcast the offsets back and add.

    Precondition (same as every segmented form): ``segment_col`` must be
    non-decreasing along ``order_cols`` within each key. Bit-identical
    to the plain running sum for integer values (integer addition is
    associative); float values would need the documented tolerance
    caveat that :func:`ewma_segmented` carries.
    """
    keys = _key_names(key_cols, "segmented_running_sum")
    local_w = (
        Window.partitionBy(*keys, segment_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = df.groupBy(*keys, segment_col).agg(F.sum(value_col).alias("_seg_sum"))
    carry_w = Window.partitionBy(*keys).orderBy(segment_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        *keys,
        segment_col,
        F.coalesce(F.sum("_seg_sum").over(carry_w), F.lit(0)).alias("_seg_off"),
    )
    return (
        df.join(F.broadcast(offsets), [*keys, segment_col], "inner")
        .withColumn(out_col, F.sum(value_col).over(local_w) + F.col("_seg_off"))
        .drop("_seg_off")
    )


def tumbling_count_window_avg(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    value_col: str,
    window_size: int = 50,
    *,
    key_out: Sequence[str] | None = None,
    out_col: str = "avg_value",
    cycle_col: str = "cycle",
    emit_incomplete: bool = False,
    segment_col: str | None = None,
) -> DataFrame:
    """W2 — average over non-overlapping count windows per key.

    Exact reference semantics (RollingAverageHighPrice.java:56-113):
    rows 1..N of a cycle accumulate; row N+1 *triggers* the emission of
    sum/N and is itself discarded — cycle length is ``window_size + 1``
    and the trigger row's value never enters any window (SURVEY.md §2.4
    W2; FIXTURES.md pins (HDFC, 352.888) first under file order).
    A window emits only when its TRIGGER row has arrived: a key with
    exactly ``window_size`` trailing rows has a full window's worth of
    data but no trigger, and the reference emits nothing for it — so
    the cycle must contain all ``window_size + 1`` rows (per-key
    emission count is floor(n / (window_size+1)), the property pinned
    in tests/test_properties.py). Incomplete trailing cycles emit
    nothing unless ``emit_incomplete``.

    Plan shape: row_number (shuffle on key + sort) → integer-div cycle id →
    groupBy(key, cycle) conditional avg over non-trigger rows. AQE
    coalesces the second exchange; at scale the first sort dominates, same
    cost class as any ordered per-key pass.

    ``segment_col`` lifts the per-key single-task numbering ceiling via
    :func:`segmented_row_number` (parallelism keys×segments; segment
    must be non-decreasing along ``order_cols`` within each key) —
    output is bit-identical to the plain form.
    """
    if window_size < 1:
        raise ValueError(f"window_size must be >= 1, got {window_size}")
    cycle_len = window_size + 1
    if segment_col is None:
        numbered = df.withColumn(
            "_rn0", F.row_number().over(_ordered_window(key_cols, order_cols)) - 1
        )
    else:
        numbered = segmented_row_number(df, key_cols, order_cols, segment_col).withColumn(
            "_rn0", F.col("_rn") - 1
        ).drop("_rn")
    rn = F.col("_rn0")
    with_cycle = (
        numbered.withColumn(cycle_col, F.floor(rn / cycle_len))
        .withColumn("_pos", rn % cycle_len)
        .drop("_rn0")
    )
    agged = with_cycle.groupBy(*key_cols, cycle_col).agg(
        F.avg(F.when(F.col("_pos") < window_size, F.col(value_col))).alias(out_col),
        F.count(F.lit(1)).alias("_n"),
    )
    if not emit_incomplete:
        agged = agged.filter(F.col("_n") == cycle_len)
    out = agged.drop("_n")
    if key_out:
        names = _key_names(key_cols, "tumbling_count_window_avg(key_out=...)")
        if len(key_out) != len(names):
            raise ValueError(
                f"key_out has {len(key_out)} names for {len(names)} key columns"
            )
        for old, new in zip(names, key_out):
            out = out.withColumnRenamed(old, new)
    return out


def rows_between_breaches(
    df: DataFrame,
    key_cols: ColsLike,
    order_cols: ColsLike,
    breach: Column,
    *,
    emit_cols: Sequence[str] | None = None,
    out_col: str = "rows_since_prev_breach",
    segment_col: str | None = None,
) -> DataFrame:
    """W3 — for each row satisfying ``breach``, the number of non-breach
    rows since the previous breach (marker-based sessionization).

    Exact reference semantics (DaysSincePriceThreshold.java:61-102,
    threshold hard-coded ≥300 at :71): non-breach rows accumulate in a
    ListState; a breach emits the list *length* and clears. Consecutive
    breaches emit 0; rows before the first breach count toward it.

    The ListState is over-retention — only its length is used
    (DaysSincePriceThreshold.java:73-79) — so the declarative form keeps a
    count, not a list: number the rows per key, keep breach rows, and the
    gap to the previous breach's row number (minus one) IS the emission.
    One window pass + one lag — no per-key list materialization, O(1)
    state per key at any scale.

    ``segment_col`` routes the numbering through
    :func:`segmented_row_number` (parallelism keys×segments instead of
    keys; same monotone-segment precondition). The lag still windows on
    the key alone, but only over BREACH rows — a small fraction of the
    data — so the numbering pass was the ceiling that mattered.
    """
    if segment_col is None:
        numbered = df.withColumn(
            "_rn", F.row_number().over(_ordered_window(key_cols, order_cols))
        ).withColumn("_breach", breach)
    else:
        numbered = segmented_row_number(df, key_cols, order_cols, segment_col).withColumn(
            "_breach", breach
        )
    breaches = numbered.filter(F.col("_breach"))
    prev_rn = F.lag("_rn", 1, 0).over(_ordered_window(key_cols, ["_rn"]))
    out = breaches.withColumn(out_col, (F.col("_rn") - prev_rn - 1).cast("long"))
    keep = list(emit_cols) if emit_cols else _key_names(key_cols, "rows_between_breaches emit fallback")
    return out.select(*keep, out_col)


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average — the classic
    exponential-decay keyed-state fold (y₀ = x₀; yₙ = (1−α)·yₙ₋₁ + α·xₙ,
    i.e. pandas ``ewm(alpha, adjust=False)``), one output row per input
    row. The natural fifth member of the reference's keyed-state family:
    like W1 it folds a single value of state per key along event order.

    Not a window-function composition: the recursion has no bounded
    frame, so this runs as ``applyInPandas`` with pandas' C kernel per
    key — one hash exchange, vectorized, Arrow-batched. Same hot-key
    caveat as every *running* form (a single key's history is inherently
    sequential; see the module scale notes).

    NULL semantics: ``ignore_na=True`` — NULLs never update the state;
    a NULL row emits the carried mean (NULL before the first valid
    value). This is the contract the streaming twin
    (``streaming/stateful.py:ewma_stream``) reproduces bit-exactly: the
    carried state is one float, so chunked replay equals batch replay.

    No DuckDB oracle: the float recursion is engine-order-defined and
    has no portable SQL form; correctness is pinned by pytest ground
    truths + batch↔stream parity instead (the documented rows-only
    verification tier).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql.types import DoubleType, StructField, StructType

    # names, not Columns: groupBy would accept Columns, but the pandas
    # sort needs string names and str(Column) is "Column<...>" garbage
    keys = _key_names(key_cols, "ewma")
    order = _key_names(order_cols, "ewma")
    # explicit NULLABLE output field — deriving the schema from a
    # lit(0.0) column would mark it non-nullable and crash Arrow reads
    # on the legitimate pre-first-valid NULLs.
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType(), True)])

    def _fold(pdf):
        import pandas as _pd  # noqa: F401 — closure ships by value

        pdf = pdf.sort_values(order)
        pdf[out_col] = (
            pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        )
        return pdf

    return df.groupBy(*keys).applyInPandas(_fold, schema=out_schema)


def ewma_integer(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha_pct: int = 20,
    out_col: str = "ewma_int",
) -> DataFrame:
    """ORACLE-EXACT integer EWMA — the PageRank precedent applied to the
    exponential-decay fold (r4 verdict item 8): state and inputs are
    BIGINTs (e.g. money in cents) and the recurrence is pure integer
    arithmetic::

        y_0 = x_0
        y_n = ((100 - alpha_pct)·y_{n-1} + alpha_pct·x_n) // 100

    Python ``//`` FLOORS toward −∞ while DuckDB ``//`` truncates toward
    zero — they agree only on non-negative operands — so the DuckDB
    oracle must replay the recurrence with an integer-safe floor
    (``(s - ((s % 100) + 100) % 100) // 100``: subtracting the positive
    remainder makes ``s`` an exact multiple of the divisor, making the
    truncation rule moot).  With that form the recurrence is portable
    even for negative state or inputs (refund cents), and integer
    addition is order-independent, so the unrolled recursive CTE
    hash-matches to the last unit — the
    float :func:`ewma` stays rows-only because ITS recursion
    reassociates IEEE ops, but the integer form closes the oracle gap.
    Quantization bias is bounded: each step floors once, so
    ``y_float - y_int < 1`` unit per step and the drift is bounded by
    the geometric decay (≤ (100/alpha_pct) units in steady state).

    Topology: one hash exchange (``repartition`` on the key) + in-
    partition sort, then ONE ``mapInPandas`` scan per partition with a
    per-key carry dict that survives Arrow-batch boundaries — NOT
    ``applyInPandas``: a one-pandas-call-per-group plan pays ~1 ms per
    group and measured ×4 super-linear on the 15 k-customer orders
    table (group count grows with data), while the partition scan is
    one Python pass total. Same hot-key caveat as every running form;
    note the integer recurrence is NOT affine-composable under
    flooring, so the segmented carry trick does not apply — shard by a
    coarser key instead.

    ``value_col`` must already be integral (cast upstream — e.g.
    DECIMAL(18,2)·100 cents); a float column here would reintroduce the
    exact problem this form removes, so non-integer dtypes raise.
    NULL handling: NULL never updates the state and emits the carried
    value (NULL before the first valid row) — same contract as
    :func:`ewma`.
    """
    if not 1 <= alpha_pct <= 100:
        raise ValueError(f"alpha_pct must be in [1, 100], got {alpha_pct}")
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    # Plan-time type gate: a float column here would reintroduce the
    # exact IEEE problem this form removes, so reject it BEFORE any
    # job runs (analysis-time, not a worker-side surprise).
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"ewma_integer needs an integer value column, got {vtype.simpleString()}"
        )

    keys = _key_names(key_cols, "ewma_integer")
    order = _key_names(order_cols, "ewma_integer")
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType(), True)])
    a = int(alpha_pct)
    vcol = value_col

    def _scan(batches):
        import pandas as _pd

        state: dict = {}  # key tuple -> carried y (partition-scoped)
        for pdf in batches:
            out = []
            kcols = [pdf[k] for k in keys]
            # Arrow hands a nullable int64 column to pandas as float64
            # (doubles above 2^53 silently lose cents!) — read through
            # an explicit null mask + non-null int64 view instead.
            xs = pdf["_xf"]
            nulls = pdf["_xn"]
            for i in range(len(pdf)):
                k = tuple(c.iloc[i] for c in kcols)
                y = state.get(k)
                if bool(nulls.iloc[i]):
                    out.append(y)
                    continue
                x = int(xs.iloc[i])
                y = x if y is None else ((100 - a) * y + a * x) // 100
                state[k] = y
                out.append(y)
            pdf[out_col] = _pd.array(out, dtype="Int64")
            yield pdf.drop(columns=["_xf", "_xn"])

    if "_xf" in df.columns or "_xn" in df.columns:
        raise ValueError("input already has a _xf/_xn column (reserved staging names)")
    staged = df.withColumn(
        "_xf", F.coalesce(F.col(value_col).cast("long"), F.lit(0).cast("long"))
    ).withColumn("_xn", F.col(value_col).isNull())
    rep = staged.repartition(*keys).sortWithinPartitions(*(keys + order))
    return rep.mapInPandas(_scan, schema=out_schema)


def ewma_segmented(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    segment_col: str,
    out_col: str = "ewma",
) -> DataFrame:
    """Segment-carry EWMA — the hot-key fix for :func:`ewma`, same shape
    as the other segmented forms (W1's broadcast carry, W2/W3's
    segmented numbering): parallelism |keys| × |segments| instead of
    |keys|, so a single hot key no longer serializes its whole history
    through one pandas group.

    The EWMA update ``y = (1−α)·y + α·x`` is AFFINE in the incoming
    state, so a whole segment composes to ``y_out = A·y_in + B`` with
    ``A = (1−α)^{n_valid}`` — per-segment folds are associative and a
    tiny per-(key, segment) carry table reconstructs every boundary
    state exactly. Three passes:

    1. per-(key, segment) pandas fold (Arrow-batched, C kernels)
       emitting per-row ``e`` (segment-local EWMA, y₀ = x₀ — the
       no-prior branch), ``w = (1−α)^{v}`` (decay of a carry-in across
       the ``v`` valid rows so far) and ``z`` (fold from state 0 —
       computed as ewm over the series with a virtual leading 0);
    2. per-segment last-row aggregates (map-side ``max_by``) → per-key
       sequential fold over the ORDERED SEGMENTS ONLY (a
       |keys|×|segments| table, broadcastable by construction) giving
       each segment its carry-in state;
    3. broadcast join back; final value is pure column arithmetic:
       ``carry IS NULL → e`` (this segment saw the key's first valid
       value) else ``w·carry + z``.

    Precondition: ``segment_col`` non-decreasing along ``order_cols``
    within each key (same as every segmented form).

    Float caveat (the honest price): regrouping the recursion as
    ``w·carry + z`` reassociates float adds/multiplies, so results can
    differ from :func:`ewma` in the last ulps — NOT bit-identical, and
    therefore pinned by a relative-tolerance property test
    (``tests/test_properties.py``) rather than a shared SQL oracle.
    Integer-snapping at output (e.g. round to cents) restores exact
    agreement for presentation columns. NULL semantics are unchanged:
    NULLs never update state; a NULL row emits the carried mean (NULL
    before the key's first valid value).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql.types import DoubleType, StructField, StructType

    keys = _key_names(key_cols, "ewma_segmented")
    order = _key_names(order_cols, "ewma_segmented")

    pass1_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("_e", DoubleType(), True),
            StructField("_w", DoubleType(), True),
            StructField("_z", DoubleType(), True),
        ]
    )

    def _local(pdf):
        import numpy as _np
        import pandas as _pd

        pdf = pdf.sort_values(order)
        s = pdf[value_col].astype("float64")
        pdf["_e"] = s.ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        # z: the same fold but from state 0 — prepend a virtual 0 row so
        # pandas' y₀=x₀ seeding lands on 0, then every real row applies
        # the plain (1−α)y+αx update; drop the virtual row after.
        z = (
            _pd.concat([_pd.Series([0.0]), s], ignore_index=True)
            .ewm(alpha=alpha, adjust=False, ignore_na=True)
            .mean()
            .iloc[1:]
            .to_numpy()
        )
        pdf["_z"] = z
        v = s.notna().cumsum().to_numpy(dtype="float64")
        pdf["_w"] = _np.power(1.0 - alpha, v)
        return pdf

    local = df.groupBy(*keys, segment_col).applyInPandas(_local, schema=pass1_schema)
    # Per-row _z/_w are NaN-free (z carries 0.0 / w is a power), but _e
    # is NULL before the first valid row — carried through Arrow as null.

    last_order = F.struct(*[F.col(c) for c in order])
    seg_agg = local.groupBy(*keys, segment_col).agg(
        F.max_by("_w", last_order).alias("_A"),
        F.max_by("_z", last_order).alias("_Z"),
        F.max_by("_e", last_order).alias("_E"),
        F.sum(F.when(F.col(value_col).isNotNull(), 1).otherwise(0)).alias("_n_valid"),
    )

    carry_schema = StructType(
        [seg_agg.schema[k] for k in keys]
        + [seg_agg.schema[segment_col], StructField("_carry", DoubleType(), True)]
    )

    def _carry_fold(pdf):
        import pandas as _pd  # noqa: F401

        pdf = pdf.sort_values(segment_col)
        y = None
        carries = []
        for a, z, e, n in zip(pdf["_A"], pdf["_Z"], pdf["_E"], pdf["_n_valid"]):
            carries.append(y)
            if y is None:
                if n > 0:
                    y = e  # segment held the key's first valid value
            else:
                y = a * y + z  # n == 0 ⇒ a == 1, z == 0 ⇒ y unchanged
        pdf["_carry"] = carries
        return pdf[[*keys, segment_col, "_carry"]]

    carry = seg_agg.groupBy(*keys).applyInPandas(_carry_fold, schema=carry_schema)

    out = (
        local.join(F.broadcast(carry), [*keys, segment_col], "left")
        .withColumn(
            out_col,
            F.when(F.col("_carry").isNull(), F.col("_e")).otherwise(
                F.col("_w") * F.col("_carry") + F.col("_z")
            ),
        )
        .drop("_e", "_w", "_z", "_carry")
    )
    return out


def next_higher_mark(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "next_higher_ord",
) -> DataFrame:
    """For every row, the order-mark of the FIRST later row in the same
    key with a STRICTLY greater value; NULL if no such row ever comes —
    the "days until a higher price" / next-greater-element primitive.

    This is the one classic per-key fold a window function canNOT
    express: the answer is neither a running aggregate (it looks
    forward) nor frame-boundable (the resolver can be arbitrarily far
    ahead), and the relational form is a quadratic correlated subquery
    (which stays our ORACLE at gate scale). The monotonic-stack
    algorithm is linear: scan rows in key-order; a stack holds the
    still-unresolved rows in strictly decreasing value order; each new
    row resolves (pops) every stack entry with a smaller value, then
    pushes itself. Every row is pushed and popped at most once.

    Topology: identical to :func:`ewma_integer` — one hash exchange on
    the key + in-partition sort, ONE ``mapInPandas`` scan per partition
    with the stack carried across Arrow-batch boundaries (emission may
    land in a later batch than arrival; resolved rows stream out as
    they resolve, survivors flush with NULL at end-of-key). Stack depth
    is bounded by the key's longest strictly-decreasing run — worst
    case one key's full history (the same per-key-fits-in-memory
    contract every per-key fold here carries).

    PROJECTION-FIRST CONTRACT: the output contains exactly
    ``key_cols + [order_col, value_col, out_col]`` (emission re-orders
    rows, so arbitrary payload passthrough would force a buffered copy
    of every column; join payload back on the key+order instead).
    ``order_col`` must be integral and unique per key; ``value_col``
    integral or double. NULL values resolve nothing, stack nothing,
    and emit NULL.
    """
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        StructField,
        StructType,
    )

    keys = _key_names(key_cols, "next_higher_mark")
    int_types = (ByteType, ShortType, IntegerType, LongType)
    if not isinstance(df.schema[order_col].dataType, int_types):
        raise TypeError("next_higher_mark needs an integral order column")
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, int_types + (DoubleType,)):
        raise TypeError(
            f"next_higher_mark needs an integer/double value column, got {vtype.simpleString()}"
        )
    cols = keys + [order_col, value_col]
    proj = df.select(*cols)
    out_schema = StructType(
        [proj.schema[c] for c in cols] + [StructField(out_col, LongType(), True)]
    )

    def _dtype(sf):
        if isinstance(sf.dataType, int_types):
            return "Int64"
        if isinstance(sf.dataType, DoubleType):
            return "float64"
        if isinstance(sf.dataType, StringType):
            return "object"
        raise TypeError(f"unsupported column type {sf.dataType.simpleString()}")

    dtypes = {sf.name: _dtype(sf) for sf in out_schema.fields[:-1]}
    val_is_float = isinstance(vtype, DoubleType)

    # Same Arrow hazard as ewma_integer: a nullable int64 column lands
    # in pandas as float64 (ints above 2^53 silently corrupt) — stage
    # an explicit null mask + zero-coalesced value instead. NaN doubles
    # ride the mask too (treated as NULL; the engines disagree on NaN
    # ordering, so letting one into the comparisons would diverge).
    if "_nh_vf" in proj.columns or "_nh_vn" in proj.columns:
        raise ValueError("input already has a _nh_vf/_nh_vn column (reserved)")
    vexpr = F.col(value_col) if val_is_float else F.col(value_col).cast("long")
    zero = F.lit(0.0) if val_is_float else F.lit(0).cast("long")
    staged = proj.withColumn("_nh_vf", F.coalesce(vexpr, zero)).withColumn(
        "_nh_vn", F.col(value_col).isNull() | F.isnan(vexpr.cast("double"))
    )

    def _scan(batches):
        import pandas as _pd

        cur = None  # current key tuple
        stack: list = []  # (ord, value, key_tuple) strictly decreasing by value

        def _mk(rows):
            data = {}
            for j, c in enumerate(cols):
                data[c] = _pd.array([r[j] for r in rows], dtype=dtypes[c])
            data[out_col] = _pd.array([r[-1] for r in rows], dtype="Int64")
            return _pd.DataFrame(data)

        for pdf in batches:
            out_rows = []
            kcols = [pdf[k] for k in keys]
            ords = pdf[order_col]
            vals = pdf["_nh_vf"]
            nulls = pdf["_nh_vn"]
            for i in range(len(pdf)):
                k = tuple(c.iloc[i] for c in kcols)
                if k != cur:
                    out_rows.extend(
                        (*sk, so, sv, None) for (so, sv, sk) in stack
                    )
                    stack.clear()
                    cur = k
                if bool(nulls.iloc[i]):
                    out_rows.append((*k, int(ords.iloc[i]), None, None))
                    continue
                o = int(ords.iloc[i])
                v = float(vals.iloc[i]) if val_is_float else int(vals.iloc[i])
                while stack and stack[-1][1] < v:
                    so, sv, sk = stack.pop()
                    out_rows.append((*sk, so, sv, o))
                stack.append((o, v, k))
            if out_rows:
                yield _mk(out_rows)
        if stack:
            yield _mk([(*sk, so, sv, None) for (so, sv, sk) in stack])

    rep = staged.repartition(*keys).sortWithinPartitions(*(keys + [order_col]))
    return rep.mapInPandas(_scan, schema=out_schema)


def holt_linear_integer(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha_pct: int = 20,
    beta_pct: int = 10,
    level_col: str = "level_int",
    trend_col: str = "trend_int",
) -> DataFrame:
    """ORACLE-EXACT integer Holt double-exponential smoothing — the
    two-state extension of :func:`ewma_integer` (level + linear trend,
    Holt 1957), same integer-portability scheme::

        L_0 = x_0                       T_0 = 0
        L_n = (a·x_n + (100-a)·(L+T)) fdiv 100
        T_n = (b·(L_n - L) + (100-b)·T) fdiv 100

    where ``fdiv`` is the floor division both engines can replay: the
    Python fold uses ``//`` (floors), and the DuckDB recursive-CTE
    oracle subtracts the positive remainder first so its
    truncate-toward-zero ``//`` becomes exact — trend terms go
    NEGATIVE on any downswing, so unlike a strictly-positive EWMA this
    operator exercises the negative-floor path as a matter of course
    (the r5 advisor's divergence class, here by construction not by
    accident).

    Level tracks the smoothed value; trend the smoothed per-step
    delta — the forecasting primitive ("price is rising ~T cents per
    order"). Same topology and contracts as ewma_integer: one hash
    exchange + in-partition sort + one mapInPandas scan, per-key carry
    across Arrow batches, integral value column enforced at plan time,
    NULLs emit the carried state without updating it.
    """
    if not 1 <= alpha_pct <= 100 or not 0 <= beta_pct <= 100:
        raise ValueError("alpha_pct in [1,100], beta_pct in [0,100] required")
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"holt_linear_integer needs an integer value column, got {vtype.simpleString()}"
        )
    keys = _key_names(key_cols, "holt_linear_integer")
    order = _key_names(order_cols, "holt_linear_integer")
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(level_col, LongType(), True), StructField(trend_col, LongType(), True)]
    )
    a = int(alpha_pct)
    b = int(beta_pct)

    def _scan(batches):
        import pandas as _pd

        state: dict = {}  # key -> (L, T)
        for pdf in batches:
            lv, tv = [], []
            kcols = [pdf[k] for k in keys]
            xs = pdf["_hx"]
            nulls = pdf["_hn"]
            for i in range(len(pdf)):
                k = tuple(c.iloc[i] for c in kcols)
                st = state.get(k)
                if bool(nulls.iloc[i]):
                    lv.append(st[0] if st else None)
                    tv.append(st[1] if st else None)
                    continue
                x = int(xs.iloc[i])
                if st is None:
                    st = (x, 0)
                else:
                    L, T = st
                    L2 = (a * x + (100 - a) * (L + T)) // 100
                    T2 = (b * (L2 - L) + (100 - b) * T) // 100
                    st = (L2, T2)
                state[k] = st
                lv.append(st[0])
                tv.append(st[1])
            pdf[level_col] = _pd.array(lv, dtype="Int64")
            pdf[trend_col] = _pd.array(tv, dtype="Int64")
            yield pdf.drop(columns=["_hx", "_hn"])

    if "_hx" in df.columns or "_hn" in df.columns:
        raise ValueError("input already has a _hx/_hn column (reserved staging names)")
    staged = df.withColumn(
        "_hx", F.coalesce(F.col(value_col).cast("long"), F.lit(0).cast("long"))
    ).withColumn("_hn", F.col(value_col).isNull())
    rep = staged.repartition(*keys).sortWithinPartitions(*(keys + order))
    return rep.mapInPandas(_scan, schema=out_schema)


def holt_winters_integer(
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
    """ORACLE-EXACT integer Holt–Winters additive triple smoothing —
    the three-state top of the smoothing ladder (ewma_integer →
    holt_linear_integer → this): level + linear trend + a ``period``-
    slot additive seasonal ring, all BIGINT, every step pure integer
    floor division so the DuckDB recursive-CTE oracle replays it to
    the unit. With i = n mod period (n counts non-NULL values per
    key)::

        n = 0:  L = x, T = 0, S[*] = 0
        n > 0:  L' = (a·(x − S[i]) + (100−a)·(L+T))  fdiv 100
                T' = (b·(L' − L) + (100−b)·T)        fdiv 100
                S[i]' = (g·(x − L') + (100−g)·S[i])  fdiv 100

    Seasonals start at ZERO (no moving-average bootstrap): the gamma
    recurrence converges them within a few periods, every emitted row
    is still deterministic from step one, and the oracle needs no
    special-cased init block. Emitted per row: the updated level,
    trend, and THIS slot's updated seasonal. NULL values emit the
    carried (L, T) with a NULL seasonal and do not advance n (the
    holt_linear_integer NULL contract).

    fdiv portability: Python ``//`` floors; the oracle subtracts the
    positive remainder before DuckDB's truncating ``//`` — load-
    bearing on every downswing (trend) and on every below-level value
    (seasonal deltas go negative by construction).

    Topology: identical to holt_linear_integer — one hash exchange +
    in-partition sort + ONE mapInPandas scan with a per-key carry that
    survives Arrow batches. State is 2 + ``period`` BIGINTs per key.
    """
    if not 1 <= alpha_pct <= 100:
        raise ValueError(f"alpha_pct in [1,100] required, got {alpha_pct}")
    if not 0 <= beta_pct <= 100 or not 0 <= gamma_pct <= 100:
        raise ValueError("beta_pct and gamma_pct in [0,100] required")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"holt_winters_integer needs an integer value column, got {vtype.simpleString()}"
        )
    keys = _key_names(key_cols, "holt_winters_integer")
    order = _key_names(order_cols, "holt_winters_integer")
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(level_col, LongType(), True),
            StructField(trend_col, LongType(), True),
            StructField(season_col, LongType(), True),
        ]
    )
    a, b, g, m = int(alpha_pct), int(beta_pct), int(gamma_pct), int(period)

    def _scan(batches):
        import pandas as _pd

        state: dict = {}  # key -> [L, T, [S_0..S_{m-1}], n]
        for pdf in batches:
            lv, tv, sv = [], [], []
            kcols = [pdf[k] for k in keys]
            xs = pdf["_hx"]
            nulls = pdf["_hn"]
            for i in range(len(pdf)):
                k = tuple(c.iloc[i] for c in kcols)
                st = state.get(k)
                if bool(nulls.iloc[i]):
                    lv.append(st[0] if st else None)
                    tv.append(st[1] if st else None)
                    sv.append(None)
                    continue
                x = int(xs.iloc[i])
                if st is None:
                    st = [x, 0, [0] * m, 1]
                    lv.append(x)
                    tv.append(0)
                    sv.append(0)
                    state[k] = st
                    continue
                L, T, S, n = st
                idx = n % m
                L2 = (a * (x - S[idx]) + (100 - a) * (L + T)) // 100
                T2 = (b * (L2 - L) + (100 - b) * T) // 100
                S[idx] = (g * (x - L2) + (100 - g) * S[idx]) // 100
                st[0], st[1], st[3] = L2, T2, n + 1
                lv.append(L2)
                tv.append(T2)
                sv.append(S[idx])
            pdf[level_col] = _pd.array(lv, dtype="Int64")
            pdf[trend_col] = _pd.array(tv, dtype="Int64")
            pdf[season_col] = _pd.array(sv, dtype="Int64")
            yield pdf.drop(columns=["_hx", "_hn"])

    if "_hx" in df.columns or "_hn" in df.columns:
        raise ValueError("input already has a _hx/_hn column (reserved staging names)")
    staged = df.withColumn(
        "_hx", F.coalesce(F.col(value_col).cast("long"), F.lit(0).cast("long"))
    ).withColumn("_hn", F.col(value_col).isNull())
    rep = staged.repartition(*keys).sortWithinPartitions(*(keys + order))
    return rep.mapInPandas(_scan, schema=out_schema)


def cusum_integer(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    target_col: str,
    slack: int = 0,
    out_col: str = "cusum_int",
) -> DataFrame:
    """ORACLE-EXACT one-sided integer CUSUM (Page 1954) per key::

        S_0 = max(0, x_0 - target - slack)
        S_n = max(0, S_{n-1} + x_n - target - slack)

    The change-point primitive: S accumulates upward deviations from
    ``target_col`` (per-row, e.g. a per-key baseline joined upstream)
    and the zero-clamp forgets history whenever the process is on
    target — an alarm fires downstream wherever S crosses a threshold.

    Unlike EWMA/Holt this fold is NOT affine (max-with-zero), so no
    segmented carry exists even in principle — but it IS pure integer
    arithmetic, so the recursive-CTE oracle replays it exactly
    (greatest(0, …) is engine-identical; no division, so not even the
    floor scheme is needed). Same topology and contracts as
    :func:`ewma_integer`: one exchange + in-partition sort + one
    mapInPandas scan with per-key carry; integral value/target columns
    enforced at plan time; NULL values emit the carried S unchanged.
    """
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    int_types = (ByteType, ShortType, IntegerType, LongType)
    for c in (value_col, target_col):
        if not isinstance(df.schema[c].dataType, int_types):
            raise TypeError(
                f"cusum_integer needs integer columns, got {c}: "
                f"{df.schema[c].dataType.simpleString()}"
            )
    keys = _key_names(key_cols, "cusum_integer")
    order = _key_names(order_cols, "cusum_integer")
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), True)]
    )
    k = int(slack)

    def _scan(batches):
        import pandas as _pd

        state: dict = {}
        for pdf in batches:
            out = []
            kcols = [pdf[c] for c in keys]
            xs = pdf["_cx"]
            ts = pdf["_ct"]
            nulls = pdf["_cn"]
            for i in range(len(pdf)):
                key = tuple(c.iloc[i] for c in kcols)
                s = state.get(key)
                if bool(nulls.iloc[i]):
                    out.append(s)
                    continue
                s = max(0, (s or 0) + int(xs.iloc[i]) - int(ts.iloc[i]) - k)
                state[key] = s
                out.append(s)
            pdf[out_col] = _pd.array(out, dtype="Int64")
            yield pdf.drop(columns=["_cx", "_ct", "_cn"])

    for reserved in ("_cx", "_ct", "_cn"):
        if reserved in df.columns:
            raise ValueError(f"input already has a {reserved} column (reserved)")
    staged = (
        df.withColumn("_cx", F.coalesce(F.col(value_col).cast("long"), F.lit(0).cast("long")))
        .withColumn("_ct", F.coalesce(F.col(target_col).cast("long"), F.lit(0).cast("long")))
        .withColumn("_cn", F.col(value_col).isNull() | F.col(target_col).isNull())
    )
    rep = staged.repartition(*keys).sortWithinPartitions(*(keys + order))
    return rep.mapInPandas(_scan, schema=out_schema)
