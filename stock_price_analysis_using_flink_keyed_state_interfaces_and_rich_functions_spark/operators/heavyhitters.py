"""Heavy hitters (approximate top-k) via distributed Misra–Gries with
an exact-confirm tier — the sketch path for top-k over key spaces too
large to groupBy in full (URL/token/entity frequency over a 100 TB
corpus), verified the same way this engine verifies MinHash and IVF:
the approximate structure only PROPOSES, an exact pass CONFIRMS, and
the result must match the plain-SQL oracle or the guard raises.

Scale shape: the raw key stream is NEVER shuffled. Pass 1 builds one
Misra–Gries summary per partition inside ``mapInPandas`` (state carried
across a partition's Arrow batches in the generator closure), emitting
at most ``capacity`` (key, weight) rows per partition. The summaries
merge with one tiny groupBy (≤ capacity × partitions rows). Pass 2
re-counts ONLY the candidate keys exactly — a broadcast semi-join
filter before the count, so the shuffle carries candidate keys only.

Correctness contract: merged MG summaries retain every key with true
frequency > n/capacity (additive-undercount ≤ n/capacity per the
standard merge bound — Agarwal et al., "Mergeable Summaries", PODS'12).
The exact recount then restores true counts, so the top-k is EXACT
whenever the k-th true count exceeds n/capacity. ``verified=True``
enforces that premise at runtime (one tiny scalar action) and raises
instead of silently returning a possibly-incomplete top-k — the same
honesty standard as the Bloom shingle budget and IVF full-probe tiers.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mg_partition_summaries",
    "heavy_hitters_topk",
    "hll_rho",
    "hll_registers",
    "hll_estimate",
    "HLL_M",
]


def mg_partition_summaries(
    keyed: DataFrame, key_col: str, capacity: int, with_partition_totals: bool = False
) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ ``capacity`` (key, weight)
    rows per partition, weight undercounting the partition-true count by
    at most (partition rows)/capacity. Arrow-batched; the counter dict
    lives in the generator closure so state spans all of a partition's
    batches. ``with_partition_totals`` appends one NULL-key sentinel row
    per partition carrying the partition's TRUE row count, so callers
    needing n (the verified top-k certificate) get it from this same
    single scan instead of a second pass over the raw data."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def _mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        rows_seen = 0
        for pdf in batches:
            rows_seen += len(pdf)
            for key, cnt in pdf[key_col].value_counts().items():
                cnt = int(cnt)
                if key in counters:
                    counters[key] += cnt
                elif len(counters) < capacity:
                    counters[key] = cnt
                else:
                    # decrement-all by the largest amount that still
                    # empties a slot (batch-vectorized MG: min counter
                    # vs incoming count)
                    dec = min(cnt, min(counters.values()))
                    counters = {k: v - dec for k, v in counters.items() if v > dec}
                    if cnt > dec:
                        counters[key] = cnt - dec
        keys = list(counters.keys())
        weights = list(counters.values())
        if with_partition_totals:
            keys.append(None)
            weights.append(rows_seen)
        if keys:
            yield pd.DataFrame({key_col: keys, "_w": weights})

    field = keyed.schema[key_col]
    return keyed.select(key_col).mapInPandas(
        _mg, schema=f"{key_col} {field.dataType.simpleString()}, _w long"
    )


def heavy_hitters_topk(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int,
    *,
    count_col: str = "n",
    verified: bool = True,
) -> DataFrame:
    """Exact top-k keys by frequency through the MG-candidates +
    exact-recount pipeline. Returns (key, n) ordered (n DESC, key ASC)
    — deterministic, oracle-comparable against plain
    ``GROUP BY / ORDER BY / LIMIT k``.

    ``verified=True`` (default) asserts the exactness premise — the
    k-th confirmed count must exceed n/capacity — with one tiny action
    over the candidate counts, raising ``RuntimeError`` when the sketch
    capacity was too small for this k (undersized sketches lose tail
    candidates SILENTLY otherwise; this engine refuses to guess).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = df.select(key_col).filter(F.col(key_col).isNotNull())
    # Two raw-data scans TOTAL — the MG+confirm minimum: scan 1 builds
    # summaries AND per-partition true counts (NULL-key sentinels); the
    # tiny summary table is checkpointed so n_total / candidates / the
    # caller's action never re-derive it. Scan 2 is the exact recount,
    # also checkpointed so the verify collect and the returned top-k
    # share one execution.
    summaries = mg_partition_summaries(
        keyed, key_col, capacity, with_partition_totals=True
    ).localCheckpoint(eager=False)
    candidates = summaries.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.sum("_w").alias("_w_merged")
    )
    # Exact recount of candidates only: broadcast the candidate set (≤
    # capacity × partitions keys by construction) as a semi-join filter,
    # then a partial-agg count — the shuffle carries candidate keys only.
    exact = (
        keyed.join(F.broadcast(candidates.select(key_col)), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias(count_col))
    )
    if verified:
        exact = exact.localCheckpoint(eager=False)
    topk = exact.orderBy(F.desc(count_col), F.asc(key_col)).limit(k)
    if verified:
        # Premise check: n/capacity must be below the k-th count. Both
        # scalars are tiny aggregates over the checkpointed summaries.
        n_total = (
            summaries.filter(F.col(key_col).isNull()).agg(F.sum("_w")).collect()[0][0]
        ) or 0
        kth_rows = topk.collect()
        if len(kth_rows) < k:
            # fewer confirmed candidates than k: a sub-threshold key the
            # sketch dropped could still deserve a slot — refuse rather
            # than return a silently short/incomplete top-k.
            raise RuntimeError(
                f"heavy_hitters_topk: only {len(kth_rows)} candidates for "
                f"top-{k}; raise capacity or lower k"
            )
        if kth_rows[-1][count_col] * capacity <= n_total:
            raise RuntimeError(
                f"heavy_hitters_topk: capacity {capacity} cannot certify "
                f"top-{k} (kth count {kth_rows[-1][count_col]} ≤ "
                f"n/capacity = {n_total / capacity:.1f}); raise capacity"
            )
    return topk


# ---------------------------------------------------------------- HLL
# Portable HyperLogLog with EXPLICIT registers — unlike the built-in
# approx_count_distinct (whose HLL++ internals the oracle can only pin
# as measured constants), every step here is engine-replayable: md5
# hash, modulo register index, leading-zero rank via bin()-string
# length, register max-merge, and an estimate whose only float is ONE
# fixed-order expression over an exact BIGINT sum (each register
# contributes 2^(53-rho) exactly; 512 registers x 2^53 < 2^63).

HLL_M = 512  # registers (p=9); alpha below is the standard constant
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_WBITS = 51  # 60-bit md5 prefix minus 9 register bits


def hll_rho(value: Column) -> tuple[Column, Column]:
    """(register index, rho) for a value: 60-bit md5 prefix; low 9 bits
    pick the register, rho = leading-zero count of the remaining
    51 bits + 1 (bin() strips leading zeros in both engines, so rho =
    52 - length(bin(w)); all-zero suffix ⇒ rho = 52)."""
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast("long")
    reg = (h % HLL_M).cast("long")
    # shiftright, NOT h/512: float division would round 60-bit hashes
    # above 2^53 and corrupt the register suffix
    w = F.shiftright(h, 9).cast("long")
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    ).cast("long")
    return reg, rho


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    reg_col: str = "reg",
    rho_col: str = "rho",
) -> DataFrame:
    """Per-group HLL register table: (keys..., reg, max rho). Register
    max-merge is order- and partitioning-insensitive, and two groups'
    registers UNION into their merged sketch with another max — the
    mergeable-summary property that makes sketches worth their error
    at 100 TB (daily registers roll up to weekly/monthly without
    touching the raw data again)."""
    reg, rho = hll_rho(F.col(value_col))
    return (
        df.select(*key_cols, reg.alias(reg_col), rho.alias(rho_col))
        .groupBy(*key_cols, reg_col)
        .agg(F.max(rho_col).alias(rho_col))
    )


def hll_estimate(
    regs: DataFrame,
    key_cols: list[str],
    reg_col: str = "reg",
    rho_col: str = "rho",
    out_col: str = "est_distinct",
) -> DataFrame:
    """HLL estimate per group from a (possibly merged) register table.
    Missing registers count as rho=0. S = Σ 2^(53−rho) is an EXACT
    BIGINT sum; the raw estimate α·m²·2^53/S and the small-range
    linear-counting branch (E ≤ 2.5m and V>0 ⇒ m·ln(m/V)) are each one
    fixed-order double expression — both engines take the same branch
    on the same exact integers. Rounded to BIGINT."""
    agg = regs.groupBy(*key_cols).agg(
        # F.shiftleft takes a Python-int bit count; the per-row shift
        # needs the SQL form
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(53 - {rho_col} AS INT))"))
        .cast("long")
        .alias("_s_hit"),
        F.count(F.lit(1)).cast("long").alias("_n_regs"),
    )
    m = F.lit(HLL_M).cast("long")
    # registers never seen in the group: rho=0 => term 2^53 each
    s = (F.col("_s_hit") + (m - F.col("_n_regs")) * F.lit(1 << 53).cast("long")).cast(
        "long"
    )
    v = (m - F.col("_n_regs")).cast("long")  # data rho >= 1, so unseen == zero-reg
    raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*key_cols, F.round(est).cast("long").alias(out_col))
