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

__all__ = ["mg_partition_summaries", "heavy_hitters_topk"]


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
