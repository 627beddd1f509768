"""Scale-trend measurement: run a subset of headline queries at every
available scale factor and report the sf0.01→sf0.1 time ratio next to
the 10× data ratio — empirical backing for SCALE.md's "would this
survive 100×" analysis. A query whose time grows ~linearly (ratio ≲
10, usually far less at local[32] where small SFs are overhead-bound)
is scan/shuffle-dominated as designed; a super-linear ratio flags a
quadratic candidate step or a driver-side bottleneck.

Usage::

    python tools/scale_trend.py [query ...]   # default: the trend set

Prints one markdown table row per query; paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# One representative per scale-relevant family: scan-agg, window,
# shuffle join, LSH dedup, similarity, packing, sketch.
TREND_SET = [
    "q1_pricing_summary",
    "w1_running_max_price",
    "join_orders_customer",
    "window_running_distinct_suppliers",
    "dedup_minhash_lsh",
    "text_contamination",
    "similarity_lsh_topk",
    "pack_concat_chunks",
    "text_heavy_hitter_tokens",
    "events_ohlc_hourly",
    # round-4 later batch
    "sample_global_shuffle",
    "graph_pagerank_dupgraph",
    "layout_zorder_keys",
    "text_scrub_blocklist",
    "similarity_hard_negatives",
]


def _run(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).count()  # warm plan/codegen for this shape
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    names = sys.argv[1:] or TREND_SET
    spark = get_spark("scale-trend")
    queries = entrymod.queries()
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.01→0.1 ratio (data ×10) |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = queries[name]
        times = [_run(fn, spark, d) for d in SF_DIRS]
        ratio = times[2] / times[1] if times[1] > 0 else float("nan")
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| ×{ratio:.1f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
