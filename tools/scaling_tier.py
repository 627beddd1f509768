"""Heavy-row parallel-scaling tier (round 14, VERDICT r13 item #1).

At sf0.1 every bench row sits within ~2x of the orchestration floor
(~175 ms/action), so the driver's low-core/high-core ratios read ~1.0
and `suspect_cpus_ignored` cannot be settled by the sf0.1 bench. This
tool makes scaling measurable: it builds a LARGER corpus (default 10x
sf0.1 ~ sf1) by replicating the relational tables with per-replica
KEY SHIFTS (so joins/groupBys scale linearly instead of colliding on
duplicated keys), then runs a fixed set of heavy join/agg/window rows
through bench.py's OWN fresh-JVM SPARK_GRAFT_ONLY protocol (double
warm-up, median-of-3) at two core counts and reports sec/ratio per
row plus the parallelism echo from each run's summary line.

Row selection deliberately EXCLUDES the text/similarity families:
replicated documents are exact duplicates, which turns near-dup
candidate generation quadratic in the replica count — a data-shape
artifact, not a scaling signal. The relational tables key-shift
cleanly (dimension tables nation/region stay single-copy; every
replicated fact/bridge key moves by replica_idx * STRIDE, preserving
join cardinalities per replica).

This writes a TEMP dataset under --work (deleted afterwards unless
--keep) and a committed JSON report; no store or result derived from
/root/testdata persists across runs.

Usage::

    python tools/scaling_tier.py [--factor 10] [--cpus 32,8]
        [--out plans/r14/SCALING.json] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Heavy rows whose shapes are join/agg/window over the relational
# tables (scale linearly under key-shifted replication).
ROWS = [
    "q1_pricing_summary",
    "sql_shipping_priority",
    "sql_waiting_suppliers",
    "w2_count_window_avg",
    "orders_sequential_lift",
    "part_reorder_point_table",
    "agg_spearman_price_qty",
    "events_peak_concurrency_daily",
    "customer_tier_migration",
    "agg_psi_price_drift",
    "graph_kcore_copurchase",
    "events_session_duration_percentiles",
]

# (table, [key columns shifted per replica]); nation/region are
# dimensions every replica shares — single copy, no shift.
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
SINGLE = ["region", "nation", "documents", "embeddings"]
STRIDE = 10**10  # far above any sf0.1 key domain; 10 replicas stay < 2^63


def build_corpus(factor: int, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import (
        get_spark,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_table,
    )

    spark = get_spark("scaling_tier_build")
    os.makedirs(dst, exist_ok=True)
    for name in SINGLE:
        read_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
    for name, keys in SHIFTED.items():
        base = read_table(spark, src, name)
        parts = []
        for i in range(factor):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * STRIDE).cast("long"))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
    spark.stop()


def run_tier(sf_dir: str, cpus: int, rows: list[str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = ",".join(rows)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.pop("SPARK_GRAFT_SPLIT", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=7200,
    )
    secs: dict = {}
    meta: dict = {}
    for line in proc.stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        if "query" in row and "sec" in row:
            secs[row["query"]] = row["sec"]
        elif row.get("metric") == "isolated_subset_total":
            meta = {
                "parallelism": row.get("parallelism"),
                "master": row.get("master"),
            }
    if not secs:
        raise SystemExit(
            f"tier run at cpus={cpus} produced no rows; stderr tail:\n"
            + proc.stderr[-2000:]
        )
    return {"secs": secs, **meta}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", default="32,8")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/scale_tier")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r14", "SCALING.json"))
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--rows", default=",".join(ROWS))
    args = ap.parse_args()

    rows = [r for r in args.rows.split(",") if r]
    # dir name carries an sfN tag so bench.py's sf regex parses it
    sf_eff = 0.1 * args.factor
    dst = os.path.join(args.work, f"sf{sf_eff:g}")
    try:
        print(f"[tier] building {args.factor}x corpus at {dst}", flush=True)
        build_corpus(args.factor, args.src, dst)
        results = {}
        for cpus in [int(c) for c in args.cpus.split(",")]:
            print(f"[tier] running {len(rows)} rows at cpus={cpus}", flush=True)
            results[str(cpus)] = run_tier(dst, cpus, rows)
        cpu_list = sorted((int(c) for c in results), reverse=True)
        hi, lo = str(cpu_list[0]), str(cpu_list[-1])
        report = {
            "factor": args.factor,
            "sf_effective": sf_eff,
            "src": args.src,
            "protocol": "bench.py SPARK_GRAFT_ONLY fresh-JVM, double warm-up, median-of-3",
            "cpus": {c: {"parallelism": results[c].get("parallelism"),
                         "master": results[c].get("master")} for c in results},
            "rows": {
                name: {
                    f"sec_{hi}": results[hi]["secs"].get(name),
                    f"sec_{lo}": results[lo]["secs"].get(name),
                    "ratio_low_over_high": (
                        round(results[lo]["secs"][name] / results[hi]["secs"][name], 3)
                        if results[hi]["secs"].get(name) and results[lo]["secs"].get(name)
                        else None
                    ),
                }
                for name in rows
            },
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(json.dumps(report["rows"], indent=1))
        print(f"[tier] wrote {args.out}", flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(args.work, ignore_errors=True)


if __name__ == "__main__":
    main()
