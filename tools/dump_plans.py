"""Dump `.explain("formatted")` output for named queries to files —
the before/after plan evidence required by the optimization rounds.

Usage::

    python tools/dump_plans.py <out_dir> <suffix> q1,q2,...   [sf_dir]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query. Plans are captured
at sf0.001 by default (plan SHAPE is scale-invariant for these queries;
AQE's runtime choices differ, which explain() shows as
``isFinalPlan=false`` either way).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    out_dir, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"
    names = [n.strip() for n in names_csv.split(",") if n.strip()]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
