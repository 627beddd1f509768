"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and the
matching ``oracle_sql()`` on DuckDB over the same sf parquet tables, then
compares row count, schema (column names), and a canonical value hash
(columns sorted by name, rows sorted, floats as repr).

Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import (  # noqa: E402
    get_spark,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\0NULL"
    if isinstance(v, float):
        return repr(v)  # repr round-trips doubles exactly, inf included
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest()


def _sf_of(sf_dir: str) -> float | None:
    """Scale factor encoded in the dir name (sf0.01 -> 0.01), or None."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    try:
        return float(m.group(1)) if m else None
    except ValueError:
        return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sf = _sf_of(sf_dir)
    unknown = only - set(entrymod.queries())
    if unknown:
        # a typo'd name would otherwise run ZERO checks and exit green
        print(f"FAIL unknown query names: {sorted(unknown)}")
        print(json.dumps({"n": 0, "failed": sorted(unknown)}))
        return 1

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"], s_cols, s_hash = canon_hash(sdf)
            rec["spark_sec"] = round(time.time() - t0, 2)
        except Exception:
            rec["spark_error"] = traceback.format_exc().strip().splitlines()[-1]
            results[name] = rec
            failed.append(name)
            print(f"FAIL {name}: spark error: {rec['spark_error']}")
            continue
        sql = oracles.get(name)
        # Pinned-literal oracles hold at one scale only (PINNED_ORACLE_SF,
        # the machine-readable registry): at any other scale the pin is a
        # guaranteed false mismatch, so downgrade to a rows-only check.
        pinned_sf = getattr(entrymod, "PINNED_ORACLE_SF", {}).get(name)
        if sql is not None and pinned_sf is not None and sf != pinned_sf:
            rec["oracle"] = f"pinned_at_sf{pinned_sf}_skipped"
            sql = None
        if sql is None:
            rec.setdefault("oracle", "rows_only")
            rec["ok"] = rec["spark_rows"] > 0  # 0 rows = broken filter/join, not a pass
            results[name] = rec
            if rec["ok"]:
                print(f"ok   {name}: {rec['oracle']} ({rec['spark_rows']} rows, {rec['spark_sec']}s)")
            else:
                failed.append(name)
                print(f"FAIL {name}: rows-only returned 0 rows")
            continue
        try:
            odf = con.execute(sql).fetchdf()
            rec["oracle_rows"], o_cols, o_hash = canon_hash(odf)
        except Exception:
            rec["oracle_error"] = traceback.format_exc().strip().splitlines()[-1]
            results[name] = rec
            failed.append(name)
            print(f"FAIL {name}: oracle error: {rec['oracle_error']}")
            continue
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = s_cols == o_cols
        rec["hash_match"] = s_hash == o_hash
        rec["ok"] = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        results[name] = rec
        if rec["ok"]:
            print(f"ok   {name} ({rec['spark_rows']} rows, {rec['spark_sec']}s)")
        else:
            failed.append(name)
            print(
                f"FAIL {name}: rows {rec['spark_rows']}/{rec['oracle_rows']} "
                f"schema_match={rec['schema_match']} hash_match={rec['hash_match']}"
            )
            if not rec["schema_match"]:
                print(f"     spark cols:  {s_cols}")
                print(f"     oracle cols: {o_cols}")
            elif os.environ.get("CHECK_DIFF"):
                s_rows = sorted(
                    tuple(_canon_cell(v) for v in r)
                    for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None)
                )
                o_rows = sorted(
                    tuple(_canon_cell(v) for v in r)
                    for r in odf[sorted(odf.columns)].itertuples(index=False, name=None)
                )
                o_set, s_set = set(o_rows), set(s_rows)
                s_only = [r for r in s_rows if r not in o_set][:5]
                o_only = [r for r in o_rows if r not in s_set][:5]
                print(f"     cols: {s_cols}")
                for r in s_only:
                    print(f"     spark-only:  {r}")
                for r in o_only:
                    print(f"     oracle-only: {r}")

    print(json.dumps({"n": len(results), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
