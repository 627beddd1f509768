"""Plan-inspection helpers — make "the plan you'd want at 100×" a
regression test instead of an opinion (SURVEY.md §4.2).

The reference has no optimizer and nothing to inspect; on Spark the
physical plan IS the scale story, so tests assert on it: filters reach
the scan, small dims broadcast, no accidental cartesian products, and
whole-stage codegen covers the hot path.

All helpers work off the formatted explain string (public
``DataFrame.explain`` output), captured without printing.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "has_pushed_filters",
    "has_broadcast_hash_join",
    "has_cartesian_product",
    "has_sort_merge_join",
    "wholestage_codegen_count",
    "has_partial_aggregation",
    "scan_read_schema",
    "shuffle_exchange_count",
    "assert_no_cartesian",
    "assert_broadcast_join",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the scan node advertises pushed filters (optionally one
    mentioning ``fragment``, e.g. a column name)."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            if fragment is None or fragment in line:
                return True
    return False


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def has_cartesian_product(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees. Uses codegen explain mode:
    under AQE the formatted plan hides codegen markers until execution,
    so counting them there always returns 0 pre-run."""
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0


def has_partial_aggregation(df: DataFrame) -> bool:
    """True if the plan does map-side partial aggregation before the
    exchange (the skew-tolerant two-phase agg shape)."""
    plan = explain_str(df, "simple")
    return "partial_" in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines from file scans — verifies column pruning."""
    return [ln.strip() for ln in explain_str(df).splitlines() if "ReadSchema" in ln]


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the plan (broadcast
    exchanges excluded) — 0 means the query is a pure scan."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


def assert_no_cartesian(df: DataFrame) -> None:
    if has_cartesian_product(df):
        raise AssertionError("plan contains a cartesian/nested-loop join:\n" + explain_str(df))


def assert_broadcast_join(df: DataFrame) -> None:
    if not has_broadcast_hash_join(df):
        raise AssertionError("expected BroadcastHashJoin in plan:\n" + explain_str(df))
