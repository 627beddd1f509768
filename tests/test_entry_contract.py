"""Driver-contract smoke: every ``queries()`` entry must ANALYZE against the
real parquet tables.

Unit tests build their inputs with ``createDataFrame``, which gives
TIMESTAMP (ltz) columns — but the driver reads parquet where ``events.ts``
is TIMESTAMP_NTZ (and raw ``events.parquet`` is TIMESTAMP(NANOS)). A query
can pass every unit test and still throw AnalysisException on the driver's
tables (exactly what happened to ``sessionize_by_gap``'s bigint cast).

Forcing ``df.schema`` runs the full analyzer against the real files, so
this covers the whole contract quickly. (Not strictly job-free: a few
operators collect a small driver-side model — the IVF codebook, the Bloom
benchmark side — and lazy localCheckpoints materialize on first action.)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from tests.conftest import SF_DIR


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_analyzes_on_real_parquet(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0


def test_oracles_have_matching_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert not set(o) - set(q), "oracle_sql() keys must be a subset of queries()"


def test_entry_runs(spark):
    out = entrymod.entry(spark)
    assert out.count() >= 0
