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


def test_first_50_queries_are_the_curated_check_window():
    """The driver correctness harness checks the FIRST 50 queries()
    entries. Pin the curation: EVERY top-50 entry oracle'd (no check
    slot spent on a rows-only query — the deliberately rows-only
    sketches live past the window), so a careless registry edit can't
    silently push a family out of the checked window."""
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    window = q[:50]
    missing = [n for n in window if n not in o]
    assert missing == [], missing
    # representatives of every family are inside the window
    for required in (
        "w1_running_max_segmented", "join_salted_skew", "window_time_tumbling_events",
        "multimodal_payload_meta", "sample_train_val_test", "functions_math_ops",
        "sql_shipping_priority", "llm_pipeline_clean_corpus", "udf_registered_cents",
        "udf_grouped_zscore", "text_contamination", "dedup_minhash_verified",
        "similarity_ivf_full_probe", "similarity_lsh_recall", "pack_concat_chunks",
        "join_interval_overlap_activity", "sample_temperature_mix",
        "llm_pipeline_curated_corpus",
    ):
        assert required in window, f"{required} fell out of the 50-entry check window"
