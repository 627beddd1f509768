"""Round-13 composition pins: the live-warehouse supplier
(__spark_entry__._live_warehouse) and its two read rows.

The driver oracle already checks value parity against DuckDB
(q1_served_read_path shares the whole-lifecycle row's oracle;
warehouse_live_dashboard re-derives all three legs batch-side). These
tests pin what the oracle can't see: the memoized-supplier lifecycle
(build once per session+sf, reads reuse), the build/read billing split
(the read path touches no lineitem chunk rewrite), and the composition
invariants that tie the dashboard's freshness columns to the stores
they are read from rather than to batch recomputation.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse(spark):
    """Build (or reuse) the sf0.001 live warehouse once for the module."""
    return em._live_warehouse(spark, SF_DIR)


def test_read_path_equals_whole_lifecycle_row(spark, warehouse):
    """The IVM invariant across the billing split: the read-path row
    serves the SAME rows as the build-per-invocation companion — the
    store a consumer reads must not depend on who paid for the build."""
    a = sorted(map(tuple, em.q1_served_read_path(spark, SF_DIR).collect()))
    b = sorted(
        map(tuple, em.q1_served_from_maintained_rollup(spark, SF_DIR).collect())
    )
    assert a == b
    assert len(a) > 0


def test_warehouse_supplier_is_memoized(spark, warehouse):
    """Second call with the same (session, sf_dir) returns the SAME
    store paths — no rebuild (the bench read rows rely on this: the
    untimed pass builds, the timed passes only read)."""
    again = em._live_warehouse(spark, SF_DIR)
    assert again is warehouse
    assert em._WAREHOUSE_MEMO[SF_DIR][1] is warehouse


def test_dashboard_freshness_columns_tie_to_the_stores(spark, warehouse):
    """Every freshness column must equal what the MAINTAINED STORES
    say (not a batch recompute): as_of_version stamps the rollup
    store's last commit (3 chunk files => batch_id 2); n_events is the
    census total (all events except the globally-first, which has no
    prior frontier); emb_unindexed is exactly the corpus slice the IVF
    ingest never saw (vec_id > cutoff); the applied watermark is the
    census p99 — honestly 0 on this in-order corpus, where n_late is
    also 0."""
    rows = em.warehouse_live_dashboard(spark, SF_DIR).collect()
    assert len(rows) > 0

    n_events_total = em._t(spark, SF_DIR, "events").count()
    emb = em._t(spark, SF_DIR, "embeddings")
    unindexed = emb.filter(emb.vec_id > warehouse["cutoff"]).count()
    total = emb.count()

    for r in rows:
        assert r["as_of_version"] == 2
        assert r["n_events"] == n_events_total - 1
        assert r["n_late"] == 0
        assert r["wm_applied_s"] == warehouse["wm_applied_s"] == 0
        assert r["emb_total"] == total
        assert r["emb_unindexed"] == unindexed
        assert r["index_stale_micro"] == (unindexed * 1_000_000) // total

    # the q1 leg itself: group keys are unique across rows
    keys = [(r["l_returnflag"], r["l_linestatus"]) for r in rows]
    assert len(set(keys)) == len(keys)


def test_dashboard_q1_leg_matches_batch_q1(spark, warehouse):
    """IVM invariant through the composition: the dashboard's
    sum_disc_price / count_order per group are bit-identical to the
    one-shot batch aggregate over the same lineitem."""
    from pyspark.sql import functions as F

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_disc_price"], r["count_order"])
        for r in em.warehouse_live_dashboard(spark, SF_DIR).collect()
    }
    li = em._t(spark, SF_DIR, "lineitem")
    price = F.col("l_extendedprice").cast(em.DEC)
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_disc_price"], r["count_order"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(price * disc_f).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .collect()
    }
    assert got == want
