"""Direct tests for the relational operator families (joins, top-k,
set ops, rollup/cube/pivot, window analytics) on small handcrafted
inputs with hand-computed expectations, plus physical-plan assertions
via ``plans`` — the "would this survive 100×" checks as regressions.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark import plans
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
    anti_join,
    asof_join,
    broadcast_join,
    cube_agg,
    dedup_keep_first,
    equi_join,
    except_all,
    except_distinct,
    intersect,
    pivot_conditional,
    range_join_bucketed,
    rollup_agg,
    semi_join,
    sessionize_by_gap,
    top_k_per_group,
    top_n,
    union_all,
    union_distinct,
    with_lag_lead,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 5.0), (5, "c", 7.0)],
        "id int, grp string, val double",
    )


# ---------------------------------------------------------------- joins

def test_equi_and_broadcast_join(spark, people):
    dims = spark.createDataFrame([("a", "alpha"), ("b", "beta")], "grp string, name string")
    out = equi_join(people, dims, ["grp"], "inner")
    assert out.count() == 4
    bout = broadcast_join(people, dims, ["grp"])
    assert sorted(r["name"] for r in bout.collect()) == ["alpha", "alpha", "beta", "beta"]
    plans.assert_broadcast_join(bout)


def test_semi_anti_join(spark, people):
    dims = spark.createDataFrame([("a",), ("c",)], "grp string")
    assert sorted(r["id"] for r in semi_join(people, dims, ["grp"]).collect()) == [1, 2, 5]
    assert sorted(r["id"] for r in anti_join(people, dims, ["grp"]).collect()) == [3, 4]


def test_asof_join_backward_forward(spark):
    trades = spark.createDataFrame(
        [("x", 10, 1), ("x", 25, 2), ("y", 5, 3)], "sym string, ts long, trade_id int"
    )
    quotes = spark.createDataFrame(
        [("x", 5, 1.0), ("x", 10, 2.0), ("x", 20, 3.0), ("y", 9, 9.0)],
        "sym string, ts long, px double",
    )
    back = asof_join(trades, quotes, ["sym"], "ts", ["px"], "backward")
    got = {r["trade_id"]: r["px"] for r in back.collect()}
    # exact-ts match taken; y@5 has no quote at-or-before → NULL
    assert got == {1: 2.0, 2: 3.0, 3: None}
    fwd = asof_join(trades, quotes, ["sym"], "ts", ["px"], "forward")
    got_f = {r["trade_id"]: r["px"] for r in fwd.collect()}
    assert got_f == {1: 2.0, 2: None, 3: 9.0}


def test_asof_join_collision_raises(spark):
    left = spark.createDataFrame([(1, 10, 5.0)], "k int, ts int, v double")
    right = spark.createDataFrame([(1, 9, 7.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", ["v"])


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join results — only the key distribution."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        salted_join,
    )

    skewed = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 0)], "k string, i int"
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, tag string")
    plain = {(r["k"], r["i"], r["tag"]) for r in skewed.join(dim, "k").collect()}
    salted = {(r["k"], r["i"], r["tag"]) for r in salted_join(skewed, dim, ["k"], num_salts=4).collect()}
    assert salted == plain and len(salted) == 51


def test_bucketed_table_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join without an Exchange
    on either side (the storage-level co-location contract)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        write_bucketed_table,
    )

    import shutil

    a = spark.range(1000).withColumnRenamed("id", "k").withColumn("va", F.col("k") * 2)
    b = spark.range(1000).withColumnRenamed("id", "k").withColumn("vb", F.col("k") + 1)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    try:
        for t in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        write_bucketed_table(a, "bkt_a", ["k"], 4, sort_cols=["k"])
        write_bucketed_table(b, "bkt_b", ["k"], 4, sort_cols=["k"])
        # disable broadcast so the bucketing (not the small size) is what
        # eliminates the exchange in the sort-merge join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        p = plans.explain_str(joined, "simple")
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_table_keyed_window_no_exchange(spark, tmp_path):
    """W1-shaped running max over a table bucketed on the window key
    needs NO shuffle at all: the scan's hash distribution satisfies the
    window's requirement. This is the recurring-stateful-query story at
    100 TB — bucket once, every later W1–W4 run is shuffle-free."""
    import shutil

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        running_max,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        write_bucketed_table,
    )

    df = spark.range(2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("seq"), (F.col("id") % 131).alias("v")
    )
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    try:
        spark.sql("DROP TABLE IF EXISTS bkt_quotes")
        shutil.rmtree(os.path.join(warehouse, "bkt_quotes"), ignore_errors=True)
        write_bucketed_table(df, "bkt_quotes", ["k"], 4, sort_cols=["k", "seq"])
        out = running_max(spark.table("bkt_quotes"), ["k"], ["seq"], "v", "run_max")
        p = plans.explain_str(out, "simple")
        assert "Window" in p and "Exchange" not in p, p
        # spot-check semantics survive the storage path
        got = {(r["k"], r["seq"]): r["run_max"] for r in out.collect()}
        assert got[(0, 0)] == 0 and got[(0, 7)] == 7 and got[(0, 1960)] == 130
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_quotes")


def test_range_join_bucketed(spark):
    vals = spark.createDataFrame([(1, 3.0), (2, 7.5), (3, 15.0)], "id int, v double")
    bands = spark.createDataFrame(
        [(10, 0.0, 5.0), (20, 5.0, 10.0), (30, 10.0, 10.0)],  # third is degenerate
        "band int, lo double, hi double",
    )
    out = range_join_bucketed(vals, bands, "v", "lo", "hi", bucket_width=5.0)
    got = {(r["id"], r["band"]) for r in out.collect()}
    assert got == {(1, 10), (2, 20)}  # 15.0 matches nothing; degenerate band matches nothing
    plans.assert_no_cartesian(out)


def test_range_join_interval_spanning_buckets(spark):
    vals = spark.createDataFrame([(1, 0.5), (2, 9.5), (3, 12.0)], "id int, v double")
    wide = spark.createDataFrame([(1, 0.0, 10.0)], "band int, lo double, hi double")
    out = range_join_bucketed(vals, wide, "v", "lo", "hi", bucket_width=2.0)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_range_join_rejects_nonpositive_bucket_width(spark):
    vals = spark.createDataFrame([(1, 0.5)], "id int, v double")
    wide = spark.createDataFrame([(1, 0.0, 10.0)], "band int, lo double, hi double")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join_bucketed(vals, wide, "v", "lo", "hi", bucket_width=0.0)


# ---------------------------------------------------------- topk / setops

def test_top_n_and_per_group(spark, people):
    top = top_n(people, [F.col("val").desc()], 2)
    assert [r["id"] for r in top.collect()] == [3, 2]
    assert "TakeOrderedAndProject" in plans.explain_str(top)

    per = top_k_per_group(people, ["grp"], [F.col("val").desc(), F.col("id").asc()], 1)
    got = {(r["grp"], r["id"]) for r in per.collect()}
    assert got == {("a", 2), ("b", 3), ("c", 5)}


def test_setops(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "v int")
    b = spark.createDataFrame([(1,), (3,), (4,)], "v int")
    assert union_all(a, b).count() == 7
    assert sorted(r["v"] for r in union_distinct(a, b).collect()) == [1, 2, 3, 4]
    assert sorted(r["v"] for r in intersect(a, b).collect()) == [1, 3]
    # EXCEPT ALL keeps the surviving duplicate of 1; EXCEPT DISTINCT drops it
    assert sorted(r["v"] for r in except_all(a, b).collect()) == [1, 2]
    assert sorted(r["v"] for r in except_distinct(a, b).collect()) == [2]


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("j", 9, "z")],
        "grp string, ord int, tag string",
    )
    out = dedup_keep_first(df, ["grp"], [F.col("ord").asc()])
    got = {(r["grp"], r["tag"]) for r in out.collect()}
    assert got == {("k", "a"), ("j", "z")}


# ------------------------------------------------- rollup / cube / pivot

def test_rollup_cube_pivot(spark, people):
    roll = rollup_agg(people, ["grp"], [F.count(F.lit(1)).alias("n")])
    rows = {(r["grp"], r["n"]) for r in roll.collect()}
    assert rows == {("a", 2), ("b", 2), ("c", 1), (None, 5)}

    cube = cube_agg(people, ["grp"], [F.count(F.lit(1)).alias("n")])
    assert cube.count() == 4  # same as rollup for one dim

    piv = pivot_conditional(people, ["grp"], "id", [1, 2], F.col("val"))
    r = {row["grp"]: (row["id_1"], row["id_2"]) for row in piv.collect()}
    assert r["a"] == (10.0, 20.0)
    assert r["b"] == (0.0, 0.0) or r["b"] == (None, None)  # no id 1/2 in grp b


# -------------------------------------------------------------- windows

def test_with_lag_lead(spark, people):
    out = with_lag_lead(people, ["grp"], [F.col("id").asc()], "val")
    row = {r["id"]: (r["prev_value"], r["next_value"]) for r in out.collect()}
    assert row[1] == (None, 20.0)
    assert row[2] == (10.0, None)
    assert row[5] == (None, None)


def test_sessionize_by_gap(spark):
    ev = spark.createDataFrame(
        [(1, "u", 0), (2, "u", 100), (3, "u", 5000), (4, "v", 0)],
        "eid int, user string, sec long",
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    out = sessionize_by_gap(ev, ["user"], "ts", 3600, "session_id")
    got = {r["eid"]: r["session_id"] for r in out.collect()}
    assert got[1] == got[2] == 1
    assert got[3] == 2
    assert got[4] == 1


def test_unpivot_longform_roundtrip(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        unpivot_longform,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark import plans

    df = spark.createDataFrame(
        [(1, 10.0, 0.5), (2, 20.0, 1.5)], "id long, a double, b double"
    )
    out = unpivot_longform(df, ["id"], ["a", "b"])
    rows = {(r["id"], r["metric"]): r["value"] for r in out.collect()}
    assert rows == {(1, "a"): 10.0, (1, "b"): 0.5, (2, "a"): 20.0, (2, "b"): 1.5}
    # single Expand, no shuffle
    s = plans.explain_str(out)
    assert "Expand" in s and "Exchange" not in s


def test_asof_join_carries_genuine_null_values(spark):
    """A right row whose VALUE is NULL is still the as-of row — the join
    must carry its NULL (and all columns from that same row), never leak
    a stale older value or mix columns across right rows."""
    left = spark.createDataFrame([("x", 25)], "k string, ts long")
    right = spark.createDataFrame(
        [("x", 10, 2.0, 7.0), ("x", 20, None, 5.0)], "k string, ts long, px double, sz double"
    )
    row = asof_join(left, right, ["k"], "ts", ["px", "sz"]).first()
    assert row["px"] is None and row["sz"] == 5.0  # both from the ts=20 row


def test_salted_join_rejects_right_outer(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        salted_join,
    )

    a = spark.createDataFrame([("k", 1)], "k string, i int")
    b = spark.createDataFrame([("k", "x")], "k string, t string")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(a, b, ["k"], num_salts=4, how="right")


def test_pivot_conditional_fill_applied_once_per_empty_cell(spark, people):
    """A non-zero fill lands ONCE per empty cell (coalesce over the
    conditional sum), never once per non-matching row — fill=5 on grp b
    (two rows, neither id 1 nor 2... ids 3,4 don't match pivot values)
    must give exactly 5, not 10."""
    piv = pivot_conditional(people, ["grp"], "id", [1, 2], F.col("val"), fill=F.lit(5.0))
    r = {row["grp"]: (row["id_1"], row["id_2"]) for row in piv.collect()}
    assert r["a"] == (10.0, 20.0)       # matched cells keep their sums
    assert r["b"] == (5.0, 5.0)         # empty cells: fill exactly once
    assert r["c"] == (5.0, 5.0)


def test_running_max_segmented_equals_plain(spark):
    """Two-pass segmented prefix max is bit-identical to the plain
    windowed form — including NULL handling (leading NULLs stay NULL,
    an all-NULL segment inherits the carry)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        running_max,
        running_max_segmented,
    )

    rows = []
    vals = [None, None, 3.0, 1.0, None, 7.0, 2.0, None, 9.0, 4.0, 8.0, None]
    for k in ("a", "b"):
        for i, v in enumerate(vals):
            rows.append((k, i, i // 3, v if k == "a" else (None if v is None else v * 2)))
    df = spark.createDataFrame(rows, "k string, seq int, seg int, v double")
    plain = {
        (r["k"], r["seq"]): r["rm"]
        for r in running_max(df, ["k"], ["seq"], "v", "rm").collect()
    }
    seg = {
        (r["k"], r["seq"]): r["rm"]
        for r in running_max_segmented(df, ["k"], ["seq"], "v", "seg", "rm").collect()
    }
    assert seg == plain
    # leading all-NULL prefix really is NULL in both
    assert plain[("a", 0)] is None and seg[("a", 1)] is None


def test_running_max_segmented_plan_shape(spark):
    """The local pass partitions on (key, segment) — parallelism =
    keys×segments — and the carry merge is a broadcast join, never a
    shuffled join of the data against the carry table."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        running_max_segmented,
    )

    df = spark.createDataFrame(
        [("a", i, i // 4, float(i % 7)) for i in range(32)],
        "k string, seq int, seg int, v double",
    )
    out = running_max_segmented(df, ["k"], ["seq"], "v", "seg", "rm")
    s = plans.explain_str(out)
    assert plans.has_broadcast_hash_join(out)
    plans.assert_no_cartesian(out)
    # the data-side window partitions by BOTH key and segment
    assert any(
        "k#" in line and "seg#" in line
        for line in s.splitlines()
        if "windowspecdefinition" in line
    ), s


def test_segmented_row_number_and_w2_w3_equivalence(spark):
    """segmented_row_number is bit-identical to the plain per-key
    numbering, and the W2/W3 forms built on it emit identical results."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        rows_between_breaches,
        segmented_row_number,
        tumbling_count_window_avg,
    )
    from pyspark.sql import Window

    rows = [
        (k, i, i // 7, float((i * 37 + ord(k)) % 101))
        for k in ("a", "b")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k string, seq int, seg int, v double")

    plain_rn = {
        (r["k"], r["seq"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy("seq"))
        ).collect()
    }
    seg_rn = {
        (r["k"], r["seq"]): r["_rn"]
        for r in segmented_row_number(df, ["k"], ["seq"], "seg").collect()
    }
    assert seg_rn == plain_rn

    w2_plain = sorted(
        (r["k"], r["cycle"], r["avg_value"])
        for r in tumbling_count_window_avg(df, ["k"], ["seq"], "v", window_size=10).collect()
    )
    w2_seg = sorted(
        (r["k"], r["cycle"], r["avg_value"])
        for r in tumbling_count_window_avg(
            df, ["k"], ["seq"], "v", window_size=10, segment_col="seg"
        ).collect()
    )
    assert w2_seg == w2_plain and len(w2_plain) > 0

    breach = F.col("v") >= 60.0
    w3_plain = sorted(
        (r["k"], r["seq"], r["rows_since_prev_breach"])
        for r in rows_between_breaches(
            df, ["k"], ["seq"], breach=breach, emit_cols=["k", "seq"]
        ).collect()
    )
    w3_seg = sorted(
        (r["k"], r["seq"], r["rows_since_prev_breach"])
        for r in rows_between_breaches(
            df, ["k"], ["seq"], breach=breach, emit_cols=["k", "seq"], segment_col="seg"
        ).collect()
    )
    assert w3_seg == w3_plain and len(w3_plain) > 0


def test_operators_tolerate_empty_inputs(spark):
    """Empty-input law: every batch operator family returns an empty
    (0-row) result with the right schema on empty input — no
    first()/None crashes, no degenerate plans. (ivf_topk is the
    documented exception: an empty corpus cannot train a quantizer and
    raises ValueError.)"""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        exact_dedup,
        minhash_dedup_pairs,
        minhash_verified_pairs,
        ngram_jaccard_pairs,
        pack_concat_chunks,
        pack_greedy_nextfit,
        quantize_embeddings,
        running_max,
        running_max_segmented,
        rows_between_breaches,
        segmented_row_number,
        simhash,
        tumbling_count_window_avg,
        with_quality_score,
    )

    li = spark.createDataFrame([], "k string, seq int, seg int, v double")
    docs = spark.createDataFrame([], "doc_id long, text string")
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")

    assert running_max(li, ["k"], ["seq"], "v").count() == 0
    assert running_max_segmented(li, ["k"], ["seq"], "v", "seg").count() == 0
    assert segmented_row_number(li, ["k"], ["seq"], "seg").count() == 0
    assert tumbling_count_window_avg(li, ["k"], ["seq"], "v", 5).count() == 0
    assert rows_between_breaches(li, ["k"], ["seq"], breach=F.col("v") > 0, emit_cols=["k", "seq"]).count() == 0
    assert exact_dedup(docs, ["text"], "doc_id").count() == 0
    assert ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, shingle_k=1).count() == 0
    assert minhash_dedup_pairs(docs, "doc_id", "text").count() == 0
    assert minhash_verified_pairs(docs, "doc_id", "text").count() == 0
    assert simhash(docs, "doc_id", "text").count() == 0
    assert with_quality_score(docs, "text").count() == 0
    assert pack_concat_chunks(docs.selectExpr("doc_id", "doc_id AS n"), "doc_id", "n", 16).count() == 0
    assert pack_greedy_nextfit(docs.selectExpr("doc_id", "doc_id AS n"), "doc_id", "n", 16).count() == 0
    assert quantize_embeddings(emb).count() == 0


def test_interval_overlap_join_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 30), (3, 5, 6)], "aid long, a_lo long, a_hi long"
    )
    b = spark.createDataFrame(
        [(10, 8, 25), (11, 30, 40), (12, 50, 50)], "bid long, b_lo long, b_hi long"
    )
    got = sorted(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 7.0).collect()
    )
    # [0,10)×[8,25) overlap; [20,30)×[8,25) overlap; [20,30)×[30,40) do NOT
    # (half-open); [5,6)×[8,25) no; empty [50,50) matches nothing
    assert got == [(1, 10), (2, 10)]


def test_interval_overlap_join_exactly_once_matches_naive(spark):
    """Property: bucketized result == naive inequality join, each pair
    exactly once, for intervals spanning many buckets (bucket dedup path)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        interval_overlap_join,
    )

    import itertools

    rows_a = [(i, (i * 37) % 50, (i * 37) % 50 + 1 + (i * 13) % 40) for i in range(40)]
    rows_b = [(j, (j * 29) % 60, (j * 29) % 60 + 1 + (j * 11) % 35) for j in range(40)]
    a = spark.createDataFrame(rows_a, "aid long, a_lo long, a_hi long")
    b = spark.createDataFrame(rows_b, "bid long, b_lo long, b_hi long")
    naive = sorted(
        (ai, bj)
        for (ai, alo, ahi), (bj, blo, bhi) in itertools.product(rows_a, rows_b)
        if alo < bhi and blo < ahi
    )
    for width in (1.0, 3.0, 10.0, 100.0):
        got = [
            (r["aid"], r["bid"])
            for r in interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", width).collect()
        ]
        assert sorted(got) == naive, f"width={width}"
        assert len(got) == len(set(got)), f"duplicate pairs at width={width}"


def test_interval_overlap_join_no_cartesian_and_validates(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        interval_overlap_join,
    )

    a = spark.createDataFrame([(1, "k", 0, 5)], "aid long, k string, a_lo long, a_hi long")
    b = spark.createDataFrame([(2, "k", 3, 9)], "bid long, k string, b_lo long, b_hi long")
    out = interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4.0, key_cols=["k"])
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert [(r["aid"], r["bid"]) for r in out.collect()] == [(1, 2)]
    with pytest.raises(ValueError):
        interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 0.0)


def test_scd2_merge_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.scd import (
        scd2_merge,
    )

    dim = spark.createDataFrame(
        [
            (1, "gold", 10, 20),    # closed history — must pass through untouched
            (1, "plat", 20, None),  # current
            (2, "iron", 5, None),
            (3, "dust", 7, None),
        ],
        "k long, tier string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame(
        [
            (1, "diam", 30),  # real change → closes plat at 30
            (2, "iron", 40),  # zero-diff → collapses, no new version
            (4, "new", 50),   # brand-new key
            (3, "late", 3),   # older than current valid_from → dropped
        ],
        "k long, tier string, ts long",
    )
    out = scd2_merge(dim, updates, ["k"], ["tier"], "ts")
    rows = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"]) for r in out.collect()
    )
    assert rows == [
        (1, "diam", 30, None),
        (1, "gold", 10, 20),
        (1, "plat", 20, 30),
        (2, "iron", 5, None),
        (3, "dust", 7, None),
        (4, "new", 50, None),
    ]
    # invariant: exactly one open version per key
    open_per_key = {}
    for k, _, _, vt in rows:
        open_per_key[k] = open_per_key.get(k, 0) + (vt is None)
    assert all(v == 1 for v in open_per_key.values())


def test_scd2_merge_multiple_updates_and_run_collapse(spark):
    """Several updates per key in one batch: consecutive-equal runs
    collapse to their first entry; intervals chain via lead."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.scd import (
        scd2_merge,
    )

    dim = spark.createDataFrame(
        [(1, "a", 0, None)], "k long, v string, valid_from long, valid_to long"
    )
    updates = spark.createDataFrame(
        [(1, "b", 10), (1, "b", 20), (1, "a", 30), (1, "a", 40)],
        "k long, v string, ts long",
    )
    out = sorted(
        (r["v"], r["valid_from"], r["valid_to"])
        for r in scd2_merge(dim, updates, ["k"], ["v"], "ts").collect()
    )
    assert out == [("a", 0, 10), ("a", 30, None), ("b", 10, 30)]


def test_scd2_merge_closed_only_key_rejects_overlapping_update(spark):
    """An update inside a closed-only key's recorded history must be
    dropped (it would otherwise open a version overlapping closed
    rows); an update AFTER the history end starts a fresh version."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.scd import (
        scd2_merge,
    )

    dim = spark.createDataFrame(
        [(1, "a", 10, 20)], "k long, v string, valid_from long, valid_to long"
    )
    inside = spark.createDataFrame([(1, "b", 15)], "k long, v string, ts long")
    out = sorted(
        (r["v"], r["valid_from"], r["valid_to"])
        for r in scd2_merge(dim, inside, ["k"], ["v"], "ts").collect()
    )
    assert out == [("a", 10, 20)]  # overlapping update dropped
    after = spark.createDataFrame([(1, "b", 25)], "k long, v string, ts long")
    out2 = sorted(
        (r["v"], r["valid_from"], r["valid_to"])
        for r in scd2_merge(dim, after, ["k"], ["v"], "ts").collect()
    )
    assert out2 == [("a", 10, 20), ("b", 25, None)]


# ------------------------------------------------------------ timeseries


def test_ohlc_bars_ground_truth(spark):
    """Hand-computed candle: open/close follow (ts, id) order including
    the tie on ts=1 (id breaks it), high/low are extrema, volume counts."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        ohlc_bars,
    )

    rows = [
        ("A", "2024-01-01 10:05:00", 1, 10.0),
        ("A", "2024-01-01 10:05:00", 0, 9.0),   # same ts, lower id → true open
        ("A", "2024-01-01 10:50:00", 2, 15.0),  # close of the 10:00 bar
        ("A", "2024-01-01 11:10:00", 3, 7.0),   # next bar
        ("B", "2024-01-01 10:30:00", 4, 100.0),
    ]
    df = spark.createDataFrame(rows, "sym string, ts string, id long, px double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        (r["sym"], str(r["bucket_start"])): (r["open"], r["high"], r["low"], r["close"], r["volume"])
        for r in ohlc_bars(df, ["sym"], "ts", "px", bucket="hour", tiebreak_cols=("id",)).collect()
    }
    assert out[("A", "2024-01-01 10:00:00")] == (9.0, 15.0, 9.0, 15.0, 3)
    assert out[("A", "2024-01-01 11:00:00")] == (7.0, 7.0, 7.0, 7.0, 1)
    assert out[("B", "2024-01-01 10:00:00")] == (100.0, 100.0, 100.0, 100.0, 1)


def test_fill_forward_ground_truth(spark):
    """NULLs take the latest prior non-NULL per key; leading NULLs stay
    NULL; other keys are isolated."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        fill_forward,
    )

    rows = [
        ("a", 1, None), ("a", 2, 10.0), ("a", 3, None), ("a", 4, None),
        ("a", 5, 20.0), ("b", 1, None), ("b", 2, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    got = {
        (r["k"], r["seq"]): r["filled"]
        for r in fill_forward(df, ["k"], ["seq"], "v").collect()
    }
    assert got == {
        ("a", 1): None, ("a", 2): 10.0, ("a", 3): 10.0, ("a", 4): 10.0,
        ("a", 5): 20.0, ("b", 1): None, ("b", 2): 5.0,
    }


def test_scd2_point_in_time_join_never_multiplies_facts(spark):
    """The SCD2 non-overlap invariant the point-in-time lookup relies
    on (join_scd2_point_in_time): a fact row joining `valid_from <= d <
    valid_to` against a key's version history matches AT MOST ONE
    version, so the left join preserves fact cardinality exactly —
    row multiplication there would silently double-count revenue."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.scd import (
        scd2_merge,
    )
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(1, "gold", 100, None), (2, "bronze", 100, None)],
        "k long, tier string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame(
        [(1, "silver", 150), (1, "plat", 200)], "k long, tier string, ts long"
    )
    hist = scd2_merge(dim, updates, ["k"], ["tier"], "ts")
    facts = spark.createDataFrame(
        [(i, k, d) for i, (k, d) in enumerate([(1, 99), (1, 100), (1, 150), (1, 199),
                                               (1, 200), (1, 500), (2, 100), (2, 9)])],
        "fid long, k long, d long",
    )
    cond = (
        (facts["k"] == hist["k"])
        & (facts["d"] >= hist["valid_from"])
        & (hist["valid_to"].isNull() | (facts["d"] < hist["valid_to"]))
    )
    j = facts.join(hist, cond, "left").select("fid", "tier")
    rows = {r["fid"]: r["tier"] for r in j.collect()}
    assert j.count() == facts.count() == len(rows)  # no multiplication
    assert rows == {0: None, 1: "gold", 2: "silver", 3: "silver",
                    4: "plat", 5: "plat", 6: "bronze", 7: None}


def test_hamming_neighborhood_join_ground_truth(spark):
    """Masked-position blocking recall proof on a hand-checkable set:
    every ham<=1 pair is found (incl. exact duplicates, ham 0), ham-2
    pairs are excluded, different-length strings never match, and the
    left/right sides are independent tables."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        hamming_neighborhood_join,
    )

    left = spark.createDataFrame(
        [(1, "ABCD"), (2, "ABXD"), (3, "AXXD"), (4, "ABC")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "ABCD"), (11, "ZBCD"), (12, "XXXX")], "rid long, rname string"
    )
    out = hamming_neighborhood_join(
        left, right, "id", "rid", "name", "rname", length=4
    ).collect()
    got = {(r["left_id"], r["right_id"]): r["hamming"] for r in out}
    assert got == {
        (1, 10): 0,   # exact dup
        (1, 11): 1,   # one substitution
        (2, 10): 1,   # one substitution the other way
    }
    # id 3 (ham 2 from ABCD), id 4 (length 3), and XXXX (ham>=3) never match


def test_levenshtein_neighborhood_join_ground_truth(spark):
    """Deletion-neighborhood blocking recall proof: substitution,
    insertion, deletion, and exact-dup pairs (ED<=1) are all found; an
    ED-2 pair and an unrelated string are excluded; and the candidate
    tier's cross-position variant collisions ('aab' vs 'abb': delete
    pos 2 vs pos 3 both give 'ab') are confirmed away or kept per the
    EXACT distance, matching a brute-force pairwise check."""
    import itertools

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        levenshtein_neighborhood_join,
    )

    lrows = [(1, "market"), (2, "marke"), (3, "marXet"), (4, "maXrket"), (5, "aab")]
    rrows = [(10, "market"), (11, "abb"), (12, "zzzzzz"), (13, "mrkt")]
    left = spark.createDataFrame(lrows, "id long, name string")
    right = spark.createDataFrame(rrows, "rid long, rname string")
    out = levenshtein_neighborhood_join(
        left, right, "id", "rid", "name", "rname"
    ).collect()
    got = {(r["left_id"], r["right_id"]): r["edit_distance"] for r in out}

    def ed(a, b):  # classic DP, test-side oracle
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    want = {
        (lid, rid): ed(ln, rn)
        for (lid, ln), (rid, rn) in itertools.product(lrows, rrows)
        if ed(ln, rn) <= 1
    }
    assert got == want
    assert (1, 10) in got and got[(1, 10)] == 0      # exact dup
    assert (2, 10) in got and got[(2, 10)] == 1      # deletion
    assert (3, 10) in got and got[(3, 10)] == 1      # substitution
    assert (4, 10) in got and got[(4, 10)] == 1      # insertion
    assert (5, 11) in got and got[(5, 11)] == 1      # cross-position collision kept: ED('aab','abb')=1
    assert all(rid != 12 for (_, rid) in got)        # unrelated never matches

    # Radius 2 (round 9, delete-2 neighborhood): same recall-1 claim
    # against the brute-force oracle at ED <= 2 — 'mrkt' (two
    # deletions from 'market') now matches, as does the aab/abb pair
    # at its exact distance.
    out2 = levenshtein_neighborhood_join(
        left, right, "id", "rid", "name", "rname", max_edit=2
    ).collect()
    got2 = {(r["left_id"], r["right_id"]): r["edit_distance"] for r in out2}
    want2 = {
        (lid, rid): ed(ln, rn)
        for (lid, ln), (rid, rn) in itertools.product(lrows, rrows)
        if ed(ln, rn) <= 2
    }
    assert got2 == want2
    assert (1, 13) in got2 and got2[(1, 13)] == 2    # double deletion
    assert all(rid != 12 for (_, rid) in got2)       # unrelated never matches

    import pytest as _pytest

    # Radius 3+ still raises — C(L,3) variants; widen deliberately.
    with _pytest.raises(NotImplementedError):
        levenshtein_neighborhood_join(
            left, right, "id", "rid", "name", "rname", max_edit=3
        )


def test_kcore_peel_ground_truth(spark):
    """Textbook 2-core: a triangle with a pendant path hanging off it.
    Peeling at k=2 removes the path (degree-1 nodes cascade), keeps the
    triangle with in-core degree 2, and converges inside the round
    budget; at k=3 the core is empty. A square (4-cycle) needs TWO
    cascading rounds to vanish at k=3 — pinning that rounds compose."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.graph import (
        kcore_peel,
    )

    # triangle 1-2-3 plus path 3-4-5
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    k2 = spark.createDataFrame([(2,)], "k long")
    out = {
        r["node"]: (r["core_degree"], r["k"], r["converged"])
        for r in kcore_peel(edges, k2, rounds=4).collect()
    }
    assert out == {1: (2, 2, 1), 2: (2, 2, 1), 3: (2, 2, 1)}

    k3 = spark.createDataFrame([(3,)], "k long")
    assert kcore_peel(edges, k3, rounds=4).count() == 0

    # 4-cycle at k=3: round 1 removes all (degree 2 < 3) — converged
    square = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long")
    assert kcore_peel(square, k3, rounds=4).count() == 0
    # 4-cycle at k=2 IS the core, untouched
    got = {r["node"]: r["core_degree"] for r in kcore_peel(square, k2, rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_ranked_top_n_matches_window_row_number(spark):
    """topk.ranked_top_n (TakeOrderedAndProject + window-free relational
    rank — the r5-verdict replacement for unpartitioned row_number) must
    equal the naive global-window row_number on every ordering shape it
    is used with: (desc, asc-id) and (asc, asc-id), including ties on
    the leading key broken by the unique id."""
    from pyspark.sql import Window

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.topk import (
        ranked_top_n,
    )

    rows = [(i, float((i * 37) % 11), (i * 13) % 7) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, score double, extra long")

    for keys, order_cols in [
        ([("score", True), ("id", False)], [F.desc("score"), F.asc("id")]),
        ([("score", False), ("id", False)], [F.asc("score"), F.asc("id")]),
    ]:
        got = {
            r["id"]: r["rk"]
            for r in ranked_top_n(df, keys, 7, rank_col="rk").collect()
        }
        w = Window.orderBy(*order_cols)
        want = {
            r["id"]: r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 7)
            .collect()
        }
        assert got == want
        assert sorted(got.values()) == list(range(1, 8))


def test_decile_closed_form_matches_ntile(spark):
    """The two-phase decile assignment (agg_decile_revenue_share) uses
    ntile(10)'s row-allocation rule in closed-form BIGINT arithmetic;
    pin the formula against F.ntile itself for sizes spanning n < k,
    n % k == 0, and n % k != 0."""
    from pyspark.sql import Window

    formula = (
        "CAST(CASE WHEN _rn <= (_n % 10) * (_n div 10 + 1) "
        "THEN (_rn - 1) div (_n div 10 + 1) + 1 "
        "ELSE (_n % 10) + (_rn - (_n % 10) * (_n div 10 + 1) - 1) div (_n div 10) + 1 "
        "END AS INT)"
    )
    for n in (3, 7, 10, 23, 100, 101):
        df = spark.createDataFrame([(i,) for i in range(n)], "v long")
        w = Window.orderBy("v")
        want = {
            r["v"]: r["t"] for r in df.withColumn("t", F.ntile(10).over(w)).collect()
        }
        got = {
            r["v"]: r["t"]
            for r in df.withColumn("_rn", F.row_number().over(w).cast("long"))
            .withColumn("_n", F.lit(n).cast("long"))
            .withColumn("t", F.expr(formula))
            .collect()
        }
        assert got == want, f"n={n}"


def test_distributed_global_rank_matches_window(spark):
    """distributed_global_rank (range partition + per-partition
    numbering + broadcast offsets — no single-task sort) must equal the
    naive unpartitioned row_number for every row, on both orderings it
    is used with, including when the row count is smaller than the
    partition count."""
    from pyspark.sql import Window

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.windows import (
        distributed_global_rank,
    )

    for n in (5, 200):
        rows = [(i, (i * 37) % 23) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            r["id"]: r["rank"]
            for r in distributed_global_rank(
                df, [("v", True), ("id", False)], rank_col="rank"
            ).collect()
        }
        w = Window.orderBy(F.desc("v"), F.asc("id"))
        want = {
            r["id"]: r["rank"]
            for r in df.withColumn(
                "rank", F.row_number().over(w).cast("long")
            ).collect()
        }
        assert got == want, f"n={n}"


def test_hamming_neighborhood_join_radius2(spark):
    """Radius-2 masked-pair blocking: every ham<=2 pair found (0, 1, and
    2 substitutions), ham-3 pairs excluded, recall-1 vs a brute-force
    ground truth on a randomized fixed-format corpus, and radius >= 3
    still raises (the documented explode-budget guard)."""
    import itertools

    import pytest as _pytest

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        hamming_neighborhood_join,
    )

    left = spark.createDataFrame(
        [(1, "ABCDEF"), (2, "ABXDEX"), (3, "XBXDEF"), (4, "XXXDEF"), (5, "AAAAAA")],
        "id long, name string",
    )
    right = spark.createDataFrame([(10, "ABCDEF")], "rid long, rname string")
    out = hamming_neighborhood_join(
        left, right, "id", "rid", "name", "rname", length=6, max_hamming=2
    ).collect()
    got = {(r["left_id"], r["right_id"]): r["hamming"] for r in out}
    assert got == {(1, 10): 0, (2, 10): 2, (3, 10): 2}  # 4 is ham 3, 5 is ham 5

    # randomized recall-1 check vs brute force
    import random

    rng = random.Random(6)
    corpus = ["".join(rng.choice("AB") for _ in range(8)) for _ in range(40)]
    ldf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "id long, name string"
    )
    rdf = spark.createDataFrame(
        [(i + 1000, s) for i, s in enumerate(corpus)], "rid long, rname string"
    )
    out2 = hamming_neighborhood_join(
        ldf, rdf, "id", "rid", "name", "rname", length=8, max_hamming=2
    ).collect()
    got2 = {(r["left_id"], r["right_id"]) for r in out2}
    want = {
        (i, j + 1000)
        for i, j in itertools.product(range(40), range(40))
        if sum(a != b for a, b in zip(corpus[i], corpus[j])) <= 2
    }
    assert got2 == want

    with _pytest.raises(NotImplementedError):
        hamming_neighborhood_join(
            ldf, rdf, "id", "rid", "name", "rname", length=8, max_hamming=3
        )


def test_pair_lift_ground_truth(spark):
    """Hand-computed baskets: {1:AB, 2:AB, 3:ABC, 4:C} →
    N=4, c_A=3, c_B=3, c_C=2, c_AB=3, c_AC=1, c_BC=1."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.basket import (
        pair_lift,
    )

    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"), (2, "B"),  # line-level dup collapses
        (3, "A"), (3, "B"), (3, "C"),
        (4, "C"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r.item_a, r.item_b): r
        for r in pair_lift(df, "basket", "item", min_support=1).collect()
    }
    ab = out[("A", "B")]
    assert (ab.c_ab, ab.c_a, ab.c_b) == (3, 3, 3)
    # lift = 4*3/(3*3) = 1.333333 → 1333333 micro
    assert ab.lift_micro == 1333333
    assert ab.support_micro == 750000
    ac = out[("A", "C")]
    assert (ac.c_ab, ac.lift_micro) == (1, 666667)
    # min_support filters
    assert ("A", "C") not in {
        (r.item_a, r.item_b)
        for r in pair_lift(df, "basket", "item", min_support=2).collect()
    }


def test_last_touch_attribution_ground_truth(spark):
    """User 1: view, click, purchase, purchase (no touch between → both
    credit click), error, purchase (credits error). User 2: purchase
    with no prior touch → 'direct'."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        last_touch_attribution,
    )

    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (1, 4, "purchase"), (1, 5, "error"), (1, 6, "purchase"),
        (2, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "seq", "event_type"])
    out = last_touch_attribution(
        df, ["user_id"], ["seq"], "event_type", "purchase"
    ).collect()
    got = {(r.user_id, r.seq): r.channel for r in out}
    assert got == {
        (1, 3): "click",
        (1, 4): "click",
        (1, 6): "error",
        (2, 1): "direct",
    }
    # only conversion rows survive
    assert len(out) == 4


def test_linear_attribution_exact_accounting(spark):
    """The linear-attribution invariant: credits sum to exactly 10^6
    micro-units PER PURCHASE (floor-division remainder goes to the last
    touch), so sum(credit_micro) == 10^6 * n_purchases to the unit."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    out = entrymod.queries()["events_linear_attribution"](spark, SF_DIR)
    rows = out.collect()
    total = sum(r.credit_micro for r in rows)
    ev = entrymod._t(spark, SF_DIR, "events")
    n_purch = ev.filter("event_type = 'purchase'").count()
    assert total == 1_000_000 * n_purch


def test_distributed_running_sum_matches_window(spark):
    """The two-phase running sum (and rank) must equal the naive
    unpartitioned-window form on a unique ordering key."""
    from pyspark.sql import Window as W

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.windows import (
        distributed_running_sum,
    )

    rows = [(i, ((i * 37) % 19) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {
        r.id: (r.run, r.rk)
        for r in distributed_running_sum(
            df, [("v", True), ("id", False)], "v", out_col="run", rank_col="rk",
            num_partitions=7,
        ).collect()
    }
    w = W.orderBy(F.desc("v"), F.asc("id"))
    expect = {
        r.id: (r.run, r.rk)
        for r in df.withColumn(
            "run",
            F.sum("v").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .collect()
    }
    assert got == expect


def test_distributed_running_max_matches_window(spark):
    """Two-phase running max (inclusive AND exclusive) must equal the
    naive unpartitioned-window forms on a unique ordering key."""
    from pyspark.sql import Window as W

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.windows import (
        distributed_running_max,
    )

    rows = [(i, ((i * 53) % 31) - 7) for i in range(200)]  # negatives too
    df = spark.createDataFrame(rows, ["id", "v"])
    w = W.orderBy(F.asc("id"))
    expect_inc = {
        r.id: r.m
        for r in df.withColumn(
            "m", F.max("v").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        ).collect()
    }
    expect_exc = {
        r.id: r.m
        for r in df.withColumn(
            "m", F.max("v").over(w.rowsBetween(W.unboundedPreceding, -1))
        ).collect()
    }
    got_inc = {
        r.id: r.m
        for r in distributed_running_max(
            df, [("id", False)], "v", out_col="m", num_partitions=7
        ).collect()
    }
    got_exc = {
        r.id: r.m
        for r in distributed_running_max(
            df, [("id", False)], "v", out_col="m", exclusive=True, num_partitions=7
        ).collect()
    }
    assert got_inc == expect_inc
    assert got_exc == expect_exc
    assert got_exc[0] is None  # global first row has no predecessor


def test_skyline_2d_matches_bruteforce(spark):
    """skyline_2d must equal the quadratic dominance definition,
    including duplicate points and ties along either axis."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.topk import (
        skyline_2d,
    )

    pts = [(3, 10), (3, 10), (3, 12), (5, 12), (2, 7), (2, 7), (8, 15),
           (8, 14), (1, 1), (4, 11), (5, 13), (9, 15)]
    df = spark.createDataFrame(pts, ["cost", "gain"])
    got = {(r.cost, r.gain) for r in skyline_2d(df, "cost", "gain", num_partitions=3).collect()}
    dpts = set(pts)
    expect = {
        (c, g)
        for (c, g) in dpts
        if not any(
            bc <= c and bg >= g and (bc < c or bg > g) for (bc, bg) in dpts
        )
    }
    assert got == expect
    # sanity on the fixture: frontier is the staircase {1,1},{2,7},{3,12},{5,13},{8,15}
    assert got == {(1, 1), (2, 7), (3, 12), (5, 13), (8, 15)}


def test_next_higher_mark_vs_bruteforce(spark):
    """Monotonic-stack next-greater-element vs the quadratic definition,
    over repeats, NULLs, multiple keys, and never-resolved tails."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        next_higher_mark,
    )

    rows = []
    for k in ("a", "b", "c"):
        for i in range(60):
            v = None if (i * 7 + ord(k)) % 11 == 0 else float(((i * 13 + ord(k)) % 9))
            rows.append((k, i, v))
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    got = {
        (r.k, r.o): r.next_higher_ord
        for r in next_higher_mark(df, ["k"], "o", "v").collect()
    }
    for k, o, v in rows:
        if v is None:
            assert got[(k, o)] is None
            continue
        later = [oo for (kk, oo, vv) in rows if kk == k and oo > o and vv is not None and vv > v]
        assert got[(k, o)] == (min(later) if later else None), (k, o, v)
    assert len(got) == len(rows)

    import pytest as _pytest
    with _pytest.raises(TypeError):
        next_higher_mark(df.withColumn("o", F.col("o").cast("double")), ["k"], "o", "v")
    with _pytest.raises(TypeError):
        next_higher_mark(df.withColumn("v", F.lit("x")), ["k"], "o", "v")


def test_exact_global_percentiles_match_builtin(spark):
    """The two-phase rank percentile query must agree with Spark's own
    percentile() (same type-7 interpolation) on the same data."""
    import os
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    got = {
        r.p: r.pct_cents
        for r in entrymod.queries()["agg_exact_global_percentiles"](
            spark, SF_DIR
        ).collect()
    }
    li = entrymod._t(spark, SF_DIR, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    ref = li.agg(
        F.percentile("c", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99), F.lit(0.999)))
    ).collect()[0][0]
    for p, want in zip((0.5, 0.9, 0.99, 0.999), ref):
        assert abs(got[p] - want) <= 1e-6 * max(1.0, abs(want)), (p, got[p], want)


def test_holt_linear_integer_reference_fold(spark):
    """holt_linear_integer vs a plain-Python replay, including the
    negative-trend floor path (values swing down hard)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        holt_linear_integer,
    )

    vals = [9000, 5000, 1000, 500, 200, 50, None, 60, 8000]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "o", "x"])
    got = {
        r.o: (r.level_int, r.trend_int)
        for r in holt_linear_integer(df, ["k"], ["o"], "x", 20, 10).collect()
    }
    L = T = None
    for i, x in enumerate(vals):
        if x is None:
            assert got[i] == (L, T)
            continue
        if L is None:
            L, T = x, 0
        else:
            L2 = (20 * x + 80 * (L + T)) // 100
            T = (10 * (L2 - L) + 90 * T) // 100
            L = L2
        assert got[i] == (L, T), (i, got[i], (L, T))
    # the fixture must actually exercise a negative trend state
    assert any(t is not None and t < 0 for (_, t) in got.values())


def test_coalesce_intervals_containment_and_touch(spark):
    """Running-max islanding must merge contained intervals (the case a
    lag(end) formulation splits) and treat touching as one span."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        coalesce_intervals,
    )

    rows = [
        ("k", 1, 10, 1),   # long opener
        ("k", 2, 3, 2),    # fully contained
        ("k", 4, 12, 3),   # overlaps opener
        ("k", 12, 15, 4),  # touches (start == prior end) -> same span
        ("k", 20, 25, 5),  # gap -> new span
        ("q", 5, 6, 6),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e", "id"])
    got = {
        (r.k, r.span_start, r.span_end): r.n_intervals
        for r in coalesce_intervals(df, ["k"], "s", "e", tiebreak_cols=("id",)).collect()
    }
    assert got == {("k", 1, 15): 4, ("k", 20, 25): 1, ("q", 5, 6): 1}


def test_cusum_integer_reference_fold(spark):
    """cusum_integer vs a plain-Python replay: zero-clamp resets, slack
    subtraction, NULL carry, multiple keys."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        cusum_integer,
    )

    rows = [
        ("a", 1, 10, 5), ("a", 2, 3, 5), ("a", 3, 20, 5), ("a", 4, None, 5),
        ("a", 5, 1, 5), ("b", 1, 4, 10), ("b", 2, 50, 10),
    ]
    df = spark.createDataFrame(rows, "k string, o long, x long, tgt long")
    got = {
        (r.k, r.o): r.cusum_int
        for r in cusum_integer(df, ["k"], ["o"], "x", "tgt", slack=2).collect()
    }
    expect = {}
    state = {}
    for k, o, x, tgt in rows:
        if x is None:
            expect[(k, o)] = state.get(k)
            continue
        s = max(0, state.get(k, 0) + x - tgt - 2)
        state[k] = s
        expect[(k, o)] = s
    assert got == expect
    # clamp actually fired (a@2: 3 + 3 - 5 - 2 = -1 -> 0), then fresh accumulation
    assert got[("a", 1)] == 3 and got[("a", 2)] == 0 and got[("a", 3)] == 13


def test_kaplan_meier_hand_example(spark):
    """Classic KM fixture: S(2)=3/5, S(5)=3/10 with a censored tail;
    and a d==n time zeroes the curve exactly."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        kaplan_meier,
    )

    obs = [(2, 1), (2, 1), (3, 0), (5, 1), (7, 0)]
    df = spark.createDataFrame(obs, ["duration", "event"])
    got = {r.t: (r.n_at_risk, r.d_events, r.km_micro) for r in kaplan_meier(df, "duration", "event").collect()}
    assert set(got) == {2, 5}  # censored-only times carry no curve step
    n2, d2, km2 = got[2]
    n5, d5, km5 = got[5]
    assert (n2, d2) == (5, 2) and (n5, d5) == (2, 1)
    assert abs(km2 - 600_000) <= 1 and abs(km5 - 300_000) <= 1

    z = spark.createDataFrame([(4, 1), (4, 1)], ["duration", "event"])
    zr = kaplan_meier(z, "duration", "event").collect()
    assert len(zr) == 1 and zr[0].km_micro == 0 and zr[0].n_at_risk == 2


def test_ks_and_chi2_against_scipy_free_references(spark):
    """KS and chi-square queries vs plain-Python recomputation on the
    gate fixture (no scipy in the container; the reference is the
    definition itself)."""
    import duckdb
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    ks = entrymod.queries()["agg_ks_price_shift"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    rows = con.execute(
        "SELECT year(o_orderdate) y, CAST(round(o_totalprice*100) AS BIGINT) v "
        "FROM orders WHERE year(o_orderdate) IN (1995, 1996)"
    ).fetchall()
    g1 = sorted(v for y, v in rows if y == 1995)
    g2 = sorted(v for y, v in rows if y == 1996)
    import bisect

    best = 0
    for v in sorted(set(g1) | set(g2)):
        c1 = bisect.bisect_right(g1, v)
        c2 = bisect.bisect_right(g2, v)
        best = max(best, abs(c1 * len(g2) - c2 * len(g1)))
    assert (ks.n1, ks.n2) == (len(g1), len(g2))
    assert ks.d_num == best
    assert ks.d_micro == int(1_000_000 * best / (len(g1) * len(g2)))

    chi = entrymod.queries()["agg_chi2_priority_status"](spark, SF_DIR).collect()
    total = sum(r.contrib_micro for r in chi)
    assert all(r.chi2_micro == total for r in chi)
    n = sum(r.obs for r in chi)
    # expected counts sum back to n (in micro-units, within per-cell rounding)
    assert abs(sum(r.exp_micro for r in chi) - n * 1_000_000) <= len(chi)


def test_round7_stats_plain_python_references(spark):
    """Gini / weighted median / lag-1 autocorr / trend slope / source
    entropy vs plain-Python recomputation from the same parquet — the
    scipy-free independence check (both the Spark plan AND the DuckDB
    oracle were written by the same hands; this replay was not derived
    from either)."""
    import math

    import pandas as pd

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (orders.o_totalprice * 100).round().astype("int64")

    # --- Gini over per-customer revenue
    per_cust = (
        pd.DataFrame({"k": orders.o_custkey, "c": cents})
        .groupby("k", as_index=False)["c"].sum()
        .sort_values(["c", "k"]).reset_index(drop=True)
    )
    n, sx = len(per_cust), int(per_cust.c.sum())
    swx = sum((i + 1) * int(c) for i, c in enumerate(per_cust.c))
    want_gini = math.floor(1_000_000.0 * (2 * swx - (n + 1) * sx) / (n * sx))
    row = entrymod.agg_gini_revenue(spark, SF_DIR).collect()[0]
    assert (row.n_customers, row.total_cents, row.gini_micro) == (n, sx, want_gini)

    # --- quantity-weighted median over lineitem
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pv = (
        pd.DataFrame({
            "p": (li.l_extendedprice * 100).round().astype("int64"),
            "w": li.l_quantity.astype("int64"),
        })
        .groupby("p", as_index=False)["w"].sum()
        .sort_values("p").reset_index(drop=True)
    )
    W = int(pv.w.sum())
    cum = pv.w.cumsum()
    want_med = int(pv.p[cum * 2 >= W].iloc[0])
    row = entrymod.agg_weighted_median_price(spark, SF_DIR).collect()[0]
    assert (row.weighted_median_cents, row.total_weight) == (want_med, W)

    # --- lag-1 autocorrelation of daily revenue
    daily = (
        pd.DataFrame({"d": orders.o_orderdate, "c": cents})
        .groupby("d", as_index=False)["c"].sum()
        .sort_values("d").reset_index(drop=True)
    )
    a = daily.c[:-1].to_numpy(dtype="int64")
    b = daily.c[1:].to_numpy(dtype="int64")
    np_ = float(len(a))
    num = np_ * float(sum(int(x) * int(y) for x, y in zip(a, b))) - float(a.sum()) * float(b.sum())
    den = math.sqrt(
        (np_ * float(sum(int(x) * int(x) for x in a)) - float(a.sum()) ** 2)
        * (np_ * float(sum(int(y) * int(y) for y in b)) - float(b.sum()) ** 2)
    )
    want_r1 = math.floor(1_000_000.0 * num / den)
    row = entrymod.agg_autocorr_daily_revenue(spark, SF_DIR).collect()[0]
    assert (row.n_pairs, row.sa, row.sb) == (len(a), int(a.sum()), int(b.sum()))
    assert row.r1_micro == want_r1

    # --- per-nation trend slope (exact integer numerator/denominator)
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = orders.assign(c=cents, yr=pd.to_datetime(orders.o_orderdate).dt.year).merge(
        cust[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey"
    ).merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey", right_on="n_nationkey")
    got = {
        r.n_name: (r.n_years, r.slope_num, r.slope_den)
        for r in entrymod.agg_trend_slope_nation(spark, SF_DIR).collect()
    }
    for name, g in j.groupby("n_name"):
        yearly = g.groupby("yr")["c"].sum()
        ny = len(yearly)
        sx_, sy_ = int(yearly.index.to_series().sum()), int(yearly.sum())
        sxy = int(sum(int(y) * int(v) for y, v in yearly.items()))
        sxx = int(sum(int(y) * int(y) for y in yearly.index))
        assert got[name] == (ny, ny * sxy - sx_ * sy_, ny * sxx - sx_ * sx_), name

    # --- Spearman via doubled midranks
    a_ = (li.l_extendedprice * 100).round().astype("int64")
    b_ = li.l_quantity.astype("int64")

    def mr2(series):
        cnt = series.value_counts().sort_index()
        prefix = cnt.cumsum() - cnt
        return {v: 2 * int(p) + int(c) + 1 for v, p, c in zip(cnt.index, prefix, cnt)}

    ma, mb = mr2(a_), mr2(b_)
    ra = [ma[v] for v in a_]
    rb = [mb[v] for v in b_]
    nsp = float(len(ra))
    sa_, sb_ = sum(ra), sum(rb)
    num_s = nsp * float(sum(x * y for x, y in zip(ra, rb))) - float(sa_) * float(sb_)
    den_s = math.sqrt(
        (nsp * float(sum(x * x for x in ra)) - float(sa_) ** 2)
        * (nsp * float(sum(y * y for y in rb)) - float(sb_) ** 2)
    )
    row = entrymod.agg_spearman_price_qty(spark, SF_DIR).collect()[0]
    assert (row.n_rows, row.sa, row.sb) == (int(nsp), sa_, sb_)
    assert row.spearman_micro == math.floor(1_000_000.0 * num_s / den_s)

    # --- source-mix entropy
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts = docs.groupby("source").size()
    ntot = int(counts.sum())
    contribs = {
        s: int(round(-(c / ntot) * math.log(c / ntot) * 1_000_000))
        for s, c in counts.items()
    }
    total = sum(contribs.values())
    for r in entrymod.agg_entropy_source_mix(spark, SF_DIR).collect():
        assert r.contrib_micronats == contribs[r.source], r.source
        assert r.entropy_micronats == total
