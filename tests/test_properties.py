"""Property tests (SURVEY.md §5.2 item 4): laws the reference
semantics impose regardless of data.

- W1/W4 final aggregates are order-insensitive (hypothesis-shuffled
  inputs).
- W2 per-key emission count is floor(n / (window_size+1)) — the trigger
  row must ARRIVE before its window emits (a key with exactly
  window_size trailing rows emits nothing; RollingAverageHighPrice.java
  emits in the else-branch on the (window_size+1)-th row). Boundary
  n ≡ window_size (mod window_size+1) is exactly where a filter-first
  formulation over-emits, so it is enumerated explicitly.
- W3 emits exactly one row per breach row.
- asof_join agrees with pandas.merge_asof, both directions.
- range_join_bucketed equals the naive lo <= v < hi filter for any
  bucket width, including degenerate intervals.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
    asof_join,
    range_join_bucketed,
    final_max,
    rows_between_breaches,
    tumbling_count_window_avg,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)
_rows = st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), _vals), min_size=1, max_size=80)


@_settings
@given(rows=_rows, seed=st.integers(0, 2**16))
def test_w1_w4_final_max_order_insensitive(spark, rows, seed):
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)

    def run(rs):
        df = spark.createDataFrame(
            [(k, i, v) for i, (k, v) in enumerate(rs)], "k string, seq long, v double"
        )
        return {r["k"]: r["m"] for r in final_max(df, ["k"], "v", "m").collect()}

    assert run(rows) == run(shuffled)


@pytest.mark.parametrize("n", [1, 4, 5, 6, 10, 11, 12, 17, 50, 51, 122])
def test_w2_emission_count_is_reference_law(spark, n):
    """window_size=5 → cycle length 6; emissions = n // 6. n=5, 11, 17
    are the trigger-not-yet-arrived boundaries."""
    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(n)], "k string, seq long, v double"
    )
    out = tumbling_count_window_avg(df, ["k"], ["seq"], "v", window_size=5).collect()
    assert len(out) == n // 6
    if n >= 6:
        first = min(out, key=lambda r: r["cycle"])
        assert first["avg_value"] == pytest.approx(sum(range(5)) / 5)  # row 5 is the trigger


@_settings
@given(rows=st.lists(_vals, min_size=0, max_size=60))
def test_w3_emits_one_row_per_breach(spark, rows):
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(rows)], "k string, seq long, v double"
    )
    out = rows_between_breaches(
        df, ["k"], ["seq"], breach=F.col("v") >= 0.0, emit_cols=["k", "seq"]
    )
    assert out.count() == sum(1 for v in rows if v >= 0.0)


_ts = st.integers(min_value=0, max_value=60)
_asof_left = st.lists(st.tuples(st.sampled_from(["a", "b"]), _ts), min_size=1, max_size=40)
_asof_right = st.dictionaries(
    st.tuples(st.sampled_from(["a", "b"]), _ts), _vals, min_size=1, max_size=30
)


@_settings
@given(left_rows=_asof_left, right_map=_asof_right, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_map, direction):
    """asof_join (union + last/first-ignorenulls window) must agree with
    pandas.merge_asof row-for-row, both directions. Right (key, ts)
    pairs are unique by construction — with duplicates the reference
    semantics itself is order-undefined."""
    import pandas as pd

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid long, k string, ts long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right_map.items()], "k string, ts long, rv double"
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(left, right, ["k"], "ts", ["rv"], direction=direction).collect()
    }

    lpdf = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(left_rows)], columns=["lid", "k", "ts"])
    rpdf = pd.DataFrame([(k, t, v) for (k, t), v in right_map.items()], columns=["k", "ts", "rv"])
    merged = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]), rpdf.sort_values("ts"),
        on="ts", by="k", direction=direction,
    )
    for _, row in merged.iterrows():
        exp = None if pd.isna(row["rv"]) else row["rv"]
        assert got[row["lid"]] == exp, (row["lid"], got[row["lid"]], exp)


_interval = st.tuples(_ts, _ts).map(lambda p: (min(p), max(p)))


@_settings
@given(
    vals=st.lists(_ts, min_size=1, max_size=30),
    intervals=st.lists(_interval, min_size=1, max_size=15),
    width=st.sampled_from([1.0, 3.0, 7.5, 100.0]),
)
def test_range_join_bucketed_matches_naive(spark, vals, intervals, width):
    """Bucketized range join must equal the naive lo <= v < hi product
    filter for any bucket width — including degenerate (lo == hi)
    intervals and widths far larger/smaller than the interval span."""
    left = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], "lid long, v double")
    right = spark.createDataFrame(
        [(j, float(lo), float(hi)) for j, (lo, hi) in enumerate(intervals)],
        "rid long, lo double, hi double",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join_bucketed(left, right, "v", "lo", "hi", bucket_width=width).collect()
    }
    expected = {
        (i, j)
        for i, v in enumerate(vals)
        for j, (lo, hi) in enumerate(intervals)
        if lo <= v < hi
    }
    assert got == expected


@_settings
@given(
    gaps=st.lists(st.integers(min_value=0, max_value=9000), min_size=1, max_size=40),
    gap_seconds=st.sampled_from([1, 3600, 7200]),
)
def test_sessionize_by_gap_matches_replay(spark, gaps, gap_seconds):
    """sessionize_by_gap must equal a sequential replay: session id
    increments exactly when the inter-event gap exceeds gap_seconds.
    Timestamps are built as TIMESTAMP_NTZ — the driver's parquet type,
    which once broke the operator's epoch cast (bigint-cast regression)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(base + datetime.timedelta(seconds=acc))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "eid long, ts timestamp_ntz"
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        sessionize_by_gap,
    )

    got = {
        r["eid"]: r["sid"]
        for r in sessionize_by_gap(
            df.withColumn("k", F.lit("u")), ["k"], "ts", gap_seconds, "sid"
        ).collect()
    }

    sid, prev = 0, None
    for i, t in enumerate(ts):  # replay in event order
        if prev is None or (t - prev).total_seconds() > gap_seconds:
            sid += 1
        prev = t
        assert got[i] == sid, (i, got[i], sid)


@_settings
@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1e4, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=60,
    )
)
def test_grouped_zscore_moments(spark, vals):
    """Per-group z-scores must have mean ≈ 0 and population std ≈ 1
    whenever the group has any variance (0 everywhere otherwise)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.udfs import (
        grouped_zscore,
    )

    df = spark.createDataFrame([("g", float(v)) for v in vals], "k string, v double")
    zs = [r["z"] for r in grouped_zscore(df, ["k"], "v", "z").collect()]
    assert len(zs) == len(vals)
    cents = [round(v * 100) for v in vals]
    if len(set(cents)) == 1:
        assert all(z == 0.0 for z in zs)
    else:
        n = len(zs)
        assert abs(sum(zs) / n) < 1e-9
        assert abs(sum(z * z for z in zs) / n - 1.0) < 1e-9


@_settings
@given(
    bench_texts=st.lists(
        st.text(alphabet="ab ", min_size=5, max_size=40), min_size=1, max_size=10
    ),
    corpus_texts=st.lists(
        st.text(alphabet="ab ", min_size=5, max_size=40), min_size=1, max_size=15
    ),
)
def test_contamination_bloom_superset_of_exact(spark, bench_texts, corpus_texts):
    """Bloom decontamination can never miss a truly contaminated doc:
    for every doc the exact join flags, the Bloom path must report at
    least as many shingle hits (FPs only inflate)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        contamination_bloom,
        contamination_hits,
    )

    bench = spark.createDataFrame(list(enumerate(bench_texts)), "doc_id long, text string")
    corpus = spark.createDataFrame(list(enumerate(corpus_texts)), "doc_id long, text string")
    exact = {r["doc_id"]: r["n_shared_shingles"] for r in contamination_hits(corpus, bench).collect()}
    bloom = {r["doc_id"]: r["n_bloom_hits"] for r in contamination_bloom(corpus, bench).collect()}
    for did, n in exact.items():
        assert bloom.get(did, 0) >= n, (did, bloom.get(did), n)


@_settings
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.one_of(st.none(), _vals)),
        min_size=1,
        max_size=60,
    ),
    seg_every=st.integers(1, 10),
)
def test_segmented_forms_equal_plain_for_any_monotone_segmentation(spark, rows, seg_every):
    """For ANY segment column that is non-decreasing along the order
    (here seq // seg_every), the segmented running max and row_number
    must be bit-identical to the plain windowed forms — NULLs included."""
    from pyspark.sql import Window

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        running_max,
        running_max_segmented,
        segmented_row_number,
    )

    data = [(k, i, i // seg_every, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, seq int, seg int, v double")
    plain = {
        (r["k"], r["seq"]): r["rm"]
        for r in running_max(df, ["k"], ["seq"], "v", "rm").collect()
    }
    seg = {
        (r["k"], r["seq"]): r["rm"]
        for r in running_max_segmented(df, ["k"], ["seq"], "v", "seg", "rm").collect()
    }
    assert seg == plain
    rn_plain = {
        (r["k"], r["seq"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy("seq"))
        ).collect()
    }
    rn_seg = {
        (r["k"], r["seq"]): r["_rn"]
        for r in segmented_row_number(df, ["k"], ["seq"], "seg").collect()
    }
    assert rn_seg == rn_plain
    # running SUM of an integer column: segmented ≡ plain, bit-identical
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        segmented_running_sum,
    )

    summed = df.withColumn("iv", (F.col("seq") % 3).cast("long"))
    rs_plain = {
        (r["k"], r["seq"]): r["rs"]
        for r in summed.withColumn(
            "rs",
            F.sum("iv").over(
                Window.partitionBy("k").orderBy("seq").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        ).collect()
    }
    rs_seg = {
        (r["k"], r["seq"]): r["rs"]
        for r in segmented_running_sum(summed, ["k"], ["seq"], "seg", "iv", "rs").collect()
    }
    assert rs_seg == rs_plain


@_settings
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        ),
        min_size=1,
        max_size=60,
    ),
    seg_every=st.integers(1, 10),
    alpha=st.sampled_from([0.05, 0.3, 0.9, 1.0]),
)
def test_ewma_segmented_equals_plain_to_tolerance(spark, rows, seg_every, alpha):
    """The affine segment-carry EWMA must agree with the plain per-key
    pandas fold for ANY monotone segmentation — to relative tolerance
    (the w·carry + z regrouping reassociates float ops, so bit equality
    is not the contract; 1e-9 relative is, documented in the
    ewma_segmented docstring). NULL placement must agree exactly."""
    import math

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        ewma,
        ewma_segmented,
    )

    data = [(k, i, i // seg_every, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, seq int, seg int, v double")
    plain = {
        (r["k"], r["seq"]): r["y"]
        for r in ewma(df, ["k"], ["seq"], "v", alpha, out_col="y").collect()
    }
    seg = {
        (r["k"], r["seq"]): r["y"]
        for r in ewma_segmented(df, ["k"], ["seq"], "v", alpha, "seg", out_col="y").collect()
    }
    assert seg.keys() == plain.keys()
    for key, p in plain.items():
        s = seg[key]
        if p is None:
            assert s is None, (key, s)
        else:
            assert s is not None and math.isclose(s, p, rel_tol=1e-9, abs_tol=1e-9), (key, s, p)


@_settings
@given(
    counts=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    seq_len=st.integers(1, 40),
)
def test_pack_concat_chunks_conservation_law(spark, counts, seq_len):
    """Token conservation: Σ n_tok per doc == the doc's count (0-token
    docs vanish), and per shard the chunk fills are seq_len everywhere
    but the tail."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        pack_concat_chunks,
    )

    df = spark.createDataFrame(list(enumerate(counts)), "doc_id long, n long")
    out = pack_concat_chunks(df, "doc_id", "n", seq_len=seq_len, num_shards=3).collect()
    per_doc, per_chunk = {}, {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tok"]
        per_chunk[(r["shard"], r["chunk_id"])] = (
            per_chunk.get((r["shard"], r["chunk_id"]), 0) + r["n_tok"]
        )
    assert per_doc == {i: n for i, n in enumerate(counts) if n > 0}
    for shard in {s for s, _ in per_chunk}:
        chunks = sorted(c for s, c in per_chunk if s == shard)
        for c in chunks[:-1]:
            assert per_chunk[(shard, c)] == seq_len


@_settings
@given(
    counts=st.lists(st.integers(0, 120), min_size=1, max_size=40),
    budget=st.integers(1, 100),
)
def test_pack_greedy_nextfit_budget_law(spark, counts, budget):
    """Every doc lands exactly once; a pack exceeds the budget only when
    it is one oversize doc; pack ids are contiguous from 0 per shard."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        pack_greedy_nextfit,
    )

    df = spark.createDataFrame(list(enumerate(counts)), "doc_id long, n long")
    out = pack_greedy_nextfit(df, "doc_id", "n", budget=budget, num_shards=2).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(counts)))
    packs = {}
    for r in out:
        packs.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for (shard, pid), rows_in in packs.items():
        fill = sum(r["n_tokens"] for r in rows_in)
        if fill > budget:
            assert len(rows_in) == 1 and rows_in[0]["oversize"]
    for shard in {s for s, _ in packs}:
        ids = sorted(p for s, p in packs if s == shard)
        assert ids == list(range(len(ids)))


def test_results_invariant_to_shuffle_partitioning(spark):
    """Determinism across parallelism: the same query must produce the
    same multiset at 1 and at 7 shuffle partitions (summation order and
    partition boundaries must never leak into results — the property
    that makes sf0.01 correctness transfer to a 1000-executor layout)."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    names = ["q1_pricing_summary", "w2_count_window_avg", "dedup_exact_docs", "pack_concat_chunks"]
    q = entrymod.queries()
    results = {}
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("1", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                name: sorted(map(tuple, q[name](spark, sf).collect())) for name in names
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for name in names:
        assert results["1"][name] == results["7"][name], name


# ----------------------------------------------------- round-3 operators

_interval = st.tuples(
    st.integers(min_value=-50, max_value=50), st.integers(min_value=0, max_value=40)
).map(lambda t: (t[0], t[0] + t[1]))  # (lo, hi) with hi >= lo, possibly empty


@_settings
@given(
    a_iv=st.lists(_interval, min_size=0, max_size=12),
    b_iv=st.lists(_interval, min_size=0, max_size=12),
    width=st.sampled_from([1.0, 2.5, 7.0, 30.0, 1000.0]),
)
def test_interval_overlap_join_law(spark, a_iv, b_iv, width):
    """For ANY interval sets (negative coords, empty intervals, widths
    smaller and larger than every interval) the bucketized join equals
    the naive all-pairs overlap filter, each pair exactly once."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(a_iv)] or [(None, None, None)],
        "aid long, a_lo long, a_hi long",
    ).filter(F.col("aid").isNotNull())
    b = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(b_iv)] or [(None, None, None)],
        "bid long, b_lo long, b_hi long",
    ).filter(F.col("bid").isNotNull())
    got = [
        (r["aid"], r["bid"])
        for r in interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", width).collect()
    ]
    # the bare predicate alo<bhi AND blo<ahi is only equivalent to
    # non-empty intersection for NON-EMPTY intervals ([0,0) vs [-1,1)
    # satisfies it with an empty intersection) — the operator's
    # documented contract drops empty intervals, so the reference must
    # require both sides non-empty too.
    naive = sorted(
        (i, j)
        for i, (alo, ahi) in enumerate(a_iv)
        for j, (blo, bhi) in enumerate(b_iv)
        if alo < ahi and blo < bhi and alo < bhi and blo < ahi
    )
    assert sorted(got) == naive
    assert len(got) == len(set(got))


def _scd2_reference(dim_rows, upd_rows):
    """Python reference for scd2_merge on a single attr column."""
    out = [r for r in dim_rows if r[3] is not None]  # closed pass through
    by_key: dict = {}
    hist_end: dict = {}
    for k, v, vf, vt in dim_rows:
        hist_end[k] = max(hist_end.get(k, vf), vt if vt is not None else vf)
        if vt is None:
            by_key[k] = (k, v, vf)
    timelines: dict = {}
    for k, v, vf in by_key.values():
        timelines.setdefault(k, []).append((vf, 0, 0, v))
    import hashlib

    for k, v, ts in upd_rows:
        if k in hist_end and ts < hist_end[k]:
            continue  # late update dropped
        tb = int.from_bytes(hashlib.md5(v.encode()).digest()[:4], "big")
        timelines.setdefault(k, []).append((ts, 1, tb, v))
    for k, tl in timelines.items():
        tl.sort()
        prev = None
        surviving = []
        for ts, _src, _tb, v in tl:
            if prev is None or v != prev:
                surviving.append((ts, v))
            prev = v
        for i, (ts, v) in enumerate(surviving):
            nxt = surviving[i + 1][0] if i + 1 < len(surviving) else None
            out.append((k, v, ts, nxt))
    return sorted((k, v, vf, vt if vt is not None else -1) for k, v, vf, vt in out)


@_settings
@given(
    dim=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.sampled_from(["a", "b"]),
            st.integers(0, 10),
        ),
        min_size=0,
        max_size=4,
    ),
    upd=st.lists(
        st.tuples(
            st.integers(0, 4),
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 30),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: (t[0], t[2]),  # one update per (key, ts)
    ),
)
def test_scd2_merge_matches_python_reference(spark, dim, upd):
    """scd2_merge equals a direct Python replay for random histories and
    update batches: late-drop, change-collapse, interval chaining, and
    the one-open-version invariant all at once. Dim rows are built as
    consistent per-key chains (each key at most one current row)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.scd import (
        scd2_merge,
    )

    # build a CONSISTENT dim: per key, sort seeds and chain intervals,
    # last one open
    by_key: dict = {}
    for k, v, start in dim:
        by_key.setdefault(k, []).append((start, v))
    dim_rows = []
    for k, seeds in by_key.items():
        seeds.sort()
        for i, (start, v) in enumerate(seeds):
            nxt = seeds[i + 1][0] if i + 1 < len(seeds) else None
            dim_rows.append((k, v, start, nxt))
    # updates may not collide with the tb-hash tiebreak assumptions:
    # one update per (key, ts) is enforced by the strategy
    upd_rows = [(k, v, ts) for k, v, ts in upd]
    sdf_dim = spark.createDataFrame(
        dim_rows or [(None, None, None, None)],
        "k long, v string, valid_from long, valid_to long",
    ).filter(F.col("k").isNotNull())
    sdf_upd = spark.createDataFrame(
        upd_rows or [(None, None, None)], "k long, v string, ts long"
    ).filter(F.col("k").isNotNull())
    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"] if r["valid_to"] is not None else -1)
        for r in scd2_merge(sdf_dim, sdf_upd, ["k"], ["v"], "ts").collect()
    )
    assert got == _scd2_reference(dim_rows, upd_rows)


@_settings
@given(left_rows=_asof_left, right_map=_asof_right)
def test_asof_join_nearest_matches_reference(spark, left_rows, right_map):
    """direction='nearest' must pick the right row with the smallest
    |Δts| per key, TIES TO BACKWARD — checked against a brute-force
    python reference implementing exactly that contract (pandas
    merge_asof leaves tie order unspecified, so it cannot be the
    oracle here)."""
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid long, k string, ts long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right_map.items()], "k string, ts long, rv double"
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(left, right, ["k"], "ts", ["rv"], direction="nearest").collect()
    }

    by_key: dict = {}
    for (k, t), v in right_map.items():
        by_key.setdefault(k, []).append((t, v))
    expect = {}
    for i, (k, t) in enumerate(left_rows):
        cands = by_key.get(k, [])
        if not cands:
            expect[i] = None
            continue
        # smallest |Δ|; ties prefer the backward (≤ ts) candidate
        best = min(cands, key=lambda tv: (abs(tv[0] - t), 0 if tv[0] <= t else 1))
        expect[i] = best[1]
    assert got == expect


@_settings
@given(
    left_rows=_asof_left,
    right_map=_asof_right,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([0, 3, 10, 60]),
)
def test_asof_join_tolerance_matches_pandas(spark, left_rows, right_map, direction, tol):
    """asof_join with tolerance_seconds must agree with
    pandas.merge_asof(tolerance=) in all three directions — including
    tol=0 (exact-ts matches only) and a tolerance wider than the whole
    time domain (equivalent to unbounded)."""
    import pandas as pd

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid long, k string, ts long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right_map.items()], "k string, ts long, rv double"
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "ts", ["rv"],
            direction=direction, tolerance_seconds=tol,
        ).collect()
    }

    lpdf = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(left_rows)], columns=["lid", "k", "ts"])
    rpdf = pd.DataFrame([(k, t, v) for (k, t), v in right_map.items()], columns=["k", "ts", "rv"])
    merged = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]), rpdf.sort_values("ts"),
        on="ts", by="k", direction=direction, tolerance=tol,
    )
    for _, row in merged.iterrows():
        exp = None if pd.isna(row["rv"]) else row["rv"]
        assert got[row["lid"]] == exp, (row["lid"], got[row["lid"]], exp)


def test_ewma_integer_matches_python_reference_and_crosses_batches(spark):
    """ewma_integer (round 5 — the oracle-exact integer EWMA):

    1. equals a row-by-row Python reference of the floor-division
       recurrence on a multi-key frame with NULLs (NULL emits the
       carried state and never updates it);
    2. a single hot key larger than one Arrow batch (default 10k rows)
       still folds correctly — the partition-scan impl must carry state
       across mapInPandas batch boundaries, which a per-batch reset
       would corrupt exactly at row 10 001.
    """
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        ewma_integer,
    )

    rows = []
    vals = {}
    for k in ("a", "b"):
        y = None
        for i in range(50):
            x = None if i % 7 == 3 else (i * 31 + (17 if k == "a" else 5)) % 400
            rows.append((k, i, x))
            if x is not None:
                y = x if y is None else (80 * y + 20 * x) // 100
            vals[(k, i)] = y
        vals[(k, -1)] = None
        y = None
    df = spark.createDataFrame(rows, "k string, i long, x long")
    out = ewma_integer(df, ["k"], ["i"], "x", alpha_pct=20, out_col="y")
    got = {(r["k"], r["i"]): r["y"] for r in out.collect()}
    # rebuild the reference fold independently per key
    ref = {}
    for k in ("a", "b"):
        y = None
        for i in range(50):
            x = None if i % 7 == 3 else (i * 31 + (17 if k == "a" else 5)) % 400
            if x is not None:
                y = x if y is None else (80 * y + 20 * x) // 100
            ref[(k, i)] = y
    assert got == ref

    # hot key spanning multiple Arrow batches
    n = 25_000
    hot = spark.range(n).select(
        F.lit("hot").alias("k"), F.col("id").alias("i"), (F.col("id") % 997).alias("x")
    )
    out2 = ewma_integer(hot, ["k"], ["i"], "x", alpha_pct=20, out_col="y")
    last = out2.orderBy(F.desc("i")).limit(1).collect()[0]["y"]
    y = None
    for i in range(n):
        x = i % 997
        y = x if y is None else (80 * y + 20 * x) // 100
    assert last == y

    # float value columns must be rejected at plan time, not silently
    # rounded (and not as a worker-side surprise)
    import pytest as _pytest

    bad = spark.createDataFrame([("a", 1, 1.5)], "k string, i long, x double")
    with _pytest.raises(TypeError, match="integer value column"):
        ewma_integer(bad, ["k"], ["i"], "x")


_lev_words = st.lists(
    st.text(alphabet="abcx", min_size=0, max_size=6), min_size=1, max_size=12
)


@_settings
@given(left_words=_lev_words, right_words=_lev_words)
def test_levenshtein_neighborhood_join_recall_1_property(
    spark, left_words, right_words
):
    """The Symmetric-Delete candidate tier must find EVERY pair at
    ED <= 1 (recall 1) and the confirm must keep nothing past it —
    checked against a brute-force DP over random short strings from a
    tiny alphabet (maximizing collisions, empty strings included)."""
    import itertools

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        levenshtein_neighborhood_join,
    )

    def ed(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    lrows = list(enumerate(left_words))
    rrows = [(100 + i, w) for i, w in enumerate(right_words)]
    left = spark.createDataFrame(lrows, "id long, name string")
    right = spark.createDataFrame(rrows, "rid long, rname string")
    got = {
        (r["left_id"], r["right_id"]): r["edit_distance"]
        for r in levenshtein_neighborhood_join(
            left, right, "id", "rid", "name", "rname"
        ).collect()
    }
    want = {
        (lid, rid): ed(lw, rw)
        for (lid, lw), (rid, rw) in itertools.product(lrows, rrows)
        if ed(lw, rw) <= 1
    }
    assert got == want


_lev2_words = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=5), min_size=1, max_size=8
)


@_settings
@given(left_words=_lev2_words, right_words=_lev2_words)
def test_levenshtein2_recall_1_on_run_heavy_strings_property(
    spark, left_words, right_words
):
    """Radius-2 recall 1 on a BINARY alphabet — the adversarial input
    for the round-11 run-canonical variant dedup (deleting any char of
    an equal-char run yields the same variant, so the rewrite prunes
    to run-initial positions; a pruning bug would LOSE a variant class
    and surface here as a missed ED<=2 pair). Ground truth is the full
    DP over every cross pair; the confirm must also keep nothing past
    distance 2."""
    import itertools

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        levenshtein_neighborhood_join,
    )

    def ed(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    lrows = list(enumerate(left_words))
    rrows = [(100 + i, w) for i, w in enumerate(right_words)]
    left = spark.createDataFrame(lrows, "id long, name string")
    right = spark.createDataFrame(rrows, "rid long, rname string")
    got = {
        (r["left_id"], r["right_id"]): r["edit_distance"]
        for r in levenshtein_neighborhood_join(
            left, right, "id", "rid", "name", "rname", max_edit=2
        ).collect()
    }
    want = {
        (lid, rid): ed(lw, rw)
        for (lid, lw), (rid, rw) in itertools.product(lrows, rrows)
        if ed(lw, rw) <= 2
    }
    assert got == want


_kcore_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw_edges=_kcore_edges, k=st.integers(1, 4))
def test_kcore_peel_matches_brute_force_property(spark, raw_edges, k):
    """Fixed-round peeling must equal the fixpoint of brute-force
    peeling on random small graphs (10 nodes ≤ 25 edges converge well
    inside 6 rounds), including in-core degrees and the converged
    flag."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.graph import (
        kcore_peel,
    )

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for u in [u for u, s in adj.items() if len(s) < k]:
            for v in adj[u]:
                adj[v].discard(u)
            del adj[u]
            changed = True
    want = {u: len(s) for u, s in adj.items()}

    df = spark.createDataFrame(edges, "u long, v long")
    kdf = spark.createDataFrame([(k,)], "k long")
    rows = kcore_peel(df, kdf, rounds=6).collect()
    got = {r["node"]: r["core_degree"] for r in rows}
    assert got == want
    # converged whenever a core exists (6 rounds >> the cascade depth here)
    assert all(r["converged"] == 1 for r in rows)


def test_fellegi_sunter_scores_separate_true_from_false_matches(spark):
    """The FS decision model's point: true (dirty→its own master row)
    candidate pairs must score ABOVE false candidates (name collisions)
    on average, and agreement weights must be positive / disagreement
    negative (m > u for every field on this corpus)."""
    import __spark_entry__ as entrymod

    df = entrymod.er_fellegi_sunter_scores(spark, SF_DIR)
    rows = df.collect()
    true_scores = [r["fs_score_micro"] for r in rows if r["is_true_match"] == 1]
    false_scores = [r["fs_score_micro"] for r in rows if r["is_true_match"] == 0]
    assert len(true_scores) > 0
    # recall 1 on the blocked join: every dirty record's own master row
    # is a candidate (the name corruption is a single substitution)
    n_dirty = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert len(true_scores) == n_dirty
    if false_scores:  # tiny sf may have no collisions
        mean_t = sum(true_scores) / len(true_scores)
        mean_f = sum(false_scores) / len(false_scores)
        assert mean_t > mean_f


def test_markov_stationary_is_a_fixed_point_within_floor_leak(spark):
    """After 12 integer power steps the vector must be (a) a near-unit
    mass (leak < k micro-units per step · 12 steps), and (b) stable:
    one MORE step moves no component by more than the floor-leak bound
    — i.e. the chain has actually converged, the result isn't a
    mid-transient snapshot."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    pi = {
        r["event_type"]: r["stationary_micro"]
        for r in entrymod.events_markov_stationary(spark, SF_DIR).collect()
    }
    k = len(pi)
    assert k >= 2
    total = sum(pi.values())
    assert 1_000_000 - 13 * k <= total <= 1_000_000
    # one more step by hand over the same transition matrix
    ev = entrymod._t(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    pairs = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("f"), F.col("event_type").alias("t"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    tot = {}
    for r in pairs:
        tot[r["f"]] = tot.get(r["f"], 0) + r["c"]
    p = {(r["f"], r["t"]): (r["c"] * 1_000_000) // tot[r["f"]] for r in pairs}
    nxt = {
        t: sum(pi[f] * p.get((f, t), 0) for f in pi) // 1_000_000 for t in pi
    }
    for t in pi:
        assert abs(nxt[t] - pi[t]) <= k + 1, (t, nxt[t], pi[t])
