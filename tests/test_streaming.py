"""Streaming tests: batch↔stream equivalence for the W1–W4 stateful
ports (SURVEY.md §5.2 item 3) and watermarked time/session windows.

Equivalence harness: the same rows are written as MULTIPLE parquet
files; the stream reads them with ``maxFilesPerTrigger=1`` so state
genuinely carries across micro-batches, then drains into the memory
sink with availableNow. Stream results must equal the batch operator
on the union of the files.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
    rows_between_breaches,
    running_max,
    tumbling_count_window_avg,
)
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
    rows_between_breaches_stream,
    running_max_stream,
    running_max_transform_with_state,
    session_window_agg,
    tumbling_count_window_avg_stream,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """60 rows over 2 keys, staged as 3 parquet files (3 micro-batches).

    seq is globally ordered across files so micro-batch order (file 0,
    then 1, then 2) extends the per-batch ``order_cols`` sort to a
    deterministic global order — required for exact equivalence checks.
    """
    root = str(tmp_path_factory.mktemp("stream_in"))
    rows = []
    for i in range(60):
        key = "a" if i % 2 == 0 else "b"
        rows.append((key, i, float((i * 37) % 101)))
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    for part in range(3):
        chunk = df.filter((F.col("seq") >= part * 20) & (F.col("seq") < (part + 1) * 20))
        chunk.coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "v")
    return root, batch


def _stream(spark, root):
    return (
        spark.readStream.schema("k string, seq long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
        .select("k", "seq", "v")
    )


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def test_running_max_stream_equals_batch(spark, staged):
    root, batch = staged
    out = _drain(running_max_stream(_stream(spark, root), ["k"], ["seq"], "v"), "w1_stream")
    got = out.collect()
    assert len(got) == 60  # one emission per input row (reference W1 semantics)
    expected = {
        (r["k"], r["v"]): r["rm"]
        for r in running_max(batch, ["k"], ["seq"], "v", "rm").collect()
    }
    # (k, v) is unique here: v = (seq*37)%101 distinct per parity class
    for r in got:
        assert expected[(r["k"], r["v"])] == r["running_max"]


def test_running_max_stream_composite_key_w4(spark, staged):
    """W4 = W1 with a composite key (MaxTradeVolumePerYearPerMonth's
    (year, month) ↔ (k, k2) here); the MapState collapses to ValueState
    per composite key, so the same fold must hold per (k, k2) group."""
    root, batch = staged
    stream_in = _stream(spark, root).withColumn("k2", F.col("seq") % 3)
    out = _drain(
        running_max_stream(stream_in, ["k", "k2"], ["seq"], "v"), "w4_stream"
    )
    got = out.collect()
    assert len(got) == 60
    batch2 = batch.withColumn("k2", F.col("seq") % 3)
    expected = {
        (r["k"], r["k2"], r["v"]): r["rm"]
        for r in running_max(batch2, ["k", "k2"], ["seq"], "v", "rm").collect()
    }
    for r in got:
        assert expected[(r["k"], r["k2"], r["v"])] == r["running_max"]


def test_count_window_stream_equals_batch(spark, staged):
    root, batch = staged
    out = _drain(
        tumbling_count_window_avg_stream(_stream(spark, root), ["k"], ["seq"], "v", window_size=10),
        "w2_stream",
    )
    got = sorted((r["k"], r["avg_value"]) for r in out.collect())
    exp_df = tumbling_count_window_avg(batch, ["k"], ["seq"], "v", window_size=10)
    expected = sorted((r["k"], r["avg_value"]) for r in exp_df.collect())
    # 30 rows per key → cycles of 11 → 2 complete windows per key
    assert len(got) == 4
    assert got == expected


def test_breach_stream_equals_batch(spark, staged):
    root, batch = staged
    out = _drain(
        rows_between_breaches_stream(_stream(spark, root), ["k"], ["seq"], "v", 80.0, "seq"),
        "w3_stream",
    )
    got = sorted((r["k"], r["seq"], r["rows_since_prev_breach"]) for r in out.collect())
    exp = rows_between_breaches(
        batch, ["k"], ["seq"], breach=F.col("v") >= 80.0, emit_cols=["k", "seq"]
    )
    expected = sorted((r["k"], r["seq"], r["rows_since_prev_breach"]) for r in exp.collect())
    assert got == expected and len(got) > 0


def test_running_max_transform_with_state_equals_batch(spark, staged):
    """Same equivalence as the applyInPandasWithState form, through the
    Spark 4 transformWithStateInPandas API (typed state handles).

    Requires a working protobuf install (the TWS driver worker speaks
    protobuf to the JVM); skipped where the dependency is absent."""
    pytest.importorskip("google.protobuf.descriptor")
    root, batch = staged
    out = _drain(
        running_max_transform_with_state(_stream(spark, root), ["k"], ["seq"], "v"), "w1_tws"
    )
    got = out.collect()
    assert len(got) == 60
    expected = {
        (r["k"], r["v"]): r["rm"]
        for r in running_max(batch, ["k"], ["seq"], "v", "rm").collect()
    }
    for r in got:
        assert expected[(r["k"], r["v"])] == r["running_max"]


def test_late_data_dropped_by_watermark(spark):
    """A late row whose window was already finalized and EVICTED in a
    prior micro-batch is dropped. (A late row arriving in the same batch
    that closes its window still merges before emission — eviction, not
    watermark comparison alone, is the drop boundary.)"""
    import time

    with tempfile.TemporaryDirectory() as root:
        batches = [
            [(5, "u", 1.0), (200, "u", 1.0)],   # b0: window 0 gets 1.0; wm → 190
            [(400, "u", 1.0)],                  # b1: window 0 emitted + evicted; wm → 390
            [(6, "u", 100.0), (600, "u", 1.0)], # b2: 6s is late beyond eviction → dropped
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "sec long, k string, v double").withColumn(
                "ts", F.timestamp_seconds(F.col("sec"))
            ).coalesce(1).write.parquet(os.path.join(root, f"f{i}"))
            time.sleep(1.1)  # distinct mod times → stable batch order
        stream = (
            spark.readStream.schema("sec long, k string, v double, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "f*"))
        )
        agged = tumbling_window_agg(
            stream, "ts", "10 seconds",
            [F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n")],
            key_cols=["k"], watermark="10 seconds",
        )
        out = _drain(agged, "late_drop_stream")
        got = {int(r["window"]["start"].timestamp()): (r["sum_v"], r["n"]) for r in out.collect()}
        assert got.get(0) == (1.0, 1)  # the late 100.0 never lands anywhere
        assert not any(v[0] == 100.0 or v[0] == 101.0 for v in got.values())


def test_stream_stream_join_with_watermarks(spark):
    """Watermarked stream-stream inner equi-join with a time-range
    predicate (the bounded-state join; SURVEY.md §2.6 joins row)."""
    with tempfile.TemporaryDirectory() as root:
        clicks = spark.createDataFrame(
            [(1, "u", 10), (2, "v", 20)], "cid long, user string, csec long"
        ).withColumn("cts", F.timestamp_seconds(F.col("csec")))
        views = spark.createDataFrame(
            [(11, "u", 8), (12, "u", 300), (13, "v", 19)], "vid long, vuser string, vsec long"
        ).withColumn("vts", F.timestamp_seconds(F.col("vsec")))
        clicks.coalesce(1).write.parquet(os.path.join(root, "c"))
        views.coalesce(1).write.parquet(os.path.join(root, "v"))
        cs = spark.readStream.schema(clicks.schema).parquet(os.path.join(root, "c")).withWatermark("cts", "30 seconds")
        vs = spark.readStream.schema(views.schema).parquet(os.path.join(root, "v")).withWatermark("vts", "30 seconds")
        joined = cs.join(
            vs,
            (F.col("user") == F.col("vuser"))
            & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 5 SECONDS"))
            & (F.col("vts") <= F.col("cts")),
            "inner",
        ).select("cid", "vid")
        out = _drain(joined, "ss_join")
        got = sorted((r["cid"], r["vid"]) for r in out.collect())
        assert got == [(1, 11), (2, 13)]  # the 300s view is outside every click's range


def test_tumbling_window_agg_stream_watermark_finalization(spark):
    """Append mode only emits windows the watermark has passed: the
    window containing the stream's tail stays open (withheld) until a
    later micro-batch advances the watermark beyond its end."""
    with tempfile.TemporaryDirectory() as root:
        rows = [(i, "u", float(i)) for i in range(20)]
        df = spark.createDataFrame(rows, "sec long, k string, v double").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        )
        df.coalesce(1).write.parquet(os.path.join(root, "f0"))
        # second micro-batch: a single event far in the future advances
        # the watermark to 55s, finalizing both earlier windows.
        late = spark.createDataFrame([(60, "u", 0.0)], "sec long, k string, v double").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        )
        late.coalesce(1).write.parquet(os.path.join(root, "f1"))
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "f*"))
        )
        agged = tumbling_window_agg(
            stream, "ts", "10 seconds",
            [F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n")],
            key_cols=["k"], watermark="5 seconds",
        )
        out = _drain(agged, "tumble_stream")
        got = {int(r["window"]["start"].timestamp()): (r["sum_v"], r["n"]) for r in out.collect()}
        assert got.get(0) == (45.0, 10)    # 0..9, finalized
        assert got.get(10) == (145.0, 10)  # 10..19, finalized by the 60s event
        assert len(got) == 2               # the 60s window itself is still open → withheld


def test_ohlc_stream_equals_batch(spark):
    """Streaming OHLC bars: the same min_by/max_by candle aggregates as
    batch ohlc_bars run inside a watermarked tumbling window — the
    stream must reproduce the batch bars exactly for every finalized
    window (append mode withholds the open tail window; a far-future
    sentinel finalizes the real data's bars). This is the streaming
    twin of events_ohlc_hourly: the reference's whole domain
    (per-key price extrema over an unbounded feed,
    MaximumClosingPrice.java:47-82) as one declarative window agg."""
    with tempfile.TemporaryDirectory() as root:
        rows = [
            (i, "A" if i % 2 == 0 else "B", float((i * 37) % 101)) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "sec long, sym string, px double").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        )
        for part in range(2):
            df.filter((F.col("sec") >= part * 20) & (F.col("sec") < (part + 1) * 20)) \
                .coalesce(1).write.parquet(os.path.join(root, f"f{part}"))
        sentinel = spark.createDataFrame(
            [(3600, "A", 0.0)], "sec long, sym string, px double"
        ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
        sentinel.coalesce(1).write.parquet(os.path.join(root, "f9"))

        order = F.struct(F.col("ts"), F.col("sec"))
        aggs = [
            F.min_by("px", order).alias("open"),
            F.max("px").alias("high"),
            F.min("px").alias("low"),
            F.max_by("px", order).alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        ]
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "f*"))
        )
        agged = tumbling_window_agg(
            stream, "ts", "10 seconds", aggs, key_cols=["sym"], watermark="5 seconds"
        )
        out = _drain(agged, "ohlc_stream")
        got = {
            (r["sym"], int(r["window"]["start"].timestamp())): (
                r["open"], r["high"], r["low"], r["close"], r["volume"],
            )
            for r in out.collect()
        }
        batch = spark.read.parquet(os.path.join(root, "f0"), os.path.join(root, "f1"))
        expect = {
            (r["sym"], int(r["w"]["start"].timestamp())): (
                r["open"], r["high"], r["low"], r["close"], r["volume"],
            )
            for r in batch.groupBy(F.window("ts", "10 seconds").alias("w"), "sym")
            .agg(*aggs)
            .collect()
        }
        assert got == expect and len(got) == 8  # 4 buckets × 2 syms, all finalized


def test_session_window_agg_stream(spark):
    """Sessions merge within the 30s gap; only sessions the watermark
    has closed are emitted in append mode (the 100s session stays open)."""
    with tempfile.TemporaryDirectory() as root:
        rows = [(0, "u"), (5, "u"), (100, "u"), (3, "w")]
        df = spark.createDataFrame(rows, "sec long, k string").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        )
        df.coalesce(1).write.parquet(os.path.join(root, "f0"))
        stream = spark.readStream.schema(df.schema).parquet(os.path.join(root, "f*"))
        agged = session_window_agg(
            stream, "ts", "30 seconds", [F.count(F.lit(1)).alias("n")],
            key_cols=["k"], watermark="10 seconds",
        )
        out = _drain(agged, "session_stream")
        got = sorted((r["k"], r["n"]) for r in out.collect())
        assert got == [("u", 2), ("w", 1)]


def test_stateful_stream_recovers_from_checkpoint(spark, tmp_path):
    """Keyed state must survive a query restart — the Structured
    Streaming analog of Flink's checkpointed keyed state (the reference
    relies on Flink state being durable across failures). Run 1 drains
    two files through running_max_stream with a checkpoint; run 2 adds a
    third file and restarts FROM THE SAME CHECKPOINT: it must process
    only the new file, with per-key maxima carried over, and the union
    of both runs' emissions must equal the batch operator on all rows."""
    root = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")
    rows = [("a" if i % 2 == 0 else "b", i, float((i * 53) % 97)) for i in range(45)]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    for part, (lo, hi) in enumerate([(0, 15), (15, 30)]):
        df.filter((F.col("seq") >= lo) & (F.col("seq") < hi)).coalesce(1).write.parquet(
            os.path.join(root, f"part={part}")
        )

    def run():
        stream = (
            spark.readStream.schema("k string, seq long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "part=*"))
            .select("k", "seq", "v")
        )
        q = (
            running_max_stream(stream, ["k"], ["seq"], "v")
            .writeStream.format("parquet")  # memory sink can't recover; file sink can
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).collect()

    first = run()
    assert len(first) == 30
    df.filter(F.col("seq") >= 30).coalesce(1).write.parquet(os.path.join(root, "part=2"))
    both = run()
    assert len(both) == 45  # 15 new emissions appended — no reprocessing of files 0-1

    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "v")
    expected = {
        (r["k"], r["v"]): r["rm"]
        for r in running_max(batch, ["k"], ["seq"], "v", "rm").collect()
    }
    # every emission across BOTH runs reflects state carried over the
    # restart (the second run's per-key maxima start from run 1's state)
    for r in both:
        assert expected[(r["k"], r["v"])] == r["running_max"]


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        streaming_dedup,
    )

    # the same digests recur across files: state must carry between
    # micro-batches for the second occurrence to be dropped
    root = str(tmp_path / "dedup_in")
    rows0 = [(1, "aaa"), (2, "bbb"), (3, "aaa")]
    rows1 = [(4, "aaa"), (5, "ccc"), (6, "bbb")]
    for part, rows in enumerate((rows0, rows1)):
        spark.createDataFrame(rows, "doc_id long, digest string").coalesce(1).write.parquet(
            os.path.join(root, f"part={part}")
        )
    stream = (
        spark.readStream.schema("doc_id long, digest string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
        .select("doc_id", "digest")
    )
    out = _drain(streaming_dedup(stream, ["digest"]), "dedup_stream")
    got = {r["digest"]: r["doc_id"] for r in out.collect()}
    # one survivor per digest, and survivors come from the first
    # micro-batch that saw the digest
    assert set(got) == {"aaa", "bbb", "ccc"}
    assert got["aaa"] in (1, 3) and got["bbb"] == 2 and got["ccc"] == 5
    assert out.count() == 3


def test_streaming_dedup_arg_validation(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        streaming_dedup,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, digest string")
    with pytest.raises(ValueError):
        streaming_dedup(df, ["digest"], ts_col="ts")  # watermark missing
    # batch DataFrame + no watermark degrades to plain dropDuplicates
    assert streaming_dedup(df, ["digest"]).count() == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        streaming_dedup,
    )

    root = str(tmp_path / "dedup_wm_in")
    # batch 0: digest d at 10:00.  batch 1: dup of d at 10:05 (inside
    # horizon, dropped) + watermark advancer.  batch 2: second advancer —
    # the watermark (11:00 − 10 min) now exceeds d's expiry, and state
    # cleanup runs at the end of this batch.  batch 3: d again — its
    # state is gone, so it RE-EMITS: horizon-bounded dedup semantics,
    # asserted explicitly rather than left as a surprise.
    batches = [
        [("d", "2024-01-01 10:00:00")],
        [("d", "2024-01-01 10:05:00"), ("adv", "2024-01-01 11:00:00")],
        [("adv2", "2024-01-01 12:00:00")],
        [("d", "2024-01-01 12:30:00")],
    ]
    for part, rows in enumerate(batches):
        spark.createDataFrame(rows, "digest string, ts_s string").withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("digest", "ts").coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    stream = (
        spark.readStream.schema("digest string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
    )
    out = _drain(
        streaming_dedup(stream, ["digest"], ts_col="ts", watermark="10 minutes"),
        "dedup_wm_stream",
    )
    per_digest = {r["digest"]: r["n"] for r in out.groupBy("digest").agg(F.count("*").alias("n")).collect()}
    assert per_digest["adv"] == 1 and per_digest["adv2"] == 1
    assert per_digest["d"] == 2  # emitted at 10:00 and again after eviction


def test_foreach_batch_sink_writes_all_batches(spark, tmp_path):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        run_stream_foreach_batch,
    )

    root = str(tmp_path / "fb_in")
    for part in range(3):
        spark.createDataFrame(
            [(part * 10 + i, float(i)) for i in range(5)], "id long, v double"
        ).coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
    )
    out_dir = str(tmp_path / "fb_out")
    seen_batches = []

    def sink(batch_df, batch_id):
        seen_batches.append(batch_id)
        # any batch writer works unchanged inside foreachBatch
        batch_df.write.mode("append").parquet(out_dir)

    run_stream_foreach_batch(stream.filter(F.col("v") >= 1), sink, output_mode="append")
    assert len(seen_batches) == 3 and seen_batches == sorted(seen_batches)
    got = spark.read.parquet(out_dir)
    assert got.count() == 12  # 4 rows (v>=1) x 3 files
    assert got.agg(F.min("v")).first()[0] == 1.0


def test_running_max_stream_multi_chunk_ordering(spark, tmp_path):
    """A key whose micro-batch volume exceeds the Arrow batch size
    arrives at the fold as MULTIPLE pandas chunks; the fold must sort
    across chunks, not per-chunk. Shrinking maxRecordsPerBatch to 7
    forces a 40-row batch through ~6 chunks, with rows written in
    REVERSED seq order so any chunk-local sort gives wrong maxima."""
    root = str(tmp_path / "chunked")
    rows = [("a", i, float((i * 37) % 101)) for i in range(40)]
    df = spark.createDataFrame(list(reversed(rows)), "k string, seq long, v double")
    df.coalesce(1).write.parquet(os.path.join(root, "part=0"))

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = _drain(
            running_max_stream(_stream(spark, root), ["k"], ["seq"], "v"),
            "chunked_runmax",
        )
        got = {(r["k"], r["v"]): r["running_max"] for r in out.collect()}
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    # sequential replay in seq order
    cur, expected = None, {}
    for k, seq, v in rows:
        cur = v if cur is None else max(cur, v)
        expected[(k, v)] = cur
    assert len(got) == len(expected)
    for kk, exp in expected.items():
        assert got[kk] == exp, (kk, got[kk], exp)


def test_w1_reference_csv_streamed_equals_batch(spark, hdfc_path, tmp_path):
    """The reference-parity closure: stream the reference's own HDFC.csv
    through the W1 streaming port and require the FULL per-row emission
    stream (all 5,204 rows, keyed by year) to match the batch
    window-function form row-for-row — the same dataflow the Flink job
    runs (MaximumClosingPrice.java:47-82), on the same file, with the
    arrival order made explicit (HDFC.csv dates are unique and sorted)."""
    import shutil

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        running_max,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_quotes_csv,
        read_quotes_stream,
    )

    stream_dir = str(tmp_path / "quotes_in")
    os.makedirs(stream_dir)
    shutil.copy(hdfc_path, os.path.join(stream_dir, "HDFC.csv"))

    stream = read_quotes_stream(spark, stream_dir).withColumn("yr", F.year("date"))
    out = _drain(
        running_max_stream(stream, ["yr"], ["date"], "close"),
        "hdfc_w1_stream",
    )
    from collections import Counter

    got = Counter(
        (r["yr"], round(r["close"], 4), round(r["running_max"], 4)) for r in out.collect()
    )
    assert sum(got.values()) == 5204

    batch = read_quotes_csv(spark, hdfc_path).withColumn("yr", F.year("date"))
    expected = Counter(
        (r["yr"], round(r["close"], 4), round(r["m"], 4))
        for r in running_max(batch, ["yr"], ["date", "row_id"], "close", "m")
        .select("yr", "close", "m")
        .collect()
    )
    assert sum(expected.values()) == 5204
    assert got == expected


def test_w2_w3_w4_reference_csv_streamed_equal_batch(spark, hdfc_path, tmp_path):
    """Parity closure for the remaining three reference queries: stream
    the reference's own HDFC.csv through the W2/W3/W4 streaming ports
    and require each full emission multiset to equal its batch
    window-function form (RollingAverageHighPrice.java:56-113,
    DaysSincePriceThreshold.java:61-102,
    MaxTradeVolumePerYearPerMonth.java:53-91)."""
    import shutil
    from collections import Counter

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        rows_between_breaches,
        running_max,
        tumbling_count_window_avg,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_quotes_csv,
        read_quotes_stream,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        rows_between_breaches_stream,
    )

    stream_dir = str(tmp_path / "quotes_in")
    os.makedirs(stream_dir)
    shutil.copy(hdfc_path, os.path.join(stream_dir, "HDFC.csv"))
    batch = read_quotes_csv(spark, hdfc_path)

    # W2: 50-row tumbling average of high, keyed by symbol
    s2 = _drain(
        tumbling_count_window_avg_stream(
            read_quotes_stream(spark, stream_dir), ["symbol"], ["date"], "high"
        ),
        "hdfc_w2_stream",
    )
    got2 = Counter((r["symbol"], round(r["avg_value"], 4)) for r in s2.collect())
    exp2 = Counter(
        (r["symbol"], round(r["avg_value"], 4))
        for r in tumbling_count_window_avg(
            batch, ["symbol"], ["date", "row_id"], "high", 50
        ).collect()
    )
    assert sum(got2.values()) == 102 and got2 == exp2

    # W3: rows between close >= 300 breaches, emitting the date
    s3 = _drain(
        rows_between_breaches_stream(
            read_quotes_stream(spark, stream_dir), ["symbol"], ["date"], "close", 300.0, "date"
        ),
        "hdfc_w3_stream",
    )
    got3 = Counter((r["symbol"], r["date"], r["rows_since_prev_breach"]) for r in s3.collect())
    exp3 = Counter(
        (r["symbol"], r["date"], r["rows_since_prev_breach"])
        for r in rows_between_breaches(
            batch, ["symbol"], ["date", "row_id"], F.col("close") >= 300.0,
            emit_cols=["symbol", "date"],
        ).collect()
    )
    assert sum(got3.values()) == 5191 and got3 == exp3

    # W4: running max volume per (year, month) composite key
    stream4 = (
        read_quotes_stream(spark, stream_dir)
        .withColumn("yr", F.year("date"))
        .withColumn("mo", F.month("date"))
    )
    s4 = _drain(
        running_max_stream(stream4, ["yr", "mo"], ["date"], "volume"), "hdfc_w4_stream"
    )
    got4 = Counter(
        (r["yr"], r["mo"], round(r["volume"], 4), round(r["running_max"], 4)) for r in s4.collect()
    )
    batch4 = batch.withColumn("yr", F.year("date")).withColumn("mo", F.month("date"))
    exp4 = Counter(
        (r["yr"], r["mo"], round(r["volume"], 4), round(r["m"], 4))
        for r in running_max(batch4, ["yr", "mo"], ["date", "row_id"], "volume", "m").collect()
    )
    assert sum(got4.values()) == 5204 and got4 == exp4


def test_stream_emits_null_not_nan(spark, tmp_path):
    """Batch↔stream NULL parity: before any non-null value the running
    max is a genuine Spark NULL (not float NaN — distinct in joins/
    sorts/aggs), NULL inputs round-trip as NULLs, and a W2 window of
    all NULLs averages to NULL."""
    root = str(tmp_path / "null_in")
    rows = [("a", 0, None), ("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, 2.0)]
    spark.createDataFrame(rows, "k string, seq long, v double").coalesce(1).write.parquet(
        os.path.join(root, "part=0")
    )
    out = _drain(running_max_stream(_stream(spark, root), ["k"], ["seq"], "v"), "null_w1")
    got = {r["seq"] if "seq" in r else i: r for i, r in enumerate(out.collect())}
    rows_out = out.orderBy("v", ascending=False).collect()
    # NULL-ness probed through Spark SQL itself: isnan must be false everywhere
    assert out.filter(F.isnan("running_max")).count() == 0
    assert out.filter(F.col("running_max").isNull()).count() == 2  # the two leading rows
    assert out.filter(F.col("v").isNull()).count() == 3            # NULL inputs stay NULL

    # W2: a full window of NULL values emits a NULL average
    root2 = str(tmp_path / "null_w2_in")
    rows2 = [("a", i, None) for i in range(5)] + [("a", 5, 9.0)]
    spark.createDataFrame(rows2, "k string, seq long, v double").coalesce(1).write.parquet(
        os.path.join(root2, "part=0")
    )
    out2 = _drain(
        tumbling_count_window_avg_stream(_stream(spark, root2), ["k"], ["seq"], "v", window_size=5),
        "null_w2",
    )
    vals = out2.collect()
    assert len(vals) == 1
    assert vals[0]["avg_value"] is None
    assert out2.filter(F.isnan("avg_value")).count() == 0


def test_running_agg_update_mode_converges_to_batch(spark, staged):
    """The idiomatic update-mode W1: the LAST update per key across all
    micro-batches must equal the batch final max, and earlier updates
    must be monotonically non-decreasing (state carried, never reset)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        running_agg_update_stream,
    )

    root, batch = staged
    agged = running_agg_update_stream(
        _stream(spark, root), ["k"], [F.max("v").alias("max_v"), F.count(F.lit(1)).alias("n")]
    )
    q = (
        agged.writeStream.format("memory")
        .queryName("w1_update_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("w1_update_stream").collect()
    # one update row per (key, micro-batch that touched it): 2 keys x 3 files
    per_key = {}
    for r in rows:
        per_key.setdefault(r["k"], []).append((r["n"], r["max_v"]))
    expected = {
        r["k"]: (r["n"], r["max_v"])
        for r in batch.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.max("v").alias("max_v")
        ).collect()
    }
    assert set(per_key) == set(expected)
    for k, updates in per_key.items():
        updates.sort()  # n grows with each micro-batch that touched the key
        assert updates[-1] == expected[k]
        maxes = [m for _, m in updates]
        assert maxes == sorted(maxes)  # running max never decreases
        assert len(updates) == 3


def test_ewma_batch_ground_truth_and_stream_parity(spark):
    """EWMA fold: hand-computed recursion ground truth, NULL carry
    semantics, and bit-exact batch↔stream parity across micro-batch
    boundaries (the one-float carried state restarts the pandas kernel
    exactly)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        ewma,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        ewma_stream,
    )

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, None), ("a", 4, 40.0),
        ("b", 1, None), ("b", 2, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    got = {(r["k"], r["seq"]): r["ewma"] for r in ewma(df, ["k"], ["seq"], "v", alpha=0.5).collect()}
    # a: y1=10; y2=.5*10+.5*20=15; NULL row carries 15; y4=.5*15+.5*40=27.5
    assert got[("a", 1)] == 10.0 and got[("a", 2)] == 15.0
    assert got[("a", 3)] == 15.0 and got[("a", 4)] == 27.5
    # b: NULL before first valid → NULL, then seeds at 8
    assert got[("b", 1)] is None and got[("b", 2)] == 8.0
    with pytest.raises(ValueError):
        ewma(df, ["k"], ["seq"], "v", alpha=0.0)

    # parity: replay the same rows through 3 file micro-batches
    with tempfile.TemporaryDirectory() as root:
        for i, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
            spark.createDataFrame(chunk, "k string, seq long, v double").coalesce(1).write.parquet(
                os.path.join(root, f"f{i}")
            )
        stream = spark.readStream.schema("k string, seq long, v double").option(
            "maxFilesPerTrigger", 1
        ).parquet(os.path.join(root, "f*"))
        out = ewma_stream(stream, ["k"], ["seq"], "v", alpha=0.5)
        q = (
            out.writeStream.format("memory")
            .queryName("ewma_par")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r["k"], r["v"]): r["ewma"] for r in spark.table("ewma_par").collect()
        }
        batch = {
            (r["k"], r["v"]): r["ewma"] for r in ewma(df, ["k"], ["seq"], "v", alpha=0.5).collect()
        }
        assert streamed == batch  # exact equality, not approx


def test_ewma_stream_recovers_from_checkpoint(spark, tmp_path):
    """The EWMA's one-float carried state must survive a query restart:
    run 2 restarts from run 1's checkpoint, processes only the new
    file, and every emission across both runs must equal the batch fold
    bit-for-bit (a lost or reset mean would shift every post-restart
    value)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        ewma,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        ewma_stream,
    )

    root = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")
    rows = [("a" if i % 2 == 0 else "b", i, float((i * 31) % 83)) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    df.filter(F.col("seq") < 20).coalesce(1).write.parquet(os.path.join(root, "part=0"))

    def run():
        stream = (
            spark.readStream.schema("k string, seq long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "part=*"))
            .select("k", "seq", "v")
        )
        q = (
            ewma_stream(stream, ["k"], ["seq"], "v", alpha=0.3)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).collect()

    assert len(run()) == 20
    df.filter(F.col("seq") >= 20).coalesce(1).write.parquet(os.path.join(root, "part=1"))
    both = run()
    assert len(both) == 30  # only the new file processed after restart
    expected = {
        (r["k"], r["v"]): r["ewma"]
        for r in ewma(df, ["k"], ["seq"], "v", alpha=0.3).collect()
    }
    for r in both:
        assert expected[(r["k"], r["v"])] == r["ewma"]  # exact, incl. post-restart


def test_fill_forward_stream_equals_batch(spark, tmp_path):
    """Streaming forward-fill must equal the batch window form across
    micro-batch boundaries — a NULL at the head of batch 2 must take
    the value carried from batch 1's state, not restart at NULL."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        fill_forward,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        fill_forward_stream,
    )

    root = str(tmp_path / "ff_in")
    rows = []
    for i in range(40):
        key = "a" if i % 2 == 0 else "b"
        v = None if i % 3 == 0 else float(i)  # NULLs straddle file edges
        rows.append((key, i, v))
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    for part in range(2):
        df.filter((F.col("seq") >= part * 20) & (F.col("seq") < (part + 1) * 20)) \
            .coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "v")

    out = _drain(fill_forward_stream(_stream(spark, root), ["k"], ["seq"], "v"), "ff_stream")
    got = {(r["k"], r["v"]): r["filled"] for r in out.collect() if r["v"] is not None}
    got_n = out.count()
    expect_df = fill_forward(batch, ["k"], ["seq"], "v")
    expect = {(r["k"], r["v"]): r["filled"] for r in expect_df.collect() if r["v"] is not None}
    assert got_n == 40 and got == expect
    # NULL rows: every batch-side filled value must appear identically —
    # keyed by seq is impossible stream-side (seq not in output), so pin
    # the multiset of (k, filled) over NULL inputs instead.
    _nkey = lambda t: (t[0], t[1] is not None, t[1] if t[1] is not None else 0.0)
    got_nulls = sorted(
        ((r["k"], r["filled"]) for r in out.collect() if r["v"] is None), key=_nkey
    )
    exp_nulls = sorted(
        ((r["k"], r["filled"]) for r in expect_df.collect() if r["v"] is None), key=_nkey
    )
    assert got_nulls == exp_nulls


def test_streaming_upsert_snapshot_equals_batch_latest_state(spark, tmp_path):
    """The foreachBatch upsert snapshot must equal the batch
    latest-state-per-key over the full log after draining — including a
    key whose newest record arrives in a LATER micro-batch (the upsert
    path), one that only exists in batch 1 (the carry-forward path),
    and idempotent version pruning (exactly one v= dir remains)."""
    import glob

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        read_snapshot,
        streaming_upsert_snapshot,
    )

    root = str(tmp_path / "log")
    snap = str(tmp_path / "snap")
    b0 = [(1, 10, "a"), (2, 11, "b"), (3, 12, "c")]
    b1 = [(1, 20, "a2"), (4, 21, "d")]  # key 1 updated; 2,3 carried
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(rows, "k long, seq long, state string") \
            .coalesce(1).write.parquet(os.path.join(root, f"f{i}"))
    stream = (
        spark.readStream.schema("k long, seq long, state string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "f*"))
    )
    streaming_upsert_snapshot(stream, snap, ["k"], ["seq"])
    got = {r["k"]: (r["seq"], r["state"]) for r in read_snapshot(spark, snap).collect()}
    assert got == {1: (20, "a2"), 2: (11, "b"), 3: (12, "c"), 4: (21, "d")}
    assert len(glob.glob(os.path.join(snap, "v=*"))) == 1


def test_streaming_minhash_dedup_incremental(spark, tmp_path):
    """Incremental near-dedup across micro-batches: a within-batch dup
    (doc 2 ≡ doc 1) dies in its own batch, a cross-batch dup (doc 5 ≡
    batch-1's doc 3) dies against the accumulated signature store, a
    novel doc (6) survives — and a replay into a fresh root reproduces
    the identical accepted set (determinism contract)."""
    import os
    import random

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_accepted_signatures,
        streaming_minhash_dedup,
    )

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(400)]

    def text():
        return " ".join(rng.choice(vocab) for _ in range(40))

    t1, t3, t4, t6 = text(), text(), text(), text()
    batch1 = [(1, t1), (2, t1), (3, t3), (4, t4)]   # 2 dups 1 in-batch
    batch2 = [(5, t3), (6, t6)]                      # 5 dups batch-1's 3

    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    schema = "doc_id long, text string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        os.path.join(in_dir, "f1")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        os.path.join(in_dir, "f2")
    )
    # file source orders batches by modification time — pin it
    os.utime(os.path.join(in_dir, "f1"), (1_000_000, 1_000_000))
    os.utime(os.path.join(in_dir, "f2"), (2_000_000, 2_000_000))

    def run(root):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "*"))
        )
        streaming_minhash_dedup(stream, root, threshold=0.8)
        return {
            r["doc_id"] for r in read_accepted_signatures(spark, root).collect()
        }

    accepted = run(str(tmp_path / "store_a"))
    assert accepted == {1, 3, 4, 6}
    # the rejection of 5 must have been CROSS-batch: maxFilesPerTrigger=1
    # ⇒ one store dir per micro-batch, and batch 2's survivors exclude 5
    import glob as _glob

    stores = sorted(_glob.glob(str(tmp_path / "store_a" / "b=*")))
    assert len(stores) == 2
    batch2_ids = {
        r["doc_id"] for r in spark.read.parquet(stores[1]).collect()
    }
    assert batch2_ids == {6}
    assert run(str(tmp_path / "store_b")) == accepted


def test_streaming_heavy_hitters_bounds_and_determinism(spark, tmp_path):
    """Mergeable MG summary across micro-batches: heavy keys survive
    (guarantee: any key with true count > total decrement is present),
    every stored weight is a LOWER bound whose slack is bounded by the
    stored ``_decremented``, and a replay reproduces the summary
    exactly (exact-count-then-merge is deterministic, unlike
    per-partition MG)."""
    import os
    from collections import Counter

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_heavy_hitters,
        streaming_heavy_hitters,
    )

    batch1 = [("hot",)] * 50 + [(c,) for c in "abcdefghij" for _ in range(2)]
    batch2 = [("hot",)] * 30 + [("warm",)] * 20 + [(c,) for c in "klmnopqrst" for _ in range(2)]
    true = Counter(k for batch in (batch1, batch2) for (k,) in batch)

    in_dir = str(tmp_path / "keys_in")
    os.makedirs(in_dir)
    spark.createDataFrame(batch1, "k string").coalesce(1).write.parquet(os.path.join(in_dir, "f1"))
    spark.createDataFrame(batch2, "k string").coalesce(1).write.parquet(os.path.join(in_dir, "f2"))
    os.utime(os.path.join(in_dir, "f1"), (1_000_000, 1_000_000))
    os.utime(os.path.join(in_dir, "f2"), (2_000_000, 2_000_000))

    def run(root):
        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "*"))
        )
        streaming_heavy_hitters(stream, root, "k", capacity=5)
        return {
            r["k"]: (r["_w"], r["_decremented"])
            for r in read_heavy_hitters(spark, root).collect()
        }

    got = run(str(tmp_path / "hh_a"))
    assert len(got) <= 5
    assert "hot" in got and "warm" in got
    n_total = sum(true.values())
    for k, (w, dec) in got.items():
        assert w <= true[k] <= w + dec           # sandwich bound
        assert dec <= n_total // (5 + 1) + 1      # MG decrement bound
    # guarantee: every key above the decrement slack is present
    dec = next(iter(got.values()))[1]
    for k, n in true.items():
        if n > dec:
            assert k in got
    assert run(str(tmp_path / "hh_b")) == got


def test_session_close_stream_event_time_timeouts(spark, tmp_path):
    """Event-time state TIMEOUTS (the only port exercising anything but
    NoTimeout): sessions close by in-data gap detection AND by timer
    when a silent key's watermark deadline passes; state is removed on
    timeout, and a still-open session at end-of-stream is never
    emitted."""
    import time as _time

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        session_close_stream,
    )

    root = str(tmp_path / "sess_in")
    os.makedirs(root)
    # times start at 1000s, clear of the initial (epoch-0) watermark,
    # which silently drops rows at or before it
    batches = [
        [("a", 1000, 1.0), ("a", 1005, 2.0)],   # a: session 1 (1000–1005)
        [("a", 1100, 4.0)],                     # gap > 30s ⇒ closes session 1 in-data
        [("c", 1300, 9.0)],                     # watermark → 1290 > 1130 ⇒ arms a's timer
        [("c", 1400, 1.0), ("b", 1395, 5.0)],   # batch 4: a's timer FIRES; b never closes
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k string, sec long, v double").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        ).drop("sec").coalesce(1).write.parquet(os.path.join(root, f"f{i}"))
        _time.sleep(1.1)  # distinct mtimes pin batch order

    stream = (
        spark.readStream.schema("k string, v double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "f*"))
    )
    out = _drain(
        session_close_stream(stream, ["k"], "ts", "v", gap="30 seconds", watermark="10 seconds"),
        "session_close_stream",
    )
    got = {
        (r["k"], r["n_events"], r["sum_value"], int(r["first_ts"].timestamp()), int(r["last_ts"].timestamp()))
        for r in out.collect()
    }
    assert ("a", 2, 3.0, 1000, 1005) in got     # closed by gap detection (batch 2)
    assert ("a", 1, 4.0, 1100, 1100) in got     # closed by EVENT-TIME TIMER (batch 4)
    ks = sorted(k for k, *_ in got)
    assert "b" not in ks                    # open at end-of-stream ⇒ never emitted


def test_scrub_blocklist_streams_stateless(spark, tmp_path):
    """The curation scan ops are stateless Catalyst expressions, so they
    lift onto a stream unchanged — scrubbing a 2-batch stream must
    produce exactly the batch scrub of the union (no state, no
    watermark, nothing to configure)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        scrub_blocklist,
    )

    rows1 = [(1, "slow query"), (2, "big data slowly")]
    rows2 = [(3, "slow big slow"), (4, None)]
    root = str(tmp_path / "scrub_in")
    os.makedirs(root)
    spark.createDataFrame(rows1, "id long, text string").coalesce(1).write.parquet(
        os.path.join(root, "f1")
    )
    spark.createDataFrame(rows2, "id long, text string").coalesce(1).write.parquet(
        os.path.join(root, "f2")
    )

    stream = (
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "f*"))
    )
    got = {
        (r["id"], r["scrubbed"], r["n_scrubbed"])
        for r in _drain(scrub_blocklist(stream, "text", ["slow", "big"]), "scrub_stream").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, "id long, text string")
    expected = {
        (r["id"], r["scrubbed"], r["n_scrubbed"])
        for r in scrub_blocklist(batch, "text", ["slow", "big"]).collect()
    }
    assert got == expected and len(got) == 4


def test_ewma_integer_stream_parity_with_batch(spark):
    """ewma_integer streaming twin: chunked replay across 3 micro-
    batches equals the batch fold EXACTLY (integer arithmetic — no
    reassociation tolerance needed), including NULL carry semantics
    and a key whose first batch is all-NULL."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        ewma_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        ewma_integer_stream,
    )

    rows = [
        ("a", 1, 100), ("a", 2, 200), ("a", 3, None), ("a", 4, 400),
        ("b", 1, None), ("b", 2, 80), ("b", 3, 120),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, v long")
    batch = {
        (r["k"], r["seq"]): r["y"]
        for r in ewma_integer(df, ["k"], ["seq"], "v", alpha_pct=50, out_col="y").collect()
    }
    # hand check: a: 100; (50*100+50*200)//100=150; carry 150; (50*150+50*400)//100=275
    assert batch[("a", 1)] == 100 and batch[("a", 2)] == 150
    assert batch[("a", 3)] == 150 and batch[("a", 4)] == 275
    assert batch[("b", 1)] is None and batch[("b", 2)] == 80

    with tempfile.TemporaryDirectory() as root:
        for i, chunk in enumerate([rows[:2], rows[2:5], rows[5:]]):
            spark.createDataFrame(chunk, "k string, seq long, v long").coalesce(1).write.parquet(
                os.path.join(root, f"f{i}")
            )
        stream = spark.readStream.schema("k string, seq long, v long").option(
            "maxFilesPerTrigger", 1
        ).parquet(os.path.join(root, "f*"))
        out = ewma_integer_stream(stream, ["k"], ["seq"], "v", alpha_pct=50, out_col="y")
        q = (
            out.writeStream.format("memory")
            .queryName("ewma_int_par")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r["k"], r["v"]): r["y"] for r in spark.table("ewma_int_par").collect()
        }
        batch_by_v = {
            (r["k"], r["v"]): r["y"]
            for r in ewma_integer(df, ["k"], ["seq"], "v", alpha_pct=50, out_col="y").collect()
        }
        assert streamed == batch_by_v  # exact integer equality


def test_ewma_integer_stream_recovers_from_checkpoint(spark, tmp_path):
    """The integer EWMA's one-BIGINT carried state must survive a query
    restart: run 2 restarts from run 1's checkpoint, processes only the
    new file, and every emission across both runs equals the batch fold
    EXACTLY (integer arithmetic — a lost or reset carry would shift
    every post-restart value by a detectable amount)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        ewma_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        ewma_integer_stream,
    )

    root = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")
    rows = [("a" if i % 2 == 0 else "b", i, (i * 31) % 83) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, seq long, v long")
    df.filter(F.col("seq") < 20).coalesce(1).write.parquet(os.path.join(root, "part=0"))

    def run():
        stream = (
            spark.readStream.schema("k string, seq long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "part=*"))
            .select("k", "seq", "v")
        )
        q = (
            ewma_integer_stream(stream, ["k"], ["seq"], "v", alpha_pct=30, out_col="y")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).collect()

    assert len(run()) == 20
    df.filter(F.col("seq") >= 20).coalesce(1).write.parquet(os.path.join(root, "part=1"))
    both = run()
    assert len(both) == 30
    expected = {
        (r["k"], r["v"]): r["y"]
        for r in ewma_integer(df, ["k"], ["seq"], "v", alpha_pct=30, out_col="y").collect()
    }
    for r in both:
        assert expected[(r["k"], r["v"])] == r["y"]


def test_streaming_bm25_stats_matches_batch(spark, tmp_path):
    """Batch↔stream parity for the retrieval family (r5 verdict item
    7): documents ingested over 3 micro-batches through the
    foreachBatch BM25 stats store must rank EXACTLY like a one-shot
    batch bm25_topk over the full corpus — the stored partials are all
    exact BIGINTs (tf, doc length, doc count, length sum), so the
    shared scorer sees identical scalars and the float expression tree
    produces identical micro-unit scores."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        bm25_topk,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        bm25_topk_from_store,
        streaming_bm25_stats,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    terms = ["spark", "scan", "hash"]

    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    # 3 micro-batches split by doc_id ranges (ids unique per contract)
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    parts = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        docs.filter(F.col("doc_id") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(os.path.join(src, f"part={i}"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part=*"))
    )
    streaming_bm25_stats(stream, store, terms)

    streamed = {
        r["doc_id"]: (r["score_micro"], r["n_terms_hit"], r["rk"])
        for r in bm25_topk_from_store(spark, store, k=20).collect()
    }
    batch = {
        r["doc_id"]: (r["score_micro"], r["n_terms_hit"], r["rk"])
        for r in bm25_topk(docs, terms, k=20).collect()
    }
    assert streamed == batch  # exact equality, not approx
    assert len(batch) == 20

    # retry-idempotence: replaying a batch's partials (overwrite of its
    # own b= dir) must not change the fold. Materialize off the source
    # path first — a lazy self-overwrite would read the files it is
    # deleting.
    one_rows = spark.read.parquet(os.path.join(store, "tf", "b=0")).collect()
    one_schema = spark.read.parquet(os.path.join(store, "tf", "b=0")).schema
    spark.createDataFrame(one_rows, one_schema).write.mode("overwrite").parquet(
        os.path.join(store, "tf", "b=0")
    )
    again = {
        r["doc_id"]: (r["score_micro"], r["n_terms_hit"], r["rk"])
        for r in bm25_topk_from_store(spark, store, k=20).collect()
    }
    assert again == batch


def test_chunk_tokens_overlap_is_stream_safe(spark, tmp_path):
    """Stateless text ops must run UNCHANGED on a streaming frame —
    chunk_tokens_overlap is pure map-side array expressions, so the
    same function applied to a file stream must emit exactly the batch
    output regardless of micro-batch boundaries."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        chunk_tokens_overlap,
    )

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 20))) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "in")
    for part, lo in enumerate((0, 4, 8)):
        df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 4)).coalesce(
            1
        ).write.parquet(os.path.join(src, f"part={part}"))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part=*"))
    )
    out = chunk_tokens_overlap(stream, chunk_size=8, overlap=2)
    q = (
        out.writeStream.format("memory")
        .queryName("chunk_par")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in spark.table("chunk_par").collect()
    }
    batch = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_tokens_overlap(df, chunk_size=8, overlap=2).collect()
    }
    assert streamed == batch
    assert len(batch) > 12  # multi-chunk docs exist


def test_streaming_weighted_sample_matches_batch(spark, tmp_path):
    """A-Res mergeability end-to-end: documents ingested over 3
    micro-batches, each batch storing only its k best candidates, must
    fold to EXACTLY the one-shot batch sample (ids, scores, ranks) —
    including when a batch is replayed (duplicate candidates collapse:
    same key ⇒ same deterministic score)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        weighted_sample_topk,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        streaming_weighted_sample,
        weighted_sample_from_store,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "n_chars")
    )
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    parts = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        docs.filter(F.col("doc_id") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(os.path.join(src, f"part={i}"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part=*"))
    )
    streaming_weighted_sample(stream, store, "n_chars", ["doc_id"], k=25)

    folded = {
        (r["doc_id"], r["ares_micro"], r["rk"])
        for r in weighted_sample_from_store(spark, store, ["doc_id"], k=25).collect()
    }
    batch = {
        (r["doc_id"], r["ares_micro"], r["rk"])
        for r in weighted_sample_topk(docs, "n_chars", ["doc_id"], k=25).collect()
    }
    assert folded == batch and len(batch) == 25

    # replay idempotence: duplicate one batch dir's contents into a new
    # batch id — the distinct fold must not change
    rows = spark.read.parquet(os.path.join(store, "b=0")).collect()
    sch = spark.read.parquet(os.path.join(store, "b=0")).schema
    spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(
        os.path.join(store, "b=9")
    )
    again = {
        (r["doc_id"], r["ares_micro"], r["rk"])
        for r in weighted_sample_from_store(spark, store, ["doc_id"], k=25).collect()
    }
    assert again == batch


def test_streaming_fuzzy_match_matches_batch(spark, tmp_path):
    """Streaming entity resolution == batch join of the unioned stream
    (master static, join row-local on the stream side), at radius 2."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.joins import (
        hamming_neighborhood_join,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_fuzzy_matches,
        streaming_fuzzy_match,
    )

    master = spark.createDataFrame(
        [(i, f"SKU{i:05d}") for i in range(60)], "mid long, mname string"
    )
    # dirty feed: two corrupted characters per key
    dirty_rows = [(1000 + i, f"SXU{i:05d}"[:4] + "Y" + f"SKU{i:05d}"[5:]) for i in range(60)]
    dirty = spark.createDataFrame(dirty_rows, "did long, dname string")

    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    for part, lo in enumerate((0, 20, 40)):
        dirty.filter((F.col("did") >= 1000 + lo) & (F.col("did") < 1020 + lo)).coalesce(
            1
        ).write.parquet(os.path.join(src, f"part={part}"))

    stream = (
        spark.readStream.schema(dirty.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part=*"))
    )
    streaming_fuzzy_match(
        stream, master, store, "did", "mid", "dname", "mname",
        length=8, max_hamming=2,
    )
    streamed = {
        (r["left_id"], r["right_id"], r["hamming"])
        for r in read_fuzzy_matches(spark, store).collect()
    }
    batch = {
        (r["left_id"], r["right_id"], r["hamming"])
        for r in hamming_neighborhood_join(
            dirty, master, "did", "mid", "dname", "mname", length=8, max_hamming=2
        ).collect()
    }
    assert streamed == batch and len(batch) >= 60


def test_last_touch_attribution_stream_equals_batch(spark, tmp_path):
    """Streaming last-touch attribution must equal the batch window form
    across micro-batch boundaries: a purchase at the head of batch 2
    credits the touch carried from batch 1's state (not 'direct'), and
    a user whose FIRST event is a purchase credits 'direct'."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        last_touch_attribution,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        last_touch_attribution_stream,
    )

    root = str(tmp_path / "lt_in")
    types = ["view", "click", "purchase", "error", "purchase", "signup"]
    rows = []
    for i in range(36):
        user = f"u{i % 3}"
        # u2's first event is a purchase (direct); batch edge at seq 18
        # lands right after u0's click at seq 17 → purchase at 18+ must
        # credit the carried click.
        rows.append((user, i, types[(i * 5 + i // 3) % len(types)]))
    df = spark.createDataFrame(rows, "k string, seq long, t string")
    for part in range(2):
        df.filter((F.col("seq") >= part * 18) & (F.col("seq") < (part + 1) * 18)) \
            .coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "t")

    stream = (
        spark.readStream.schema("k string, seq long, t string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
        .select("k", "seq", "t")
    )
    out = _drain(
        last_touch_attribution_stream(stream, ["k"], ["seq"], "t", "purchase"),
        "lt_stream",
    )
    got = sorted((r["k"], r["seq"], r["channel"]) for r in out.collect())
    expect = sorted(
        (r["k"], r["seq"], r["channel"])
        for r in last_touch_attribution(
            batch, ["k"], ["seq"], "t", "purchase"
        ).collect()
    )
    assert got == expect and len(got) > 0
    # at least one non-trivial carry and one 'direct' in the fixture
    channels = {c for _, _, c in got}
    assert "direct" in channels and len(channels) >= 2


def test_conversion_paths_stream_equals_batch(spark, tmp_path):
    """Streaming path ring must equal the batch join form across
    micro-batch boundaries: a purchase early in batch 2 reads touches
    carried from batch 1's ring, depth truncation keeps only the 3
    most recent touches, and a touchless first purchase is 'direct'."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.timeseries import (
        conversion_paths,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        conversion_paths_stream,
    )

    root = str(tmp_path / "cp_in")
    types = ["view", "click", "purchase", "error", "signup", "purchase", "view"]
    rows = []
    for i in range(42):
        user = f"u{i % 3}"
        rows.append((user, i, types[(i * 3 + i // 4) % len(types)]))
    df = spark.createDataFrame(rows, "k string, seq long, t string")
    for part in range(3):
        df.filter((F.col("seq") >= part * 14) & (F.col("seq") < (part + 1) * 14)) \
            .coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "t")

    stream = (
        spark.readStream.schema("k string, seq long, t string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
        .select("k", "seq", "t")
    )
    out = _drain(
        conversion_paths_stream(stream, ["k"], ["seq"], "t", "purchase", depth=3),
        "cp_stream",
    )
    got = sorted((r["k"], r["seq"], r["path"]) for r in out.collect())
    expect = sorted(
        (r["k"], r["seq"], r["path"])
        for r in conversion_paths(
            batch, ["k"], ["seq"], "t", "purchase", depth=3
        ).collect()
    )
    assert got == expect and len(got) > 0
    # fixture exercises depth-3 truncation (some path has 3 hops) and
    # shorter histories
    lens = {p.count(">") for _, _, p in got}
    assert 2 in lens and (0 in lens or "direct" in {p for _, _, p in got})


def test_holt_integer_stream_parity_with_batch(spark):
    """holt_integer streaming twin: chunked replay across 3 micro-
    batches equals the batch fold EXACTLY, including the negative-trend
    path (declining series) and NULL carry semantics."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        holt_linear_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        holt_integer_stream,
    )

    rows = [
        ("a", 1, 9000), ("a", 2, 5000), ("a", 3, None), ("a", 4, 400),
        ("b", 1, None), ("b", 2, 80), ("b", 3, 8000),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, v long")
    batch_by_v = {
        (r["k"], r["v"]): (r["level_int"], r["trend_int"])
        for r in holt_linear_integer(df, ["k"], ["seq"], "v", 20, 10).collect()
    }
    # the fixture must drive the trend negative at least once
    assert any(t is not None and t < 0 for (_, t) in batch_by_v.values())

    with tempfile.TemporaryDirectory() as root:
        for i, chunk in enumerate([rows[:2], rows[2:5], rows[5:]]):
            spark.createDataFrame(chunk, "k string, seq long, v long").coalesce(1).write.parquet(
                os.path.join(root, f"f{i}")
            )
        stream = spark.readStream.schema("k string, seq long, v long").option(
            "maxFilesPerTrigger", 1
        ).parquet(os.path.join(root, "f*"))
        out = holt_integer_stream(stream, ["k"], ["seq"], "v", 20, 10)
        q = (
            out.writeStream.format("memory")
            .queryName("holt_int_par")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r["k"], r["v"]): (r["level_int"], r["trend_int"])
            for r in spark.table("holt_int_par").collect()
        }
        assert streamed == batch_by_v  # exact integer equality


def test_cusum_integer_stream_parity_with_batch(spark):
    """cusum_integer streaming twin: chunked replay equals the batch
    fold exactly, including zero-clamp resets across batch boundaries."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        cusum_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        cusum_integer_stream,
    )

    rows = [
        ("a", 1, 10, 5), ("a", 2, 3, 5), ("a", 3, 20, 5), ("a", 4, None, 5),
        ("b", 1, 4, 10), ("b", 2, 50, 10), ("b", 3, 1, 10),
    ]
    schema = "k string, seq long, v long, tgt long"
    df = spark.createDataFrame(rows, schema)
    batch_by_v = {
        (r["k"], r["v"]): r["cusum_int"]
        for r in cusum_integer(df, ["k"], ["seq"], "v", "tgt", slack=2).collect()
    }
    with tempfile.TemporaryDirectory() as root:
        for i, chunk in enumerate([rows[:2], rows[2:5], rows[5:]]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                os.path.join(root, f"f{i}")
            )
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
            os.path.join(root, "f*")
        )
        out = cusum_integer_stream(stream, ["k"], ["seq"], "v", "tgt", slack=2)
        q = (
            out.writeStream.format("memory")
            .queryName("cusum_int_par")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r["k"], r["v"]): r["cusum_int"] for r in spark.table("cusum_int_par").collect()
        }
        assert streamed == batch_by_v


def test_python_streaming_datasource_drains_to_batch_equivalence(spark):
    """The custom Python streaming DataSource (Spark 4
    SimpleDataSourceStreamReader) must drain its capped feed across
    micro-batches and produce EXACTLY the batch source's rows — shared
    deterministic generator, offset = row counter."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.pysource import (
        register_synthetic_quotes_source,
        register_synthetic_quotes_stream_source,
    )

    register_synthetic_quotes_source(spark)
    register_synthetic_quotes_stream_source(spark)
    stream = (
        spark.readStream.format("synthetic_quotes_stream")
        .option("total_rows", "57")
        .option("rows_per_batch", "10")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.table("pyds_stream").collect()}
    want = {
        tuple(r)
        for r in spark.read.format("synthetic_quotes").option("rows", "57").load().collect()
    }
    assert got == want and len(got) == 57


def test_streaming_skyline_matches_batch(spark, tmp_path):
    """Cross-batch frontier maintenance: the streamed skyline after 3
    micro-batches must equal the one-shot batch skyline over the
    unioned points — including a point that enters the frontier in
    batch 1 and is dominated OUT by a batch-3 arrival, pinning that the
    store really is re-reduced, not append-only. A replay into a fresh
    root reproduces the identical frontier (determinism contract)."""
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.topk import (
        skyline_2d,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_skyline_frontier,
        streaming_skyline,
    )

    # (price, size): lower price better, higher size better
    b1 = [(50, 5), (40, 3), (60, 9)]            # frontier: (40,3),(50,5),(60,9)
    b2 = [(45, 5), (70, 9)]                     # (45,5) evicts (50,5); (70,9) dominated
    b3 = [(35, 6), (80, 2)]                     # (35,6) evicts (40,3),(45,5); (80,2) dominated
    schema = "price long, sz long"
    in_dir = str(tmp_path / "pts_in")
    os.makedirs(in_dir)
    for i, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    def run(root):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "*"))
        )
        streaming_skyline(stream, root, "price", "sz")
        return {
            (r["price"], r["sz"])
            for r in read_skyline_frontier(spark, root).collect()
        }

    got = run(str(tmp_path / "sky_a"))
    allpts = spark.createDataFrame(b1 + b2 + b3, schema)
    want = {(r["price"], r["sz"]) for r in skyline_2d(allpts, "price", "sz").collect()}
    assert got == want == {(35, 6), (60, 9)}
    assert run(str(tmp_path / "sky_b")) == got


def test_holt_winters_integer_stream_parity_with_batch(spark):
    """holt_winters streaming twin: chunked replay across 3 micro-
    batches equals the batch fold EXACTLY, with the seasonal ring
    wrapping across a batch boundary (period=3 over 8 values), the
    negative-seasonal/negative-trend paths exercised, and NULL carry
    semantics (NULL emits carried level/trend, NULL season, no ring
    advance). A plain-Python replay pins both twins independently."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        holt_winters_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        holt_winters_integer_stream,
    )

    rows = [
        ("a", 1, 9000), ("a", 2, 5000), ("a", 3, None), ("a", 4, 400),
        ("a", 5, 7000), ("a", 6, 100), ("a", 7, 6500), ("a", 8, 90),
        ("b", 1, None), ("b", 2, 80), ("b", 3, 8000),
    ]
    a_pct, b_pct, g_pct, m = 20, 10, 10, 3

    # plain-Python replay (the independent reference)
    expect = {}
    st = {}
    for k, seq, x in rows:
        if x is None:
            L, T = st.get(k, (None, None, None, None))[:2] if k in st else (None, None)
            expect[(k, seq)] = (L, T, None)
            continue
        if k not in st:
            st[k] = [x, 0, [0] * m, 1]
            expect[(k, seq)] = (x, 0, 0)
            continue
        L, T, S, n = st[k]
        i = n % m
        L2 = (a_pct * (x - S[i]) + (100 - a_pct) * (L + T)) // 100
        T2 = (b_pct * (L2 - L) + (100 - b_pct) * T) // 100
        S[i] = (g_pct * (x - L2) + (100 - g_pct) * S[i]) // 100
        st[k] = [L2, T2, S, n + 1]
        expect[(k, seq)] = (L2, T2, S[i])

    df = spark.createDataFrame(rows, "k string, seq long, v long")
    batch = {
        (r["k"], r["seq"]): (r["level_int"], r["trend_int"], r["season_int"])
        for r in holt_winters_integer(
            df, ["k"], ["seq"], "v", period=m, alpha_pct=a_pct,
            beta_pct=b_pct, gamma_pct=g_pct,
        ).collect()
    }
    assert batch == expect
    # fixture must hit the negative-seasonal and negative-trend paths
    assert any(s is not None and s < 0 for (_, _, s) in batch.values())
    assert any(t is not None and t < 0 for (_, t, _) in batch.values())

    with tempfile.TemporaryDirectory() as root:
        for i, chunk in enumerate([rows[:3], rows[3:7], rows[7:]]):
            spark.createDataFrame(chunk, "k string, seq long, v long").coalesce(1).write.parquet(
                os.path.join(root, f"f{i}")
            )
        stream = spark.readStream.schema("k string, seq long, v long").option(
            "maxFilesPerTrigger", 1
        ).parquet(os.path.join(root, "f*"))
        out = holt_winters_integer_stream(
            stream, ["k"], ["seq"], "v", period=m, alpha_pct=a_pct,
            beta_pct=b_pct, gamma_pct=g_pct,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("hw_int_par")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r["k"], r["v"]): (r["level_int"], r["trend_int"], r["season_int"])
            for r in spark.table("hw_int_par").collect()
        }
        # streamed rows key on (k, v) — unique per key in this fixture;
        # rebuild the batch map the same way
        batch_by_value = {}
        for (k, seq, v) in rows:
            batch_by_value[(k, v)] = batch[(k, seq)]
        assert streamed == batch_by_value


def test_streaming_k_anonymity_matches_batch(spark, tmp_path):
    """Cross-batch census maintenance: the streamed k-anonymity census
    after 3 micro-batches equals the one-shot batch census over the
    unioned rows — including a class whose k rises above 1 only once a
    later batch lands (the additive-merge path), and replay
    determinism into a fresh root."""
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_k_anonymity,
        streaming_k_anonymity,
    )

    b1 = [("DE", "AUTO"), ("DE", "AUTO"), ("FR", "FOOD")]
    b2 = [("FR", "FOOD"), ("US", "TECH")]       # FR/FOOD leaves k=1; US/TECH enters at 1
    b3 = [("US", "TECH"), ("DE", "AUTO")]
    schema = "nation string, segment string"
    in_dir = str(tmp_path / "rows_in")
    os.makedirs(in_dir)
    for i, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    def run(root):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "*"))
        )
        streaming_k_anonymity(stream, root, ["nation", "segment"])
        return {
            (r["nation"], r["segment"]): (r["class_size"], r["k_anonymity"])
            for r in read_k_anonymity(spark, root).collect()
        }

    got = run(str(tmp_path / "ka_a"))
    allrows = spark.createDataFrame(b1 + b2 + b3, schema)
    batch = {
        (r["nation"], r["segment"]): r["n"]
        for r in allrows.groupBy("nation", "segment").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    k = min(batch.values())
    want = {cls: (n, k) for cls, n in batch.items()}
    assert got == want == {
        ("DE", "AUTO"): (3, 2), ("FR", "FOOD"): (2, 2), ("US", "TECH"): (2, 2),
    }
    assert run(str(tmp_path / "ka_b")) == got


def test_funnel_stage_stream_matches_reference_fold(spark, tmp_path):
    """Streaming funnel stage machine: first-hit latches per stage with
    the batch qualifying rule (a stage-k event counts only at/after the
    stage-(k-1) entry — a click BEFORE the first view is ignored), state
    carried across 3 micro-batches, final snapshot per user equal to a
    plain-Python fold of the ordered events."""
    import datetime
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        funnel_stage_stream,
    )

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: click BEFORE view (ignored), then full funnel
        (1, T(1), "click"), (1, T(2), "view"), (1, T(3), "click"), (1, T(4), "purchase"),
        # u2: view only in batch 1, click arrives in batch 3 (cross-batch latch)
        (2, T(1), "view"), (2, T(9), "click"),
        # u3: purchase with no prior click — stays at stage 1
        (3, T(2), "view"), (3, T(5), "purchase"),
        # u4: never views — stage 0, clicks ignored
        (4, T(1), "click"), (4, T(6), "click"),
    ]
    schema_str = "user_id long, ts timestamp, event_type string"
    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)
    batches = [rows[:4], rows[4:7], rows[7:]]
    for i, chunk in enumerate(batches, 1):
        spark.createDataFrame(chunk, schema_str).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = spark.readStream.schema(schema_str).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(in_dir, "*"))
    out = funnel_stage_stream(stream, ["user_id"], ["ts"], "event_type")
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_par")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snaps = spark.sql(
        "SELECT * FROM funnel_par"
    ).collect()
    # final snapshot = the row with the highest stage_reached per user
    # (snapshots are monotone; ties pick either)
    final = {}
    for r in snaps:
        cur = final.get(r["user_id"])
        if cur is None or r["stage_reached"] >= cur["stage_reached"]:
            final[r["user_id"]] = r

    # plain-Python reference fold over the ordered events
    want = {}
    for uid in {u for u, _, _ in rows}:
        ev = sorted([(ts, t) for u, ts, t in rows if u == uid])
        st = [None, None, None]
        for ts, t in ev:
            i = {"view": 0, "click": 1, "purchase": 2}.get(t)
            if i == 0 and st[0] is None:
                st[0] = ts
            elif i and st[i] is None and st[i - 1] is not None and ts >= st[i - 1]:
                st[i] = ts
        want[uid] = sum(1 for v in st if v is not None) if st[0] is not None else 0
        # stage_reached counts the contiguous prefix; latches enforce that
    assert {u: r["stage_reached"] for u, r in final.items()} == want == {
        1: 3, 2: 2, 3: 1, 4: 0,
    }
    # cross-batch latch: u2's click (batch 3) must attach to the view (batch 2)
    assert final[2]["stage1_us"] is not None and final[2]["stage0_us"] is not None


def test_streaming_countmin_bit_identical_to_batch(spark, tmp_path):
    """Count-Min is a linear sketch: the drained stream's counter table
    (3 micro-batches, cell-wise additive merges) must be BIT-IDENTICAL
    to the one-shot sketch over the unioned tokens, and point estimates
    (min over a token's cells) must upper-bound exact counts."""
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_countmin,
        streaming_countmin,
    )

    b1 = [("spark",), ("flink",), ("spark",)]
    b2 = [("duck",), ("spark",)]
    b3 = [("flink",), ("goose",), ("spark",)]
    schema = "token string"
    in_dir = str(tmp_path / "tok_in")
    os.makedirs(in_dir)
    for i, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    root = str(tmp_path / "cm")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    streaming_countmin(stream, root, "token", depth=4, width=64)
    streamed = {
        (r["r"], r["bucket"]): r["cell"] for r in read_countmin(spark, root).collect()
    }

    allrows = spark.createDataFrame(b1 + b2 + b3, schema)
    hashed = allrows.select(
        "token", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("token"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 64,
    )
    batch = {
        (r["r"], r["bucket"]): r["cell"]
        for r in hashed.groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
        .collect()
    }
    assert streamed == batch
    # point estimates upper-bound exact counts
    exact = {"spark": 4, "flink": 2, "duck": 1, "goose": 1}
    import hashlib

    for tok, n in exact.items():
        est = min(
            streamed[(r, int(hashlib.md5(f"{r}:{tok}".encode()).hexdigest()[:8], 16) % 64)]
            for r in range(4)
        )
        assert est >= n


def test_holt_winters_stream_survives_null_only_first_batch(spark, tmp_path):
    """Round-8 regression (advisor, medium): a key whose FIRST
    micro-batch contains only NULL values stores L=T=None; the next
    batch's state restore must keep them None instead of raising
    TypeError on int(None) and killing the query (the
    holt_integer_stream guard, mirrored). The post-restore fold must
    still equal the batch twin."""
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.stateful import (
        holt_winters_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        holt_winters_integer_stream,
    )

    rows = [
        ("z", 1, None), ("z", 2, None),          # batch 1: NULLs only
        ("z", 3, 500), ("z", 4, 700),            # batch 2: state restores L=None
        ("z", 5, 900),                           # batch 3: normal carry
    ]
    schema = "k string, seq long, v long"
    in_dir = str(tmp_path / "hw_null_in")
    os.makedirs(in_dir)
    for i, chunk in enumerate([rows[:2], rows[2:4], rows[4:]], 1):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(in_dir, "*"))
    out = holt_winters_integer_stream(
        stream, ["k"], ["seq"], "v", period=3, alpha_pct=20, beta_pct=10,
        gamma_pct=10,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hw_null_first")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None  # pre-fix: TypeError killed the query here
    streamed = {
        (r["k"], r["v"]): (r["level_int"], r["trend_int"], r["season_int"])
        for r in spark.table("hw_null_first").collect()
        if r["v"] is not None
    }
    df = spark.createDataFrame(rows, schema)
    batch = {
        (r["k"], r["v"]): (r["level_int"], r["trend_int"], r["season_int"])
        for r in holt_winters_integer(
            df, ["k"], ["seq"], "v", period=3, alpha_pct=20, beta_pct=10,
            gamma_pct=10,
        ).collect()
        if r["v"] is not None
    }
    assert streamed == batch
    assert streamed[("z", 500)] == (500, 0, 0)  # first real value seeds the level


def test_funnel_stage_stream_skips_null_timestamps(spark, tmp_path):
    """Round-8 regression (advisor, low): a stage event whose
    order-timestamp is NULL yields a NULL staged _f_us; the fold must
    skip it (it cannot order) instead of raising on int(pd.NA) and
    killing the stream. Non-NULL rows still latch normally."""
    import datetime
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        funnel_stage_stream,
    )

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, None, "view"),                       # NULL ts — must be skipped
        (1, T(2), "view"), (1, T(3), "click"),
        (2, T(1), "view"), (2, None, "click"),   # NULL ts click ignored
    ]
    schema_str = "user_id long, ts timestamp, event_type string"
    in_dir = str(tmp_path / "fn_null_in")
    os.makedirs(in_dir)
    for i, chunk in enumerate([rows[:3], rows[3:]], 1):
        spark.createDataFrame(chunk, schema_str).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = spark.readStream.schema(schema_str).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(in_dir, "*"))
    out = funnel_stage_stream(stream, ["user_id"], ["ts"], "event_type")
    q = (
        out.writeStream.format("memory")
        .queryName("fn_null_ts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None  # pre-fix: int(pd.NA) killed the query
    final = {}
    for r in spark.table("fn_null_ts").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["stage_reached"] >= cur["stage_reached"]:
            final[r["user_id"]] = r
    # u1: NULL view skipped, T(2) view + T(3) click latch → stage 2
    # u2: view latches, NULL click skipped → stage 1
    assert {u: r["stage_reached"] for u, r in final.items()} == {1: 2, 2: 1}


def test_streaming_k_anonymity_null_qi_merges_as_one_class(spark, tmp_path):
    """Round-8 regression (advisor, low): NULL QI values form ONE
    equivalence class across micro-batches — the census merge is
    null-safe (eqNullSafe), so a NULL-valued class sums its partials
    instead of accumulating duplicate rows and skewing k. Must equal
    the batch groupBy census (which already treats NULL as one class)."""
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_k_anonymity,
        streaming_k_anonymity,
    )

    b1 = [(None, "AUTO"), ("DE", "AUTO"), (None, None)]
    b2 = [(None, "AUTO"), (None, None), ("DE", "AUTO")]
    b3 = [(None, "AUTO"), ("DE", None)]
    schema = "nation string, segment string"
    in_dir = str(tmp_path / "ka_null_in")
    os.makedirs(in_dir)
    for i, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    root = str(tmp_path / "ka_null_root")
    streaming_k_anonymity(stream, root, ["nation", "segment"])
    census = read_k_anonymity(spark, root).collect()
    got = {(r["nation"], r["segment"]): (r["class_size"], r["k_anonymity"]) for r in census}
    # one row per class — pre-fix the (None, 'AUTO') class appeared 3×
    assert len(census) == len(got)
    allrows = spark.createDataFrame(b1 + b2 + b3, schema)
    batch = {
        (r["nation"], r["segment"]): r["n"]
        for r in allrows.groupBy("nation", "segment")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    k = min(batch.values())
    assert got == {cls: (n, k) for cls, n in batch.items()} == {
        (None, "AUTO"): (3, 1), ("DE", "AUTO"): (2, 1),
        (None, None): (2, 1), ("DE", None): (1, 1),
    }


def test_streaming_psi_census_matches_batch(spark, tmp_path):
    """Streaming drift monitor: the PSI bin census after 3 micro-batches
    (fixed training-time edges, additive cell merges) is bit-identical
    to the one-shot batch binning of the unioned values, and read_psi
    against a reference census equals a plain-Python PSI computed with
    the batch query's exact formula (term-snapped micro-units)."""
    import math
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_psi,
        streaming_psi_census,
    )

    edges = [100, 200, 300]
    b1 = [(50,), (150,), (250,), (None,)]
    b2 = [(350,), (120,), (80,)]
    b3 = [(200,), (300,), (99,)]          # boundary values: >= edge rule
    schema = "v long"
    in_dir = str(tmp_path / "psi_in")
    os.makedirs(in_dir)
    for i, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    root = str(tmp_path / "psi_root")
    streaming_psi_census(stream, root, "v", edges)

    import glob

    latest = max(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    got = {
        r["bin"]: r["c"] for r in spark.read.parquet(latest).collect()
    }
    # batch binning: bin = #edges <= v, NULLs dropped
    vals = [v for (v,) in b1 + b2 + b3 if v is not None]
    want = {}
    for v in vals:
        b = sum(1 for e in edges if v >= e)
        want[b] = want.get(b, 0) + 1
    assert got == want == {0: 3, 1: 2, 2: 2, 3: 2}

    # PSI vs a reference census (bin -> count), exact formula parity
    ref_counts = {0: 5, 1: 2, 2: 2, 3: 1}
    ref = spark.createDataFrame(
        [(b, c) for b, c in ref_counts.items()], "bin long, c long"
    )
    out = {r["bin"]: (r["psi_micro"], r["psi_total_micro"]) for r in read_psi(spark, root, ref).collect()}
    n_a = sum(ref_counts.values())
    n_b = sum(want.values())
    terms = {}
    for b in sorted(set(ref_counts) | set(want)):
        ca, cb = ref_counts.get(b, 0), want.get(b, 0)
        terms[b] = (
            round((cb / n_b - ca / n_a) * math.log((cb / n_b) / (ca / n_a)) * 1e6)
            if ca > 0 and cb > 0
            else None
        )
    total = sum(t for t in terms.values() if t is not None)
    assert out == {b: (t, total) for b, t in terms.items()}


def test_burst_rate_stream_matches_batch_range_frame(spark, tmp_path):
    """Streaming burst-rate twin: per-key trailing-60s counts with
    RANGE-frame peer semantics (same-second rows all see the full
    second), state carried across 3 micro-batches with eviction, and
    the final max per key equal to the batch query's per-user
    max-burst fold. NULL timestamps skip (NULL burst, carried max)."""
    import datetime
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        burst_rate_stream,
    )

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)  # noqa: E731
    rows = [
        # u1: 3 events in one second (peers), then a 4th 30s later
        (1, T(0)), (1, T(0)), (1, T(0)), (1, T(30)),
        # u1: 61s later the first three leave the window
        (1, T(61)),
        # u2: slow drip outside windows + a NULL ts
        (2, T(0)), (2, None), (2, T(120)),
    ]
    schema = "user_id long, ts timestamp"
    in_dir = str(tmp_path / "br_in")
    os.makedirs(in_dir)
    for i, chunk in enumerate([rows[:4], rows[4:6], rows[6:]], 1):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(in_dir, "*"))
    out = burst_rate_stream(stream, ["user_id"], "ts", window_s=60)
    q = (
        out.writeStream.format("memory")
        .queryName("burst_par")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = [
        (r["user_id"], r["epoch_s"], r["burst"], r["max_burst"])
        for r in spark.table("burst_par").orderBy("user_id", "epoch_s").collect()
    ]
    base = int(T(0).timestamp())
    # u1: the three peers each see burst 3; T(30) sees 4 (all within
    # 60s); T(61) sees 2 (T(30) and itself — the second-0 peers left)
    u1 = [(u, e - base if e is not None else None, b, m) for (u, e, b, m) in got if u == 1]
    assert sorted(u1) == [(1, 0, 3, 3), (1, 0, 3, 3), (1, 0, 3, 3), (1, 30, 4, 4), (1, 61, 2, 4)]
    # u2: isolated events burst 1; NULL ts row emits NULL burst, max carried
    u2 = [(e - base if e is not None else None, b, m) for (u, e, b, m) in got if u == 2]
    assert sorted(u2, key=lambda x: (x[0] is None, x[0])) == [(0, 1, 1), (120, 1, 1), (None, None, 1)]
    # final max per user equals the batch RANGE-frame fold
    finals = {}
    for (u, e, b, m) in got:
        finals[u] = max(finals.get(u, 0), m)
    assert finals == {1: 4, 2: 1}


def test_burst_rate_stream_out_of_order_batch_is_marked_late(spark, tmp_path):
    """Cross-batch out-of-order protection: a later micro-batch
    carrying an EARLIER second must not fold — the `s > t - w`
    eviction would count already-seen future seconds into the late
    event's trailing window. The late row is emitted with NULL burst
    and the carried max, and subsequent in-order folds are
    unaffected."""
    import datetime
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        burst_rate_stream,
    )

    T = lambda s: datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)  # noqa: E731
    schema = "user_id long, ts timestamp"
    in_dir = str(tmp_path / "br_ooo_in")
    os.makedirs(in_dir)
    # batch 1: two events at T(100) — window (41..100] holds count 2
    # batch 2: a LATE event at T(50) (inside the current window span),
    #          a SAME-SECOND straddle at T(100) (equal to the hwm — a
    #          naive fold would append a duplicate (100, 1) entry and
    #          emit burst 3, contradicting batch 1's already-emitted
    #          burst-2 peers), plus an in-order event at T(110)
    batches = [
        [(1, T(100)), (1, T(100))],
        [(1, T(50)), (1, T(100)), (1, T(110))],
    ]
    for i, chunk in enumerate(batches, 1):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(in_dir, "*"))
    out = burst_rate_stream(stream, ["user_id"], "ts", window_s=60)
    q = (
        out.writeStream.format("memory")
        .queryName("burst_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    base = int(T(0).timestamp())
    got = sorted(
        ((r["epoch_s"] - base, r["burst"], r["max_burst"])
         for r in spark.table("burst_ooo").collect()),
        key=lambda x: (x[0], x[1] is not None, x[1] or 0),
    )
    # T(50) is late (hwm=100): NULL burst, carried max 2 — a naive fold
    # would have counted the two T(100) events into its window (burst 3,
    # max 3). The T(100) straddle is late too (t == hwm): NULL burst,
    # no duplicate (100, ·) state entry. T(110) still folds in-order:
    # trailing window (51..110] holds batch 1's two T(100) events plus
    # itself (the late straddle never entered state).
    assert got == [
        (50, None, 2),
        (100, None, 2),
        (100, 2, 2),
        (100, 2, 2),
        (110, 3, 3),
    ]


def test_first_touch_attribution_stream_equals_batch(spark, tmp_path):
    """Streaming FIRST-touch attribution must equal the batch window
    carry across micro-batch boundaries: the latch set in batch 1 still
    credits purchases arriving in batch 2 (never overwritten by later
    touches), and a user whose first event is a purchase credits
    'direct'."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        first_touch_attribution_stream,
    )

    root = str(tmp_path / "ft_in")
    types = ["view", "click", "purchase", "error", "purchase", "signup"]
    rows = []
    for i in range(36):
        user = f"u{i % 3}"
        rows.append((user, i, types[(i * 5 + i // 3) % len(types)]))
    # u3: first touch (view) != last touch (click) at the purchase, with
    # the latch set in batch 1 and the purchase arriving in batch 2 —
    # the case that distinguishes first- from last-touch semantics AND
    # exercises the cross-batch latch carry.
    rows += [("u3", 1, "view"), ("u3", 20, "click"), ("u3", 30, "purchase")]
    df = spark.createDataFrame(rows, "k string, seq long, t string")
    for part in range(2):
        df.filter((F.col("seq") >= part * 18) & (F.col("seq") < (part + 1) * 18)) \
            .coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "t")

    stream = (
        spark.readStream.schema("k string, seq long, t string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
        .select("k", "seq", "t")
    )
    out = _drain(
        first_touch_attribution_stream(stream, ["k"], ["seq"], "t", "purchase"),
        "ft_stream",
    )
    got = sorted((r["k"], r["seq"], r["channel"]) for r in out.collect())

    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("seq").rowsBetween(W.unboundedPreceding, 0)
    first_ch = F.first(
        F.when(F.col("t") != "purchase", F.col("t")), ignorenulls=True
    ).over(w)
    expect = sorted(
        (r["k"], r["seq"], r["channel"])
        for r in batch.withColumn("_ch", first_ch)
        .filter(F.col("t") == "purchase")
        .select("k", "seq", F.coalesce("_ch", F.lit("direct")).alias("channel"))
        .collect()
    )
    assert got == expect and len(got) > 0
    channels = {c for _, _, c in got}
    assert "direct" in channels and len(channels) >= 2
    # the latch must differ from last-touch on this fixture (first!=last
    # for at least one purchase) or the test wouldn't distinguish them
    last_ch = F.last(
        F.when(F.col("t") != "purchase", F.col("t")), ignorenulls=True
    ).over(w)
    last = sorted(
        (r["k"], r["seq"], r["channel"])
        for r in batch.withColumn("_ch", last_ch)
        .filter(F.col("t") == "purchase")
        .select("k", "seq", F.coalesce("_ch", F.lit("direct")).alias("channel"))
        .collect()
    )
    assert got != last


def test_transition_census_stream_equals_batch_lag_pairs(spark, tmp_path):
    """The drained streaming transition census, group-summed, must equal
    the batch per-user lag-pair aggregate bit-for-bit — including the
    transition that STRADDLES the micro-batch boundary (the pair a
    stateless per-batch lag drops)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        transition_census_stream,
    )

    root = str(tmp_path / "tc_in")
    types = ["view", "click", "purchase", "view", "signup", "error"]
    rows = [(f"u{i % 3}", i, types[(i * 5 + i // 2) % len(types)]) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, seq long, t string")
    for part in range(2):
        df.filter((F.col("seq") >= part * 15) & (F.col("seq") < (part + 1) * 15)) \
            .coalesce(1).write.parquet(os.path.join(root, f"part={part}"))
    batch = spark.read.parquet(os.path.join(root, "part=*")).select("k", "seq", "t")

    stream = (
        spark.readStream.schema("k string, seq long, t string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "part=*"))
        .select("k", "seq", "t")
    )
    out = _drain(
        transition_census_stream(stream, ["k"], ["seq"], "t"), "tc_stream"
    )
    got = sorted(
        (r["from_t"], r["to_t"], r["c"])
        for r in out.groupBy("from_t", "to_t")
        .agg(F.sum("cnt").cast("long").alias("c"))
        .collect()
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("seq")
    expect = sorted(
        (r["from_t"], r["to_t"], r["c"])
        for r in batch.withColumn("_prev", F.lag("t").over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_t"), F.col("t").alias("to_t"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    assert got == expect and len(got) > 0
    # the boundary-straddling pair must be present: each user's seq-14
    # neighbor pair crosses the two files
    total_stream = sum(c for _, _, c in got)
    n_users = 3
    n_rows = 30
    assert total_stream == n_rows - n_users  # every consecutive pair counted


def test_streaming_error_rate_census_matches_batch(spark, tmp_path):
    """Streaming Wilson monitor: the hourly (n_events, n_errors)
    census after 3 micro-batches (additive cell merges, hours
    straddling batch boundaries) is bit-identical to the one-shot
    batch hourly aggregate, and read_error_rate emits the SAME rows
    as the batch events_error_rate_wilson formula over those counts
    (fixed-order double, micro-floored)."""
    import datetime as dt
    import glob
    import math
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_error_rate,
        streaming_error_rate_census,
    )

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    # hour 10 spans batches 1+2; hour 11 spans 2+3; hour 12 only in 3
    b1 = [(t(10, 5), "error"), (t(10, 10), "click"), (t(10, 20), "view")]
    b2 = [(t(10, 40), "error"), (t(11, 0), "click"), (t(11, 30), "error")]
    b3 = [(t(11, 45), "click"), (t(12, 1), "view"), (t(12, 2), "view")]
    schema = "ts timestamp, event_type string"
    in_dir = str(tmp_path / "er_in")
    os.makedirs(in_dir)
    for i, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * i, 1_000_000 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    root = str(tmp_path / "er_root")
    streaming_error_rate_census(stream, root, "ts", "event_type")

    latest = max(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    got = {
        r["ts_hour"]: (r["n_events"], r["n_errors"])
        for r in spark.read.parquet(latest).collect()
    }
    want = {
        dt.datetime(2024, 1, 1, 10): (4, 2),
        dt.datetime(2024, 1, 1, 11): (3, 1),
        dt.datetime(2024, 1, 1, 12): (2, 0),
    }
    assert got == want

    # read-time Wilson == plain-Python fixed-order formula
    out = {
        r["ts_hour"]: (r["p_micro"], r["wilson_lo_micro"], r["wilson_hi_micro"])
        for r in read_error_rate(spark, root).collect()
    }
    for hour, (n, e) in want.items():
        p = e / n
        center = p + 3.8416 / (2.0 * n)
        margin = 1.96 * math.sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n))
        denom = 1.0 + 3.8416 / n
        assert out[hour] == (
            (e * 1000000) // n,
            math.floor(1000000.0 * (center - margin) / denom),
            math.floor(1000000.0 * (center + margin) / denom),
        )


def test_streaming_concurrency_census_matches_batch(spark, tmp_path):
    """Streaming peak-concurrency twin: closed sessions (gap + event-
    time timers) fold into an additive ±1 boundary census, and once a
    sentinel key has advanced the watermark past every real session's
    last+gap, read_peak_concurrency equals the BATCH
    events_peak_concurrency_daily on the same (real) events — sessions
    still open (the sentinel's own) are honestly absent from both
    sides."""
    import datetime as dt
    import os
    import time as _time

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_peak_concurrency,
        streaming_concurrency_census,
    )

    def t(d, h, m):
        return dt.datetime(2024, 3, d, h, m)

    real = [
        (1, t(1, 10, 0)), (1, t(1, 10, 30)),       # session [10:00, 10:30:01)
        (2, t(1, 10, 5)), (2, t(1, 10, 35)),       # overlaps user 1
        (3, t(1, 10, 29)),                         # 3-way overlap at 10:29
        (4, t(1, 23, 59)), (4, t(2, 0, 20)),       # spans midnight into Mar 2
    ]
    sentinel = [
        (99, dt.datetime(2024, 3, 12, 0, 0, 0)),
        (99, dt.datetime(2024, 3, 12, 0, 1, 0)),
    ]
    in_dir = str(tmp_path / "conc_in")
    os.makedirs(in_dir)
    files = [real[:4], real[4:], sentinel[:1], sentinel[1:]]
    for i, rows in enumerate(files):
        spark.createDataFrame(
            [(u, ts, 1.0) for (u, ts) in rows], "user_id long, ts timestamp, value double"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"f{i}"))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root = str(tmp_path / "conc_root")
    streaming_concurrency_census(
        stream, root, ["user_id"], "ts", "value",
        gap="3600 seconds", watermark="10 seconds",
    )
    got = {
        r["day"]: r["peak_concurrency"]
        for r in read_peak_concurrency(spark, root).collect()
    }

    # batch side over the REAL events only (the sentinel's session
    # never closed, so the stream never saw its span either)
    sf_dir = str(tmp_path / "conc_fix")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, ts, u, "click", 1.0, "{}") for i, (u, ts) in enumerate(real)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))
    want = {
        r["day"]: r["peak_concurrency"]
        for r in entrymod.events_peak_concurrency_daily(spark, sf_dir).collect()
    }
    assert got == want
    assert want["2024-03-01"] == 3 and want["2024-03-02"] == 1


def test_streaming_entry_exit_census_matches_batch(spark, tmp_path):
    """Streaming entry→exit twin: closed sessions (gap + event-time
    timers) fold into an additive (entry, exit) census, and once a
    sentinel key has advanced the watermark past every real session's
    last+gap, read_entry_exit_matrix equals the BATCH
    events_session_entry_exit_matrix on the same (real) events —
    including a same-timestamp tie broken by event_id on both sides."""
    import datetime as dt
    import os
    import time as _time

    import __spark_entry__ as entrymod
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        read_entry_exit_matrix,
        streaming_entry_exit_census,
    )

    def t(d, h, m):
        return dt.datetime(2024, 3, d, h, m)

    # (event_id, user, ts, type): user 1 has two sessions (gap > 1h);
    # user 2's session ENDS on a ts tie (ids 6/7) — exit must be the
    # HIGHER event_id's type in both engines.
    real = [
        (1, 1, t(1, 10, 0), "view"),
        (2, 1, t(1, 10, 30), "purchase"),
        (3, 1, t(1, 13, 0), "search"),      # new session (2.5 h gap)
        (4, 1, t(1, 13, 10), "view"),
        (5, 2, t(1, 9, 0), "click"),
        (6, 2, t(1, 9, 20), "view"),
        (7, 2, t(1, 9, 20), "purchase"),    # tie with id 6
    ]
    sentinel = [
        (98, 99, dt.datetime(2024, 3, 12, 0, 0, 0), "click"),
        (99, 99, dt.datetime(2024, 3, 12, 0, 1, 0), "click"),
    ]
    in_dir = str(tmp_path / "ee_in")
    os.makedirs(in_dir)
    files = [real[:4], real[4:], sentinel[:1], sentinel[1:]]
    for i, rows in enumerate(files):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"f{i}"))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root = str(tmp_path / "ee_root")
    streaming_entry_exit_census(
        stream, root, ["user_id"], "ts", "event_id", "event_type",
        gap="3600 seconds", watermark="10 seconds",
    )
    got = {
        (r["entry_type"], r["exit_type"]): r["n_sessions"]
        for r in read_entry_exit_matrix(spark, root).collect()
    }

    sf_dir = str(tmp_path / "ee_fix")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for (i, u, ts, et) in real],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))
    want = {
        (r["entry_type"], r["exit_type"]): r["n_sessions"]
        for r in entrymod.events_session_entry_exit_matrix(spark, sf_dir).collect()
    }
    assert got == want
    assert want[("view", "purchase")] == 1   # user 1 session 1
    assert want[("search", "view")] == 1     # user 1 session 2
    # user 2: exit is the HIGHER event_id of the 9:20 tie (purchase,
    # id 7 — not view, id 6) on BOTH sides
    assert want[("click", "purchase")] == 1


def test_feature_asof_stream_matches_batch(spark, tmp_path):
    """Streaming feature-snapshot twin: chunked replay of the REAL
    sf0.001 events through feature_asof_stream emits, per purchase,
    exactly the strictly-prior (count, value-cents) the batch
    events_feature_asof_snapshot computes with its 1-preceding
    frame — per-row parity on real data."""
    import os

    import __spark_entry__ as entrymod
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_events,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        feature_asof_stream,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        run_stream_to_memory,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = read_events(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # chunked replay: 3 files split by event_id band — within-key order
    # across chunks holds because ts is monotone-ish per file band; the
    # operator's contract is key-ordered arrival, which banding by the
    # monotone event_id satisfies.
    in_dir = str(tmp_path / "fa_in")
    os.makedirs(in_dir)
    n = ev.count()
    bands = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]
    from pyspark.sql import functions as F

    for i, (lo, hi) in enumerate(bands):
        ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(
            1
        ).write.parquet(os.path.join(in_dir, f"f{i}"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    out = feature_asof_stream(
        stream, ["user_id"], "ts", "event_id", "event_type", "value"
    )
    got_df = run_stream_to_memory(out, "fa_mem", output_mode="append")
    got = {
        (r["user_id"], r["event_id"]): (r["n_prior_events"], r["prior_value_cents"])
        for r in got_df.collect()
    }
    want = {
        (r["user_id"], r["event_id"]): (r["n_prior_events"], r["prior_value_cents"])
        for r in entrymod.events_feature_asof_snapshot(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_ivf_index_maintenance_equals_batch_assignment(spark, tmp_path):
    """The incrementally-maintained IVF index must equal the batch
    one-shot assignment over the final corpus state: a vector
    re-embedded in a LATER micro-batch must MOVE to its new cell
    (latest-per-key upsert), batch-1-only vectors carry forward, and
    the cell-occupancy census matches a batch groupBy over the same
    assignment — all against ONE frozen codebook, the production IVF
    lifecycle (train offline, update postings continuously)."""
    import os
    import random

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.similarity import (
        ivf_assign_cells,
        train_ivf_centroids,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        ivf_cell_stats,
        ivf_index_maintain_stream,
        read_snapshot,
    )

    rng = random.Random(7)

    def vec():
        return [rng.uniform(-1, 1) for _ in range(8)]

    b0 = [(i, 0, vec()) for i in range(20)]
    # re-embed ids 3 and 7 with NEW vectors in batch 2, add 20..24
    b1 = [(3, 1, vec()), (7, 1, vec())] + [(i, 1, vec()) for i in range(20, 25)]
    schema = "vec_id long, seq long, embedding array<double>"

    in_dir = str(tmp_path / "vecs_in")
    os.makedirs(in_dir)
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
    os.utime(os.path.join(in_dir, "f0"), (1_000_000, 1_000_000))
    os.utime(os.path.join(in_dir, "f1"), (2_000_000, 2_000_000))

    # FINAL corpus state (latest seq per id) — the batch truth
    latest = {r[0]: r for r in b0}
    for r in b1:
        latest[r[0]] = r
    final_df = spark.createDataFrame(sorted(latest.values()), schema)

    cents = train_ivf_centroids(final_df, num_cells=4, seed=42)
    assert all(isinstance(c, list) for c in cents)  # plain lists, no numpy leak

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    snap = str(tmp_path / "ivf_snap")
    ivf_index_maintain_stream(stream, snap, cents, order_cols=("seq",))

    got = {
        r["vec_id"]: (r["seq"], r["cell"])
        for r in read_snapshot(spark, snap).collect()
    }
    exp_cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_cells(final_df, cents).collect()
    }
    assert set(got) == set(exp_cells) and len(got) == 25
    for vid, cell in exp_cells.items():
        want_seq = 1 if vid in (3, 7) or vid >= 20 else 0
        assert got[vid] == (want_seq, cell), vid

    # census equals a batch groupBy over the same assignment
    got_stats = {
        r["cell"]: r["n_vectors"] for r in ivf_cell_stats(spark, snap).collect()
    }
    exp_stats: dict = {}
    for c in exp_cells.values():
        exp_stats[c] = exp_stats.get(c, 0) + 1
    assert got_stats == exp_stats


def test_feature_asof_stream_rounds_half_up_like_batch(spark, tmp_path):
    """Exact-.5 cent edge (r10 ADVICE): a value whose *100 lands
    exactly on .5 (0.125 -> 12.5 cents) must round HALF-UP (13) like
    the batch twin's F.round / the DuckDB oracle's round — Python
    round() would give 12 (half-to-even) and break bit-parity. One
    key, three events: the purchase must see prior cents 13 + 38 (0.125 and 0.375 are
    exactly representable doubles, so *100 lands on .5 precisely;
    Python round() would emit 12 for the first)."""
    import os

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.stateful import (
        feature_asof_stream,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming.windows import (
        run_stream_to_memory,
    )

    rows = [
        (1, "2024-01-01 00:00:01", 7, "view", 0.125),   # 12.5 -> 13 HALF_UP
        (2, "2024-01-01 00:00:02", 7, "click", 0.375),  # 37.5 -> 38 (exact binary)
        (3, "2024-01-01 00:00:03", 7, "purchase", 9.99),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value")
    in_dir = str(tmp_path / "halfup_in")
    os.makedirs(in_dir)
    df.coalesce(1).write.parquet(os.path.join(in_dir, "f0"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    out = feature_asof_stream(
        stream, ["user_id"], "ts", "event_id", "event_type", "value"
    )
    got = run_stream_to_memory(out, "halfup_mem", output_mode="append").collect()
    assert len(got) == 1
    assert (got[0]["n_prior_events"], got[0]["prior_value_cents"]) == (2, 51)


def test_streaming_lateness_census_matches_batch_over_full_ingest_order(
    spark, tmp_path
):
    """Drained streaming lateness census == the batch histogram of
    greatest(0, strictly-prior frontier − event-time) over the SAME
    total ingest order — on deliberately OUT-OF-ORDER data, with a
    late event whose frontier was set in an EARLIER micro-batch (the
    cross-batch carry the one-row frontier state exists for)."""
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        read_lateness_census,
        streaming_lateness_census,
    )

    # ingest order = event_id; event-times jump backward twice:
    # id 2 is 30 s late vs id 1's frontier (in-batch), id 4 is 100 s
    # late vs id 3's frontier carried from batch 1 into batch 2.
    rows = [
        (1, "2024-01-01 00:10:00"),
        (2, "2024-01-01 00:09:30"),   # 30 s late (same batch)
        (3, "2024-01-01 00:20:00"),
        (4, "2024-01-01 00:18:20"),   # 100 s late (cross-batch carry)
        (5, "2024-01-01 00:21:00"),
        (6, "2024-01-01 00:21:00"),   # tie: 0 s late
    ]
    schema = "event_id long, ts string"
    df = spark.createDataFrame(rows, schema).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    in_dir = str(tmp_path / "late_in")
    os.makedirs(in_dir)
    df.filter("event_id <= 3").coalesce(1).write.parquet(os.path.join(in_dir, "f0"))
    df.filter("event_id > 3").coalesce(1).write.parquet(os.path.join(in_dir, "f1"))
    os.utime(os.path.join(in_dir, "f0"), (1_000_000, 1_000_000))
    os.utime(os.path.join(in_dir, "f1"), (2_000_000, 2_000_000))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root = str(tmp_path / "late_census")
    streaming_lateness_census(stream, root)

    got = {
        r["late_s"]: r["n"] for r in read_lateness_census(spark, root).collect()
    }
    # batch truth: events 2..6 have a prior frontier; lateness 30 (id 2),
    # 0 (id 3), 100 (id 4), 0 (id 5), 0 (id 6)
    assert got == {0: 3, 30: 1, 100: 1}

    # replay into a fresh root reproduces the identical census
    stream2 = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root2 = str(tmp_path / "late_census_2")
    streaming_lateness_census(stream2, root2)
    got2 = {
        r["late_s"]: r["n"] for r in read_lateness_census(spark, root2).collect()
    }
    assert got2 == got


def test_streaming_incremental_rollup_is_bit_identical_to_batch_q1(spark, tmp_path):
    """Incremental view maintenance of the FLAGSHIP aggregate: the
    sf0.001 lineitem streamed in 3 chunks through
    streaming_incremental_rollup (decimal partial sums kept decimal
    through the store), derived on read, must be BIT-IDENTICAL to the
    one-shot batch q1_pricing_summary — the IVM guarantee (maintain
    the additive core, derive averages at read time)."""
    import os

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_table,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        read_snapshot,
        streaming_incremental_rollup,
    )

    sf_dir = "/root/testdata/sf0.001"
    li = read_table(spark, sf_dir, "lineitem")
    in_dir = str(tmp_path / "li_in")
    os.makedirs(in_dir)
    for i in range(3):
        li.filter(F.pmod(F.col("l_orderkey"), F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )

    DEC = "decimal(18,2)"
    price = F.col("l_extendedprice").cast(DEC)
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    tax_f = (F.lit(1) + F.col("l_tax")).cast("decimal(4,2)")
    partials = {
        "sum_qty_dec": F.sum(F.col("l_quantity").cast(DEC)),
        "sum_base_dec": F.sum(price),
        "sum_disc_dec": F.sum(price * disc_f),
        "sum_charge_dec": F.sum(price * disc_f * tax_f),
        "count_order": F.count(F.lit(1)),
    }
    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root = str(tmp_path / "q1_rollup")
    streaming_incremental_rollup(
        stream, root, ["l_returnflag", "l_linestatus"], partials
    )

    derived = read_snapshot(spark, root).select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        F.col("sum_base_dec").cast("double").alias("sum_base_price"),
        F.col("sum_disc_dec").cast("double").alias("sum_disc_price"),
        F.col("sum_charge_dec").cast("double").alias("sum_charge"),
        F.round(
            F.col("sum_qty_dec").cast("double") / F.col("count_order"), 4
        ).alias("avg_qty"),
        F.round(
            F.col("sum_base_dec").cast("double") / F.col("count_order"), 4
        ).alias("avg_price"),
        "count_order",
    )
    got = {tuple(r) for r in derived.collect()}
    want = {tuple(r) for r in entrymod.q1_pricing_summary(spark, sf_dir).collect()}
    assert got == want and len(want) > 0


def test_watermark_recommendation_applied_end_to_end(spark, tmp_path):
    """VERDICT r11 item #5 — the number→behavior last mile of the
    watermark loop: (1) an out-of-order feed builds the online
    lateness census; (2) recommended_watermark_from_census reads its
    p99 (the batch recommender's policy); (3) the SAME feed re-streams
    through a tumbling-window count with that delay as withWatermark.
    Pin: the drained windowed counts equal the batch counts over
    exactly the events whose lateness is within the recommended bound
    — the straggler beyond it is dropped (its window state was
    evicted one batch earlier, the condition under which Spark drops
    late rows) — and the measured drop share respects the 1-p99
    budget the recommendation promises."""
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        recommended_watermark_from_census,
        streaming_lateness_census,
        watermarked_tumbling_counts,
    )

    base = 1_700_000_000  # any epoch-second anchor
    # ingest order = event_id. ids 1..100 arrive mostly in order
    # (ts = base + 10*i), except id 50 runs 20 s late vs id 49\'s
    # frontier (ep = base + 470 vs frontier base + 490). Then, each in
    # its own micro-batch: id 101 is 15 s late (within the coming
    # recommendation), id 102 is a 990 s straggler (beyond it, and its
    # window\'s state was evicted when batch 101 advanced the
    # watermark), id 103 is the sentinel that closes every window.
    rows = []
    for i in range(1, 101):
        ep = base + 10 * i - (30 if i == 50 else 0)
        rows.append((i, ep))
    rows.append((101, base + 985))       # 15 s late vs frontier base+1000
    rows.append((102, base + 10))        # straggler: late 990 s
    rows.append((103, base + 100_000))   # sentinel
    df = spark.createDataFrame(rows, "event_id long, ep long").select(
        "event_id", F.timestamp_seconds("ep").alias("ts")
    )
    in_dir = str(tmp_path / "wm_in")
    os.makedirs(in_dir)
    df.filter("event_id <= 100").coalesce(1).write.parquet(os.path.join(in_dir, "f0"))
    for i, eid in enumerate((101, 102, 103)):
        df.filter(f"event_id = {eid}").coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i + 1}")
        )
    for i in range(4):
        os.utime(os.path.join(in_dir, f"f{i}"), (1_000_000 * (i + 1),) * 2)

    def _stream():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(in_dir, "f*"))
        )

    # (1) census the feed\'s observed lateness
    census_root = str(tmp_path / "wm_census")
    streaming_lateness_census(_stream(), census_root)

    # (2) read the recommendation: 99 on-time (incl. sentinel) + 15 s
    # (id 101) + 20 s (id 50) + 990 s (id 102); nearest-rank p99 over
    # n=102 is rank 101 -> 20 s: covers 99%, excludes the straggler
    wm_s = recommended_watermark_from_census(spark, census_root, pctl=99)
    assert wm_s == 20

    # (3) apply it to a live tumbling count over the same feed
    out = watermarked_tumbling_counts(_stream(), "ts", "60 seconds", wm_s)
    q = (
        out.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r["n_events"]
        for r in spark.table("wm_counts").collect()
    }
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # exactly the straggler

    # batch truth over the recommendation\'s contract set: every event
    # within the bound counts (id 50 in-batch late, id 101 cross-batch
    # late-but-within-bound), the straggler (late 990 > 20) drops.
    # (sentinel window excluded — append mode never emits the final
    # open window.)
    kept = df.filter(~F.col("event_id").isin(102, 103))
    want = {
        r["w"]: r["n"]
        for r in kept.groupBy(
            F.window("ts", "60 seconds").alias("win")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("w"), "n")
        .collect()
    }
    assert got == want and len(want) >= 15

    # drop-share honesty: 1 straggler out of 102 lateness-measured
    # events <= the (100 - 99)% budget the p99 recommendation promises
    n_measured, n_dropped = 102, dropped
    assert n_dropped / n_measured <= (100 - 99) / 100


def test_online_census_percentiles_match_batch_recommender(spark, tmp_path):
    """Coherence pin between the TWO watermark-evidence paths: the
    online lateness census (streaming_lateness_census folded over
    micro-batches) read at p50/p95/p99 must produce EXACTLY the batch
    recommender's (diag_watermark_recommendation) percentiles over the
    same total ingest order — same lateness definition (strictly-prior
    frontier, clamped at 0, first event excluded), same integer-ceil
    nearest-rank policy. If either side's rank arithmetic or frontier
    carry drifts, the two numbers split and this fails."""
    import os

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        recommended_watermark_from_census,
        streaming_lateness_census,
    )

    base = 1_700_000_000
    rows = []
    for i in range(1, 61):
        late = (35 * ((i % 3) + 1)) if i % 7 == 0 else 0
        rows.append((i, base + 10 * i - late, i % 5, "view", float(i), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ep long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.timestamp_seconds("ep").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    df.coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))

    got_batch = entrymod.diag_watermark_recommendation(spark, sf_dir).collect()[0]

    in_dir = str(tmp_path / "chunks")
    os.makedirs(in_dir)
    for j, (lo, hi) in enumerate(((1, 20), (21, 40), (41, 60))):
        df.filter((F.col("event_id") >= lo) & (F.col("event_id") <= hi)).coalesce(
            1
        ).write.parquet(os.path.join(in_dir, f"f{j}"))
        os.utime(os.path.join(in_dir, f"f{j}"), (1_000_000 * (j + 1),) * 2)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root = str(tmp_path / "census")
    streaming_lateness_census(stream, root, ts_col="ts", order_col="event_id")

    for pctl, col in ((50, "p50_late_s"), (95, "p95_late_s"), (99, "p99_late_s")):
        online = recommended_watermark_from_census(spark, root, pctl=pctl)
        assert online == got_batch[col], (pctl, online, got_batch[col])
    assert recommended_watermark_from_census(spark, root) == got_batch["watermark_s"]
    assert got_batch["p99_late_s"] > 0  # distribution is non-trivial


def test_ivf_staleness_report_over_maintained_store(spark, tmp_path):
    """The live-store staleness audit: maintain the IVF index over the
    FIRST TWO of three embedding micro-batches, then run
    ivf_staleness_report against the full corpus — the unindexed set
    must be exactly the third (never-ingested) batch, cell by cell,
    with stale_micro/reindex_flag derived from those exact counts."""
    import os

    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.similarity import (
        ivf_assign_cells,
        train_ivf_centroids,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming import (
        ivf_index_maintain_stream,
        ivf_staleness_report,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("seq", F.col("vec_id"))
    )
    cents = train_ivf_centroids(emb, num_cells=8)
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]

    in_dir = str(tmp_path / "emb_in")
    os.makedirs(in_dir)
    emb.filter(F.col("vec_id") < cut1).coalesce(1).write.parquet(
        os.path.join(in_dir, "f0")
    )
    emb.filter(
        (F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2)
    ).coalesce(1).write.parquet(os.path.join(in_dir, "f1"))
    os.utime(os.path.join(in_dir, "f0"), (1_000_000, 1_000_000))
    os.utime(os.path.join(in_dir, "f1"), (2_000_000, 2_000_000))

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "f*"))
    )
    root = str(tmp_path / "ivf_store")
    ivf_index_maintain_stream(stream, root, cents)

    got = {
        r["cell"]: (r["n_indexed"], r["n_unindexed"], r["stale_micro"], r["reindex_flag"])
        for r in ivf_staleness_report(spark, root, emb, cents).collect()
    }

    # ground truth: assign every vector, split at cut2
    truth = {}
    for r in ivf_assign_cells(emb, cents).select("vec_id", "cell").collect():
        n_idx, n_un = truth.get(r["cell"], (0, 0))
        if r["vec_id"] < cut2:
            truth[r["cell"]] = (n_idx + 1, n_un)
        else:
            truth[r["cell"]] = (n_idx, n_un + 1)
    want = {
        c: (
            n_idx,
            n_un,
            (n_un * 1_000_000) // (n_idx + n_un),
            int((n_un * 1_000_000) // (n_idx + n_un) > 200_000),
        )
        for c, (n_idx, n_un) in truth.items()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) == len([i for i in ids if i >= cut2])
    assert any(v[3] == 1 for v in got.values())  # ~1/3 unindexed -> flags fire
