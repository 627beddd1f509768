"""Watermarked time/session windows over streams — the idiomatic
generalization of the reference's time-series domain (SURVEY.md §2.6
"Time windows"; the reference itself has no event-time handling at all,
everything is arrival-order — SURVEY.md §1.1).

Built-ins only: ``window()`` for tumbling/sliding, ``session_window()``
for gap sessions, ``withWatermark`` for bounded state + late-data drop.
State store size is bounded by (watermark horizon / slide) × |keys| —
the knob that makes these safe on unbounded streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_dedup",
    "streaming_minhash_dedup",
    "read_accepted_signatures",
    "streaming_bm25_stats",
    "streaming_weighted_sample",
    "streaming_fuzzy_match",
    "read_fuzzy_matches",
    "weighted_sample_from_store",
    "bm25_topk_from_store",
    "streaming_heavy_hitters",
    "read_heavy_hitters",
    "streaming_upsert_snapshot",
    "read_snapshot",
    "streaming_psi_census",
    "read_psi",
    "streaming_error_rate_census",
    "read_error_rate",
    "streaming_concurrency_census",
    "read_peak_concurrency",
    "run_stream_foreach_batch",
    "run_stream_to_memory",
]


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    key_cols: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows; with a watermark, late rows
    beyond the horizon are dropped and window state is finalized."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration), *key_cols).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    key_cols: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide), *key_cols).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    key_cols: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (dynamic extent; closes after ``gap``
    of inactivity). The streaming counterpart of the batch
    ``sessionize_by_gap`` prefix-sum construction (operators/windows.py).
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap), *key_cols).agg(*aggs)


def streaming_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact-dedup: emit the FIRST row per key, drop later
    duplicates — the on-ingest face of the batch ``exact_dedup``
    operator (dedup as data arrives instead of as a later corpus pass).

    Without a watermark the seen-keys state grows forever; with
    ``ts_col`` + ``watermark`` Spark uses ``dropDuplicatesWithinWatermark``
    so a key's state is evicted once the watermark passes it — bounded
    state on unbounded streams, at the cost that a duplicate arriving
    later than the horizon is re-emitted. That trade (horizon-bounded
    dedup) is exactly how production ingest dedup works; full-history
    exact dedup of an unbounded stream is unbounded state by definition.
    """
    if (ts_col is None) != (watermark is None):
        raise ValueError("ts_col and watermark must be provided together")
    if ts_col is not None and watermark is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))
    return df.dropDuplicates(list(key_cols))


def streaming_upsert_snapshot(
    df: DataFrame,
    root: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> None:
    """Maintain a latest-state-per-key parquet SNAPSHOT from a stream —
    the foreachBatch upsert pattern every CDC ingest ends in when the
    table format has no native MERGE: each micro-batch folds into the
    previous snapshot (union → max_by per key over the total order) and
    writes a NEW versioned directory named by ``batch_id``, then prunes
    older versions. Retries are idempotent because a replayed batch_id
    overwrites its own directory, never appends; readers always take
    the highest ``v=`` dir (:func:`read_snapshot`). At scale the union
    side stays snapshot-sized (|keys|), not log-sized — the log is
    never replayed."""
    import glob
    import os
    import shutil

    keys = list(key_cols)
    order = list(order_cols)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        versions = sorted(
            glob.glob(os.path.join(root, "v=*")),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        )
        cur = batch_df
        if versions:
            cur = spark.read.parquet(versions[-1]).unionByName(batch_df)
        value_cols = [c for c in cur.columns if c not in keys]
        latest = (
            cur.groupBy(*keys)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in value_cols]),
                    F.struct(*[F.col(c) for c in order]),
                ).alias("_s")
            )
            .select(*keys, "_s.*")
        )
        latest.write.mode("overwrite").parquet(os.path.join(root, f"v={batch_id}"))
        for old in versions:
            if int(old.rsplit("=", 1)[1]) != batch_id:
                shutil.rmtree(old, ignore_errors=True)

    run_stream_foreach_batch(df, _merge, output_mode="append")


def ivf_index_maintain_stream(
    df: DataFrame,
    root: str,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    order_cols: Sequence[str] = ("seq",),
) -> None:
    """Incremental IVF index maintenance — the streaming twin of the
    batch one-shot assignment (VERDICT r10 item #4's foreachBatch
    candidate): each micro-batch of (id, embedding, order...) rows is
    assigned its cell MAP-SIDE against the FROZEN codebook
    (:func:`~..operators.similarity.ivf_assign_cells` — the exact
    production IVF lifecycle: centroids trained offline via
    :func:`~..operators.similarity.train_ivf_centroids`, postings
    updated continuously without retraining), then folded
    latest-per-key into the versioned parquet snapshot
    (:func:`streaming_upsert_snapshot` — idempotent on batch_id
    replay, snapshot-sized state, never log-sized). A re-embedded
    vector therefore MOVES cells atomically with the snapshot
    version — no tombstone pass.

    The snapshot stores (id, order..., cell) — the postings map; the
    raw embedding is dropped (rerank tiers re-read it from the lake,
    the honest IVF-Flat split). Read back with :func:`read_snapshot`;
    monitor balance with :func:`ivf_cell_stats` (skewed cells are the
    probe-cost hazard at scale)."""
    from ..operators.similarity import ivf_assign_cells

    assigned = ivf_assign_cells(df, centroids, vec_col=vec_col).drop(vec_col)
    streaming_upsert_snapshot(assigned, root, [id_col], list(order_cols))


def streaming_incremental_rollup(
    df: DataFrame,
    root: str,
    key_cols: Sequence[str],
    partials: "dict[str, Column]",
) -> None:
    """Incremental VIEW MAINTENANCE for keyed additive rollups — the
    generalization of this engine's specialized additive stores
    (Count–Min cells, PSI bins, k-anonymity census) to ANY
    sum/count-shaped aggregate: each micro-batch reduces to per-key
    partials (one map-side-combined groupBy over BATCH rows only),
    which merge additively into the versioned snapshot. State is
    |keys| rows, never the log; a full-history recompute never
    happens. Derived columns (averages, ratios) belong at READ time
    over the exact partials — the classic IVM split (maintain the
    additive core, derive the rest), which is what lets the
    maintained table stay BIT-IDENTICAL to the batch aggregate: keep
    DECIMAL partial sums decimal through the store and cast once on
    read, exactly like the batch query.

    ``partials`` maps output column name → an ADDITIVE aggregate
    expression (``F.sum(...)``, ``F.count(...)`` — anything with
    agg(A ∪ B) = agg(A) + agg(B); min/max and distinct counts are NOT
    additive and don't belong here). Merged columns are cast back to
    the per-batch aggregate's dtype so the snapshot schema is stable
    across versions (Spark widens decimal precision on every re-sum
    otherwise). batch_id-versioned directories — retry-idempotent
    like every foreachBatch store here. Read back with
    :func:`read_snapshot`."""
    import glob
    import os
    import shutil

    keys = list(key_cols)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = batch_df.groupBy(*keys).agg(
            *[c.alias(n) for n, c in partials.items()]
        )
        dtypes = {f.name: f.dataType for f in cur.schema.fields}
        versions = sorted(
            glob.glob(os.path.join(root, "v=*")),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        )
        # Merge source must be the latest version STRICTLY BEFORE this
        # batch_id: on a foreachBatch retry (write landed, checkpoint
        # commit didn't) versions[-1] is the replayed batch's own
        # output, and re-merging it double-counts the additive
        # partials. Same `< batch_id` filter as every other additive
        # store in this file.
        prior = [
            p for p in versions if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior:
            prev = spark.read.parquet(prior[-1])
            cur = (
                cur.unionByName(prev)
                .groupBy(*keys)
                .agg(
                    *[
                        F.sum(n).cast(dtypes[n]).alias(n)
                        for n in partials
                    ]
                )
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"v={batch_id}"))
        # Prune everything OLDER than the merge source, but keep
        # prior[-1] itself: a retry of THIS batch_id must still find
        # its pre-batch state (once batch_id+1 commits, this version
        # becomes prunable and batch_id never replays again). State is
        # therefore at most 2 snapshot directories.
        for old in prior[:-1]:
            shutil.rmtree(old, ignore_errors=True)

    run_stream_foreach_batch(df, _merge, output_mode="append")


def streaming_lateness_census(
    df: DataFrame,
    root: str,
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> None:
    """Online ingest-lateness census — the STREAMING twin of the batch
    diag_watermark_recommendation: as data arrives, each event's
    lateness (running event-time frontier at its ingest position,
    minus its own event-time, clamped at 0) is folded into an
    additive (late_s, n) histogram, so the watermark recommendation
    can be read continuously instead of from a nightly batch scan.

    State is the value-domain census plus ONE frontier row — never
    the stream: per micro-batch the within-batch strictly-prior
    frontier comes from the distributed_running_max kernel (range
    partitions + broadcast offsets, no single-task sort), the carried
    cross-batch frontier joins in as a broadcast scalar, and the two
    compose exactly because max is associative (greatest(carried,
    within-batch prefix) IS the global prefix over the concatenated
    ingest order). Census merges are additive group-sums — batch_id
    versioned directories, retry-idempotent like every foreachBatch
    store here. Drained census == the batch histogram over the same
    total ingest order (pytest-pinned, including cross-batch
    frontier carry on out-of-order data)."""
    import glob
    import os
    import shutil

    from ..operators.windows import distributed_running_max

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        versions = sorted(
            glob.glob(os.path.join(root, "v=*")),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        )
        # Carry state from the latest version STRICTLY BEFORE this
        # batch_id: on a retry versions[-1] can be the replayed batch's
        # own directory, and merging it double-counts the census (and
        # advances the frontier with the batch's own rows, changing
        # within-batch lateness). Same `< batch_id` filter as every
        # other additive store in this file.
        prior = [
            p for p in versions if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        ep = (
            batch_df.select(
                F.col(order_col).alias("_oid"),
                F.unix_timestamp(ts_col).cast("long").alias("_ep"),
            )
            # computed once per batch (optimization round 13): the
            # first consumer materializes it; the running-max kernel
            # and the final write then read blocks instead of
            # re-scanning the batch source
            .localCheckpoint(eager=False)
        )
        # ZERO driver round-trips per micro-batch (optimization round
        # 14; supersedes round 13's single folded collect): the two
        # scalars the merge needs — the carried cross-batch frontier
        # and this batch's max event-time — stay IN THE PLAN as 1-row
        # aggregate frames, attached where needed via broadcast cross
        # joins. Values and store contents are unchanged: max-folding
        # the frontier rows (ADVICE r13) and the None-handling both
        # translate directly (greatest() ignores NULLs; the frontier
        # row is emitted only when non-NULL, exactly the old
        # `new_frontier is not None` guard).
        prev_census = None
        carried_df = None  # 1-row frame: max prior frontier (NULL if none)
        if prior:
            prev = spark.read.parquet(prior[-1])
            prev_census = prev.filter(F.col("kind") == "census").select(
                "late_s", "n"
            )
            carried_df = (
                prev.filter(F.col("kind") == "frontier")
                .agg(F.max("late_s").cast("long").alias("_carried"))
            )
        # Range-partition count tracks the session's shuffle conf
        # (scopable per-drain via session.stream_drain_session)
        # instead of a constant tuned for one box — the kernel is
        # exact at any partition count.
        fr = distributed_running_max(
            ep, [("_oid", False)], "_ep", out_col="_fr", exclusive=True,
            num_partitions=int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            ),
        )
        if carried_df is not None:
            fr = (
                fr.crossJoin(F.broadcast(carried_df))
                .withColumn("_fr", F.greatest(F.col("_fr"), F.col("_carried")))
                .drop("_carried")
            )
        late = fr.select(
            F.when(
                F.col("_fr").isNotNull(),
                F.greatest(F.col("_fr") - F.col("_ep"), F.lit(0)),
            )
            .cast("long")
            .alias("late_s")
        ).filter(F.col("late_s").isNotNull())
        census = late.groupBy("late_s").agg(F.count(F.lit(1)).cast("long").alias("n"))
        if prev_census is not None:
            census = (
                census.unionByName(prev_census)
                .groupBy("late_s")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        # New frontier = max(carried, batch max), computed in-plan; the
        # row is omitted when both are NULL (the old None guard).
        frontier_new = ep.agg(F.max("_ep").cast("long").alias("_bm"))
        if carried_df is not None:
            frontier_new = frontier_new.crossJoin(carried_df).select(
                F.greatest(F.col("_bm"), F.col("_carried")).alias("_bm")
            )
        frontier_row = frontier_new.filter(F.col("_bm").isNotNull()).select(
            F.col("_bm").alias("late_s"),
            F.lit(-1).cast("long").alias("n"),
            F.lit("frontier").alias("kind"),
        )
        out = census.withColumn("kind", F.lit("census")).unionByName(
            frontier_row
        )
        out.write.mode("overwrite").parquet(os.path.join(root, f"v={batch_id}"))
        # Keep the merge source (prior[-1]) so a retry of this
        # batch_id can re-merge from the pre-batch state; prune only
        # versions strictly older than it (≤ 2 dirs ever live).
        for old in prior[:-1]:
            shutil.rmtree(old, ignore_errors=True)

    run_stream_foreach_batch(df, _merge, output_mode="append")


def ivf_staleness_report(
    spark,
    root: str,
    corpus: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell STALENESS of a maintained IVF snapshot
    (:func:`ivf_index_maintain_stream`) against the current corpus —
    the live-store sibling of the batch similarity_index_staleness
    report: every corpus vector is assigned its would-be cell against
    the SAME frozen codebook (one stateless Arrow scan), left-joined
    to the snapshot's postings, and rolled up to (cell, n_indexed,
    n_unindexed, stale_micro, reindex_flag). A cell past ~20%
    unindexed is the page to re-index or route to the brute-force
    tier. State read is the |keys|-row snapshot, never the log."""
    from ..operators.similarity import ivf_assign_cells

    idx = read_snapshot(spark, root).select(
        F.col(id_col), F.lit(1).alias("_in_index")
    )
    cur = ivf_assign_cells(corpus, centroids, vec_col=vec_col).select(
        id_col, "cell"
    )
    return (
        cur.join(idx, id_col, "left")
        .groupBy("cell")
        .agg(
            F.sum(F.col("_in_index").isNotNull().cast("long"))
            .cast("long")
            .alias("n_indexed"),
            F.sum(F.col("_in_index").isNull().cast("long"))
            .cast("long")
            .alias("n_unindexed"),
        )
        .select(
            "cell",
            "n_indexed",
            "n_unindexed",
            F.expr(
                "CAST((n_unindexed * 1000000) div (n_indexed + n_unindexed) AS BIGINT)"
            ).alias("stale_micro"),
            (F.expr("(n_unindexed * 1000000) div (n_indexed + n_unindexed)") > 200000)
            .cast("int")
            .alias("reindex_flag"),
        )
        .orderBy("cell")
    )


def read_maintained_rollup(spark, root: str) -> DataFrame:
    """Serve the CURRENT state of a :func:`streaming_incremental_rollup`
    store — the IVM read path: the latest snapshot's exact additive
    partials plus ``as_of_version`` freshness metadata (the batch_id
    whose commit produced the snapshot being served — what a consumer
    logs/joins to know HOW fresh the answer is). Derived columns
    (averages, ratios) belong here, on top of the exact partials —
    never in the maintained state (the classic IVM split)."""
    import glob
    import os

    versions = sorted(
        glob.glob(os.path.join(root, "v=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not versions:
        raise FileNotFoundError(f"no rollup versions under {root}")
    latest = versions[-1]
    as_of = int(latest.rsplit("=", 1)[1])
    return spark.read.parquet(latest).withColumn(
        "as_of_version", F.lit(as_of).cast("long")
    )


def read_lateness_census(spark, root: str) -> DataFrame:
    """Current (late_s, n) histogram of a
    :func:`streaming_lateness_census` store — the input to a
    nearest-rank percentile read (recommended watermark = the p99
    lateness, the batch recommender's policy)."""
    return (
        read_snapshot(spark, root)
        .filter(F.col("kind") == "census")
        .select("late_s", "n")
        .orderBy("late_s")
    )


def recommended_watermark_from_census(spark, root: str, pctl: int = 99) -> int:
    """Nearest-rank p``pctl`` of a :func:`streaming_lateness_census`
    store's (late_s, n) histogram — the delay, in seconds, to pass to
    ``withWatermark``. Same integer-ceil rank policy as the batch
    recommender (diag_watermark_recommendation: cover ``pctl``% of
    late data without holding state for stragglers). The collect is a
    bounded-domain driver fold: the census has one row per DISTINCT
    lateness second, never per event."""
    hist = sorted(
        ((int(r["late_s"]), int(r["n"])) for r in read_lateness_census(spark, root).collect()),
    )
    n = sum(cnt for _, cnt in hist)
    if n == 0:
        return 0
    target = (n * pctl + 99) // 100
    acc = 0
    for late_s, cnt in hist:
        acc += cnt
        if acc >= target:
            return late_s
    return hist[-1][0]


def watermarked_tumbling_counts(
    df: DataFrame, ts_col: str, window_duration: str, delay_s: int
) -> DataFrame:
    """The recommend→apply LAST MILE of the watermark loop: a live
    tumbling-window count with the recommended delay applied as the
    stream's watermark. Append-mode semantics: a window emits once
    the watermark (running max event time − ``delay_s``) passes its
    end, and a row arriving after its window closed is DROPPED — so a
    p99 recommendation bounds the drop share at ~1% by construction,
    which the end-to-end pytest pins (census → recommendation →
    withWatermark → measured drop set)."""
    return (
        df.withWatermark(ts_col, f"{int(delay_s)} seconds")
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def ivf_cell_stats(spark, root: str) -> DataFrame:
    """Cell-occupancy census of a maintained IVF index snapshot —
    (cell, n_vectors), the balance report probe planning reads (a
    cell holding half the corpus makes nprobe cost unpredictable;
    retrain or split when max/median drifts). One grouped aggregate
    over the snapshot."""
    return (
        read_snapshot(spark, root)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("cell")
    )


def read_snapshot(spark, root: str) -> DataFrame:
    """Read the current version of a :func:`streaming_upsert_snapshot`
    directory (highest ``v=`` dir)."""
    import glob
    import os

    versions = sorted(
        glob.glob(os.path.join(root, "v=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not versions:
        raise FileNotFoundError(f"no snapshot versions under {root}")
    return spark.read.parquet(versions[-1])


def run_stream_foreach_batch(df: DataFrame, fn, output_mode: str = "update") -> None:
    """Drain a (bounded) stream through ``foreachBatch`` — the escape
    hatch for sinks Structured Streaming lacks natively (JDBC upserts,
    multi-table writes, merge-into). ``fn(batch_df, batch_id)`` runs on
    the driver once per micro-batch with a BATCH DataFrame, so every
    batch writer in this engine works unchanged inside it. Idempotence
    contract: ``batch_id`` is stable across retries — dedup/merge on it
    for exactly-once sinks."""
    q = df.writeStream.foreachBatch(fn).outputMode(output_mode).trigger(availableNow=True).start()
    q.awaitTermination()


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drain a (bounded) stream into the in-memory sink and return the
    result table — processes everything available, then stops. Test/
    debug utility, mirroring the reference's print() sink role."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def streaming_minhash_dedup(
    df: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> None:
    """Incremental NEAR-dup dedup of a document stream — the on-ingest
    face of the MinHash-LSH batch tier (``streaming_dedup`` is its
    exact-hash sibling): each micro-batch is signature'd once
    (map-side Arrow UDF), deduped within itself, then band-joined
    against the accumulated ACCEPTED-corpus signature store; survivors'
    signatures are appended to the store. A corpus ingested over N
    batches is thus deduped against everything accepted before it,
    without ever re-reading accepted TEXT — state is the ~1 KB/doc
    signature table, not the corpus.

    Accept rule (deterministic): a doc is rejected iff its
    signature-estimate Jaccard ≥ ``threshold`` against (a) a SMALLER-id
    doc in its own batch, or (b) any previously accepted doc. (a) is
    the pair rule of the batch tier; conservative on transitive chains
    — a doc whose only match was itself rejected still drops, which
    over-rejects relative to clustered resolution and never
    under-rejects.

    Retry-idempotent: batch ``b`` overwrites ``root/b=<b>`` and reads
    only stores with batch id < b, so a replayed micro-batch can't see
    its own half-written output. At 100 TB scale the per-batch work is
    two equi-joins ((band_idx, band_hash) within-batch and vs-store) —
    the store side prunes to bucket matches; nothing is quadratic and
    nothing driver-side.
    """
    import glob
    import os

    from ..operators.dedup import (
        minhash_band_rows,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    def _est_col():
        return F.round(
            F.aggregate(
                F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.size("_sa"),
            4,
        )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel

        spark = batch_df.sparkSession
        sigs = (
            minhash_signatures(
                batch_df.select(id_col, text_col), id_col, text_col,
                num_hashes, shingle_k, seed,
            )
            .select(id_col, "signature")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cands = minhash_candidate_pairs(sigs, id_col, num_bands, num_hashes=num_hashes)
        est_in = (
            cands.join(sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("_sa")), "id_a")
            .join(sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("_sb")), "id_b")
            .withColumn("_est", _est_col())
        )
        rej_in = (
            est_in.filter(F.col("_est") >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        survivors = sigs.join(rej_in, id_col, "left_anti")

        prior_dirs = [
            p for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            prior = spark.read.parquet(*prior_dirs).select(id_col, "signature")
            nb = minhash_band_rows(survivors, id_col, num_bands, num_hashes).select(
                F.col(id_col).alias("_new_id"), "band_idx", "band_hash"
            )
            pb = minhash_band_rows(prior, id_col, num_bands, num_hashes).select(
                F.col(id_col).alias("_old_id"), "band_idx", "band_hash"
            )
            cross = nb.join(pb, ["band_idx", "band_hash"]).select("_new_id", "_old_id").distinct()
            est_x = (
                cross.join(
                    survivors.select(F.col(id_col).alias("_new_id"), F.col("signature").alias("_sa")),
                    "_new_id",
                )
                .join(
                    prior.select(F.col(id_col).alias("_old_id"), F.col("signature").alias("_sb")),
                    "_old_id",
                )
                .withColumn("_est", _est_col())
            )
            rej_x = (
                est_x.filter(F.col("_est") >= threshold)
                .select(F.col("_new_id").alias(id_col))
                .distinct()
            )
            survivors = survivors.join(rej_x, id_col, "left_anti")

        survivors.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))
        sigs.unpersist()

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_accepted_signatures(spark, root: str) -> DataFrame:
    """Read the accumulated accepted-document signature store of a
    :func:`streaming_minhash_dedup` run (all ``b=`` batch dirs)."""
    import glob
    import os

    dirs = glob.glob(os.path.join(root, "b=*"))
    if not dirs:
        raise FileNotFoundError(f"no accepted-signature batches under {root}")
    return spark.read.parquet(*dirs)


def streaming_heavy_hitters(
    df: DataFrame,
    root: str,
    key_col: str,
    capacity: int,
) -> None:
    """Streaming Misra–Gries heavy hitters: maintain ONE bounded
    (≤ ``capacity`` keys) frequency summary over an unbounded keyed
    stream — the mergeable-summaries property (Agarwal et al., PODS'12)
    applied across micro-batches instead of across partitions (the
    batch tier, ``operators/heavyhitters.py``, merges across
    partitions and then recounts exactly; a stream cannot re-scan its
    history, so the streaming tier keeps the sketch's guarantees
    instead: every key with true count > n/(capacity+1) is PRESENT,
    and each stored weight undercounts its key by at most the total
    decrement — stored alongside the summary as ``_decremented`` so
    readers can bound every estimate).

    Deterministic by construction, unlike a naive per-partition MG over
    the batch (whose weights depend on row placement): each micro-batch
    is counted EXACTLY first (bounded data — one groupBy), then merged
    with the carried summary and MG-decremented by the (capacity+1)-th
    largest combined weight. Batch-id-versioned dirs make replays
    idempotent (same pattern as :func:`streaming_minhash_dedup`).

    The only driver-side action per batch is the (capacity+1)-th weight
    lookup over ≤ capacity + |batch distinct keys| rows — summary-sized,
    never stream-sized.
    """
    import glob
    import os

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = (
            batch_df.select(key_col)
            .filter(F.col(key_col).isNotNull())
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("_w"))
        )
        prior_dirs = sorted(
            (p for p in glob.glob(os.path.join(root, "v=*"))
             if int(p.rsplit("=", 1)[1]) < batch_id),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        )
        decremented = 0
        if prior_dirs:
            prior = spark.read.parquet(prior_dirs[-1])
            decremented = prior.agg(F.max("_decremented")).collect()[0][0] or 0
            counts = (
                prior.select(key_col, "_w")
                .unionByName(counts)
                .groupBy(key_col)
                .agg(F.sum("_w").cast("long").alias("_w"))
            )
        top = counts.orderBy(F.desc("_w"), F.asc(key_col)).limit(capacity + 1).collect()
        threshold = top[-1]["_w"] if len(top) > capacity else 0
        summary = (
            counts.filter(F.col("_w") > threshold)
            .select(
                key_col,
                (F.col("_w") - threshold).cast("long").alias("_w"),
                F.lit(decremented + threshold).cast("long").alias("_decremented"),
            )
        )
        summary.write.mode("overwrite").parquet(os.path.join(root, f"v={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_heavy_hitters(spark, root: str) -> DataFrame:
    """Read the current heavy-hitter summary of a
    :func:`streaming_heavy_hitters` run (highest ``v=`` dir): (key,
    _w lower-bound weight, _decremented upper-bound slack — true count
    ∈ [_w, _w + _decremented])."""
    import glob
    import os

    versions = sorted(
        glob.glob(os.path.join(root, "v=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not versions:
        raise FileNotFoundError(f"no summary versions under {root}")
    return spark.read.parquet(versions[-1])


def streaming_bm25_stats(
    df: DataFrame,
    root: str,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental BM25 statistics store — the streaming face of the
    batch retrieval scorer (operators/text.py:bm25_topk), completing
    batch↔stream parity for the retrieval family (r5 verdict item 7).

    Each micro-batch writes two pure-integer PARTIALS:

    - ``root/tf/b=<id>``: one row per (doc, query term) — (id_col, _t,
      _tf term frequency, _len doc token length), the posting slice the
      scorer needs. Bounded by |query terms| × batch docs.
    - ``root/stats/b=<id>``: the 1-row corpus counter delta (_n docs
      with ≥1 token, _lensum summed token lengths) over ALL batch docs
      (BM25's idf/avglen normalize over the whole corpus, not just
      term-matching docs).

    Retry-idempotent exactly like the MinHash signature store: a batch
    OVERWRITES its own ``b=<id>`` dirs, so a replayed micro-batch
    replaces — never duplicates — its partials. Unlike the dedup store,
    ingest never reads prior state at all (term/length counters are
    pure sums), so there is no cross-batch read-your-writes hazard.
    Contract: document ids must be globally unique across the stream
    (the same append-only-corpus assumption the dedup store makes) —
    re-sent docs would double-count df/length mass.

    Because every stored quantity is an exact BIGINT, folding partials
    at read time reproduces the batch operator's df/avglen/tf scalars
    EXACTLY, and the shared scorer (text.bm25_rank_from_stats) then
    ranks bit-identically to a one-shot batch run over the union of all
    batches — the property the parity test asserts.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    import os

    from ..operators.text import tokens

    terms = [str(t) for t in query_terms]

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        lens = batch_df.select(
            F.col(id_col), F.size(tokens(text_col)).alias("_len")
        ).filter(F.col("_len") > 0)
        stats = lens.agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_len").cast("long").alias("_lensum"),
        )
        toks = batch_df.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("_t")
        ).filter(F.col("_t").isin(terms))
        tf = toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).cast("long").alias("_tf"))
        tf_len = tf.join(lens, id_col)
        tf_len.write.mode("overwrite").parquet(os.path.join(root, "tf", f"b={batch_id}"))
        stats.write.mode("overwrite").parquet(os.path.join(root, "stats", f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def bm25_topk_from_store(
    spark,
    root: str,
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Rank the accumulated :func:`streaming_bm25_stats` store: fold the
    per-batch integer partials (counter deltas SUM exactly; tf rows are
    disjoint by the unique-doc-id contract) and hand them to the same
    scorer the batch operator uses — bit-identical to batch BM25 over
    the union of all ingested batches."""
    import glob
    import os

    from ..operators.text import bm25_rank_from_stats

    tf_dirs = glob.glob(os.path.join(root, "tf", "b=*"))
    stat_dirs = glob.glob(os.path.join(root, "stats", "b=*"))
    if not tf_dirs or not stat_dirs:
        raise FileNotFoundError(f"no bm25 stats batches under {root}")
    tf_len = spark.read.parquet(*tf_dirs)
    stats = spark.read.parquet(*stat_dirs).agg(
        F.sum("_n").cast("long").alias("_n"),
        F.sum("_lensum").cast("long").alias("_lensum"),
    )
    return bm25_rank_from_stats(tf_len, stats, id_col=id_col, k=k, k1=k1, b=b)


def streaming_weighted_sample(
    df: DataFrame,
    root: str,
    weight_col: str,
    key_cols: Sequence[str],
    k: int,
    seed: int = 42,
) -> None:
    """Incremental weighted sampling without replacement — the
    streaming face of ``operators/sampling.py:weighted_sample_topk``.
    A-Res is MERGEABLE by construction: each row's score ln(u)/w
    depends only on the row (u comes from the deterministic md5
    bucket), and the sample is simply the k largest scores — so
    top-k(union of batches) == top-k(union of per-batch top-k's).
    Each micro-batch therefore writes only its own k best rows
    (``root/b=<id>``, retry-idempotent overwrite like every store
    here); the reader folds the ≤ k·batches candidates to the final k.

    State is O(k) per batch dir — never corpus-sized; a re-sent row
    re-derives the SAME score (same key ⇒ same u), so duplicates
    collapse in the fold rather than skewing the sample.
    """
    import os

    from ..operators.sampling import weighted_sample_topk

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        top = weighted_sample_topk(
            batch_df, weight_col, key_cols, k, seed=seed
        ).drop("rk")
        top.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def weighted_sample_from_store(
    spark,
    root: str,
    key_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Fold the per-batch A-Res candidates of a
    :func:`streaming_weighted_sample` run to the final k-row sample —
    bit-identical (scores AND ranks) to a one-shot batch
    ``weighted_sample_topk`` over the union of all ingested batches,
    because scores are row-deterministic and the fold is just the same
    top-k over a candidate superset that provably contains the true
    top k. Duplicate key rows (a replayed/re-sent row) collapse via
    distinct — same key ⇒ same score ⇒ same row."""
    import glob
    import os

    from ..operators.topk import ranked_top_n

    dirs = glob.glob(os.path.join(root, "b=*"))
    if not dirs:
        raise FileNotFoundError(f"no weighted-sample batches under {root}")
    cands = spark.read.parquet(*dirs).distinct()
    return ranked_top_n(
        cands, [("ares_micro", True), (str(key_cols[0]), False)], k, rank_col="rk"
    )


def streaming_fuzzy_match(
    df: DataFrame,
    master: DataFrame,
    root: str,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    length: int,
    max_hamming: int = 1,
) -> None:
    """Incremental ENTITY RESOLUTION of a dirty identifier stream
    against a static master dimension — the streaming face of
    ``operators/joins.py:hamming_neighborhood_join`` (the other twin
    the r5 verdict proposed alongside the BM25 store). Each micro-batch
    runs the same masked-variant blocking join (recall 1 by pigeonhole)
    against the master and writes its matches to ``root/b=<id>``
    (retry-idempotent overwrite). Because the join is row-local on the
    stream side and the master is static, the union of per-batch
    matches IS the batch join of the unioned stream — no cross-batch
    state at all; the store exists for idempotent delivery, not
    correctness."""
    import os

    from ..operators.joins import hamming_neighborhood_join

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        out = hamming_neighborhood_join(
            batch_df, master, left_id, right_id, left_name, right_name,
            length=length, max_hamming=max_hamming,
        )
        out.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_fuzzy_matches(spark, root: str) -> DataFrame:
    """All matches accumulated by :func:`streaming_fuzzy_match`
    (distinct — a replayed batch overwrites its own dir, and identical
    rows from any anomaly collapse)."""
    import glob
    import os

    dirs = glob.glob(os.path.join(root, "b=*"))
    if not dirs:
        raise FileNotFoundError(f"no fuzzy-match batches under {root}")
    return spark.read.parquet(*dirs).distinct()


def streaming_skyline(
    df: DataFrame,
    root: str,
    min_col: str,
    max_col: str,
) -> None:
    """Incremental 2-D SKYLINE maintenance over a point stream — the
    streaming face of ``operators/topk.skyline_2d``: after each
    micro-batch the store holds the exact Pareto frontier of EVERYTHING
    ingested so far. Correct because the skyline is an idempotent
    monotone reduction — skyline(A ∪ B) = skyline(skyline(A) ∪ B):
    dominance is transitive, so any point dominated within A ∪ B is
    dominated by a point that survives A's own skyline; state is the
    frontier (typically ≪ the stream), never the stream itself.

    Each micro-batch unions its (distinct) points with the LATEST
    prior frontier and re-runs the linear sort-based reduction — one
    |frontier| + |batch| input per trigger. Retry-idempotent: batch
    ``b`` overwrites ``root/b=<b>`` and reads only frontier dirs with
    batch id < b, so a replayed micro-batch can't see its own
    half-written output (the signature-store contract)."""
    import glob
    import os

    from ..operators.topk import skyline_2d

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        pts = batch_df.select(min_col, max_col).distinct()
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            pts = pts.unionByName(
                spark.read.parquet(latest).select(min_col, max_col)
            ).distinct()
        frontier = skyline_2d(pts, min_col, max_col)
        frontier.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_skyline_frontier(spark, root: str) -> DataFrame:
    """Read the current frontier of a :func:`streaming_skyline` run
    (highest ``b=`` dir — each dir is the full frontier as of that
    micro-batch)."""
    import glob
    import os

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no skyline frontier batches under {root}")
    return spark.read.parquet(dirs[-1])


def streaming_k_anonymity(
    df: DataFrame,
    root: str,
    qi_cols: Sequence[str],
) -> None:
    """Streaming k-anonymity monitor: after each micro-batch the store
    holds the quasi-identifier equivalence-class census of EVERYTHING
    ingested so far — the privacy gate a release pipeline keeps next
    to its ingest, so a batch that would drop the release's k below
    policy is visible the moment it lands. Class counts are additive
    (count(A ∪ B) = count(A) + count(B) per class), so state is the
    QI-domain-bounded class-count table, never the rows: each
    micro-batch aggregates itself map-side, full-outer-merges with the
    latest prior census, and overwrites ``root/b=<batch_id>``
    (retry-idempotent: a batch reads only censuses with id < its own —
    the signature-store contract). Read the current k with
    :func:`read_k_anonymity`."""
    import glob
    import os

    from pyspark.sql import functions as F

    cols = list(qi_cols)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = batch_df.groupBy(*cols).agg(
            F.count(F.lit(1)).cast("long").alias("class_size")
        )
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            prev = spark.read.parquet(latest)
            # Null-safe merge: a plain equi-join never matches NULL QI
            # values, so a NULL-valued class would accumulate duplicate
            # partial rows instead of one summed class_size (the batch
            # sibling's groupBy treats NULL as one class — this must
            # too). eqNullSafe per QI column; unmatched rows have the
            # other side all-NULL, so per-column coalesce reconstructs
            # the key exactly (including genuinely-NULL values).
            new = cur.withColumnRenamed("class_size", "_new").alias("n")
            old = prev.withColumnRenamed("class_size", "_old").alias("o")
            cond = F.lit(True)
            for c in cols:
                cond = cond & F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
            cur = new.join(old, cond, "full_outer").select(
                *[
                    F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c)
                    for c in cols
                ],
                (
                    F.coalesce(F.col("n._new"), F.lit(0))
                    + F.coalesce(F.col("o._old"), F.lit(0))
                ).cast("long").alias("class_size"),
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_k_anonymity(spark, root: str) -> DataFrame:
    """Current census of a :func:`streaming_k_anonymity` run (highest
    ``b=`` dir) with the release's k — min class size — on every row."""
    import glob
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no k-anonymity censuses under {root}")
    census = spark.read.parquet(dirs[-1])
    w = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return census.withColumn(
        "k_anonymity", F.min("class_size").over(w).cast("long")
    )


def streaming_countmin(
    df: DataFrame,
    root: str,
    token_col: str,
    depth: int = 4,
    width: int = 256,
) -> None:
    """Streaming Count–Min sketch: after each micro-batch the store
    holds the d×w counter table of EVERYTHING ingested so far —
    Count–Min is a linear sketch (counters are plain sums), so the
    cross-batch merge is cell-wise addition, the textbook mergeable-
    summary property that lets 1000 executors (or 1000 micro-batches)
    build one sketch without ever exchanging tokens. Each micro-batch
    aggregates its own d×w cells map-side and full-outer-adds the
    latest prior sketch (the k-anonymity census-store shape:
    retry-idempotent, batch b overwrites ``root/b=<b>``, reads only
    dirs < b). Hash rows use the same md5-modular buckets as the batch
    query (text_countmin_token_freq), so a drained stream's sketch is
    BIT-IDENTICAL to the one-shot batch sketch — pytest-pinned. Read
    with :func:`read_countmin`; point-estimate = min over a token's
    d cells."""
    import glob
    import os

    from pyspark.sql import functions as F

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.select(F.col(token_col).alias("_tok")).select(
            "_tok",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
        ).withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("_tok"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % width,
        )
        cur = hashed.groupBy("r", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("cell")
        )
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            prev = spark.read.parquet(latest)
            cur = (
                cur.withColumnRenamed("cell", "_new")
                .join(prev.withColumnRenamed("cell", "_old"), ["r", "bucket"], "full_outer")
                .select(
                    "r",
                    "bucket",
                    (
                        F.coalesce(F.col("_new"), F.lit(0))
                        + F.coalesce(F.col("_old"), F.lit(0))
                    ).cast("long").alias("cell"),
                )
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_countmin(spark, root: str) -> DataFrame:
    """Current (r, bucket, cell) sketch of a :func:`streaming_countmin`
    run (highest ``b=`` dir)."""
    import glob
    import os

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no count-min sketches under {root}")
    return spark.read.parquet(dirs[-1])


def streaming_psi_census(
    df: DataFrame,
    root: str,
    value_col: str,
    edges: Sequence[int],
) -> None:
    """Streaming PSI bin census — the live half of the drift monitor
    (the batch statistic is ``agg_psi_price_drift``): the serving
    distribution's bin counts are maintained across micro-batches
    against FIXED training-time bin edges (deciles are frozen when the
    model ships — exactly why PSI streams well: only the 10-bin census
    is state, never the values). Bin assignment is the same
    "edges ≤ v" count as the batch query (a pure scan against the
    broadcast edge array); the cross-batch merge is cell-wise addition
    (the Count-Min/k-anonymity census-store shape: batch b overwrites
    ``root/b=<b>``, reads only dirs < b — retry-idempotent). A drained
    stream's census is BIT-IDENTICAL to the one-shot batch binning —
    pytest-pinned. Read the statistic with :func:`read_psi`."""
    import glob
    import os

    from pyspark.sql import functions as F

    edge_arr = F.array(*[F.lit(int(e)).cast("long") for e in edges])

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = (
            batch_df.select(F.col(value_col).cast("long").alias("_v"))
            .filter(F.col("_v").isNotNull())
            .select(
                F.aggregate(
                    edge_arr,
                    F.lit(0).cast("long"),
                    lambda acc, e: acc + F.when(F.col("_v") >= e, 1).otherwise(0),
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            prev = spark.read.parquet(latest)
            cur = (
                cur.withColumnRenamed("c", "_new")
                .join(prev.withColumnRenamed("c", "_old"), ["bin"], "full_outer")
                .select(
                    "bin",
                    (
                        F.coalesce(F.col("_new"), F.lit(0))
                        + F.coalesce(F.col("_old"), F.lit(0))
                    ).cast("long").alias("c"),
                )
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_psi(spark, root: str, reference: DataFrame) -> DataFrame:
    """PSI of a :func:`streaming_psi_census` run against a reference
    census (columns ``bin``, ``c`` — the training-period bin counts).
    Per bin the term (q−p)·ln(q/p) is the batch query's fixed-order
    double over exact BIGINT counts, micro-snapped BEFORE the bounded
    total; a bin empty on either side yields NULL and drops from the
    total (both identical to ``agg_psi_price_drift``)."""
    import glob
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no psi censuses under {root}")
    live = spark.read.parquet(dirs[-1]).select(
        "bin", F.col("c").alias("c_b")
    )
    ref = reference.select("bin", F.col("c").alias("c_a"))
    cells = ref.join(live, "bin", "full_outer").select(
        "bin",
        F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
        F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
    )
    tot = cells.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    p = F.col("c_a").cast("double") / F.col("n_a")
    q = F.col("c_b").cast("double") / F.col("n_b")
    term = F.when(
        (F.col("c_a") > 0) & (F.col("c_b") > 0),
        F.round((q - p) * F.log(q / p) * 1000000).cast("long"),
    )
    scored = j.select("bin", "c_a", "c_b", term.alias("psi_micro"))
    w = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return scored.withColumn(
        "psi_total_micro", F.sum("psi_micro").over(w).cast("long")
    ).orderBy("bin")


def streaming_error_rate_census(
    df: DataFrame,
    root: str,
    ts_col: str,
    type_col: str,
    error_value: str = "error",
) -> None:
    """Streaming error-rate census — the live half of the Wilson
    monitor (the batch statistic is ``events_error_rate_wilson``): per
    event-hour the (n_events, n_errors) pair is maintained across
    micro-batches. Only the two-BIGINT hourly census is state — the
    Wilson interval is a pure read-time function of the counts, so
    nothing about the confidence math lives in the hot path. Cross-
    batch merge is cell-wise addition (the PSI/Count-Min census-store
    shape: batch b overwrites ``root/b=<b>``, reads only dirs < b —
    retry-idempotent). A drained stream's census is BIT-IDENTICAL to
    the one-shot batch hourly aggregate — pytest-pinned. Read the
    intervals with :func:`read_error_rate`."""
    import glob
    import os

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = batch_df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("ts_hour")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col(type_col) == error_value).cast("long"))
            .cast("long")
            .alias("n_errors"),
        )
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            prev = spark.read.parquet(latest)
            cur = (
                cur.withColumnRenamed("n_events", "_ne")
                .withColumnRenamed("n_errors", "_ee")
                .join(
                    prev.withColumnRenamed("n_events", "_no")
                    .withColumnRenamed("n_errors", "_eo"),
                    ["ts_hour"],
                    "full_outer",
                )
                .select(
                    "ts_hour",
                    (
                        F.coalesce(F.col("_ne"), F.lit(0))
                        + F.coalesce(F.col("_no"), F.lit(0))
                    ).cast("long").alias("n_events"),
                    (
                        F.coalesce(F.col("_ee"), F.lit(0))
                        + F.coalesce(F.col("_eo"), F.lit(0))
                    ).cast("long").alias("n_errors"),
                )
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(df, _ingest, output_mode="append")


def read_error_rate(spark, root: str) -> DataFrame:
    """Wilson 95% intervals over a :func:`streaming_error_rate_census`
    store — the SAME fixed-order double expression as the batch
    ``events_error_rate_wilson`` query (micro-floored), evaluated on
    the drained hourly counts, so a drained stream's output is
    bit-identical to the batch query on the same events."""
    import glob
    import os

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no error-rate censuses under {root}")
    cells = spark.read.parquet(dirs[-1])
    n = F.col("n_events").cast("double")
    e = F.col("n_errors").cast("double")
    z2 = F.lit(3.8416)
    p = e / n
    center = p + z2 / (F.lit(2.0) * n)
    margin = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return cells.select(
        "ts_hour",
        "n_events",
        "n_errors",
        F.expr("CAST((n_errors * 1000000) div n_events AS BIGINT)").alias(
            "p_micro"
        ),
        F.floor(F.lit(1000000.0) * (center - margin) / denom)
        .cast("long")
        .alias("wilson_lo_micro"),
        F.floor(F.lit(1000000.0) * (center + margin) / denom)
        .cast("long")
        .alias("wilson_hi_micro"),
    ).orderBy("ts_hour")


def streaming_concurrency_census(
    df: DataFrame,
    root: str,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    gap: str = "3600 seconds",
    watermark: str = "10 seconds",
) -> None:
    """Streaming session-concurrency census — the live half of
    events_peak_concurrency_daily: CLOSED sessions (gap + event-time
    timer emission via session_close_stream — the only correct
    streaming source of session spans, since an open session's end is
    unknown) are folded into a per-second ±1 boundary-delta census
    (end-inclusive: −1 at last+1 s, the batch convention). Only the
    (second → net delta) table is state; cross-batch merge is
    cell-wise addition (the PSI/error-rate census-store shape —
    retry-idempotent). Once every session has closed (watermark past
    last+gap), the drained census is BIT-IDENTICAL to the batch
    query's delta table — pytest-pinned with a sentinel-key drain.
    Read the daily peaks with :func:`read_peak_concurrency`."""
    import glob
    import os

    from .stateful import session_close_stream

    closed = session_close_stream(
        df, key_cols, ts_col, value_col, gap=gap, watermark=watermark
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spans = batch_df.select(
            F.unix_timestamp("first_ts").cast("long").alias("t0"),
            (F.unix_timestamp("last_ts") + 1).cast("long").alias("t1"),
        )
        cur = (
            spans.select(F.col("t0").alias("t"), F.lit(1).alias("d"))
            .unionAll(spans.select(F.col("t1").alias("t"), F.lit(-1).alias("d")))
            .groupBy("t")
            .agg(F.sum("d").cast("long").alias("net"))
        )
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            prev = spark.read.parquet(latest)
            cur = (
                cur.withColumnRenamed("net", "_new")
                .join(prev.withColumnRenamed("net", "_old"), ["t"], "full_outer")
                .select(
                    "t",
                    (
                        F.coalesce(F.col("_new"), F.lit(0))
                        + F.coalesce(F.col("_old"), F.lit(0))
                    ).cast("long").alias("net"),
                )
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(closed, _ingest, output_mode="append")


def read_peak_concurrency(spark, root: str) -> DataFrame:
    """Daily peak concurrency over a :func:`streaming_concurrency_census`
    store — the SAME running-sum + zero-delta-midnight-spine + max-per-
    day pipeline as the batch events_peak_concurrency_daily, evaluated
    on the drained census (the two-phase distributed running-sum
    kernel; never a single-task sort over the boundary stream)."""
    import glob
    import os

    from ..operators.windows import distributed_running_sum

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no concurrency censuses under {root}")
    deltas = spark.read.parquet(dirs[-1]).filter(F.col("net") != 0)
    bounds = deltas.agg(F.min("t").alias("_lo"), F.max("t").alias("_hi"))
    _start = ((F.expr("_lo div 86400") + 1) * 86400).cast("long")
    _stop = (F.expr("_hi div 86400") * 86400).cast("long")
    midnights = bounds.select(
        F.explode(
            F.when(
                _start <= _stop,
                F.sequence(_start, _stop, F.lit(86400).cast("long")),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("t"),
        F.lit(0).cast("long").alias("net"),
    )
    merged = (
        deltas.select("t", "net")
        .unionByName(midnights)
        .groupBy("t")
        .agg(F.sum("net").cast("long").alias("net"))
    )
    run = distributed_running_sum(merged, [("t", False)], "net", out_col="conc")
    return (
        run.select(F.to_date(F.from_unixtime("t")).alias("day"), F.col("conc"))
        .groupBy("day")
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "peak_concurrency")
        .orderBy("day")
    )


def streaming_entry_exit_census(
    df: DataFrame,
    root: str,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    type_col: str,
    gap: str = "3600 seconds",
    watermark: str = "10 seconds",
) -> None:
    """Streaming entry→exit matrix — the live half of
    events_session_entry_exit_matrix: CLOSED sessions (gap + event-time
    timers via session_entry_exit_stream) fold into an additive
    (entry_type, exit_type) → count census. Only the |types|²-bounded
    matrix is state; cross-batch merge is cell-wise addition (the
    PSI/error-rate census-store shape — retry-idempotent). Once every
    session has closed, the drained matrix is BIT-IDENTICAL to the
    batch query's — pytest-pinned with a sentinel-key drain. Read with
    :func:`read_entry_exit_matrix`."""
    import glob
    import os

    from .stateful import session_entry_exit_stream

    closed = session_entry_exit_stream(
        df, key_cols, ts_col, id_col, type_col, gap=gap, watermark=watermark
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = batch_df.groupBy("entry_type", "exit_type").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        prior_dirs = [
            p
            for p in glob.glob(os.path.join(root, "b=*"))
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        if prior_dirs:
            latest = max(prior_dirs, key=lambda p: int(p.rsplit("=", 1)[1]))
            prev = spark.read.parquet(latest)
            cur = (
                cur.withColumnRenamed("n", "_new")
                .join(
                    prev.withColumnRenamed("n", "_old"),
                    ["entry_type", "exit_type"],
                    "full_outer",
                )
                .select(
                    "entry_type",
                    "exit_type",
                    (
                        F.coalesce(F.col("_new"), F.lit(0))
                        + F.coalesce(F.col("_old"), F.lit(0))
                    ).cast("long").alias("n"),
                )
            )
        cur.write.mode("overwrite").parquet(os.path.join(root, f"b={batch_id}"))

    run_stream_foreach_batch(closed, _ingest, output_mode="append")


def read_entry_exit_matrix(spark, root: str) -> DataFrame:
    """Entry→exit matrix over a :func:`streaming_entry_exit_census`
    store — the drained census, shaped exactly like the batch
    events_session_entry_exit_matrix output."""
    import glob
    import os

    dirs = sorted(
        glob.glob(os.path.join(root, "b=*")), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    if not dirs:
        raise FileNotFoundError(f"no entry/exit censuses under {root}")
    return (
        spark.read.parquet(dirs[-1])
        .select("entry_type", "exit_type", F.col("n").alias("n_sessions"))
        .orderBy("entry_type", "exit_type")
    )
