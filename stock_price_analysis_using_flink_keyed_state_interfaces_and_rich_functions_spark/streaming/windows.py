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
