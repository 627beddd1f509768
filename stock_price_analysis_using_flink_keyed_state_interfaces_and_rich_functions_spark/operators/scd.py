"""Slowly-changing-dimension (SCD type 2) merge — warehouse-maintenance
surface (SURVEY.md §2.6 extension; the reference has no notion of
mutable dimensions, §2.5).

Given a dimension history table (key, attrs, valid_from, valid_to with
NULL = current) and a batch of timestamped updates, produce the new
history: closed rows pass through untouched; each key's current row and
its updates form a timeline, consecutive versions with identical
attributes collapse (change detection), and validity intervals are
re-derived with ``lead`` over the timeline. Pure joins + window
functions — no driver-side state, deterministic under any partitioning.

Scale: one hash exchange on the key for the timeline window; closed
history (the bulk of a long-lived dimension) is filtered out before the
shuffle and unioned back untouched, so the shuffled volume is
|current| + |updates|, not the full history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply ``updates`` (key, attrs, ts) to an SCD2 ``dim`` history.

    Contract:
    - ``dim`` rows with ``valid_to`` NOT NULL are closed history —
      passed through byte-identical.
    - Each key's CURRENT row (valid_to NULL) enters the timeline at its
      ``valid_from``; updates enter at ``ts``. Updates older than the
      current row's ``valid_from`` are DROPPED (late updates cannot
      rewrite closed history — re-derive from scratch if you need
      that). Updates for keys absent from ``dim`` create that key's
      first version (valid_from = ts).
    - Change detection: a timeline entry whose attributes equal the
      previous surviving entry's collapses into it (no zero-diff
      versions). Ties on ts break deterministically: the current dim
      row sorts before updates at equal ts, updates tie-break on a
      value hash.
    - Output: the full new history; exactly one NULL ``valid_to`` per
      key.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    base_cols = keys + attrs + [valid_from, valid_to]
    closed = dim.filter(F.col(valid_to).isNotNull()).select(*base_cols)
    current = dim.filter(F.col(valid_to).isNull())

    cur_tl = current.select(
        *keys,
        *attrs,
        F.col(valid_from).alias("_ts"),
        F.lit(0).alias("_src"),
        F.lit(0).cast("long").alias("_tb"),
    )
    upd_tl = updates.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_src"),
        F.xxhash64(*[F.col(c) for c in attrs]).alias("_tb"),
    )
    # late updates can't predate the key's RECORDED HISTORY END — the
    # current row's valid_from when one exists, else the max valid_to
    # of the closed rows (guarding only against `current` would let an
    # update for a closed-only key open a version OVERLAPPING closed
    # history). In a consistent SCD2 table current.valid_from equals
    # the last closed valid_to, so one max over coalesce covers both.
    hist_end = dim.groupBy(*keys).agg(
        F.max(F.coalesce(F.col(valid_to), F.col(valid_from))).alias("_hist_end")
    )
    upd_tl = (
        upd_tl.join(hist_end, keys, "left")
        .filter(F.col("_hist_end").isNull() | (F.col("_ts") >= F.col("_hist_end")))
        .drop("_hist_end")
    )
    timeline = cur_tl.unionByName(upd_tl)

    w = Window.partitionBy(*keys).orderBy(
        F.col("_ts").asc(), F.col("_src").asc(), F.col("_tb").asc()
    )
    attr_struct = F.struct(*[F.col(c) for c in attrs])
    marked = timeline.withColumn("_prev_attrs", F.lag(attr_struct).over(w)).withColumn(
        "_changed",
        F.col("_prev_attrs").isNull() | ~attr_struct.eqNullSafe(F.col("_prev_attrs")),
    )
    surviving = marked.filter(F.col("_changed"))
    w2 = Window.partitionBy(*keys).orderBy(
        F.col("_ts").asc(), F.col("_src").asc(), F.col("_tb").asc()
    )
    versions = surviving.withColumn("_next_ts", F.lead("_ts").over(w2)).select(
        *keys,
        *attrs,
        F.col("_ts").alias(valid_from),
        F.col("_next_ts").alias(valid_to),
    )
    return closed.unionByName(versions)
