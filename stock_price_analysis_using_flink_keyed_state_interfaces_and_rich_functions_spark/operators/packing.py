"""Sequence packing for LLM pretraining pipelines (brief-mandated
LLM-data op family, SURVEY.md §2.6): turn variable-length documents
into fixed-token-budget training sequences.

Two standard schemes:

- **Concat-and-chunk** (:func:`pack_concat_chunks`) — the GPT-style
  pipeline: concatenate the token stream in a deterministic order and
  cut every ``seq_len`` tokens; documents may SPAN chunk boundaries.
  Pure Catalyst: a windowed exclusive cumulative sum gives each doc its
  stream offset, and a ``sequence``+``explode`` emits one row per
  (doc, chunk) overlap. Fully oracle-checkable.
- **Greedy next-fit** (:func:`pack_greedy_nextfit`) — whole documents
  only: walk docs in order, close the current pack when the next doc
  does not fit. One ``applyInPandas`` pass per shard (sequential state
  is inherent to next-fit; the Python loop is the sanctioned slow path
  and touches only (id, n_tokens) pairs, never text).

Scale posture: a GLOBAL packing order is a single sequential stream —
the hot-key problem again — so both operators shard first (default
``doc_id % num_shards``; any deterministic expression works, e.g. an
md5 bucket) and pack independently within each shard. Parallelism =
shards; each shard's cumsum/fold touches only its own (id, count)
pairs. Training-data packing does not need one global stream — it
needs reproducible, budget-respecting groups — so sharding is free
correctness-wise.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_concat_chunks", "pack_greedy_nextfit"]


def _sharded(df: DataFrame, id_col: str, num_shards: int, shard_expr: Column | None):
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    shard = shard_expr if shard_expr is not None else F.pmod(F.col(id_col), F.lit(num_shards))
    return df.withColumn("shard", shard.cast("int"))


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    num_shards: int = 8,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: within each shard, documents are laid
    end-to-end in ``id_col`` order and the stream is cut every
    ``seq_len`` tokens. Returns one row per (document, chunk) overlap:
    ``(shard, chunk_id, id, n_tok)`` where ``n_tok`` is how many of the
    doc's tokens land in that chunk (a doc longer than a chunk spans
    several rows; docs with 0 tokens are dropped — they occupy no
    stream positions).

    Plan: one window cumsum per shard (exclusive prefix of token
    counts) + a ``sequence``/``explode`` over each doc's chunk span —
    no joins, no driver state. The emitted rows are 4 small ints; the
    text itself never moves.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    t = F.col(tokens_col).cast("long")
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = (
        _sharded(df, id_col, num_shards, shard_expr)
        .filter(t > 0)
        .withColumn("_start", F.coalesce(F.sum(t).over(w), F.lit(0)))
        .withColumn("_end", F.col("_start") + t)
    )
    first_chunk = F.floor(F.col("_start") / seq_len)
    last_chunk = F.floor((F.col("_end") - 1) / seq_len)
    exploded = staged.withColumn(
        "chunk_id", F.explode(F.sequence(first_chunk, last_chunk))
    )
    chunk_lo = F.col("chunk_id") * seq_len
    chunk_hi = chunk_lo + seq_len
    n_tok = F.least(F.col("_end"), chunk_hi) - F.greatest(F.col("_start"), chunk_lo)
    return exploded.select(
        "shard", "chunk_id", F.col(id_col), n_tok.cast("long").alias("n_tok")
    )


def pack_greedy_nextfit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_shards: int = 8,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Greedy next-fit packing of WHOLE documents: within each shard,
    walk docs in ``id_col`` order keeping a running fill; a doc that
    does not fit closes the pack and opens the next. Returns
    ``(shard, pack_id, id, n_tokens, oversize)`` — ``oversize`` marks
    docs longer than the budget, which get a pack of their own (flag
    them for truncation/splitting upstream; silently dropping data is
    not this operator's call).

    Next-fit is sequential by definition, so each shard folds in one
    ``applyInPandas`` group — the loop touches only (id, n_tokens)
    pairs. Properties (every doc packed exactly once; no pack over
    budget except single-oversize-doc packs; determinism) are pinned in
    pytest, and the demo query is additionally hash-checked against a
    DuckDB recursive-CTE implementation of the same fold.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    staged = _sharded(df, id_col, num_shards, shard_expr).select(
        "shard", F.col(id_col).alias("_id"), F.col(tokens_col).cast("long").alias("_n")
    )
    out_schema = (
        f"shard int, pack_id long, `{id_col}` long, n_tokens long, oversize boolean"
    )

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        packs, fill, pack_id = [], 0, 0
        first = True
        for n in pdf["_n"]:
            n = int(n)
            if not first and fill + n > budget:
                pack_id += 1
                fill = 0
            packs.append(pack_id)
            fill += n
            first = False
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "pack_id": packs,
                id_col: pdf["_id"].to_numpy(),
                "n_tokens": pdf["_n"].to_numpy(),
                "oversize": (pdf["_n"] > budget).to_numpy(),
            }
        )

    return staged.groupBy("shard").applyInPandas(_fold, schema=out_schema)
