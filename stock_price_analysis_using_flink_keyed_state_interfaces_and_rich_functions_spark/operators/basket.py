"""Market-basket association mining (frequent itemsets, level 2):
co-occurring item pairs within a transaction, scored by support and
lift — the classic "parts ordered together" analysis a retail or
feature-co-occurrence pipeline runs over order lines.

Definitions (per the standard association-rule formulation):

- a *basket* is one transaction (an order); an item *occurs* in a
  basket at most once (line-level duplicates collapse first),
- ``support(a,b) = |baskets containing both| / N``,
- ``lift(a,b) = N * c_ab / (c_a * c_b)`` — how much more often the
  pair co-occurs than independence predicts (>1 ⇒ affinity).

Scale posture: the pair generation is a SELF-JOIN ON THE BASKET KEY,
never a cross product — multiplicity per basket is C(k,2) where k is
the basket size (bounded: 7 lines max per TPC-H order), so the join
output is linear in baskets with a small constant. The pair-count and
item-count tables are *itemset-vocabulary*-sized aggregates (map-side
partial aggregation applies); the two enrichment joins key on the item
and AQE broadcasts whichever side is small. Nothing in the pipeline
materializes per-pair state for pairs that never co-occur (the
C(|items|, 2) matrix is never built).

Numeric determinism (the PMI/BM25 precedent): all inputs are exact
BIGINT counts; lift is ONE double expression evaluated in the same
operand order in both engines — (c_ab·N)/(c_a·c_b) with every factor
cast to double before multiplying — then snapped to micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pair_lift"]


def pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Score every item pair co-occurring in ≥ ``min_support`` baskets.

    Output columns: ``item_a``, ``item_b`` (``item_a < item_b``),
    ``c_ab`` (co-occurrence baskets), ``c_a``/``c_b`` (per-item basket
    counts), ``support_micro`` (c_ab/N in micro-units) and
    ``lift_micro`` (micro-units). Unordered — callers rank/limit.
    """
    # Lazy lineage cut: the distinct (basket, item) table feeds FOUR
    # consumers (basket count, item counts, both self-join sides) —
    # uncut, each one re-runs the fact scan + distinct shuffle.
    items = (
        df.select(
            F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_baskets = items.select("_basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    item_counts = items.groupBy("_item").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    a = items.select(F.col("_basket"), F.col("_item").alias("item_a"))
    b = items.select(F.col("_basket"), F.col("_item").alias("item_b"))
    pairs = (
        a.join(b, "_basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= min_support)
    )
    return (
        pairs.join(
            item_counts.select(
                F.col("_item").alias("item_a"), F.col("_c").alias("c_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("_item").alias("item_b"), F.col("_c").alias("c_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.col("c_ab").cast("double") / F.col("_n").cast("double") * 1e6
            )
            .cast("long")
            .alias("support_micro"),
            F.round(
                (F.col("c_ab").cast("double") * F.col("_n").cast("double"))
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
                * 1e6
            )
            .cast("long")
            .alias("lift_micro"),
        )
    )
