"""Graph analytics over similarity graphs (near-dup pairs as edges).

Connected components live in ``dedup.dup_clusters``; this module holds
the structural-health measurements a curator reads before trusting a
dedup pass: triangle count and global clustering coefficient
(near-clique dup families are triangle-dense; a low coefficient with
many edges means chains — over-merged thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_stats", "pagerank_integer"]


def triangle_stats(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Exact triangle count + global clustering coefficient for an
    undirected simple graph given as unique (small-id, large-id) edge
    pairs. One summary row: (n_edges, n_triangles,
    clustering_coefficient = 3·triangles / open-wedges, n_wedges).

    DEGREE-ordered orientation (Suri–Vassilvitskii, WWW'11): every edge
    points low-(degree, id) → high-(degree, id), capping out-degree at
    O(√m), so the wedge self-join is hub-proof — an id-ordered
    orientation squares a hub's degree instead. Every triangle has
    exactly one vertex with two out-edges under any acyclic
    orientation, so each is counted exactly once.
    """
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    deg = (
        e.select(F.col("u").alias("x")).unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("x").alias("u"), F.col("d").alias("_du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("_dv")), "v")
    )
    u_first = F.struct("_du", "u") < F.struct("_dv", "v")
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("_ddst"),
    )
    o1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("_ddst").alias("_db"))
    o2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.col("_ddst").alias("_dc"))
    wedges = o1.join(o2, "a").filter(F.struct("_db", "b") < F.struct("_dc", "c"))
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    triangles = wedges.join(closing, ["b", "c"])
    wedge_total = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    stats = (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .crossJoin(triangles.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
        .crossJoin(wedge_total)
    )
    return stats.select(
        "n_edges",
        "n_triangles",
        F.round(
            F.when(F.col("n_wedges") > 0,
                   3.0 * F.col("n_triangles") / F.col("n_wedges")).otherwise(0.0), 6
        ).alias("clustering_coefficient"),
        "n_wedges",
    )


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iterations: int = 3,
    damping_pct: int = 85,
    mass: int = 1_000_000_000,
    checkpoint: bool = True,
) -> DataFrame:
    """Engine-exact PageRank over an undirected simple graph (unique
    (small-id, large-id) edge pairs), e.g. ranking the most central
    documents of a near-dup graph so cluster resolution can keep the
    canonical copy instead of an arbitrary min-id.

    INTEGER-SCALED: ranks live in micro-units of ``mass`` (BIGINT) and
    every step is integer arithmetic — contribution = ``rank div
    degree``, damping = ``damping_pct·Σcontrib div 100`` — so the
    per-node sums are order-independent (integer addition is
    associative; float PageRank is not reproducible across engines or
    even across shuffle layouts). A fixed iteration count keeps the
    plan static; the DuckDB oracle replays the identical unrolled
    recurrence and must hash-match to the last micro-unit.

    Scale: the canonical distributed PageRank loop — each iteration is
    one equi-join of the rank table onto the (pre-degreed) edge list
    plus one groupBy-sum of BIGINT contributions (map-side partial
    agg). Nothing driver-side, no floats, no cartesian; hub skew is
    bounded because contributions aggregate per *destination*, and AQE
    splits skewed reducers. Rank mass leaks by < 1 micro-unit per node
    per iteration to floor division — by design (exactness over mass
    conservation).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from pyspark import StorageLevel

    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    # Persist the per-iteration constants and CUT each iteration's
    # lineage (lazy localCheckpoint): without this the rank plan
    # re-embeds the whole edge-derivation subtree every round and the
    # static plan grows ~4x per iteration (measured: 235 exchanges for
    # 3 iterations over a Jaccard-derived edge list) — the same
    # re-optimization blow-up dup_clusters documents. Checkpointed
    # iterations keep the plan linear in `iterations`; on a real
    # cluster prefer reliable checkpoint() for fault tolerance.
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if checkpoint:
        sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    n1 = deg.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    base = F.expr(f"{mass}L div _n")  # per-node teleport mass, integer
    nodes = deg.crossJoin(F.broadcast(n1))
    if checkpoint:
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    ranks = nodes.select("u", base.alias("r"))
    teleport = F.expr(f"({100 - damping_pct} * ({mass}L div _n)) div 100")
    for _ in range(iterations):
        # Join the two |V|-sized tables FIRST (optimization round 14,
        # guide §3): contribution = r div d depends only on the source
        # node, so computing it on nodes⋈ranks and joining the |E|-row
        # sym ONCE replaces the former sym⋈nodes⋈ranks chain — one
        # edge-sized join per iteration instead of two, identical rows
        # (both joins were inner on the same key).
        per_src = (
            nodes.select("u", "d")
            .join(ranks, "u")
            .select("u", F.expr("r div d").alias("c"))
        )
        contrib = sym.join(per_src, "u").select(F.col("v").alias("u"), "c")
        agg = contrib.groupBy("u").agg(F.sum("c").alias("_s"))
        ranks = (
            nodes.join(agg, "u", "left")
            .select(
                "u",
                (
                    teleport
                    + F.expr(f"({damping_pct} * coalesce(_s, 0L)) div 100")
                ).cast("long").alias("r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    # Materialize the converged ranks ONCE, then release the
    # per-iteration caches: without this every invocation in a
    # long-lived session (bench loop, notebook) leaks two cached RDDs
    # (the r4 advisor flagged the accumulating CacheManager warnings).
    # The eager checkpoint makes the returned frame self-contained, so
    # later actions never re-reach the unpersisted inputs.
    out = ranks.select(F.col("u").alias("node"), F.col("r").alias("rank_micro"))
    if not checkpoint:
        # checkpoint=False exists for the PLAN AUDITOR
        # (tools/audit_plans.py): localCheckpoint truncates the
        # explainable plan to a LogicalRDD scan, hiding the
        # per-iteration join+agg shape PLANS.md exists to document.
        # Never run a multi-iteration uncheckpointed plan at scale —
        # the static plan re-embeds the edge derivation every round
        # (measured 235 exchanges for 3 iterations).
        return out
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    nodes.unpersist()
    return out


def kcore_peel(
    edges: DataFrame,
    k_df: DataFrame,
    rounds: int = 8,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """k-core peeling over an undirected simple graph (unique
    (small-id, large-id) edge pairs): repeatedly remove nodes of
    degree < k until the k-core remains (Seidman 1983) — the density
    screen a graph curator runs before community detection or before
    trusting co-occurrence edges (a node outside the 2-core is a
    bridge/leaf; a high-k core is a tightly knit cluster).

    ``k_df`` is a one-row frame with a BIGINT column ``k`` — passed as
    a frame (broadcast-joined, never collected) so callers can DERIVE
    k from the data (e.g. average degree + 1) and the oracle can
    recompute the identical k.

    FIXED-ROUND form: exactly ``rounds`` peel passes, each one
    (edges ⋉ alive ⋉ alive) semi-restriction + one degree groupBy,
    with per-round lazy localCheckpoints cutting lineage (the
    pagerank_integer lesson: an uncut loop re-embeds the edge
    derivation every round). A fixed round count keeps the plan static
    and the DuckDB oracle an unrolled replay; the emitted ``converged``
    flag (1 iff the last round removed nothing) certifies fixpoint at
    the tested scale instead of raising mid-plan — peeling cascades in
    O(log n)-ish rounds on non-adversarial graphs, and a false flag is
    a visible red row, not a silent truncation.

    Output: one row per surviving node with its degree INSIDE the
    final core, plus the constant ``k`` and ``converged`` columns.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from pyspark import StorageLevel

    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    # DELTA PEELING (optimization round 13; guide §2.3 "shuffle fewer
    # bytes" / §2.4 "share one exchange"): the original loop recomputed
    # every round's degrees from scratch as (sym ⋉ alive ⋉ alive) —
    # two shuffles of the FULL edge table plus a full-width groupBy per
    # round, 8×. But degrees only change by the edges incident to the
    # nodes REMOVED in the previous round: deg_{i+1}(u) = deg_i(u) −
    # |{v ∈ removed_i : (u,v) ∈ sym}| for surviving u (alive sets are
    # monotone decreasing). Each round now joins sym against the
    # (small, usually shrinking) removed set instead of the (large)
    # alive set, and updates the carried degree table with the delta.
    # sym is hash-partitioned by v ONCE and persisted, so every
    # round's delta join shuffles only the removed side (the cached
    # partitioning satisfies the join's distribution requirement) —
    # per-round big-table work drops from 2 shuffles + 1 groupBy to a
    # map-side probe. Output is IDENTICAL: the carried degree table
    # restricted to the final alive set IS the within-core degree, and
    # nodes with zero surviving edges are filtered exactly as the
    # groupBy form dropped them (oracle hash-match re-verified).
    sym = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(F.col("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Materialize k ONCE: k_df usually derives from the same edge
    # lineage (e.g. average degree), and without the eager cut every
    # round's filter would re-run that derivation — measured 66 s →
    # ~8 s at sf0.01 for the co-purchase query, whose edge list is a
    # fact-table self-join.
    kb = F.broadcast(
        k_df.select(F.col("k").cast("long").alias("k")).localCheckpoint(eager=True)
    )
    # D_0: full degrees (alive_0 is every node of sym, so the original
    # first round's alive-restriction was a no-op by construction).
    deg = (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    removed = None
    for _ in range(rounds):
        dk = deg.crossJoin(kb)
        removed = dk.filter(F.col("d") < F.col("k")).select("u")
        survivors = dk.filter(F.col("d") >= F.col("k")).select("u", "d")
        # Edges lost by survivors = edges whose OTHER endpoint was just
        # removed (sym holds both directions, so matching on v covers
        # every incident edge). shuffle_hash: the removed side is the
        # bounded one; never sort the persisted edge table.
        delta = (
            sym.join(removed.hint("shuffle_hash").select(F.col("u").alias("v")), "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).cast("long").alias("_dd"))
        )
        deg = (
            survivors.join(delta, "u", "left")
            .select(
                "u",
                (F.col("d") - F.coalesce(F.col("_dd"), F.lit(0))).cast("long").alias("d"),
            )
            .localCheckpoint(eager=False)
        )
    # converged ⇔ the last round removed nothing.
    flag = removed.agg(
        (F.count(F.lit(1)) == 0).cast("long").alias("converged")
    )
    out = (
        deg.filter(F.col("d") > 0)
        .crossJoin(kb)
        .crossJoin(F.broadcast(flag))
        .select(
            F.col("u").alias("node"),
            F.col("d").alias("core_degree"),
            "k",
            "converged",
        )
        .localCheckpoint(eager=True)
    )
    sym.unpersist()
    return out
