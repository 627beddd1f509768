"""Similarity search over embedding columns (``array<float>``) —
brief-mandated LLM-data operator family (SURVEY.md §2.6).

Three tiers:

- **Brute-force cosine top-k** — exact; the query side broadcasts
  (BroadcastNestedLoopJoin), so the big side streams once with no
  shuffle. This is the oracle-checkable baseline and is also the right
  plan whenever |queries| is small — even at 100 TB of vectors.
- **Random-hyperplane LSH** — the scale path for vector×vector
  workloads (near-dup by cosine, all-pairs-ish search): bucket by sign
  signature, equi-join buckets, rank within bucket. Candidate
  generation never builds a cartesian product.
- **IVF (inverted-file)** — the scale path for query-time ANN: a
  driver-trained coarse quantizer assigns every vector to a cell
  map-side; queries probe their ``nprobe`` nearest cells through a
  plain equi-join. ``nprobe == num_cells`` degenerates to exact.

Cosine scoring has two implementations: an Arrow-vectorized numpy
pandas UDF (default — Spark evaluates higher-order array lambdas
interpreted, and the batched numpy matmul measured ~10× faster) and a
pure Catalyst ``zip_with``+``aggregate`` expression (``impl="expr"``,
dependency-free and bit-deterministic in array order). Both agree with
the DuckDB oracle at 4-dp rounding across the test corpus.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

__all__ = [
    "self_knn_topk",
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "brute_force_topk",
    "hard_negative_topk",
    "mips_topk",
    "cosine_dup_pairs",
    "hyperplane_signature_udf",
    "lsh_bucketed_topk",
    "ivf_topk",
    "embedding_centroids",
    "quantize_embeddings",
    "portable_plane_signs",
    "portable_simhash_chunks",
    "portable_simhash_chunks_udf",
    "portable_simhash_dup_pairs",
]


def _make_batch_matrix():
    """Build the vector-batch stacker as a CLOSURE-shippable function.

    The stacker turns an Arrow batch of vectors into (matrix, validity
    mask): NULL vectors become all-zero rows with mask=False instead of
    the TypeError ``np.asarray(None)`` raises — so every numpy UDF in
    this module degrades to NULL output on NULL input, matching the
    ``impl="expr"`` Catalyst forms row-for-row. Raises a clear error on
    a dimension mismatch (expect_dim or first valid row wins).

    Each UDF factory calls this and closes over the RESULT: a function
    object cloudpickle serializes BY VALUE. Referencing a module-level
    helper directly from a UDF would pickle a by-reference stub that
    executors without this package on PYTHONPATH (the driver's vanilla
    harness) cannot import."""

    def _batch_matrix(series, expect_dim=None):
        import numpy as np

        arrs, mask, dim = [], [], expect_dim
        for x in series:
            if x is None:
                arrs.append(None)
                mask.append(False)
                continue
            a = np.asarray(x, dtype=np.float64)
            if dim is None:
                dim = a.shape[0]
            elif a.shape[0] != dim:
                raise ValueError(f"embedding dim mismatch: expected {dim}, got {a.shape[0]}")
            arrs.append(a)
            mask.append(True)
        mat = np.zeros((len(arrs), dim or 0), dtype=np.float64)
        for i, a in enumerate(arrs):
            if a is not None:
                mat[i] = a
        return mat, np.asarray(mask, dtype=bool)

    return _batch_matrix


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with a double accumulator (element order = array order,
    so the result is bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom)


def mips_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_dp: int = 4,
) -> DataFrame:
    """Exact maximum-inner-product search (MIPS): top-k neighbors by
    raw dot product — what a trained retrieval head actually scores
    with when embeddings are NOT unit-normalized (cosine top-k and
    MIPS top-k genuinely differ then; norm matters). Same scale shape
    as :func:`brute_force_topk`: broadcast the small query side, scan
    the corpus once, per-query top-k over a tiny keyed window. The
    dot product uses the sequential ``aggregate`` fold (same
    element-order summation as the SQL oracle), rounded before
    ranking with a neighbor-id tiebreak — deterministic,
    oracle-comparable."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", F.round(dot_expr(F.col("_qv"), F.col("_nv")), round_dp))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dot", "rk")
    )


def cosine_pairs_udf():
    """Arrow-vectorized cosine over (vector, vector) pairs — one numpy
    batch per Arrow chunk. NULL (not NaN) when either norm is zero, so
    ordering/filter semantics match :func:`cosine_expr` exactly (NaN
    would sort ABOVE every real cosine in a descending top-k). Assumes
    equal-length vectors within a batch (the embedding tables are
    fixed-dim)."""
    import numpy as np

    _bm = _make_batch_matrix()

    @F.pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A, ma = _bm(a)
        B, mb = _bm(b)
        # an all-NULL side stacks to dim 0 — pad it to the other side's
        # dim (its rows are masked out below either way)
        if A.shape[1] != B.shape[1]:
            if A.shape[1] == 0:
                A = np.zeros((len(a), B.shape[1]))
            elif B.shape[1] == 0:
                B = np.zeros((len(b), A.shape[1]))
            else:
                raise ValueError(
                    f"embedding dim mismatch: {A.shape[1]} vs {B.shape[1]}"
                )
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        mask = ma & mb & (den > 0)
        out = np.divide(num, den, out=np.zeros_like(num), where=mask)
        s = pd.Series(out).astype("Float64")
        s[~mask] = pd.NA
        return s

    return _cos


def _cosine(a: Column, b: Column, impl: str) -> Column:
    if impl == "pandas":
        return cosine_pairs_udf()(a, b)
    if impl == "expr":
        return cosine_expr(a, b)
    raise ValueError(f"impl must be 'pandas' or 'expr', got {impl!r}")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_dp: int = 4,
    impl: str = "pandas",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` (small) is broadcast; each vectors-partition scans once
    — no shuffle of the big side until the final per-query top-k window
    (keyed on query_id, tiny). Self-matches (same id) are excluded.
    Ties break on neighbor id after rounding, making ranks
    deterministic and oracle-comparable.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_nv"), impl), round_dp))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
    exact: bool = False,
    impl: str = "pandas",
    num_tables: int = 1,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    ``exact=True`` runs the all-pairs check (oracle path, small data
    only). Default routes candidates through hyperplane-LSH bucket
    joins — only pairs with an identical sign signature in SOME table
    are cosine-checked, never a quadratic product. This is the standard
    AND-OR construction: each table ANDs ``num_planes`` sign bits
    (collision prob (1-θ/π)^planes), and ``num_tables`` independent
    tables OR together (recall 1-(1-p)^tables). One table with many
    planes suits very high thresholds; moderate thresholds need fewer
    planes and more tables to keep recall.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        cand = None
        for t in range(num_tables):
            sig = hyperplane_signature_udf(num_planes=num_planes, seed=seed + 1000 * t)
            # checkpoint the per-table signature frame: both self-join
            # sides read the computed table instead of each re-running
            # the signature UDF over the full corpus (2× fewer UDF scans
            # per table; same shape as dedup.py's postings materialization)
            sigt = vectors.select(F.col(id_col).alias("_id"), sig(F.col(vec_col)).alias("_bucket")).localCheckpoint(
                eager=False
            )
            sa = sigt.select(F.col("_id").alias("id_a"), "_bucket")
            sb = sigt.select(F.col("_id").alias("id_b"), "_bucket")
            one = sa.join(sb, "_bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
            cand = one if cand is None else cand.unionByName(one)
        cand = cand.distinct()
        pairs = cand.join(a, "id_a").join(b, "id_b")
    return (
        pairs.withColumn("cosine", F.round(_cosine(F.col("_va"), F.col("_vb"), impl), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_signature_udf(num_planes: int = 16, seed: int = 42, dim: int | None = None):
    """Seeded random-hyperplane signature as an Arrow-vectorized pandas
    UDF: sign bits of V·P packed into an int64 bucket id. The plane
    matrix is derived from ``numpy.random.RandomState(seed)`` at worker
    import time — deterministic across executors and runs. Pass ``dim``
    to fail fast (clear ValueError) on vectors of the wrong dimension;
    NULL vectors yield a NULL bucket and drop out of bucket joins."""
    import numpy as np

    if not 1 <= num_planes <= 62:
        raise ValueError("num_planes must be in [1, 62]")

    _bm = _make_batch_matrix()

    @F.pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        mat, mask = _bm(vecs, expect_dim=dim)
        if mat.size == 0:
            return pd.Series([None] * len(vecs), dtype="Int64")
        planes = np.random.RandomState(seed).standard_normal((mat.shape[1], num_planes))
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(num_planes, dtype=np.int64))
        s = pd.Series(bits @ weights).astype("Int64")
        s[~mask] = pd.NA  # NULL vector → NULL bucket → drops out of the equi-join
        return s

    return _sig


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
    impl: str = "pandas",
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict each query's candidates to vectors
    sharing a hyperplane bucket in SOME table, then exact-rank the
    candidates. Recall < 1 by construction (tested against
    :func:`brute_force_topk`); cost is Σ|bucket| per query instead of
    |vectors|.

    ``num_tables`` is the standard OR-construction: each table ANDs
    ``num_planes`` sign bits (per-neighbor collision prob
    (1-θ/π)^planes) and tables OR together (recall 1-(1-p)^tables).
    One table keeps the plan a single bucket equi-join; multiple tables
    union ids-only candidate sets (distinct on (query, neighbor) — the
    vectors never ride through the union) and join vectors back for
    scoring. Tune planes DOWN / tables UP for recall, the reverse for
    cost; e.g. on near-uniform embeddings (θ≈65°) 8 planes × 1 table
    gives ~2% recall@5 while 4 planes × 16 tables gives ~90%.
    """
    from pyspark.sql import Window

    v_vec = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    if num_tables == 1:
        sig = hyperplane_signature_udf(num_planes=num_planes, seed=seed)
        v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"), sig(F.col(vec_col)).alias("_bucket"))
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), sig(F.col(vec_col)).alias("_bucket"))
        scored = (
            v.join(F.broadcast(q), "_bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_nv"), impl), 4))
        )
    else:
        cand = None
        for t in range(num_tables):
            sig = hyperplane_signature_udf(num_planes=num_planes, seed=seed + 1000 * t)
            vt = vectors.select(F.col(id_col).alias("neighbor_id"), sig(F.col(vec_col)).alias("_bucket"))
            qt = queries.select(F.col(id_col).alias("query_id"), sig(F.col(vec_col)).alias("_bucket"))
            one = (
                vt.join(F.broadcast(qt), "_bucket")
                .filter(F.col("neighbor_id") != F.col("query_id"))
                .select("query_id", "neighbor_id")
            )
            cand = one if cand is None else cand.unionByName(one)
        scored = (
            cand.distinct()
            .join(v_vec, "neighbor_id")
            .join(F.broadcast(q_vec), "query_id")
            .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_nv"), impl), 4))
        )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def embedding_centroids(
    vectors: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    round_dp: int | None = 4,
) -> DataFrame:
    """Per-group element-wise mean of embedding vectors, flattened to
    (group, pos, centroid) rows — corpus analysis and the training step
    of the IVF coarse quantizer.

    posexplode → groupBy(group, pos) avg: one shuffle of (group, pos,
    float) triples with map-side partial aggregation, so the full
    vectors never shuffle and no group must fit in one task. Flattened
    output (instead of re-assembled arrays) keeps the result a plain
    scalar table — exactly aggregable, oracle-comparable, and directly
    joinable as a quantizer codebook.
    """
    mean = F.avg(F.col("_v").cast("double"))
    if round_dp is not None:
        # + 0.0 canonicalizes IEEE -0.0 (a tiny negative mean rounds to
        # -0.0, which hash-compares unequal to 0.0 across engines)
        mean = F.round(mean, round_dp) + F.lit(0.0)
    return (
        vectors.select(F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "_v"))
        .groupBy(group_col, "pos")
        .agg(mean.alias("centroid"))
    )


def quantize_embeddings(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """Symmetric per-vector int8-style quantization — the standard
    storage/bandwidth trade for embedding tables at corpus scale
    (4 bytes/dim float32 → 1 byte/dim + one scale per vector).

    Per vector: ``scale = max(|x|) / levels``; each component becomes
    ``round(x / scale)`` ∈ [-levels, levels]. Output keeps the array
    form: ``(id, scale, qvec array<int>)``. Pure Catalyst higher-order
    expressions — map-side only, no shuffle, no Python. All-zero (and
    NULL) vectors get scale 0 and an all-zero (resp. NULL) qvec rather
    than a divide-by-zero NaN.

    Dequantization error is bounded by scale/2 per component; recall
    impact is validated in pytest by re-ranking a top-k over the
    dequantized vectors.
    """
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = (absmax / levels).alias("scale")
    qvec = F.when(
        absmax > 0,
        F.transform(v, lambda x: F.round(x.cast("double") / (absmax / levels)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return vectors.select(F.col(id_col), scale, qvec.alias("qvec"))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    impl: str = "pandas",
    lloyd_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Index build: ``num_cells`` centroid vectors are drawn as a seeded
    uniform sample (order by ``xxhash64(seed, id)``, take first — a
    one-pass TakeOrdered, no full sort) and collected to the driver.
    Centroids living driver-side is inherent to IVF — at scale you
    train them offline on a sample exactly like this, then broadcast.
    ``lloyd_iters`` adds distributed k-means refinement rounds (spherical
    Lloyd: assign map-side, re-average via the centroid aggregation,
    collect only the cells×dim codebook) — tighter cells mean better
    recall at the same ``nprobe``.

    Search: every vector is assigned map-side to its nearest centroid
    by cosine (Arrow-vectorized argmax — one scan, no shuffle of the
    vectors); each query probes its ``nprobe`` nearest cells. The
    candidate join is a plain equi-join on cell id, so the plan never
    goes quadratic; cost per query is ~``nprobe/num_cells`` of the
    corpus. ``nprobe == num_cells`` degenerates to exact search (every
    cell probed), which is what the equivalence test pins against
    :func:`brute_force_topk`.

    Output schema matches the other top-k operators:
    (query_id, neighbor_id, cosine, rk).
    """
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType

    if not 1 <= nprobe <= num_cells:
        raise ValueError(f"nprobe must be in [1, num_cells={num_cells}], got {nprobe}")

    sample = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.lit(str(seed)), F.col(id_col)))
        .limit(num_cells)
        .collect()
    )
    if not sample:
        raise ValueError("ivf_topk: vectors DataFrame is empty")
    cents = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in sample])

    def _unit(rows: "np.ndarray") -> "np.ndarray":
        norms = np.linalg.norm(rows, axis=1)
        norms[norms == 0] = 1.0
        return rows / norms[:, None]  # unit rows: dot == cosine ranking

    cents = _unit(cents)
    _bm = _make_batch_matrix()

    def _make_cell(carr: "np.ndarray"):
        @F.pandas_udf(LongType())
        def _assign(vecs: pd.Series) -> pd.Series:
            mat, mask = _bm(vecs)
            if mat.size == 0:
                return pd.Series([None] * len(vecs), dtype="Int64")
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            s = pd.Series(((mat / vn[:, None]) @ carr.T).argmax(axis=1)).astype("Int64")
            s[~mask] = pd.NA
            return s

        return _assign

    # Optional distributed Lloyd refinement: each round is one map-side
    # cell assignment + the embedding_centroids aggregation (scalar
    # triples, partial agg) + a cells×dim collect — the full corpus
    # never leaves the executors. Empty cells keep their old centroid.
    for _ in range(lloyd_iters):
        assign = vectors.select(
            F.col(vec_col).alias("_v"), _make_cell(cents)(F.col(vec_col)).alias("_cell")
        ).filter(F.col("_cell").isNotNull())  # NULL vectors can't vote for a centroid
        by_cell: dict[int, dict[int, float]] = {}
        for r in embedding_centroids(assign, "_cell", "_v", round_dp=None).collect():
            by_cell.setdefault(r["_cell"], {})[r["pos"]] = r["centroid"]
        new = cents.copy()
        for c, d in by_cell.items():
            new[c] = np.asarray([d[p] for p in range(cents.shape[1])], dtype=np.float64)
        cents = _unit(new)

    def _scores(vecs: pd.Series):
        mat, mask = _bm(vecs)
        if mat.size == 0:
            return np.empty((0, cents.shape[0])), mask
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        return (mat / vn[:, None]) @ cents.T, mask

    @F.pandas_udf(LongType())
    def _cell(vecs: pd.Series) -> pd.Series:
        s, mask = _scores(vecs)
        if not s.size:
            return pd.Series([None] * len(vecs), dtype="Int64")
        out = pd.Series(s.argmax(axis=1)).astype("Int64")
        out[~mask] = pd.NA
        return out

    @F.pandas_udf(ArrayType(LongType()))
    def _probe_cells(vecs: pd.Series) -> pd.Series:
        s, mask = _scores(vecs)
        if not s.size:
            return pd.Series([None] * len(vecs), dtype="object")
        order = np.argsort(-s, axis=1)[:, :nprobe]
        return pd.Series([row if ok else None for row, ok in zip(order.astype(np.int64), mask)])

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"), _cell(F.col(vec_col)).alias("_cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_probe_cells(F.col(vec_col))).alias("_cell"),
    )
    scored = (
        v.join(F.broadcast(q), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_nv"), impl), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def train_ivf_centroids(
    vectors: DataFrame,
    num_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[list[float]]":
    """Train (sample) an IVF codebook EXACTLY as :func:`ivf_topk`'s
    index build does — seeded uniform sample via a one-pass
    TakeOrdered on ``xxhash64(seed, id)``, unit-normalized so dot
    ranks as cosine — but exposed as a standalone step so the
    codebook can be trained OFFLINE and handed to the incremental
    maintenance path (:func:`~..streaming.windows.
    ivf_index_maintain_stream`), the production IVF lifecycle:
    codebook frozen at train time, postings updated continuously.
    Returns plain nested lists (JSON/broadcast-friendly, no numpy
    types leak to callers)."""
    import numpy as np

    sample = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.lit(str(seed)), F.col(id_col)))
        .limit(num_cells)
        .collect()
    )
    if not sample:
        raise ValueError("train_ivf_centroids: vectors DataFrame is empty")
    cents = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    norms = np.linalg.norm(cents, axis=1)
    norms[norms == 0] = 1.0
    return (cents / norms[:, None]).tolist()


def ivf_assign_cells(
    df: DataFrame,
    centroids: "list[list[float]]",
    vec_col: str = "embedding",
    out_col: str = "cell",
    round_dp: "int | None" = None,
) -> DataFrame:
    """Map-side IVF cell assignment against a FROZEN codebook — the
    same Arrow-vectorized nearest-centroid argmax :func:`ivf_topk`
    runs inline (similarity.py:498-510), factored out so batch
    one-shot indexing and streaming incremental maintenance share one
    definition (their parity test is exact equality). Stateless per
    row, so it works unchanged on a STREAMING DataFrame: one scan, no
    shuffle, codebook rides the closure (cells×dim, broadcast-sized
    by construction). NULL/ragged vectors assign NULL cell.

    ``round_dp`` (ADVICE r12): round the cosine to a fixed number of
    decimals BEFORE the argmax — the cross-engine float pin for
    oracled consumers. This kernel computes (v/|v|)·(c/|c|) while a
    SQL oracle typically computes inner/(|v|·|c|); the two can differ
    in the last ulp, so a near-exact tie between two cells could
    assign different cells per engine. Rounding makes the argmax
    input identical on both sides (argmax tie-break is lowest cell
    index, matching ORDER BY cos DESC, cell ASC / rk=1). Default None
    preserves the exact kernel for unoracled/parity consumers."""
    import numpy as np

    carr = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(carr, axis=1)
    norms[norms == 0] = 1.0
    carr = carr / norms[:, None]
    _bm = _make_batch_matrix()

    @F.pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat, mask = _bm(vecs)
        if mat.size == 0:
            return pd.Series([None] * len(vecs), dtype="Int64")
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        sims = (mat / vn[:, None]) @ carr.T
        if round_dp is not None:
            sims = np.round(sims, round_dp)
        s = pd.Series(sims.argmax(axis=1)).astype("Int64")
        s[~mask] = pd.NA
        return s

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def hard_negative_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    round_dp: int = 4,
    impl: str = "pandas",
) -> DataFrame:
    """Hard-negative mining for contrastive training: each query's
    top-k most-similar vectors with a DIFFERENT label — the negatives
    that sit closest to the decision boundary and carry the most
    gradient. Same plan shape as :func:`brute_force_topk` (broadcast
    query side, one corpus scan, per-query top-k window); the label
    inequality rides the broadcast join as a residual, so adding the
    constraint costs nothing. At corpus scale the exact scan is the
    recall-1 baseline; route candidates through the IVF/LSH tiers and
    re-rank with this scoring when one pass is too expensive.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("_ql"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_nv"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = v.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("neighbor_label") != F.col("_ql")),
    ).withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_nv"), impl), round_dp))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rk")
    )


def portable_plane_signs(bits: int, dim: int, tag: str = "simverify") -> list[list[int]]:
    """±1 Rademacher projection planes derived from ``md5(tag:p:d)``
    parity — seed-free and engine-portable: any system that can run md5
    (or inline these literals, as the DuckDB oracle does) reproduces the
    identical plane matrix, making the SimHash signatures below exact
    cross-engine constants rather than numpy-seeded approximations.
    Sign-random-projection with Rademacher entries is a valid cosine
    LSH family (Charikar's SimHash; Achlioptas-style ±1 projections)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{tag}:{p}:{d}".encode()).hexdigest()[0], 16) < 8 else -1
            for d in range(dim)
        ]
        for p in range(bits)
    ]


def portable_simhash_chunks(
    vec_col: Column,
    dim: int,
    bits: int = 64,
    chunk_bits: int = 16,
    tag: str = "simverify",
) -> Column:
    """Portable integer SimHash of a dense vector, returned as an
    ``array<bigint>`` of ``bits/chunk_bits`` chunk values.

    Exact-by-construction in any engine: components are quantized to
    integers (``floor(x * 1e6)`` — floor, not round, so no half-tie
    mode can differ), projected onto the md5-derived ±1 planes with
    pure BIGINT arithmetic (order-independent, no float summation
    drift), and each plane's sign bit packed into its chunk. Entirely
    Catalyst higher-order expressions — JVM-side, no Python on the hot
    path."""
    if bits % chunk_bits:
        raise ValueError("bits must be a multiple of chunk_bits")
    signs = portable_plane_signs(bits, dim, tag)
    qv = F.transform(vec_col, lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("long"))
    chunks = []
    for c in range(bits // chunk_bits):
        val = F.lit(0).cast("long")
        for k in range(chunk_bits):
            p = c * chunk_bits + k
            srow = F.array(*[F.lit(s).cast("long") for s in signs[p]])
            dot = F.aggregate(
                F.zip_with(qv, srow, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            val = val + F.when(dot >= 0, F.lit(1 << k).cast("long")).otherwise(F.lit(0).cast("long"))
        chunks.append(val)
    return F.array(*chunks)


def portable_simhash_chunks_udf(
    dim: int,
    bits: int = 64,
    chunk_bits: int = 16,
    tag: str = "simverify",
):
    """Arrow-vectorized twin of ``portable_simhash_chunks``: the SAME
    md5-derived planes and the SAME exact integer arithmetic
    (``floor(x·1e6)`` then int64 matmul — no float summation anywhere
    after quantization), batched through numpy. Bit-identical to the
    Catalyst form (pinned by pytest) but ~100× faster per scan: Spark
    evaluates 64 higher-order aggregate lambdas interpreted, while the
    int64 matmul is one BLAS-free vectorized pass. NULL vectors yield
    NULL signatures and drop out of the candidate equi-join."""
    import numpy as np

    from pyspark.sql.types import ArrayType

    signs = np.array(portable_plane_signs(bits, dim, tag), dtype=np.int64)
    nchunks = bits // chunk_bits
    _bm = _make_batch_matrix()

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat, mask = _bm(vecs, expect_dim=dim)
        qv = np.floor(mat * 1000000.0).astype(np.int64)
        bitm = (qv @ signs.T) >= 0
        w = 1 << np.arange(chunk_bits, dtype=np.int64)
        chunks = np.stack(
            [bitm[:, c * chunk_bits : (c + 1) * chunk_bits] @ w for c in range(nchunks)],
            axis=1,
        )
        out = [row.tolist() if ok else None for row, ok in zip(chunks, mask)]
        return pd.Series(out, dtype="object")

    return _sig


def portable_simhash_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.99,
    bits: int = 64,
    chunk_bits: int = 16,
    max_hamming: int = 3,
    round_dp: int = 4,
    certify: bool = False,
    impl: str = "pandas",
) -> DataFrame:
    """Verified SCALE tier for cosine near-duplicate pairs: portable
    SimHash chunk-pigeonhole candidates + exact confirm.

    Output semantics (deterministic, oracle-replayable): all pairs with
    ``hamming(sig_a, sig_b) <= max_hamming AND cosine >= threshold``,
    where ``sig`` is the portable integer SimHash above. For THESE
    semantics recall is exactly 1 by pigeonhole: a pair within Hamming
    radius H over C = bits/chunk_bits > H chunks must agree on at least
    one whole chunk, so the chunk equi-join can never miss it — the
    same candidates→confirm doctrine as the MinHash verified tier
    (dedup.py) and Misra–Gries (heavyhitters.py), but with a proof
    instead of a probability.

    What the sketch filter admits of the underlying cosine pairs is the
    explicit knob: P[hamming <= H | cos θ] with E[hamming] =
    bits·θ/π. At the quantization-twin working point (cos ≈ 0.9999,
    E[hamming] ≈ 0.1 of 64) it is ~1 − 1e-9; at cos 0.95 it is ~0.1 —
    so this tier targets true near-duplicates (re-encodes, quantized
    copies, crawl mirrors), not mid-similarity retrieval, and the
    docstring of the exact tier (`cosine_dup_pairs(exact=True)`) keeps
    oracle duty for low thresholds.

    Cost at scale: signatures are one linear JVM scan; candidates are C
    chunk equi-joins over 16-bit keys (measured on the sf0.1 twin
    corpus: ~2.2 k bucket pairs per chunk vs 8 M all-pairs — ~900×);
    the confirm is exact cosine on candidates only.

    ``certify=True`` re-derives the result via the quadratic all-pairs
    route and raises if any pair differs — the runtime certificate
    pattern (heavy-hitters precedent), for tests and check-scale audits
    only.
    """
    if impl == "pandas":
        sig = portable_simhash_chunks_udf(dim, bits, chunk_bits)(F.col(vec_col))
    elif impl == "expr":
        sig = portable_simhash_chunks(F.col(vec_col), dim, bits, chunk_bits)
    else:
        raise ValueError(f"impl must be 'pandas' or 'expr', got {impl!r}")
    sigs = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), sig.alias("_sig")
    ).localCheckpoint(eager=False)

    posted = sigs.select("_id", F.posexplode("_sig").alias("_c", "_val"))
    cand = (
        posted.alias("a")
        .join(posted.alias("b"), ["_c", "_val"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    a = sigs.select(F.col("_id").alias("id_a"), F.col("_vec").alias("_va"), F.col("_sig").alias("_sa"))
    b = sigs.select(F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"), F.col("_sig").alias("_sb"))
    ham = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    confirmed = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", ham)
        .withColumn("cosine", F.round(cosine_expr(F.col("_va"), F.col("_vb")), round_dp))
        .filter((F.col("hamming") <= max_hamming) & (F.col("cosine") >= threshold))
        .select("id_a", "id_b", "hamming", "cosine")
    )
    if certify:
        ax = sigs.select(F.col("_id").alias("id_a"), F.col("_vec").alias("_va"), F.col("_sig").alias("_sa"))
        bx = sigs.select(F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"), F.col("_sig").alias("_sb"))
        exact = (
            ax.join(bx, F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", ham)
            .withColumn("cosine", F.round(cosine_expr(F.col("_va"), F.col("_vb")), round_dp))
            .filter((F.col("hamming") <= max_hamming) & (F.col("cosine") >= threshold))
            .select("id_a", "id_b", "hamming", "cosine")
        )
        missed = exact.exceptAll(confirmed).count()
        extra = confirmed.exceptAll(exact).count()
        if missed or extra:
            raise RuntimeError(
                f"portable_simhash_dup_pairs certificate failed: "
                f"{missed} pairs missed, {extra} spurious — the pigeonhole "
                f"guarantee was violated (implementation bug, not data)"
            )
    return confirmed


def self_knn_topk(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_dp: int = 4,
) -> DataFrame:
    """Exact self-kNN (query set == corpus): top-k cosine neighbors of
    EVERY vector — the all-vs-all eval pass behind hubness/recall
    diagnostics. Same output schema and numerics as
    :func:`brute_force_topk` with ``queries=vectors``, restructured
    for the all-queries case:

    - The query matrix rides a CLOSURE (the IVF-codebook precedent:
      the embeddings table is the bounded eval sample — at true corpus
      scale the exact tier is replaced by IVF/LSH candidates, traded
      explicitly). Each corpus vector then crosses the Python boundary
      ONCE per partition, not once per (query, vector) pair — the
      join formulation ships |V|·|Q| 64-dim arrays through Arrow
      (~4 GB at 2 000², the measured 23 s), this ships |V|.
    - Each partition emits only its PARTIAL top-k per query
      (|Q|·k rows), so the final global top-k window sees
      |Q|·k·|partitions| skinny rows instead of |V|·|Q|.
    - Per-pair cosine math is IDENTICAL to cosine_pairs_udf —
      ``(V*q).sum(axis=1)`` row-sums and norm-product-then-divide in
      the same operand order — so the 4-dp rounded scores (and the
      DuckDB oracle hash) are unchanged. Zero-norm vectors never score
      (matching the NULL-cosine semantics).
    """
    import numpy as np

    rows = vectors.select(id_col, vec_col).collect()
    q_ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    Qm = np.asarray([np.asarray(r[1], dtype=np.float64) for r in rows])
    q_norm = np.linalg.norm(Qm, axis=1)
    kk, dp = int(k), int(round_dp)
    _bm = _make_batch_matrix()

    out_schema = "query_id long, neighbor_id long, cosine double"

    def _partial(batches):
        import pandas as pdl

        for pdf in batches:
            if not len(pdf):
                continue
            V, vmask = _bm(pdf[vec_col])
            n_ids = pdf[id_col].to_numpy(dtype=np.int64)
            v_norm = np.linalg.norm(V, axis=1)
            out_q, out_n, out_c = [], [], []
            for j in range(len(q_ids)):
                den = v_norm * q_norm[j]
                ok = vmask & (den > 0) & (n_ids != q_ids[j])
                if not ok.any():
                    continue
                num = (V * Qm[j]).sum(axis=1)
                cos = np.divide(num, den, out=np.zeros_like(num), where=ok)
                # SELECTION key uses a half-away-from-zero 4-dp round
                # (approximating Catalyst's HALF_UP) so partial top-k
                # agrees with the final (F.round desc, id asc) window
                # ordering across rounding ties; the EMITTED cosine is
                # RAW — the final plan applies F.round, so output
                # values are Catalyst-rounded exactly like
                # brute_force_topk (and the DuckDB oracle).
                scaled = cos * (10.0**dp)
                key = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
                cand = np.flatnonzero(ok)
                # partial top-k with the global tiebreak (cosine desc,
                # neighbor id asc): lexsort is stable least-significant-last
                order = cand[np.lexsort((n_ids[cand], -key[cand]))]
                if len(order) > kk:
                    # The float key approximates Catalyst's BigDecimal
                    # HALF_UP; the two can disagree by at most ONE
                    # dp-grid quantum (only when |scaled| sits within
                    # float error of a .5 boundary). Keep every
                    # candidate within one quantum of the kth key so a
                    # boundary disagreement can never drop a row the
                    # final (F.round desc, id asc) window needed — the
                    # global row_number pass trims the surplus.
                    kth_key = key[order[kk - 1]]
                    keep = kk
                    while keep < len(order) and key[order[keep]] >= kth_key - 1.0:
                        keep += 1
                    order = order[:keep]
                out_q.extend([q_ids[j]] * len(order))
                out_n.extend(n_ids[order])
                out_c.extend(cos[order])
            yield pdl.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    partial = (
        vectors.select(id_col, vec_col)
        .mapInPandas(_partial, out_schema)
        .withColumn("cosine", F.round(F.col("cosine"), dp))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= kk)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
