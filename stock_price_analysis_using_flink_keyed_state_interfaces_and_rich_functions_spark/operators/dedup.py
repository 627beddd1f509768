"""Deduplication operators for LLM training-data pipelines
(brief-mandated; SURVEY.md §2.6 "LLM-data ops").

Four tiers, cheapest-first, as a real 100 TB pipeline would run them:

1. **Exact** — content-hash groupBy. One shuffle on a 128-bit digest;
   survivor pinned deterministically (min id) so results are
   reproducible (and oracle-checkable).
2. **N-gram Jaccard** — exact set-similarity via a token-postings
   self-join. Correct but candidate generation is bounded by document
   frequency of the rarest shared token; this is the small-scale oracle
   path and the ground truth the approximate tiers are tested against.
3. **MinHash + LSH** — the scale path: per-doc signature (one explode +
   one groupBy), banded bucket equi-join for candidates (never
   all-pairs), signature-overlap estimate to confirm. All Catalyst
   expressions; hash arithmetic stays below 2^62 so ANSI mode (Spark 4
   default) never overflows.
4. **SimHash** — near-dup by Hamming distance on a compact bit
   signature; candidates via the pigeonhole chunk trick (hamming ≤ k ⇒
   at least one of k+1 chunks equal), confirmed with bit_count(xor).

No tier ever builds a cartesian product; tests assert the plans are
CartesianProduct-free.
"""

from __future__ import annotations

import random
import re
import zlib
from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_band_rows",
    "minhash_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_verified_pairs",
    "dup_clusters",
    "simhash",
    "simhash_pairs",
    "containment_prefix_pairs",
    "sorted_neighborhood_pairs",
]

# Mersenne prime 2^31 - 1: (a * (h mod p) + b) with a,b < p stays < 2^62,
# safe under ANSI overflow checking.
_MERSENNE_P = (1 << 31) - 1


def _content_digest(content_cols: Sequence[str]) -> Column:
    """md5 over LENGTH-PREFIXED column tokens ('3:abc', NULL → 'n:') —
    self-delimiting, so NULL vs empty vs shifted column boundaries
    ('ab','c' vs 'a','bc') can never alias to one digest. Same encoding
    as sampling.hash_bucket_hex (a plain concat would collapse them)."""
    tokens = []
    for c in content_cols:
        s = F.col(c).cast("string")
        tokens.append(
            F.when(s.isNull(), F.lit("n:")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat(*tokens))


def exact_dedup(df: DataFrame, content_cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep exactly one row (min ``id_col``) per distinct content.

    Hashes content to md5 so the shuffle key is 32 bytes regardless of
    document size — at 100 TB you shuffle digests, not documents.
    """
    from pyspark.sql import Window

    digest = _content_digest(content_cols)
    w = Window.partitionBy("_digest").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_digest", "_rn")
    )


def exact_dup_groups(df: DataFrame, content_cols: Sequence[str], id_col: str) -> DataFrame:
    """Duplicate groups: one row per content value occurring ≥ 2 times,
    with the group size and surviving (min) id."""
    digest = _content_digest(content_cols)
    return (
        df.withColumn("digest", digest)
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("survivor_id"))
        .filter(F.col("n_dups") >= 2)
    )


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _word_shingles(text_col: str, k: int) -> Column:
    """Distinct word k-shingles as strings (docs shorter than k words
    contribute their full token string as a single shingle).

    Built as k shifted slices zipped together, NOT transform over an
    index sequence with a per-element slice(toks, i+1, k): Catalyst
    inlines the tokenize split into every element-indexed reference,
    so that form re-splits the whole text per shingle — O(len²) per
    doc (the text_keyword_textrank bench finding). arrays_zip names
    expression fields "0"/"1"/…; the transform concatenates via the
    lambda variable, so the split is referenced a constant number of
    times per row. Output bit-identical."""
    toks = _tokens(text_col)
    n = F.size(toks)
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, n - k + 1) for j in range(k)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    return F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_k: int = 1,
    impl: str = "expr",
) -> DataFrame:
    """Exact Jaccard similarity over distinct word k-shingles, for all
    pairs sharing ≥1 shingle. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard ≥ threshold (rounded to 4 dp).

    Postings-list self-join: |pairs| is Σ_shingle df(shingle)², so this
    is the exact/oracle path for modest corpora; at 100 TB use the
    MinHash tier for candidates and this only to confirm them.

    ``impl="expr"`` (default — this function's role is the exact tier,
    so collision-free string shingles are the default semantics) keeps
    exact string shingles JVM-side. ``impl="hash"`` is the explicit
    scale opt-in: shingles carried as 64-bit blake2b hashes (same trade
    as contamination_hits: ~8-byte join keys instead of ~30-byte
    strings, Arrow-built; intersections/sizes drift only on a 64-bit
    collision, <1 expected up to ~10⁹ distinct shingles)."""
    if impl == "hash":
        from .text import _hashed_shingles_udf

        shingles = _hashed_shingles_udf(shingle_k)(F.col(text_col))
    elif impl == "expr":
        shingles = _word_shingles(text_col, shingle_k)
    else:
        raise ValueError(f"impl must be 'hash' or 'expr', got {impl!r}")
    # The postings table feeds FOUR subtrees (both join sides + two size
    # lookups); checkpoint so the UDF+explode computes once instead of
    # four times (measured 45 s → 31 s at sf0.1). eager=False keeps plan
    # construction lazy — schema/explain inspection must not run a job.
    sh = df.select(F.col(id_col).alias("_id"), F.explode(shingles).alias("_sh")).localCheckpoint(
        eager=False
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.select(F.col("_id").alias("id_a"), "_sh")
    b = sh.select(F.col("_id").alias("id_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sza"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_szb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("_inter").cast("double") / (F.col("_sza") + F.col("_szb") - F.col("_inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 128,
    shingle_k: int = 3,
    seed: int = 42,
    impl: str = "pandas",
) -> DataFrame:
    """Per-document MinHash signature: array<long> of length
    ``num_hashes``. ENTIRELY map-side — no explode, no shuffle: at
    100 TB this is an embarrassingly parallel scan, vs. the naive
    explode→groupBy formulation that shuffles every (doc, shingle) pair.

    ``impl="pandas"`` (default): the WHOLE tokenize→shingle→hash→min
    chain runs inside one Arrow-batched UDF — raw text in, compact
    ``array<long>`` signature out. This is the sanctioned pandas-UDF
    slow-path exception, chosen on measurement: Spark evaluates
    higher-order array lambdas interpreted (never whole-stage codegen),
    so building shingles with ``transform``+``slice``+``concat_ws``
    JVM-side costs ~15µs per shingle and dominated the entire MinHash
    pipeline; Python set-building plus a vectorized (num_hashes ×
    num_shingles) modular matmul is ~10× faster. Base hash: crc32
    (deterministic across executors/runs — never Python ``hash``).

    ``impl="expr"``: pure Catalyst higher-order functions (xxhash64
    base hash). Same banding/estimation behavior, different hash
    family, so signatures are not byte-identical between impls.
    """
    params = _hash_params(num_hashes, seed)
    if impl == "pandas":
        from pyspark.sql.types import ArrayType, LongType

        a_vec = np.array([p[0] for p in params], dtype=np.uint64)[:, None]
        b_vec = np.array([p[1] for p in params], dtype=np.uint64)[:, None]
        p_mod = np.uint64(_MERSENNE_P)
        k = shingle_k

        @F.pandas_udf(ArrayType(LongType()))
        def _sig(texts: pd.Series) -> pd.Series:
            out = []
            for txt in texts:
                # Same shingle semantics as _word_shingles: whitespace
                # tokens of the trimmed text, distinct word k-shingles,
                # short docs contribute their full token string.
                toks = [x for x in re.split("[ \t\n\x0b\f\r]+", txt) if x] if txt else []
                if len(toks) >= k:
                    shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                else:
                    shingles = {" ".join(toks)}
                # crc32 < 2^32 and a < 2^31 keep a*h+b < 2^63: no
                # uint64 overflow in the permutation arithmetic.
                h = np.fromiter(
                    (zlib.crc32(s.encode("utf-8")) for s in shingles),
                    dtype=np.uint64,
                    count=len(shingles),
                )
                mins = ((a_vec * h[None, :] + b_vec) % p_mod).min(axis=1)
                out.append(mins.astype(np.int64))
            return pd.Series(out)

        return df.select(F.col(id_col), _sig(F.col(text_col)).alias("signature"))

    if impl != "expr":
        raise ValueError(f"impl must be 'pandas' or 'expr', got {impl!r}")
    shingles = _word_shingles(text_col, shingle_k)
    params_arr = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params]
    )
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P)))
    # Bind ``hashes`` ONCE as a lambda variable (single-element-array
    # trick). Without the binding, CollapseProject inlines the whole
    # shingle+hash expression into the outer lambda and recomputes it
    # once per permutation — a silent num_hashes× blowup.
    sig = F.transform(
        F.array(hashes),
        lambda hs: F.transform(
            params_arr,
            lambda pr: F.array_min(
                F.transform(hs, lambda h: F.pmod(pr["a"] * h + pr["b"], F.lit(_MERSENNE_P)))
            ),
        ),
    )[0]
    return df.select(F.col(id_col), sig.alias("signature"))


def minhash_band_rows(
    signatures: DataFrame,
    id_col: str,
    num_bands: int,
    num_hashes: int,
) -> DataFrame:
    """The LSH bucket rows of a signature table: (id, band_idx,
    band_hash) with one xxhash64 per band — the joinable form of a
    signature. Factored out of :func:`minhash_candidate_pairs` so
    cross-TABLE candidate joins (a new micro-batch against an
    accumulated accepted-corpus store, two corpora against each other)
    band each side once and equi-join on (band_idx, band_hash)."""
    rows_per_band = num_hashes // num_bands
    band_hashes = F.array(*[
        F.xxhash64(*[
            F.element_at("signature", b * rows_per_band + i + 1) for i in range(rows_per_band)
        ])
        for b in range(num_bands)
    ])
    return signatures.select(
        F.col(id_col),
        F.posexplode(band_hashes).alias("band_idx", "band_hash"),
    )


def minhash_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 32,
    num_hashes: int | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``num_bands`` bands, hash
    each band, equi-join docs sharing any (band_idx, band_hash) bucket.
    Returns distinct candidate (id_a, id_b) with id_a < id_b — never an
    all-pairs product; the join key is (band, hash) so Catalyst plans a
    plain shuffled equi-join.

    Pass ``num_hashes`` (the signature length) to keep the plan fully
    lazy; omitting it costs one small driver job to probe the length.

    Band hashes are a flat ``xxhash64(sig[b*r+1], …, sig[b*r+r])`` per
    band — plain codegen'd expressions. The equivalent higher-order
    ``transform``+``slice``+``concat_ws`` formulation is evaluated
    interpreted and measured ~6× slower on the banding stage.
    """
    if num_hashes is None:
        sig_len_row = signatures.select(F.size("signature").alias("n")).first()
        if sig_len_row is None:
            return signatures.sparkSession.createDataFrame([], "id_a long, id_b long")
        num_hashes = sig_len_row["n"]
    if not 1 <= num_bands <= num_hashes:
        # bands beyond the signature length would index past the array:
        # ANSI (Spark 4 default) errors; legacy mode silently NULLs the
        # band hash for EVERY doc — i.e. an accidental all-pairs join
        raise ValueError(f"num_bands must be in [1, num_hashes={num_hashes}], got {num_bands}")
    if num_hashes % num_bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by num_bands ({num_bands}); "
            "a remainder would silently drop the tail hashes from every band"
        )
    # Checkpoint the banded frame: BOTH self-join sides otherwise
    # re-derive the band rows (signature readback + 64 xxhash64 bands +
    # explode) independently — measured 1.6 s -> 0.7 s for the whole
    # candidate stage at sf0.1. Same pattern as the cosine-LSH
    # signature checkpoint (similarity.py) and the shingle postings
    # materialization above.
    banded = minhash_band_rows(signatures, id_col, num_bands, num_hashes).localCheckpoint(
        eager=False
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    persist_signatures: bool = True,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: signatures → banded
    candidates → signature-overlap Jaccard estimate ≥ threshold.
    Returns (id_a, id_b, est_jaccard).

    The signature table feeds FOUR subtrees (both sides of the band
    self-join + both sides of the estimate join). Default: cache the
    compact (id, num_hashes longs) signature rows — ~1 KB/doc, never
    the documents — so every consumer reads the computed table instead
    of re-running the UDF or round-tripping a shuffle. MEMORY_AND_DISK:
    at corpus scale the signature table is ~0.1% of the text it
    summarizes and spills gracefully. Measured at sf0.1 (5k docs):
    cached 0.87 s vs 1.48 s for the ``persist_signatures=False``
    fallback, which instead repartitions on id so AQE's ReusedExchange
    shares one materialization across the consumers — use it when the
    executor cache is contended and an extra exchange is cheaper than
    eviction pressure.
    """
    if persist_signatures:
        from pyspark import StorageLevel

        sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, seed).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sigs.count()
    else:
        sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, seed).repartition(
            F.col(id_col)
        )
    cands = minhash_candidate_pairs(sigs, id_col, num_bands, num_hashes=num_hashes)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("_sb"))
    est = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.aggregate(
                    F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / F.size("_sa"),
                4,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return est


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 128,
    num_bands: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH candidates confirmed by EXACT Jaccard — the
    canonical candidate→confirm production shape, and the form whose
    output is oracle-checkable against an all-pairs exact-Jaccard SQL.

    :func:`minhash_dedup_pairs` confirms with the signature-overlap
    *estimate* (±1/√num_hashes noise — inherently un-oracle-able).
    This variant instead joins each candidate pair back to its exact
    string shingle sets and computes true Jaccard, so the output equals
    the exact tier's output restricted to LSH candidates. With banding
    tuned for recall ~1 at the target threshold (default r = 128/64 = 2
    rows/band: P[candidate | J=0.7] = 1-(1-0.49)^64 ≈ 1-2e-19) the
    restriction is vacuous and the result hash-matches the all-pairs
    oracle — which is exactly what the driver verifies.

    Scale: candidates come from the banded equi-join (never all-pairs);
    the confirm joins shingle ARRAYS only for candidate rows —
    |candidates| × avg-doc-shingles, not corpus².

    Cache lifecycle (r5 advisor; amended r14): nothing is persisted —
    the signature frame's single consumer is the banding, whose
    localCheckpoint of the banded rows is the one shared artifact; the
    RESULT is materialized eagerly (localCheckpoint), so a long-lived
    session never accumulates cached RDDs across invocations and no
    "fresh" rebuild can ride a previous invocation's warm cache. The
    returned frame is already materialized: pair-list-sized
    (|near-dup pairs|), safe to reference any number of times.
    """
    # No signature persist (optimization round 14): the signature frame
    # has exactly ONE consumer — the banding inside
    # minhash_candidate_pairs, which localCheckpoints the banded rows
    # (the artifact both self-join sides actually read). Caching the
    # |corpus| array<long> signatures bought no second read and cost a
    # full block-store materialization per derive (§5: cache only what
    # is re-read). The r5 cache-lifecycle concern (warm CacheManager
    # hits across "fresh" rebuilds) no longer applies — nothing is
    # cached to hit.
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, seed)
    cands = minhash_candidate_pairs(sigs, id_col, num_bands, num_hashes=num_hashes)
    # Confirm ONLY candidate docs: building exact shingle arrays for
    # the whole corpus (and twice — once per join side) is the thing
    # the candidate tier exists to avoid. Semi-join the distinct
    # candidate ids first, checkpoint the pruned shingle table so both
    # pair sides read it instead of re-deriving it: at 100 TB the
    # shingle materialization is |candidate docs| × avg-shingles, not
    # corpus-sized (measured ~1 s off the sf0.1 confirm stage too).
    cand_ids = (
        cands.select(F.col("id_a").alias("_id"))
        .unionByName(cands.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    shs = (
        df.join(cand_ids, df[id_col] == cand_ids["_id"], "left_semi")
        .select(F.col(id_col).alias("_id"), _word_shingles(text_col, shingle_k).alias("_shs"))
        .localCheckpoint(eager=False)
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    out = (
        cands.join(shs.select(F.col("_id").alias("id_a"), F.col("_shs").alias("_sa")), "id_a")
        .join(shs.select(F.col("_id").alias("id_b"), F.col("_shs").alias("_sb")), "id_b")
        .withColumn("_i", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("_i").cast("double") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    return out


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve pairwise duplicate edges into connected components:
    (id, cluster_id) with cluster_id = the component's minimum id.

    Dropping "the higher id of every pair" under-merges transitive
    chains (a~b, b~c but a≁c leaves two survivors of one cluster);
    canonical dedup keeps ONE doc per component. Algorithm: hash-min
    label propagation — every node repeatedly takes the min label among
    itself and its neighbors until a fixpoint. Each iteration is one
    equi-join + groupBy-min (all distributed, no driver data); rounds
    needed = graph diameter, which for near-dup clusters is small
    (dup clusters are near-cliques). The driver only checks the
    converged-yet counter, never touches rows. Raises RuntimeError if
    ``max_iter`` rounds don't converge rather than returning a
    silently-partial clustering.
    """
    from pyspark import StorageLevel

    fwd = pairs.select(F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst"))
    edges = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Seed with one propagation folded in: label = min(id, min neighbor)
    # — one round cheaper than all-self labels for the common star shape.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nbr"))
        .select(F.col("src").alias("id"), F.least(F.col("src"), F.col("_nbr")).alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed_labels = labels
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["id"])
                .groupBy("src")
                .agg(F.min("label").alias("_nbr"))
            )
            # _improved rides along so convergence needs no second join
            # against the old labels — one action per round.
            new_labels = (
                labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
                .select(
                    labels["id"],
                    F.least(labels["label"], F.coalesce(F.col("_nbr"), labels["label"])).alias("label"),
                    (F.coalesce(F.col("_nbr"), labels["label"]) < labels["label"]).alias("_improved"),
                )
                # localCheckpoint, not persist: it CUTS the lineage, so the
                # logical plan stays one join deep instead of doubling every
                # round (unchecked, round ~15 re-optimizes a 2^15-node tree
                # and the driver dies before any executor does). On a real
                # cluster prefer reliable checkpoint() for fault tolerance.
                # LAZY (optimization round 13): the convergence count below
                # is the round's one action and materializes the checkpoint
                # as part of the same job — eager=True ran a separate
                # materialization job first, doubling the per-round driver
                # round-trips for identical blocks.
                .localCheckpoint(eager=False)
            )
            changed = new_labels.filter(F.col("_improved")).count()
            if labels is seed_labels:
                labels.unpersist()  # round-1 checkpoint replaced the persisted seed
            # (checkpointed rounds have no reachable persist handle —
            # their blocks free on GC; bounded: rounds = component
            # diameter and the label table is 3 narrow columns)
            labels = new_labels.drop("_improved")
            if changed == 0:
                return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
        raise RuntimeError(f"dup_clusters did not converge in {max_iter} iterations")
    finally:
        edges.unpersist()


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """SimHash bit signature over word tokens (≤ 62 bits so the
    assembled value fits a signed long without ANSI overflow).

    Per token: xxhash64(seed‖token); bit b of the signature is the sign
    of Σ_tokens (±1 depending on the token hash's bit b). Explode +
    groupBy — one shuffle, ``bits`` conditional-sum aggregates.

    ``portable=True`` swaps the token hash for the first 32 bits of
    md5(token) (``seed`` ignored) — bit-for-bit reproducible in any
    engine with md5, which is what makes the *verified* tier
    (``dedup_simhash_verified``) oracle-checkable in DuckDB: the oracle
    recomputes identical signatures and compares exact all-pairs
    Hamming. Same plan shape either way; conv(hex,16,10) is a scalar
    expression, still whole-stage codegen.
    """
    if not 1 <= bits <= 62:
        raise ValueError("bits must be in [1, 62]")
    if portable and bits > 32:
        raise ValueError("portable simhash derives 32 hash bits from md5")
    toked = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("_t"))
    if portable:
        h = F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.lit(str(seed)), F.col("_t"))
    votes = [
        F.sum(F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"_v{b}")
        for b in range(bits)
    ]
    agged = toked.groupBy(id_col).agg(*votes)
    sig = F.aggregate(
        F.array(*[
            F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ]),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )
    return agged.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ ``max_hamming``.

    Pigeonhole candidates: split the signature into ``max_hamming + 1``
    chunks; any pair within the distance budget must agree on ≥1 chunk →
    equi-join on (chunk_idx, chunk_value), confirm with
    bit_count(a XOR b). No all-pairs product at any scale.
    """
    n_chunks = max_hamming + 1
    chunk_bits = (bits + n_chunks - 1) // n_chunks
    mask = (1 << chunk_bits) - 1
    chunked = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), i * chunk_bits).bitwiseAND(F.lit(mask))
                for i in range(n_chunks)
            ])
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_ha"), "chunk_idx", "chunk_val")
    b = chunked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_hb"), "chunk_idx", "chunk_val")
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def chunk_dup_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Chunk-level exact dedup ratio (the token-chunk adaptation of
    exact-substring training-data dedup, à la "Deduplicating Training
    Data Makes Language Models Better"): split each document into
    consecutive ``chunk_tokens``-token chunks, hash each chunk, count
    corpus-wide chunk frequency, and report per document how many of its
    chunks occur more than once corpus-wide (including repeats within
    the same document — self-plagiarized boilerplate counts).
    ``dup_chunk_ratio`` near 1 = the
    document is assembled from boilerplate; filter or strip before
    training.

    Returns (id, n_chunks, n_dup_chunks, dup_chunk_ratio) for every
    document with ≥1 token.

    Scale shape: chunking is map-side (higher-order slice over the token
    array, no UDF); the corpus-wide frequency is one groupBy over md5
    chunk digests (32-byte keys, map-side partial agg); the join back is
    digest-keyed. Nothing is ever quadratic and raw text is never
    shuffled — only digests. A 100 TB corpus yields ~|tokens|/chunk_size
    digest rows, the same order as a shingle pass.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    toks = _tokens(text_col)
    n_chunks_expr = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks_expr - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens))),
    )
    # split('') returns [''] (size 1), so guard on trimmed LENGTH — an
    # empty/whitespace/NULL doc has no chunks, not one empty chunk.
    # The exploded digest table feeds BOTH the frequency aggregate and
    # the join-back; checkpoint so tokenize+md5 runs once, not twice
    # (eager=False keeps plan construction lazy).
    exploded = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("_h"))
        .localCheckpoint(eager=False)
    )
    freq = exploded.groupBy("_h").agg(F.count("*").cast("long").alias("_f"))
    return (
        exploded.join(freq, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("_f") > 1, 1).otherwise(0)).cast("long").alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_chunk_ratio",
            F.round(F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6),
        )
    )


def _containment_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """Shared distinct-word-k-shingle posting table for the containment
    tiers (one (_id, _sh) row per distinct shingle per doc, docs with
    fewer than k tokens dropped, eagerly checkpointed). Built as k
    zipped shifted slices, not transform + per-element slice (the
    per-element re-split trap — see _word_shingles); bit-identical.
    Extracted so containment_idf_rescore scores over the SAME pipeline
    object shape its candidate generator used instead of a drifting
    copy."""
    toks = _tokens(text_col)
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, F.size(toks) - shingle_k + 1) for j in range(shingle_k)]
    )
    grams = F.array_distinct(
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(shingle_k)])
        )
    )
    return (
        df.filter(F.size(toks) >= shingle_k)
        .select(F.col(id_col).alias("_id"), F.explode(grams).alias("_sh"))
        .localCheckpoint(eager=True)
    )


def containment_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_pct: int = 80,
    min_shingles: int = 5,
    shingle_k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric containment join — quote/excerpt detection: ordered
    pairs (a, b) where at least ``threshold_pct``% of a's distinct word
    k-shingles also appear in b (a "is quoted by" b). Jaccard tiers
    miss exactly this case (a short doc embedded in a long one has LOW
    Jaccard — the denominators differ — which is the point), so this is
    its own tier next to the MinHash/SimHash symmetric ones.

    Blocking is the PREFIX FILTER of set-similarity joins (the
    SSJoin/PPJoin family — public literature): order every doc's
    shingles by GLOBAL (document-frequency, shingle) ascending; a
    containment ≥ t needs overlap ≥ o = ceil(t·n_a), so b can miss at
    most n_a − o of a's shingles — by pigeonhole any qualifying b
    shares at least one of a's first n_a − o + 1 shingles in that
    order. Joining only that prefix (the RAREST ~(1−t) slice of each
    doc) against the full posting rows gives RECALL 1 BY CONSTRUCTION,
    with candidate volume Σ_s prefix_count(s)·df(s) — rare shingles
    have tiny df, so the product stays near-linear instead of the
    full postings self-join's Σ df².  Candidates then get an EXACT
    overlap count (candidate-restricted equi-joins) — precision 1.

    All arithmetic is integer (o = ceil via div; the containment score
    is (overlap·10⁶) div n_a micro-units), so the DuckDB oracle — which
    computes the same answer quadratically-by-identity — hash-matches.

    Per-doc shingle ranking is a window PARTITIONED BY doc (bounded by
    one document's shingle set, never corpus-sized). Docs with fewer
    than ``shingle_k`` tokens have no k-shingles and drop out of both
    sides, matching the oracle's ``len(toks) >= k`` guard.

    SCALE NOTE (round-8 decade probe, SCALE.md): on a FIXED-vocabulary
    corpus every shingle's df grows ∝ N, making Σ prefix·df = Θ(N²/V)
    — measured ×15.6 at ×5 docs on the 31-word synthetic corpus. A
    df-cap CANNOT recover linearity without losing recall 1 (the
    asc-df prefix is already the optimal recall-1 probe subset by the
    pigeonhole argument above). Under natural Heaps-law vocabulary
    growth rare-shingle dfs stay near-flat and the join is
    near-linear. If a corpus is genuinely vocabulary-saturated, the
    levers are SEMANTIC and should be chosen explicitly: raise
    ``shingle_k`` (shingle space grows exponentially, collapsing df)
    or block by source/language before the join — both change the
    query definition, never silently cap it.
    """
    # `shingles` lets a caller that has ALREADY materialized the
    # (_id, _sh) posting table (containment_idf_rescore) share the
    # checkpoint instead of paying the corpus explode twice.
    sh = (
        shingles
        if shingles is not None
        else _containment_shingles(df, id_col, text_col, shingle_k)
    )
    # BLOCKING RUNS ON 8-BYTE DIGESTS, NOT SHINGLE STRINGS (optimization
    # round 13; the round-11 "shuffle payload beats shuffle count"
    # lesson): the df-aggregate, the per-doc rank window, and the
    # prefix⋈postings candidate join only need shingle IDENTITY, so
    # they key on xxhash64(_sh) — ~⅓ the shuffle payload of the raw
    # 3-word strings and long-typed sort/probe keys. Recall 1 is
    # preserved by construction: the pigeonhole argument holds for ANY
    # fixed total order over a doc's shingles (the prefix is just the
    # n_a−o+1 of them whose posting lists get probed; df-ascending is
    # the volume-optimal choice, and digest-df ordering only perturbs
    # WHICH recall-1 prefix is used). A digest collision can only MERGE
    # two posting lists — extra candidates, never a missed one — and
    # every candidate still passes the exact string-keyed overlap
    # confirm below, so the output set is bit-identical either way.
    sh8 = sh.select("_id", F.xxhash64("_sh").alias("_h"))
    dfreq = sh8.groupBy("_h").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    n = sh.groupBy("_id").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    # A-universe: docs big enough to make the score meaningful
    a_docs = n.filter(F.col("n_a") >= min_shingles)
    # o = ceil(pct·n/100) via div on non-negative ints; prefix = n − o + 1
    o_min = F.expr(f"CAST(({threshold_pct} * n_a + 99) div 100 AS BIGINT)")
    prefix_len = (F.col("n_a") - o_min + 1).alias("_plen")
    ranked = (
        sh8.join(dfreq, "_h")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_h"))
            ),
        )
        .drop("_df")
    )
    prefixes = (
        ranked.join(a_docs.select("_id", prefix_len), "_id")
        .filter(F.col("_rk") <= F.col("_plen"))
        .select(F.col("_id").alias("doc_a"), "_h")
    )
    cand = (
        prefixes.join(sh8.select(F.col("_id").alias("doc_b"), "_h"), "_h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # LENGTH FILTER (recall-preserving, the SSJoin size bound): a
    # qualifying b contains ≥ o = ceil(t·n_a) DISTINCT shingles of a,
    # so n_b ≥ o — any shorter b cannot qualify and is pruned BEFORE
    # the exact-confirm join pays |cand|·n_a rows. Pure candidate
    # pruning: the surviving-pair set (and the output hash) is
    # identical; only the confirm volume shrinks.
    cand = (
        cand.join(n.select(F.col("_id").alias("doc_a"), "n_a"), "doc_a")
        .join(
            n.select(F.col("_id").alias("doc_b"), F.col("n_a").alias("_n_b")),
            "doc_b",
        )
        .filter(
            F.col("_n_b") >= F.expr(f"CAST(({threshold_pct} * n_a + 99) div 100 AS BIGINT)")
        )
        .select("doc_a", "doc_b")
    )
    sha = sh.select(F.col("_id").alias("doc_a"), "_sh")
    shb = sh.select(F.col("_id").alias("doc_b"), "_sh")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "_sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        inter.join(n.select(F.col("_id").alias("doc_a"), "n_a"), "doc_a")
        .filter(F.col("n_shared") * 100 >= threshold_pct * F.col("n_a"))
        .filter(F.col("n_a") >= min_shingles)
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_shared",
            F.expr("CAST((n_shared * 1000000) div n_a AS BIGINT)").alias(
                "containment_micro"
            ),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key_col: str,
    window: int,
    num_partitions: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995) —
    the fifth dedup/ER candidate tier, complementing the four above:
    rank every record along a sort key, and every pair within
    ``window`` ranks of each other is a candidate. Callers confirm with
    whatever match predicate fits (edit distance, exact field compare).

    HONEST RECALL CONTRACT: unlike the MinHash-band / SimHash-chunk /
    masked-position tiers (recall 1 by pigeonhole for their stated
    semantics), SNM recall is a HEURISTIC governed by the sort key and
    window size — a typo in the first character moves a record far from
    its duplicate in sort order and the pair is missed. That trade is
    the method's point (linear candidates, no explode factor) and is
    what multi-pass SNM (re-run under a second key) exists to patch;
    tests pin both a found pair and a deliberately-missed first-char
    case so the contract can't silently drift.

    Scale shape: the global sort is :func:`~.windows.distributed_global_rank`
    (range partition + broadcast offsets — never a single-task sort);
    pair generation is ONE equi-join on (rank + d) after a bounded
    explode of d ∈ [1, window-1] — shuffle on an integer key, no band
    join, no cartesian. (rank, rank+d) pairs are unique so no dedup
    pass is needed afterwards.

    Output: one row per candidate pair, lower rank first —
    ``a_<id>, a_<key>, b_<id>, b_<key>, rank_gap``.
    """
    if window < 2:
        raise ValueError("window must be >= 2 (a 1-window has no pairs)")
    from .windows import distributed_global_rank

    base = df.select(id_col, sort_key_col)
    ranked = distributed_global_rank(
        base,
        [(sort_key_col, False), (id_col, False)],
        rank_col="_snm_rnk",
        num_partitions=num_partitions,
    )
    ds = F.array([F.lit(d) for d in range(1, window)])
    left = ranked.select(
        F.col(id_col).alias("a_id"),
        F.col(sort_key_col).alias("a_key"),
        F.col("_snm_rnk").alias("_a_rnk"),
        F.explode(ds).alias("rank_gap"),
    ).withColumn("_b_rnk", F.col("_a_rnk") + F.col("rank_gap"))
    right = ranked.select(
        F.col(id_col).alias("b_id"),
        F.col(sort_key_col).alias("b_key"),
        F.col("_snm_rnk").alias("_b_rnk"),
    )
    return (
        left.join(right, "_b_rnk")
        .select("a_id", "a_key", "b_id", "b_key", F.col("rank_gap").cast("long").alias("rank_gap"))
    )


def containment_idf_rescore(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_pct: int = 80,
    min_shingles: int = 5,
    shingle_k: int = 3,
) -> DataFrame:
    """IDF-weighted re-scoring of the containment tier — the SEMANTIC
    mitigation for vocabulary-saturated corpora (the round-8 decade
    probe's Θ(N²/V) regime): a quote built from boilerplate shingles
    (high df → near-zero idf) scores low even when its raw containment
    clears the threshold, so curation can triage candidate quotes by
    how much RARE material they actually share.

    Candidates come from ``containment_prefix_pairs`` (recall 1 by the
    prefix-filter pigeonhole; see its docstring) — re-scoring touches
    only CONFIRMED pairs, so the extra cost is one linear shingle scan
    plus joins bounded by |pairs|·n_a. Per shingle the weight is
    idf_micro = round(ln(n_docs / df) · 10⁶) snapped to an integer
    BEFORE any sum (the JSD/entropy cross-engine float scheme: ln may
    differ in the last ulp between engines, the per-cell micro snap
    absorbs it and every downstream sum is exact BIGINT). The weighted
    score is (Σ_shared idf_micro · 10⁶) div (Σ_a idf_micro); a doc
    whose every shingle appears in every doc has weight 0 — both
    engines emit NULL (guarded division).
    """
    # ONE shingle-table materialization shared by candidate generation
    # and re-scoring (the round-9 self-review finding): build the
    # checkpointed posting table once, thread it into
    # containment_prefix_pairs, and score over the same object. n_docs
    # stays distributed as a broadcast 1-row frame instead of a
    # blocking driver count.
    sh = _containment_shingles(df, id_col, text_col, shingle_k)
    pairs = containment_prefix_pairs(
        df, id_col, text_col,
        threshold_pct=threshold_pct,
        min_shingles=min_shingles,
        shingle_k=shingle_k,
        shingles=sh,
    ).select("doc_a", "doc_b", "n_a", "n_shared", "containment_micro")
    nd = sh.select("_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_nd")
    )
    weighted = (
        sh.join(
            sh.groupBy("_sh").agg(F.count(F.lit(1)).cast("long").alias("_df")),
            "_sh",
        )
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "_w",
            F.round(
                F.log(F.col("_nd").cast("double") / F.col("_df").cast("double"))
                * 1000000
            ).cast("long"),
        )
    )
    tot_w = weighted.groupBy("_id").agg(F.sum("_w").cast("long").alias("_wa"))
    shared_w = (
        pairs.select("doc_a", "doc_b")
        .join(weighted.select(F.col("_id").alias("doc_a"), "_sh", "_w"), "doc_a")
        .join(
            sh.select(F.col("_id").alias("doc_b"), "_sh"),
            ["doc_b", "_sh"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("_w").cast("long").alias("_ws"))
    )
    return (
        pairs.join(shared_w, ["doc_a", "doc_b"])
        .join(tot_w.select(F.col("_id").alias("doc_a"), "_wa"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_shared",
            "containment_micro",
            F.when(
                F.col("_wa") > 0,
                F.expr("CAST((_ws * 1000000) div _wa AS BIGINT)"),
            ).alias("idf_containment_micro"),
        )
    )
