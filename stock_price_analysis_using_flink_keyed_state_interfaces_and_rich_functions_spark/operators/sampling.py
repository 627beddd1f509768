"""Deterministic hash-based sampling — the data-mixture primitive of a
training-data pipeline.

``df.sample()`` is non-deterministic across partitionings/retries and
not reproducible between engines, which makes a sampled corpus
impossible to audit. These operators decide membership from a hash of
the ROW KEY alone: the same row is kept or dropped regardless of
partition layout, executor count, task retries, or engine. Sampling a
100 TB corpus is then an embarrassingly parallel scan — no shuffle, no
state, fully pushdown-friendly — and any engine that can compute md5
reproduces the exact sample (the DuckDB oracle does).

Mechanism: the first 8 hex chars of ``md5(key₁|key₂|…|seed)`` are
uniform over 16^8 values; a row is kept iff that substring is
lexicographically below ``hex(rate · 16^8)``. Fixed-length lowercase
hex compares identically as string and as number, so BOTH engines
evaluate the predicate with plain string comparison — no
engine-specific hex→int conversion anywhere. Rate resolution is
1/16^8 ≈ 6e-10.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "global_shuffle",
    "hash_bucket_hex",
    "hash_exact_per_stratum",
    "hash_sample",
    "hash_sample_stratified",
    "hash_split",
    "hash_sample_by_rate",
    "temperature_mixture_sample",
    "weighted_sample_topk",
    "waterfill_allocation",
    "rate_to_hex",
    "rate_micro_to_hex",
]

_HEX_SPACE = 16**8


def rate_to_hex(rate: float) -> str:
    """Lowercase hex threshold for a keep-rate in [0, 1]. rate=1 maps
    to "g", which is > every hex char, so `bucket < threshold` keeps
    all rows (a "ffffffff" threshold would drop hash-maximal keys)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), "08x")



def rate_micro_to_hex(rate_micro_col: str) -> Column:
    """Hex keep-threshold from an integer micro-unit rate column in
    [0, 10^6] — the determinism-critical core of the micro-unit
    sampling contract, shared by every dynamic-rate sampler (and
    replayed verbatim by their SQL oracles as
    ``printf('%08x', r * 4294967296 // 1000000)``). BIGINT `div` only:
    a float `/` + floor can land one off near integer boundaries and
    silently diverge from the oracle's integer `//`."""
    return F.format_string(
        "%08x", F.expr(f"{rate_micro_col} * 4294967296L div 1000000L")
    )


def hash_bucket_hex(key_cols: Sequence[str], seed: int = 42) -> Column:
    """The 8-hex-char uniform bucket of a row key. Exposed so callers
    can build custom split logic (e.g. train/val/test partitioning by
    disjoint hex ranges) on the same portable primitive.

    Keys are LENGTH-PREFIXED per column ('3:abc', NULL → 'n:') before
    hashing — self-delimiting, so NULLs stay distinct from empty/other
    columns and no delimiter character inside a value can make two
    different multi-column keys collide (concat_ws would silently drop
    NULLs and let embedded delimiters alias).

    Engine-portability caveat: int/string keys render identically in
    every engine; FLOAT keys do not (Spark '1.0E-7' vs DuckDB '1e-07')
    — cast floats to a fixed-precision decimal or string yourself if a
    float must be part of the sampling key."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    tokens = []
    for c in key_cols:
        s = F.col(c).cast("string")
        tokens.append(
            F.when(s.isNull(), F.lit("n:")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.substring(F.md5(F.concat(*tokens, F.lit(str(seed)))), 1, 8)


def hash_sample(df: DataFrame, rate: float, key_cols: Sequence[str], seed: int = 42) -> DataFrame:
    """Keep ~``rate`` of rows, decided per-row by key hash. Deterministic
    under repartitioning, retries, and across engines."""
    return df.filter(hash_bucket_hex(key_cols, seed) < F.lit(rate_to_hex(rate)))


def hash_split(
    df: DataFrame,
    splits: Mapping[str, float],
    key_cols: Sequence[str],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Disjoint train/val/test partitioning: every row gets exactly one
    split label, decided by which hex range its key bucket falls in.
    Weights must sum to 1 (±1e-9). Deterministic and engine-portable
    like :func:`hash_sample`; a row can never land in two splits, and
    re-running with more data never moves an existing key between
    splits — the property that keeps eval sets uncontaminated as the
    corpus grows.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket_hex(key_cols, seed)
    expr = None
    cum = 0.0
    items = sorted(splits.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < F.lit(rate_to_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def hash_sample_stratified(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_cols: Sequence[str],
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep-rates — the corpus-mixture operator (e.g.
    upsample low-resource languages, downsample crawl dumps). A row in
    stratum s survives iff bucket < hex(rates[s]); unlisted strata get
    ``default_rate``. Still a pure scan: the stratum threshold is a
    CASE expression, no shuffle, no per-stratum pass."""
    threshold = F.lit(rate_to_hex(default_rate))
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(rate_to_hex(rate))).otherwise(threshold)
    return df.filter(hash_bucket_hex(key_cols, seed) < threshold)


def temperature_mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_cols: Sequence[str],
    target_rows: int,
    alpha: float = 0.75,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted corpus mixture (the multilingual-pretraining
    standard, e.g. mBERT/XLM-R exponent-smoothed sampling): stratum s
    gets probability mass ∝ n_s^alpha, so low-resource strata are
    upsampled relative to their natural share as alpha → 0. Per-stratum
    keep-rate is r_s = min(1, target_rows · n_s^alpha / Σ n^alpha / n_s);
    membership is then decided by the same deterministic key hash as
    :func:`hash_sample` — reproducible across engines and retries.

    Unlike :func:`hash_sample_stratified` the rates are computed FROM
    the data, entirely in-plan: stratum counts are a tiny aggregate
    (cardinality = #strata) broadcast back onto the scan — no
    ``collect()``, so the operator composes into a single lazy plan and
    survives a 100 TB corpus (the scan stays embarrassingly parallel;
    the only shuffle is the #strata-row count aggregate).

    Rows with a NULL stratum are dropped (the rates join is
    NULL-unsafe, matching SQL grouping semantics); map NULLs to a
    sentinel stratum first if they must participate.

    Determinism contract: the float rate is snapped to integer
    micro-units (round(r·1e6) AS BIGINT) and the hex keep-threshold is
    derived with pure BIGINT arithmetic (r_micro · 2³² div 10⁶ →
    '%08x'), so engines agree exactly once they agree on r_micro; the
    emitted ``keep_rate_micro`` column makes the rate auditable.
    """
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    # counts feeds both the normalizer and the rates join; checkpoint
    # the #strata-row aggregate so the corpus is scanned once for it,
    # not once per consumer (eager=False keeps construction lazy).
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").cast("long").alias("_n"))
        .localCheckpoint(eager=False)
    )
    z = counts.agg(F.sum(F.pow(F.col("_n").cast("double"), F.lit(alpha))).alias("_z"))
    rates = (
        counts.crossJoin(F.broadcast(z))
        .withColumn(
            "_r",
            F.least(
                F.lit(float(target_rows))
                * F.pow(F.col("_n").cast("double"), F.lit(alpha))
                / F.col("_z")
                / F.col("_n"),
                F.lit(1.0),
            ),
        )
        .withColumn("keep_rate_micro", F.round(F.col("_r") * 1e6).cast("long"))
        .withColumn("_thr_hex", rate_micro_to_hex("keep_rate_micro"))
        .select(strata_col, "keep_rate_micro", "_thr_hex")
    )
    bucket = hash_bucket_hex(key_cols, seed)
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter((F.col("keep_rate_micro") >= 1000000) | (bucket < F.col("_thr_hex")))
        .drop("_thr_hex")
    )


def hash_sample_by_rate(
    df: DataFrame,
    rate_micro_col: str | Column,
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Per-ROW keep-rate sampling: each row survives with its own
    probability, given as integer micro-units in [0, 1_000_000] (the
    soft/importance-sampling primitive — e.g. keep probability ∝
    quality-score², FineWeb-style, with the rate derived in exact
    integer arithmetic so every engine agrees on it bit-for-bit).

    Still a pure deterministic scan: the row's hash bucket is compared
    against a hex threshold derived from its own rate with BIGINT-only
    math (rate·2³² div 10⁶ → '%08x'). Rows with rate ≥ 10⁶ are kept
    unconditionally; NULL/negative rates drop the row (explicit zero).
    """
    if "_rate_micro" in df.columns:
        raise ValueError("hash_sample_by_rate: '_rate_micro' column name is reserved")
    r = F.col(rate_micro_col) if isinstance(rate_micro_col, str) else rate_micro_col
    with_rate = df.withColumn("_rate_micro", F.coalesce(r.cast("long"), F.lit(0).cast("long")))
    thr_hex = rate_micro_to_hex("_rate_micro")
    bucket = hash_bucket_hex(key_cols, seed)
    return with_rate.filter(
        (F.col("_rate_micro") >= 1000000) | ((F.col("_rate_micro") > 0) & (bucket < thr_hex))
    ).drop("_rate_micro")


def _hex_char_val(col: Column) -> Column:
    """Value of one lowercase hex digit, via ascii arithmetic (portable:
    every engine has ascii/substr; no conv()/strtol dependency)."""
    return F.when(col <= F.lit("9"), F.ascii(col) - 48).otherwise(F.ascii(col) - 87)


def global_shuffle(
    df: DataFrame,
    key_cols: Sequence[str],
    num_shards: int,
    seed: int = 42,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle-and-shard: the training-order
    assignment step of a data pipeline (every epoch reads the corpus in
    a fixed pseudorandom order, resumable and reproducible across
    retries, engines, and partition layouts).

    Two-phase so there is NEVER a global sort or a single-partition
    window: (1) each row's shuffle key is ``md5(length-prefixed keys,
    seed)``; its shard is the first two hex digits mod ``num_shards`` —
    a pure scan; (2) its position within the shard is a ``row_number``
    over ``Window.partitionBy(shard)`` ordered by (hash, keys) — |shards|
    independent sorts. Training readers consume shard files in
    ``(shard, pos)`` order. At 100 TB, set ``num_shards`` to a multiple
    of the executor count: the per-shard sorts are the only exchange and
    each is 1/num_shards of the data. The (hash, keys) ordering is total
    (keys are unique), so output is engine-exact — no float, no ties.

    num_shards must be in [1, 256] (two hex digits of entropy route the
    shard; more shards than 256 would alias).
    """
    if not 1 <= num_shards <= 256:
        raise ValueError(f"num_shards must be in [1, 256], got {num_shards}")
    from pyspark.sql import Window

    keys = list(key_cols)
    h = _full_md5(keys, seed)
    shard = (
        (_hex_char_val(F.substring(h, 1, 1)) * 16 + _hex_char_val(F.substring(h, 2, 1)))
        % num_shards
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_shuffle_hex"), *[F.col(c) for c in keys])
    return (
        df.withColumn("_shuffle_hex", h)
        .withColumn(shard_col, shard.cast("int"))
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("_shuffle_hex")
    )


def _full_md5(key_cols: Sequence[str], seed: int) -> Column:
    """Full 32-hex md5 of the length-prefixed key encoding — the same
    injective encoding as hash_bucket_hex, un-truncated (the shuffle
    ordering wants all 128 bits so prefix collisions can't create
    engine-visible ties before the key tiebreaker)."""
    tokens = []
    for c in key_cols:
        s = F.col(c).cast("string")
        tokens.append(
            F.when(s.isNull(), F.lit("n:")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat(*tokens, F.lit(str(seed))))


def hash_exact_per_stratum(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Exactly-n-per-stratum sampling (e.g. "500 eval docs per
    language"): rank each stratum's rows by their keyed md5 and keep
    the first ``n_per_stratum`` — a deterministic uniform draw WITHOUT
    the rate-sampler's binomial count jitter, reproducible across
    engines/retries like every hash sampler here. Strata smaller than
    n keep every row.

    Scale: one exchange on the stratum column; each stratum sorts
    independently. A single mega-stratum serializes its sort through
    one task — the same per-key ceiling as any windowed top-n; if a
    stratum can exceed an executor's sort budget, pre-thin it with
    :func:`hash_sample` at a rate that still overshoots n (the hash
    ordering is preserved under prefiltering: the kept set of the
    thinned stream equals the kept set of the full stream whenever the
    thinning rate keeps ≥ n rows).
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _full_md5(key_cols, seed), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= n_per_stratum)
        .drop("_srn")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    key_cols: Sequence[str],
    k: int,
    seed: int = 42,
    score_col: str = "ares_micro",
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-Res scheme every quality-weighted corpus
    subsample wants: each row gets key u^(1/w) for a uniform u and
    weight w, and the k largest keys are an exact weighted sample
    (inclusion probability ∝ w, no replacement). Monotone transform:
    maximizing u^(1/w) ≡ maximizing ln(u)/w, which avoids pow() — the
    score is ln(u)/w in integer MICRO-units.

    Determinism & portability (the hash_sample/BM25 precedents
    combined): u = (md5-bucket + 1) / 2³² — the bucket is the same
    length-prefixed md5 primitive every sampler here uses, so u is an
    EXACT dyadic rational in (0, 1] (double-representable, identical in
    both engines); ln of an identical double and one division by the
    (positive) weight evaluate identically; round(·1e6) snaps the
    result to a BIGINT both engines agree on. Same seed + same corpus
    ⇒ the same sample forever, on any cluster size.

    Rows with NULL or non-positive weight are EXCLUDED (a zero weight
    has inclusion probability 0; negative weights are a caller bug
    surfaced by the count, not silently clamped). Top-k rides
    ``topk.ranked_top_n`` — TakeOrderedAndProject + window-free rank,
    no single-task sort at any corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .topk import ranked_top_n

    bucket_int = F.conv(hash_bucket_hex(key_cols, seed), 16, 10).cast("long")
    u = (bucket_int + 1).cast("double") / F.lit(float(_HEX_SPACE)).cast("double")
    w = F.col(weight_col).cast("double")
    scored = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(score_col, F.round(F.log(u) / w * 1e6).cast("long"))
    )
    first_key = key_cols[0]
    return ranked_top_n(
        scored, [(score_col, True), (first_key, False)], k, rank_col=rank_col
    )


def waterfill_allocation(
    avail: DataFrame,
    key_col: str,
    avail_col: str,
    budget: int,
    out_col: str = "alloc",
) -> DataFrame:
    """Water-filling budget allocation: split an integer ``budget``
    across keys as evenly as possible without exceeding any key's
    availability — the max-min-fair mixture planner for "give every
    source an equal token share, capped at what it has, redistribute
    the slack" (the standard alternative to proportional/temperature
    mixing when small sources must not be over-asked).

    Closed form, no iteration: with keys sorted by availability
    ascending (key tiebreak), a key saturates iff
    ``a_i·(n−i+1) ≤ B − prefix_{i−1}`` — once one key fails this, all
    larger keys fail it too, so the water level freezes at
    θ = (B − prefix_k) div (n−k) for the n−k unsaturated keys, with the
    remainder distributed +1 to the first ``(B − prefix_k) mod (n−k)``
    of them in the same order. Allocations sum to EXACTLY
    min(budget, Σ avail) — pure integer arithmetic, no float.

    Scale shape: the prefix sums ride
    :func:`~..windows.distributed_running_sum` (no single-task sort
    over the key aggregate); the freeze point and totals are broadcast
    one-row aggregates. All joins are broadcasts of O(1) frames.
    """
    from .windows import distributed_running_sum

    b = int(budget)
    ranked = distributed_running_sum(
        avail.select(F.col(key_col), F.col(avail_col).cast("long").alias("_a")),
        [("_a", False), (key_col, False)],
        "_a",
        out_col="_run",
        rank_col="_i",
    )
    n_row = ranked.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    cond = ranked.crossJoin(F.broadcast(n_row)).withColumn(
        "_sat",
        F.when(
            F.col("_a") * (F.col("_n") - F.col("_i") + 1)
            <= F.lit(b) - (F.col("_run") - F.col("_a")),
            1,
        ).otherwise(0),
    )
    kv = cond.agg(
        F.coalesce(
            F.min(F.when(F.col("_sat") == 0, F.col("_i"))) - 1, F.max("_i")
        )
        .cast("long")
        .alias("_k")
    )
    run_k = (
        ranked.join(F.broadcast(kv), ranked["_i"] == kv["_k"])
        .agg(F.max("_run").cast("long").alias("_run_k"))
    )
    theta_base = (
        kv.crossJoin(n_row)
        .crossJoin(run_k)
        .select(
            "_k",
            "_n",
            F.coalesce(F.col("_run_k"), F.lit(0)).alias("_run_k"),
        )
    )
    return (
        cond.drop("_n")
        .crossJoin(F.broadcast(theta_base))
        .select(
            F.col(key_col),
            F.col("_a").alias(avail_col),
            F.when(F.col("_i") <= F.col("_k"), F.col("_a"))
            .otherwise(
                F.expr(f"CAST(({b} - _run_k) div (_n - _k) AS BIGINT)")
                + F.when(
                    F.col("_i") - F.col("_k")
                    <= F.expr(f"CAST(({b} - _run_k) % (_n - _k) AS BIGINT)"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(out_col),
        )
    )
