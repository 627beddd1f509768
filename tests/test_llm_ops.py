"""Tests for the LLM-data operator families: dedup (exact, Jaccard,
MinHash-LSH, SimHash), similarity search (brute-force + hyperplane LSH),
text analysis, and multimodal plumbing — handcrafted ground truths plus
plan assertions that no tier ever builds a cartesian product.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark import plans
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
    attach_payload,
    brute_force_topk,
    cosine_dup_pairs,
    decode_features,
    exact_dedup,
    exact_dup_groups,
    fingerprint_md5,
    fingerprint_ngram_min,
    frame_sample,
    ivf_topk,
    language_id,
    lsh_bucketed_topk,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    payload_metadata,
    simhash,
    simhash_pairs,
    with_quality_score,
    with_text_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup of 1
        (4, "completely different text about spark engines"),
        (5, "el gato es muy bonito y la casa es grande"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------------- dedup

def test_exact_dedup_and_groups(spark, docs):
    kept = exact_dedup(docs, ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4, 5]  # min id survives
    groups = exact_dup_groups(docs, ["text"], "doc_id").collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2 and groups[0]["survivor_id"] == 1


def test_ngram_jaccard_ground_truth(spark, docs):
    out = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, shingle_k=1)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(1, 2)] == 1.0
    # docs 1 and 3: 8 distinct tokens each ("the" repeats), 7 shared → 7/9
    assert got[(1, 3)] == round(7 / 9, 4)
    assert (1, 4) not in got
    plans.assert_no_cartesian(out)


def test_minhash_agrees_with_jaccard(spark, docs):
    out = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5, num_hashes=64, num_bands=16, shingle_k=1)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out.collect()}
    assert got[(1, 2)] == 1.0          # identical docs always collide & estimate 1.0
    assert (1, 3) in got               # 7/9 true Jaccard → well above banding threshold
    assert abs(got[(1, 3)] - 7 / 9) < 0.25  # estimator tolerance at 64 hashes
    assert (1, 4) not in got
    plans.assert_no_cartesian(out)


def test_minhash_signature_shape_and_determinism(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=32, shingle_k=1)
    rows = {r["doc_id"]: r["signature"] for r in sigs.collect()}
    assert all(len(s) == 32 for s in rows.values())
    assert rows[1] == rows[2]          # identical text → identical signature
    rows2 = {r["doc_id"]: r["signature"] for r in
             minhash_signatures(docs, "doc_id", "text", num_hashes=32, shingle_k=1).collect()}
    assert rows == rows2               # seeded → run-to-run deterministic


def test_simhash_pairs(spark, docs):
    sigs = simhash(docs, "doc_id", "text", bits=32)
    vals = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert vals[1] == vals[2]
    out = simhash_pairs(sigs, "doc_id", max_hamming=3, bits=32)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert got[(1, 2)] == 0
    assert all(h <= 3 for h in got.values())
    plans.assert_no_cartesian(out)


def test_simhash_portable_matches_python_md5(spark, docs):
    """Portable mode must reproduce the reference construction exactly:
    token hash = first 8 md5 hex chars as uint32 (what the DuckDB
    oracle recomputes), vote, sign, assemble."""
    import hashlib
    import re as _re

    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash(docs, "doc_id", "text", bits=32, portable=True).collect()}
    for row in docs.collect():
        toks = _re.split(r"\s+", row["text"].strip())
        votes = [0] * 32
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for b in range(32):
                votes[b] += 1 if (h >> b) & 1 else -1
        expect = sum((1 << b) for b in range(32) if votes[b] > 0)
        assert sigs[row["doc_id"]] == expect
    with pytest.raises(ValueError):
        simhash(docs, "doc_id", "text", bits=48, portable=True)


# ------------------------------------------------------------ similarity

@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0]),   # nearly parallel to 1
        (3, [0.0, 1.0, 0.0]),    # orthogonal to 1
        (4, [-1.0, 0.0, 0.0]),   # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(spark, vectors):
    out = brute_force_topk(vectors, vectors.filter(F.col("vec_id") == 1), k=2)
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    assert [r["neighbor_id"] for r in rows] == [2, 3]
    assert rows[0]["cosine"] == 1.0    # rounds to 1.0 at 4 dp
    assert rows[1]["cosine"] == 0.0


def test_cosine_dup_pairs_exact_vs_lsh(spark, vectors):
    exact = cosine_dup_pairs(vectors, threshold=0.99, exact=True)
    assert {(r["id_a"], r["id_b"]) for r in exact.collect()} == {(1, 2)}
    approx = cosine_dup_pairs(vectors, threshold=0.99, num_planes=8, exact=False)
    assert {(r["id_a"], r["id_b"]) for r in approx.collect()} == {(1, 2)}
    plans.assert_no_cartesian(approx)
    # multi-table OR construction: recall can only grow with tables, and
    # every reported pair must be a true pair (subset of exact)
    multi = cosine_dup_pairs(vectors, threshold=0.99, num_planes=4, num_tables=4, exact=False)
    got = {(r["id_a"], r["id_b"]) for r in multi.collect()}
    assert got == {(1, 2)}
    plans.assert_no_cartesian(multi)


def test_lsh_topk_subset_of_bruteforce(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    brute = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(vectors, q, k=3).collect()}
    lsh = lsh_bucketed_topk(vectors, q, k=3, num_planes=4)
    got = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
    assert got <= brute | {(1, 3), (1, 4)}  # candidates are a bucket-restricted subset
    assert (1, 2) in got                    # near-identical vector shares every sign bit


def test_ivf_topk_full_probe_equals_bruteforce(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    brute = {(r["neighbor_id"], r["cosine"], r["rk"]) for r in brute_force_topk(vectors, q, k=3).collect()}
    # probing every cell makes IVF exact regardless of centroid choice
    full = ivf_topk(vectors, q, k=3, num_cells=2, nprobe=2)
    assert {(r["neighbor_id"], r["cosine"], r["rk"]) for r in full.collect()} == brute
    plans.assert_no_cartesian(full)


def test_ivf_topk_lloyd_refinement_stays_exact_under_full_probe(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    brute = {(r["neighbor_id"], r["cosine"], r["rk"]) for r in brute_force_topk(vectors, q, k=3).collect()}
    # Lloyd rounds move the codebook but full probing is exact for ANY
    # codebook — refinement must never change a full-probe result
    refined = ivf_topk(vectors, q, k=3, num_cells=2, nprobe=2, lloyd_iters=2)
    assert {(r["neighbor_id"], r["cosine"], r["rk"]) for r in refined.collect()} == brute


def test_ivf_topk_partial_probe_subset(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    brute = {r["neighbor_id"] for r in brute_force_topk(vectors, q, k=3).collect()}
    part = ivf_topk(vectors, q, k=3, num_cells=4, nprobe=1)
    rows = part.collect()
    assert {r["neighbor_id"] for r in rows} <= brute | {3, 4}
    assert all(r["query_id"] == 1 for r in rows)
    with pytest.raises(ValueError):
        ivf_topk(vectors, q, num_cells=4, nprobe=5)


# ------------------------------------------------------------------ text

def test_subword_count_bpe_classes(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        subword_count,
    )

    df = spark.createDataFrame(
        [(1, "don't stop!"), (2, "abc123"), (3, ""), (4, None), (5, "a.b.c")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", subword_count("text").alias("n")).collect()}
    # don/'/t/stop/! = 5; abc/123 = 2; a/./b/./c = 5
    assert got == {1: 5, 2: 2, 3: 0, 4: 0, 5: 5}


def test_text_stats_and_quality(spark):
    df = spark.createDataFrame([(1, "ab cd!! 12"), (2, ""), (3, "   ")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_quality_score(with_text_stats(df, "text").drop(
        "n_tokens", "n_chars_measured", "avg_token_len", "punct_ratio", "digit_ratio", "ws_ratio"
    ), "text").collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 3
    assert r1["punct_ratio"] == 0.2       # "!!" of 10 chars
    assert r1["digit_ratio"] == 0.2       # "12" of 10 chars
    assert out[2]["n_tokens"] == 0 and out[3]["n_tokens"] == 0


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs, "text").collect()}
    assert out[1] == "en" and out[5] == "es"


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "hello   world"), (2, "hello world"), (3, "goodbye world")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint_md5(df, "text").collect()}
    assert fp[1] == fp[2]              # whitespace-normalized
    assert fp[1] != fp[3]
    ng = {r["doc_id"]: r["ngram_fingerprint"] for r in fingerprint_ngram_min(df, "text", k=4).collect()}
    assert ng[2] is not None and len(ng[2]) == 32


# ------------------------------------------------------------ multimodal

def test_payload_metadata(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    out = payload_metadata(attach_payload(df, "text")).collect()[0]
    assert out["byte_len"] == 3
    assert out["content_sha256"] == hashlib.sha256(b"abc").hexdigest()
    assert out["mime"] == "application/octet-stream"


def test_decode_features_deterministic_fake(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r["features"] for r in decode_features(attach_payload(df, "text")).collect()}
    assert len(out[1]) == 16 and abs(sum(out[1]) - 1.0) < 1e-6
    assert sum(out[2]) == 0.0          # empty payload → zero histogram


def test_frame_sample_shape(spark):
    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    rows = sorted(frame_sample(attach_payload(df, "text"), n_frames=4).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["frame_offset"] for r in rows] == [0, 2, 4, 6]
    assert all(r["frame_len"] == 2 for r in rows)
    assert rows[0]["frame_sha256"] == hashlib.sha256(b"ab").hexdigest()


def test_multi_table_lsh_subset_and_recall_on_testdata(spark):
    """On the driver's embeddings table: every LSH pair is a true pair
    (soundness — same threshold, same scorer) and multi-table recall
    clears a floor. Deterministic: seeded planes, fixed data."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_table,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs(emb, "vec_id", "embedding", threshold=0.4, exact=True).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.4, num_planes=6, num_tables=8, exact=False
        ).collect()
    }
    assert lsh <= exact
    assert exact  # the corpus does contain 0.4-cosine pairs
    assert len(lsh) / len(exact) >= 0.3  # AND-OR recall floor, seeds fixed


def test_resize_payload_contract(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        resize_payload,
    )

    df = spark.createDataFrame([(1, "hello world"), (2, "")], "doc_id long, text string")
    out = resize_payload(attach_payload(df, "text"), "doc_id", "payload", target_w=4, target_h=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(len(r["payload"]) == 8 and r["width"] == 4 and r["height"] == 2 for r in rows.values())
    assert bytes(rows[2]["payload"]) == bytes(8)  # empty input → zero bytes
    # deterministic: same input → same resized bytes
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_payload(
        attach_payload(df, "text"), "doc_id", "payload", target_w=4, target_h=2
    ).collect()}
    assert again == {k: bytes(v["payload"]) for k, v in rows.items()}
    with pytest.raises(ValueError):
        resize_payload(attach_payload(df, "text"), target_w=0)


# --------------------------------------------- dup clusters / sampling /
# repetition / contamination (pipeline ops)

def test_dup_clusters_transitive_chain(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        dup_clusters,
    )

    # chain 1-2-3-4 (one component; 1~4 never directly paired) + island 8-9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (8, 9)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_dup_clusters_empty_and_nonconvergence(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        dup_clusters,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(empty).count() == 0
    # a 5-node path needs >1 hash-min round; max_iter=1 must raise, not
    # return a silently partial clustering
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        dup_clusters(path, max_iter=1)


def test_hash_sample_deterministic_and_stratified(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        hash_sample,
        hash_sample_stratified,
    )

    df = spark.range(0, 2000).withColumn(
        "stratum", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    )
    s1 = {r["id"] for r in hash_sample(df, 0.5, ["id"], seed=3).collect()}
    # same sample regardless of partitioning
    s2 = {r["id"] for r in hash_sample(df.repartition(17), 0.5, ["id"], seed=3).collect()}
    assert s1 == s2
    assert 0.4 < len(s1) / 2000 < 0.6
    # different seed -> different sample
    s3 = {r["id"] for r in hash_sample(df, 0.5, ["id"], seed=4).collect()}
    assert s1 != s3
    assert {r["id"] for r in hash_sample(df, 1.0, ["id"]).collect()} == set(range(2000))
    assert hash_sample(df, 0.0, ["id"]).count() == 0

    strat = hash_sample_stratified(df, "stratum", {"a": 0.8}, ["id"], default_rate=0.1)
    by = {r["stratum"]: r["n"] for r in strat.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert 0.7 < by["a"] / 1000 < 0.9
    assert 0.05 < by["b"] / 1000 < 0.2
    # stratified membership == per-stratum plain sampling (same key hash)
    only_a = {r["id"] for r in hash_sample(df.filter("stratum = 'a'"), 0.8, ["id"]).collect()}
    assert {r["id"] for r in strat.filter("stratum = 'a'").collect()} == only_a


def test_repetition_stats_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        with_repetition_stats,
    )

    rows = [
        (1, "a b a b a"),      # 5 tokens, 2 distinct: dup 3/5; bigrams [ab,ba,ab,ba] top 2/4
        (2, "x y z"),          # no repeats: dup 0; bigrams [xy,yz] top 1/2
        (3, "solo"),           # 1 token: no bigrams -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert got[1]["dup_token_frac"] == 0.6 and got[1]["top_bigram_frac"] == 0.5
    assert got[2]["dup_token_frac"] == 0.0 and got[2]["top_bigram_frac"] == 0.5
    assert got[3]["dup_token_frac"] == 0.0 and got[3]["top_bigram_frac"] == 0.0


def test_contamination_hits_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        contamination_hits,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),   # shares 3-grams: "the quick brown", "quick brown fox"
            (2, "a completely unrelated doc"),   # no shared 3-gram
            (3, "quick brown fox jumps high"),   # shares "quick brown fox", "brown fox jumps"
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_shared_shingles"] for r in contamination_hits(corpus, bench).collect()}
    assert got == {1: 2, 3: 2}  # doc 2 absent: inner join keeps hits only


def test_contamination_bloom_no_false_negatives(spark):
    """The Bloom path must flag every doc the exact join flags, with
    per-doc counts >= the exact shared-shingle counts (FPs can only
    inflate), and a map-side plan: no join, no Exchange on the corpus."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark import plans
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        contamination_bloom,
        contamination_hits,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps"), (101, "large language models memorize data")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),
            (2, "a completely unrelated doc"),
            (3, "quick brown fox jumps high"),
            (4, "language models memorize data easily"),
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )
    exact = {r["doc_id"]: r["n_shared_shingles"] for r in contamination_hits(corpus, bench).collect()}
    bloom_df = contamination_bloom(corpus, bench, fp_rate=1e-4)
    bloom = {r["doc_id"]: r["n_bloom_hits"] for r in bloom_df.collect()}
    for did, n in exact.items():
        assert bloom.get(did, 0) >= n, (did, bloom.get(did), n)
    s = plans.explain_str(bloom_df)
    assert "Join" not in s and "Exchange" not in s, s


def test_contamination_bloom_empty_benchmark(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        contamination_bloom,
    )

    bench = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
    assert contamination_bloom(corpus, bench).count() == 0


def test_hash_split_disjoint_exhaustive(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        hash_sample,
        hash_split,
    )

    df = spark.range(0, 3000)
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, ["id"], seed=5)
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == 3000  # every row exactly one label
    assert 0.75 < by["train"] / 3000 < 0.85
    assert 0.06 < by["val"] / 3000 < 0.14
    assert 0.06 < by["test"] / 3000 < 0.14
    # stable under growth: the same keys keep their split in a superset
    small = {r["id"]: r["split"] for r in hash_split(
        spark.range(0, 1000), {"train": 0.8, "val": 0.1, "test": 0.1}, ["id"], seed=5
    ).collect()}
    big = {r["id"]: r["split"] for r in out.collect()}
    assert all(big[k] == v for k, v in small.items())
    with pytest.raises(ValueError):
        hash_split(df, {"train": 0.5, "val": 0.1}, ["id"])


def test_embedding_centroids_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        embedding_centroids,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0]),
            (0, [3.0, 4.0]),
            (1, [10.0, -10.0]),
        ],
        "label int, embedding array<float>",
    )
    got = {(r["label"], r["pos"]): r["centroid"] for r in embedding_centroids(df, "label").collect()}
    assert got == {(0, 0): 2.0, (0, 1): 3.0, (1, 0): 10.0, (1, 1): -10.0}


def test_similarity_udfs_tolerate_null_embeddings(spark):
    """A NULL embedding must degrade to NULL output (matching the
    Catalyst expr forms) in every numpy-batched similarity UDF — not
    crash the task."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.similarity import (
        cosine_pairs_udf,
        hyperplane_signature_udf,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, None, [1.0, 0.0]), (3, [0.0, 1.0], None)],
        "id long, a array<double>, b array<double>",
    )
    cos = {r["id"]: r["c"] for r in df.select("id", cosine_pairs_udf()(F.col("a"), F.col("b")).alias("c")).collect()}
    assert cos[1] == 1.0 and cos[2] is None and cos[3] is None
    sig = {r["id"]: r["s"] for r in df.select("id", hyperplane_signature_udf(4)(F.col("a")).alias("s")).collect()}
    assert sig[2] is None and sig[1] is not None


def test_hyperplane_signature_dim_validation(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.similarity import (
        hyperplane_signature_udf,
    )

    df = spark.createDataFrame([(1, [1.0, 0.0, 0.0])], "id long, v array<double>")
    out = df.select(hyperplane_signature_udf(4, dim=2)(F.col("v")).alias("s"))
    with pytest.raises(Exception, match="dim mismatch"):
        out.collect()


def test_null_text_quality_and_dedup_digest(spark):
    """NULL text must score like empty text (0.5), never a perfect 1.0
    (least() skips NULLs — the bug class this pins); and the content
    digest must keep NULL, empty, and boundary-shifted contents distinct."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        token_count,
    )

    df = spark.createDataFrame([(1, None), (2, ""), (3, "plain words here")], "doc_id long, text string")
    got = {r["doc_id"]: r["quality_score"] for r in with_quality_score(df, "text").collect()}
    assert got[1] == 0.5 and got[2] == 0.5 and got[3] > 0.5
    counts = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert counts[1] == 0 and counts[2] == 0 and counts[3] == 3

    two_col = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc"), (3, "x", None), (4, None, "x"), (5, "x", ""), (6, "x", None)],
        "id long, t string, b string",
    )
    kept = sorted(r["id"] for r in exact_dedup(two_col, ["t", "b"], "id").collect())
    assert kept == [1, 2, 3, 4, 5]  # only (3,6) truly duplicate


def test_minhash_band_validation(spark, docs):
    with pytest.raises(ValueError, match="num_bands"):
        minhash_dedup_pairs(docs, "doc_id", "text", num_hashes=16, num_bands=32)
    with pytest.raises(ValueError, match="divisible"):
        minhash_dedup_pairs(docs, "doc_id", "text", num_hashes=30, num_bands=16)


def test_minhash_verified_equals_exact_tier(spark, docs):
    """LSH candidates + exact-Jaccard confirm must reproduce the exact
    postings-join tier exactly (same pairs, same jaccard values) when
    banding is tuned for recall 1 — the property the driver's oracle
    row (dedup_minhash_verified) hash-checks at sf0.01."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        minhash_verified_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, shingle_k=1).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_verified_pairs(
            docs, "doc_id", "text", threshold=0.5, num_hashes=128, num_bands=64, shingle_k=1
        ).collect()
    }
    assert got == exact and len(exact) > 0


def test_lsh_topk_multi_table_recall_dominates_single(spark):
    """The OR-construction: every single-table result is found by the
    multi-table run with the same seed for table 0... recall against
    brute force must be monotonically ≥ the single-table recall, and
    repeated runs are deterministic."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)

    def recall(df):
        exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, queries, k=3).collect()}
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(exact & got) / len(exact)

    single = lsh_bucketed_topk(emb, queries, k=3, num_planes=4, num_tables=1)
    multi = lsh_bucketed_topk(emb, queries, k=3, num_planes=4, num_tables=8)
    r1, r8 = recall(single), recall(multi)
    assert r8 >= r1
    assert r8 >= 0.5  # 8 tables of 4 planes must find at least half
    again = recall(lsh_bucketed_topk(emb, queries, k=3, num_planes=4, num_tables=8))
    assert again == r8


def test_contamination_bloom_benchmark_budget_guard(spark, docs):
    """A benchmark bigger than the shingle budget must raise instead of
    silently collecting an unbounded set to the driver."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        contamination_bloom,
    )

    with pytest.raises(ValueError, match="distinct"):
        contamination_bloom(docs, docs, shingle_k=1, max_benchmark_shingles=3).collect()
    # within budget: runs fine
    out = contamination_bloom(docs, docs.limit(1), shingle_k=1, max_benchmark_shingles=10_000)
    assert out.count() >= 1


# ------------------------------------------------------------- packing

def test_pack_concat_chunks_invariants(spark):
    """Every doc's tokens are fully assigned across its chunk rows, and
    every chunk except each shard's last carries exactly seq_len."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        pack_concat_chunks,
    )

    rows = [(i, (i * 13) % 40 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_concat_chunks(df, "doc_id", "n", seq_len=32, num_shards=4).collect()
    per_doc = {}
    per_chunk = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tok"]
        per_chunk[(r["shard"], r["chunk_id"])] = (
            per_chunk.get((r["shard"], r["chunk_id"]), 0) + r["n_tok"]
        )
        assert 1 <= r["n_tok"] <= 32
    assert per_doc == {i: (i * 13) % 40 + 1 for i in range(50)}
    for shard in {s for s, _ in per_chunk}:
        chunks = sorted(c for s, c in per_chunk if s == shard)
        assert chunks == list(range(len(chunks)))  # contiguous ids from 0
        for c in chunks[:-1]:
            assert per_chunk[(shard, c)] == 32  # all but the tail are full


def test_pack_concat_chunks_doc_spans_chunks(spark):
    """A doc longer than seq_len must span consecutive chunks with the
    right split sizes."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        pack_concat_chunks,
    )

    df = spark.createDataFrame([(0, 10), (1, 70)], "doc_id long, n long")
    out = sorted(
        (r["chunk_id"], r["n_tok"])
        for r in pack_concat_chunks(df, "doc_id", "n", seq_len=32, num_shards=1)
        .filter(F.col("doc_id") == 1)
        .collect()
    )
    # doc 1 starts at offset 10: 22 in chunk 0, 32 in chunk 1, 16 in chunk 2
    assert out == [(0, 22), (1, 32), (2, 16)]


def test_pack_greedy_nextfit_invariants(spark):
    """Each doc packed exactly once; no pack exceeds the budget unless
    it is a single oversize doc; packing is deterministic."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        pack_greedy_nextfit,
    )

    rows = [(i, (i * 29) % 90 + 1) for i in range(60)] + [(100, 500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_greedy_nextfit(df, "doc_id", "n", budget=100, num_shards=4).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)
    fills = {}
    members = {}
    for r in out:
        key = (r["shard"], r["pack_id"])
        fills[key] = fills.get(key, 0) + r["n_tokens"]
        members.setdefault(key, []).append(r)
    for key, fill in fills.items():
        if fill > 100:
            assert len(members[key]) == 1 and members[key][0]["oversize"]
    oversize = [r for r in out if r["doc_id"] == 100]
    assert len(oversize) == 1 and oversize[0]["oversize"]
    again = pack_greedy_nextfit(df, "doc_id", "n", budget=100, num_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_quantize_embeddings_roundtrip_and_edge_cases(spark):
    """Quantized components stay within ±levels, dequantization error is
    bounded by scale/2 per component, zero vectors quantize to zeros
    (scale 0) and NULL vectors stay NULL."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        quantize_embeddings,
    )

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    r1 = out[1]
    assert r1["scale"] == 1.0 / 127
    assert all(abs(q) <= 127 for q in r1["qvec"])
    for orig, q in zip(rows[0][1], r1["qvec"]):
        assert abs(q * r1["scale"] - orig) <= r1["scale"] / 2 + 1e-12
    assert out[2]["scale"] == 0.0 and out[2]["qvec"] == [0, 0, 0, 0]
    assert out[3]["scale"] is None and out[3]["qvec"] is None


def test_quantized_topk_preserves_neighbors(spark):
    """Re-ranking over dequantized vectors must agree with the exact
    top-k on the overwhelming majority of neighbor slots — the quality
    claim that justifies the 4x storage saving."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        brute_force_topk,
        quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    deq = (
        quantize_embeddings(emb, "vec_id", "embedding")
        .select(
            "vec_id",
            F.transform("qvec", lambda q: q.cast("double") * F.col("scale")).alias("embedding"),
        )
    )
    queries_exact = emb.filter(F.col("vec_id") < 5)
    queries_deq = deq.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, queries_exact, k=5).collect()}
    quant = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(deq, queries_deq, k=5).collect()}
    assert len(exact & quant) / len(exact) >= 0.8


# ------------------------------------------- vocab / tfidf / unigram-LM

def test_vocab_stats_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        with_vocab_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "x x x"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in with_vocab_stats(df).collect()}
    # doc 1: tokens [a b a c] → 4 tokens, 3 distinct, hapax {b, c} = 2
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct_tokens"] == 3
    assert got[1]["n_hapax"] == 2
    assert got[1]["type_token_ratio"] == 0.75
    # doc 2: all same token → 0 hapax
    assert got[2]["n_tokens"] == 3 and got[2]["n_distinct_tokens"] == 1 and got[2]["n_hapax"] == 0
    # empty / NULL text → all-zero stats, never NULL
    for d in (3, 4):
        assert got[d]["n_tokens"] == 0 and got[d]["n_hapax"] == 0
        assert got[d]["type_token_ratio"] == 0.0


def test_tfidf_unique_term_ranks_first(spark):
    import math

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "g1", "shared shared zebra zebra zebra"),
            (2, "g2", "shared shared yak"),
            (3, "g3", "shared quokka"),
        ],
        "doc_id long, source string, text string",
    )
    rows = tfidf_top_terms(df, group_col="source", k=2).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["source"], []).append(r)
    for g in by_grp:
        by_grp[g].sort(key=lambda r: r["rk"])
    # 'shared' appears in all 3 groups → idf = ln(3/3) = 0 → score 0;
    # each group's unique term must outrank it.
    assert by_grp["g1"][0]["token"] == "zebra"
    assert by_grp["g2"][0]["token"] == "yak"
    assert by_grp["g3"][0]["token"] == "quokka"
    z = by_grp["g1"][0]
    assert z["tf"] == 3 and z["df"] == 1
    assert z["score"] == round(3 * math.log(3.0), 6)
    shared = by_grp["g2"][1]
    assert shared["token"] == "shared" and shared["score"] == 0.0


def test_unigram_logprob_uniform_and_skewed(spark):
    import math

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        unigram_logprob_scores,
    )

    # corpus: 4 tokens total — 'a' x3 (p=3/4), 'b' x1 (p=1/4)
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    lp = lambda p: round(math.log(p) * 1e6) / 1e6  # noqa: E731 — micro-nat snap
    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == round(lp(0.75), 6)
    assert got[2]["avg_logprob"] == round(lp(0.25), 6)
    # empty doc survives the left join with 0 tokens and NULL score
    assert got[3]["n_tokens"] == 0 and got[3]["avg_logprob"] is None


def test_tfidf_and_unigram_plans_have_no_cartesian_blowup(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        tfidf_top_terms,
        unigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(1, "g1", "a b c"), (2, "g2", "b c d")],
        "doc_id long, source string, text string",
    )
    # the single-row N / total cross joins must plan as broadcast
    # nested loop over ONE row, never a shuffled cartesian product.
    for plan_df in (tfidf_top_terms(df), unigram_logprob_scores(df)):
        p = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p


def test_temperature_mixture_sample(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "big" if i % 10 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, grp string")  # big=900, small=100
    out = temperature_mixture_sample(df, "grp", ["id"], target_rows=300, alpha=0.5)
    rates = {r["grp"]: r["keep_rate_micro"] for r in out.select("grp", "keep_rate_micro").distinct().collect()}
    # alpha=0.5: w ∝ sqrt(n) → rate_small/rate_big = sqrt(900/100) = 3
    assert rates["small"] == 3 * rates["big"]
    # deterministic under repartitioning
    s1 = {r["id"] for r in out.collect()}
    s2 = {r["id"] for r in temperature_mixture_sample(df.repartition(17), "grp", ["id"], 300, alpha=0.5).collect()}
    assert s1 == s2
    # target far above corpus size → every stratum saturates at rate 1 and ALL rows survive
    full = temperature_mixture_sample(df, "grp", ["id"], target_rows=10**6)
    assert full.count() == 1000
    with pytest.raises(ValueError):
        temperature_mixture_sample(df, "grp", ["id"], target_rows=0)


def test_temperature_mixture_plan_is_broadcast(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    df = spark.createDataFrame([(i, "a") for i in range(10)], "id long, grp string")
    p = temperature_mixture_sample(df, "grp", ["id"], 5)._jdf.queryExecution().executedPlan().toString()
    # the rates side must come back as a broadcast, never a shuffled join
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_chunk_dup_ratio_ground_truth(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (
        chunk_dup_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d"),   # chunks: [a b], [c d]
            (2, "a b x y"),   # chunks: [a b], [x y] — shares [a b] with doc 1
            (3, "q r"),       # unique chunk
            (4, "c d c d"),   # self-repeat: [c d] twice (also shared with doc 1)
            (5, ""),          # no tokens → excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in chunk_dup_ratio(df, chunk_tokens=2).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["n_chunks"], got[1]["n_dup_chunks"]) == (2, 2)  # both chunks shared
    assert (got[2]["n_chunks"], got[2]["n_dup_chunks"]) == (2, 1)
    assert got[2]["dup_chunk_ratio"] == 0.5
    assert (got[3]["n_chunks"], got[3]["n_dup_chunks"]) == (1, 0)
    assert (got[4]["n_chunks"], got[4]["n_dup_chunks"]) == (2, 2)  # self-repeats count
    with pytest.raises(ValueError):
        chunk_dup_ratio(df, chunk_tokens=0)


def test_chunk_dup_ratio_tail_chunk_is_separate(spark):
    """A 5-token doc at chunk size 2 yields chunks [t1 t2], [t3 t4], [t5]
    — the short tail hashes separately and never aliases a full chunk."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (
        chunk_dup_ratio,
    )

    df = spark.createDataFrame([(1, "a b c d e"), (2, "e")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in chunk_dup_ratio(df, chunk_tokens=2).collect()}
    assert got[1]["n_chunks"] == 3
    # doc 1's tail chunk "e" == doc 2's only chunk → both marked dup
    assert got[1]["n_dup_chunks"] == 1 and got[2]["n_dup_chunks"] == 1


def test_hash_sample_by_rate(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        hash_sample_by_rate,
    )

    rows = [(i, 1000000 if i < 100 else (0 if i < 200 else 500000)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, rate_micro long")
    out = hash_sample_by_rate(df, "rate_micro", ["id"], seed=5)
    ids = {r["id"] for r in out.collect()}
    assert all(i in ids for i in range(100))        # rate 1.0 → always kept
    assert not any(100 <= i < 200 for i in ids)     # rate 0 → always dropped
    frac = sum(1 for i in ids if i >= 200) / 800    # rate 0.5 → about half
    assert 0.4 < frac < 0.6
    # deterministic under repartitioning
    ids2 = {r["id"] for r in hash_sample_by_rate(df.repartition(13), "rate_micro", ["id"], seed=5).collect()}
    assert ids == ids2
    # NULL rate → dropped, not an error
    with_null = spark.createDataFrame([(1, None)], "id long, rate_micro long")
    assert hash_sample_by_rate(with_null, "rate_micro", ["id"]).count() == 0


def test_compression_ratio_orders_repetitive_below_prose(spark):
    import zlib

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        with_compression_ratio,
    )

    rep = "spam " * 200
    prose = "the quick brown fox jumps over one lazy dog near riverbanks today"
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, ""), (4, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in with_compression_ratio(df).collect()}
    # exact stdlib replay for fixed strings
    assert got[1]["compressed_len"] == len(zlib.compress(rep.encode(), 6))
    assert got[2]["compressed_len"] == len(zlib.compress(prose.encode(), 6))
    # repetitive text compresses far better than prose
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    # empty / NULL → 0, never NULL
    assert got[3]["compression_ratio"] == 0.0 and got[4]["compressed_len"] == 0


def test_compression_ratio_uses_utf8_bytes_not_codepoints(spark):
    """Multibyte text: the denominator must be UTF-8 BYTES (zlib's
    input), not codepoints — a char count would inflate the ratio ~3x
    for CJK and misread repetitive boilerplate as incompressible."""
    import zlib

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        with_compression_ratio,
    )

    cjk = "你好世界" * 50  # 200 codepoints, 600 UTF-8 bytes
    df = spark.createDataFrame([(1, cjk)], "doc_id long, text string")
    r = with_compression_ratio(df).collect()[0]
    raw_bytes = len(cjk.encode("utf-8"))
    assert raw_bytes == 600
    assert r["compression_ratio"] == round(
        len(zlib.compress(cjk.encode("utf-8"), 6)) / raw_bytes, 6
    )


# ------------------------------------------------------------ heavy hitters

def test_heavy_hitters_exact_when_certified(spark):
    """MG candidates + exact recount must equal the plain groupBy top-k
    whenever the certificate holds — including across partitions and
    Arrow batches (8 partitions force per-partition summaries)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.heavyhitters import (
        heavy_hitters_topk,
        mg_partition_summaries,
    )

    rows = [(f"k{i % 7}",) for i in range(700)] + [(f"rare{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    got = [(r["token"], r["n"]) for r in heavy_hitters_topk(df, "token", k=5, capacity=64).collect()]
    expect = [
        (r["token"], r["n"])
        for r in df.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token")).limit(5).collect()
    ]
    assert got == expect
    # summary size bound: ≤ capacity rows per partition
    sizes = (
        mg_partition_summaries(df, "token", 16)
        .groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert all(r["count"] <= 16 for r in sizes)


def test_heavy_hitters_refuses_uncertifiable(spark):
    """An undersized sketch must RAISE, not silently return a lossy
    top-k: with capacity 2 over a near-uniform key set the k-th count
    cannot exceed n/capacity."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.heavyhitters import (
        heavy_hitters_topk,
    )

    rows = [(f"k{i % 50}",) for i in range(500)]
    df = spark.createDataFrame(rows, "token string").repartition(4)
    with pytest.raises(RuntimeError, match="capacity"):
        heavy_hitters_topk(df, "token", k=5, capacity=2)
    # unverified mode returns best-effort without raising
    assert heavy_hitters_topk(df, "token", k=5, capacity=2, verified=False).count() <= 5


def test_triangle_stats_ground_truth(spark):
    """K4 (4 triangles, 12 wedges → coefficient 1.0) plus a 5-leaf hub
    star (0 triangles, 10 extra wedges) — the star exercises the
    degree-ordered orientation: all hub edges point leaf→hub, so the
    hub contributes no wedge pairs to the self-join."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.graph import (
        triangle_stats,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    star = [(10, leaf) for leaf in range(11, 16)]
    edges = spark.createDataFrame(k4 + star, "id_a long, id_b long")
    row = triangle_stats(edges).collect()[0]
    assert row["n_edges"] == 11
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 12 + 10  # K4: 4 vertices deg 3; star hub deg 5
    assert row["clustering_coefficient"] == round(12 / 22, 6)


def test_pagerank_integer_ground_truth(spark):
    """Path graph 1–2–3 checked against an independent Python replay of
    the integer recurrence (teleport 15%·(M div n), contribution
    ``rank div degree``, damping 85 div 100): the ends are symmetric
    and the middle node accumulates both ends' full contributions."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.graph import (
        pagerank_integer,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["node"]: r["rank_micro"] for r in pagerank_integer(edges, iterations=3).collect()}

    mass, n = 1_000_000_000, 3
    deg = {1: 1, 2: 2, 3: 1}
    nbrs = {1: [2], 2: [1, 3], 3: [2]}
    r = {u: mass // n for u in deg}
    for _ in range(3):
        s = {u: sum(r[v] // deg[v] for v in nbrs[u]) for u in deg}
        r = {u: (15 * (mass // n)) // 100 + (85 * s[u]) // 100 for u in deg}
    assert got == r
    assert got[1] == got[3]
    assert got[2] > got[1]


def test_pagerank_hub_outranks_leaves(spark):
    """5-leaf star: the hub holds the overwhelming share of rank and
    every leaf is identical (they are automorphic)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.graph import (
        pagerank_integer,
    )

    edges = spark.createDataFrame([(0, leaf) for leaf in range(1, 6)], "id_a long, id_b long")
    got = {r["node"]: r["rank_micro"] for r in pagerank_integer(edges, iterations=3).collect()}
    leaves = {got[i] for i in range(1, 6)}
    assert len(leaves) == 1
    assert got[0] > 3 * got[1]


def test_scrub_blocklist_ground_truth(spark):
    """Whole-word semantics: 'slow' inside 'slowly' is NOT scrubbed;
    counts and replacement text are exact; NULL text behaves as ''."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        scrub_blocklist,
    )

    df = spark.createDataFrame(
        [(1, "slow query slow scan"), (2, "slowly big data"), (3, None)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in scrub_blocklist(df, "text", ["slow", "big"]).collect()}
    assert rows[1]["n_scrubbed"] == 2
    assert rows[1]["scrubbed"] == "[SCRUBBED] query [SCRUBBED] scan"
    assert rows[2]["n_scrubbed"] == 1
    assert rows[2]["scrubbed"] == "slowly [SCRUBBED] data"
    assert rows[3]["n_scrubbed"] == 0
    assert rows[3]["scrubbed"] == ""


def test_global_shuffle_deterministic_and_sharded(spark):
    """Every shard's positions are exactly 1..|shard| (dense, no gaps),
    the row count is preserved, and the assignment is identical under a
    different input partitioning (the determinism contract)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        global_shuffle,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = global_shuffle(df, ["doc_id"], num_shards=8)
    pdf = out.toPandas()
    assert len(pdf) == 500
    assert set(pdf["shard"].unique()) <= set(range(8))
    for _, grp in pdf.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))

    again = global_shuffle(df.repartition(13), ["doc_id"], num_shards=8).toPandas()
    merged = pdf.merge(again, on="doc_id", suffixes=("", "_b"))
    assert (merged["shard"] == merged["shard_b"]).all()
    assert (merged["pos"] == merged["pos_b"]).all()


def test_global_shuffle_no_global_sort(spark):
    """The shuffle-shard plan must hash-exchange on the shard column,
    never range-partition (a range exchange is the global-sort marker
    that would serialize a 100 TB corpus through one sort)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        global_shuffle,
    )

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = plans.explain_str(global_shuffle(df, ["doc_id"], num_shards=8))
    assert "rangepartitioning" not in plan.lower()


def test_hash_exact_per_stratum(spark):
    """Exactly n rows per stratum (all rows when the stratum is
    smaller), and the draw is a PREFIX-STABLE uniform order: the n=5
    selection is a subset of the n=10 selection for every stratum —
    the property that lets eval sets grow without resampling."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        hash_exact_per_stratum,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(43)], "doc_id long, s string"
    )
    out5 = hash_exact_per_stratum(df, "s", 5, ["doc_id"]).toPandas()
    counts = out5.groupby("s")["doc_id"].count()
    assert counts["big"] == 5
    assert counts["small"] == 3  # stratum has only 3 rows
    out10 = hash_exact_per_stratum(df, "s", 10, ["doc_id"]).toPandas()
    assert set(out5["doc_id"]) <= set(out10["doc_id"])


def test_new_operator_argument_guards(spark):
    """Constructor guards raise loudly instead of silently aliasing:
    zorder bit overflow, shard-count bounds, empty blocklists, and
    non-positive iteration/stratum budgets."""
    import pytest as _pytest

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.graph import (
        pagerank_integer,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        global_shuffle,
        hash_exact_per_stratum,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        scrub_blocklist,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        zorder_key,
    )

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match="<= 62"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    with _pytest.raises(ValueError, match="non-empty"):
        zorder_key([], bits=16)
    with _pytest.raises(ValueError, match=r"\[1, 256\]"):
        global_shuffle(df, ["doc_id"], num_shards=0)
    with _pytest.raises(ValueError, match=r"\[1, 256\]"):
        global_shuffle(df, ["doc_id"], num_shards=257)
    with _pytest.raises(ValueError, match="non-empty"):
        scrub_blocklist(df.withColumn("text", F.lit("x")), "text", [])
    with _pytest.raises(ValueError, match=">= 1"):
        pagerank_integer(spark.createDataFrame([(1, 2)], "id_a long, id_b long"), iterations=0)
    with _pytest.raises(ValueError, match=">= 1"):
        hash_exact_per_stratum(df.withColumn("s", F.lit("a")), "s", 0, ["doc_id"])


# ---------------------------------------------------------------------------
# portable SimHash verified tier (round 5 — cosine near-dup scale path)
# ---------------------------------------------------------------------------


def _twin_corpus_slice(spark, n_ids):
    """Quantization-twin corpus over the first n_ids test vectors —
    the same construction __spark_entry__.similarity_dup_pairs_verified
    uses, restricted for test cost."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    corpus = entrymod._quant_twin_corpus(spark, SF_DIR)
    return corpus.filter((F.col("vec_id") % 1000000) < n_ids)


def test_portable_simhash_verified_certificate_on_testdata(spark):
    """Runtime certificate (heavy-hitters precedent): the chunk-join
    candidate tier must reproduce the quadratic all-pairs route EXACTLY
    — recall 1 by pigeonhole is a theorem, and certify=True re-derives
    and raises on any divergence. Also pins the planted-structure
    outcome: every reported pair is an (original, its-own-quant-twin)
    pair at cosine ≥ 0.99 within Hamming radius 3."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        portable_simhash_dup_pairs,
    )

    corpus = _twin_corpus_slice(spark, 150)
    out = portable_simhash_dup_pairs(
        corpus, "vec_id", "embedding", dim=64, threshold=0.99, max_hamming=3, certify=True
    ).collect()
    assert len(out) >= 140  # a few twins may exceed the Hamming radius
    for r in out:
        assert r["cosine"] >= 0.99 and r["hamming"] <= 3
        assert r["id_b"] == r["id_a"] + 1000000  # twin structure, no false merges


def test_portable_simhash_expr_impl_bit_identical(spark):
    """The Catalyst higher-order form and the Arrow int64-matmul form
    compute the SAME integer signatures — same md5 planes, same
    floor(x*1e6) quantization — so the verified tier's output is
    implementation-independent."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        portable_simhash_dup_pairs,
    )

    corpus = _twin_corpus_slice(spark, 20)
    fast = portable_simhash_dup_pairs(corpus, "vec_id", "embedding", dim=64)
    slow = portable_simhash_dup_pairs(corpus, "vec_id", "embedding", dim=64, impl="expr")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_portable_simhash_null_vector_yields_no_pairs(spark):
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators import (
        portable_simhash_dup_pairs,
    )

    base = [(0, [1.0] * 64), (1, [1.0] * 64), (2, None)]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    out = portable_simhash_dup_pairs(df, "vec_id", "embedding", dim=64).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}


def test_chunk_tokens_overlap_contract(spark):
    """Chunk boundary contract: stride = chunk_size - overlap, first
    chunk starts at token 1, every chunk but possibly the last has
    exactly chunk_size tokens, consecutive chunks share exactly
    `overlap` tokens, the last chunk reaches the final token, and
    empty/NULL docs produce no chunks."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        chunk_tokens_overlap,
    )

    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # n=10 <= cs → 1 chunk
            (2, " ".join(f"t{i}" for i in range(11))),   # n=11 → 2 chunks
            (3, " ".join(f"t{i}" for i in range(17))),   # n=17 → ceil(7/6)+1=3
            (4, ""),                                      # no chunks
            (5, None),                                    # no chunks
            (6, "one"),                                   # 1 tiny chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_tokens_overlap(docs, chunk_size=10, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3, 6}
    assert [r["n_chunk_tokens"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])] == [10]
    c2 = sorted(by_doc[2], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_tokens"] for r in c2] == [10, 5]  # starts 1, 7 → 7..11
    assert c2[1]["chunk_text"].split() == [f"t{i}" for i in range(6, 11)]
    c3 = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_tokens"] for r in c3] == [10, 10, 5]
    # overlap: chunk k ends with the 4 tokens chunk k+1 starts with
    assert c3[0]["chunk_text"].split()[-4:] == c3[1]["chunk_text"].split()[:4]
    # last chunk reaches the final token
    assert c3[-1]["chunk_text"].split()[-1] == "t16"
    assert by_doc[6][0]["chunk_text"] == "one"

    with _pytest.raises(ValueError):
        chunk_tokens_overlap(docs, chunk_size=4, overlap=4)


def test_verified_edges_memo_contract(spark):
    """The session-scoped edge supplier must (a) return the SAME
    materialized frame for repeated calls with the same (sf_dir,
    threshold) and session, (b) key by threshold, and (c) be already
    materialized (localCheckpointed — querying it twice cannot
    re-derive signatures)."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    entrymod._EDGE_MEMO.clear()
    a1 = entrymod._verified_edges(spark, sf, 0.8)
    a2 = entrymod._verified_edges(spark, sf, 0.8)
    assert a1 is a2  # memo hit, not a rebuild
    b = entrymod._verified_edges(spark, sf, 0.7)
    assert b is not a1  # threshold is part of the key
    # materialized: the plan is a checkpoint scan, not the LSH pipeline
    plan = a1._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
    # 0.7 edges are a superset of 0.8 edges on the same corpus
    assert b.count() >= a1.count()
    entrymod._EDGE_MEMO.clear()


def test_weighted_sample_topk_properties(spark):
    """A-Res weighted sampling: deterministic across runs, without
    replacement (k distinct rows), excludes non-positive/NULL weights,
    and inclusion tracks weight — with weights 100 vs 1, the heavy
    stratum must dominate a k=40 sample from 100+100 rows."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, 100 if i < 100 else 1) for i in range(200)]
    rows += [(200, 0), (201, -5), (202, None)]  # excluded
    df = spark.createDataFrame(rows, "id long, w long")
    out = weighted_sample_topk(df, "w", ["id"], k=40).collect()
    ids = [r["id"] for r in out]
    assert len(ids) == 40 and len(set(ids)) == 40
    assert not {200, 201, 202} & set(ids)
    heavy = sum(1 for i in ids if i < 100)
    assert heavy >= 30  # E[heavy] ≈ 40·(100/101-ish share); light tail tiny
    # deterministic: same seed, same sample, same ranks
    again = weighted_sample_topk(df, "w", ["id"], k=40).collect()
    assert {(r["id"], r["rk"]) for r in again} == {(r["id"], r["rk"]) for r in out}
    # different seed, (very likely) different ordering — at minimum valid
    other = weighted_sample_topk(df, "w", ["id"], k=40, seed=7).collect()
    assert len(other) == 40


def test_phrase_occurrences_ground_truth(spark):
    """Overlapping and repeated matches count by position; partial
    matches (prefix only) don't."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        phrase_occurrences,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c x a b c"),   # 2 occurrences
            (2, "a b a b c"),       # 1 (the leading "a b" is prefix-only)
            (3, "a b x c"),         # 0
            (4, "a b c a b c a b c"),  # 3
            (5, None),              # NULL text → 0
        ],
        ["doc_id", "text"],
    )
    phrase = spark.createDataFrame([("a", "b", "c")], ["w1", "w2", "w3"])
    got = {r.doc_id: r.n_occurrences for r in phrase_occurrences(docs, phrase).collect()}
    assert got == {1: 2, 2: 1, 4: 3}


def test_phrase_occurrences_repeated_word_phrase(spark):
    """A phrase with repeated words ("a a b") must align by position,
    not just membership: 'a a a b' has exactly 1 match at pos 2."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        phrase_occurrences,
    )

    docs = spark.createDataFrame([(1, "a a a b"), (2, "a b a b")], ["doc_id", "text"])
    phrase = spark.createDataFrame([("a", "a", "b")], ["w1", "w2", "w3"])
    got = {r.doc_id: r.n_occurrences for r in phrase_occurrences(docs, phrase).collect()}
    assert got == {1: 1}


def test_containment_prefix_pairs_quote_detection(spark):
    """A short doc fully quoted inside a long doc must surface as a
    containment pair even though the pair's Jaccard is low — and the
    prefix-filter candidates must not miss it (recall-1 pigeonhole)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (
        containment_prefix_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens, 5 shingles
    long_doc = "intro words here " + quote + " trailing commentary follows now"
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, long_doc),
            (3, "совершенно unrelated text about other things entirely today"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in containment_prefix_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r.n_a == 5 and r.n_shared == 5 and r.containment_micro == 1000000
    # asymmetric: the long doc is NOT contained in the short one
    assert (2, 1) not in out
    assert all(a != 3 and b != 3 for a, b in out)


def test_waterfill_allocation_invariants(spark):
    """Water-filling ground truth: budget 10 over availabilities
    {a:2, b:5, c:9} → a saturates (2), then level θ=4 for b,c with
    remainder 0 → {2, 4, 4}. Sum == min(B, Σa) in both regimes; no
    allocation exceeds availability."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.sampling import (
        waterfill_allocation,
    )

    df = spark.createDataFrame([("a", 2), ("b", 5), ("c", 9)], ["k", "avail"])
    got = {
        r.k: r.alloc
        for r in waterfill_allocation(df, "k", "avail", budget=10).collect()
    }
    assert got == {"a": 2, "b": 4, "c": 4}
    # budget exceeds supply: everyone saturates
    got2 = {
        r.k: r.alloc
        for r in waterfill_allocation(df, "k", "avail", budget=100).collect()
    }
    assert got2 == {"a": 2, "b": 5, "c": 9}
    # remainder distribution: B=11 → θ=4 rem 1 → smallest-availability
    # unsaturated key (b) gets the extra unit
    got3 = {
        r.k: r.alloc
        for r in waterfill_allocation(df, "k", "avail", budget=11).collect()
    }
    assert got3 == {"a": 2, "b": 5, "c": 4} or sum(got3.values()) == 11


def _bpe_reference(word_counts, num_merges):
    """Pure-Python replay of the greedy BPE fold (the operator's
    documented semantics): weighted pair counts, argmax (count desc,
    pair lex asc), greedy left-to-right non-overlapping merge."""
    syms = {w: [c for c in w] for w in word_counts}
    merges = []
    for rank in range(1, num_merges + 1):
        counts = {}
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + cnt
        if not counts:
            break
        (a, b), wc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, wc))
        for w in syms:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_merges_matches_python_reference(spark):
    """The Spark BPE loop must reproduce the pure-Python greedy
    reference on the classic Sennrich fixture, including the 'aaaa' →
    (aa)(aa) non-overlapping rule."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        bpe_merges,
    )

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3 + ["aaaa"] * 4
    )
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = [tuple(r) for r in bpe_merges(docs, "text", 8).collect()]
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 4}
    assert got == _bpe_reference(wc, 8)
    # the greedy rule: 'aaaa' contributes 3 (a,a) pairs per word pre-merge,
    # and after merging (a,a) it pairs as (aa,aa) — sanity-pin one merge
    assert any(m[1] == "a" and m[2] == "a" for m in got)


def test_sorted_neighborhood_contract(spark):
    """SNM finds a near-sorted duplicate and — by design — MISSES a
    first-character corruption that sorts far away; both behaviors are
    the operator's honest-recall contract."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from pyspark.sql import functions as F

    rows = [
        ("a1", "Customer#000000001"),
        ("a2", "Customer#00000000X"),   # tail typo: sorts adjacent -> found
        ("b1", "Customer#000000777"),
        ("b2", "Xustomer#000000777"),   # head typo: sorts far -> missed
        ("z1", "Customer#000000500"),
        ("z2", "Customer#000000501"),
        # fillers between C... and X... so the head-typo pair really is
        # more than `window` ranks apart (as it would be at scale)
        ("f1", "Mustomer#000000001"),
        ("f2", "Pustomer#000000001"),
        ("f3", "Qustomer#000000001"),
    ]
    df = spark.createDataFrame(rows, ["rec_id", "nm"])
    cand = sorted_neighborhood_pairs(df, "rec_id", "nm", window=3, num_partitions=3)
    hits = {
        (r.a_id, r.b_id)
        for r in cand.filter(F.levenshtein("a_key", "b_key") <= 1).collect()
    }
    assert ("a1", "a2") in hits
    assert not any({"b1", "b2"} == {a, b} for a, b in hits)
    # candidate count is exactly the linear bound: for n ranked rows and
    # window w, pairs = (n-1) + (n-2) = 2n-3 at w=3
    assert cand.count() == 2 * len(rows) - 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "rec_id", "nm", window=1)


def test_tfidf_doc_cosine_topk_geometry(spark):
    """Identical docs score ~1.0 (within one ulp-floor), disjoint docs
    never pair, and the df cap drops ubiquitous terms from vectors."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.text import (
        tfidf_doc_cosine_topk,
    )

    rows = [
        (1, "apple banana"),
        (2, "apple banana"),
        (3, "cherry date"),
        (4, "apple cherry"),
        (5, ""),  # empty doc: no vector, must not appear
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_doc_cosine_topk(df, "doc_id", "text", k=2, max_df=100)
    got = {(r.doc_id, r.sim_id): r.cos_micro for r in out.collect()}
    # identical vectors: cos = 1.0 up to the sqrt(x)^2 != x ulp, then floored
    assert got[(1, 2)] >= 999_999 and got[(2, 1)] == got[(1, 2)]
    assert 5 not in {d for d, _ in got}
    # doc 3 and docs 1/2 share no term: no pair either direction
    assert (3, 1) not in got and (1, 3) not in got
    # partial overlap scores strictly between 0 and the identical pair
    assert 0 < got[(4, 1)] < got[(1, 2)]

    # a df cap of 1 excludes every shared term -> no pairs at all
    assert tfidf_doc_cosine_topk(df, "doc_id", "text", k=2, max_df=1).count() == 0


def test_hll_registers_mergeable_and_accurate(spark):
    """Portable HLL: (a) estimate within ~5x standard error of exact;
    (b) MERGE property — max-merging two groups' register tables gives
    exactly the sketch of the unioned data (the 100 TB rollup story)."""
    from pyspark.sql import functions as F

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.heavyhitters import (
        hll_estimate,
        hll_registers,
    )

    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(1500, 5000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    regs = hll_registers(df, ["g"], "v")
    est = {r.g: r.est_distinct for r in hll_estimate(regs, ["g"]).collect()}
    # sigma = 1.04/sqrt(512) ~ 4.6%; 5 sigma ~ 23%
    assert abs(est["a"] - 3000) <= 0.23 * 3000
    assert abs(est["b"] - 3500) <= 0.23 * 3500

    # merge the two register tables -> sketch of the union (5000 distinct)
    merged = regs.groupBy("reg").agg(F.max("rho").alias("rho")).withColumn(
        "g", F.lit("all")
    )
    est_merged = hll_estimate(merged, ["g"]).collect()[0].est_distinct
    union_regs = hll_registers(df.withColumn("g", F.lit("all")), ["g"], "v")
    est_union = hll_estimate(union_regs, ["g"]).collect()[0].est_distinct
    assert est_merged == est_union  # exact register-level equality
    assert abs(est_union - 5000) <= 0.23 * 5000

    # small-cardinality groups take the linear-counting branch and are
    # near-exact there
    tiny = spark.createDataFrame([("t", i) for i in range(40)], ["g", "v"])
    est_tiny = hll_estimate(hll_registers(tiny, ["g"], "v"), ["g"]).collect()[0].est_distinct
    assert abs(est_tiny - 40) <= 4


def test_payload_byte_entropy_matches_reference(spark):
    """payload_byte_entropy equals a plain-Python byte-histogram
    entropy (per-cell micro-bit snapping replayed literally), counts
    zero-entropy constant payloads correctly, and drops empty
    payloads like the oracle's octet_length > 0 guard."""
    import math

    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.multimodal import (
        payload_byte_entropy,
    )

    rows = [(1, "abab"), (2, "aaaa"), (3, "abcd"), (4, ""), (5, None)]
    df = attach_payload(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_distinct_bytes"], r["entropy_microbits"])
        for r in payload_byte_entropy(df).collect()
    }

    def ref(text):
        bs = text.encode("utf-8")
        if not bs:
            return None
        hist = {}
        for b in bs:
            hist[b] = hist.get(b, 0) + 1
        n = len(bs)
        ent = sum(round(c / n * math.log2(n / c) * 1e6) for c in hist.values())
        return (n, len(hist), ent)

    want = {i: ref(t) for i, t in rows if t}
    assert got == want
    assert got[2] == (4, 1, 0)          # constant payload: zero entropy
    assert got[1] == (4, 2, 1000000)    # two equiprobable bytes: 1 bit
    assert 4 not in got and 5 not in got


def test_self_knn_topk_equals_brute_force(spark):
    """The partial-top-k self-kNN kernel must reproduce
    brute_force_topk(vectors, vectors) EXACTLY — same neighbors, same
    4-dp cosines, same ranks — across partition boundaries (the
    partial emission must never drop a row the global rounded
    ordering needs)."""
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.similarity import (
        brute_force_topk,
        self_knn_topk,
    )
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.sources.io import (
        read_table,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").repartition(8)
    want = {
        (r.query_id, r.rk): (r.neighbor_id, r.cosine)
        for r in brute_force_topk(emb, emb, "vec_id", "embedding", k=5).collect()
    }
    got = {
        (r.query_id, r.rk): (r.neighbor_id, r.cosine)
        for r in self_knn_topk(emb, "vec_id", "embedding", k=5).collect()
    }
    assert got == want
    assert len(got) > 0


def test_peak_concurrency_hand_fixture(spark, tmp_path):
    """events_peak_concurrency_daily against a hand-computed fixture —
    independent of the DuckDB oracle (which mirrors the same plan, so
    a shared semantic error would pass both engines): overlapping
    sessions, a gap-split user, and a MIDNIGHT-SPANNING session whose
    carry-over day has no delta of its own (the zero-delta midnight
    spine is what makes day 2 report 1, not 0)."""
    import datetime as dt
    import os

    import __spark_entry__ as entrymod

    rows = [
        # user 1: one session 10:00:00 - 10:30:00 (ends 10:30:01)
        (1, dt.datetime(2024, 3, 1, 10, 0, 0)),
        (1, dt.datetime(2024, 3, 1, 10, 30, 0)),
        # user 2: session 10:05 - 10:35 overlapping user 1 and user 3
        (2, dt.datetime(2024, 3, 1, 10, 5, 0)),
        (2, dt.datetime(2024, 3, 1, 10, 35, 0)),
        # user 3: gap > 3600 splits into two sessions
        (3, dt.datetime(2024, 3, 1, 10, 29, 0)),
        (3, dt.datetime(2024, 3, 1, 13, 0, 0)),
        # user 4: session spanning midnight into Mar 2 (gap 31 s)
        (4, dt.datetime(2024, 3, 1, 23, 59, 59)),
        (4, dt.datetime(2024, 3, 2, 0, 0, 30)),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "click", 1.0, "{}") for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path / "fix")
    os.makedirs(sf_dir)
    df.coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))

    out = {
        r["day"]: r["peak_concurrency"]
        for r in entrymod.events_peak_concurrency_daily(spark, sf_dir).collect()
    }
    # Mar 1: users 1+2+3 all overlap at 10:29:00 -> peak 3
    # Mar 2: only user 4's carried-over session -> peak 1 (midnight spine)
    assert out == {"2024-03-01": 3, "2024-03-02": 1}


def test_simhash_pairs_portable_supplier_matches_direct(spark):
    """The session-scoped _simhash_pairs_portable supplier (round 14)
    returns exactly the rows a direct derivation produces, and is
    memoized per (session, sf_dir)."""
    import __spark_entry__ as entrymod
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (
        simhash,
        simhash_pairs,
    )

    sf = "/root/testdata/sf0.001"
    entrymod._SIMHASH_MEMO.clear()
    got = entrymod._simhash_pairs_portable(spark, sf)
    again = entrymod._simhash_pairs_portable(spark, sf)
    assert again is got  # memo hit for the same (session, sf_dir)
    docs = entrymod._t(spark, sf, "documents")
    direct = simhash_pairs(
        simhash(docs, "doc_id", "text", bits=32, portable=True),
        "doc_id", max_hamming=3, bits=32,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, direct.collect())
    )
    entrymod._SIMHASH_MEMO.clear()
