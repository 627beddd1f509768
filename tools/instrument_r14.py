"""Round-14 stage instrumentation (read-only probe, not part of the
engine): times the _live_warehouse legs and the edge-supplier stages
individually in one warmed JVM, so optimization targets are chosen from
measured stage costs (guide §1) instead of bench-row totals.

Usage::

    python tools/instrument_r14.py warehouse|edges|tfidf [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import (  # noqa: E402
    get_spark,
)


def _timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f}s", flush=True)
    return out


def warehouse(spark, sf_dir):
    # one warm pass, then timed steady-state rebuilds with memos cleared.
    # Per-leg breakdown via monkeypatched streaming entry points —
    # _live_warehouse imports them at call time, so patching the
    # streaming package namespace intercepts each leg's drain.
    import stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.streaming as streaming_mod

    def _wrap(name, fn):
        def inner(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            print(f"    [{name}] {time.time() - t0:.2f}s", flush=True)
            return out
        return inner

    for name in (
        "streaming_incremental_rollup",
        "streaming_lateness_census",
        "ivf_index_maintain_stream",
        "recommended_watermark_from_census",
        "run_stream_to_memory",
    ):
        setattr(streaming_mod, name, _wrap(name, getattr(streaming_mod, name)))
    entrymod._q1_ivm_store = _wrap("q1_ivm_store_total", entrymod._q1_ivm_store)

    entrymod._live_warehouse(spark, sf_dir)
    for i in range(2):
        entrymod._WAREHOUSE_MEMO.clear()
        entrymod._IVM_STORE_MEMO.clear()
        _timed(f"rebuild[{i}]", lambda: entrymod._live_warehouse(spark, sf_dir))


def edges(spark, sf_dir):
    from pyspark.sql import functions as F
    from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (
        minhash_signatures,
        minhash_candidate_pairs,
        minhash_verified_pairs,
        _word_shingles,
    )

    docs = entrymod._t(spark, sf_dir, "documents")
    # warm
    minhash_verified_pairs(docs, "doc_id", "text", threshold=0.7,
                           num_hashes=128, num_bands=64, shingle_k=3).count()
    for i in range(2):
        t0 = time.time()
        sigs = minhash_signatures(docs, "doc_id", "text", 128, 3, 42)
        sigs = sigs.localCheckpoint(eager=True)
        t1 = time.time()
        print(f"[{i}] signatures: {t1 - t0:.2f}s", flush=True)
        cands = minhash_candidate_pairs(sigs, "doc_id", 64, num_hashes=128)
        cands = cands.localCheckpoint(eager=True)
        t2 = time.time()
        print(f"[{i}] candidates: {t2 - t1:.2f}s (n={cands.count()})", flush=True)
        cand_ids = (
            cands.select(F.col("id_a").alias("_id"))
            .unionByName(cands.select(F.col("id_b").alias("_id")))
            .distinct()
        )
        shs = (
            docs.join(cand_ids, docs["doc_id"] == cand_ids["_id"], "left_semi")
            .select(F.col("doc_id").alias("_id"), _word_shingles("text", 3).alias("_shs"))
            .localCheckpoint(eager=True)
        )
        t3 = time.time()
        print(f"[{i}] cand shingles: {t3 - t2:.2f}s", flush=True)
        inter = F.size(F.array_intersect("_sa", "_sb"))
        out = (
            cands.join(shs.select(F.col("_id").alias("id_a"), F.col("_shs").alias("_sa")), "id_a")
            .join(shs.select(F.col("_id").alias("id_b"), F.col("_shs").alias("_sb")), "id_b")
            .withColumn("_i", inter)
            .withColumn(
                "jaccard",
                F.round(F.col("_i").cast("double") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4),
            )
            .filter(F.col("jaccard") >= 0.7)
            .select("id_a", "id_b", "jaccard")
        )
        out.write.format("noop").mode("overwrite").save()
        t4 = time.time()
        print(f"[{i}] confirm: {t4 - t3:.2f}s  TOTAL {t4 - t0:.2f}s", flush=True)
        # whole-pipeline reference number (the real derive path)
        entrymod._EDGE_MEMO.clear()
        t5 = time.time()
        for t in (0.7, 0.8):
            entrymod._verified_edges(spark, sf_dir, t).count()
        print(f"[{i}] full _verified_edges(0.7,0.8): {time.time() - t5:.2f}s", flush=True)


def tfidf(spark, sf_dir):
    q = entrymod.queries()["text_tfidf_doc_similarity"]
    q(spark, sf_dir).count()
    for i in range(3):
        _timed(f"tfidf[{i}]", lambda: q(spark, sf_dir).count())


def main():
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("instrument_r14")
    {"warehouse": warehouse, "edges": edges, "tfidf": tfidf}[which](spark, sf_dir)


if __name__ == "__main__":
    main()
