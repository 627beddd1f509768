"""One-more-decade probe for containment_prefix_pairs (r7 verdict #3).

The sf ladder tops out at sf0.1 (5 000 docs), and the measured
sf0.01→sf0.1 growth for dedup_containment_quotes was ×4.1 — the only
SCALE.md trend above ×2.5. This probe asks whether that growth
COMPOUNDS by timing the operator on a 5× corpus (25 000 docs)
synthesized to be distribution-faithful to the driver corpus:

- per-doc token counts are drawn (seeded) from sf0.1's empirical
  length distribution,
- tokens are drawn i.i.d. from sf0.1's empirical unigram distribution
  (the generator vocabulary is ~31 words — FIXED, so shingle document
  frequency grows LINEARLY with corpus size; this is the adversarial
  regime for a prefix-filter join, far harsher than a natural corpus
  where Heaps' law keeps df growth sublinear).

Under fixed vocabulary the candidate volume Σ_s prefix_count(s)·df(s)
is Θ(N²/V): doubling the corpus doubles every df AND doubles the
number of prefixes. The probe measures how much of that theoretical
worst case the full pipeline (prefix join + length filter + exact
confirm) actually pays.

The synthetic corpus is probe-only: it never feeds a correctness
query or oracle (the brief's test tables remain the only query
inputs), and it is written under /tmp.

Usage::

    python tools/containment_decade_probe.py [factor] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.operators.dedup import (  # noqa: E402
    containment_prefix_pairs,
)
from stock_price_analysis_using_flink_keyed_state_interfaces_and_rich_functions_spark.session import (  # noqa: E402
    get_spark,
)

BASE = "/root/testdata/sf0.1/documents.parquet"
PROBE_DIR = "/tmp/containment_probe"


def build_probe_corpus(spark, factor: int) -> str:
    out = os.path.join(PROBE_DIR, f"x{factor}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    import duckdb

    con = duckdb.connect()
    lens = [
        r[0]
        for r in con.sql(
            f"SELECT len(regexp_split_to_array(trim(text), '\\s+')) FROM '{BASE}' "
            "WHERE length(trim(coalesce(text,''))) > 0"
        ).fetchall()
    ]
    uni = con.sql(
        f"SELECT token, count(*) FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM '{BASE}') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vocab = np.array([t for t, _ in uni])
    p = np.array([c for _, c in uni], dtype="float64")
    p /= p.sum()
    n_docs = len(lens) * factor
    rng = np.random.default_rng(8)
    doc_lens = rng.choice(np.array(lens), size=n_docs, replace=True)
    rows = []
    for i, L in enumerate(doc_lens):
        rows.append((int(i), " ".join(rng.choice(vocab, size=int(L), p=p))))
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(out)
    return out


def time_containment(spark, path: str, n_runs: int) -> tuple[float, int]:
    df = spark.read.parquet(path)
    n_pairs = 0
    times = []
    for i in range(n_runs + 1):  # +1 untimed codegen warmup
        t0 = time.time()
        n_pairs = containment_prefix_pairs(df, "doc_id", "text").count()
        if i:
            times.append(time.time() - t0)
    return sorted(times)[len(times) // 2], n_pairs


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("containment_probe")
    base_sec, base_pairs = time_containment(spark, BASE, n_runs)
    probe = build_probe_corpus(spark, factor)
    probe_sec, probe_pairs = time_containment(spark, probe, n_runs)
    print(
        f"| dedup_containment_quotes decade probe | sf0.1 (5k docs) {base_sec:.2f}s "
        f"({base_pairs} pairs) | x{factor} probe ({5000*factor} docs) {probe_sec:.2f}s "
        f"({probe_pairs} pairs) | x{probe_sec/base_sec:.2f} at {factor}x docs |"
    )


if __name__ == "__main__":
    main()
