"""PySpark-native analytics engine with the query and data-processing
capabilities of kundan59/Stock-Price-Analysis-using-Flink-Keyed-state-interfaces-and-Rich-Functions
(reference surveyed in SURVEY.md), rebuilt Spark-first.

The reference is four Flink DataStream jobs over daily OHLCV stock quotes,
each demonstrating one keyed-state primitive inside a RichFlatMapFunction
(reference: src/main/java/org/knoldus/flink/state/*.java). This engine
re-expresses that capability surface — stateful keyed aggregation over
time series — as declarative DataFrame / SQL plans that Catalyst optimizes,
plus Structured Streaming for incremental execution, plus the relational
and LLM-data-pipeline operator families in SURVEY.md §2.6.

Package layout (all modules listed here ship and are tested):
  session    — SparkSession factory (AQE on, UTC, Arrow)
  schemas    — canonical StructTypes (quotes, TPC-H-ish, events, documents,
               embeddings)
  sources    — readers (CSV w/ header+ragged-null tolerance, Parquet;
               streaming file sources) and sinks
  operators  — stateful (W1–W4 batch forms), windows, joins (incl. as-of /
               range), topk, setops, rollup, dedup (exact / MinHash-LSH /
               SimHash / n-gram Jaccard / dup-cluster connected
               components), sampling (deterministic md5-bucket, plain +
               stratified mixture), similarity (cosine top-k, hyperplane
               LSH, IVF), text (tokens, quality, lang-id, fingerprints,
               repetition stats, decontamination), multimodal (binary
               payloads + mapInPandas)
  functions  — scalar date/string/json helpers (events.props extraction)
  udfs       — UDF surface: Python UDF / pandas UDF / UDTF registration
  plans      — plan-inspection helpers (pushdown / broadcast assertions)
  streaming  — applyInPandasWithState ports of W1–W4, watermarked
               time/session windows, memory-sink test harness
"""

__version__ = "0.1.0"
