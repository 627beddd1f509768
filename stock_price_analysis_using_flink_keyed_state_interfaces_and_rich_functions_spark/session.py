"""SparkSession factory.

The reference acquires its runtime via
``StreamExecutionEnvironment.getExecutionEnvironment()`` with zero tuning
(MaximumClosingPrice.java:23-24). We centralize session construction so
every entry point gets the same scale-conscious defaults:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  selection) — load-bearing at the 100 TB design point.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; on a real
  cluster this would be ~2-3× total executor cores (AQE coalesces down).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "spark_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a cluster deployment ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    resolved_master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(resolved_master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime Bloom-filter join pruning: for a selective build side,
        # inject a bloom filter into the probe-side scan so most
        # non-matching fact rows die before the shuffle — at 100 TB this
        # is often the single biggest shuffle reducer on star joins.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        # documents/embeddings rows are wide (text, 64-float vectors);
        # keep split sizes default but cap in-memory batches sanely.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    if resolved_master.startswith("local"):
        # local mode = ONE JVM for driver + all executor threads; Spark's
        # 1g default heap OOMs 32 concurrent hash aggregates long before
        # the box runs out. Cluster deployments size the driver via
        # spark-submit, so the default is gated to local masters only.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    # Scale-dependent settings stay PARAMETERIZED (optimization-round
    # rule: no constants tuned for local[32]): $SPARK_GRAFT_CONF is a
    # ';'-separated k=v list applied last, so a cluster deployment (or
    # an A/B experiment) can override any default above without code
    # edits, e.g. SPARK_GRAFT_CONF="spark.sql.adaptive.advisoryPartitionSizeInBytes=256m".
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in env_conf.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
