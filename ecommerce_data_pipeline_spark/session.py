"""SparkSession factory with scale-oriented defaults.

The engine targets large multi-executor clusters (the reference's Glue job
ran on Spark); locally we run ``local[N]`` but every config below is chosen
so the same plans hold on a 1000-executor cluster at 100 TB:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  sort-merge→broadcast conversion replace any hand-scheduling.
- Arrow on: pandas interchange and Pandas UDFs move columnar batches, not
  pickled rows.
- Shuffle partitions sized for the local core count; on a real cluster this
  is overridden (AQE coalescing makes the initial number non-critical).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ecommerce_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    cpus = cpus or DEFAULT_CPUS
    builder = SparkSession.builder.appName(app_name)
    # Respect an externally-configured master (spark-submit --master yarn,
    # spark.master in spark-defaults): builder-level .master() would
    # OVERRIDE the submit flag and silently pin a 1000-executor job to
    # local mode on the driver node. local[cpus] is only the fallback for
    # bare `python` invocations (tests, bench, the round driver).
    from pyspark import SparkConf

    if not SparkConf().contains("spark.master"):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Adaptive execution: coalesce post-shuffle partitions, split skewed
        # joins, convert to broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas interchange (similarity/multimodal UDF paths).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep timestamps deterministic regardless of host timezone.
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the default) is deprecated AND writes no min/max column
        # statistics, which silently disables footer-stats file pruning on
        # every timestamp sort/partition key — at 100 TB that is the
        # difference between pruning a range scan and reading the table.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Local-mode memory headroom; ignored when a real cluster submits.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
