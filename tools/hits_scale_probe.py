"""HITS 1x/8x replicated-graph scaling probe (r10, the kcore/LPA
methodology applied to the round's new heaviest headline query).

lineitem AND orders are replicated 8x with a SHARED per-replica
orderkey shift (preserving the join) plus suppkey/custkey shifts, so
the supplier→customer trade graph becomes 8 disjoint isomorphic
bipartite copies: per-round shuffle volume scales 8x while the
fixed-round power iteration (4 rounds, quantized) is identical by
construction. Min-of-3 after warm-up.

Usage: python tools/hits_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/hits_scale_probe"
RUNS = 3


def build_fixture(spark) -> str:
    from pyspark.sql import functions as F

    d8 = os.path.join(WORK, "sf_8x")
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(d8)
    for f in os.listdir(SF_DIR):
        if f not in ("lineitem.parquet", "orders.parquet"):
            shutil.copy2(os.path.join(SF_DIR, f), os.path.join(d8, f))
    oshift, sshift, cshift = 1_000_000_000, 10_000_000, 100_000_000
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    reps = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + i * oshift)
        .withColumn("l_suppkey", F.col("l_suppkey") + i * sshift)
        for i in range(8)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(d8, "lineitem.parquet")
    )
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    reps = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + i * oshift)
        .withColumn("o_custkey", F.col("o_custkey") + i * cshift)
        for i in range(8)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(d8, "orders.parquet")
    )
    return d8


def main() -> None:
    from pyspark.sql import SparkSession

    from ecommerce_data_pipeline_spark.plans import REGISTRY

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d8 = build_fixture(spark)
    fn = REGISTRY["hits_hub_authority"].fn

    def measure(sf_dir: str) -> tuple[float, int]:
        n = fn(spark, sf_dir).count()  # warm-up, also the node count
        spark.catalog.clearCache()
        walls = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return min(walls), n

    w1, n1 = measure(SF_DIR)
    w8, n8 = measure(d8)
    print("| scale | wall | nodes (hubs+authorities) | ratio (8 = linear) |")
    print("|---|---|---|---|")
    print(f"| 1x | {w1:.2f} s | {n1} | — |")
    print(f"| 8x | {w8:.2f} s | {n8} | **{w8 / w1:.2f}** |")
    spark.stop()


if __name__ == "__main__":
    main()
