"""1x/8x replicated-graph scaling probe for the three NEW r11 iterative
graph operators: graph_core_decomposition_full (nested k-core ladder),
ktruss_peel_certificate (edge peel with per-round support recounts),
and modularity_lpa_communities (LPA vote loop + scoring pass).

Methodology = the kcore/LPA/HITS probes verbatim (BASELINE.md r9/r10):
lineitem replicated 8x with per-replica orderkey AND partkey shifts, so
the recurrent co-purchase graph becomes 8 DISJOINT isomorphic copies —
identical rounds-to-fixpoint by construction, 8x nodes/edges/baskets;
the probe isolates per-round shuffle scaling from convergence drift.
Min-of-RUNS after a warm-up execution, fixpoint short-circuits active
at both scales.

Usage: python tools/r11_graph_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/r11_graph_scale_probe"
RUNS = 3
QUERIES = (
    "graph_core_decomposition_full",
    "ktruss_peel_certificate",
    "modularity_lpa_communities",
)


def build_fixture(spark) -> str:
    from pyspark.sql import functions as F

    d8 = os.path.join(WORK, "sf_8x")
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(d8)
    for f in os.listdir(SF_DIR):
        if f != "lineitem.parquet":
            shutil.copy2(os.path.join(SF_DIR, f), os.path.join(d8, f))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    oshift, pshift = 1_000_000_000, 100_000_000
    reps = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + i * oshift)
        .withColumn("l_partkey", F.col("l_partkey") + i * pshift)
        for i in range(8)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(d8, "lineitem.parquet")
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

    def measure(name: str, sf_dir: str) -> float:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        walls = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return min(walls)

    print("| query | 1x wall | 8x wall | ratio (8 = linear) |")
    print("|---|---|---|---|")
    for name in QUERIES:
        w1 = measure(name, SF_DIR)
        w8 = measure(name, d8)
        print(f"| {name} | {w1:.2f} s | {w8:.2f} s | **{w8 / w1:.2f}** |")
    spark.stop()


if __name__ == "__main__":
    main()
