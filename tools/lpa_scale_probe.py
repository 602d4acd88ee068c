"""LPA 1x/8x replicated-graph scaling probe (VERDICT r9 task #7).

The r9 kcore probe (BASELINE.md r9) measured 8x data = 1.70x wall for
the peel. LPA shares the per-round cost shape (2 edge joins + 1 agg)
but NOT the convergence dynamics: peeling monotonically SHRINKS the
active set, while LPA's label cardinality falls without shrinking the
voting relation — so its scaling is worth measuring, not asserting.

Methodology = the kcore probe verbatim: lineitem replicated 8x with
per-replica orderkey AND partkey shifts, so the recurrent co-purchase
graph becomes 8 DISJOINT isomorphic copies — identical
rounds-to-converge by construction (each copy votes independently),
8x nodes/edges/baskets; the probe isolates per-round shuffle scaling
from convergence drift. Min-of-3 after a warm-up run, fixpoint
short-circuit active on both scales. Also prints rounds-to-converge
(first round with n_changed == 0) at both scales.

Usage: python tools/lpa_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/lpa_scale_probe"
RUNS = 3


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
    fn = REGISTRY["label_propagation_communities"].fn

    def measure(sf_dir: str) -> tuple[float, int, int, int]:
        rows = fn(spark, sf_dir).collect()  # warm-up + convergence stats
        spark.catalog.clearCache()
        conv = min(
            (r["round_i"] for r in rows if r["n_changed"] == 0),
            default=-1,
        )
        n_nodes, n_edges = rows[0]["n_nodes"], rows[0]["n_edges"]
        walls = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return min(walls), conv, n_nodes, n_edges

    w1, c1, n1, e1 = measure(SF_DIR)
    w8, c8, n8, e8 = measure(d8)
    print("| scale | wall | rounds-to-converge | nodes | edges | "
          "ratio (8 = linear) |")
    print("|---|---|---|---|---|---|")
    print(f"| 1x | {w1:.2f} s | {c1} | {n1} | {e1} | — |")
    print(f"| 8x | {w8:.2f} s | {c8} | {n8} | {e8} | **{w8 / w1:.2f}** |")
    spark.stop()


if __name__ == "__main__":
    main()
