"""Cold-cache scale_mode A/B (VERDICT r9 task #3).

The r9 warm A/B (BASELINE.md r9) found NO crossover for
``spark.graft.scaleMode=cluster`` even at 8x data: on one node a
page-cached columnar re-scan is nearly free, so the pipelined
(unpinned) form always wins and the pinned form's target regime —
expensive scans (remote object storage, contended IO) — looked
unreachable in this sandbox. This probe gives the pinned form its one
honest shot at winning HERE by making the scan expensive the only way
a local box allows: evicting the fixture's pages from the OS cache
(``posix_fadvise(POSIX_FADV_DONTNEED)``, verified ~20x cold/warm read
ratio on this host) immediately before every measured run, so each
redundant fact scan pays a real device read.

Methodology (the r9 A/B conventions, cold-adapted):
- 8x = id-shifted event replicas parquet-landed beside copies of the
  other tables; identical values across modes (verified by the r9
  parity pytest at sf0.001).
- Modes alternate REP BY REP within every (query, scale) cell so even
  monotonic host drift lands symmetrically on both modes, and each
  query is warmed once PER MODE so neither mode's whole-stage-codegen
  compilation is measured (both review r10); Spark cache cleared AND
  fixture pages evicted before every rep.
- MEDIAN of 3 cold reps (min would reward a rep where eviction raced a
  readahead; medians are stable to that).

Usage: python tools/cold_scale_probe.py  (writes the table to stdout;
the round's BASELINE.md section quotes it verbatim).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/cold_scale_probe"
QUERIES = [
    "hyperloglog_union_over_time",
    "histogram_quantile_window_merge",
    "group_k_anonymity_generalize",
]
REPS = 3


def evict_dir(path: str) -> None:
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            fd = os.open(p, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)


def build_fixtures(spark) -> tuple[str, str]:
    """(dir_1x, dir_8x): 1x = plain copy; 8x = events replicated with
    id shifts (disjoint event/user id spaces per replica), other
    tables shared copies."""
    from pyspark.sql import functions as F

    d1 = os.path.join(WORK, "sf_1x")
    d8 = os.path.join(WORK, "sf_8x")
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(d1)
    os.makedirs(d8)
    for f in os.listdir(SF_DIR):
        shutil.copy2(os.path.join(SF_DIR, f), os.path.join(d1, f))
        if f != "events.parquet":
            shutil.copy2(os.path.join(SF_DIR, f), os.path.join(d8, f))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    shift = 100_000_000
    reps = [
        ev.select(
            (F.col("event_id") + i * shift).alias("event_id"),
            "ts",
            (F.col("user_id") + i * shift).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(8)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(d8, "events.parquet")
    )
    return d1, d8


def main() -> None:
    from pyspark.sql import SparkSession

    from ecommerce_data_pipeline_spark.plans import REGISTRY
    from ecommerce_data_pipeline_spark.plans.scale import SCALE_MODE_CONF

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d1, d8 = build_fixtures(spark)

    def one_cold_rep(name: str, sf_dir: str, mode: str) -> float:
        spark.conf.set(SCALE_MODE_CONF, mode)
        spark.catalog.clearCache()
        evict_dir(sf_dir)
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = time.perf_counter() - t0
        spark.conf.set(SCALE_MODE_CONF, "local")
        spark.catalog.clearCache()
        return wall

    def run_cell_pair(name: str, sf_dir: str) -> tuple[float, float]:
        # REP-INTERLEAVED: local/cluster alternate rep by rep (review
        # r10: block-ordered reps let monotonic host drift land
        # asymmetrically on whichever mode runs second)
        local, cluster = [], []
        for _ in range(REPS):
            local.append(one_cold_rep(name, sf_dir, "local"))
            cluster.append(one_cold_rep(name, sf_dir, "cluster"))
        return statistics.median(local), statistics.median(cluster)

    # warm-up: codegen/compile each query once PER MODE (review r10:
    # a local-only warm-up left cluster's whole-stage-codegen
    # compilation inside its first measured rep)
    for name in QUERIES:
        for mode in ("local", "cluster"):
            spark.conf.set(SCALE_MODE_CONF, mode)
            REGISTRY[name].fn(spark, d1).write.mode("overwrite").format(
                "noop"
            ).save()
            spark.catalog.clearCache()
        spark.conf.set(SCALE_MODE_CONF, "local")

    print("| query | 1x local (cold) | 1x cluster (cold) "
          "| 8x local (cold) | 8x cluster (cold) |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        cells = []
        for sf_dir in (d1, d8):
            a, b = run_cell_pair(name, sf_dir)
            cells += [a, b]
        print(
            f"| {name} | " + " | ".join(f"{c:.3f} s" for c in cells) + " |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
