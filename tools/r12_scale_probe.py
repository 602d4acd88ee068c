"""10x data-scaling probe for the round-12 arrivals: wall at sf0.01 vs
sf0.1 (10x orders / 10x documents) for the seven new batch operators.

Unlike the iterative-graph probes (which replicate the graph to hold
rounds-to-fixpoint constant), the r12 arrivals are all SINGLE-PASS
plans — one fact aggregate plus metadata/value-domain-bounded joins
and windows — so the honest scaling measurement is simply the two
fixture scales. The quantity each ratio certifies:

- jonckheere_terpstra / moods_median / cliffs_delta / hellinger: the
  value-domain histogram grows sublinearly in rows (2dp price grid
  saturates), so wall should grow FAR below 10x.
- mixture_convergence_monitor: batches grow linearly with documents
  (37-doc arrival batches), sources fixed — near-flat per-batch cost.
- cochran_armitage: k=5 scalar fold — wall should be scan-bound.
- link_prediction_resource_allocation: wedge volume follows the
  support-thresholded degree sequence (the copurchase contract).

Min-of-RUNS after a warm-up execution at each scale.

Usage: python tools/r12_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 3
SMALL = "/root/testdata/sf0.01"
LARGE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (
    "jonckheere_terpstra_priority_trend",
    "moods_median_test",
    "cliffs_delta_segments",
    "hellinger_price_drift",
    "cochran_armitage_priority_trend",
    "mixture_convergence_monitor",
    "link_prediction_resource_allocation",
)


def main() -> None:
    from ecommerce_data_pipeline_spark.plans import REGISTRY
    from ecommerce_data_pipeline_spark.session import get_spark

    spark = get_spark()

    def measure(name: str, sf_dir: str) -> float:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.monotonic() - t0)
        return best

    print(f"{'query':42s} {'sf0.01':>8s} {'sf0.1':>8s} {'10x-ratio':>9s}")
    for name in QUERIES:
        s = measure(name, SMALL)
        l = measure(name, LARGE)
        print(f"{name:42s} {s:8.3f} {l:8.3f} {l / s:9.2f}")


if __name__ == "__main__":
    main()
