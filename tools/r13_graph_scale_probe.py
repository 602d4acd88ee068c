"""10x data-scaling probe for the iterative graph tier: wall at sf0.01
vs sf0.1 for the four most expensive suite queries at r12 HEAD (the
only tier without a published 10x fixture ratio — the existing graph
probes are 1x/8x REPLICATED-graph runs at sf0.1, which hold
rounds-to-fixpoint constant to isolate per-round shuffle scaling; this
probe is the complementary honest data-scaling number, where
convergence rounds MAY differ between scales and that difference is
part of the measurement).

What each ratio certifies (r12 verdict task #4):
- graph_core_decomposition_full: nested k-core ladder — rung count is
  bounded by the max core number (degree-sequence-driven), per-rung
  cost by the surviving edge set.
- hits_hub_authority: 3 FIXED rounds (the r11 knee analysis), so the
  ratio is pure per-round edge-relation scaling.
- modularity_lpa_communities: vote rounds bounded by KMAX; the
  co-purchase edge relation follows the support-thresholded degree
  sequence, not raw lineitem size.
- ktruss_peel_certificate: peel rounds bounded by support decay; each
  round recounts triangle support on the surviving edges.

Min-of-RUNS after a warm-up execution at each scale.

Usage: python tools/r13_graph_scale_probe.py
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
    "graph_core_decomposition_full",
    "hits_hub_authority",
    "modularity_lpa_communities",
    "ktruss_peel_certificate",
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
