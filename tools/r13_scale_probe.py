"""10x data-scaling probe for the round-13 arrivals: wall at sf0.01 vs
sf0.1 for the seven non-eager new operators (the eager
decontam_monitor_stream_certificate runs a full streaming lifecycle at
call time and is probed by its own pytests instead — the
mixture-certificate convention).

What each ratio certifies:
- decontamination_growth_monitor: one corpus shingle pass + a
  broadcast join against the (tiny) benchmark gram index; the shard
  windows run over the benchmark spine. Documents grow 10x at sf0.1.
- page_trend / kendalls_w / quade: one fact aggregate to the m x k
  segment-year grid; everything after is taxonomy x calendar bounded.
- cramer_von_mises: the two-segment distinct-value histogram (2dp
  price grid saturates sublinearly — the ansari/moods contract).
- lang_temperature_sampling_weights: one language-keyed token-mass
  aggregate; O(#langs) rows after the first pass.
- keyness_chi2_terms: explode -> term-keyed agg (map-side combined),
  1-row marginal broadcast, TakeOrdered top-20.

Min-of-RUNS after a warm-up execution at each scale.

Usage: python tools/r13_scale_probe.py
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
    "decontamination_growth_monitor",
    "page_trend_yearly_revenue",
    "kendalls_w_concordance",
    "quade_weighted_friedman",
    "cramer_von_mises_two_sample",
    "lang_temperature_sampling_weights",
    "keyness_chi2_terms",
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
