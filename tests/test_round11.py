"""Property tests for the round-11 additions: full core decomposition
(independent Matula-Beck Python replay with TRUE peel-to-fixpoint, so
the unroll-budget convergence certificate is itself checked), and the
mechanical slate-emission pin (r10 verdict task #8: GRADE_PRIORITY must
be byte-identical to tools/grade_staleness.py --slate output). Value
parity vs DuckDB is covered by the registry-wide diff in test_oracle.py.
"""

from __future__ import annotations

import os
import sys

from ecommerce_data_pipeline_spark.plans.registry import REGISTRY
from ecommerce_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# graph_core_decomposition_full


def test_core_decomposition_matches_python_matula_beck(spark):
    """Independent replay: build the support-thresholded co-purchase
    edges in Python, compute TRUE per-node coreness by peeling each
    k-core to an honest fixpoint (no unroll budget — this independently
    validates the plan's converged certificate, not just its values),
    and compare every node's coreness plus both certificate flags."""
    from collections import Counter, defaultdict

    from ecommerce_data_pipeline_spark.plans.analytics_graph import (
        _CORE_KMAX,
        _KCORE_MIN_SUPPORT,
    )

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    support = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    edges = [e for e, c in support.items() if c >= _KCORE_MIN_SUPPORT]
    all_nodes = {n for e in edges for n in e}

    def k_core(k: int, start: set) -> set:
        active = set(start)
        while True:
            deg = Counter()
            for u, v in edges:
                if u in active and v in active:
                    deg[u] += 1
                    deg[v] += 1
            nxt = {n for n in active if deg[n] >= k}
            if nxt == active:
                return active
            active = nxt

    coreness = dict.fromkeys(all_nodes, 0)
    core = all_nodes
    for k in range(1, _CORE_KMAX + 1):
        core = k_core(k, core)
        for n in core:
            coreness[n] = k
    probe = k_core(_CORE_KMAX + 1, core)

    rows = (
        REGISTRY["graph_core_decomposition_full"].fn(spark, SF_SMOKE).collect()
    )
    assert len(rows) == len(all_nodes)
    for r in rows:
        assert r.coreness == coreness[r.node], r.node
        assert r.truncated == (len(probe) > 0)
        # the replay peels to a true fixpoint, so if values agree the
        # plan's budget-bounded peel must have converged as it claims
        assert r.converged
    # nesting sanity: core sizes are monotone non-increasing in k
    sizes = [
        sum(1 for c in coreness.values() if c >= k)
        for k in range(1, _CORE_KMAX + 1)
    ]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))


# ---------------------------------------------------------------------------
# mechanical slate emission (r10 verdict task #8)

# The exact pins the r11 slate was generated with (recorded verbatim in
# the registry.py comment): plans touched this round + the four r10
# bench movers under bracketed re-measure.
_R11_SLATE_PINS = [
    "hits_hub_authority",
    "consistent_hashing_rebalance_audit",
    "logrank_survival_test",
    "cf_holdout_hitrate",
    "stupid_backoff_trigram_score",
    "rrf_rank_fusion",
]


def test_slate_is_tool_emitted():
    """GRADE_PRIORITY must be byte-identical to the tool's emission at
    --through 10 with the recorded pins — slate construction is a pure
    function of (registry, CORRECTNESS_r1..r10, pins), never hand
    order. --through caps the fold so this stays reproducible after
    the r11 driver artifacts land."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import grade_staleness

    from ecommerce_data_pipeline_spark.plans.registry import GRADE_PRIORITY

    emitted = grade_staleness.build_slate(_R11_SLATE_PINS, through=10)
    assert tuple(emitted) == GRADE_PRIORITY
