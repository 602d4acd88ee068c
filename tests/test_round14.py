"""Round 14 (optimization round 2) — focused pins for the round's
operator-internal changes.

Covers the streaming worker-handshake retry (VERDICT r13 item 1): the
classifier must recognize the Spark 4.1.2 connect-back timeout through a
py4j-style cause chain, the retry wrapper must re-run ONLY on that
signature, re-raise everything else untouched, and stay bounded.
"""

from __future__ import annotations

import pytest

from ecommerce_data_pipeline_spark.streaming.pipeline import (
    is_worker_handshake_timeout,
    run_stream_with_handshake_retry,
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"

_SIG = (
    "Query terminated with exception: Job aborted due to ... Caused by: "
    "java.net.SocketTimeoutException: Timed out while waiting for the "
    "Python worker to connect back"
)


def test_handshake_classifier_matches_message_and_cause_chain():
    assert is_worker_handshake_timeout(RuntimeError(_SIG))
    assert is_worker_handshake_timeout(
        RuntimeError("[CANNOT_OPEN_SOCKET] ... timed out")
    )
    # signature buried one level down the cause chain (py4j wrapping)
    inner = RuntimeError(_SIG)
    outer = RuntimeError("stream died")
    outer.__cause__ = inner
    assert is_worker_handshake_timeout(outer)
    assert not is_worker_handshake_timeout(ValueError("schema mismatch"))


def test_retry_retries_only_on_handshake_and_is_bounded():
    calls = {"n": 0}

    def flaky_then_ok() -> None:
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError(_SIG)

    run_stream_with_handshake_retry(flaky_then_ok, backoff_sec=0.0)
    assert calls["n"] == 2

    # non-handshake errors propagate immediately, no retry
    calls["n"] = 0

    def broken() -> None:
        calls["n"] += 1
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        run_stream_with_handshake_retry(broken, backoff_sec=0.0)
    assert calls["n"] == 1

    # a persistent handshake failure exhausts attempts and re-raises
    calls["n"] = 0

    def always_flaky() -> None:
        calls["n"] += 1
        raise RuntimeError(_SIG)

    with pytest.raises(RuntimeError):
        run_stream_with_handshake_retry(
            always_flaky, attempts=3, backoff_sec=0.0
        )
    assert calls["n"] == 3


# ---------------------------------------------------------------------------
# generalized_esd_outlier_test driver-fold parity (VERDICT r13 item 4):
# the r14 rewrite moves the five trim-round SELECTIONS (pure integer
# argmax) to a driver fold; every published float must stay
# BIT-IDENTICAL to the retained unrolled relational form — the pq_encode
# parity-pin precedent.


# ---------------------------------------------------------------------------
# Grading-slate emission pin (supersedes test_round13's --through 12
# pin, the established per-round pattern): GRADE_PRIORITY must be
# byte-identical to the staleness tool's emission — slate construction
# is a pure function of (registry, CORRECTNESS_r1..r13, pins), never
# hand order.

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_R14_SLATE_PINS = [
    # the 17 oracle-backed query paths optimization round 2 touched
    "streaming_flagship_certificate",
    "rendezvous_hashing_audit",
    "generalized_esd_outlier_test",
    "attribution_shapley_values",
    "link_prediction_resource_allocation",
    "qini_uplift_curve",
    "robust_regression_huber_irls",
    "als_implicit_step_certificate",
    "page_trend_yearly_revenue",
    "kendalls_w_concordance",
    "quade_weighted_friedman",
    "kcore_peel_certificate",
    "graph_core_decomposition_full",
    "label_propagation_communities",
    "modularity_lpa_communities",
    "hits_hub_authority",
    "dsir_importance_weights",
]


def test_slate_is_tool_emitted():
    """--through 13 caps the fold so this stays reproducible after the
    r14 driver artifacts land."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import grade_staleness

    from ecommerce_data_pipeline_spark.plans.registry import GRADE_PRIORITY

    emitted = grade_staleness.build_slate(_R14_SLATE_PINS, through=13)
    assert tuple(emitted) == GRADE_PRIORITY


# ---------------------------------------------------------------------------
# Node-relation broadcast gate (advisor r13): the graph tier's broadcast
# hints on node/vocab-bounded relations must degrade to shuffled joins
# via session conf, with identical values — a switch, not a code edit.


def test_node_broadcast_gate_degrades_to_shuffled_join(spark):
    from ecommerce_data_pipeline_spark.plans import REGISTRY
    from ecommerce_data_pipeline_spark.plans.scale import (
        NODE_BROADCAST_CONF,
    )

    fn = REGISTRY["kcore_peel_certificate"].fn
    try:
        spark.conf.set(NODE_BROADCAST_CONF, "true")
        with_hint = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        spark.catalog.clearCache()
        spark.conf.set(NODE_BROADCAST_CONF, "false")
        without = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        assert with_hint == without
    finally:
        spark.conf.unset(NODE_BROADCAST_CONF)
        spark.catalog.clearCache()


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_MID])
def test_generalized_esd_driver_fold_matches_unrolled(spark, sf_dir):
    from ecommerce_data_pipeline_spark.plans import REGISTRY
    from ecommerce_data_pipeline_spark.plans.analytics_series import (
        _generalized_esd_unrolled,
    )

    got = REGISTRY["generalized_esd_outlier_test"].fn(spark, sf_dir)
    ref = _generalized_esd_unrolled(spark, sf_dir)
    assert got.columns == ref.columns

    def canon(df):
        return sorted(
            tuple(repr(v) for v in row) for row in df.collect()
        )

    assert canon(got) == canon(ref)
