"""Property tests for the round-12 fixes/additions. First: the
chi_square_contingency zero-cell repair (r11 verdict task #1) — the
statistic must be computed over the DENSE marginal grid, so a planted
EMPTY (segment, priority) cell contributes (0 - e)^2 / e. The replay
cross-checks an independent textbook computation on a hand-built tiny
table (ARCHITECTURE §21: never mirror the plan's own algebra).
"""

from __future__ import annotations

import math

from ecommerce_data_pipeline_spark.plans.profiling import _chi_square_grid


def test_chi_square_planted_empty_cell(spark):
    """2x2 design where one cell is EMPTY: textbook chi2 over the full
    grid includes the empty cell's (0 - e)^2 / e term; the pre-r12
    observed-cells-only form would drop it. Verifies (a) the grid row
    for the empty cell exists with observed=0, (b) every cell's
    expected and contribution match the textbook values at 6dp, and
    (c) the summed statistic equals the full-grid chi2 — which differs
    from the observed-only sum, so the test can actually fail."""
    rows = (
        [("A", "P1")] * 6
        + [("A", "P2")] * 4
        + [("B", "P1")] * 5
        # (B, P2) planted empty
    )
    joined = spark.createDataFrame(rows, ["segment", "priority"])
    out = {
        (r["segment"], r["priority"]): r
        for r in _chi_square_grid(joined).collect()
    }

    # textbook: observed grid with the empty cell explicit
    obs = {("A", "P1"): 6, ("A", "P2"): 4, ("B", "P1"): 5, ("B", "P2"): 0}
    n = sum(obs.values())
    rt = {"A": 10, "B": 5}
    ct = {"P1": 11, "P2": 4}
    assert set(out) == set(obs), "dense grid must include the empty cell"

    chi2_full = 0.0
    for (s, p), o in obs.items():
        e = rt[s] * ct[p] / n
        contrib = (o - e) ** 2 / e
        chi2_full += contrib
        row = out[(s, p)]
        assert row["observed"] == o
        assert math.isclose(row["expected"], round(e, 6), abs_tol=1e-9)
        assert math.isclose(
            row["chi2_contribution"], round(contrib, 6), abs_tol=1e-9
        )

    engine_chi2 = sum(r["chi2_contribution"] for r in out.values())
    assert math.isclose(engine_chi2, chi2_full, abs_tol=5e-6)
    # the regression this guards: observed-only sum omits the empty
    # cell's full expected mass — materially smaller
    chi2_observed_only = chi2_full - (rt["B"] * ct["P2"] / n)
    assert engine_chi2 > chi2_observed_only + 1.0
