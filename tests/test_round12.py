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


# ---------------------------------------------------------------------------
# jonckheere_terpstra_priority_trend


def test_jonckheere_terpstra_matches_bruteforce_replay(spark):
    """Independent replay (ARCHITECTURE §21): JT by DIRECT pair
    enumeration over the raw sf0.001 rows (no histograms, no windows),
    the Hollander-Wolfe tie-corrected variance written fresh from the
    textbook form, plus the pair-count identity
    sum_{i<j} (U2_ij + U2_ji) = 2 * sum_{i<j} n_i n_j."""
    import math

    from ecommerce_data_pipeline_spark.plans.hypothesis_ladder import (
        jonckheere_terpstra_priority_trend,
    )
    from ecommerce_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE
    from collections import defaultdict

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .selectExpr(
            "o_orderpriority AS g",
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v",
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r.g].append(int(r.v))
    keys = sorted(groups)
    u2 = u2_rev = 0
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            for x in groups[keys[i]]:
                for y in groups[keys[j]]:
                    if x < y:
                        u2 += 2
                    elif x == y:
                        u2 += 1
                        u2_rev += 1
                    else:
                        u2_rev += 2
    ngs = [len(groups[k]) for k in keys]
    n = sum(ngs)
    # identity: forward + reverse doubled counts cover every inter-group pair
    assert u2 + u2_rev == 2 * sum(
        ngs[i] * ngs[j]
        for i in range(len(ngs))
        for j in range(i + 1, len(ngs))
    )
    mean2 = (n * n - sum(g * g for g in ngs)) // 2
    tie = defaultdict(int)
    for vals in groups.values():
        for v in vals:
            tie[v] += 1
    tv = list(tie.values())
    var = (
        (
            n * (n - 1) * (2 * n + 5)
            - sum(g * (g - 1) * (2 * g + 5) for g in ngs)
            - sum(t * (t - 1) * (2 * t + 5) for t in tv)
        )
        / 72.0
        + sum(g * (g - 1) * (g - 2) for g in ngs)
        * sum(t * (t - 1) * (t - 2) for t in tv)
        / (36.0 * n * (n - 1) * (n - 2))
        + sum(g * (g - 1) for g in ngs)
        * sum(t * (t - 1) for t in tv)
        / (8.0 * n * (n - 1))
    )
    z = (u2 - mean2) / (2.0 * math.sqrt(var))

    got = jonckheere_terpstra_priority_trend(spark, SF_SMOKE).collect()[0]
    assert got["k_groups"] == len(keys)
    assert got["n"] == n
    assert got["jt_u2"] == u2
    assert got["mean_u2"] == mean2
    assert math.isclose(got["z_score"], round(z, 6), abs_tol=2e-6)


def test_jonckheere_terpstra_hand_pinned_example(spark):
    """Hand-pinned 3-group example with a planted tie across groups:
    A=(1,3), B=(2,3), C=(4,5). Forward pair walks: A-B pairs
    (1<2, 1<3, 3>2, 3=3) -> U2=2+2+0+1=5; A-C all four < -> 8;
    B-C all four < -> 8; total U2=21. n=6, sum ng^2=12 ->
    mean2=(36-12)/2=12."""
    df = spark.createDataFrame(
        [("A", 1), ("A", 3), ("B", 2), ("B", 3), ("C", 4), ("C", 5)],
        ["g", "v"],
    )
    # The registered plan loads the orders table, so the window pipeline
    # is rebuilt here over the tiny relation with the same shape; the
    # EXPECTED value 21 is hand-derived above, which is what makes this
    # a check of the formula rather than a mirror of it.
    import pyspark.sql.functions as F

    cells = df.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    from pyspark.sql import Window

    gs = cells.select("g").distinct()
    vs = cells.select("v").distinct()
    grid = gs.crossJoin(vs).join(cells, ["g", "v"], "left").select(
        "g", "v", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt")
    )
    w_eq = Window.partitionBy("v").orderBy("g").rowsBetween(
        Window.unboundedPreceding, -1
    )
    eqlow = grid.select(
        "g", "v", "cnt",
        F.coalesce(F.sum("cnt").over(w_eq), F.lit(0).cast("long")).alias("eq_low"),
    )
    w_blw = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    blw = eqlow.select(
        "cnt", "eq_low",
        F.coalesce(F.sum("eq_low").over(w_blw), F.lit(0).cast("long")).alias(
            "blw_low"
        ),
    )
    u2 = blw.agg(
        F.sum(
            F.col("cnt").cast("decimal(38,0)")
            * (2 * F.col("blw_low") + F.col("eq_low"))
        ).alias("u2")
    ).collect()[0]["u2"]
    assert int(u2) == 21


# ---------------------------------------------------------------------------
# moods_median_test


def test_moods_median_matches_python_replay(spark):
    """Independent replay: median by SORTING the raw sf0.001 values
    (lower median = element at index ceil(n/2)-1), per-segment
    above/at-or-below counts by direct comparison, chi2 by the textbook
    2 x k loop — no histograms, no windows."""
    import math
    from collections import defaultdict

    from ecommerce_data_pipeline_spark.plans.hypothesis_ladder import (
        moods_median_test,
    )
    from ecommerce_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .selectExpr(
            "c_mktsegment AS segment",
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v",
        )
        .collect()
    )
    vals = sorted(int(r.v) for r in rows)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median
    above = defaultdict(int)
    total = defaultdict(int)
    for r in rows:
        total[r.segment] += 1
        if int(r.v) > med:
            above[r.segment] += 1
    a_tot = sum(above.values())

    got = {r["segment"]: r for r in moods_median_test(spark, SF_SMOKE).collect()}
    assert set(got) == set(total)
    for seg in total:
        e_a = total[seg] * a_tot / n
        e_b = total[seg] * (n - a_tot) / n
        o_a = above[seg]
        o_b = total[seg] - o_a
        contrib = (o_a - e_a) ** 2 / e_a + (o_b - e_b) ** 2 / e_b
        row = got[seg]
        assert row["median_cents"] == med
        assert row["n_g"] == total[seg]
        assert row["n_above"] == o_a
        assert row["n_at_or_below"] == o_b
        assert math.isclose(row["expected_above"], round(e_a, 6), abs_tol=1e-9)
        assert math.isclose(
            row["chi2_contribution"], round(contrib, 6), abs_tol=2e-6
        )


def test_moods_median_hand_pinned_example():
    """Hand-pinned lower-median convention: for n=4 values (1,2,3,4)
    the lower median is the ceil(4/2)=2nd order statistic = 2; for n=5
    values (1,2,3,4,5) it is the 3rd = 3 — the (n+1)//2 position the
    plan and oracle both read off the cumulative histogram."""
    for vals, want in ([1, 2, 3, 4], 2), ([1, 2, 3, 4, 5], 3):
        assert vals[(len(vals) + 1) // 2 - 1] == want
