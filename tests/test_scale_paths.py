"""Tests for the scale-path mechanics: sketch-aggregate accuracy,
bucketed co-located joins (zero-shuffle), and plan-shape assertions
(broadcast joins, filter pushdown) — the properties that must hold at
100 TB, checked on the small fixture.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans.registry import REGISTRY
from ecommerce_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_count_distinct_within_rsd(spark):
    """approx_aggregates error-bound certificate, re-derived at r13
    HEAD (verdict r12 task #5): measured HLL rel-err across
    sf0.001/0.01/0.1 = 6.38% / 3.64% / 1.81% against the 15% (3*rsd)
    bound — 2.35x headroom at the worst fixture; GK approx-median
    rel-err = 0.03% / 0.11% / 0.03% against a 1% bound (the
    sketch_error_certificate contract, which replaces the pre-r13
    order-of-magnitude range check here)."""
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = REGISTRY["approx_aggregates"].fn(spark, SF_SMOKE).collect()[0]
    exact = li.select("l_orderkey").distinct().count()
    # rsd=0.05 → allow 3 sigma
    assert abs(out["approx_orders"] - exact) / exact < 0.15
    exact_med = float(
        li.agg(F.percentile("l_extendedprice", F.lit(0.5))).collect()[0][0]
    )
    assert abs(out["approx_median_price"] - exact_med) / exact_med < 0.01


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketing both sides on the join key removes the last fact shuffle
    (SURVEY.md §7 / pipeline.py note): the sort-merge join reads
    pre-bucketed files with zero Exchange operators."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders")
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bucketed_test.li_b")
        )
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bucketed_test.ord_b")
        )
        # disable broadcast so the join would otherwise need a shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bucketed_test.li_b").join(
            spark.table("bucketed_test.ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == li.count()
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join should not shuffle:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.sql("DROP TABLE IF EXISTS bucketed_test.li_b")
        spark.sql("DROP TABLE IF EXISTS bucketed_test.ord_b")
        spark.sql("DROP DATABASE IF EXISTS bucketed_test")
        shutil.rmtree("/tmp/engine-tests-warehouse", ignore_errors=True)


def test_flagship_bucketed_zero_fact_shuffle(spark):
    """Stretch path (pipeline.py note): with lineitem and orders persisted
    as same-bucket-count bucketed tables, the FULL flagship plan joins the
    fact stream with zero Exchange operators — the only remaining
    hashpartitioning exchange is the final (brand × segment) aggregate.
    Results must be identical to the unbucketed flagship."""
    from ecommerce_data_pipeline_spark.pipeline import (
        bucket_fact_tables,
        flagship_revenue,
        flagship_revenue_over,
    )

    li_name, ord_name = bucket_fact_tables(
        spark, SF_SMOKE, database="bucketed_flagship", n_buckets=8
    )
    # capture PRIOR values so the finally block restores the session as
    # it was (hardcoding "restored" values leaked a disabled AQE
    # broadcast threshold into every later test in the shared session)
    prior_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prior_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        # disable broadcast for the fact⋈orders join so only bucketing can
        # remove its shuffle (dims still broadcast via explicit hint)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = flagship_revenue_over(
            spark.table(li_name),
            spark.table(ord_name),
            load_table(spark, SF_SMOKE, "part"),
            load_table(spark, SF_SMOKE, "customer"),
            co_located=True,
        )
        plan = _executed_plan(out)
        assert plan.count("BroadcastHashJoin") >= 2  # dims still broadcast
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, (
            f"bucketed flagship should only shuffle the final aggregate, "
            f"got {n_exchanges} exchanges:\n{plan[:3000]}"
        )
        expected = {
            tuple(r) for r in flagship_revenue(spark, SF_SMOKE).collect()
        }
        assert {tuple(r) for r in out.collect()} == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_static)
        if prior_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prior_aqe
            )
        spark.sql("DROP TABLE IF EXISTS bucketed_flagship.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bucketed_flagship.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bucketed_flagship")


def test_flagship_plan_shape(spark):
    """The flagship plan holds its contract: dims broadcast, exactly one
    hash-partitioning exchange for the fact side (+1 for the final agg)."""
    from ecommerce_data_pipeline_spark.pipeline import flagship_revenue

    plan = _executed_plan(flagship_revenue(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2  # part + customer dims
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"fact should shuffle once (+agg): {n_exchanges}"
    # column pruning reaches the fact scan: the dedup min-struct must not
    # drag unconsumed columns through the aggregate (the one full-width
    # scan an all-HEADLINE ReadSchema audit found, fixed r6)
    li_scan_lines = [
        line
        for line in plan.splitlines()
        if "FileScan parquet" in line and "lineitem" in line
    ]
    assert li_scan_lines, "no lineitem FileScan matched — plan format drift?"
    for line in li_scan_lines:
        assert "l_tax" not in line and "l_shipdate" not in line, line
        assert "l_suppkey" not in line and "l_returnflag" not in line, line


def test_filter_pushdown_reaches_scan(spark):
    """P5 predicates appear as PushedFilters in the Parquet scan, and
    column pruning shrinks ReadSchema to the selected columns."""
    q = REGISTRY["filter_predicates"].fn(spark, SF_SMOKE)
    plan = _executed_plan(q)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,30" in plan.replace(" ", "")
    # pruned: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_tax" not in read_schema and "l_shipdate" not in read_schema


def test_topk_plans_take_ordered(spark):
    """O3: orderBy+limit must plan as TakeOrderedAndProject (per-partition
    heaps), not a global Sort."""
    plan = _executed_plan(REGISTRY["top_k_customers"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_dynamic_partition_pruning(spark):
    """DPP: a join against a filtered dim prunes the partitioned fact's
    directories at runtime — the partition-pruning story of the
    reference's time-partitioned landing zone, upgraded from static to
    dynamic (SURVEY.md §4)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from ecommerce_data_pipeline_spark.sources.writers import (
        write_partitioned_parquet,
    )

    d = _tempfile.mkdtemp(prefix="dpp_")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        write_partitioned_parquet(orders, "o_orderdate", f"{d}/orders", "year")
        fact = spark.read.parquet(f"{d}/orders")
        # dim: one row per year, filtered to a single year
        years = fact.select("year").distinct().filter(F.col("year") == 1997)
        joined = fact.join(years.hint("broadcast"), "year")
        plan = _executed_plan(joined)
        assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(year" in plan, plan[:2000]
        expected = orders.filter(F.year("o_orderdate") == 1997).count()
        assert joined.count() == expected
    finally:
        _shutil.rmtree(d, ignore_errors=True)


def test_topk_per_group_plans_window_group_limit(spark):
    """Top-k-per-group (rank filter over a window) must plan as
    WindowGroupLimit — per-partition k-heaps BEFORE the shuffle/sort —
    not a full window sort of every group. At 100 TB this is the
    difference between shuffling k rows per group and shuffling the
    corpus. Guarded for the ANN scorers (full-corpus fan-in per query)
    and the per-group ranking query."""
    for q in ("embedding_cosine_topk", "window_rank_in_group"):
        plan = _executed_plan(REGISTRY[q].fn(spark, SF_SMOKE))
        assert "WindowGroupLimit" in plan, f"{q}: no WindowGroupLimit\n{plan[:2000]}"


def test_document_queries_prune_columns(spark):
    """Column pruning must reach the documents scan: row-local text
    queries read ONLY (doc_id, text) — never lang/source/n_chars they
    don't use. At 100 TB the unused columns are most of the bytes."""
    import re

    from ecommerce_data_pipeline_spark.plans import REGISTRY

    expect = {
        "gopher_quality_flags": {"doc_id", "text"},
        "cross_doc_substring_dups": {"doc_id", "text"},
        "doc_fingerprint": {"doc_id", "text"},
    }
    for name, want in expect.items():
        plan = (
            REGISTRY[name]
            .fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
            cols = {c.split(":")[0] for c in schema.split(",") if c}
            assert cols <= want, f"{name} scans unpruned columns: {cols - want}"


def test_item_item_cf_plans_equi_join_not_cartesian(spark):
    """item_item_cf_topk's pair stage must execute as an equi-join on
    l_orderkey — a CartesianProduct/BroadcastNestedLoopJoin would mean
    the basket key fell out of the join condition (O(N²) at scale)."""
    df = REGISTRY["item_item_cf_topk"].fn(spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_rankings_plan_take_ordered(spark):
    """rrf_rank_fusion's per-ranker top-20 must plan as
    TakeOrderedAndProject (distributed top-k), not a global sort or a
    single-reducer window over all matched docs."""
    df = REGISTRY["rrf_rank_fusion"].fn(spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_trimmed_stats_window_runs_on_histogram_not_fact(spark):
    """trimmed_order_value_stats' cumulative window must consume the
    (priority, cents) histogram aggregate, not raw fact rows: the
    HashAggregate keyed by (prio, c) has to sit BELOW the Window in the
    executed plan."""
    df = REGISTRY["trimmed_order_value_stats"].fn(spark, SF_SMOKE)
    plan = _executed_plan(df)
    win = plan.find("Window")
    assert win != -1
    below = plan[win:]
    assert "HashAggregate" in below  # histogram agg feeds the window


def test_cusum_window_runs_on_daily_not_fact(spark):
    """revenue_cusum_changepoint's global-order window must consume the
    per-day aggregate, not raw orders rows: the HashAggregate keyed by
    day has to sit BELOW the Window in the executed plan (the
    boundedness argument for its _BOUNDED_WINDOW_OK exemption)."""
    df = REGISTRY["revenue_cusum_changepoint"].fn(spark, SF_SMOKE)
    plan = _executed_plan(df)
    win = plan.find("Window")
    assert win != -1
    assert "HashAggregate" in plan[win:]  # daily agg feeds the window


def test_survival_global_window_runs_on_buckets(spark):
    """repeat_purchase_survival: the per-customer episode window must be
    partitioned (o_custkey), and the only aggregates below the global
    bucket windows are the bucket/episode reductions — the global window
    never consumes per-customer rows directly."""
    df = REGISTRY["repeat_purchase_survival"].fn(spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert "windowspecdefinition(o_custkey" in plan
    win = plan.find("Window")
    assert win != -1
    assert "HashAggregate" in plan[win:]


# ---------------------------------------------------------------------------
# scale_mode (plans/scale.py, VERDICT r8 task #1): the cluster-scale
# plan shape is a selectable CODE PATH, not a comment.

_SCALE_MODE_QUERIES = {
    # query -> (fact table, n pipelined fact passes in the local form)
    "hyperloglog_union_over_time": ("events", 4),
    "histogram_quantile_window_merge": ("events", 4),
    # 6 = the broadcast join-back + 5 re-derivations of the c0 class
    # count (one per residual ladder level) — all narrow column-pruned
    # passes the local form happily overlaps; cluster mode collapses
    # them onto the one pinned qi materialization
    "group_k_anonymity_generalize": ("orders", 6),
    # r9 additions: trigger-grid + flagged-join passes (watermark) and
    # last-op-ranking + op-count passes (cdc)
    "watermark_late_data_audit": ("events", 2),
    "cdc_compaction_io_audit": ("events", 2),
}

# attribution_shapley_values carried pin_if_cluster on its
# journey-windowed relation through r13; the r14 fused (user, journey)
# aggregate leaves the window subtree with exactly ONE consumer, so the
# pin (and its storage-delta test entry below) was retired — a single-
# consumer pin only adds memory pressure at cluster scale.


def _fact_scan_lines(plan: str, table: str) -> list[str]:
    return [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and f"{table}.parquet" in ln
    ]


def test_scale_mode_cluster_pins_one_fact_scan(spark):
    """Under spark.graft.scaleMode=cluster each multi-consumer plan must
    read its fact table through exactly ONE materialized relation:
    every printed fact FileScan is the cached relation's definition
    (paired 1:1 with an InMemoryRelation line), every consumer is an
    InMemoryTableScan, and the session holds exactly one cached RDD
    after materialization — the ground truth that the fact was scanned
    once. The local default keeps the measured-faster pipelined form:
    no InMemory* nodes, N redundant column-pruned passes."""
    from ecommerce_data_pipeline_spark.plans.scale import SCALE_MODE_CONF

    for name, (table, n_local_passes) in _SCALE_MODE_QUERIES.items():
        fn = REGISTRY[name].fn
        try:
            spark.conf.set(SCALE_MODE_CONF, "local")
            plan_local = _executed_plan(fn(spark, SF_SMOKE))
            assert "InMemoryTableScan" not in plan_local, name
            assert len(_fact_scan_lines(plan_local, table)) == (
                n_local_passes
            ), name

            spark.conf.set(SCALE_MODE_CONF, "cluster")
            # delta-based storage check: earlier tests may leave
            # localCheckpoint blocks that clearCache cannot remove
            before = {
                i.id()
                for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            }
            df = fn(spark, SF_SMOKE)
            plan = _executed_plan(df)
            scans = _fact_scan_lines(plan, table)
            n_defs = plan.count("InMemoryRelation")
            n_reads = plan.count("InMemoryTableScan")
            # every printed fact scan is a cache DEFINITION, and there
            # is at least one cached consumer per pipelined pass
            assert len(scans) == n_defs, (name, len(scans), n_defs)
            assert n_reads >= n_defs >= 2, (name, n_reads, n_defs)
            # ground truth: exactly ONE NEW cached relation
            df.write.format("noop").mode("overwrite").save()
            new = [
                i
                for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
                if i.id() not in before
            ]
            assert len(new) == 1, (name, [i.name() for i in new])
        finally:
            spark.catalog.clearCache()
            spark.conf.set(SCALE_MODE_CONF, "local")


def test_scale_mode_values_identical_across_modes(spark):
    """The switch changes the physical strategy only: collected results
    must be identical row-for-row in both modes (same arithmetic, same
    rows — the driver hash would see no difference)."""
    from ecommerce_data_pipeline_spark.plans.scale import SCALE_MODE_CONF

    for name in _SCALE_MODE_QUERIES:
        fn = REGISTRY[name].fn
        try:
            spark.conf.set(SCALE_MODE_CONF, "local")
            local_rows = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
            spark.conf.set(SCALE_MODE_CONF, "cluster")
            cluster_rows = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        finally:
            spark.catalog.clearCache()
            spark.conf.set(SCALE_MODE_CONF, "local")
        assert local_rows == cluster_rows, name


import pytest as _pytest


@_pytest.mark.parametrize(
    "qname",
    [
        # QI projection -> classes + cells + domain + total
        # (attribution_shapley_values left this list in r14: its fused
        # single-consumer window needs no pin — see the comment above)
        "t_closeness_audit",
    ],
)
def test_scale_mode_pins_eager_lattice_base(spark, qname):
    """Cluster scale_mode for the eager-localCheckpoint queries: their
    returned plans show no fact scan (the lattice is materialized
    during construction), so the pin is asserted as a storage delta —
    exactly one MORE new storage entry than the local run leaves (both
    modes localCheckpoint the same downstream relations) — plus
    cross-mode value parity."""
    from ecommerce_data_pipeline_spark.plans.scale import SCALE_MODE_CONF

    fn = REGISTRY[qname].fn

    def storage_ids():
        return {
            i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    def run():
        before = storage_ids()
        rows = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        return rows, len(storage_ids() - before)

    try:
        spark.conf.set(SCALE_MODE_CONF, "local")
        local_rows, n_local = run()
        spark.catalog.clearCache()
        spark.conf.set(SCALE_MODE_CONF, "cluster")
        cluster_rows, n_cluster = run()
        assert cluster_rows == local_rows
        assert n_cluster == n_local + 1, (n_local, n_cluster)
    finally:
        spark.catalog.clearCache()
        spark.conf.set(SCALE_MODE_CONF, "local")
