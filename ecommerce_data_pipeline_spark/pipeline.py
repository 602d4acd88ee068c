"""Flagship EP2 pipeline — the reference's end-to-end dataflow, Spark-first.

Reference EP2 (``transactions_mock_data.py:125-150``): generate facts →
land CSV in a time-partitioned zone → trigger a Glue Spark job that joins
the facts with both dimensions and appends to the warehouse. Plus EP1's
dedup-insert (``dimension_tables_mock.py:61-73``).

Here the whole thing is ONE logical plan in one session: scan fact +
dims → dedup facts on key (anti-join semantic) → broadcast-join both dims
→ aggregate revenue → (optionally) land a partitioned Parquet copy.

Role mapping onto the driver's testdata (FIXTURES.md): ``lineitem`` +
``orders`` = transactions fact, ``part`` = dim_products, ``customer`` =
dim_customers.

Scale shape: the fact side never shuffles — both dim joins are broadcast
hash joins, dedup is a map-side-combinable aggregation keyed on the fact
PK, and the final groupBy reduces to (brand × segment) cells, so the only
full shuffle is on the tiny aggregate key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.dedup import dedup_by_key
from ecommerce_data_pipeline_spark.operators.joins import enrich_facts
from ecommerce_data_pipeline_spark.sources.readers import load_table
from ecommerce_data_pipeline_spark.sources.writers import write_partitioned_parquet


def flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (product brand × customer segment) over deduped facts.

    The canonical query over the reference's star schema: the Glue join
    (J1) feeding the warehouse aggregation (A1), with EP1's key-dedup (J2)
    applied to the fact stream first.
    """
    return flagship_revenue_over(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "customer"),
    )


def flagship_revenue_over(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    customer: DataFrame,
    *,
    co_located: bool = False,
    skewed_fact: bool = False,
) -> DataFrame:
    """Flagship plan over caller-supplied relations.

    ``co_located=True`` declares that ``lineitem`` and ``orders`` are
    already hash-co-located on the order key — i.e. they were written as
    bucketed tables with the same bucket count (``bucket_fact_tables``)
    and read back via ``spark.table``. The plan then skips the explicit
    repartition, and Spark's bucketing metadata satisfies both the dedup
    groupBy's clustered-distribution requirement (l_orderkey is a subset
    of the grouping key) and the sort-merge join's, so the fact stream is
    joined with ZERO Exchange operators — the last avoidable fact
    movement at 100 TB (guarded by tests/test_scale_paths.py::
    test_flagship_bucketed_zero_fact_shuffle). The flag is a pure layout
    hint: results are identical either way, Spark re-inserts exchanges if
    the inputs are not actually co-located.

    ``skewed_fact=True`` trades the single-exchange optimization for
    skew tolerance. The default plan's one ``repartition("l_orderkey")``
    serves both the dedup groupBy and the orders join — but under a hot
    order key it is the WORST shape: every hot row lands in one task,
    and AQE cannot split it (user-specified repartitions and
    aggregate-co-partitioned join inputs are both outside
    OptimizeSkewedJoin, which only rewrites ENSURE_REQUIREMENTS
    shuffles). Skipping the repartition restores the skew-safe form:
    the dedup groupBy hashes the full COMPOSITE key, spreading a hot
    orderkey across its linenumbers, and the orders join gets its own
    ENSURE_REQUIREMENTS exchange that AQE's skew-join handling splits at
    runtime. Two fact exchanges instead of one — the price of a hot key
    (guarded by tests/test_skew.py::
    test_flagship_skewed_orderkey_probe; results identical either way).
    Mutually exclusive with ``co_located`` (a bucketed layout has fixed
    the partitioning already — a hot key there needs a layout change,
    not a plan flag).
    """
    if co_located and skewed_fact:
        raise ValueError(
            "co_located and skewed_fact are mutually exclusive: bucketed "
            "layout pins the partitioning; mitigate a hot key at the "
            "layout level (e.g. more buckets or salting at write)"
        )
    # Project BEFORE dedup: dedup_by_key's min-struct otherwise carries
    # every lineitem column through the aggregate and the scan reads all
    # 11 (the one full-width scan a ReadSchema audit found across the
    # whole 52-query HEADLINE, r6). Restricting to the 6 consumed columns
    # also narrows the dedup TIE-BREAK to those columns — the oracle's
    # ORDER BY list changes in lockstep (plans/relational.py), and a
    # winner flip can only happen between duplicate rows whose consumed
    # values the new tie-break itself orders, so Spark and the oracle
    # stay bit-identical. Projection preserves bucketing metadata, so the
    # co_located zero-exchange path is unaffected.
    lineitem = lineitem.select(
        "l_orderkey", "l_linenumber", "l_partkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    # Fact PK dedup (reference: insert-if-absent on the key; here the fact
    # PK is (l_orderkey, l_linenumber)). Idempotent re-ingest semantics.
    # Pre-partitioning by l_orderkey makes ONE exchange serve both the
    # dedup groupBy (orderkey is a prefix of the grouping key, so the
    # clustered-distribution requirement is already satisfied) and the
    # orders join below — the fact stream shuffles once, not twice.
    facts = dedup_by_key(
        lineitem
        if (co_located or skewed_fact)
        else lineitem.repartition("l_orderkey"),
        ["l_orderkey", "l_linenumber"],
        "l_partkey",
    )

    # Attach the order header (customer FK + order date). At 100 TB this
    # is the one unavoidable co-partitioned join (bucketing both tables
    # on orderkey would remove even this); only orders shuffles here.
    facts = facts.join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        facts["l_orderkey"] == orders["o_orderkey"],
        "inner",
    ).drop("o_orderkey")

    # J1: both dims broadcast — the fact stream never moves.
    enriched = enrich_facts(
        facts,
        {
            "l_partkey": part.select(
                F.col("p_partkey").alias("l_partkey"), "p_brand"
            ),
            "o_custkey": customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
        },
    )

    # A1: revenue aggregation. Decimal accumulation keeps the sums exact
    # (and bit-identical to the DuckDB oracle); the final cast keeps the
    # public schema double.
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    return (
        enriched.groupBy("p_brand", "c_mktsegment")
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def bucket_fact_tables(
    spark: SparkSession,
    sf_dir: str,
    database: str = "warehouse",
    n_buckets: int = 32,
) -> tuple[str, str]:
    """One-time layout job: persist lineitem and orders as bucketed tables
    co-located on the order key.

    Both tables get the SAME bucket count (a requirement for bucket-wise
    joins) and are sorted within buckets by the order key. Reading them
    back with ``spark.table`` and passing ``co_located=True`` to
    ``flagship_revenue_over`` yields a fact join with zero Exchange
    operators: at 100 TB, bucketing is paid once at ingest and every
    subsequent orderkey join/groupBy reads pre-shuffled files. Returns the
    two qualified table names.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    li_name, ord_name = f"{database}.lineitem_b", f"{database}.orders_b"
    (
        load_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li_name)
    )
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ord_name)
    )
    return li_name, ord_name


def run_flagship(
    spark: SparkSession, sf_dir: str, landing_path: str | None = None
) -> DataFrame:
    """entry() body: the flagship query, optionally landing the enriched
    facts as a time-partitioned Parquet zone (S4 semantics)."""
    result = flagship_revenue(spark, sf_dir)
    if landing_path:
        orders = load_table(spark, sf_dir, "orders")
        write_partitioned_parquet(
            orders, "o_orderdate", landing_path, granularity="month"
        )
    return result


def run_flagship_observed(spark: SparkSession, sf_dir: str):
    """Flagship with single-pass in-flight accounting: ``Dataset.observe``
    attaches accumulator-backed metrics to the fact scan, so row counts /
    null-key counts / raw revenue totals are collected DURING the one
    execution — the 100 TB alternative to a separate DQ pass that would
    re-read the fact table (dq_constraint_checks is the standalone audit;
    this is the zero-extra-scan production form).

    Returns ``(result_df, observation)``; ``observation.get`` blocks until
    the result has been executed once and then yields the metrics dict.
    Exact accounting: revenue accumulates in DECIMAL(18,4) — observe
    metrics merge per-task like any partial aggregate, so a float sum
    would be partition-order dependent.
    """
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("flagship_dq")
    li_obs = li.observe(
        obs,
        F.count(F.lit(1)).alias("fact_rows_scanned"),
        F.sum(F.col("l_orderkey").isNull().cast("int")).alias("null_orderkeys"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("raw_revenue"),
    )
    result = flagship_revenue_over(
        li_obs,
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "customer"),
    )
    return result, obs
