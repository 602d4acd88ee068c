"""Data-quality / data-understanding queries (SURVEY.md §2 extensions):
blocked fuzzy entity resolution, single-pass column profiling, and a
behavioral transition matrix.

These are the "know your data" operators a training-data pipeline runs
before (profiling), during (entity resolution of dimension records), and
after (behavior modeling) ingestion. All three are pure Column-expression
plans — no UDFs — and each is shaped so its shuffle structure survives a
100 TB input: profiling is one aggregation pass, entity resolution is a
blocked (never cartesian) self-join over a *deduplicated* name dictionary,
and the transition matrix partitions by the same user key the
sessionizer uses.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.plans.scale import pin_if_cluster
from ecommerce_data_pipeline_spark.sources.readers import load_table


@register(
    "entity_resolution_fuzzy",
    oracle="""
    WITH names AS (
      SELECT p_name,
             regexp_extract(p_name, '(\\S+)$', 1) AS block,
             COUNT(*) AS n_parts,
             MIN(p_partkey) AS canonical_partkey
      FROM part
      GROUP BY p_name
    )
    SELECT a.block,
           a.p_name AS name_a,
           b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance,
           a.n_parts AS n_parts_a,
           b.n_parts AS n_parts_b,
           a.canonical_partkey AS canonical_a,
           b.canonical_partkey AS canonical_b
    FROM names a
    JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("extension", "entity-resolution", "join"),
)
def entity_resolution_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over the part-name dimension: candidate
    pairs of near-identical product names (edit distance <= 4) found via a
    *blocked* self-join keyed on the head noun, never a cartesian product.

    The scale contract (reference dimension refresh, Products_Dim_Gen
    lambda_function.py:21-34, resolved here instead of regenerated):
    1. Dedup first — the join runs over the distinct-name dictionary
       (bounded by vocabulary size), not the raw fact rows.
    2. Block — `regexp_extract(name, '(\\S+)$')` keys the self-join, so
       Spark hash-partitions by block and compares only within blocks;
       worst case is max-block-size squared, not corpus squared.
    3. The dictionary side is broadcast-eligible (tiny vs the fact
       table), so cluster-scale cost is the dedup aggregation alone.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").alias("canonical_partkey"),
        )
        .withColumn("block", F.regexp_extract("p_name", r"(\S+)$", 1))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4)
        .select(
            F.col("a.block").alias("block"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias(
                "edit_distance"
            ),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
            F.col("a.canonical_partkey").alias("canonical_a"),
            F.col("b.canonical_partkey").alias("canonical_b"),
        )
    )


@register(
    "data_profile_orders",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderkey) AS nn_orderkey,
             COUNT(DISTINCT o_orderkey) AS nd_orderkey,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_orderkey,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_orderkey,
             COUNT(o_custkey) AS nn_custkey,
             COUNT(DISTINCT o_custkey) AS nd_custkey,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_custkey,
             CAST(MAX(o_custkey) AS VARCHAR) AS max_custkey,
             COUNT(o_orderstatus) AS nn_status,
             COUNT(DISTINCT o_orderstatus) AS nd_status,
             MIN(o_orderstatus) AS min_status,
             MAX(o_orderstatus) AS max_status,
             COUNT(o_totalprice) AS nn_price,
             COUNT(DISTINCT o_totalprice) AS nd_price,
             CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
               AS min_price,
             CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
               AS max_price,
             COUNT(o_orderdate) AS nn_date,
             COUNT(DISTINCT o_orderdate) AS nd_date,
             CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS min_date,
             CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS max_date,
             COUNT(o_orderpriority) AS nn_prio,
             COUNT(DISTINCT o_orderpriority) AS nd_prio,
             MIN(o_orderpriority) AS min_prio,
             MAX(o_orderpriority) AS max_prio
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n_rows, nn_orderkey AS n_nonnull,
           nd_orderkey AS n_distinct, min_orderkey AS min_value,
           max_orderkey AS max_value FROM s
    UNION ALL
    SELECT 'o_custkey', n_rows, nn_custkey, nd_custkey, min_custkey,
           max_custkey FROM s
    UNION ALL
    SELECT 'o_orderstatus', n_rows, nn_status, nd_status, min_status,
           max_status FROM s
    UNION ALL
    SELECT 'o_totalprice', n_rows, nn_price, nd_price, min_price,
           max_price FROM s
    UNION ALL
    SELECT 'o_orderdate', n_rows, nn_date, nd_date, min_date,
           max_date FROM s
    UNION ALL
    SELECT 'o_orderpriority', n_rows, nn_prio, nd_prio, min_prio,
           max_prio FROM s
    """,
    tags=("extension", "profiling", "aggregate"),
)
def data_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler for the orders table: row count,
    non-null count, exact distinct count, and string-serialized min/max
    for every column, published as one narrow (col_name, metric...) row
    per column.

    This is the pipeline's pre-flight data check. ONE aggregation over
    the table computes all 6x4 statistics (Catalyst expands the
    multi-DISTINCT into a single Expand + two-stage aggregate — still one
    scan), and the wide->narrow reshape happens on the 1-row result, so
    the 100 TB cost is exactly one pass regardless of how many columns
    are profiled. Min/max serialize via type-stable casts (decimal 2dp,
    ISO dates) so one schema publishes heterogeneous column types.
    """
    o = load_table(spark, sf_dir, "orders")

    def stats(col: str, serialize: str) -> list:
        c = F.col(col)
        ser_min = F.min(c).cast(serialize).cast("string")
        ser_max = F.max(c).cast(serialize).cast("string")
        if serialize == "string":
            ser_min, ser_max = F.min(c).cast("string"), F.max(c).cast("string")
        return [
            F.count(c).alias(f"nn_{col}"),
            F.count_distinct(c).alias(f"nd_{col}"),
            ser_min.alias(f"min_{col}"),
            ser_max.alias(f"max_{col}"),
        ]

    specs = [
        ("o_orderkey", "string"),
        ("o_custkey", "string"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "decimal(18,2)"),
        ("o_orderdate", "date"),
        ("o_orderpriority", "string"),
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, ser in specs:
        aggs.extend(stats(col, ser))
    wide = o.agg(*aggs)

    stack_args = ", ".join(
        f"'{col}', nn_{col}, nd_{col}, min_{col}, max_{col}"
        for col, _ in specs
    )
    return wide.select(
        F.expr(
            f"stack({len(specs)}, {stack_args}) AS "
            "(col_name, n_nonnull, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct", "min_value",
        "max_value",
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n_transitions
      FROM e WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE) /
                 SUM(n_transitions) OVER (PARTITION BY from_type), 6)
             AS p_transition
    FROM pairs
    """,
    tags=("extension", "analytics", "window"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    each (from_type -> to_type) pair, the transition count and the
    conditional probability P(to | from).

    Behavior-model features (and anomaly baselines) for the reference's
    event taxonomy (transactions_mock_data.py event types). Scale shape:
    the LEAD window partitions by user_id — same key as sessionization,
    one shuffle, millions of small independent partitions — and the
    probability normalization runs on the TYPExTYPE matrix (25 rows), so
    the second window is free. Ties on ts break by event_id so the chain
    is deterministic cross-engine.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(total),
            6,
        ).alias("p_transition"),
    )


@register(
    "zscore_outliers",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey,
           o.o_orderpriority,
           o.o_totalprice,
           ROUND((o.o_totalprice - m.s1 / m.n)
                 / sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)), 4)
             AS zscore
    FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
    WHERE abs((o.o_totalprice - m.s1 / m.n)
              / sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))) > 1.65
    """,
    tags=("extension", "profiling", "outliers"),
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection over order totals — the
    anomaly gate a pipeline runs before admitting a batch (price glitches,
    unit errors) — flagging rows more than 1.65 sigma from their priority
    class's mean.

    Determinism discipline (same as stats_correlation): the group moments
    are EXACT decimal sums (2dp values, 4dp squares — no float
    accumulation-order variance), published to double only for the final
    mean/stddev arithmetic, which is written with identical
    parenthesization in both engines, so even the > 1.65 boundary
    comparison is bit-identical. Plan shape: one aggregation for the
    5-row moment table, broadcast back onto the fact scan — a 100 TB
    input is one pass + one map-side join, no second shuffle.
    """
    from pyspark.sql.functions import broadcast

    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("s1"),
        F.sum(dec("o_totalprice") * dec("o_totalprice"))
        .cast("double")
        .alias("s2"),
    )
    j = o.join(broadcast(m), "o_orderpriority")
    z = (F.col("o_totalprice") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return j.where(F.abs(z) > 1.65).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(z, 4).alias("zscore"),
    )


@register(
    "skewness_kurtosis_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS s1,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
               AS s2,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS s3,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
               AS s4
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_qty,
           ROUND(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                 6) AS var_pop,
           ROUND((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / pow(CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                       1.5), 6) AS skewness,
           ROUND((CAST(s4 AS DOUBLE) / n
                  - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 - 3.0, 6) AS kurtosis_excess
    FROM m
    """,
    tags=("extension", "profiling", "statistics"),
)
def skewness_kurtosis_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution profile (population skewness + excess
    kurtosis) per return flag — the shape statistics a data-quality
    monitor tracks to catch distribution drift that mean/stddev miss.

    Same determinism discipline as stats_correlation, taken one step
    further: l_quantity is integral (1..50), so ALL four power sums are
    exact BIGINT arithmetic (max s4 sum ~4e11 — no overflow, no float
    accumulation anywhere). The only floating-point steps are the final
    moment formulas, written with identical literal-for-literal
    parenthesization in both engines, so skewness and kurtosis match
    bit-for-bit at 6dp. One hash aggregation over the fact table; the
    formula is a 5-row projection afterwards — a 100 TB input is a
    single map-side-combined pass.
    """
    q = F.col("l_quantity").cast("long")
    m = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("s1"),
            F.sum(q * q).alias("s2"),
            F.sum(q * q * q).alias("s3"),
            F.sum(q * q * q * q).alias("s4"),
        )
    )
    mean = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - mean * mean
    m3 = (
        F.col("s3").cast("double") / F.col("n")
        - F.lit(3.0) * mean * (F.col("s2").cast("double") / F.col("n"))
        + F.lit(2.0) * mean * mean * mean
    )
    m4 = (
        F.col("s4").cast("double") / F.col("n")
        - F.lit(4.0) * mean * (F.col("s3").cast("double") / F.col("n"))
        + F.lit(6.0) * mean * mean * (F.col("s2").cast("double") / F.col("n"))
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(mean, 6).alias("mean_qty"),
        F.round(m2, 6).alias("var_pop"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurtosis_excess"),
    )


@register(
    "chi_square_contingency",
    oracle="""
    WITH joined AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT segment, priority, COUNT(*) AS observed
      FROM joined GROUP BY segment, priority
    ),
    rt AS (SELECT segment, SUM(observed) AS row_total FROM cells GROUP BY segment),
    ct AS (SELECT priority, SUM(observed) AS col_total FROM cells GROUP BY priority),
    n AS (SELECT SUM(observed) AS grand_total FROM cells)
    SELECT cells.segment, cells.priority, cells.observed,
           ROUND((rt.row_total * 1.0 * ct.col_total) / n.grand_total, 6)
             AS expected,
           ROUND(((cells.observed - (rt.row_total * 1.0 * ct.col_total)
                                    / n.grand_total)
                  * (cells.observed - (rt.row_total * 1.0 * ct.col_total)
                                      / n.grand_total))
                 / ((rt.row_total * 1.0 * ct.col_total) / n.grand_total), 6)
             AS chi2_contribution
    FROM cells
    JOIN rt ON cells.segment = rt.segment
    JOIN ct ON cells.priority = ct.priority
    CROSS JOIN n
    """,
    tags=("extension", "profiling", "statistics"),
)
def chi_square_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence profile between customer market segment
    and order priority: the full contingency table with per-cell
    expected counts and chi2 contributions (their sum is the test
    statistic) — how a pipeline checks whether two categorical columns
    are independent before trusting a stratified design on one of them.

    Shape: one fact-side broadcast-join + hash aggregate produces the
    25-cell table; row totals, column totals, and the grand total are
    re-aggregations OF THE CELLS (25 rows — free), broadcast back. No
    windows, no second pass over the fact table. Expected counts are a
    single integer->double division written identically in both engines,
    and each cell's contribution reuses that same expression verbatim,
    so every float matches at 6dp.
    """
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
    )
    # localCheckpoint the 25-cell table: three marginal re-aggregations
    # consume it, and without the cut each one re-executes the fact
    # join+aggregate (4 orders scans for one statistic)
    cells = joined.groupBy("segment", "priority").agg(
        F.count(F.lit(1)).alias("observed")
    ).localCheckpoint()
    rt = cells.groupBy("segment").agg(F.sum("observed").alias("row_total"))
    ct = cells.groupBy("priority").agg(F.sum("observed").alias("col_total"))
    n = cells.select(F.sum("observed").alias("grand_total"))
    expected = (F.col("row_total") * 1.0 * F.col("col_total")) / F.col(
        "grand_total"
    )
    return (
        cells.join(broadcast(rt), "segment")
        .join(broadcast(ct), "priority")
        .crossJoin(broadcast(n))
        .select(
            "segment",
            "priority",
            "observed",
            F.round(expected, 6).alias("expected"),
            F.round(
                ((F.col("observed") - expected) * (F.col("observed") - expected))
                / expected,
                6,
            ).alias("chi2_contribution"),
        )
    )


@register(
    "target_mean_encoding",
    oracle="""
    WITH joined AS (
      SELECT o.o_orderkey, c.c_mktsegment AS segment,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg AS (
      SELECT segment, COUNT(*) AS n_cat,
             CAST(SUM(price) AS DOUBLE) AS sum_cat
      FROM joined GROUP BY segment
    ),
    g_all AS (
      SELECT COUNT(*) AS n_all, CAST(SUM(price) AS DOUBLE) AS sum_all
      FROM joined
    )
    SELECT j.o_orderkey, j.segment,
           ROUND(s.sum_cat / s.n_cat, 6) AS raw_mean,
           ROUND((s.sum_cat + 10.0 * (g.sum_all / g.n_all))
                 / (s.n_cat + 10.0), 6) AS encoded
    FROM joined j
    JOIN seg s ON j.segment = s.segment
    CROSS JOIN g_all g
    """,
    tags=("extension", "ml-prep", "encoding"),
)
def target_mean_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical feature — the
    standard ML-prep replacement for high-cardinality one-hot columns:
    each category becomes its target mean shrunk toward the global mean
    (m=10 pseudo-observations), so rare categories don't memorize noise.

    Exactness: category and global sums accumulate in DECIMAL(18,2)
    (order-independent), published to double for the single smoothing
    division written identically in both engines. Plan: one broadcast
    dim join + two aggregations over the SAME joined relation (Spark
    reuses the exchange), then the 5-row encoder table broadcasts back
    onto the fact rows — at 100 TB the encoding is a map-side join, and
    the encoder table itself is the reusable artifact a feature store
    would persist.
    """
    from pyspark.sql.functions import broadcast

    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        dec("o_totalprice").alias("price"),
    )
    seg = joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum("price").cast("double").alias("sum_cat"),
    )
    glob = joined.select(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("price").cast("double").alias("sum_all"),
    )
    return (
        joined.join(broadcast(seg), "segment")
        .crossJoin(broadcast(glob))
        .select(
            "o_orderkey",
            "segment",
            F.round(F.col("sum_cat") / F.col("n_cat"), 6).alias("raw_mean"),
            F.round(
                (F.col("sum_cat") + F.lit(10.0) * (F.col("sum_all") / F.col("n_all")))
                / (F.col("n_cat") + F.lit(10.0)),
                6,
            ).alias("encoded"),
        )
    )


@register(
    "join_cardinality_preflight",
    oracle="""
    WITH ko AS (
      SELECT o_orderkey AS k, COUNT(*) AS n_o FROM orders GROUP BY o_orderkey
    ),
    kl AS (
      SELECT l_orderkey AS k, COUNT(*) AS n_l FROM lineitem GROUP BY l_orderkey
    ),
    contrib AS (
      SELECT ko.k, ko.n_o * kl.n_l AS rows_out
      FROM ko JOIN kl ON ko.k = kl.k
    ),
    pred AS (
      SELECT COUNT(*) AS n_join_keys,
             CAST(SUM(rows_out) AS BIGINT) AS predicted_join_rows,
             CAST(MAX(rows_out) AS BIGINT) AS max_key_rows
      FROM contrib
    ),
    act AS (
      SELECT COUNT(*) AS actual_join_rows
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT pred.n_join_keys, pred.predicted_join_rows,
           act.actual_join_rows, pred.max_key_rows,
           ROUND(pred.max_key_rows * 1.0 / pred.predicted_join_rows, 6)
             AS max_key_share
    FROM pred CROSS JOIN act
    """,
    tags=("extension", "profiling", "join"),
)
def join_cardinality_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion pre-flight: predict a join's exact output
    cardinality and its worst-key skew share from per-side key
    histograms ALONE — two cheap aggregations instead of the join
    itself. predicted = sum over shared keys of |left_k| * |right_k|;
    the oracle cross-checks it against the actually-executed join
    (equal by construction — that equality is the point).

    At 100 TB this is the guard you run before committing a shuffle
    join: the per-key count tables are map-side-combined aggregates
    (tiny vs the join output), predicted_join_rows prices the shuffle,
    and max_key_share tells you whether one hot key will pin a reducer
    (the decision input for salting / AQE skew hints / broadcast
    fallback — see operators/skew.py). Exact integer arithmetic
    throughout; the one ratio is a single division, 6dp both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ko = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_o")
    )
    kl = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    contrib = ko.join(kl, "k").select(
        "k", (F.col("n_o") * F.col("n_l")).alias("rows_out")
    )
    pred = contrib.select(
        F.count(F.lit(1)).alias("n_join_keys"),
        F.sum("rows_out").cast("long").alias("predicted_join_rows"),
        F.max("rows_out").cast("long").alias("max_key_rows"),
    )
    act = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.count(F.lit(1)).alias("actual_join_rows")
    )
    return pred.crossJoin(act).select(
        "n_join_keys",
        "predicted_join_rows",
        "actual_join_rows",
        "max_key_rows",
        F.round(
            F.col("max_key_rows") * 1.0 / F.col("predicted_join_rows"), 6
        ).alias("max_key_share"),
    )


@register(
    "mad_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS med_price
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
             abs(o.o_totalprice - m.med_price) AS abs_dev, m.med_price
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    ),
    mad AS (
      SELECT o_orderpriority,
             CAST(quantile_cont(abs_dev, 0.5) AS DOUBLE) AS mad_price
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderkey, d.o_orderpriority, d.o_totalprice,
           ROUND((d.o_totalprice - d.med_price)
                 / (1.4826 * a.mad_price), 4) AS robust_z
    FROM dev d JOIN mad a ON d.o_orderpriority = a.o_orderpriority
    WHERE abs((d.o_totalprice - d.med_price)
              / (1.4826 * a.mad_price)) > 3.5
    """,
    tags=("extension", "profiling", "robust-stats"),
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier gate (|robust z| > 3.5, the
    Iglewicz-Hoaglin rule): the robust twin of ``zscore_outliers`` —
    medians and MAD don't move when the outliers themselves get wilder,
    so contaminated batches can't mask their own anomalies (mean/stddev
    gates suffer exactly that masking).

    Two grouped exact medians (PERCENTILE_CONT parity, same as
    percentiles_exact) with the 5-row location/scale tables broadcast
    back between passes; the fact table is scanned twice — the price of
    exact medians, and why the GK-sketch variant
    (percentiles_approx_by_group) is the single-pass 100 TB path once
    calibrated against this exact form. The 1.4826 consistency constant
    and the ratio are written identically in both engines; 4dp rounding.
    """
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med_price")
    )
    dev = o.join(broadcast(med), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.abs(F.col("o_totalprice") - F.col("med_price")).alias("abs_dev"),
        "med_price",
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.percentile("abs_dev", F.lit(0.5)).alias("mad_price")
    )
    z = (F.col("o_totalprice") - F.col("med_price")) / (
        F.lit(1.4826) * F.col("mad_price")
    )
    return (
        dev.join(broadcast(mad), "o_orderpriority")
        .where(F.abs(z) > 3.5)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.round(z, 4).alias("robust_z"),
        )
    )


@register(
    "interevent_gap_stats",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           ROUND(CAST(quantile_cont(gap_us, 0.5) AS DOUBLE), 1)
             AS median_gap_us,
           ROUND(CAST(quantile_cont(gap_us, 0.9) AS DOUBLE), 1)
             AS p90_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM ordered
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("extension", "profiling", "timeseries"),
)
def interevent_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event arrival-gap distribution per user (median / p90 / max
    seconds between consecutive events) — the cadence profile that
    calibrates session timeouts (events_sessionize's 30-minute gap) and
    streaming watermarks (stream_dedup's lateness bound) from data
    instead of folklore.

    Gaps are EXACT integer microsecond differences from a lag window
    partitioned by user (unique (ts, event_id) order), so the
    percentile interpolation runs on integers and its value has AT MOST
    ONE fractional decimal digit (interpolation weights are multiples
    of 0.1) — published at 1dp in microseconds, which is tie-free.
    (Publishing seconds = value/1e6 rounded at 6dp hit a genuine
    round-half boundary where Spark's HALF_UP and DuckDB's rounding
    disagree — keep published precision AT the value's intrinsic
    precision, never beyond it.) One window pass + one grouped
    aggregate, both keyed by user.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.percentile("gap_us", F.lit(0.5)), 1).alias(
            "median_gap_us"
        ),
        F.round(F.percentile("gap_us", F.lit(0.9)), 1).alias("p90_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "order_reconciliation_audit",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS lines_total
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderstatus,
             CAST(o.o_totalprice AS DECIMAL(18,2))
             - CAST(li.lines_total AS DECIMAL(18,2)) AS delta,
             li.n_lines
      FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ABS(delta) > 0.005 AS INT)) AS BIGINT)
             AS n_mismatched,
           ROUND(CAST(SUM(ABS(delta)) AS DOUBLE) / COUNT(*), 4)
             AS mean_abs_delta,
           CAST(MAX(ABS(delta)) AS DOUBLE) AS max_abs_delta
    FROM joined
    GROUP BY o_orderstatus
    """,
    tags=("extension", "profiling", "audit"),
)
def order_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation audit: does each order's header total
    equal the sum of its line items? Reports, per order status, how many
    orders disagree and by how much — the referential AMOUNT check (the
    FK-closure tests cover referential EXISTENCE) every financial
    pipeline runs between fact tables before publishing either.

    All deltas are exact DECIMAL(18,2) subtraction of exact decimal
    sums — a reconciliation that itself used floats would report its
    own rounding noise as mismatches (the 0.005 tolerance is half a
    cent: anything above it is a real discrepancy, not representation).
    One key-partitioned aggregate + one join + one rollup; at 100 TB
    both sides shuffle once on the same key.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(dec("l_extendedprice")).cast("double").alias("lines_total"),
        )
    )
    joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderstatus",
        (dec("o_totalprice") - dec("lines_total")).alias("delta"),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.abs(F.col("delta")) > 0.005).cast("int"))
        .cast("long")
        .alias("n_mismatched"),
        F.round(
            F.sum(F.abs(F.col("delta"))).cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_abs_delta"),
        F.max(F.abs(F.col("delta"))).cast("double").alias("max_abs_delta"),
    )


@register(
    "dq_constraint_checks",
    oracle="""
    SELECT 'orders_pk_unique' AS rule,
           count(*) AS n_checked,
           count(*) - count(DISTINCT o_orderkey) AS n_violations,
           count(*) = count(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk', count(*),
           count(*) FILTER (c.c_custkey IS NULL),
           count(*) FILTER (c.c_custkey IS NULL) = 0
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders_totalprice_positive', count(*),
           count(*) FILTER (NOT o_totalprice > 0),
           count(*) FILTER (NOT o_totalprice > 0) = 0
    FROM orders
    UNION ALL
    SELECT 'orders_status_accepted', count(*),
           count(*) FILTER (o_orderstatus NOT IN ('F','O','P')),
           count(*) FILTER (o_orderstatus NOT IN ('F','O','P')) = 0
    FROM orders
    UNION ALL
    SELECT 'lineitem_quantity_range', count(*),
           count(*) FILTER (l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50),
           count(*) FILTER (l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) = 0
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orderkey_fk', count(*),
           count(*) FILTER (o.o_orderkey IS NULL),
           count(*) FILTER (o.o_orderkey IS NULL) = 0
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("extension", "profiling", "dq"),
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ/dbt-tests
    role): PK uniqueness, FK coverage, range and accepted-value rules,
    one summary row per rule — computed the Deequ way: ALL rules over a
    table ride ONE scan. Each table's rules aggregate on a single
    FK-enriched relation into one wide row, which `stack` unpivots into
    per-rule rows. The FK side joins against the DISTINCT key relation,
    so the enrichment is row-preserving even when the dim itself carries
    duplicate keys — a DQ suite must survive exactly the dirty input it
    exists to detect (a raw-dim join would double-count every orders
    rule on a duplicated c_custkey). Two fact scans total for six rules
    — the naive one-aggregate-per-rule form scanned orders four times."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def bad(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    cust_keys = customer.select("c_custkey").distinct()
    o_en = orders.join(
        cust_keys, orders.o_custkey == cust_keys["c_custkey"], "left"
    )
    o_wide = o_en.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_orderkey").alias("nd"),
        bad(F.col("c_custkey").isNull()).alias("fk_bad"),
        bad(~(F.col("o_totalprice") > 0)).alias("price_bad"),
        bad(~F.col("o_orderstatus").isin("F", "O", "P")).alias("status_bad"),
    )
    orders_rules = o_wide.selectExpr(
        """stack(4,
           'orders_pk_unique', n, n - nd, (n - nd) = 0,
           'orders_custkey_fk', n, fk_bad, fk_bad = 0,
           'orders_totalprice_positive', n, price_bad, price_bad = 0,
           'orders_status_accepted', n, status_bad, status_bad = 0
        ) AS (rule, n_checked, n_violations, passed)"""
    )
    order_keys = orders.select("o_orderkey").distinct()
    l_en = li.join(
        order_keys,
        li.l_orderkey == order_keys["o_orderkey"],
        "left",
    )
    l_wide = l_en.agg(
        F.count(F.lit(1)).alias("n"),
        bad(
            F.col("l_quantity").isNull()
            | (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)
        ).alias("qty_bad"),
        bad(F.col("o_orderkey").isNull()).alias("fk_bad"),
    )
    li_rules = l_wide.selectExpr(
        """stack(2,
           'lineitem_quantity_range', n, qty_bad, qty_bad = 0,
           'lineitem_orderkey_fk', n, fk_bad, fk_bad = 0
        ) AS (rule, n_checked, n_violations, passed)"""
    )
    return orders_rules.unionByName(li_rules)


_PSI_SPLIT = "'1998-01-01'"
_PSI_BIN_SQL = " + ".join(
    f"(CASE WHEN o_totalprice > b[{i}] THEN 1 ELSE 0 END)" for i in range(1, 10)
)


@register(
    "orders_psi_decile_drift",
    oracle=f"""
    WITH ref AS (SELECT o_totalprice FROM orders
                 WHERE o_orderdate < {_PSI_SPLIT}),
    bounds AS (
      SELECT list_transform(
               quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
               x -> round(CAST(x AS DOUBLE), 4)) AS b
      FROM ref
    ),
    binned AS (
      SELECT CASE WHEN o_orderdate < {_PSI_SPLIT} THEN 'ref' ELSE 'cur' END AS period,
             CAST(1 + {_PSI_BIN_SQL} AS INT) AS bin
      FROM orders, bounds
    ),
    counts AS (
      SELECT bin,
             count(*) FILTER (period = 'ref') AS n_ref,
             count(*) FILTER (period = 'cur') AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts)
    SELECT bin,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           round((n_ref + 1) * 1.0 / (t_ref + 10), 6) AS p_ref,
           round((n_cur + 1) * 1.0 / (t_cur + 10), 6) AS p_cur,
           round(((n_cur + 1) * 1.0 / (t_cur + 10) - (n_ref + 1) * 1.0 / (t_ref + 10))
                 * ln(((n_cur + 1) * 1.0 / (t_cur + 10))
                      / ((n_ref + 1) * 1.0 / (t_ref + 10))), 6) AS psi_term
    FROM counts, tot
    """,
    tags=("extension", "profiling", "monitoring"),
)
def orders_psi_decile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: order-value distribution
    before vs after a cutover date, binned by the REFERENCE period's
    deciles (the standard PSI construction — bins carry equal reference
    mass, so drift shows as mass imbalance, with Σ psi_term the headline
    score: <0.1 stable, >0.25 action). Laplace-smoothed shares keep
    empty bins finite and deterministic.

    Scale shape: one percentile aggregation over the reference slice
    (value→count map — bounded for 2dp money, see percentiles_exact),
    the bounds broadcast as a single row, binning is a per-row 9-term
    ladder, and the count rollup is 10 cells. Decile bounds are rounded
    to 4dp on BOTH sides before comparison so engine ulp differences in
    interpolation cannot flip a bin membership."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    ref = orders.filter(F.col("o_orderdate") < split)
    bounds = ref.agg(
        F.transform(
            F.percentile(
                "o_totalprice",
                F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
            ),
            lambda x: F.round(x.cast("double"), 4),
        ).alias("b")
    )
    bin_col = F.lit(1)
    for i in range(9):
        bin_col = bin_col + (F.col("o_totalprice") > F.col("b")[i]).cast("int")
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("o_orderdate") < split, "ref").otherwise("cur").alias(
            "period"
        ),
        bin_col.cast("int").alias("bin"),
    )
    # localCheckpoint the 10-cell counts: `tot` re-derives from it, and
    # without the cut Spark re-executes the whole binning subtree (a
    # second full orders scan at 100 TB) to produce the totals row.
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    ).localCheckpoint()
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = (F.col("n_ref") + 1) * F.lit(1.0) / (F.col("t_ref") + 10)
    p_cur = (F.col("n_cur") + 1) * F.lit(1.0) / (F.col("t_cur") + 10)
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


# Poisson(1) inverse-CDF ladder, cumulative probabilities to k=8 (beyond:
# P < 5e-6, bucketed to 9). Constants written identically in both engines
# so the per-row draw is deterministic cross-engine.
_POIS_CDF = (
    "0.3678794411714423", "0.7357588823428846", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
    "0.9999167588507119", "0.9999897508033253", "0.9999988747974137",
)
_BOOT_REPS = 32

# --- Cross-engine uniform draw: Spark Murmur3_x86_32 replayed in SQL ---
# The r1-r4 draw hashed 'bs#rep#okey' with md5 — cross-engine, but
# Spark-side md5 alone measures 2.8 s over the sf0.1 4.8 M-row fan-out
# (the digest, not the 9-branch ladder: a Generate-barrier forcing one
# digest/row changed nothing) and `conv` adds another ~1.2 s. Spark's
# `hash()` (Murmur3_x86_32) is a codegen'd JVM intrinsic (~0.3 s), and
# unlike xxhash64 its 32-bit wrapping arithmetic is exactly expressible
# in DuckDB BIGINT/HUGEINT (products < 2^64 need no limb splitting), so
# the oracle can replay it bit-for-bit: the columns below reproduce
# Spark's chain hashInt(rep, seed=42) -> hashLong(okey, seed=h) as
# lateral-alias steps, validated against F.hash on 5000 random pairs.
_M32 = 4294967296


def _sql_mul32(x: str, c: int) -> str:
    return f"CAST(CAST({x} AS HUGEINT) * {c} % {_M32} AS BIGINT)"


def _sql_rotl32(x: str, r: int) -> str:
    return f"(({x}) * {1 << r} % {_M32} + ({x}) // {1 << (32 - r)})"


def _sql_murmur_round(name: str, seed: str, val: str) -> list[str]:
    # mixK1(val); h = mixH1(seed, k1)  [Murmur3_x86_32]
    return [
        f"{_sql_mul32(val, 0xCC9E2D51)} AS {name}_a",
        f"{_sql_rotl32(name + '_a', 15)} % {_M32} AS {name}_b",
        f"{_sql_mul32(name + '_b', 0x1B873593)} AS {name}_k",
        f"{_sql_rotl32(f'xor({seed}, {name}_k)', 13)} % {_M32} AS {name}_c",
        f"({name}_c * 5 + {0xE6546B64}) % {_M32} AS {name}_h",
    ]


def _sql_murmur_fmix(name: str, h: str, length: int) -> list[str]:
    return [
        f"xor({h}, {length}) AS {name}_f0",
        f"xor({name}_f0, {name}_f0 // 65536) AS {name}_f1",
        f"{_sql_mul32(name + '_f1', 0x85EBCA6B)} AS {name}_f2",
        f"xor({name}_f2, {name}_f2 // 8192) AS {name}_f3",
        f"{_sql_mul32(name + '_f3', 0xC2B2AE35)} AS {name}_f4",
        f"xor({name}_f4, {name}_f4 // 65536) AS {name}_h",
    ]


def _sql_spark_hash_cols() -> list[str]:
    """Step columns computing Spark ``hash(rep INT, o_orderkey BIGINT)``
    (seed 42) as unsigned 32-bit ``m2_h``; both inputs non-negative."""
    cols = [f"rep % {_M32} AS s0_v"]
    cols += _sql_murmur_round("s1", "42", "s0_v")
    cols += _sql_murmur_fmix("m1", "s1_h", 4)
    cols += [
        f"o_orderkey % {_M32} AS s2_v",
        f"o_orderkey // {_M32} % {_M32} AS s3_v",
    ]
    cols += _sql_murmur_round("s4", "m1_h", "s2_v")
    cols += _sql_murmur_round("s5", "s4_h", "s3_v")
    cols += _sql_murmur_fmix("m2", "s5_h", 8)
    return cols


_SQL_BOOT_K = (
    "CASE "
    + " ".join(f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF))
    + " ELSE 9 END"
)


@register(
    "bootstrap_ci_order_value",
    oracle=f"""
    WITH reps AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice, g.rep
      FROM orders, unnest(generate_series(0, {_BOOT_REPS - 1})) AS g(rep)
    ),
    uni AS (
      SELECT o_orderpriority, rep, o_totalprice,
             m2_h * 1.0 / {_M32} AS u
      FROM (SELECT o_orderpriority, o_totalprice, rep,
                   {", ".join(_sql_spark_hash_cols())}
            FROM reps)
    ),
    drawn AS (
      SELECT o_orderpriority, rep, o_totalprice,
             {_SQL_BOOT_K} AS k
      FROM uni
    ),
    rep_means AS (
      SELECT o_orderpriority, rep,
             CAST(SUM(k * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / SUM(k) AS m
      FROM drawn GROUP BY o_orderpriority, rep
    ),
    point AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS point_mean,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderpriority
    )
    SELECT p.o_orderpriority,
           CAST(p.n_orders AS BIGINT) AS n_orders,
           round(p.point_mean, 4) AS point_mean,
           round(quantile_cont(r.m, 0.025), 4) AS ci_lo,
           round(quantile_cont(r.m, 0.975), 4) AS ci_hi
    FROM rep_means r JOIN point p USING (o_orderpriority)
    GROUP BY p.o_orderpriority, p.point_mean, p.n_orders
    """,
    tags=("extension", "profiling", "statistics"),
)
def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean order value per
    priority — THE scalable bootstrap: instead of resampling n rows with
    replacement (which needs global coordination), each row draws a
    Poisson(1) replicate weight, which converges to multinomial
    resampling for large n (Chamandy et al., 'Estimating Uncertainty for
    Massive Data Streams', Google 2012). One pass over the fan-out of
    rows × 32 replicates; every draw is a hash-seeded inverse-CDF lookup
    (Murmur3 uniform → CASE ladder), so the whole procedure is
    DETERMINISTIC and exactly replayed by the DuckDB oracle — a seeded
    `rand()` would be engine-private. Replicate means use the exact-
    decimal-sum / weight-count discipline; the CI is the 2.5/97.5
    percentile over the 32 replicate means (a 5 × 32-row relation)."""
    orders = load_table(spark, sf_dir, "orders")
    reps = orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))))
    # Uniform draw = Spark's built-in hash() (Murmur3_x86_32, codegen'd
    # JVM intrinsic) reinterpreted unsigned — the r1-r4 md5+conv form
    # cost 5.4 s at sf0.1 with Spark's md5 alone a measured 2.8 s floor;
    # this runs the identical query in ~1.5 s. Cross-engine determinism
    # is preserved because the oracle replays Murmur3 exactly (see
    # _sql_spark_hash_cols above). rep is INT and o_orderkey BIGINT by
    # construction — the hash chain is type-sensitive.
    u = (
        F.pmod(F.hash(F.col("rep"), F.col("o_orderkey")).cast("long"), F.lit(_M32))
        * F.lit(1.0)
        / F.lit(float(_M32))
    )
    # Inverse-CDF ladder stays a codegen when-ladder: the array-HOF form
    # `size(filter(cdf, c -> u >= c))` drops the scan out of codegen
    # (measured 57 s in r3); a localCheckpoint barrier materializing u
    # first cost 8.4 s. Branches on a cheap hash are the winning shape.
    k = None
    for kk, c in enumerate(_POIS_CDF):
        cond = u < float(c)
        k = F.when(cond, kk) if k is None else k.when(cond, kk)
    k = k.otherwise(9)
    rep_means = (
        reps.withColumn("k", k)
        .groupBy("o_orderpriority", "rep")
        .agg(
            (
                F.sum(F.col("k") * F.col("price")).cast("double")
                / F.sum("k")
            ).alias("m")
        )
    )
    point = orders.groupBy("o_orderpriority").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("point_mean"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ci = rep_means.groupBy("o_orderpriority").agg(
        F.round(F.percentile("m", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 4).alias("ci_hi"),
    )
    return ci.join(point, "o_orderpriority").select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("point_mean", 4).alias("point_mean"),
        "ci_lo",
        "ci_hi",
    )


@register(
    "parquet_layout_audit",
    oracle=None,  # the filename pseudo-column needs the parquet PATH,
    # and oracle strings run against pre-registered VIEWS — the DuckDB
    # twin (read_parquet(..., filename=true)) is value-diffed with a
    # path-matched comparison in tests/test_operators.py instead
    tags=("extension", "profiling", "layout"),
)
def parquet_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout audit of the orders table: rows and key range per
    underlying Parquet file. The ops check behind every 100 TB triage:
    a table of many tiny files murders scan parallelism setup (and the
    driver's split planning); a single giant file serializes the scan
    (the round-4 q1 probe: one 600k-row row group pinned every lineitem
    query to one core). Key ranges reveal whether files are
    range-clustered (disjoint min/max ⇒ predicate file-pruning works —
    write_sorted_parquet's contract) or salt-and-pepper. Metadata-scale
    output: one row per file."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias(
                "file_name"
            ),
            "o_orderkey",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@register(
    "layout_audit_certificate",
    # Certificate twin of parquet_layout_audit (rows-only above: file
    # NAMES are path-dependent and oracle strings run on views). The
    # path-INDEPENDENT invariants are oracle-gradable: per-file rows sum
    # to the exact table count, the union of per-file key ranges spans
    # exactly the table's [min, max], per-file ranges are internally
    # sane (min ≤ max), and at least one file exists. A broken
    # input_file_name/grouping path (double-counted rows, dropped files)
    # flips a value or boolean.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           min(o_orderkey) AS table_min_key,
           max(o_orderkey) AS table_max_key,
           TRUE AS file_rows_sum_to_total,
           TRUE AS file_ranges_span_table,
           TRUE AS file_ranges_sane,
           TRUE AS has_files
    FROM orders
    """,
    tags=("extension", "profiling", "layout", "certificate"),
)
def layout_audit_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-independent invariants of the physical-layout audit (see
    oracle comment) — one aggregate over the per-file audit relation
    cross-checked against exact table-level values."""
    audit = parquet_layout_audit(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    table = orders.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.min("o_orderkey").alias("table_min_key"),
        F.max("o_orderkey").alias("table_max_key"),
    )
    per_file = audit.agg(
        F.sum("n_rows").alias("sum_rows"),
        F.min("min_key").alias("files_min"),
        F.max("max_key").alias("files_max"),
        F.count(F.lit(1)).alias("n_files"),
        F.sum((F.col("min_key") <= F.col("max_key")).cast("int")).alias(
            "n_sane"
        ),
    )
    return table.crossJoin(F.broadcast(per_file)).select(  # 1-row × 1-row
        "total_rows",
        "table_min_key",
        "table_max_key",
        (F.col("sum_rows") == F.col("total_rows")).alias(
            "file_rows_sum_to_total"
        ),
        (
            (F.col("files_min") == F.col("table_min_key"))
            & (F.col("files_max") == F.col("table_max_key"))
        ).alias("file_ranges_span_table"),
        (F.col("n_sane") == F.col("n_files")).alias("file_ranges_sane"),
        (F.col("n_files") >= 1).alias("has_files"),
    )


@register(
    "trimmed_order_value_stats",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority AS prio,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM orders
    ),
    hist AS (
      SELECT prio, c, COUNT(*) AS cnt FROM cents GROUP BY 1, 2
    ),
    cum AS (
      SELECT prio, c, cnt,
             SUM(cnt) OVER (PARTITION BY prio ORDER BY c
                            ROWS UNBOUNDED PRECEDING) AS c_hi,
             SUM(cnt) OVER (PARTITION BY prio) AS n_total
      FROM hist
    ),
    bands AS (
      SELECT prio, c, cnt, c_hi, c_hi - cnt AS c_lo, n_total,
             n_total // 20 AS k
      FROM cum
    ),
    ret AS (
      SELECT prio, n_total, k,
             GREATEST(0, LEAST(c_hi, n_total - k) - GREATEST(c_lo, k)) AS r,
             c
      FROM bands
    )
    SELECT prio AS o_orderpriority,
           CAST(ANY_VALUE(n_total) AS BIGINT) AS n_orders,
           CAST(ANY_VALUE(k) AS BIGINT) AS n_trim_each_side,
           round(CAST(SUM(c * r) AS DOUBLE)
                 / (100e0 * (ANY_VALUE(n_total) - 2 * ANY_VALUE(k))), 6)
             AS trimmed_mean,
           round((CAST(SUM(c * r) AS DOUBLE)
                  + CAST(ANY_VALUE(k) * (MIN(CASE WHEN r > 0 THEN c END)
                                         + MAX(CASE WHEN r > 0 THEN c END))
                         AS DOUBLE))
                 / (100e0 * ANY_VALUE(n_total)), 6) AS winsorized_mean,
           CAST(MIN(CASE WHEN r > 0 THEN c END) AS DOUBLE) / 100e0 AS low_cut,
           CAST(MAX(CASE WHEN r > 0 THEN c END) AS DOUBLE) / 100e0 AS high_cut
    FROM ret GROUP BY prio
    """,
    tags=("extension", "profiling", "robust"),
)
def trimmed_order_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed and winsorized mean of order value per priority, via an
    exact value histogram — the scale-safe form of rank-based trimming.

    Companion to winsorized_price_stats (plans/analytics.py), which clips
    at interpolated P5/P95 values: this query is the RANK-exact variant —
    it drops/clamps exactly floor(n/20) rows per side (the textbook
    trimmed-mean definition, tie-handling included), which
    percentile-interpolation cannot reproduce, and adds the trimmed mean
    alongside the winsorized one.

    Rank-trimming naively needs a per-group sort of the fact table. This
    plan instead aggregates to (priority, value-in-cents, count) — the
    value DOMAIN saturates long before the fact grows (prices are bounded
    2dp decimals), so the cumulative-count window runs over histogram
    rows, not fact rows. Boundary values get fractional retention
    (min(c_hi, n-k) - max(c_lo, k)), reproducing exact row-rank trimming
    including duplicate-value ties; winsorization re-adds k copies of each
    retained-band edge. Everything is int64 cents arithmetic until the two
    final divisions (6dp).

    Scale notes: one fact-touching hash agg; the window partitions by
    priority over domain-bounded rows; no fact-scale sort, no skewed
    single reducer.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    hist = cents.groupBy("prio", "c").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("prio")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("prio")
    bands = (
        hist.withColumn("c_hi", F.sum("cnt").over(w_cum))
        .withColumn("n_total", F.sum("cnt").over(w_all))
        .withColumn("c_lo", F.col("c_hi") - F.col("cnt"))
        .withColumn("k", F.expr("n_total div 20"))
    )
    r = F.greatest(
        F.lit(0),
        F.least(F.col("c_hi"), F.col("n_total") - F.col("k"))
        - F.greatest(F.col("c_lo"), F.col("k")),
    )
    ret = bands.withColumn("r", r)
    edge_min = F.min(F.when(F.col("r") > 0, F.col("c")))
    edge_max = F.max(F.when(F.col("r") > 0, F.col("c")))
    n_total = F.any_value(F.col("n_total"))
    k_val = F.any_value(F.col("k"))
    tsum = F.sum(F.col("c") * F.col("r")).cast("double")
    return ret.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        n_total.alias("n_orders"),
        k_val.alias("n_trim_each_side"),
        F.round(tsum / (F.lit(100.0) * (n_total - 2 * k_val)), 6).alias(
            "trimmed_mean"
        ),
        F.round(
            (tsum + (k_val * (edge_min + edge_max)).cast("double"))
            / (F.lit(100.0) * n_total),
            6,
        ).alias("winsorized_mean"),
        (edge_min.cast("double") / 100.0).alias("low_cut"),
        (edge_max.cast("double") / 100.0).alias("high_cut"),
    )


_PURGE_CUTOFF = "1999-01-01"


@register(
    "deletion_impact_audit",
    oracle=f"""
    WITH active AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '{_PURGE_CUTOFF}'
    ),
    purge AS (
      SELECT c.c_custkey, n.n_name
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE NOT EXISTS (
        SELECT 1 FROM active a WHERE a.o_custkey = c.c_custkey
      )
    ),
    cascade AS (
      SELECT p.n_name, p.c_custkey, o.o_orderkey, l.l_orderkey AS li_row
      FROM purge p
      LEFT JOIN orders o ON o.o_custkey = p.c_custkey
      LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT n_name,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           COUNT(li_row) AS n_lineitems
    FROM cascade GROUP BY n_name
    """,
    tags=("extension", "maintenance", "audit"),
)
def deletion_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact preflight: customers inactive since the
    cutoff (no order on/after _PURGE_CUTOFF) and, per nation, how many
    rows a cascade delete would touch in each downstream table — the
    audit every retention/GDPR purge job runs BEFORE deleting anything.

    Plan shape: the active set is one distinct projection of the fact;
    the purge set is a broadcast-able anti join against it. The cascade
    counts run as a STAGED hash-agg pyramid (lineitems per order →
    orders+lineitems per customer → totals per nation) instead of
    count-distinct over the fanned-out join — two countDistincts in one
    aggregate would plan an Expand that triples every cascade row
    through the shuffle; the staged form moves each row through exactly
    one aggregation. Zero-order customers stay counted via the left
    joins (null-sum coalesced to 0).
    """
    orders = load_table(spark, sf_dir, "orders")
    active = (
        orders.filter(
            F.col("o_orderdate") >= F.lit(_PURGE_CUTOFF).cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    purge = (
        load_table(spark, sf_dir, "customer")
        .join(
            active,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    li_per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("li_cnt"))
    )
    per_cust = (
        purge.join(
            orders.select("o_custkey", "o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .join(
            li_per_order,
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("c_custkey", "n_name")
        .agg(
            F.count("o_orderkey").alias("cust_orders"),
            F.coalesce(F.sum("li_cnt"), F.lit(0)).alias("cust_lineitems"),
        )
    )
    return per_cust.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cust_orders").cast("bigint").alias("n_orders"),
        F.sum("cust_lineitems").cast("bigint").alias("n_lineitems"),
    )


@register(
    "ab_welch_ttest_segments",
    oracle="""
    WITH m AS (
      SELECT c.c_mktsegment AS seg,
             COUNT(*) AS n,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))
                      * CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           a.n AS n_a, b.n AS n_b,
           ROUND(a.s1 / a.n, 6) AS mean_a,
           ROUND(b.s1 / b.n, 6) AS mean_b,
           ROUND((a.s1 / a.n - b.s1 / b.n)
                 / sqrt((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
                        + (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n),
                 6) AS t_stat,
           ROUND(((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
                  + (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n)
                 * ((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
                    + (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n)
                 / (((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n)
                    * ((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n)
                    / (a.n - 1)
                    + ((b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n)
                      * ((b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n)
                      / (b.n - 1)),
                 6) AS welch_df
    FROM m a JOIN m b ON a.seg < b.seg
    """,
    tags=("extension", "profiling", "statistics"),
)
def ab_welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Welch's unequal-variance t-test on order value across the
    five market segments — the A/B significance readout an
    experimentation platform computes (does segment A spend differently
    from segment B?), emitted as t statistic + Welch-Satterthwaite
    degrees of freedom for every segment pair.

    Determinism discipline (zscore_outliers precedent): per-segment
    moments are EXACT decimal sums published to double once; every
    subsequent double op (sample variance, standard error, t, the
    Welch-Satterthwaite df ratio) is written with identical
    parenthesization in both engines, so the 6dp-rounded statistics match
    bit-for-bit. Plan shape: one broadcast fact⋈dim join + one hash
    aggregation to a 5-row moment table; the pairwise self-join is 10
    rows — a 100 TB orders table is a single map-side-combined pass, and
    the test itself never touches the fact table again.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    m = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("s1"),
            F.sum(dec("o_totalprice") * dec("o_totalprice"))
            .cast("double")
            .alias("s2"),
        )
    )
    a, b = m.alias("a"), m.alias("b")

    def _vn(side: str):
        s1, s2, n = (F.col(f"{side}.s1"), F.col(f"{side}.s2"), F.col(f"{side}.n"))
        # sample variance / n — per-side standard-error contribution,
        # mirrored operator-for-operator in the oracle SQL
        return (s2 - s1 * s1 / n) / (n - 1) / n

    vna, vnb = _vn("a"), _vn("b")
    se2 = vna + vnb
    t = (F.col("a.s1") / F.col("a.n") - F.col("b.s1") / F.col("b.n")) / F.sqrt(se2)
    welch_df = (se2 * se2) / (
        vna * vna / (F.col("a.n") - 1) + vnb * vnb / (F.col("b.n") - 1)
    )
    return (
        # broadcast the (5-row) right side: the non-equi pair join must
        # plan BroadcastNestedLoopJoin, never CartesianProduct
        a.join(F.broadcast(b), F.col("a.seg") < F.col("b.seg"))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(F.col("a.s1") / F.col("a.n"), 6).alias("mean_a"),
            F.round(F.col("b.s1") / F.col("b.n"), 6).alias("mean_b"),
            F.round(t, 6).alias("t_stat"),
            F.round(welch_df, 6).alias("welch_df"),
        )
    )


def _mk_sql_poly() -> str:
    from ecommerce_data_pipeline_spark.plans.sketches import _sql_poly

    return _sql_poly("h")


@register(
    "markov_next_event_backtest",
    oracle=f"""
    WITH hb AS (
      SELECT user_id, md5('mk1#' || CAST(user_id AS VARCHAR)) AS h
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    split AS (
      SELECT user_id, ({_mk_sql_poly()}) % 5 AS bucket FROM hb
    ),
    tr AS (
      SELECT e.user_id, s.bucket, e.event_type AS from_type,
             LEAD(e.event_type) OVER (
               PARTITION BY e.user_id
               ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id
             ) AS to_type
      FROM events e JOIN split s ON e.user_id = s.user_id
    ),
    train AS (
      SELECT from_type, to_type, COUNT(*) AS cnt
      FROM tr WHERE to_type IS NOT NULL AND bucket < 4
      GROUP BY from_type, to_type
    ),
    pred AS (
      SELECT from_type, to_type AS predicted_next
      FROM (SELECT *, row_number() OVER (
              PARTITION BY from_type ORDER BY cnt DESC, to_type
            ) AS rk FROM train)
      WHERE rk = 1
    )
    SELECT tr.from_type,
           p.predicted_next,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN tr.to_type = p.predicted_next
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(SUM(CASE WHEN tr.to_type = p.predicted_next
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS accuracy
    FROM tr JOIN pred p ON tr.from_type = p.from_type
    WHERE tr.to_type IS NOT NULL AND tr.bucket = 4
    GROUP BY tr.from_type, p.predicted_next
    """,
    tags=("extension", "analytics", "ml-eval"),
)
def markov_next_event_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out top-1 accuracy of the first-order Markov next-event
    model: users hash-split 80/20 (the portable md5-poly split of
    hash_split_train_test — no leakage: every user's whole chain lands
    on one side), the argmax transition target is fit on train users
    (ties broken lexicographically — deterministic), and each eval-user
    transition scores correct iff its actual next event matches. The
    model-evaluation loop behind event_transition_matrix: the matrix is
    the feature, this is its measured predictive value.

    Scale shape: the LEAD window partitions by user_id (the
    sessionization key); the model is |types|x|types| rows, so both the
    argmax window and the scoring join run on/against a broadcast-size
    relation; accuracies are integer-count ratios (one division, 6dp).
    """
    from ecommerce_data_pipeline_spark.plans.sketches import (
        _digest,
        _poly_from_hex,
    )

    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    split = users.select(
        "user_id",
        (_poly_from_hex(_digest(F.col("user_id"), "mk1#")) % 5).alias(
            "bucket"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.join(split, "user_id")
        .select(
            "bucket",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        # feeds both the train aggregation and the eval scoring — one
        # window pass, cached at its reduced (bucket, from, to) shape
        .persist()
    )
    train = (
        tr.where(F.col("bucket") < 4)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rk = Window.partitionBy("from_type").orderBy(
        F.desc("cnt"), F.asc("to_type")
    )
    pred = (
        train.select(
            "from_type",
            F.col("to_type").alias("predicted_next"),
            F.row_number().over(rk).alias("rk"),
        )
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    correct = F.when(
        F.col("to_type") == F.col("predicted_next"), 1
    ).otherwise(0)
    return (
        tr.where(F.col("bucket") == 4)
        .join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted_next")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(correct).cast("long").alias("n_correct"),
            F.round(F.sum(correct) * 1.0 / F.count(F.lit(1)), 6).alias(
                "accuracy"
            ),
        )
    )


@register(
    "woe_information_value",
    oracle="""
    WITH j AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS bad
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    seg AS (
      SELECT segment,
             CAST(SUM(1 - bad) AS BIGINT) AS n_good,
             CAST(SUM(bad) AS BIGINT) AS n_bad
      FROM j GROUP BY segment
    ),
    tot AS (
      SELECT SUM(n_good) AS g, SUM(n_bad) AS b, COUNT(*) AS k FROM seg
    ),
    d AS (
      SELECT seg.segment, seg.n_good, seg.n_bad,
             (seg.n_good + CAST(0.5 AS DOUBLE))
               / (tot.g + CAST(0.5 AS DOUBLE) * tot.k) AS dg,
             (seg.n_bad + CAST(0.5 AS DOUBLE))
               / (tot.b + CAST(0.5 AS DOUBLE) * tot.k) AS db
      FROM seg CROSS JOIN tot
    )
    SELECT segment, n_good, n_bad,
           ROUND(ln(dg / db), 6) AS woe,
           ROUND((dg - db) * ln(dg / db), 6) AS iv_contrib
    FROM d
    """,
    tags=("extension", "ml-prep", "encoding", "stats"),
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value of a categorical
    feature against a binary target (urgent/high order priority as the
    'bad' event) — the credit-risk-standard feature screen that
    target_mean_encoding's regression twin doesn't cover: WOE is the
    log-odds ratio of a bucket vs the population, IV = sum over buckets
    of (P(good|bucket) - P(bad|bucket)) * WOE, with Laplace 0.5
    smoothing so empty cells stay finite.

    Exactness: all class counts are BIGINT; the smoothing constant is
    CAST AS DOUBLE in the oracle so both engines run the identical
    double chain (the DECIMAL-literal pitfall found in the
    Stupid-Backoff review); two divisions + one ln per bucket, rounded
    6dp. Scale: one fact-table hash aggregate, then bucket-count-sized
    arithmetic.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    bad = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    seg = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .select(F.col("c_mktsegment").alias("segment"), bad.alias("bad"))
        .groupBy("segment")
        .agg(
            F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
            F.sum("bad").cast("long").alias("n_bad"),
        )
    )
    tot = seg.agg(
        F.sum("n_good").alias("g"),
        F.sum("n_bad").alias("b"),
        F.count(F.lit(1)).alias("k"),
    )
    dg = (F.col("n_good") + F.lit(0.5)) / (F.col("g") + F.lit(0.5) * F.col("k"))
    db = (F.col("n_bad") + F.lit(0.5)) / (F.col("b") + F.lit(0.5) * F.col("k"))
    return seg.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n_good",
        "n_bad",
        F.round(F.log(dg / db), 6).alias("woe"),
        F.round((dg - db) * F.log(dg / db), 6).alias("iv_contrib"),
    )


_DID_SALT = "did1#"
_DID_CUTOVER = "1995-06-17"


def _sql_did_bucket() -> str:
    from ecommerce_data_pipeline_spark.plans.sketches import _sql_hash60

    return f"(({_sql_hash60('o_custkey', _DID_SALT)}) % 100)"


@register(
    "did_revenue_estimate",
    oracle=f"""
    WITH j AS (
      SELECT c_mktsegment AS segment,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             CASE WHEN ({_sql_did_bucket()}) < 50 THEN 1 ELSE 0 END AS treat,
             CASE WHEN o_orderdate >= TIMESTAMP '{_DID_CUTOVER}'
                  THEN 1 ELSE 0 END AS post
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cells AS (
      SELECT segment,
             CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN price END)
                  AS DOUBLE)
               / SUM(CASE WHEN treat = 1 AND post = 0 THEN 1 END) AS m_t_pre,
             CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN price END)
                  AS DOUBLE)
               / SUM(CASE WHEN treat = 1 AND post = 1 THEN 1 END) AS m_t_post,
             CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN price END)
                  AS DOUBLE)
               / SUM(CASE WHEN treat = 0 AND post = 0 THEN 1 END) AS m_c_pre,
             CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN price END)
                  AS DOUBLE)
               / SUM(CASE WHEN treat = 0 AND post = 1 THEN 1 END) AS m_c_post
      FROM j GROUP BY segment
    )
    SELECT segment,
           ROUND(m_t_pre, 4) AS treat_pre,
           ROUND(m_t_post, 4) AS treat_post,
           ROUND(m_c_pre, 4) AS control_pre,
           ROUND(m_c_post, 4) AS control_post,
           ROUND((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4) AS did
    FROM cells
    """,
    tags=("extension", "stats", "causal"),
)
def did_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of a (synthetic) intervention
    on mean order value: customers hash-split into treatment/control
    (portable md5-polynomial, so assignment never changes as data
    grows), pre/post the cutover date, per segment — the 2x2 cell means
    and the DiD estimator (treat_post - treat_pre) - (ctrl_post -
    ctrl_pre). The canonical causal-inference readout for a rollout an
    e-commerce pipeline A/Bs by account; under the hash split the true
    effect is 0, so `did` doubles as a placebo/aa-test statistic.

    Exactness: each cell mean is an exact DECIMAL sum over 2dp prices
    with ONE double division; the DiD combines four such doubles
    deterministically and rounds 4dp. Scale: a single conditional hash
    aggregate over the fact table — no joins beyond the broadcast
    customer dim, no windows.
    """
    from ecommerce_data_pipeline_spark.plans.sketches import _hash60

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == customer["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        (_hash60(F.col("o_custkey"), _DID_SALT) % 100 < 50)
        .cast("int")
        .alias("treat"),
        (F.col("o_orderdate") >= F.lit(_DID_CUTOVER).cast("timestamp"))
        .cast("int")
        .alias("post"),
    )

    def cell(t: int, p: int):
        cond = (F.col("treat") == t) & (F.col("post") == p)
        return F.sum(F.when(cond, F.col("price"))).cast("double") / F.sum(
            F.when(cond, 1)
        )

    cells = j.groupBy("segment").agg(
        cell(1, 0).alias("m_t_pre"),
        cell(1, 1).alias("m_t_post"),
        cell(0, 0).alias("m_c_pre"),
        cell(0, 1).alias("m_c_post"),
    )
    return cells.select(
        "segment",
        F.round("m_t_pre", 4).alias("treat_pre"),
        F.round("m_t_post", 4).alias("treat_post"),
        F.round("m_c_pre", 4).alias("control_pre"),
        F.round("m_c_post", 4).alias("control_post"),
        F.round(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre")),
            4,
        ).alias("did"),
    )


# ONE home for the two-segment distribution-comparison scaffold shared
# by wasserstein_price_drift, ks_test_price, and mannwhitney_u_test:
# the segment pair, the SQL CTE building the per-value (a_cnt, b_cnt)
# histogram of integer-cents order values, and its Spark twin.
_W1_SEG_A = "BUILDING"
_W1_SEG_B = "MACHINERY"

_SQL_TWO_SEG_HIST = f"""j AS (
      SELECT c_mktsegment AS segment,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('{_W1_SEG_A}', '{_W1_SEG_B}')
    ),
    hist AS (
      SELECT v,
             SUM(CASE WHEN segment = '{_W1_SEG_A}' THEN 1 ELSE 0 END) AS a_cnt,
             SUM(CASE WHEN segment = '{_W1_SEG_B}' THEN 1 ELSE 0 END) AS b_cnt
      FROM j GROUP BY v
    )"""


def _two_segment_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, a_cnt, b_cnt) distinct-value histogram of the two segments'
    integer-cents order values — the Spark twin of _SQL_TWO_SEG_HIST."""
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(
            customer.select("c_custkey", "c_mktsegment").filter(
                F.col("c_mktsegment").isin(_W1_SEG_A, _W1_SEG_B)
            )
        ),
        orders["o_custkey"] == customer["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (dec("o_totalprice") * 100).cast("long").alias("v"),
    )
    return j.groupBy("v").agg(
        F.sum(F.when(F.col("segment") == _W1_SEG_A, 1).otherwise(0)).alias(
            "a_cnt"
        ),
        F.sum(F.when(F.col("segment") == _W1_SEG_B, 1).otherwise(0)).alias(
            "b_cnt"
        ),
    )


@register(
    "wasserstein_price_drift",
    oracle=f"""
    WITH {_SQL_TWO_SEG_HIST},
    tot AS (SELECT SUM(a_cnt) AS na, SUM(b_cnt) AS nb,
                   COUNT(*) AS n_values
            FROM hist),
    cum AS (
      SELECT v,
             SUM(a_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(b_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             LEAD(v) OVER (ORDER BY v) - v AS gap
      FROM hist
    )
    SELECT CAST(tot.na AS BIGINT) AS n_a,
           CAST(tot.nb AS BIGINT) AS n_b,
           CAST(tot.n_values AS BIGINT) AS n_values,
           ROUND(CAST(SUM(ABS(CAST(cum.ca AS HUGEINT) * tot.nb
                              - CAST(cum.cb AS HUGEINT) * tot.na)
                          * cum.gap) AS DOUBLE)
                 / tot.na / tot.nb / 100.0, 6) AS w1_dollars
    FROM cum CROSS JOIN tot
    WHERE cum.gap IS NOT NULL
    GROUP BY tot.na, tot.nb, tot.n_values
    """,
    tags=("extension", "stats", "drift"),
)
def wasserstein_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 1-D Wasserstein (earth-mover) distance between two
    segments' order-value distributions — the drift metric that, unlike
    PSI (orders_psi_decile_drift), is bin-free and metrically grounded:
    W1 = integral |F_A - F_B| over the value axis, here computed on the
    integer-cents domain with NO float accumulation. Each distinct
    value's CDF gap is the cross-multiplied integer
    |ca*nb - cb*na| (exact, denominator deferred), weighted by the gap
    to the next distinct value; one division chain and a 6dp round at
    the very end. Spark's DECIMAL(38,0) and DuckDB's HUGEINT carry the
    products exactly at any realistic scale.

    Scale shape: the fact table reduces to the distinct-VALUE histogram
    first (bounded by the 2dp price domain, not the row count — the
    trimmed_order_value_stats contract), so the single-reducer prefix
    window sees value-domain-many rows; everything corpus-sized is hash
    aggregation.
    """
    hist = _two_segment_hist(spark, sf_dir)
    tot = hist.agg(
        F.sum("a_cnt").alias("na"),
        F.sum("b_cnt").alias("nb"),
        F.count(F.lit(1)).alias("n_values"),
    )
    w_ord = Window.orderBy("v")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "v",
        F.sum("a_cnt").over(w_run).alias("ca"),
        F.sum("b_cnt").over(w_run).alias("cb"),
        (F.lead("v").over(w_ord) - F.col("v")).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    contrib = (
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("nb")
            - F.col("cb").cast("decimal(38,0)") * F.col("na")
        )
        * F.col("gap")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb", "n_values")
        .agg(
            F.round(
                F.sum(contrib).cast("double")
                / F.col("na")
                / F.col("nb")
                / F.lit(100.0),
                6,
            ).alias("w1_dollars")
        )
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.col("n_values").cast("long").alias("n_values"),
            "w1_dollars",
        )
    )


_ER_MAX_EDIT = 4
_ER_LEN_BAND = 5  # bucket width; edit<=4 implies |len diff|<=4 < width


@register(
    "blocking_quality_certificate",
    oracle=f"""
    WITH names AS (
      SELECT p_name,
             regexp_extract(p_name, '(\\S+)$', 1) AS block,
             CAST(floor(length(p_name) / {_ER_LEN_BAND}) AS BIGINT) AS f
      FROM part GROUP BY p_name
    ),
    n AS (SELECT COUNT(*) AS n_names FROM names),
    truth AS (
      SELECT COUNT(*) AS n_true
      FROM (
        SELECT DISTINCT a.p_name AS na, b.p_name AS nb
        FROM (SELECT p_name, unnest([f - 1, f, f + 1]) AS fb FROM names) a
        JOIN names b ON a.fb = b.f AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAX_EDIT}
      )
    ),
    blocked AS (
      SELECT SUM(c * (c - 1) / 2) AS n_cand
      FROM (SELECT block, COUNT(*) AS c FROM names GROUP BY block)
    ),
    retained AS (
      SELECT COUNT(*) AS n_ret
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAX_EDIT}
    )
    SELECT CAST(n.n_names AS BIGINT) AS n_names,
           CAST(truth.n_true AS BIGINT) AS n_true_matches,
           CAST(blocked.n_cand AS BIGINT) AS n_blocked_candidates,
           CAST(retained.n_ret AS BIGINT) AS n_retained,
           ROUND(CAST(retained.n_ret AS DOUBLE) / truth.n_true, 6)
             AS pair_completeness,
           ROUND(1.0 - CAST(blocked.n_cand AS DOUBLE)
                       / (CAST(n.n_names AS DOUBLE)
                          * (n.n_names - 1) / 2), 6) AS reduction_ratio
    FROM n CROSS JOIN truth CROSS JOIN blocked CROSS JOIN retained
    """,
    tags=("extension", "entity-resolution", "certificate"),
)
def blocking_quality_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality certificate for entity_resolution_fuzzy: pair
    completeness (what fraction of TRUE edit-distance<=4 matches the
    last-word block retains) and reduction ratio (what fraction of the
    all-pairs comparison space blocking eliminates) — the two standard
    record-linkage blocking metrics (Christen 2012). Completes the ER
    family's eval story the way the recall certificates do for the ANN
    families.

    Ground truth is computed COMPLETELY without a cartesian product:
    edit<=4 implies |len(a)-len(b)| <= 4 < the band width, so exploding
    each name into its three adjacent length-band buckets and
    equi-joining on the bucket covers every true match (PPJoin-style
    bounded candidate generation); candidates are verified with one
    levenshtein each. Blocked-candidate volume needs no join at all —
    it is sum over blocks of c*(c-1)/2. All counts are exact integers;
    the two ratios are single divisions rounded 6dp.
    """
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "p_name",
            F.regexp_extract("p_name", r"(\S+)$", 1).alias("block"),
            F.floor(F.length("p_name") / _ER_LEN_BAND)
            .cast("long")
            .alias("f"),
        )
        .persist()  # consumed by truth join (x2), block counts, retained join
    )
    n = names.agg(F.count(F.lit(1)).alias("n_names"))
    lev_ok = (
        F.levenshtein(F.col("na"), F.col("nb")) <= _ER_MAX_EDIT
    )
    a_bands = names.select(
        F.col("p_name").alias("na"),
        F.explode(
            F.array(F.col("f") - 1, F.col("f"), F.col("f") + 1)
        ).alias("fb"),
    )
    truth = (
        a_bands.join(
            names.select(F.col("p_name").alias("nb"), F.col("f").alias("f_b")),
            (F.col("fb") == F.col("f_b")) & (F.col("na") < F.col("nb")),
        )
        .filter(lev_ok)
        .select("na", "nb")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    blocked = (
        names.groupBy("block")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long")
            .alias("n_cand")
        )
    )
    retained = (
        names.select(F.col("p_name").alias("na"), "block")
        .join(
            names.select(F.col("p_name").alias("nb"), F.col("block").alias("_b")),
            (F.col("block") == F.col("_b")) & (F.col("na") < F.col("nb")),
        )
        .filter(lev_ok)
        .agg(F.count(F.lit(1)).alias("n_ret"))
    )
    bc = F.broadcast
    return (
        bc(n)
        .crossJoin(bc(truth))
        .crossJoin(bc(blocked))
        .crossJoin(bc(retained))
        .select(
            F.col("n_names").cast("long").alias("n_names"),
            F.col("n_true").cast("long").alias("n_true_matches"),
            F.col("n_cand").cast("long").alias("n_blocked_candidates"),
            F.col("n_ret").cast("long").alias("n_retained"),
            F.round(
                F.col("n_ret").cast("double") / F.col("n_true"), 6
            ).alias("pair_completeness"),
            F.round(
                F.lit(1.0)
                - F.col("n_cand").cast("double")
                / (
                    F.col("n_names").cast("double")
                    * (F.col("n_names") - 1)
                    / 2
                ),
                6,
            ).alias("reduction_ratio"),
        )
    )


_KANON_K = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT n_name AS nation, c_mktsegment AS segment,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
             o_orderpriority AS sensitive
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ),
    cls AS (
      SELECT nation, segment, order_year,
             COUNT(*) AS class_size,
             COUNT(DISTINCT sensitive) AS l_div
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
           CAST(MIN(l_div) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN class_size < {_KANON_K}
                         THEN class_size ELSE 0 END) AS BIGINT)
             AS rows_below_k,
           ROUND(CAST(SUM(CASE WHEN class_size < {_KANON_K}
                              THEN class_size ELSE 0 END) AS DOUBLE)
                 / SUM(class_size), 6) AS frac_rows_at_risk
    FROM cls
    """,
    tags=("extension", "privacy", "audit"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the order stream under the
    quasi-identifier set (nation, market segment, order year) with order
    priority as the sensitive attribute — the release-readiness check a
    privacy review runs before publishing "anonymized" data (Sweeney
    2002; Machanavajjhala 2007): k = the smallest equivalence-class
    size (a class of 1 is a re-identifiable individual), l = the least
    sensitive-value diversity within any class (a class with one
    priority value leaks it even at high k), plus the row mass below
    the _KANON_K policy floor.

    All-integer single aggregation pyramid: one hash aggregate to the
    equivalence classes (two broadcast dim joins on the way), one more
    to the scalar audit row; the only float is the final at-risk
    fraction. Complements pii_pseudonymization (column-level masking)
    with the set-level disclosure-risk view.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    qi = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey", "c_mktsegment")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderpriority").alias("sensitive"),
        )
    )
    cls = qi.groupBy("nation", "segment", "order_year").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct("sensitive").alias("l_div"),
    )
    below = F.when(F.col("class_size") < _KANON_K, F.col("class_size")).otherwise(
        0
    )
    return cls.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.min("l_div").cast("long").alias("l_diversity"),
        F.sum(below).cast("long").alias("rows_below_k"),
        F.round(
            F.sum(below).cast("double") / F.sum("class_size"), 6
        ).alias("frac_rows_at_risk"),
    )


_RANGE_PARTS = 32


@register(
    "range_partition_balance",
    oracle=f"""
    WITH hist AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(cnt) AS n FROM hist),
    cum AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS prev_cum
      FROM hist
    ),
    assigned AS (
      SELECT cnt,
             LEAST(CAST(floor(prev_cum * {_RANGE_PARTS} / tot.n) AS BIGINT),
                   {_RANGE_PARTS - 1}) + 1 AS pid
      FROM cum CROSS JOIN tot
    ),
    sizes AS (SELECT pid, SUM(cnt) AS sz FROM assigned GROUP BY pid)
    SELECT CAST(tot.n AS BIGINT) AS n_rows,
           {_RANGE_PARTS} AS n_partitions,
           CAST(COUNT(*) AS BIGINT) AS n_nonempty,
           CAST(MAX(sz) AS BIGINT) AS max_size,
           CAST(MIN(sz) AS BIGINT) AS min_size,
           ROUND(CAST(MAX(sz) AS DOUBLE) * {_RANGE_PARTS} / tot.n, 6)
             AS imbalance_factor
    FROM sizes CROSS JOIN tot
    GROUP BY tot.n
    """,
    tags=("extension", "layout", "audit"),
)
def range_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audit of rank-based range partitioning on the order-value
    column: the balance a RangePartitioner would achieve with perfect
    (rank-exact, not sampled) boundaries at P=_RANGE_PARTS partitions.
    Spark plans range exchanges from reservoir samples; this certificate
    computes the true boundary assignment from the value histogram and
    reports max/min partition sizes and the imbalance factor
    (max_size x P / n — 1.0 is perfect, >>1 means a hot value pins a
    partition). The layout-planning twin of zorder_layout_key: run it
    before choosing a sort/partition column for a 100 TB table.

    The boundary math never materializes boundaries: a value-bucket's
    partition id is LEAST(floor(prev_cum x P / n), P-1) + 1 — monotone
    arithmetic over the prefix counts, so a hot value spanning several
    target ranks keeps ALL its rows in its first partition (exactly how
    ties behave in a real range exchange) and the skipped partitions
    surface as empty. All-integer except the final factor; the prefix
    window runs over the distinct-VALUE histogram (value-domain
    bounded, the wasserstein_price_drift contract).
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    orders = load_table(spark, sf_dir, "orders")
    hist = (
        orders.select((dec("o_totalprice") * 100).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # consumed by the prefix-window branch AND the two tot scalars —
        # unpersisted, the fact scan + hash agg would plan three times
        .persist()
    )
    tot = hist.agg(F.sum("cnt").alias("n"))
    w_run = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "cnt", (F.sum("cnt").over(w_run) - F.col("cnt")).alias("prev_cum")
    )
    pid = (
        F.least(
            F.floor(
                F.col("prev_cum") * _RANGE_PARTS / F.col("n")
            ).cast("long"),
            F.lit(_RANGE_PARTS - 1),
        )
        + 1
    )
    sizes = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(pid.alias("pid"))
        .agg(F.sum("cnt").alias("sz"))
    )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nonempty"),
            F.max("sz").cast("long").alias("max_size"),
            F.min("sz").cast("long").alias("min_size"),
            F.round(
                F.max("sz").cast("double") * _RANGE_PARTS / F.col("n"), 6
            ).alias("imbalance_factor"),
        )
        .select(
            F.col("n").cast("long").alias("n_rows"),
            F.lit(_RANGE_PARTS).alias("n_partitions"),
            "n_nonempty",
            "max_size",
            "min_size",
            "imbalance_factor",
        )
    )


@register(
    "anova_f_segments",
    oracle="""
    WITH m AS (
      SELECT c.c_mktsegment AS seg,
             COUNT(*) AS n,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))
                      * CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             list_aggregate(list(s1 ORDER BY seg), 'sum') AS s_all,
             list_aggregate(list(s2 ORDER BY seg), 'sum') AS q_all,
             list_aggregate(list(s1 * s1 / n ORDER BY seg), 'sum') AS sq_over_n
      FROM m
    )
    SELECT k, n_total,
           ROUND(sq_over_n - s_all * s_all / n_total, 4) AS ss_between,
           ROUND(q_all - sq_over_n, 4) AS ss_within,
           ROUND(((sq_over_n - s_all * s_all / n_total) / (k - 1))
                 / ((q_all - sq_over_n) / (n_total - k)), 6) AS f_stat
    FROM folded
    """,
    tags=("extension", "profiling", "statistics", "hypothesis-test"),
)
def anova_f_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for order value across the five market
    segments — the k-group generalization of ab_welch_ttest_segments'
    pairwise view (one omnibus test instead of 10 pairwise ones, the
    standard first read before any pairwise drill-down).

    All moments (n, sum, sum-of-squares) accumulate in EXACT decimals
    (2dp prices -> 4dp squares); the between/within sums of squares
    combine the five per-group terms through segment-ORDERED folds so
    both engines add the same doubles in the same sequence, then two
    divisions form F. No window, no second pass: one conditional hash
    aggregate plus a five-row reduction.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    m = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("s1"),
            F.sum(dec("o_totalprice") * dec("o_totalprice"))
            .cast("double")
            .alias("s2"),
        )
    )

    from ecommerce_data_pipeline_spark.plans._helpers import ordered_fold

    folded = m.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        ordered_fold("seg", F.col("s1")).alias("s_all"),
        ordered_fold("seg", F.col("s2")).alias("q_all"),
        ordered_fold("seg", F.col("s1") * F.col("s1") / F.col("n")).alias(
            "sq_over_n"
        ),
    )
    ssb = F.col("sq_over_n") - F.col("s_all") * F.col("s_all") / F.col("n_total")
    ssw = F.col("q_all") - F.col("sq_over_n")
    return folded.select(
        "k",
        "n_total",
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@register(
    "mannwhitney_u_test",
    oracle=f"""
    WITH {_SQL_TWO_SEG_HIST},
    cum AS (
      SELECT v, a_cnt, a_cnt + b_cnt AS t,
             COALESCE(SUM(a_cnt + b_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev_cum
      FROM hist
    ),
    agg AS (
      SELECT SUM(a_cnt) AS n1,
             SUM(t) - SUM(a_cnt) AS n2,
             SUM(t) AS n,
             SUM(CAST(a_cnt AS HUGEINT)
                 * (2 * prev_cum + t + 1)) AS r1_x2,
             SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
      FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n_a,
           CAST(n2 AS BIGINT) AS n_b,
           CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
             AS u_stat,
           ROUND((CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)
                  - CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE))
                 / (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                               * ((n + 1) - CAST(tie_term AS DOUBLE)
                                            / (n * CAST(n - 1 AS DOUBLE)))))
                 , 6) AS z_score
    FROM agg
    """,
    tags=("extension", "profiling", "statistics", "hypothesis-test"),
)
def mannwhitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two segments'
    order-value distributions — the NONPARAMETRIC companion to
    ab_welch_ttest_segments: rank-based, so it detects stochastic
    dominance that heavy tails hide from a means test, with the
    standard tie-corrected normal approximation.

    Rank arithmetic is EXACT and integer throughout: over the
    value-domain histogram, a tied value-group's average rank doubled is
    2*prev_cum + t + 1 (integer), so the doubled rank sum R1*2, the
    doubled U, and the tie correction sum(t^3 - t) are exact
    DECIMAL(38,0)/HUGEINT aggregates; the only floats are the final
    variance expression and one division, rounded 6dp. The prefix
    window runs over distinct values (the wasserstein_price_drift
    value-domain contract).
    """
    hist = _two_segment_hist(spark, sf_dir)
    w_prev = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = F.col("a_cnt") + F.col("b_cnt")
    cum = hist.select(
        "a_cnt",
        t.alias("t"),
        F.coalesce(F.sum(t).over(w_prev), F.lit(0)).alias("prev_cum"),
    )
    agg = cum.agg(
        F.sum("a_cnt").alias("n1"),
        (F.sum("t") - F.sum("a_cnt")).alias("n2"),
        F.sum("t").alias("n"),
        F.sum(
            F.col("a_cnt").cast("decimal(38,0)")
            * (2 * F.col("prev_cum") + F.col("t") + 1)
        ).alias("r1_x2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("tie_term"),
    )
    u_x2 = F.col("r1_x2") - F.col("n1").cast("decimal(38,0)") * (F.col("n1") + 1)
    var = (
        F.col("n1").cast("double")
        * F.col("n2")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_term").cast("double")
            / (F.col("n") * (F.col("n") - 1).cast("double"))
        )
    )
    z = (
        u_x2.cast("double")
        - (F.col("n1").cast("decimal(38,0)") * F.col("n2")).cast("double")
    ) / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        (u_x2.cast("double") / 2.0).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "ks_test_price",
    oracle=f"""
    WITH {_SQL_TWO_SEG_HIST},
    tot AS (SELECT SUM(a_cnt) AS na, SUM(b_cnt) AS nb FROM hist),
    cum AS (
      SELECT SUM(a_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(b_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM hist
    )
    SELECT CAST(tot.na AS BIGINT) AS n_a,
           CAST(tot.nb AS BIGINT) AS n_b,
           ROUND(CAST(MAX(ABS(CAST(cum.ca AS HUGEINT) * tot.nb
                              - CAST(cum.cb AS HUGEINT) * tot.na)) AS DOUBLE)
                 / (CAST(tot.na AS DOUBLE) * tot.nb), 6) AS d_stat,
           ROUND(CAST(MAX(ABS(CAST(cum.ca AS HUGEINT) * tot.nb
                              - CAST(cum.cb AS HUGEINT) * tot.na)) AS DOUBLE)
                 / (CAST(tot.na AS DOUBLE) * tot.nb)
                 * sqrt(CAST(tot.na AS DOUBLE) * tot.nb / (tot.na + tot.nb)),
                 6) AS ks_z
    FROM cum CROSS JOIN tot
    GROUP BY tot.na, tot.nb
    """,
    tags=("extension", "profiling", "statistics", "hypothesis-test", "drift"),
)
def ks_test_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two segments'
    order-value distributions: D = max |F_A - F_B|, the supremum twin of
    wasserstein_price_drift's integral (KS reacts to the single worst
    CDF gap, W1 to total transported mass — drift monitors want both),
    plus the asymptotic statistic z = D*sqrt(na*nb/(na+nb)).

    The CDF gap at every distinct value is the exact cross-multiplied
    integer |ca*nb - cb*na| (HUGEINT/DECIMAL(38,0)); MAX over integers
    is exact, and D floats only in the final division. Same
    value-domain-histogram window contract as the W1 query.
    """
    # persisted: feeds the prefix window AND the totals scalar
    hist = _two_segment_hist(spark, sf_dir).persist()
    tot = hist.agg(F.sum("a_cnt").alias("na"), F.sum("b_cnt").alias("nb"))
    w_run = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        F.sum("a_cnt").over(w_run).alias("ca"),
        F.sum("b_cnt").over(w_run).alias("cb"),
    )
    gap = F.abs(
        F.col("ca").cast("decimal(38,0)") * F.col("nb")
        - F.col("cb").cast("decimal(38,0)") * F.col("na")
    )
    d_stat = F.max(gap).cast("double") / (
        F.col("na").cast("double") * F.col("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.round(d_stat, 6).alias("d_stat"),
            F.round(
                d_stat
                * F.sqrt(
                    F.col("na").cast("double")
                    * F.col("nb")
                    / (F.col("na") + F.col("nb"))
                ),
                6,
            ).alias("ks_z"),
        )
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            "d_stat",
            "ks_z",
        )
    )


@register(
    "kruskal_wallis_test",
    oracle=f"""
    WITH j AS (
      SELECT c_mktsegment AS segment,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    hist AS (
      SELECT v, segment, COUNT(*) AS cnt FROM j GROUP BY v, segment
    ),
    vt AS (SELECT v, SUM(cnt) AS t FROM hist GROUP BY v),
    cum AS (
      SELECT v, t,
             COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev_cum
      FROM vt
    ),
    rg AS (
      SELECT hist.segment,
             SUM(hist.cnt) AS n_g,
             SUM(CAST(hist.cnt AS HUGEINT)
                 * (2 * cum.prev_cum + cum.t + 1)) AS r_x2
      FROM hist JOIN cum ON hist.v = cum.v
      GROUP BY hist.segment
    ),
    ties AS (SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term FROM vt),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             list_aggregate(list(CAST(r_x2 AS DOUBLE) * r_x2 / n_g
                                 ORDER BY segment), 'sum') AS rterm
      FROM rg
    )
    SELECT k, n,
           ROUND(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rterm / 4.0
                 - 3.0 * (n + 1), 6) AS h_stat,
           ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rterm / 4.0
                  - 3.0 * (n + 1))
                 / (1.0 - CAST(ties.tie_term AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n)), 6)
             AS h_tie_corrected
    FROM folded CROSS JOIN ties
    """,
    tags=("extension", "profiling", "statistics", "hypothesis-test"),
)
def kruskal_wallis_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across all five segments — the k-group
    generalization of mannwhitney_u_test (rank-based omnibus, the
    nonparametric twin of anova_f_segments), with the standard tie
    correction H' = H / (1 - sum(t^3 - t)/(N^3 - N)).

    Same exact-rank machinery as Mann-Whitney: doubled midranks are
    integers, so each group's doubled rank sum R_g*2 is an exact
    HUGEINT/DECIMAL(38,0) aggregate; H folds the five R_g^2/n_g terms
    in segment order (ordered_fold) and divides once. The doubled ranks
    cancel through the /4 in H's rank-sum term.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec, ordered_fold

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == customer["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (dec("o_totalprice") * 100).cast("long").alias("v"),
    )
    hist = j.groupBy("v", "segment").agg(F.count(F.lit(1)).alias("cnt")).persist()
    vt = hist.groupBy("v").agg(F.sum("cnt").alias("t"))
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vt.select(
        "v",
        "t",
        F.coalesce(F.sum("t").over(w_prev), F.lit(0)).alias("prev_cum"),
    )
    rg = (
        hist.join(cum, "v")
        .groupBy("segment")
        .agg(
            F.sum("cnt").alias("n_g"),
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * (2 * F.col("prev_cum") + F.col("t") + 1)
            ).alias("r_x2"),
        )
    )
    ties = vt.agg(
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("tie_term")
    )
    folded = rg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        ordered_fold(
            "segment",
            F.col("r_x2").cast("double") * F.col("r_x2") / F.col("n_g"),
        ).alias("rterm"),
    )
    n = F.col("n")
    h = (
        F.lit(12.0) / (n.cast("double") * (n + 1)) * F.col("rterm") / 4.0
        - 3.0 * (n + 1)
    )
    return folded.crossJoin(F.broadcast(ties)).select(
        "k",
        "n",
        F.round(h, 6).alias("h_stat"),
        F.round(
            h
            / (
                F.lit(1.0)
                - F.col("tie_term").cast("double")
                / (n.cast("double") * n * n - n)
            ),
            6,
        ).alias("h_tie_corrected"),
    )


@register(
    "two_proportion_ztest",
    oracle="""
    WITH e AS (
      SELECT CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6)
                  THEN 'weekend' ELSE 'weekday' END AS cohort,
             event_type
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    c AS (
      SELECT cohort,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             COUNT(*) AS n
      FROM e GROUP BY cohort
    ),
    wide AS (
      SELECT MAX(CASE WHEN cohort = 'weekday' THEN x END) AS x1,
             MAX(CASE WHEN cohort = 'weekday' THEN n END) AS n1,
             MAX(CASE WHEN cohort = 'weekend' THEN x END) AS x2,
             MAX(CASE WHEN cohort = 'weekend' THEN n END) AS n2
      FROM c
    )
    SELECT CAST(x1 AS BIGINT) AS conv_weekday,
           CAST(n1 AS BIGINT) AS n_weekday,
           CAST(x2 AS BIGINT) AS conv_weekend,
           CAST(n2 AS BIGINT) AS n_weekend,
           ROUND(CAST(x1 AS DOUBLE) / n1, 6) AS p_weekday,
           ROUND(CAST(x2 AS DOUBLE) / n2, 6) AS p_weekend,
           ROUND((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 6) AS z_score
    FROM wide
    """,
    tags=("extension", "profiling", "statistics", "hypothesis-test"),
)
def two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion (purchases as a
    share of view+purchase events), weekday vs weekend cohorts — the
    PROPORTIONS member of the hypothesis-test family (Welch/ANOVA test
    means, Mann-Whitney/KS distributions, this one conversion rates:
    the experiment readout product teams actually ship). Pooled
    standard error under the null, as every A/B platform computes it.

    Counts are exact integers from one conditional hash aggregate; the
    rates, pooled variance, and z are a handful of deterministic double
    ops rounded 6dp. The weekday split uses dayofweek on the raw event
    timestamp — identical calendar arithmetic in both engines (Spark
    dayofweek is 1=Sunday..7, DuckDB dayofweek is 0=Sunday..6; each
    side tests its own weekend encoding, same membership).
    """
    events = load_table(spark, sf_dir, "events")
    cohort = F.when(
        F.dayofweek("ts").isin(1, 7), "weekend"
    ).otherwise("weekday")
    c = (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(cohort.alias("cohort"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("x"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    wide = c.agg(
        F.max(F.when(F.col("cohort") == "weekday", F.col("x"))).alias("x1"),
        F.max(F.when(F.col("cohort") == "weekday", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("cohort") == "weekend", F.col("x"))).alias("x2"),
        F.max(F.when(F.col("cohort") == "weekend", F.col("n"))).alias("n2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    return wide.select(
        F.col("x1").cast("long").alias("conv_weekday"),
        F.col("n1").cast("long").alias("n_weekday"),
        F.col("x2").cast("long").alias("conv_weekend"),
        F.col("n2").cast("long").alias("n_weekend"),
        F.round(p1, 6).alias("p_weekday"),
        F.round(p2, 6).alias("p_weekend"),
        F.round(
            (p1 - p2)
            / F.sqrt(
                pp
                * (F.lit(1.0) - pp)
                * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
            ),
            6,
        ).alias("z_score"),
    )


@register(
    "spearman_rank_correlation",
    oracle="""
    WITH li AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ),
    xh AS (SELECT flag, x, COUNT(*) AS t FROM li GROUP BY flag, x),
    xr AS (
      SELECT flag, x,
             2 * COALESCE(SUM(t) OVER (PARTITION BY flag ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS rx2
      FROM xh
    ),
    yh AS (SELECT flag, y, COUNT(*) AS t FROM li GROUP BY flag, y),
    yr AS (
      SELECT flag, y,
             2 * COALESCE(SUM(t) OVER (PARTITION BY flag ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS ry2
      FROM yh
    ),
    rows_ranked AS (
      SELECT li.flag, xr.rx2, yr.ry2
      FROM li
      JOIN xr ON li.flag = xr.flag AND li.x = xr.x
      JOIN yr ON li.flag = yr.flag AND li.y = yr.y
    ),
    mom AS (
      SELECT flag, COUNT(*) AS n,
             SUM(CAST(rx2 AS HUGEINT)) AS sx,
             SUM(CAST(ry2 AS HUGEINT)) AS sy,
             SUM(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
             SUM(CAST(ry2 AS HUGEINT) * ry2) AS syy,
             SUM(CAST(rx2 AS HUGEINT) * ry2) AS sxy
      FROM rows_ranked GROUP BY flag
    )
    SELECT flag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS spearman_rho
    FROM mom
    """,
    tags=("extension", "profiling", "statistics"),
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price per
    return flag — the rank-based companion to stats_correlation's
    Pearson: monotone-association strength that outliers and curvature
    can't distort. Midranks handle ties.

    Exactness: DOUBLED midranks are integers (the mannwhitney_u_test
    construction, here per (flag, variable) partition), and Pearson is
    affine-invariant, so rho computed on doubled ranks equals rho on
    midranks — every moment (n, sums, squares, cross products) is an
    exact HUGEINT/DECIMAL(38,0) aggregate and the ONLY float work is
    the final (n*sxy - sx*sy)/sqrt(...) with a 6dp round. The rank
    windows are partitioned by flag over per-variable value histograms
    (value-domain bounded); ranked values join back to rows by (flag,
    value) — hash joins against histogram-sized relations.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x"),
        (dec("l_extendedprice") * 100).cast("long").alias("y"),
    ).persist()  # feeds both rank histograms AND the row-level joins

    def rank2(col: str, alias: str) -> DataFrame:
        h = li.groupBy("flag", col).agg(F.count(F.lit(1)).alias("t"))
        w = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return h.select(
            "flag",
            col,
            (
                2 * F.coalesce(F.sum("t").over(w), F.lit(0))
                + F.col("t")
                + 1
            ).alias(alias),
        )

    ranked = li.join(rank2("x", "rx2"), ["flag", "x"]).join(
        rank2("y", "ry2"), ["flag", "y"]
    )
    d38 = "decimal(38,0)"
    mom = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx2").cast(d38)).alias("sx"),
        F.sum(F.col("ry2").cast(d38)).alias("sy"),
        F.sum(F.col("rx2").cast(d38) * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2").cast(d38) * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2").cast(d38) * F.col("ry2")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return mom.select(
        "flag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(num / F.sqrt(denx * deny), 6).alias("spearman_rho"),
    )


_CUPED_SALT = "cuped1#"
_CUPED_CUTOVER = "1996-01-01"


def _sql_cuped_bucket() -> str:
    from ecommerce_data_pipeline_spark.plans.sketches import _sql_hash60

    return f"(({_sql_hash60('c_custkey', _CUPED_SALT)}) % 100)"


@register(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH per_cust AS (
      SELECT c.c_custkey,
             CASE WHEN ({_sql_cuped_bucket()}) < 50 THEN 1 ELSE 0 END AS treat,
             COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{_CUPED_CUTOVER}'
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END),
                      0) AS x,
             COALESCE(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_CUPED_CUTOVER}'
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END),
                      0) AS y
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ),
    pooled AS (
      SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM per_cust
    ),
    arms AS (
      SELECT treat, COUNT(*) AS n_arm, SUM(x) AS sx_arm, SUM(y) AS sy_arm
      FROM per_cust GROUP BY treat
    ),
    wide AS (
      SELECT MAX(CASE WHEN treat = 1 THEN n_arm END) AS n_t,
             MAX(CASE WHEN treat = 1 THEN sx_arm END) AS sx_t,
             MAX(CASE WHEN treat = 1 THEN sy_arm END) AS sy_t,
             MAX(CASE WHEN treat = 0 THEN n_arm END) AS n_c,
             MAX(CASE WHEN treat = 0 THEN sx_arm END) AS sx_c,
             MAX(CASE WHEN treat = 0 THEN sy_arm END) AS sy_c
      FROM arms
    )
    SELECT CAST(wide.n_t AS BIGINT) AS n_treat,
           CAST(wide.n_c AS BIGINT) AS n_ctrl,
           ROUND(CAST(wide.sy_t AS DOUBLE) / wide.n_t
                 - CAST(wide.sy_c AS DOUBLE) / wide.n_c, 4) AS diff_raw,
           ROUND(CAST(pooled.n * pooled.sxy - pooled.sx * pooled.sy AS DOUBLE)
                 / CAST(pooled.n * pooled.sxx - pooled.sx * pooled.sx
                        AS DOUBLE), 6) AS theta,
           ROUND((CAST(wide.sy_t AS DOUBLE) / wide.n_t
                  - CAST(wide.sy_c AS DOUBLE) / wide.n_c)
                 - (CAST(pooled.n * pooled.sxy - pooled.sx * pooled.sy
                         AS DOUBLE)
                    / CAST(pooled.n * pooled.sxx - pooled.sx * pooled.sx
                           AS DOUBLE))
                   * (CAST(wide.sx_t AS DOUBLE) / wide.n_t
                      - CAST(wide.sx_c AS DOUBLE) / wide.n_c), 4)
             AS diff_cuped,
           ROUND(CAST(pooled.n * pooled.sxy - pooled.sx * pooled.sy AS DOUBLE)
                 * CAST(pooled.n * pooled.sxy - pooled.sx * pooled.sy
                        AS DOUBLE)
                 / (CAST(pooled.n * pooled.sxx - pooled.sx * pooled.sx
                         AS DOUBLE)
                    * CAST(pooled.n * pooled.syy - pooled.sy * pooled.sy
                           AS DOUBLE)), 6) AS var_reduction_rho2
    FROM wide CROSS JOIN pooled
    """,
    tags=("extension", "profiling", "statistics", "experimentation"),
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013):
    per-customer post-period revenue adjusted by the pre-period
    covariate, Y_adj = Y - theta*(X - E[X]) with theta = cov(X,Y)/var(X)
    — the standard trick that cuts experiment runtimes by the rho^2
    factor reported here. Arms are the did_revenue_estimate hash-split
    placebo (true effect 0), so diff_cuped doubles as an A/A check that
    the adjustment itself introduces no bias.

    Everything reduces to EXACT decimal moments: per-customer pre/post
    sums over 2dp prices (LEFT JOIN keeps zero-activity customers in
    the assignment population), pooled n/sx/sy/sxx/sxy/syy and per-arm
    sums — the arm mean of Y_adj needs NO per-row float because it
    equals meanY_arm - theta*(meanX_arm - meanX_pooled), and the
    pooled-mean terms cancel in the arm DIFFERENCE. Floats appear only
    in the final theta/means divisions. Scale: one fact hash aggregate
    to customers, one more to scalars.
    """
    from ecommerce_data_pipeline_spark.plans._helpers import dec
    from ecommerce_data_pipeline_spark.plans.sketches import _hash60

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    pre = F.col("o_orderdate") < F.lit(_CUPED_CUTOVER).cast("timestamp")
    per_cust = (
        customer.select("c_custkey")
        .join(orders, customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.when(pre, dec("o_totalprice"))), F.lit(0).cast("decimal(18,2)")
            ).alias("x"),
            F.coalesce(
                F.sum(F.when(~pre, dec("o_totalprice"))), F.lit(0).cast("decimal(18,2)")
            ).alias("y"),
        )
        .select(
            (_hash60(F.col("c_custkey"), _CUPED_SALT) % 100 < 50)
            .cast("int")
            .alias("treat"),
            "x",
            "y",
        )
        .persist()  # feeds the pooled moments AND the per-arm sums
    )
    pooled = per_cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    arms = per_cust.groupBy("treat").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("x").alias("sx_arm"),
        F.sum("y").alias("sy_arm"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("treat") == 1, F.col("n_arm"))).alias("n_t"),
        F.max(F.when(F.col("treat") == 1, F.col("sx_arm"))).alias("sx_t"),
        F.max(F.when(F.col("treat") == 1, F.col("sy_arm"))).alias("sy_t"),
        F.max(F.when(F.col("treat") == 0, F.col("n_arm"))).alias("n_c"),
        F.max(F.when(F.col("treat") == 0, F.col("sx_arm"))).alias("sx_c"),
        F.max(F.when(F.col("treat") == 0, F.col("sy_arm"))).alias("sy_c"),
    )
    cov_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varx_num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary_num = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    theta = cov_num / varx_num
    dy = F.col("sy_t").cast("double") / F.col("n_t") - F.col("sy_c").cast(
        "double"
    ) / F.col("n_c")
    dx = F.col("sx_t").cast("double") / F.col("n_t") - F.col("sx_c").cast(
        "double"
    ) / F.col("n_c")
    return wide.crossJoin(F.broadcast(pooled)).select(
        F.col("n_t").cast("long").alias("n_treat"),
        F.col("n_c").cast("long").alias("n_ctrl"),
        F.round(dy, 4).alias("diff_raw"),
        F.round(theta, 6).alias("theta"),
        F.round(dy - theta * dx, 4).alias("diff_cuped"),
        F.round(cov_num * cov_num / (varx_num * vary_num), 6).alias(
            "var_reduction_rho2"
        ),
    )


@register(
    "layout_values_certificate",
    # VALUE certificate for parquet_layout_audit (rows-only above): the
    # r6 layout_audit_certificate pinned aggregate invariants (row sums,
    # range span) but never the audit's PER-FILE values. Here every
    # (file_name, n_rows, min_key, max_key) row is checked against an
    # independent computation path — the file list comes from the
    # filesystem (driver-side, metadata-scale) and each file is scanned
    # on its own, so an input_file_name/grouping defect (rows attributed
    # to the wrong file, a dropped file, a split double-count) flips the
    # multiset-equality boolean even when totals still balance. Oracle:
    # exact table-level values from the view + constants the audit must
    # reproduce. Eager by nature (exceptAll set-diffs) → 'eager' tag.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           min(o_orderkey) AS table_min_key,
           max(o_orderkey) AS table_max_key,
           TRUE AS per_file_values_match,
           TRUE AS file_count_matches,
           TRUE AS has_files
    FROM orders
    """,
    tags=("extension", "profiling", "layout", "certificate", "eager"),
)
def layout_values_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file value check of the physical-layout audit (see oracle
    comment). The independent side unions one bounded scan per physical
    file — file COUNT is metadata-scale by the audit's own contract, so
    the driver-side listing and per-file reads are not a scale hazard."""
    import glob as _glob
    import os as _os

    from pyspark.sql import Row

    # Guard FIRST, before ANY read touches the path: a missing table or
    # a part-file-less directory must grade as has_files=False rather
    # than crash — schema inference on the audit side would raise
    # before a later guard could run (r8 review finding).
    root = _os.path.join(sf_dir, "orders.parquet")
    paths = (
        sorted(_glob.glob(_os.path.join(root, "*.parquet")))
        if _os.path.isdir(root)
        else ([root] if _os.path.exists(root) else [])
    )
    if not paths:
        return spark.createDataFrame(
            [
                Row(
                    total_rows=None,
                    table_min_key=None,
                    table_max_key=None,
                    per_file_values_match=False,
                    file_count_matches=False,
                    has_files=False,
                )
            ],
            "total_rows bigint, table_min_key bigint, "
            "table_max_key bigint, per_file_values_match boolean, "
            "file_count_matches boolean, has_files boolean",
        )
    audit = parquet_layout_audit(spark, sf_dir)
    per_file = None
    for p in paths:
        # Label each independent scan with input_file_name() ITSELF
        # (same regexp as the audit) instead of the filesystem
        # basename: both sides then share Hadoop's URI encoding BY
        # CONSTRUCTION — a hand-rolled percent-quote either under- or
        # over-encodes relative to Path.toUri for legal-but-unusual
        # names like 'part=0.parquet' (r8 review finding).
        one = (
            spark.read.parquet(p)
            .groupBy(
                F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias(
                    "file_name"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
            )
        )
        per_file = one if per_file is None else per_file.unionByName(one)
    values_match = (
        audit.exceptAll(per_file).count() == 0
        and per_file.exceptAll(audit).count() == 0
    )
    n_audit_files = audit.count()
    orders = load_table(spark, sf_dir, "orders")
    table = orders.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.min("o_orderkey").alias("table_min_key"),
        F.max("o_orderkey").alias("table_max_key"),
    )
    return table.select(
        "total_rows",
        "table_min_key",
        "table_max_key",
        F.lit(bool(values_match)).alias("per_file_values_match"),
        F.lit(bool(n_audit_files == len(paths))).alias("file_count_matches"),
        F.lit(bool(len(paths) >= 1)).alias("has_files"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b rank concordance (r9) — the pairwise member of the
# correlation tier next to spearman_rank_correlation (rank moments) and
# stats_corr_covar (product moments): tau-b counts concordant vs
# discordant day pairs directly, with the standard tie corrections
# (Kendall 1945), so it is exact on integer data with no rank midpoints.


@register(
    "kendall_tau_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty,
             CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END AS txy
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(conc) AS BIGINT) AS concordant,
             CAST(SUM(disc) AS BIGINT) AS discordant,
             CAST(SUM(tx) AS BIGINT) AS ties_x_only,
             CAST(SUM(ty) AS BIGINT) AS ties_y_only,
             CAST(SUM(txy) AS BIGINT) AS ties_both
      FROM pairs
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT nd.n_days, agg.n_pairs, agg.concordant, agg.discordant,
           agg.ties_x_only, agg.ties_y_only, agg.ties_both,
           round(CAST(agg.concordant - agg.discordant AS DOUBLE)
                 / sqrt(CAST(agg.n_pairs - agg.ties_x_only - agg.ties_both
                             AS DOUBLE)
                        * CAST(agg.n_pairs - agg.ties_y_only - agg.ties_both
                               AS DOUBLE)), 6) AS tau_b
    FROM agg CROSS JOIN nd
    """,
    tags=("extension", "profiling", "statistics"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order COUNT and daily revenue: every
    unordered day pair is classified concordant / discordant / tied
    (x-only, y-only, both), and tau_b = (C - D) /
    sqrt((n0 - n1)(n0 - n2)) with n1/n2 the x-/y-tied pair counts —
    the exact tie-corrected form, reported next to the raw pair
    census so the tie structure is auditable.

    Exactness: x is a BIGINT count, y an exact BIGINT cent sum;
    concordance is pure COMPARISON logic (no products of measures, so
    no overflow at any SF); the single float op is the final division
    by a sqrt of exact BIGINT differences (both exactly-rounded IEEE,
    shared text), rounded 6dp both sides.

    Scale shape: ONE fact aggregate reduces orders to the CALENDAR
    (~2.4k rows, localCheckpointed — the ESD discipline), and the
    O(days^2/2) = ~2.9M-row pair relation is a broadcast range self-
    join on that bounded grid — the siegel_revenue_trend contract:
    quadratic in the calendar, never in the corpus."""
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum((dec("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
        .localCheckpoint()  # calendar-bounded; feeds both join sides
    )
    a = daily.select(
        F.col("day").alias("day_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = daily.select(
        F.col("day").alias("day_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = a.join(F.broadcast(b), F.col("day_a") < F.col("day_b")).select(
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
            | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))),
            1,
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
            | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))),
            1,
        )
        .otherwise(0)
        .alias("disc"),
        F.when(
            (F.col("xa") == F.col("xb")) & (F.col("ya") != F.col("yb")), 1
        )
        .otherwise(0)
        .alias("tx"),
        F.when(
            (F.col("ya") == F.col("yb")) & (F.col("xa") != F.col("xb")), 1
        )
        .otherwise(0)
        .alias("ty"),
        F.when(
            (F.col("xa") == F.col("xb")) & (F.col("ya") == F.col("yb")), 1
        )
        .otherwise(0)
        .alias("txy"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        F.sum("tx").cast("long").alias("ties_x_only"),
        F.sum("ty").cast("long").alias("ties_y_only"),
        F.sum("txy").cast("long").alias("ties_both"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return agg.crossJoin(F.broadcast(nd)).select(
        "n_days",
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x_only",
        "ties_y_only",
        "ties_both",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.sqrt(
                (
                    F.col("n_pairs")
                    - F.col("ties_x_only")
                    - F.col("ties_both")
                ).cast("double")
                * (
                    F.col("n_pairs")
                    - F.col("ties_y_only")
                    - F.col("ties_both")
                ).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR control over the per-brand discount-effect
# screen (r9) — the multiple-testing member of the statistics tier: the
# per-test z machinery exists (welch/two-proportion), but a 25-brand
# screen that rejects every |z| > 1.96 inflates the family-wise false
# discovery rate; BH (Benjamini & Hochberg 1995) orders the tests and
# applies the rank-scaled threshold p_(i) <= i*alpha/K. Executed on the
# |z| scale: reject at rank i iff |z|_(i) >= Phi^-1(1 - (i*alpha/K)/2),
# with the K inverse-normal critical values BAKED as Python-computed
# constants (the ESD-lambda discipline — stdlib NormalDist, no scipy).

_BH_ALPHA = 0.05
_BH_K = 25  # TPC-H brand universe: Brand#11..Brand#55
_BH_DISCOUNT_GATE = 0.05  # high-discount arm: l_discount >= 0.05


def _bh_crits() -> list[float]:
    from statistics import NormalDist

    nd = NormalDist()
    return [
        nd.inv_cdf(1.0 - (_BH_ALPHA * i / _BH_K) / 2.0)
        for i in range(1, _BH_K + 1)
    ]


_BH_CRIT = _bh_crits()


def _bh_welch_z(s1: str, n1: str, ss1: str, s0: str, n0: str, ss0: str) -> str:
    """Welch z from exact integer moments — ONE textual home per engine
    side (the _esd_r_sql discipline): /,*,−,sqrt are exactly-rounded
    IEEE ops, so identical op order => identical bits."""
    m1 = f"(CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE))"
    m0 = f"(CAST({s0} AS DOUBLE) / CAST({n0} AS DOUBLE))"
    v1 = (
        f"((CAST({ss1} AS DOUBLE) - {m1} * CAST({s1} AS DOUBLE))"
        f" / (CAST({n1} AS DOUBLE) - 1.0))"
    )
    v0 = (
        f"((CAST({ss0} AS DOUBLE) - {m0} * CAST({s0} AS DOUBLE))"
        f" / (CAST({n0} AS DOUBLE) - 1.0))"
    )
    return (
        f"({m1} - {m0}) / sqrt({v1} / CAST({n1} AS DOUBLE)"
        f" + {v0} / CAST({n0} AS DOUBLE))"
    )


def _bh_sql() -> str:
    z = _bh_welch_z("s1", "n1", "ss1", "s0", "n0", "ss0")
    crit_case = " ".join(
        f"WHEN {i + 1} THEN CAST({c!r} AS DOUBLE)"
        for i, c in enumerate(_BH_CRIT)
    )
    return f"""
    WITH moments AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(CASE WHEN l.l_discount >= {_BH_DISCOUNT_GATE!r}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN l.l_discount >= {_BH_DISCOUNT_GATE!r}
                           THEN CAST(l.l_quantity AS BIGINT) END)
                  AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN l.l_discount >= {_BH_DISCOUNT_GATE!r}
                           THEN CAST(l.l_quantity AS BIGINT)
                                * CAST(l.l_quantity AS BIGINT) END)
                  AS BIGINT) AS ss1,
             CAST(SUM(CASE WHEN l.l_discount < {_BH_DISCOUNT_GATE!r}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN l.l_discount < {_BH_DISCOUNT_GATE!r}
                           THEN CAST(l.l_quantity AS BIGINT) END)
                  AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN l.l_discount < {_BH_DISCOUNT_GATE!r}
                           THEN CAST(l.l_quantity AS BIGINT)
                                * CAST(l.l_quantity AS BIGINT) END)
                  AS BIGINT) AS ss0
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    zs AS (
      SELECT brand, n1, n0, round({z}, 6) AS z6
      FROM moments WHERE n1 > 1 AND n0 > 1
    ),
    ranked AS (
      SELECT a.brand, a.n1, a.n0, a.z6, abs(a.z6) AS az6,
             CAST(COUNT(*) AS INT) AS bh_rank
      FROM zs a JOIN zs b
        ON abs(b.z6) > abs(a.z6)
        OR (abs(b.z6) = abs(a.z6) AND b.brand <= a.brand)
      GROUP BY a.brand, a.n1, a.n0, a.z6
    ),
    gated AS (
      SELECT brand, n1, n0, z6, az6, bh_rank,
             CASE bh_rank {crit_case}
               ELSE CAST({_BH_CRIT[-1]!r} AS DOUBLE) END AS crit,
             az6 >= (CASE bh_rank {crit_case}
               ELSE CAST({_BH_CRIT[-1]!r} AS DOUBLE) END) AS passes_at_rank
      FROM ranked
    ),
    nd AS (
      SELECT CAST(COALESCE(MAX(CASE WHEN passes_at_rank THEN bh_rank END),
                           0) AS INT) AS n_discoveries
      FROM gated
    )
    SELECT g.brand, g.n1 AS n_high_discount, g.n0 AS n_low_discount,
           g.z6 AS welch_z, g.bh_rank, round(g.crit, 6) AS crit_z,
           g.passes_at_rank, nd.n_discoveries,
           g.bh_rank <= nd.n_discoveries AS is_discovery
    FROM gated g CROSS JOIN nd
    """


@register(
    "benjamini_hochberg_fdr",
    oracle=_bh_sql(),
    tags=("extension", "profiling", "statistics", "multiple-testing"),
)
def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR control over the 25-brand discount-effect screen:
    per brand, a Welch z of l_quantity between high-discount
    (>= 0.05) and low-discount lines from exact BIGINT moments; tests
    ranked by |z| (6dp, brand tiebreak — a deterministic total order on
    both engines); rank i is a discovery iff some rank j >= i has
    |z|_(j) >= Phi^-1(1 - (alpha*j/K)/2) — the step-up "largest passing
    rank" rule (same in-band max-rank shape as ESD's n_outliers), with
    the 25 inverse-normal critical values baked from stdlib NormalDist
    at plan-build time (identical literals in both engines — the
    critical-value discipline that keeps erf/inv_cdf out of BOTH query
    engines entirely).

    Exactness: quantities are integers so all six moments are BIGINT;
    z is one shared-text IEEE expression (_bh_welch_z) rounded 6dp
    BEFORE ranking and gating; ranking is a <= 25x25 broadcast
    self-join on the localCheckpointed test relation (no global
    window); the degenerate n<=1 arms are filtered identically on both
    sides (huber discipline).

    Scale shape: ONE fact aggregate (lineitem x broadcast part -> 25
    moment rows) ends the fact lineage; everything after is metadata-
    scale algebra."""
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    hi = dec("l_discount") >= F.lit(_BH_DISCOUNT_GATE).cast("decimal(18,2)")
    q = F.col("l_quantity").cast("long")
    moments = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(hi, q)).cast("long").alias("s1"),
            F.sum(F.when(hi, q * q)).cast("long").alias("ss1"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("n0"),
            F.sum(F.when(~hi, q)).cast("long").alias("s0"),
            F.sum(F.when(~hi, q * q)).cast("long").alias("ss0"),
        )
    )
    z = _bh_welch_z("s1", "n1", "ss1", "s0", "n0", "ss0")
    zs = (
        moments.filter((F.col("n1") > 1) & (F.col("n0") > 1))
        .select(
            "brand",
            "n1",
            "n0",
            F.round(F.expr(z), 6).alias("z6"),
        )
        .localCheckpoint()  # <= 25 rows; feeds both rank-join sides
    )
    a, b = zs.alias("a"), zs.alias("b")
    ranked = (
        a.join(
            F.broadcast(b),
            (F.abs(F.col("b.z6")) > F.abs(F.col("a.z6")))
            | (
                (F.abs(F.col("b.z6")) == F.abs(F.col("a.z6")))
                & (F.col("b.brand") <= F.col("a.brand"))
            ),
        )
        .groupBy(
            F.col("a.brand").alias("brand"),
            F.col("a.n1").alias("n1"),
            F.col("a.n0").alias("n0"),
            F.col("a.z6").alias("z6"),
        )
        .agg(F.count(F.lit(1)).cast("int").alias("bh_rank"))
        .withColumn("az6", F.abs(F.col("z6")))
    )
    crit = F.element_at(
        F.array(*[F.lit(c) for c in _BH_CRIT]),
        F.least(F.col("bh_rank"), F.lit(_BH_K)),
    )
    gated = ranked.select(
        "brand",
        "n1",
        "n0",
        "z6",
        "az6",
        "bh_rank",
        crit.alias("crit"),
        (F.col("az6") >= crit).alias("passes_at_rank"),
    )
    nd = gated.agg(
        F.coalesce(
            F.max(F.when(F.col("passes_at_rank"), F.col("bh_rank"))),
            F.lit(0),
        )
        .cast("int")
        .alias("n_discoveries")
    )
    return gated.crossJoin(F.broadcast(nd)).select(
        "brand",
        F.col("n1").alias("n_high_discount"),
        F.col("n0").alias("n_low_discount"),
        F.col("z6").alias("welch_z"),
        "bh_rank",
        F.round(F.col("crit"), 6).alias("crit_z"),
        "passes_at_rank",
        "n_discoveries",
        (F.col("bh_rank") <= F.col("n_discoveries")).alias("is_discovery"),
    )


# ---------------------------------------------------------------------------
# Group-sequential monitoring with O'Brien-Fleming-shaped boundaries
# (r9) — the interim-analysis member of the experimentation tier: cuped/
# welch read an experiment ONCE at the end; a monitored experiment is
# tested at K interim looks, and naive repeated z>1.96 testing inflates
# type-I error several-fold. The OBF shape b_k = C * sqrt(K/k) spends
# almost no alpha early (look 1 needs |z| > ~5) and ~z_{alpha/2} at the
# final look (O'Brien & Brien-Fleming 1979; normal-approximation form with
# C = Phi^-1(1-alpha/2), the conservative textbook shape). Interims are
# pinned to the REFERENCE CALENDAR (order years 1995..2001, K=7 — the
# ESD baked-constant discipline), boundaries baked as Python floats.

_OBF_SALT = "obf1#"
_OBF_YEARS = list(range(1995, 2002))  # K = 7 calendar interims (testdata order calendar 1995..2001)
_OBF_K = len(_OBF_YEARS)


def _obf_boundaries() -> list[float]:
    from statistics import NormalDist

    c = NormalDist().inv_cdf(1.0 - 0.05 / 2.0)
    return [c * math.sqrt(_OBF_K / k) for k in range(1, _OBF_K + 1)]


_OBF_BOUND = _obf_boundaries()


def _obf_sql() -> str:
    from ecommerce_data_pipeline_spark.plans.sketches import _sql_hash60

    z = _bh_welch_z("cs1", "cn1", "css1", "cs0", "cn0", "css0")
    rows = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS INT) AS look_k,"
        f" CAST({y} AS INT) AS through_year,"
        f" CAST({_OBF_BOUND[k]!r} AS DOUBLE) AS boundary_z"
        for k, y in enumerate(_OBF_YEARS)
    )
    return f"""
    WITH per_order AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             CASE WHEN ({_sql_hash60('o_orderkey', _OBF_SALT)}) % 100 < 50
                  THEN 1 ELSE 0 END AS arm,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100 AS dollars
      FROM orders
    ),
    yearly AS (
      SELECT yr, arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dollars) AS BIGINT) AS s,
             CAST(SUM(dollars * dollars) AS BIGINT) AS ss
      FROM per_order GROUP BY 1, 2
    ),
    looks AS ({rows}),
    cumm AS (
      SELECT l.look_k, l.through_year, l.boundary_z,
             CAST(COALESCE(SUM(CASE WHEN y.arm = 1 THEN y.n END), 0)
                  AS BIGINT) AS cn1,
             CAST(COALESCE(SUM(CASE WHEN y.arm = 1 THEN y.s END), 0)
                  AS BIGINT) AS cs1,
             CAST(COALESCE(SUM(CASE WHEN y.arm = 1 THEN y.ss END), 0)
                  AS BIGINT) AS css1,
             CAST(COALESCE(SUM(CASE WHEN y.arm = 0 THEN y.n END), 0)
                  AS BIGINT) AS cn0,
             CAST(COALESCE(SUM(CASE WHEN y.arm = 0 THEN y.s END), 0)
                  AS BIGINT) AS cs0,
             CAST(COALESCE(SUM(CASE WHEN y.arm = 0 THEN y.ss END), 0)
                  AS BIGINT) AS css0
      FROM looks l LEFT JOIN yearly y ON y.yr <= l.through_year
      GROUP BY 1, 2, 3
    ),
    zs AS (
      SELECT look_k, through_year, boundary_z, cn1, cn0,
             CASE WHEN cn1 > 1 AND cn0 > 1
                  THEN round({z}, 6) END AS welch_z
      FROM cumm
    ),
    fc AS (
      SELECT CAST(COALESCE(MIN(CASE WHEN abs(welch_z) >= boundary_z
                                    THEN look_k END), 0) AS INT)
               AS first_crossing_k
      FROM zs
    )
    SELECT zs.look_k, zs.through_year,
           zs.cn1 AS n_treat_cum, zs.cn0 AS n_ctrl_cum,
           zs.welch_z, round(zs.boundary_z, 6) AS boundary_z,
           COALESCE(abs(zs.welch_z) >= zs.boundary_z, FALSE) AS crossed,
           fc.first_crossing_k,
           fc.first_crossing_k > 0
             AND zs.look_k >= fc.first_crossing_k AS stopped
    FROM zs CROSS JOIN fc
    """


@register(
    "group_sequential_obf_monitor",
    oracle=_obf_sql(),
    tags=("extension", "profiling", "statistics", "experimentation"),
)
def group_sequential_obf_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential experiment monitor: orders are hash-split into
    an A/A experiment (portable 60-bit hash on o_orderkey), and at each
    of K=7 calendar interims (through-year 1995..2001) the cumulative
    Welch z on order value (whole dollars) is compared against the
    baked OBF-shaped boundary C*sqrt(K/k). Emits the full monitoring
    table — cumulative arm sizes, z, boundary, crossed, the first
    crossing look (0 = never, the expected A/A outcome), and the
    stopped flag from that look onward.

    Exactness: dollar values are exact BIGINTs (cents div 100 — bounds
    ss ~ 3.8e15 at sf0.01, BIGINT-safe through ~sf1000); the cumulative
    moments come from a LOOKS x yearly range join (a 7 x 14-row
    broadcast algebra, no window at all); z is the shared-text
    _bh_welch_z expression rounded 6dp before the boundary comparison,
    and the boundaries are data-independent Python literals (so the
    float-feeds-comparison gotcha cannot bite). Degenerate looks
    (either arm <= 1) publish NULL z and crossed=false identically.

    Scale shape: ONE fact hash aggregate to (year, arm) — 14 rows —
    ends the fact lineage; the look grid is a broadcast literal
    relation (the HLL day-grid precedent)."""
    from ecommerce_data_pipeline_spark.plans._helpers import dec
    from ecommerce_data_pipeline_spark.plans.sketches import _hash60

    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            (_hash60(F.col("o_orderkey"), _OBF_SALT) % 100 < 50)
            .cast("int")
            .alias("arm"),
            F.expr(
                "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100 AS BIGINT)"
            ).alias("dollars"),
        )
        .groupBy("yr", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dollars").cast("long").alias("s"),
            F.sum(F.col("dollars") * F.col("dollars"))
            .cast("long")
            .alias("ss"),
        )
        .localCheckpoint()  # 14 rows; ends the fact lineage
    )
    looks = spark.createDataFrame(
        [(k + 1, y, _OBF_BOUND[k]) for k, y in enumerate(_OBF_YEARS)],
        "look_k int, through_year int, boundary_z double",
    )
    cumm = (
        looks.join(
            F.broadcast(yearly), yearly["yr"] <= looks["through_year"], "left"
        )
        .groupBy("look_k", "through_year", "boundary_z")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("arm") == arm, F.col(c))), F.lit(0)
                )
                .cast("long")
                .alias(f"c{c}{arm}")
                for arm in (1, 0)
                for c in ("n", "s", "ss")
            ]
        )
    )
    z = _bh_welch_z("cs1", "cn1", "css1", "cs0", "cn0", "css0")
    zs = cumm.select(
        "look_k",
        "through_year",
        "boundary_z",
        "cn1",
        "cn0",
        F.when(
            (F.col("cn1") > 1) & (F.col("cn0") > 1), F.round(F.expr(z), 6)
        ).alias("welch_z"),
    ).localCheckpoint()  # 7 rows; feeds the crossing scan + output
    fc = zs.agg(
        F.coalesce(
            F.min(
                F.when(
                    F.abs(F.col("welch_z")) >= F.col("boundary_z"),
                    F.col("look_k"),
                )
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("first_crossing_k")
    )
    return zs.crossJoin(F.broadcast(fc)).select(
        "look_k",
        "through_year",
        F.col("cn1").alias("n_treat_cum"),
        F.col("cn0").alias("n_ctrl_cum"),
        "welch_z",
        F.round(F.col("boundary_z"), 6).alias("boundary_z"),
        F.coalesce(
            F.abs(F.col("welch_z")) >= F.col("boundary_z"), F.lit(False)
        ).alias("crossed"),
        "first_crossing_k",
        (
            (F.col("first_crossing_k") > 0)
            & (F.col("look_k") >= F.col("first_crossing_k"))
        ).alias("stopped"),
    )


# ---------------------------------------------------------------------------
# Median-of-means robust mean (r9) — the estimator behind every
# heavy-tail-robust distributed aggregation (Nemirovsky & Yudin 1983;
# the streaming formulation in Alon-Matias-Szegedy): shard the stream
# into B deterministic buckets, average each bucket exactly, publish the
# MEDIAN of the bucket means. A single adversarial/corrupt shard moves
# the median by one order statistic instead of dragging the global mean
# — the certificate next to trimmed/winsorized stats (value-domain
# robustness) covering SHARD-domain robustness.

_MOM_BUCKETS = 32
_MOM_SALT = "mom1#"


def _mom_sql() -> str:
    from ecommerce_data_pipeline_spark.plans.sketches import _sql_hash60

    h = _sql_hash60("o_orderkey", _MOM_SALT)
    m = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    ma, mc = m.replace("s", "a.s").replace("n", "a.n"), m.replace(
        "s", "c.s"
    ).replace("n", "c.n")
    return f"""
    WITH vals AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             ({h}) % {_MOM_BUCKETS} AS b
      FROM orders
    ),
    bm AS MATERIALIZED (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM vals GROUP BY 1
    ),
    ranked AS MATERIALIZED (
      SELECT a.b, a.n, a.s, {ma} AS m,
             CAST(COUNT(*) AS INT) AS rk
      FROM bm a JOIN bm c
        ON ({mc}) < ({ma}) OR (({mc}) = ({ma}) AND c.b <= a.b)
      GROUP BY a.b, a.n, a.s
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(s) AS BIGINT) AS s_all
      FROM bm
    ),
    med AS (
      SELECT
        (SELECT r.m FROM ranked r CROSS JOIN tot t
         WHERE r.rk = (t.n_buckets + 1) // 2) AS m_lo,
        (SELECT r.m FROM ranked r CROSS JOIN tot t
         WHERE r.rk = t.n_buckets // 2 + 1) AS m_hi
    )
    SELECT tot.n_all AS n_orders, tot.n_buckets,
           round(CAST(tot.s_all AS DOUBLE) / CAST(tot.n_all AS DOUBLE)
                 / 100.0, 4) AS plain_mean,
           round((med.m_lo + med.m_hi) / 2.0 / 100.0, 4) AS mom_mean,
           round((SELECT MIN(m) FROM ranked) / 100.0, 4)
             AS min_bucket_mean,
           round((SELECT MAX(m) FROM ranked) / 100.0, 4)
             AS max_bucket_mean,
           round(abs((med.m_lo + med.m_hi) / 2.0
                     - CAST(tot.s_all AS DOUBLE)
                       / CAST(tot.n_all AS DOUBLE)) / 100.0, 4)
             AS mom_vs_mean_gap
    FROM tot CROSS JOIN med
    """


@register(
    "median_of_means_certificate",
    oracle=_mom_sql(),
    tags=("extension", "profiling", "statistics", "robust-statistics"),
)
def median_of_means_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means over order values: orders shard into 32
    deterministic portable-hash buckets, each bucket's mean is ONE
    division over exact BIGINT cent sums, and the published estimator
    is the median of the 32 bucket means (even count: midpoint of the
    two central order statistics) — reported against the plain mean
    and the bucket-mean envelope, so the driver hash certifies both
    the estimator and its shard spread.

    Exactness: bucket means are shared-text divisions of exact
    integers (bit-identical cross-engine, so the COMPARISON-based
    median ranking cannot flip — the float-feeds-comparison gotcha is
    satisfied by construction, with the bucket id as tiebreak);
    ranking is a 32x32 broadcast self-join on the localCheckpointed
    bucket relation, no window.

    Scale shape: ONE fact hash aggregate to 32 rows (partial combine
    collapses each map task to <= 32 rows before the shuffle — the
    estimator was DESIGNED for exactly this topology); everything
    after is metadata-scale."""
    from ecommerce_data_pipeline_spark.plans._helpers import dec
    from ecommerce_data_pipeline_spark.plans.sketches import _hash60

    orders = load_table(spark, sf_dir, "orders")
    bm = (
        orders.select(
            (dec("o_totalprice") * 100).cast("long").alias("cents"),
            (_hash60(F.col("o_orderkey"), _MOM_SALT) % _MOM_BUCKETS).alias(
                "b"
            ),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
        .localCheckpoint()  # 32 rows; feeds both rank-join sides + totals
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    withm = bm.select("b", "n", "s", m.alias("m"))
    a, c = withm.alias("a"), withm.alias("c")
    ranked = (
        a.join(
            F.broadcast(c),
            (F.col("c.m") < F.col("a.m"))
            | ((F.col("c.m") == F.col("a.m")) & (F.col("c.b") <= F.col("a.b"))),
        )
        .groupBy(
            F.col("a.b").alias("b"),
            F.col("a.n").alias("n"),
            F.col("a.s").alias("s"),
            F.col("a.m").alias("m"),
        )
        .agg(F.count(F.lit(1)).cast("int").alias("rk"))
        .localCheckpoint()  # 32 rows; feeds median picks + envelope
    )
    tot = bm.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n").cast("long").alias("n_all"),
        F.sum("s").cast("long").alias("s_all"),
    )
    picks = ranked.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.when(
                F.col("rk")
                == F.expr("CAST((n_buckets + 1) div 2 AS INT)"),
                F.col("m"),
            )
        ).alias("m_lo"),
        F.max(
            F.when(
                F.col("rk")
                == F.expr("CAST(n_buckets div 2 AS INT) + 1"),
                F.col("m"),
            )
        ).alias("m_hi"),
        F.min("m").alias("m_min"),
        F.max("m").alias("m_max"),
    )
    mom = (F.col("m_lo") + F.col("m_hi")) / F.lit(2.0)
    plain = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    return tot.crossJoin(F.broadcast(picks)).select(
        F.col("n_all").alias("n_orders"),
        "n_buckets",
        F.round(plain / F.lit(100.0), 4).alias("plain_mean"),
        F.round(mom / F.lit(100.0), 4).alias("mom_mean"),
        F.round(F.col("m_min") / F.lit(100.0), 4).alias("min_bucket_mean"),
        F.round(F.col("m_max") / F.lit(100.0), 4).alias("max_bucket_mean"),
        F.round(F.abs(mom - plain) / F.lit(100.0), 4).alias(
            "mom_vs_mean_gap"
        ),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (r9) — the nonparametric TREND member of the
# time-series tier (Mann 1945, Kendall 1975): S = sum of sign(y_j - y_i)
# over time-ordered pairs, with the tie-corrected variance and the
# continuity-corrected normal z. Complements kendall_tau_daily (which
# measures x-y association) and siegel/cusum (which estimate/locate the
# trend): this one TESTS monotonic trend existence distribution-free.

_MK_Z_CRIT = 1.959963984540054  # Phi^-1(0.975), baked (stdlib NormalDist)


def _mk_sql() -> str:
    z = (
        "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)"
        " / sqrt(var_s)"
        " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)"
        " / sqrt(var_s)"
        " ELSE 0.0 END"
    )
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY y)
      WHERE t > 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    var_cte AS (
      SELECT nd.n_days, pairs.s_stat, ties.tie_term,
             CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                  - ties.tie_term AS DOUBLE) / 18.0 AS var_s
      FROM nd CROSS JOIN pairs CROSS JOIN ties
    )
    SELECT n_days, s_stat, tie_term,
           round(var_s, 4) AS var_s,
           round({z}, 6) AS mk_z,
           round({z}, 6) > {_MK_Z_CRIT!r} AS increasing,
           round({z}, 6) < -{_MK_Z_CRIT!r} AS decreasing
    FROM var_cte
    """


@register(
    "mann_kendall_trend",
    oracle=_mk_sql(),
    tags=("extension", "profiling", "statistics", "trend"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily revenue: S from the
    time-ordered pair census (sign sums — pure comparisons on exact
    BIGINT cent totals, no measure products), tie-corrected variance
    [n(n-1)(2n+5) - sum t(t-1)(2t+5)] / 18 with the tie term an exact
    BIGINT over the y-value groups, and the continuity-corrected z
    compared two-sided against the baked 1.96 critical value (rounded
    6dp BEFORE the comparison on both engines — the decile-bin gotcha).

    Scale shape: one fact aggregate to the localCheckpointed calendar
    grid; the pair census is the kendall_tau_daily broadcast range
    self-join (quadratic in the CALENDAR, never the corpus); the tie
    groups are a <= |distinct y| aggregate of the same grid."""
    from ecommerce_data_pipeline_spark.plans._helpers import dec

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum((dec("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint()  # calendar-bounded; feeds pairs, ties, n
    )
    a = daily.select(F.col("day").alias("day_a"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("day_b"), F.col("y").alias("yb"))
    pairs = (
        a.join(F.broadcast(b), F.col("day_a") < F.col("day_b"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    var_s = (
        (
            F.col("n_days")
            * (F.col("n_days") - 1)
            * (2 * F.col("n_days") + 5)
            - F.col("tie_term")
        ).cast("double")
        / F.lit(18.0)
    ).alias("var_s_raw")
    base = (
        nd.crossJoin(F.broadcast(pairs))
        .crossJoin(F.broadcast(ties))
        .select("n_days", "s_stat", "tie_term", var_s)
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat").cast("double") - F.lit(1.0))
            / F.sqrt(F.col("var_s_raw")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat").cast("double") + F.lit(1.0))
            / F.sqrt(F.col("var_s_raw")),
        )
        .otherwise(F.lit(0.0))
    )
    z6 = F.round(z, 6)
    return base.select(
        "n_days",
        "s_stat",
        "tie_term",
        F.round(F.col("var_s_raw"), 4).alias("var_s"),
        z6.alias("mk_z"),
        (z6 > F.lit(_MK_Z_CRIT)).alias("increasing"),
        (z6 < -F.lit(_MK_Z_CRIT)).alias("decreasing"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (r9) — the third rung of the privacy-audit ladder
# (Li/Li/Venkatasubramanian, ICDE 2007): k-anonymity bounds class SIZE,
# l-diversity bounds distinct sensitive values, but a class can satisfy
# both while its sensitive DISTRIBUTION leaks (99% URGENT in one class
# vs 20% globally). t-closeness bounds the distance between each
# class's sensitive distribution and the global one — here the
# categorical total-variation distance, which is EXACT in integers:
# TVD_c = sum_s |cnt_cs*N - g_s*n_c| / (2*n_c*N).

_TCLOSE_T = 0.2  # released classes must sit within TVD 0.2 of global


def _tclose_sql() -> str:
    return f"""
    WITH qi AS (
      SELECT n_name AS nation, c_mktsegment AS segment,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
             o_orderpriority AS sensitive
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ),
    cls AS (
      SELECT nation, segment, order_year,
             CAST(COUNT(*) AS BIGINT) AS n_c
      FROM qi GROUP BY 1, 2, 3
    ),
    cs AS (
      SELECT nation, segment, order_year, sensitive,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM qi GROUP BY 1, 2, 3, 4
    ),
    dom AS (
      SELECT sensitive, CAST(COUNT(*) AS BIGINT) AS g
      FROM qi GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qi),
    grid AS (
      SELECT c.nation, c.segment, c.order_year, c.n_c,
             d.sensitive, d.g, COALESCE(cs.cnt, 0) AS cnt
      FROM cls c CROSS JOIN dom d
      LEFT JOIN cs ON cs.nation = c.nation AND cs.segment = c.segment
        AND cs.order_year = c.order_year AND cs.sensitive = d.sensitive
    ),
    tvd AS (
      SELECT g2.nation, g2.segment, g2.order_year, g2.n_c,
             CAST(SUM(abs(g2.cnt * tot.n - g2.g * g2.n_c)) AS BIGINT)
               AS num,
             CAST(MAX(tot.n) AS BIGINT) AS n
      FROM grid g2 CROSS JOIN tot
      GROUP BY 1, 2, 3, 4
    ),
    scored AS (
      SELECT nation, segment, order_year, n_c,
             round(CAST(num AS DOUBLE)
                   / (2.0 * CAST(n_c AS DOUBLE) * CAST(n AS DOUBLE)), 6)
               AS tvd
      FROM tvd
    ),
    summry AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
             round(MAX(tvd), 6) AS max_tvd,
             CAST(SUM(CASE WHEN tvd > {_TCLOSE_T!r} THEN n_c ELSE 0 END)
                  AS BIGINT) AS rows_breaching
      FROM scored
    )
    SELECT s.nation, s.segment, s.order_year,
           s.n_c AS class_size, s.tvd,
           s.tvd <= {_TCLOSE_T!r} AS meets_t,
           g.n_classes, g.max_tvd, g.rows_breaching
    FROM scored s CROSS JOIN summry g
    """


@register(
    "t_closeness_audit",
    oracle=_tclose_sql(),
    tags=("extension", "privacy", "profiling"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over the k_anonymity_audit framing (QI = nation x
    segment x order-year, sensitive = order priority): per equivalence
    class, the total-variation distance between the class's sensitive
    distribution and the global one, computed as the EXACT BIGINT
    sum |cnt_cs*N - g_s*n_c| over the full (class x sensitive-domain)
    grid — zero-count cells included via the domain cross join, or the
    distance silently undercounts — divided once at publication.
    Emits the per-class audit plus the global summary (max TVD, rows in
    breaching classes) so the driver hash grades both the ladder rung
    (tvd <= t) and the distances themselves (6dp, rounded BEFORE the
    t comparison on both engines).

    Scale shape: the QI relation is built once and pinned under
    cluster scale_mode (four aggregate consumers: classes, class x
    sensitive cells, sensitive domain, total); everything downstream is
    classes x |domain| grid algebra (~875 x 5 at any SF — calendar x
    dims bounded), broadcast-joined. No windows."""
    qi = pin_if_cluster(
        spark,
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderpriority").alias("sensitive"),
        ),
    )
    cls = qi.groupBy("nation", "segment", "order_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    cs = qi.groupBy("nation", "segment", "order_year", "sensitive").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    dom = qi.groupBy("sensitive").agg(
        F.count(F.lit(1)).cast("long").alias("g")
    )
    tot = qi.agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = (
        cls.crossJoin(F.broadcast(dom))
        .join(
            cs,
            ["nation", "segment", "order_year", "sensitive"],
            "left",
        )
        .select(
            "nation",
            "segment",
            "order_year",
            "n_c",
            "g",
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
        )
    )
    tvd = (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("nation", "segment", "order_year", "n_c")
        .agg(
            F.sum(
                F.abs(F.col("cnt") * F.col("n") - F.col("g") * F.col("n_c"))
            )
            .cast("long")
            .alias("num"),
            F.max("n").cast("long").alias("n"),
        )
    )
    scored = tvd.select(
        "nation",
        "segment",
        "order_year",
        "n_c",
        F.round(
            F.col("num").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_c").cast("double")
                * F.col("n").cast("double")
            ),
            6,
        ).alias("tvd"),
    ).localCheckpoint()  # classes x 1 — bounded; feeds output + summary
    glob = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.round(F.max("tvd"), 6).alias("max_tvd"),
        F.sum(
            F.when(F.col("tvd") > _TCLOSE_T, F.col("n_c")).otherwise(0)
        )
        .cast("long")
        .alias("rows_breaching"),
    )
    return scored.crossJoin(F.broadcast(glob)).select(
        "nation",
        "segment",
        "order_year",
        F.col("n_c").alias("class_size"),
        "tvd",
        (F.col("tvd") <= F.lit(_TCLOSE_T)).alias("meets_t"),
        "n_classes",
        "max_tvd",
        "rows_breaching",
    )
