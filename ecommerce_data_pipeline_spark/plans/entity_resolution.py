"""Entity-resolution / data-governance plans (r8 — VERDICT r7 task #2):
golden-record survivorship merge and k-anonymity generalization.

Both are the MUTATING halves of audit surfaces that already exist:
``dedup_quality_survivor`` picks one whole record per duplicate cluster,
while ``survivorship_merge_rules`` assembles a per-ATTRIBUTE golden
record (newest-non-null / greatest-value rules — the master-data-
management merge); ``k_anonymity_audit`` measures re-identification
risk, while ``group_k_anonymity_generalize`` rewrites each record to the
coarsest level of a fixed generalization lattice that makes its
equivalence class k-anonymous.

Reference context: the reference repo (Javier009/eCommerce_Data_Pipeline,
397 lines of mock-data + queue orchestration) has no MDM or privacy
tier; these extend the survey's extension tier (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table


@register(
    "survivorship_merge_rules",
    oracle="""
    WITH rec AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END
               AS rec_priority,
             CASE WHEN o_orderstatus IN ('F', 'P')
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) END
               AS verified_cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_recent,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY (CASE WHEN o_orderstatus = 'F' THEN o_orderpriority
                         END IS NOT NULL) DESC,
                        o_orderdate DESC, o_orderkey DESC) AS rn_prio
      FROM orders
    )
    SELECT o_custkey AS entity_key,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(rec_priority) AS BIGINT) AS n_priority_known,
           MIN(o_orderdate) AS first_seen,
           MAX(o_orderdate) AS last_seen,
           MAX(CASE WHEN rn_recent = 1 THEN o_orderstatus END)
             AS last_status,
           MAX(CASE WHEN rn_prio = 1 THEN rec_priority END)
             AS surviving_priority,
           MAX(verified_cents) AS max_verified_cents
    FROM rec GROUP BY o_custkey
    """,
    tags=("extension", "entity-resolution", "mdm"),
)
def survivorship_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record assembly over each entity's record cluster (entity =
    customer, records = their orders — the MDM survivorship merge).
    Per-attribute rules, each a classic survivorship policy:

    - ``last_status``: MOST-RECENT rule — the newest record wins
      (recency key: o_orderdate desc, o_orderkey desc).
    - ``surviving_priority``: NEWEST-NON-NULL rule — priority is only
      trusted on finalized ('F') records, so the survivor comes from the
      newest record that HAS one; entities with no finalized record get
      NULL (completeness is reported alongside, n_priority_known).
    - ``max_verified_cents``: GREATEST-VALUE rule over verified ('F'/'P')
      records, in exact integer cents.
    - first/last_seen + record counts: lineage metadata.

    Both arg-max picks are row_number windows partitioned by the entity
    key — a partition is one entity's record cluster, bounded by
    per-customer order volume, never corpus-sized; the two windows share
    one shuffle (same partition key). All survivors are strings/
    integers/timestamps picked from the rows themselves, so the oracle
    replays the merge exactly."""
    orders = load_table(spark, sf_dir, "orders")
    rec_priority = F.when(
        F.col("o_orderstatus") == "F", F.col("o_orderpriority")
    )
    verified_cents = F.when(
        F.col("o_orderstatus").isin("F", "P"),
        F.round(F.col("o_totalprice") * 100).cast("long"),
    )
    w_recent = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    w_prio = Window.partitionBy("o_custkey").orderBy(
        rec_priority.isNotNull().desc(),
        F.desc("o_orderdate"),
        F.desc("o_orderkey"),
    )
    rec = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        rec_priority.alias("rec_priority"),
        verified_cents.alias("verified_cents"),
        F.row_number().over(w_recent).alias("rn_recent"),
        F.row_number().over(w_prio).alias("rn_prio"),
    )
    return rec.groupBy(F.col("o_custkey").alias("entity_key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.count("rec_priority").cast("long").alias("n_priority_known"),
        F.min("o_orderdate").alias("first_seen"),
        F.max("o_orderdate").alias("last_seen"),
        F.max(F.when(F.col("rn_recent") == 1, F.col("o_orderstatus"))).alias(
            "last_status"
        ),
        F.max(F.when(F.col("rn_prio") == 1, F.col("rec_priority"))).alias(
            "surviving_priority"
        ),
        F.max("verified_cents").alias("max_verified_cents"),
    )


_KANON_K = 5

# Fixed generalization lattice for the (nation, segment, order_year)
# quasi-identifier — the same QI as k_anonymity_audit
# (plans/profiling.py). Level ℓ is strictly coarser than ℓ−1, so a
# record's equivalence-class size is non-decreasing in ℓ and the minimal
# safe level is well-defined; level 3 collapses to segment-only classes,
# which are ≥ k at any realistic scale (and graded, not assumed).
#   0: (nation,  segment, year)
#   1: (region,  segment, year)
#   2: (region,  segment, *)
#   3: (*,       segment, *)


@register(
    "group_k_anonymity_generalize",
    oracle=f"""
    WITH qi AS (
      SELECT o_orderkey, r_name AS region, n_name AS nation,
             c_mktsegment AS segment,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    ),
    c0 AS (SELECT nation, segment, order_year, COUNT(*) AS n0
           FROM qi GROUP BY 1, 2, 3),
    c1 AS (SELECT region, segment, order_year, COUNT(*) AS n1
           FROM qi GROUP BY 1, 2, 3),
    c2 AS (SELECT region, segment, COUNT(*) AS n2 FROM qi GROUP BY 1, 2),
    c3 AS (SELECT segment, COUNT(*) AS n3 FROM qi GROUP BY 1),
    leveled AS (
      SELECT qi.o_orderkey, qi.region, qi.nation, qi.segment,
             qi.order_year,
             CASE WHEN n0 >= {_KANON_K} THEN 0
                  WHEN n1 >= {_KANON_K} THEN 1
                  WHEN n2 >= {_KANON_K} THEN 2
                  ELSE 3 END AS anon_level,
             CASE WHEN n0 >= {_KANON_K} THEN n0
                  WHEN n1 >= {_KANON_K} THEN n1
                  WHEN n2 >= {_KANON_K} THEN n2
                  ELSE n3 END AS class_size
      FROM qi
      JOIN c0 ON qi.nation = c0.nation AND qi.segment = c0.segment
             AND qi.order_year = c0.order_year
      JOIN c1 ON qi.region = c1.region AND qi.segment = c1.segment
             AND qi.order_year = c1.order_year
      JOIN c2 ON qi.region = c2.region AND qi.segment = c2.segment
      JOIN c3 ON qi.segment = c3.segment
    )
    SELECT o_orderkey,
           CAST(anon_level AS INT) AS anon_level,
           CASE WHEN anon_level = 0 THEN nation
                WHEN anon_level IN (1, 2) THEN region
                ELSE '*' END AS gen_geo,
           segment AS gen_segment,
           CASE WHEN anon_level <= 1 THEN CAST(order_year AS VARCHAR)
                ELSE '*' END AS gen_year,
           CAST(class_size AS BIGINT) AS class_size
    FROM leveled
    """,
    tags=("extension", "privacy", "anonymization"),
)
def group_k_anonymity_generalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-anonymity GENERALIZATION (the mutating twin of
    k_anonymity_audit): rewrite every record's quasi-identifier
    (nation, segment, order_year) to the COARSEST-NECESSARY level of a
    fixed lattice — nation→region→'*' on geography, year→'*' on time —
    such that the record's equivalence class has ≥ k = 5 members. Each
    record gets the MINIMAL safe level (coarsening is monotone in class
    size, so the minimum exists; level 3 = segment-only is the
    backstop), its generalized QI strings, and its class size at that
    level — the released dataset plus the audit trail.

    Scale shape: one fact-side QI projection (dims broadcast), four
    hash aggregates (one per lattice level, each strictly smaller than
    the last), four keyed joins back — no windows, no collects; at
    100 TB everything shuffles on QI keys whose cardinality shrinks as
    the lattice coarsens. All arithmetic is integer counts and string
    CASE rewrites, replayed exactly by the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = F.broadcast(
        customer.select("c_custkey", "c_mktsegment", "c_nationkey")
        .join(
            nation.select("n_nationkey", "n_name", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            region.select("r_regionkey", "r_name"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "c_custkey",
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    qi = orders.join(dims, orders["o_custkey"] == dims["c_custkey"]).select(
        "o_orderkey",
        "region",
        "nation",
        "segment",
        F.year("o_orderdate").cast("int").alias("order_year"),
    )
    c0 = qi.groupBy("nation", "segment", "order_year").agg(
        F.count(F.lit(1)).alias("n0")
    )
    c1 = qi.groupBy("region", "segment", "order_year").agg(
        F.count(F.lit(1)).alias("n1")
    )
    c2 = qi.groupBy("region", "segment").agg(F.count(F.lit(1)).alias("n2"))
    c3 = qi.groupBy("segment").agg(F.count(F.lit(1)).alias("n3"))
    leveled = (
        qi.join(c0, ["nation", "segment", "order_year"])
        .join(c1, ["region", "segment", "order_year"])
        .join(F.broadcast(c2), ["region", "segment"])
        .join(F.broadcast(c3), ["segment"])
        .withColumn(
            "anon_level",
            F.when(F.col("n0") >= _KANON_K, 0)
            .when(F.col("n1") >= _KANON_K, 1)
            .when(F.col("n2") >= _KANON_K, 2)
            .otherwise(3)
            .cast("int"),
        )
        .withColumn(
            "class_size",
            F.when(F.col("n0") >= _KANON_K, F.col("n0"))
            .when(F.col("n1") >= _KANON_K, F.col("n1"))
            .when(F.col("n2") >= _KANON_K, F.col("n2"))
            .otherwise(F.col("n3"))
            .cast("long"),
        )
    )
    return leveled.select(
        "o_orderkey",
        "anon_level",
        F.when(F.col("anon_level") == 0, F.col("nation"))
        .when(F.col("anon_level").isin(1, 2), F.col("region"))
        .otherwise("*")
        .alias("gen_geo"),
        F.col("segment").alias("gen_segment"),
        F.when(
            F.col("anon_level") <= 1, F.col("order_year").cast("string")
        )
        .otherwise("*")
        .alias("gen_year"),
        "class_size",
    )
