"""Item-item collaborative filtering over the order/lineitem stream
(SURVEY.md §2 extensions — the recommendation tier an e-commerce
pipeline feeds from its fact stream).

Classic co-occurrence CF: two parts are similar when they appear in the
same orders more often than their individual popularity predicts. The
score is the cosine of the binary order-incidence vectors,
cooc(i,j) / sqrt(n_i * n_j) — counts are exact integers, sqrt/division
are single correctly-rounded IEEE ops, so the 6dp-rounded score is
bit-identical cross-engine.

Scale notes (100 TB): the pair generation is a self-equi-join on
l_orderkey — pair volume is Σ_orders m² where m is the per-order basket
size (bounded by business reality, ~single digits), never corpus².
The popularity relation is part-dimension-sized. The final ranking
window partitions by item over its candidate neighbors (≤ basket-mates
count), not a global sort. A cooc ≥ 2 support floor prunes the long
singleton tail before the join+window stages, the same support-pruning
contract as association_rules_brands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table

_MIN_COOC = 2
_TOP_NEIGHBORS = 3


@register(
    "item_item_cf_topk",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pop AS (
      SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS i, b.l_partkey AS j, COUNT(*) AS cooc
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_COOC}
    ),
    sym AS (
      SELECT i, j, cooc FROM pairs
      UNION ALL
      SELECT j AS i, i AS j, cooc FROM pairs
    ),
    scored AS (
      SELECT sym.i, sym.j, sym.cooc,
             pi.n_orders AS n_i, pj.n_orders AS n_j,
             round(CAST(sym.cooc AS DOUBLE)
                   / sqrt(CAST(pi.n_orders AS DOUBLE)
                          * CAST(pj.n_orders AS DOUBLE)), 6) AS cos_sim
      FROM sym
      JOIN pop pi ON sym.i = pi.l_partkey
      JOIN pop pj ON sym.j = pj.l_partkey
    )
    SELECT i AS part_i, j AS part_j, cooc, n_i, n_j, cos_sim,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY i
                                   ORDER BY cos_sim DESC, j ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= {_TOP_NEIGHBORS}
    """,
    tags=("extension", "recommendation", "join"),
)
def item_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 co-purchased neighbors per part (_TOP_NEIGHBORS), scored by
    binary cosine over order incidence (support floor _MIN_COOC = 2).

    The basket self-join, popularity join, and ranking window all key on
    the part id, so AQE reuses one partitioning across the last two
    stages; the (orderkey-keyed) pair stage's volume is bounded by basket
    size squared per order.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # consumed by the popularity agg AND both sides of the pair
        # self-join — unpersisted, the distinct shuffle executes 3×
        .persist()
    )
    pop = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("i"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("j"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= _MIN_COOC)
        # consumed twice (both union branches)
        .persist()
    )
    sym = pairs.unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "cooc")
    )
    scored = (
        sym.join(pop.withColumnRenamed("l_partkey", "i"), "i")
        .withColumnRenamed("n_orders", "n_i")
        .join(
            pop.select(
                F.col("l_partkey").alias("j"), F.col("n_orders").alias("n_j")
            ),
            "j",
        )
        .withColumn(
            "cos_sim",
            F.round(
                F.col("cooc").cast("double")
                / F.sqrt(
                    F.col("n_i").cast("double") * F.col("n_j").cast("double")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("cos_sim"), F.asc("j"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _TOP_NEIGHBORS)
        .select(
            F.col("i").alias("part_i"),
            F.col("j").alias("part_j"),
            "cooc",
            "n_i",
            "n_j",
            "cos_sim",
            "rnk",
        )
    )
