"""Remaining surface odds-and-ends: UNION ALL, explode/word counts,
unpivot (long-form reshape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.text import tokens
from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table


@register(
    "union_all_quarters",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'h1' AS half FROM orders
    WHERE month(o_orderdate) <= 6
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'h2' AS half FROM orders
    WHERE month(o_orderdate) > 6
    """,
    tags=("setop",),
)
def union_all_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — merging per-period partition loads, the
    natural reassembly of the reference's time-partitioned landing zone
    (S4 layout)."""
    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.filter(F.month("o_orderdate") <= 6).select(
        "o_orderkey", "o_totalprice", F.lit("h1").alias("half")
    )
    h2 = orders.filter(F.month("o_orderdate") > 6).select(
        "o_orderkey", "o_totalprice", F.lit("h2").alias("half")
    )
    return h1.unionByName(h2)


@register(
    "word_frequencies",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    t -> t <> '')) AS word
      FROM documents
    )
    SELECT word, COUNT(*) AS n
    FROM tok GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("extension", "text", "F6"),
)
def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies: explode tokens → count → top-20 (the
    vocabulary profile step of corpus analysis). Explode + hash-agg +
    TakeOrdered — the canonical scalable shape."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    tags=("reshape",),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long reshape): the measure columns as
    (measure, value) rows — the melt step feeding generic metric sinks."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).withColumn("measure", F.expr("substring(measure, 3)"))
