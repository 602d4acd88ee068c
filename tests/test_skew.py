"""Salted-aggregation/join equivalence: the skew rewrites must return
exactly the plain operator's answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.skew import salted_join, salted_sum
from ecommerce_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_salted_sum_equals_plain_sum(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = {
        r["l_returnflag"]: (r["sum_l_quantity"], r["n_rows"])
        for r in salted_sum(li, ["l_returnflag"], "l_quantity", 16).collect()
    }
    plain = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_partkey").alias("p_partkey")
    )
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    salted = salted_join(li, part, "p_partkey", salt_buckets=8)
    plain = li.join(part, "p_partkey")
    assert salted.count() == plain.count()
    assert salted.select("l_orderkey", "l_linenumber", "p_brand").exceptAll(
        plain.select("l_orderkey", "l_linenumber", "p_brand")
    ).isEmpty()
