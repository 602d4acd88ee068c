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


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join handling — the first line of defense at
    100 TB (operators/skew.py covers what AQE can't) — must actually
    trigger: a 95%-hot key join re-plans with SortMergeJoin(skew=true)
    and a skewed AQEShuffleRead. Thresholds are lowered to make the
    small fixture's hot partition count as skewed; at production scale
    the defaults fire on real skew."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 500_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.rand(1).alias("x"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.rand(2).alias("y")
        )
        agg = fact.join(dim, "k").groupBy().count()
        assert agg.collect()[0][0] == 500_000
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
