"""Generator parity tests: the reference's id formats, value domains, and
weighted distributions, verified distributively (SURVEY.md §2 F1-F4)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions.datetime import parse_reference_ts
from ecommerce_data_pipeline_spark.operators.generators import (
    generate_customers,
    generate_products,
    generate_transactions,
)


def test_product_generator_formats(spark):
    rows = generate_products(spark, 200).collect()
    assert len(rows) == 200
    for r in rows[:20]:
        assert re.fullmatch(r"prod-\d{6}", r["product_id"])
        assert re.fullmatch(r"S\d{4}", r["supplier_id"])
        assert 10.0 <= r["price"] <= 500.0
        assert round(r["price"], 2) == r["price"]
    assert len({r["product_id"] for r in rows}) == 200  # unique keys


def test_customer_membership_weights(spark):
    """random.choices(weights=[.60,.25,.10,.05]) parity within tolerance
    (dimension_tables_mock.py:93-97)."""
    n = 20000
    dist = {
        r["membership_level"]: r["c"]
        for r in generate_customers(spark, n)
        .groupBy("membership_level")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert abs(dist["Bronze"] / n - 0.60) < 0.02
    assert abs(dist["Silver"] / n - 0.25) < 0.02
    assert abs(dist["Gold"] / n - 0.10) < 0.02
    assert abs(dist["Platinum"] / n - 0.05) < 0.02


def test_transaction_generator_contract(spark):
    products = generate_products(spark, 10)
    customers = generate_customers(spark, 10)
    txns = generate_transactions(spark, 100, products, customers)
    rows = txns.collect()
    assert len(rows) == 100
    for r in rows[:20]:
        assert re.fullmatch(r"TXN\d{14}\d{4}", r["transaction_id"])
        assert 1 <= r["quantity"] <= 5
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}-\d{2}:\d{2}:\d{2}", r["transaction_date"])
    # FK closure by construction + price copied from the joined product
    joined = txns.join(
        products.withColumnsRenamed({"price": "p_price"}), "product_id"
    )
    assert joined.count() == 100
    assert joined.filter(F.col("price") != F.col("p_price")).count() == 0
    # the landed non-ISO timestamp parses back
    parsed = txns.select(parse_reference_ts("transaction_date").alias("t"))
    assert parsed.filter(F.col("t").isNull()).count() == 0
    # determinism: same seed, same batch
    again = generate_transactions(spark, 100, products, customers).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
