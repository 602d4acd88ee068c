"""Distributed synthetic-data generators — the reference's core business.

The reference's Lambdas build rows one at a time in Python (Faker fields,
``random.choice``/``random.choices``, f-string ids —
``dimension_tables_mock.py:45-105``, ``transactions_mock_data.py:57-80``).
Here the same generators are Column expressions over ``spark.range``:
seeded, codegen'd, and embarrassingly parallel — 10⁹ rows is a partition
count, not a loop.

Faithfulness map:
- id formats: functions/ids.py (prod-/cust-/S/TXN schemes, exact widths)
- uniform price: ``round(uniform(10,500),2)`` → ``round(rand·490+10, 2)``
  (dimension_tables_mock.py:54)
- weighted categorical: ``random.choices(weights=[.60,.25,.10,.05])`` →
  rand(seed) against cumulative thresholds (dimension_tables_mock.py:93-97)
- timestamps land in the non-ISO reference format (functions/datetime.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions.datetime import format_reference_ts
from ecommerce_data_pipeline_spark.functions.ids import (
    customer_id,
    product_id,
    supplier_id,
    transaction_id,
)

# dimension_tables_mock.py:53 / :80
PRODUCT_CATEGORIES = ("Electronics", "Clothing", "Home", "Books", "Toys")
MEMBERSHIP_WEIGHTS = (("Bronze", 0.60), ("Silver", 0.25), ("Gold", 0.10), ("Platinum", 0.05))
# transactions_mock_data.py:75-76
PAYMENT_TYPES = ("Credit Card", "Debit Card", "PayPal", "Gift Card")
STATUSES = ("Completed", "Pending", "Failed", "Refunded")


def weighted_choice(r: Column, weights: tuple[tuple[str, float], ...]) -> Column:
    """Weighted categorical draw via CDF thresholds over a PRE-MATERIALIZED
    uniform column — the Column form of ``random.choices(population,
    weights)``.

    ``r`` must be a projected column, NOT an inline ``rand()`` expression:
    non-deterministic expressions are re-evaluated at every reference, so
    an inline rand() inside the when-chain draws a DIFFERENT number per
    threshold comparison and skews the distribution (caught by the
    distribution-parity test)."""
    if len(weights) == 1:
        # degenerate one-category distribution: the CDF loop below builds
        # no when-chain and expr.otherwise would raise on None
        return F.lit(weights[0][0])
    expr = None
    cum = 0.0
    for label, w in weights[:-1]:
        cum += w
        expr = (
            F.when(r < cum, label) if expr is None else expr.when(r < cum, label)
        )
    return expr.otherwise(weights[-1][0])


def uniform_choice(r: Column, options: tuple[str, ...]) -> Column:
    """Uniform pick from a small option list driven by a pre-materialized
    uniform column (random.choice). Single use of ``r`` — safe either
    way, but kept consistent with weighted_choice's contract."""
    arr = F.array(*[F.lit(o) for o in options])
    idx = F.floor(r * len(options)).cast("int")
    return F.element_at(arr, idx + 1)


def generate_products(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """dim_products candidates (dimension_tables_mock.py:45-59), distributed."""
    drawn = spark.range(n).select(
        "id", F.rand(seed + 1).alias("_r1"), F.rand(seed + 2).alias("_r2")
    )
    return drawn.select(
        product_id("id").alias("product_id"),
        F.concat(F.lit("Product "), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
            "product_name"
        ),
        uniform_choice(F.col("_r1"), PRODUCT_CATEGORIES).alias("category"),
        F.round(F.col("_r2") * 490 + 10, 2).alias("price"),
        supplier_id(F.pmod(F.col("id") * 7919 + seed, F.lit(10000))).alias(
            "supplier_id"
        ),
    )


def generate_customers(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """dim_customers candidates (dimension_tables_mock.py:78-105): Faker's
    names/emails become deterministic id-derived strings — the engine
    cares about cardinality/shape, not prose."""
    uid = F.lpad(F.col("id").cast("string"), 6, "0")
    drawn = spark.range(n).select("id", F.rand(seed + 3).alias("_r"))
    return drawn.select(
        customer_id("id").alias("customer_id"),
        F.concat(F.lit("First"), uid).alias("first_name"),
        F.concat(F.lit("Last"), uid).alias("last_name"),
        F.concat(F.lit("user"), uid, F.lit("@example.com")).alias("email"),
        weighted_choice(F.col("_r"), MEMBERSHIP_WEIGHTS).alias("membership_level"),
    )


def generate_transactions(
    spark: SparkSession,
    n: int,
    products: DataFrame,
    customers: DataFrame,
    base_ts: str = "2024-01-01 12:00:00",
    seed: int = 42,
) -> DataFrame:
    """The transaction batch (transactions_mock_data.py:57-80): sampled
    FKs from both dims (broadcast random assignment, not a driver loop),
    quantity 1-5, price copied from the product at txn time, timestamp
    landed in the reference's non-ISO format."""
    from ecommerce_data_pipeline_spark.operators.sampling import (
        random_fk_assignment,
    )

    drawn = spark.range(n).select(
        "id",
        F.rand(seed + 4).alias("_r4"),
        F.rand(seed + 5).alias("_r5"),
        F.rand(seed + 6).alias("_r6"),
    )
    base = drawn.select(
        F.col("id"),
        (F.lit(base_ts).cast("timestamp") + F.make_interval(secs=F.col("id").cast("int")))
        .alias("_ts"),
        (F.floor(F.col("_r4") * 5) + 1).cast("int").alias("quantity"),
        uniform_choice(F.col("_r5"), PAYMENT_TYPES).alias("payment_type"),
        uniform_choice(F.col("_r6"), STATUSES).alias("status"),
    )
    with_prod = random_fk_assignment(
        base, products.select("product_id", "price"), "product_id", seed=seed + 7
    )
    with_cust = random_fk_assignment(
        with_prod, customers.select("customer_id"), "customer_id", seed=seed + 8
    )
    return with_cust.select(
        transaction_id("_ts", F.pmod(F.col("id"), F.lit(10000))).alias(
            "transaction_id"
        ),
        "customer_id",
        "product_id",
        "quantity",
        "price",
        format_reference_ts("_ts").alias("transaction_date"),
        "payment_type",
        "status",
    )
