"""Sampling / random-assignment queries (SURVEY.md §2.6 O1/O2, §2.3 J3).

The reference's randomized operators (``ORDER BY RANDOM() LIMIT 50``,
per-row pandas sampling — ``transactions_mock_data.py:61-66``) are
reproduced with SEEDED rand(), making reruns stable — but the draw
sequence is engine-specific, so these register oracle=None (the driver's
rows-only check) per SURVEY.md §7's plan; unit tests pin determinism and
distribution properties instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.sampling import (
    random_fk_assignment,
    sample_exact_k,
    sample_fraction,
)
from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table


@register("sample_orders_k50", oracle=None, tags=("O1", "sampling"))
def sample_orders_k50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: the reference's `ORDER BY RANDOM() LIMIT 50` dim-sample pull
    (transactions_mock_data.py:61-62), seeded. Plans as
    TakeOrderedAndProject (per-partition heaps), never a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return sample_exact_k(orders, 50, seed=42)


@register("sample_lineitem_fraction", oracle=None, tags=("O1", "sampling"))
def sample_lineitem_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB sampling path: per-partition Bernoulli (zero shuffle),
    seeded."""
    li = load_table(spark, sf_dir, "lineitem")
    return sample_fraction(li, 0.01, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register("random_fk_enrichment", oracle=None, tags=("O2", "J3", "sampling"))
def random_fk_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the reference's random FK assignment (each generated fact picks
    a uniformly-random dim row, transactions_mock_data.py:64-66) — fully
    distributed: seeded index draw + broadcast join, no driver loop."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return random_fk_assignment(events, part, "p_partkey", seed=42)


@register("generate_reference_batch", oracle=None, tags=("generator", "reference"))
def generate_reference_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole data-generation tier (EP1 candidates + EP2
    transaction batch, dimension_tables_mock.py / transactions_mock_data
    .py) as one distributed, seeded plan: 10 products + 10 customers →
    100 transactions with sampled FKs, copied prices, and the non-ISO
    landing timestamp. Rows-only (generator output); format/distribution
    invariants are pytest-pinned (tests/test_generators.py)."""
    from ecommerce_data_pipeline_spark.operators.generators import (
        generate_customers,
        generate_products,
        generate_transactions,
    )

    products = generate_products(spark, 10)
    customers = generate_customers(spark, 10)
    return generate_transactions(spark, 100, products, customers)


@register("stratified_sample_langs", oracle=None, tags=("O1", "sampling", "extension"))
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing: downsample the over-represented language
    (en → 30%) while keeping the rest whole — per-stratum Bernoulli draw,
    zero shuffle (operators/sampling.py::stratified_sample). Rows-only by
    design (seeded draw sequence is engine-specific); the unit test pins
    determinism and per-stratum proportions."""
    from ecommerce_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.3, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    return stratified_sample(docs, "lang", fractions, seed=42).select(
        "doc_id", "lang", "source", "n_chars"
    )


# 60-bit key hash shared by both engines: polynomial over the first 15
# hex digits of md5("v1#" || key).  instr/strpos are both 1-based, so the
# digit values and the weighted sum are identical arithmetic — a
# portable, engine-independent hash (unlike xxhash64/hash(), which have
# no cross-engine twin).
_HEX = "0123456789abcdef"
_SQL_MD5_POLY = " + ".join(
    f"(strpos('{_HEX}', substr(h, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@register(
    "hash_split_train_test",
    oracle=f"""
    WITH hashed AS (
      SELECT o_orderkey,
             md5('v1#' || CAST(o_orderkey AS VARCHAR)) AS h
      FROM orders
    ),
    bucketed AS (
      SELECT o_orderkey, ({_SQL_MD5_POLY}) % 100 AS bucket
      FROM hashed
    )
    SELECT o_orderkey,
           CAST(bucket AS BIGINT) AS bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'validation'
                ELSE 'test' END AS split
    FROM bucketed
    """,
    tags=("extension", "sampling", "ml-prep"),
)
def hash_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test assignment by
    content-hashing the primary key — the ML-prep split that stays
    STABLE under reruns, repartitioning, and incremental data arrival
    (a row's split never changes when other rows appear, unlike
    randomSplit), and is reproducible from the salt alone.

    Engine-portability is the point of the construction: Spark's
    xxhash64/hash have no DuckDB twin, so the split key is a polynomial
    over the first 15 hex digits of md5('v1#' || key) — 60 bits, exact
    BIGINT arithmetic, identical in both engines (verified by the
    oracle). Pure per-row projection: no shuffle, no state, fully
    codegen'd; at 100 TB the split is free and each subset is a
    partition-prunable predicate (bucket ranges) rather than a copied
    dataset.
    """
    # Spark evaluates the 60-bit key hash as conv(md5-prefix, 16, 10);
    # the oracle computes the same value as a strpos digit polynomial
    # (DuckDB has no conv) — value parity is the contract, see
    # plans/sketches.py::_poly_from_hex.
    h = F.md5(F.concat(F.lit("v1#"), F.col("o_orderkey").cast("string")))
    poly = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", (poly % 100).alias("bucket"))
        .select(
            "o_orderkey",
            F.col("bucket").cast("long").alias("bucket"),
            F.when(F.col("bucket") < 80, F.lit("train"))
            .when(F.col("bucket") < 90, F.lit("validation"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


@register(
    "per_group_hash_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('s1#' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rnk
      FROM documents
    )
    SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 20
    """,
    tags=("O1", "sampling", "extension"),
)
def per_group_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k-per-group sampling: rank rows inside each
    group by a salted content hash and keep the first k — the
    training-mix subsampler that is (a) exactly k per group, (b) stable
    under reruns/repartitioning/new-data arrival (a doc's hash never
    changes), and (c) reproducible from the salt alone. Orders on the
    md5 hex string itself (lexicographic — byte-identical in any
    engine; no numeric conversion needed). Plans as WindowGroupLimit:
    per-partition k-heaps, so the shuffle carries ≤k rows per group
    per partition, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit("s1#"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "lang", F.col("rnk").cast("long").alias("rnk"))
    )


@register(
    "weighted_sample_orders",
    # same md5-poly uniform as hash_split_train_test; the exponential
    # race key ln(-ln(u)) - ln(w) is rounded to 9dp on BOTH sides before
    # ranking so libm-vs-JVM last-ulp differences cannot flip the top-k
    # boundary
    oracle=f"""
    WITH hashed AS (
      SELECT o_orderkey, o_totalprice,
             md5('ws1#' || CAST(o_orderkey AS VARCHAR)) AS h
      FROM orders
    ),
    keyed AS (
      SELECT o_orderkey, o_totalprice,
             round(ln(-ln((({_SQL_MD5_POLY}) + 1.0) / {2 ** 60 + 1}))
                   - ln(CAST(o_totalprice AS DOUBLE)), 9) AS race_key
      FROM hashed
    )
    SELECT o_orderkey, o_totalprice, race_key
    FROM keyed
    ORDER BY race_key, o_orderkey
    LIMIT 50
    """,
    tags=("extension", "sampling", "ml-prep"),
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=50, P(pick) ∝ order value
    — the Efraimidis–Spirakis exponential-race method (Inf. Proc. Lett.
    2006): each row draws u ~ U(0,1] and races with key
    ln(-ln u) − ln(w); the k smallest keys are a proper weighted sample
    without replacement. Distributed cost is one per-row projection plus
    a TakeOrdered top-k — no global sort, no rejection loop, no state;
    the same construction streams (keep a k-heap per partition) and
    merges across batches, which rand()-based rejection sampling cannot.

    Every draw is the engine-portable md5-polynomial uniform (shifted to
    (0,1] so ln(u) is finite), making the sample REPRODUCIBLE from the
    salt and identical in the DuckDB oracle — a seeded rand() would be
    engine-private and partition-dependent. Keys round to 9dp on both
    sides before ranking (libm/JVM ulp immunity); ties break on the
    unique key column."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.concat(F.lit("ws1#"), F.col("o_orderkey").cast("string")))
    u = (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") + 1.0) / F.lit(
        float(2**60 + 1)
    )
    race = F.round(
        F.log(-F.log(u)) - F.log(F.col("o_totalprice").cast("double")), 9
    )
    return (
        orders.select("o_orderkey", "o_totalprice", race.alias("race_key"))
        .orderBy("race_key", "o_orderkey")
        .limit(50)
    )
