"""Entity-resolution queries over the product catalog (SURVEY.md §2
extensions — the record-linkage tier of an e-commerce pipeline).

The reference's product dimension is mock-generated with a small
adjective+noun vocabulary (dimension_tables_mock.py), so near-identical
listings ("small ring" vs "small rings" under different part keys) are
exactly the duplicate-listing problem real catalogs have. This module
implements the classic blocked fuzzy join: a cheap equi-join blocking key
bounds the candidate space, then an edit-distance predicate scores only
within-block pairs — never an all-pairs cartesian.

Cross-engine exactness: Levenshtein distance is an integer and both
engines implement the standard unit-cost edit distance, so results are
bit-exact with no rounding contract needed.

Scale notes (100 TB): the pair join is an equi-join on the blocking key —
a plain shuffle hash join whose volume is sum over blocks of n_b², kept
bounded by the blocking-key cardinality exactly like the shingle-DF cap
on the text side (plans/similarity_plans.py). The edit-distance filter
runs inside whole-stage codegen (`levenshtein` is a JVM built-in); no
Python, no windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table

_MAX_LEV = 2  # near-typo band: identical names score 0, plural/one-edit 1-2


@register(
    "part_name_fuzzy_matches",
    oracle=f"""
    WITH p AS (SELECT p_partkey, p_name, p_size FROM part)
    SELECT a.p_partkey AS partkey_a,
           b.p_partkey AS partkey_b,
           a.p_name    AS name_a,
           b.p_name    AS name_b,
           a.p_size    AS p_size,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
    FROM p a JOIN p b
      ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_LEV}
    """,
    tags=("extension", "resolution", "part"),
)
def part_name_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-listing detection: within-block (p_size) part pairs whose
    names are within Levenshtein distance {_MAX_LEV}.

    Blocking turns the O(N²) linkage problem into an equi-join on p_size
    (candidate volume = Σ_b n_b²); the distance predicate then prunes to
    the near-duplicate band. `p_partkey < p_partkey` canonicalizes pair
    order so each undirected pair appears once.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_size")
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        "p_size",
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        "p_size",
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "p_size")
        .filter(F.col("partkey_a") < F.col("partkey_b"))
        .filter(lev <= _MAX_LEV)
        .select(
            "partkey_a",
            "partkey_b",
            "name_a",
            "name_b",
            "p_size",
            lev.cast("int").alias("lev"),
        )
    )
