"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these explicit forms cover the cases AQE can't: skewed AGGREGATION keys
(AQE only splits join partitions) and broadcast-inviable medium dims with
a hot fact key. Both are pure DataFrame rewrites — no custom physical
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_col: str,
    salt_buckets: int = 16,
    seed: int = 42,
    accumulator_type: str = "decimal(28,6)",
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials. For
    algebraic aggregates (sum/count/min/max) the result is exactly the
    single-phase answer PROVIDED the accumulator's decimal scale covers
    the input (the cast quantizes anything finer — e.g. a 6dp score
    under a 2dp accumulator sums rounded values). The default covers the
    repo's 2dp money and 6dp score columns; pass a wider
    ``accumulator_type`` for finer inputs.
    """
    salt = F.floor(F.rand(seed) * salt_buckets).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.sum(F.col(sum_col).cast(accumulator_type)).alias("_psum"),
             F.count(F.lit(1)).alias("_pcnt"))
    )
    return (
        partial.groupBy(*group_cols)
        .agg(
            F.sum("_psum").cast("double").alias(f"sum_{sum_col}"),
            F.sum("_pcnt").alias("n_rows"),
        )
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Skew-proof equi-join: facts draw a random salt, the dim side is
    replicated once per salt value, and the join key becomes (key, salt).

    The hot fact key's rows land on ``salt_buckets`` different reducers
    instead of one. Replication multiplies the dim shuffle volume by the
    bucket count — use when the dim is too big to broadcast but small
    enough to replicate (the awkward middle AQE sometimes misses).
    """
    salted_facts = facts.withColumn(
        "_salt", F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_facts.join(replicated_dim, on=[key, "_salt"], how="inner").drop(
        "_salt"
    )
