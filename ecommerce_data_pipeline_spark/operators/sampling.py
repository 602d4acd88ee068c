"""Sampling and random-assignment operators (O1/O2/J3), seeded.

Reference parity:
- O1 ``ORDER BY RANDOM() LIMIT 50`` (``transactions_mock_data.py:61-62``):
  uniform k-row sample. Reproduced as seeded ``rand()`` order + limit for
  small k. At 100 TB a global random sort is a full shuffle, so
  ``sample_fraction`` (per-partition Bernoulli, no shuffle) is the scale
  path and ``sample_exact_k`` uses TakeOrdered (heap per partition, no
  full sort) — both seeded and rerun-stable.
- O2/J3 random FK assignment (``transactions_mock_data.py:64-66``): each
  fact row picks one uniformly-random dim row. Reproduced without a
  driver loop: hash the fact key through a seeded prng column into a
  dim-index and broadcast-join on the index — fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_exact_k(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """O1: uniform sample of exactly k rows, seeded.

    orderBy(rand(seed)).limit(k) plans as TakeOrderedAndProject — each
    partition keeps a k-heap; no global sort materializes.
    """
    return df.orderBy(F.rand(seed)).limit(k)


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Scale path: Bernoulli sample, zero shuffle."""
    return df.sample(fraction=fraction, seed=seed)


def random_fk_assignment(
    facts: DataFrame, dim: DataFrame, dim_key: str, seed: int = 42
) -> DataFrame:
    """O2/J3: attach one uniformly-sampled dim row to every fact row.

    The dim gets a dense 0..n-1 index (window over a broadcast-small
    table); each fact row draws idx = floor(rand(seed)·n) and joins on it.
    The reference does this with a per-row pandas ``.sample(n=1)`` on the
    driver (``transactions_mock_data.py:64-66``) — this form is the same
    semantic with the dim broadcast and the draw inside codegen.
    """
    n = dim.count()
    indexed = dim.withColumn(
        "_idx", F.row_number().over(Window.orderBy(dim_key)) - 1
    )
    drawn = facts.withColumn("_idx", F.floor(F.rand(seed) * n).cast("int"))
    return drawn.join(F.broadcast(indexed), on="_idx", how="inner").drop("_idx")
