"""Query registry: every declared operator = (Spark plan, DuckDB oracle).

This is the engine's public query surface (SURVEY.md §2 inventory). Each
entry pairs a DataFrame-building callable ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI/DuckDB SQL string the driver runs side-by-side at
sf=0.01 (row-count + schema + order-insensitive value-hash).

Oracle-parity rules used throughout the plan modules:
- Money/measure sums accumulate in DECIMAL(18,6) and cast the final value
  to DOUBLE on BOTH sides — exact arithmetic, so the hashes match bit-wise
  (float summation order would otherwise diverge between engines).
- Averages are computed as exact-decimal SUM / COUNT (one deterministic
  double division) rather than engine-native AVG.
- Inherently-float results (stddev, cosine) are rounded to a fixed number
  of decimals on both sides.
- Every computed column is aliased identically in both forms.
- Queries whose semantics are non-deterministic or engine-specific
  (seeded sampling, MinHash/LSH, streaming) register ``oracle=None`` →
  the driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the engine's declared surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
