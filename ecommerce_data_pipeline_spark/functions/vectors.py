"""Vector math over ArrayType columns (F6) — embeddings support.

Dot product / norms / cosine are pure higher-order-function expressions
(``zip_with`` + ``aggregate``), so they execute JVM-side on the array data
with no Python round-trip — the 100 TB-safe default. A vectorized Pandas-UDF
alternative exists in operators/similarity.py for wide-batch scoring where
NumPy BLAS wins.

Inputs are cast to double before accumulation so float arrays don't lose
precision during the fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ as a single codegen'd fold."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """dot(a,b) / (|a|·|b|); NULL-safe on zero-norm vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
