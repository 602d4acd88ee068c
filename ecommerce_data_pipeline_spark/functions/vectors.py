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


def cosine_with_norms(
    a: str | Column, b: str | Column, na: str | Column, nb: str | Column
) -> Column:
    """``cosine_similarity`` with the per-vector L2 norms precomputed.

    HOF folds (zip_with/aggregate) are interpreted, not codegen'd, so on
    a pair join the 3-fold form (dot + both norms) triples the hot-path
    cost AND recomputes each row's norm once per partner. Projecting
    ``l2_norm`` once per side before the join and dividing by ``na·nb``
    leaves ONE fold per pair. Bit-identical to ``cosine_similarity``:
    the norm is the same fold over the same row, and the denominator is
    the same two-factor product.
    """
    denom = _c(na) * _c(nb)
    return F.when(denom > 0, dot(a, b) / denom)
