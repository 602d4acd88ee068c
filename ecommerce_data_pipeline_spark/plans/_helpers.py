"""Shared expression helpers keeping Spark plans and DuckDB oracles exact."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    """Exact-decimal view of a double measure (see registry docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column) -> Column:
    """Exact decimal sum, published as double."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Exact-decimal sum / count — deterministic cross-engine average."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


# SQL-side twins (DuckDB dialect)
def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT({expr})"
