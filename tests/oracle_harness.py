"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, sorts columns by name and rows by value, and asserts exact
equality — the same (stricter, since we diff values not hashes) check the
driver applies for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: Any) -> str:
    """Canonical string form of a cell for order-insensitive comparison."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr of float is the shortest round-trip form — bit-exact values
        # stringify identically.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):  # datetime / pandas Timestamp
        return str(v)
    return str(v)


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple[str, ...]]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column sets differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    assert len(spark_rows) == len(duck_rows), (
        f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = normalize(spark_rows, [c.lower() for c in spark_cols])
    d = normalize(duck_rows, [c.lower() for c in duck_cols])
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
