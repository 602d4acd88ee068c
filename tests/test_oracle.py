"""Oracle-differential tests: every registered query vs its DuckDB twin.

This is the primary correctness gate (SURVEY.md §5.1), run at sf0.001 for
speed (the driver re-runs the same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from ecommerce_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    compare(df, oracle_con, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.count() >= 0  # materializes without error; driver checks same
