from __future__ import annotations

import importlib
import sys


def test_entry_smoke(spark):
    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"p_brand", "c_mktsegment", "revenue", "sum_qty", "n_lines"} == set(
        df.columns
    )


def test_oracle_keys_subset_of_queries():
    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
