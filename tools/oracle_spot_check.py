"""Fast two-SF oracle spot check for queries under development.

Usage: python tools/oracle_spot_check.py <query> [<query> ...]
Runs each named registry query AND its DuckDB oracle at sf0.001 and
sf0.01 on a small local session and value-diffs them via the pytest
harness — seconds per query, the inner loop while a new operator is
being built (the full driver-mimic verify stays the round gate; see
.claude/skills/verify). Round-9 workflow: every new query went
through this at both SFs before its property test was written.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from tests.oracle_harness import duckdb_connection, compare, assert_oracle_types_safe
from ecommerce_data_pipeline_spark.plans import REGISTRY

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
names = sys.argv[1:] or ["attribution_shapley_values"]
for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
    con = duckdb_connection(sf)
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        df = q.fn(spark, sf)
        rel = con.sql(q.oracle)
        assert_oracle_types_safe(rel, name)
        compare(df, con, q.oracle)
        print(f"OK {name} @ {sf} ({time.time()-t0:.1f}s)")
spark.stop()
