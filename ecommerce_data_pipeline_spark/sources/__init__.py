from ecommerce_data_pipeline_spark.sources.readers import (
    load_table,
    read_transactions_csv,
)
from ecommerce_data_pipeline_spark.sources.writers import (
    append_table,
    write_partitioned_csv,
    write_partitioned_parquet,
)

__all__ = [
    "load_table",
    "read_transactions_csv",
    "append_table",
    "write_partitioned_csv",
    "write_partitioned_parquet",
]
