from ecommerce_data_pipeline_spark.functions.datetime import (
    REFERENCE_TS_FORMAT,
    format_reference_ts,
    parse_reference_ts,
)
from ecommerce_data_pipeline_spark.functions.ids import (
    customer_id,
    product_id,
    supplier_id,
    transaction_id,
)
from ecommerce_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "REFERENCE_TS_FORMAT",
    "format_reference_ts",
    "parse_reference_ts",
    "customer_id",
    "product_id",
    "supplier_id",
    "transaction_id",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
