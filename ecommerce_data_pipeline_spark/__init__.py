"""eCommerce Data Pipeline — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (Javier009/eCommerce_Data_Pipeline):
a star-schema e-commerce analytics engine (dimension upsert-with-dedup,
fact enrichment joins, partitioned landing sinks, revenue aggregation)
extended with the operators a large-scale LLM-training-data pipeline needs
(dedup, similarity search, text analysis, multimodal column plumbing).

Everything is declared through the DataFrame/SQL API so Catalyst + AQE +
whole-stage codegen own the physical plan; Python UDFs are avoided in hot
paths (see ``functions/`` — all Column-expression based).
"""

from ecommerce_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
