"""Assemble the full query surface. Importing this package populates the
registry from every plan module."""

from ecommerce_data_pipeline_spark.plans import advanced  # noqa: F401
from ecommerce_data_pipeline_spark.plans import analytics  # noqa: F401
from ecommerce_data_pipeline_spark.plans import analytics_series  # noqa: F401
from ecommerce_data_pipeline_spark.plans import analytics_graph  # noqa: F401
from ecommerce_data_pipeline_spark.plans import corpus_mining  # noqa: F401
from ecommerce_data_pipeline_spark.plans import entity_resolution  # noqa: F401
from ecommerce_data_pipeline_spark.plans import events_plans  # noqa: F401
from ecommerce_data_pipeline_spark.plans import misc_plans  # noqa: F401
from ecommerce_data_pipeline_spark.plans import ml_ops  # noqa: F401
from ecommerce_data_pipeline_spark.plans import profiling  # noqa: F401
# placement is imported immediately AFTER profiling: its three plans
# lived at the END of profiling.py before the r11 split, so this spot
# preserves the pre-split registration order exactly (review r11)
from ecommerce_data_pipeline_spark.plans import placement  # noqa: F401
from ecommerce_data_pipeline_spark.plans import profiling_tests  # noqa: F401
# effect_sizes is imported immediately AFTER profiling_tests: its three
# plans were that module's registration TAIL before the r13 split, so
# this spot preserves the pre-split registration order exactly (the
# placement/hypothesis_ladder precedent)
from ecommerce_data_pipeline_spark.plans import effect_sizes  # noqa: F401
from ecommerce_data_pipeline_spark.plans import hypothesis_ladder  # noqa: F401
from ecommerce_data_pipeline_spark.plans import recommendation  # noqa: F401
from ecommerce_data_pipeline_spark.plans import relational  # noqa: F401
from ecommerce_data_pipeline_spark.plans import retrieval  # noqa: F401
from ecommerce_data_pipeline_spark.plans import sampling_plans  # noqa: F401
from ecommerce_data_pipeline_spark.plans import scalar  # noqa: F401
from ecommerce_data_pipeline_spark.plans import segmentation  # noqa: F401
from ecommerce_data_pipeline_spark.plans import sketches  # noqa: F401
from ecommerce_data_pipeline_spark.plans import similarity_plans  # noqa: F401
from ecommerce_data_pipeline_spark.plans import text_analysis  # noqa: F401
from ecommerce_data_pipeline_spark.plans import tpch  # noqa: F401
from ecommerce_data_pipeline_spark.plans import tpch2  # noqa: F401
from ecommerce_data_pipeline_spark.plans import windows  # noqa: F401
from ecommerce_data_pipeline_spark.plans.registry import (
    REGISTRY,
    oracle_sql,
    queries,
)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
