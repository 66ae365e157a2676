"""Plan builders: validated config -> lazy DataFrame expression tree."""

from meta_frame_spark.plans.builder import (
    agg_expr,
    aggregate_and_join,
    apply_derivations,
    apply_filters,
    apply_level,
    apply_string_filters,
    filter_condition,
    nested_aggregate,
    run_iteration,
    run_pipeline,
)
from meta_frame_spark.plans.curation import (
    CURATION_OPS,
    run_curation,
    validate_curation_config,
)

__all__ = [
    "agg_expr",
    "aggregate_and_join",
    "apply_derivations",
    "apply_filters",
    "apply_level",
    "apply_string_filters",
    "filter_condition",
    "nested_aggregate",
    "run_iteration",
    "run_pipeline",
    "CURATION_OPS",
    "run_curation",
    "validate_curation_config",
]
