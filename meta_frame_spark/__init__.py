"""meta_frame_spark — a PySpark-native, metadata-driven analytics engine.

A from-scratch rebuild of the semantics of ``skybluecycology/meta_frame``
(reference mounted read-only at /root/reference): a JSON/dict config fully
describes a pipeline of load -> filter -> project -> group/aggregate ->
rename -> join children -> save, interpreted against Spark DataFrames.

Unlike the reference (a dual pandas/Spark interpreter), this engine:

* is single-engine: everything is a lazy ``pyspark.sql.DataFrame`` plan so
  Catalyst does predicate pushdown, column pruning and join planning;
* validates configs loudly (unknown filter ops / agg funcs raise, instead
  of the reference's silent no-op fallthrough, megatron.py:11,14);
* aliases aggregate columns deterministically at agg time;
* adds the large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) the reference never had.

Public API::

    from meta_frame_spark import (
        run_pipeline,          # dialect A: iterations/levels cascade
        aggregate_and_join,    # dialect B: recursive parent->child join tree
        nested_aggregate,      # dialect B': nested agg with filtered aggs
        load_data, save_data,  # source/sink registry
        get_session,
    )
"""

from meta_frame_spark.session import get_session
from meta_frame_spark.config.model import (
    ConfigError,
    validate_pipeline_config,
    validate_tree_config,
    validate_nested_config,
)
from meta_frame_spark.plans.builder import (
    apply_filters,
    apply_level,
    run_pipeline,
    aggregate_and_join,
    nested_aggregate,
)
from meta_frame_spark.sources.registry import load_data
from meta_frame_spark.sources.sinks import save_data

__all__ = [
    "ConfigError",
    "get_session",
    "validate_pipeline_config",
    "validate_tree_config",
    "validate_nested_config",
    "apply_filters",
    "apply_level",
    "run_pipeline",
    "aggregate_and_join",
    "nested_aggregate",
    "load_data",
    "save_data",
]

__version__ = "0.1.0"
