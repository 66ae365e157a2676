"""Table profiling: per-column stats in one pass (data-quality
tooling for pipeline inputs; no equivalent in the reference).

One job computes every column's stats as a single wide aggregation
(map-side combined), then pivots to long form driver-free with
``stack`` — profiling a 100 TB table costs exactly one scan, and
the wide-agg row is a few KB regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max rendered as strings so mixed types share
    one schema.

    ``exact_distinct=False`` switches to approx_count_distinct — the
    right default at very high cardinality (exact distinct per column
    shuffles each column's values; HLL keeps the whole profile
    map-only + one tiny reduce).
    """
    cols = cols or df.columns
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            distinct_fn(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
