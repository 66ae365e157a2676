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
    exact_distinct: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max rendered as strings so mixed types share
    one schema.

    Default distinct counting is approx (HLL): it keeps the whole
    profile map-only + one tiny reduce at any cardinality.
    ``exact_distinct=True`` uses countDistinct — note multiple exact
    distincts make Catalyst Expand each row once per distinct agg and
    shuffle the column values; fine for modest tables, not for 100 TB.
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

    def lit_(c: str) -> str:  # SQL string literal, quotes escaped
        return "'" + c.replace("'", "''") + "'"

    def ident(pref: str, c: str) -> str:  # backtick-quoted identifier
        return "`" + f"__{pref}_{c}".replace("`", "``") + "`"

    stack_args = ", ".join(
        f"{lit_(c)}, {ident('n', c)}, {ident('null', c)}, "
        f"{ident('dist', c)}, {ident('min', c)}, {ident('max', c)}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
