"""K-anonymity checks for quasi-identifier columns.

Not in the reference (no privacy surface); a training-data pipeline
that exports user-derived corpora needs a release gate: a row is
k-anonymous w.r.t. a set of quasi-identifier columns when at least
``k`` rows share its full quasi-identifier tuple (Sweeney 2002, public
technique). Rows in smaller groups are re-identifiable and get
suppressed before release.

Scale design: one hashed groupBy on the quasi columns with map-side
partial counts (the group frame is |distinct tuples|, orders of
magnitude smaller than the data), then an equi-join of the fact side
against the qualifying tuples — AQE broadcasts it when small. The
fact rows never shuffle for the report; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_sizes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    if not quasi_cols:
        raise ValueError("k_anonymity needs at least one quasi-identifier column")
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_qid_n"))


def k_anonymity_filter(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Rows whose quasi-identifier group has ``>= k`` members (the
    releasable subset), original schema preserved. NULL quasi values
    group together (groupBy semantics) and the join is NULL-SAFE, so
    a NULL-keyed group of >= k rows is releasable — the filter and
    ``k_anonymity_report`` agree row-for-row on what a release keeps."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keep = _group_sizes(df, quasi_cols).filter(F.col("_qid_n") >= k)
    # eqNullSafe per quasi column: plain equi-join keys never match
    # NULLs, which would silently suppress every NULL-keyed row even
    # when its group qualifies (and diverge from the report's math)
    left, right = df.alias("_l"), keep.alias("_r")
    cond = None
    for c in quasi_cols:
        # backtick-quoted: a quasi column named "a.b" must resolve as
        # one column, not a nested-field path
        term = F.col(f"_l.`{c}`").eqNullSafe(F.col(f"_r.`{c}`"))
        cond = term if cond is None else cond & term
    return left.join(right, cond, "inner").select("_l.*")


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row release-gate report: ``(k, n_rows, n_groups,
    violating_groups, suppressed_rows, suppressed_frac)`` —
    how much data a ``k_anonymity_filter`` release would drop."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = _group_sizes(df, quasi_cols)
    viol = F.col("_qid_n") < k
    return sizes.agg(
        F.lit(k).alias("k"),
        F.sum("_qid_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("violating_groups"),
        F.sum(F.when(viol, F.col("_qid_n")).otherwise(0))
        .cast("long")
        .alias("suppressed_rows"),
    ).select(
        "k",
        "n_rows",
        "n_groups",
        "violating_groups",
        "suppressed_rows",
        F.round(F.col("suppressed_rows") / F.col("n_rows"), 6).alias(
            "suppressed_frac"
        ),
    )
