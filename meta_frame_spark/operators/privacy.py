"""K-anonymity / l-diversity / t-closeness checks for quasi-identifiers.

Not in the reference (no privacy surface); a training-data pipeline
that exports user-derived corpora needs a release gate: a row is
k-anonymous w.r.t. a set of quasi-identifier columns when at least
``k`` rows share its full quasi-identifier tuple (Sweeney 2002, public
technique). Rows in smaller groups are re-identifiable and get
suppressed before release. K-anonymity alone leaks when a qualifying
group is homogeneous in the SENSITIVE attribute — l-diversity
(Machanavajjhala et al. 2007) requires each group to hold at least
``l`` well-represented sensitive values, and t-closeness (Li, Li &
Venkatasubramanian 2007) bounds how far a group's sensitive
distribution may drift from the table-wide one.

Scale design: one hashed groupBy on the quasi columns with map-side
partial counts (the group frame is |distinct tuples|, orders of
magnitude smaller than the data), then an equi-join of the fact side
against the qualifying tuples — AQE broadcasts it when small. The
fact rows never shuffle for the report; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,  # noqa: E741 - the metric's published name
) -> DataFrame:
    """Per-quasi-group l-diversity audit (Machanavajjhala et al. 2007):
    ``(*quasi_cols, n_rows, n_sensitive, entropy, distinct_ok,
    entropy_ok)`` — ``distinct_ok`` is distinct l-diversity
    (>= l distinct sensitive values in the group), ``entropy_ok`` is
    entropy l-diversity (Shannon entropy of the group's sensitive
    distribution >= ln(l), the stricter published variant). NULL
    sensitive values form their own category (groupBy semantics) —
    a column of NULLs is a homogeneity leak like any other.

    Scale design: two stacked hash aggregations — (quasi, sensitive)
    counts first (map-side partials absorb the fact rows), then one
    group-level pass; both outputs are distinct-tuple-sized, the fact
    rows shuffle once on the (quasi, sensitive) key, nothing is
    collected."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    if not quasi_cols:
        raise ValueError("l_diversity needs at least one quasi-identifier column")
    import math

    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    tot = F.sum("_c")
    # entropy of the in-group sensitive distribution: since
    # sum(c * ln c) and n * ln n aggregate independently,
    # H = ln(n) - sum(c ln c)/n needs no second pass over p_i
    ent = F.log(tot.cast("double")) - F.sum(
        F.col("_c") * F.log(F.col("_c").cast("double"))
    ) / tot
    return (
        cell.groupBy(*quasi_cols)
        .agg(
            tot.cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_sensitive"),
            F.round(ent, 6).alias("entropy"),
        )
        .select(
            *quasi_cols,
            "n_rows",
            "n_sensitive",
            "entropy",
            (F.col("n_sensitive") >= l).alias("distinct_ok"),
            (F.col("entropy") >= F.lit(round(math.log(l), 6))).alias(
                "entropy_ok"
            ),
        )
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """Per-quasi-group t-closeness audit for a CATEGORICAL sensitive
    attribute (Li, Li & Venkatasubramanian 2007): ``(*quasi_cols,
    n_rows, distance, close_ok)`` where ``distance`` is the total
    variation distance between the group's sensitive distribution and
    the table-wide one — for categorical attributes under the
    equal-ground-distance metric, the Earth Mover's Distance of the
    paper reduces exactly to total variation (half the L1 gap).
    Sensitive values absent from a group contribute their full global
    mass to the gap.

    Scale design: the global distribution is a |values|-sized frame
    broadcast into a (group x value) spine built from the two
    aggregate tables — the spine is |groups| x |values| rows (model
    table sized, never corpus sized); fact rows shuffle once."""
    if not 0 < t <= 1:
        raise ValueError(f"t must be in (0, 1], got {t}")
    if not quasi_cols:
        raise ValueError("t_closeness needs at least one quasi-identifier column")

    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    groups = cell.groupBy(*quasi_cols).agg(
        F.sum("_c").cast("long").alias("n_rows")
    )
    # the global distribution re-aggregates the CELL table (never a
    # second scan of the fact rows); the whole-frame window runs on
    # the |values|-sized aggregate only
    n_total = F.sum("_g").over(Window.partitionBy())
    glob = (
        cell.groupBy(sensitive_col)
        .agg(F.sum("_c").alias("_g"))
        .select(
            sensitive_col,
            (F.col("_g") / n_total.cast("double")).alias("_q"),
        )
    )
    # (group x value) spine: absent cells get p = 0, so |p - q| = q
    spine = groups.crossJoin(F.broadcast(glob))
    joined = spine.join(cell, [*quasi_cols, sensitive_col], "left").select(
        *quasi_cols,
        "n_rows",
        "_q",
        (
            F.coalesce(F.col("_c"), F.lit(0)) / F.col("n_rows").cast("double")
        ).alias("_p"),
    )
    return (
        joined.groupBy(*quasi_cols, "n_rows")
        .agg(
            F.round(F.sum(F.abs(F.col("_p") - F.col("_q"))) / 2, 6).alias(
                "distance"
            )
        )
        .select(
            *quasi_cols,
            "n_rows",
            "distance",
            (F.col("distance") <= t).alias("close_ok"),
        )
    )
