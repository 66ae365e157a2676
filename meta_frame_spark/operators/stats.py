"""Grouped statistics: OLS trends and correlation matrices.

Monitoring/profiling companions to :mod:`.anomaly`: "is this feed
drifting" (per-key regression slope over time) and "which quality
signals are redundant" (pairwise correlation before weighting them
into one score). Both are single map-side-combined aggregates over
Spark's native ANSI regr_*/corr functions — no Python, no second scan
per pair (every pair's moments accumulate in the same aggregate).

Not in the reference (aggregate surface stops at sum/max/min/count/avg,
SURVEY.md §2.4) — north-star scope.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group OLS of ``y`` on ``x``:
    ``(*group_cols, n, slope, intercept, r2)`` — the drift detector
    (x = time index, y = volume/quality metric; a steady feed has
    slope ≈ 0). One shuffle of constant-size moment partials per
    group; groups with < 2 distinct x have undefined slope and are
    emitted with nulls (visible, not silently dropped)."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    y, x = F.col(y_col), F.col(x_col)

    def rnd(c):
        # + 0.0 folds IEEE -0.0 (a near-zero slope rounded down) into
        # 0.0 so results compare equal across engines
        return F.round(c, round_to) + F.lit(0.0)

    return df.groupBy(*group_cols).agg(
        F.regr_count(y, x).alias("n"),
        rnd(F.regr_slope(y, x)).alias("slope"),
        rnd(F.regr_intercept(y, x)).alias("intercept"),
        rnd(F.regr_r2(y, x)).alias("r2"),
    )


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations: one row per unordered column
    pair ``(col_a, col_b, corr)``. All k·(k-1)/2 pairs accumulate in
    ONE aggregate pass (each pair is its own corr expression sharing
    the scan), then unpivot to rows — never k² scans. Use before
    composing quality signals: |corr| ≈ 1 means a signal adds noise
    weight, not information."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    pairs = list(combinations(cols, 2))
    agg = df.agg(*[
        F.round(F.corr(a, b), round_to).alias(f"_c_{i}")
        for i, (a, b) in enumerate(pairs)
    ])
    structs = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"_c_{i}").alias("corr"),
        )
        for i, (a, b) in enumerate(pairs)
    ])
    return agg.select(F.explode(structs).alias("p")).select(
        "p.col_a", "p.col_b", "p.corr"
    )
