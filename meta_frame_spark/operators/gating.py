"""Distribution-based quality gating: keep rows whose metric falls
inside a quantile band of its group.

The absolute-threshold filters in ``functions.text`` (quality_score,
repetition stats) need hand-picked cutoffs; the quantile gate is the
self-calibrating variant a corpus pipeline runs first — e.g. drop
documents outside the per-language [p05, p95] length band, whatever
those lengths happen to be for that language.

Scale design: the stats side is one aggregate producing one row per
group (languages/domains — thousands at most), broadcast back onto the
un-shuffled fact side; the corpus itself never shuffles. Exact
``percentile`` sorts each group's values and is fine up to ~10⁸ rows
per group; at 100 TB switch ``exact=False`` for ``approx_percentile``
(a fixed-size sketch, single pass, mergeable map-side) — the band
edges move by at most ``accuracy``-bounded rank error while the plan
shape stays identical.

NB the stats-then-apply shape scans ``df`` twice (once for the band
aggregate, once for the filter). When ``df`` is a raw source scan
that's the right trade (nothing worth caching); when it's an
expensive derived pipeline, ``persist()`` it before calling — the
operator deliberately doesn't persist caller-owned frames (audited
with embedding_outliers, VERDICT r4 #6: only internally DERIVED
branches are persisted operator-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LO, _HI = "_mfs_q_lo", "_mfs_q_hi"


def quantile_band_filter(
    df: DataFrame,
    value_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    group_cols: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep rows with ``lower_q``-quantile <= value <= ``upper_q``-quantile,
    quantiles computed per ``group_cols`` (or globally when None).
    Returns the input schema unchanged.
    """
    if not 0.0 <= lower_q <= upper_q <= 1.0:
        raise ValueError(
            f"need 0 <= lower_q <= upper_q <= 1, got {lower_q}, {upper_q}"
        )
    v = F.col(value_col)
    if exact:
        aggs = [
            F.percentile(v, F.lit(lower_q)).alias(_LO),
            F.percentile(v, F.lit(upper_q)).alias(_HI),
        ]
    else:
        aggs = [
            F.percentile_approx(v, F.lit(lower_q), F.lit(accuracy)).alias(_LO),
            F.percentile_approx(v, F.lit(upper_q), F.lit(accuracy)).alias(_HI),
        ]
    keys = list(group_cols or [])
    stats = df.groupBy(*keys).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), keys)
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    return joined.filter((v >= F.col(_LO)) & (v <= F.col(_HI))).select(*df.columns)


def winsorize(
    df: DataFrame,
    value_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Clip ``value_col`` into its per-group ``[lower_q, upper_q]``
    quantile band instead of dropping rows — the outlier treatment for
    metrics that feed downstream scores (a 10 MB document should count
    as "very long", not poison a mean).

    Same plan shape as :func:`quantile_band_filter` (tiny per-group
    stats aggregate, broadcast back, map-only clip); same
    ``exact=False`` sketch path at extreme scale. ``out_col`` defaults
    to clipping in place.
    """
    if not 0.0 <= lower_q <= upper_q <= 1.0:
        raise ValueError(
            f"need 0 <= lower_q <= upper_q <= 1, got {lower_q}, {upper_q}"
        )
    v = F.col(value_col)
    if exact:
        aggs = [
            F.percentile(v, F.lit(lower_q)).alias(_LO),
            F.percentile(v, F.lit(upper_q)).alias(_HI),
        ]
    else:
        aggs = [
            F.percentile_approx(v, F.lit(lower_q), F.lit(accuracy)).alias(_LO),
            F.percentile_approx(v, F.lit(upper_q), F.lit(accuracy)).alias(_HI),
        ]
    keys = list(group_cols or [])
    stats = df.groupBy(*keys).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), keys)
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    clipped = F.least(F.greatest(v, F.col(_LO)), F.col(_HI))
    out = out_col or value_col
    sel = [
        clipped.alias(out) if c == out else F.col(c) for c in df.columns
    ]
    if out not in df.columns:
        sel.append(clipped.alias(out))
    return joined.select(*sel)


def top_mass_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    mass: float,
    tiebreak: str,
) -> DataFrame:
    """Score-mass budgeting (nucleus-style selection): per group, keep
    the highest-``score_col`` rows until their cumulative score first
    reaches ``mass`` of the group total — the boundary row that
    crosses the threshold is KEPT, so every non-empty group keeps at
    least one row. Unlike a fixed per-group count (domain_cap) or a
    quantile gate, the budget adapts to how concentrated each group's
    quality is: a group where two docs carry 90% of the score keeps
    two docs.

    Deterministic: rows rank by (score desc, tiebreak asc). Scores
    must be non-negative — a negative score makes cumulative mass
    non-monotone and the cut ill-defined; gate with
    ``expect_or_fail([{"check": "range", ...}])`` upstream. One
    shuffle on the group key; window state is one group's rows.
    """
    if not 0 < mass <= 1:
        raise ValueError(f"mass must be in (0, 1], got {mass}")
    from pyspark.sql import Window

    order = [F.col(score_col).desc(), F.col(tiebreak).asc()]
    wg = Window.partitionBy(*group_cols)
    w = wg.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    # a row is kept iff the mass BEFORE it is still under budget — so
    # the boundary row crossing the threshold stays. An all-zero group
    # has no mass to budget; its rank-1 row is kept to honor the
    # at-least-one-row contract.
    prev = F.sum(score_col).over(w) - F.col(score_col)
    total = F.sum(score_col).over(wg)
    rn = F.row_number().over(wg.orderBy(*order))
    p, t, r = "_mfs_tm_prev", "_mfs_tm_tot", "_mfs_tm_rn"
    return (
        df.withColumn(p, prev)
        .withColumn(t, total)
        .withColumn(r, rn)
        .filter(
            ((F.col(t) > 0) & (F.col(p) < mass * F.col(t)))
            | ((F.col(t) == 0) & (F.col(r) == 1))
        )
        .drop(p, t, r)
    )
