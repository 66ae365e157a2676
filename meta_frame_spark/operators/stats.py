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

from pyspark.sql import DataFrame, Window
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


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """One-row embedding-space drift report between two corpus slices
    (crawl vs refresh, train vs eval, label groups):

    - ``n_a`` / ``n_b`` — vectors per side;
    - ``l2_shift`` — euclidean distance between the two mean vectors;
    - ``cos_means`` — cosine similarity of the mean vectors (1.0 ⇒
      same direction; embedding providers drift direction before
      magnitude);
    - ``max_dim_shift`` — largest per-dimension |Δmean| (which axis
      moved most);
    - ``mean_dim_shift`` — average per-dimension |Δmean|.

    The "did the embedding distribution move" gate to run before
    trusting a frozen ANN index / centroid set against refreshed data
    (SemDeDup cells and IVF routing both assume the space is stable).

    Scale: ``posexplode`` fans each vector into (dim, value) rows —
    a ×dim row blowup that immediately collapses map-side, because
    the groupBy key is ``dim`` (bounded by the embedding width) and
    partial aggregation combines before the shuffle; the shuffled
    data is O(partitions × dim) partials, never O(rows × dim). The
    final report is one aggregate over ≤ dim rows. Both sides explode
    in one union pass.
    """
    tagged = (
        df_a.select(F.lit("a").alias("_s"), F.col(vec_col).alias("_v"))
        .unionByName(
            df_b.select(F.lit("b").alias("_s"), F.col(vec_col).alias("_v"))
        )
        .filter(F.col("_v").isNotNull())
    )
    per_dim = (
        tagged.select("_s", F.posexplode("_v").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.avg(F.when(F.col("_s") == "a", F.col("val"))).alias("ma"),
            F.avg(F.when(F.col("_s") == "b", F.col("val"))).alias("mb"),
        )
    )
    # coalesce: F.sum over ZERO rows (both slices empty / all-null
    # vectors) is NULL — report n_a=0/n_b=0 explicitly instead of
    # "counts unknown" (ADVICE r8); the metric columns stay NULL,
    # which is honest (no vectors = no means to compare).
    counts = tagged.groupBy().agg(
        F.coalesce(
            F.sum(F.when(F.col("_s") == "a", 1).otherwise(0)), F.lit(0)
        ).alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("_s") == "b", 1).otherwise(0)), F.lit(0)
        ).alias("n_b"),
    )
    d = F.col("ma") - F.col("mb")

    def rnd(c):
        return F.round(c, round_to) + F.lit(0.0)

    report = per_dim.agg(
        rnd(F.sqrt(F.sum(d * d))).alias("l2_shift"),
        rnd(
            F.sum(F.col("ma") * F.col("mb"))
            / (
                F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
            )
        ).alias("cos_means"),
        rnd(F.max(F.abs(d))).alias("max_dim_shift"),
        rnd(F.avg(F.abs(d))).alias("mean_dim_shift"),
    )
    return counts.crossJoin(F.broadcast(report)).select(
        "n_a", "n_b", "l2_shift", "cos_means", "max_dim_shift",
        "mean_dim_shift",
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability-diagram table for a probabilistic classifier score
    in [0, 1] against a binary label: one row per occupied score bin,
    ``(bin, n, mean_score, frac_pos, gap)`` with ``bin`` 1..n_bins
    (equal-width; a score of exactly 1.0 lands in the top bin) and
    ``gap = |mean_score - frac_pos|`` — the per-bin term of expected
    calibration error (Naeini et al. 2015; sum n/N * gap for ECE).
    The eval step before trusting a quality classifier's scores as
    sampling weights or gate thresholds: a miscalibrated score makes
    every downstream quantile gate mean something different than it
    claims. Rows with a null score or label are excluded (visible in
    the bin counts, not silently zero-filled).

    Scale: ONE map-side-combined groupBy on the bin key — bounded
    output (<= n_bins rows), no window, no join; empty bins are
    simply absent."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")

    def rnd(c):
        return F.round(c, round_to) + F.lit(0.0)

    b = (
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
        + F.lit(1)
    )
    out = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg(s)).alias("mean_score"),
            rnd(F.avg(y)).alias("frac_pos"),
        )
    )
    return out.withColumn(
        "gap", rnd(F.abs(F.col("mean_score") - F.col("frac_pos")))
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean label — the
    measurement half of the quality-classifier family
    (operators/logreg, nb): one row ``(n_pos, n_neg, auc)`` where
    ``auc`` is the Mann-Whitney rank statistic with AVERAGE-rank tie
    handling, exactly what sklearn's ``roc_auc_score`` computes:

        AUC = (sum of positives' average ranks - P(P+1)/2) / (P * N)

    NULL scores or labels are excluded (unjudged rows can't rank).

    Scale: scores collapse to one (score -> count, positives) row per
    DISTINCT value first (a plain aggregate with map-side combine), so
    the ranking runs over the distinct-score table; the prefix sum is
    the distributed two-phase primitive (``ids.running_total`` — never
    a single-task global window), and only the final 3-value row
    leaves the cluster."""
    from meta_frame_spark.operators.ids import running_total

    scored = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    )
    per_score = scored.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("_y").cast("long")).alias("_pos"),
    )
    cum = running_total(per_score, ["_s"], "_cnt", out_col="_cum")
    # average rank of every row tied at score s:
    #   (rank range start + end) / 2 = cum_before + (cnt + 1) / 2
    avg_rank = (
        F.col("_cum") - F.col("_cnt") + (F.col("_cnt") + 1) / 2.0
    )
    totals = cum.agg(
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos")).alias("n_neg"),
        F.sum(F.col("_pos") * avg_rank).alias("_rank_sum"),
    )
    # Single-class input (n_pos or n_neg = 0) has no defined AUC:
    # Spark double division would yield NaN, and an oracle engine's
    # div-by-zero convention need not agree — return NULL
    # deterministically instead.
    return totals.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (
                    F.col("_rank_sum")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos") * F.col("n_neg")).cast("double"),
                6,
            ),
        ).alias("auc"),
    )


def _pr_cumulative(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Shared PR staging: distinct-score counts with descending-order
    cumulative predicted/true-positive totals — ``(_s, _cnt, _pos,
    _pred, _tp)``. Scores must be numeric (the descending order is a
    negated range sort). The frame is DISTINCT-SCORE-sized from the
    first aggregate on, so the two prefix-sum passes are
    model-table-priced, never corpus-priced."""
    from meta_frame_spark.operators.ids import running_total

    scored = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    )
    per_score = scored.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("_y").cast("long")).alias("_pos"),
    ).withColumn("_ord", -F.col("_s").cast("double"))
    cum = running_total(per_score, ["_ord"], "_cnt", out_col="_pred")
    return running_total(cum, ["_ord"], "_pos", out_col="_tp")


def precision_recall_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """The exact precision-recall curve of a numeric score against a
    boolean label: one row per DISTINCT score value ``(threshold, tp,
    fp, precision, recall)``, where rows scoring >= threshold are
    predicted positive (the sklearn ``precision_recall_curve``
    convention, tie rows grouped). ``recall`` is NULL when the input
    has no positives (undefined, not 0). NULL scores/labels are
    excluded.

    Scale: identical shape to :func:`roc_auc` — one hash aggregate
    collapses the corpus to distinct scores (map-side combine), then
    the distributed two-phase prefix sum (``ids.running_total``)
    orders them descending; no corpus-sized window, nothing
    collected."""
    cum = _pr_cumulative(df, score_col, label_col)
    n_pos = F.sum("_pos").over(Window.partitionBy())
    return cum.select(
        F.col("_s").alias("threshold"),
        F.col("_tp").cast("long").alias("tp"),
        (F.col("_pred") - F.col("_tp")).cast("long").alias("fp"),
        F.round(F.col("_tp") / F.col("_pred"), 6).alias("precision"),
        F.when(
            n_pos > 0, F.round(F.col("_tp") / n_pos.cast("double"), 6)
        ).alias("recall"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact average precision (PR-AUC by the step-interpolation-free
    definition sklearn's ``average_precision_score`` uses): one row
    ``(n_pos, n_neg, average_precision)`` with

        AP = sum over distinct thresholds of (dRecall x precision)
           = sum(pos_at_s * (tp_s / pred_s)) / n_pos

    NULL when the input has no positive rows (recall undefined).
    Complements :func:`roc_auc`: AUC is threshold-free ranking
    quality, AP weights the ranking by where the positives actually
    land — the metric that moves when a quality classifier's top
    decile goes bad. Same distributed shape as roc_auc (distinct-score
    collapse + two-phase prefix sum)."""
    cum = _pr_cumulative(df, score_col, label_col)
    totals = cum.agg(
        F.sum("_pos").cast("long").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos")).cast("long").alias("n_neg"),
        F.sum(F.col("_pos") * (F.col("_tp") / F.col("_pred"))).alias("_w"),
    )
    return totals.select(
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("_w") / F.col("n_pos").cast("double"), 6),
        ).alias("average_precision"),
    )


def mad_outliers_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.5,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group robust outlier census via the modified z-score
    (Iglewicz & Hoaglin 1993): ``(*group_cols, n, median, mad,
    n_outliers, outlier_frac)`` where a row is an outlier when
    ``|x - median| > k * 1.4826 * MAD`` (1.4826 scales MAD to sigma
    under normality; k=3.5 is the published default). Degenerate
    groups where MAD = 0 (a majority of identical values) flag every
    ``x != median`` — the robust limit of the same rule. NULL values
    are excluded.

    Scale, ``exact=True`` (r14 optimization, guide §2.4 "remove
    shuffles outright"): ONE grouped ``collect_list`` per group, then
    median, MAD and the census all come out of the sorted array with
    codegen HOFs — 1 scan + 1 shuffle instead of the old 3 scans +
    3 grouped-percentile shuffles. The memory profile is unchanged:
    Spark's exact ``percentile`` already buffers every group value in
    its aggregation buffer, so the array form holds the same bytes
    (fine to ~1e8 rows per group, required for the value-exact
    oracle). The interpolation replicates Spark's
    ``percentile(0.5)`` bit-exactly (position = (n-1)/2, linear
    interpolation between floor/ceil ranks). At 100 TB pass
    ``exact=False`` for the bounded-memory ``percentile_approx``
    sketch path (same report, approximate cuts, original 2-pass
    shape)."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if not group_cols:
        raise ValueError("mad_outliers needs at least one group column")

    v = F.col(value_col)
    base = df.filter(v.isNotNull()).select(*group_cols, v.alias("_v"))

    if exact:
        def interp(sorted_col):
            # Spark Percentile.getPercentile: pos = p*(n-1); result =
            # lower + (higher - lower) * (pos - floor(pos)) — same ops,
            # same order, bit-identical doubles.
            pos = (F.size(sorted_col).cast("double") - 1) / 2
            lo_i = F.floor(pos).cast("int")
            hi_i = F.ceil(pos).cast("int")
            lo = F.element_at(sorted_col, lo_i + 1)
            hi = F.element_at(sorted_col, hi_i + 1)
            return F.when(lo_i == hi_i, lo).otherwise(
                lo + (hi - lo) * (pos - lo_i)
            )

        g = base.groupBy(*group_cols).agg(
            F.sort_array(F.collect_list("_v")).alias("_s")
        )
        g = g.withColumn("_med", interp(F.col("_s")))
        g = g.withColumn(
            "_ds",
            F.sort_array(
                F.transform("_s", lambda x: F.abs(x - F.col("_med")))
            ),
        ).withColumn("_mad", interp(F.col("_ds")))
        thr = F.lit(k) * F.lit(1.4826) * F.col("_mad")
        n_out = F.when(
            F.col("_mad") > 0,
            F.size(F.filter("_ds", lambda d: d > thr)),
        ).otherwise(
            F.size(F.filter("_s", lambda x: x != F.col("_med")))
        ).cast("long")
        return g.select(
            *group_cols,
            F.size("_s").cast("long").alias("n"),
            F.round(F.col("_med"), 6).alias("median"),
            F.round(F.col("_mad"), 6).alias("mad"),
            n_out.alias("n_outliers"),
            F.round(
                n_out / F.size("_s").cast("double"), 6
            ).alias("outlier_frac"),
        )

    def med(col):
        return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))

    med_tbl = base.groupBy(*group_cols).agg(med(F.col("_v")).alias("_med"))
    with_med = base.join(F.broadcast(med_tbl), group_cols)
    dev = with_med.withColumn("_d", F.abs(F.col("_v") - F.col("_med")))
    mad_tbl = dev.groupBy(*group_cols).agg(med(F.col("_d")).alias("_mad"))
    flagged = dev.join(F.broadcast(mad_tbl), group_cols).withColumn(
        "_out",
        F.when(
            F.col("_mad") > 0,
            F.col("_d") > F.lit(k) * F.lit(1.4826) * F.col("_mad"),
        ).otherwise(F.col("_v") != F.col("_med")),
    )
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("_med"), 6).alias("median"),
        F.round(F.first("_mad"), 6).alias("mad"),
        F.sum(F.col("_out").cast("long")).alias("n_outliers"),
        F.round(
            F.sum(F.col("_out").cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("outlier_frac"),
    )


def calibration_summary(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """One-row calibration scorecard for a probabilistic score in
    [0, 1] against a binary label: ``(n, ece, mce, brier)`` — expected
    calibration error (Naeini et al. 2015: bin-mass-weighted
    |mean_score - frac_pos| over the same equal-width bins as
    :func:`calibration_report`), maximum calibration error (the worst
    occupied bin), and the Brier score (mean squared error of the
    probability). The summary :func:`calibration_report` readers
    compute by hand — here as one number a release gate can threshold.

    Scale: one map-side-combined groupBy on the bin key carrying the
    Brier partial sums, then a <= n_bins-row fold; no window, no join,
    nothing collected."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    b = (
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
        + F.lit(1)
    )
    per_bin = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("_bin"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(s).alias("_ss"),
            F.sum(y).alias("_sy"),
            F.sum((s - y) * (s - y)).alias("_sq"),
        )
    )
    gap = F.abs(F.col("_ss") / F.col("_n") - F.col("_sy") / F.col("_n"))
    totals = per_bin.agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum(gap * F.col("_n")).alias("_wgap"),
        F.max(gap).alias("_mce"),
        F.sum("_sq").alias("_sqt"),
    )
    return totals.select(
        "n",
        F.round(F.col("_wgap") / F.col("n"), round_to).alias("ece"),
        F.round(F.col("_mce"), round_to).alias("mce"),
        F.round(F.col("_sqt") / F.col("n"), round_to).alias("brier"),
    )


def categorical_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """One-row association scorecard between two categorical columns:
    ``(n, mi, nmi, cramers_v)`` — mutual information in nats,
    normalized MI (MI / sqrt(H_a * H_b), NULL when either marginal
    entropy is 0), and Cramér's V via the zero-cell-free identity
    chi2 = n * (sum over OBSERVED cells of p_xy^2/(p_x p_y) - 1)
    (absent cells contribute nothing to sum o^2/e, so the full-grid
    chi-square needs no grid materialization). V is NULL when either
    side has a single category (undefined). Rows with a NULL on
    either side are excluded — this scores association between
    observed pairs. The audit for redundant metadata (does `source`
    already determine `lang`?) before a release stratifies on both.

    Scale: one hash aggregate collapses the corpus to the observed
    contingency cells; marginals re-aggregate that cell table and
    broadcast back; every downstream frame is category-sized. The
    whole-frame total window runs on the cell table only."""
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    cell = base.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    ma = cell.groupBy("_a").agg(F.sum("_c").alias("_ca"))
    mb = cell.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    j = cell.join(F.broadcast(ma), "_a").join(F.broadcast(mb), "_b")
    tot = F.sum("_c").over(Window.partitionBy())
    terms = j.select(
        "_c", "_ca", "_cb", tot.alias("_n"),
        (
            (F.col("_c") / tot)
            * F.log(
                F.col("_c") * tot
                / (F.col("_ca") * F.col("_cb")).cast("double")
            )
        ).alias("_mi_term"),
        (
            F.col("_c") * F.col("_c")
            / (F.col("_ca") * F.col("_cb")).cast("double")
        ).alias("_chi_term"),
    )
    folded = terms.agg(
        F.first("_n").cast("long").alias("n"),
        F.sum("_mi_term").alias("_mi"),
        F.sum("_chi_term").alias("_chi_ratio"),
    )

    def entropy(marg: DataFrame, cnt_col: str):
        t = F.sum(cnt_col)
        return marg.agg(
            (
                F.log(t.cast("double"))
                - F.sum(
                    F.col(cnt_col) * F.log(F.col(cnt_col).cast("double"))
                ) / t
            ).alias("_h"),
            F.count(F.lit(1)).alias("_dim"),
        )

    ha = entropy(ma, "_ca").select(
        F.col("_h").alias("_ha"), F.col("_dim").alias("_ra")
    )
    hb = entropy(mb, "_cb").select(
        F.col("_h").alias("_hb"), F.col("_dim").alias("_rb")
    )
    out = folded.crossJoin(ha).crossJoin(hb)
    chi2 = (F.col("_chi_ratio") - 1) * F.col("n")
    mindim = F.least(F.col("_ra"), F.col("_rb"))
    return out.select(
        "n",
        F.round(F.col("_mi"), round_to).alias("mi"),
        F.when(
            (F.col("_ha") > 0) & (F.col("_hb") > 0),
            F.round(
                F.col("_mi") / F.sqrt(F.col("_ha") * F.col("_hb")),
                round_to,
            ),
        ).alias("nmi"),
        F.when(
            mindim >= 2,
            F.round(
                F.sqrt(
                    F.greatest(chi2, F.lit(0.0))
                    / (F.col("n") * (mindim - 1)).cast("double")
                ),
                round_to,
            ),
        ).alias("cramers_v"),
    )
