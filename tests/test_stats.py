"""Grouped OLS / correlation operators (operators/stats.py)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.stats import corr_matrix, group_trend


def test_group_trend_recovers_planted_lines(spark):
    rows = []
    for i in range(20):
        rows.append(("up", float(i), 2.0 * i + 5.0))     # slope 2
        rows.append(("flat", float(i), 7.0))             # slope 0
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    out = {r.k: r for r in group_trend(df, ["k"], "x", "y").collect()}
    assert out["up"].slope == 2.0 and out["up"].intercept == 5.0
    assert out["up"].r2 == 1.0 and out["up"].n == 20
    assert out["flat"].slope == 0.0
    with pytest.raises(ValueError, match="group_cols"):
        group_trend(df, [], "x", "y")


def test_group_trend_degenerate_group_emits_nulls(spark):
    df = spark.createDataFrame(
        [("one", 1.0, 3.0), ("one", 1.0, 9.0)], ["k", "x", "y"]
    )
    r = group_trend(df, ["k"], "x", "y").collect()[0]
    assert r.n == 2 and r.slope is None  # vertical line: undefined, visible


def test_corr_matrix_pairs_and_values(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") * -3 + 7).cast("double").alias("b"),
        (F.col("id") % 7).cast("double").alias("c"),
    )
    out = {(r.col_a, r.col_b): r.corr
           for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == -1.0          # perfectly anti-correlated
    assert abs(out[("a", "c")]) < 0.3       # near-independent
    with pytest.raises(ValueError, match="two columns"):
        corr_matrix(df, ["a"])


def test_embedding_drift_identical_slices(spark):
    from meta_frame_spark.operators.stats import embedding_drift

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(4)], ["vec_id", "embedding"]
    )
    r = embedding_drift(df, df).collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.l2_shift == 0.0 and r.cos_means == 1.0
    assert r.max_dim_shift == 0.0 and r.mean_dim_shift == 0.0


def test_embedding_drift_planted_single_dim_shift(spark):
    from meta_frame_spark.operators.stats import embedding_drift

    a = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [3.0, 1.0, 1.0, 1.0])],
        ["vec_id", "embedding"],
    )  # mean (2,1,1,1)
    b = spark.createDataFrame(
        [(0, [4.0, 1.0, 1.0, 1.0]), (1, [6.0, 1.0, 1.0, 1.0]),
         (2, None)],
        ["vec_id", "embedding"],
    )  # mean (5,1,1,1); null vector dropped from n_b
    r = embedding_drift(a, b).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.l2_shift == 3.0          # only dim 0 moved, by 3
    assert r.max_dim_shift == 3.0
    assert r.mean_dim_shift == 0.75   # 3/4 dims
    import math
    expect = (2 * 5 + 3) / (math.sqrt(4 + 3) * math.sqrt(25 + 3))
    assert abs(r.cos_means - expect) < 1e-6


def test_embedding_drift_empty_slices_report_zero_counts(spark):
    """Empty (or all-null-vector) slices must report n_a=0/n_b=0
    explicitly — F.sum over zero rows is NULL and previously read as
    'counts unknown' (ADVICE r8). Metrics stay NULL: no vectors means
    no means to compare."""
    from pyspark.sql import functions as F

    from meta_frame_spark.operators.stats import embedding_drift

    empty = spark.createDataFrame([], "embedding array<float>")
    row = embedding_drift(empty, empty).collect()[0]
    assert (row.n_a, row.n_b) == (0, 0)
    assert row.l2_shift is None and row.cos_means is None

    # one-sided: a real slice against an all-null slice
    real = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding array<float>"
    )
    nulls = spark.createDataFrame([(None,)], "embedding array<float>")
    row = embedding_drift(real, nulls).collect()[0]
    assert (row.n_a, row.n_b) == (2, 0)


def test_calibration_report_hand_computed(spark):
    """Perfectly-labeled halves: scores below 0.5 all negative, above
    all positive — bins, counts, means, and gaps replay by hand; a
    1.0 score lands in the top bin; null scores/labels drop."""
    import pytest
    from pyspark.sql import functions as F

    from meta_frame_spark.operators.stats import calibration_report

    rows = [
        (0.05, 0), (0.15, 0), (0.25, 0), (1.0, 1), (0.95, 1),
        (0.92, 1), (None, 1), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in calibration_report(df, "score", "y").collect()}
    assert set(out) == {1, 2, 3, 10}
    assert out[10].n == 3 and out[10].frac_pos == 1.0
    assert out[10].mean_score == round((1.0 + 0.95 + 0.92) / 3, 6)
    assert out[10].gap == round(abs(out[10].mean_score - 1.0), 6)
    assert out[1].n == 1 and out[1].frac_pos == 0.0 and out[1].gap == 0.05
    with pytest.raises(ValueError, match="n_bins"):
        calibration_report(df, "score", "y", n_bins=0)
    # single shuffle, bounded output: no window, no join in the plan
    plan = (
        calibration_report(df, "score", "y")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan


class TestRocAuc:
    def test_hand_case_with_ties(self, spark):
        """Average-rank tie handling: scores [.9,.8,.8,.5,.5,.3] with
        labels [1,0,1,0,0,1] -> rank sum 11.5, AUC (11.5-6)/9."""
        import pytest as _pt

        from meta_frame_spark.operators.stats import roc_auc

        df = spark.createDataFrame(
            [(0.9, True), (0.8, False), (0.8, True),
             (0.5, False), (0.5, False), (0.3, True)],
            "s double, y boolean",
        )
        r = roc_auc(df, "s", "y").first()
        assert (r.n_pos, r.n_neg) == (3, 3)
        assert r.auc == _pt.approx((11.5 - 6) / 9, abs=1e-6)

    def test_edges_and_nulls(self, spark):
        from meta_frame_spark.operators.stats import roc_auc

        # perfect separation -> 1.0; inverted -> 0.0; nulls excluded
        df = spark.createDataFrame(
            [(3.0, True), (2.0, True), (1.0, False),
             (None, True), (9.0, None)],
            "s double, y boolean",
        )
        assert roc_auc(df, "s", "y").first().auc == 1.0
        inv = df.selectExpr("s", "NOT y AS y")
        assert roc_auc(inv, "s", "y").first().auc == 0.0

    def test_partition_invariant(self, spark):
        from meta_frame_spark.operators.stats import roc_auc

        rows = [(float(i % 17), i % 3 == 0) for i in range(200)]
        df = spark.createDataFrame(rows, "s double, y boolean")
        a = roc_auc(df, "s", "y").first()
        b = roc_auc(df.repartition(13), "s", "y").first()
        assert a == b

    def test_single_class_returns_null_auc(self, spark):
        """n_pos or n_neg = 0 has no defined AUC: NULL, never NaN."""
        from meta_frame_spark.operators.stats import roc_auc

        all_pos = spark.createDataFrame(
            [(1.0, True), (2.0, True)], "s double, y boolean"
        )
        r = roc_auc(all_pos, "s", "y").first()
        assert (r.n_pos, r.n_neg) == (2, 0) and r.auc is None
        all_neg = all_pos.selectExpr("s", "NOT y AS y")
        r = roc_auc(all_neg, "s", "y").first()
        assert (r.n_pos, r.n_neg) == (0, 2) and r.auc is None


class TestPrecisionRecall:
    """PR curve + average precision (operators/stats)."""

    def test_hand_computed_curve_and_ap(self, spark):
        from meta_frame_spark.operators.stats import (
            average_precision,
            precision_recall_curve,
        )

        df = spark.createDataFrame(
            [(0.8, True), (0.6, False), (0.4, True), (0.2, False)],
            "s double, y boolean",
        )
        curve = {r.threshold: r for r in
                 precision_recall_curve(df, "s", "y").collect()}
        assert curve[0.8].tp == 1 and curve[0.8].fp == 0
        assert curve[0.8].precision == 1.0 and curve[0.8].recall == 0.5
        assert curve[0.6].precision == 0.5 and curve[0.6].recall == 0.5
        assert curve[0.4].precision == round(2 / 3, 6)
        assert curve[0.4].recall == 1.0
        assert curve[0.2].tp == 2 and curve[0.2].fp == 2
        # AP = 0.5*1 + 0.5*(2/3) — the sklearn value for this input
        ap = average_precision(df, "s", "y").first()
        assert (ap.n_pos, ap.n_neg) == (2, 2)
        assert ap.average_precision == round(0.5 + 1 / 3, 6)

    def test_tied_scores_group_at_one_threshold(self, spark):
        from meta_frame_spark.operators.stats import (
            average_precision,
            precision_recall_curve,
        )

        df = spark.createDataFrame(
            [(1.0, True), (1.0, False), (0.0, True)], "s double, y boolean"
        )
        curve = {r.threshold: r for r in
                 precision_recall_curve(df, "s", "y").collect()}
        assert len(curve) == 2
        assert curve[1.0].tp == 1 and curve[1.0].fp == 1
        assert curve[0.0].precision == round(2 / 3, 6)
        ap = average_precision(df, "s", "y").first()
        assert ap.average_precision == round(0.5 * 0.5 + 0.5 * 2 / 3, 6)

    def test_no_positives_yields_null(self, spark):
        from meta_frame_spark.operators.stats import (
            average_precision,
            precision_recall_curve,
        )

        df = spark.createDataFrame(
            [(1.0, False), (0.5, False)], "s double, y boolean"
        )
        ap = average_precision(df, "s", "y").first()
        assert ap.n_pos == 0 and ap.average_precision is None
        for r in precision_recall_curve(df, "s", "y").collect():
            assert r.recall is None and r.precision == 0.0

    def test_all_positives_ap_is_one(self, spark):
        from meta_frame_spark.operators.stats import average_precision

        df = spark.createDataFrame(
            [(1.0, True), (0.5, True)], "s double, y boolean"
        )
        ap = average_precision(df, "s", "y").first()
        assert ap.n_neg == 0 and ap.average_precision == 1.0

    def test_null_rows_excluded(self, spark):
        from meta_frame_spark.operators.stats import average_precision

        df = spark.createDataFrame(
            [(1.0, True), (None, True), (0.5, None)],
            "s double, y boolean",
        )
        ap = average_precision(df, "s", "y").first()
        assert (ap.n_pos, ap.n_neg) == (1, 0)


class TestMadOutliers:
    """Robust MAD outlier census (operators/stats.mad_outliers_report)."""

    def test_hand_computed_groups(self, spark):
        from meta_frame_spark.operators.stats import mad_outliers_report

        rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 100.0]]
        rows += [("b", v) for v in [1.0, 1.0, 1.0, 1.0, 100.0]]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r.g: r for r in
               mad_outliers_report(df, "v", ["g"], k=3.5).collect()}
        # a: med 3, deviations [2,1,0,1,97], MAD 1 -> only 100 exceeds
        # 3.5 * 1.4826
        assert out["a"].median == 3.0 and out["a"].mad == 1.0
        assert out["a"].n_outliers == 1 and out["a"].n == 5
        assert out["a"].outlier_frac == 0.2
        # b: MAD 0 (majority identical) -> degenerate rule x != median
        assert out["b"].mad == 0.0 and out["b"].n_outliers == 1

    def test_nulls_excluded_and_validation(self, spark):
        import pytest as _pt
        from meta_frame_spark.operators.stats import mad_outliers_report

        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", 2.0)], "g string, v double"
        )
        r = mad_outliers_report(df, "v", ["g"]).collect()[0]
        assert r.n == 2
        with _pt.raises(ValueError):
            mad_outliers_report(df, "v", [])
        with _pt.raises(ValueError):
            mad_outliers_report(df, "v", ["g"], k=0)

    def test_approx_mode_runs(self, spark):
        from meta_frame_spark.operators.stats import mad_outliers_report

        df = spark.createDataFrame(
            [("a", float(i)) for i in range(100)], "g string, v double"
        )
        r = mad_outliers_report(df, "v", ["g"], exact=False).collect()[0]
        assert r.n == 100 and r.median is not None


class TestCalibrationSummary:
    """One-row ECE/MCE/Brier scorecard (stats.calibration_summary)."""

    def test_hand_computed(self, spark):
        from meta_frame_spark.operators.stats import calibration_summary

        # two occupied bins (n_bins=2): bin 1 scores .2/.4 labels 0/1,
        # bin 2 scores .8/.8 labels 1/1
        df = spark.createDataFrame(
            [(0.2, 0), (0.4, 1), (0.8, 1), (0.8, 1)],
            "s double, y int",
        )
        r = calibration_summary(df, "s", "y", n_bins=2).first()
        # bin1 gap |.3-.5|=.2, bin2 gap |.8-1|=.2 -> ece .2, mce .2
        assert r.n == 4 and r.ece == 0.2 and r.mce == 0.2
        brier = (0.2**2 + 0.6**2 + 0.2**2 + 0.2**2) / 4
        assert r.brier == round(brier, 6)

    def test_perfectly_calibrated_perfect_scores(self, spark):
        from meta_frame_spark.operators.stats import calibration_summary

        df = spark.createDataFrame(
            [(0.0, 0), (1.0, 1)], "s double, y int"
        )
        r = calibration_summary(df, "s", "y", n_bins=4).first()
        assert r.ece == 0.0 and r.mce == 0.0 and r.brier == 0.0

    def test_nulls_excluded_and_validation(self, spark):
        import pytest as _pt
        from meta_frame_spark.operators.stats import calibration_summary

        df = spark.createDataFrame(
            [(0.5, 1), (None, 0), (0.5, None)], "s double, y int"
        )
        assert calibration_summary(df, "s", "y").first().n == 1
        with _pt.raises(ValueError):
            calibration_summary(df, "s", "y", n_bins=0)


class TestCategoricalAssociation:
    """MI / NMI / Cramér's V (stats.categorical_association)."""

    def test_perfect_dependence(self, spark):
        import math

        from meta_frame_spark.operators.stats import categorical_association

        df = spark.createDataFrame(
            [("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")],
            "a string, b string",
        )
        r = categorical_association(df, "a", "b").first()
        assert r.n == 4
        assert r.mi == round(math.log(2), 6)
        assert r.nmi == 1.0 and r.cramers_v == 1.0

    def test_independence(self, spark):
        from meta_frame_spark.operators.stats import categorical_association

        df = spark.createDataFrame(
            [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")],
            "a string, b string",
        )
        r = categorical_association(df, "a", "b").first()
        assert r.mi == 0.0 and r.nmi == 0.0 and r.cramers_v == 0.0

    def test_degenerate_sides_yield_null(self, spark):
        from meta_frame_spark.operators.stats import categorical_association

        df = spark.createDataFrame(
            [("x", "p"), ("x", "q")], "a string, b string"
        )
        r = categorical_association(df, "a", "b").first()
        assert r.mi == 0.0
        assert r.nmi is None and r.cramers_v is None

    def test_nulls_excluded(self, spark):
        from meta_frame_spark.operators.stats import categorical_association

        df = spark.createDataFrame(
            [("x", "p"), (None, "q"), ("y", None), ("y", "q")],
            "a string, b string",
        )
        assert categorical_association(df, "a", "b").first().n == 2
