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
