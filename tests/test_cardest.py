"""Join-cardinality estimation."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.cardest import join_cardinality_estimate


def test_unbiased_on_skewed_keys(spark):
    """A hot key (1000 rows) either survives the key sample with its
    full n^2 contribution or is absent — never partially counted; on
    this fixture every key class is represented so the estimate stays
    within 2x either way."""
    rows = [(1,)] * 100 + [(k,) for k in range(2, 200) for _ in range(5)]
    df = spark.createDataFrame(rows, "k long")
    exact = df.alias("a").join(df.alias("b"), "k").count()
    est = join_cardinality_estimate(df, df, "k", rate_denom=4).collect()[0]
    assert est.n_sampled_keys > 0
    assert 0.2 <= est.est_rows / exact <= 5.0, (est.est_rows, exact)


def test_deterministic(spark):
    df = spark.createDataFrame([(k % 17,) for k in range(300)], "k long")
    a = join_cardinality_estimate(df, df, "k").collect()[0]
    b = join_cardinality_estimate(df, df, "k").collect()[0]
    assert (a.est_rows, a.n_sampled_keys) == (b.est_rows, b.n_sampled_keys)


def test_disjoint_sides_estimate_zero(spark):
    l = spark.createDataFrame([(1,), (2,)], "k long")
    r = spark.createDataFrame([(3,), (4,)], "k long")
    row = join_cardinality_estimate(l, r, "k", rate_denom=1).collect()[0]
    assert row.est_rows == 0 and row.n_sampled_keys == 0


def test_rate_one_is_exact(spark):
    """rate_denom=1 samples every key: the estimate IS the exact size."""
    l = spark.createDataFrame([(k % 7,) for k in range(50)], "k long")
    r = spark.createDataFrame([(k % 5,) for k in range(30)], "k long")
    exact = l.join(r, "k").count()
    row = join_cardinality_estimate(l, r, "k", rate_denom=1).collect()[0]
    assert row.est_rows == exact


def test_bad_rate(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        join_cardinality_estimate(df, df, "k", rate_denom=0)
