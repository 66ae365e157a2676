"""Bloom-filter membership probes."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.bloom import bloom_build, bloom_probe


@pytest.fixture(scope="module")
def member_df(spark):
    return spark.createDataFrame([(f"m{i}",) for i in range(200)], "val string")


@pytest.fixture(scope="module")
def bloom(member_df):
    return bloom_build(member_df, "val", n_bits=1 << 16, k=5)


def test_no_false_negatives(spark, member_df, bloom):
    out = bloom_probe(member_df, "val", bloom, n_bits=1 << 16, k=5)
    assert out.filter(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_bounded(spark, bloom):
    others = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "val string")
    fp = (
        bloom_probe(others, "val", bloom, n_bits=1 << 16, k=5)
        .filter("maybe_member")
        .count()
    )
    # 200 members in 65536 bits, k=5: theoretical fp ~ 2e-9; allow slack
    assert fp / 2000 <= 0.01, fp


def test_filter_size_is_constant(member_df):
    assert len(bloom_build(member_df, "val", n_bits=1 << 16, k=5)) == (1 << 16) // 8


def test_param_validation(spark, member_df, bloom):
    with pytest.raises(ValueError):
        bloom_build(member_df, "val", n_bits=100)
    with pytest.raises(ValueError):
        bloom_build(member_df, "val", k=0)
    with pytest.raises(ValueError):
        bloom_probe(member_df, "val", bloom, n_bits=1 << 20)
