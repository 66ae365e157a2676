"""K-anonymity release gate (operators/privacy.py)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.privacy import (
    k_anonymity_filter,
    k_anonymity_report,
)


def _df(spark):
    rows = [
        # (uid, zip, age) — zip/age are the quasi-identifiers
        (1, "94110", 30), (2, "94110", 30), (3, "94110", 30),
        (4, "10001", 40), (5, "10001", 40),
        (6, "60601", 50),                       # singleton -> suppressed at k=2
        (7, None, 30), (8, None, 30),           # NULL-keyed group of 2
        (9, None, None),                        # NULL-NULL singleton
    ]
    return spark.createDataFrame(rows, "uid int, zip string, age int")


def test_filter_keeps_only_groups_of_k(spark):
    df = _df(spark)
    kept = k_anonymity_filter(df, ["zip", "age"], k=3)
    assert {r.uid for r in kept.collect()} == {1, 2, 3}
    # schema preserved, no helper columns leak
    assert kept.columns == df.columns


def test_filter_and_report_agree_on_nulls(spark):
    """ADVICE r5 (privacy.py:37): NULL quasi values group together in
    BOTH the report and the filter — the (None, 30) pair of rows is
    releasable at k=2, the (None, None) singleton is not."""
    df = _df(spark)
    kept = k_anonymity_filter(df, ["zip", "age"], k=2)
    ids = {r.uid for r in kept.collect()}
    assert {7, 8} <= ids and 9 not in ids and 6 not in ids
    rep = k_anonymity_report(df, ["zip", "age"], k=2).collect()[0]
    assert rep.n_rows == 9
    assert rep.suppressed_rows == 9 - len(ids)
    assert rep.violating_groups == 2  # the two singletons
    # the filter's kept count is exactly n_rows - suppressed_rows
    assert kept.count() == rep.n_rows - rep.suppressed_rows


def test_report_shape_and_frac(spark):
    df = _df(spark)
    rep = k_anonymity_report(df, ["zip"], k=3).collect()[0]
    # zip groups: 94110 x3, 10001 x2, 60601 x1, NULL x3
    assert (rep.n_groups, rep.violating_groups) == (4, 2)
    assert rep.suppressed_rows == 3
    assert abs(rep.suppressed_frac - round(3 / 9, 6)) < 1e-12  # frac is ROUND(,6)
    assert rep.k == 3


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        k_anonymity_filter(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["zip"], k=0)


def test_k1_is_identity(spark):
    df = _df(spark)
    assert k_anonymity_filter(df, ["zip", "age"], k=1).count() == df.count()
