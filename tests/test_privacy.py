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


def test_l_diversity_hand_case(spark):
    import math

    from meta_frame_spark.operators.privacy import l_diversity_report

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
         ("b", "x"), ("b", "x"), ("b", "x")],
        "qid string, sens string",
    )
    out = {r.qid: r for r in
           l_diversity_report(df, ["qid"], "sens", l=2).collect()}
    # group a: 2 values, entropy ln 2 — passes both at l=2
    assert out["a"].n_rows == 4 and out["a"].n_sensitive == 2
    assert out["a"].entropy == round(math.log(2), 6)
    assert out["a"].distinct_ok and out["a"].entropy_ok
    # group b: homogeneous — entropy 0, fails both
    assert out["b"].n_sensitive == 1 and out["b"].entropy == 0.0
    assert not out["b"].distinct_ok and not out["b"].entropy_ok


def test_l_diversity_null_sensitive_is_a_category(spark):
    from meta_frame_spark.operators.privacy import l_diversity_report

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", None)], "qid string, sens string"
    )
    r = l_diversity_report(df, ["qid"], "sens", l=2).collect()[0]
    assert r.n_sensitive == 2 and r.distinct_ok


def test_t_closeness_hand_case(spark):
    from meta_frame_spark.operators.privacy import t_closeness_report

    # global: x 3/4, y 1/4; both groups sit at TV distance 0.25
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "x")],
        "qid string, sens string",
    )
    out = {r.qid: r for r in
           t_closeness_report(df, ["qid"], "sens", t=0.3).collect()}
    assert out["a"].distance == 0.25 and out["a"].close_ok
    assert out["b"].distance == 0.25 and out["b"].close_ok
    tight = {r.qid: r for r in
             t_closeness_report(df, ["qid"], "sens", t=0.2).collect()}
    assert not tight["a"].close_ok and not tight["b"].close_ok


def test_t_closeness_absent_value_counts_full_mass(spark):
    from meta_frame_spark.operators.privacy import t_closeness_report

    # group b never sees y: |1 - 5/6| + |0 - 1/6| = 1/3 -> distance 1/6
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"),
         ("b", "x"), ("b", "x")],
        "qid string, sens string",
    )
    out = {r.qid: r for r in
           t_closeness_report(df, ["qid"], "sens", t=0.5).collect()}
    assert out["b"].distance == round(1 / 6, 6)


def test_l_diversity_and_t_closeness_validation(spark):
    from meta_frame_spark.operators.privacy import (
        l_diversity_report,
        t_closeness_report,
    )

    df = spark.createDataFrame([("a", "x")], "qid string, sens string")
    with pytest.raises(ValueError):
        l_diversity_report(df, [], "sens")
    with pytest.raises(ValueError):
        l_diversity_report(df, ["qid"], "sens", l=0)
    with pytest.raises(ValueError):
        t_closeness_report(df, ["qid"], "sens", t=0.0)
    with pytest.raises(ValueError):
        t_closeness_report(df, [], "sens")
