"""Count-min sketch: build / merge / lookup guarantees."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.cms import cms_build, cms_lookup, cms_merge


@pytest.fixture(scope="module")
def stream(spark):
    # value v{i} occurs (i + 1) * 3 times, i in 0..39 — skewed exact counts
    rows = [(f"v{i}",) for i in range(40) for _ in range((i + 1) * 3)]
    return spark.createDataFrame(rows, "val string")


@pytest.fixture(scope="module")
def exact(stream):
    return {
        r.val: r.n
        for r in stream.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _estimates(sketch, stream, depth, width):
    keys = stream.select("val").distinct()
    out = cms_lookup(sketch, keys, "val", depth=depth, width=width)
    return {r.val: r.cms_est for r in out.collect()}


def test_wide_sketch_is_exact(spark, stream, exact):
    """width >> n_distinct: no collisions, estimates equal exact counts."""
    est = _estimates(cms_build(stream, "val", depth=4, width=8192), stream, 4, 8192)
    assert est == exact


def test_narrow_sketch_never_undercounts(spark, stream, exact):
    """Forced collisions (width=8 for 40 keys): the one-sided bound —
    every estimate >= the true count, and total mass is conserved per
    sketch row."""
    sk = cms_build(stream, "val", depth=3, width=8)
    est = _estimates(sk, stream, 3, 8)
    n_total = sum(exact.values())
    for v, e in exact.items():
        assert est[v] >= e, (v, est[v], e)
        assert est[v] <= n_total  # cannot exceed the whole stream
    # each of the depth rows holds the full stream mass exactly once
    per_row = {r.row: r.s for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: n_total, 1: n_total, 2: n_total}


def test_merge_equals_whole(spark, stream):
    """cms_merge(halves) is cell-for-cell identical to one build over
    the full stream — the incremental-corpus contract."""
    left = stream.filter(F.crc32("val") % 2 == 0)
    right = stream.filter(F.crc32("val") % 2 == 1)
    merged = cms_merge(
        cms_build(left, "val", depth=4, width=64),
        cms_build(right, "val", depth=4, width=64),
    )
    whole = cms_build(stream, "val", depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_weighted_build(spark):
    """weight_col: each occurrence contributes its weight."""
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "val string, w int"
    )
    sk = cms_build(df, "val", depth=2, width=1024, weight_col="w")
    est = _estimates(sk, df, 2, 1024)
    assert est == {"a": 12, "b": 1}


def test_absent_key_estimates_zero_or_collision(spark, stream):
    """A key never inserted estimates 0 on a wide sketch (all its cells
    empty -> coalesce path), and lookup keeps the keys frame's rows."""
    sk = cms_build(stream, "val", depth=4, width=8192)
    keys = stream.sparkSession.createDataFrame([("nope",)], "val string")
    out = cms_lookup(sk, keys, "val", depth=4, width=8192).collect()
    assert len(out) == 1 and out[0].cms_est == 0


def test_bad_params_raise(spark, stream):
    with pytest.raises(ValueError):
        cms_build(stream, "val", depth=0)
    with pytest.raises(ValueError):
        cms_merge()
