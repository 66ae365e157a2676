"""Blocked fuzzy join: distances, blocking recall bound, collisions."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.linkage import fuzzy_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "goldenrod lace"), (2, "midnight blue"), (3, "rose")],
        ["id", "name"],
    )
    right = spark.createDataFrame(
        [
            (10, "goldenrod lace"),    # exact: distance 0
            (11, "goldenrod lacy"),    # 1 substitution
            (12, "goldenrod laces!"),  # 2 edits
            (13, "midnight bluee"),    # 1 insertion
            (14, "Xidnight blue"),     # 1 edit but block key differs
            (15, "rise"),              # same length, 1 sub, block 'rise'≠'rose'
        ],
        ["id", "name"],
    )
    return left, right


def test_fuzzy_join_distances_and_blocking(spark):
    left, right = _frames(spark)
    out = fuzzy_join(left, right, "name", "name", max_distance=2)
    pairs = {(r.id, r.id_r): r.distance for r in out.collect()}
    assert pairs[(1, 10)] == 0
    assert pairs[(1, 11)] == 1
    assert pairs[(1, 12)] == 2
    assert pairs[(2, 13)] == 1
    # blocking bound: within-distance pairs in different blocks are
    # never compared — the documented recall tradeoff
    assert (2, 14) not in pairs
    assert (3, 15) not in pairs


def test_fuzzy_join_threshold_and_custom_block(spark):
    left, right = _frames(spark)
    tight = fuzzy_join(left, right, "name", "name", max_distance=1)
    assert (1, 12) not in {(r.id, r.id_r) for r in tight.collect()}

    # coarser block key (first char) recovers the 'Xidnight' miss? no —
    # 'X' != 'm'; but a constant block compares everything
    allblk = fuzzy_join(
        left, right, "name", "name", max_distance=1, block=lambda c: F.lit(1)
    )
    assert (2, 14) in {(r.id, r.id_r) for r in allblk.collect()}

    with pytest.raises(ValueError):
        fuzzy_join(left, right, "name", "name", max_distance=-1)


def test_fuzzy_join_no_collision_passthrough(spark):
    left = spark.createDataFrame([(1, "abcd")], ["lid", "lname"])
    right = spark.createDataFrame([(2, "abcde")], ["rid", "rname"])
    out = fuzzy_join(left, right, "lname", "rname", max_distance=1)
    assert out.columns == ["lid", "lname", "rid", "rname", "distance"]
    assert out.collect()[0].distance == 1
