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


def test_sorted_neighborhood_pairs_exact_window(spark):
    """Keys sort as b1<b2<b3<z9: window 3 pairs each row with the next
    <=2 in sort order — exactly 5 pairs, gaps correct, no (b1,z9)."""
    from meta_frame_spark.operators.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(10, "b2"), (20, "z9"), (30, "b1"), (40, "b3")], ["rid", "name"]
    )
    out = sorted_neighborhood_pairs(df, "name", "rid", window=3)
    got = {(r.key_a, r.key_b, r.idx_gap) for r in out.collect()}
    assert got == {
        ("b1", "b2", 1), ("b1", "b3", 2),
        ("b2", "b3", 1), ("b2", "z9", 2),
        ("b3", "z9", 1),
    }
    # linear candidate count: (w-1)*N - C(w,2) on N >= w
    assert out.count() == 2 * 4 - 3

    import pytest

    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "name", "rid", window=1)


def test_sorted_neighborhood_catches_first_char_typo(spark):
    """The motivating case prefix blocking misses: 'mith' (dropped
    first char of 'smith') sorts away from 'smith', but 'smyth'
    stays adjacent — the neighborhood pairs (smith, smyth) while a
    first-2-chars prefix block would not pair (mith, smith) either
    way; union of passes over different key orderings covers both."""
    from meta_frame_spark.operators.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "mith"), (4, "aaaa"), (5, "zzzz")],
        ["rid", "name"],
    )
    pairs = {(r.key_a, r.key_b) for r in sorted_neighborhood_pairs(
        df, "name", "rid", window=2).collect()}
    assert ("smith", "smyth") in pairs


def test_sorted_neighborhood_deterministic_under_partitioning(spark):
    from meta_frame_spark.operators.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(i, f"k{(i * 17) % 23:02d}") for i in range(40)], ["rid", "name"]
    )
    a = {tuple(r) for r in sorted_neighborhood_pairs(
        df, "name", "rid", window=4).collect()}
    b = {tuple(r) for r in sorted_neighborhood_pairs(
        df.repartition(7), "name", "rid", window=4, num_partitions=3
    ).collect()}
    assert a == b and len(a) == 3 * 40 - 6
