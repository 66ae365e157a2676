"""Corpus snapshot diff: statuses exact, hash-only shuffle shape."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.snapshot import diff_corpora, diff_summary


def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z"), (4, None, "w")],
        ["id", "t1", "t2"],
    )
    new = spark.createDataFrame(
        [
            (1, "a", "x"),      # unchanged
            (2, "B", "y"),      # changed (t1)
            (4, None, "w"),     # unchanged incl. null content
            (5, "e", "v"),      # added
        ],                       # 3 removed
        ["id", "t1", "t2"],
    )
    return old, new


def test_diff_statuses_exact(spark):
    old, new = _snapshots(spark)
    got = {
        r.id: r.status
        for r in diff_corpora(old, new, "id", ["t1", "t2"]).collect()
    }
    assert got == {
        1: "unchanged", 2: "changed", 3: "removed", 4: "unchanged", 5: "added"
    }
    summary = {
        r.status: r.n_docs
        for r in diff_summary(old, new, "id", ["t1", "t2"]).collect()
    }
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}

    # null vs empty-string content must differ
    old2 = spark.createDataFrame([(1, None)], "id long, t string")
    new2 = spark.createDataFrame([(1, "")], "id long, t string")
    assert diff_corpora(old2, new2, "id", ["t"]).collect()[0].status == "changed"

    with pytest.raises(ValueError):
        diff_corpora(old, new, "id", [])


def test_diff_shuffles_hashes_not_content(spark):
    """The join input must be the (id, hash) projection — document
    text must not appear below the join in the optimized plan."""
    old, new = _snapshots(spark)
    out = diff_corpora(old, new, "id", ["t1", "t2"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    join_part = plan[plan.index("Join") :]
    assert "xxhash64" in join_part
    # the content columns feed the hash projection, not the join output
    first_line = plan.splitlines()[0]
    assert "t1" not in first_line and "t2" not in first_line
