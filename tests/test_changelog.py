"""Changelog compaction / upsert (operators/changelog.py)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.changelog import apply_changelog, latest_by_key


def test_latest_by_key_picks_greatest_version(spark):
    df = spark.createDataFrame(
        [
            ("k1", 1, "old"),
            ("k1", 3, "new"),
            ("k1", 2, "mid"),
            ("k2", 1, "only"),
        ],
        "k string, v int, payload string",
    )
    got = {r.k: r.payload for r in latest_by_key(df, ["k"], "v").collect()}
    assert got == {"k1": "new", "k2": "only"}


def test_latest_by_key_tiebreak_is_total(spark):
    df = spark.createDataFrame(
        [("k1", 1, "a"), ("k1", 1, "b")], "k string, v int, src string"
    )
    out = latest_by_key(df, ["k"], "v", tiebreak="src")
    assert [r.src for r in out.collect()] == ["b"]  # greatest tiebreak wins


def test_apply_changelog_upsert_insert_delete(spark):
    snap = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], "k string, val string"
    )
    chg = spark.createDataFrame(
        [
            ("k1", "v1b", 1, "U"),   # update
            ("k2", None, 1, "D"),    # delete
            ("k4", "v4", 1, "U"),    # insert
            ("k4", "v4b", 2, "U"),   # later update of the insert
        ],
        "k string, val string, seq int, op string",
    )
    got = {
        r.k: r.val
        for r in apply_changelog(snap, chg, ["k"], "seq", op_col="op").collect()
    }
    assert got == {"k1": "v1b", "k3": "v3", "k4": "v4b"}


def test_apply_changelog_without_deletes(spark):
    snap = spark.createDataFrame([("k1", 10)], "k string, val int")
    chg = spark.createDataFrame([("k1", 20, 5)], "k string, val int, seq int")
    got = apply_changelog(snap, chg, ["k"], "seq").collect()
    assert len(got) == 1 and got[0].val == 20
