"""Contiguous row numbering: gaplessness, order, stability, scale shape."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.ids import assign_row_numbers


def test_row_numbers_contiguous_and_ordered(spark, orders):
    out = assign_row_numbers(orders, ["o_orderkey"], id_col="rid")
    rows = out.select("rid", "o_orderkey").collect()
    n = len(rows)
    assert sorted(r.rid for r in rows) == list(range(n))
    by_rid = sorted(rows, key=lambda r: r.rid)
    keys = [r.o_orderkey for r in by_rid]
    assert keys == sorted(keys)


def test_row_numbers_partitioning_independent(spark, orders):
    a = assign_row_numbers(orders, ["o_orderkey"], id_col="rid")
    b = assign_row_numbers(orders.repartition(13), ["o_orderkey"], id_col="rid")
    ga = {r.o_orderkey: r.rid for r in a.select("o_orderkey", "rid").collect()}
    gb = {r.o_orderkey: r.rid for r in b.select("o_orderkey", "rid").collect()}
    assert ga == gb


def test_row_numbers_start_and_empty(spark, orders):
    out = assign_row_numbers(
        orders.limit(5), ["o_orderkey"], id_col="rid", start=1000
    )
    assert sorted(r.rid for r in out.collect()) == [1000, 1001, 1002, 1003, 1004]

    empty = orders.filter(F.lit(False))
    assert assign_row_numbers(empty, ["o_orderkey"]).count() == 0

    with pytest.raises(ValueError):
        assign_row_numbers(orders, [])


def test_row_numbers_leave_no_cache_entry(spark, orders):
    """Regression: the ranged intermediate used persist(), parking an
    entry in the CacheManager that nothing ever unpersisted — a leak in
    long-running sessions. localCheckpoint blocks are GC-managed and
    never enter the CacheManager, so it must stay empty."""
    spark.catalog.clearCache()
    out = assign_row_numbers(orders, ["o_orderkey"], id_col="rid")
    out.count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_row_numbers_no_single_partition_window(spark, orders):
    """The scale property itself: the physical plan must not contain a
    global (empty partitionBy) window — the window spec must key on the
    partition id so work stays parallel."""
    out = assign_row_numbers(orders, ["o_orderkey"], id_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__mfs_pid" in plan
    # a global window prints as "Window [...], [o_orderkey ASC...]" with
    # no partition spec; ours always carries the pid partition spec
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__mfs_pid" in line
