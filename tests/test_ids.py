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


def test_running_total_exact_and_partition_invariant(spark):
    """The two-phase prefix sum equals the sequential cumulative sum
    exactly (integer-valued doubles), under any input partitioning
    and any range-partition count."""
    import pytest

    from meta_frame_spark.operators.ids import running_total

    rows = [(i, float((i * 7) % 13) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r.id: r.running_total for r in running_total(df, ["id"], "v").collect()}
    acc = 0.0
    for i in range(500):
        acc += (i * 7) % 13 + 1
        assert got[i] == acc
    got2 = {
        r.id: r.running_total
        for r in running_total(
            df.repartition(17), ["id"], "v", num_partitions=7
        ).collect()
    }
    assert got == got2
    # nulls count as zero, not poison
    withnull = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 5.0)], "id long, v double"
    )
    out = {r.id: r.running_total
           for r in running_total(withnull, ["id"], "v").collect()}
    assert out == {1: 2.0, 2: 2.0, 3: 7.0}
    with pytest.raises(ValueError, match="already exists"):
        running_total(df.withColumn("running_total", df.v), ["id"], "v")
    with pytest.raises(ValueError, match="at least one"):
        running_total(df, [], "v")


def test_running_total_plan_has_no_single_partition_exchange(spark):
    from meta_frame_spark.operators.ids import running_total

    df = spark.range(10_000).withColumn("v", (F.col("id") % 7).cast("double"))
    plan = (
        running_total(df, ["id"], "v")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_budget_select_prefix_and_budget_contract(spark):
    """budget_select keeps exactly the longest order-prefix whose
    inclusive cost stays within budget — never crosses, never skips."""
    from meta_frame_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(i, 10.0) for i in range(100)], "id long, v double"
    )
    kept = budget_select(df, "v", 255.0, ["id"]).collect()
    ids = sorted(r.id for r in kept)
    assert ids == list(range(25))  # 25 * 10 = 250 <= 255 < 260
    assert max(r.cum_cost for r in kept) == 250.0
    # zero budget -> empty, negative raises
    assert budget_select(df, "v", 0.0, ["id"]).count() == 0
    import pytest

    with pytest.raises(ValueError, match="budget"):
        budget_select(df, "v", -1.0, ["id"])


def test_budget_select_per_group_budgets(spark):
    """group_cols applies the same budget independently per group —
    the balanced variant — via a partitioned window (no two-phase)."""
    from meta_frame_spark.operators.sampling import budget_select

    rows = [(i, "g%d" % (i % 2), 10.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    kept = budget_select(df, "v", 35.0, ["id"], group_cols=["g"]).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r.g, []).append(r)
    assert set(by_g) == {"g0", "g1"}
    for g, v in by_g.items():
        assert len(v) == 3  # 3 * 10 = 30 <= 35 < 40, per group
        assert max(r.cum_cost for r in v) == 30.0
        # each group keeps its own order-prefix
        ids = sorted(r.id for r in v)
        assert all(r.g == g for r in v)
    # partition invariance
    kept2 = budget_select(
        df.repartition(13), "v", 35.0, ["id"], group_cols=["g"]
    ).collect()
    assert sorted(map(tuple, kept)) == sorted(map(tuple, kept2))
