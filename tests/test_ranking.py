"""Ranking / rollup / cube operators (meta_frame_spark.operators.ranking)."""

from pyspark.sql import functions as F

from meta_frame_spark.operators.ranking import (
    cube_aggregate,
    rollup_aggregate,
    top_k_per_group,
)


def test_top_k_per_group_values(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id int, v double",
    )
    got = sorted(
        (r.g, r.id, r.rank)
        for r in top_k_per_group(df, ["g"], "v", k=2, tiebreak="id").collect()
    )
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1)]


def test_top_k_pushdown_in_plan(spark, orders):
    out = top_k_per_group(orders, ["o_orderstatus"], "o_totalprice", k=3, tiebreak="o_orderkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Spark's rank-limit pushdown: map-side WindowGroupLimit caps rows
    # per group before the shuffle
    assert "WindowGroupLimit" in plan


def test_rollup_grain_counts(spark, lineitem):
    out = rollup_aggregate(
        lineitem, ["l_returnflag", "l_linestatus"], {"l_quantity": "sum"}
    ).collect()
    n_pairs = lineitem.select("l_returnflag", "l_linestatus").distinct().count()
    n_flags = lineitem.select("l_returnflag").distinct().count()
    assert len(out) == n_pairs + n_flags + 1  # pairs + per-flag + grand total
    grand = [r for r in out if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    total = lineitem.agg(F.sum("l_quantity")).first()[0]
    assert abs(grand[0].sum_l_quantity - total) < 1e-6


def test_cube_has_all_grains(spark, orders):
    out = cube_aggregate(orders, ["o_orderstatus", "o_orderpriority"], {"o_totalprice": "sum"})
    rows = out.collect()
    grains = {(r.o_orderstatus is None, r.o_orderpriority is None) for r in rows}
    assert grains == {(False, False), (False, True), (True, False), (True, True)}
