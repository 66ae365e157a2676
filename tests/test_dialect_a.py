"""Dialect A (iterations/levels) — SURVEY.md §2 P1-P3, A1-A8, A10, O1."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark import ConfigError, apply_filters, apply_level, run_pipeline
from meta_frame_spark.config.model import validate_pipeline_config


def test_structured_filters(lineitem):
    out = apply_filters(
        lineitem,
        [
            {"filter_col": "l_quantity", "filter_op": ">", "filter_value": 25},
            {"filter_col": "l_returnflag", "filter_op": "==", "filter_value": "R"},
        ],
    )
    rows = out.select("l_quantity", "l_returnflag").collect()
    assert rows
    assert all(r.l_quantity > 25 and r.l_returnflag == "R" for r in rows)


def test_isin_filter(lineitem):
    out = apply_filters(
        lineitem, [{"filter_col": "l_linestatus", "filter_op": "isin", "filter_value": ["O"]}]
    )
    assert out.select("l_linestatus").distinct().collect()[0][0] == "O"


def test_unknown_filter_op_raises(lineitem):
    with pytest.raises(ConfigError):
        apply_filters(lineitem, [{"filter_col": "l_quantity", "filter_op": "~", "filter_value": 1}])


def test_unknown_agg_func_raises():
    with pytest.raises(ConfigError):
        validate_pipeline_config(
            {
                "iterations": [
                    {
                        "id": "x",
                        "level_1": {
                            "group_by": ["a"],
                            "aggregations": [{"agg_col": "b", "agg_func": "frobnicate"}],
                        },
                    }
                ]
            }
        )


def test_single_level_agg(lineitem):
    out = apply_level(
        lineitem,
        {
            "group_by": ["l_returnflag", "l_linestatus"],
            "aggregations": [
                {"agg_col": "l_quantity", "agg_func": "sum", "new_name": "sum_qty"},
                {"agg_col": "l_extendedprice", "agg_func": "avg", "new_name": "avg_price"},
            ],
        },
    )
    assert set(out.columns) == {"l_returnflag", "l_linestatus", "sum_qty", "avg_price"}
    expected = (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("s"))
        .collect()
    )
    got = {(r.l_returnflag, r.l_linestatus): r.sum_qty for r in out.collect()}
    for r in expected:
        assert abs(got[(r.l_returnflag, r.l_linestatus)] - r.s) < 1e-6


def test_two_level_cascade(lineitem):
    """level_2 re-aggregates level_1's output (A8, optimus.py:43-46)."""
    config = {
        "iterations": [
            {
                "id": "it1",
                "level_1": {
                    "group_by": ["l_returnflag", "l_linestatus"],
                    "aggregations": [
                        {"agg_col": "l_quantity", "agg_func": "sum", "new_name": "sum_qty"}
                    ],
                    "filters": [
                        {"filter_col": "l_quantity", "filter_op": "<", "filter_value": 100}
                    ],
                },
                "level_2": {
                    "group_by": ["l_returnflag"],
                    "aggregations": [
                        {"agg_col": "sum_qty", "agg_func": "max", "new_name": "max_sum_qty"}
                    ],
                },
            }
        ]
    }
    results = run_pipeline(lineitem, config)
    out = results["it1"]
    assert set(out.columns) == {"l_returnflag", "max_sum_qty"}
    assert out.count() == lineitem.select("l_returnflag").distinct().count()


def test_iterations_independent_by_default(lineitem):
    """Iteration 2 starts from the source df, not iteration 1's output
    (fixes the carried-state bug, optimus.py:41-46)."""
    config = {
        "iterations": [
            {
                "id": "a",
                "level_1": {
                    "group_by": ["l_returnflag"],
                    "aggregations": [{"agg_col": "l_quantity", "agg_func": "sum", "new_name": "s"}],
                },
            },
            {
                "id": "b",
                "level_1": {
                    "group_by": ["l_linestatus"],
                    "aggregations": [{"agg_col": "l_quantity", "agg_func": "sum", "new_name": "s"}],
                },
            },
        ]
    }
    results = run_pipeline(lineitem, config)
    assert "l_linestatus" in results["b"].columns  # would fail if chained


def test_keep_columns_first_mode(customer):
    out = apply_level(
        customer,
        {
            "group_by": ["c_custkey"],
            "keep_columns": ["c_name"],
            "aggregations": [{"agg_col": "c_acctbal", "agg_func": "sum", "new_name": "bal"}],
        },
    )
    assert set(out.columns) == {"c_custkey", "bal", "c_name"}
    assert out.count() == customer.count()


def test_keep_columns_group_mode(lineitem):
    out = apply_level(
        lineitem,
        {
            "group_by": ["l_returnflag"],
            "keep_columns": ["l_linestatus"],
            "keep_mode": "group",
            "aggregations": [{"agg_col": "l_quantity", "agg_func": "sum", "new_name": "s"}],
        },
    )
    assert set(out.columns) == {"l_returnflag", "l_linestatus", "s"}


def test_filtered_aggregation(lineitem):
    """A7: func(CASE WHEN pred THEN col END)."""
    out = apply_level(
        lineitem,
        {
            "group_by": ["l_returnflag"],
            "aggregations": [
                {
                    "agg_col": "l_extendedprice",
                    "agg_func": "avg",
                    "new_name": "avg_big",
                    "where": "l_quantity > 10",
                }
            ],
        },
    ).collect()
    expected = (
        lineitem.filter("l_quantity > 10")
        .groupBy("l_returnflag")
        .agg(F.avg("l_extendedprice").alias("e"))
        .collect()
    )
    exp = {r.l_returnflag: r.e for r in expected}
    for r in out:
        assert abs(r.avg_big - exp[r.l_returnflag]) < 1e-6


def test_derive_columns(lineitem):
    """derive: computed columns available to filters and aggregations,
    later derivations can reference earlier ones."""
    out = apply_level(
        lineitem,
        {
            "derive": {
                "revenue": "l_extendedprice * (1 - l_discount)",
                "revenue_k": "revenue / 1000",
            },
            "filters": [
                {"filter_col": "revenue", "filter_op": ">", "filter_value": 0}
            ],
            "group_by": ["l_returnflag"],
            "aggregations": [
                {"agg_col": "revenue_k", "agg_func": "sum", "new_name": "rev_k"}
            ],
        },
    ).collect()
    expected = (
        lineitem.selectExpr("l_returnflag", "l_extendedprice * (1 - l_discount) / 1000 AS rk")
        .filter("rk > 0")
        .groupBy("l_returnflag")
        .agg(F.sum("rk").alias("rk"))
        .collect()
    )
    exp = {r.l_returnflag: r.rk for r in expected}
    for r in out:
        assert abs(r.rev_k - exp[r.l_returnflag]) < 1e-6


def test_approx_count_distinct_within_bound(orders):
    """approx_count_distinct (HLL, default rsd 5%) lands near exact."""
    out = apply_level(
        orders,
        {
            "group_by": ["o_orderstatus"],
            "aggregations": [
                {"agg_col": "o_custkey", "agg_func": "approx_count_distinct", "new_name": "a"},
                {"agg_col": "o_custkey", "agg_func": "count_distinct", "new_name": "e"},
            ],
        },
    ).collect()
    for r in out:
        assert abs(r.a - r.e) <= max(0.15 * r.e, 2)


def test_derive_supports_window_expressions(lineitem):
    """derive strings go through the full Spark SQL parser, so window
    expressions work in config — no special engine surface needed."""
    out = apply_level(
        lineitem.limit(100),
        {
            "derive": {
                "qty_share": "l_quantity / sum(l_quantity) over (partition by l_returnflag)",
            },
            "group_by": ["l_returnflag"],
            "aggregations": [
                {"agg_col": "qty_share", "agg_func": "sum", "new_name": "total_share"}
            ],
        },
    ).collect()
    for r in out:
        assert abs(r.total_share - 1.0) < 1e-6  # shares sum to 1 per group
