"""Dialects B and B' (join trees, nested aggregate) — SURVEY.md §2
P4, A5-A7, A9, J1-J3, C1-C2, O2-O3."""

from pyspark.sql import functions as F

from meta_frame_spark import aggregate_and_join, nested_aggregate


def test_string_filters_and_multi_agg(lineitem):
    config = {
        "unique_id": "parent",
        "filters": ["l_quantity > 5", "l_linestatus = 'O'"],
        "aggregation": {
            "group_by": ["l_returnflag"],
            "aggregations": {"l_extendedprice": ["sum", "max", "min"]},
        },
    }
    out = aggregate_and_join(lineitem, config)
    assert set(out.columns) == {
        "l_returnflag", "sum_l_extendedprice", "max_l_extendedprice", "min_l_extendedprice",
    }


def test_rename_accepts_both_key_forms(lineitem):
    config = {
        "unique_id": "parent",
        "aggregation": {
            "group_by": ["l_returnflag"],
            "aggregations": {"l_quantity": ["sum", "max"]},
            "rename": {
                "sum(l_quantity)": "total_qty",   # reference engine-name form (sparks/optimus.py:69)
                "max_l_quantity": "peak_qty",     # deterministic form
            },
        },
    }
    out = aggregate_and_join(lineitem, config)
    assert set(out.columns) == {"l_returnflag", "total_qty", "peak_qty"}


def test_join_tree_recursive(spark, orders, customer, sf_dir):
    """orders agg by custkey, joined with customer (which joined nation)."""
    config = {
        "unique_id": "root",
        "aggregation": {
            "group_by": ["o_custkey"],
            "aggregations": {"o_totalprice": "sum"},
            "rename": {"sum_o_totalprice": "total_spend"},
        },
        "children": [
            {
                "unique_id": "cust",
                "data_path": f"{sf_dir}/customer.parquet",
                "join": {"on": "o_custkey", "how": "inner"},
                "keep_columns": ["o_custkey", "c_custkey", "c_name", "c_nationkey"],
                "children": [
                    {
                        "unique_id": "nation",
                        "data_path": f"{sf_dir}/nation.parquet",
                        "join": {"on": "c_nationkey", "how": "left"},
                        "broadcast": True,
                    }
                ],
            }
        ],
    }

    def loader(spark_, child):
        df = spark_.read.parquet(child.data_path)
        if child.node.unique_id == "cust":
            df = df.withColumnRenamed("c_custkey", "o_custkey") \
                   .withColumn("c_custkey", F.col("o_custkey"))
        if child.node.unique_id == "nation":
            df = df.withColumnRenamed("n_nationkey", "c_nationkey")
        return df

    out = aggregate_and_join(orders.limit(500), config, loader=loader)
    assert "total_spend" in out.columns and "n_name" in out.columns
    assert out.count() > 0


def test_nested_aggregate_filtered_agg_and_prefix(lineitem):
    meta = {
        "id": "root",
        "group_by": ["l_returnflag"],
        "aggregate": {
            "l_quantity": "sum",
            "l_extendedprice": {"filter": "l_quantity > 10", "function": "avg"},
        },
        "rename": {"l_quantity": "total_qty", "l_extendedprice": "avg_price_gt10"},
        "filter": ["l_linestatus != 'X'"],
        "children": [
            {
                "id": "by_status",
                "link": ["l_returnflag"],
                "group_by": ["l_returnflag"],
                "aggregate": {"l_orderkey": "count"},
                "rename": {"l_orderkey": "n_lines"},
            }
        ],
    }
    out = nested_aggregate(lineitem, meta, bitemporal=True)
    cols = set(out.columns)
    assert {"l_returnflag", "total_qty", "avg_price_gt10", "root_n_lines",
            "valid_from", "valid_to"} <= cols
    row = out.limit(1).collect()[0]
    assert str(row.valid_from) == "2024-01-01"
    assert str(row.valid_to) == "9999-12-31"
    # bitemporal columns are real dates, not strings (fixes soundwave.py:77-78)
    assert dict(out.dtypes)["valid_from"] == "date"


def test_nested_aggregate_leaf_tags_id(lineitem):
    out = nested_aggregate(lineitem.limit(10), {"id": "leaf1"})
    assert out.select("id").distinct().collect()[0][0] == "leaf1"


def test_nested_child_without_link_raises(lineitem):
    """A child with no 'link' would cartesian-join its parent — the
    reference's degenerate no-key join (soundwave.py:66). That's almost
    always a config typo, so the builder raises unless the child opts
    in with allow_cross (same loud-failure policy as unknown ops)."""
    import pytest

    from meta_frame_spark.config.model import ConfigError

    meta = {
        "id": "root",
        "group_by": ["l_returnflag"],
        "aggregate": {"l_quantity": "sum"},
        "children": [
            {"id": "tot", "aggregate": {"l_extendedprice": "sum"},
             "group_by": []},
        ],
    }
    with pytest.raises(ConfigError, match="allow_cross"):
        nested_aggregate(lineitem, meta).collect()
    # explicit opt-in keeps the reference-faithful behavior: a 1-row
    # global aggregate child broadcast-crosses onto every parent row
    meta["children"][0]["allow_cross"] = True
    out = nested_aggregate(lineitem, meta)
    assert "root_sum_l_extendedprice" in out.columns
    assert out.count() == lineitem.select("l_returnflag").distinct().count()


def test_child_grain_not_polluted_by_grandchild_link(spark):
    """A child's aggregates keep the child's declared grain even when a
    grandchild links on a different column — grandchild results arrive
    via the input bridge, never by silently widening the group_by."""
    df = spark.createDataFrame(
        [
            # one link value p spanning two grandchild-link values q, r
            ("a", "p", 1, "q", 10.0),
            ("a", "p", 2, "q", 20.0),
            ("a", "p", 3, "r", 30.0),
        ],
        "col1 string, col5 string, col6 int, col7 string, col8 double",
    )
    meta = {
        "id": "root",
        "group_by": ["col1"],
        "aggregate": {"col6": "sum"},
        "rename": {"col6": "sum6"},
        "children": [
            {
                "id": "c",
                "link": ["col5"],
                "aggregate": {"col6": "count"},
                "rename": {"col6": "n6"},
                "children": [
                    {
                        "id": "g",
                        "link": ["col7"],
                        "aggregate": {"col8": "min"},
                        "rename": {"col8": "min8"},
                    }
                ],
            }
        ],
    }
    out = nested_aggregate(df, meta).collect()
    # child count is at col5 grain: count(p) == 3 on every row
    assert all(r.root_n6 == 3 for r in out)
    # bridge fan-out: one row per (col5, col7) pair => two rows,
    # grandchild min at col7 grain
    got = sorted((r.root_c_min8) for r in out)
    assert got == [10.0, 30.0]


def test_bridge_join_with_overlapping_link_keys(spark):
    """Child link sharing a column with the parent grain must not
    produce ambiguous-column errors in the bridge."""
    df = spark.createDataFrame(
        [("a", "p", 1.0), ("a", "q", 2.0), ("b", "p", 4.0)],
        "col1 string, col5 string, v double",
    )
    meta = {
        "id": "root",
        "group_by": ["col1"],
        "aggregate": {"v": "sum"},
        "rename": {"v": "sv"},
        "children": [
            {
                "id": "c",
                "link": ["col1", "col5"],
                "aggregate": {"v": "max"},
                "rename": {"v": "mv"},
            }
        ],
    }
    out = nested_aggregate(df, meta)
    rows = sorted((r.col1, r.col5, r.sv, r.root_mv) for r in out.collect())
    assert rows == [("a", "p", 3.0, 1.0), ("a", "q", 3.0, 2.0), ("b", "p", 4.0, 4.0)]
