"""The reference's own example configs, verbatim shapes, must validate
and execute (SURVEY.md §5 item 2). Column names and config keys match
the reference examples exactly:

* dialect A — /root/reference/Optimus/optimus.py:54-80
* dialect B — /root/reference/sparks/optimus.py:53-76
* dialect B' — /root/reference/Optimus/hotrod.py:83-113
"""

from pyspark.sql import functions as F

from meta_frame_spark.plans.builder import (
    aggregate_and_join,
    nested_aggregate,
    run_pipeline,
)


def test_optimus_example_config(spark):
    """optimus.py:54-80, verbatim: group_by+keep_columns+aggregations+
    filters. keep_columns resolves to first() pass-through (the
    documented intent; the reference's literal select crashed)."""
    df = spark.createDataFrame(
        [
            ("a", "x", "k1", 10.0, 150),
            ("a", "x", "k1", 20.0, 200),
            ("a", "y", "k2", 5.0, 50),   # filtered out (column5 <= 100)
            ("b", "x", "k3", 7.0, 101),
        ],
        "column1 string, column2 string, column3 string, column4 double, column5 int",
    )
    metadata = {
        "iterations": [
            {
                "id": "iteration_1",
                "level_1": {
                    "group_by": ["column1", "column2"],
                    "keep_columns": ["column3"],
                    "aggregations": [
                        {"agg_col": "column4", "agg_func": "sum", "new_name": "sum_column4"}
                    ],
                    "filters": [
                        {"filter_col": "column5", "filter_op": ">", "filter_value": 100}
                    ],
                },
            }
        ]
    }
    out = run_pipeline(df, metadata)["iteration_1"]
    rows = {(r.column1, r.column2): (r.sum_column4, r.column3) for r in out.collect()}
    assert rows == {("a", "x"): (30.0, "k1"), ("b", "x"): (7.0, "k3")}


def test_sparks_optimus_example_config(spark, tmp_path):
    """sparks/optimus.py:53-76, verbatim: live-Column filters, save
    leaf, multi-func aggregations with the reference's engine-generated
    rename keys ('sum(column2)')."""
    from pyspark.sql.functions import col

    from meta_frame_spark.sources.sinks import tree_sink

    df = spark.createDataFrame(
        [("g1", 1.0, 5, 30), ("g1", 2.0, 6, 40), ("g2", 8.0, 7, 10)],
        "column1 string, column2 double, column_name int, another_column int",
    )
    value, another_value = 4, 35  # drops the (g1, 2.0) row via another_column
    config = {
        "unique_id": "parent",
        "save": True,
        "filters": [
            col("column_name") > value,
            col("another_column") < another_value,
        ],
        "keep_columns": ["column1", "column2"],
        "aggregation": {
            "group_by": ["column1"],
            "aggregations": {"column2": ["sum", "max", "min"]},
            "rename": {
                "sum(column2)": "total_column2",
                "max(column2)": "max_column2",
                "min(column2)": "min_column2",
            },
        },
    }
    out = aggregate_and_join(df, config, sink=tree_sink(str(tmp_path)))
    rows = {r.column1: (r.total_column2, r.max_column2, r.min_column2) for r in out.collect()}
    assert rows == {"g1": (1.0, 1.0, 1.0), "g2": (8.0, 8.0, 8.0)}
    # save: True routed the result through the sink
    assert spark.read.parquet(str(tmp_path / "parent")).count() == out.count()


def test_hotrod_example_config(spark):
    """hotrod.py:83-113, verbatim: filtered agg, top-level filter,
    child and grandchild with link joins and rename prefixing."""
    df = spark.createDataFrame(
        [
            ("a", "m", 1.0, 20.0, "p", 3, "q", 9.0),
            ("a", "m", 2.0, 5.0, "p", 4, "q", 7.0),
            ("excluded_value", "m", 9.0, 99.0, "p", 5, "q", 1.0),
        ],
        "col1 string, col2 string, col3 double, col4 double, "
        "col5 string, col6 int, col7 string, col8 double",
    )
    meta = {
        "group_by": ["col1", "col2"],
        "aggregate": {
            "col3": "sum",
            "col4": {"filter": "col4 > 10", "function": "avg"},
        },
        "rename": {"col3": "total_col3", "col4": "avg_col4_gt_10"},
        "filter": ["col1 != 'excluded_value'"],
        "children": [
            {
                "id": "child_1",
                "link": ["col5"],
                "aggregate": {"col6": "count"},
                "rename": {"col6": "count_col6"},
                "children": [
                    {
                        "id": "grandchild_1",
                        "link": ["col7"],
                        "aggregate": {"col8": "min"},
                        "rename": {"col8": "min_col8"},
                    }
                ],
            }
        ],
    }
    out = nested_aggregate(df, meta)
    row = out.collect()[0]
    assert row.col1 == "a" and row.col2 == "m"
    assert row.total_col3 == 3.0          # excluded row filtered out
    assert row.avg_col4_gt_10 == 20.0     # only col4>10 rows averaged
    assert row.root_count_col6 == 2       # child agg, id-prefixed
    assert row.root_child_1_min_col8 == 7.0  # grandchild, two prefixes


def test_megatron_example_config(spark):
    """megatron.py:96-111, verbatim: aggregations without new_name
    default their output name to the agg column (optimus.py:31)."""
    df = spark.createDataFrame(
        [("a", "x", "k", 1.0, 5.0, 9.0), ("a", "x", "k", 2.0, 7.0, 3.0)],
        "column1 string, column2 string, column3 string, "
        "column4 double, column5 double, column6 double",
    )
    example_metadata = {
        "iterations": [
            {
                "id": "iteration_1",
                "level_1": {
                    "group_by": ["column1", "column2"],
                    "keep_columns": ["column3"],
                    "aggregations": [
                        {"agg_col": "column4", "agg_func": "sum", "new_name": "total_column4"},
                        {"agg_col": "column5", "agg_func": "max"},
                        {"agg_col": "column6", "agg_func": "min"},
                    ],
                },
            }
        ]
    }
    row = run_pipeline(df, example_metadata)["iteration_1"].collect()[0]
    assert row.total_column4 == 3.0
    assert row.column5 == 7.0   # default name = agg col
    assert row.column6 == 3.0
    assert row.column3 == "k"
