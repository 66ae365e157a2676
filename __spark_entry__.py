"""Driver contract for the spark-graft builder (PySpark target).

Every query below runs through the meta_frame_spark engine (the
metadata-driven plan builders), not ad-hoc DataFrame code — so the
driver's DuckDB-oracle comparison exercises the engine semantics from
SURVEY.md §2 end to end.

Naming contract: every computed column is aliased identically in the
Spark plan and the oracle SQL; doubles are rounded to 2 decimals on
both sides so last-ulp float-sum differences can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_frame_spark import aggregate_and_join, nested_aggregate, run_pipeline


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and convert to micros
        # (matches DuckDB's nanos->micros truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


# --------------------------------------------------------------------------
# Dialect A (iterations/levels cascade) — SURVEY.md §2 P1-P3, A1-A8, A10, O1
# --------------------------------------------------------------------------

def q_a_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level re-aggregation cascade (A8), the reference's flagship
    example (optimus.py:54-80) mapped onto lineitem."""
    config = {
        "iterations": [
            {
                "id": "cascade",
                "level_1": {
                    "group_by": ["l_returnflag", "l_linestatus"],
                    "filters": [
                        {"filter_col": "l_quantity", "filter_op": "<", "filter_value": 45}
                    ],
                    "aggregations": [
                        {"agg_col": "l_extendedprice", "agg_func": "sum", "new_name": "sum_price"},
                        {"agg_col": "l_quantity", "agg_func": "sum", "new_name": "sum_qty"},
                    ],
                },
                "level_2": {
                    "group_by": ["l_returnflag"],
                    "aggregations": [
                        {"agg_col": "sum_price", "agg_func": "max", "new_name": "max_sum_price"},
                        {"agg_col": "sum_qty", "agg_func": "sum", "new_name": "total_qty"},
                    ],
                },
            }
        ]
    }
    out = run_pipeline(_t(spark, sf_dir, "lineitem"), config)["cascade"]
    return out.select(
        "l_returnflag",
        F.round("max_sum_price", 2).alias("max_sum_price"),
        F.round("total_qty", 2).alias("total_qty"),
    )


def q_a_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured filters: null-safe == (P3), > (P2), isin (P2)."""
    config = {
        "iterations": [
            {
                "id": "f",
                "level_1": {
                    "group_by": ["o_orderstatus", "o_orderpriority"],
                    "filters": [
                        {"filter_col": "o_orderstatus", "filter_op": "==", "filter_value": "O"},
                        {"filter_col": "o_totalprice", "filter_op": ">", "filter_value": 20000},
                        {
                            "filter_col": "o_orderpriority",
                            "filter_op": "isin",
                            "filter_value": ["1-URGENT", "2-HIGH"],
                        },
                    ],
                    "aggregations": [
                        {"agg_col": "o_orderkey", "agg_func": "count", "new_name": "n_orders"},
                        {"agg_col": "o_totalprice", "agg_func": "sum", "new_name": "sum_price"},
                    ],
                },
            }
        ]
    }
    out = run_pipeline(_t(spark, sf_dir, "orders"), config)["f"]
    return out.select(
        "o_orderstatus", "o_orderpriority", "n_orders",
        F.round("sum_price", 2).alias("sum_price"),
    )


def q_a_keep_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep_columns pass-through (A10) — F.first per kept column."""
    config = {
        "iterations": [
            {
                "id": "k",
                "level_1": {
                    "group_by": ["c_custkey"],
                    "keep_columns": ["c_name"],
                    "aggregations": [
                        {"agg_col": "c_acctbal", "agg_func": "sum", "new_name": "bal"}
                    ],
                },
            }
        ]
    }
    out = run_pipeline(_t(spark, sf_dir, "customer"), config)["k"]
    return out.select("c_custkey", "c_name", F.round("bal", 2).alias("bal"))


# --------------------------------------------------------------------------
# Dialect B (recursive join tree) — SURVEY.md §2 P4, A5, A6, J1, J3, O2
# --------------------------------------------------------------------------

def q_b_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-func aggs per column (A5) with rename at alias time (A6)."""
    config = {
        "unique_id": "parent",
        "filters": ["l_quantity > 5"],
        "aggregation": {
            "group_by": ["l_returnflag"],
            "aggregations": {"l_extendedprice": ["sum", "max", "min"]},
            "rename": {
                "sum(l_extendedprice)": "sum_price",   # reference-style key
                "max_l_extendedprice": "max_price",
                "min_l_extendedprice": "min_price",
            },
        },
    }
    out = aggregate_and_join(_t(spark, sf_dir, "lineitem"), config)
    return out.select(
        "l_returnflag",
        F.round("sum_price", 2).alias("sum_price"),
        F.round("max_price", 2).alias("max_price"),
        F.round("min_price", 2).alias("min_price"),
    )


def q_b_join_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive parent->child->grandchild join tree (J1/J3) with a
    broadcast dim at the bottom (nation)."""
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
                "keep_columns": ["o_custkey", "c_name", "c_nationkey"],
                "children": [
                    {
                        "unique_id": "nation",
                        "data_path": f"{sf_dir}/nation.parquet",
                        "join": {"on": "c_nationkey", "how": "left"},
                        "broadcast": True,
                        "keep_columns": ["c_nationkey", "n_name"],
                    }
                ],
            }
        ],
    }

    def loader(spark_: SparkSession, child) -> DataFrame:
        df = spark_.read.parquet(child.data_path)
        if child.node.unique_id == "cust":
            df = df.withColumnRenamed("c_custkey", "o_custkey")
        if child.node.unique_id == "nation":
            df = df.withColumnRenamed("n_nationkey", "c_nationkey")
        return df

    out = aggregate_and_join(_t(spark, sf_dir, "orders"), config, loader=loader)
    return out.select(
        "o_custkey", F.round("total_spend", 2).alias("total_spend"), "c_name", "n_name"
    )


def q_b_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (surface completer, SURVEY.md §2.3 note)."""
    config = {
        "unique_id": "root",
        "keep_columns": ["c_custkey", "c_name"],
        "children": [
            {
                "unique_id": "orders",
                "data_path": f"{sf_dir}/orders.parquet",
                "join": {"on": "c_custkey", "how": "semi"},
                "keep_columns": ["c_custkey"],
            }
        ],
    }

    def loader(spark_: SparkSession, child) -> DataFrame:
        return spark_.read.parquet(child.data_path).withColumnRenamed("o_custkey", "c_custkey")

    return aggregate_and_join(_t(spark, sf_dir, "customer"), config, loader=loader)


def q_b_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no large orders (child filtered so
    the anti side is non-trivial)."""
    config = {
        "unique_id": "root",
        "keep_columns": ["c_custkey", "c_name"],
        "children": [
            {
                "unique_id": "orders",
                "data_path": f"{sf_dir}/orders.parquet",
                "join": {"on": "c_custkey", "how": "anti"},
                "filters": ["o_totalprice > 180000"],
                "keep_columns": ["c_custkey"],
            }
        ],
    }

    def loader(spark_: SparkSession, child) -> DataFrame:
        return spark_.read.parquet(child.data_path).withColumnRenamed("o_custkey", "c_custkey")

    return aggregate_and_join(_t(spark, sf_dir, "customer"), config, loader=loader)


# --------------------------------------------------------------------------
# Dialect B' (nested aggregate) — SURVEY.md §2 A7, A9, J2, C1, C2, O3
# --------------------------------------------------------------------------

def q_bp_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (A7), child link-join with prefix naming
    (A9/J2), bitemporal stamping (C2)."""
    meta = {
        "id": "root",
        "group_by": ["l_returnflag"],
        "aggregate": {
            "l_quantity": "sum",
            "l_extendedprice": {"filter": "l_quantity > 10", "function": "avg"},
        },
        "rename": {"l_quantity": "total_qty", "l_extendedprice": "avg_price_gt10"},
        "filter": ["l_linestatus = 'O'"],
        "children": [
            {
                "id": "by_flag",
                "link": ["l_returnflag"],
                "aggregate": {"l_orderkey": "count"},
                "rename": {"l_orderkey": "n_lines"},
            }
        ],
    }
    out = nested_aggregate(_t(spark, sf_dir, "lineitem"), meta, bitemporal=True)
    return out.select(
        "l_returnflag",
        F.round("total_qty", 2).alias("total_qty"),
        F.round("avg_price_gt10", 2).alias("avg_price_gt10"),
        "root_n_lines",
        "valid_from",
        "valid_to",
    )


# --------------------------------------------------------------------------
# LLM-pipeline operators (SURVEY.md §7.1 step 6) — round-1 slice
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on documents: keep min doc_id per identical text.

    Scale path: a single hash-shuffle groupBy on the text (Catalyst
    hashes internally); at 100 TB group on md5(text) to shrink shuffle
    keys — semantics identical, done here via the engine-level dedup op."""
    from meta_frame_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), key_cols=["text"], id_col="doc_id")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count / char length (text-analysis slice)."""
    from meta_frame_spark.functions.text import with_text_stats

    out = with_text_stats(_t(spark, sf_dir, "documents"), text_col="text")
    return out.select("doc_id", "n_tokens", "text_len")


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling aggregation (batch form; streaming twin lives
    in meta_frame_spark.streaming)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("event_id").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON prop extraction (multimodal/typed
    metadata slice — events.props is a JSON string column)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.count("event_id").alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_a_cascade(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a_cascade": q_a_cascade,
        "a_filters": q_a_filters,
        "a_keep_columns": q_a_keep_columns,
        "b_multi_agg": q_b_multi_agg,
        "b_join_tree": q_b_join_tree,
        "b_semi_join": q_b_semi_join,
        "b_anti_join": q_b_anti_join,
        "bp_nested": q_bp_nested,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "events_hourly": q_events_hourly,
        "events_json": q_events_json,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "a_cascade": """
            SELECT l_returnflag,
                   ROUND(MAX(sum_price), 2) AS max_sum_price,
                   ROUND(SUM(sum_qty), 2) AS total_qty
            FROM (
                SELECT l_returnflag, l_linestatus,
                       SUM(l_extendedprice) AS sum_price,
                       SUM(l_quantity) AS sum_qty
                FROM lineitem
                WHERE l_quantity < 45
                GROUP BY 1, 2
            )
            GROUP BY 1
        """,
        "a_filters": """
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(o_orderkey) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS sum_price
            FROM orders
            WHERE o_orderstatus = 'O'
              AND o_totalprice > 20000
              AND o_orderpriority IN ('1-URGENT', '2-HIGH')
            GROUP BY 1, 2
        """,
        "a_keep_columns": """
            SELECT c_custkey, c_name, ROUND(SUM(c_acctbal), 2) AS bal
            FROM customer
            GROUP BY 1, 2
        """,
        "b_multi_agg": """
            SELECT l_returnflag,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(MAX(l_extendedprice), 2) AS max_price,
                   ROUND(MIN(l_extendedprice), 2) AS min_price
            FROM lineitem
            WHERE l_quantity > 5
            GROUP BY 1
        """,
        "b_join_tree": """
            SELECT o.o_custkey, o.total_spend, c.c_name, n.n_name
            FROM (
                SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend
                FROM orders GROUP BY 1
            ) o
            JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "b_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "b_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders WHERE o_totalprice > 180000
            )
        """,
        "bp_nested": """
            SELECT a.l_returnflag,
                   ROUND(a.total_qty, 2) AS total_qty,
                   ROUND(a.avg_price_gt10, 2) AS avg_price_gt10,
                   b.root_n_lines,
                   DATE '2024-01-01' AS valid_from,
                   DATE '9999-12-31' AS valid_to
            FROM (
                SELECT l_returnflag,
                       SUM(l_quantity) AS total_qty,
                       AVG(CASE WHEN l_quantity > 10 THEN l_extendedprice END) AS avg_price_gt10
                FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1
            ) a
            LEFT JOIN (
                SELECT l_returnflag, COUNT(l_orderkey) AS root_n_lines
                FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1
            ) b USING (l_returnflag)
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents
            GROUP BY text
        """,
        "text_stats": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER) AS n_tokens,
                   CAST(length(text) AS INTEGER) AS text_len
            FROM documents
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(event_id) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "events_json": """
            SELECT event_type,
                   ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k,
                   COUNT(event_id) AS n_events
            FROM events
            GROUP BY 1
        """,
    }
