"""Market-basket co-occurrence pairs."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.basket import basket_sizes, co_occurrence


@pytest.fixture(scope="module")
def baskets(spark):
    rows = [
        (1, "apple"), (1, "bread"), (1, "milk"),
        (2, "apple"), (2, "bread"),
        (3, "apple"), (3, "bread"), (3, "apple"),  # dup item in basket
        (4, "milk"),                               # singleton: no pairs
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_pairs_exact(spark, baskets):
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in co_occurrence(baskets, "basket", "item").collect()
    }
    assert got == {
        ("apple", "bread"): 3,
        ("apple", "milk"): 1,
        ("bread", "milk"): 1,
    }


def test_min_count_filters(spark, baskets):
    got = co_occurrence(baskets, "basket", "item", min_count=2).collect()
    assert [(r.item_a, r.item_b, r.n_baskets) for r in got] == [("apple", "bread", 3)]


def test_max_basket_drops_large(spark):
    rows = [(1, f"i{k}") for k in range(5)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b)
        for r in co_occurrence(df, "basket", "item", max_basket=4).collect()
    }
    assert got == {("a", "b")}
    census = basket_sizes(df, "basket", "item", max_basket=4).collect()[0]
    assert (census.n_baskets, census.n_kept, census.n_dropped) == (2, 1, 1)


def test_no_python_stage(spark, baskets):
    plan = (
        co_occurrence(baskets, "basket", "item")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_bad_cap(spark, baskets):
    with pytest.raises(ValueError):
        co_occurrence(baskets, "basket", "item", max_basket=1)
