"""Market-basket co-occurrence: item pairs that appear together in the
same basket (order, session, document ...).

Not in the reference (SURVEY.md §2 — group/agg/join only); this is the
"frequently bought/viewed together" primitive behind co-visitation
recommenders and feature co-occurrence statistics.

Scale design (100 TB of baskets):

* Pair generation is **in-basket, not cross-corpus**: one shuffle
  groups items by basket, then each basket emits its own pairs via
  array HOFs (``transform``/``flatten`` over the sorted distinct item
  array) — pure JVM codegen, no Python, no self-join of the raw table
  (a self-join would shuffle the fact table twice and re-scan it for
  the probe side).
* Pair count per basket is quadratic in basket size, so a
  ``max_basket`` cap drops degenerate baskets (the standard guard: a
  single 100k-item basket would emit 5 x 10^9 pairs and stall its
  task; real co-visitation pipelines cap or sample). Dropped baskets
  are counted out loud in the companion ``n_dropped`` helper column of
  ``basket_sizes`` rather than vanishing silently.
* The pair aggregate is map-side combined; output is at most
  ``sum(min(basket, cap)^2)`` rows, further cut by ``min_count``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pairs(items: Column) -> Column:
    """All ordered pairs (a < b) from a sorted distinct item array."""
    return F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + 2, F.size(items)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )


def co_occurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket: int = 100,
) -> DataFrame:
    """``(item_a, item_b, n_baskets)`` for every unordered item pair
    co-occurring in at least ``min_count`` baskets; ``item_a < item_b``
    canonically. Baskets with more than ``max_basket`` DISTINCT items
    are dropped (see module docstring)."""
    if max_basket < 2:
        raise ValueError(f"max_basket must be >= 2, got {max_basket}")
    baskets = (
        df.groupBy(basket_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("_items"))
        .filter(F.size("_items").between(2, max_basket))
    )
    return (
        baskets.select(F.explode(_pairs(F.col("_items"))).alias("p"))
        .groupBy(F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )


def basket_sizes(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 100,
) -> DataFrame:
    """Census for the cap: one row with ``(n_baskets, n_kept,
    n_dropped)`` — how many baskets the ``max_basket`` guard silently
    would have dropped, made loud."""
    sizes = df.groupBy(basket_col).agg(
        F.countDistinct(item_col).alias("_n")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_baskets"),
        F.sum(F.when(F.col("_n").between(2, max_basket), 1).otherwise(0)).alias(
            "n_kept"
        ),
        F.sum(F.when(F.col("_n") > max_basket, 1).otherwise(0)).alias("n_dropped"),
    )
