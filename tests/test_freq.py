"""Misra-Gries heavy hitters (operators/freq.py)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meta_frame_spark.operators.freq import _mg_prune, heavy_hitters


def exact_hh(values, min_frac):
    from collections import Counter

    n = len(values)
    thresh = math.ceil(min_frac * n)
    return {v: c for v, c in Counter(values).items() if c >= thresh}


def test_heavy_hitters_matches_exact_on_skewed_stream(spark):
    # zipf-ish: item i appears ~1000/i times
    values = [f"w{i}" for i in range(1, 60) for _ in range(1000 // i)]
    df = spark.createDataFrame([(v,) for v in values], ["item"]).repartition(8)
    out = {r.item: r.cnt for r in heavy_hitters(df, "item", 0.02).collect()}
    assert out == exact_hh(values, 0.02)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                  max_size=300),
    min_frac=st.sampled_from([0.05, 0.1, 0.3]),
    parts=st.sampled_from([1, 3, 7]),
)
def test_heavy_hitters_never_misses_or_invents(spark, data, min_frac, parts):
    df = spark.createDataFrame(
        [(str(v),) for v in data], ["item"]
    ).repartition(parts)
    got = {r.item: r.cnt for r in heavy_hitters(df, "item", min_frac).collect()}
    assert got == exact_hh([str(v) for v in data], min_frac)


def test_heavy_hitters_k_guard():
    # k+1 <= 1/min_frac must raise, not silently under-report
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters(None, "item", 0.01, k=50)
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(None, "item", 0.0)


def test_mg_prune_bounds_and_survivors():
    counts = {f"i{j}": j for j in range(1, 12)}  # 11 items, counts 1..11
    pruned = _mg_prune(dict(counts), 4)
    assert len(pruned) <= 4
    # survivors are the largest, decremented by the cutoff count
    cut = sorted(counts.values(), reverse=True)[4]
    assert pruned == {i: c - cut for i, c in counts.items() if c > cut}
    assert _mg_prune({"a": 5}, 4) == {"a": 5}  # under k: untouched
