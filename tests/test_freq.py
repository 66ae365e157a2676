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


def test_decayed_counts_merge_and_reanchor(spark):
    """Two batches sharing the newest anchor sum cell-wise; an older
    batch re-anchors with one multiply by 0.5**(delta/half_life)."""
    import math

    from meta_frame_spark.operators.freq import decayed_counts

    rows = [("a", "2024-01-0%d 00:00:00" % d) for d in range(1, 8)] + [
        ("b", "2024-01-07 00:00:00")
    ]
    df = spark.createDataFrame(rows, "k string, ts_s string").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )
    hl = 86400.0  # 1 day
    got = {
        r.k: r.decayed_count
        for r in decayed_counts(df, "k", half_life_s=hl).collect()
    }
    want_a = sum(0.5 ** d for d in range(7))  # ages 0..6 days
    assert abs(got["a"] - want_a) < 1e-9 and abs(got["b"] - 1.0) < 1e-12

    # merge contract: early half re-anchored to the late half's anchor
    early = df.filter(F.col("ts") < "2024-01-05")
    late = df.filter(F.col("ts") >= "2024-01-05")
    e = {r.k: r.decayed_count for r in decayed_counts(early, "k", half_life_s=hl).collect()}
    l = {r.k: r.decayed_count for r in decayed_counts(late, "k", half_life_s=hl).collect()}
    delta_days = 3.0  # early anchor 01-04 -> late anchor 01-07
    merged_a = l.get("a", 0.0) + e["a"] * math.pow(0.5, delta_days)
    assert abs(merged_a - got["a"]) < 1e-9
