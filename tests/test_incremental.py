"""Incremental aggregate state maintenance (operators/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.incremental import (
    aggregate_state,
    merge_aggregate_states,
)

SPECS = {
    "n": (None, "count"),
    "total": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
}


def test_merge_equals_full_rescan_and_is_associative(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(300)], ["g", "v"]
    )
    full = {r.g: r for r in aggregate_state(df, ["g"], SPECS).collect()}

    parts = [df.filter(F.col("v") % 3 == k) for k in range(3)]
    states = [aggregate_state(p, ["g"], SPECS) for p in parts]
    # fold in two different orders — associativity
    m1 = merge_aggregate_states(
        merge_aggregate_states(states[0], states[1], ["g"], SPECS),
        states[2], ["g"], SPECS,
    )
    m2 = merge_aggregate_states(
        states[0],
        merge_aggregate_states(states[2], states[1], ["g"], SPECS),
        ["g"], SPECS,
    )
    for merged in (m1, m2):
        got = {r.g: r for r in merged.collect()}
        assert set(got) == set(full)
        for g in full:
            assert got[g].n == full[g].n
            assert got[g].total == full[g].total
            assert got[g].lo == full[g].lo and got[g].hi == full[g].hi


def test_incremental_specs_validated(spark):
    df = spark.createDataFrame([(1, 1.0)], ["g", "v"])
    with pytest.raises(ValueError, match="not mergeable"):
        aggregate_state(df, ["g"], {"a": ("v", "avg")})
    with pytest.raises(ValueError, match="at least one"):
        aggregate_state(df, ["g"], {})


def test_incremental_specs_require_value_col(spark):
    df = spark.createDataFrame([(1, 1.0)], ["g", "v"])
    with pytest.raises(ValueError, match="needs a value column"):
        aggregate_state(df, ["g"], {"total": (None, "sum")})
