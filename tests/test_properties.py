"""Property-based tests (SURVEY.md §5 item 5): random configs over a
fixed tiny frame, asserting engine invariants. Examples are capped
low — every example runs real Spark jobs."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meta_frame_spark.config.model import ConfigError
from meta_frame_spark.plans.builder import apply_filters, apply_level

COLS = ["g1", "g2", "v1", "v2"]
ROWS = [
    ("a", "x", 1, 10.0), ("a", "y", 2, 20.0), ("a", "y", 3, 30.0),
    ("b", "x", 4, 40.0), ("b", "z", 5, 50.0), ("c", "x", 6, None),
]

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, "g1 string, g2 string, v1 int, v2 double").cache()


group_keys = st.lists(st.sampled_from(["g1", "g2"]), min_size=1, max_size=2, unique=True)
agg_funcs = st.sampled_from(["sum", "max", "min", "count", "avg"])
filter_specs = st.builds(
    lambda op, val: {"filter_col": "v1", "filter_op": op, "filter_value": val},
    st.sampled_from([">", "<", ">=", "<=", "==", "!="]),
    st.integers(min_value=0, max_value=7),
)


@_settings
@given(filters=st.lists(filter_specs, max_size=3))
def test_filters_never_add_rows(frame, filters):
    assert apply_filters(frame, filters).count() <= frame.count()


@_settings
@given(keys=group_keys, func=agg_funcs)
def test_group_count_equals_distinct_keys(frame, keys, func):
    out = apply_level(
        frame,
        {"group_by": keys,
         "aggregations": [{"agg_col": "v1", "agg_func": func, "new_name": "o"}]},
    )
    assert out.count() == frame.select(*keys).distinct().count()


@_settings
@given(keys=group_keys)
def test_sum_is_permutation_invariant(frame, keys):
    cfg = {"group_by": keys,
           "aggregations": [{"agg_col": "v1", "agg_func": "sum", "new_name": "s"}]}
    a = {tuple(r[k] for k in keys): r.s for r in apply_level(frame, cfg).collect()}
    shuffled = frame.orderBy(F.rand(seed=7))
    b = {tuple(r[k] for k in keys): r.s for r in apply_level(shuffled, cfg).collect()}
    assert a == b


@_settings
@given(func=st.text(min_size=1, max_size=12).filter(
    lambda s: s not in {"sum", "max", "min", "count", "avg", "mean", "first", "last",
                        "count_distinct", "stddev", "variance", "collect_set_size", "median"}
))
def test_unknown_agg_func_always_raises(frame, func):
    with pytest.raises(ConfigError):
        apply_level(
            frame,
            {"group_by": ["g1"],
             "aggregations": [{"agg_col": "v1", "agg_func": func, "new_name": "o"}]},
        )


@_settings
@given(op=st.text(min_size=1, max_size=8).filter(
    lambda s: s not in {"==", "!=", ">", "<", ">=", "<=", "isin", "not_isin",
                        "is_null", "not_null"}
))
def test_unknown_filter_op_always_raises(frame, op):
    with pytest.raises(ConfigError):
        apply_filters(frame, [{"filter_col": "v1", "filter_op": op, "filter_value": 1}])


nested_aggs = st.dictionaries(
    st.sampled_from(["v1", "v2"]),
    st.one_of(
        st.sampled_from(["sum", "min", "max", "count", "avg"]),
        st.builds(lambda f: {"filter": "v1 > 2", "function": f},
                  st.sampled_from(["sum", "avg"])),
    ),
    min_size=1, max_size=2,
)


@_settings
@given(keys=group_keys, aggs=nested_aggs)
def test_nested_dialect_random_configs_execute(frame, keys, aggs):
    """Random B' configs: validate, execute, output grain == distinct
    keys, output columns renamed deterministically."""
    from meta_frame_spark.plans.builder import nested_aggregate

    meta = {"id": "r", "group_by": list(keys), "aggregate": dict(aggs)}
    out = nested_aggregate(frame, meta)
    assert out.count() == frame.select(*keys).distinct().count()
    expected_cols = set(keys) | {f"{f if isinstance(f, str) else f['function']}_{c}"
                                 for c, f in aggs.items()}
    assert set(out.columns) == expected_cols
