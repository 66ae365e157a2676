"""Data-quality expectations: every kind, violations counted exactly."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.expect import check_constraints, expect_or_fail


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (1, "a", 20.0),     # dup id 1 (x2)
            (1, "b", 30.0),     # dup id 1 (x3 -> 2 beyond first)
            (2, None, -5.0),    # null name, below range
            (3, "zz", 999.0),   # value outside accepted, above range
            (None, "a", 50.0),  # null id -> not an fk violation
            (9, "b", 60.0),     # id 9 missing from ref -> orphan
        ],
        ["id", "name", "score"],
    )


def test_check_constraints_counts(spark):
    df = _dirty(spark)
    ref = spark.createDataFrame([(1,), (2,), (3,)], ["rid"])
    rep = {
        r["check"]: r["n_violations"]
        for r in check_constraints(
            df,
            [
                {"kind": "unique", "columns": ["id"], "name": "u"},
                {"kind": "not_null", "column": "name", "name": "nn"},
                {
                    "kind": "accepted_values",
                    "column": "name",
                    "values": ["a", "b"],
                    "name": "av",
                },
                {"kind": "range", "column": "score", "min": 0.0, "max": 100.0,
                 "name": "rg"},
                {"kind": "foreign_key", "columns": ["id"], "ref": ref,
                 "ref_columns": ["rid"], "name": "fk"},
            ],
        ).collect()
    }
    assert rep == {"u": 2, "nn": 1, "av": 2, "rg": 2, "fk": 1}


def test_expect_or_fail_and_validation(spark):
    df = _dirty(spark)
    clean = df.filter(F.col("id") == 2)
    # passing gate is silent
    expect_or_fail(clean, [{"kind": "unique", "columns": ["id"]}])
    # failing gate names the failed checks
    with pytest.raises(ValueError, match="u\\[unique\\]=2"):
        expect_or_fail(df, [{"kind": "unique", "columns": ["id"], "name": "u"}])
    with pytest.raises(ValueError, match="unknown expectation kind"):
        check_constraints(df, [{"kind": "sorted", "column": "id"}])
    with pytest.raises(ValueError, match="at least one"):
        check_constraints(df, [])


def test_shared_scan_for_aggregate_checks(spark):
    """All not_null/accepted/range checks must compile into ONE
    aggregate over the table (one scan), not one job per check."""
    df = _dirty(spark)
    rep = check_constraints(
        df,
        [
            {"kind": "not_null", "column": "name"},
            {"kind": "range", "column": "score", "min": 0.0},
            {"kind": "accepted_values", "column": "name", "values": ["a", "b"]},
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate feeding three projections — the relation appears once
    assert plan.count("LogicalRDD") == 1


def test_expect_schema_passes_and_lists_all_violations(spark):
    import pytest

    from meta_frame_spark.operators.expect import expect_schema

    df = spark.createDataFrame([(1, "x", 2.0)], ["id", "name", "score"])
    # exact match passes silently
    expect_schema(df, {"id": "bigint", "name": "string", "score": "double"})
    # extra columns tolerated by default, rejected on closed contracts
    expect_schema(df, {"id": "bigint"})
    with pytest.raises(ValueError, match="unexpected columns"):
        expect_schema(df, {"id": "bigint"}, allow_extra=False)
    # every violation reported at once
    with pytest.raises(ValueError) as e:
        expect_schema(df, {"id": "int", "missing": "string"})
    msg = str(e.value)
    assert "expected int, got bigint" in msg and "missing column" in msg


def test_expect_schema_nullability(spark):
    import pytest

    from pyspark.sql import types as T

    from meta_frame_spark.operators.expect import expect_schema

    schema = T.StructType([
        T.StructField("id", T.LongType(), nullable=True),
    ])
    df = spark.createDataFrame([(1,)], schema)
    expect_schema(df, {"id": "bigint not null"})  # ignored by default
    with pytest.raises(ValueError, match="not null"):
        expect_schema(df, {"id": "bigint not null"}, check_nullability=True)


def test_expect_schema_rejects_malformed_not_null(spark):
    import pytest

    from meta_frame_spark.operators.expect import expect_schema

    df = spark.createDataFrame([(1,)], ["id"])
    # trailing space after 'not null' is tolerated...
    with pytest.raises(ValueError, match="not null"):
        expect_schema(df, {"id": "bigint not null "}, check_nullability=True)
    # ...but trailing garbage is a loud spec error, never a silent skip
    with pytest.raises(ValueError, match="malformed"):
        expect_schema(df, {"id": "bigint not nullzzz"})
