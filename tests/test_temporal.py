"""As-of join (meta_frame_spark.operators.temporal)."""

import datetime

from pyspark.sql import functions as F

from meta_frame_spark.operators.temporal import asof_join


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 12, minute, 0)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "l1"), (1, _ts(20), "l2"), (2, _ts(10), "l3")],
        "uid bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(15), 20.0), (2, _ts(30), 99.0)],
        "uid bigint, ts timestamp, px double",
    )
    got = {
        r.tag: (r.px, r.ts_right)
        for r in asof_join(left, right, "ts", by=["uid"]).collect()
    }
    assert got["l1"] == (10.0, _ts(0))   # latest right <= 12:05
    assert got["l2"] == (20.0, _ts(15))
    assert got["l3"] == (None, None)     # right row is after the left ts


def test_asof_exact_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], "uid bigint, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "uid bigint, ts timestamp, px double")
    row = asof_join(left, right, "ts", by=["uid"]).first()
    assert row.px == 7.0  # right at equal ts is visible (<=, not <)


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(50), "x")], "uid bigint, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 7.0)], "uid bigint, ts timestamp, px double")
    loose = asof_join(left, right, "ts", by=["uid"]).first()
    assert loose.px == 7.0
    tight = asof_join(
        left, right, "ts", by=["uid"], tolerance=F.expr("INTERVAL 10 MINUTES")
    ).first()
    assert tight.px is None


def test_asof_name_collision_gets_suffix(spark):
    left = spark.createDataFrame([(1, _ts(10), 1.0)], "uid bigint, ts timestamp, px double")
    right = spark.createDataFrame([(1, _ts(5), 2.0)], "uid bigint, ts timestamp, px double")
    row = asof_join(left, right, "ts", by=["uid"]).first()
    assert row.px == 1.0 and row.px_right == 2.0


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], "uid bigint, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(5), 7.0)], "uid bigint, ts timestamp, px double")
    plan = asof_join(left, right, "ts", by=["uid"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle total


def test_event_paths_deterministic_order_and_cap(spark):
    from meta_frame_spark.operators.temporal import event_paths

    import datetime
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # user 1: out-of-insert-order + a same-ts tie broken by event_id
        (5, at(30), 1, "c"), (1, at(0), 1, "a"), (3, at(10), 1, "b"),
        (4, at(10), 1, "b2"),
        (9, at(0), 2, "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).repartition(8)
    got = {r.user_id: (r.path, r.n_events)
           for r in event_paths(df).collect()}
    assert got[1] == ("a>b>b2>c", 4)   # ts order, tie 3<4 -> b before b2
    assert got[2] == ("x", 1)

    capped = {r.user_id: (r.path, r.n_events, r.path_len)
              for r in event_paths(df, max_len=2).collect()}
    # first max_len events rendered; n_events stays the pre-cap total
    # and path_len exposes the truncation
    assert capped[1] == ("a>b", 4, 2)
    assert capped[2] == ("x", 1, 1)


def test_event_transitions_counts_and_probabilities(spark):
    from meta_frame_spark.operators.temporal import event_transitions

    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a -> b ; user 2: a -> c
        (1, t0, 1, "a"), (2, t0.replace(second=1), 1, "b"),
        (3, t0.replace(second=2), 1, "a"), (4, t0.replace(second=3), 1, "b"),
        (5, t0, 2, "a"), (6, t0.replace(second=1), 2, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).repartition(5)
    got = {(r.from_event, r.to_event): (r.n, r.p)
           for r in event_transitions(df).collect()}
    # p is exact (no rounding in the operator) so kernels compose
    assert got[("a", "b")] == (2, 2 / 3)
    assert got[("a", "c")] == (1, 1 / 3)
    assert got[("b", "a")] == (1, 1.0)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "a")}


def test_count_anomalies_flags_planted_spike(spark):
    import datetime

    from meta_frame_spark.operators.anomaly import count_anomalies

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(24):
        n = 500 if hour == 12 else 10  # massive spike at noon
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(hours=hour), "click"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])

    out = count_anomalies(df, group_cols=["event_type"], z_threshold=3.0)
    flagged = out.collect()
    assert len(flagged) == 1
    assert flagged[0].bucket_ts.hour == 12 and flagged[0].n == 500
    assert flagged[0].z > 3.0

    # robust (MAD) flags the same spike with a larger score: the spike
    # can't inflate its own baseline
    robust = count_anomalies(
        df, group_cols=["event_type"], z_threshold=3.0, robust=True
    ).collect()
    assert len(robust) == 1 and robust[0].bucket_ts.hour == 12
    assert robust[0].z > flagged[0].z


def test_count_anomalies_skips_tiny_and_flat_groups(spark):
    import datetime

    from meta_frame_spark.operators.anomaly import count_anomalies

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # "flat": identical count every hour -> stddev 0 -> never flagged
    for hour in range(10):
        for i in range(5):
            rows.append((hour * 10 + i, base + datetime.timedelta(hours=hour), "flat"))
    # "tiny": only 2 buckets -> below min_buckets
    rows += [(900, base, "tiny"), (901, base + datetime.timedelta(hours=1), "tiny")]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    assert count_anomalies(df, z_threshold=0.5, min_buckets=3).count() == 0


def test_ewma_matches_recurrence_and_validates(spark):
    import pytest

    from meta_frame_spark.operators.temporal import ewma

    rows = [("a", i, float(v)) for i, v in enumerate([10, 20, 10, 40])]
    rows += [("b", i, float(v)) for i, v in enumerate([5, 5, 5])]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {(r.k, r.t): r.s for r in
           ewma(df, ["k"], "t", "x", alpha=0.5, out_col="s").collect()}
    # y0=10; y1=.5*10+.5*20=15; y2=.5*15+.5*10=12.5; y3=.5*12.5+.5*40=26.25
    assert [out[("a", i)] for i in range(4)] == [10.0, 15.0, 12.5, 26.25]
    assert [out[("b", i)] for i in range(3)] == [5.0, 5.0, 5.0]

    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["k"], "t", "x", alpha=0.0)
    with pytest.raises(ValueError, match="group_cols"):
        ewma(df, [], "t", "x", alpha=0.5)


def test_bucket_spine_fills_silent_buckets(spark):
    import datetime

    from meta_frame_spark.operators.temporal import bucket_spine

    base = datetime.datetime(2024, 3, 1)
    rows = [
        ("a", base, 5),
        ("a", base + datetime.timedelta(hours=3), 7),  # hours 1,2 silent
        ("b", base, 1),
    ]
    counts = spark.createDataFrame(rows, ["event_type", "bucket_ts", "n"])
    out = {(r.event_type, r.bucket_ts.hour): r.n
           for r in bucket_spine(counts, ["event_type"]).collect()}
    assert out == {
        ("a", 0): 5, ("a", 1): 0, ("a", 2): 0, ("a", 3): 7,
        ("b", 0): 1,  # b's spine spans only its own [min, max]
    }
    # a dead-feed hour now exists with n=0, so the anomaly scorer can
    # flag it instead of never seeing it
