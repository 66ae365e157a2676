"""HLL cardinality sketches (mergeable distinct counts) and
temperature-scaled mixing plans."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.mixing import temperature_mix_plan
from meta_frame_spark.operators.sketch import (
    cardinality_sketch,
    estimate_distinct,
    incremental_distinct,
    merge_cardinality_sketches,
)


@pytest.fixture(scope="module")
def labeled(spark):
    # 3 groups; group g{i} has (i+1)*40 distinct values, each duplicated
    rows = [
        (f"g{i}", f"v{i}_{j % ((i + 1) * 40)}")
        for i in range(3)
        for j in range(2 * (i + 1) * 40)
    ]
    return spark.createDataFrame(rows, "grp string, val string")


def _estimates(df):
    return {r.grp: r.approx_distinct for r in estimate_distinct(df).collect()}


def test_sketch_estimate_within_bound(spark, labeled):
    est = _estimates(cardinality_sketch(labeled, ["grp"], "val"))
    exact = {
        r.grp: r.n
        for r in labeled.groupBy("grp").agg(F.countDistinct("val").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for g, e in exact.items():
        assert abs(est[g] - e) / e <= 0.05, (g, est[g], e)


def test_sketch_union_equals_whole(spark, labeled):
    """Sketching two arbitrary halves and unioning them must estimate
    the same as sketching the whole — the property that lets daily
    sketches roll up without re-reading history."""
    left = labeled.filter(F.crc32("val") % 2 == 0)
    right = labeled.filter(F.crc32("val") % 2 == 1)
    parts = cardinality_sketch(left, ["grp"], "val").unionByName(
        cardinality_sketch(right, ["grp"], "val")
    )
    merged = merge_cardinality_sketches(parts, ["grp"])
    whole = cardinality_sketch(labeled, ["grp"], "val")
    assert _estimates(merged) == _estimates(whole)


def test_incremental_distinct_step(spark, labeled):
    """history sketches + new batch == sketch of the concatenation."""
    history_rows = labeled.filter(F.col("grp") != "g2")
    batch = labeled.filter(F.col("grp") != "g0")
    history = cardinality_sketch(history_rows, ["grp"], "val")
    refreshed = incremental_distinct(history, batch, ["grp"], "val")
    direct = cardinality_sketch(history_rows.unionByName(batch), ["grp"], "val")
    assert _estimates(refreshed) == _estimates(direct)


@pytest.fixture(scope="module")
def sized(spark):
    rows = [("a", i, 10) for i in range(90)] + \
           [("b", i, 10) for i in range(40)] + \
           [("c", i, 10) for i in range(10)]
    return spark.createDataFrame(rows, "src string, id bigint, n bigint")


def test_temperature_alpha_one_is_natural_mix(spark, sized):
    """alpha=1: target shares equal the observed shares, so the whole
    corpus is feasible and every keep_frac is 1."""
    plan = temperature_mix_plan(sized, "src", alpha=1.0)
    for r in plan.collect():
        assert abs(r.keep_frac - 1.0) < 1e-9


def test_temperature_alpha_zero_is_uniform(spark, sized):
    """alpha=0: uniform target shares; the smallest source binds and
    every source keeps min_size rows."""
    plan = {r.src: r for r in temperature_mix_plan(sized, "src", alpha=0.0).collect()}
    assert abs(plan["c"].keep_frac - 1.0) < 1e-9
    assert abs(plan["a"].keep_frac - 10 / 90) < 1e-9
    assert abs(plan["b"].keep_frac - 10 / 40) < 1e-9
    for r in plan.values():
        assert abs(r.target_share - 1 / 3) < 1e-9


def test_temperature_flattens_monotonically(spark, sized):
    """0 < alpha < 1 sits between natural and uniform: the dominant
    source's share shrinks as alpha drops."""
    shares = {}
    for alpha in (1.0, 0.5, 0.0):
        plan = {r.src: r.target_share
                for r in temperature_mix_plan(sized, "src", alpha=alpha).collect()}
        shares[alpha] = plan["a"]
    assert shares[1.0] > shares[0.5] > shares[0.0]
    with pytest.raises(ValueError):
        temperature_mix_plan(sized, "src", alpha=1.5)


def test_theta_set_overlap_exact_regime(spark):
    from meta_frame_spark.operators.sketch import theta_set_overlap

    a = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(600, 1400)], ["k"])
    r = theta_set_overlap(a, b, "k").collect()[0]
    assert (r.n_a, r.n_b) == (1000, 800)
    assert r.n_union == 1400 and r.n_both == 400
    assert r.n_only_a == 600 and r.n_only_b == 400
    # identities that must hold for any exact-regime sketch pair
    assert r.n_union == r.n_a + r.n_b - r.n_both
    assert r.n_only_a == r.n_a - r.n_both


def test_theta_sketch_groups_mergeable(spark):
    from pyspark.sql import functions as F

    from meta_frame_spark.operators.sketch import theta_sketch

    df = spark.createDataFrame(
        [(g, i % 37) for g in ("x", "y") for i in range(200)], ["g", "v"]
    )
    merged = theta_sketch(df, ["g"], "v").agg(
        F.theta_sketch_estimate(F.theta_union_agg("sketch")).alias("n")
    ).collect()[0]
    assert merged.n == 37


def test_kll_quantiles_rank_accuracy_and_merge(spark):
    from meta_frame_spark.operators.sketch import (
        kll_quantile_sketch,
        kll_quantiles,
        merge_kll_sketches,
    )

    df = spark.range(50000).selectExpr(
        "CAST(id AS DOUBLE) AS v", "id % 5 AS inc"
    )
    est = {r.prob: r.est
           for r in kll_quantiles(df, "v", [0.1, 0.5, 0.9], k=800).collect()}
    for p, e in est.items():
        assert abs(e / 50000 - p) < 0.02  # uniform: value/N ~ rank

    # sketching 5 increments then merging must answer like one pass
    parts = kll_quantile_sketch(df, ["inc"], "v").drop("inc")
    merged = merge_kll_sketches(parts.withColumn("one", F.lit(1)), ["one"])
    med = merged.select(
        F.kll_sketch_get_quantile_double("sketch", F.lit(0.5)).alias("m")
    ).collect()[0].m
    assert abs(med / 50000 - 0.5) < 0.02


def test_kll_quantiles_validates_probs():
    import pytest

    from meta_frame_spark.operators.sketch import kll_quantiles

    with pytest.raises(ValueError, match="probs"):
        kll_quantiles(None, "v", [])


def test_theta_overlap_matrix_small(spark):
    from meta_frame_spark.operators.sketch import theta_overlap_matrix

    rows = (
        [("s1", f"k{i}") for i in range(100)]
        + [("s2", f"k{i}") for i in range(50, 150)]
        + [("s3", f"x{i}") for i in range(20)]  # disjoint from s1/s2
    )
    df = spark.createDataFrame(rows, ["src", "key"])
    out = {(r.group_a, r.group_b): r for r in
           theta_overlap_matrix(df, "key", "src").collect()}
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = out[("s1", "s2")]
    assert (r12.n_a, r12.n_b, r12.n_both) == (100, 100, 50)
    assert r12.jaccard == round(50 / 150, 4)
    assert out[("s1", "s3")].n_both == 0 and out[("s1", "s3")].jaccard == 0.0


def test_rolling_distinct_trailing_window(spark):
    import datetime

    from meta_frame_spark.operators.sketch import rolling_distinct

    base = datetime.datetime(2024, 5, 1)
    rows = []
    # hour h sees users {h}, so trailing-3 distinct = min(h+1, 3)
    for h in range(5):
        rows.append((base + datetime.timedelta(hours=h), "a", h))
        rows.append((base + datetime.timedelta(hours=h), "a", h))  # dup
    df = spark.createDataFrame(rows, ["ts", "event_type", "user_id"])
    out = {r.bucket_ts.hour: r.n_distinct for r in rolling_distinct(
        df, ["event_type"], "ts", "user_id", window_buckets=3).collect()}
    assert out == {0: 1, 1: 2, 2: 3, 3: 3, 4: 3}


def test_doremi_domain_weights(spark):
    """Hand-computed 2-domain case, plus the contracts: weights sum
    to 1, the higher-excess domain gains weight monotonically with
    iters, negative excess clips to 0 (no downweight past uniform
    mixing), and validation raises."""
    import math

    import pytest

    from meta_frame_spark.operators.mixing import doremi_domain_weights

    rows = [("a", 1.0)] * 4 + [("b", 0.2)] * 4 + [("c", -1.0)] * 4
    df = spark.createDataFrame(rows, ["dom", "excess"])
    out = {r.dom: r for r in doremi_domain_weights(
        df, "dom", "excess", iters=2, eta=1.0, smoothing=0.2
    ).collect()}
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-12
    # hand-replay
    alpha = [1 / 3] * 3
    clipped = [1.0, 0.2, 0.0]
    for _ in range(2):
        u = [a * math.exp(m) for a, m in zip(alpha, clipped)]
        s = sum(u)
        alpha = [0.8 * x / s + 0.2 / 3 for x in u]
    for d, w in zip(("a", "b", "c"), alpha):
        assert abs(out[d].weight - w) < 1e-12, d
    assert out["a"].weight > out["b"].weight > out["c"].weight
    assert out["c"].mean_excess == -1.0  # reported raw, clipped only in the update
    # more iterations concentrate more on the highest-excess domain
    w3 = {r.dom: r.weight for r in doremi_domain_weights(
        df, "dom", "excess", iters=5, eta=1.0, smoothing=0.2
    ).collect()}
    assert w3["a"] > out["a"].weight
    with pytest.raises(ValueError, match="iters"):
        doremi_domain_weights(df, "dom", "excess", iters=0)
    with pytest.raises(ValueError, match="smoothing"):
        doremi_domain_weights(df, "dom", "excess", smoothing=2.0)
    # a domain whose excess is all NULL (avg -> None) reports 0.0
    # mean_excess instead of a driver TypeError (ADVICE r10)
    nrows = [("a", 1.0), ("b", None), ("b", None)]
    ndf = spark.createDataFrame(nrows, "dom string, excess double")
    nout = {r.dom: r for r in doremi_domain_weights(
        ndf, "dom", "excess", iters=1, eta=1.0, smoothing=0.2
    ).collect()}
    assert nout["b"].mean_excess == 0.0
    assert abs(sum(r.weight for r in nout.values()) - 1.0) < 1e-12


class TestUnimaxAllocation:
    def test_hand_computed_water_fill(self, spark):
        """B=100, caps 2x: sizes 10/20/60 -> 10 is capped at 20, 20
        capped at 40, 60 takes the remaining 40 (< its 120 cap)."""
        from meta_frame_spark.operators.mixing import unimax_allocation

        rows = [("s", i) for i in range(10)] + \
               [("m", i) for i in range(20)] + \
               [("l", i) for i in range(60)]
        df = spark.createDataFrame(rows, "grp string, x long")
        out = {r.grp: r for r in
               unimax_allocation(df, "grp", budget=100.0,
                                 max_epochs=2.0).collect()}
        assert out["s"].alloc == pytest.approx(20.0)
        assert out["s"].epochs == pytest.approx(2.0)
        assert out["m"].alloc == pytest.approx(40.0)
        assert out["l"].alloc == pytest.approx(40.0)
        assert out["l"].epochs == pytest.approx(40 / 60)
        assert sum(r.alloc for r in out.values()) == pytest.approx(100.0)

    def test_uncapped_budget_splits_evenly(self, spark):
        """A small budget never hits any cap -> pure equal shares."""
        from meta_frame_spark.operators.mixing import unimax_allocation

        rows = [("a", 0)] * 50 + [("b", 0)] * 500
        df = spark.createDataFrame(rows, "grp string, x long")
        out = {r.grp: r.alloc for r in
               unimax_allocation(df, "grp", budget=20.0,
                                 max_epochs=1.0).collect()}
        assert out == {"a": pytest.approx(10.0), "b": pytest.approx(10.0)}

    def test_total_capped_by_corpus_epochs(self, spark):
        """Budget beyond max_epochs * corpus just saturates every cap."""
        from meta_frame_spark.operators.mixing import unimax_allocation

        rows = [("a", 0)] * 10 + [("b", 0)] * 30
        df = spark.createDataFrame(rows, "grp string, x long")
        out = unimax_allocation(df, "grp", budget=1e9,
                                max_epochs=3.0).collect()
        assert sum(r.alloc for r in out) == pytest.approx(3.0 * 40)
        assert all(r.epochs == pytest.approx(3.0) for r in out)

    def test_size_expr_and_validation(self, spark):
        import pytest as _pt

        from meta_frame_spark.operators.mixing import unimax_allocation

        df = spark.createDataFrame(
            [("a", 5), ("a", 5), ("b", 30)], "grp string, w long"
        )
        out = {r.grp: r.n_units for r in
               unimax_allocation(df, "grp", budget=10.0,
                                 size_expr="w").collect()}
        assert out == {"a": 10.0, "b": 30.0}
        with _pt.raises(ValueError, match="budget"):
            unimax_allocation(df, "grp", budget=0.0)
        with _pt.raises(ValueError, match="max_epochs"):
            unimax_allocation(df, "grp", budget=1.0, max_epochs=0)

    def test_group_type_and_null_preserved(self, spark):
        """Non-string group values keep their input type (int domain
        ids stay LongType) and a NULL group stays NULL — not the
        string 'None' — so the output joins back to the corpus."""
        from pyspark.sql.types import LongType

        from meta_frame_spark.operators.mixing import unimax_allocation

        rows = [(1, 0)] * 4 + [(2, 0)] * 8 + [(None, 0)] * 2
        df = spark.createDataFrame(rows, "dom long, x long")
        out = unimax_allocation(df, "dom", budget=7.0)
        assert out.schema["dom"].dataType == LongType()
        got = {r.dom: r.n_units for r in out.collect()}
        assert got == {1: 4.0, 2: 8.0, None: 2.0}
        # joinable back to the corpus on the original typed key
        joined = df.join(out, df["dom"].eqNullSafe(out["dom"]))
        assert joined.count() == len(rows)
