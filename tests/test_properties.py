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


# ---------------------------------------------------------------------------
# curation-operator invariants
# ---------------------------------------------------------------------------

texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
)


@_settings
@given(texts=texts, chunk=st.integers(1, 6), stride_frac=st.floats(0.2, 1.0))
def test_chunking_conserves_tokens(spark, texts, chunk, stride_frac):
    """stride == chunk (no overlap): chunk token counts sum to the
    corpus token count, chunks never exceed the window, and every doc
    yields at least one chunk."""
    from meta_frame_spark.operators.chunking import chunk_documents

    stride = max(1, int(chunk * stride_frac))
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    n_tokens = {r.doc_id: len(r.text.split()) for r in df.collect()}
    assert all(r.chunk_n_tokens <= chunk for r in out)
    assert {r.doc_id for r in out} == set(n_tokens)  # no doc lost
    # non-overlapping case: exact token conservation
    if stride == chunk:
        got = {}
        for r in out:
            got[r.doc_id] = got.get(r.doc_id, 0) + r.chunk_n_tokens
        assert got == n_tokens
    # overlap case: every token position is covered by some window
    for d, n in n_tokens.items():
        covered = max(r.chunk_idx * stride + r.chunk_n_tokens
                      for r in out if r.doc_id == d)
        assert covered == n or (n == 0 and covered == 0)


@_settings
@given(cap=st.integers(1, 8), pre=st.booleans())
def test_quota_cap_and_subset(frame, cap, pre):
    from meta_frame_spark.operators.quota import quota_per_group

    out = quota_per_group(
        frame.filter("v1 is not null"), ["g1"], cap,
        priority="v2", tiebreak="v1", prefilter_counts=pre,
    )
    sizes = {r.g1: r.n for r in out.groupBy("g1").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= cap for n in sizes.values())
    # output is a subset of the input rows
    assert out.exceptAll(frame).count() == 0


@_settings
@given(
    gaps=st.lists(st.integers(1, 7200), min_size=1, max_size=10),
    threshold=st.integers(60, 3600),
)
def test_sessionize_ids_contiguous(spark, gaps, threshold):
    """Session ids per user are exactly 1..k in time order, and the
    number of sessions equals 1 + (number of over-threshold gaps)."""
    from meta_frame_spark.operators.temporal import sessionize

    ts, rows = 0, []
    for i, g in enumerate(gaps):
        ts += g
        rows.append((i, 1, ts))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, epoch long"
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    out = sorted(
        (r.event_id, r.session_id)
        for r in sessionize(df, threshold, ["user_id"], tiebreak_col="event_id").collect()
    )
    ids = [s for _, s in out]
    expected_sessions = 1 + sum(1 for g in gaps[1:] if g > threshold)
    assert ids[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))  # contiguous
    assert ids[-1] == expected_sessions


@_settings
@given(lo=st.floats(0.0, 0.4), span=st.floats(0.1, 0.6))
def test_winsorize_bounds_and_count(frame, lo, span):
    from meta_frame_spark.operators.gating import winsorize

    hi = min(1.0, lo + span)
    base = frame.filter("v2 is not null")
    out = winsorize(base, "v2", lo, hi, ["g1"])
    assert out.count() == base.count()  # clipping never drops rows
    joined = out.alias("w").join(
        base.groupBy("g1").agg(F.min("v2").alias("mn"), F.max("v2").alias("mx")),
        "g1",
    )
    assert joined.filter("v2 < mn OR v2 > mx").count() == 0


# ---- newer operators: vocab / weighted sampling / splits / expectations ----

doc_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24), min_size=1, max_size=8
)


@_settings
@given(texts=doc_texts, n=st.integers(1, 3))
def test_vocab_counts_conserve_totals(spark, texts, n):
    """sum(n_occurrences) == total n-grams in the corpus, and document
    frequency never exceeds occurrence count or doc count."""
    from meta_frame_spark.operators.vocab import token_counts

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = token_counts(df, "text", "doc_id", n=n).collect()
    expected_total = sum(
        max(len(t.lower().split()) - n + 1, 0) for t in texts
    )
    assert sum(r.n_occurrences for r in rows) == expected_total
    for r in rows:
        assert 1 <= r.n_docs <= min(r.n_occurrences, len(texts))


@_settings
@given(
    w=st.floats(0.0, 1.0),
    w2=st.floats(0.0, 1.0),
    salt=st.sampled_from(["", "s1", "s2"]),
)
def test_weighted_sample_monotone_in_weight(frame, w, w2, salt):
    """Pointwise-larger weights keep supersets (same salt)."""
    from meta_frame_spark.operators.sampling import weighted_sample

    base = frame.withColumn("rid", F.monotonically_increasing_id())
    lo, hi = sorted([w, w2])
    klo = {r.rid for r in weighted_sample(base, F.lit(lo), "rid", salt).collect()}
    khi = {r.rid for r in weighted_sample(base, F.lit(hi), "rid", salt).collect()}
    assert klo <= khi


@_settings
@given(
    wa=st.floats(0.05, 0.9),
    salt=st.sampled_from(["", "x"]),
    method=st.sampled_from(["xxhash64", "md5"]),
)
def test_hash_split_partitions_every_row_once(frame, wa, salt, method):
    """Any weight vector: labels are complete and from the declared
    set (both hash methods)."""
    from meta_frame_spark.operators.sampling import hash_split

    w = {"a": round(wa, 3), "b": round(1.0 - round(wa, 3), 3)}
    out = hash_split(frame, w, id_col="v1", salt=salt, method=method)
    labels = [r.split for r in out.collect()]
    assert len(labels) == frame.count()
    assert set(labels) <= {"a", "b"}


@_settings
@given(
    vals=st.lists(st.integers(-5, 5), min_size=1, max_size=10),
    lo=st.integers(-3, 0),
    hi=st.integers(1, 4),
)
def test_expectations_range_counts_match_python(spark, vals, lo, hi):
    from meta_frame_spark.operators.expect import check_constraints

    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    rep = check_constraints(
        df, [{"kind": "range", "column": "x", "min": lo, "max": hi, "name": "r"}]
    ).collect()[0]
    assert rep.n_violations == sum(1 for v in vals if v < lo or v > hi)


@_settings
@given(
    k=st.integers(1, 4),
    salt=st.sampled_from(["", "s"]),
    method=st.sampled_from(["xxhash64", "md5"]),
)
def test_sample_k_per_group_size_and_nesting(frame, k, salt, method):
    """Any (k, salt, method): every group returns min(k, group size)
    rows, and the k-sample contains the (k-1)-sample."""
    from meta_frame_spark.operators.sampling import sample_k_per_group

    base = frame.withColumn("rid", F.monotonically_increasing_id())
    got = sample_k_per_group(base, ["g1"], k, "rid", salt, method).collect()
    sizes = {}
    for r in got:
        sizes[r.g1] = sizes.get(r.g1, 0) + 1
    group_sizes = {r.g1: r.n for r in base.groupBy("g1").agg(F.count("*").alias("n")).collect()}
    assert sizes == {g: min(k, n) for g, n in group_sizes.items()}
    if k > 1:
        smaller = {(r.g1, r.rid) for r in
                   sample_k_per_group(base, ["g1"], k - 1, "rid", salt, method).collect()}
        assert smaller <= {(r.g1, r.rid) for r in got}


@_settings
@given(
    span=st.integers(1, 6),
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24), min_size=2, max_size=5
    ),
)
def test_duplicate_spans_matches_python_census(spark, span, texts):
    """Random tiny corpora: the text-keyed span census equals a plain
    python sliding-window count (n_docs >= 2 spans only)."""
    from collections import Counter, defaultdict

    from meta_frame_spark.operators.spans import duplicate_spans

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {r.span_key: (r.n_docs, r.n_occurrences)
           for r in duplicate_spans(df, span_tokens=span, min_docs=2, key="text").collect()}

    occ = Counter()
    docs = defaultdict(set)
    for i, t in enumerate(texts):
        toks = t.split()
        for p in range(len(toks) - span + 1):
            s = " ".join(toks[p : p + span])
            occ[s] += 1
            docs[s].add(i)
    expect = {s: (len(docs[s]), occ[s]) for s in occ if len(docs[s]) >= 2}
    assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    epoch=st.integers(min_value=0, max_value=3),
    n_shards=st.sampled_from([1, 4, 8]),
    method=st.sampled_from(["md5", "xxhash64"]),
)
def test_epoch_shuffle_shards_and_gapless_pos(frame, epoch, n_shards, method):
    from meta_frame_spark.operators.sampling import epoch_shuffle

    out = epoch_shuffle(
        frame, "v1", epoch=epoch, n_shards=n_shards, method=method
    ).select("v1", "shard", "pos").collect()
    assert len(out) == frame.count()
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < n_shards
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_epoch_shuffle_redeal_and_determinism(spark):
    from meta_frame_spark.operators.sampling import epoch_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")

    def snap(epoch):
        return {
            r.doc_id: (r.shard, r.pos)
            for r in epoch_shuffle(df, "doc_id", epoch=epoch, n_shards=4)
            .collect()
        }

    # same epoch reproduces bit-for-bit (incl. across a repartition)
    assert snap(1) == {
        r.doc_id: (r.shard, r.pos)
        for r in epoch_shuffle(
            df.repartition(7), "doc_id", epoch=1, n_shards=4
        ).collect()
    }
    # a new epoch re-deals most assignments
    a, b = snap(1), snap(2)
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 150


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    k=st.integers(min_value=1, max_value=4),
    salt=st.sampled_from(["", "s1", "s2"]),
    method=st.sampled_from(["md5", "xxhash64"]),
)
def test_negative_pairs_no_self_and_deterministic(spark, k, salt, method):
    from meta_frame_spark.operators.sampling import negative_pairs

    df = spark.range(50).withColumnRenamed("id", "doc_id")
    out = negative_pairs(df, "doc_id", k=k, salt=salt, method=method).collect()
    assert len(out) == 50 * k
    for r in out:
        assert 0 <= r.neg_id < 50
        assert r.neg_id != r.doc_id  # self-partner always bumped
    again = negative_pairs(
        df.repartition(7), "doc_id", k=k, salt=salt, method=method
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_pairs_salt_redraws(spark):
    from meta_frame_spark.operators.sampling import negative_pairs

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {(r.doc_id, r.pair_rank): r.neg_id
         for r in negative_pairs(df, "doc_id", k=2, salt="e1").collect()}
    b = {(r.doc_id, r.pair_rank): r.neg_id
         for r in negative_pairs(df, "doc_id", k=2, salt="e2").collect()}
    assert sum(1 for key in a if a[key] != b[key]) > 300  # most redraw


def test_text_keyed_split_coassigns_exact_copies(spark):
    """The dedup_safe_split composition: hashing the split coin from
    the CONTENT guarantees byte-identical copies share a split (the
    shipped corpus has no exact copies, so the invariant is pinned
    here with planted ones)."""
    from meta_frame_spark.operators.sampling import hash_split

    rows = [(i, f"unique doc {i}") for i in range(50)]
    rows += [(100 + j, "the same leaked document") for j in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = hash_split(
        df, {"train": 0.8, "test": 0.2}, id_col="text",
        salt="r4", method="md5",
    )
    per_text = {
        r.text: r.n
        for r in out.groupBy("text").agg(
            F.count_distinct("split").alias("n")).collect()
    }
    assert all(n == 1 for n in per_text.values())
    # and the copies all landed together
    splits = {r.split for r in
              out.filter("text = 'the same leaked document'").collect()}
    assert len(splits) == 1


@_settings
@given(
    mass=st.floats(min_value=0.1, max_value=1.0),
    scores=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                    max_size=12),
)
def test_top_mass_budget_is_tight_and_minimal(spark, mass, scores):
    from meta_frame_spark.operators.gating import top_mass_per_group

    df = spark.createDataFrame(
        [("g", i, s) for i, s in enumerate(scores)], ["g", "doc_id", "score"]
    )
    kept = sorted(
        (r.score, r.doc_id)
        for r in top_mass_per_group(df, ["g"], "score", mass=mass,
                                    tiebreak="doc_id").collect()
    )
    total = sum(scores)
    kept_mass = sum(s for s, _ in kept)
    assert len(kept) >= 1                      # non-empty group keeps >= 1
    if total > 0:
        assert kept_mass >= mass * total       # budget reached
        # minimality: dropping the lowest-ranked kept row goes under
        assert kept_mass - kept[0][0] < mass * total
    else:
        assert len(kept) == 1                  # all-zero: rank-1 only


@_settings
@given(texts=st.lists(
    st.text(alphabet="abc .!?", min_size=0, max_size=30),
    min_size=1, max_size=6,
))
def test_split_sentences_conserves_content(spark, texts):
    """Joining the sentences back (sans separators/whitespace) must
    equal the original text sans terminators/whitespace — nothing is
    lost or invented by segmentation."""
    import re

    from meta_frame_spark.functions.text import split_sentences

    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    out = [r.s for r in df.select(split_sentences("t").alias("s")).collect()]
    for original, sents in zip(texts, out):
        strip = lambda x: re.sub(r"[\s.!?]+", "", x)
        assert strip("".join(sents)) == strip(original)


@_settings
@given(k=st.integers(min_value=1, max_value=8),
       salt=st.text(alphabet="abc", max_size=3),
       method=st.sampled_from(["xxhash64", "md5"]))
def test_weighted_sample_k_size_nesting_eligibility(frame, k, salt, method):
    """ES sampling: exactly min(k, eligible) per group; the k-sample is
    a prefix of the (k+1)-sample; ineligible (null/<=0 weight) rows
    never appear."""
    from meta_frame_spark.operators.sampling import weighted_sample_k

    w = (F.col("v2") - 25.0)  # mixes positive, negative, and null
    out = weighted_sample_k(frame, k, w, "v1", group_cols=["g1"],
                            salt=salt, method=method)
    rows = out.collect()
    elig = [(r.g1, r.v1) for r in frame.collect()
            if r.v2 is not None and r.v2 - 25.0 > 0]
    per_g = {}
    for g, _ in elig:
        per_g[g] = per_g.get(g, 0) + 1
    got = {}
    for r in rows:
        got[r.g1] = got.get(r.g1, 0) + 1
        assert (r.g1, r.v1) in elig
    assert got == {g: min(k, n) for g, n in per_g.items()}
    bigger = {(r.g1, r.v1) for r in weighted_sample_k(
        frame, k + 1, w, "v1", group_cols=["g1"], salt=salt,
        method=method).collect()}
    assert {(r.g1, r.v1) for r in rows} <= bigger


@_settings
@given(frac=st.floats(min_value=0.0, max_value=1.0),
       salt=st.text(alphabet="ab", max_size=2))
def test_stratified_exact_counts_and_nesting(frame, frac, salt):
    import math

    from meta_frame_spark.operators.sampling import stratified_sample_exact

    out = stratified_sample_exact(frame, "g1", frac, "v1", salt=salt)
    sizes = {r.g1: r.n for r in frame.groupBy("g1").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = {r.g1: r.n for r in out.groupBy("g1").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    want = {g: math.ceil(frac * n) for g, n in sizes.items()}
    assert got == {g: n for g, n in want.items() if n > 0}
    smaller = {r.v1 for r in out.collect()}
    larger = {r.v1 for r in stratified_sample_exact(
        frame, "g1", min(1.0, frac + 0.3), "v1", salt=salt).collect()}
    assert smaller <= larger


@_settings
@given(vals=st.lists(st.floats(min_value=-50, max_value=50,
                               allow_nan=False), min_size=2, max_size=12))
def test_quantile_match_output_is_pooled_values(spark, vals):
    """Calibrated values are drawn FROM the pooled empirical values,
    and group-internal order never changes."""
    from meta_frame_spark.operators.ranking import quantile_match

    rows = [("g%d" % (i % 2), i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    out = quantile_match(df, "v", ["g"], "id").collect()
    pooled = {float(v) for v in vals}
    assert all(r.v_cal in pooled for r in out)
    for g in {r.g for r in out}:
        grp = sorted([(r.v, r.id, r.v_cal) for r in out if r.g == g])
        cal_in_value_order = [c for _, _, c in grp]
        assert cal_in_value_order == sorted(cal_in_value_order)


@_settings
@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=20),
                      min_size=1, max_size=6))
def test_pmi_marginals_conserve_pair_mass(spark, texts):
    """n_left sums over a word's surviving+filtered pairs: for every
    output row, n_pair <= min(n_left, n_right), and PMI is finite."""
    import math

    from meta_frame_spark.operators.vocab import pmi_collocations

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = pmi_collocations(df, k=50, min_count=1).collect()
    for r in rows:
        assert r.n_pair <= min(r.n_left, r.n_right)
        assert math.isfinite(r.pmi)
    # ranks are 1..n in pmi-desc order
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


@_settings
@given(vals=st.lists(st.floats(min_value=-100, max_value=100,
                               allow_nan=False), min_size=1, max_size=20),
       parts=st.integers(1, 5))
def test_running_total_matches_sequential_cumsum(spark, vals, parts):
    """The two-phase distributed prefix sum equals the sequential
    cumulative sum for any values and any partitioning (float sums
    compared with tolerance; ids give the deterministic total order)."""
    from meta_frame_spark.operators.ids import running_total

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(parts)
    got = {
        r.id: r.running_total
        for r in running_total(df, ["id"], "v",
                               num_partitions=parts).collect()
    }
    acc = 0.0
    for i, v in enumerate(vals):
        acc += float(v)
        assert abs(got[i] - acc) < 1e-6 * max(1.0, abs(acc))


@_settings
@given(vals=st.lists(st.floats(min_value=-50, max_value=50,
                               allow_nan=False), min_size=1, max_size=16),
       k=st.integers(1, 4))
def test_rrf_partitioned_equals_window_mode(spark, vals, k):
    """rank_mode="partitioned" is byte-identical to the window mode on
    arbitrary score lists (ties and duplicates included)."""
    from meta_frame_spark.operators.ranking import rrf_fuse

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    a = sorted(tuple(r) for r in rrf_fuse(df, ["s"], k=60 * k).collect())
    b = sorted(
        tuple(r)
        for r in rrf_fuse(
            df.repartition(3), ["s"], k=60 * k, rank_mode="partitioned"
        ).collect()
    )
    assert a == b


@_settings
@given(vals=st.lists(st.floats(min_value=0, max_value=40,
                               allow_nan=False), min_size=2, max_size=16))
def test_quantile_match_bucketed_within_one_grid_step(spark, vals):
    """With relative_error=0 the bucketed calibration lands within one
    grid cell of the exact calibration for every row."""
    from meta_frame_spark.operators.ranking import quantile_match

    B = 8
    rows = [("g%d" % (i % 2), i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    e = {r.id: r.v_cal for r in quantile_match(df, "v", ["g"], "id").collect()}
    b = {
        r.id: r.v_cal
        for r in quantile_match(
            df, "v", ["g"], "id", mode="bucketed", n_buckets=B,
            relative_error=0.0,
        ).collect()
    }
    sv = sorted(float(v) for v in vals)
    # max gap between adjacent pooled values bounds one grid step;
    # the grid rounds p by at most 1/(2B) + the exact index rounds by
    # half a rank, so allow two adjacent-value gaps of slack
    import bisect

    for i in e:
        if e[i] == b[i]:
            continue
        lo, hi = sorted((e[i], b[i]))
        # pooled values STRICTLY between the two calibrations (tie
        # blocks at either end are not separation) span <= N/B + 2
        between = max(0, bisect.bisect_left(sv, hi) - bisect.bisect_right(sv, lo))
        assert between <= len(sv) // B + 2


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=2,
        max_size=24,
    )
)
def test_quantile_match_null_contract_exact_mode(spark, vals):
    """Round-10 null contract (ADVICE r9): in exact mode EVERY null
    value calibrates to NULL, EVERY non-null value calibrates to a
    pooled non-null value, and within each group the calibration is
    monotone over the non-null rows."""
    from meta_frame_spark.operators.ranking import quantile_match

    rows = [
        ("g%d" % (i % 2), i, float(v) if v is not None else None)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = quantile_match(df, "v", ["g"], "id").collect()
    assert len(out) == len(rows)
    nonnull_pool = sorted(float(v) for v in vals if v is not None)
    by_group: dict = {}
    for r in out:
        if r.v is None:
            assert r.v_cal is None
        else:
            assert r.v_cal is not None and float(r.v_cal) in nonnull_pool
            by_group.setdefault(r.g, []).append((float(r.v), r.id, float(r.v_cal)))
    for rows_g in by_group.values():
        rows_g.sort()
        cals = [c for _, _, c in rows_g]
        assert cals == sorted(cals)  # monotone within group


_line_st = st.text(
    alphabet=st.sampled_from(list("abc de.!?#{-*•…\"")),
    min_size=0, max_size=30,
)
_page_st = st.lists(_line_st, min_size=0, max_size=6).map("\n".join)


@_settings
@given(pages=st.lists(_page_st, min_size=1, max_size=6))
def test_round11_text_reports_reference_replay(spark, pages):
    """Round-11 rule reports vs a pure-Python replay of the frozen
    definitions on random punctuation/bullet-heavy pages: gopher
    n_words/stop_hits, repetition dup_line fractions, and the C4
    kept-line predicate all agree exactly; every report is row-stable
    (one output row per input row) and flags are booleans."""
    import re

    from meta_frame_spark.functions.text import (
        with_c4_clean,
        with_gopher_rules,
        with_repetition_rules,
    )

    rows = list(enumerate(pages)) + [(len(pages), None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    g = {r.doc_id: r for r in with_gopher_rules(df).collect()}
    rep = {r.doc_id: r for r in with_repetition_rules(df).collect()}
    c4 = {r.doc_id: r for r in with_c4_clean(df).collect()}
    assert len(g) == len(rep) == len(c4) == len(rows)

    req = {"the", "be", "to", "of", "and", "that", "have", "with"}
    for i, t in rows:
        if t is None:
            assert g[i].n_words is None and rep[i].dup_line_frac is None
            assert c4[i].c4_text is None
            continue
        toks = re.findall(r"\S+", t, re.ASCII)
        assert g[i].n_words == len(toks)
        assert g[i].stop_hits == len(
            req & {w.lower() for w in toks}
        )
        lines = [l.strip() for l in t.split("\n") if l.strip()]
        n, nd = len(lines), len(set(lines))
        want_dl = round((n - nd) / n, 6) if n else 0.0
        assert rep[i].dup_line_frac == want_dl
        kept = [
            l for l in lines
            if re.search(r'[.!?]["”]?$', l)
            and len(re.findall(r"\S+", l, re.ASCII)) >= 3
            and "javascript" not in [
                w.lower() for w in re.findall(r"\S+", l, re.ASCII)
            ]
        ]
        assert c4[i].c4_text == "\n".join(kept)
        assert c4[i].n_lines == n and c4[i].n_lines_kept == len(kept)
        assert c4[i].has_curly_brace == ("{" in t)
        for flag in (g[i].gopher_pass, rep[i].repetition_pass,
                     c4[i].c4_pass):
            assert isinstance(flag, bool)


_moji_targets = st.text(
    alphabet=st.sampled_from(
        list("abc 123") + ["é", "ü", "ñ", "«", "»", "°",
                           "‘", "’", "“", "–", "—", "…", "•", "€", "™"]
    ),
    min_size=0, max_size=40,
)


@_settings
@given(targets=st.lists(_moji_targets, min_size=1, max_size=8))
def test_fix_encoding_roundtrip_property(spark, targets):
    """For any string over the repairable alphabet, UTF-8-as-cp1252
    corruption followed by fix_encoding is the identity — including
    adjacent mojibake sequences, where a cross-boundary false match
    would corrupt the repair (the longest-first order must prevent
    it)."""
    corrupted = [t.encode("utf-8").decode("cp1252") for t in targets]
    from meta_frame_spark.functions.text import fix_encoding

    df = spark.createDataFrame(
        list(enumerate(corrupted)), "i long, text string"
    )
    got = {
        r.i: r.fixed
        for r in df.select("i", fix_encoding("text").alias("fixed")).collect()
    }
    for i, want in enumerate(targets):
        assert got[i] == want, (i, corrupted[i], got[i], want)


@_settings
@given(
    texts=st.lists(
        st.text(
            alphabet=list("abcdef .!?"), min_size=0, max_size=60
        ),
        min_size=1, max_size=6,
    ),
    n_sent=st.integers(min_value=1, max_value=4),
    stride_frac=st.floats(min_value=0.25, max_value=1.0),
)
def test_sentence_passages_python_replay(spark, texts, n_sent, stride_frac):
    """sentence_passages == a pure-Python replay of the frozen
    segmentation and the chunk_documents window rule, on arbitrary
    punctuation-bearing strings."""
    import re

    from meta_frame_spark.operators.chunking import sentence_passages

    stride = max(1, int(n_sent * stride_frac))
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.passage_idx): (r.passage, r.passage_n_sentences)
        for r in sentence_passages(
            df, n_sentences=n_sent, stride=stride
        ).collect()
    }

    want = {}
    for i, t in enumerate(texts):
        sents = [s.strip() for s in re.findall(r"[^.!?]+[.!?]*", t)]
        sents = [s for s in sents if s]
        n = len(sents)
        n_full = (n - n_sent) // stride + 1 if n >= n_sent else 0
        covered = (n_full - 1) * stride + n_sent
        n_windows = n_full + (
            1 if (n_full > 0 and covered < n) or (n_full == 0 and n > 0)
            else 0
        )
        for w in range(n_windows):
            piece = sents[w * stride: w * stride + n_sent]
            want[(i, w)] = (" ".join(piece), len(piece))
    assert got == want


@_settings
@given(
    texts=st.lists(
        st.text(alphabet=list("ab c"), min_size=0, max_size=40),
        min_size=1, max_size=8,
    ),
    weights=st.fixed_dictionaries(
        {}, optional={"a": st.floats(0.5, 3), "ab": st.floats(0.5, 3),
                      "c": st.floats(0.5, 3)},
    ),
)
def test_blocklist_score_python_replay(spark, texts, weights):
    """with_blocklist_score == a pure-Python weighted-hit replay on
    arbitrary whitespace-token strings."""
    from meta_frame_spark.functions.text import with_blocklist_score

    if not weights:
        weights = {"a": 1.0}
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.bl_score, r.bl_hits, r.blocklist_pass)
        for r in with_blocklist_score(
            df, blocklist=weights, max_score=2.0
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = [w.lower() for w in t.split()]
        score = sum(weights.get(w, 0.0) for w in toks)
        hits = sum(1 for w in toks if w in weights)
        assert got[i][0] == pytest.approx(score)
        assert got[i][1] == hits
        assert got[i][2] == (score < 2.0)


@_settings
@given(
    dups=st.lists(st.integers(min_value=1, max_value=4),
                  min_size=1, max_size=5),
    alpha=st.floats(min_value=0.25, max_value=1.0),
)
def test_soft_dedup_weights_python_replay(spark, dups, alpha):
    """Every cluster of n copies gets weight (1/n)^alpha on all
    members; total weight at alpha=1 equals the cluster count."""
    from meta_frame_spark.operators.dedup import soft_dedup_weights

    rows, nid = [], 0
    for ci, n in enumerate(dups):
        for _ in range(n):
            rows.append((nid, f"cluster {ci} text"))
            nid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.dup_count, r.weight)
           for r in soft_dedup_weights(df, alpha=alpha).collect()}
    nid = 0
    for ci, n in enumerate(dups):
        for _ in range(n):
            assert got[nid][0] == n
            assert got[nid][1] == pytest.approx((1.0 / n) ** alpha)
            nid += 1


@_settings
@given(
    urls=st.lists(
        st.builds(
            lambda host, segs, params, frag: (
                "https://" + host + "/" + "/".join(segs)
                + ("?" + "&".join(params) if params else "")
                + ("#" + frag if frag else "")
            ),
            st.sampled_from(["ex.com", "a.io"]),
            st.lists(st.sampled_from(
                ["p", "2021", "07", "14", "x9", "0",
                 "page;jsessionid=C0FFEE"]), max_size=6),
            st.lists(st.sampled_from(
                ["a=1", "b=2", "sid=9", "PHPSESSID=z",
                 "c=3;jsessionid=d"]), max_size=5),
            st.sampled_from(["", "frag"]),
        ),
        min_size=1, max_size=8,
    ),
)
def test_url_quality_python_replay(spark, urls):
    """with_url_quality == a pure-Python replay of the frozen
    fragment/query/path splits and every tell, on generated URLs
    mixing numeric archive segments, session params, and fragments."""
    import re

    from meta_frame_spark.functions.web import with_url_quality

    df = spark.createDataFrame(
        list(enumerate(urls)), "doc_id long, url string"
    )
    got = {r.doc_id: r for r in with_url_quality(
        df, max_params=3, max_depth=4).collect()}
    for i, u in enumerate(urls):
        ff = u.split("#")[0]
        m = re.search(r"\?(.*)$", ff)
        qs = m.group(1) if m else ""
        pm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", ff)
        path = pm.group(1) if pm else ""
        params = [p for p in qs.split("&") if p]
        segs = [s for s in path.split("/") if s]
        sess = bool(re.search(
            r"(^|&|;)(sid|sessionid|session_id|phpsessid|jsessionid)=",
            (path + "&" + qs).lower()))
        trap = "111" in "".join(
            "1" if re.fullmatch(r"[0-9]+", s) else "0" for s in segs)
        r = got[i]
        assert r.n_params == len(params), u
        assert r.path_depth == len(segs), u
        assert r.has_session_id == sess, u
        assert r.is_calendar_trap == trap, u
        assert r.url_pass == (
            len(u) <= 2048 and len(params) <= 3 and len(segs) <= 4
            and not sess and not trap), u
