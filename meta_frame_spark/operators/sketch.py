"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark SQL since 3.5).

Not present in the reference (its agg surface stops at
sum/max/min/count/avg — SURVEY.md §2.4); this is the incremental-corpus
pattern a 100 TB pipeline needs: exact ``COUNT(DISTINCT)`` over an
ever-growing corpus re-scans everything, while an HLL sketch is a
small fixed-size binary state that (a) aggregates in one pass with
map-side partial merge, (b) UNIONs associatively across daily/batch
increments without touching history rows, and (c) estimates with
~1-2 % relative error at lgConfigK = 12 (4 KB per group).

All three stages are native Spark expressions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate) — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``'s distinct values:
    ``(group_cols..., sketch binary)``. One hash-shuffle aggregate with
    map-side partial sketches — the sketch, not the values, crosses the
    wire."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(sketch_col)
    )


def merge_cardinality_sketches(
    parts: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union per-group sketches across increments (days, shards,
    backfills): input holds one sketch row per (group, increment);
    output one merged sketch per group. Associative and
    re-aggregatable — a year rolls up from daily sketches without
    re-reading any raw data."""
    return parts.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def estimate_distinct(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Read the cardinality estimate out of each sketch row (map-only)."""
    return sketches.withColumn(
        estimate_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)


def incremental_distinct(
    history_sketches: DataFrame,
    new_batch: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One incremental maintenance step: sketch the new batch, union it
    into the persisted per-group history sketches, return the refreshed
    sketch table (same shape — write it back over the history). Cost is
    one scan of the BATCH only; history participates as sketch bytes."""
    batch = cardinality_sketch(new_batch, group_cols, value_col, lg_config_k, sketch_col)
    both = history_sketches.select(*group_cols, sketch_col).unionByName(batch)
    return merge_cardinality_sketches(both, group_cols, sketch_col)


def theta_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 20,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group Theta sketch of ``value_col``'s distinct values.

    Theta is the set-algebra sibling of HLL: same one-pass mergeable
    shape, but sketches also support INTERSECTION and DIFFERENCE —
    "users in A and B", "docs in this crawl but not the last" — which
    HLL cannot answer. Exact below ~2^lg_k retained entries (lg_k=20
    -> exact to ~1M distinct per group), estimating beyond. Costs more
    bytes than HLL at equal error, so keep HLL for pure counts.
    """
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def theta_set_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lg_k: int = 20,
) -> DataFrame:
    """One-row set-overlap report between two keysets: distinct counts
    of each side plus union / intersection / each-side-only, all read
    from two Theta sketches. Each side is one map-side-combined
    aggregate collapsing to a single sketch row; the combine is a
    1x1 broadcast nested-loop join of sketch bytes (scalar attach, not
    a data join). Returns
    ``(n_a, n_b, n_union, n_both, n_only_a, n_only_b)`` as longs —
    exact while each side's distinct count stays under ~2^lg_k.
    """
    sa = df_a.agg(F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("_sa"))
    sb = df_b.agg(F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("_sb"))
    est = F.theta_sketch_estimate
    return (
        sa.crossJoin(F.broadcast(sb))
        .select(
            est(F.col("_sa")).alias("n_a"),
            est(F.col("_sb")).alias("n_b"),
            est(F.theta_union(F.col("_sa"), F.col("_sb"))).alias("n_union"),
            est(F.theta_intersection(F.col("_sa"), F.col("_sb"))).alias("n_both"),
            est(F.theta_difference(F.col("_sa"), F.col("_sb"))).alias("n_only_a"),
            est(F.theta_difference(F.col("_sb"), F.col("_sa"))).alias("n_only_b"),
        )
    )


def kll_quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 800,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group KLL doubles sketch of ``value_col`` — the mergeable
    quantile state. Same incremental pattern as the HLL/Theta
    cardinality sketches: one map-side-combined aggregate, a small
    binary per group, daily sketches roll up without re-reading
    history. ``k`` trades size for rank accuracy (~1.65% normalized
    rank error at the default 200; k=800 halves it twice)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias(sketch_col)
    )


def merge_kll_sketches(
    parts: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union per-group KLL sketches across increments. Spark ships only
    a pairwise ``kll_sketch_merge_double`` (no aggregate form), so the
    per-group merge folds a ``collect_list`` of sketch blobs with the
    ``aggregate`` higher-order function — fine at any group count
    because each group's list holds one small blob per INCREMENT, not
    per row."""
    arr = F.collect_list(sketch_col)
    merged = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )
    return parts.groupBy(*group_cols).agg(merged.alias(sketch_col))


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    group_cols: list[str] | None = None,
    k: int = 800,
) -> DataFrame:
    """Quantile estimates at each probability in ``probs`` from one
    pass over ``value_col``: ``(*group_cols, prob, est)``. Unlike
    ``percentile_approx`` this exposes the underlying MERGEABLE sketch
    family (see :func:`kll_quantile_sketch`) — the same state answers
    quantiles, ranks (``kll_sketch_get_rank_double``) and unions
    across batches."""
    if not probs:
        raise ValueError("probs must be non-empty")
    group_cols = list(group_cols or [])
    sk = kll_quantile_sketch(df, group_cols, value_col, k) if group_cols else (
        df.agg(F.kll_sketch_agg_double(value_col, F.lit(k)).alias("sketch"))
    )
    # the quantile argument must be foldable, so build one struct per
    # prob (literal inside) and explode the array of results
    pe = F.explode(F.array(*[
        F.struct(
            F.lit(float(p)).alias("prob"),
            F.kll_sketch_get_quantile_double(
                "sketch", F.lit(float(p))
            ).alias("est"),
        )
        for p in probs
    ])).alias("pe")
    return sk.select(*group_cols, pe).select(
        *group_cols, "pe.prob", "pe.est"
    )


def theta_overlap_matrix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    lg_k: int = 20,
) -> DataFrame:
    """Pairwise distinct-key overlap across every group in one pass:
    ``(group_a, group_b, n_a, n_b, n_both, jaccard)`` for each
    unordered group pair — the corpus cross-contamination matrix
    ("how much vocabulary / how many users do sources share"). One
    sketch aggregate over the data, then a G×G cross join of SKETCH
    ROWS only (G groups, each row a few KB) — the data itself is
    touched once regardless of how many pairs come out. Exact while
    each group's distinct count stays under ~2^lg_k."""
    sk = theta_sketch(df, [group_col], key_col, lg_k)
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("_sa")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("_sb")
    )
    est = F.theta_sketch_estimate
    n_a = est(F.col("_sa"))
    n_b = est(F.col("_sb"))
    n_both = est(F.theta_intersection(F.col("_sa"), F.col("_sb")))
    union = n_a + n_b - n_both
    return (
        a.crossJoin(b)
        .filter(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            n_a.alias("n_a"),
            n_b.alias("n_b"),
            n_both.alias("n_both"),
            F.when(union > 0, F.round(n_both / union, 4))
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def rolling_distinct(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    window_buckets: int = 3,
    lg_k: int = 20,
) -> DataFrame:
    """Trailing-window distinct counts from mergeable sketches:
    ``(*group_cols, bucket_ts, n_distinct)`` where each row counts the
    distinct ``value_col`` over the last ``window_buckets`` EXISTING
    buckets of its group (rows-based frame — run
    :func:`..temporal.bucket_spine` upstream if silent buckets should
    count as empty). The raw data is sketched ONCE per bucket; every
    window answer is a sketch union, so widening the window or adding
    new windows never re-scans history — the thing a naive
    ``COUNT(DISTINCT)`` over a sliding self-join cannot avoid. Exact
    while per-window distincts stay under ~2^lg_k."""
    from pyspark.sql import Window

    bucket_ts = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    sk = df.groupBy(*group_cols, bucket_ts).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("_sk")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket_ts")
        .rowsBetween(-(window_buckets - 1), 0)
    )
    return sk.select(
        *group_cols,
        "bucket_ts",
        F.theta_sketch_estimate(
            F.theta_union_agg("_sk", F.lit(lg_k)).over(w)
        ).alias("n_distinct"),
    )
