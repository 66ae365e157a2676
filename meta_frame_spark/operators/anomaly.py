"""Volume-anomaly detection over event streams.

The monitoring half of a data pipeline: flag time buckets whose event
count is a statistical outlier for its group (a scraper burst, a
dropped feed, a bot spike) BEFORE the batch ships to training. Not in
the reference (no time surface there, SURVEY.md §2) — north-star scope
alongside the temporal operators.

Scale shape: one groupBy((group, bucket)) shuffle over skinny rows;
the per-group baseline is an aggregate over the *bucket-count* frame —
buckets-per-group rows, thousands at most — broadcast-joined back.
Nothing beyond the first count ever touches row-grain data, so 100 TB
of events costs one map-side-combined count shuffle.

For always-on detection, the same bucket counts come from the
streaming twin (``meta_frame_spark.streaming`` tumbling windows) and
the baseline from a slowly-refreshed batch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    bucket: str = "hour",
    z_threshold: float = 3.0,
    min_buckets: int = 3,
    robust: bool = False,
    round_to: int = 4,
) -> DataFrame:
    """Buckets whose event count deviates from the group baseline by
    ``>= z_threshold`` dispersion units. Returns
    ``(*group_cols, bucket_ts, n, z)``, ``z`` rounded and signed (a
    spike is positive, a gap negative — a *missing* bucket is not
    emitted; feed a calendar spine upstream to catch total silence).

    ``robust=False``: classic z-score ``(n - mean) / stddev_samp``.
    ``robust=True``: median/MAD z ``0.6745 * (n - median) / mad`` —
    immune to the anomaly polluting its own baseline (one huge spike
    inflates the stddev and can hide itself; it barely moves the MAD).

    Groups with fewer than ``min_buckets`` buckets or zero dispersion
    are skipped (a baseline estimated from 1-2 points flags noise).
    """
    group_cols = list(group_cols or ["event_type"])
    bucket_ts = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    counts = df.groupBy(*group_cols, bucket_ts).agg(
        F.count(F.lit(1)).alias("n")
    )
    return flag_count_anomalies(
        counts, group_cols, z_threshold=z_threshold,
        min_buckets=min_buckets, robust=robust, round_to=round_to,
    )


def flag_count_anomalies(
    counts: DataFrame,
    group_cols: list[str],
    z_threshold: float = 3.0,
    min_buckets: int = 3,
    robust: bool = False,
    round_to: int = 4,
) -> DataFrame:
    """The baseline-and-flag half of :func:`count_anomalies`, taking
    pre-bucketed counts ``(*group_cols, bucket_ts, n)`` — so the same
    scoring runs over batch buckets OR a drained Structured Streaming
    windowed count (the streaming twin computes counts incrementally;
    this flags them against the group baseline)."""
    if robust:
        med = counts.groupBy(*group_cols).agg(
            F.median("n").alias("_mu"), F.count(F.lit(1)).alias("_nb")
        )
        # MAD collapses to 0 whenever >50% of buckets share one count
        # (a flat baseline with one spike — exactly the case robust
        # mode exists for), so fall back to the average absolute
        # deviation with its own normal-consistency constant.
        stats = (
            counts.join(F.broadcast(med), group_cols)
            .groupBy(*group_cols)
            .agg(
                F.first("_mu").alias("_mu"),
                F.first("_nb").alias("_nb"),
                F.median(F.abs(F.col("n") - F.col("_mu"))).alias("_mad"),
                F.avg(F.abs(F.col("n") - F.col("_mu"))).alias("_aad"),
            )
        )
        dev = F.col("n") - F.col("_mu")
        z = (
            F.when(F.col("_mad") > 0, F.lit(0.6745) * dev / F.col("_mad"))
            .when(F.col("_aad") > 0, F.lit(0.7979) * dev / F.col("_aad"))
        )
    else:
        stats = counts.groupBy(*group_cols).agg(
            F.avg("n").alias("_mu"),
            F.stddev_samp("n").alias("_disp"),
            F.count(F.lit(1)).alias("_nb"),
        )
        z = F.when(
            F.col("_disp") > 0, (F.col("n") - F.col("_mu")) / F.col("_disp")
        )
    return (
        counts.join(F.broadcast(stats), group_cols)
        .filter(
            (F.col("_nb") >= min_buckets)
            & z.isNotNull()
            & (F.abs(z) >= z_threshold)
        )
        .select(
            *group_cols, "bucket_ts", "n", F.round(z, round_to).alias("z")
        )
    )
