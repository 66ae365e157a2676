#!/usr/bin/env python
"""Event-stream monitoring with meta_frame_spark.

The always-on half of a data pipeline: watch ingest volume per event
type and surface what a human should look at — silent feeds, volume
spikes, slow drifts. Every stage is a lazy DataFrame transform over
bucket-grain rows, so the whole report costs one count shuffle of the
raw events no matter how many detectors read it:

    raw events
      -> hourly counts per type        (one map-side-combined count)
      -> bucket-spine densification    (silent hours become n=0 rows)
      -> EWMA smoothing                (per-type trend baseline)
      -> anomaly flags                 (MAD-robust z on the dense series)
      -> OLS drift per type            (slope of volume over time)
      -> hot-key report                (which users dominate volume)

The same hourly counts can come from the Structured Streaming twin
(meta_frame_spark.streaming hourly_event_counts) with this exact
scoring tail — see q_stream_anomaly in __spark_entry__.py.

Run:  python examples/monitor_events.py [sf_dir]
Default: /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def monitor(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build the monitoring report frames (all lazy)."""
    from meta_frame_spark.operators.anomaly import flag_count_anomalies
    from meta_frame_spark.operators.skew import key_skew_report
    from meta_frame_spark.operators.stats import group_trend
    from meta_frame_spark.operators.temporal import bucket_spine, ewma
    from meta_frame_spark.sources.events import load_events

    events = load_events(spark, f"{sf_dir}/events.parquet")
    counts = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    dense = bucket_spine(counts, ["event_type"])

    smoothed = ewma(dense, ["event_type"], "bucket_ts", "n", alpha=0.3)
    anomalies = flag_count_anomalies(
        dense, ["event_type"], z_threshold=3.0, robust=True
    )
    drift = group_trend(
        dense.select(
            "event_type",
            F.unix_timestamp("bucket_ts").cast("double").alias("x"),
            F.col("n").cast("double").alias("y"),
        ),
        ["event_type"], "x", "y",
    )
    hot_keys = key_skew_report(events, ["user_id"], top_n=10)
    return {
        "dense_counts": dense,
        "smoothed": smoothed,
        "anomalies": anomalies,
        "drift": drift,
        "hot_keys": hot_keys,
    }


def main() -> None:
    from meta_frame_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="monitor-events")
    spark.sparkContext.setLogLevel("ERROR")
    report = monitor(spark, sf_dir)
    print(f"dense hourly buckets: {report['dense_counts'].count()}")
    print("-- volume anomalies (MAD-robust |z| >= 3) --")
    report["anomalies"].orderBy(F.abs(F.col("z")).desc()).show(10, False)
    print("-- per-type drift (OLS slope of hourly volume) --")
    report["drift"].orderBy("event_type").show(10, False)
    print("-- hottest keys --")
    report["hot_keys"].show(10, False)
    spark.stop()


if __name__ == "__main__":
    main()
