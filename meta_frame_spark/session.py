"""SparkSession factory (reference: one-off builders at optimus.py:35,
megatron.py:62, sparks/optimus.py:5 — here a single config-driven factory).

Defaults are chosen for scale: AQE on (runtime re-planning, skew-join
splitting, broadcast conversion), Arrow for any pandas interchange, and a
shuffle-partition count that callers size to the cluster. On a real
cluster, pass ``master=None`` so spark-submit's conf wins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "meta_frame_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    In local testing, ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``.
    On a cluster, pass ``master=None`` with ``SPARK_GRAFT_LOCAL=0`` and let
    spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and os.environ.get("SPARK_GRAFT_LOCAL", "1") == "1":
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    conf = {
        # Runtime re-planning: coalesce post-shuffle partitions, convert
        # sort-merge joins to broadcast when a side turns out small, split
        # skewed partitions. All essential at 100 TB.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Pin event-time arithmetic (unix_timestamp, date_trunc on
        # NTZ-loaded data) to UTC so results are byte-identical on any
        # host timezone — and match the DuckDB oracle's naive-UTC math.
        "spark.sql.session.timeZone": "UTC",
        # Arrow for any pandas UDF / toPandas edge — batch columnar transfer.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Silence the UI in test/bench runs.
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false",
    }
    if master and master.startswith("local"):
        # local[N] runs every task inside the DRIVER JVM, whose default
        # heap is 1g — 32 concurrent hash-aggregate tasks OOMed there
        # on the 10x scale smoke while the box sat at 9/125 GiB. Size
        # the one local JVM like the worker it actually is. 16g
        # measured best on this suite (48g regressed the heavy ANN/
        # cluster queries ~2x — G1 behaves worse on a huge mostly-empty
        # heap; 2g was GC-bound). Only effective at JVM launch
        # (getOrCreate on a live session keeps the old heap); never
        # set on a cluster, where spark-submit owns driver sizing.
        conf["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "16g"
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
