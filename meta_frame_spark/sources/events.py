"""Schema-adaptive loader for the events table.

The driver regenerates ``events.parquet`` between rounds and has already
flipped the physical type of ``ts`` once: TIMESTAMP(NANOS) (which Spark's
vectorized reader only exposes via ``spark.sql.legacy.parquet.nanosAsLong``
as a raw long) → ``timestamp[us]`` (which Spark reads as TIMESTAMP_NTZ when
the file is not UTC-adjusted). Hard-coding either layout breaks every
events consumer when the data regenerates, so this module inspects the
loaded dtype and normalizes to one logical schema: ``ts`` as session-TZ
``TimestampType`` holding the same wall-clock values DuckDB reads.

All batch consumers (entry queries, tests, bench) and the streaming file
source share these helpers so the conversion can never drift again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TimestampType regardless of the
    physical parquet layout it was read from.

    - LongType (nanos-as-long legacy read): integer nanos → micros
      truncation, matching DuckDB's nanos→micros cast.
    - TimestampNTZType (timestamp[us] not UTC-adjusted): reinterpret the
      wall-clock value in the session time zone (UTC in tests/bench), the
      same naive semantics DuckDB applies.
    - TimestampType: already the target type; pass through.
    """
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(dtype, T.TimestampType):
        return df
    raise TypeError(
        f"events column {col!r} has unsupported type {dtype.simpleString()}; "
        "expected long (nanos), timestamp_ntz, or timestamp"
    )


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch-load an events parquet file/dir and normalize ``ts``.

    Sets the nanos-as-long legacy conf *before* the read so a future
    regeneration back to TIMESTAMP(NANOS) still loads (the conf is a
    no-op for micros files).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(path))


def event_stream_schema(spark: SparkSession, path: str) -> T.StructType:
    """Explicit schema for the streaming file source over events parquet
    (streaming requires one), probing the on-disk physical type of ``ts``
    via a metadata-only batch read so the stream reader matches whatever
    layout the current files use. Falls back to timestamp_ntz (the
    current driver layout) when the directory is empty or unreadable.
    """
    try:
        ts_type: T.DataType = spark.read.parquet(path).schema["ts"].dataType
    except Exception:
        ts_type = T.TimestampNTZType()
    return T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
