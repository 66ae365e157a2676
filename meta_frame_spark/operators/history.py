"""Slowly-changing-dimension (SCD Type 2) history build.

The reference stamps hard-coded bitemporal columns onto every result
(``valid_from = lit("2024-01-01")``, ``valid_to = lit("9999-12-31")`` —
soundwave.py:76-78, "replace with your logic"). This operator is that
logic: derive real validity intervals from a change stream, turning an
append-only changelog into the versioned dimension table the
reference's stamps pretend to be.

Semantics: rows are versions of an entity identified by ``key_cols``;
each version is valid from its own ``ts_col`` until the next version's
timestamp for the same key (exclusive), open-ended for the latest
version (``valid_to`` NULL unless ``end_of_time`` is given, matching
the reference's ``9999-12-31`` convention).

Scale design: ONE hash-shuffle on ``key_cols`` + a per-key sort for
the ``lead`` window — the minimal plan for interval derivation; no
self-join (the naive ``t1 JOIN t2 ON t1.ts < t2.ts`` shape is
quadratic per key). Skewed entities (one hot key with millions of
versions) are rare in dimension data; if present, AQE skew handling
does not apply to windows, so pre-split such keys upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    end_of_time: str | None = None,
) -> DataFrame:
    """Append ``valid_from`` / ``valid_to`` / ``is_current`` to a
    changelog of entity versions.

    ``tiebreak_col`` orders same-timestamp versions of one key
    deterministically (e.g. an event id); without it, ties make
    ``valid_to`` assignment nondeterministic under re-partitioning.
    ``end_of_time``: optional timestamp string for open intervals
    (e.g. ``"9999-12-31 00:00:00"``); default leaves ``valid_to``
    NULL and marks ``is_current``.
    """
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    valid_to = (
        F.coalesce(nxt, F.lit(end_of_time).cast("timestamp"))
        if end_of_time is not None
        else nxt
    )
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", nxt.isNull())
    )


def snapshot_asof(
    history: DataFrame,
    as_of: str | Column,
) -> DataFrame:
    """The dimension as it looked at ``as_of``: rows whose
    ``[valid_from, valid_to)`` interval covers the instant. A pure
    filter — partition-prunable when the history is written
    partitioned by a date derivative of ``valid_from``."""
    ts = F.lit(as_of).cast("timestamp") if isinstance(as_of, str) else as_of
    return history.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )
