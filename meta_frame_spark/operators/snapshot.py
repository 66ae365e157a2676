"""Corpus snapshot diff — dataset versioning for training data.

Between two corpus versions the questions are always the same: what
was added, what was removed, which documents changed content, and how
big is the churn. ``diff_corpora`` answers them with one full-outer
join on the id and a content-hash comparison — no row-level text ever
moves to the driver, and at 100 TB the join shuffles only
(id, 64-bit hash) pairs when ``project_hashes`` pre-reduces (default).

Reference parity note: the reference (`skybluecycology/meta_frame`)
stamps `valid_from`/`valid_to` literals (`soundwave.py:76-78`) but has
no diff/versioning logic; this implements the real machinery
(`operators/history.py` holds the SCD2 side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_corpora(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """One row per id present in either snapshot:
    ``(id_col, status)`` with status in ``added`` (only in new),
    ``removed`` (only in old), ``changed`` (both, content hash
    differs), ``unchanged``. Content hash is ``xxhash64`` over
    ``content_cols`` (null-safe: nulls hash distinctly from empty).

    Both sides are pre-projected to (id, hash) — the full-outer join
    shuffles 16 bytes per row regardless of document width.
    """
    if not content_cols:
        raise ValueError("content_cols must name at least one column")
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.xxhash64(*[F.col(c) for c in content_cols]).alias(alias),
        )
    o = hashed(old, "_h_old")
    n = hashed(new, "_h_new")
    j = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias(status_col))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Churn report: one row per status with its id count."""
    return (
        diff_corpora(old, new, id_col, content_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
