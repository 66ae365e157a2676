"""Changelog compaction / upsert — maintaining a mutable snapshot on
immutable files.

No analogue in the reference (its pipelines are pure read→transform→
write, SURVEY.md §2.6); these are the operations that keep a 100 TB
training corpus correct as sources re-crawl and re-deliver: collapse a
log of versioned records to the current snapshot, and apply a CDC
changelog (upserts + deletes) to a base snapshot.

Scale shape: both are ONE hash shuffle on the key columns. The
keep-latest window is ``row_number`` bounded to 1, which Spark rewrites
to a per-partition WindowGroupLimit — map tasks forward at most one
row per key they see, so the shuffle carries ~|distinct keys| rows,
not |input| rows, when upstream partitions are key-clustered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | Column,
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Compact a versioned log to its current snapshot: the single row
    with the greatest ``order_col`` per key. ``tiebreak`` (greatest
    wins) makes the pick total when versions share a timestamp — pass
    one whenever ``order_col`` isn't unique per key, or the survivor
    is partitioning-dependent."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc_nulls_last()]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        order.append(tb.desc_nulls_last())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Merge a CDC changelog into a base snapshot (the MERGE INTO /
    upsert semantic on plain DataFrames):

    - the latest change per key wins over the snapshot row;
    - a winning change whose ``op_col`` equals ``delete_op`` removes
      the key;
    - keys untouched by the changelog pass through.

    ``changes`` must carry the snapshot's columns plus ``order_col``
    (and ``op_col`` if deletes exist). The snapshot is treated as
    older than every change. One shuffle on ``key_cols`` (union →
    keep-latest); no driver-side state.
    """
    base = snapshot
    for c in (order_col, op_col) if op_col else (order_col,):
        if c not in base.columns:
            base = base.withColumn(c, F.lit(None).cast(changes.schema[c].dataType))
    # source rank breaks snapshot-vs-change ties at equal order values
    base = base.withColumn("__src", F.lit(0))
    chg = changes.select(*base.columns[:-1]).withColumn("__src", F.lit(1))
    merged = latest_by_key(
        base.unionByName(chg), key_cols, order_col, tiebreak="__src"
    ).drop("__src")
    if op_col:
        merged = merged.filter(
            F.col(op_col).isNull() | (F.col(op_col) != delete_op)
        )
    return merged
