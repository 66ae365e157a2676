"""Contiguous global row numbering at scale.

Training-data sharding wants gapless, stable example ids (0..N-1 by a
deterministic order). The naive Spark spellings both fail at 100 TB:

- ``row_number() OVER (ORDER BY key)`` — an empty ``partitionBy``
  funnels EVERY row through one task (Spark even warns); dead at scale.
- ``monotonically_increasing_id()`` — parallel but neither contiguous
  nor stable across partitioning changes.

``assign_row_numbers`` is the classic two-phase fix, DataFrame-native:

1. range-repartition + sort by the order keys (one range shuffle — the
   same cost any global ordering pays);
2. count rows per physical partition (a tiny ~num-partitions-row agg),
   cumulative-sum the counts on the driver into per-partition offsets;
3. ``row_number`` windowed *per partition id* plus the broadcast
   offset. The window's hash shuffle keys on ``spark_partition_id``,
   so each group is exactly one partition's data — parallelism is
   preserved and no task sees more than one partition.

Reference parity note: the reference (`skybluecycology/meta_frame`)
has no ordering/id surface at all; this is north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__mfs_pid"
_LOCAL = "__mfs_local_rn"


def assign_row_numbers(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "row_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``id_col``: contiguous ids ``start..start+N-1`` assigned
    in ``order_by`` order. The order keys must be a deterministic total
    order (include a unique key last) or ids within ties are arbitrary
    albeit still contiguous.

    Triggers one eager job to size the partitions (step 2) — the
    per-partition counts are ~thousands of rows, collected to the
    driver, never the data itself.
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    keys = [F.col(c) for c in order_by]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    with_pid = ranged.sortWithinPartitions(*keys).withColumn(
        _PID, F.spark_partition_id()
    )
    # localCheckpoint (not persist): the pid-count job and the final
    # plan must see the SAME partition assignment (range boundaries are
    # sampled — recomputing could redraw them). Checkpoint blocks are
    # released by the ContextCleaner once the returned frame is
    # garbage-collected on the driver; a persist() entry would sit in
    # the CacheManager forever unless every caller remembered to
    # unpersist.
    with_pid = with_pid.localCheckpoint(eager=True)
    sizes = {
        r[_PID]: r["n"]
        for r in with_pid.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col(_PID),
    ) if offsets else F.lit(start)
    w = Window.partitionBy(_PID).orderBy(*keys)
    return (
        with_pid.withColumn(_LOCAL, F.row_number().over(w))
        .withColumn(id_col, (off_expr + F.col(_LOCAL) - F.lit(1)).cast("long"))
        .drop(_PID, _LOCAL)
    )


def running_total(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col``: the INCLUSIVE prefix sum of ``value_col``
    in ``order_by`` order — the distributed two-phase prefix sum,
    same shape as :func:`assign_row_numbers` (a bare
    ``SUM() OVER (ORDER BY ...)`` funnels every row through one task):

    1. range-repartition + sort by the order keys;
    2. per-partition value sums (a ~num-partitions-row aggregate),
       cumulative-summed on the driver into per-partition offsets;
    3. within-partition window cumsum (keyed on the physical
       partition id, so no task sees more than one partition) plus
       the broadcast offset.

    The order keys must be a deterministic total order (include a
    unique key last) for a reproducible result. Null values count as
    0. Triggers one eager job to size the offsets, like
    assign_row_numbers. The running-totals primitive behind
    token-budget selection (sampling.budget_select), quota ramps, and
    cumulative-mass cuts."""
    if not order_by:
        raise ValueError("order_by must name at least one column")
    if out_col in df.columns:
        raise ValueError(
            f"running_total: column {out_col!r} already exists in the input"
        )
    keys = [F.col(c) for c in order_by]
    v = F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    with_pid = ranged.sortWithinPartitions(*keys).withColumn(
        _PID, F.spark_partition_id()
    )
    # localCheckpoint for the same reason as assign_row_numbers: the
    # partial-sum job and the final plan must see one partitioning
    with_pid = with_pid.localCheckpoint(eager=True)
    sums = {
        r[_PID]: r["s"]
        for r in with_pid.groupBy(_PID)
        .agg(F.sum(v).alias("s"))
        .collect()
    }
    offsets: dict[int, float] = {}
    acc = 0.0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0.0
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col(_PID),
    ) if offsets else F.lit(0.0)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.withColumn(out_col, (off_expr + F.sum(v).over(w)))
        .drop(_PID)
    )
