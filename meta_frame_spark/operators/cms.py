"""Count-min sketch: mergeable point-frequency estimation.

Not in the reference (its aggregate surface stops at
sum/max/min/count/avg — SURVEY.md §2.4, /root/reference/Optimus/
optimus.py:54-80). Completes the sketch suite next to HLL cardinality,
Theta set algebra, KLL quantiles, and Misra-Gries heavy hitters
(operators/sketch.py, operators/freq.py): CMS answers "how often does
THIS key occur" from fixed-size mergeable state, with the classic
one-sided guarantee — an estimate is NEVER below the true count, and
overshoots by more than ``e/width * N`` with probability at most
``exp(-depth)`` (Cormode & Muthukrishnan 2005, public algorithm).

Scale design (100 TB):

* **Build** is one map-side-combined ``groupBy`` over ``(row, bucket)``
  cells — at most ``depth * width`` cells leave each partition no
  matter how many raw rows it holds, so the shuffle is bounded by the
  sketch size times the partition count, never by the data.
* **The materialized sketch** is a sparse ``(row, bucket, cnt)`` table
  of at most ``depth * width`` rows (4 x 8192 by default ≈ 32k rows).
  Absent cells mean zero. Lookups broadcast the sketch; the key side
  never shuffles.
* **Merging increments** (daily batches, per-shard sketches) is
  ``unionByName`` + ``groupBy sum`` — associative and exact over the
  sparse representation, so an ever-growing corpus maintains its
  sketch without re-scanning history (same incremental contract as
  the HLL path in operators/sketch.py).
* Hashing is Spark-native ``xxhash64`` seeded per depth-row by
  hashing ``(value, row_index)`` — JVM codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(value_col: str, depth: int, width: int):
    """array<struct<row,bucket>> of the sketch cells one value maps to."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    F.xxhash64(F.col(value_col).cast("string"), F.lit(r)),
                    F.lit(width),
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 8192,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``value_col`` as a sparse
    ``(row, bucket, cnt)`` table (absent cells are zero).

    ``weight_col`` turns the sketch into a weighted-frequency sketch
    (each occurrence contributes its weight instead of 1).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(F.explode(_cells(value_col, depth, width)).alias("c"), w.alias("_w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise
    sum over the sparse tables. Exact and associative — the merged
    sketch is identical to one built over the concatenated inputs."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``:
    ``keys.* + est_col`` where the estimate is the min over the
    ``depth`` cells the key hashes to (0 for absent cells).

    The sketch side is broadcast (bounded at ``depth * width`` rows),
    so this is a map-side join — the keys never shuffle for the probe;
    the single ``groupBy`` on the key re-collapses the ``depth``
    exploded probes per key.
    """
    probes = keys.select(
        F.col(key_col), F.explode(_cells(key_col, depth, width)).alias("c")
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    hit = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("_cnt")
    )
    est = hit.groupBy(key_col).agg(F.min("_cnt").alias(est_col))
    return keys.join(est, key_col, "left").fillna({est_col: 0})
