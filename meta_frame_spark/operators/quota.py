"""Per-group quota capping (domain / source caps).

Not in the reference (SURVEY.md §2 — its surface stops at
group/agg/join); this is the web-corpus rebalancing step: cap every
domain at N documents so a handful of mega-domains (or spam mirrors)
cannot dominate the training mix, keeping the *best* N per domain by
an explicit priority (quality score, length, recency).

Scale design (100 TB corpus):

* The exact path is one hash-shuffle on ``group_cols`` + a per-group
  sort bounded by ``row_number`` — Spark's window operator streams the
  sorted group, so memory is O(1) per row, but a single pathological
  domain (a billion rows) still sorts on one reducer.
* ``prefilter_counts=True`` bolts a map-only escape hatch in front:
  per-group counts (one cheap partial-agg shuffle, bytes per group)
  are broadcast back and groups already under the cap bypass ranking
  entirely — on real web corpora that is the long tail, i.e. almost
  every group, so the expensive sort only sees the few over-cap
  domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "_mfs_quota_rn"
_CNT = "_mfs_quota_n"


def quota_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    priority: str | Column,
    tiebreak: str | Column,
    descending: bool = True,
    prefilter_counts: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_cols`` key — the rows that
    rank first by ``priority`` (``descending=True``: highest priority
    wins). ``tiebreak`` (typically the id column) makes equal-priority
    rows rank deterministically across reruns and partitionings.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    pr = F.col(priority) if isinstance(priority, str) else priority
    tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    order = [pr.desc() if descending else pr.asc(), tb.asc()]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = df.withColumn(_RN, F.row_number().over(w))
    kept = ranked.filter(F.col(_RN) <= cap).drop(_RN)
    if not prefilter_counts:
        return kept

    # null-safe equality in both semi-joins: groupBy treats NULL as a
    # key value, so the prefilter must too — a plain equi-join would
    # silently drop every null-keyed row, making the performance flag
    # change results.
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(_CNT))
    d = df.alias("_mfs_q_d")
    def _semi(keys: DataFrame) -> DataFrame:
        k = keys.select(*group_cols).alias("_mfs_q_k")
        cond = None
        for c in group_cols:
            eq = F.col(f"_mfs_q_d.`{c}`").eqNullSafe(F.col(f"_mfs_q_k.`{c}`"))
            cond = eq if cond is None else cond & eq
        return d.join(F.broadcast(k), cond, "left_semi")

    small = _semi(counts.filter(F.col(_CNT) <= cap))
    over = _semi(counts.filter(F.col(_CNT) > cap))
    ranked_over = over.withColumn(_RN, F.row_number().over(w))
    return small.unionByName(
        ranked_over.filter(F.col(_RN) <= cap).drop(_RN)
    ).select(*df.columns)
