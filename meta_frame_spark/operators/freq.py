"""Heavy hitters with bounded map-side memory (Misra-Gries).

``vocab.py`` finds top-k terms with a full ``groupBy(term)`` — correct,
but the shuffle carries the entire long tail (a web-scale corpus has
billions of singleton tokens; the tail IS the data). This module is
the classic two-pass fix:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   ``k`` counters over its items (``mapInPandas``: per-partition state,
   Arrow batches, nothing shuffles). MG's guarantee, per partition:
   any item with partition count > n_p/(k+1) survives. Summed over
   partitions (pigeonhole), any item with GLOBAL frequency
   > N/(k+1) survives in at least one partition — so with
   ``k + 1 > 1/min_frac`` the union of candidates is a guaranteed
   superset of every true heavy hitter. At most ``k × partitions``
   candidate rows move — independent of N and of vocabulary size.
2. **Exact pass** — recount ONLY the candidates (broadcast semi-join
   filter before the shuffle) and keep those with
   ``count >= ceil(min_frac * N)``. Exact counts, no approximation in
   the output — the sketch only bounded the *search space*.

The same shape Spark uses internally for ``approxQuantile``-style
two-phase answers; here it is explicit, composable, and oracle-exact.
"""

from __future__ import annotations

from collections.abc import Iterator
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_prune(counts: dict, k: int) -> dict:
    """Misra-Gries decrement step, batched: keep at most ``k`` items by
    subtracting the (k+1)-th largest count from everything."""
    if len(counts) <= k:
        return counts
    cut = sorted(counts.values(), reverse=True)[k]
    return {i: c - cut for i, c in counts.items() if c > cut}


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_frac: float,
    k: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Items occurring in at least ``min_frac`` of ``items``' rows:
    ``(item, cnt, frac)``, counts exact. ``k`` (candidate counters per
    partition) defaults to ``ceil(2 / min_frac)``; any value with
    ``k + 1 > 1 / min_frac`` preserves the no-false-negative guarantee
    and is enforced.
    """
    if not 0 < min_frac <= 1:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    if k is None:
        k = math.ceil(2 / min_frac)
    if k + 1 <= 1 / min_frac:
        raise ValueError(
            f"k={k} breaks the Misra-Gries superset guarantee for "
            f"min_frac={min_frac}: need k + 1 > {1 / min_frac:.1f}"
        )
    from meta_frame_spark.operators.cache import track

    # three consumers (MG candidate pass, total count, exact recount)
    # — persist, or the upstream pipeline (often a corpus-wide
    # tokenize+explode) runs three times
    src = track(
        items.select(F.col(item_col).alias("item"))
        .filter(F.col("item").isNotNull())
        .persist()
    )
    schema = src.schema

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            counts = _mg_prune(counts, k)
        yield pd.DataFrame({"item": list(counts.keys())})

    candidates = src.mapInPandas(mg, schema).distinct()
    n_total = src.agg(F.count(F.lit(1)).alias("_n"))
    return (
        src.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") >= F.ceil(F.lit(min_frac) * F.col("_n")))
        .select(
            "item",
            "cnt",
            F.round(F.col("cnt") / F.col("_n"), round_to).alias("frac"),
        )
    )


def decayed_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    half_life_s: float = 604800.0,
    quantize: float | None = None,
) -> DataFrame:
    """Exponentially time-decayed counts per key — the "trending"
    score: an occurrence ``age`` seconds before the newest event
    contributes ``0.5 ** (age / half_life_s)`` instead of 1, so
    recent activity dominates without a hard window cutoff (public
    technique — exponentially decayed aggregates, cf. Cormode et al.
    on time-decayed streams).

    The anchor is ``max(ts)`` of the input — a pure function of the
    data (deterministic, restart-safe, oracle-mirrorable; no wall
    clock). Decayed counts are mergeable: batches sharing an anchor
    sum cell-wise, and re-anchoring an old total to a newer anchor is
    one multiply by ``0.5 ** (delta / half_life)`` — so an incremental
    pipeline carries a tiny per-key state forward instead of
    re-scanning history. One map-combined aggregate + a broadcast
    1-row anchor attach; no Python.

    ``quantize`` (e.g. ``1e-6``) rounds each row's weight to that grain
    and sums exact integers instead of doubles: the result is then
    independent of partition/summation order (float addition is not
    associative; the plain double sum can differ in the last ulps
    between runs and engines), at the cost of ``<= n_rows * quantize/2``
    absolute bias. Use it whenever the score is compared across engines
    or runs by exact value."""
    anchor = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("_anchor_us"))
    weight = F.pow(
        F.lit(0.5),
        (F.col("_anchor_us") - F.col("_us")) / F.lit(half_life_s * 1e6),
    )
    if quantize is not None:
        # multiply by the exact integer scale (1e6 is representable,
        # 1e-6 is not — dividing by the grain could differ in the last
        # ulp from an oracle that multiplies) and sum exact integers
        scale = float(round(1.0 / quantize))
        agg = (
            F.sum(F.round(weight * F.lit(scale), 0).cast("long"))
            * F.lit(quantize)
        ).alias("decayed_count")
    else:
        agg = F.sum(weight).alias("decayed_count")
    return (
        df.select(F.col(key_col), F.unix_micros(F.col(ts_col)).alias("_us"))
        .crossJoin(F.broadcast(anchor))
        .groupBy(key_col)
        .agg(agg)
    )
