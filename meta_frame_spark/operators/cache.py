"""Tracking for operator-internal ``persist()`` calls.

Several operators persist an intermediate that two downstream branches
consume (e.g. the fused minhash base feeding both LSH bucketing and the
Jaccard verify join). The persist must outlive the *caller's* action, so
the operator cannot unpersist before returning — but in a long-lived
session repeated calls would accumulate cached partitions until
eviction pressure. Operators register such frames here; callers that
run many operator invocations in one session release them between
actions:

    from meta_frame_spark.operators.cache import release_tracked_caches
    result = minhash_lsh_dedup(df, ...)
    result.write.parquet(...)          # action consumes the cache
    release_tracked_caches()           # drop operator-internal persists

``spark.catalog.clearCache()`` also works but drops *user* caches too;
this releases only what operators persisted internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an operator-internal persisted frame for later release."""
    _TRACKED.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked frame (non-blocking); returns the count."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
