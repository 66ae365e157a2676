"""Incremental aggregate maintenance: state tables that merge.

The batch-append pattern a 100 TB corpus lives by: keep one small
per-group STATE row (counts, sums, mins, maxes), fold each day's
increment into it, and never re-scan history. This is the exact-value
sibling of the sketch maintainers in :mod:`.sketch`
(``incremental_distinct`` for HLL, ``merge_kll_sketches`` for
quantiles) — restricted to aggregates that are re-aggregatable
(``sum`` merges by sum, ``count`` by sum, ``min``/``max`` by
themselves). ``avg`` is deliberately absent: persist ``sum`` and
``count`` and divide at read time.

Not in the reference: its engine recomputes every aggregation from
raw rows each run (SURVEY.md §2.4) — north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: agg name -> (build fn over raw rows, merge fn over state rows)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _validate(specs: dict[str, tuple[str | None, str]]) -> None:
    if not specs:
        raise ValueError("specs must name at least one aggregate")
    for out, (col, fn) in specs.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{out!r}: {fn!r} is not mergeable; allowed: "
                f"{sorted(_MERGEABLE)} (decompose avg into sum+count)"
            )
        if fn != "count" and not col:
            raise ValueError(
                f"{out!r}: {fn!r} needs a value column "
                "(only 'count' ignores it)"
            )


def aggregate_state(
    df: DataFrame,
    group_cols: list[str],
    specs: dict[str, tuple[str | None, str]],
) -> DataFrame:
    """Build a mergeable state table from raw rows: one row per group
    with a column per spec. ``specs`` maps output column ->
    ``(value_col, fn)`` with fn in sum/count/min/max (value_col is
    ignored for count). One map-side-combined shuffle."""
    _validate(specs)
    aggs = [
        _MERGEABLE[fn][0](col).alias(out)
        for out, (col, fn) in specs.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_aggregate_states(
    history: DataFrame,
    increment: DataFrame,
    group_cols: list[str],
    specs: dict[str, tuple[str | None, str]],
) -> DataFrame:
    """Fold an increment's state into the history state (same shape in,
    same shape out — write it back over the history). Cost is the
    state tables' size, never the raw data's: groups × increments
    skinny rows through one merge aggregate. Associative, so daily
    states roll into monthly into yearly without raw re-reads."""
    _validate(specs)
    cols = [*group_cols, *specs]
    both = history.select(*cols).unionByName(increment.select(*cols))
    merges = [
        _MERGEABLE[fn][1](out).alias(out) for out, (_, fn) in specs.items()
    ]
    return both.groupBy(*group_cols).agg(*merges)
