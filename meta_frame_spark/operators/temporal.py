"""Temporal join operators (as-of join).

Not in the reference (its only join is a single-key equi-join,
SURVEY.md §2.3) and not built into Spark SQL; the standard need in
event/time-series pipelines is "attach the latest right-side row at or
before each left timestamp, per key".

Spark-first design: instead of a range join (which explodes into a
cross product per key before filtering) or a per-key sort-merge UDF,
the as-of join is expressed as UNION + one ranking window:

1. tag left rows src=1, right rows src=0, union by name;
2. one hash-shuffle on the key columns, sort within partitions by
   (time, src) — right rows sort before left rows at equal time, so
   an exactly-at-timestamp right row is visible to the left row;
3. ``last(value, ignorenulls=True)`` over rows-unbounded-preceding
   forward-fills each right column onto subsequent left rows;
4. keep only left rows.

Cost: ONE shuffle of |left| + |right| skinny rows, linear scan per
partition — survives arbitrary key cardinality and 100 TB inputs.
AQE's skew handling applies to the single exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_agg(
    df: DataFrame,
    ts_col: str,
    partition_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    window_seconds: int,
) -> DataFrame:
    """Trailing time-range window aggregates: for every row, each agg
    over the rows of the same ``partition_cols`` key whose timestamp
    lies in ``[ts - window_seconds, ts]`` (a RANGE frame — the frame is
    defined by the *time value*, so same-timestamp rows share one frame
    and the result is deterministic under any sort-tie order).

    ``aggs``: ``{out_name: (value_col, fn)}`` with fn one of
    sum/avg/min/max/count.

    Scale: one hash-shuffle on ``partition_cols`` + per-key sort; the
    frame slides incrementally within each sorted partition (Spark's
    window operator keeps a running buffer bounded by the frame span,
    not the partition). The ordering key is epoch *microseconds*
    (RANGE frames need a numeric key, and a plain seconds cast would
    truncate sub-second timestamps — rows near the frame edge would
    then disagree with interval-exact engines).
    """
    micros = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(micros)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    out = df
    for name, (col, fn) in aggs.items():
        out = out.withColumn(name, getattr(F, fn)(col).over(w))
    return out


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    partition_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Tag every row with its gap-based session: a new session starts
    whenever the time since the key's previous event exceeds
    ``gap_seconds``. Complements the session-WINDOW aggregate
    (streaming.session_aggregate): that one returns one row per
    session; this keeps the event grain so downstream ops can group
    arbitrary metrics by (key, session_id).

    ``session_id`` is the running count of session starts per key
    (1-based) — deterministic given a ``tiebreak_col`` for
    same-timestamp events. Scale: one shuffle on ``partition_cols``
    + per-key sort shared by the lag and the running sum (one Window
    exchange, two frame passes)."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_start = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
           > gap_seconds * 1_000_000)
    ).cast("int")
    running = Window.partitionBy(*partition_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # two steps: a window expression (lag) can't nest inside another
    # window's aggregate
    return (
        df.withColumn("_mfs_start", is_start)
        .withColumn(out_col, F.sum("_mfs_start").over(running))
        .drop("_mfs_start")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for every left row, the most recent right
    row with ``right.time <= left.time`` within the same ``by`` keys.

    ``value_cols``: right columns to attach (default: all non-key,
    non-time right columns). Attached columns keep their name unless it
    collides with a left column, then ``{name}{suffix}``. The matched
    right timestamp is always attached as ``{time_col}{suffix}``.
    ``tolerance``: max allowed ``left.time - right.time`` as an
    INTERVAL column (e.g. ``F.expr("INTERVAL 1 HOUR")``); matches
    older than that are nulled out.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {time_col}]
    out_names = {
        c: (f"{c}{suffix}" if c in left.columns else c) for c in value_cols
    }
    rt = f"{time_col}{suffix}"

    l_tagged = left.withColumn("__src", F.lit(1))
    r_tagged = right.select(
        *by,
        F.col(time_col),
        *[F.col(c).alias(out_names[c]) for c in value_cols],
    ).withColumn(rt, F.col(time_col)).withColumn("__src", F.lit(0))

    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in [*out_names.values(), rt]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.filter(F.col("__src") == 1).drop("__src")
    if tolerance is not None:
        stale = F.col(rt) < (F.col(time_col) - tolerance)
        for c in [*out_names.values(), rt]:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out


def event_paths(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_len: int | None = None,
    sep: str = ">",
) -> DataFrame:
    """Per-key ordered behavior paths: collapse each key's events into
    one ``"a>b>c"`` string ordered by (time, tiebreak) — the input
    shape for sequence models, markov funnels, and path analytics.

    Determinism: ``collect_list`` order is partition-dependent, so the
    items carry (ts, tiebreak) and are ``sort_array``-ed before
    rendering — identical output on any cluster/partitioning.

    Scale: ONE hash shuffle on the keys with map-side partial
    collection; per-key memory is the key's own event list — bound it
    with ``max_len`` (the rendered path keeps the first ``max_len``
    events in time order) when whale keys exist, or pre-aggregate per
    (key, day).

    Output columns: ``path``, ``n_events`` (the key's TOTAL event
    count, pre-cap), and ``path_len`` (events actually rendered into
    ``path``); ``path_len < n_events`` flags a truncated path.
    """
    keys = key_cols or ["user_id"]
    item = F.struct(
        F.col(ts_col).alias("_t"),
        F.col(tiebreak_col).alias("_k"),
        F.col(event_col).alias("_e"),
    )
    ordered = F.sort_array(F.collect_list(item))
    if max_len is not None:
        ordered = F.slice(ordered, 1, max_len)
    return events.groupBy(*keys).agg(
        F.array_join(F.transform(ordered, lambda x: x["_e"]), sep).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
        F.size(ordered).cast("bigint").alias("path_len"),
    )


def event_transitions(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-key event sequences:
    ``(from_event, to_event, n, p)`` where ``p`` is row-normalized
    (the empirical Markov kernel — funnels, next-action prediction,
    anomaly baselines).

    One shuffle: lead() over the per-key (ts, tiebreak) order pairs
    each event with its successor; the (from, to) aggregate is
    map-side combined and the normalizing per-from totals come from a
    broadcast-size window over the matrix itself (|event types|²
    rows), not a second pass over the data. ``p`` is exact (not
    rounded) so kernels compose — round at the presentation layer."""
    keys = key_cols or ["user_id"]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak_col))
    pairs = (
        events.withColumn("_next", F.lead(event_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(event_col).alias("from_event"),
            F.col("_next").alias("to_event"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_event")
    return pairs.withColumn("p", F.col("n") / F.sum("n").over(wf))


def ewma(
    series: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average over an ordered
    series: ``y_t = (1 - alpha) * y_{t-1} + alpha * x_t`` with
    ``y_0 = x_0`` — the smoothed baseline for trend/seasonality-aware
    monitoring (feed the residual to
    :func:`..anomaly.flag_count_anomalies` instead of the raw count
    when traffic trends).

    The recurrence is inherently sequential per key, so this is the
    canonical ``applyInPandas`` shape: one shuffle on ``group_cols``,
    each key's series sorted and smoothed inside its task with the
    vectorized pandas ``ewm`` kernel (adjust=False matches the
    recurrence exactly). State is one key's series — bounded by series
    length (buckets), never row-grain data; pre-aggregate to buckets
    first, as :func:`..anomaly.count_anomalies` does.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    from pyspark.sql import types as T

    schema = T.StructType(
        series.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def _smooth(pdf):
        pdf = pdf.sort_values(order_col)
        pdf[out_col] = (
            pdf[value_col].astype("float64")
            .ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return series.groupBy(*group_cols).applyInPandas(_smooth, schema)


def bucket_spine(
    counts: DataFrame,
    group_cols: list[str],
    bucket_col: str = "bucket_ts",
    step: str = "1 hour",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Densify a per-group bucket series: emit EVERY step between each
    group's first and last bucket, zero-filling ``value_cols`` where no
    row existed. Bucketed aggregates silently omit empty buckets, so a
    dead feed looks like *no rows* instead of *zero events* — and a
    baseline (:func:`..anomaly.flag_count_anomalies`, :func:`ewma`)
    computed over the sparse series is biased high. Run the spine
    between bucketing and scoring to make silence visible.

    Shape: the per-group [min, max] range is one tiny aggregate;
    ``sequence()`` + ``explode`` generates the spine inside each
    group's task (fan-out is buckets-per-group, data-independent);
    the left join back to real counts is group+bucket keyed. Nothing
    row-grain is touched.
    """
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    value_cols = list(value_cols or ["n"])
    bounds = counts.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    spine = bounds.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias(bucket_col),
    )
    out = spine.join(counts, [*group_cols, bucket_col], "left")
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
