"""Ordered-step funnel analysis over an event stream.

Not in the reference (SURVEY.md §2 — no event/temporal surface); the
standard product-analytics question: of the users who did step 1, how
many went on to do step 2 *after* it, then step 3 after that.

Semantics (the classic "earliest chain"): per user, ``t1`` is the
earliest step-1 event; ``t_i`` is the earliest step-i event strictly
after ``t_{i-1}``. A user's ``max_step`` is the length of the longest
such chain. Using earliest events is not just convention — it is the
maximal policy (if any chain exists, the earliest-chain completes), so
``max_step`` is exact.

Scale design: one aggregate per step over the (pre-filtered) events,
each keyed on the user — len(steps) shuffles of one-row-per-user
frames, joined user-co-partitioned (and the step frames shrink
monotonically: step i only aggregates users that reached step i-1).
No windows, no per-user sort, no Python. Event time crosses the
shuffle as (user, min-ts) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel row: ``(user_col, t_1..t_n, max_step)`` where
    ``t_i`` is the earliest step-i timestamp strictly after ``t_{i-1}``
    (NULL once the chain breaks) and ``max_step`` counts completed
    steps. Only users with at least one step-1 event appear.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    events = df.select(user_col, ts_col, type_col).filter(
        F.col(type_col).isin(list(steps))
    )
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(out.select(user_col, f"t_{i-1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"t_{i-1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        out = out.join(nxt, user_col, "left")
    # deepest completed step wins: check t_n first, fall back to 1
    max_step = (
        F.coalesce(
            *[
                F.when(F.col(f"t_{i}").isNotNull(), F.lit(i))
                for i in range(len(steps), 1, -1)
            ],
            F.lit(1),
        )
        if len(steps) > 1
        else F.lit(1)
    )
    return out.withColumn("max_step", max_step)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the ``period``
    of their first event; one output row per (cohort, period offset)
    with the distinct users active in that period —
    ``(cohort, period_offset, n_users)``.

    Scale: first-event per user is one min-aggregate on the user key;
    activity periods dedup on (user, period) — both partial-aggregated
    skinny shuffles, then a count keyed on the (tiny) matrix cell. The
    period offset is a date diff, so cohort and activity use the same
    calendar truncation on both engines (ISO weeks / calendar months).
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period}")
    trunc = lambda c: F.date_trunc(period, F.col(c))
    firsts = df.groupBy(user_col).agg(F.min(trunc(ts_col)).alias("cohort"))
    active = df.select(
        F.col(user_col), trunc(ts_col).alias("p")
    ).distinct()
    if period == "month":
        offset = (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        )
    else:
        days = {"day": 1, "week": 7}[period]
        offset = (
            F.datediff(F.to_date("p"), F.to_date("cohort")) / days
        ).cast("int")
    return (
        active.join(firsts, user_col)
        .select(
            F.to_date("cohort").alias("cohort"),
            offset.alias("period_offset"),
            user_col,
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Aggregate funnel: ``(step, step_name, n_users)`` — how many
    users reached each step (cumulative-style: reaching step i implies
    having reached every earlier step)."""
    per_user = funnel(df, steps, user_col, ts_col, type_col)
    return (
        per_user.groupBy()
        .agg(
            *[
                F.sum(
                    F.when(F.col("max_step") >= i, 1).otherwise(0)
                ).alias(f"_n_{i}")
                for i in range(1, len(steps) + 1)
            ]
        )
        .selectExpr(
            f"stack({len(steps)}, "
            + ", ".join(
                # step names are user data — escape embedded quotes so a
                # name like "add 'pro' plan" can't break the expression
                f"{i}, '{s.replace(chr(39), chr(39) * 2)}', `_n_{i}`"
                for i, s in enumerate(steps, start=1)
            )
            + ") AS (step, step_name, n_users)"
        )
    )
