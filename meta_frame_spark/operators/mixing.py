"""Corpus mixing: hit target per-source proportions by deterministic
downsampling.

A training mix is specified as weight shares per source/domain
("50% web, 20% books, ..."); the corpus on disk never matches. This
operator computes, per source, the keep-fraction that realizes the
largest corpus consistent with the target shares (no source is
up-sampled), then applies it with the hash-gated ``stratified_sample``
so the decision is per-row stable across reruns and repartitions.

Math: with target share ``w_s`` (sum 1) and actual size ``a_s``
(rows, tokens, or chars — any additive ``size_col``), the largest
feasible total is ``T = min_s(a_s / w_s)`` and
``keep_frac_s = w_s * T / a_s`` (== 1 for the binding source).

Scale design: the plan is one aggregate to one row per source
(thousands at most) plus scalar reductions — negligible at any corpus
size. ``apply_mix`` collects only that tiny plan to the driver to
parameterize a map-only filter; the corpus itself is never shuffled
or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meta_frame_spark.operators.sampling import stratified_sample


def mix_plan(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    size_col: str | None = None,
) -> DataFrame:
    """Per-source sampling plan for the target mix: ``(source, n_rows,
    size, target_share, keep_frac)``. Sources absent from ``weights``
    get ``keep_frac = 0`` implicitly (they are excluded from the plan —
    and from ``apply_mix``'s output).

    ``size_col``: additive size measure (token/char count); row count
    when None.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"mix weights must sum to 1.0, got {total}")
    # literal inline relation (not createDataFrame: that path drags in
    # the session's Python-local-relation machinery — measured ~1.5s
    # first call — for what is a handful of constants)
    spark = df.sparkSession
    w = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias(source_col),
                        F.lit(float(v)).alias("target_share"),
                    )
                    for s, v in weights.items()
                ]
            )
        ).alias("_w")
    ).select("_w.*")
    size = F.sum(size_col) if size_col else F.count(F.lit(1))
    actual = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_rows"), size.cast("double").alias("size")
    )
    joined = actual.join(F.broadcast(w), source_col)
    # largest feasible total honoring every share without up-sampling:
    # T = min_s(size_s / w_s), taken with an empty-frame window over the
    # per-source aggregate (one row per source) so the corpus is scanned
    # and aggregated exactly once — the earlier self-referencing agg +
    # cross-join shape re-ran the whole scan for one scalar.
    t = F.min(F.col("size") / F.col("target_share")).over(Window.partitionBy())
    return joined.select(
        source_col,
        "n_rows",
        "size",
        "target_share",
        F.least(
            F.lit(1.0), F.col("target_share") * t / F.col("size")
        ).alias("keep_frac"),
    )


def apply_mix(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    size_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Materialize the mix: compute :func:`mix_plan`, then keep each row
    iff its ``xxhash64(id, salt)`` bucket falls under its source's
    ``keep_frac`` (sources not in ``weights`` are dropped). Per-row
    deterministic — reruns and late-arriving data agree.
    """
    plan = mix_plan(df, source_col, weights, size_col)
    fractions = {
        r[source_col]: r["keep_frac"] for r in plan.collect()
    }
    in_mix = df.join(
        F.broadcast(plan.select(source_col)), source_col, "left_semi"
    )
    return stratified_sample(
        in_mix, source_col, fractions, id_col=id_col, salt=salt,
        default_fraction=0.0,
    )


def temperature_mix_plan(
    df: DataFrame,
    source_col: str,
    alpha: float,
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled mixing plan: target shares are DERIVED from
    the observed per-source sizes, ``w_s ∝ size_s^alpha`` (the
    multilingual-sampling rule: alpha = 1 keeps natural proportions,
    alpha = 0 gives uniform shares, 0 < alpha < 1 up-weights the tail
    without hand-writing a weights dict). Output matches
    :func:`mix_plan`: ``(source, n_rows, size, target_share,
    keep_frac)`` with ``keep_frac`` realizing the largest feasible
    corpus honoring the derived shares with no up-sampling.

    Scale: one aggregate to one row per source plus empty-frame windows
    over that tiny frame — the corpus is scanned exactly once and never
    shuffled. Feed the resulting shares to :func:`apply_mix` (or gate
    rows directly with ``stratified_sample``) for materialization.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    size = F.sum(size_col) if size_col else F.count(F.lit(1))
    actual = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_rows"), size.cast("double").alias("size")
    )
    everything = Window.partitionBy()
    share = F.pow("size", F.lit(alpha)) / F.sum(F.pow("size", F.lit(alpha))).over(everything)
    with_share = actual.select(
        source_col, "n_rows", "size", share.alias("target_share")
    )
    t = F.min(F.col("size") / F.col("target_share")).over(everything)
    return with_share.select(
        source_col,
        "n_rows",
        "size",
        "target_share",
        F.least(F.lit(1.0), F.col("target_share") * t / F.col("size")).alias("keep_frac"),
    )


def doremi_domain_weights(
    df: DataFrame,
    domain_col: str,
    excess_col: str,
    iters: int = 3,
    eta: float = 1.0,
    smoothing: float = 0.2,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    given a per-example EXCESS LOSS column (proxy-model loss minus
    reference-model loss — how much headroom a domain still has),
    run ``iters`` multiplicative-weights steps over the domains::

        u_d     = alpha_d * exp(eta * max(mean_excess_d, 0))
        alpha'  = (1 - smoothing) * u / sum(u) + smoothing / D

    starting from uniform. The uniform-mixing term is DoReMi's
    step-stabilizer and what makes the iteration genuinely iterative
    (without it, fixed per-domain losses would collapse T steps into
    one exponential). Output: ``(domain_col, n, mean_excess,
    weight)`` — the training mix to feed :func:`mix_plan` /
    ``apply_mix``.

    Scale: ONE corpus aggregate (per-domain count + mean excess,
    map-side combined, output bounded by the domain count); the
    iteration itself is driver arithmetic over D doubles — no
    per-step corpus pass, because this is the group-level variant
    with a fixed proxy (the full DoReMi retrains the proxy between
    steps, which no engine-replayable batch operator can do).
    Deterministic: a pure function of the per-domain means, so the
    DuckDB oracle replays every step. The domain column comes back
    as STRING (the weights table is a plan parameter, not data).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    import math

    stats = (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col(excess_col).cast("double")).alias("mean_excess"),
        )
        .orderBy(domain_col)
        .collect()
    )  # bounded: one row per domain
    if not stats:
        raise ValueError("doremi_domain_weights: empty input")
    d = len(stats)
    alpha = [1.0 / d] * d
    clipped = [max(float(r.mean_excess or 0.0), 0.0) for r in stats]
    for _ in range(iters):
        u = [a * math.exp(eta * m) for a, m in zip(alpha, clipped)]
        s = sum(u)
        alpha = [(1.0 - smoothing) * x / s + smoothing / d for x in u]
    spark = df.sparkSession
    # all-NULL excess in a domain -> avg() is None; report 0.0 (the
    # same value the MW update used via `clipped`) instead of a
    # TypeError (ADVICE r10)
    rows = [
        (
            str(r[domain_col]),
            int(r.n),
            float(r.mean_excess) if r.mean_excess is not None else 0.0,
            w,
        )
        for r, w in zip(stats, alpha)
    ]
    return spark.createDataFrame(
        rows, f"{domain_col} string, n long, mean_excess double, weight double"
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    budget: float,
    max_epochs: float = 4.0,
    size_expr: Column | str | None = None,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total training ``budget`` (tokens, or rows
    when ``size_expr`` is None) across groups as UNIFORMLY as
    possible, capping each group at ``max_epochs`` passes over its
    own data — the fairness fix for temperature sampling, which
    either starves tail languages or epochs them into memorization.

    Water-filling: visit groups by ascending size; each takes
    ``min(max_epochs * size, remaining / groups_left)``. A group
    whose cap binds frees budget for the larger groups after it;
    once caps stop binding, everyone left gets an equal share.
    Output: ``(group_col, n_units, alloc, epochs)`` with
    ``sum(alloc) = min(budget, max_epochs * corpus_size)``.

    Scale: ONE corpus aggregate (map-side combined, bounded by the
    group count); the water-fill is driver arithmetic over G doubles
    — the DoReMi pattern (`doremi_domain_weights`), so the DuckDB
    oracle replays every step with a recursive CTE. Feed the
    resulting per-group rates to :func:`mix_plan` / ``apply_mix``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    if size_expr is None:
        unit = F.lit(1).cast("double")
    elif isinstance(size_expr, str):
        unit = F.col(size_expr).cast("double")
    else:
        unit = size_expr.cast("double")
    stats = (
        df.groupBy(group_col)
        .agg(F.sum(unit).alias("n_units"))
        # ascending size, group name breaks exact-size ties — the
        # visit order IS the algorithm, so it must be deterministic
        .orderBy("n_units", group_col)
        .collect()
    )  # bounded: one row per group
    if not stats:
        raise ValueError("unimax_allocation: empty input")
    remaining = float(budget)
    out = []
    for i, r in enumerate(stats):
        size = float(r.n_units or 0.0)
        share = remaining / (len(stats) - i)
        alloc = min(max_epochs * size, share)
        remaining -= alloc
        out.append(
            (
                r[group_col],
                size,
                alloc,
                (alloc / size) if size > 0 else 0.0,
            )
        )
    # preserve the group column's input type (int domain ids stay
    # ints, NULL stays NULL) so the output joins back to the corpus
    # or a downstream mix_plan keyed on the original column
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [StructField(group_col, df.schema[group_col].dataType)]
        + [
            StructField(c, DoubleType())
            for c in ("n_units", "alloc", "epochs")
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)
