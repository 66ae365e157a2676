"""Dataset splitting / sampling for training pipelines.

Spark's ``randomSplit`` is seed-deterministic only for a fixed
partitioning — a repartition or input-file change reshuffles every
row's assignment. For training-data lineage that is not good enough:
``hash_split`` assigns each row by a stable hash of an id column, so
the same row lands in the same split on any cluster, any partitioning,
any day — and late-arriving data joins the right split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: granularity of split fractions (1/10000)
_BUCKETS = 10_000
#: md5-method granularity: first 4 hex chars of md5 = 1/65536
_HEX_BUCKETS = 65_536


def _md5_hex4(id_col: str, salt: str) -> Column:
    """First 4 hex chars of ``md5(cast(id as string) || ':' || salt)``.

    Engine-portable bucket value: any engine with ``md5`` (DuckDB,
    Trino, Postgres, ...) reproduces the assignment byte-for-byte, so a
    split/sample survives an engine migration. Lowercase hex both in
    Spark and DuckDB; compared as strings against hex thresholds so no
    base-16 integer parsing is needed anywhere."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )


def hex_threshold(frac: float) -> str:
    """Fraction -> 4-hex-char threshold for ``_md5_hex4`` comparison.
    ``frac >= 1.0`` maps to ``'g'``: every hex string sorts below it
    (hex chars are 0-9a-f), avoiding a 5-char carry like '10000' that
    would compare *smaller* than 'ffff' lexicographically."""
    n = int(round(frac * _HEX_BUCKETS))
    return "g" if n >= _HEX_BUCKETS else format(n, "04x")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str,
    salt: str = "",
    split_col: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Append a deterministic split label: row -> bucket by a stable
    hash of ``(id, salt)``, buckets carved by ``weights`` (must sum to
    1.0). Map-only — no shuffle, no sampling job.

    ``salt`` re-deals the assignment (a new experiment) without
    touching the id space.

    ``method``: ``"xxhash64"`` (default — fastest, one JVM codegen'd
    hash) or ``"md5"`` (engine-portable: the same row gets the same
    split in any md5-capable engine; see ``_md5_hex4``). Both are
    partitioning- and cluster-independent.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    if method not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_split method {method!r}")
    if method == "md5":
        bucket: Column = _md5_hex4(id_col, salt)
        cum = 0.0
        expr = None
        for name, w in weights.items():
            cum += w
            cond = bucket < F.lit(hex_threshold(cum))
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        last = list(weights)[-1]
        return df.withColumn(split_col, expr.otherwise(F.lit(last)))
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(_BUCKETS))
    expr = None
    lo = 0
    for name, w in weights.items():
        hi = lo + int(round(w * _BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    # float-rounding slack: the last band absorbs the remainder
    last = list(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "",
    default_fraction: float = 1.0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-rebalancing
    primitive (downweight an over-represented language/domain/source
    without touching the rest). Keeps each row iff its id-hash bucket
    falls under the stratum's fraction, so the decision is per-row
    stable: reruns, repartitions, and late-arriving data agree, and a
    kept row's id stays kept when the fraction is raised (nested
    samples: the 10% sample is a subset of the 20% sample).

    ``fractions``: {stratum value: keep fraction in [0,1]}; strata not
    listed keep ``default_fraction``. Map-only — no shuffle, no
    count jobs; Spark's ``sampleBy`` by contrast is seed+partitioning
    dependent.

    ``method``: ``"xxhash64"`` (default) or ``"md5"`` (engine-portable
    decisions, see ``hash_split``). The nested-sample property holds
    for both: the kept set at fraction f is a subset of the kept set at
    any f' > f.
    """
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    if method not in ("xxhash64", "md5"):
        raise ValueError(f"unknown stratified_sample method {method!r}")
    if method == "md5":
        hex4 = _md5_hex4(id_col, salt)
        sthresh = None
        for value, frac in fractions.items():
            cond = F.col(strata_col) == value
            lim = F.lit(hex_threshold(frac))
            sthresh = F.when(cond, lim) if sthresh is None else sthresh.when(cond, lim)
        sthresh = (
            sthresh.otherwise(F.lit(hex_threshold(default_fraction)))
            if sthresh is not None
            else F.lit(hex_threshold(default_fraction))
        )
        return df.filter(hex4 < sthresh)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(_BUCKETS))
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        lim = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        thresh.otherwise(F.lit(int(round(default_fraction * _BUCKETS))))
        if thresh is not None
        else F.lit(int(round(default_fraction * _BUCKETS)))
    )
    return df.filter(bucket < thresh)


def unit_hash(id_col: str, salt: str = "", method: str = "xxhash64") -> Column:
    """Deterministic uniform-ish value in [0, 1) from ``(id, salt)`` —
    the per-row coin for any reproducible probabilistic decision
    (sampling, augmentation gating, AB assignment). ``method="md5"``
    is engine-portable: first 8 md5 hex chars parsed base-16 over
    2^32 — DuckDB spells it ``('0x' || substr(md5(..),1,8))::BIGINT /
    4294967296.0``."""
    if method == "md5":
        h8 = F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 8
        )
        return F.conv(h8, 16, 10).cast("double") / F.lit(float(2**32))
    if method == "xxhash64":
        return (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(2**32)).cast("double")
            / F.lit(float(2**32))
        )
    raise ValueError(f"unknown unit_hash method {method!r}")


def weighted_sample(
    df: DataFrame,
    weight: str | Column,
    id_col: str,
    salt: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Per-row deterministic Bernoulli keep with probability
    ``clamp(weight, 0, 1)`` — the generalization of
    ``stratified_sample`` to a per-row keep probability (quality-
    proportional sampling, importance-weighted corpus thinning).
    Map-only; the nested property holds: the kept set under weights w
    is a subset of the kept set under any w' >= w pointwise."""
    w = F.col(weight) if isinstance(weight, str) else weight
    return df.filter(
        unit_hash(id_col, salt, method)
        < F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    )


def shuffle_deterministic(
    df: DataFrame, id_col: str, salt: str = "", num_partitions: int | None = None
) -> DataFrame:
    """Reproducible global shuffle for training-example order: rows
    ordered by ``xxhash64(id, salt)`` — same order on any cluster and
    partitioning, a new ``salt`` per epoch re-deals it. One range
    shuffle (sort); at 100 TB write the result partitioned and let
    readers stream partitions in filename order."""
    key = F.xxhash64(F.col(id_col), F.lit(salt))
    if num_partitions:
        return df.repartitionByRange(num_partitions, key).sortWithinPartitions(key)
    return df.orderBy(key)


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int = 0,
    n_shards: int = 16,
    salt: str = "",
    method: str = "md5",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-epoch shuffle manifest: every row gets a
    ``shard`` (0..n_shards-1) and a gapless within-shard ``pos``, both
    pure functions of ``(id, salt, epoch)`` — bump ``epoch`` and the
    whole deal re-randomizes, same epoch reproduces bit-for-bit on any
    cluster, partitioning, or engine. This is the lineage-auditable
    replacement for ``df.orderBy(rand(seed))``-style epoch shuffles
    (seed-stable only for one fixed partitioning).

    ``method="md5"``: shard from the first 8 hex chars, order within
    shard by the remaining 24 — any md5-capable engine (DuckDB, Trino,
    Postgres) replays the exact assignment. ``method="xxhash64"``: one
    codegen'd 64-bit hash each for shard and order — faster, Spark-only.

    Scale shape: shard assignment is map-only; ``pos`` is one shuffle
    keyed on ``shard`` with a per-shard sort, so parallelism = shards —
    size ``n_shards`` so a shard fits a task (shards ARE the output
    files). For a single global order use
    :func:`meta_frame_spark.operators.ids.assign_row_numbers`.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if method == "md5":
        coin = F.md5(F.concat_ws(
            ":", F.col(id_col).cast("string"), F.lit(salt), F.lit(str(epoch))
        ))
        shard = (F.conv(F.substring(coin, 1, 8), 16, 10).cast("long")
                 % n_shards).cast("int")
        order_key = F.substring(coin, 9, 24)
    elif method == "xxhash64":
        shard = F.pmod(
            F.xxhash64(F.lit("shard"), F.col(id_col), F.lit(salt), F.lit(epoch)),
            F.lit(n_shards),
        ).cast("int")
        order_key = F.xxhash64(
            F.lit("ord"), F.col(id_col), F.lit(salt), F.lit(epoch)
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_mfs_ord").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(shard_col, shard)
        .withColumn("_mfs_ord", order_key)
        .withColumn(pos_col, F.row_number().over(w) - F.lit(1))
        .drop("_mfs_ord")
    )


def split_dataframes(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str,
    salt: str = "",
) -> dict[str, DataFrame]:
    """``hash_split`` then one filtered view per split name. Each view
    is the same map-only plan with a different predicate — Catalyst
    pushes the split filter to the scan when the label derives from a
    stored id column."""
    labeled = hash_split(df, weights, id_col, salt)
    return {
        name: labeled.filter(F.col("split") == name).drop("split")
        for name in weights
    }


def sample_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str,
    salt: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, chosen by
    deterministic hash order — the reproducible replacement for
    per-group reservoir sampling (inspection samples, per-domain eval
    slices, capped few-shot pools). Same rows on any cluster and
    partitioning; a new ``salt`` re-deals the sample; the nested
    property holds (the k-sample contains the (k-1)-sample).

    Scale: ONE hash shuffle on the group keys; the rank window sorts
    within each group only. For whale groups the sort is the group's
    own rows — cap upstream with quota_per_group if a single group
    exceeds executor memory. ``method="md5"`` ranks on the md5 hex
    digest (engine-portable: any md5-capable engine reproduces the
    exact sample; ties impossible on distinct ids up to md5
    collisions). Ranking ties on the raw id as final tiebreak so
    duplicate ids cannot make the sample partition-dependent.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if method == "md5":
        key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    elif method == "xxhash64":
        key = F.xxhash64(F.col(id_col), F.lit(salt))
    else:
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy(*group_cols).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 1,
    salt: str = "",
    method: str = "md5",
    neg_col: str = "neg_id",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: each row gets ``k`` pseudo-random partner ids drawn from
    the DENSE id space ``0..N-1`` (run
    :func:`..ids.assign_row_numbers` first if ids have gaps),
    self-partners bumped to the next id. Returns
    ``(id_col, pair_rank, neg_col)`` — a pure function of
    ``(id, salt, rank)``, so the same pairs come out on any cluster or
    engine, and a new ``salt`` re-draws the negatives per epoch.

    Shape: N is one broadcast scalar; partner ids are map-only hash
    arithmetic fanned out ×k by an in-task explode — no shuffle at
    all. Distinct ranks can repeat a partner (independent draws);
    callers needing exactly-k distinct negatives dedup and over-draw.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_total = df.agg(F.count(F.lit(1)).alias("_n"))
    ranks = F.explode(F.array(*[F.lit(r) for r in range(1, k + 1)]))
    base = (
        df.select(F.col(id_col))
        .crossJoin(F.broadcast(n_total))
        .select(id_col, "_n", ranks.alias("pair_rank"))
    )
    if method == "md5":
        # 15 hex chars = 60 hash bits: modulo bias <= N/2^60 and no
        # unreachable ids until N > 2^60 (8 chars would skew the draw
        # and strand ids >= 2^32 at billion-doc scale)
        coin = F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(salt),
                    F.col("pair_rank").cast("string"),
                )),
                1, 15,
            ),
            16, 10,
        ).cast("long") % F.col("_n")
    elif method == "xxhash64":
        coin = F.pmod(
            F.xxhash64(F.col(id_col), F.lit(salt), F.col("pair_rank")),
            F.col("_n"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    neg = F.when(coin == F.col(id_col), (coin + 1) % F.col("_n")).otherwise(coin)
    return base.select(
        id_col, "pair_rank", neg.cast("long").alias(neg_col)
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight: str | Column,
    id_col: str,
    group_cols: list[str] | None = None,
    salt: str = "",
    method: str = "xxhash64",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: exactly ``min(k,
    eligible)`` rows per group, inclusion probability proportional to
    ``weight`` — the Efraimidis-Spirakis (2006) reservoir recipe made
    deterministic: each row draws ``u = unit_hash(id, salt)`` and is
    ranked by the exponential key ``ln(u) / w`` (descending; the
    one-pass equivalent of ``u^(1/w)``), ties broken by id. The
    quality-proportional "pick 100k exemplar docs per domain" step
    where Bernoulli :func:`weighted_sample` (expected-size, no cap)
    is the wrong tool.

    Rows with null or non-positive weight are ineligible and never
    selected (the ES key needs ``w > 0``). ``u`` is floored at 2^-33
    so a zero hash cannot hit ``ln(0)`` (Spark nulls it, engines
    disagree on -inf); the floor is below any other attainable hash
    value, so no ordering among nonzero draws changes.

    Properties that make it a *sampling design*, not just a top-k:
    deterministic under any partitioning (hash coin, no RNG state);
    prefix-nested — the k-sample is a subset of the (k+1)-sample (both
    are prefixes of one fixed key order); and re-dealable — a new
    ``salt`` redraws independently. ``method="md5"`` is the
    engine-portable form (DuckDB: ``ln(greatest(('0x' ||
    substr(md5(id || ':' || salt), 1, 8))::BIGINT / 4294967296.0,
    1.1641532182693481e-10)) / w``).

    Scale: one hash-shuffle on ``group_cols`` + per-group sort;
    Spark's WindowGroupLimit forwards at most k rows per group per
    map task, so the shuffle carries candidates, not the corpus. With
    no group columns the window is global — bound it the same way as
    ``ntile_buckets``' scale note for unbounded ungrouped inputs.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight) if isinstance(weight, str) else weight
    eligible = df.filter(w.isNotNull() & (w > 0))
    u = F.greatest(unit_hash(id_col, salt, method), F.lit(2.0 ** -33))
    es_key = F.log(u) / w
    win = Window.partitionBy(*(group_cols or [])).orderBy(
        es_key.desc(), F.col(id_col).asc()
    )
    return (
        eligible.withColumn(rank_col, F.row_number().over(win))
        .filter(F.col(rank_col) <= k)
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str,
    salt: str = "",
    method: str = "xxhash64",
    fractions: dict | None = None,
) -> DataFrame:
    """Exact-count per-stratum downsampling: keep exactly
    ``ceil(fraction * n_s)`` rows from every stratum of size ``n_s``
    (so no non-empty stratum empties out) — the "exactly 10% per
    language, not 10% in expectation" contract that hash-threshold
    :func:`stratified_sample` cannot give on small or skewed strata
    (a 30-row stratum at 10% keeps 0-7 rows under the coin; this
    keeps exactly 3).

    Rows are ranked inside their stratum by the deterministic
    ``unit_hash(id, salt)`` coin (ties by id), and the first
    ``ceil(fraction * n_s)`` survive. Same guarantees as the other
    samplers: partition-invariant, re-dealable by salt, and nested —
    raising the fraction only adds rows (both cuts are prefixes of
    one fixed per-stratum hash order). ``fractions`` overrides the
    global fraction per stratum value ({stratum: fraction}).

    Scale: ONE shuffle on the stratum key serving both the rank
    window and the stratum-count window (same partitioning, shared
    sort); no driver-side counts. Strata are groups — skew means a
    hot stratum sorts on one task; at that point downsample the hot
    stratum with the hash-threshold sampler first and exact-cut the
    rest.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    for k, f in (fractions or {}).items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(
                f"fraction for stratum {k!r} must be in [0,1], got {f}"
            )
    u = unit_hash(id_col, salt, method)
    rank_w = Window.partitionBy(strata_col).orderBy(
        u.asc(), F.col(id_col).asc()
    )
    count_w = Window.partitionBy(strata_col)
    frac_expr = F.lit(float(fraction))
    for value, f in (fractions or {}).items():
        frac_expr = F.when(
            F.col(strata_col) == value, F.lit(float(f))
        ).otherwise(frac_expr)
    keep = F.ceil(frac_expr * F.count(F.lit(1)).over(count_w))
    return (
        df.withColumn("_rn", F.row_number().over(rank_w))
        .withColumn("_keep", keep)  # windows can't sit in a filter
        .filter(F.col("_rn") <= F.col("_keep"))
        .drop("_rn", "_keep")
    )


def budget_select(
    df: DataFrame,
    value_col: str,
    budget: float,
    order_by: list[str],
    cum_col: str = "cum_cost",
    num_partitions: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Keep rows, in ``order_by`` order, while the INCLUSIVE running
    sum of ``value_col`` stays within ``budget`` — the token-budget
    cut of a training-data pipeline ("the best/first N-token subset"):
    order by quality for a greedy quality-per-token selection, by a
    deterministic hash coin for an unbiased fixed-budget subsample.
    With ``group_cols``, the budget applies PER GROUP (the balanced
    variant: the same token budget for every language/domain, however
    lopsided the pool). Output keeps every input column plus
    ``cum_col``; the first row that would cross the budget (and
    everything after it, within its group) is dropped, so no kept
    total ever exceeds ``budget``.

    Scale: the global cut's running sum is ids.running_total's
    two-phase distributed prefix sum (range shuffle + per-partition
    window + broadcast offsets) — never a single-task global window.
    The grouped cut needs no two-phase at all: a window partitioned
    on ``group_cols`` already parallelizes per group (one hash
    shuffle; null values count as 0). Include a unique key last in
    ``order_by`` for a reproducible cut."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if group_cols:
        if cum_col in df.columns:
            raise ValueError(
                f"budget_select: column {cum_col!r} already exists in "
                "the input"
            )
        v = F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(*[F.col(c) for c in order_by])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = df.withColumn(cum_col, F.sum(v).over(w))
    else:
        from meta_frame_spark.operators.ids import running_total

        cum = running_total(
            df, order_by, value_col, out_col=cum_col,
            num_partitions=num_partitions,
        )
    return cum.filter(F.col(cum_col) <= F.lit(float(budget)))
