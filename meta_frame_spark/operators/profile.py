"""Table profiling: per-column stats in one pass (data-quality
tooling for pipeline inputs; no equivalent in the reference).

One job computes every column's stats as a single wide aggregation
(map-side combined), then pivots to long form driver-free with
``stack`` — profiling a 100 TB table costs exactly one scan, and
the wide-agg row is a few KB regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max rendered as strings so mixed types share
    one schema.

    Default distinct counting is approx (HLL): it keeps the whole
    profile map-only + one tiny reduce at any cardinality — one scan
    total, a few-KB aggregate row pivoted to long form with ``stack``.

    ``exact_distinct=True`` plans one single-distinct aggregate PER
    column, unioned: k column-pruned scans whose total bytes ≈ one
    full scan (columnar source), each shuffling only its own column's
    partially-deduped values. The alternative — all k countDistincts
    in ONE aggregate — makes Catalyst Expand every row k times and
    shuffle that multiple of the table; measured ~2× slower at k=4
    even at bench scale, and strictly worse at 100 TB.
    """
    cols = cols or df.columns
    if not exact_distinct:
        aggs = []
        for c in cols:
            aggs += [
                F.count(F.lit(1)).alias(f"__n_{c}"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
                F.approx_count_distinct(c).alias(f"__dist_{c}"),
                F.min(c).cast("string").alias(f"__min_{c}"),
                F.max(c).cast("string").alias(f"__max_{c}"),
            ]
        wide = df.agg(*aggs)

        def lit_(c: str) -> str:  # SQL string literal, quotes escaped
            return "'" + c.replace("'", "''") + "'"

        def ident(pref: str, c: str) -> str:  # backtick-quoted identifier
            return "`" + f"__{pref}_{c}".replace("`", "``") + "`"

        stack_args = ", ".join(
            f"{lit_(c)}, {ident('n', c)}, {ident('null', c)}, "
            f"{ident('dist', c)}, {ident('min', c)}, {ident('max', c)}"
            for c in cols
        )
        return wide.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )

    per_col = [
        df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        ).select(
            F.lit(c).alias("column"),
            "n_rows", "n_nulls", "n_distinct", "min_value", "max_value",
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


def group_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Long-form per-group quantiles: one row per (group, q) with the
    quantile ``value`` — the distribution summary feeding mixture
    dashboards and gate-threshold selection.

    All requested quantiles come from ONE aggregate (``percentile``
    over a literal q-array returns the whole vector from a single
    per-group sort), then unzip to long form with ``arrays_zip`` +
    ``explode`` — so k quantiles cost one shuffle, not k. Exact
    percentile buffers each group's values; at 100 TB switch
    ``exact=False`` for the mergeable ``percentile_approx`` sketch
    (map-side combined, fixed memory) — same plan shape, rank error
    bounded by ``accuracy``.
    """
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"qs must be non-empty fractions in [0, 1], got {qs}")
    keys = list(group_cols or [])
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    agg = (
        F.percentile(value_col, qarr)
        if exact
        else F.percentile_approx(value_col, qarr, F.lit(accuracy))
    )
    wide = df.groupBy(*keys).agg(agg.alias("_qv"))
    zipped = F.explode(F.arrays_zip(qarr.alias("q"), F.col("_qv").alias("value")))
    return wide.select(*keys, zipped.alias("_z")).select(
        *keys, F.col("_z.q").alias("q"), F.col("_z.value").alias("value")
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over ``[lo, hi)``:
    one row per (group, bucket) with the bucket range and count.
    Bucket 0 catches values below ``lo``, bucket ``n_buckets + 1``
    values ``>= hi`` (the SQL ``width_bucket`` convention), 1..n the
    in-range bands — so the counts always sum to the row count and a
    mis-guessed range is visible instead of silently clipped. The
    bucket is computed as an explicit ``floor((v - lo) / width)`` so
    any engine reproduces it bit-for-bit (built-in ``width_bucket``
    implementations disagree across engines at FP boundaries).

    Scale: a plain partial-aggregated groupBy on (group, bucket) —
    at most ``n_buckets + 2`` rows per group cross the shuffle.
    Empty buckets are absent (long form); pivot on the driver if a
    dense vector is wanted — it is tiny.
    """
    if not lo < hi:
        raise ValueError(f"need lo < hi, got {lo}, {hi}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    keys = list(group_cols or [])
    width = (hi - lo) / n_buckets
    v = F.col(value_col)
    bucket = (
        F.when(v < lo, 0)
        .when(v >= hi, n_buckets + 1)
        .otherwise(F.floor((v - F.lit(float(lo))) / F.lit(width)) + 1)
        .cast("int")
    )
    return (
        df.groupBy(*keys, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bucket",
            (F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)).alias("bucket_lo"),
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_hi"),
            "n",
        )
    )


def corpus_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    ns: tuple[int, ...] = (1, 2, 3),
    exact: bool = True,
    rsd: float = 0.05,
    also_approx: bool = False,
) -> DataFrame:
    """Distinct-n lexical diversity report per group — the corpus
    health metric data cards publish (distinct-1/2/3, Li et al. 2016's
    "distinct" statistic at corpus grain): for each ``n`` in ``ns``,
    ``(group_col, n, n_grams, distinct_grams, distinct_ratio)`` over
    word n-grams. A collapsing ratio across crawls flags template
    flooding before any dedup runs; near-1 unigram ratios flag
    gibberish. Documents shorter than ``n`` tokens contribute no
    n-grams at that order.

    Scale: ALL orders are built in one pass — per row, each order's
    n-grams are sliced in-row as ``struct(n, gram)`` (the dedup
    shingle shape), the per-order arrays concat into one array, and a
    single explode feeds a single ``(group, n)`` aggregate: one
    corpus scan and one shuffle regardless of ``len(ns)`` (a
    per-order union would re-scan the corpus per order).
    ``exact=True`` computes exact COUNT(DISTINCT) (a distinct-gram
    shuffle — fine into the low billions of grams, and what the DuckDB
    oracle matches); at 100 TB pass ``exact=False`` for
    ``approx_count_distinct`` at ``rsd``, which keeps the shuffle
    HLL-sketch-sized per group.

    ``also_approx=True`` (with ``exact=True``) appends an
    ``approx_distinct_grams`` column from the SAME single aggregate —
    the sketch-accuracy audit (exact vs HLL side by side) costs one
    corpus pass instead of two (r14 optimization, guide §2.4: the two
    arms shared an identical explode + shuffle; the HLL estimate is
    deterministic for a given dataset, so the values match the
    two-pass form exactly)."""
    from meta_frame_spark.functions.text import tokens

    if not ns:
        raise ValueError("ns must name at least one n-gram order")
    if any(n < 1 for n in ns):
        raise ValueError(f"every n must be >= 1, got {ns}")
    toks = tokens(text_col)

    # NOTE: the window lambda must have arity 1 — F.transform hands a
    # two-argument lambda (element, array_index), so a `n=n` default
    # binding would silently rebind n to the POSITION index
    def _grams(n: int):
        k = F.size(toks) - F.lit(n - 1)
        win = F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("gram"),
            ),
        )
        return F.when(k > 0, win).otherwise(
            F.array().cast("array<struct<n:int,gram:string>>")
        )

    all_grams = F.concat(*[_grams(n) for n in sorted(set(ns))])
    exploded = df.select(
        F.col(group_col), F.explode(all_grams).alias("_g")
    ).select(group_col, F.col("_g.n").alias("n"), F.col("_g.gram").alias("_gram"))
    if also_approx and not exact:
        raise ValueError("also_approx requires exact=True")
    if exact:
        # Two-level aggregate (r14): gram counts first, then the
        # per-group rollup. Equivalent to count(1)+count_distinct in
        # one agg, but AVOIDS Catalyst's distinct-aggregate rewrite
        # (Expand doubles every exploded row before the partial agg;
        # with an imperative HLL alongside it also forces a
        # SortAggregate over the corpus grain — measured 7.0s vs 1.2s
        # for the audit query). Map-side partial aggregation still
        # compresses duplicate grams before the one distinct-gram
        # shuffle, and the HLL sketch is duplicate-insensitive
        # (register max), so feeding it each distinct gram once gives
        # the identical estimate to the corpus-grain form.
        per_gram = exploded.groupBy(group_col, "n", "_gram").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        aggs = [
            F.sum("_cnt").alias("n_grams"),
            F.count(F.lit(1)).alias("distinct_grams"),
        ]
        if also_approx:
            aggs.append(
                F.approx_count_distinct("_gram", rsd).alias(
                    "approx_distinct_grams"
                )
            )
        grouped = per_gram.groupBy(group_col, "n").agg(*aggs)
    else:
        grouped = exploded.groupBy(group_col, "n").agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.approx_count_distinct("_gram", rsd).alias("distinct_grams"),
        )
    return (
        grouped
        .select(
            group_col,
            "n",
            "n_grams",
            "distinct_grams",
            *(["approx_distinct_grams"] if also_approx else []),
            F.round(
                F.col("distinct_grams") / F.col("n_grams").cast("double"),
                6,
            ).alias("distinct_ratio"),
        )
    )


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Append the zlib compressibility quality signal — the
    Gopher/Dolma-class heuristic the distinct-n report complements:
    near-duplicate boilerplate and template floods compress FAR below
    natural prose (ratio -> 0.1-0.2), while random noise/base64 blobs
    refuse to compress (ratio -> ~1.0+); both tails are junk a
    pretraining corpus wants gated. Adds ``n_bytes`` (UTF-8 bytes,
    SQL-exact for the oracle), ``zlib_bytes`` and
    ``compression_ratio`` (= zlib_bytes/n_bytes; NULL for empty/NULL
    text). ``level`` is frozen at 6 (zlib default) — the RATIO is a
    heuristic signal, so cross-build zlib drift moves it at the third
    decimal, never across a sane gate threshold; the oracle therefore
    pins exact byte counts + bounds, not the ratio value. The ratio is
    LENGTH-dependent (zlib header/warmup overhead): very short docs
    can exceed 1.0, long prose lands ~0.2-0.5, so gates should be
    calibrated per corpus length profile.

    Scale: one Arrow map over whole rows (all columns pass through),
    no shuffle, no driver traffic — compose with ``filter`` for the
    two-sided gate."""
    if not 1 <= level <= 9:
        raise ValueError(f"level must be in [1, 9], got {level}")
    for added in ("n_bytes", "zlib_bytes", "compression_ratio"):
        if added in df.columns:
            raise ValueError(
                f"with_compression_ratio: output column {added!r} "
                f"collides with an input column"
            )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = (
        f"{fields}, n_bytes int, zlib_bytes int, compression_ratio double"
    )
    names = [f.name for f in df.schema.fields]

    def comp(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            nb, zb, cr = [], [], []
            for text in pdf[text_col]:
                data = (text or "").encode("utf-8") \
                    if isinstance(text, str) or text is None else b""
                n = len(data)
                if n == 0:
                    nb.append(0)
                    zb.append(None)
                    cr.append(None)
                else:
                    z = len(zlib.compress(data, level))
                    nb.append(n)
                    zb.append(z)
                    cr.append(z / n)
            out = pdf[names].copy()
            out["n_bytes"] = pd.array(nb, dtype="Int32")
            out["zlib_bytes"] = pd.array(zb, dtype="Int32")
            out["compression_ratio"] = pd.array(cr, dtype="float64")
            yield out

    return df.mapInPandas(comp, schema=schema)


def corpus_concentration(
    df: DataFrame,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-row concentration report over a categorical column (the
    mixing diagnostic a release report leads with — is the corpus
    dominated by one source/domain/language?): ``(n_groups, n_rows,
    gini, entropy, top_share)``. ``gini`` uses the sorted-counts form
    G = sum((2i - n - 1) * c_i) / (n * total) with a deterministic
    (count, value) tie order; ``entropy`` is the closed form
    ln(total) - sum(c ln c)/total in nats; ``top_share`` is the
    largest group's mass fraction.

    Scale: one hash aggregate collapses the corpus to |groups| rows
    (map-side partials); the rank window and final fold run on that
    group-sized frame only — the whole-frame window is deliberate and
    safe because nothing corpus-sized enters it."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.orderBy(F.col("_c").asc(), F.col("_g").asc())
    ranked = counts.withColumn("_i", F.row_number().over(w))
    # sum((2i - n - 1) c) decomposes to 2*sum(i*c) - (n+1)*sum(c), so
    # one aggregate pass collects every component
    parts = ranked.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum(F.col("_i") * F.col("_c")).alias("_ic"),
        F.sum(F.col("_c") * F.log(F.col("_c").cast("double"))).alias("_clc"),
        F.max("_c").alias("_top"),
    )
    return parts.select(
        "n_groups",
        "n_rows",
        F.round(
            (2 * F.col("_ic") - (F.col("n_groups") + 1) * F.col("n_rows"))
            / (F.col("n_groups") * F.col("n_rows")).cast("double"),
            round_to,
        ).alias("gini"),
        F.round(
            F.log(F.col("n_rows").cast("double"))
            - F.col("_clc") / F.col("n_rows"),
            round_to,
        ).alias("entropy"),
        F.round(
            F.col("_top") / F.col("n_rows").cast("double"), round_to
        ).alias("top_share"),
    )
