"""DSIR-style data selection: hashed n-gram importance weights.

Not in the reference (SURVEY.md §2 — no selection surface); this is
the public importance-resampling recipe of Xie et al., "Data Selection
for Language Models via Importance Resampling" (NeurIPS 2023): fit two
bag-of-hashed-n-grams multinomial models — one on a (small) TARGET
corpus that exemplifies the distribution you want, one on the RAW pool
— and weight every raw document by its log likelihood ratio
``sum_g log(p_target(g) / p_raw(g))``. Resampling the pool by those
weights (or keeping the top fraction) shifts the selected data toward
the target distribution. Downstream, compose with
``operators/sampling.weighted_sample`` (Bernoulli by normalized
weight) or a quantile gate on ``log_weight``.

Scale design:

* **Features are hashed buckets, not strings**: every n-gram maps to
  ``substr(md5(gram), 1, hex_chars)`` — a fixed 16^hex_chars feature
  space (4,096 at the default 3), the same hashing trick the paper
  uses (they hash to 10k buckets). Both model fits therefore reduce to
  ONE groupBy each whose result is bounded by the bucket count —
  kilobytes, broadcast back — regardless of corpus size. md5 (not
  xxhash64) keeps the bucket id engine-portable, so the DuckDB oracle
  reproduces every value (same recipe as sampling._md5_hex4).
* **One pass over the pool, zero corpus-sized shuffles**: raw text is
  tokenized and hashed ONCE into a persisted per-doc integer bucket
  array (4 bytes per gram instance at hex_chars <= 7, 8 at 8 —
  ``_bucket_dtype``; map-side); the pool model fit and the
  scoring pass each explode from that cache, and both groupBys
  collapse map-side before their exchanges — the fit to ≤ V rows per
  partition, the score to one row per doc (a doc never spans
  partitions). Gram instances are never shuffled; the wire carries
  kilobytes at any corpus size.
* Buckets unseen in BOTH corpora share one constant smoothed ratio
  ``log((T_raw + s*V) / (T_target + s*V))`` — applied via coalesce
  after the left join, so the ratio table only materializes observed
  buckets (<= V rows), never the full feature space.
* The only driver scalars are the two corpus gram totals (two one-row
  aggregates), the same bounded-stats pattern as the quantizer fits.
* Laplace smoothing ``smoothing`` over the full V-bucket space keeps
  every ratio finite; exact doubles internally, rounding is the
  caller's presentation concern (repo contract: ROUND(x, 6)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.cache import track
from meta_frame_spark.operators.dedup import _shingles


def _bucket_dtype(hex_chars: int) -> str:
    """Narrowest exact integer type for a base-16 ``hex_chars``-digit
    bucket id: INT through 7 hex digits (16^7 - 1 < 2^31), LONG at 8
    (16^8 - 1 > 2^31 - 1 — the non-ANSI string->int cast NULLs the
    top half of that bucket space, ADVICE r10, and every gram there
    would silently take the unseen-bucket default log-ratio). The
    round-11 A/B measured the always-long form +21% on dsir_weights
    (8-byte vs 4-byte bucket arrays in the persisted cache and
    shuffle rows), so the narrow type is kept where it is exact."""
    return "int" if hex_chars <= 7 else "long"


def _gram_buckets(df: DataFrame, text_col: str, n: int, hex_chars: int,
                  *extra_cols) -> DataFrame:
    """One row per n-gram INSTANCE (DSIR counts occurrences, not
    distinct grams): ``(*extra_cols, _b)`` with ``_b`` an integer
    bucket id (``_bucket_dtype`` — the narrowest exact type) — the
    md5-hex truncation is parsed base-16 MAP-SIDE (VERDICT r9 "Next
    round" #5), so every downstream shuffle row is fixed-width
    instead of carrying a string key (UnsafeRow strings cost an
    8-byte offset/len word plus padded bytes). Bucket identity is
    unchanged (hex -> integer IS a bijection for hex_chars <= 8), so
    log_weight values and every oracle replay are byte-identical."""
    from meta_frame_spark.operators.skew import ensure_min_partitions

    return ensure_min_partitions(df.filter(F.col(text_col).isNotNull())).select(
        *extra_cols, F.explode(_shingles(text_col, n)).alias("_g")
    ).select(
        *extra_cols,
        F.conv(F.substring(F.md5(F.col("_g")), 1, hex_chars), 16, 10)
        .cast(_bucket_dtype(hex_chars)).alias("_b"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    hex_chars: int = 3,
    smoothing: float = 1.0,
) -> DataFrame:
    """``(id_col, n_grams, log_weight)`` for every raw document with
    non-null text: ``log_weight = sum_g log p_t(b(g)) - log p_r(b(g))``
    over the document's n-gram instances, where each corpus model is
    Laplace-smoothed over the full ``V = 16^hex_chars`` bucket space:
    ``p_c(b) = (count_c(b) + smoothing) / (total_c + smoothing * V)``.

    Positive weights read "more target-like than pool-like". A
    document with zero grams cannot occur (a non-null text yields at
    least one — possibly partial — gram, matching the dedup family's
    shingle semantics), so every raw doc gets exactly one row.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not 1 <= hex_chars <= 8:
        raise ValueError(f"hex_chars must be in [1, 8], got {hex_chars}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    v = float(16 ** hex_chars)

    # ONE tokenize+md5 pass over the raw corpus, ZERO corpus-sized
    # shuffles (VERDICT r9 "Next round" #5, revised after profiling:
    # the old design persisted a per-doc bucket-count frame, but
    # materializing it cost a gram-granularity groupBy exchange —
    # ~24 MB shuffled at the 10x smoke — that existed only to give
    # the cache a compact shape; every (doc, bucket) group already
    # lived in one map partition). Instead the persisted shared
    # branch is the per-doc integer bucket array itself (hashing
    # happens once, map-side, _bucket_dtype per gram instance); the
    # pool fit and the
    # scoring pass each explode from the cache, and their groupBys
    # collapse map-side to <= V rows and one row per doc
    # respectively before their exchanges — kilobytes on the wire
    # at any corpus size.
    from meta_frame_spark.operators.skew import ensure_min_partitions

    def _bucket(g):
        return F.conv(
            F.substring(F.md5(g), 1, hex_chars), 16, 10
        ).cast(_bucket_dtype(hex_chars))

    doc_arr = track(
        ensure_min_partitions(raw.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col),
            F.transform(_shingles(text_col, n), _bucket).alias("_ba"),
        )
        .persist()
    )
    # BOTH model fits share ONE bucket-grain aggregation (r15, VERDICT
    # r14 "Next round" #4, guide §2.4 "remove shuffles outright"): the
    # target grams and pool grams union with a side flag and ONE
    # groupBy(_b) emits both counts side by side — the old shape's
    # second bucket-grain exchange AND the full_outer count-table join
    # disappear; conditional counts make absent-side buckets 0, exactly
    # what the old coalesce(_c, 0) after the outer join produced, so
    # every _lr value (and the oracle replay) is byte-identical.
    counts = track(
        doc_arr.select(F.explode("_ba").alias("_b"), F.lit(False).alias("_t"))
        .unionAll(
            _gram_buckets(target, text_col, n, hex_chars)
            .select("_b", F.lit(True).alias("_t"))
        )
        .groupBy("_b").agg(
            F.count(F.when(F.col("_t"), 1)).alias("_ct"),
            F.count(F.when(~F.col("_t"), 1)).alias("_cr"),
        )
        .persist()
    )
    # bounded driver scalars: the two corpus gram totals, in ONE
    # aggregate over the single persisted count frame
    totals = counts.agg(
        F.coalesce(F.sum("_ct"), F.lit(0)).alias("st"),
        F.coalesce(F.sum("_cr"), F.lit(0)).alias("sr"),
    ).collect()[0]
    tt, tr = float(totals.st), float(totals.sr)
    ratio = counts.select(
        "_b",
        (
            F.log((F.col("_ct") + F.lit(smoothing)) / F.lit(tt + smoothing * v))
            - F.log((F.col("_cr") + F.lit(smoothing)) / F.lit(tr + smoothing * v))
        ).alias("_lr"),
    )
    # buckets observed in neither corpus: the smoothed-floor constant
    import math

    default_lr = math.log((tr + smoothing * v) / (tt + smoothing * v))
    return (
        doc_arr.select(id_col, F.explode("_ba").alias("_b"))
        .join(F.broadcast(ratio), "_b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.coalesce(F.col("_lr"), F.lit(default_lr))
            ).alias("log_weight"),
        )
    )
