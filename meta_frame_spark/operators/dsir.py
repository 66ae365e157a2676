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
* **One pass over the pool**: raw grams are exploded and hashed ONCE
  into a persisted per-doc bucket-count frame (``(doc, bucket, c)`` —
  compressed vs gram instances); the pool model fit re-aggregates
  those rows and scoring broadcast-hash-joins the bucket ratio table
  against them with a weighted per-doc sum. Shuffles: the per-doc
  bucket-count groupBy, the two bounded fit groupBys, and the final
  per-doc aggregate — all on compact rows, never raw gram instances.
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


def _gram_buckets(df: DataFrame, text_col: str, n: int, hex_chars: int,
                  *extra_cols) -> DataFrame:
    """One row per n-gram INSTANCE (DSIR counts occurrences, not
    distinct grams): ``(*extra_cols, _bucket)``."""
    from meta_frame_spark.operators.skew import ensure_min_partitions

    return ensure_min_partitions(df.filter(F.col(text_col).isNotNull())).select(
        *extra_cols, F.explode(_shingles(text_col, n)).alias("_g")
    ).select(
        *extra_cols, F.substring(F.md5(F.col("_g")), 1, hex_chars).alias("_b")
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

    # ONE explode+md5 pass over the raw corpus: per-doc bucket counts
    # (<= min(doc grams, V) rows per doc — far smaller than gram
    # instances) are persisted as the shared branch, and the pool
    # model fit is a re-aggregation of the same rows. Without this the
    # raw corpus was exploded and hashed twice — once for the fit,
    # once for scoring. The same pattern as similarity.py's persisted
    # shared branch; spills to disk at scale.
    doc_bucket = track(
        _gram_buckets(raw, text_col, n, hex_chars, F.col(id_col))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .persist()
    )
    t_counts = track(
        _gram_buckets(target, text_col, n, hex_chars)
        .groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
        .persist()
    )
    r_counts = track(
        doc_bucket.groupBy("_b").agg(F.sum("_c").alias("_cr")).persist()
    )
    # bounded driver scalars: the two corpus gram totals, fetched in
    # ONE job (a crossJoin of two 1-row aggregates) so both persisted
    # count frames materialize in parallel instead of as two
    # driver-sequenced barriers
    totals = (
        t_counts.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("st"))
        .crossJoin(
            r_counts.agg(F.coalesce(F.sum("_cr"), F.lit(0)).alias("sr"))
        )
        .collect()[0]
    )
    tt, tr = float(totals.st), float(totals.sr)
    ratio = (
        t_counts.join(r_counts, "_b", "full_outer")
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(smoothing))
                    / F.lit(tt + smoothing * v)
                )
                - F.log(
                    (F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(smoothing))
                    / F.lit(tr + smoothing * v)
                )
            ).alias("_lr"),
        )
    )
    # buckets observed in neither corpus: the smoothed-floor constant
    import math

    default_lr = math.log((tr + smoothing * v) / (tt + smoothing * v))
    return (
        doc_bucket.join(F.broadcast(ratio), "_b", "left")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_grams"),
            F.sum(
                F.col("_c") * F.coalesce(F.col("_lr"), F.lit(default_lr))
            ).alias("log_weight"),
        )
    )
