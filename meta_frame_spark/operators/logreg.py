"""Hashed bag-of-n-grams logistic regression — the classic linear
quality classifier of LLM data pipelines.

Not in the reference (SURVEY.md §2 — no model-fitting surface); this
is the public recipe behind CCNet / GPT-3 / LLaMA quality filtering
(Wenzek et al. 2020; Brown et al. 2020 Appendix A): train a linear
classifier over hashed text features to separate a high-quality
exemplar corpus from the raw pool, then keep pool documents the
classifier scores target-like. It complements the two selection tools
already here — ``dsir.dsir_log_weights`` (importance weights, no fit)
and ``nb.nb_train`` (generative Naive Bayes) — with the
discriminative model those papers actually shipped.

Scale design (the same bounded-state discipline as kmeans/pq fits):

* **Features**: every n-gram instance maps to
  ``int(md5(gram)[:hex_chars], 16)`` — a fixed ``V = 16^hex_chars``
  feature space (256 at the default 2), md5 so the DuckDB oracle
  replays every bucket. The per-doc INT bucket array is hashed ONCE,
  map-side, and persisted (the dsir.py round-10 pattern) — gram
  instances are never shuffled.
* **Deterministic full-batch gradient descent**, driver-sequenced:
  each iteration broadcasts the weight vector as a LITERAL array
  (V + 1 doubles), computes every document's logit map-only via
  ``F.aggregate`` over the cached bucket array (no join, no
  shuffle), and reduces the gradient with one groupBy whose output
  is bounded by V rows (map-side partials make the exchange
  kilobytes at any corpus size). Driver state per step: V + 1
  doubles — never data rows.
* Full-batch (not stochastic) on purpose: the fit is a pure
  function of the input set, so the same weights come out on any
  cluster, partitioning, or engine — which is what makes the DuckDB
  oracle able to replay training step by step.
* Iterations are few and fixed (default 3): at 100 TB each step is
  one cached-columnar scan + a V-row shuffle, and the usual
  pipeline gates on a score QUANTILE (see ``ranking.quantile_match``
  / ``gating.quantile_band_filter``), which is insensitive to exact
  convergence.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.cache import track
from meta_frame_spark.operators.dedup import _shingles


def _bucket_array(text_col: str, n: int, hex_chars: int) -> Column:
    """Per-row INT bucket array: one element per n-gram instance."""
    return F.transform(
        _shingles(text_col, n),
        lambda g: F.conv(F.substring(F.md5(g), 1, hex_chars), 16, 10)
        .cast("int"),
    )


def _logit(bucket_arr: Column, weights: list[float]) -> Column:
    """Map-only logit: bias + sum over instances of w[bucket].
    ``weights`` is ``[bias, w_0 .. w_{V-1}]`` broadcast as a literal
    array — no join anywhere. ONE typed array literal (not
    ``F.array`` of V ``lit``s, which would put a V-child CreateArray
    into every generated method and bloat codegen)."""
    warr = F.lit([float(w) for w in weights[1:]])
    return F.lit(float(weights[0])) + F.aggregate(
        F.transform(bucket_arr, lambda b: F.element_at(warr, b + F.lit(1))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_text_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n: int = 2,
    hex_chars: int = 2,
    iters: int = 3,
    learning_rate: float = 1.0,
) -> list[float]:
    """Fit the classifier on rows labeled 0/1 in ``label_col``;
    returns ``[bias, w_0 .. w_{V-1}]`` (V + 1 floats — bounded driver
    state, the kmeans-centroid contract). Null-text rows are ignored.

    Update rule (plain full-batch GD from w = 0, which makes step 1's
    probabilities exactly 0.5 — handy for oracle replay)::

        p_i   = sigmoid(bias + sum_b c_ib * w_b)
        grad_b = (1/N) * sum_i (p_i - y_i) * c_ib
        w_b  -= learning_rate * grad_b        (bias likewise, c=1)

    Per iteration: one map-only scan of the persisted bucket arrays
    for the logits, ONE aggregate for the bias gradient fused with a
    <= V-row groupBy for the weight gradient. The row count N (the
    gradient scale) rides on the bias row of round 1's collect — no
    separate count() job, and round 1 needs no N up front because the
    update applies AFTER the gradients land. Everything the driver
    ever holds is V + 1 doubles and the row count.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 1 <= hex_chars <= 4:
        raise ValueError(
            f"hex_chars must be in [1, 4] (literal-array weights), "
            f"got {hex_chars}"
        )
    v = 16 ** hex_chars
    y = F.col(label_col).cast("double")
    doc_arr = track(
        df.filter(F.col(text_col).isNotNull())
        .select(y.alias("_y"), _bucket_array(text_col, n, hex_chars).alias("_ba"))
        .persist()
    )
    # Small-corpus driver fast path (r15 optimization, guide §1.2 "the
    # distributed algorithm" + §5 "the driver" — the _pagerank_driver
    # pattern): each distributed GD round is a cached scan + explode +
    # groupBy + collect, i.e. one full Spark job of scheduling latency
    # per iteration for a model whose sufficient statistics (the
    # per-doc bucket arrays) fit in one task when the labeled exemplar
    # set is MODEL-sized — which a quality-classifier training set is
    # by construction (CCNet/GPT-3 train on a bounded exemplar corpus,
    # not the pool). Collect the bucket arrays ONCE (bounded by the
    # conf'd doc cap — the dup_clusters limit-collect shape, and the
    # limit scan warms the persist the distributed loop reuses if the
    # cap is exceeded) and run the identical float64 full-batch GD in
    # numpy: same update rule, same N scaling, same iteration count;
    # per-doc logits fold the same per-instance weights, and gradient
    # sums differ from the distributed partial-aggregation order only
    # in summation-reorder ulps (the documented tolerance of this fit
    # — test_train_deterministic_under_partitioning pins 1e-9, and
    # every consumer rounds to 6dp). A 10^9-doc labeled set takes the
    # distributed loop unchanged.
    max_docs = int(
        df.sparkSession.conf.get(
            "spark.meta_frame.logreg.driverMaxDocs", "50000"
        )
    )
    if max_docs > 0:
        rows = doc_arr.limit(max_docs + 1).collect()
        if len(rows) <= max_docs:
            if not rows:
                raise ValueError(
                    "train_text_classifier: no non-null-text rows"
                )
            return _train_driver(rows, v, iters, learning_rate)
    n_rows = None
    weights = [0.0] * (v + 1)
    for _ in range(iters):
        resid = (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-_logit(F.col("_ba"), weights)))
            - F.col("_y")
        )
        scored = doc_arr.select(F.col("_ba"), resid.alias("_r"))
        # bias gradient + per-bucket gradient in ONE job: explode the
        # instances tagged with a sentinel bias row per doc is wasted
        # rows; instead reduce the bias term with a grouping over a
        # constant and the bucket term with the exploded groupBy —
        # both collapse map-side, and the union keeps it one action.
        grad_rows = (
            scored.select(F.explode("_ba").alias("_b"), "_r")
            .groupBy("_b").agg(
                F.sum("_r").alias("_g"), F.count(F.lit(1)).alias("_n")
            )
            .unionByName(
                scored.agg(
                    F.lit(-1).alias("_b"), F.sum("_r").alias("_g"),
                    F.count(F.lit(1)).alias("_n"),
                )
            )
            .collect()
        )  # bounded: <= V + 1 rows
        if n_rows is None:
            n_rows = next(
                int(row._n) for row in grad_rows if row._b == -1
            )
            if n_rows == 0:
                raise ValueError(
                    "train_text_classifier: no non-null-text rows"
                )
        step = learning_rate / n_rows
        for row in grad_rows:
            idx = 0 if row._b == -1 else row._b + 1
            weights[idx] -= step * float(row._g)
    return weights


def _train_driver(rows, v: int, iters: int, learning_rate: float) -> list[float]:
    """Driver-side full-batch GD over collected ``(_y, _ba)`` rows —
    identical arithmetic to the distributed loop (float64, same update
    rule, same N scaling; summation order differs only the way any
    re-partitioning of the distributed loop would). Bounded by the
    caller's conf'd collect cap."""
    import numpy as np

    lens = np.array([len(r._ba) for r in rows], dtype=np.int64)
    yv = np.array([float(r._y) for r in rows])
    n_rows = len(rows)
    flat = (
        np.concatenate([np.asarray(r._ba, dtype=np.int64) for r in rows])
        if int(lens.sum()) else np.empty(0, dtype=np.int64)
    )
    ends = np.cumsum(lens)
    w = np.zeros(v + 1)
    for _ in range(iters):
        per = w[1:][flat] if flat.size else flat.astype(np.float64)
        cs = np.concatenate(([0.0], np.cumsum(per)))
        z = w[0] + (cs[ends] - cs[ends - lens])
        resid = 1.0 / (1.0 + np.exp(-z)) - yv
        step = learning_rate / n_rows
        gw = np.bincount(
            flat, weights=np.repeat(resid, lens), minlength=v
        ) if flat.size else np.zeros(v)
        w[0] -= step * float(resid.sum())
        w[1:] -= step * gw
    return [float(x) for x in w]


def score_text_classifier(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    n: int = 2,
    hex_chars: int = 2,
    out_col: str = "clf_score",
) -> DataFrame:
    """Attach ``sigmoid(bias + sum w[bucket])`` for every row —
    map-only (the weights ride along as a literal array; no join, no
    shuffle, whole-stage codegen end to end). Null text scores NULL.
    """
    if len(weights) != 16 ** hex_chars + 1:
        raise ValueError(
            f"weights must have 16^hex_chars + 1 = {16 ** hex_chars + 1} "
            f"entries, got {len(weights)}"
        )
    z = _logit(_bucket_array(text_col, n, hex_chars), weights)
    score = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("double")
    ).otherwise(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    return df.withColumn(out_col, score)


def sigmoid(x: float) -> float:
    """Driver-side reference sigmoid (tests)."""
    return 1.0 / (1.0 + math.exp(-x))
