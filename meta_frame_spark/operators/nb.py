"""Multinomial Naive Bayes text classifier, trained and applied as
pure aggregations.

Not in the reference (SURVEY.md §2 — no ML surface); this is the
standard supervised baseline a corpus pipeline trains on its own
labels (language, source, quality tier) to re-label or audit unlabeled
slices — the event-count model of McCallum & Nigam, "A Comparison of
Event Models for Naive Bayes Text Classification" (AAAI-98 workshop).

Scale design (the reason NB is THE distributed classifier):

* **fit is one groupBy**: token counts per (label, token) with
  map-side combine — no iterations, no gradient state, no driver data
  path. The vocabulary is bounded to the global frequency head
  (``vocab_size``), so the model is a (V x L) table of
  log-conditionals plus L priors — kilobytes, broadcast to every
  executor.
* **score is one broadcast join + one aggregate**: explode test
  tokens, hash-join the broadcast conditional table, sum log-probs
  per (doc, label), add the prior, argmax per doc via a row_number
  window on the doc key. Two shuffles total (count agg + argmax),
  both on keys with natural cardinality.
* Out-of-vocabulary tokens are ignored BY DESIGN — the fitted-
  vocabulary convention (scikit-learn's ``MultinomialNB`` after
  ``CountVectorizer``): they drop out of the inner join and the doc
  is scored on its in-vocabulary stream only. (This is a modeling
  choice, not a no-op: under Laplace smoothing an OOV floor
  ``log(s / (n_l + s*V))`` would be label-dependent, so including
  OOV tokens at the floor would shift scores toward small-corpus
  labels.) A document with ZERO in-vocabulary tokens still scores —
  the doc x label matrix is built from the doc ids crossed with the
  L-row prior table, so such docs fall back to the prior argmax
  instead of vanishing.
* Scores are exact doubles internally and rounded only at the
  presentation layer (the repo-wide determinism contract): ranking
  uses 6dp-rounded scores with a label-asc tiebreak, so FP sum-order
  differences across engines and partitionings cannot flip a
  prediction unless two labels genuinely tie to a micro-nat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meta_frame_spark.functions.text import tokens


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    vocab_size: int = 2048,
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB: returns ``(priors, cond)``.

    ``priors`` is ``(label, log_prior)`` — document-frequency priors.
    ``cond`` is the FULL labels x vocabulary grid ``(label, token,
    log_cond)`` with Laplace smoothing ``smoothing`` over the realized
    vocabulary size, so every in-vocabulary token has a conditional
    for every label (zero-count cells get the smoothed floor rather
    than dropping out). The vocabulary is the global top
    ``vocab_size`` tokens by count (token-asc tiebreak — deterministic
    under any partitioning). The only driver scalars are the realized
    vocabulary size and the training document count.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    tok = df.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    # ONE tokenize pass over the training corpus: the canonical
    # wordcount groupBy — bounded by labels x distinct tokens, far
    # smaller than token instances — is persisted, and both the
    # vocabulary head and the per-(label, token) model counts derive
    # from it. (The previous shape ran the explode twice: once for the
    # vocabulary sort, once for the counts join.)
    tok_counts = (
        tok.groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("n_lt"))
        .persist()
    )
    # Materialize the vocabulary head as a bounded driver list
    # (<= vocab_size strings — the same bounded-fit budget as the
    # quantizer codebooks) and re-enter it as a local relation: the
    # lazy alternative left the groupBy+sort vocabulary plan embedded
    # THREE times in the final scoring DAG (the size count, the counts
    # join, the grid crossJoin).
    vocab_list = [
        r.token
        for r in tok_counts.groupBy("token")
        .agg(F.sum("n_lt").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(vocab_size)
        .select("token")
        .collect()
    ]
    v = len(vocab_list)
    if v == 0:
        raise ValueError("nb_train: training corpus has no tokens")
    vocab = df.sparkSession.createDataFrame(
        [(t,) for t in vocab_list], "token string"
    )
    counts = tok_counts.join(F.broadcast(vocab), "token")
    label_tot = counts.groupBy("label").agg(F.sum("n_lt").alias("n_l"))
    # bounded driver scalar: the training doc count (prior denominator)
    n_docs = df.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).count()
    if n_docs == 0:
        raise ValueError("nb_train: no rows with non-null label and text")
    priors = (
        df.filter(F.col(label_col).isNotNull() & F.col(text_col).isNotNull())
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "label",
            F.log(F.col("n_docs") / F.lit(float(n_docs))).alias("log_prior"),
        )
    )
    grid = (
        label_tot.select("label", "n_l")
        .crossJoin(F.broadcast(vocab))
        .join(counts, ["label", "token"], "left")
        .select(
            "label",
            "token",
            F.log(
                (F.coalesce(F.col("n_lt"), F.lit(0)) + F.lit(smoothing))
                / (F.col("n_l") + F.lit(smoothing * v))
            ).alias("log_cond"),
        )
    )
    return priors, grid


def nb_predict(
    df: DataFrame,
    priors: DataFrame,
    cond: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """``(id_col, pred_label, score)`` — the argmax label per document
    under the fitted model, score = log prior + sum of in-vocabulary
    token log-conditionals, rounded to ``round_to``. Ties rank
    label-asc (deterministic). Documents with no in-vocabulary tokens
    fall back to the prior argmax."""
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    tok = base.select(
        "_id", F.explode(tokens(F.lower(F.col("_text")))).alias("token")
    )
    # Prior fused into the score union (r15, VERDICT r14 "Next round"
    # #7, guide §2.4): instead of aggregating token log-conditionals
    # per (doc, label) and LEFT-JOINING the result onto the doc x label
    # prior matrix (a second (doc,label)-grain exchange), the prior
    # rides as one more addend row — the doc x label matrix (broadcast
    # nested loop over a handful of labels; keeps zero-known-token
    # docs scoreable) unions with the token-grain scored rows and ONE
    # groupBy sums both. log_prior + sum(log_cond) per (doc, label)
    # to summation-reorder ulps, far below the round_to presentation
    # rounding the argmax reads.
    pri = (
        base.select("_id").distinct()
        .crossJoin(F.broadcast(priors))
        .select("_id", "label", F.col("log_prior").alias("_part"))
    )
    scored = tok.join(F.broadcast(cond), "token").select(
        "_id", "label", F.col("log_cond").alias("_part")
    )
    mat = (
        pri.unionByName(scored)
        .groupBy("_id", "label")
        .agg(F.sum("_part").alias("_score"))
    )
    # argmax as an aggregate, not a window (no per-doc sort): min over
    # struct(-rounded score, label) is exactly (score desc, label asc)
    r = F.round(F.col("_score"), round_to)
    best = mat.groupBy("_id").agg(
        F.min(F.struct((-r).alias("_nr"), F.col("label").alias("_l"),
                       r.alias("_r"))).alias("_m")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_m._l").alias("pred_label"),
        F.col("_m._r").alias("score"),
    )
