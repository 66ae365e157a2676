"""Corpus-derived unigram language-model scoring.

Not in the reference (SURVEY.md §2); this is the CCNet-style quality
signal: fit a unigram LM on the corpus itself (or a trusted slice),
score each document by its mean negative log-likelihood, and gate or
bucket on the score — gibberish and boilerplate score far from the
bulk of the distribution.

Model: ``p(tok) = count(tok) / total_tokens`` over the fitted corpus,
restricted to the ``top_v`` most frequent tokens; out-of-vocabulary
tokens score as count 1 (a floor, not Laplace smoothing — keeps the
oracle exactly SQL-expressible). Document score =
``avg(-ln p(tok))`` over all its tokens.

Scale design:

* Fitting: one explode + hash-shuffle groupBy token (map-side partial
  counts make the shuffle ~vocab-sized per task, not corpus-sized);
  ``top_v`` is a TakeOrdered (no global sort). The counts table feeds
  both the vocab and the total-token scalar, so it is persisted.
* Scoring: vocab (``top_v`` rows) is broadcast; the corpus side is
  explode → map-only probe → one groupBy on doc id. No corpus
  shuffle besides the final per-doc average.
* Fit once, score many: ``unigram_vocab`` is separable so the model
  can be fit on a trusted slice and reused across corpus shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.skew import ensure_min_partitions

_TOK = "_mfs_tok"


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 10_000,
) -> tuple[DataFrame, int]:
    """Fit: ``(token, cnt)`` for the ``top_v`` most frequent tokens
    (ties broken by token string, so the vocab is deterministic), plus
    the total token count of the fitted corpus (all tokens, in- and
    out-of-vocabulary — the probability denominator)."""
    counts = (
        ensure_min_partitions(df)
        .select(F.explode(_tokens(text_col)).alias(_TOK))
        .groupBy(_TOK)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    vocab = counts.orderBy(F.col("cnt").desc(), F.col(_TOK).asc()).limit(top_v)
    return vocab.withColumnRenamed(_TOK, "token"), int(total)


def unigram_logprob(
    df: DataFrame,
    vocab: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score: ``(id_col, n_tokens, avg_neg_logprob)`` per document
    under the fitted model — higher = more surprising under the
    corpus distribution."""
    toks = ensure_min_partitions(df).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    probed = toks.join(F.broadcast(vocab), "token", "left")
    nll = -F.log(F.coalesce(F.col("cnt"), F.lit(1)) / F.lit(float(total_tokens)))
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.avg(nll).alias("avg_neg_logprob"),
        )
    )


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 10_000,
) -> DataFrame:
    """Fit on ``df`` and score ``df`` (the self-calibrating shape)."""
    vocab, total = unigram_vocab(df, text_col, top_v)
    return unigram_logprob(df, vocab, total, text_col, id_col)
