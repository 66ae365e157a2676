"""Corpus search: inverted index + BM25 ranking.

Not in the reference (SURVEY.md §2 — no text surface); this is the
retrieval side of a corpus pipeline (find near-matches of a benchmark
prompt, audit what the corpus says about X, build hard-negative pairs).

Scale design (100 TB corpus):

* the index build is explode → groupBy(term, doc) → groupBy(term):
  two shuffles of (term-hash-sized) skinny rows; positions stay as
  in-doc integer arrays;
* BM25 scoring never builds a corpus-wide index: the token explode is
  FILTERED to the query's terms before anything shuffles, so the
  scored relation holds only matching (doc, term) rows. Corpus-level
  constants (N, avgdl) are one tiny aggregate cross-joined as a
  broadcast scalar — the corpus scans twice (once for stats, once for
  matches), both scans column-pruned to (id, text);
* ranking is a rounded-score ORDER BY ... LIMIT k — Spark plans
  TakeOrderedAndProject (per-partition top-k, no full sort). Scores
  are ranked ROUNDED to ``round_to`` with an id tiebreak so the top-k
  *set* is stable across engines and FP summation orders.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), 0)


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_positions: bool = True,
) -> DataFrame:
    """``(term, postings: array<struct<doc_id, tf [, positions]>>, df)``
    — the classic inverted file, one row per distinct term.

    Postings arrays are sorted by doc id (mergeable). At extreme
    cardinality drop ``with_positions`` — the positions arrays are the
    bulk of the bytes.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(_terms(text_col)).alias("pos", "term")
    )
    agg = [F.count(F.lit(1)).alias("tf")]
    if with_positions:
        agg.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    per_doc = toks.groupBy("term", id_col).agg(*agg)
    fields = [F.col(id_col), F.col("tf")] + (
        [F.col("positions")] if with_positions else []
    )
    return per_doc.groupBy("term").agg(
        F.sort_array(F.collect_list(F.struct(*fields))).alias("postings"),
        F.count(F.lit(1)).alias("df"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Lucene idf variant: ``ln(1 + (N - df + 0.5) / (df + 0.5))``).
    Returns ``(id_col, score)``, score rounded to ``round_to``,
    ranked by (rounded score desc, id asc).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    lens = df.select(F.col(id_col), _terms(text_col).alias("_toks")).select(
        id_col, F.size("_toks").alias("dl"), "_toks"
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    matches = (
        lens.select(
            id_col, "dl", F.explode("_toks").alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = matches.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matches.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", idf * tf_norm)
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), round_to).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
