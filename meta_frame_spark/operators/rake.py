"""RAKE keyword extraction (Rose et al. 2010, public technique).

Not in the reference (no keyword surface); the phrase-level companion
to the TextRank word scores: candidate phrases are maximal runs of
content words between stopword/punctuation boundaries, a word scores
deg(w)/freq(w) (degree counts co-occurrence mass inside phrases), and
a phrase scores the sum of its words — the classic cheap extractor a
corpus release report runs per domain.

Scale design: pure relational gaps-and-islands — tokens explode with
positions, the phrase id is a running stopword count windowed PER
DOCUMENT (state = one doc's tokens, never global), and every
aggregate after that is vocabulary- or phrase-table-sized with
map-side partials. No UDF, no driver state; the same SQL replays in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meta_frame_spark.functions.text import STOPWORDS


def rake_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    max_phrase_len: int = 4,
    top_k: int = 15,
    round_to: int = 6,
) -> DataFrame:
    """Corpus-level RAKE: top ``top_k`` phrases as ``(phrase, freq,
    score)`` — ``freq`` is how many times the exact phrase occurs,
    ``score`` the sum of member-word deg/freq scores (degree = total
    phrase length mass the word appears in, the Rose et al. metric).
    Tokens are lowercase ``[a-z]+`` runs; phrases split at stopwords
    (default: the repo's deterministic English list) and are capped at
    ``max_phrase_len`` words (longer runs are boilerplate noise, the
    standard RAKE practice). Selection orders by ROUNDED score with a
    phrase tie-break, so the top-k set is engine-stable.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if max_phrase_len < 1:
        raise ValueError(f"max_phrase_len must be >= 1, got {max_phrase_len}")
    stops = stopwords if stopwords is not None else STOPWORDS["en"]
    if not stops:
        raise ValueError("rake_keywords needs a non-empty stopword list")

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+"), F.lit(0)
    )
    exploded = df.select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_w")
    ).withColumn("_stop", F.col("_w").isin(stops))

    # gaps-and-islands: the phrase id is the running stopword count —
    # windowed per document, so state is one doc's token run
    w = Window.partitionBy("_id").orderBy("_pos")
    grouped = exploded.withColumn(
        "_grp", F.sum(F.col("_stop").cast("int")).over(w)
    ).filter(~F.col("_stop"))

    phrases = (
        grouped.groupBy("_id", "_grp")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_w"))),
                    lambda s: s["_w"],
                ),
                " ",
            ).alias("_phrase"),
            F.count(F.lit(1)).alias("_plen"),
        )
        .filter(F.col("_plen") <= max_phrase_len)
    )

    # word stats over phrase occurrences: freq = appearances,
    # deg = total phrase-length mass (Rose et al. degree)
    words = phrases.select(
        F.explode(F.split("_phrase", " ")).alias("_w"), "_plen"
    )
    wscore = words.groupBy("_w").agg(
        (
            F.sum("_plen") / F.count(F.lit(1)).cast("double")
        ).alias("_wscore")
    )

    # score each DISTINCT phrase by re-splitting its own text — the
    # member multiset is determined by the phrase string
    distinct = phrases.groupBy("_phrase").agg(
        F.count(F.lit(1)).alias("freq")
    )
    member = distinct.select(
        "_phrase", "freq", F.explode(F.split("_phrase", " ")).alias("_w")
    )
    scored = (
        member.join(F.broadcast(wscore), "_w")
        .groupBy("_phrase", "freq")
        .agg(F.round(F.sum("_wscore"), round_to).alias("score"))
    )
    return (
        scored.select(F.col("_phrase").alias("phrase"), "freq", "score")
        .orderBy(F.col("score").desc(), F.col("phrase").asc())
        .limit(top_k)
    )
