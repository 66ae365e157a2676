"""Retrieval evaluation metrics — recall/precision@k, MRR, nDCG.

Not in the reference (no search surface); this is the measurement half
of the search/ANN family (`operators/search.py`, the `ann_topk_*`
tiers): given a ranked result list and a relevance-judgment table
(TREC qrels shape), score each query with the standard public metrics
(Järvelin & Kekäläinen 2002 for nDCG) so index/tier changes are
judged by retrieval quality, not eyeballs.

Scale design: both inputs are row streams keyed by query — the join is
a plain (query, doc) equi-join, the ideal-DCG ranking is a window
partitioned BY QUERY (state = one query's judgments, never global),
and the output is one row per judged query. Nothing here depends on
corpus size beyond the result/qrels tables themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval metrics at cutoff ``k``:
    ``(query_col, n_rel, n_hits, recall_at_k, precision_at_k,
    reciprocal_rank, ndcg_at_k)``.

    ``results`` holds ranked retrievals (``rank_col`` 1-based, one row
    per (query, doc)); ``qrels`` holds graded judgments (``rel_col``
    >= 0, unjudged docs simply absent — they score 0, the TREC
    convention). Only JUDGED queries (present in ``qrels`` with at
    least one positive judgment) are scored; macro-average downstream
    with one ``agg``. nDCG uses the standard
    ``sum(rel / log2(rank + 1))`` gain against the ideal ordering of
    that query's judgments truncated at ``k``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for frame, col, name in (
        (results, rank_col, "results"),
        (qrels, rel_col, "qrels"),
    ):
        if col not in frame.columns:
            raise ValueError(f"{name} is missing column {col!r}")

    topk = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col), F.col(doc_col), F.col(rank_col)
    )
    judged = qrels.filter(F.col(rel_col) > 0)

    # per-query totals + ideal DCG over the best-possible ordering
    # (rel desc within the query, truncated at k) — the window is
    # partitioned by query, so its state is one query's judgments
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(doc_col).asc()
    )
    ideal = (
        judged.withColumn("_irank", F.row_number().over(w))
        .withColumn(
            "_igain",
            F.when(
                F.col("_irank") <= k,
                F.col(rel_col) / F.log2(F.col("_irank") + 1),
            ).otherwise(F.lit(0.0)),
        )
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum("_igain").alias("_idcg"),
        )
    )

    # retrieved-side gains: unjudged docs score 0 via the left join
    hits = (
        topk.join(
            judged.select(query_col, doc_col, rel_col),
            [query_col, doc_col],
            "left",
        )
        .withColumn("_rel", F.coalesce(F.col(rel_col), F.lit(0)))
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("_n_ret"),
            F.sum((F.col("_rel") > 0).cast("int")).alias("n_hits"),
            F.max(
                F.when(
                    F.col("_rel") > 0, 1.0 / F.col(rank_col)
                ).otherwise(F.lit(0.0))
            ).alias("reciprocal_rank"),
            F.sum(
                F.col("_rel") / F.log2(F.col(rank_col) + 1)
            ).alias("_dcg"),
        )
    )

    return (
        ideal.join(hits, query_col, "left")
        .select(
            query_col,
            "n_rel",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0))
                / F.col("n_rel").cast("double"),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce("reciprocal_rank", F.lit(0.0)), 6
            ).alias("reciprocal_rank"),
            F.round(
                F.coalesce("_dcg", F.lit(0.0)) / F.col("_idcg"), 6
            ).alias("ndcg_at_k"),
        )
    )


def rouge_n_scores(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    ns: tuple[int, ...] = (1, 2),
    lowercase: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-row ROUGE-N between a candidate and a reference text (Lin
    2004, the standard summarization/generation overlap metric —
    in a data pipeline it scores near-duplicate summaries, judges
    extractive compressions, and audits decontamination by n-gram
    recall): appends ``rouge{n}_p`` / ``rouge{n}_r`` / ``rouge{n}_f``
    for each requested order.

    Definition (multiset, clipped): overlap = Σ over distinct
    candidate n-grams of min(count_in_candidate, count_in_reference);
    precision = overlap / |candidate grams|, recall = overlap /
    |reference grams|, F1 their harmonic mean; empty-gram sides score
    0 by convention (not NULL — a pair with an empty side is a real
    0-overlap observation).

    Scale: pure codegen higher-order functions over whitespace-token
    n-gram arrays — MAP-ONLY, no shuffle, no UDF, stream-safe. The
    per-row clipped sum is O(distinct_c × len_c) comparisons inside
    one task; engine-portable (DuckDB spells the identical chain, so
    a full oracle replays every score)."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be positive n-gram orders, got {ns}")

    def grams(col: str, n: int):
        text = F.col(col)
        if lowercase:
            text = F.lower(text)
        toks = F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))
        if n == 1:
            return toks
        idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
        built = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
        )
        return F.when(F.size(toks) >= n, built).otherwise(
            F.array().cast("array<string>")
        )

    out = df
    for n in ns:
        cg = grams(cand_col, n)
        rg = grams(ref_col, n)
        out = out.withColumn(f"_cg{n}", cg).withColumn(f"_rg{n}", rg)
        cgc, rgc = F.col(f"_cg{n}"), F.col(f"_rg{n}")
        clip = F.aggregate(
            F.array_distinct(cgc),
            F.lit(0),
            lambda acc, g: acc + F.least(
                F.size(F.filter(cgc, lambda x: x == g)),
                F.size(F.filter(rgc, lambda x: x == g)),
            ),
        )
        out = out.withColumn("_clip", clip)
        p = F.when(
            F.size(cgc) > 0, F.col("_clip") / F.size(cgc).cast("double")
        ).otherwise(F.lit(0.0))
        r = F.when(
            F.size(rgc) > 0, F.col("_clip") / F.size(rgc).cast("double")
        ).otherwise(F.lit(0.0))
        out = (
            out.withColumn(f"rouge{n}_p", F.round(p, round_to))
            .withColumn(f"rouge{n}_r", F.round(r, round_to))
        )
        f1 = F.when(
            (F.col(f"rouge{n}_p") + F.col(f"rouge{n}_r")) > 0,
            2 * F.col(f"rouge{n}_p") * F.col(f"rouge{n}_r")
            / (F.col(f"rouge{n}_p") + F.col(f"rouge{n}_r")),
        ).otherwise(F.lit(0.0))
        out = out.withColumn(f"rouge{n}_f", F.round(f1, round_to))
        out = out.drop(f"_cg{n}", f"_rg{n}", "_clip")
    return out
