#!/usr/bin/env python
"""Targeted data selection with meta_frame_spark.

The "we have a big raw pool, we want the slice that looks like OUR
data" flow — the selection half of a pretraining pipeline, composed
from the library's round-8 operators. Every stage is a lazy DataFrame
transform; the only driver scalars are two gram totals and two
quantile boundaries:

    raw documents + target exemplars
      -> DSIR importance weights       (hashed-bigram log likelihood
                                        ratio vs the target corpus)
      -> quality signals + RRF fusion  (length, distinct tokens,
                                        type-token ratio, Flesch
                                        readability — fused by rank,
                                        no normalization step)
      -> per-language quality calibration
                                       (quantile_match: "good for its
                                        language", so one gate works
                                        across languages)
      -> select: target-like AND high-calibrated-quality
                                       (quantile gates on both axes)
      -> NB audit                      (does the selected slice's
                                        predicted-language mix match
                                        the target's?)
      -> embedding drift report        (did selection move the
                                        embedding distribution, i.e.
                                        is a frozen ANN index still
                                        valid for the kept slice?)
      -> PMI collocation report        (what multi-word expressions
                                        dominate the kept slice —
                                        tokenizer-design input)
      -> exemplar shortlist            (weighted_sample_k: 3 docs per
                                        language, inclusion odds
                                        proportional to target-
                                        likeness — without
                                        replacement, deterministic)
      -> token-budget cut              (budget_select: greedy most-
                                        target-like-first prefix while
                                        the running character count
                                        stays within budget — the
                                        distributed prefix sum, never
                                        a single-task window)

Run:  python examples/select_for_target.py [sf_dir]
Default: /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def select_for_target(spark: SparkSession, sf_dir: str) -> dict:
    from meta_frame_spark.functions.text import readability_stats
    from meta_frame_spark.operators.dsir import dsir_log_weights
    from meta_frame_spark.operators.nb import nb_predict, nb_train
    from meta_frame_spark.operators.ranking import quantile_match, rrf_fuse
    from meta_frame_spark.operators.sampling import weighted_sample_k
    from meta_frame_spark.operators.stats import embedding_drift
    from meta_frame_spark.operators.vocab import pmi_collocations

    base = sf_dir.rstrip("/")
    docs = spark.read.parquet(f"{base}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    emb = spark.read.parquet(f"{base}/embeddings.parquet")

    # The target corpus: what we WANT more of. Here the English slice
    # stands in; in production this is a curated exemplar set.
    target = docs.filter(F.col("lang") == "en")

    # 1. DSIR: every pool doc scored by how target-like its hashed
    # bigrams are. Bounded model fits, broadcast-ratio scoring.
    weights = dsir_log_weights(docs, target, n=2, hex_chars=3)

    # 2. Quality: four cheap signals fused by rank (RRF) — scale-free,
    # so a perplexity or classifier score slots in later unchanged.
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), 0)
    sig = readability_stats(docs).select(
        "doc_id",
        F.col("n_chars").cast("double").alias("s_len"),
        F.size(F.array_distinct(toks)).cast("double").alias("s_distinct"),
        F.when(F.size(toks) == 0, F.lit(0.0))
        .otherwise(F.size(F.array_distinct(toks)) / F.size(toks))
        .alias("s_ttr"),
        F.col("flesch").alias("s_read"),
    )
    quality = rrf_fuse(sig, ["s_len", "s_distinct", "s_ttr", "s_read"])

    # 2b. Calibrate the fused quality ACROSS languages: raw signal
    # distributions differ per language, so a single global gate would
    # just pick the verbose languages. quantile_match re-expresses each
    # doc's quality as "the pooled value at its within-language
    # percentile" — high means good FOR ITS LANGUAGE.
    quality = quantile_match(
        quality.join(docs.select("doc_id", "lang"), "doc_id"),
        "rrf", ["lang"], "doc_id", out_col="rrf_cal",
    )

    # 3. Select: above-median target-likeness AND above-median
    # calibrated quality. approxQuantile keeps the gate one bounded
    # driver scalar per axis (never a global sort of the pool).
    scored = weights.join(
        quality.select("doc_id", F.col("rrf_cal").alias("rrf")), "doc_id"
    ).persist()
    w_med = scored.approxQuantile("log_weight", [0.5], 0.001)[0]
    q_med = scored.approxQuantile("rrf", [0.5], 0.001)[0]
    kept = scored.filter(
        (F.col("log_weight") >= w_med) & (F.col("rrf") >= q_med)
    )
    n_pool, n_kept = scored.count(), kept.count()
    print(f"pool {n_pool} -> kept {n_kept} "
          f"(log_weight >= {w_med:.3f}, rrf >= {q_med:.6f})")

    # 4. NB audit: fit a language model of the labels on the pool,
    # predict the kept slice — selection aimed at English, so the
    # predicted mix should skew heavily to the target label.
    priors, cond = nb_train(docs, label_col="lang", vocab_size=256)
    mix = (
        nb_predict(kept.join(docs.select("doc_id", "text"), "doc_id"),
                   priors, cond)
        .groupBy("pred_label").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pred_label")
    )
    print("predicted-language mix of the kept slice:")
    for r in mix.collect():
        print(f"  {r.pred_label:4s} {r.n}")

    # 5. Embedding drift: kept vs dropped halves of the vector table
    # (by id parity with the doc selection). A large l2_shift /
    # cos_means below ~0.99 says "re-fit your ANN index cells".
    kept_ids = kept.select(F.col("doc_id").alias("vec_id"))
    a = emb.join(kept_ids, "vec_id", "left_semi")
    b = emb.join(kept_ids, "vec_id", "left_anti")
    drift_row = embedding_drift(a, b).first()
    print("embedding drift (kept vs dropped):")
    print(drift_row.asDict())

    # 6. Collocations the kept slice is built from — candidate
    # multi-word units worth protecting from tokenizer splits.
    kept_docs = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    coll = pmi_collocations(kept_docs, k=10, min_count=3).collect()
    print("top collocations in the kept slice:")
    for r in coll:
        print(f"  {r.rank:2d}. {r.w1} {r.w2}  pmi={r.pmi:.3f} n={r.n_pair}")

    # 7. Exemplar shortlist: 3 docs per language from the kept slice,
    # inclusion odds proportional to exp-normalized target-likeness —
    # weighted WITHOUT replacement, deterministic under reruns.
    shortlist = weighted_sample_k(
        kept.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("w", F.exp("log_weight")),
        3, "w", "doc_id", group_cols=["lang"], salt="demo",
    )
    n_shortlist = shortlist.count()
    print(f"exemplar shortlist: {n_shortlist} docs "
          f"(<=3 per language, weight-proportional)")

    # 8. Token-budget cut: the kept slice is usually still bigger than
    # the training budget — keep the MOST target-like docs while the
    # inclusive running character count stays within budget (greedy
    # quality-per-token; the running sum is ids.running_total's
    # two-phase distributed prefix sum, never a single-task window).
    from meta_frame_spark.operators.sampling import budget_select

    budgeted = budget_select(
        kept.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("_neg_w", -F.col("log_weight")),
        "n_chars", 20_000.0, ["_neg_w", "doc_id"],
    ).persist()
    n_budget = budgeted.count()
    budget_chars = float(budgeted.agg(F.max("cum_cost")).first()[0] or 0.0)
    print(f"token-budget cut: {n_budget} docs, "
          f"{budget_chars:.0f}/20000 chars kept")
    budgeted.unpersist()
    scored.unpersist()
    mix_rows = mix.collect()
    return {
        "n_pool": n_pool,
        "n_kept": n_kept,
        "top_pred_label": mix_rows[0].pred_label if mix_rows else None,
        "top_pred_n": mix_rows[0].n if mix_rows else 0,
        "drift": drift_row.asDict(),
        "n_collocations": len(coll),
        "n_shortlist": n_shortlist,
        "n_budget": n_budget,
        "budget_chars": budget_chars,
    }


def main() -> None:
    from meta_frame_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="select-for-target")
    spark.sparkContext.setLogLevel("ERROR")
    select_for_target(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
