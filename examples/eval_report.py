#!/usr/bin/env python
"""Model-eval + release scorecard with meta_frame_spark.

`corpus_health.py` audits the raw corpus; this example is the OTHER
report a data/model team ships every cycle: score a generation system
against references, check the quality classifier's probabilities, and
audit the release for concentration and privacy — one runnable
composition of the round-14 measurement family:

    generation quality
      candidate vs reference pairs  (here: the extractive compression
                                     staging; in production the model's
                                     outputs against held-out refs)
      -> ROUGE-1/2                  (operators/ranking_eval.rouge_n_scores:
                                     clipped multiset overlap, map-only)
      -> sentence BLEU-4            (bleu_scores: modified precisions,
                                     brevity penalty, unsmoothed)
      -> chrF (orders 1-6)          (chrf_scores: char grams via the
                                     explode-count-join scale shape)
      -> corpus diversity           (self_bleu_probe: pairwise BLEU over
                                     a fixed md5-ordered sample via an
                                     inverted-index join)
    classifier trust
      -> ROC-AUC + PR curve + AP    (stats.roc_auc / precision_recall_curve
                                     / average_precision on one staging)
      -> ECE / MCE / Brier          (stats.calibration_summary — is the
                                     score usable as a probability?)
    release audit
      -> concentration              (profile.corpus_concentration: Gini /
                                     entropy / top-source share)
      -> metadata redundancy        (stats.categorical_association:
                                     MI / NMI / Cramér's V of lang x source)
      -> k-anonymity + l-diversity
         + t-closeness              (privacy.*: the three release gates)

Every number is a deterministic count ratio — the same arithmetic the
driver's DuckDB oracles replay per query; this example just shows the
family composed as one report.

Run:  python examples/eval_report.py [sf_dir]
Default: /root/testdata/sf0.001
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_eval_report(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Build the scorecard; returns the headline numbers as a dict
    (the test asserts the invariants the staging guarantees)."""
    from meta_frame_spark.operators.privacy import (
        k_anonymity_report,
        l_diversity_report,
        t_closeness_report,
    )
    from meta_frame_spark.operators.profile import corpus_concentration
    from meta_frame_spark.operators.ranking_eval import (
        bleu_scores,
        chrf_scores,
        rouge_n_scores,
        self_bleu_probe,
    )
    from meta_frame_spark.operators.stats import (
        average_precision,
        calibration_summary,
        categorical_association,
        roc_auc,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    out: dict[str, float] = {"n_docs": float(docs.count())}

    # --- generation quality: drop-every-7th-token "system output" ---
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    cand = F.array_join(F.filter(toks, lambda x, i: (i + 1) % 7 != 0), " ")
    pairs = docs.select(
        "doc_id", cand.alias("cand"), F.col("text").alias("ref")
    )
    rouge = rouge_n_scores(pairs, "cand", "ref", ns=(1, 2))
    bleu = bleu_scores(pairs, "cand", "ref", max_n=4)
    chrf = chrf_scores(pairs, "doc_id", "cand", "ref", max_n=6)
    gen = (
        rouge.select("doc_id", "rouge1_f")
        .join(bleu.select("doc_id", "bleu"), "doc_id")
        .join(chrf.select("doc_id", "chrf"), "doc_id")
        .agg(
            F.avg("rouge1_f").alias("r1"),
            F.avg("bleu").alias("b"),
            F.avg("chrf").alias("c"),
        )
        .first()
    )
    out["avg_rouge1_f"] = float(gen.r1)
    out["avg_bleu"] = float(gen.b)
    out["avg_chrf"] = float(gen.c)
    sb = self_bleu_probe(docs, "doc_id", "text", sample_size=20, max_n=2)
    out["mean_self_bleu"] = float(
        sb.agg(F.avg("self_bleu")).first()[0]
    )

    # --- classifier trust: the md5-coin staged classifier ---
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.lit("lbl"))), 1, 8
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    staged = docs.select(
        (F.col("n_chars") / 600.0).alias("score"),
        F.floor(F.col("n_chars") / 50).cast("long").alias("rank_score"),
        (u < F.col("n_chars") / 600.0).alias("label"),
    )
    out["auc"] = float(
        roc_auc(staged, "rank_score", "label").first().auc
    )
    out["average_precision"] = float(
        average_precision(staged, "rank_score", "label")
        .first()
        .average_precision
    )
    cal = calibration_summary(staged, "score", "label", n_bins=10).first()
    out["ece"] = float(cal.ece)
    out["brier"] = float(cal.brier)

    # --- release audit ---
    conc = corpus_concentration(docs, "source").first()
    out["source_gini"] = float(conc.gini)
    out["top_source_share"] = float(conc.top_share)
    assoc = categorical_association(docs, "lang", "source").first()
    out["lang_source_nmi"] = float(assoc.nmi)
    kan = k_anonymity_report(docs, ["source", "lang"], k=5).first()
    out["kanon_suppressed_frac"] = float(kan.suppressed_frac)
    ldiv = l_diversity_report(
        docs.select(
            "source", "lang",
            (F.col("n_chars") % 7).alias("sens"),
        ),
        ["source", "lang"],
        "sens",
        l=3,
    )
    out["ldiv_groups_ok_frac"] = float(
        ldiv.agg(
            F.avg(F.col("distinct_ok").cast("double"))
        ).first()[0]
    )
    tclo = t_closeness_report(
        docs.select(
            "source", "lang", (F.col("n_chars") % 7).alias("sens")
        ),
        ["source", "lang"],
        "sens",
        t=0.5,
    )
    out["tclose_groups_ok_frac"] = float(
        tclo.agg(F.avg(F.col("close_ok").cast("double"))).first()[0]
    )
    return out


def main() -> int:
    from meta_frame_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="eval-report")
    spark.sparkContext.setLogLevel("ERROR")
    report = run_eval_report(spark, sf_dir)
    width = max(len(k) for k in report)
    for k, v in report.items():
        print(f"{k:<{width}}  {v:.6f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
