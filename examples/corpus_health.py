#!/usr/bin/env python
"""Corpus health report with meta_frame_spark.

The pre-ingest audit every public pipeline runs before spending
compute: how much of each source survives the standard rule tiers,
and why the rest dies. One pass over the documents table — every
signal below is a map-only codegen projection (plus one Arrow batch
stage for the repetition histograms), so the whole report costs one
scan and one per-source aggregate regardless of corpus size:

    raw documents
      -> fix_encoding              (mojibake repaired before measuring)
      -> C4 line rules + page gate (Raffel et al. 2020)
      -> Gopher quality rules      (Rae et al. 2021, App. A)
      -> Gopher repetition rules   (Rae et al. 2021, Table A1)
      -> weighted blocklist        (UT1/RefinedWeb tier)
      -> language id + margin      (stopword heuristic)
      -> per-source funnel         (docs surviving each tier, and the
                                    top rule responsible for each kill)

The same gates are registered curation steps (plans/curation.py:
fix_encoding, c4_gate, gopher_gate, repetition_gate, lang_gate), all
stream-safe — a config built from this report runs unchanged on a
Structured Streaming ingest via run_curation_stream.

Run:  python examples/corpus_health.py [sf_dir]
Default: /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_health(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Per-source survival funnel + per-rule kill counts."""
    from meta_frame_spark.functions.text import (
        fix_encoding,
        language_scores,
        with_blocklist_score,
        with_c4_clean,
        with_gopher_rules,
        with_repetition_rules,
    )

    docs = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .withColumn("text", fix_encoding("text"))
    )
    scored = with_blocklist_score(
        with_repetition_rules(with_gopher_rules(with_c4_clean(docs)))
    ).withColumn("lang_pred", language_scores(F.col("text"))["lang"])

    funnel = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("c4_pass").cast("int")).alias("pass_c4"),
        F.sum(F.col("gopher_pass").cast("int")).alias("pass_gopher"),
        F.sum(F.col("repetition_pass").cast("int")).alias("pass_repetition"),
        F.sum(F.col("blocklist_pass").cast("int")).alias("pass_blocklist"),
        F.sum(
            (
                F.col("c4_pass") & F.col("gopher_pass")
                & F.col("repetition_pass") & F.col("blocklist_pass")
            ).cast("int")
        ).alias("pass_all"),
        F.round(
            F.avg(F.col("n_words").cast("double")), 2
        ).alias("mean_words"),
    )

    # which single rule kills the most docs, per tier
    rule_cols = [c for c in scored.columns if c.startswith("r_")]
    kills = scored.select(
        [
            F.sum((~F.col(c)).cast("int")).alias(c)
            for c in rule_cols
        ]
    )

    langs = scored.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return {"funnel": funnel, "rule_kills": kills, "languages": langs}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from meta_frame_spark.session import get_session

    spark = get_session(app_name="corpus-health")
    spark.sparkContext.setLogLevel("ERROR")
    report = corpus_health(spark, sf_dir)
    report["funnel"].orderBy("source").show(50, truncate=False)
    report["rule_kills"].show(truncate=False, vertical=True)
    report["languages"].orderBy(F.desc("n_docs")).show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
