#!/usr/bin/env python
"""End-to-end LLM training-corpus curation with meta_frame_spark.

The complete flow a data team runs before pretraining, composed from
the library's operators — every stage is a lazy DataFrame transform,
so Catalyst sees one plan per output and the whole pipeline scales to
a real cluster unchanged:

    raw documents
      -> text stats + quality gate         (functions.text, pure codegen)
      -> language filter                   (lang id heuristic)
      -> exact dedup                       (hash groupBy)
      -> MinHash-LSH near-dedup            (banded candidates + verify)
      -> benchmark decontamination         (hashed-gram broadcast probe)
      -> perplexity-tail drop              (CCNet lm_gate: self-fit
                                            unigram LM, quantile cutoff)
      -> span-region cut + re-gate         (boilerplate removed, doc kept;
                                            emptied docs dropped)
      -> deterministic train/val/test split(md5 hash coins)
      -> sequence packing                  (sharded best-fit-decreasing)
      -> JSONL shard export + PII redaction at the boundary

Run:  python examples/curate_corpus.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /tmp/curated_corpus
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    """Run the full pipeline; returns per-stage surviving-row counts."""
    from meta_frame_spark.functions.text import (
        language_id,
        quality_score,
        redact_pii,
        token_count,
    )
    from meta_frame_spark.operators.decontaminate import decontaminate
    from meta_frame_spark.operators.dedup import (
        drop_exact_duplicates,
        drop_near_duplicates,
        minhash_lsh_dedup,
    )
    from meta_frame_spark.operators.packing import pack_sequences
    from meta_frame_spark.operators.sampling import split_dataframes
    from meta_frame_spark.operators.spans import (
        duplicate_span_regions,
        remove_duplicate_regions,
    )
    from meta_frame_spark.sources.sinks import write_jsonl_shards

    counts: dict[str, int] = {}
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    counts["raw"] = docs.count()

    # 0. encoding repair FIRST (UTF-8-as-cp1252 mojibake would skew
    # every downstream gate's token/char measurements), then the
    # quality + language gates — all map-only codegen, pushed to the
    # scan as one fused stage
    from meta_frame_spark.functions.text import fix_encoding

    docs = docs.withColumn("text", fix_encoding("text"))

    # 1. quality + language gates — map-only codegen, pushed to the scan
    gated = (
        docs.withColumn("quality", quality_score("text"))
        .withColumn("lang", language_id("text"))
        .filter((F.col("quality") >= 0.3) & (F.col("lang") == "en"))
    )
    counts["quality_lang"] = gated.count()

    # 2. exact dedup, then MinHash-LSH near-dedup (keep cluster minima)
    exact = drop_exact_duplicates(gated, ["text"], "doc_id")
    counts["exact_dedup"] = exact.count()
    pairs = minhash_lsh_dedup(
        exact, threshold=0.8, num_hashes=64, num_bands=16, shingle_n=5
    )
    deduped = drop_near_duplicates(exact, pairs, "doc_id")
    counts["near_dedup"] = deduped.count()

    # 3. decontaminate against a benchmark set (here: a held-out slice
    # stands in for the real eval suites)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    clean = decontaminate(deduped, benchmark, n=13)
    counts["decontaminated"] = clean.count()

    # 3.5 CCNet-style perplexity-tail drop: fit a unigram LM on the
    # surviving corpus itself and cut the worst-scoring 5% — the
    # config-declared lm_gate registry step (gibberish and boilerplate
    # score far from the bulk; runs AFTER dedup like CCNet so dup
    # mass cannot skew the model)
    from meta_frame_spark.plans.curation import run_curation

    clean = run_curation(
        clean,
        {"steps": [{"op": "lm_gate", "top_v": 5000,
                    "max_quantile": 0.95}]},
    )
    counts["lm_tail"] = clean.count()

    # 4. boilerplate: ONE window census yields both the cut and the
    # metadata (regions per doc + duplicated-token mass), then a
    # re-gate drops docs the cut emptied out — a boilerplate-only doc
    # survives dedup (it differs from its hosts) but has no text left
    regions = duplicate_span_regions(clean, span_tokens=20)
    region_meta = regions.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_regions"),
        F.sum(F.col("end_tok") - F.col("start_tok") + 1).alias("dup_tokens"),
    )
    clean = remove_duplicate_regions(clean, regions)
    clean = clean.join(region_meta, "doc_id", "left").fillna(
        {"n_dup_regions": 0, "dup_tokens": 0}
    ).filter(F.length(F.trim(F.col("text"))) > 0)
    counts["after_span_cut"] = clean.count()

    # 5. deterministic splits (engine-portable md5 coins)
    splits = split_dataframes(
        clean, {"train": 0.98, "val": 0.01, "test": 0.01}, "doc_id", salt="v1"
    )

    # 6. pack the train split to a token budget and export JSONL shards
    # with PII redaction applied at the boundary
    train = splits["train"].withColumn("n_tokens", token_count("text"))
    packed = pack_sequences(train, "n_tokens", budget=2048, id_col="doc_id")
    train_out = (
        train.join(packed.select("doc_id", "pack_id"), "doc_id")
        .withColumn("text", redact_pii("text"))
        .select("doc_id", "pack_id", "n_tokens", "quality", "n_dup_regions", "text")
    )
    for name, df in (("train", train_out), ("val", splits["val"]), ("test", splits["test"])):
        write_jsonl_shards(
            df, f"{out_dir.rstrip('/')}/{name}", records_per_shard=50_000,
            compression=None,
        )
        counts[f"out_{name}"] = spark.read.json(f"{out_dir.rstrip('/')}/{name}").count()
    return counts


def main() -> None:
    from meta_frame_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_session(app_name="curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    counts = curate(spark, sf_dir, out_dir)
    width = max(len(k) for k in counts)
    for k, v in counts.items():
        print(f"{k:{width}s} {v}")
    spark.stop()


if __name__ == "__main__":
    main()
