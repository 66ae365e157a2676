#!/usr/bin/env python
"""The web-crawl first mile, end to end, with meta_frame_spark.

`curate_corpus.py` starts from clean text; a REAL 100 TB pretraining
run starts from crawl archives. This example composes the round-13
sources into the complete front of that pipeline:

    crawl frontier URLs
      -> robots.txt politeness gate         (robots_gate curation op /
                                             functions/web.apply_robots:
                                             RFC 9309 wildcard groups,
                                             host-sized rules broadcast —
                                             the filter a fetcher applies
                                             BEFORE requesting anything)
      -> page HTML (staged here; a crawl's response records in production)
      -> WET conversion shards              (sources/warc.write_wet_shards:
                                             ISO 28500 records, one gzip
                                             member each, task-commit safe)
      -> distributed WET ingest             (sources/warc.read_wet: one
                                             Arrow map over binaryFile)
      -> HTML boilerplate extraction        (html_extract curation step —
                                             jusText-class line classifier,
                                             pure codegen)
      -> repetition + perplexity-tail gates (repetition_gate + CCNet
                                             lm_gate; this corpus has no
                                             sentence punctuation, so the
                                             punctuation-keyed c4_gate
                                             would veto every page — on
                                             real web text swap it in
                                             after html_extract)
      -> Gopher rule gates + exact dedup    (gopher_gate word-count/
                                             word-length/alpha rules,
                                             then min-URL-canonical
                                             dedup on extracted text —
                                             mirrors/syndication copies
                                             collapse here)
      -> byte-level BPE token accounting    (byte_bpe_train/encode:
                                             lossless, nothing OOV)
      -> JSONL export                       (the interchange format
                                             training loaders stream)

Every stage after the sink is a lazy DataFrame transform; the WET
shard directory and the JSONL export are the only materializations,
exactly where a real pipeline holds its crawl snapshot and its
curated output. The driver-verified `crawl_ingest` query replays the
stage -> extract -> gate -> dedup core of this chain against a full
DuckDB oracle.

Run:  python examples/web_pipeline.py [sf_dir] [stage_dir]
Defaults: /root/testdata/sf0.001 -> /tmp/web_pipeline_wet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_web_pipeline(
    spark: SparkSession, sf_dir: str, stage_dir: str
) -> dict[str, int]:
    """Run the first mile; returns per-stage surviving-row counts."""
    from meta_frame_spark.operators.bpe import byte_bpe_encode, byte_bpe_train
    from meta_frame_spark.plans.curation import run_curation
    from meta_frame_spark.sources.warc import read_wet, write_wet_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts: dict[str, int] = {"input_docs": docs.count()}

    # 0. Politeness first: the frontier is every page URL; the host's
    #    robots.txt (staged here — fetched once per host in
    #    production) disallows the /forbidden/ tree, and the fetcher
    #    must never request what it blocks. Host-sized rules
    #    broadcast; the frontier never shuffles.
    frontier = docs.select(
        "doc_id", "source", "text",
        F.concat(
            F.lit("http://example.com/"),
            F.when(F.col("doc_id") % 17 == 0, F.lit("forbidden/"))
            .otherwise(F.lit("")),
            F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    robots = spark.createDataFrame(
        [("example.com",
          "User-agent: archiver\nDisallow: /private/\n\n"
          "User-agent: *\nDisallow: /forbidden/\n")],
        "host string, robots_txt string",
    )
    fetchable = run_curation(
        frontier, {"steps": [{"op": "robots_gate", "robots": robots}]}
    )
    counts["robots_allowed"] = fetchable.count()

    # 1. Stage page HTML (in production this is the crawler's output;
    #    here each document's text becomes the article body of a page
    #    with a nav bar, a short teaser block, and a link-only footer).
    pages = fetchable.select(
        "url",
        F.concat(
            F.lit('<div><a href="/">Home</a> <a href="/t">Topics</a> '
                  '<a href="/c">Contact</a></div><p>'),
            F.coalesce("text", F.lit("")),
            F.lit('</p><p>Read more</p><div><a href="#">&copy; footer '
                  "legal notice</a></div>"),
        ).alias("html"),
    )

    # 2. Write the crawl snapshot as WET shards and ingest it back —
    #    the archive IS the interchange point between crawling and
    #    curation, so the pipeline proves both directions.
    write_wet_shards(
        pages.repartition(4, "url"), stage_dir, "url", "html",
        records_per_shard=500,
    )
    records = read_wet(spark, stage_dir).filter(
        F.col("record_type") == "conversion"
    )
    counts["wet_records"] = records.count()

    # 3-4. Boilerplate removal + quality gates + exact dedup as ONE
    #      declared chain (the same core the crawl_ingest driver row
    #      replays against DuckDB, plus the learned lm_gate tail).
    curated = run_curation(
        records.select(
            F.col("target_uri"), F.col("text").alias("html")
        ),
        {"steps": [
            {"op": "html_extract", "out_col": "text"},
            {"op": "repetition_gate"},
            {"op": "gopher_gate", "rules": [
                "r_word_count", "r_mean_word_len", "r_alpha_words"]},
            {"op": "lm_gate", "id_col": "target_uri", "top_v": 100,
             "max_quantile": 0.9},
            {"op": "dedup_exact", "key_cols": ["text"],
             "id_col": "target_uri"},
        ]},
    )
    counts["after_extract_and_gates"] = curated.count()

    # 5. Lossless byte-level token accounting over the survivors.
    merges = byte_bpe_train(curated, num_merges=100, top_pieces=5000)
    tokens = byte_bpe_encode(
        curated.withColumn("doc_id", F.col("target_uri")),
        merges, verify_round_trip=True,
    )
    bad = tokens.filter(~F.col("round_trip_ok")).count()
    if bad:
        raise RuntimeError(f"byte-BPE round trip failed on {bad} rows")
    counts["tokenized_docs"] = tokens.count()
    agg = tokens.agg(
        F.sum("n_tokens").alias("tok"), F.sum("n_bytes").alias("byt")
    ).first()
    counts["total_tokens"] = int(agg.tok or 0)
    counts["total_bytes"] = int(agg.byt or 0)

    # 6. Export the curated corpus as JSONL — the interchange format
    #    training loaders stream. One file per partition, read back
    #    for conservation proof (nothing dropped or duplicated by the
    #    export).
    out_dir = stage_dir.rstrip("/") + "_jsonl"
    curated.select(
        F.col("target_uri").alias("url"), "text"
    ).write.mode("overwrite").json(out_dir)
    counts["exported_jsonl"] = spark.read.json(out_dir).count()
    return counts


def main() -> int:
    from meta_frame_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    stage = sys.argv[2] if len(sys.argv) > 2 else "/tmp/web_pipeline_wet"
    spark = get_session(app_name="web-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    counts = run_web_pipeline(spark, sf_dir, stage)
    for k, v in counts.items():
        print(f"{k:24s} {v}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
