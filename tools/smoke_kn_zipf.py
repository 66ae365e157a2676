#!/usr/bin/env python
"""Kneser-Ney trigram 10x smoke under a SATURATING type table
(VERDICT r13 #4): the standard scale replica suffixes every token, so
distinct trigram TYPES grow ~x10 with the data — a zipf-free worst
case real text never exhibits (Heaps' law). This receipt re-times
kneser_ney3_logprob on the SCALE_DOC_MODE=zipf replica (thin-band
vocabulary suffixing, ~x2.3 expected type growth) and reports, for
both corpora:

  distinct trigram types, fit+score wall time, and the 10x ratios

so the r13 watch item ("x5.3 at 10x is the generator, not the
operator") is either proven or refuted with numbers.

Usage:
  SCALE_DOC_MODE=zipf SCALE_DST_DIR=/tmp/mfs_sf1_zipf \
      python tools/make_scale_data.py
  python tools/smoke_kn_zipf.py [zipf_dir] (default /tmp/mfs_sf1_zipf)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    zipf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mfs_sf1_zipf"
    base_dir = "/root/testdata/sf0.1"

    from meta_frame_spark.operators.cache import release_tracked_caches
    from meta_frame_spark.operators.scoring import kneser_ney3_logprob
    from meta_frame_spark.session import get_session

    spark = get_session(app_name="kn-zipf-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    target = spark.sparkContext.defaultParallelism

    def load(d):
        df = spark.read.parquet(f"{d}/documents.parquet")
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target, F.col("doc_id"))
        return df

    def trigram_types(df) -> int:
        toks = F.split(F.lower("text"), r"\s+")
        idx = F.sequence(F.lit(1), F.greatest(
            F.size(toks) - F.lit(2), F.lit(0)))
        tg = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, 3), " "))
        return (
            df.filter(F.col("text").isNotNull())
            .select(F.explode(tg).alias("g"))
            .agg(F.count_distinct("g").alias("n")).first()["n"]
        )

    report: dict[str, object] = {}
    for tag, d in (("sf0.1", base_dir), ("zipf10x", zipf_dir)):
        df = load(d)
        n_types = trigram_types(df)
        t0 = time.time()
        out = kneser_ney3_logprob(df)
        n = out.count()
        finite = out.filter(
            F.col("avg_neg_logprob").isNotNull()
            & ~F.isnan("avg_neg_logprob")).count()
        wall = round(time.time() - t0, 2)
        release_tracked_caches()
        report[tag] = {
            "rows": n, "finite": finite,
            "trigram_types": n_types, "wall_sec": wall,
        }
        print(f"{tag:8s} rows={n} finite={finite} "
              f"trigram_types={n_types} wall={wall}s")

    b, z = report["sf0.1"], report["zipf10x"]
    report["type_ratio"] = round(z["trigram_types"] / b["trigram_types"], 2)
    report["wall_ratio"] = round(z["wall_sec"] / max(b["wall_sec"], 1e-9), 2)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
