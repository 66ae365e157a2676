#!/usr/bin/env python
"""Embedding similarity stack end-to-end with meta_frame_spark.

The ANN ladder a retrieval team climbs as the corpus grows, composed
from the library's operators — the same query runs at every rung, so
you trade recall for cost without rewriting callers:

    exact          brute_force_topk      (oracle tier: full scan x broadcast queries)
    cheap exact    rp_rescore_topk       (JL-project 64->32, shortlist 10%, exact re-rank)
    sub-linear     srp_lsh_topk          (sign-pattern buckets, candidates only)
    compressed     ivfpq_topk            (k-means cells + 8x PQ codes, ADC scoring)

plus the maintenance jobs around the index:

    embedding_near_dup_pairs   near-dup audit (banded cosine LSH)
    group_centroids            per-label centroids for cell seeding
    emb outliers / recall      quality gates before the index ships

Run:  python examples/similarity_index.py [sf_dir]
Default: /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from meta_frame_spark.operators.pq import ivfpq_topk
    from meta_frame_spark.operators.rp import rp_rescore_topk
    from meta_frame_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        srp_lsh_topk,
    )
    from meta_frame_spark.session import get_session

    spark = get_session(app_name="similarity-index-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)

    exact = brute_force_topk(emb, queries, k=5).cache()
    n_exact = exact.count()

    tiers = {
        "rp_rescore": rp_rescore_topk(emb, queries, k=5, out_dim=32,
                                      shortlist_frac=0.1),
        "srp_lsh": srp_lsh_topk(emb, queries, k=5, num_bands=24),
        "ivfpq": ivfpq_topk(emb, queries, k=5, n_probe=8),
    }
    print(f"{'tier':12s} {'recall@5':>9s} {'sec':>7s}")
    print(f"{'exact':12s} {'1.000':>9s} {'--':>7s}")
    for name, df in tiers.items():
        t0 = time.perf_counter()
        hits = df.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
        dt = time.perf_counter() - t0
        print(f"{name:12s} {hits / n_exact:9.3f} {dt:7.2f}")

    dups = embedding_near_dup_pairs(emb, threshold=0.4, num_bands=64).count()
    print(f"\nnear-dup audit: {dups} pairs at cosine>=0.4")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
