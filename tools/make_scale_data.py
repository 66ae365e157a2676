#!/usr/bin/env python
"""Generate scaled-up (sf1-equivalent) documents/embeddings/events
parquet under /tmp by replicating the driver's sf0.1 testdata 10x —
for the scale smoke in tools/scale_smoke.py (VERDICT r3 #5). Nothing
is written under the read-only /root/testdata.

Replication preserves WITHIN-replica duplicate structure (the planted
near-dups the operators must find) while guaranteeing NO cross-replica
duplicates — otherwise every doc would gain 9 artificial near-dups and
pair counts would explode quadratically instead of scaling linearly:

* documents: every token suffixed ``_r{k}`` (k>0), so cross-replica
  shingle sets are disjoint (Jaccard 0) but within-replica Jaccard is
  unchanged;
* embeddings: a per-replica deterministic signed permutation of the
  dims (permute + random ±1 per dim — an orthogonal transform, so
  norms and within-replica cosines are exactly preserved). Plain
  permutation is NOT enough: these vectors share a nonzero per-dim
  mean component that survives any permutation, and the first smoke
  run showed x104 cross-replica pair leakage at threshold 0.4; the
  sign flips zero the mean term and collapse cross-replica cosines to
  noise;
* events: user/event ids offset per replica, timestamps kept, so
  per-user session/funnel structure repeats 10x across 10x users;
* lineitem: orderkeys offset per replica (baskets repeat intact across
  10x orders) while partkeys are SHARED across replicas — so per-part
  line counts grow x10, basket co-occurrence pair counts grow ~x10,
  and the partkey self-join size grows ~x100 (sum of n^2), the
  shapes the continuation smoke asserts.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SCALE_SRC_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DST_DIR", "/tmp/mfs_sf1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
OFFSET = 100_000_000


def main() -> None:
    from meta_frame_spark.session import get_session

    spark = get_session(app_name="make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * OFFSET))
        if k:
            suffix = F.lit(f"_r{k}")
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(F.split("text", " "), lambda t: F.concat(t, suffix)),
                    " ",
                ),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(12345)
    parts = []
    for k in range(REPLICAS):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * OFFSET))
        if k:
            perm = rng.permutation(dim).tolist()
            signs = rng.choice([-1.0, 1.0], size=dim).tolist()
            e = e.withColumn(
                "embedding",
                F.array(*[
                    F.col("embedding")[int(p)] * F.lit(float(s))
                    for p, s in zip(perm, signs)
                ]),
            )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * OFFSET)).withColumn(
            "user_id", F.col("user_id") + F.lit(k * OFFSET)
        )
        for k in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * OFFSET))
        for k in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    for t in ("documents", "embeddings", "events", "lineitem"):
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
