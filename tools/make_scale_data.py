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

Zipf mode (VERDICT r13 #4, SCALE_DOC_MODE=zipf): the suffix-ALL
scheme above is a zipf-free WORST CASE for n-gram models — every
replica's trigrams are brand-new types, so the KN type table grows
x10 with the data, which real text never does (Heaps' law: new data
mostly re-uses the frequent vocabulary and adds a thin rare tail).
Zipf mode suffixes only the tokens whose crc32 falls in a
SCALE_ZIPF_FRAC (default 0.05) hash band — a deterministic,
replica-independent 5% vocabulary slice — so a replica trigram is a
new TYPE only when one of its 3 tokens is sliced (1 - 0.95^3 ~ 14%),
giving ~x(0.86 + 10*0.14) ~ x2.3 trigram-type growth at 10x tokens:
the saturating-type-table regime LM smokes must be measured in.
Cross-replica doc Jaccard is ~0.9 in this mode, so it is ONLY valid
for LM/type-table smokes, never dedup ones — it therefore writes
documents.parquet alone, to its own DST (set SCALE_DST_DIR, e.g.
/tmp/mfs_sf1_zipf).
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
#: documents replication scheme: "disjoint" (suffix every token —
#: shingle-disjoint replicas, the dedup-safe default) or "zipf"
#: (suffix a thin hash band of the vocabulary — saturating n-gram
#: type table, LM smokes only; writes documents alone)
DOC_MODE = os.environ.get("SCALE_DOC_MODE", "disjoint")
ZIPF_FRAC = float(os.environ.get("SCALE_ZIPF_FRAC", "0.05"))
OFFSET = 100_000_000


def main() -> None:
    from meta_frame_spark.session import get_session

    if DOC_MODE not in ("disjoint", "zipf"):
        raise SystemExit(f"unknown SCALE_DOC_MODE {DOC_MODE!r}")
    spark = get_session(app_name="make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    band = int(ZIPF_FRAC * 1000)
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * OFFSET))
        if k:
            suffix = F.lit(f"_r{k}")
            if DOC_MODE == "zipf":
                # replica-independent vocabulary slice: the SAME 5% of
                # token types gets a per-replica suffix, the other 95%
                # is shared verbatim across replicas (Heaps-like tail
                # growth; see module docstring)
                tok_fn = lambda t: F.when(  # noqa: E731
                    F.crc32(F.encode(t, "utf-8")) % 1000 < F.lit(band),
                    F.concat(t, suffix),
                ).otherwise(t)
            else:
                tok_fn = lambda t: F.concat(t, suffix)  # noqa: E731
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(F.split("text", " "), tok_fn), " "
                ),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    if DOC_MODE == "zipf":
        n = spark.read.parquet(f"{DST}/documents.parquet").count()
        print(f"documents (zipf mode, frac={ZIPF_FRAC}): {n} rows")
        spark.stop()
        return

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
