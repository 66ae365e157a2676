"""Sequence packing (operators/packing.py)."""

import math

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.packing import pack_sequences, pack_stats


BUDGET = 100


@pytest.fixture(scope="module")
def toy(spark):
    rows = [(f"d{i}", t) for i, t in enumerate(
        [90, 80, 70, 60, 50, 40, 30, 20, 10, 10, 5, 5, 150, None]
    )]
    return spark.createDataFrame(rows, "doc_id string, n_tokens long")


def test_pack_respects_budget_and_covers_all(spark, toy):
    out = pack_sequences(toy, "n_tokens", BUDGET, id_col="doc_id", num_shards=2)
    rows = out.collect()
    assert len(rows) == toy.count()  # every doc assigned exactly once
    sums = (
        out.filter(F.col("n_tokens") <= BUDGET)
        .groupBy("pack_id").agg(F.sum("n_tokens").alias("s")).collect()
    )
    assert all(r.s <= BUDGET for r in sums)
    # oversize + null docs are singletons
    singles = {r.pack_id: r for r in rows if r.n_tokens is None or r.n_tokens > BUDGET}
    pack_sizes = out.groupBy("pack_id").count().collect()
    by_id = {r.pack_id: r["count"] for r in pack_sizes}
    assert all(by_id[p] == 1 for p in singles)


def test_pack_deterministic_across_partitioning(spark, toy):
    a = {r.doc_id: r.pack_id for r in
         pack_sequences(toy, "n_tokens", BUDGET, id_col="doc_id").collect()}
    b = {r.doc_id: r.pack_id for r in
         pack_sequences(toy.repartition(7), "n_tokens", BUDGET, id_col="doc_id").collect()}
    assert a == b


def test_pack_efficiency_near_optimal(spark):
    # 200 docs, sizes cycling 10..90: BFD in one shard should land
    # within 11/9 + 1 of the token-volume lower bound
    rows = [(f"d{i:03d}", 10 + (i * 7) % 81) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = pack_sequences(df, "n_tokens", BUDGET, id_col="doc_id", num_shards=1)
    n_packs = out.select("pack_id").distinct().count()
    total = sum(t for _, t in rows)
    lower = math.ceil(total / BUDGET)
    assert n_packs <= math.ceil(11 / 9 * lower) + 1


def test_pack_stats_shape(spark, toy):
    out = pack_sequences(toy, "n_tokens", BUDGET, id_col="doc_id")
    s = pack_stats(out, "n_tokens").collect()[0]
    assert s.n_packs >= 1 and s.total_tokens is not None


def test_pack_rejects_bad_args(spark, toy):
    with pytest.raises(ValueError):
        pack_sequences(toy, "n_tokens", 0, id_col="doc_id")
    with pytest.raises(ValueError):
        pack_sequences(toy, "n_tokens", BUDGET, id_col="doc_id", num_shards=0)
