"""Bloom-filter membership probes."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.bloom import bloom_build, bloom_probe


@pytest.fixture(scope="module")
def member_df(spark):
    return spark.createDataFrame([(f"m{i}",) for i in range(200)], "val string")


@pytest.fixture(scope="module")
def bloom(member_df):
    return bloom_build(member_df, "val", n_bits=1 << 16, k=5)


def test_no_false_negatives(spark, member_df, bloom):
    out = bloom_probe(member_df, "val", bloom, n_bits=1 << 16, k=5)
    assert out.filter(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_bounded(spark, bloom):
    others = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "val string")
    fp = (
        bloom_probe(others, "val", bloom, n_bits=1 << 16, k=5)
        .filter("maybe_member")
        .count()
    )
    # 200 members in 65536 bits, k=5: theoretical fp ~ 2e-9; allow slack
    assert fp / 2000 <= 0.01, fp


def test_filter_size_is_constant(member_df):
    assert len(bloom_build(member_df, "val", n_bits=1 << 16, k=5)) == (1 << 16) // 8


def test_param_validation(spark, member_df, bloom):
    with pytest.raises(ValueError):
        bloom_build(member_df, "val", n_bits=100)
    with pytest.raises(ValueError):
        bloom_build(member_df, "val", k=0)
    with pytest.raises(ValueError):
        bloom_probe(member_df, "val", bloom, n_bits=1 << 20)


def test_novelty_score(spark):
    """Docs sharing every gram with the reference score 0, fully
    novel docs score 1, mixed docs score the exact distinct-gram
    fraction; zero-hit docs are INCLUDED (unlike ngram_overlap)."""
    from meta_frame_spark.operators.decontaminate import novelty_score

    ref = spark.createDataFrame(
        [(100, "the cat sat on the mat",)], ["rid", "text"]
    ).select("text")
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # all grams in ref
            (2, "quantum flux capacitor hums"),  # none
            (3, "the cat sat somewhere else"),   # mixed
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in novelty_score(
        corpus, ref, n=2
    ).collect()}
    assert out[1].novelty == 0.0
    assert out[2].novelty == 1.0
    # doc 3 bigrams: {the cat, cat sat, sat somewhere, somewhere else}
    # hits: {the cat, cat sat} -> novelty 2/4
    assert abs(out[3].novelty - 0.5) < 1e-12
    assert out[3].n_distinct_ngrams == 4
    assert set(out) == {1, 2, 3}
