"""Cross-document duplicate span detection (operators/spans.py)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.spans import (
    docs_with_duplicate_spans,
    duplicate_spans,
)

BOILER = "all rights reserved by the example corporation of somewhere"  # 9 tokens


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (0, f"alpha beta {BOILER} gamma delta"),
        (1, f"{BOILER} epsilon zeta eta theta iota"),
        (2, "totally unrelated words with no shared window at all here"),
        (3, "short doc"),  # shorter than the span -> contributes nothing
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicate_spans_finds_planted_boilerplate(spark, span_docs):
    out = duplicate_spans(span_docs, span_tokens=9, min_docs=2, key="text").collect()
    spans = {r.span_key: (r.n_docs, r.n_occurrences) for r in out}
    assert spans[BOILER] == (2, 2)
    # no window of doc 2 or doc 3 is shared
    assert all(BOILER.split()[0] in k or k == BOILER for k in spans) or len(spans) >= 1
    for k in spans:
        assert "unrelated" not in k and "short" not in k


def test_duplicate_spans_hash_and_text_modes_agree(spark, span_docs):
    text_counts = sorted(
        (r.n_docs, r.n_occurrences)
        for r in duplicate_spans(span_docs, span_tokens=9, key="text").collect()
    )
    hash_counts = sorted(
        (r.n_docs, r.n_occurrences)
        for r in duplicate_spans(span_docs, span_tokens=9, key="hash").collect()
    )
    assert text_counts == hash_counts


def test_duplicate_spans_short_docs_and_validation(spark, span_docs):
    # span longer than every doc -> empty result, not garbage windows
    assert duplicate_spans(span_docs, span_tokens=50).count() == 0
    with pytest.raises(ValueError):
        duplicate_spans(span_docs, span_tokens=0)
    with pytest.raises(ValueError):
        duplicate_spans(span_docs, key="nope")


def test_docs_with_duplicate_spans_rollup(spark, span_docs):
    out = {r.doc_id: r.n_dup_spans
           for r in docs_with_duplicate_spans(span_docs, span_tokens=9).collect()}
    # only the two boilerplate docs appear, one shared window each
    assert set(out) == {0, 1}
    assert out[0] == out[1] == 1


def test_duplicate_span_regions_merges_overlapping_windows(spark, span_docs):
    from meta_frame_spark.operators.spans import duplicate_span_regions

    got = {(r.doc_id): (r.start_tok, r.end_tok)
           for r in duplicate_span_regions(span_docs, span_tokens=9).collect()}
    # doc 0: boiler occupies tokens 3..11; doc 1: tokens 1..9
    assert got == {0: (3, 11), 1: (1, 9)}

    # two separate duplicated regions in one doc stay two islands
    far = spark.createDataFrame(
        [
            (10, "A B C D x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 E F G H"),
            (11, "A B C D p q r s t u v w y z aa bb E F G H"),
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicate_span_regions(far, span_tokens=4).collect()
    )
    # "A B C D" at pos 1..4 and "E F G H" at the tail of each doc
    assert (10, 1, 4) in out and (11, 1, 4) in out
    assert (10, 17, 20) in out and (11, 17, 20) in out
    assert len(out) == 4


def test_remove_duplicate_regions_cuts_only_the_boilerplate(spark, span_docs):
    from meta_frame_spark.operators.spans import (
        duplicate_span_regions,
        remove_duplicate_regions,
    )

    regions = duplicate_span_regions(span_docs, span_tokens=9)
    out = {r.doc_id: r.text
           for r in remove_duplicate_regions(span_docs, regions).collect()}
    assert out[0] == "alpha beta gamma delta"
    assert out[1] == "epsilon zeta eta theta iota"
    # untouched docs pass through byte-identical
    assert out[2] == "totally unrelated words with no shared window at all here"
    assert out[3] == "short doc"
