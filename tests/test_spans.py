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
