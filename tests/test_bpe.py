"""Trainable BPE tokenizer (operators/bpe.py)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.bpe import _encode_word, bpe_encode, bpe_train


@pytest.fixture(scope="module")
def tiny(spark):
    # the Sennrich toy distribution: 'low' dominates, then 'lower',
    # 'newest', 'widest'
    rows = []
    i = 0
    for word, n in (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)):
        for _ in range(n):
            rows.append((i, word))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bpe_train_learns_frequent_subwords(spark, tiny):
    merges = bpe_train(tiny, num_merges=10)
    assert len(merges) <= 10
    # 'est</w>' must assemble from the newest+widest mass (9 occurrences)
    joined = {"".join(p) for p in merges}
    assert any("est" in s for s in joined)
    # determinism
    assert merges == bpe_train(tiny, num_merges=10)


def test_bpe_encode_counts_and_greedy_priority(spark, tiny):
    merges = bpe_train(tiny, num_merges=50)
    out = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_encode(tiny, merges).collect()}
    assert len(out) == tiny.count()
    assert all(nw == 1 for nw, _ in out.values())
    # with enough merges every training word collapses to ONE token
    assert all(nt == 1 for _, nt in out.values())

    # unseen word: partial merges apply, never crosses word boundary
    toks = _encode_word("lowest", {tuple(p): i for i, p in enumerate(merges)})
    assert "".join(toks) == "lowest</w>"
    assert 1 <= len(toks) <= len("lowest") + 1


def test_bpe_encode_keeps_native_id_type(spark, tiny):
    """String doc ids pass through untouched — no silent
    cast-to-long NULLs that vanish in downstream joins."""
    merges = bpe_train(tiny, num_merges=5)
    named = tiny.selectExpr("concat('doc-', doc_id) AS doc_id", "text")
    out = bpe_encode(named, merges)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    ids = [r.doc_id for r in out.collect()]
    assert len(ids) == tiny.count() and all(
        i is not None and i.startswith("doc-") for i in ids
    )


def test_bpe_encode_emit_tokens_roundtrip(spark, tiny):
    merges = bpe_train(tiny, num_merges=3)
    out = bpe_encode(tiny, merges, emit_tokens=True).collect()
    for r in out:
        assert len(r.bpe_tokens) == r.n_bpe_tokens
        assert "".join(r.bpe_tokens).replace("</w>", "") == \
            tiny.filter(F.col("doc_id") == r.doc_id).first().text
    with pytest.raises(ValueError):
        bpe_train(tiny, num_merges=0)
