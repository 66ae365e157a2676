"""Unigram-LM tokenizer (operators/unigram.py, Kudo 2018): toy-corpus
EM semantics, determinism, Viterbi encode, validation; the driver-row
invariant (exact n_words + per-doc piece bounds) runs via
unigram_tokenize in the correctness gate."""

import math

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.unigram import (
    _em_step,
    _viterbi,
    unigram_encode,
    unigram_train,
)


@pytest.fixture(scope="module")
def toy(spark):
    # "sharing" substrings: 'ing' is overwhelmingly frequent
    rows = [(i, "singing ringing winging bringing kinging")
            for i in range(10)] + [(10, "zap")]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTrain:
    def test_frequent_substring_becomes_piece(self, toy):
        pieces = unigram_train(toy, vocab_size=40, max_piece_len=4,
                               top_words=100)
        vocab = dict(pieces)
        assert "ing" in vocab or "ging" in vocab
        # every single character of the corpus survives pruning
        chars = set("singing ringing winging bringing kinging zap") - {" "}
        assert chars <= set(p for p in vocab if len(p) == 1) | set(vocab)
        # log-probabilities normalize (sum of exp ~= 1)
        assert sum(math.exp(lp) for _, lp in pieces) == pytest.approx(1.0)
        assert len(pieces) <= 40 + len(chars)  # singles never pruned

    def test_deterministic(self, toy):
        a = unigram_train(toy, vocab_size=30, max_piece_len=4)
        b = unigram_train(toy.repartition(7), vocab_size=30,
                          max_piece_len=4)
        assert a == b

    def test_em_increases_likelihood(self, toy):
        """One EM sweep never decreases the corpus log-likelihood —
        the defining EM property, on the real expected-count maths."""
        words = [("singing", 10), ("ringing", 10), ("zap", 1)]
        probs = {c: 1.0 for w, _ in words for c in w}
        probs["ing"] = 1.0
        total = sum(probs.values())
        probs = {p: v / total for p, v in probs.items()}

        def loglik(pr):
            ll = 0.0
            for w, c in words:
                n = len(w)
                alpha = [0.0] * (n + 1)
                alpha[0] = 1.0
                for i in range(1, n + 1):
                    alpha[i] = sum(
                        alpha[j] * pr.get(w[j:i], 0.0)
                        for j in range(max(0, i - 4), i)
                    )
                ll += c * math.log(alpha[n])
            return ll

        before = loglik(probs)
        stepped = _em_step(words, probs, 4)
        assert loglik(stepped) >= before - 1e-9

    def test_validation(self, toy):
        with pytest.raises(ValueError, match="vocab_size"):
            unigram_train(toy, vocab_size=0)
        with pytest.raises(ValueError, match="max_piece_len"):
            unigram_train(toy, max_piece_len=0)
        with pytest.raises(ValueError, match="em_iters"):
            unigram_train(toy, em_iters=0)
        with pytest.raises(ValueError, match="prune_frac"):
            unigram_train(toy, prune_frac=0.0)


class TestEncode:
    def test_viterbi_picks_high_prob_piece(self):
        logp = {"a": math.log(0.2), "b": math.log(0.2),
                "ab": math.log(0.5), "c": math.log(0.1)}
        assert _viterbi("abab", logp, 2) == ["ab", "ab"]
        assert _viterbi("abc", logp, 2) == ["ab", "c"]
        # unknown character: whole word falls back to characters
        assert _viterbi("axb", logp, 2) == ["a", "x", "b"]

    def test_encode_counts_and_tokens(self, spark, toy):
        pieces = unigram_train(toy, vocab_size=40, max_piece_len=4,
                               top_words=100)
        out = unigram_encode(toy, pieces, emit_tokens=True)
        rows = {r.doc_id: r for r in out.collect()}
        r0 = rows[0]
        assert r0.n_words == 5
        assert r0.n_pieces == len(r0.pieces)
        # pieces reassemble the exact non-space character stream
        assert "".join(r0.pieces) == "singingringingwingingbringingkinging"
        assert rows[10].n_words == 1
        # bounds invariant the driver row asserts corpus-wide
        joined = out.join(
            toy.select(
                "doc_id",
                F.length(
                    F.regexp_replace(F.lower("text"), r"\s+", "")
                ).alias("chars"),
            ),
            "doc_id",
        )
        bad = joined.filter(
            (F.col("n_pieces") < F.col("n_words"))
            | (F.col("n_pieces") > F.col("chars"))
        )
        assert bad.count() == 0

    def test_partition_invariant(self, spark, toy):
        pieces = unigram_train(toy, vocab_size=40, max_piece_len=4)
        a = sorted(tuple(r) for r in unigram_encode(toy, pieces).collect())
        b = sorted(
            tuple(r)
            for r in unigram_encode(toy.repartition(5), pieces).collect()
        )
        assert a == b

    def test_keeps_native_id_type(self, spark, toy):
        """String ids pass through untouched (no silent long-cast
        NULLs); same for the sampled encoder, whose md5 coin keys on
        the formatted id."""
        from meta_frame_spark.operators.unigram import (
            unigram_sample_encode,
        )

        pieces = unigram_train(toy, vocab_size=40, max_piece_len=4)
        named = toy.selectExpr("concat('d', doc_id) AS doc_id", "text")
        for fn in (unigram_encode,
                   lambda df, p: unigram_sample_encode(df, p, alpha=50.0)):
            out = fn(named, pieces)
            assert out.schema["doc_id"].dataType.simpleString() == "string"
            ids = [r.doc_id for r in out.collect()]
            assert len(ids) == toy.count() and all(
                i is not None and i.startswith("d") for i in ids
            )


class TestSampleEncode:
    def test_high_alpha_matches_viterbi(self, spark, toy):
        from meta_frame_spark.operators.unigram import (
            unigram_sample_encode,
        )

        pieces = unigram_train(toy, vocab_size=40, max_piece_len=4)
        vit = sorted(
            tuple(r)
            for r in unigram_encode(toy, pieces, emit_tokens=True).collect()
        )
        samp = sorted(
            tuple(r)
            for r in unigram_sample_encode(
                toy, pieces, alpha=50.0, emit_tokens=True
            ).collect()
        )
        assert samp == vit  # tempered lattice concentrates on Viterbi

    def test_low_alpha_varies_and_reassembles(self, spark):
        """alpha=0 samples ~uniformly over segmentations: across many
        docs of the same word the coin (keyed on doc_id) must produce
        BOTH splits of 'ab', and every sample reassembles the word."""
        from meta_frame_spark.operators.unigram import (
            unigram_sample_encode,
        )

        df = spark.createDataFrame(
            [(i, "ab") for i in range(60)], "doc_id long, text string"
        )
        pieces = [("a", -1.0), ("b", -1.0), ("ab", -1.0)]
        out = unigram_sample_encode(
            df, pieces, alpha=0.0, emit_tokens=True
        ).collect()
        seen = set()
        for r in out:
            assert "".join(r.pieces) == "ab"
            seen.add(tuple(r.pieces))
        assert seen == {("ab",), ("a", "b")}

    def test_deterministic_and_seed_switches(self, spark, toy):
        from meta_frame_spark.operators.unigram import (
            unigram_sample_encode,
        )

        pieces = unigram_train(toy, vocab_size=40, max_piece_len=4)
        a = sorted(
            tuple(r)
            for r in unigram_sample_encode(
                toy, pieces, alpha=0.1, emit_tokens=True
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in unigram_sample_encode(
                toy.repartition(5), pieces, alpha=0.1, emit_tokens=True
            ).collect()
        )
        assert a == b  # partition-invariant portable coins
        c = sorted(
            tuple(r)
            for r in unigram_sample_encode(
                toy, pieces, alpha=0.1, emit_tokens=True, seed="s1"
            ).collect()
        )
        assert c != a  # a new seed is a new epoch

    def test_validation(self, spark, toy):
        from meta_frame_spark.operators.unigram import (
            unigram_sample_encode,
        )

        with pytest.raises(ValueError, match="alpha"):
            unigram_sample_encode(toy, [("a", -1.0)], alpha=-0.1)
