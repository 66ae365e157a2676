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


class TestByteBpe:
    def test_round_trip_property_arbitrary_utf8(self):
        """decode(encode(x)) == x for ARBITRARY unicode text — the
        loss-proof property of the 256-byte alphabet (no OOV ever),
        checked against merges learned from unrelated text."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from meta_frame_spark.operators.bpe import (
            _learn_merges,
            _to_units,
            byte_bpe_decode,
            byte_bpe_encode_text,
        )

        vocab = {
            tuple(_to_units(w)): c
            for w, c in (("the", 9), (" ", 12), ("thé", 4), ("ab", 7))
        }
        ranks = {tuple(p): i
                 for i, p in enumerate(_learn_merges(vocab, 20))}

        @settings(max_examples=300, deadline=None)
        @given(st.text(max_size=80))
        def check(text):
            toks = byte_bpe_encode_text(text, ranks)
            assert byte_bpe_decode(toks) == text
            assert len(toks) <= len(text.encode("utf-8"))

        check()

    def test_alphabet_bijective(self):
        from meta_frame_spark.operators.bpe import _B2U, _U2B

        assert len(_B2U) == 256 and len(_U2B) == 256
        assert all(_U2B[_B2U[b]] == b for b in range(256))

    def test_spark_encode_round_trip_and_compression(self, spark):
        """DataFrame op: tricky inputs (emoji, NBSP, CRLF, mixed
        case, empty, NULL) all round-trip; learned merges compress
        the training corpus below its byte count."""
        from meta_frame_spark.operators.bpe import (
            byte_bpe_encode,
            byte_bpe_train,
        )

        corpus = spark.createDataFrame(
            [(i, "The thé THE the\r\n café 🚀 " * 3)
             for i in range(6)] + [(6, ""), (7, None)],
            "doc_id long, text string",
        )
        merges = byte_bpe_train(corpus, num_merges=40, top_pieces=100)
        assert merges and merges == byte_bpe_train(
            corpus, num_merges=40, top_pieces=100
        )
        out = byte_bpe_encode(
            corpus, merges, emit_tokens=True, verify_round_trip=True
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert all(r.round_trip_ok for r in out)
        assert by_id[6].n_tokens == 0 and by_id[6].n_bytes == 0
        assert by_id[7].n_tokens == 0  # NULL encodes as empty
        r0 = by_id[0]
        assert 0 < r0.n_tokens < r0.n_bytes  # merges actually fired
        assert len(r0.tokens) == r0.n_tokens


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


class TestTokenizerIO:
    def test_merge_list_round_trip_reproduces_tokenization(
        self, spark, tiny, tmp_path
    ):
        """save -> load gives back the exact merge list, and a fresh
        encode under the reloaded model is bit-identical — the
        fit-once / score-many contract. Same for the byte level."""
        from meta_frame_spark.operators.bpe import (
            byte_bpe_encode,
            byte_bpe_train,
        )
        from meta_frame_spark.operators.tokenizer_io import (
            load_merges,
            save_merges,
        )

        merges = bpe_train(tiny, num_merges=20)
        p = str(tmp_path / "merges")
        save_merges(spark, merges, p)
        assert load_merges(spark, p) == merges
        a = sorted(map(tuple, bpe_encode(tiny, merges).collect()))
        b = sorted(map(tuple,
                       bpe_encode(tiny, load_merges(spark, p)).collect()))
        assert a == b

        bmerges = byte_bpe_train(tiny, num_merges=20)
        pb = str(tmp_path / "bmerges")
        save_merges(spark, bmerges, pb)
        assert load_merges(spark, pb) == bmerges
        ba = sorted(map(tuple, byte_bpe_encode(tiny, bmerges).collect()))
        bb = sorted(map(tuple, byte_bpe_encode(
            tiny, load_merges(spark, pb)).collect()))
        assert ba == bb

    def test_pieces_round_trip(self, spark, tmp_path):
        import pytest

        from meta_frame_spark.operators.tokenizer_io import (
            load_pieces,
            save_merges,
            save_pieces,
        )
        from meta_frame_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        docs = spark.createDataFrame(
            [(i, "singing ringing winging " * 3) for i in range(8)],
            "doc_id long, text string",
        )
        pieces = unigram_train(docs, vocab_size=30, max_piece_len=4)
        p = str(tmp_path / "pieces")
        save_pieces(spark, pieces, p)
        # EXACT round trip, trainer order preserved (registry-hashable)
        assert load_pieces(spark, p) == list(pieces)
        a = sorted(map(tuple, unigram_encode(docs, pieces).collect()))
        b = sorted(map(tuple,
                       unigram_encode(docs,
                                      load_pieces(spark, p)).collect()))
        assert a == b
        with pytest.raises(ValueError, match="empty"):
            save_pieces(spark, [], str(tmp_path / "x"))
        with pytest.raises(ValueError, match="empty"):
            save_merges(spark, [], str(tmp_path / "y"))


class TestVocabIds:
    """Frozen id vocabulary + id-level encoding (operators/vocab.py)."""

    def _merges(self):
        from meta_frame_spark.operators.bpe import _learn_merges, _to_units

        counts = {
            tuple(_to_units(w)): c
            for w, c in (("the", 9), (" ", 12), ("low", 5), ("lowest", 3))
        }
        return _learn_merges(counts, 15)

    def test_layout_contract(self):
        from meta_frame_spark.operators.vocab_ids import (
            DEFAULT_SPECIALS,
            byte_bpe_vocab,
        )

        merges = self._merges()
        vocab = byte_bpe_vocab(merges)
        ids = [i for i, _, _ in vocab]
        assert ids == list(range(len(vocab)))  # contiguous from 0
        # specials at the reserved low ids, in order
        assert [(i, t) for i, t, sp in vocab if sp] == list(
            enumerate(DEFAULT_SPECIALS)
        )
        # 256-unit alphabet next, then merge outputs (dedup'd)
        assert len(vocab) <= len(DEFAULT_SPECIALS) + 256 + len(merges)
        assert len(vocab) >= len(DEFAULT_SPECIALS) + 256
        toks = [t for _, t, _ in vocab]
        assert len(set(toks)) == len(toks)  # no duplicate strings

    def test_encoder_closure_every_output_in_vocab(self):
        from meta_frame_spark.operators.bpe import byte_bpe_encode_text
        from meta_frame_spark.operators.vocab_ids import byte_bpe_vocab

        merges = self._merges()
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        tok_set = {t for _, t, sp in byte_bpe_vocab(merges) if not sp}
        for text in ("the lowest low", "völlig neu", "", "  \t\n"):
            assert set(byte_bpe_encode_text(text, ranks)) <= tok_set

    def test_special_collision_raises(self):
        import pytest as _pt

        from meta_frame_spark.operators.vocab_ids import byte_bpe_vocab

        with _pt.raises(ValueError, match="duplicate special"):
            byte_bpe_vocab([], specials=("<pad>", "<pad>"))
        # a merge whose output equals a special must be rejected
        bad = [("<bo", "s>")]
        with _pt.raises(ValueError, match="collides"):
            byte_bpe_vocab(bad, specials=("<bos>",))

    def test_encode_ids_round_trip_and_framing(self, spark):
        from meta_frame_spark.operators.vocab_ids import (
            byte_bpe_vocab,
            encode_ids,
        )

        merges = self._merges()
        vocab = byte_bpe_vocab(merges)
        df = spark.createDataFrame(
            [(1, "the lowest low"), (2, "völlig neu — ünïcode €"),
             (3, None), (4, "")],
            "doc_id bigint, text string",
        )
        out = {
            r.doc_id: r
            for r in encode_ids(
                df, merges, vocab, emit_ids=True, verify_round_trip=True
            ).collect()
        }
        sp = {t: i for i, t, s in vocab if s}
        for rid, r in out.items():
            assert r.ids_round_trip_ok, rid
            assert r.ids[0] == sp["<bos>"] and r.ids[-1] == sp["<eos>"]
            assert r.n_ids == len(r.ids)
        assert out[3].ids == [sp["<bos>"], sp["<eos>"]]  # NULL -> framing only
        assert out[4].ids == [sp["<bos>"], sp["<eos>"]]
        # no special id ever appears in the body, even though doc 1's
        # byte path could produce "<bos>"-looking strings
        body = out[1].ids[1:-1]
        assert not set(body) & set(sp.values())

    def test_literal_special_text_never_maps_to_special_id(self, spark):
        """Text containing the literal string '<bos>' must encode
        through the byte path — the reservation is out-of-band."""
        from meta_frame_spark.operators.vocab_ids import (
            byte_bpe_vocab,
            encode_ids,
        )

        merges = self._merges()
        vocab = byte_bpe_vocab(merges)
        sp = {t: i for i, t, s in vocab if s}
        df = spark.createDataFrame(
            [(1, "<bos> attack <eos>")], "doc_id bigint, text string"
        )
        r = encode_ids(
            df, merges, vocab, emit_ids=True, verify_round_trip=True
        ).collect()[0]
        assert r.ids_round_trip_ok  # decodes back to the literal text
        assert not set(r.ids[1:-1]) & set(sp.values())

    def test_missing_special_raises(self, spark):
        import pytest as _pt

        from meta_frame_spark.operators.vocab_ids import (
            byte_bpe_vocab,
            encode_ids,
        )

        merges = self._merges()
        vocab = byte_bpe_vocab(merges, specials=("<pad>", "<unk>"))
        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with _pt.raises(ValueError, match="missing special|no <bos>"):
            encode_ids(df, merges, vocab, specials=("<pad>", "<unk>",
                                                    "<bos>", "<eos>"))

    def test_unigram_vocab_table(self):
        from meta_frame_spark.operators.vocab_ids import unigram_vocab_table

        pieces = [("lo", -1.0), ("west", -2.0), ("t", -3.0), ("lo", -4.0)]
        vocab = unigram_vocab_table(pieces)
        toks = [t for _, t, _ in vocab]
        assert toks[:4] == ["<pad>", "<unk>", "<bos>", "<eos>"]
        assert toks[4:] == ["lo", "west", "t"]  # dup piece keeps first id

    def test_vocab_parquet_round_trip(self, spark, tmp_path):
        from meta_frame_spark.operators.tokenizer_io import (
            load_vocab,
            save_vocab,
        )
        from meta_frame_spark.operators.vocab_ids import byte_bpe_vocab

        vocab = byte_bpe_vocab(self._merges())
        p = str(tmp_path / "vocab")
        save_vocab(spark, vocab, p)
        assert load_vocab(spark, p) == vocab
        import pytest as _pt

        with _pt.raises(ValueError, match="empty"):
            save_vocab(spark, [], str(tmp_path / "v2"))


class TestWordPiece:
    """WordPiece training + greedy longest-match encode
    (operators/wordpiece.py)."""

    def test_kernel_greedy_longest_match(self):
        from meta_frame_spark.operators.wordpiece import (
            UNK,
            wordpiece_encode_word,
        )

        vocab = {"un", "##aff", "##able", "##a", "u", "##n", "hug",
                 "##ging"}
        assert wordpiece_encode_word("unaffable", vocab) == [
            "un", "##aff", "##able"]
        assert wordpiece_encode_word("hugging", vocab) == [
            "hug", "##ging"]
        # dead end mid-word -> whole word UNK (BERT semantics)
        assert wordpiece_encode_word("unz", vocab) == [UNK]
        assert wordpiece_encode_word("", vocab) == []

    def test_train_learns_likelihood_merges(self, spark, tiny):
        from meta_frame_spark.operators.wordpiece import wordpiece_train

        pieces = wordpiece_train(tiny, num_merges=30)
        assert len(set(pieces)) == len(pieces)  # no dups
        # every training word must tokenize with zero UNK under its
        # own vocab (chars all present + merges only add)
        from meta_frame_spark.operators.wordpiece import (
            wordpiece_encode_word,
        )

        vocab = set(pieces)
        for w in ("low", "lower", "newest", "widest"):
            enc = wordpiece_encode_word(w, vocab)
            joined = "".join(p[2:] if p.startswith("##") else p
                             for p in enc)
            assert joined == w, (w, enc)
        # determinism
        assert pieces == wordpiece_train(tiny, num_merges=30)

    def test_encode_dataframe_counts_and_reassembly(self, spark, tiny):
        from meta_frame_spark.operators.wordpiece import (
            wordpiece_encode,
            wordpiece_train,
        )

        pieces = wordpiece_train(tiny, num_merges=50)
        out = wordpiece_encode(
            tiny, pieces, verify_reassembly=True, emit_pieces=True
        ).collect()
        assert len(out) == tiny.count()
        for r in out:
            assert r.reassembly_ok
            assert r.n_words == 1
            assert r.n_unk == 0
            assert r.n_pieces == len(r.pieces)

    def test_unseen_chars_become_unk(self, spark, tiny):
        from meta_frame_spark.operators.wordpiece import (
            wordpiece_encode,
            wordpiece_train,
        )

        pieces = wordpiece_train(tiny, num_merges=10)
        df = spark.createDataFrame(
            [(1, "low zzz@#!")], "doc_id bigint, text string"
        )
        r = wordpiece_encode(
            df, pieces, verify_reassembly=True, emit_pieces=True
        ).collect()[0]
        assert r.n_words == 2 and r.n_unk == 1
        assert r.reassembly_ok  # UNK words are exempt by contract

    def test_bad_args(self, spark, tiny):
        import pytest as _pt

        from meta_frame_spark.operators.wordpiece import wordpiece_train

        with _pt.raises(ValueError, match="num_merges"):
            wordpiece_train(tiny, num_merges=0)


def test_encode_ids_round_trip_property_arbitrary_utf8(spark):
    """Id-layer twin of the byte-BPE loss-proof: for ARBITRARY unicode
    text, encode_ids' framed id sequence decodes back exactly through
    the inverse vocab — exercised through a real Spark frame in one
    batch (the per-string kernel is deterministic, so one mapInPandas
    pass over hypothesis-style adversarial rows covers the property
    without per-example Spark jobs)."""
    from meta_frame_spark.operators.bpe import _learn_merges, _to_units
    from meta_frame_spark.operators.vocab_ids import (
        byte_bpe_vocab,
        encode_ids,
    )

    counts = {
        tuple(_to_units(w)): c
        for w, c in (("the", 9), (" ", 12), ("thé", 4), ("ab", 7))
    }
    merges = _learn_merges(counts, 20)
    vocab = byte_bpe_vocab(merges)
    rows = [
        (0, ""), (1, " "), (2, "\t\n\r"), (3, "the the ab"),
        (4, "thé ünïcode € 漢字 🙂"), (5, "a" * 500),
        (6, "<bos><eos><pad><unk>"), (7, "\x00\x7f\x80ÿ mixed"),
        (8, "zero​width and comb́ining"),
        (9, "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral 𐍈"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = encode_ids(df, merges, vocab, verify_round_trip=True).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r.ids_round_trip_ok, r.doc_id
