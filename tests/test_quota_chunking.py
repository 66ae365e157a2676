"""Quota capping, document chunking, winsorization, histograms, and
incremental dedup — unit semantics on tiny frames; exact DuckDB
oracles at sf0.01 cover the same operators via the driver contract
(domain_cap / doc_chunks / winsorized_lengths / length_histogram /
dedup_incremental)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.chunking import chunk_documents
from meta_frame_spark.operators.dedup import dedup_against
from meta_frame_spark.operators.gating import winsorize
from meta_frame_spark.operators.profile import histogram_fixed
from meta_frame_spark.operators.quota import quota_per_group


@pytest.fixture(scope="module")
def domains(spark):
    rows = [
        # domain "big": 5 rows, quality 10..50
        *[(i, "big", i * 10.0) for i in range(1, 6)],
        # domain "small": 2 rows
        (10, "small", 5.0),
        (11, "small", 7.0),
        # quality ties inside "tied"
        (20, "tied", 1.0),
        (21, "tied", 1.0),
        (22, "tied", 1.0),
    ]
    return spark.createDataFrame(rows, "id long, domain string, quality double")


class TestQuotaPerGroup:
    def test_caps_and_keeps_best(self, domains):
        kept = quota_per_group(
            domains, ["domain"], cap=3, priority="quality", tiebreak="id"
        )
        big = {r.id for r in kept.filter("domain = 'big'").collect()}
        assert big == {3, 4, 5}  # top-3 by quality desc
        assert kept.filter("domain = 'small'").count() == 2  # under cap

    def test_tiebreak_deterministic(self, domains):
        kept = quota_per_group(
            domains, ["domain"], cap=2, priority="quality", tiebreak="id"
        )
        tied = {r.id for r in kept.filter("domain = 'tied'").collect()}
        assert tied == {20, 21}  # min ids win equal-priority ties

    def test_prefilter_path_identical(self, domains):
        plain = quota_per_group(
            domains, ["domain"], cap=3, priority="quality", tiebreak="id"
        )
        pre = quota_per_group(
            domains, ["domain"], cap=3, priority="quality", tiebreak="id",
            prefilter_counts=True,
        )
        assert {tuple(r) for r in plain.collect()} == {
            tuple(r) for r in pre.collect()
        }

    def test_bad_cap_raises(self, domains):
        with pytest.raises(ValueError):
            quota_per_group(domains, ["domain"], 0, "quality", "id")

    def test_prefilter_keeps_null_group_keys(self, spark):
        """Regression: the prefilter's semi-joins must use null-safe
        equality — groupBy treats NULL as a key, so a plain equi-join
        silently dropped every null-keyed row when prefilter_counts
        was on (a performance flag changing results)."""
        rows = [
            (1, None, 3.0), (2, None, 2.0), (3, None, 1.0), (4, None, 4.0),
            (5, "d", 1.0),
        ]
        df = spark.createDataFrame(rows, "id long, domain string, quality double")
        plain = quota_per_group(
            df, ["domain"], cap=2, priority="quality", tiebreak="id"
        )
        pre = quota_per_group(
            df, ["domain"], cap=2, priority="quality", tiebreak="id",
            prefilter_counts=True,
        )
        want = {(4, None), (1, None), (5, "d")}
        assert {(r.id, r.domain) for r in plain.collect()} == want
        assert {(r.id, r.domain) for r in pre.collect()} == want


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "t0 t1 t2 t3 t4 t5 t6"),  # 7 tokens
        (2, "a b"),                    # shorter than one chunk
        (3, ""),                       # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDocuments:
    def test_overlap_windows(self, tiny_docs):
        out = chunk_documents(tiny_docs, chunk_tokens=4, stride=2)
        d1 = {
            r.chunk_idx: (r.chunk_text, r.chunk_n_tokens)
            for r in out.filter("doc_id = 1").collect()
        }
        # starts 0,2 full; ragged tail at 4 adds t6
        assert d1 == {
            0: ("t0 t1 t2 t3", 4),
            1: ("t2 t3 t4 t5", 4),
            2: ("t4 t5 t6", 3),
        }

    def test_no_tail_when_grid_aligned(self, spark):
        df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=4, stride=2)
        # starts 0,2 cover all 6 tokens; start 4 would add nothing new
        assert out.count() == 2

    def test_short_and_empty_docs_kept(self, tiny_docs):
        out = chunk_documents(tiny_docs, chunk_tokens=4, stride=2)
        assert [tuple(r) for r in out.filter("doc_id = 2").collect()] == [
            (2, 0, "a b", 2)
        ]
        assert [tuple(r) for r in out.filter("doc_id = 3").collect()] == [
            (3, 0, "", 0)
        ]

    def test_drop_partial(self, tiny_docs):
        out = chunk_documents(tiny_docs, chunk_tokens=4, stride=2, drop_partial=True)
        assert {r.doc_id for r in out.collect()} == {1}
        assert out.count() == 2  # only the two full windows

    def test_every_token_covered(self, documents):
        """Concatenated non-overlapped chunks reproduce the corpus token
        stream: sum of (stride-advance) tokens == total tokens."""
        out = chunk_documents(
            documents.limit(50), chunk_tokens=32, stride=32, id_col="doc_id"
        )
        got = out.agg(F.sum("chunk_n_tokens")).collect()[0][0]
        want = (
            documents.limit(50)
            .select(F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        assert got == want

    def test_bad_params_raise(self, tiny_docs):
        with pytest.raises(ValueError):
            chunk_documents(tiny_docs, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(tiny_docs, chunk_tokens=4, stride=5)


class TestWinsorize:
    def test_clips_in_place_preserving_schema(self, domains):
        out = winsorize(domains, "quality", 0.25, 0.75, ["domain"])
        assert out.columns == domains.columns
        big = {r.id: r.quality for r in out.filter("domain = 'big'").collect()}
        # p25 of 10..50 = 20, p75 = 40 (linear interpolation)
        assert big[1] == 20.0 and big[5] == 40.0 and big[3] == 30.0

    def test_out_col_appends(self, domains):
        out = winsorize(domains, "quality", 0.0, 0.5, out_col="w")
        assert out.columns == [*domains.columns, "w"]
        assert out.filter(F.col("w") > F.col("quality")).count() == 0

    def test_bad_band_raises(self, domains):
        with pytest.raises(ValueError):
            winsorize(domains, "quality", 0.9, 0.1)


class TestHistogramFixed:
    def test_counts_sum_and_overflow_bands(self, domains):
        out = histogram_fixed(domains, "quality", 10.0, 30.0, 2)
        rows = {r.bucket: r for r in out.collect()}
        assert sum(r.n for r in rows.values()) == domains.count()
        # 5,7,1,1,1 below 10 -> bucket 0; 30,40,50 >= 30 -> bucket 3
        assert rows[0].n == 5
        assert rows[3].n == 3
        assert rows[1].n == 1 and rows[1].bucket_lo == 10.0 and rows[1].bucket_hi == 20.0
        # boundary value 20 falls in the upper bucket
        assert rows[2].n == 1

    def test_grouped(self, domains):
        out = histogram_fixed(domains, "quality", 0.0, 100.0, 1, ["domain"])
        got = {(r.domain, r.bucket): r.n for r in out.collect()}
        assert got[("big", 1)] == 5 and got[("tied", 1)] == 3

    def test_bad_params_raise(self, domains):
        with pytest.raises(ValueError):
            histogram_fixed(domains, "quality", 5.0, 5.0, 4)
        with pytest.raises(ValueError):
            histogram_fixed(domains, "quality", 0.0, 1.0, 0)


class TestDedupAgainst:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [(1, "seen before"), (2, "also seen")], "id long, text string"
        )

    def test_drops_corpus_hits_and_batch_dupes(self, spark, corpus):
        batch = spark.createDataFrame(
            [
                (10, "seen before"),   # in corpus -> dropped
                (11, "brand new"),
                (12, "brand new"),     # batch dupe -> collapsed to 11
                (13, "another new"),
            ],
            "id long, text string",
        )
        out = dedup_against(batch, corpus, ["text"], "id")
        assert {r.id for r in out.collect()} == {11, 13}
        assert out.columns == batch.columns

    def test_within_batch_false_keeps_dupes(self, spark, corpus):
        batch = spark.createDataFrame(
            [(11, "brand new"), (12, "brand new")], "id long, text string"
        )
        out = dedup_against(batch, corpus, ["text"], "id", within_batch=False)
        assert out.count() == 2


def test_top_mass_per_group_adapts_to_concentration(spark):
    import pytest

    from meta_frame_spark.operators.gating import top_mass_per_group

    rows = [
        # concentrated group: one doc carries 90 of 100
        ("conc", 1, 90), ("conc", 2, 5), ("conc", 3, 5),
        # flat group: four docs of 25 each
        ("flat", 10, 25), ("flat", 11, 25), ("flat", 12, 25), ("flat", 13, 25),
    ]
    df = spark.createDataFrame(rows, ["g", "doc_id", "score"])
    kept = {(r.g, r.doc_id) for r in top_mass_per_group(
        df, ["g"], "score", mass=0.5, tiebreak="doc_id").collect()}
    # concentrated: the single 90-score doc crosses 50% alone
    assert {d for g, d in kept if g == "conc"} == {1}
    # flat: two docs of 25 reach exactly 50% (boundary row kept)
    assert {d for g, d in kept if g == "flat"} == {10, 11}

    with pytest.raises(ValueError, match="mass"):
        top_mass_per_group(df, ["g"], "score", mass=0.0, tiebreak="doc_id")


def test_top_mass_zero_total_group_keeps_one_row(spark):
    from meta_frame_spark.operators.gating import top_mass_per_group

    df = spark.createDataFrame(
        [("z", 1, 0), ("z", 2, 0), ("ok", 5, 10)], ["g", "doc_id", "score"]
    )
    kept = {(r.g, r.doc_id) for r in top_mass_per_group(
        df, ["g"], "score", mass=0.5, tiebreak="doc_id").collect()}
    assert kept == {("z", 1), ("ok", 5)}  # all-zero group keeps rank-1


class TestSentencePassages:
    def test_overlapping_windows_hand_case(self, spark):
        from meta_frame_spark.operators.chunking import sentence_passages

        df = spark.createDataFrame(
            [(1, "One here. Two there! Three now? Four ends.")],
            "doc_id long, text string",
        )
        out = sentence_passages(df, n_sentences=2, stride=1).collect()
        # 4 sentences, window 2, stride 1 -> 3 passages, no tail
        assert [r.passage_idx for r in out] == [0, 1, 2]
        assert out[0].passage == "One here. Two there!"
        assert out[2].passage == "Three now? Four ends."
        assert all(r.passage_n_sentences == 2 for r in out)
        assert out[0].passage_n_tokens == 4

    def test_ragged_tail_kept_and_droppable(self, spark):
        from meta_frame_spark.operators.chunking import sentence_passages

        df = spark.createDataFrame(
            [(1, "A one. B two. C three. D four. E five.")],
            "doc_id long, text string",
        )
        # 5 sentences, window 3, stride 3 -> one full + tail of 2
        keep = sentence_passages(df, n_sentences=3, stride=3).collect()
        assert [r.passage_n_sentences for r in keep] == [3, 2]
        assert keep[1].passage == "D four. E five."
        drop = sentence_passages(
            df, n_sentences=3, stride=3, drop_partial=True).collect()
        assert [r.passage_n_sentences for r in drop] == [3]

    def test_short_and_sentenceless_docs(self, spark):
        from meta_frame_spark.operators.chunking import sentence_passages

        df = spark.createDataFrame(
            [(1, "Lone sentence here."), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        out = sentence_passages(df, n_sentences=2, stride=1).collect()
        # doc 1 -> its single sentence as the tail window; 2/3 -> none
        assert [(r.doc_id, r.passage_idx) for r in out] == [(1, 0)]
        assert out[0].passage_n_sentences == 1

    def test_validation(self, spark):
        import pytest

        from meta_frame_spark.operators.chunking import sentence_passages

        df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n_sentences"):
            sentence_passages(df, n_sentences=0)
        with pytest.raises(ValueError, match="stride"):
            sentence_passages(df, n_sentences=2, stride=3)


class TestPassagePairs:
    def test_adjacent_disjoint_pairs(self, spark):
        from meta_frame_spark.operators.chunking import passage_pairs

        df = spark.createDataFrame(
            [(1, "A one. B two! C three? D four. E five.")],
            "doc_id long, text string",
        )
        out = passage_pairs(df, n_sentences=2).collect()
        # disjoint windows: [A,B] [C,D] [E]; adjacent pairs: 2
        assert [(r.pair_idx, r.anchor, r.positive) for r in out] == [
            (0, "A one. B two!", "C three? D four."),
            (1, "C three? D four.", "E five."),
        ]

    def test_short_docs_contribute_nothing(self, spark):
        from meta_frame_spark.operators.chunking import passage_pairs

        df = spark.createDataFrame(
            [(1, "Only. Two."), (2, "One sentence."), (3, ""), (4, None)],
            "doc_id long, text string",
        )
        # doc 1: one window of 2 -> no pair; others: < 2 windows
        assert passage_pairs(df, n_sentences=2).count() == 0


class TestIctPairs:
    def test_deterministic_pick_and_context(self, spark):
        import hashlib

        from meta_frame_spark.operators.chunking import ict_pairs

        text = "A one. B two! C three? D four."
        df = spark.createDataFrame([(7, text)], "doc_id long, text string")
        r = ict_pairs(df).first()
        sents = ["A one.", "B two!", "C three?", "D four."]
        want = max(range(4),
                   key=lambda i: hashlib.md5(f"7:{i}".encode()).hexdigest())
        assert r.query_idx == want
        assert r.query == sents[want]
        assert r.context == " ".join(
            s for j, s in enumerate(sents) if j != want)
        assert r.n_sentences == 4

    def test_min_sentences_and_validation(self, spark):
        import pytest as _pt

        from meta_frame_spark.operators.chunking import ict_pairs

        df = spark.createDataFrame(
            [(1, "Solo."), (2, None), (3, "Two here. And there.")],
            "doc_id long, text string",
        )
        out = ict_pairs(df).collect()
        assert [r.doc_id for r in out] == [3]
        with _pt.raises(ValueError, match="min_sentences"):
            ict_pairs(df, min_sentences=1)
        # NULL id breaks the md5 coin (every digest null -> biased
        # index-tiebreak pick), so the row is dropped, not kept
        df_null = spark.createDataFrame(
            [(None, "Two here. And there."), (7, "A one. A two.")],
            "doc_id long, text string",
        )
        assert [r.doc_id for r in ict_pairs(df_null).collect()] == [7]

    def test_partition_invariant(self, spark):
        from meta_frame_spark.operators.chunking import ict_pairs

        rows = [(i, f"Alpha {i}. Beta {i}. Gamma {i}. Delta {i}.")
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {(r.doc_id, r.query_idx) for r in ict_pairs(df).collect()}
        b = {(r.doc_id, r.query_idx)
             for r in ict_pairs(df.repartition(13)).collect()}
        assert a == b and len(a) == 40


class TestSpanCorruption:
    def test_python_replay(self, spark):
        """Spark output == a pure-Python replay of the coin, the run
        collapse, and the sentinel numbering."""
        import hashlib

        from meta_frame_spark.operators.chunking import span_corruption

        rows = [(i, "w%d " % i + "alpha beta gamma delta epsilon zeta "
                 "eta theta iota kappa lam mu nu xi omicron pi")
                for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r
               for r in span_corruption(df, mask_rate=0.3).collect()}

        for doc_id, text in rows:
            toks = text.split()
            inp, tgt, k, nm, prev = [], [], 0, 0, False
            for i, t in enumerate(toks):
                h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:8]
                m = int(h, 16) / 2**32 < 0.3
                start = m and not prev
                if not m:
                    inp.append(t)
                elif start:
                    inp.append(f"<extra_id_{k}>")
                    tgt.append(f"<extra_id_{k}> {t}")
                elif m:
                    tgt.append(t)
                k += start
                nm += m
                prev = m
            if k > 0:  # T5 terminal sentinel
                tgt.append(f"<extra_id_{k}>")
            r = got[doc_id]
            assert r.input_text == " ".join(inp), doc_id
            assert r.target_text == " ".join(tgt), doc_id
            assert (r.n_masked, r.n_spans) == (nm, k), doc_id

    def test_edges_and_validation(self, spark):
        import pytest as _pt

        from meta_frame_spark.operators.chunking import span_corruption

        df = spark.createDataFrame(
            [(1, "one two"), (2, ""), (3, None)], "doc_id long, text string"
        )
        out = span_corruption(df).collect()
        # empty/null docs dropped; survivors keep every token accounted
        assert [r.doc_id for r in out] == [1]
        r = out[0]
        assert r.n_tokens == 2 and 0 <= r.n_masked <= 2
        with _pt.raises(ValueError, match="mask_rate"):
            span_corruption(df, mask_rate=0.0)
        with _pt.raises(ValueError, match="mask_rate"):
            span_corruption(df, mask_rate=1.0)
        with _pt.raises(ValueError, match="max_tokens"):
            span_corruption(df, max_tokens=0)

    def test_max_tokens_guard_and_truncate(self, spark):
        """The O(n²)-per-row accumulator is guarded: a document over
        max_tokens fails LOUDLY unless truncate=True opts into
        processing the first max_tokens tokens; a document exactly at
        the boundary passes (VERDICT r11 #4)."""
        import pytest as _pt

        from meta_frame_spark.operators.chunking import span_corruption

        at = " ".join(f"t{i}" for i in range(8))
        over = " ".join(f"t{i}" for i in range(9))
        df_at = spark.createDataFrame(
            [(1, at)], "doc_id long, text string"
        )
        df_over = spark.createDataFrame(
            [(2, over)], "doc_id long, text string"
        )
        assert span_corruption(df_at, max_tokens=8).first().n_tokens == 8
        with _pt.raises(Exception, match="max_tokens=8"):
            span_corruption(df_over, max_tokens=8).collect()
        # truncate=True processes exactly the first max_tokens tokens
        r = span_corruption(df_over, max_tokens=8, truncate=True).first()
        assert r.n_tokens == 8
        assert "t8" not in r.input_text and "t8" not in r.target_text

    def test_terminal_sentinel_closes_target(self, spark):
        """Whenever any span is dropped the target ends with the
        terminal sentinel <extra_id_n_spans>; a doc with zero masked
        tokens has an empty target and no sentinel."""
        from meta_frame_spark.operators.chunking import span_corruption

        rows = [(i, " ".join(f"w{i}_{j}" for j in range(30)))
                for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        saw_spans = False
        for r in span_corruption(df, mask_rate=0.3).collect():
            if r.n_spans > 0:
                saw_spans = True
                assert r.target_text.endswith(f"<extra_id_{r.n_spans}>")
            else:
                assert r.target_text == ""
        assert saw_spans


class TestFimExamples:
    def test_python_replay_both_modes(self, spark):
        """Spark output == a pure-Python replay of the apply coin,
        both cut points, the slices, and the sentinel layouts."""
        import hashlib

        from meta_frame_spark.operators.chunking import fim_examples

        rows = [(i, " ".join(f"w{i}_{j}" for j in range(14)))
                for i in range(25)]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def u(doc_id, tag):
            h = hashlib.md5(f"{doc_id}:{tag}".encode()).hexdigest()[:8]
            return int(h, 16) / 2**32

        for mode in ("psm", "spm"):
            got = {r.doc_id: r for r in
                   fim_examples(df, fim_rate=0.6, mode=mode).collect()}
            saw_applied = saw_plain = False
            for doc_id, text in rows:
                toks = text.split()
                n = len(toks)
                ap = u(doc_id, "fim") < 0.6
                c1 = int(u(doc_id, "fim:a") * (n + 1))
                c2 = int(u(doc_id, "fim:b") * (n + 1))
                i, j = min(c1, c2), max(c1, c2)
                pre, mid, suf = (" ".join(toks[:i]), " ".join(toks[i:j]),
                                 " ".join(toks[j:]))
                if not ap:
                    expect = " ".join(toks)
                elif mode == "psm":
                    expect = (f"<fim_prefix>{pre}<fim_suffix>{suf}"
                              f"<fim_middle>{mid}")
                else:
                    # SPM: prefix->middle is one contiguous span
                    expect = (f"<fim_prefix><fim_suffix>{suf}"
                              f"<fim_middle>{' '.join(toks[:j])}")
                r = got[doc_id]
                assert r.fim_applied == ap, doc_id
                assert r.n_tokens == n, doc_id
                if ap:
                    saw_applied = True
                    assert (r.prefix_len, r.middle_len, r.suffix_len) == \
                        (i, j - i, n - j), doc_id
                else:
                    saw_plain = True
                    assert r.prefix_len is None
                assert r.input_text == expect, (doc_id, mode)
            assert saw_applied and saw_plain

    def test_null_ids_drop(self, spark):
        """NULL-id rows drop (they would all share ONE md5 coin
        stream via concat_ws's NULL-skipping) — ict_pairs rule."""
        from meta_frame_spark.operators.chunking import fim_examples

        df = spark.createDataFrame(
            [(1, "a b c d"), (None, "e f g h"), (None, "i j k")],
            "doc_id long, text string",
        )
        got = fim_examples(df, fim_rate=1.0).collect()
        assert [r.doc_id for r in got] == [1]

    def test_spm_layout_and_rate_edges(self, spark):
        from meta_frame_spark.operators.chunking import fim_examples

        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        # rate 0: nothing applied, empty/null docs dropped
        plain = fim_examples(df, fim_rate=0.0).collect()
        assert [(r.doc_id, r.fim_applied, r.input_text) for r in plain] \
            == [(1, False, "a b c d e")]
        # rate 1: always applied; SPM starts with both sentinels
        r = fim_examples(df, fim_rate=1.0, mode="spm").first()
        assert r.fim_applied
        assert r.input_text.startswith("<fim_prefix><fim_suffix>")
        assert r.prefix_len + r.middle_len + r.suffix_len == 5

    def test_validation(self, spark):
        import pytest as _pt

        from meta_frame_spark.operators.chunking import fim_examples

        df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        with _pt.raises(ValueError, match="fim_rate"):
            fim_examples(df, fim_rate=1.5)
        with _pt.raises(ValueError, match="mode"):
            fim_examples(df, mode="pms")


class TestCorpusDiversity:
    def test_hand_counts(self, spark):
        from meta_frame_spark.operators.profile import corpus_diversity

        df = spark.createDataFrame(
            [(1, "a", "x y x"), (2, "a", "x y"), (3, "b", "z")],
            "doc_id long, source string, text string",
        )
        out = {(r.source, r.n): r for r in
               corpus_diversity(df, ns=(1, 2)).collect()}
        # source a: unigrams x,y,x,x,y -> 5 grams, 2 distinct
        assert out[("a", 1)].n_grams == 5
        assert out[("a", 1)].distinct_grams == 2
        assert out[("a", 1)].distinct_ratio == 0.4
        # source a bigrams: "x y","y x","x y" -> 3 grams, 2 distinct
        assert out[("a", 2)].n_grams == 3
        assert out[("a", 2)].distinct_grams == 2
        # source b: one unigram; too short for any bigram
        assert out[("b", 1)].n_grams == 1
        assert ("b", 2) not in out

    def test_approx_path_and_validation(self, spark):
        import pytest as _pt

        from meta_frame_spark.operators.profile import corpus_diversity

        df = spark.createDataFrame(
            [(i, "s", f"w{i % 7} common") for i in range(40)],
            "doc_id long, source string, text string",
        )
        exact = {(r.source, r.n): r.distinct_grams for r in
                 corpus_diversity(df, ns=(1,)).collect()}
        approx = {(r.source, r.n): r.distinct_grams for r in
                  corpus_diversity(df, ns=(1,), exact=False).collect()}
        # HLL at rsd=0.05 on 8 distinct values is exact in practice
        assert approx[("s", 1)] == exact[("s", 1)] == 8
        with _pt.raises(ValueError, match="ns"):
            corpus_diversity(df, ns=())
        with _pt.raises(ValueError, match=">= 1"):
            corpus_diversity(df, ns=(0,))
