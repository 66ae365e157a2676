"""Unit tests for SCD2 history, time-range rolling aggregates, ntile
bucketing, sub-document dedup, unigram LM scoring, and the compacted
sink — each on tiny hand-checkable frames (SURVEY.md §5 strategy 1)."""

import glob

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# scd2_from_changelog / snapshot_asof
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        (1, "k1", "2024-01-01 00:00:00", "a"),
        (2, "k1", "2024-02-01 00:00:00", "b"),
        (3, "k1", "2024-02-01 00:00:00", "c"),  # same-ts tie -> id order
        (4, "k2", "2024-03-01 00:00:00", "d"),
    ]
    return spark.createDataFrame(
        rows, "id long, key string, ts string, attr string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_scd2_intervals_and_current(changelog):
    from meta_frame_spark.operators.history import scd2_from_changelog

    hist = scd2_from_changelog(changelog, ["key"], "ts", tiebreak_col="id")
    got = {r["id"]: r for r in hist.collect()}
    assert str(got[1]["valid_to"]) == "2024-02-01 00:00:00"
    # tie broken by id: version 2 closes at version 3's (equal) ts
    assert str(got[2]["valid_to"]) == "2024-02-01 00:00:00"
    assert got[3]["valid_to"] is None and got[3]["is_current"]
    assert got[4]["valid_to"] is None and got[4]["is_current"]
    assert not got[1]["is_current"] and not got[2]["is_current"]


def test_scd2_end_of_time_and_snapshot(changelog):
    from meta_frame_spark.operators.history import (
        scd2_from_changelog,
        snapshot_asof,
    )

    hist = scd2_from_changelog(
        changelog, ["key"], "ts", tiebreak_col="id",
        end_of_time="9999-12-31 00:00:00",
    )
    assert hist.filter(F.col("valid_to").isNull()).count() == 0
    snap = snapshot_asof(hist, "2024-01-15 00:00:00")
    assert [r["id"] for r in snap.collect()] == [1]  # k2 not born yet
    # an exactly-at-valid_from instant is included, valid_to exclusive
    snap2 = {r["id"] for r in snapshot_asof(hist, "2024-02-01 00:00:00").collect()}
    assert snap2 == {3}


# --------------------------------------------------------------------------
# rolling_agg
# --------------------------------------------------------------------------

def test_rolling_agg_range_frame(spark):
    from meta_frame_spark.operators.temporal import rolling_agg

    rows = [
        (1, "u", "2024-01-01 10:00:00", 1.0),
        (2, "u", "2024-01-01 10:30:00", 2.0),
        (3, "u", "2024-01-01 11:00:00", 4.0),   # 10:00 still in [t-1h, t]
        (4, "u", "2024-01-01 12:30:00", 8.0),   # everything else aged out
        (5, "v", "2024-01-01 10:45:00", 16.0),  # other key untouched
    ]
    df = spark.createDataFrame(
        rows, "id long, k string, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rolling_agg(
        df, "ts", ["k"], {"s": ("v", "sum"), "n": ("v", "count")}, 3600
    )
    got = {r["id"]: (r["s"], r["n"]) for r in out.collect()}
    assert got == {1: (1.0, 1), 2: (3.0, 2), 3: (7.0, 3), 4: (8.0, 1), 5: (16.0, 1)}


def test_rolling_agg_ties_share_frame(spark):
    from meta_frame_spark.operators.temporal import rolling_agg

    rows = [(1, "u", "2024-01-01 10:00:00", 1.0), (2, "u", "2024-01-01 10:00:00", 2.0)]
    df = spark.createDataFrame(
        rows, "id long, k string, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rolling_agg(df, "ts", ["k"], {"s": ("v", "sum")}, 60)
    # RANGE frame: equal timestamps see each other regardless of order
    assert {r["s"] for r in out.collect()} == {3.0}


# --------------------------------------------------------------------------
# ntile_buckets
# --------------------------------------------------------------------------

def test_ntile_buckets_deterministic(spark):
    from meta_frame_spark.operators.ranking import ntile_buckets

    df = spark.createDataFrame(
        [(i, "g", 10 * (i % 3)) for i in range(12)], "id long, g string, score long"
    )
    out = ntile_buckets(
        df, "score", 4, group_cols=["g"], tiebreak="id"
    ).collect()
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {1: 3, 2: 3, 3: 3, 4: 3}
    again = ntile_buckets(
        df.repartition(7), "score", 4, group_cols=["g"], tiebreak="id"
    ).collect()
    assert {(r["id"], r["bucket"]) for r in again} == {
        (r["id"], r["bucket"]) for r in out
    }


# --------------------------------------------------------------------------
# dedup_units
# --------------------------------------------------------------------------

def test_dedup_units_lines(spark):
    from meta_frame_spark.operators.linedup import dedup_units

    docs = spark.createDataFrame(
        [
            (1, "keep one\ncommon banner\nkeep two"),
            (2, "common banner\nunique line"),
            (3, "common banner"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_units(
            docs, delimiter_re="\n", max_occurrences=2, join_str="\n"
        ).collect()
    }
    assert out[1]["clean_text"] == "keep one\nkeep two"
    assert out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "unique line"
    # doc made entirely of boilerplate -> empty, zero kept
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0


def test_dedup_units_chunks_preserve_order(spark):
    from meta_frame_spark.operators.linedup import dedup_units

    boiler = "x y"
    docs = spark.createDataFrame(
        [(i, f"a{i} b{i} {boiler} c{i} d{i}") for i in range(4)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_units(docs, chunk_tokens=2, max_occurrences=2).collect()
    }
    for i in range(4):
        assert out[i] == f"a{i} b{i} c{i} d{i}"


def test_dedup_units_requires_exactly_one_mode(spark):
    from meta_frame_spark.operators.linedup import dedup_units

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_units(docs)
    with pytest.raises(ValueError):
        dedup_units(docs, delimiter_re="\n", chunk_tokens=2)


# --------------------------------------------------------------------------
# unigram scoring
# --------------------------------------------------------------------------

def test_unigram_scoring_oov_floor(spark):
    import math

    from meta_frame_spark.operators.scoring import (
        unigram_logprob,
        unigram_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "zzz")], "doc_id long, text string"
    )
    vocab, total = unigram_vocab(docs, top_v=2)
    assert total == 5
    vset = {r["token"]: r["cnt"] for r in vocab.collect()}
    assert vset == {"a": 3, "b": 1}  # top-2 by (cnt desc, token asc)
    scored = {
        r["doc_id"]: r for r in unigram_logprob(docs, vocab, total).collect()
    }
    expect1 = (3 * -math.log(3 / 5) + -math.log(1 / 5)) / 4
    assert scored[1]["avg_neg_logprob"] == pytest.approx(expect1)
    # zzz is OOV -> floored at count 1
    assert scored[2]["avg_neg_logprob"] == pytest.approx(-math.log(1 / 5))
    assert scored[2]["n_tokens"] == 1


# --------------------------------------------------------------------------
# write_compacted
# --------------------------------------------------------------------------

def test_write_compacted_caps_file_rows(spark, tmp_path):
    from meta_frame_spark.sources.sinks import write_compacted

    df = spark.range(1000).withColumn("part", (F.col("id") % 2).cast("int"))
    out = str(tmp_path / "compacted")
    write_compacted(
        df, out, max_records_per_file=100, partition_by=["part"]
    )
    files = glob.glob(f"{out}/part=*/*.parquet")
    assert files, "no parquet files written"
    for f in files:
        assert spark.read.parquet(f).count() <= 100
    assert spark.read.parquet(out).count() == 1000


def test_bigram_stupid_backoff_hand_computed(spark):
    """Tiny corpus where every factor is hand-checkable: in-table
    bigram uses cnt(a,b)/cnt(a); missing pair backs off to
    0.4 * unigram floor; a one-token doc scores null with 0 bigrams."""
    import math

    from meta_frame_spark.operators.scoring import (
        bigram_logprob,
        bigram_vocab,
        unigram_vocab,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "z q"), (3, "solo")],
        "doc_id bigint, text string",
    )
    uni, total = unigram_vocab(docs, top_v=3)   # vocab = {a:3, b:3, + 1 tie}
    bg = bigram_vocab(docs, top_v=2)            # {('a','b'):3, ('b','a'):1}
    out = {r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
           for r in bigram_logprob(docs, bg, uni, total).collect()}
    assert total == 9                            # a,b,a,b,a,b,z,q,solo
    # doc 1: single bigram (a,b): p = 3/3 = 1 -> nll 0
    assert out[1] == (1, 0.0)
    # doc 3: no bigrams
    assert out[3][0] == 0 and out[3][1] is None
    # doc 0: (a,b) p=1 twice, (b,a) p=1/3 once -> avg = ln(3)/3
    assert math.isclose(out[0][1], math.log(3) / 3, rel_tol=1e-9)
    # doc 2: (z,q) not in top-2 table -> backoff 0.4 * cnt(q)/9; q is
    # OOV of the top-3 unigram vocab -> floor cnt 1
    assert math.isclose(out[2][1], -math.log(0.4 * (1 / 9)), rel_tol=1e-9)


class TestKneserNey:
    def test_hand_computed_probabilities(self, spark):
        """Interpolated KN on a 2-doc corpus, every factor checked
        against the hand-derived count tables (d=0.75): cb(b,a)=2,
        cb(a,b)=cb(a,c)=1, c(a.)=c(b.)=2, N1+(a,.)=2, N1+(b,.)=1,
        every continuation count 1 over 3 bigram types."""
        import math

        import pytest as _pt

        from meta_frame_spark.operators.scoring import kneser_ney_logprob

        df = spark.createDataFrame(
            [(1, "a b a c"), (2, "b a"), (3, "x")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in kneser_ney_logprob(df).collect()}
        # doc2: P(a|b) = (2-.75)/2 + .75*(1/2)*(1/3) = 0.75
        assert out[2].n_bigrams == 1
        assert out[2].avg_neg_logprob == _pt.approx(-math.log(0.75), abs=1e-9)
        # doc1: P(b|a)=P(c|a)=(1-.75)/2 + .75*(2/2)*(1/3)=0.375; P(a|b)=0.75
        want = -(2 * math.log(0.375) + math.log(0.75)) / 3
        assert out[1].n_bigrams == 3
        assert out[1].avg_neg_logprob == _pt.approx(want, abs=1e-9)
        # single-token doc: no bigrams, null score
        assert out[3].n_bigrams == 0 and out[3].avg_neg_logprob is None
        with _pt.raises(ValueError, match="discount"):
            kneser_ney_logprob(df, discount=1.0)

    def test_separate_fit_backoff_and_floor(self, spark):
        """Scoring a corpus the model was NOT fit on: an unseen
        context backs off to the continuation probability; an unseen
        next-token floors (finite score, never -inf)."""
        import math

        import pytest as _pt

        from meta_frame_spark.operators.scoring import kneser_ney_logprob

        fit = spark.createDataFrame(
            [(1, "a b a c"), (2, "b a")], "doc_id long, text string"
        )
        score = spark.createDataFrame(
            [(10, "z a"), (11, "z q")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in
               kneser_ney_logprob(score, fit=fit).collect()}
        # context z unseen -> Pcont(a) = 1/3
        assert out[10].avg_neg_logprob == _pt.approx(
            -math.log(1 / 3), abs=1e-9)
        # next-token q never continues anything -> floored, finite
        assert out[11].avg_neg_logprob == _pt.approx(
            -math.log(1e-12), abs=1e-6)


class TestKneserNey3:
    def test_hand_computed_probabilities(self, spark):
        """Trigram interpolated KN on a 2-doc corpus, every factor
        hand-derived (d=0.75). Count tables: c3(abc)=2, c3(bca)=1,
        c3(cab)=2, c3(abd)=1; c(ab.)=3 with N1+(ab.)=2, c(bc.)=1,
        c(ca.)=2; mid table has 4 rows all N1+=1, so every P1=1/4."""
        import math

        import pytest as _pt

        from meta_frame_spark.operators.scoring import kneser_ney3_logprob

        df = spark.createDataFrame(
            [(1, "a b c a b d"), (2, "c a b c"), (3, "a b")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in kneser_ney3_logprob(df).collect()}
        # P2(c|b)=P2(d|b)=(1-.75)/2+.75*(2/2)*(1/4)=0.3125
        # P2(a|c)=P2(b|a)=(1-.75)/1+.75*(1/1)*(1/4)=0.4375
        p3_c_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * 0.3125
        p3_d_ab = (1 - 0.75) / 3 + 0.75 * 2 / 3 * 0.3125
        p3_a_bc = (1 - 0.75) / 1 + 0.75 * 1 / 1 * 0.4375
        p3_b_ca = (2 - 0.75) / 2 + 0.75 * 1 / 2 * 0.4375
        want1 = -(
            math.log(p3_c_ab) + math.log(p3_a_bc)
            + math.log(p3_b_ca) + math.log(p3_d_ab)
        ) / 4
        assert out[1].n_trigrams == 4
        assert out[1].avg_neg_logprob == _pt.approx(want1, abs=1e-9)
        want2 = -(math.log(p3_b_ca) + math.log(p3_c_ab)) / 2
        assert out[2].n_trigrams == 2
        assert out[2].avg_neg_logprob == _pt.approx(want2, abs=1e-9)
        # two-token doc: no trigrams, null score
        assert out[3].n_trigrams == 0 and out[3].avg_neg_logprob is None
        with _pt.raises(ValueError, match="discount"):
            kneser_ney3_logprob(df, discount=0.0)

    def test_backoff_chain_and_floor(self, spark):
        """All three backoff levels: seen trigram context with unseen
        continuation -> interpolation weight times P2; unseen trigram
        AND bigram context -> pure continuation unigram; a word that
        never continues anything -> floored, finite."""
        import math

        import pytest as _pt

        from meta_frame_spark.operators.scoring import kneser_ney3_logprob

        fit = spark.createDataFrame(
            [(1, "a b c a b d"), (2, "c a b c")],
            "doc_id long, text string",
        )
        score = spark.createDataFrame(
            [(10, "a b a"), (11, "z z a"), (12, "z z q")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in
               kneser_ney3_logprob(score, fit=fit).collect()}
        # (a,b,a): context (a,b) seen (c=3, N1+=2); (b,a) unseen in
        # mid -> P2(a|b) = 0 + .75*(2/2)*(1/4) = 0.1875;
        # P3 = 0 + .75*2/3*0.1875
        assert out[10].avg_neg_logprob == _pt.approx(
            -math.log(0.75 * 2 / 3 * 0.1875), abs=1e-9)
        # (z,z,a): both contexts unseen -> P1(a) = 1/4
        assert out[11].avg_neg_logprob == _pt.approx(
            -math.log(0.25), abs=1e-9)
        # (z,z,q): q never continues -> floor
        assert out[12].avg_neg_logprob == _pt.approx(
            -math.log(1e-12), abs=1e-6)

    def test_partition_invariant(self, spark):
        from meta_frame_spark.operators.scoring import kneser_ney3_logprob

        rows = [(i, " ".join(f"w{(i * j) % 7}" for j in range(12)))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, kneser_ney3_logprob(df).collect()))
        b = sorted(map(tuple,
                       kneser_ney3_logprob(df.repartition(11)).collect()))
        import pytest as _pt

        for ra, rb in zip(a, b):
            assert ra[0] == rb[0] and ra[1] == rb[1]
            assert ra[2] == _pt.approx(rb[2], abs=1e-12)


class TestModifiedKneserNey:
    def _corpus(self, spark):
        # bigram counts 4/3/2/1/1 -> n1=2 n2=1 n3=1 n4=1 over 5 types:
        # Y=0.5, D1=0.5, D2=0.5, D3+=1.0, every Pcont = 1/5
        rows, i = [], 0
        for pair, n in (("a b", 4), ("c d", 3), ("e f", 2),
                        ("g h", 1), ("i j", 1)):
            for _ in range(n):
                rows.append((i, pair))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_discounts_and_probabilities(self, spark):
        import math

        import pytest as _pt

        from meta_frame_spark.operators.scoring import (
            modified_kneser_ney_logprob,
        )

        df = self._corpus(spark)
        out = {r.doc_id: r for r in
               modified_kneser_ney_logprob(df).collect()}
        # P(b|a) = (4-D3+)/4 + (D3+*1)/4 * 1/5 = 0.75 + 0.05
        assert out[0].avg_neg_logprob == _pt.approx(
            -math.log(0.8), abs=1e-9)
        # P(d|c) = (3-1)/3 + (1/3)*0.2
        assert out[4].avg_neg_logprob == _pt.approx(
            -math.log(2 / 3 + 0.2 / 3), abs=1e-9)
        # P(f|e) = (2-D2)/2 + (D2*1)/2 * 0.2 = 0.75 + 0.05
        assert out[7].avg_neg_logprob == _pt.approx(
            -math.log(0.8), abs=1e-9)
        # P(h|g) = (1-D1)/1 + D1 * 0.2 = 0.6
        assert out[9].avg_neg_logprob == _pt.approx(
            -math.log(0.6), abs=1e-9)
        assert all(r.n_bigrams == 1 for r in out.values())

    def test_backoff_and_degenerate_raise(self, spark):
        import math

        import pytest as _pt

        from meta_frame_spark.operators.scoring import (
            modified_kneser_ney_logprob,
        )

        fit = self._corpus(spark)
        score = spark.createDataFrame(
            [(100, "z b"), (101, "z q"), (102, "a d")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in
               modified_kneser_ney_logprob(score, fit=fit).collect()}
        # unseen context -> pure continuation 1/5
        assert out[100].avg_neg_logprob == _pt.approx(
            -math.log(0.2), abs=1e-9)
        # never-continuing token -> floored, finite
        assert out[101].avg_neg_logprob == _pt.approx(
            -math.log(1e-12), abs=1e-6)
        # seen context, unseen pair -> gamma(a) * pcont = 1/4 * 1/5
        assert out[102].avg_neg_logprob == _pt.approx(
            -math.log(0.05), abs=1e-9)
        # degenerate count-of-counts raise (all bigrams count 4)
        flat = spark.createDataFrame(
            [(i, "a b") for i in range(4)], "doc_id long, text string"
        )
        with _pt.raises(ValueError, match="degenerate"):
            modified_kneser_ney_logprob(flat)
