"""Multinomial Naive Bayes (operators/nb.py)."""

import math

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.operators.nb import nb_predict, nb_train


@pytest.fixture(scope="module")
def toy(spark):
    # Hand-countable corpus: label x has tokens {a:3, b:1};
    # label y has tokens {b:2, c:2}. Vocabulary (all tokens) = {a,b,c}.
    return spark.createDataFrame(
        [
            (1, "x", "a a b"),
            (2, "x", "a"),
            (3, "y", "b c"),
            (4, "y", "c b"),
        ],
        "doc_id long, label string, text string",
    )


def test_fit_known_counts(spark, toy):
    """Log-conditionals match the hand computation with Laplace s=1,
    V=3; priors are document-frequency log ratios."""
    priors, cond = nb_train(toy, label_col="label", text_col="text")
    p = {r.label: r.log_prior for r in priors.collect()}
    assert p["x"] == pytest.approx(math.log(0.5))
    assert p["y"] == pytest.approx(math.log(0.5))
    c = {(r.label, r.token): r.log_cond for r in cond.collect()}
    # full labels x vocab grid — 2 * 3 cells, zero-count cells floored
    assert len(c) == 6
    # label x: n_l = 4 -> denom 4 + 3
    assert c[("x", "a")] == pytest.approx(math.log(4 / 7))
    assert c[("x", "b")] == pytest.approx(math.log(2 / 7))
    assert c[("x", "c")] == pytest.approx(math.log(1 / 7))  # smoothed floor
    # label y: n_l = 4 -> denom 7
    assert c[("y", "b")] == pytest.approx(math.log(3 / 7))
    assert c[("y", "c")] == pytest.approx(math.log(3 / 7))
    assert c[("y", "a")] == pytest.approx(math.log(1 / 7))


def test_predict_argmax_and_scores(spark, toy):
    priors, cond = nb_train(toy, label_col="label", text_col="text")
    test = spark.createDataFrame(
        [(10, "a a"), (11, "c c b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in nb_predict(test, priors, cond).collect()}
    # doc 10 "a a": x = ln.5 + 2 ln(4/7); y = ln.5 + 2 ln(1/7) -> x
    assert out[10].pred_label == "x"
    assert out[10].score == pytest.approx(
        round(math.log(0.5) + 2 * math.log(4 / 7), 6)
    )
    # doc 11 "c c b": y = ln.5 + 2 ln(3/7) + ln(3/7) beats x
    assert out[11].pred_label == "y"
    assert out[11].score == pytest.approx(
        round(math.log(0.5) + 3 * math.log(3 / 7), 6)
    )


def test_oov_ignored_and_prior_fallback(spark, toy):
    """OOV tokens are ignored (fitted-vocabulary convention); a doc
    with ZERO in-vocabulary tokens still scores via the prior argmax
    (label-asc tie on equal priors here)."""
    priors, cond = nb_train(toy, label_col="label", text_col="text")
    test = spark.createDataFrame(
        [(20, "zz qq"), (21, "a zz")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in nb_predict(test, priors, cond).collect()}
    # all-OOV: score is the bare prior; equal priors tie -> label asc = x
    assert out[20].pred_label == "x"
    assert out[20].score == pytest.approx(round(math.log(0.5), 6))
    # "a zz" scores exactly like "a" alone — zz contributes nothing
    assert out[21].pred_label == "x"
    assert out[21].score == pytest.approx(
        round(math.log(0.5) + math.log(4 / 7), 6)
    )


def test_vocab_head_bounded(spark, toy):
    """vocab_size caps the grid to the global top tokens (count desc,
    token asc tiebreak)."""
    _, cond = nb_train(toy, label_col="label", text_col="text", vocab_size=2)
    toks = {r.token for r in cond.select("token").distinct().collect()}
    # counts: a=3, b=3, c=2 -> head of 2 is {a, b}
    assert toks == {"a", "b"}


def test_validation_errors(spark, toy):
    with pytest.raises(ValueError):
        nb_train(toy, label_col="label", smoothing=0.0)
    with pytest.raises(ValueError):
        nb_train(toy, label_col="label", vocab_size=0)
    empty = toy.filter(F.lit(False))
    with pytest.raises(ValueError):
        nb_train(empty, label_col="label")


def test_deterministic_under_repartition(spark, documents):
    """Same predictions regardless of input partitioning — the 6dp
    round + label-asc tiebreak contract."""
    train = documents.filter(F.col("doc_id") % 5 != 0)
    test = documents.filter(F.col("doc_id") % 5 == 0)
    p1, c1 = nb_train(train, label_col="lang", vocab_size=128)
    a = sorted(
        nb_predict(test, p1, c1).collect(),
        key=lambda r: r.doc_id,
    )
    p2, c2 = nb_train(
        train.repartition(7, "lang"), label_col="lang", vocab_size=128
    )
    b = sorted(
        nb_predict(test.repartition(5, "doc_id"), p2, c2).collect(),
        key=lambda r: r.doc_id,
    )
    assert [(r.doc_id, r.pred_label) for r in a] == [
        (r.doc_id, r.pred_label) for r in b
    ]
    for ra, rb in zip(a, b):
        assert ra.score == pytest.approx(rb.score, abs=2e-6)


def test_matches_duckdb_oracle(spark, documents, sf_dir):
    """Full-model cross-check against an independent DuckDB NB on the
    real corpus slice — same vocab head, smoothing, and tiebreak."""
    duckdb = pytest.importorskip("duckdb")
    train = documents.filter(F.col("doc_id") % 5 != 0)
    test = documents.filter(F.col("doc_id") % 5 == 0)
    priors, cond = nb_train(train, label_col="lang", vocab_size=64)
    got = {
        r.doc_id: (r.pred_label, r.score)
        for r in nb_predict(test, priors, cond).collect()
    }
    want = duckdb.sql(
        f"""
        WITH docs AS (
            SELECT * FROM '{sf_dir}/documents.parquet'
            WHERE lang IS NOT NULL AND text IS NOT NULL
        ),
        tok AS (
            SELECT lang AS label,
                   unnest(regexp_extract_all(lower(text), '\\S+')) AS token
            FROM docs WHERE doc_id % 5 != 0
        ),
        vocab AS (
            SELECT token FROM tok GROUP BY token
            ORDER BY COUNT(*) DESC, token ASC LIMIT 64
        ),
        counts AS (
            SELECT label, token, COUNT(*) AS n_lt FROM tok
            JOIN vocab USING (token) GROUP BY 1, 2
        ),
        label_tot AS (SELECT label, SUM(n_lt) AS n_l FROM counts GROUP BY 1),
        v AS (SELECT COUNT(*) AS v FROM vocab),
        priors AS (
            SELECT lang AS label,
                   ln(COUNT(*) / CAST((SELECT COUNT(*) FROM docs
                                       WHERE doc_id % 5 != 0) AS DOUBLE))
                       AS log_prior
            FROM docs WHERE doc_id % 5 != 0 GROUP BY 1
        ),
        grid AS (
            SELECT lt.label, vo.token,
                   ln((COALESCE(c.n_lt, 0) + 1.0) / (lt.n_l + 1.0 * v.v))
                       AS log_cond
            FROM label_tot lt CROSS JOIN vocab vo CROSS JOIN v
            LEFT JOIN counts c ON c.label = lt.label AND c.token = vo.token
        ),
        ttok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '\\S+')) AS token
            FROM docs WHERE doc_id % 5 = 0
        ),
        ll AS (
            SELECT doc_id, label, SUM(log_cond) AS ll FROM ttok
            JOIN grid USING (token) GROUP BY 1, 2
        ),
        mat AS (
            SELECT d.doc_id, p.label,
                   p.log_prior + COALESCE(ll.ll, 0.0) AS score
            FROM (SELECT DISTINCT doc_id FROM docs WHERE doc_id % 5 = 0) d
            CROSS JOIN priors p
            LEFT JOIN ll ON ll.doc_id = d.doc_id AND ll.label = p.label
        )
        SELECT doc_id, label, ROUND(score, 6) AS score FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id
                ORDER BY ROUND(score, 6) DESC, label ASC) AS rn
            FROM mat
        ) WHERE rn = 1
        """
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, label, score in want:
        assert got[doc_id][0] == label, doc_id
        assert got[doc_id][1] == pytest.approx(score, abs=2e-6)
