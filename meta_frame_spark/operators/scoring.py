"""Corpus-derived unigram language-model scoring.

Not in the reference (SURVEY.md §2); this is the CCNet-style quality
signal: fit a unigram LM on the corpus itself (or a trusted slice),
score each document by its mean negative log-likelihood, and gate or
bucket on the score — gibberish and boilerplate score far from the
bulk of the distribution.

Model: ``p(tok) = count(tok) / total_tokens`` over the fitted corpus,
restricted to the ``top_v`` most frequent tokens; out-of-vocabulary
tokens score as count 1 (a floor, not Laplace smoothing — keeps the
oracle exactly SQL-expressible). Document score =
``avg(-ln p(tok))`` over all its tokens.

Scale design:

* Fitting: one explode + hash-shuffle groupBy token (map-side partial
  counts make the shuffle ~vocab-sized per task, not corpus-sized);
  ``top_v`` is a TakeOrdered (no global sort). The counts table feeds
  both the vocab and the total-token scalar, so it is persisted.
* Scoring: vocab (``top_v`` rows) is broadcast; the corpus side is
  explode → map-only probe → one groupBy on doc id. No corpus
  shuffle besides the final per-doc average.
* Fit once, score many: ``unigram_vocab`` is separable so the model
  can be fit on a trusted slice and reused across corpus shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.skew import ensure_min_partitions

_TOK = "_mfs_tok"


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 10_000,
) -> tuple[DataFrame, int]:
    """Fit: ``(token, cnt)`` for the ``top_v`` most frequent tokens
    (ties broken by token string, so the vocab is deterministic), plus
    the total token count of the fitted corpus (all tokens, in- and
    out-of-vocabulary — the probability denominator)."""
    from meta_frame_spark.operators.cache import track

    counts = track(
        ensure_min_partitions(df)
        .select(F.explode(_tokens(text_col)).alias(_TOK))
        .groupBy(_TOK)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    vocab = counts.orderBy(F.col("cnt").desc(), F.col(_TOK).asc()).limit(top_v)
    return vocab.withColumnRenamed(_TOK, "token"), int(total)


def unigram_logprob(
    df: DataFrame,
    vocab: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score: ``(id_col, n_tokens, avg_neg_logprob)`` per document
    under the fitted model — higher = more surprising under the
    corpus distribution."""
    toks = ensure_min_partitions(df).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    probed = toks.join(F.broadcast(vocab), "token", "left")
    nll = -F.log(F.coalesce(F.col("cnt"), F.lit(1)) / F.lit(float(total_tokens)))
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.avg(nll).alias("avg_neg_logprob"),
        )
    )


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 10_000,
) -> DataFrame:
    """Fit on ``df`` and score ``df`` (the self-calibrating shape)."""
    vocab, total = unigram_vocab(df, text_col, top_v)
    return unigram_logprob(df, vocab, total, text_col, id_col)


def bigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 50_000,
) -> DataFrame:
    """Fit the bigram table: ``(token, next_token, cnt)`` for the
    ``top_v`` most frequent adjacent-token pairs (ties broken by the
    pair strings — deterministic). Bigrams come from a JVM-side
    ``zip_with`` of the token array against its own tail: no UDF, one
    explode, one hash-shuffle groupBy with map-side partials. ``top_v``
    bounds the broadcast table the scorer ships — at 100 TB the full
    bigram table is corpus-sized, but LM-quality scoring only needs the
    head of the distribution (everything else takes the backoff)."""
    toks = _tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("token"), b.alias("next_token")),
    )
    return (
        ensure_min_partitions(df)
        .select(F.explode(pairs).alias("bg"))
        .select("bg.token", "bg.next_token")
        .groupBy("token", "next_token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc(), F.col("next_token").asc())
        .limit(top_v)
    )


def bigram_logprob(
    df: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Score: ``(id_col, n_bigrams, avg_neg_logprob)`` per document
    under a stupid-backoff bigram model (Brants et al. 2007):
    ``score(b|a) = cnt(a,b)/cnt(a)`` when the pair is in the fitted
    table, else ``backoff * p_unigram(b)`` with the same count-1 OOV
    floor as :func:`unigram_logprob` — every factor is a ratio of
    counts, so the whole model stays exactly SQL-expressible for the
    oracle. Documents with fewer than two tokens emit n_bigrams=0 and
    a null score (nothing to condition on).

    Scale: both model tables broadcast (``top_v``-bounded); the corpus
    side is explode → two map-only probes → one per-doc aggregate —
    the same single-shuffle shape as the unigram scorer."""
    toks = _tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("token"), b.alias("next_token")),
    )
    exploded = ensure_min_partitions(df).select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, "bg.token", "bg.next_token")

    uni_a = unigrams.select(F.col("token"), F.col("cnt").alias("_cnt_a"))
    uni_b = unigrams.select(
        F.col("token").alias("next_token"), F.col("cnt").alias("_cnt_b")
    )
    bg = bigrams.select("token", "next_token", F.col("cnt").alias("_cnt_ab"))

    probed = (
        exploded.join(F.broadcast(bg), ["token", "next_token"], "left")
        .join(F.broadcast(uni_a), "token", "left")
        .join(F.broadcast(uni_b), "next_token", "left")
    )
    p_bigram = F.col("_cnt_ab") / F.col("_cnt_a")
    p_backoff = F.lit(backoff) * (
        F.coalesce(F.col("_cnt_b"), F.lit(1)) / F.lit(float(total_tokens))
    )
    nll = -F.log(
        F.when(
            F.col("_cnt_ab").isNotNull() & F.col("_cnt_a").isNotNull(), p_bigram
        ).otherwise(p_backoff)
    )
    per_doc = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.avg(nll).alias("avg_neg_logprob"),
    )
    # docs with < 2 tokens have no bigram rows: restore them with nulls
    all_docs = df.select(F.col(id_col)).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_neg_logprob",
    )


def kneser_ney_logprob(
    df: DataFrame,
    fit: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999 — the smoothing KenLM ships, the model behind
    the classic CCNet perplexity filter):

        P(b|a) = max(c(a,b) - d, 0) / c(a·)
                 + d * N1+(a,·)/c(a·) * N1+(·,b)/N1+(·,·)

    with absolute discount ``d`` and continuation probability
    ``N1+(·,b)/N1+(·,·)`` — "how many contexts does b follow"
    rather than raw frequency, the insight that makes KN beat naive
    backoff on bursty tokens. A context unseen at fit time backs off
    to the continuation probability alone; a never-continuing token
    floors at 1e-12 (cannot occur when scoring the fit corpus
    itself — the default — so the self-fit path stays exactly
    oracle-replayable). Returns ``(id_col, n_bigrams,
    avg_neg_logprob)``; docs with fewer than two tokens emit
    n_bigrams=0, null score, as :func:`bigram_logprob`.

    Every factor is a ratio of counts, so DuckDB replays the entire
    model. Scale: the count tables are plain keyed aggregates (never
    collected; zipf keeps them far under corpus size); the three
    model factors fold into ONE probability table at distinct-bigram-
    TYPE grain, so the token-grain document stream crosses exactly one
    equi-join + one per-doc aggregate; only the single scalar
    N1+(·,·) reaches the driver."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    fit = df if fit is None else fit

    def _pairs(frame, with_id):
        toks = _tokens(text_col)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("token"), b.alias("next_token")),
        )
        cols = [F.col(id_col)] if with_id else []
        return ensure_min_partitions(frame).select(
            *cols, F.explode(pairs).alias("bg")
        ).select(*([id_col] if with_id else []), "bg.token", "bg.next_token")

    from meta_frame_spark.operators.cache import track

    # persist: the n_types scalar is an action — without it the
    # corpus scan + bigram aggregate runs once for the scalar and
    # again inside the returned plan
    cb = track(
        _pairs(fit, False).groupBy("token", "next_token").agg(
            F.count(F.lit(1)).alias("_cab")
        ).persist()
    )
    ctx = cb.groupBy("token").agg(
        F.sum("_cab").alias("_ca"),
        F.count(F.lit(1)).alias("_n_follow"),
    )
    cont = cb.groupBy("next_token").agg(F.count(F.lit(1)).alias("_n_prec"))
    n_types = cb.count()  # ONE scalar on the driver

    d = F.lit(float(discount))
    # fold the model into ONE probability per distinct bigram TYPE
    # the scored corpus actually contains (see kneser_ney3_logprob).
    # Self-fit fast path (r14 optimization, guide §2.4 "remove
    # shuffles outright"): when df IS the fit corpus, its distinct
    # bigram types are BY CONSTRUCTION exactly cb's key set — reuse
    # the persisted table instead of re-scanning the corpus and
    # re-aggregating the same keys (1 corpus scan + 1 corpus-grain
    # shuffle + 1 type-grain join removed; identical rows either way).
    if fit is df:
        typed = (
            cb
            .join(ctx, "token", "left")
            .join(cont, "next_token", "left")
        )
    else:
        need = _pairs(df, False).groupBy("token", "next_token").agg(
            F.count(F.lit(1)).alias("_drop")
        ).drop("_drop")
        typed = (
            need
            .join(cb, ["token", "next_token"], "left")
            .join(ctx, "token", "left")
            .join(cont, "next_token", "left")
        )
    pcont = F.coalesce(F.col("_n_prec"), F.lit(0)) / F.lit(float(n_types))
    p = F.when(
        F.col("_ca").isNotNull(),
        F.greatest(F.coalesce(F.col("_cab"), F.lit(0)) - d, F.lit(0.0))
        / F.col("_ca")
        + d * F.col("_n_follow") / F.col("_ca") * pcont,
    ).otherwise(pcont)
    ptable = typed.select("token", "next_token", p.alias("_p"))
    scored = _pairs(df, True).join(ptable, ["token", "next_token"])
    nll = -F.log(F.greatest(F.col("_p"), F.lit(1e-12)))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.avg(nll).alias("avg_neg_logprob"),
    )
    all_docs = df.select(F.col(id_col)).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_neg_logprob",
    )


def kneser_ney3_logprob(
    df: DataFrame,
    fit: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated TRIGRAM Kneser-Ney scoring (Chen & Goodman 1999
    §3 — the order KenLM/CCNet actually ship) with the full recursive
    backoff chain. Highest order uses raw counts, every lower order
    uses CONTINUATION counts derived from the trigram table:

        P3(c|ab) = max(c(abc)-d, 0)/c(ab·)
                   + d·N1+(ab·)/c(ab·) · P2(c|b)
        P2(c|b)  = max(N1+(·bc)-d, 0)/N1+(·b·)
                   + d·N1+(b··types)/N1+(·b·) · P1(c)
        P1(c)    = N1+(··c)/N1+(···)

    where N1+(·bc) = |{a : c(abc)>0}|, N1+(·b·) = Σ_c N1+(·bc),
    N1+(b··types) = |{c : N1+(·bc)>0}|, N1+(··c) = |{b : N1+(·bc)>0}|
    and N1+(···) = |{(b,c) : N1+(·bc)>0}| — ALL derived from the one
    trigram count table, so the whole model is a closed family of
    keyed aggregates over c(abc) and DuckDB replays every factor
    exactly. An unseen trigram context (a,b) backs off to P2; an
    unseen bigram context b backs off to P1; a never-continuing word
    floors at 1e-12 (unreachable on the self-fit path, keeping the
    default oracle-replayable). Returns ``(id_col, n_trigrams,
    avg_neg_logprob)``; docs with fewer than three tokens emit
    n_trigrams=0, null score.

    Scale: count tables stay distributed keyed aggregates
    (zipf-bounded, never collected) and only the single scalar
    N1+(···) reaches the driver. The five model factors fold into ONE
    probability table at distinct-trigram-TYPE grain first (all five
    joins run over type-sized tables), so the token-grain document
    stream — the only corpus-sized thing here — crosses exactly one
    equi-join + one per-doc aggregate. At 100 TB the type table is
    zipf-saturated while the stream keeps growing; joining the stream
    once instead of five times is the difference that matters."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    fit = df if fit is None else fit

    def _tris(frame, with_id):
        toks = _tokens(text_col)
        n = F.size(toks)
        # when() guards the sequence: start > stop would DESCEND
        tri = F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                    F.element_at(toks, i + 2).alias("w3"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
        )
        cols = [F.col(id_col)] if with_id else []
        return (
            ensure_min_partitions(frame)
            .select(*cols, F.explode(tri).alias("tg"))
            .select(
                *([id_col] if with_id else []), "tg.w1", "tg.w2", "tg.w3"
            )
        )

    from meta_frame_spark.operators.cache import track

    # persist the two tables everything derives from: the N1+(···)
    # scalar below is an ACTION, and without the persist the whole
    # corpus-scan + trigram aggregate would run once for the scalar
    # and AGAIN inside the returned plan
    c3 = track(
        _tris(fit, False).groupBy("w1", "w2", "w3").agg(
            F.count(F.lit(1)).alias("_c3")
        ).persist()
    )
    ctx3 = c3.groupBy("w1", "w2").agg(
        F.sum("_c3").alias("_c12"),
        F.count(F.lit(1)).alias("_nf12"),
    )
    # N1+(·bc): distinct left-extensions of each (b,c) — one row per
    # (w2,w3) over the trigram TYPE table
    mid = track(
        c3.groupBy("w2", "w3").agg(
            F.count(F.lit(1)).alias("_n23")
        ).persist()
    )
    ctx2 = mid.groupBy("w2").agg(
        F.sum("_n23").alias("_n2dot"),
        F.count(F.lit(1)).alias("_nf2"),
    )
    cont1 = mid.groupBy("w3").agg(F.count(F.lit(1)).alias("_n3"))
    n_types = mid.count()  # N1+(···): ONE scalar on the driver

    d = F.lit(float(discount))
    # fold the model into ONE probability per distinct trigram TYPE
    # the scored corpus actually contains — five type-grain joins
    # instead of five stream-grain ones. Self-fit fast path (r14
    # optimization, guide §2.4): when df IS the fit corpus its
    # distinct trigram types are exactly c3's key set — reuse the
    # persisted table instead of re-scanning the corpus for the same
    # keys (1 corpus scan + 1 corpus-grain shuffle + 1 type-grain
    # join removed; identical rows either way).
    if fit is df:
        typed = (
            c3
            .join(ctx3, ["w1", "w2"], "left")
            .join(mid, ["w2", "w3"], "left")
            .join(ctx2, "w2", "left")
            .join(cont1, "w3", "left")
        )
    else:
        need = _tris(df, False).groupBy("w1", "w2", "w3").agg(
            F.count(F.lit(1)).alias("_drop")
        ).drop("_drop")
        typed = (
            need
            .join(c3, ["w1", "w2", "w3"], "left")
            .join(ctx3, ["w1", "w2"], "left")
            .join(mid, ["w2", "w3"], "left")
            .join(ctx2, "w2", "left")
            .join(cont1, "w3", "left")
        )
    p1 = F.coalesce(F.col("_n3"), F.lit(0)) / F.lit(float(n_types))
    p2 = F.when(
        F.col("_n2dot").isNotNull(),
        F.greatest(F.coalesce(F.col("_n23"), F.lit(0)) - d, F.lit(0.0))
        / F.col("_n2dot")
        + d * F.col("_nf2") / F.col("_n2dot") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.col("_c12").isNotNull(),
        F.greatest(F.coalesce(F.col("_c3"), F.lit(0)) - d, F.lit(0.0))
        / F.col("_c12")
        + d * F.col("_nf12") / F.col("_c12") * p2,
    ).otherwise(p2)
    ptable = typed.select("w1", "w2", "w3", p3.alias("_p"))
    # every scored type is in ptable by construction -> inner join
    scored = _tris(df, True).join(ptable, ["w1", "w2", "w3"])
    nll = -F.log(F.greatest(F.col("_p"), F.lit(1e-12)))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_trigrams"),
        F.avg(nll).alias("avg_neg_logprob"),
    )
    all_docs = df.select(F.col(id_col)).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        "avg_neg_logprob",
    )


def modified_kneser_ney_logprob(
    df: DataFrame,
    fit: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MODIFIED Kneser-Ney bigram scoring (Chen & Goodman 1999 §3 —
    the variant KenLM/SRILM actually default to): instead of one fixed
    absolute discount, three discounts D1/D2/D3+ chosen by count class
    and ESTIMATED from the corpus's count-of-counts:

        Y  = n1 / (n1 + 2·n2)
        D1 = 1 - 2·Y·n2/n1,  D2 = 2 - 3·Y·n3/n2,  D3+ = 3 - 4·Y·n4/n3

    where ``n_k`` = number of bigram TYPES seen exactly k times. The
    per-context interpolation weight keeps the model a proper
    distribution:

        γ(a) = (D1·N1(a·) + D2·N2(a·) + D3+·N3+(a·)) / c(a·)
        P(b|a) = max(c(ab) - D(c(ab)), 0)/c(a·) + γ(a)·N1+(·b)/N1+(··)

    Every quantity is a count or a ratio of counts, so DuckDB replays
    the whole model including the discount estimation. Degenerate
    corpora where n1, n2 or n3 is zero (no singleton/doubleton/tripleton
    bigrams — cannot happen on real zipf text) raise rather than divide
    by zero. Returns ``(id_col, n_bigrams, avg_neg_logprob)`` like the
    fixed-discount scorer; unseen contexts back off to the continuation
    probability, never-continuing tokens floor at 1e-12.

    Scale: identical shape to :func:`kneser_ney_logprob` — persisted
    type-grain count table, count-of-counts is ONE extra 5-value
    aggregate row on the driver, the token stream crosses one equi-join
    against the folded type-grain probability table."""
    from meta_frame_spark.operators.cache import track

    fit = df if fit is None else fit

    def _pairs(frame, with_id):
        toks = _tokens(text_col)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("token"), b.alias("next_token")),
        )
        cols = [F.col(id_col)] if with_id else []
        return ensure_min_partitions(frame).select(
            *cols, F.explode(pairs).alias("bg")
        ).select(*([id_col] if with_id else []), "bg.token", "bg.next_token")

    cb = track(
        _pairs(fit, False).groupBy("token", "next_token").agg(
            F.count(F.lit(1)).alias("_cab")
        ).persist()
    )
    # count-of-counts + type total: ONE 5-value row on the driver
    c = F.col("_cab")
    stats = cb.agg(
        F.sum((c == 1).cast("long")).alias("n1"),
        F.sum((c == 2).cast("long")).alias("n2"),
        F.sum((c == 3).cast("long")).alias("n3"),
        F.sum((c == 4).cast("long")).alias("n4"),
        F.count(F.lit(1)).alias("nt"),
    ).first()
    n1, n2, n3, n4, n_types = (
        stats.n1 or 0, stats.n2 or 0, stats.n3 or 0, stats.n4 or 0,
        stats.nt,
    )
    if n1 == 0 or n2 == 0 or n3 == 0:
        raise ValueError(
            "modified_kneser_ney_logprob: degenerate count-of-counts "
            f"(n1={n1}, n2={n2}, n3={n3}) — corpus too small/uniform "
            "for discount estimation; use kneser_ney_logprob"
        )
    y = n1 / (n1 + 2.0 * n2)
    d1 = 1.0 - 2.0 * y * n2 / n1
    d2 = 2.0 - 3.0 * y * n3 / n2
    d3p = 3.0 - 4.0 * y * n4 / n3

    ctx = cb.groupBy("token").agg(
        F.sum("_cab").alias("_ca"),
        F.sum((c == 1).cast("long")).alias("_k1"),
        F.sum((c == 2).cast("long")).alias("_k2"),
        F.sum((c >= 3).cast("long")).alias("_k3p"),
    )
    cont = cb.groupBy("next_token").agg(F.count(F.lit(1)).alias("_n_prec"))

    # fold into one probability per distinct bigram TYPE of df
    # (self-fit fast path: see kneser_ney_logprob — df's types ARE
    # cb's keys, so skip the corpus re-scan; the registered query
    # fits on a slice and takes the general branch)
    if fit is df:
        typed = (
            cb
            .join(ctx, "token", "left")
            .join(cont, "next_token", "left")
        )
    else:
        need = _pairs(df, False).groupBy("token", "next_token").agg(
            F.count(F.lit(1)).alias("_drop")
        ).drop("_drop")
        typed = (
            need
            .join(cb, ["token", "next_token"], "left")
            .join(ctx, "token", "left")
            .join(cont, "next_token", "left")
        )
    disc = (
        F.when(c == 1, F.lit(d1))
        .when(c == 2, F.lit(d2))
        .otherwise(F.lit(d3p))
    )
    pcont = F.coalesce(F.col("_n_prec"), F.lit(0)) / F.lit(float(n_types))
    gamma = (
        F.lit(d1) * F.col("_k1")
        + F.lit(d2) * F.col("_k2")
        + F.lit(d3p) * F.col("_k3p")
    ) / F.col("_ca")
    first = F.when(
        c.isNotNull(), F.greatest(c - disc, F.lit(0.0)) / F.col("_ca")
    ).otherwise(F.lit(0.0))
    p = F.when(
        F.col("_ca").isNotNull(), first + gamma * pcont
    ).otherwise(pcont)
    ptable = typed.select("token", "next_token", p.alias("_p"))
    scored = _pairs(df, True).join(ptable, ["token", "next_token"])
    nll = -F.log(F.greatest(F.col("_p"), F.lit(1e-12)))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.avg(nll).alias("avg_neg_logprob"),
    )
    all_docs = df.select(F.col(id_col)).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_neg_logprob",
    )


def ccnet_buckets(
    scored: DataFrame,
    score_col: str = "avg_neg_logprob",
    group_cols: list[str] | None = None,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    tiebreak: str = "doc_id",
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020): rank
    documents by LM score WITHIN each group (CCNet buckets per
    language — a Wikipedia-trained LM's perplexities are only
    comparable within one language) and label equal-frequency
    buckets, best (lowest) scores first. ``head`` is what the public
    pipelines keep outright, ``middle`` is the re-usable band,
    ``tail`` is the perplexity filter's reject pile.

    Deterministic: ranking orders by ``(score_col, tiebreak)`` so
    boundary ties can never split differently across reruns or
    engines — round the score to a fixed precision FIRST if it comes
    from float aggregation.

    Scale: one shuffle on ``group_cols`` + per-group sort (the
    partitioned-rank pattern; real corpora spread over many
    languages). For a single-language 100 TB corpus, precompute
    boundary scores on a sample and assign map-side instead
    (``gating.quantile_band_filter`` pattern) — an ungrouped NTILE
    would sort the corpus in one task."""
    from meta_frame_spark.operators.ranking import ntile_buckets

    if len(labels) < 2:
        raise ValueError(f"need >= 2 bucket labels, got {labels!r}")
    bucketed = ntile_buckets(
        scored, score_col, len(labels), group_cols=group_cols,
        tiebreak=tiebreak, out_col="_ccnet_ntile",
    )
    label_arr = F.array(*[F.lit(lb) for lb in labels])
    return bucketed.withColumn(
        out_col, F.element_at(label_arr, F.col("_ccnet_ntile"))
    ).drop("_ccnet_ntile")
