"""Corpus vocabulary / n-gram frequency analysis.

The tokenizer-design and corpus-accounting primitive for an LLM data
pipeline: term and document frequencies over the whole corpus, and the
deterministic global top-k that seeds a vocabulary.

Reference parity note: the reference (`skybluecycology/meta_frame`)
has no text operators at all — this extends the rebuilt engine per the
north-star scope (SURVEY.md §7.1 step 6a).

Scale design (100 TB): n-grams are built per-row with JVM higher-order
functions (``transform``/``slice``/``array_join`` — codegen'd, no
Python). The frequency table is a classic two-phase aggregation:
``groupBy(token, doc_id)`` first (map-side partial combine collapses
within-doc repeats before the shuffle), then ``groupBy(token)`` over
the already-reduced pairs to get term frequency AND document frequency
without a count-distinct Expand. Top-k is ``orderBy(...).limit(k)`` —
Spark's TakeOrdered: per-partition heaps then a k-row merge on the
driver, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(text: Column, n: int, lowercase: bool) -> Column:
    """array<string> of whitespace-token n-grams of ``text``."""
    if lowercase:
        text = F.lower(text)
    toks = F.regexp_extract_all(text, F.lit(r"\S+"), 0)
    if n == 1:
        return toks
    # sequence(1, m) flips to a DESCENDING range when m < 1 — guard
    # short docs to an empty gram list instead
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    build = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, build).otherwise(
        F.array().cast("array<string>")
    )


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    lowercase: bool = True,
    min_count: int = 1,
    fanout: int | None = None,
) -> DataFrame:
    """Corpus n-gram frequency table: one row per distinct n-gram with

    - ``token`` — the n-gram (space-joined whitespace tokens);
    - ``n_occurrences`` — total occurrences across the corpus (TF);
    - ``n_docs`` — number of distinct documents containing it (DF).

    ``min_count`` drops the long tail (hapax legomena dominate any
    natural corpus; filtering post-agg keeps the shuffle small because
    partial aggregation already collapsed repeats map-side).

    ``fanout``: optional pre-repartition of the *input docs* before the
    tokenize/explode stage. Input parallelism is bounded by file splits
    — a corpus read from a few small files runs its whole (CPU-heavy)
    tokenization on as many cores. At 100 TB inputs are thousands of
    splits and ``fanout`` should stay None; for few-file inputs set it
    to the cluster parallelism (one small shuffle of raw docs buys a
    fully parallel map stage).
    """
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1, got {n}")
    if fanout:
        df = df.repartition(fanout)
    per_doc = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(_grams(F.col(text_col), n, lowercase)).alias("token"),
        )
        .groupBy("token", "_doc")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    out = per_doc.groupBy("token").agg(
        F.sum("_c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    if min_count > 1:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1000,
    n: int = 1,
    lowercase: bool = True,
    fanout: int | None = None,
) -> DataFrame:
    """Deterministic global top-k n-grams by total occurrences,
    ties broken by token text — the same k rows on any cluster,
    partitioning, or engine."""
    counts = token_counts(
        df, text_col, id_col, n=n, lowercase=lowercase, fanout=fanout
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)


def vocab_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` term-frequency movers between two corpus versions:
    ``(term, cnt_a, cnt_b, log_ratio, rank)`` ranked by |log_ratio|
    (ties by term asc). ``log_ratio = ln(rel_a / rel_b)`` with add-one
    smoothing on counts and totals, so terms absent from one side get
    a large finite score instead of ±inf — the "what changed in this
    crawl" report run between snapshot and refresh.

    Shape: one token count aggregate per side (map-side combined), a
    full outer join on term (skinny rows), totals as broadcast
    scalars, TakeOrdered for the top-k — no global sort of the
    vocabulary. ``min_count`` (on the larger side) drops noise terms
    whose ratio is all smoothing.
    """

    def counts(df: DataFrame, tag: str):
        toks = df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"\S+"), 0
                )
            ).alias("term")
        )
        c = toks.groupBy("term").agg(F.count(F.lit(1)).alias(f"cnt_{tag}"))
        n = toks.agg(F.count(F.lit(1)).alias(f"n_{tag}"))
        return c, n

    ca, na = counts(df_a, "a")
    cb, nb = counts(df_b, "b")
    joined = (
        ca.join(cb, "term", "full_outer")
        .fillna(0, ["cnt_a", "cnt_b"])
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .filter(F.greatest("cnt_a", "cnt_b") >= min_count)
    )
    ratio = F.round(
        F.log(
            ((F.col("cnt_a") + 1) / (F.col("n_a") + 1))
            / ((F.col("cnt_b") + 1) / (F.col("n_b") + 1))
        ),
        round_to,
    ) + F.lit(0.0)
    scored = joined.select(
        "term", "cnt_a", "cnt_b", ratio.alias("log_ratio")
    )
    order = [F.abs(F.col("log_ratio")).desc(), F.col("term").asc()]
    top = scored.orderBy(*order).limit(k)
    from pyspark.sql import Window

    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_count: int = 3,
    lowercase: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information:
    ``(w1, w2, n_pair, n_left, n_right, pmi, rank)`` ranked by
    (rounded) PMI desc, ties by ``(w1, w2)`` asc — the "which word
    pairs stick together" report (Church & Hanks 1990) that surfaces
    multi-word expressions worth protecting from tokenizer splits.

    Position-aware formulation over bigram INSTANCES: with ``N`` total
    bigrams in the corpus, ``n_left(w)`` = occurrences of ``w`` as a
    bigram's first token and ``n_right(w)`` as its second,

        pmi(w1, w2) = ln( n_pair * N / (n_left(w1) * n_right(w2)) )

    so both marginals are RE-aggregations of the pair-count table and
    the corpus text is tokenized exactly once. ``min_count`` floors
    ``n_pair`` (rare pairs otherwise dominate PMI — the classic
    low-frequency bias); marginals are computed from the UNfiltered
    pair table so the probabilities stay calibrated.

    Scale: one explode + groupBy(w1, w2) shuffle over the corpus
    (map-side combined), then everything downstream is vocabulary-
    sized: two re-agg marginals, two skinny equi-joins, TakeOrdered
    for the top-k (per-partition heaps, never a global sort). The
    rank column is a window over k collected rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    grams = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(_grams(F.col(text_col), 2, lowercase)).alias("_g")
    )
    pair_part = F.split(F.col("_g"), " ", 2)
    from meta_frame_spark.operators.cache import track

    pairs = track(
        grams.select(
            pair_part.getItem(0).alias("w1"),
            pair_part.getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .persist()  # pair counts + both marginals + total read it
    )
    left = pairs.groupBy("w1").agg(F.sum("n_pair").alias("n_left"))
    right = pairs.groupBy("w2").agg(F.sum("n_pair").alias("n_right"))
    total = pairs.agg(F.sum("n_pair").alias("_n"))
    # Numerator/denominator in DOUBLE: n_pair * N stays BIGINT-safe
    # only while N < ~1e13; at corpus scale (N ~ 1e13, head pair ~
    # 1e10) the product passes 2^63 and ANSI mode raises
    # ARITHMETIC_OVERFLOW. log() is double anyway, so casting first
    # changes nothing at small counts (ADVICE r8). Oracle mirrors
    # with 1.0 * n_pair * _n.
    pmi = F.round(
        F.log(
            F.col("n_pair").cast("double") * F.col("_n")
            / (F.col("n_left").cast("double") * F.col("n_right"))
        ),
        round_to,
    ) + F.lit(0.0)  # fold IEEE -0.0 from a rounded-to-zero PMI
    scored = (
        pairs.filter(F.col("n_pair") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "n_pair", "n_left", "n_right", pmi.alias("pmi"))
    )
    order = [F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()]
    top = scored.orderBy(*order).limit(k)
    from pyspark.sql import Window

    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    vocab_col: str = "token",
    lowercase: bool = True,
) -> DataFrame:
    """Vocabulary coverage / OOV-rate report per group — the
    tokenizer-fit audit run before committing a vocab to a training
    mix (a language whose OOV rate spikes is about to be shredded
    into bytes): one row per ``group_col`` with

    - ``total_tokens`` / ``oov_tokens``  — occurrence-grain counts;
    - ``oov_rate``                        — ``oov_tokens/total_tokens``;
    - ``n_types`` / ``oov_types``         — distinct-token counts;
    - ``oov_type_rate``                   — type-grain rate.

    Scale design: tokens NEVER leave their rows raw — the classic
    word-count shape ``groupBy(group, token)`` (map-side combine
    collapses repeats before the shuffle) reduces the corpus to its
    per-group type table, the vocab joins BROADCAST (a vocabulary is
    ~10^4-10^5 rows by construction), and the final per-group rollup
    is bounded by ``|groups|``. One token-grain shuffle total."""
    toks = _grams(F.col(text_col), 1, lowercase)
    per_type = (
        df.select(F.col(group_col).alias("grp"), F.explode(toks).alias("tok"))
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vv = vocab.select(
        (F.lower(F.col(vocab_col)) if lowercase else F.col(vocab_col))
        .alias("tok"),
        F.lit(True).alias("in_vocab"),
    ).distinct()
    joined = per_type.join(F.broadcast(vv), "tok", "left")
    oov = F.col("in_vocab").isNull()
    return (
        joined.groupBy("grp")
        .agg(
            F.sum("cnt").alias("total_tokens"),
            F.sum(F.when(oov, F.col("cnt")).otherwise(0)).alias("oov_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(oov, 1).otherwise(0)).alias("oov_types"),
        )
        .select(
            F.col("grp").alias(group_col),
            "total_tokens",
            "oov_tokens",
            F.round(F.col("oov_tokens") / F.col("total_tokens"), 6)
            .alias("oov_rate"),
            "n_types",
            "oov_types",
            F.round(F.col("oov_types") / F.col("n_types"), 6)
            .alias("oov_type_rate"),
        )
    )


def token_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer-pressure report per group — the compression-ratio
    audit that complements :func:`vocab_coverage`'s OOV rates: a
    language whose chars-per-token drops toward 1 is being shredded
    into near-byte pieces (high fertility = more compute per word of
    signal). One row per ``group_col`` with

    - ``n_docs`` / ``total_chars`` / ``total_words`` (whitespace) /
      ``total_tokens`` (BPE-ish pre-tokens, :data:`~meta_frame_spark.
      functions.text.BPE_TOKEN_RE`);
    - ``chars_per_token``  — corpus-level compression ratio;
    - ``tokens_per_word``  — fertility (1.0 = every word one token).

    Scale: the counts are per-row codegen expressions (regexp counts,
    no explode — tokens never become rows) feeding ONE map-side
    combined aggregate bounded by the group count. Engine-portable:
    the pre-token regex is RE2-safe, so the DuckDB oracle replays the
    exact counts."""
    from meta_frame_spark.functions.text import (
        bpe_token_count,
        token_count,
    )

    c = F.col(text_col)
    return (
        df.filter(c.isNotNull())
        .groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(c)).alias("total_chars"),
            F.sum(token_count(c)).alias("total_words"),
            F.sum(bpe_token_count(c)).alias("total_tokens"),
        )
        .select(
            group_col,
            "n_docs",
            "total_chars",
            "total_words",
            "total_tokens",
            F.round(F.col("total_chars") / F.col("total_tokens"), 6)
            .alias("chars_per_token"),
            F.round(F.col("total_tokens") / F.col("total_words"), 6)
            .alias("tokens_per_word"),
        )
    )


def coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ks: tuple[int, ...] = (10, 25, 50, 100, 1000),
    n: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Vocabulary coverage CURVE — what fraction of the corpus's token
    occurrences the top-k vocabulary covers, at each k in ``ks``: the
    sizing study behind "how big does the vocab need to be", run
    before committing a tokenizer (the knee of this curve is the
    classic vocab-size pick). One row per k:
    ``(k, vocab_size, covered_occurrences, total_occurrences,
    coverage)`` where ``vocab_size = min(k, |vocab|)``.

    Scale: ONE corpus token-count aggregate (the word-count shape),
    then rank + inclusive prefix sum over the VOCAB table — both via
    the two-phase range-shuffle primitives (`ids.assign_row_numbers`
    / `ids.running_total`), never a single-task global window; the
    grid itself is ``len(ks)+1`` driver scalars (the DoReMi pattern).
    Deterministic: ranking ties break by token text."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive ints, got {ks}")
    from meta_frame_spark.operators.ids import (
        assign_row_numbers,
        running_total,
    )

    counts = token_counts(
        df, text_col=text_col, id_col=id_col, n=n, lowercase=lowercase
    ).withColumn("_neg", -F.col("n_occurrences"))
    ranked = assign_row_numbers(
        counts, order_by=["_neg", "token"], id_col="rank", start=1
    )
    cum = running_total(
        ranked, order_by=["_neg", "token"], value_col="n_occurrences",
        out_col="cum",
    )
    ks_sorted = sorted(set(int(k) for k in ks))
    picks = {
        int(r["rank"]): float(r["cum"])
        for r in cum.filter(F.col("rank").isin(ks_sorted)).collect()
    }  # bounded: <= len(ks) rows
    tot_row = cum.agg(
        F.max("rank").alias("v"), F.max("cum").alias("t")
    ).first()  # bounded: the vocab size and the grand total
    v_size, total = int(tot_row.v or 0), float(tot_row.t or 0.0)
    rows = []
    for k in ks_sorted:
        covered = picks.get(k, total if k >= v_size else 0.0)
        rows.append(
            (
                k,
                min(k, v_size),
                int(covered),
                int(total),
                round(covered / total, 6) if total else 0.0,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "k int, vocab_size int, covered_occurrences long, "
        "total_occurrences long, coverage double",
    )
