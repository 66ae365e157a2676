"""Retrieval evaluation metrics — recall/precision@k, MRR, nDCG.

Not in the reference (no search surface); this is the measurement half
of the search/ANN family (`operators/search.py`, the `ann_topk_*`
tiers): given a ranked result list and a relevance-judgment table
(TREC qrels shape), score each query with the standard public metrics
(Järvelin & Kekäläinen 2002 for nDCG) so index/tier changes are
judged by retrieval quality, not eyeballs.

Scale design: both inputs are row streams keyed by query — the join is
a plain (query, doc) equi-join, the ideal-DCG ranking is a window
partitioned BY QUERY (state = one query's judgments, never global),
and the output is one row per judged query. Nothing here depends on
corpus size beyond the result/qrels tables themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval metrics at cutoff ``k``:
    ``(query_col, n_rel, n_hits, recall_at_k, precision_at_k,
    reciprocal_rank, ndcg_at_k)``.

    ``results`` holds ranked retrievals (``rank_col`` 1-based, one row
    per (query, doc)); ``qrels`` holds graded judgments (``rel_col``
    >= 0, unjudged docs simply absent — they score 0, the TREC
    convention). Only JUDGED queries (present in ``qrels`` with at
    least one positive judgment) are scored; macro-average downstream
    with one ``agg``. nDCG uses the standard
    ``sum(rel / log2(rank + 1))`` gain against the ideal ordering of
    that query's judgments truncated at ``k``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for frame, col, name in (
        (results, rank_col, "results"),
        (qrels, rel_col, "qrels"),
    ):
        if col not in frame.columns:
            raise ValueError(f"{name} is missing column {col!r}")

    topk = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col), F.col(doc_col), F.col(rank_col)
    )
    judged = qrels.filter(F.col(rel_col) > 0)

    # per-query totals + ideal DCG over the best-possible ordering
    # (rel desc within the query, truncated at k) — the window is
    # partitioned by query, so its state is one query's judgments
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(doc_col).asc()
    )
    ideal = (
        judged.withColumn("_irank", F.row_number().over(w))
        .withColumn(
            "_igain",
            F.when(
                F.col("_irank") <= k,
                F.col(rel_col) / F.log2(F.col("_irank") + 1),
            ).otherwise(F.lit(0.0)),
        )
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum("_igain").alias("_idcg"),
        )
    )

    # retrieved-side gains: unjudged docs score 0 via the left join
    hits = (
        topk.join(
            judged.select(query_col, doc_col, rel_col),
            [query_col, doc_col],
            "left",
        )
        .withColumn("_rel", F.coalesce(F.col(rel_col), F.lit(0)))
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("_n_ret"),
            F.sum((F.col("_rel") > 0).cast("int")).alias("n_hits"),
            F.max(
                F.when(
                    F.col("_rel") > 0, 1.0 / F.col(rank_col)
                ).otherwise(F.lit(0.0))
            ).alias("reciprocal_rank"),
            F.sum(
                F.col("_rel") / F.log2(F.col(rank_col) + 1)
            ).alias("_dcg"),
        )
    )

    return (
        ideal.join(hits, query_col, "left")
        .select(
            query_col,
            "n_rel",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0))
                / F.col("n_rel").cast("double"),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce("reciprocal_rank", F.lit(0.0)), 6
            ).alias("reciprocal_rank"),
            F.round(
                F.coalesce("_dcg", F.lit(0.0)) / F.col("_idcg"), 6
            ).alias("ndcg_at_k"),
        )
    )


def _word_grams(col: str, n: int, lowercase: bool):
    """Whitespace-token n-gram array for ``col`` (empty array when the
    text has fewer than ``n`` tokens — never NULL, so downstream
    ``size``/``aggregate`` arithmetic stays total)."""
    text = F.col(col)
    if lowercase:
        text = F.lower(text)
    toks = F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))
    if n == 1:
        return toks
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    built = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return F.when(F.size(toks) >= n, built).otherwise(
        F.array().cast("array<string>")
    )


def _clip_counts_map(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    orders: tuple[int, ...],
    lowercase: bool,
) -> DataFrame:
    """All integer sufficient statistics of ROUGE-N / BLEU in ONE
    Arrow map: the input columns plus ``_ct{n}`` / ``_rt{n}`` (n-gram
    totals per side, floored at 0) and ``_clip{n}`` (multiset-clipped
    overlap) for every requested order.

    Tokenization stays in JVM expressions (``\\S+`` extraction +
    lower), so gram identity is exactly the engine's and the DuckDB
    replay's; the per-row clipped counting runs as hash-map counts in
    the Python worker — O(len) per order instead of the
    O(distinct_c x len) rescan of the expression form, which profiled
    as the whole cost of the BLEU/ROUGE queries. Only INTEGERS cross
    back, so every downstream precision/recall/F/BP double is computed
    by the same JVM expressions as before — bit-identical scores.
    Map-only and stateless, so it compiles onto streaming frames
    unchanged (the stream_rouge path)."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    staged = df.select(
        "*",
        _word_grams(cand_col, 1, lowercase).alias("_tc"),
        _word_grams(ref_col, 1, lowercase).alias("_tr"),
    )
    cols = [f.name for f in df.schema.fields]
    extra = []
    for n in orders:
        extra += [
            StructField(f"_ct{n}", IntegerType()),
            StructField(f"_rt{n}", IntegerType()),
            StructField(f"_clip{n}", IntegerType()),
        ]
    schema = StructType(list(df.schema.fields) + extra)
    ordl = tuple(orders)

    def _counts(batches):
        from collections import Counter

        for pdf in batches:
            m = len(pdf)
            stats = {n: np.zeros((3, m), dtype=np.int32) for n in ordl}
            for i, (tc, tr) in enumerate(zip(pdf["_tc"], pdf["_tr"])):
                tc = [] if tc is None else list(tc)
                tr = [] if tr is None else list(tr)
                for n in ordl:
                    ct = len(tc) - n + 1
                    rt = len(tr) - n + 1
                    ct = ct if ct > 0 else 0
                    rt = rt if rt > 0 else 0
                    clip = 0
                    if ct > 0 and rt > 0:
                        if n == 1:
                            cc = Counter(tc)
                            rc = Counter(tr)
                        else:
                            cc = Counter(
                                tuple(tc[j:j + n]) for j in range(ct)
                            )
                            rc = Counter(
                                tuple(tr[j:j + n]) for j in range(rt)
                            )
                        clip = sum(
                            min(v, rc[g])
                            for g, v in cc.items() if g in rc
                        )
                    s = stats[n]
                    s[0, i] = ct
                    s[1, i] = rt
                    s[2, i] = clip
            out = pdf[cols].copy()
            for n in ordl:
                s = stats[n]
                out[f"_ct{n}"] = s[0]
                out[f"_rt{n}"] = s[1]
                out[f"_clip{n}"] = s[2]
            yield out

    return staged.mapInPandas(_counts, schema)


def bleu_scores(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
    lowercase: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-row sentence BLEU (Papineni et al. 2002) of a candidate
    against a single reference: appends ``bleu_p{1..max_n}`` (modified
    = clipped n-gram precisions, rounded), ``brevity_penalty``, and
    ``bleu`` = BP x geometric mean of the precisions.

    No smoothing (the original corpus-BLEU definition): if any order's
    precision is 0 — including an empty candidate — ``bleu`` is 0.
    Pairs where smoothing matters should score at a lower ``max_n``.
    Brevity penalty = 1 when the candidate is at least reference
    length, else exp(1 - ref_len/cand_len) over order-1 token counts.

    Scale: like ``rouge_n_scores`` this is MAP-ONLY and stream-safe —
    integer gram statistics from one Arrow map
    (:func:`_clip_counts_map`), every double computed by JVM
    expressions from those integers, so DuckDB replays every score in
    the driver oracle. (The n=1 gram total is floored at 0 where the
    old ``size(NULL array)`` was -1; both values take identical
    branches in every consuming expression — ``> 0`` / ``>=`` tests
    with a non-negative other side — so scores are unchanged.)"""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    for col in (cand_col, ref_col):
        if col not in df.columns:
            raise ValueError(f"bleu_scores: missing column {col!r}")

    orders = tuple(range(1, max_n + 1))
    out = _clip_counts_map(df, cand_col, ref_col, orders, lowercase)
    prec_cols = []
    for n in orders:
        p = F.when(
            F.col(f"_ct{n}") > 0,
            F.col(f"_clip{n}") / F.col(f"_ct{n}").cast("double"),
        ).otherwise(F.lit(0.0))
        out = out.withColumn(f"bleu_p{n}", F.round(p, round_to))
        prec_cols.append(F.col(f"bleu_p{n}"))

    c_len = F.col("_ct1").cast("double")
    r_len = F.col("_rt1").cast("double")
    bp = F.when(c_len >= r_len, F.lit(1.0)).when(
        c_len > 0, F.exp(F.lit(1.0) - r_len / c_len)
    ).otherwise(F.lit(0.0))
    out = out.withColumn("brevity_penalty", F.round(bp, round_to))

    prod = prec_cols[0]
    for p in prec_cols[1:]:
        prod = prod * p
    bleu = F.when(
        prod > 0,
        F.col("brevity_penalty")
        * F.pow(prod, F.lit(1.0 / max_n)),
    ).otherwise(F.lit(0.0))
    out = out.withColumn("bleu", F.round(bleu, round_to))
    for n in orders:
        out = out.drop(f"_ct{n}", f"_rt{n}", f"_clip{n}")
    return out


def chrf_scores(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 6,
    beta: float = 2.0,
    lowercase: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-row chrF (Popović 2015): character n-gram F-beta between a
    candidate and a reference — ``(id_col, chrf_p, chrf_r, chrf)``.
    ``chrf_p``/``chrf_r`` are the arithmetic means over orders
    ``1..max_n`` of the clipped char-n-gram precision/recall
    (whitespace stripped first, the chrF convention); ``chrf`` is
    their F-beta (beta=2 weights recall, the published default). An
    order where a side has no grams scores 0 for that side's ratio.
    One output row per INPUT row (ADVICE r14): duplicate ``id_col``
    values each score independently — the pre-r14 explode shape
    pooled gram counts across same-id rows into one grouped row;
    callers needing per-id pooling should pre-aggregate to one
    (candidate, reference) pair per id.

    Scale design — MAP-ONLY: normalization (lowercase + whitespace
    strip) stays in JVM expressions so gram identity matches the
    DuckDB replay exactly, then ONE Arrow ``mapInPandas`` computes
    every order's clipped overlap per row with numpy sort-and-count
    (utf-32 code-point windows -> np.unique run groups -> bincount
    per side -> sum of mins), O(L log L) per row, zero shuffles, no
    join. This replaced the explode-count shape (both sides' grams at
    orders 1..6 exploded to (id, n, side, gram) rows — ~12x corpus
    bytes through one hash aggregate) after measurement: the clipped
    counts are a PER-ROW reduction, so shuffling every gram
    occurrence buys nothing a per-row sort doesn't, and the explode
    was the whole cost of the query. Totals per order are
    ``len - n + 1`` arithmetic, not data; precision/recall division
    and the final rounding/F-beta run in the same JVM expressions as
    before, so scores are bit-identical to the DuckDB replay."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    if beta <= 0:
        raise ValueError(f"beta must be > 0, got {beta}")
    for col in (cand_col, ref_col):
        if col not in df.columns:
            raise ValueError(f"chrf_scores: missing column {col!r}")

    def stripped(col: str):
        text = F.col(col)
        if lowercase:
            text = F.lower(text)
        return F.regexp_replace(text, r"\s+", "")

    base = df.select(
        F.col(id_col),
        stripped(cand_col).alias("_c"),
        stripped(ref_col).alias("_r"),
    )

    import numpy as np
    import pandas as pd

    orders = list(range(1, max_n + 1))

    def _codes(s):
        # utf-32 view = one element per code point, matching the JVM
        # substr gram identity (the shipped corpora are BMP text; a
        # pair of astral strings still agrees side-to-side because
        # both sides window the same representation)
        if not s:
            return None
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    def _clip_sums(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            sp = np.zeros(len(pdf))
            sr = np.zeros(len(pdf))
            for i, (c, r) in enumerate(zip(pdf["_c"], pdf["_r"])):
                cc = _codes(c)
                rc = _codes(r)
                p_sum = 0.0
                r_sum = 0.0
                for n in orders:
                    ct = len(cc) - n + 1 if cc is not None else 0
                    rt = len(rc) - n + 1 if rc is not None else 0
                    if ct > 0 and rt > 0:
                        wc = sliding_window_view(cc, n)
                        wr = sliding_window_view(rc, n)
                        keys = np.concatenate([wc, wr]).view(f"V{4 * n}")
                        _, inv = np.unique(keys.ravel(), return_inverse=True)
                        c_cnt = np.bincount(inv[:ct])
                        r_cnt = np.bincount(inv[ct:], minlength=len(c_cnt))
                        clip = int(
                            np.minimum(c_cnt, r_cnt[: len(c_cnt)]).sum()
                        )
                        # exact IEEE divisions, summed in fixed order
                        # 1..max_n (a <= 6-term double sum; the DuckDB
                        # replay agrees to round_to decimals)
                        p_sum += clip / ct
                        r_sum += clip / rt
                sp[i] = p_sum
                sr[i] = r_sum
            yield pd.DataFrame({id_col: pdf[id_col], "_sp": sp, "_sr": sr})

    id_type = df.schema[id_col].dataType.simpleString()
    b2 = beta * beta
    out = (
        base.mapInPandas(
            _clip_sums, f"{id_col} {id_type}, _sp double, _sr double"
        )
        .select(
            F.col(id_col),
            F.round(F.col("_sp") / F.lit(float(max_n)), round_to).alias(
                "chrf_p"
            ),
            F.round(F.col("_sr") / F.lit(float(max_n)), round_to).alias(
                "chrf_r"
            ),
        )
    )
    fscore = F.when(
        (b2 * F.col("chrf_p") + F.col("chrf_r")) > 0,
        (1 + b2)
        * F.col("chrf_p")
        * F.col("chrf_r")
        / (b2 * F.col("chrf_p") + F.col("chrf_r")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("chrf", F.round(fscore, round_to))


def rouge_n_scores(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    ns: tuple[int, ...] = (1, 2),
    lowercase: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-row ROUGE-N between a candidate and a reference text (Lin
    2004, the standard summarization/generation overlap metric —
    in a data pipeline it scores near-duplicate summaries, judges
    extractive compressions, and audits decontamination by n-gram
    recall): appends ``rouge{n}_p`` / ``rouge{n}_r`` / ``rouge{n}_f``
    for each requested order.

    Definition (multiset, clipped): overlap = Σ over distinct
    candidate n-grams of min(count_in_candidate, count_in_reference);
    precision = overlap / |candidate grams|, recall = overlap /
    |reference grams|, F1 their harmonic mean; empty-gram sides score
    0 by convention (not NULL — a pair with an empty side is a real
    0-overlap observation).

    Scale: MAP-ONLY and stream-safe — integer gram statistics from
    one Arrow map (:func:`_clip_counts_map`, hash-map counting,
    O(len) per order instead of the O(distinct_c × len_c) rescans of
    the expression form), every precision/recall/F double computed by
    JVM expressions from those integers; engine-portable (DuckDB
    spells the identical chain, so a full oracle replays every
    score). The n=1 gram total is floored at 0 where ``size(NULL
    array)`` was -1 — identical branches either way (see
    ``bleu_scores``)."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be positive n-gram orders, got {ns}")

    out = _clip_counts_map(df, cand_col, ref_col, tuple(ns), lowercase)
    for n in ns:
        p = F.when(
            F.col(f"_ct{n}") > 0,
            F.col(f"_clip{n}") / F.col(f"_ct{n}").cast("double"),
        ).otherwise(F.lit(0.0))
        r = F.when(
            F.col(f"_rt{n}") > 0,
            F.col(f"_clip{n}") / F.col(f"_rt{n}").cast("double"),
        ).otherwise(F.lit(0.0))
        out = (
            out.withColumn(f"rouge{n}_p", F.round(p, round_to))
            .withColumn(f"rouge{n}_r", F.round(r, round_to))
        )
        f1 = F.when(
            (F.col(f"rouge{n}_p") + F.col(f"rouge{n}_r")) > 0,
            2 * F.col(f"rouge{n}_p") * F.col(f"rouge{n}_r")
            / (F.col(f"rouge{n}_p") + F.col(f"rouge{n}_r")),
        ).otherwise(F.lit(0.0))
        out = out.withColumn(f"rouge{n}_f", F.round(f1, round_to))
        out = out.drop(f"_ct{n}", f"_rt{n}", f"_clip{n}")
    return out


def self_bleu_probe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_size: int = 60,
    max_n: int = 2,
    lowercase: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Corpus diversity probe via pairwise self-BLEU (Zhu et al. 2018,
    Texygen — high self-BLEU = mode collapse / templated text): draw a
    DETERMINISTIC sample (lowest md5(id) order, reproducible across
    engines and partitionings), score every ordered pair (cand, ref)
    of distinct sampled docs with unsmoothed BLEU, and return per-doc
    means ``(id_col, n_refs, self_bleu)``. This is the pairwise-mean
    variant (each reference scored separately, then averaged) — not
    multi-reference clipping.

    Scale: the corpus is touched once by a top-``sample_size``
    selection (TakeOrdered, no full sort); inside the sample the
    pairwise clipped overlaps run as an INVERTED-INDEX self-join —
    per-doc (order, gram) counts joined on the gram key, so only
    co-occurring grams ever pair up and the arithmetic per pair is a
    grouped sum of ``least(count_a, count_b)``, never a per-row
    array scan. Same numbers as scoring each pair with
    :func:`bleu_scores` (identical clip/rounding arithmetic), but
    the codegen stays small and the cost scales with vocabulary
    overlap rather than s^2 x len^2 — the shape that still works at
    sample_size=10_000."""
    if sample_size < 2:
        raise ValueError(f"sample_size must be >= 2, got {sample_size}")
    sample = (
        df.select(
            F.col(id_col), F.col(text_col),
            F.md5(F.concat_ws(":", F.col(id_col), F.lit("sb"))).alias("_h"),
        )
        .orderBy("_h")
        .limit(sample_size)
        .drop("_h")
    )

    # per-doc (order, gram) counts — one explode pass over all orders
    order_arrays = []
    for n in range(1, max_n + 1):
        grams = _word_grams(text_col, n, lowercase)

        def tag(order: int):
            return lambda g: F.struct(
                F.lit(order).alias("n"), g.alias("gram")
            )

        order_arrays.append(F.transform(grams, tag(n)))
    docgram = (
        sample.select(
            F.col(id_col).alias("_id"),
            F.explode(F.flatten(F.array(*order_arrays))).alias("_g"),
        )
        .select("_id", F.col("_g.n").alias("_n"), F.col("_g.gram").alias("_gram"))
        .groupBy("_id", "_n", "_gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    lens = docgram.groupBy("_id", "_n").agg(F.sum("_c").alias("_len"))

    # inverted-index clip: only co-occurring grams pair up
    ga = docgram.select(
        F.col("_id").alias("_ida"), "_n", "_gram", F.col("_c").alias("_caa")
    )
    gb = docgram.select(
        F.col("_id").alias("_idb"), "_n", "_gram", F.col("_c").alias("_cbb")
    )
    clip = (
        ga.join(gb, ["_n", "_gram"])
        .filter(F.col("_ida") != F.col("_idb"))
        .groupBy("_ida", "_idb", "_n")
        .agg(F.sum(F.least("_caa", "_cbb")).alias("_clip"))
    )

    # full (pair x order) spine so gram-less orders score p = 0
    ids = sample.select(F.col(id_col).alias("_id"))
    order_col = F.explode(
        F.array(*[F.lit(n) for n in range(1, max_n + 1)])
    )
    spine = (
        ids.select(F.col("_id").alias("_ida"))
        .crossJoin(ids.select(F.col("_id").alias("_idb")))
        .filter(F.col("_ida") != F.col("_idb"))
        .select("_ida", "_idb", order_col.alias("_n"))
    )
    la = lens.select(
        F.col("_id").alias("_ida"), "_n", F.col("_len").alias("_la")
    )
    lb = lens.select(
        F.col("_id").alias("_idb"), "_n", F.col("_len").alias("_lb")
    )
    joined = (
        spine.join(la, ["_ida", "_n"], "left")
        .join(lb, ["_idb", "_n"], "left")
        .join(clip, ["_ida", "_idb", "_n"], "left")
        .select(
            "_ida", "_idb", "_n",
            F.coalesce("_la", F.lit(0)).alias("_la"),
            F.coalesce("_lb", F.lit(0)).alias("_lb"),
            F.coalesce("_clip", F.lit(0)).alias("_clip"),
        )
    )
    p = F.when(
        F.col("_la") > 0,
        F.round(F.col("_clip") / F.col("_la").cast("double"), round_to),
    ).otherwise(F.lit(0.0))
    wide = joined.withColumn("_p", p).groupBy("_ida", "_idb").agg(
        *[
            F.max(F.when(F.col("_n") == n, F.col("_p"))).alias(f"_p{n}")
            for n in range(1, max_n + 1)
        ],
        F.max(F.when(F.col("_n") == 1, F.col("_la"))).alias("_clen"),
        F.max(F.when(F.col("_n") == 1, F.col("_lb"))).alias("_rlen"),
    )
    bp = F.when(
        F.col("_clen") >= F.col("_rlen"), F.lit(1.0)
    ).when(
        F.col("_clen") > 0,
        F.round(
            F.exp(
                F.lit(1.0)
                - F.col("_rlen") / F.col("_clen").cast("double")
            ),
            round_to,
        ),
    ).otherwise(F.lit(0.0))
    prod = F.col("_p1")
    for n in range(2, max_n + 1):
        prod = prod * F.col(f"_p{n}")
    scored = wide.withColumn("_bp", bp).withColumn(
        "_bleu",
        F.when(
            prod > 0,
            F.round(F.col("_bp") * F.pow(prod, F.lit(1.0 / max_n)), round_to),
        ).otherwise(F.lit(0.0)),
    )
    return scored.groupBy(F.col("_ida").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.round(F.avg("_bleu"), round_to).alias("self_bleu"),
    )
