"""Document chunking with overlap (training-window extraction).

Not in the reference (SURVEY.md §2); this is the step between a clean
corpus and a tokenizer: split every document into fixed-width token
windows with a configurable stride (``stride < chunk_tokens`` gives
overlapping windows, the standard long-context training recipe), each
chunk carrying its document id and position for lineage.

Scale design (100 TB corpus):

* Entirely JVM-side built-ins (``split`` / ``sequence`` /
  ``transform`` / ``posexplode``) — one whole-stage-codegen map, NO
  shuffle, no Python. Output row count is
  ``ceil(max(n_tokens - chunk + stride, 1) / stride)`` per doc, so the
  explode fans out within each task and downstream stages see the
  already-partitioned chunk stream.
* Pair with ``sinks.write_compacted`` when materializing: the fan-out
  multiplies bytes by ~``chunk/stride``; per-file row caps keep the
  output layout scan-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
    drop_partial: bool = False,
) -> DataFrame:
    """Explode each document into token windows:
    ``(id_col, chunk_idx, chunk_text, n_tokens)`` where window *i*
    covers tokens ``[i*stride, i*stride + chunk_tokens)``.

    ``stride`` defaults to ``chunk_tokens`` (non-overlapping).
    ``drop_partial=True`` keeps only full-width windows (the usual
    choice when chunks feed a fixed-shape trainer); the default keeps
    the ragged tail so no text is lost.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = stride if stride is not None else chunk_tokens
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(f"stride must be in [1, chunk_tokens], got {stride}")

    toks = tokens(text_col)
    n = F.size(toks)
    # number of windows: every start s = i*stride with s < n, except
    # that trailing windows fully contained in the previous one are
    # dropped (they add no new tokens): starts s <= n - chunk, plus
    # one ragged tail if n is not on the stride grid. Empty text (n=0)
    # still yields one empty chunk so the document is never lost.
    n_full = F.when(
        n >= chunk_tokens, F.floor((n - chunk_tokens) / stride) + 1
    ).otherwise(F.lit(0)).cast("int")
    covered = (n_full - 1) * stride + chunk_tokens
    if drop_partial:
        n_windows = n_full
    else:
        n_windows = (
            n_full
            + F.when((n_full > 0) & (covered < n), 1)
            .when(n_full == 0, 1)
            .otherwise(0)
        )

    # sequence(0, -1) would count DOWN — emit an empty array instead
    # (posexplode then drops the row, the drop_partial contract for
    # docs shorter than one chunk)
    starts = F.when(
        n_windows > 0, F.sequence(F.lit(0), n_windows - 1)
    ).otherwise(F.array().cast("array<int>"))
    windows = F.transform(
        starts,
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)),
    )
    out = df.select(
        F.col(id_col),
        *(keep_cols or []),
        F.posexplode(windows).alias("chunk_idx", "chunk_text"),
    )
    return out.withColumn(
        "chunk_n_tokens", F.size(tokens(F.col("chunk_text")))
    )


def _passage_windows(
    text_col: str,
    n_sentences: int,
    stride: int | None,
    drop_partial: bool,
) -> "F.Column":
    """array<struct<p: string, k: int>> of sentence windows — the
    shared in-row builder behind :func:`sentence_passages` (explode
    grain) and :func:`passage_pairs` (in-row pair grain). Window *i*
    covers sentences ``[i*stride, i*stride + n_sentences)`` of the
    frozen segmentation; trailing windows adding no new sentence are
    dropped; the ragged tail is kept unless ``drop_partial``; docs
    with zero sentences yield an empty array."""
    from meta_frame_spark.functions.text import split_sentences

    if n_sentences < 1:
        raise ValueError(f"n_sentences must be >= 1, got {n_sentences}")
    stride = stride if stride is not None else n_sentences
    if not 1 <= stride <= n_sentences:
        raise ValueError(f"stride must be in [1, n_sentences], got {stride}")

    sents = split_sentences(F.col(text_col))
    n = F.size(sents)
    n_full = F.when(
        n >= n_sentences, F.floor((n - n_sentences) / stride) + 1
    ).otherwise(F.lit(0)).cast("int")
    covered = (n_full - 1) * stride + n_sentences
    if drop_partial:
        n_windows = n_full
    else:
        # docs with zero sentences yield zero passages (unlike the
        # token chunker's empty-chunk row: a sentenceless doc has no
        # retrieval grain to preserve)
        n_windows = (
            n_full
            + F.when((n_full > 0) & (covered < n), 1)
            .when((n_full == 0) & (n > 0), 1)
            .otherwise(0)
        )
    starts = F.when(
        n_windows > 0, F.sequence(F.lit(0), n_windows - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda i: F.struct(
            F.array_join(
                F.slice(sents, i * stride + 1, n_sentences), " "
            ).alias("p"),
            F.least(n - i * stride, F.lit(n_sentences)).alias("k"),
        ),
    )


def sentence_passages(
    df: DataFrame,
    n_sentences: int = 3,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
    drop_partial: bool = False,
) -> DataFrame:
    """Sentence-ALIGNED overlapping passages — the retrieval/RAG
    training grain, where windows that cut mid-sentence hurt both
    embedding quality and answer extraction. Each document's frozen
    sentence segmentation (``functions.text.split_sentences`` —
    ``[.!?]``-run splits, trimmed, empties dropped) is windowed
    exactly like :func:`chunk_documents` windows tokens: passage *i*
    covers sentences ``[i*stride, i*stride + n_sentences)``, trailing
    windows adding no new sentence are dropped, and the ragged tail
    is kept unless ``drop_partial``.

    Output: ``(id_col, *keep_cols, passage_idx, passage,
    passage_n_sentences, passage_n_tokens)``. Same scale shape as
    chunk_documents: one whole-stage-codegen map (``sequence`` /
    ``transform`` / ``slice`` / ``posexplode``), NO shuffle, no
    Python; fan-out ~``n_sentences/stride``x within each task."""
    from meta_frame_spark.functions.text import tokens

    windows = _passage_windows(text_col, n_sentences, stride, drop_partial)
    out = df.select(
        F.col(id_col),
        *(keep_cols or []),
        F.posexplode(windows).alias("passage_idx", "_w"),
    )
    return out.select(
        "*",
        F.col("_w.p").alias("passage"),
        F.col("_w.k").alias("passage_n_sentences"),
        F.size(tokens(F.col("_w.p"))).alias("passage_n_tokens"),
    ).drop("_w")


def passage_pairs(
    df: DataFrame,
    n_sentences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-passage POSITIVE pairs for contrastive retriever
    training (the Contriever recipe's within-document cropping,
    Izacard et al. 2022: two spans of the same document form a
    positive; in-batch others are negatives): disjoint
    ``n_sentences``-sentence passages of each document, paired with
    their immediate successor — ``(id_col, pair_idx, anchor,
    positive)``, one row per adjacent pair, documents with fewer
    than two passages contribute nothing.

    Scale: the passage windows AND the pairing are built in-row
    (``transform`` over the shared window array — the pair never
    exists as two rows that must meet), so the whole op is one
    codegen map with a ~1x fan-out: NO shuffle, no join, no Python.
    """
    windows = _passage_windows(
        text_col, n_sentences, n_sentences, drop_partial=False
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(windows) - 2),
        lambda i: F.struct(
            F.element_at(windows, i + 1)["p"].alias("a"),
            F.element_at(windows, i + 2)["p"].alias("b"),
        ),
    )
    guarded = F.when(F.size(windows) >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )
    return df.select(
        F.col(id_col),
        F.posexplode(guarded).alias("pair_idx", "_pr"),
    ).select(
        id_col, "pair_idx",
        F.col("_pr.a").alias("anchor"),
        F.col("_pr.b").alias("positive"),
    )


def ict_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = 2,
) -> DataFrame:
    """Inverse Cloze Task pairs (Lee et al. 2019, ORQA): pick one
    sentence of each document as the pseudo-QUERY and the remaining
    sentences (in order) as the pseudo-evidence CONTEXT — the
    classic zero-label pretraining pair for dense retrievers. The
    "random" pick is the deterministic md5 argmax over
    ``md5(doc_id || ':' || sentence_idx)`` (the repo's portable-coin
    convention), so reruns, partitionings, and the DuckDB oracle all
    pick the same sentence; ties cannot occur (digests are distinct
    inputs). Documents with fewer than ``min_sentences`` sentences
    are dropped, and so are NULL-``id_col`` rows — a null id would
    null every digest and degrade the pick to the index tiebreak,
    silently breaking the portable-coin contract, so they are
    excluded like the too-short documents rather than kept with a
    biased pick. Output: ``(id_col, n_sentences, query_idx, query,
    context)``.

    Scale: one codegen map — the pick is an in-row ``array_max``
    over (digest, idx) structs and the context an in-row
    filter-by-index + join; no shuffle, no Python."""
    from meta_frame_spark.functions.text import split_sentences

    if min_sentences < 2:
        raise ValueError(
            f"min_sentences must be >= 2, got {min_sentences}"
        )
    sents = split_sentences(F.col(text_col))
    n = F.size(sents)
    idx = F.sequence(F.lit(0), n - 1)
    keyed = F.transform(
        idx,
        lambda i: F.struct(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":"),
                    i.cast("string"),
                )
            ).alias("h"),
            i.alias("i"),
        ),
    )
    best = F.array_max(keyed)["i"]
    context = F.array_join(
        F.filter(sents, lambda s, j: j != best), " "
    )
    return (
        df.filter(F.col(id_col).isNotNull() & (n >= min_sentences))
        .select(
            F.col(id_col),
            n.alias("n_sentences"),
            best.alias("query_idx"),
            F.element_at(sents, best + 1).alias("query"),
            context.alias("context"),
        )
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_rate: float = 0.15,
    max_tokens: int = 4096,
    truncate: bool = False,
) -> DataFrame:
    """T5-style span-corruption examples (Raffel et al. 2020 §3.1.4:
    drop token spans, replace each span with a numbered sentinel, emit
    the dropped spans as the target): per token the deterministic
    md5 coin (``md5(doc_id:idx)`` first 8 hex over 2^32 — the repo's
    portable-coin convention) marks it masked with probability
    ``mask_rate``; CONSECUTIVE masked tokens collapse into one
    ``<extra_id_K>`` sentinel (K counts spans left-to-right), the
    target lists each sentinel followed by its span's tokens, and —
    per the T5 target format — the target ends with the terminal
    sentinel ``<extra_id_n_spans>`` whenever at least one span was
    dropped. Output: ``(id_col, input_text, target_text, n_tokens,
    n_masked, n_spans)``; empty docs are dropped.

    Corruption model: the mask is an i.i.d. PER-TOKEN coin, so span
    lengths are geometric with mean ``1/(1-mask_rate)`` (~1.2 at the
    0.15 default) — a documented variant of T5's span-level sampling
    (mean span length 3). The sentinel numbering, collapse, and
    target layout follow the paper exactly.

    Scale: one codegen map, no shuffle, no Python — a SINGLE
    ``aggregate`` scan over the token indices carries
    (input pieces, target pieces, span count, masked count,
    previous-token-masked) as one accumulator struct, so every
    subexpression appears once in the plan (the index-HOF formulation
    re-inlines the mask/run arrays into each other and blows up
    Catalyst compile time). The per-step array append is O(n) copy —
    O(n²) per row — so run this AFTER :func:`chunk_documents` bounds
    the token count, which is where span corruption sits in a real T5
    pipeline anyway (windows first, then corruption). That precondition
    is ENFORCED: a document over ``max_tokens`` tokens raises at run
    time (fail-loud, the repo convention) unless ``truncate=True``
    opts into processing only the first ``max_tokens`` tokens."""
    from meta_frame_spark.functions.text import tokens

    if not 0.0 < mask_rate < 1.0:
        raise ValueError(f"mask_rate must be in (0, 1), got {mask_rate}")
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be > 0, got {max_tokens}")
    raw = tokens(text_col)
    if truncate:
        toks = F.slice(raw, 1, max_tokens)
    else:
        # fail-loud guard against unchunked inputs: the accumulator
        # append is O(n²) per row, so a stray 100k-token page would
        # quietly burn quadratic time inside one task. assert_true
        # returns NULL on pass, so fusing it into the token array
        # keeps the check in the plan without an extra column.
        # coalesce: NULL text -> NULL size -> pass the guard here and
        # drop at the n > 0 filter like every other empty doc
        ok = F.assert_true(
            F.coalesce(F.size(raw) <= max_tokens, F.lit(True)),
            F.concat(
                F.lit(
                    "span_corruption: document exceeds max_tokens="
                    f"{max_tokens} ("
                ),
                F.size(raw).cast("string"),
                F.lit(
                    " tokens); run chunk_documents first or pass "
                    "truncate=True"
                ),
            ),
        )
        toks = F.when(ok.isNull(), raw)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - 1)
    empty = F.array().cast("array<string>")
    init = F.struct(
        empty.alias("inp"),
        empty.alias("tgt"),
        F.lit(0).alias("k"),
        F.lit(0).alias("nm"),
        F.lit(False).alias("prev"),
    )

    def step(acc, i):
        tok = F.element_at(toks, i + 1)
        h8 = F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), i.cast("string")
                )
            ),
            1, 8,
        )
        m = (
            F.conv(h8, 16, 10).cast("double") / F.lit(float(2**32))
        ) < F.lit(float(mask_rate))
        start = m & ~acc["prev"]
        sent = F.concat(
            F.lit("<extra_id_"), acc["k"].cast("string"), F.lit(">")
        )
        return F.struct(
            F.when(~m, F.concat(acc["inp"], F.array(tok)))
            .when(start, F.concat(acc["inp"], F.array(sent)))
            .otherwise(acc["inp"])
            .alias("inp"),
            F.when(
                start,
                F.concat(
                    acc["tgt"], F.array(F.concat(sent, F.lit(" "), tok))
                ),
            )
            .when(m, F.concat(acc["tgt"], F.array(tok)))
            .otherwise(acc["tgt"])
            .alias("tgt"),
            (acc["k"] + start.cast("int")).alias("k"),
            (acc["nm"] + m.cast("int")).alias("nm"),
            m.alias("prev"),
        )

    acc = F.aggregate(idx, init, step)
    # T5 target format: terminate the target with the final sentinel
    # <extra_id_n_spans> whenever any span was dropped
    terminal = F.concat(
        F.lit("<extra_id_"), acc["k"].cast("string"), F.lit(">")
    )
    tgt = F.when(
        acc["k"] > 0, F.concat(acc["tgt"], F.array(terminal))
    ).otherwise(acc["tgt"])
    return df.filter(n > 0).select(
        F.col(id_col),
        F.array_join(acc["inp"], " ").alias("input_text"),
        F.array_join(tgt, " ").alias("target_text"),
        n.alias("n_tokens"),
        acc["nm"].alias("n_masked"),
        acc["k"].alias("n_spans"),
    )


def fim_examples(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate: float = 0.9,
    mode: str = "psm",
    pre_token: str = "<fim_prefix>",
    mid_token: str = "<fim_middle>",
    suf_token: str = "<fim_suffix>",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    with probability ``fim_rate`` split the document's whitespace
    tokens at two uniform cut points into (prefix, middle, suffix)
    and emit the sentinel-delimited FIM layout —

    * ``mode='psm'``: ``<PRE> prefix <SUF> suffix <MID> middle``
    * ``mode='spm'``: ``<PRE> <SUF> suffix <MID> prefix middle``
      (the paper's SPM variant, §D) —

    else emit the plain token stream (the AR fraction the paper keeps
    for left-to-right capability). All three coins are the repo's
    portable md5 convention (``md5(doc_id ':fim'[':a'|':b']``, first
    8 hex over 2^32), so reruns, partitionings, and the DuckDB oracle
    replay every split byte-exactly; cut points are
    ``floor(u * (n_tokens + 1))`` each, low/high ordered, so empty
    prefix/middle/suffix are all reachable exactly as in the paper's
    character-level splitting. Output: ``(id_col, fim_applied,
    input_text, n_tokens, prefix_len, middle_len, suffix_len)``
    (token counts; NULL when not applied). Empty/NULL docs drop, and
    so do NULL-``id_col`` rows — ``concat_ws`` skips NULLs, so every
    null-id row would share one identical md5 coin stream (same
    apply/cut decisions corpus-wide), which is never what a caller
    wants; mirror of the ``ict_pairs`` null-id rule.

    Note ``input_text`` for the AR fraction is the space-joined token
    stream — whitespace-normalized, like every token-grain op here.

    Scale: pure map — per-row slices over one shared token array, no
    shuffle, no Python, no data movement at any corpus size."""
    from meta_frame_spark.functions.text import tokens

    if not 0.0 <= fim_rate <= 1.0:
        raise ValueError(f"fim_rate must be in [0, 1], got {fim_rate}")
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    toks = tokens(text_col)
    n = F.size(toks)

    def coin(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col(id_col).cast("string"), F.lit(tag)
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("double")
            / F.lit(float(2**32))
        )

    applied = coin("fim") < F.lit(float(fim_rate))
    c1 = F.floor(coin("fim:a") * (n + 1)).cast("int")
    c2 = F.floor(coin("fim:b") * (n + 1)).cast("int")
    i = F.least(c1, c2)
    j = F.greatest(c1, c2)
    prefix = F.array_join(F.slice(toks, 1, i), " ")
    middle = F.array_join(F.slice(toks, i + 1, j - i), " ")
    suffix = F.array_join(F.slice(toks, j + 1, n - j), " ")
    if mode == "psm":
        fim_text = F.concat(
            F.lit(pre_token), prefix, F.lit(suf_token), suffix,
            F.lit(mid_token), middle,
        )
    else:
        # SPM continues prefix -> middle as ONE contiguous span (the
        # paper's point: no sentinel between them), so at token grain
        # they rejoin with the normal separator: tokens [0, j)
        fim_text = F.concat(
            F.lit(pre_token), F.lit(suf_token), suffix,
            F.lit(mid_token), F.array_join(F.slice(toks, 1, j), " "),
        )
    null_int = F.lit(None).cast("int")
    return df.filter(F.col(id_col).isNotNull() & (n > 0)).select(
        F.col(id_col),
        applied.alias("fim_applied"),
        F.when(applied, fim_text)
        .otherwise(F.array_join(toks, " "))
        .alias("input_text"),
        n.alias("n_tokens"),
        F.when(applied, i).otherwise(null_int).alias("prefix_len"),
        F.when(applied, j - i).otherwise(null_int).alias("middle_len"),
        F.when(applied, n - j).otherwise(null_int).alias("suffix_len"),
    )
