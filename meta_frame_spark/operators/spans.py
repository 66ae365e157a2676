"""Cross-document duplicate span detection (sliding token windows).

Not in the reference (SURVEY.md §2 — no text surface); this is the
span-grain member of the dedup family (exact row -> MinHash doc ->
chunk/line -> THIS), after Lee et al., "Deduplicating Training Data
Makes Language Models Better" (arXiv 2107.06499): training corpora are
full of long verbatim spans (boilerplate, licenses, templates) that
doc- and chunk-grain dedup miss because they sit at arbitrary offsets
inside otherwise-distinct documents. Their suffix-array pass finds
arbitrary-length repeats; the scalable Spark approximation is a
fixed-length sliding window — every duplicated span of length >=
``span_tokens`` contains a duplicated window, so fixed windows give
full recall at that grain and a report that is directly groupable.

Scale design:

* tokenization and per-position window keys are pure JVM codegen
  (transform over a sequence + slice + concat_ws + xxhash64) — no
  Python, no UDF;
* the only shuffle is groupBy(window key): ``key="hash"`` (default)
  shuffles 8-byte keys — at 100 TB the span text NEVER moves, exactly
  like the hashed-gram decontamination probe; ``key="text"`` shuffles
  the span string itself — the engine-portable form driver oracles
  compare bit-for-bit (hash grouping is identical iff xxhash64 is
  collision-free on the corpus; at 8 bytes a billion distinct spans
  collide with p ~ 3e-2, so hash mode is a *report* key, not an
  identity proof);
* output is one row per duplicated window (n_docs >= min_docs), linear
  in the duplicated region, never in pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.skew import ensure_min_partitions


def _positions(toks, span_tokens: int):
    """1-based window start positions; EMPTY for docs shorter than the
    span (a bare ``sequence(1, stop)`` with stop < 1 silently produces
    a DESCENDING sequence and garbage windows)."""
    stop = F.size(toks) - F.lit(span_tokens - 1)
    return F.when(stop >= 1, F.sequence(F.lit(1), stop)).otherwise(
        F.array().cast("array<int>")
    )


def duplicate_spans(
    df: DataFrame,
    span_tokens: int = 20,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
) -> DataFrame:
    """Windows of ``span_tokens`` consecutive tokens appearing in at
    least ``min_docs`` distinct documents:
    ``(span_key, n_docs, n_occurrences)``.

    ``key="hash"`` groups on ``xxhash64`` of the window (scale path);
    ``key="text"`` groups on the window text itself (portable/oracle
    path). Documents shorter than ``span_tokens`` contribute nothing.
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if key not in ("hash", "text"):
        raise ValueError(f"key must be 'hash' or 'text', got {key!r}")

    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    span_text = lambda i: F.concat_ws(" ", F.slice(toks, i, span_tokens))  # noqa: E731
    span_key = (
        (lambda i: F.xxhash64(span_text(i))) if key == "hash" else span_text
    )
    windows = ensure_min_partitions(df).select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.transform(_positions(toks, span_tokens), span_key)
        ).alias("span_key"),
    )
    return (
        windows.groupBy("span_key")
        .agg(
            F.count_distinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def _flagged_windows(
    df: DataFrame,
    span_tokens: int,
    min_docs: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared census core: ``(_doc, pos, span_key)`` rows whose window
    is duplicated across >= ``min_docs`` documents. The window frame
    feeds both the dup-key aggregate and the semi-join probe, so it is
    persisted once (released via cache.release_tracked_caches). Both
    the per-doc rollup and the region extraction build on this, so the
    census semantics (tokenizer, hashing, min_docs) cannot drift
    between the report and the cut."""
    from meta_frame_spark.operators.cache import track

    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    windows = track(ensure_min_partitions(df).select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.transform(
                _positions(toks, span_tokens),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, span_tokens))),
            )
        ).alias("_pos0", "span_key"),
    ).select("_doc", (F.col("_pos0") + 1).alias("pos"), "span_key").persist())
    dup_keys = (
        windows.groupBy("span_key")
        .agg(F.count_distinct("_doc").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span_key")
    )
    return windows.join(dup_keys, "span_key", "left_semi")


def docs_with_duplicate_spans(
    df: DataFrame,
    span_tokens: int = 20,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document rollup: how many of a doc's windows are shared with
    other documents — ``(id_col, n_dup_spans)``. The flag side of the
    report: gate or down-weight heavily-boilerplate docs."""
    return (
        _flagged_windows(df, span_tokens, min_docs, id_col, text_col)
        .groupBy(F.col("_doc").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )


def duplicate_span_regions(
    df: DataFrame,
    span_tokens: int = 20,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous duplicated REGIONS per document: merge overlapping /
    adjacent duplicated windows into ``(id_col, start_tok, end_tok)``
    token ranges (1-based, inclusive) — the actionable form of the
    span census: cut these ranges to de-duplicate substrings the way
    Lee et al. remove repeated spans, instead of dropping whole docs.

    Shape: the shared persisted census (:func:`_flagged_windows`) ->
    classic gaps-and-islands per doc: positions sort within the doc
    window, a new island starts when the previous duplicated window
    position is more than ``span_tokens`` away (windows overlap up to
    that distance), islands aggregate to min(start)/max(end). All JVM:
    lag + running sum + groupBy."""
    from pyspark.sql import Window

    flagged = _flagged_windows(df, span_tokens, min_docs, id_col, text_col)

    w = Window.partitionBy("_doc").orderBy("pos")
    islands = (
        flagged.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new_island",
            (F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > span_tokens))
            .cast("int"),
        )
        .withColumn("_island", F.sum("_new_island").over(w))
    )
    return islands.groupBy(F.col("_doc").alias(id_col), "_island").agg(
        F.min("pos").alias("start_tok"),
        (F.max("pos") + F.lit(span_tokens - 1)).alias("end_tok"),
    ).drop("_island")


def remove_duplicate_regions(
    df: DataFrame,
    regions: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Apply the cut: rebuild ``text_col`` with every duplicated token
    range from :func:`duplicate_span_regions` removed. Documents with
    no regions pass through BYTE-IDENTICAL; documents with any region
    come back whitespace-NORMALIZED (tokens re-joined with single
    spaces — newlines/tabs/space-runs outside the cut are collapsed
    too, an inherent property of the token-grain rebuild). Keep
    line/paragraph-structured consumers upstream of the cut, or do
    character-offset surgery outside Spark if byte fidelity matters.

    All JVM: regions aggregate to one array<struct> per doc (tiny —
    regions, not tokens), join back, and a ``filter`` HOF keeps each
    token whose 1-based position falls inside no region. One shuffle
    (the region join); token arrays never leave their rows."""
    out_col = out_col or text_col
    per_doc = regions.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_regions")
    )
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    kept = F.filter(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda x: ~F.exists(
            F.col("_regions"),
            lambda r: (x["i"] >= r["start_tok"]) & (x["i"] <= r["end_tok"]),
        ),
    )
    joined = df.join(per_doc, id_col, "left")
    return joined.withColumn(
        out_col,
        F.when(F.col("_regions").isNull(), F.col(text_col)).otherwise(
            F.concat_ws(" ", F.transform(kept, lambda x: x["t"]))
        ),
    ).drop("_regions")
