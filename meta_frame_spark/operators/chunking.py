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
