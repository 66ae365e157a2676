"""Sub-document (line / chunk) exact deduplication.

Not in the reference (SURVEY.md §2 — its surface stops at
group/agg/join); this is the C4 / Dolma corpus-hygiene step: a line
(boilerplate header, cookie banner, license block) that repeats across
many documents is removed from every document *in place*, leaving the
rest of each document intact — document-level dedup cannot catch it.

Units are either real lines (``delimiter_re`` split) or fixed-width
token chunks (``chunk_tokens``) for corpora without line structure.

Scale design (100 TB corpus):

* The repeated-unit census groups by ``xxhash64(unit)`` — 8 bytes per
  unit cross the shuffle, never the unit text. 64-bit collisions at
  corpus scale would need ~2^32 distinct units to matter and at worst
  drop one innocent unit.
* Flagged hashes (units above ``max_occurrences``) are a tiny
  fraction of distinct units — broadcast back, so pass 2 is the
  exploded corpus side joined map-only, then ONE groupBy on the doc id
  to reassemble texts. Two shuffles total (census + reassembly).
* Reassembly keeps per-unit position and sorts the collected array
  driver-free (``array_sort`` of (pos, unit) structs) — no window, no
  per-doc Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meta_frame_spark.operators.skew import ensure_min_partitions


def _units(text_col: str, delimiter_re: str | None, chunk_tokens: int | None) -> Column:
    """array<string> of dedup units for one document."""
    if (delimiter_re is None) == (chunk_tokens is None):
        raise ValueError("pass exactly one of delimiter_re / chunk_tokens")
    if delimiter_re is not None:
        return F.split(F.col(text_col), delimiter_re)
    tokens = F.split(F.lower(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(tokens) / F.lit(chunk_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.concat_ws(
            " ", F.slice(tokens, i * chunk_tokens + 1, chunk_tokens)
        ),
    )


def repeated_units(
    df: DataFrame,
    text_col: str = "text",
    delimiter_re: str | None = None,
    chunk_tokens: int | None = None,
    max_occurrences: int = 1,
) -> DataFrame:
    """Census pass: ``(unit_hash, n_occurrences)`` for every unit
    occurring more than ``max_occurrences`` times corpus-wide
    (occurrences, not documents — a unit repeated inside one doc
    counts each time, the C4 rule)."""
    units = _units(text_col, delimiter_re, chunk_tokens)
    return (
        ensure_min_partitions(df).select(F.explode(units).alias("_u"))
        .select(F.xxhash64("_u").alias("unit_hash"))
        .groupBy("unit_hash")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > max_occurrences)
    )


def dedup_units(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter_re: str | None = None,
    chunk_tokens: int | None = None,
    max_occurrences: int = 1,
    join_str: str = " ",
) -> DataFrame:
    """Remove every over-repeated unit from every document. Returns
    ``(id_col, clean_text, n_kept, n_dropped)`` — documents made
    entirely of boilerplate come back with empty ``clean_text`` and
    ``n_kept = 0``, so downstream length gates can drop them.
    """
    df = ensure_min_partitions(df)  # once; the census pass sees it too
    flagged = repeated_units(
        df, text_col, delimiter_re, chunk_tokens, max_occurrences
    )
    units = _units(text_col, delimiter_re, chunk_tokens)
    exploded = df.select(
        F.col(id_col), F.posexplode(units).alias("pos", "_u")
    ).withColumn("unit_hash", F.xxhash64("_u"))
    tagged = exploded.join(
        F.broadcast(flagged.select("unit_hash")
                    .withColumn("_dup", F.lit(True))),
        "unit_hash",
        "left",
    )
    kept_struct = F.when(
        F.col("_dup").isNull(), F.struct(F.col("pos"), F.col("_u"))
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
            F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0))
            .cast("int").alias("n_dropped"),
        )
        .select(
            id_col,
            F.concat_ws(
                join_str, F.transform("_kept", lambda s: s["_u"])
            ).alias("clean_text"),
            F.size("_kept").alias("n_kept"),
            "n_dropped",
        )
    )
