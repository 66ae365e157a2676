"""Persist / reload trained tokenizer models as parquet tables.

A production pipeline fits a tokenizer ONCE (on a trusted slice, at a
pinned corpus snapshot) and reuses it across every later job — so the
learned model must survive the session. These helpers store each model
in ordinary parquet (readable by any engine, versionable next to the
data) and reload it into the exact Python structure the encoders take:

* BPE merge lists (word-level ``bpe_train`` AND byte-level
  ``byte_bpe_train`` — a merge list is a merge list): one row per
  merge, ``(rank, left, right)``; rank preserves priority order.
* Unigram-LM pieces (``unigram_train``): one row per piece,
  ``(rank, piece, logp)``; rank preserves the trainer's order.
* Frozen id vocabularies (``vocab_ids.byte_bpe_vocab`` /
  ``vocab_ids.unigram_vocab_table``): one row per token, ``(id, token,
  special)``; specials sit at the reserved low ids.

Round-trip contract: ``load_*(save_*(x)) == x`` exactly — encoders are
deterministic in their model, so a reloaded model reproduces the same
tokenization bit-for-bit (pinned by tests).

Scale note: these tables are model-sized (thousands of rows), not
corpus-sized; the writes coalesce to one file so the artifact is a
single object a registry can hash/version.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def save_merges(
    spark: SparkSession, merges: list[tuple[str, str]], path: str
) -> None:
    """Write a BPE merge list (word- or byte-level) as parquet."""
    if not merges:
        raise ValueError("save_merges: empty merge list")
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    # one pre-sliced partition, not createDataFrame().coalesce(1): the
    # default local-relation path spreads model rows over
    # defaultParallelism slices and the coalesced write measures
    # ~15x slower for these tiny tables (6-9s vs 0.4s on local[32])
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "rank int, left string, right string",
    )
    df.write.mode("overwrite").parquet(path)


def load_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Reload a merge list in training order."""
    rows = spark.read.parquet(path).collect()
    return [
        (r.left, r.right) for r in sorted(rows, key=lambda r: r.rank)
    ]


def save_vocab(
    spark: SparkSession, vocab: list[tuple[int, str, bool]], path: str
) -> None:
    """Write a frozen id vocabulary (``operators/vocab_ids.py`` —
    ``(id, token, special)`` rows, specials at the reserved low ids)
    as parquet. This is the artifact the training side consumes:
    collators read pad from id 0, framing from bos/eos, and the
    embedding width from ``max(id) + 1``."""
    if not vocab:
        raise ValueError("save_vocab: empty vocabulary")
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(list(vocab), 1),
        "id int, token string, special boolean",
    )
    df.write.mode("overwrite").parquet(path)


def load_vocab(spark: SparkSession, path: str) -> list[tuple[int, str, bool]]:
    """Reload a vocabulary in id order; ``load_vocab(save_vocab(v))
    == v`` exactly."""
    rows = spark.read.parquet(path).collect()
    return [
        (r.id, r.token, r.special)
        for r in sorted(rows, key=lambda r: r.id)
    ]


def save_pieces(
    spark: SparkSession, pieces: list[tuple[str, float]], path: str
) -> None:
    """Write a unigram-LM piece table (piece -> log-probability)."""
    if not pieces:
        raise ValueError("save_pieces: empty piece table")
    rows = [(i, p, lp) for i, (p, lp) in enumerate(pieces)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "rank int, piece string, logp double",
    )
    df.write.mode("overwrite").parquet(path)


def load_pieces(spark: SparkSession, path: str) -> list[tuple[str, float]]:
    """Reload a piece table in its exact saved order (the encoder is
    order-insensitive, but the EXACT round trip lets a model registry
    hash the artifact)."""
    rows = spark.read.parquet(path).collect()
    return [
        (r.piece, r.logp) for r in sorted(rows, key=lambda r: r.rank)
    ]
