r"""Trainable byte-pair-encoding tokenizer: train on the corpus, encode
the corpus.

Not in the reference (no text surface); `functions.text.bpe_tokens` is
a fixed regex PRE-tokenizer — this module adds the real thing: learned
merges (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016), the tokenizer a training pipeline
actually ships.

Scale design — the sentencepiece/HF recipe, which makes BPE training
corpus-size-INDEPENDENT:

* the corpus collapses to a word-frequency table first (one explode +
  groupBy; map-side partials make the shuffle vocab-sized). BPE
  statistics only ever depend on (word, count) — not on corpus order
  or size — so training on the ``top_words`` head loses only tail
  words that contribute ~nothing to pair counts;
* merge learning runs driver-side over that bounded table (the classic
  iterative most-frequent-pair loop; deterministic ties by pair
  lexicographic order);
* encoding is one Arrow-batched map: per batch, each DISTINCT word is
  BPE'd once through a memo (zipfian text makes the memo hit rate
  ~95%+), then counts/token arrays assemble per row. No shuffle.

The end-of-word marker ``</w>`` keeps word boundaries inside the
symbol space, as in the paper.

Byte-level mode (``byte_bpe_train`` / ``byte_bpe_encode``) is the
GPT-2 arrangement (Radford et al. 2019; the public
``bytes_to_unicode`` alphabet from OpenAI's released encoder): text
splits into pieces that PARTITION the string (``\S+|\s+`` runs, ASCII
classes), each piece's UTF-8 bytes map 1:1 onto 256 printable unicode
units, and merges are learned over those units — so NO input is ever
out-of-vocabulary and ``decode(encode(x)) == x`` for arbitrary UTF-8,
the loss-proof property real tokenizers need. No ``</w>`` marker:
pieces include the whitespace runs, so plain concatenation restores
the exact original text.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"

#: ASCII whitespace, matching the JVM/RE2 ``\s`` class used by the
#: training-side F.split and the DuckDB oracle. Python's str.split()
#: splits on UNICODE whitespace (e.g.  ), which would make
#: encode-side word boundaries disagree with the trained table.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _word_counts(df: DataFrame, text_col: str, top_words: int) -> list[tuple[str, int]]:
    from meta_frame_spark.operators.skew import ensure_min_partitions

    rows = (
        ensure_min_partitions(df)
        .select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(top_words)
        .collect()
    )
    return [(r["w"], r["cnt"]) for r in rows]


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    top_words: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the corpus. Returns the
    ordered merge list (earlier = higher priority). Deterministic:
    word table ordered by (count desc, word), ties between equally
    frequent pairs broken lexicographically. Stops early if no pair
    occurs twice."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    vocab = {
        tuple(w) + (_EOW,): c for w, c in _word_counts(df, text_col, top_words)
    }
    return _learn_merges(vocab, num_merges)


def _learn_merges(
    vocab: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    """The classic iterative most-frequent-pair loop over a bounded
    (symbol-tuple -> count) table; deterministic tie-break by
    lexicographically smallest pair."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        top_cnt = max(pairs.values())
        if top_cnt < 2:
            break
        cand = min(p for p, c in pairs.items() if c == top_cnt)
        merges.append(cand)
        a, b = cand
        ab = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _apply_merges(
    sym: list[str], ranks: dict[tuple[str, str], int]
) -> list[str]:
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    return _apply_merges(list(word) + [_EOW], ranks)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_tokens: bool = False,
) -> DataFrame:
    """Tokenize every document under the learned merges: ``(id_col,
    n_words, n_bpe_tokens[, bpe_tokens])``. One Arrow map with a
    per-batch distinct-word memo; no shuffle. The id column keeps its
    NATIVE type (string ids pass through — no silent cast-to-long
    NULLs that would vanish in downstream joins)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_words int, n_bpe_tokens int" + (
        ", bpe_tokens array<string>" if emit_tokens else ""
    )

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out_rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in _WS.split((text or "").lower()) if w]
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                row = (rid, len(words), len(toks))
                if emit_tokens:
                    row += (toks,)
                out_rows.append(row)
            cols = [id_col, "n_words", "n_bpe_tokens"] + (
                ["bpe_tokens"] if emit_tokens else []
            )
            yield pd.DataFrame(out_rows, columns=cols)

    pruned = df.select(F.col(id_col), F.col(text_col))
    return pruned.mapInPandas(encode, schema=schema)


# ---------------------------------------------------------------------------
# Byte-level mode (GPT-2 arrangement)
# ---------------------------------------------------------------------------

def _bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte<->unicode table (Radford et al. 2019,
    released encoder): the 188 printable latin-1 bytes map to
    themselves, the other 68 bytes map to U+0100.. so every byte is a
    visible, dict-safe character. Bijective by construction."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = _bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}

#: pieces PARTITION the text: non-whitespace runs and whitespace runs
#: (ASCII classes, matching the JVM `\S+|\s+` used train-side).
_PIECE = re.compile(r"[^ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+")
_PIECE_JVM = r"[^ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+"


def _to_units(piece: str) -> str:
    return "".join(_B2U[b] for b in piece.encode("utf-8"))


def byte_bpe_decode(tokens: list[str]) -> str:
    """Exact inverse of byte-level encoding: concatenate, map each
    unit back to its byte, UTF-8 decode. Total on any encoder output
    (every token is a concatenation of alphabet units)."""
    return bytes(_U2B[u] for u in "".join(tokens)).decode("utf-8")


def byte_bpe_encode_text(
    text: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Pure-Python single-string encoder (the per-row kernel of
    :func:`byte_bpe_encode`, exposed for property tests): piece split,
    byte->unit mapping, ranked merges. Never OOV — the alphabet covers
    all 256 bytes."""
    out: list[str] = []
    for piece in _PIECE.findall(text):
        out.extend(_apply_merges(list(_to_units(piece)), ranks))
    return out


def byte_bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    top_pieces: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn byte-level merge rules from the corpus. Case and
    whitespace are PRESERVED (unlike the word-level trainer) — the
    whole point is losslessness. Same corpus-size-independent shape:
    one explode + groupBy collapses the corpus to a piece-frequency
    head (whitespace runs are pieces too), the merge loop runs
    driver-side over that bounded table."""
    from meta_frame_spark.operators.skew import ensure_min_partitions

    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    rows = (
        ensure_min_partitions(df)
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(_PIECE_JVM), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(top_pieces)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(_to_units(r["w"]))
        vocab[key] = vocab.get(key, 0) + r["cnt"]
    return _learn_merges(vocab, num_merges)


def byte_bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_tokens: bool = False,
    verify_round_trip: bool = False,
) -> DataFrame:
    """Byte-level tokenize every document: ``(id_col, n_bytes,
    n_tokens[, tokens][, round_trip_ok])``. NULL text encodes as the
    empty string (0 bytes, 0 tokens). ``verify_round_trip`` decodes
    each row's tokens back and compares to the exact input — the
    loss-proof invariant, checked in the same pass. One Arrow map
    with a per-batch distinct-piece memo; no shuffle; id keeps its
    native type."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_bytes int, n_tokens int"
        + (", tokens array<string>" if emit_tokens else "")
        + (", round_trip_ok boolean" if verify_round_trip else "")
    )

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out_rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                toks: list[str] = []
                for piece in _PIECE.findall(text):
                    enc = memo.get(piece)
                    if enc is None:
                        enc = _apply_merges(list(_to_units(piece)), ranks)
                        memo[piece] = enc
                    toks.extend(enc)
                row = (rid, len(text.encode("utf-8")), len(toks))
                if emit_tokens:
                    row += (toks,)
                if verify_round_trip:
                    row += (byte_bpe_decode(toks) == text,)
                out_rows.append(row)
            cols = (
                [id_col, "n_bytes", "n_tokens"]
                + (["tokens"] if emit_tokens else [])
                + (["round_trip_ok"] if verify_round_trip else [])
            )
            yield pd.DataFrame(out_rows, columns=cols)

    pruned = df.select(F.col(id_col), F.col(text_col))
    return pruned.mapInPandas(encode, schema=schema)
