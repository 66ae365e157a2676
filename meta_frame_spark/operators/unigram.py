"""Trainable unigram-LM tokenizer: train on the corpus, encode the
corpus.

Not in the reference (no text surface); the other half of the public
subword-tokenizer family next to ``operators/bpe.py``: the unigram
language model of Kudo 2018 ("Subword Regularization", ACL 2018) —
SentencePiece's default algorithm. A vocabulary of candidate pieces is
seeded from frequent substrings, piece probabilities are fit by EM
(forward-backward expected counts over ALL segmentations of each
word), the vocabulary is pruned to size, and encoding is the Viterbi
best segmentation under the final piece log-probabilities.

Scale design — same recipe that makes ``bpe_train`` corpus-size-
independent:

* the corpus collapses to a word-frequency table first (one explode +
  groupBy with map-side partials; the shuffle is vocab-sized). The
  unigram likelihood only depends on (word, count), so training on
  the ``top_words`` head loses only tail words whose expected counts
  are ~zero anyway;
* seeding, EM, and pruning run driver-side over that bounded table —
  O(top_words * max_word_len * max_piece_len) per EM sweep,
  independent of corpus size;
* encoding is one Arrow-batched map: per batch each DISTINCT word is
  Viterbi-segmented once through a memo (zipfian text -> ~95%+ hit
  rate), then counts/token arrays assemble per row. No shuffle.

Simplifications vs SentencePiece, documented: seeding takes the most
frequent substrings (count * length score) rather than an enhanced
suffix array; pruning drops the lowest-probability multi-character
pieces directly rather than by exact loss differential. Single
characters are always retained, so every word stays segmentable
(SentencePiece's character-coverage floor).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ASCII whitespace — keep encode-side word boundaries identical to
#: the JVM-side F.split(\s+) used in training (see bpe.py:_WS)
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _word_counts(
    df: DataFrame, text_col: str, top_words: int
) -> list[tuple[str, int]]:
    from meta_frame_spark.operators.skew import ensure_min_partitions

    rows = (
        ensure_min_partitions(df)
        .select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(top_words)
        .collect()
    )
    return [(r["w"], r["cnt"]) for r in rows]


def _seed_pieces(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece set: every single character, plus the
    ``seed_size`` best multi-char substrings by (count * length) —
    the usual frequent-substring seeding. Returns piece -> initial
    probability (normalized substring counts)."""
    counts: Counter = Counter()
    for w, c in words:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                counts[w[i:j]] += c
    singles = {p for p in counts if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        # deterministic: score desc, then piece asc
        key=lambda pc: (-pc[1] * len(pc[0]), pc[0]),
    )[:seed_size]
    seed = {p: float(counts[p]) for p in singles}
    seed.update((p, float(c)) for p, c in multis)
    total = sum(seed.values())
    return {p: c / total for p, c in seed.items()}


def _em_step(
    words: list[tuple[str, int]],
    probs: dict[str, float],
    max_piece_len: int,
) -> dict[str, float]:
    """One EM sweep: forward-backward expected piece counts over all
    segmentations of every (word, count), then re-normalize."""
    expected: defaultdict[str, float] = defaultdict(float)
    for w, c in words:
        n = len(w)
        # alpha[i]: total probability of segmentations of w[:i]
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            a = 0.0
            for j in range(max(0, i - max_piece_len), i):
                if alpha[j] > 0.0:
                    p = probs.get(w[j:i])
                    if p:
                        a += alpha[j] * p
            alpha[i] = a
        z = alpha[n]
        if z <= 0.0:  # unsegmentable (cannot happen with singles kept)
            continue
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for j in range(n - 1, -1, -1):
            b = 0.0
            for i in range(j + 1, min(j + max_piece_len, n) + 1):
                if beta[i] > 0.0:
                    p = probs.get(w[j:i])
                    if p:
                        b += p * beta[i]
            beta[j] = b
        for j in range(n):
            if alpha[j] <= 0.0:
                continue
            for i in range(j + 1, min(j + max_piece_len, n) + 1):
                p = probs.get(w[j:i])
                if p and beta[i] > 0.0:
                    expected[w[j:i]] += c * alpha[j] * p * beta[i] / z
    total = sum(expected.values())
    if total <= 0.0:
        return probs
    return {p: e / total for p, e in expected.items() if e > 0.0}


def unigram_train(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    top_words: int = 10_000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary of (at most) ``vocab_size``
    entries. Returns ``[(piece, logprob), ...]`` sorted by
    (logprob desc, piece asc) — deterministic end to end: the word
    table, the seeding, EM, and pruning all order ties explicitly.

    The loop alternates ``em_iters`` EM sweeps with pruning the
    lowest-probability multi-character pieces (``prune_frac`` of the
    overage per round), exactly the SentencePiece schedule shape;
    single characters are never pruned, so coverage is total."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    if not 0.0 < prune_frac <= 1.0:
        raise ValueError(f"prune_frac must be in (0, 1], got {prune_frac}")
    words = _word_counts(df, text_col, top_words)
    if not words:
        raise ValueError("unigram_train: no words in corpus")
    probs = _seed_pieces(words, vocab_size * seed_factor, max_piece_len)
    while True:
        for _ in range(em_iters):
            probs = _em_step(words, probs, max_piece_len)
        singles = {p: v for p, v in probs.items() if len(p) == 1}
        multis = {p: v for p, v in probs.items() if len(p) > 1}
        overage = len(probs) - vocab_size
        if overage <= 0 or not multis:
            break
        n_drop = max(1, int(math.ceil(overage * prune_frac)))
        n_drop = min(n_drop, len(multis))
        # deterministic: lowest prob first, piece asc ties
        drop = sorted(multis.items(), key=lambda pv: (pv[1], pv[0]))
        kept = dict(drop[n_drop:])
        probs = {**singles, **kept}
        total = sum(probs.values())
        probs = {p: v / total for p, v in probs.items()}
    return sorted(
        ((p, math.log(v)) for p, v in probs.items()),
        key=lambda pl: (-pl[1], pl[0]),
    )


def _viterbi(word: str, logp: dict[str, float], max_piece_len: int) -> list[str]:
    """Best segmentation under the piece log-probs. Deterministic
    tie-break: higher score, then LONGER last piece."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] == NEG:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            s = best[j] + lp
            if s > best[i] or (s == best[i] and j < back[i]):
                best[i] = s
                back[i] = j
    if best[n] == NEG:  # char not in vocab (non-head word at encode time)
        return list(word)
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_tokens: bool = False,
) -> DataFrame:
    """Tokenize every document by Viterbi segmentation under the
    learned pieces: ``(id_col, n_words, n_pieces[, pieces])``. Words
    containing characters outside the vocabulary fall back to
    character segmentation for those words (total coverage, like the
    trainer's single-char floor). One Arrow map with a per-batch
    distinct-word memo; no shuffle. The id column keeps its NATIVE
    type (string ids pass through untouched — no silent
    cast-to-long-NULLs that would vanish in downstream joins)."""
    logp = dict(pieces)
    max_len = max((len(p) for p in logp), default=1)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_words int, n_pieces int" + (
        ", pieces array<string>" if emit_tokens else ""
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
                        enc = _viterbi(w, logp, max_len)
                        memo[w] = enc
                    toks.extend(enc)
                row = (rid, len(words), len(toks))
                if emit_tokens:
                    row += (toks,)
                out_rows.append(row)
            cols = [id_col, "n_words", "n_pieces"] + (
                ["pieces"] if emit_tokens else []
            )
            yield pd.DataFrame(out_rows, columns=cols)

    pruned = df.select(F.col(id_col), F.col(text_col))
    return pruned.mapInPandas(encode, schema=schema)


def _sample_segmentation(
    word: str,
    logp: dict[str, float],
    max_piece_len: int,
    alpha: float,
    coins,
) -> list[str]:
    """Forward-filtering backward-sampling draw from
    ``P(seg | word) ∝ P(seg)^alpha`` (Kudo 2018 §3.2's alpha-smoothed
    lattice). ``coins`` yields uniforms in [0,1); one is consumed per
    backward step. Falls back to characters when unsegmentable."""
    n = len(word)
    # forward in the alpha-tempered measure; rescale per position to
    # dodge underflow (only ratios matter to the backward draws)
    A = [0.0] * (n + 1)
    A[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_piece_len), i):
            if A[j] > 0.0:
                lp = logp.get(word[j:i])
                if lp is not None:
                    a += A[j] * math.exp(alpha * lp)
        A[i] = a
        if a > 0.0 and (a > 1e100 or a < 1e-100):
            scale = 1.0 / a
            for k in range(i + 1):
                A[k] *= scale
    if A[n] <= 0.0:
        return list(word)
    out = []
    i = n
    while i > 0:
        opts = []
        total = 0.0
        for j in range(max(0, i - max_piece_len), i):
            if A[j] > 0.0:
                lp = logp.get(word[j:i])
                if lp is not None:
                    wgt = A[j] * math.exp(alpha * lp)
                    opts.append((j, wgt))
                    total += wgt
        u = next(coins) * total
        acc = 0.0
        pick = opts[-1][0]
        for j, wgt in opts:
            acc += wgt
            if u < acc:
                pick = j
                break
        out.append(word[pick:i])
        i = pick
    return out[::-1]


def unigram_sample_encode(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    alpha: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_tokens: bool = False,
    seed: str = "s0",
) -> DataFrame:
    """Subword-REGULARIZED tokenization (Kudo 2018 §3.2: at training
    time, sample a segmentation from ``P(seg|word) ∝ P(seg)^alpha``
    instead of always taking the Viterbi best — the stochastic
    augmentation SentencePiece ships as ``enable_sampling``): exact
    forward-filtering backward-sampling over each word's segmentation
    lattice under the alpha-tempered piece probabilities. Low
    ``alpha`` -> near-uniform over segmentations; high ``alpha`` ->
    concentrates on the Viterbi path.

    Every random draw is the repo's portable md5 coin keyed on
    ``(id_col, seed, word position, backward step)``, so reruns and
    partitionings reproduce the same sample and ``seed`` switches
    epochs deterministically — the property that makes stochastic
    tokenization usable in a resumable 100 TB pipeline. Output:
    ``(id_col, n_words, n_pieces[, pieces])``; unsegmentable words
    fall back to characters like :func:`unigram_encode`.

    Scale: one Arrow map, no shuffle. No distinct-word memo — the
    coins differ per occurrence by design — so this costs one DP per
    word occurrence; use :func:`unigram_encode` for deterministic
    (inference-side) tokenization."""
    import hashlib

    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    logp = dict(pieces)
    max_len = max((len(p) for p in logp), default=1)
    # native id type — see unigram_encode; the md5 coin formats the id
    # with f-string, so int-vs-string ids stay distinct AND stable
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_words int, n_pieces int" + (
        ", pieces array<string>" if emit_tokens else ""
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in _WS.split((text or "").lower()) if w]
                toks: list[str] = []
                for wi, w in enumerate(words):
                    def coins():
                        step = 0
                        while True:
                            h = hashlib.md5(
                                f"{rid}:{seed}:{wi}:{step}".encode()
                            ).hexdigest()[:8]
                            yield int(h, 16) / 2**32
                            step += 1

                    toks.extend(
                        _sample_segmentation(
                            w, logp, max_len, alpha, coins()
                        )
                    )
                row = (rid, len(words), len(toks))
                if emit_tokens:
                    row += (toks,)
                out_rows.append(row)
            cols = [id_col, "n_words", "n_pieces"] + (
                ["pieces"] if emit_tokens else []
            )
            yield pd.DataFrame(out_rows, columns=cols)

    pruned = df.select(F.col(id_col), F.col(text_col))
    return pruned.mapInPandas(encode, schema=schema)
