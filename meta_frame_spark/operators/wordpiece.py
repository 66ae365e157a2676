"""WordPiece tokenizer: likelihood-scored merge training + greedy
longest-match-first encoding — the BERT-family member of the
tokenizer triad (word-level BPE and byte-level BPE in ``bpe.py``,
unigram-LM in ``unigram.py``).

Public algorithm only (Schuster & Nakajima 2012; Wu et al. 2016 §4.1;
the released BERT ``WordpieceTokenizer``): training is the BPE loop
with a different objective — merge the pair maximizing
``count(ab) / (count(a) * count(b))`` (the likelihood gain of fusing
the pair under a unigram LM) instead of raw pair frequency; encoding
is NOT merge-replay but greedy longest-match-first against the final
vocabulary, continuation pieces carrying the ``##`` prefix, whole
word -> ``[UNK]`` when no match exists at some position.

Scale design (the ``bpe_train`` shape): training collapses the corpus
to a bounded word-frequency head with one explode + groupBy — the
merge loop is driver-side over model-sized state, corpus-size
independent. Encoding is one Arrow ``mapInPandas`` with a per-batch
distinct-word memo; no shuffle.

Reference parity note: the reference (`skybluecycology/meta_frame`)
has no tokenizer surface; north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import _word_counts

UNK = "[UNK]"


def wordpiece_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    top_words: int = 10_000,
) -> list[str]:
    """Learn a WordPiece vocabulary from the corpus: the single-char
    base units (continuations ``##``-prefixed) plus ``num_merges``
    likelihood-scored merged pieces, in merge order. Deterministic:
    word table ordered (count desc, word asc); pair ties break on the
    lexicographic pair. Stops early when no pair repeats. Returns the
    piece list EXCLUDING ``[UNK]`` (callers place specials via
    ``vocab_ids.unigram_vocab_table``-style freezing)."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words: dict[tuple[str, ...], int] = {}
    for w, c in _word_counts(df, text_col, top_words):
        units = tuple(
            [w[0]] + ["##" + ch for ch in w[1:]]
        )
        words[units] = words.get(units, 0) + c
    pieces: list[str] = []
    seen: set[str] = set()
    for units in words:
        for u in units:
            if u not in seen:
                seen.add(u)
                pieces.append(u)
    pieces.sort()  # deterministic base order regardless of corpus scan
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        unit_counts: dict[str, int] = {}
        for units, c in words.items():
            for u in units:
                unit_counts[u] = unit_counts.get(u, 0) + c
            for a, b in zip(units, units[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        best = None
        best_score = None
        for (a, b), c in pair_counts.items():
            if c < 2:
                continue
            score = c / (unit_counts[a] * unit_counts[b])
            key = (score, c)
            # maximize likelihood score, then count, then the
            # lexicographically SMALLEST pair for determinism
            if best is None or key > best_score or (
                key == best_score and (a, b) < best
            ):
                best, best_score = (a, b), key
        if best is None:
            break
        a, b = best
        merged = a + b[2:] if b.startswith("##") else a + b
        if merged not in seen:
            seen.add(merged)
            pieces.append(merged)
        new_words: dict[tuple[str, ...], int] = {}
        for units, c in words.items():
            out = []
            i = 0
            while i < len(units):
                if (
                    i + 1 < len(units)
                    and units[i] == a
                    and units[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            key2 = tuple(out)
            new_words[key2] = new_words.get(key2, 0) + c
        words = new_words
    return pieces


def wordpiece_encode_word(
    word: str, vocab: set[str], max_piece_len: int = 100
) -> list[str]:
    """Greedy longest-match-first WordPiece split of one word (the
    released BERT algorithm): longest vocab prefix, then longest
    ``##``-continuations; any dead end collapses the WHOLE word to
    ``[UNK]``. Pure kernel, exposed for tests."""
    if not word:
        return []
    out: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = min(n, start + max_piece_len)
        cur = None
        while end > start:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        out.append(cur)
        start = end
    return out


def wordpiece_encode(
    df: DataFrame,
    pieces: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_pieces: bool = False,
    verify_reassembly: bool = False,
) -> DataFrame:
    """WordPiece-tokenize every document (lowercased, whitespace word
    split — the uncased-BERT arrangement): ``(id_col, n_words,
    n_pieces, n_unk[, pieces][, reassembly_ok])``. NULL text encodes
    as empty. ``verify_reassembly`` checks per row that every non-UNK
    word's pieces concatenate (`##` stripped) back to the exact word
    — the structural invariant greedy matching guarantees. One Arrow
    map with a distinct-word memo; no shuffle."""
    vocab = set(pieces)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_words int, n_pieces int, n_unk int"
        + (", pieces array<string>" if emit_pieces else "")
        + (", reassembly_ok boolean" if verify_reassembly else "")
    )

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").lower().split()
                toks: list[str] = []
                ok = True
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = wordpiece_encode_word(w, vocab)
                        memo[w] = enc
                    toks.extend(enc)
                    if verify_reassembly and enc != [UNK]:
                        joined = "".join(
                            p[2:] if p.startswith("##") else p
                            for p in enc
                        )
                        ok = ok and joined == w
                row = (
                    rid, len(words), len(toks),
                    sum(1 for t in toks if t == UNK),
                )
                if emit_pieces:
                    row += (toks,)
                if verify_reassembly:
                    row += (ok,)
                rows.append(row)
            cols = (
                [id_col, "n_words", "n_pieces", "n_unk"]
                + (["pieces"] if emit_pieces else [])
                + (["reassembly_ok"] if verify_reassembly else [])
            )
            yield pd.DataFrame(rows, columns=cols)

    pruned = df.select(F.col(id_col), F.col(text_col))
    return pruned.mapInPandas(encode, schema=schema)
