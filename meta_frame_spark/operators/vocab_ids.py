"""Vocabulary artifact: token -> id tables with reserved specials, and
id-level encoding — the artifact a training pipeline actually consumes
after tokenizer fitting (VERDICT r13 #5).

``bpe_train``/``byte_bpe_train``/``unigram_train`` learn merge lists or
piece tables; a training run needs one more step before any model sees
data: a FROZEN integer vocabulary with the special tokens
(PAD/UNK/BOS/EOS) reserved at fixed low ids, so that batch collation
(pad id), loss masking (pad/unk), and sequence framing (bos/eos) are
stable across every later job. This module builds that table, encodes
documents straight to id sequences, and round-trips the artifact
through parquet (``tokenizer_io.save_vocab``/``load_vocab``).

Layout contract (the sentencepiece/GPT-2 public convention):

* specials take ids ``0 .. len(specials)-1`` in the given order —
  default ``("<pad>", "<unk>", "<bos>", "<eos>")`` so pad=0 (the id
  collators zero-fill with), unk=1, bos=2, eos=3;
* byte-BPE: the 256 byte-unit alphabet follows in byte order, then one
  token per merge in rank order — total ``len(specials) + 256 +
  len(merges)`` ids, and every encoder output is in-vocab by
  construction (a merge output is the concatenation of its parts, so
  the closure argument is inductive from the alphabet);
* unigram: the trainer's pieces follow in rank order.

Specials are reserved OUT-OF-BAND: text that literally contains
``"<bos>"`` encodes through the normal byte/piece path (never to id 2)
— the token->id lookup is built from non-special rows only, and
special ids are injected solely by the ``bos``/``eos`` framing flags.
This is the property that makes prompt-injection-via-special-token
impossible at the data layer, and it is pinned by tests.

Scale: the vocab is model-sized (thousands of rows). ``encode_ids`` is
one Arrow ``mapInPandas`` pass with a per-batch distinct-piece memo —
no shuffle, no driver traffic beyond the broadcast model; identical
shape to ``byte_bpe_encode``.

Reference parity note: the reference (`skybluecycology/meta_frame`)
has no tokenizer surface at all; north-star LLM-pipeline scope from
public knowledge (Radford et al. 2019 released encoder; Kudo 2018).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import _B2U, _PIECE, _apply_merges, _to_units, byte_bpe_decode

#: pad first so collators can zero-fill, unk next, then framing pair.
DEFAULT_SPECIALS: tuple[str, ...] = ("<pad>", "<unk>", "<bos>", "<eos>")


def byte_bpe_vocab(
    merges: list[tuple[str, str]],
    specials: tuple[str, ...] = DEFAULT_SPECIALS,
) -> list[tuple[int, str, bool]]:
    """Freeze a byte-BPE vocabulary: ``(id, token, special)`` rows.
    Ids are contiguous from 0; every token the paired encoder can emit
    is present (alphabet + merge closure). Duplicate merge outputs
    (the same pair learned twice cannot happen; distinct pairs with
    equal concatenation CAN — e.g. (a, bc) and (ab, c)) keep the
    first-rank id, matching encoder behavior where the earlier merge
    wins. Raises if a special collides with a derivable token — the
    reservation must be airtight for loss masking to mean anything."""
    if len(set(specials)) != len(specials):
        raise ValueError(f"duplicate special tokens: {specials}")
    rows: list[tuple[int, str, bool]] = [
        (i, s, True) for i, s in enumerate(specials)
    ]
    seen: set[str] = set(specials)
    nid = len(specials)
    for b in range(256):
        unit = _B2U[b]
        if unit in seen:  # pragma: no cover - specials are multi-char
            raise ValueError(f"special token collides with alphabet: {unit!r}")
        rows.append((nid, unit, False))
        seen.add(unit)
        nid += 1
    for left, right in merges:
        tok = left + right
        if tok in set(specials):
            raise ValueError(
                f"merge output collides with special token: {tok!r}"
            )
        if tok in seen:
            continue  # equal-concatenation later merge: first id wins
        rows.append((nid, tok, False))
        seen.add(tok)
        nid += 1
    return rows


def unigram_vocab_table(
    pieces: list[tuple[str, float]],
    specials: tuple[str, ...] = DEFAULT_SPECIALS,
) -> list[tuple[int, str, bool]]:
    """Freeze a unigram-LM vocabulary: specials, then pieces in
    trainer rank order."""
    if len(set(specials)) != len(specials):
        raise ValueError(f"duplicate special tokens: {specials}")
    rows: list[tuple[int, str, bool]] = [
        (i, s, True) for i, s in enumerate(specials)
    ]
    seen: set[str] = set(specials)
    nid = len(specials)
    for piece, _logp in pieces:
        if piece in seen:
            if piece in set(specials):
                raise ValueError(
                    f"piece collides with special token: {piece!r}"
                )
            continue
        rows.append((nid, piece, False))
        seen.add(piece)
        nid += 1
    return rows


def encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: list[tuple[int, str, bool]],
    text_col: str = "text",
    id_col: str = "doc_id",
    bos: bool = True,
    eos: bool = True,
    emit_ids: bool = False,
    verify_round_trip: bool = False,
    specials: tuple[str, ...] = DEFAULT_SPECIALS,
) -> DataFrame:
    """Byte-BPE encode every document straight to an id sequence:
    ``(id_col, n_bytes, n_ids[, ids][, ids_round_trip_ok])``.

    The token->id map is built from the vocab's NON-special rows, so
    literal special-token text cannot produce a special id; bos/eos
    ids frame the sequence only via the flags. ``verify_round_trip``
    inverts the ids (drop framing specials, id->token, byte decode)
    and compares to the exact input text in the same Arrow pass — the
    id-level loss-proof. NULL text encodes as the empty sequence
    (plus framing). One Arrow map, no shuffle."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    tok2id = {t: i for i, t, sp in vocab if not sp}
    id2tok = {i: t for i, t, sp in vocab if not sp}
    sp2id = {t: i for i, t, sp in vocab if sp}
    # the contract needs every declared special present: unk as the
    # fallback (byte-BPE never uses it, word-level encoders may),
    # bos/eos for framing, pad for the downstream collator
    missing = sorted(set(specials) - set(sp2id))
    if missing:
        raise ValueError(f"vocab is missing special tokens: {missing}")
    unk_id = sp2id.get("<unk>")
    bos_id = sp2id.get("<bos>")
    eos_id = sp2id.get("<eos>")
    if bos and bos_id is None:
        raise ValueError("bos=True but vocab has no <bos> special")
    if eos and eos_id is None:
        raise ValueError("eos=True but vocab has no <eos> special")
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_bytes int, n_ids int"
        + (", ids array<int>" if emit_ids else "")
        + (", ids_round_trip_ok boolean" if verify_round_trip else "")
    )

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[int]] = {}
        for pdf in batches:
            out_rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                ids: list[int] = [bos_id] if bos else []
                for piece in _PIECE.findall(text):
                    enc = memo.get(piece)
                    if enc is None:
                        toks = _apply_merges(list(_to_units(piece)), ranks)
                        enc = [tok2id.get(t, unk_id) for t in toks]
                        memo[piece] = enc
                    ids.extend(enc)
                if eos:
                    ids.append(eos_id)
                row = (rid, len(text.encode("utf-8")), len(ids))
                if emit_ids:
                    row += (ids,)
                if verify_round_trip:
                    body = ids[(1 if bos else 0):
                               (len(ids) - 1) if eos else len(ids)]
                    ok = (
                        all(i in id2tok for i in body)
                        and byte_bpe_decode([id2tok[i] for i in body])
                        == text
                        and (not bos or ids[0] == bos_id)
                        and (not eos or ids[-1] == eos_id)
                    )
                    row += (ok,)
                out_rows.append(row)
            cols = (
                [id_col, "n_bytes", "n_ids"]
                + (["ids"] if emit_ids else [])
                + (["ids_round_trip_ok"] if verify_round_trip else [])
            )
            yield pd.DataFrame(out_rows, columns=cols)

    pruned = df.select(F.col(id_col), F.col(text_col))
    return pruned.mapInPandas(encode, schema=schema)
