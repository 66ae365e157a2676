"""Sequence packing — bin documents into fixed token budgets.

The standard LLM-training prep step the reference has no analogue for
(its surface is pure relational — SURVEY.md §2): given per-document
token counts and a context-window budget, group documents into "packs"
so each pack's total is ≤ budget with minimal waste. Exact global bin
packing is NP-hard and inherently serial; the distributed formulation
used here (and by production packing pipelines) shards the corpus by a
stable hash of the document id, then runs best-fit-decreasing (BFD)
independently inside each shard:

- sharding is map-only (no driver involvement, no global sort);
- BFD within a shard is O(n log n) over one Arrow batch, and
  guarantees ≤ 11/9·OPT + 1 bins per shard;
- pack ids are (shard, local bin) pairs — globally unique without
  coordination;
- determinism: shard membership is a pure hash of the id, and BFD
  orders by (tokens desc, id), so the same corpus packs identically
  on any partitioning/cluster. A ``salt`` re-deals shards.

At 100 TB: choose ``num_shards`` so a shard's (id, tokens) pairs fit
an executor's Arrow batch comfortably — the UDF only ever sees two
skinny columns, ~16 bytes/doc, so 1M docs/shard ≈ 16 MB. Waste vs a
global pack is bounded by ≤ 1 under-full bin per shard.
"""

from __future__ import annotations

import bisect

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHARD_COL = "__pack_shard"


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str,
    num_shards: int = 64,
    salt: str = "",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a ``pack_col`` string ``"<shard>/<bin>"`` such
    that the sum of ``token_col`` within a pack is ≤ ``budget``.

    Rows with ``token_col`` > budget (or null) get a singleton pack —
    splitting/truncating an oversize document is the tokenizer's
    decision, not the packer's. Returns ``id_col``, ``token_col``,
    ``pack_col`` (join back to the full row by id; keeping the packer's
    shuffle skinny is the point).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")

    skinny = df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(token_col).cast("long").alias(token_col),
        F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(num_shards))
        .cast("int")
        .alias(_SHARD_COL),
    )

    out_schema = f"{id_col} string, {token_col} long, {pack_col} string"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf[_SHARD_COL].iloc[0])
        toks = pdf[token_col].fillna(budget + 1)
        order = (
            pdf.assign(__t=toks)
            .sort_values(["__t", id_col], ascending=[False, True])
            .index
        )
        # best-fit-decreasing over open bins, kept sorted by remaining
        # capacity so the fit lookup is a bisect, not a linear scan
        remaining: list[int] = []  # sorted ascending
        bin_of_slot: list[int] = []  # parallel: bin id at that slot
        next_bin = 0
        assignment = pd.Series(0, index=pdf.index, dtype="int64")
        for idx in order:
            t = int(toks.loc[idx])
            if t > budget:
                assignment.loc[idx] = next_bin  # oversize: singleton
                next_bin += 1
                continue
            slot = bisect.bisect_left(remaining, t)
            if slot == len(remaining):
                b = next_bin
                next_bin += 1
                rem = budget - t
            else:
                b = bin_of_slot.pop(slot)
                rem = remaining.pop(slot) - t
            assignment.loc[idx] = b
            at = bisect.bisect_left(remaining, rem)
            remaining.insert(at, rem)
            bin_of_slot.insert(at, b)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                token_col: pdf[token_col],
                pack_col: [f"{shard}/{b}" for b in assignment],
            }
        )

    return skinny.groupBy(_SHARD_COL).applyInPandas(_pack, schema=out_schema)


def pack_stats(packed: DataFrame, token_col: str, pack_col: str = "pack_id") -> DataFrame:
    """Per-corpus packing efficiency: n_packs, fill-rate stats."""
    per_pack = packed.groupBy(pack_col).agg(
        F.sum(token_col).alias("pack_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("pack_tokens").alias("total_tokens"),
        F.avg("pack_tokens").alias("avg_pack_tokens"),
        F.avg("n_docs").alias("avg_docs_per_pack"),
    )
