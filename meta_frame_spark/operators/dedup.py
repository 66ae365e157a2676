"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its surface stops at group/agg/join —
SURVEY.md §2 bottom line); these are the north-star extensions from
SURVEY.md §7.1 step 6b, each designed scale-first:

* exact_dedup        — one hash-shuffle groupBy; no window, no sort.
* minhash_lsh_dedup  — shingle -> minhash -> band-bucket -> self-join
                       inside buckets only (candidate pairs, not n²).
* simhash_dedup      — 64-bit simhash, dup iff identical hash
                       (optionally banded for near-dup at distance 1).
* ngram_jaccard_pairs — exact Jaccard verification over candidate
                       pairs produced by LSH (never over the cross
                       product).

All pure pyspark.sql expressions — JVM-side, whole-stage-codegen;
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """Exact duplicate groups: one row per distinct ``key_cols`` value,
    carrying the kept ``id_col`` (min by default — deterministic) and the
    group size ``n_copies``.

    Scale: a single shuffle on the dedup key. For very wide keys (full
    document text at 100 TB) pre-hash the key so the shuffle moves 16
    bytes per row instead of the document: ``df.withColumn("_k",
    F.md5(col))`` then dedup on ``_k`` — identical grouping, since md5
    collisions are negligible at any realistic corpus size.
    """
    keep_fn = {"min": F.min, "max": F.max}[keep]
    return (
        df.groupBy(*key_cols)
        .agg(keep_fn(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def drop_exact_duplicates(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Return the surviving rows (full schema), keeping min-id per key.

    Implemented as a min-id aggregation + semi join rather than a
    ``row_number`` window: the window would sort every partition; the
    agg does map-side partial aggregation and a narrow shuffle.
    """
    keepers = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keepers, on=[*key_cols, id_col], how="left_semi").select(*df.columns)


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

#: 2^31 - 1 (Mersenne prime). Hashes are masked to 31 bits so the
#: permutation a*h+b stays < 2^62 — no long overflow under ANSI mode.
_MERSENNE = (1 << 31) - 1


def _shingles(text_col, n: int = 5):
    """Word n-gram shingles of a text column (array<string>), computed
    JVM-side: split -> sliding windows via transform over indices."""
    tokens = F.split(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col), r"\s+")
    k = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<bigint>) — minhash over word shingles.

    Each of the ``num_hashes`` permutations is ``(a*h + b) mod P`` over
    ``xxhash64`` of the shingle (masked to 31 bits); the signature
    element is the min over shingles.

    Implementation note: the permutations are computed in ONE fold over
    the hash array — ``aggregate(hashes, [P]*k, (acc, h) ->
    zip_with(acc, coef_structs, least(...)))`` — rather than ``k``
    separate ``array_min(transform(...))`` expressions. The naive form
    re-inlines the shingle+hash computation into every permutation
    branch after Catalyst collapses projections (k× recompute of the
    expensive string work); the fold computes shingles once per row.
    Still 100% built-in expressions: codegen'd, map-only, no shuffle.
    """
    import random

    rng = random.Random(seed)
    coefs = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]

    sh = _shingles(text_col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(F.lit(_MERSENNE)))
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for (a, b) in coefs
        ]
    )
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes)
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, c: F.least(m, (h * c["a"] + c["b"]) % F.lit(_MERSENNE))
        ),
    )
    return df.select(F.col(id_col), sig.alias("signature"))


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banding: docs agreeing on all rows of
    any band land in the same bucket; self-join per bucket.

    Scale: the explode produces ``num_bands`` rows/doc; the join is an
    equi-join on (band, bucket-hash) — candidates only, never n². Skewed
    buckets (boilerplate docs) are handled by AQE skew-join splitting.
    Output is canonicalized id_a < id_b and deduped across bands.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice("signature", b * rows_per_band + 1, rows_per_band)).alias("bucket"),
            )
            for b in range(num_bands)
        ]
    )
    exploded = sig_df.select(
        F.col(id_col), F.explode(bands).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")

    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (id_a, id_b):
    join texts in, compute |A∩B| / |A∪B| with array_intersect/union.

    Scale: candidate count << n²; the two joins are equi-joins on doc
    id against a (usually much smaller) candidate list, so Catalyst
    broadcasts the candidate side when it fits.
    """
    sets_df = df.select(
        F.col(id_col), F.array_distinct(_shingles(text_col, shingle_n)).alias("sh")
    )
    a = sets_df.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a")
    b = sets_df.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b")
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: minhash -> LSH candidates -> exact
    Jaccard verify. Returns verified near-dup pairs (id_a, id_b, jaccard)."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    cands = minhash_lsh_candidates(sigs, id_col, num_bands, rows_per_band)
    return ngram_jaccard_pairs(df, cands, text_col, id_col, shingle_n, threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document over word tokens.

    For each bit b: sign of sum over tokens of (hash(token) bit b ? +1 :
    -1). Expressed as aggregate over the token array — pure codegen, no
    shuffle, no UDF.
    """
    tokens = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_exprs = []
    for b in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b) if b < 63 else F.lit(-(1 << 63))) != 0, 1).otherwise(-1),
        )
        bit_exprs.append(F.when(vote > 0, F.lit(1 << b if b < 63 else -(1 << 63))).otherwise(F.lit(0)))
    sim = bit_exprs[0]
    for e in bit_exprs[1:]:
        sim = sim.bitwiseOR(e)
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of docs sharing an identical simhash (strong near-dup
    signal). One shuffle on the 8-byte hash."""
    return (
        simhash(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .select(id_col, "n_members")
    )
