"""Bloom-filter membership: space-bounded set probes for
decontamination and incremental dedup.

Not in the reference (SURVEY.md §2). The broadcast-set probe in
operators/decontaminate.py ships every member hash (8 bytes each); a
Bloom filter caps the shipped state at ``n_bits/8`` bytes TOTAL
(128 KiB for the 2^20-bit default) regardless of member count, at the
price of a tunable false-positive rate and zero false negatives —
exactly the right trade for "drop anything that MIGHT be in the test
set" decontamination, where a false positive only costs one extra
dropped document (public technique — Bloom 1970).

Scale design:

* **Hashing is JVM-only on both sides** (``xxhash64(value, row)`` mod
  ``n_bits``, k probe rows) — build and probe compute identical
  positions with zero Python hashing, so there is no cross-language
  hash-parity risk.
* **The build never collects raw positions**: distinct positions are
  packed into 64-bit words by a ``bit_or``-aggregate groupBy, so the
  driver collect is at most ``n_bits/64`` longs (16 K for the default)
  — a constant independent of corpus size.
* **The probe is map-only**: the filter bytes ride in the UDF closure
  (broadcast once per executor), positions come in as an array column,
  and an Arrow-batched pandas UDF tests bits with numpy indexing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(value_col: str | Column, n_bits: int, k: int) -> Column:
    """array<long> of the k bit positions one value maps to."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.array(
        *[
            F.pmod(F.xxhash64(c.cast("string"), F.lit(i)), F.lit(n_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    n_bits: int = 1 << 20,
    k: int = 5,
) -> bytes:
    """Build the filter over the column's values; returns the packed
    little-endian bit array (``n_bits/8`` bytes)."""
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = (
        df.select(F.explode(_positions(value_col, n_bits, k)).alias("pos"))
        .distinct()
        .groupBy((F.col("pos") / 64).cast("long").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(pos % 64 as int))")
            ).alias("bits")
        )
        .collect()
    )
    arr = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words:
        arr[r.word] = np.uint64(r.bits & 0xFFFFFFFFFFFFFFFF)
    return arr.tobytes()


def bloom_probe(
    df: DataFrame,
    value_col: str,
    filter_bytes: bytes,
    n_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Add ``out_col``: True iff ALL k of the value's bits are set
    (i.e. the value is possibly a member; False is definite
    non-membership). ``n_bits``/``k`` must match the build."""
    if len(filter_bytes) != n_bits // 8:
        raise ValueError(
            f"filter is {len(filter_bytes)} bytes, expected {n_bits // 8} "
            f"for n_bits={n_bits}"
        )
    words = np.frombuffer(filter_bytes, dtype=np.uint64)

    @F.pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        out = []
        for ps in pos:
            p = np.asarray(ps, dtype=np.uint64)
            hit = (words[p >> np.uint64(6)] >> (p & np.uint64(63))) & np.uint64(1)
            out.append(bool(hit.all()))
        return pd.Series(out)

    return df.withColumn(out_col, _test(_positions(value_col, n_bits, k)))
