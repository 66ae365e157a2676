"""Join-cardinality estimation by correlated key-hash sampling.

Not in the reference (SURVEY.md §2). The pre-flight question on a
100 TB join is "how big is the OUTPUT?" — it decides broadcast vs
shuffle vs salt-and-pray before any executor commits to the work. An
exact answer costs the join itself; this estimator costs a scan of
each side's keys at ``1/rate_denom`` of the key space.

The trick (public technique — correlated / coordinated sampling, cf.
end-biased sampling, Estan & Naughton 2006): sample KEYS, not rows,
with the SAME hash condition on both sides (``xxhash64(key) % d == 0``)
— so for every surviving key both sides keep ALL its rows, each
surviving key's true pair contribution ``n_left * n_right`` is observed
exactly, and scaling the sampled sum by ``d`` is unbiased for ANY key
distribution (per-row Bernoulli sampling would bias heavy keys
quadratically). Hot keys that survive dominate variance downward —
which is exactly when the estimate matters most.

Scale: two map-side-combined per-key counts over 1/d of the keys, one
tiny key-join of the two count tables, one scalar aggregate. No raw
join is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = 1769  # fixed hash row — determinism across runs/restarts


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    rate_denom: int = 8,
) -> DataFrame:
    """One row ``(est_rows, n_sampled_keys)``: estimated inner-join
    output size of ``left ⋈ right`` on the key, from a ``1/rate_denom``
    correlated key sample. Deterministic (fixed hash salt)."""
    if rate_denom < 1:
        raise ValueError(f"rate_denom must be >= 1, got {rate_denom}")
    rk = right_key or left_key

    def keep(df: DataFrame, key: str) -> DataFrame:
        return df.filter(
            F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(_SALT)), F.lit(rate_denom)) == 0
        )

    lc = keep(left, left_key).groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    rc = keep(right, rk).groupBy(F.col(rk).alias("k")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    return (
        lc.join(rc, "k")
        .agg(
            F.coalesce(F.sum(F.col("n_l") * F.col("n_r")), F.lit(0)).alias("_s"),
            F.count(F.lit(1)).alias("n_sampled_keys"),
        )
        .select(
            (F.col("_s") * F.lit(rate_denom)).cast("long").alias("est_rows"),
            "n_sampled_keys",
        )
    )
