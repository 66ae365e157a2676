#!/usr/bin/env python
"""Mixture planning with meta_frame_spark.

The "how much of each language/domain goes into the training run"
flow — three published mixing policies computed side by side from ONE
bounded per-group aggregate each, then materialized deterministically:

    documents (per-language token counts)
      -> UniMax allocation            (Chung et al. 2023: water-fill a
                                       token budget at <= max_epochs
                                       passes per language — the
                                       fairness policy)
      -> temperature shares           (size^alpha renormalized — the
                                       classic mT5 policy, for
                                       contrast)
      -> DoReMi reweighting           (Xie et al. 2023: multiplicative
                                       weights over a per-domain
                                       excess-loss proxy — here the
                                       rule-tier failure rate, i.e.
                                       domains with more headroom get
                                       upweighted)
      -> SoftDedup weights            (duplication-aware per-row
                                       sampling weight, so duplicate
                                       clusters do not silently eat
                                       the budget)
      -> apply_mix                    (hash-deterministic
                                       materialization of the UniMax
                                       shares at row grain)

Everything before apply_mix is driver math over G doubles; the corpus
is scanned twice (token counts + gopher flags) and sampled once.

Run:  python examples/plan_mixture.py [sf_dir]
Default: /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_mixture(
    spark: SparkSession,
    sf_dir: str,
    budget: float = 30_000.0,
    max_epochs: float = 1.5,
) -> dict[str, DataFrame]:
    from meta_frame_spark.functions.text import (
        token_count,
        with_gopher_rules,
    )
    from meta_frame_spark.operators.dedup import soft_dedup_weights
    from meta_frame_spark.operators.mixing import (
        apply_mix,
        doremi_domain_weights,
        temperature_mix_plan,
        unimax_allocation,
    )

    docs = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )

    # policy 1: UniMax — budget water-fill with an epoch cap
    unimax = unimax_allocation(
        docs, "lang", budget=budget, max_epochs=max_epochs,
        size_expr=token_count("text"),
    )

    # policy 2: temperature shares at alpha = 0.5, for contrast
    temperature = temperature_mix_plan(
        docs, "lang", alpha=0.5, size_col=None
    )

    # policy 3: DoReMi over a rule-tier headroom proxy — a language
    # failing more Gopher rules has more cleanable mass left, so it
    # gets upweighted by the multiplicative-weights iteration
    flagged = with_gopher_rules(docs).select(
        "lang", (1 - F.col("gopher_pass").cast("int")).alias("excess")
    )
    doremi = doremi_domain_weights(flagged, "lang", "excess")

    # duplication-aware row weights (feed weighted samplers / export)
    soft = soft_dedup_weights(docs)

    # materialize the UniMax shares deterministically at row grain
    alloc = {r.lang: r.alloc for r in unimax.collect()}
    total = sum(alloc.values())
    weights = {k: v / total for k, v in alloc.items()}
    mixed = apply_mix(
        docs, "lang", weights, id_col="doc_id",
        size_col=None,
    )
    return {
        "unimax": unimax,
        "temperature": temperature,
        "doremi": doremi,
        "soft_weights": soft,
        "mixed": mixed,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from meta_frame_spark.session import get_session

    spark = get_session(app_name="plan-mixture")
    spark.sparkContext.setLogLevel("ERROR")
    out = plan_mixture(spark, sf_dir)
    out["unimax"].orderBy("n_units").show()
    out["temperature"].show()
    out["doremi"].show()
    print("mixed rows:", out["mixed"].count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
