#!/usr/bin/env python
"""Linkage EM end-to-end stress at ~10M candidate pairs (r8 verdict
item 5): SCALE.md's argument that the gamma-pattern histogram collapse
makes EM iterations free needs a measured wall above fixture scale.

Shape: 1M synthetic entities x 2 records each (original + duplicate
with hash-deterministic typos), blocked on an entity-derived key with
~180k blocks of Poisson(~11) records — Σ C(B,2) ≈ 10-11M pairs, of
which the 1M (orig, dup) pairs are true matches (λ ≈ 0.09-0.1). All
columns are hash-derived codegen expressions; no driver-side data.

Pipeline measured in three phases (the production decomposition):
1. blocking  — candidate_pairs + localCheckpoint (the pair table is
   read once per comparison pass; at 100 TB it would be a persisted
   intermediate);
2. gamma     — gamma_table + the distinct-pattern histogram groupBy
   (the ONLY cluster pass whose cost scales with pair count);
3. fit       — em_fit driver-side sweeps over the collapsed patterns
   (cost ∝ patterns x iterations, INDEPENDENT of pair count).

Recovery check: fitted λ within ±0.03 of the planted match rate and
m(token exact-agree level) > u(same level) — duplicates always keep
the token column identical, so that comparison's agreement level is
the cleanest match/unmatch separator; the EM must find the planted
structure, not a degenerate fixpoint.

Usage: python tools/stress_linkage.py [n_entities] [n_blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.linkage import (  # noqa: E402
    candidate_pairs,
    em_fit,
    exact_comparison,
    gamma_table,
    levenshtein_comparison,
    numeric_bucket_comparison,
)
from anti_money_laundering_spark.session import get_spark  # noqa: E402


def synth_records(spark, n_entities: int, n_blocks: int):
    """Two records per entity: the duplicate perturbs name (~30% get a
    trailing char: levenshtein distance 1 — inside close=2) and year
    (~20% shift by 1 — inside tolerance). Non-duplicate pairs agree on
    name only by pool collision (name pool 50k values per block key
    population — rare)."""
    ent = spark.range(n_entities)
    base = ent.select(
        F.col("id").alias("uid"),
        F.pmod(F.xxhash64("id", F.lit("blk")), n_blocks).alias("block"),
        F.concat(F.lit("nm"), F.pmod(F.xxhash64("id", F.lit("nm")), 50_000)).alias("name"),
        F.concat(F.lit("tk"), F.pmod(F.xxhash64("id", F.lit("tk")), 2_000)).alias("token"),
        (1950 + F.pmod(F.xxhash64("id", F.lit("yr")), 50)).alias("year"),
    )
    dup = ent.select(
        (F.col("id") + n_entities).alias("uid"),
        F.pmod(F.xxhash64("id", F.lit("blk")), n_blocks).alias("block"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit("typo")), 10) < 3,
            F.concat(F.lit("nm"), F.pmod(F.xxhash64("id", F.lit("nm")), 50_000), F.lit("x")),
        )
        .otherwise(F.concat(F.lit("nm"), F.pmod(F.xxhash64("id", F.lit("nm")), 50_000)))
        .alias("name"),
        F.concat(F.lit("tk"), F.pmod(F.xxhash64("id", F.lit("tk")), 2_000)).alias("token"),
        (
            1950
            + F.pmod(F.xxhash64("id", F.lit("yr")), 50)
            + F.when(F.pmod(F.xxhash64("id", F.lit("yshift")), 10) < 2, 1).otherwise(0)
        ).alias("year"),
    )
    return base.unionByName(dup)


def main() -> int:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 180_000
    spark = get_spark(app_name="linkage_stress", shuffle_partitions=64)
    records = synth_records(spark, n_entities, n_blocks)

    comparisons = [
        exact_comparison("token"),
        levenshtein_comparison("name", close=2),
        numeric_bucket_comparison("year", tolerance=1.0),
    ]

    t0 = time.perf_counter()
    pairs = candidate_pairs(
        records, "uid", blocking_rules=[["block"]],
        compare_cols=["token", "name", "year"],
    ).localCheckpoint()
    n_pairs = pairs.count()
    t_block = time.perf_counter() - t0
    print(f"blocking: {n_pairs} candidate pairs  wall={t_block:.1f}s", flush=True)

    t0 = time.perf_counter()
    gammas = gamma_table(pairs, comparisons)
    stats: dict = {}
    t_gamma_start = time.perf_counter()
    params = em_fit(gammas, comparisons, max_iter=50, stats=stats)
    t_fit = time.perf_counter() - t_gamma_start
    t_gamma = time.perf_counter() - t0
    print(
        f"gamma+fit: patterns={stats['n_patterns']} pairs={stats['n_pairs']} "
        f"iterations={stats['iterations']}  wall={t_gamma:.1f}s "
        f"(histogram+fit {t_fit:.1f}s)",
        flush=True,
    )

    lam = params["lambda"]
    true_rate = n_entities / n_pairs
    m1 = params["m"]["token"][1]
    u1 = params["u"]["token"][1]
    print(
        f"recovery: lambda={lam:.4f} (planted {true_rate:.4f})  "
        f"m(token=agree)={m1:.4f} u(token=agree)={u1:.4f}"
    )
    assert abs(lam - true_rate) < 0.03, f"EM lambda {lam} far from planted {true_rate}"
    assert m1 > u1, "EM did not separate match/unmatch token agreement"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
