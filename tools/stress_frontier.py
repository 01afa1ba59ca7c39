#!/usr/bin/env python
"""Stress the round-7 second-half operators past fixture scale:

- bloom_semi_join over a 20M-row fact / 1M-key selective dim —
  measures the semi-join-reduction claim: the bloom probe must prune
  the fact BEFORE the join so the join input (and its shuffle) is
  ~selectivity-sized; prints plain-semi-join vs bloom-prefilter times
  and the measured prune rate.
- skyline_2d over 20M random integer points — the two-pass
  distributed frontier, cross-checked exactly against a numpy
  sort + reverse-cummax on the per-x candidates. (The naive
  strict-RANGE window formulation is O(n^2) per partition —
  UnboundedFollowingWindowFunctionFrame re-aggregates per row — and
  unusable at this scale; that pathology is why the operator uses the
  incremental growing frame.)

Inputs are synthesized with codegen expressions (spark.range + hash
arithmetic) — no driver-side data. Results go to SCALE.md §frontier.

Usage: python tools/stress_frontier.py [rows_millions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from anti_money_laundering_spark.operators import skyline_2d  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sketch import bloom_semi_join  # noqa: E402


def main() -> int:
    mrows = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    n = mrows * 1_000_000

    # ---- bloom semi join: fact keys uniform over 10M, dim = 1M keys
    # (10% key selectivity) --------------------------------------------------
    fact = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(1_000_000).select((F.col("id") * 10).alias("dk"))  # k % 10 == 0
    t = time.time()
    plain = fact.join(dim.select(F.col("dk").alias("k")), "k", "left_semi").count()
    t_plain = time.time() - t
    t = time.time()
    bloomed = bloom_semi_join(fact, ["k"], dim, ["dk"], num_bits=1 << 24, num_hashes=5)
    n_bloom = bloomed.count()
    t_bloom = time.time() - t
    pref = bloom_semi_join(
        fact, ["k"], dim, ["dk"], num_bits=1 << 24, num_hashes=5, exact=False
    ).count()
    assert n_bloom == plain, (n_bloom, plain)
    print(
        f"bloom_semi_join {mrows}M fact / 1M dim: plain={t_plain:.1f}s "
        f"bloom={t_bloom:.1f}s matches={plain} prefilter_kept={pref} "
        f"({100.0 * pref / n:.2f}% of fact; true {100.0 * plain / n:.2f}%)"
    )

    # ---- skyline: uniform random integer grid ------------------------------
    pts = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).alias("y"),
    )
    t = time.time()
    ours = skyline_2d(pts, "x", "y")
    got = {(r.x, r.y) for r in ours.collect()}
    t_ours = time.time() - t
    # exact reference: per-x candidates -> numpy descending-x sort +
    # strict running max (same O(n log n) shape, zero Spark windows)
    import numpy as np

    cand = pts.groupBy("x").agg(F.max("y").alias("ymax")).toPandas()
    xs = cand["x"].to_numpy()
    ys = cand["ymax"].to_numpy()
    order = np.argsort(-xs)
    xs, ys = xs[order], ys[order]
    run = np.maximum.accumulate(ys)
    prev = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))
    want = {(int(a), int(b)) for a, b in zip(xs[ys > prev], ys[ys > prev])}
    assert got == want, (len(got), len(want))
    print(
        f"skyline_2d {mrows}M points: distributed={t_ours:.1f}s "
        f"frontier={len(got)} rows (matches numpy reference exactly)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
