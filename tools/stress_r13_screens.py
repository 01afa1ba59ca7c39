#!/usr/bin/env python
"""Stress the r13 sliding-window coordination screen at 100-1000x
fixture scale with the EXACT catalog formulation (load_table swap, the
stress_screens.py pattern), reproducing the calendar-seam evasion the
r12 stress exposed and showing the sliding variant closes it:

- the ring: 12 mules, one configured off-grid amount, one event each,
  hourly, STRADDLING a midnight (5.5h before to 5.5h after — an 11h
  burst, inside the variant's 12h detection guarantee). The base
  calendar screen splits it 6/6 across the two day cells; the sliding
  screen's noon-offset window holds all 12.
- cost claim under test: the explode doubles rows, then the same ONE
  composite (cents, win) aggregation as the base screen — wall should
  be ~2x the base screen's at equal N, still no join, no window
  function.

Noise uses INDEPENDENT user/amount hashes (the r12 generator-
independence lesson) so organic same-amount cells carry real
multi-sender false-positive pressure; the organic cell count is
reported as calibration, not asserted away.

Results go to SCALE.md §r13-sliding-screen.

Usage: python tools/stress_r13_screens.py [n_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import anti_money_laundering_spark.plans.feature_queries as fq  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from tools.stress_r12_screens import _BASE_US, _run  # noqa: E402

_DAY_US = 86_400_000_000
#: first midnight after _BASE_US, +3 days — inside the 30-day noise span
_RING_MID_US = _BASE_US - _BASE_US % _DAY_US + 4 * _DAY_US
_RING_CENTS = 17_700_053  # off the noise grid (noise cents <= 10_000_099)


def _events(spark, n_events: int):
    h = F.abs(F.xxhash64("id", F.lit(12)))
    hu = F.abs(F.xxhash64("id", F.lit(99)))
    span_us = 30 * _DAY_US
    noise = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + id * ({span_us} / {n_events}) as long))"
        ).alias("ts"),
        (hu % 500_000).alias("user_id"),
        ((h % 10_000_000) / 100.0 + 1.0).alias("value"),
    )
    # 12 mules, hourly, 5.5h either side of the midnight: 6 events land
    # on each calendar day, all 12 inside the noon window
    ring = spark.range(12).select(
        (F.lit(9_000_000_000) + F.col("id")).alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_RING_MID_US} - 19800000000 "
            f"+ id * 3600000000 as long))"
        ).alias("ts"),
        (F.lit(900_000) + F.col("id")).alias("user_id"),
        F.lit(_RING_CENTS / 100.0).alias("value"),
    )
    return noise.unionByName(ring)


def stress_sliding(spark, n_events: int) -> None:
    ev = _events(spark, n_events)

    # untimed warmup of BOTH measured paths first (the r13
    # measurement-ordering lesson: a fresh JVM's first phase reads
    # ~1.5x its warm self, which biased this tool's original
    # base-vs-sliding ratio — review finding)
    _run(fq, spark, fq.coordinated_amount_clusters, ev)
    _run(fq, spark, fq.coordinated_sliding_windows, ev)

    base_rows, base_wall = _run(fq, spark, fq.coordinated_amount_clusters, ev)
    base_ring = [r for r in base_rows if r.cents == _RING_CENTS]
    base_max = max((r.n_senders for r in base_ring), default=0)

    slide_rows, slide_wall = _run(fq, spark, fq.coordinated_sliding_windows, ev)
    slide_ring = [r for r in slide_rows if r.cents == _RING_CENTS]
    slide_max = max((r.n_senders for r in slide_ring), default=0)
    whole = [r for r in slide_ring if r.n_senders == 12]

    organic = len(slide_rows) - len(slide_ring)
    print(
        f"sliding: {n_events + 12} events / 500k users; midnight-straddling "
        f"12-mule ring -> base calendar screen max senders per cell "
        f"{base_max} (split, {base_wall:.1f}s); sliding screen max "
        f"{slide_max} in {slide_wall:.1f}s ({len(whole)} full-strength "
        f"window(s), start {whole[0].win_start if whole else '-'}); "
        f"organic >=3-sender sliding cells (2 grids x 30 days x 10M "
        f"amounts): {organic}"
    )
    # the evasion, reproduced: the calendar grid never sees more than
    # the 6-sender halves
    assert base_max == 6, base_ring
    # ...and closed: exactly one noon-offset window holds all 12
    assert len(whole) == 1 and whole[0].n_events == 12, slide_ring
    assert whole[0].win_start.endswith("12:00"), whole
    assert whole[0].total_cents == 12 * _RING_CENTS


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    spark = get_spark(app_name="r13_screen_stress", shuffle_partitions=64)
    stress_sliding(spark, n_events)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
