"""Always-on AML monitoring: the streaming faces of the engine's alert
screens over one replayed event feed — the deployment shape a
transaction-monitoring team operates (the batch faces of the same
operators are the retrospective screens in
examples/reference_workflow.py).

Screens replayed (each drained to completion in turn with
``availableNow`` into a memory sink — the demo harness; see the
production notes below):
- velocity breaches — applyInPandasWithState per-event rolling limits
  (count-1h / sum-24h), with ``evict_idle_keys=True`` so state is
  bounded by the ACTIVE population, not every account ever seen
  (DEPLOY.md §Streaming capacity rule: ~70-105 us per active key per
  trigger on 32 cores, measured to 2M keys in SCALE.md).
- coordination cells — the chained stateful shape
  (dropDuplicatesWithinWatermark -> tumbling-day window count): cells
  of >= 3 distinct senders moving one identical amount in one day,
  emitted as each day's window closes.
- pass-through pairs — the REAL funnel-account composition
  (plans/streaming_queries.py::stream_passthrough_pairs' stream face):
  inflow leg keyed on the beneficiary (props ``$.k``), outflow leg on
  the sender, matched within 48 h at 80-100% of the inflow amount via
  the watermarked stream-stream interval join.
- stateful running totals — the cumulative per-account accumulator
  with its alert threshold.
- sliding coordination cells (r13) — the boundary-robust twin
  (coordinated_sliding_stream): the same ring screen over TWO offset
  24h grids, so a ring timed across midnight is counted whole (the
  calendar-seam fix; 12h-burst detection guarantee in the operator
  docstring).

Production notes (this script is a sequential REPLAY demo, not the
deployed shape): run each screen as its OWN continuous query — swap
the file source for Kafka, give every query a distinct durable
``option("checkpointLocation", ...)``, a table/Kafka sink instead of
memory, and a ``processingTime`` trigger sized per DEPLOY.md; do NOT
``awaitTermination()`` one query before starting the next (a
continuous source never terminates — start all, then await the
session). The concurrent shape is EXECUTED AND MEASURED by
``tools/stress_concurrent_monitor.py`` (FAIR pools, separate durable
checkpoints, processingTime triggers, warmup-controlled): all four
screens drain in 0.75x the serial wall at 1.9-3.0x per-screen batch
inflation with identical per-screen output row counts — numbers in
SCALE.md §concurrent-monitor, sizing rule in DEPLOY.md §Streaming.

Run: python examples/streaming_monitor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.plans.feature_queries import (  # noqa: E402
    _COORD_MIN_SENDERS,
    _VELOCITY_MAX_1H,
    _VELOCITY_MAX_24H_CENTS,
)
from anti_money_laundering_spark.plans.fixture_graphs import FLOW_THRESHOLD  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sources import load_table  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    coordinated_amounts_stream,
    coordinated_sliding_stream,
    interval_join_streams,
    read_events_stream,
    run_stream_to_memory,
    stateful_user_totals,
    velocity_breach_stream,
    write_events_replay,
)


def passthrough_leg(df, inflow: bool):
    """One face of the funnel screen: events above the flow threshold,
    keyed on the middle account — the beneficiary (props $.k) for
    inflows, the sender for outflows."""
    df = df.filter(F.col("value") > FLOW_THRESHOLD)
    cents = F.round(F.col("value") * 100).cast("long")
    mid = (
        F.get_json_object("props", "$.k").cast("long")
        if inflow
        else F.col("user_id")
    )
    return df.select(mid.alias("mid"), "event_id", cents.alias("cents"), "ts")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="aml_streaming_monitor")
    # the fixture events as 4 time-ordered micro-batch files
    # (production: a Kafka topic)
    feed = write_events_replay(load_table(spark, sf_dir, "events"))

    velocity = run_stream_to_memory(
        velocity_breach_stream(
            read_events_stream(spark, feed),
            max_1h=_VELOCITY_MAX_1H,
            max_24h_cents=_VELOCITY_MAX_24H_CENTS,
            evict_idle_keys=True,
        ),
        "mon_velocity",
        output_mode="update",
    )
    print(f"velocity_breaches: {velocity.count()} breach events")

    coordination = run_stream_to_memory(
        coordinated_amounts_stream(
            read_events_stream(spark, feed), min_senders=_COORD_MIN_SENDERS
        ),
        "mon_coordination",
        output_mode="append",
    )
    print(f"coordination_cells (closed windows): {coordination.count()} cells")

    passthrough = run_stream_to_memory(
        interval_join_streams(
            passthrough_leg(read_events_stream(spark, feed), inflow=True),
            passthrough_leg(read_events_stream(spark, feed), inflow=False),
            key="mid",
            upper="48 hours",
            watermark="49 hours",
        ).filter(
            (F.col("l_event_id") != F.col("r_event_id"))
            & (F.col("r_cents") * 10 >= F.col("l_cents") * 8)
            & (F.col("r_cents") * 10 <= F.col("l_cents") * 10)
        ),
        "mon_passthrough",
        output_mode="append",
    )
    print(f"passthrough_pairs: {passthrough.count()} in/out echo pairs")

    totals = run_stream_to_memory(
        stateful_user_totals(read_events_stream(spark, feed)),
        "mon_totals",
        output_mode="update",
    )
    alerts = totals.filter("alert").select("user_id").distinct().count()
    print(f"cumulative_total_alerts: {alerts} accounts over threshold")

    sliding = run_stream_to_memory(
        coordinated_sliding_stream(
            read_events_stream(spark, feed), min_senders=_COORD_MIN_SENDERS
        ),
        "mon_coord_sliding",
        output_mode="append",
    )
    print(f"sliding_coordination_cells (closed windows): {sliding.count()} cells")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
