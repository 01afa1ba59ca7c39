"""Always-on AML monitoring: the streaming face of the engine's alert
screens run as concurrent Structured Streaming queries over one
replayed event feed — the deployment shape a transaction-monitoring
team actually operates (the batch faces of the same operators are the
retrospective screens in examples/reference_workflow.py).

Queries started (each an independent checkpointed stream):
- velocity breaches — applyInPandasWithState per-event rolling limits
  (count-1h / sum-24h), with ``evict_idle_keys=True`` so state is
  bounded by the ACTIVE population, not every account ever seen
  (DEPLOY.md §Streaming capacity rule: ~70-90 us per active key per
  trigger on 32 cores, measured to 2M keys in SCALE.md).
- coordination cells — the chained stateful shape
  (dropDuplicatesWithinWatermark -> tumbling-day window count): cells
  of >= 3 distinct senders moving one identical amount in one day,
  emitted as each day's window closes.
- pass-through pairs — the stream-stream interval join: inflows echoed
  back out of the same account within the match horizon at 80-100% of
  the amount.
- stateful running totals — the cumulative per-account accumulator
  with its alert threshold.

Run: python examples/streaming_monitor.py [sf_dir]
(replays the fixture events as 4 time-ordered micro-batch files into
in-memory sinks, then prints each screen's alert count — swap the
file source for Kafka and the memory sinks for tables in production).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.plans.feature_queries import (  # noqa: E402
    _COORD_MIN_SENDERS,
    _VELOCITY_MAX_1H,
    _VELOCITY_MAX_24H_CENTS,
)
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sources import load_table  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    coordinated_amounts_stream,
    interval_join_streams,
    read_events_stream,
    run_stream_to_memory,
    stateful_user_totals,
    velocity_breach_stream,
)


def make_replay_dir(spark, sf_dir: str) -> str:
    """The fixture events split into 4 time-ordered files so each
    screen replays as 4 micro-batches (production: a Kafka topic)."""
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    tmp = tempfile.mkdtemp(prefix="monitor_feed_")
    rows = ev.collect()
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).withColumn(
                "ts", F.expr("unix_micros(ts) * 1000")
            ).coalesce(1).write.mode("append").parquet(tmp)
    return tmp


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="aml_streaming_monitor")
    feed = make_replay_dir(spark, sf_dir)

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
            read_events_stream(spark, feed).filter("event_type = 'purchase'"),
            read_events_stream(spark, feed).filter("event_type = 'click'"),
        ),
        "mon_passthrough",
        output_mode="append",
    )
    print(f"interval_join_pairs: {passthrough.count()} pairs")

    totals = run_stream_to_memory(
        stateful_user_totals(read_events_stream(spark, feed)),
        "mon_totals",
        output_mode="update",
    )
    alerts = totals.filter("alert").select("user_id").distinct().count()
    print(f"cumulative_total_alerts: {alerts} accounts over threshold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
