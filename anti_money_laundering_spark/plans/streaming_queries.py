"""Streaming-operator catalog (SURVEY.md §7.6): the SAME transformation
functions the streaming façade runs incrementally, applied to the batch
events table and DuckDB-oracle-checked. Batch/stream output parity is
asserted in tests/test_streaming.py — together the two give the full
correctness story for the incremental path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.plans.feature_queries import _COORD_MIN_SENDERS
from anti_money_laundering_spark.sources import load_table
from anti_money_laundering_spark.streaming import (
    _DAY_US,
    _HALF_DAY_US,
    coordinated_amounts_stream,
    coordinated_sliding_stream,
    enrich_events_static,
    session_event_stats,
    sliding_event_values,
    stateful_user_totals,
    tumbling_event_counts,
)


@register(
    "stream_tumbling_counts",
    tags=("STR",),
    oracle="""
    SELECT CAST(to_timestamp(floor(extract(epoch FROM ts) / 21600) * 21600) AS TIMESTAMP)
               AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows per event_type (Spark windows align to
    the epoch, so floor(epoch/21600) reproduces window.start)."""
    return tumbling_event_counts(load_table(spark, sf_dir, "events"), window="6 hours")


@register(
    "stream_sliding_values",
    tags=("STR",),
    oracle="""
    SELECT CAST(to_timestamp(floor(extract(epoch FROM ts) / 3600) * 3600 - off) AS TIMESTAMP)
               AS window_start,
           user_id, count(*) AS n, round(sum(value), 2) AS value_sum
    FROM events CROSS JOIN (SELECT unnest([0, 3600]) AS off)
    GROUP BY window_start, user_id
    """,
)
def stream_sliding_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows every 1h per user: each event belongs to two
    windows (the oracle unrolls the two slide offsets)."""
    return sliding_event_values(load_table(spark, sf_dir, "events"))


@register(
    "stream_session_stats",
    tags=("STR",),
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               -- exact microsecond gap: date_diff('second', ...) counts
               -- crossed second BOUNDARIES, so a 1799.2s gap spanning a
               -- boundary reads as 1800 and splits a session Spark's
               -- sub-second session_window keeps (observed off-by-one
               -- at sf0.1)
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT min(ts) AS session_start, user_id,
           count(*) AS n_events, round(sum(value), 2) AS session_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) per user; the oracle builds
    the same islands with lag + cumulative sum. NB session_window
    closes a session when the NEXT event is >= gap away (strict
    half-open [start, last+gap)), hence the >= in the oracle."""
    return session_event_stats(load_table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "stream_user_totals",
    headline=True,
    tags=("STR",),
    oracle="""
    SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events,
           sum(value) >= 1000.0 AS alert
    FROM events GROUP BY user_id
    """,
)
def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the custom stateful accumulator
    (applyInPandasWithState on a stream): lifetime per-user totals with
    a threshold alert flag. Stream/batch parity in tests/test_streaming.py."""
    out = stateful_user_totals(load_table(spark, sf_dir, "events"), alert_threshold=1000.0)
    from pyspark.sql import functions as F

    return out.select("user_id", F.round("total_value", 2).alias("total_value"), "n_events", "alert")


@register(
    "stream_static_enrich",
    tags=("STR",),
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, round(e.value, 2) AS value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-static enrichment join (facts stream,
    dims don't): events pick up the customer's market segment. On a
    stream this is a STATELESS per-micro-batch hash join against the
    static dim (broadcast under the threshold) — parity replayed in
    tests/test_streaming.py."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    out = enrich_events_static(ev, cust)
    return out.select(
        "event_id", "user_id", "c_mktsegment", F.round("value", 2).alias("value")
    )


@register(
    "stream_dedup_events",
    tags=("STR",),
    # doubling the input simulates at-least-once redelivery; dedup must
    # restore exactly the original event set (event_id is unique, and
    # duplicate rows are byte-identical, so the survivor is well-defined)
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    GROUP BY ALL
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of dropDuplicatesWithinWatermark-based stream dedup
    (streaming.dedup_events_stream): an at-least-once doubled feed
    collapses back to one row per event_id. Watermark-bounded state on
    a real stream; replay parity in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    from anti_money_laundering_spark.streaming import dedup_events_stream

    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    return dedup_events_stream(doubled).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


@register(
    "stream_interval_join",
    tags=("STR",),
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the STREAM-STREAM interval join
    (streaming.interval_join_streams): clicks within one hour after a
    purchase by the same user. On two real streams the watermarked
    time-bound condition is what lets the state store evict buffered
    rows; replay parity in tests/test_streaming.py. The batch plan is
    one equi-join on user_id with the range as a residual filter."""
    from pyspark.sql import functions as F

    from anti_money_laundering_spark.streaming import interval_join_streams

    ev = load_table(spark, sf_dir, "events")
    out = interval_join_streams(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )
    return out.select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        F.col("l_user_id").alias("user_id"),
    )


@register(
    "stream_event_transitions",
    tags=("STR",),
    oracle="""
    SELECT user_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
           event_type AS next_type, ts
    FROM events
    QUALIFY prev_type IS NOT NULL
    """,
)
def stream_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stateful transition stream
    (streaming.stateful_event_transitions): per-user lag over the
    event log; the streaming face holds (last event) in the state
    store and appends one transition per arrival — replay parity in
    tests/test_streaming.py."""
    from anti_money_laundering_spark.streaming import stateful_event_transitions

    return stateful_event_transitions(load_table(spark, sf_dir, "events"))


@register(
    "stream_interval_join_outer",
    tags=("STR",),
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
     AND c.event_type = 'click'
    WHERE p.event_type = 'purchase'
    """,
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the LEFT-OUTER stream-stream interval join:
    purchases with their within-the-hour clicks, unmatched purchases
    kept with a null click — on streams the outer row emits only when
    the watermark passes its match horizon (deferred-emission parity in
    tests/test_streaming.py::test_stream_interval_left_outer_emits_unmatched).
    Same one-shuffle equi-join + range-residual plan as the inner face."""
    from pyspark.sql import functions as F

    from anti_money_laundering_spark.streaming import interval_join_streams

    ev = load_table(spark, sf_dir, "events")
    out = interval_join_streams(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        how="left_outer",
    )
    return out.select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        F.col("l_user_id").alias("user_id"),
    )


from anti_money_laundering_spark.plans.fixture_graphs import (  # noqa: E402
    FLOW_EDGES_SQL,
    FLOW_THRESHOLD,
)


@register(
    "stream_passthrough_pairs",
    headline=True,  # r10: bench floor for the streaming range-join twin (r9 verdict item 4)
    tags=("STR", "range"),
    oracle=f"""
    WITH e AS (
        SELECT src, dst, txn_id, ts,
               CAST(round(amount * 100) AS BIGINT) AS cents
        FROM ({FLOW_EDGES_SQL})
    )
    SELECT i.dst AS mid, i.txn_id AS in_event, o.txn_id AS out_event,
           i.cents / 100.0 AS in_amount, o.cents / 100.0 AS out_amount
    FROM e i JOIN e o
      ON o.src = i.dst
     AND o.ts >= i.ts AND o.ts < i.ts + INTERVAL 48 HOUR
     AND o.txn_id <> i.txn_id
     AND o.cents * 10 BETWEEN i.cents * 8 AND i.cents * 10
    """,
)
def stream_passthrough_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the STREAMING pass-through screen: the
    ``passthrough_funds_alerts`` pair detection re-expressed as a
    stream-stream interval join (streaming.interval_join_streams) so a
    funnel account alerts WHILE the money moves, not in a nightly
    batch. Inflow leg keyed on the receiving account, outflow leg on
    the sending account; an outflow matches inflows into the same
    account within [in.ts, in.ts + 48h) at 80-100% of the amount.
    Two deliberate deltas vs the batch screen, both from the facade's
    stream-state contract: the window lower bound is INCLUSIVE (the
    state-store horizon is [l.ts, l.ts+upper)), so self-pairing is
    excluded by event id instead of strict time; and output is
    PAIR-level (append-mode emittable as matches land) rather than the
    per-mid aggregate, which a downstream batch rollup can fold.
    Replay parity over 4 micro-batches with BOTH legs watermarked:
    tests/test_streaming.py::test_stream_passthrough_pairs_parity."""
    from pyspark.sql import functions as F

    from anti_money_laundering_spark.streaming import interval_join_streams

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > FLOW_THRESHOLD)
    cents = F.round(F.col("value") * 100).cast("long")
    inflows = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("mid"),
        "event_id",
        cents.alias("cents"),
        "ts",
    )
    outflows = ev.select(
        F.col("user_id").alias("mid"), "event_id", cents.alias("cents"), "ts"
    )
    out = interval_join_streams(
        inflows, outflows, key="mid", upper="48 hours", watermark="49 hours"
    ).filter(
        (F.col("l_event_id") != F.col("r_event_id"))
        & (F.col("r_cents") * 10 >= F.col("l_cents") * 8)
        & (F.col("r_cents") * 10 <= F.col("l_cents") * 10)
    )
    return out.select(
        F.col("l_mid").alias("mid"),
        F.col("l_event_id").alias("in_event"),
        F.col("r_event_id").alias("out_event"),
        (F.col("l_cents") / F.lit(100.0)).alias("in_amount"),
        (F.col("r_cents") / F.lit(100.0)).alias("out_amount"),
    )


from anti_money_laundering_spark.plans.feature_queries import (  # noqa: E402
    _VELOCITY_MAX_1H,
    _VELOCITY_MAX_24H_CENTS,
)


@register(
    "stream_velocity_breaches",
    tags=("STR", "W-ext"),
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS count_1h,
             sum(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
               AS sum_24h_cents
      FROM events
    )
    SELECT user_id, event_id,
           CAST(count_1h AS BIGINT) AS count_1h,
           CAST(sum_24h_cents AS BIGINT) AS sum_24h_cents,
           count_1h >= {_VELOCITY_MAX_1H} AS count_breach,
           sum_24h_cents > {_VELOCITY_MAX_24H_CENTS} AS sum_breach
    FROM v
    WHERE count_1h >= {_VELOCITY_MAX_1H}
       OR sum_24h_cents > {_VELOCITY_MAX_24H_CENTS}
    """,
)
def stream_velocity_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the STREAMING velocity control
    (streaming.velocity_breach_stream, r10 verdict item 5): the
    ``velocity_limit_breaches`` rolling limits re-expressed at EVENT
    grain so breaches emit as they happen — on a stream this is the
    applyInPandasWithState operator (per-user 24h buffer, binary-
    searched trailing frames over a prefix sum); on batch input the
    identical semantics are the same two RANGE windows as the
    retrospective screen with a per-event breach filter instead of
    the per-user rollup. Limits are imported from the batch screen
    (no hard-coded copy — the r9 FLOW_THRESHOLD review lesson).
    Replay parity over 4 micro-batches:
    tests/test_streaming.py::test_stream_velocity_breaches_parity;
    boundary/tie semantics pinned by the hand case there.

    Exactness: frames anchor on exact integer microseconds, counters
    are integer counts and exact cent sums, breach flags integer
    comparisons — every output column hash-stable. Plan: ONE user_id
    shuffle serves both RANGE frames and the filter is a per-row
    predicate on the window outputs (no re-aggregation, no second
    exchange)."""
    ev = load_table(spark, sf_dir, "events")
    from anti_money_laundering_spark.streaming import velocity_breach_stream

    return velocity_breach_stream(
        ev, max_1h=_VELOCITY_MAX_1H, max_24h_cents=_VELOCITY_MAX_24H_CENTS
    )


@register(
    "stream_coordinated_amounts",
    tags=("STR", "A-ext"),
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             strftime(ts, '%Y-%m-%d') AS day
      FROM events
    )
    SELECT cents, day, CAST(count(*) AS BIGINT) AS n_senders
    FROM d GROUP BY 1, 2
    HAVING count(*) >= {_COORD_MIN_SENDERS}
    """,
)
def stream_coordinated_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the STREAMING smurfing-coordination screen
    (streaming.coordinated_amounts_stream): the
    ``coordinated_amount_clusters`` cells re-expressed so each (exact
    amount, UTC day) cell emits once, as its day's window closes — on
    a stream this is the chained-stateful shape
    (dropDuplicatesWithinWatermark over (user, cents, day) feeding a
    tumbling 1-day window count in append mode); on batch input the
    identical semantics reduce to distinct + keyed aggregate. The
    sender floor is imported from the batch screen (no hard-coded
    copy — the r9 FLOW_THRESHOLD lesson). Replay parity over 4
    micro-batches: tests/test_streaming.py::
    test_stream_coordinated_amounts_parity (emitted windows only —
    append mode holds a day's cell until the watermark passes its
    end, the documented alerting delay of exact-distinct streaming).

    Exactness: cents are on-grid integers, the day an ISO string on
    both engines, n_senders an exact distinct count. Plan: distinct
    (one composite-key exchange) + the (cents, day) re-aggregation
    riding a second — both keyed, no join, no python state."""
    ev = load_table(spark, sf_dir, "events")
    return coordinated_amounts_stream(ev, min_senders=_COORD_MIN_SENDERS)


@register(
    "stream_coordinated_sliding",
    tags=("STR", "A-ext"),
    oracle=f"""
    WITH e AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS us, user_id
      FROM events
    ),
    g AS (
      SELECT DISTINCT user_id, cents, us - us % {_DAY_US} AS win_us FROM e
      UNION
      SELECT DISTINCT user_id, cents,
             us - (us - {_HALF_DAY_US}) % {_DAY_US} AS win_us
      FROM e
    )
    SELECT cents,
           strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M') AS win_start,
           CAST(count(*) AS BIGINT) AS n_senders
    FROM g GROUP BY 1, 2
    HAVING count(*) >= {_COORD_MIN_SENDERS}
    """,
)
def stream_coordinated_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the STREAMING sliding-grid coordination screen
    (streaming.coordinated_sliding_stream): the
    ``coordinated_sliding_windows`` cells re-expressed so each (exact
    amount, 24h window) cell emits once as its window closes — on a
    stream this is the chained-stateful shape over the TWO offset day
    grids (explode into both window starts, watermark on the
    window-start instant, dropDuplicatesWithinWatermark over
    (user, cents, win), tumbling 12h finalization in append mode);
    on batch input the identical semantics reduce to explode +
    distinct + keyed aggregate. Together with
    ``stream_coordinated_amounts`` this closes the calendar-seam
    evasion on the ALWAYS-ON face too — a ring timed across midnight
    is counted whole in the noon-grid window (hand case in
    tests/test_streaming.py). Replay parity over 4 micro-batches:
    tests/test_streaming.py::test_stream_coordinated_sliding_parity
    (emitted windows only — append mode holds a cell until the
    watermark passes its end; the 49h delay = 24h window span + the
    day twin's 25h tolerance, the documented alerting-delay price of
    seam robustness).

    Exactness: window starts are integer-microsecond grid points
    emitted as ISO-minute strings on both engines; n_senders an exact
    distinct count. Plan: explode (2x rows) + distinct on
    (user, cents, win) + the (cents, win) re-aggregation — two keyed
    exchanges, no join, no python state."""
    ev = load_table(spark, sf_dir, "events")
    return coordinated_sliding_stream(ev, min_senders=_COORD_MIN_SENDERS)
