"""Catalog entries for the custom operators (as-of join, range join)
over the events fixture — DuckDB has native ASOF JOIN and plain
BETWEEN joins, so both are fully oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.operators import asof_join, range_join, salted_join
from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.sources import load_table


@register(
    "asof_join_last_purchase",
    headline=True,
    tags=("OP", "asof"),
    oracle="""
    SELECT a.event_id, a.user_id, a.ts, a.value,
           b.event_id AS purchase_id, round(b.value, 2) AS purchase_value, b.ts AS ts_matched
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the same user's most recent purchase at or
    before it — the canonical as-of join. Union + ordered window fill:
    one shuffle on user_id, no join explosion (operators.asof_join)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.col("value").alias("purchase_value")
    )
    out = asof_join(
        clicks, purchases, by=["user_id"], right_cols=["purchase_id", "purchase_value"]
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("purchase_id_matched").alias("purchase_id"),
        F.round("purchase_value_matched", 2).alias("purchase_value"),
        "ts_matched",
    )


@register(
    "range_join_events_in_order_week",
    tags=("OP", "range"),
    oracle="""
    SELECT e.event_id, o.o_orderkey, e.user_id, e.ts, o.o_orderdate
    FROM events e
    JOIN orders o
      ON e.user_id = o.o_custkey % 150
     AND e.ts >= o.o_orderdate
     AND e.ts < o.o_orderdate + INTERVAL 2 DAY
    """,
)
def range_join_events_in_order_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside each order's 2-day window (key-sharded
    interval containment). Bucketized equi-join on (key, day-bucket) +
    exact residual — never the per-key cartesian (operators.range_join)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("user_id"),
            F.col("o_orderdate").alias("lo"),
            (F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")).alias("hi"),
        )
    )
    out = range_join(
        ev, orders, by=["user_id"], point="ts", lo="lo", hi="hi",
        bucket_width_seconds=86400,
    )
    return out.select("event_id", "o_orderkey", "user_id", "ts", F.col("lo").alias("o_orderdate"))


@register(
    "salted_join_user_events",
    tags=("OP", "J-ext"),
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, round(e.value, 2) AS value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def salted_join_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating salted join (operators.salted_join): events join
    their user dimension with the hot keys spread over 8 salt
    sub-keys — row-identical to the plain equi-join, which is exactly
    what the oracle checks."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    out = salted_join(ev, cust, on=["user_id"], salt=8)
    return out.select("event_id", "user_id", "c_name", F.round("value", 2).alias("value"))
