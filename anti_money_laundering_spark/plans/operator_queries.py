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
    "range_join_clicks_after_purchase",
    tags=("OP", "range"),
    oracle="""
    SELECT c.event_id, p.event_id AS purchase_id, c.user_id, c.ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts AS lo, ts + INTERVAL 2 HOUR AS hi
          FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.lo AND c.ts < p.hi
    """,
)
def range_join_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks landing inside the 2-hour window after each purchase by
    the same user (key-sharded interval containment — the AML
    follow-the-money window). Bucketized equi-join on (key, hour
    bucket) + exact residual — never the per-key cartesian
    (operators.range_join)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"),
    )
    out = range_join(
        clicks, purchases, by=["user_id"], point="ts", lo="lo", hi="hi",
        bucket_width_seconds=7200,
    )
    return out.select("event_id", "purchase_id", "user_id", "ts")


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
