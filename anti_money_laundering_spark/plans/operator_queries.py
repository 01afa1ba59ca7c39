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


@register(
    "merge_upsert_orders",
    tags=("OP", "S4"),
    oracle="""
    WITH tgt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders
    ),
    src AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice, 'U' AS op
        FROM tgt WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D'
        FROM tgt WHERE o_orderkey % 97 = 1
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice, 'I'
        FROM tgt WHERE o_orderkey % 97 = 2
    )
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
    FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    WHERE NOT coalesce(t.o_orderkey IS NOT NULL AND s.op = 'D', FALSE)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO (the write op behind every reference sink,
    01_aml_network_analysis.py:245, 03_aml_entity_resolution.py:68)
    exercised end-to-end as one full-outer join: a CDC batch that
    UPDATEs every 97th order (price bumped), DELETEs the next ones
    (op='D'), and INSERTs re-keyed copies; unmatched target rows
    survive untouched. Oracle = the equivalent full-outer-join SQL."""
    from anti_money_laundering_spark.operators import merge_into

    tgt = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    k = F.col("o_orderkey")
    upd = tgt.filter(k % 97 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        F.lit("U").alias("op"),
    )
    dele = tgt.filter(k % 97 == 1).withColumn("op", F.lit("D"))
    ins = tgt.filter(k % 97 == 2).select(
        (k + F.lit(1000000000)).alias("o_orderkey"), "o_custkey",
        F.lit("N").alias("o_orderstatus"), "o_totalprice",
        F.lit("I").alias("op"),
    )
    source = upd.unionByName(dele).unionByName(ins)
    return merge_into(tgt, source, on=["o_orderkey"], matched_delete=F.col("op") == "D")


@register(
    "table_diff_orders",
    tags=("OP", "S4"),
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price FROM orders
    ),
    new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 97 = 0 THEN price + 1000.0 ELSE price END AS price
        FROM old WHERE o_orderkey % 89 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_orderstatus, price FROM old WHERE o_orderkey % 83 = 1
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'I'
                WHEN n.o_orderkey IS NULL THEN 'D'
                WHEN o.price IS DISTINCT FROM n.price
                  OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'U'
           END AS op,
           o.o_orderstatus AS before_status, n.o_orderstatus AS after_status,
           o.price AS before_price, n.price AS after_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'I'
               WHEN n.o_orderkey IS NULL THEN 'D'
               WHEN o.price IS DISTINCT FROM n.price
                 OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'U'
          END IS NOT NULL
    """,
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC extraction (operators.table_diff): compare two
    versions of the orders table — price bumps (U), retired keys (D),
    re-keyed copies (I) — and emit only the churn, null-safe. The
    feed replayed through merge_into reproduces the new snapshot
    (tests/test_operators.py roundtrip pin)."""
    from anti_money_laundering_spark.operators import table_diff

    k = F.col("o_orderkey")
    old = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    new = (
        old.filter(k % 89 != 0)
        .withColumn(
            "price",
            F.when(k % 97 == 0, F.col("price") + 1000.0).otherwise(F.col("price")),
        )
        .unionByName(
            old.filter(k % 83 == 1).withColumn("o_orderkey", k + 1000000000)
        )
    )
    d = table_diff(old, new, on=["o_orderkey"])
    return d.select(
        "o_orderkey",
        "op",
        F.col("before.o_orderstatus").alias("before_status"),
        F.col("after.o_orderstatus").alias("after_status"),
        F.col("before.price").alias("before_price"),
        F.col("after.price").alias("after_price"),
    )


@register(
    "incremental_revenue_merge",
    tags=("OP", "A1"),
    oracle="""
    SELECT o_custkey,
           round(sum(o_totalprice) + 1e-6, 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_revenue_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance attested by equivalence: the
    history partition's aggregate merged with the new batch's partial
    aggregate (operators.merge_aggregates) must equal the from-scratch
    group-by — which IS the oracle. At 100 TB only the delta is ever
    rescanned."""
    from anti_money_laundering_spark.operators import merge_aggregates

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )

    history = agg(o.filter(k % 10 != 0))
    delta = agg(o.filter(k % 10 == 0))
    merged = merge_aggregates(history, delta, on=["o_custkey"], sum_cols=["revenue"], count_cols=["n_orders"])
    return merged.select(
        "o_custkey",
        F.round(F.col("revenue") + 1e-6, 2).alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


@register(
    "asof_nearest_purchase",
    tags=("OP", "asof"),
    oracle="""
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
    purch AS (SELECT * FROM events WHERE event_type = 'purchase'),
    bwd AS (
        SELECT a.event_id, a.user_id, a.ts, b.event_id AS pid,
               b.value AS pv, b.ts AS bts
        FROM clicks a ASOF LEFT JOIN purch b
          ON a.user_id = b.user_id AND a.ts >= b.ts
    ),
    fwd AS (
        SELECT a.event_id, f.event_id AS pid, f.value AS pv, f.ts AS fts
        FROM clicks a ASOF LEFT JOIN purch f
          ON a.user_id = f.user_id AND a.ts <= f.ts
    ),
    both_sides AS (
        SELECT b.event_id, b.user_id, b.ts,
               b.pid AS b_pid, b.pv AS b_pv, b.bts,
               f.pid AS f_pid, f.pv AS f_pv, f.fts,
               date_diff('microsecond', b.bts, b.ts) AS d_b,
               date_diff('microsecond', b.ts, f.fts) AS d_f
        FROM bwd b JOIN fwd f USING (event_id)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN bts IS NULL THEN f_pid
                WHEN fts IS NULL THEN b_pid
                WHEN d_f < d_b THEN f_pid ELSE b_pid END AS purchase_id,
           round(CASE WHEN bts IS NULL THEN f_pv
                      WHEN fts IS NULL THEN b_pv
                      WHEN d_f < d_b THEN f_pv ELSE b_pv END, 2) AS purchase_value,
           CASE WHEN bts IS NULL THEN fts
                WHEN fts IS NULL THEN bts
                WHEN d_f < d_b THEN fts ELSE bts END AS ts_matched
    FROM both_sides
    WHERE bts IS NOT NULL OR fts IS NOT NULL
    """,
)
def asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the same user's CLOSEST purchase in absolute
    time, before or after (operators.asof_join direction='nearest', the
    r6 pandas-parity extension; ties go backward). The oracle composes
    DuckDB's backward and forward ASOF LEFT JOINs and picks the closer
    side with the same tie rule."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.col("value").alias("purchase_value")
    )
    out = asof_join(
        clicks, purchases, by=["user_id"],
        right_cols=["purchase_id", "purchase_value"], direction="nearest",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("purchase_id_matched").alias("purchase_id"),
        F.round("purchase_value_matched", 2).alias("purchase_value"),
        "ts_matched",
    )


@register(
    "skyline_orders",
    tags=("OP", "W-ext"),
    oracle="""
    WITH pts AS (
        SELECT o_orderkey, o_totalprice,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders
    ),
    w AS (
        SELECT *,
               max(d) OVER (ORDER BY cents
                            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS md_hi,
               max(d) OVER (PARTITION BY cents) AS md_peer
        FROM pts
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, order_date
    FROM w
    WHERE d = md_peer AND (md_hi IS NULL OR md_hi < d)
    """,
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier (skyline) orders: no other order is both
    pricier and more recent — the dominance query behind
    "best-in-class" dashboards and multi-objective candidate pruning.
    operators.skyline_2d runs it DISTRIBUTED: per-x max-y prune, one
    range repartition, a bounded one-row-per-partition driver carry,
    and a within-partition INCREMENTAL running max over the
    descending-x sort — never the global single-task sort (nor the
    O(n^2) strict-RANGE frame) the naive window formulation (the
    oracle) pays."""
    from anti_money_laundering_spark.operators import skyline_2d

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long").alias("d"),
    )
    front = skyline_2d(o, x="cents", y="d")
    return front.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )
