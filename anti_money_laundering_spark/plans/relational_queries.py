"""Relational operator catalog (SURVEY.md §2.1-2.7) over the driver fixtures.

Each query re-expresses a reference operator pattern (cites in
docstrings refer to /root/reference files) on the TPC-H-ish fixture
tables, Spark-first: declarative DataFrame/SQL plans that Catalyst
optimizes (pushdown, pruning, broadcast selection, partial aggs).

Scale notes per query are in docstrings; the common ones:
- small dims (nation/region/supplier) get explicit broadcast() hints;
- aggregations rely on Catalyst partial (map-side) aggregation;
- filters are expressed on base columns so they reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: shared-attribute match (synthetic-identity detection spine).
# Reference: 01_aml_network_analysis.py:51-68 — entities sharing an email;
# here customers sharing a (nationkey, mktsegment) attribute combo.
# Exercises S1, A1 (groupBy count), A3 (having), J4 (semi join), W1 (sort).
# ---------------------------------------------------------------------------
@register(
    "shared_attr_match",
    headline=True,
    tags=("A1", "A3", "J4", "W1", "S1"),
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment
    FROM customer c
    JOIN (
        SELECT c_nationkey, c_mktsegment
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
        HAVING count(*) > 1
    ) d ON c.c_nationkey = d.c_nationkey AND c.c_mktsegment = d.c_mktsegment
    ORDER BY c.c_custkey
    """,
)
def shared_attr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers sharing an attribute combo with >=1 other customer.

    Scale: the duplicated-attribute dimension is tiny relative to the
    fact side, so the semi join broadcasts; the groupBy does partial
    aggregation map-side. No full-table shuffle of `customer` except
    the one agg on the (low-cardinality) key.
    """
    cust = _t(spark, sf_dir, "customer")
    keys = ["c_nationkey", "c_mktsegment"]
    dupes = cust.groupBy(*keys).agg(F.count(F.lit(1)).alias("ct")).filter(F.col("ct") > 1).drop("ct")
    return (
        cust.join(F.broadcast(dupes), keys, "left_semi")
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# A1/F5/P3: wide aggregation with arithmetic (TPC-H Q1 shape).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    headline=True,
    tags=("A1", "F5", "P3"),
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS sum_disc_price,
           round(avg(l_quantity) + 1e-10, 4) AS avg_qty,
           round(avg(l_discount) + 1e-10, 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: 2-key groupBy, 6 aggregates, pushed-down date filter.

    Scale: classic map-side-combine agg on a 4-group key; the shipdate
    predicate reaches the parquet scan (min/max row-group pruning).
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-6, 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity") + 1e-10, 4).alias("avg_qty"),
            F.round(F.avg("l_discount") + 1e-10, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# P1/P3/P5: projection + literal/null predicates (01:91-107, 02:28).
# ---------------------------------------------------------------------------
@register(
    "filter_project_null",
    tags=("P1", "P3", "P5"),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0 AND o_orderdate IS NOT NULL
    """,
)
def filter_project_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select/filter/null-predicate; all three predicates push to the scan."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0))
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# F1/F3/P7/P8: translate chain (02:29), cast (01:396), rename/drop (01:202).
# ---------------------------------------------------------------------------
@register(
    "derived_translate_cast",
    tags=("F1", "F3", "P7", "P8"),
    oracle="""
    SELECT c_custkey AS entity_id,
           translate(translate(c_name, ',', ''), ' ', '+') AS url_name,
           CAST(floor(c_acctbal) AS INTEGER) AS bal_floor
    FROM customer
    WHERE c_acctbal IS NOT NULL
    """,
)
def derived_translate_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-encoding translate chain + integer cast, reference's address
    cleanup (02_aml_address_verification.py:29). floor() on both sides
    because Spark CAST truncates while DuckDB rounds."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .withColumn("url_name", F.translate(F.translate(F.col("c_name"), ",", ""), " ", "+"))
        .withColumn("bal_floor", F.floor("c_acctbal").cast("int"))
        .withColumnRenamed("c_custkey", "entity_id")
        .select("entity_id", "url_name", "bal_floor")
    )


# ---------------------------------------------------------------------------
# A2/A3/F4: conditional aggregate + HAVING (01:169-173).
# ---------------------------------------------------------------------------
@register(
    "conditional_agg_having",
    tags=("A2", "A3", "F4"),
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_cust,
           count(CASE WHEN c_acctbal > 0 THEN 1 END) AS n_positive,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_building
    FROM customer
    GROUP BY c_nationkey
    HAVING count(CASE WHEN c_acctbal > 0 THEN 1 END) > 1
    """,
)
def conditional_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(CASE WHEN ...) per group with post-agg HAVING filter —
    the reference's person-count-per-component gate (01:169-173)."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.count(F.when(F.col("c_acctbal") > 0, 1)).alias("n_positive"),
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("n_building"),
        )
        .filter(F.col("n_positive") > 1)
    )


# ---------------------------------------------------------------------------
# U1/A4: UNION with DISTINCT semantics (01:91-107) vs U2 UNION ALL (01:344).
# ---------------------------------------------------------------------------
@register(
    "union_distinct_keys",
    tags=("U1", "A4"),
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION = union + distinct; the reference's edge/node assembly
    relies on exactly this (SURVEY §1.3 semantics note)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "union_all_tagged",
    tags=("U2", "U3", "A1"),
    oracle="""
    SELECT side, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum FROM (
        SELECT 'o' AS side, o_custkey AS k FROM orders
        UNION ALL
        SELECT 'l' AS side, l_suppkey AS k FROM lineitem
    ) u GROUP BY side
    """,
)
def union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (01:344); aggregate per source tag."""
    o = _t(spark, sf_dir, "orders").select(F.lit("o").alias("side"), F.col("o_custkey").alias("k"))
    li = _t(spark, sf_dir, "lineitem").select(F.lit("l").alias("side"), F.col("l_suppkey").alias("k"))
    return o.unionAll(li).groupBy("side").agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("key_sum"))


# ---------------------------------------------------------------------------
# J4: IN-subquery => left-semi join (01:53-67, :175-176).
# ---------------------------------------------------------------------------
@register(
    "semi_join_subquery",
    tags=("J4",),
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
    """,
)
def semi_join_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery decorrelated to a left-semi join (Catalyst
    RewritePredicateSubquery does the same to the SQL form)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0).select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(big, "c_custkey", "left_semi").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Anti join (engine extension; 'for free' per SURVEY §2.3 note).
# ---------------------------------------------------------------------------
@register(
    "anti_join_no_orders",
    tags=("J-ext",),
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order — NOT EXISTS as a left-anti join.
    (Every fixture customer has SOME order, so the unfiltered variant
    would be a trivially-empty parity check.)"""
    cust = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Outer join + agg (engine extension).
# ---------------------------------------------------------------------------
@register(
    "outer_join_nation_counts",
    tags=("J-ext", "A1"),
    oracle="""
    SELECT n.n_name, count(c.c_custkey) AS n_cust,
           round(coalesce(sum(c.c_acctbal), 0.0), 2) AS bal_sum
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def outer_join_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving empty nations; count() skips nulls.

    Scale: nation is 25 rows — broadcast; the agg keys on n_name
    (25 groups) so partial agg collapses nearly everything map-side.
    """
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        F.broadcast(nation)
        .join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_cust"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("bal_sum"),
        )
    )


# ---------------------------------------------------------------------------
# J3/P6: self-join with aliases + theta residual (01:316-320).
# ---------------------------------------------------------------------------
@register(
    "self_join_pair_amounts",
    headline=True,
    tags=("J3", "P4", "P6"),
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS ln1, b.l_linenumber AS ln2,
           round(a.l_extendedprice + b.l_extendedprice, 2) AS pair_price
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_linenumber < b.l_linenumber
      AND a.l_extendedprice + b.l_extendedprice > 150000.0
    """,
)
def self_join_pair_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aliased self-join on the order key with an arithmetic theta
    residual — the reference's structuring pair filter
    (01_aml_network_analysis.py:316-320: g1.g.id = g2.g.id then
    amt+amt > 10000).

    Scale: equi part (l_orderkey) is the shuffle key; the theta
    predicate stays a post-join filter, so no cartesian blowup. Skewed
    hot orders would be AQE-split.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(
            (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.l_extendedprice") + F.col("b.l_extendedprice") > 150000.0)
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_linenumber").alias("ln1"),
            F.col("b.l_linenumber").alias("ln2"),
            F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 2).alias("pair_price"),
        )
    )


# ---------------------------------------------------------------------------
# J2: multi-way join (01:335-355 joins motif matches to entities x4).
# ---------------------------------------------------------------------------
@register(
    "multiway_join_revenue",
    headline=True,
    tags=("J2", "A1"),
    oracle="""
    SELECT n.n_name, r.r_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-6, 2) AS revenue,
           count(*) AS n_lines
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name, r.r_name
    """,
)
def multiway_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table join tree, revenue per nation/region.

    Scale: fact-fact joins (orders x lineitem) shuffle on their keys;
    nation/region are broadcast so the dimension joins never shuffle.
    Date filter pushes into the orders scan before the join.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-6, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# P2 + nested structs: struct pack / `s.*` expansion (01:322).
# ---------------------------------------------------------------------------
@register(
    "struct_pack_expand",
    tags=("P2",),
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_nationkey < 5
    """,
)
def struct_pack_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack columns into a struct then expand with selectExpr('s.*') —
    the motif-output access pattern (01:318-322 graph1.*)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    packed = cust.select(F.struct("c_custkey", "c_name", "c_mktsegment").alias("s"))
    return packed.selectExpr("s.*")


# ---------------------------------------------------------------------------
# Window functions (engine extension per SURVEY §2.5 note).
# ---------------------------------------------------------------------------
@register(
    "window_topk_per_group",
    headline=True,
    tags=("W-ext",),
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — AML velocity/top-k building block.

    Scale: row_number over partitioned window = one shuffle on
    o_custkey; rank filter applied before any further join. The
    o_orderkey tiebreak makes results deterministic.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    tags=("W-ext",),
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total over event time (velocity-rule primitive)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("running_value"))
    )


@register(
    "window_range_frame_1h",
    tags=("W-ext",),
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2)
               AS value_1h
    FROM events
    """,
)
def window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed rolling window: each event's trailing-1-hour value
    total per user — the AML velocity rule itself ("> $X within an
    hour"), computed with a value-based frame over microsecond event
    time (a ROWS frame would count events, not time). One shuffle on
    (user_id), one sort, same as any window."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("value_1h")
    )


@register(
    "window_lag_lead_velocity",
    tags=("W-ext",),
    oracle="""
    SELECT user_id, event_id,
           date_diff('microsecond', lag(ts) OVER w, ts) AS micros_since_prev,
           round(lead(value) OVER w, 2) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user over event time: gap to the
    previous event (the AML rapid-succession velocity signal) and the
    next event's value. Exact microsecond gaps so both engines compute
    identical integers (second-granularity date_diff counts boundary
    crossings, which ns-precision fixtures would disagree on)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@register(
    "dormant_activation_alerts",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, value,
               date_diff('microsecond', lag(ts) OVER w, ts) AS gap_micros
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, gap_micros, round(value + 1e-6, 2) AS value
    FROM g WHERE gap_micros > 129600000000 AND value > 110
    """,
)
def dormant_activation_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant-account reactivation (AML classic): a user silent for
    > 1.5 days whose next transaction is high-value (> 110). Thresholds
    sit between the fixture's p90 gap (~1.0 day) / p99 (~2.0) and at
    the value p90 — 4/29/383 alerts at the three SFs. One per-user
    event-time window; exact microsecond gaps so both engines compute
    identical integers."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
                "gap_micros"
            ),
        )
        .filter((F.col("gap_micros") > 129_600_000_000) & (F.col("value") > 110))
        .select("user_id", "event_id", "gap_micros", F.round(F.col("value") + 1e-6, 2).alias("value"))
    )


@register(
    "counterparty_concentration",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH flows AS (
        SELECT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS cp,
               round(sum(value) + 1e-6, 2) AS amt
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, round(sum(amt) + 1e-6, 2) AS total FROM flows GROUP BY 1),
    ranked AS (
        SELECT f.user_id, f.cp, f.amt, t.total,
               row_number() OVER (PARTITION BY f.user_id
                                  ORDER BY f.amt DESC, f.cp) AS rn
        FROM flows f JOIN tot t USING (user_id)
    )
    SELECT user_id, cp AS top_cp, amt AS top_amt, total,
           round(amt / total, 6) AS share
    FROM ranked WHERE rn = 1 AND amt / total > 0.12
    """,
)
def counterparty_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterparty-concentration alerts: users whose single largest
    counterparty receives > 12% of their total outflow (fixture p90
    share ~0.117-0.12; 1/12/154 alerts at the three SFs — funnel
    accounts funnel). Per-counterparty sums are rounded BEFORE ranking
    so the top-1 pick is engine-stable; one groupBy + one per-user
    rank."""
    ev = _t(spark, sf_dir, "events")
    flows = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("cp"),
            "value",
        )
        .groupBy("user_id", "cp")
        .agg(F.round(F.sum("value") + 1e-6, 2).alias("amt"))
    )
    tot = flows.groupBy("user_id").agg(F.round(F.sum("amt") + 1e-6, 2).alias("total"))
    w = Window.partitionBy("user_id").orderBy(F.col("amt").desc(), F.col("cp"))
    return (
        flows.join(tot, "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("amt") / F.col("total") > 0.12))
        .select(
            "user_id",
            F.col("cp").alias("top_cp"),
            F.col("amt").alias("top_amt"),
            "total",
            F.round(F.col("amt") / F.col("total"), 6).alias("share"),
        )
    )


@register(
    "sessionize_events",
    headline=True,
    tags=("W-ext",),
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, value,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative-sum of gap flags (30-min gap).

    Scale: two window passes over the same (user_id, ts) ordering reuse
    one shuffle/sort; final agg keys on (user_id, session_id).
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn("is_new", F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0))
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(wsum).cast("long"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value")
    )


# ---------------------------------------------------------------------------
# Scalar function coverage: json, date_trunc, string/math/conditional fns.
# ---------------------------------------------------------------------------
@register(
    "json_extract_props",
    tags=("F-ext",),
    oracle="""
    SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_bucket,
           count(*) AS n, round(sum(value), 2) AS value_sum
    FROM events
    GROUP BY event_type, k_bucket
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column
    (fixture analog of semi-structured AML txn metadata)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k_bucket", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
    )


@register(
    "date_trunc_daily",
    tags=("F-ext",),
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n, round(avg(value) + 1e-10, 4) AS avg_value
    FROM events
    GROUP BY day, event_type
    """,
)
def date_trunc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup of the event stream (time-bucketed monitoring)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value") + 1e-10, 4).alias("avg_value"))
    )


@register(
    "scalar_function_suite",
    tags=("F1", "F2", "F4", "F5", "F6", "F-ext"),
    oracle="""
    SELECT c_custkey,
           upper(substr(c_name, 1, 8)) AS name8,
           length(c_name) AS name_len,
           round(abs(c_acctbal), 2) AS bal_abs,
           round(greatest(c_acctbal, 0.0), 2) AS bal_pos,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CASE WHEN c_acctbal > 5000 THEN 'high' WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS tier
    FROM customer
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function coverage in one projection: string fns, abs/
    greatest (F6), coalesce/nullif (F2), CASE WHEN tiers (F4)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("name8"),
        F.length("c_name").alias("name_len"),
        F.round(F.abs("c_acctbal"), 2).alias("bal_abs"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("bal_pos"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
        F.when(F.col("c_acctbal") > 5000, "high").when(F.col("c_acctbal") > 0, "mid").otherwise("low").alias("tier"),
    )


@register(
    "regex_array_funcs",
    tags=("F-ext",),
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#0*([0-9]+)$', 1) AS BIGINT) AS name_num,
           regexp_matches(c_name, '^Customer#') AS is_customer,
           len(regexp_split_to_array(c_mktsegment, '')) AS seg_len,
           array_to_string(['seg', lower(c_mktsegment)], ':') AS seg_tag,
           list_contains(['BUILDING', 'MACHINERY'], c_mktsegment) AS industrial
    FROM customer
    """,
)
def regex_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + array-function coverage (SURVEY §2.7 'not present'
    completions): capture-group extraction, boolean match, array
    construction/join/containment — all codegen'd scalar expressions."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#0*([0-9]+)$", 1).cast("long").alias("name_num"),
        F.col("c_name").rlike("^Customer#").alias("is_customer"),
        F.length("c_mktsegment").alias("seg_len"),
        F.array_join(F.array(F.lit("seg"), F.lower("c_mktsegment")), ":").alias("seg_tag"),
        F.array_contains(
            F.array(F.lit("BUILDING"), F.lit("MACHINERY")), F.col("c_mktsegment")
        ).alias("industrial"),
    )


# ---------------------------------------------------------------------------
# Grouping-set extensions (SURVEY §2.4 'not present' list — one-liners).
# ROLLUP and INTERSECT/EXCEPT live in extended_queries
# (rollup_order_totals, set_intersect_users, set_except_users); the
# former duplicates here were merged away in round 2.
# ---------------------------------------------------------------------------
@register(
    "pivot_segment_counts",
    tags=("A-ext",),
    oracle="""
    SELECT c_nationkey,
           CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS AUTOMOBILE,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS BUILDING,
           CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS FURNITURE,
           CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS HOUSEHOLD,
           CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS MACHINERY
    FROM customer GROUP BY c_nationkey
    """,
)
def pivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list so no extra distinct-values job);
    nulls filled with 0 to match the conditional-agg oracle."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    df = _t(spark, sf_dir, "customer").groupBy("c_nationkey").pivot("c_mktsegment", segs).count()
    return df.na.fill(0, segs)


# ---------------------------------------------------------------------------
# W1/W2: global sort + limit with deterministic tiebreak (01:66; 03:59).
# ---------------------------------------------------------------------------
@register(
    "order_limit_top10",
    tags=("W1", "W2"),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def order_limit_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10: Spark plans TakeOrderedAndProject — no full sort
    materialization, each partition contributes its local top-10."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# S5/S6/S7 SQL-string entry: temp view + CTE query (lifecycle §3.1).
# ---------------------------------------------------------------------------
@register(
    "sql_cte_view_entry",
    tags=("S5", "S6", "S7", "F7", "J1"),
    oracle="""
    WITH order_stats AS (
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, s.n_orders, s.total_spend
    FROM customer c JOIN order_stats s ON s.o_custkey = c.c_custkey
    WHERE s.n_orders >= 5
    """,
)
def sql_cte_view_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text entry point: register temp views, run a CTE query —
    the reference's dominant query style (01:51-68 via sql())."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH order_stats AS (
            SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spend
            FROM v_orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, s.n_orders, s.total_spend
        FROM v_customer c JOIN order_stats s ON s.o_custkey = c.c_custkey
        WHERE s.n_orders >= 5
        """
    )


@register(
    "window_decile_ranks",
    tags=("W-ext",),
    oracle="""
    SELECT c_custkey,
           ntile(10) OVER w AS balance_decile,
           round(percent_rank() OVER w, 6) AS balance_pct_rank,
           round(cume_dist() OVER w, 6) AS balance_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_decile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows per segment: decile bucket (ntile),
    percent_rank, cume_dist over account balance — the risk-scoring
    normalization shape (rank an account against its peer segment).
    One shuffle on the partition key serves all three ranks; ties
    break on the key so every engine ranks identically."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(10).over(w).alias("balance_decile"),
        F.round(F.percent_rank().over(w), 6).alias("balance_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("balance_cume_dist"),
    )


def _duck_morton(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({x} & {1 << i}) << {i})")
        terms.append(f"(({y} & {1 << i}) << {i + 1})")
    return "(" + " | ".join(terms) + ")"


@register(
    "zorder_layout_keys",
    tags=("W-ext", "OP"),
    oracle=f"""
    SELECT o_orderkey,
           {_duck_morton("CAST(o_custkey AS BIGINT)",
                         "CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT)")}
               AS zorder_key
    FROM orders
    """,
)
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over (customer, order-day) — the
    write-side data-clustering step (Delta OPTIMIZE ZORDER's core):
    sorting files by this key makes ranges selective in EITHER column
    prune parquet row groups from one layout. Pure codegen'd bit
    interleave (functions.morton_code); the write itself is
    ``df.sort("zorder_key").write`` with any sink."""
    from anti_money_laundering_spark.functions import morton_code

    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.to_timestamp(F.lit("1992-01-01")))
    return o.select(
        "o_orderkey",
        morton_code(F.col("o_custkey"), days.cast("long")).alias("zorder_key"),
    )


@register(
    "unpivot_lineitem_measures",
    tags=("U-ext", "P2"),
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (DataFrame.unpivot / SQL UNPIVOT): the four
    lineitem measures melt into (measure, value) rows — the feature-
    table normalization shape. Narrow transform, no shuffle; the
    column scan stays pruned to the 6 referenced columns."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("measure", "^l_", "").alias("measure"),
        F.round("value", 2).alias("value"),
    )


@register(
    "histogram_equi_height",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH q AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT CAST(CASE WHEN o_totalprice <= q.q1 THEN 1
                WHEN o_totalprice <= q.q2 THEN 2
                WHEN o_totalprice <= q.q3 THEN 3
                ELSE 4 END AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders CROSS JOIN q
    GROUP BY 1
    """,
)
def histogram_equi_height(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height histogram of order value: exact linear-interpolated
    quartiles (percentile, matching quantile_cont) computed in one
    aggregate, then a codegen'd CASE buckets every row — the
    two-pass exact-quantile shape (the one-pass approximate twin is
    percentile_approx with the same calling convention). Bucket
    bounds ride a 1-row broadcast, not a driver constant, so the plan
    is one scan + one tiny cross join + one partial-agg'd groupBy."""
    o = load_table(spark, sf_dir, "orders")
    q = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    p = F.col("o_totalprice")
    bucket = (
        F.when(p <= F.col("q1"), 1)
        .when(p <= F.col("q2"), 2)
        .when(p <= F.col("q3"), 3)
        .otherwise(4)
        .cast("int")
    )
    return (
        o.crossJoin(F.broadcast(q))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min(p), 2).alias("lo"),
            F.round(F.max(p), 2).alias("hi"),
        )
    )


@register(
    "date_function_suite",
    tags=("F-ext",),
    # dayofweek differs by convention (DuckDB Sun=0, Spark Sun=1) —
    # normalized by +1 on the oracle side; add_months clamps to
    # month-end identically in both engines.
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS d_plus30,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS d_plus2m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_epoch95
    FROM orders
    """,
)
def date_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic coverage (SURVEY §2.7 completions): date
    shifting, month arithmetic with end-of-month clamping, calendar
    decomposition (quarter / day-of-week / ISO week), and day diffs —
    all codegen'd scalar expressions over the order dates, the
    time-feature layer every temporal model input starts from."""
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        # dates emitted as ISO strings: Arrow round-trips DateType to
        # datetime64 while DuckDB fetches datetime.date — the hash
        # compare would see '...T00:00:00' vs '...' for equal values
        F.date_format(d, "yyyy-MM-dd").alias("d"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("d_plus30"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("d_plus2m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("iso_week"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch95"),
    )


@register(
    "variant_extract_props",
    tags=("F-ext",),
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.missing') AS absent
    FROM events
    """,
)
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: parse the
    JSON props column once into a variant (binary-encoded, lazily
    navigable — the open-schema answer to repeated get_json_object
    re-parsing) and extract typed fields with variant_get; a missing
    path yields NULL, not an error. The scale rationale vs string
    JSON: one parse per row feeding any number of typed extractions,
    all JVM-side."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").alias("absent"),
    )


@register(
    "map_function_suite",
    tags=("F-ext",),
    # DuckDB map subscript/extract returns a LIST ([] when absent) —
    # [1] unwraps to the value / NULL, matching Spark's
    # try_element_at. Both engines keep map_values in construction
    # order, so values_csv compares without sorting.
    oracle="""
    WITH m AS (
        SELECT event_id,
               map(['type', 'day'],
                   [event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')]) AS mp
        FROM events
    )
    SELECT event_id,
           mp['type'][1] AS mtype,
           mp['missing'][1] AS absent,
           CAST(cardinality(mp) AS INT) AS msize,
           array_to_string(list_sort(map_keys(mp)), ',') AS keys_csv,
           array_to_string(map_values(mp), ',') AS values_csv
    FROM m
    """,
)
def map_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function coverage (SURVEY §2.7's last 'not present' family):
    construction, lookup (try_element_at — NULL on a missing key, not
    an ANSI error), size, key/value extraction — all codegen'd scalar
    expressions over a per-row map."""
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("day"), F.date_format("ts", "yyyy-MM-dd"),
    )
    return ev.select(
        "event_id",
        F.try_element_at(m, F.lit("type")).alias("mtype"),
        F.try_element_at(m, F.lit("missing")).alias("absent"),
        F.size(m).alias("msize"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.array_join(F.map_values(m), ",").alias("values_csv"),
    )


@register(
    "xml_roundtrip_props",
    tags=("F-ext", "S2"),
    # the oracle rebuilds Spark's exact to_xml rendering (ROW root,
    # 4-space indent, one line per field) and echoes the re-parsed
    # fields — serializer format AND parser fidelity sit in one hash.
    # value is rounded to 2 first so double→string formatting agrees
    # between engines.
    oracle="""
    SELECT event_id,
           '<ROW>' || chr(10) ||
           '    <et>' || event_type || '</et>' || chr(10) ||
           '    <v>' || CAST(round(value, 2) AS VARCHAR) || '</v>' || chr(10) ||
           '</ROW>' AS xml,
           event_type AS et,
           round(value, 2) AS v
    FROM events
    """,
)
def xml_roundtrip_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar functions (Spark 4's to_xml/from_xml — the last
    serialization format next to CSV/JSON/ORC/parquet/VARIANT):
    serialize (event_type, value) per event to XML, parse it back with
    an explicit schema, and emit both the wire string and the
    round-tripped fields."""
    ev = _t(spark, sf_dir, "events")
    xml = F.to_xml(
        F.struct(
            F.col("event_type").alias("et"), F.round("value", 2).alias("v")
        )
    )
    return (
        ev.select("event_id", xml.alias("xml"))
        .select(
            "event_id",
            "xml",
            F.from_xml("xml", "et string, v double").alias("__s"),
        )
        .select("event_id", "xml", F.col("__s.et").alias("et"), F.col("__s.v").alias("v"))
    )


@register(
    "rank_distribution_orders",
    tags=("W-ext",),
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(10) OVER w AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def rank_distribution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three SQL-standard rank-DISTRIBUTION window functions —
    ntile / percent_rank / cume_dist — over each priority class's
    price order: the decile bucketing and percentile features behind
    score calibration and per-segment price positioning (rank/
    row_number/lag cover the rest of the window family elsewhere in
    the catalog). Determinism: the (price, orderkey) sort key is
    unique, so ntile's ceil/floor bucket split, percent_rank's
    (rank-1)/(n-1) and cume_dist's rank/n divide IDENTICAL integers on
    both engines — the raw doubles hash-verify with no rounding at
    all. One shuffle on the partition key.

    Scale caveat (honest): o_orderpriority has 5 values, so at 100 TB
    each window partition is ~1/5 of the table sorted in ONE task —
    the low-cardinality-partition hazard every distribution window
    carries. The engine's scale path for that regime is
    sampling.dense_index (range-repartitioned distributed rank; rank
    plus a broadcast per-group count reconstructs all three functions
    without a single-task sort); this query keeps the builtin
    formulation because it is the SQL-surface parity exhibit."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "regex_scalar_suite",
    tags=("F-ext",),
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vowel_runs,
           CAST(length(regexp_replace(text, '[ae]+', '#', 'g')) AS BIGINT) AS squashed_len,
           regexp_extract(text, '([a-z]{5,})', 1) AS first_long_word,
           regexp_matches(text, '^key') AS starts_key
    FROM documents
    """,
)
def regex_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression scalar surface (extract / global replace /
    match count / boolean match) over the document corpus — the
    pattern toolkit behind PII scrubbing, template stripping and
    boilerplate screens (curation.pii_redact uses the same builtins;
    this suite attests their parity in isolation). Dialect care: the
    patterns stay in the character-class subset Java regex and RE2
    share, Spark's regexp_replace is global by default where DuckDB
    needs the 'g' flag, and regexp_count pairs with DuckDB's
    len(regexp_extract_all). All codegen'd scans — zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]+")).cast("long").alias("vowel_runs"),
        F.length(F.regexp_replace("text", "[ae]+", "#")).cast("long").alias("squashed_len"),
        F.regexp_extract("text", "([a-z]{5,})", 1).alias("first_long_word"),
        F.col("text").rlike("^key").alias("starts_key"),
    )
