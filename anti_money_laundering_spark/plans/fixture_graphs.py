"""Graph views derived from the driver fixtures (FIXTURES.md §B mapping).

Three graphs mirror the reference's two (identity graph
01_aml_network_analysis.py:91-109; transaction graph 01:264-294), with
matching SQL snippets so DuckDB oracles see byte-identical edge sets:

- **txn graph** (bipartite customer→supplier): orders ⋈ lineitem,
  src=o_custkey, dst=1000000+l_suppkey, amount=l_extendedprice;
- **flow graph** (homogeneous, cycle-bearing): events rows as directed
  value transfers user_id → props.k (both live in 0..149), sparsified
  by an amount threshold so motif joins stay selective;
- **identity graph** (bipartite customer→attribute): customers linked
  to (nation,segment)-combo vertices and acctbal-bucket vertices —
  shared attribute values connect customers exactly like the
  reference's shared email/phone/address edges (01:91-107).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.graph import Graph
from anti_money_laundering_spark.sources import load_table

# ---- transaction graph -----------------------------------------------------

TXN_EDGES_SQL = """
    SELECT o_custkey AS src,
           1000000 + l_suppkey AS dst,
           l_orderkey * 10 + l_linenumber AS txn_id,
           l_extendedprice AS amount
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def txn_graph(spark: SparkSession, sf_dir: str) -> Graph:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("txn_id"),
            F.col("l_extendedprice").alias("amount"),
        )
    )
    vertices = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    return Graph(vertices, edges)


# ---- flow graph ------------------------------------------------------------

FLOW_THRESHOLD = 140.0

FLOW_EDGES_SQL = f"""
    SELECT user_id AS src,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst,
           event_id AS txn_id,
           value AS amount,
           ts
    FROM events WHERE value > {FLOW_THRESHOLD}
"""


def flow_graph(spark: SparkSession, sf_dir: str) -> Graph:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > FLOW_THRESHOLD)
    edges = ev.select(
        F.col("user_id").alias("src"),
        F.get_json_object("props", "$.k").cast("long").alias("dst"),
        F.col("event_id").alias("txn_id"),
        F.col("value").alias("amount"),
        F.col("ts"),
    )
    vertices = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    return Graph(vertices, edges)


# ---- identity graph --------------------------------------------------------

_SEG_CASE_SQL = """CASE c_mktsegment
        WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
        WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END"""

IDENTITY_EDGES_SQL = f"""
    SELECT c_custkey AS src,
           CAST(1000000 + c_nationkey * 10 + {_SEG_CASE_SQL} AS BIGINT) AS dst
    FROM customer
    UNION ALL
    SELECT c_custkey AS src,
           CAST(2000000 + floor(c_acctbal / 1000) AS BIGINT) AS dst
    FROM customer
"""


def identity_graph(spark: SparkSession, sf_dir: str) -> Graph:
    cust = load_table(spark, sf_dir, "customer")
    seg_code = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 0)
        .when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "FURNITURE", 2)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 3)
        .otherwise(4)
    )
    combo = cust.select(
        F.col("c_custkey").alias("src"),
        (F.lit(1000000) + F.col("c_nationkey") * 10 + seg_code).cast("long").alias("dst"),
    )
    bucket = cust.select(
        F.col("c_custkey").alias("src"),
        (F.lit(2000000) + F.floor(F.col("c_acctbal") / 1000)).cast("long").alias("dst"),
    )
    edges = combo.unionAll(bucket)
    persons = cust.select(F.col("c_custkey").alias("id"), F.lit("Person").alias("type"))
    attrs = edges.select(F.col("dst").alias("id")).distinct().withColumn("type", F.lit("Attribute"))
    return Graph(persons.unionAll(attrs), edges)
