"""Catalog entries for the r7-continuation operators: bounded-memory
heavy hitters, reaggregatable HLL rollups, the interval-overlap join
and the edit-distance (SymSpell) similarity join.

Each query is the operator's fixture-scale exemplar; the operators
themselves live in ``sketch.py`` and ``operators/``. Oracle patterns
follow FIXTURES.md §B (identical aliases both sides, floats rounded,
DuckDB HUGEINT counts cast back to BIGINT, engine-specific sketch
values attested via pinned-bound booleans, timestamps compared raw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.functions import tokens
from anti_money_laundering_spark.operators import edit_distance_join, interval_overlap_join
from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.plans.llm_queries import _DUCK_TOKS
from anti_money_laundering_spark.sketch import heavy_hitters
from anti_money_laundering_spark.sources import load_table

#: Token share above which a term is a corpus heavy hitter. Fixture
#: probe (threshold rule, SKILL §r4): the synthetic vocabulary is 31
#: terms with a ~1000:1 head; 0.003 keeps 30 terms at sf0.001/0.01/0.1
#: alike (the floor sits between the body and the one rare tail term).
_HH_PHI = 0.003


@register(
    "heavy_hitter_tokens",
    tags=("OP", "A-ext", "LLM", "text"),
    oracle=f"""
    WITH toks AS (SELECT unnest({_DUCK_TOKS}) AS term FROM documents),
    t AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM t)
    SELECT term, cnt, total FROM t, tot WHERE cnt > {_HH_PHI} * total
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitter corpus terms (share > 0.3%) via the
    two-pass candidate filter + exact recount (sketch.heavy_hitters,
    default two-hash count-min bucket method — all JVM codegen): the
    vocabulary-head query that at 100 TB never shuffles the full
    distinct-term set — the histogram pass shuffles at most
    2*num_buckets rows per partition and the recount only candidate
    keys. Output is provably identical to the GROUP BY/HAVING
    formulation the oracle runs."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens("text")).alias("term"))
    return heavy_hitters(terms, ["term"], phi=_HH_PHI)


@register(
    "hll_rollup_users",
    tags=("A-ext", "W-ext"),
    # Engine-specific sketch bytes can't hash-match; the sketch CONTRACT
    # can (the approx_distinct_parts pattern): both sides emit the exact
    # weekly distinct count plus a boolean pinning the merged-sketch
    # estimate inside 5% relative error (~3x the lgConfigK=12 Datasketches
    # HLL rse). Any engine whose day->week sketch MERGE drifts flips the
    # hash.
    oracle="""
    SELECT event_type, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY 1, 2
    """,
)
def hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reaggregatable distinct-user rollup: per-(event_type, day) HLL
    sketches (``hll_sketch_agg``) merged WITHOUT rescanning the fact
    table to the week grain via ``hll_union_agg`` — the hypertable /
    materialized-rollup pattern for 100 TB distinct counting, where the
    day sketches are the stored artifact and every coarser grain is a
    cheap sketch union (an exact weekly COUNT DISTINCT would re-shuffle
    every (week, user) pair). Attestation: the merged estimate is
    compared against the exact count computed alongside and pinned
    inside 5% relative error; the estimate itself stays out of the
    compared columns."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.date_trunc("day", "ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = (
        daily.groupBy("event_type", F.date_trunc("week", "day").alias("wk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__approx"))
    )
    exact = (
        ev.groupBy("event_type", F.date_trunc("week", "day").alias("wk"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        weekly.join(exact, ["event_type", "wk"])
        .select(
            "event_type",
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_bound"),
        )
    )


@register(
    "overlap_sessions_pairs",
    tags=("OP", "range"),
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           greatest(c.ts, p.ts) AS overlap_start
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND greatest(c.ts, p.ts) < least(c.ts + INTERVAL 30 MINUTE,
                                      p.ts + INTERVAL 30 MINUTE)
    """,
)
def overlap_sessions_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-activity windows: each click and purchase opens a
    30-minute interval; emit every same-user pair whose intervals
    OVERLAP (half-open, nonempty intersection) — the temporal overlap
    join. Bucketized onto 30-minute buckets and equi-joined on
    (user_id, bucket) with the overlap predicate as residual; each pair
    survives only in the bucket containing its overlap start, so there
    is no DISTINCT de-duplication shuffle
    (operators.interval_overlap_join)."""
    ev = load_table(spark, sf_dir, "events")
    half_hour = F.expr("INTERVAL 30 MINUTES")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_lo"),
        (F.col("ts") + half_hour).alias("c_hi"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_lo"),
        (F.col("ts") + half_hour).alias("p_hi"),
    )
    out = interval_overlap_join(
        clicks,
        purchases,
        by=["user_id"],
        left_span=("c_lo", "c_hi"),
        right_span=("p_lo", "p_hi"),
        bucket_width_seconds=1800,
    )
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.greatest("c_lo", "p_lo").alias("overlap_start"),
    )


@register(
    "fuzzy_name_pairs",
    tags=("OP", "J-ext", "E2"),
    oracle="""
    SELECT a.c_mktsegment, a.c_custkey AS id_l, b.c_custkey AS id_r,
           a.c_name AS c_name_l, b.c_name AS c_name_r,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM customer a JOIN customer b
      ON a.c_mktsegment = b.c_mktsegment AND a.c_custkey < b.c_custkey
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-segment customer pairs whose names are within edit distance
    1 — the exact similarity self-join via SymSpell deletion-
    neighborhood blocking + levenshtein verify
    (operators.edit_distance_join): candidates meet on a shared
    deletion variant (equi-join, never the per-segment cartesian the
    oracle is allowed to run at fixture scale). Each unordered pair is
    reported once (id_l < id_r)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", F.col("c_name").alias("name")
    )
    left = cust.withColumnRenamed("c_custkey", "id_l")
    right = cust.withColumnRenamed("c_custkey", "id_r")
    out = edit_distance_join(
        left, right, on="name", max_distance=1, by=["c_mktsegment"]
    )
    return out.filter(F.col("id_l") < F.col("id_r")).select(
        "c_mktsegment",
        "id_l",
        "id_r",
        F.col("name_l").alias("c_name_l"),
        F.col("name_r").alias("c_name_r"),
        "dist",
    )


@register(
    "watchlist_screen_hits",
    tags=("OP", "J-ext", "E2"),
    # Cartesian-with-prefilter oracle is fixture-legal (the list side
    # is ~0.5% of customers); the Spark side must never run it.
    oracle="""
    SELECT w.c_custkey AS list_id, w.c_name AS list_name,
           c.c_custkey AS cust_id, c.c_name AS cust_name,
           CAST(levenshtein(w.c_name, c.c_name) AS INTEGER) AS dist
    FROM customer w JOIN customer c
      ON abs(length(w.c_name) - length(c.c_name)) <= 1
     AND levenshtein(w.c_name, c.c_name) <= 1
    WHERE w.c_custkey % 199 = 0
    """,
)
def watchlist_screen_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watchlist name screening (the sanctions/PEP check every AML
    program runs): the FULL customer base screened against a watchlist
    at edit distance <= 1 — exact hits (dist 0: the listed entity IS a
    customer) and fuzzy hits (dist 1: the one-character variations a
    transliteration or deliberate typo produces). The watchlist is a
    deterministic ~0.5% slice (c_custkey % 199 == 0) standing in for
    an external sanctions feed; 1 / 8 / 76 list entries produce
    20 / 219 / 2,738 hits at sf0.001 / 0.01 / 0.1 (FIXTURES.md
    threshold rule — fuzzy hits dominate at every SF).

    Distinct from ``fuzzy_name_pairs`` (the symmetric same-segment
    dedup pair-join): screening is ASYMMETRIC probe-vs-list with no
    blocking key (a sanctions check must not block on segment), keeps
    self-matches (a listed entity appearing as a customer is the
    primary hit), and reports per-(list entry, customer) rows.

    Scale posture: the same SymSpell deletion-neighborhood equi-join
    (operators.edit_distance_join) — the tiny list side explodes to
    ~(L+1) variants per entry and broadcast-joins the probe side's
    variants; the exact levenshtein verify runs on candidates only,
    never the |list| x |customers| cartesian the oracle is allowed at
    fixture scale."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_name").alias("name")
    )
    watch = cust.filter(F.col("c_custkey") % 199 == 0).select(
        F.col("c_custkey").alias("list_id"), "name"
    )
    probe = cust.select(F.col("c_custkey").alias("cust_id"), "name")
    out = edit_distance_join(watch, probe, on="name", max_distance=1)
    return out.select(
        "list_id",
        F.col("name_l").alias("list_name"),
        "cust_id",
        F.col("name_r").alias("cust_name"),
        "dist",
    )


@register(
    "bloom_prefilter_revenue",
    tags=("OP", "J4", "A-ext"),
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def bloom_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of line items belonging to urgent orders via a
    hand-rolled Bloom semi-join reduction (sketch.bloom_semi_join):
    build the filter over the selective dim keys distributedly
    (bit_or over 64-bit words, <= num_bits/64 shuffled rows per
    partition), probe the fact table with a codegen'd literal-bitmap
    predicate BEFORE the exact semi join, so at 100 TB the join input
    is already pruned to ~the matching fraction plus the bloom's
    false-positive rate. Output is provably identical to the plain
    IN-subquery the oracle runs (false positives are re-checked by the
    exact semi join; the bloom has no false negatives by
    construction — pinned in tests/test_sketch_ops.py)."""
    from anti_money_laundering_spark.sketch import bloom_semi_join

    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = bloom_semi_join(li, ["l_orderkey"], urgent, ["o_orderkey"], num_bits=1 << 18)
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )
