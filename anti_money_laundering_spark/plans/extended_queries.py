"""Coverage completions (SURVEY.md §2 "not present in the reference"
rows, exposed because they're one-liners on Spark and the natural next
asks of an AML analyst): INTERSECT/EXCEPT, rollup/cube grouping sets,
approx_count_distinct, the reference's structuring-levels composite
(motif → entity names), and exact embedding near-dup pairs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.plans.fixture_graphs import FLOW_EDGES_SQL, flow_graph
from anti_money_laundering_spark.sources import load_table
from anti_money_laundering_spark.vector import cosine_pairs_blas


@register(
    "set_intersect_users",
    tags=("U-ext",),
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): users who both click and buy."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "set_except_users",
    tags=("U-ext",),
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200.0
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 200.0
    """,
)
def set_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): big-ticket purchasers with no big-ticket
    clicks. (Every fixture user has every event type, so the
    unfiltered variant is trivially empty.)"""
    ev = load_table(spark, sf_dir, "events")
    buys = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 200.0)).select("user_id")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("value") > 200.0)).select("user_id")
    return buys.subtract(clicks)  # EXCEPT DISTINCT (exceptAll = bag difference)


@register(
    "rollup_order_totals",
    tags=("A-ext",),
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (status, priority) -> (status) -> ()."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "cube_lineitem_flags",
    tags=("A-ext",),
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS rflag,
           coalesce(l_linestatus, '<all>') AS lstatus,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping sets over (returnflag, linestatus)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("lstatus"),
            "n",
        )
    )


@register(
    "approx_distinct_parts",
    tags=("A-ext",),
    # r6 verdict item 4: HLL sketch values differ across engines, so the
    # raw estimate can't hash-match — but the sketch's CONTRACT can. Both
    # sides emit the exact distinct count plus a boolean pinning the
    # estimate inside 5% relative error (2.5x the rsd=0.02 sketch
    # parameter); the oracle asserts the boolean as literal TRUE, so any
    # supplier whose HLL++ estimate drifts out of bound flips the hash.
    oracle="""
    SELECT l_suppkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_suppkey
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per supplier — the
    cardinality sketch for 100TB-scale distinct counting (exact
    distinct of a high-cardinality key is a full shuffle; HLL is one
    pass, mergeable, constant memory). For attestation the query also
    computes the exact count and emits |approx-exact|/exact <= 0.05 as
    a hash-covered boolean (the sketch estimate itself is
    engine-specific and stays out of the compared columns).

    r14 (guide §2.3): mixing countDistinct with the HLL in one agg made
    Spark's single-distinct rewrite evaluate partial_approx_count_
    distinct per (suppkey, partkey) group and shuffle the 410-word
    sketch buffer FOR EVERY DISTINCT PAIR (a 412-column exchange,
    ~3 KB/row; a plain ``.distinct()`` re-fuses into the same shape).
    Repartitioning by supplier first makes that the ONLY exchange —
    hashpartitioning(l_suppkey) satisfies both the pair dedup and the
    supplier aggregate, so the shuffle carries two bigints per raw row
    and every sketch lives and dies inside one post-shuffle stage. HLL
    insertion is idempotent (multiset sketch == set sketch), so the
    estimate is bit-identical (same inserted hash set -> same
    registers). Trade recorded: the narrow exchange drops partial
    map-side dedup, but raw pairs are ~200x smaller than the sketch
    rows they replace; a pathologically hot supplier concentrates on
    one reducer — suppliers scale with the dataset, and the 0.02-rsd
    use case is per-supplier cardinality, so the key is never
    constant."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .repartition("l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("l_suppkey")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
            F.count(F.lit(1)).alias("exact_parts"),
        )
        .select(
            "l_suppkey",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("within_bound"),
        )
    )


@register(
    "structuring_alerts_named",
    tags=("G5", "J2", "J6"),
    oracle=f"""
    WITH edges AS ({FLOW_EDGES_SQL})
    SELECT 'user_' || CAST(e1.src AS VARCHAR) AS a_name,
           'user_' || CAST(e2.src AS VARCHAR) AS b_name,
           'user_' || CAST(e1.dst AS VARCHAR) AS mule_name,
           'user_' || CAST(e3.dst AS VARCHAR) AS sink_name,
           round(e1.amount + e2.amount, 2) AS in_amount
    FROM edges e1
    JOIN edges e2 ON e2.dst = e1.dst
    JOIN edges e3 ON e3.src = e1.dst
    WHERE e1.src < e2.src AND e1.amount + e2.amount > 400.0
    """,
)
def structuring_alerts_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's structuring_levels composite (motif matches
    joined back to entity names, 01_aml_network_analysis.py:331-358):
    fan-in motif -> per-vertex name enrichment -> alert rows."""
    g = flow_graph(spark, sf_dir)
    m = g.find("(a)-[e1]->(c); (b)-[e2]->(c); (c)-[e3]->(g)")
    alerts = m.filter(
        (F.col("a.id") < F.col("b.id"))
        & (F.col("e1.amount") + F.col("e2.amount") > 400.0)
    )
    name = lambda v: F.concat(F.lit("user_"), F.col(f"{v}.id").cast("string"))  # noqa: E731
    return alerts.select(
        name("a").alias("a_name"),
        name("b").alias("b_name"),
        name("c").alias("mule_name"),
        name("g").alias("sink_name"),
        F.round(F.col("e1.amount") + F.col("e2.amount"), 2).alias("in_amount"),
    )


@register(
    "near_dup_embeddings",
    tags=("LLM", "dedup", "ann"),
    # threshold applies to the ROUNDED cosine on both sides (oracle
    # discipline): an ulp-of-0.4 pair must land on the same side in
    # both engines.
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
               AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
    """,
)
def near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (>= 0.4 — the fixture
    vectors' p99.9 pairwise cosine is 0.38, so 0.8 would be a
    trivially-empty parity check), exact via the broadcast-matrix GEMM
    (cosine_pairs_blas): each Arrow batch scores against the broadcast
    normalized corpus in one BLAS matmul and emits only surviving
    pairs — no n^2 pair set, no embedding payload in any shuffle. At
    corpus scale the LSH-bucketed path (ann_lsh_topk machinery)
    generates candidates instead of the exact all-pairs scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_blas(
        emb, id_col="vec_id", vec_col="embedding", min_cosine=0.4, threshold_round=6
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _embedding_cluster_oracle() -> str:
    # deferred import: llm_queries registers catalog entries on import,
    # and both modules are loaded together by get_catalog()
    from anti_money_laundering_spark.plans.llm_queries import DUCK_CLUSTER_CTES

    return f"""
    WITH RECURSIVE jp AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
    ), {DUCK_CLUSTER_CTES}
    SELECT id AS doc_id, component AS cluster_id, id = component AS keep FROM comp
    """


@register(
    "exists_correlated_suppliers",
    tags=("J4",),
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_extendedprice > 9500)
    """,
)
def exists_correlated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery with an extra predicate — Catalyst
    decorrelates it to a left-semi join (SURVEY §4 O2,
    RewritePredicateSubquery), the same rewrite the reference leans on
    for its IN-subqueries (01:53-67)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_extendedprice > 9500)
        """
    )


@register(
    "scalar_subquery_above_avg",
    tags=("J4", "A1"),
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: customers above the global mean
    balance — Catalyst executes the subquery once and broadcasts the
    scalar into the filter (no join, no second scan in the main
    plan)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@register(
    "lateral_explode_props",
    tags=("F-ext",),
    oracle="""
    SELECT event_id, k AS key, CAST(json_extract(props, '$.' || k) AS BIGINT) AS value
    FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
    """,
)
def lateral_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral one-to-many expansion: the JSON props map exploded to
    (event_id, key, value) rows — from_json to a typed map then
    explode, the generate-operator shape (no shuffle; row-local
    fan-out)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "value"),
    )


@register(
    "ml_feature_pipeline",
    tags=("ml",),
    # StringIndexer frequencyDesc = rank by (count DESC, value ASC) - 1
    # (MLlib's documented alphabetical tie-break); MinMaxScaler =
    # (x - min) / (max - min). Both fits are closed-form, so the whole
    # fitted Pipeline replays as SQL.
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment AS v, count(*) AS n FROM customer GROUP BY 1
    ),
    idx AS (
        SELECT v, CAST(dense_rank() OVER (ORDER BY n DESC, v) - 1 AS DOUBLE)
                   AS seg_idx
        FROM seg
    ),
    mm AS (SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer)
    SELECT c_custkey,
           idx.seg_idx AS c_mktsegment_idx,
           round((c_acctbal - mm.lo) / (mm.hi - mm.lo), 6) AS c_acctbal_scaled
    FROM customer CROSS JOIN mm JOIN idx ON customer.c_mktsegment = idx.v
    """,
)
def ml_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted MLlib feature-engineering Pipeline (StringIndexer +
    VectorAssembler + MinMaxScaler) over customer: the deterministic
    half of the MLlib surface, hash-verified end-to-end — the
    fit/transform contract the LBFGS classifier (ml_embedding_
    classifier, rows-only) builds on."""
    from anti_money_laundering_spark.ml import feature_pipeline_features

    cust = load_table(spark, sf_dir, "customer")
    out = feature_pipeline_features(cust, "c_custkey", "c_mktsegment", "c_acctbal")
    return out.select(
        "c_custkey",
        "c_mktsegment_idx",
        F.round("c_acctbal_scaled", 6).alias("c_acctbal_scaled"),
    )


@register(
    "near_dup_embedding_clusters",
    tags=("LLM", "dedup", "ann", "G4"),
    oracle=_embedding_cluster_oracle(),
)
def near_dup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-modality dedup end-to-end: exact cosine pairs (the
    GEMM path above) -> transitive clusters -> deterministic survivor,
    the same pairs->components->keep composition as the text pipeline
    (dedup_near_clusters) — one clustering operator serves every
    similarity modality."""
    from anti_money_laundering_spark.dedup import near_duplicate_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_blas(
        emb, id_col="vec_id", vec_col="embedding", min_cosine=0.4, threshold_round=6
    )
    return near_duplicate_clusters(pairs)


@register(
    "benford_digit_scores",
    tags=("A-ext", "F-ext"),
    oracle="""
    WITH digits AS (
        SELECT o_custkey,
               CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT o_custkey, d, count(*) AS n,
               sum(count(*)) OVER (PARTITION BY o_custkey) AS total
        FROM digits GROUP BY o_custkey, d
    ),
    scored AS (
        SELECT o_custkey, total,
               sum(pow(n * 1.0 / total - log10(1.0 + 1.0 / d), 2)
                   / log10(1.0 + 1.0 / d)) AS chi2
        FROM obs GROUP BY o_custkey, total
    )
    SELECT o_custkey, CAST(total AS BIGINT) AS n_orders,
           round(chi2, 6) AS benford_score
    FROM scored WHERE total >= 10
    """,
)
def benford_digit_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance per customer — the classic statistical
    AML screen: natural transaction amounts follow P(first digit d) =
    log10(1 + 1/d); fabricated or structured amounts don't. Score =
    chi-square-style deviation of the observed first-digit histogram
    from Benford, for customers with >= 10 orders. Two partial-agg'd
    groupBys + one window, all keyed on customer — no joins, no UDFs.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = F.substring(F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1).cast("long")
    digits = o.select("o_custkey", d.alias("d"))
    from pyspark.sql import Window as W

    obs = (
        digits.groupBy("o_custkey", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("total", F.sum("n").over(W.partitionBy("o_custkey")))
    )
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    scored = obs.groupBy("o_custkey", "total").agg(
        F.sum(F.pow(F.col("n") / F.col("total") - exp, 2) / exp).alias("chi2")
    )
    return scored.filter(F.col("total") >= 10).select(
        "o_custkey",
        F.col("total").cast("long").alias("n_orders"),
        F.round("chi2", 6).alias("benford_score"),
    )


@register(
    "funnel_conversion",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH t1 AS (
        SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts
        FROM events GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, t1.view_ts, min(e.ts) AS click_ts
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.view_ts
        GROUP BY e.user_id, t1.view_ts
    ),
    t3 AS (
        SELECT e.user_id, t2.view_ts, t2.click_ts, min(e.ts) AS purchase_ts
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.click_ts
        GROUP BY e.user_id, t2.view_ts, t2.click_ts
    )
    SELECT t1.user_id, t1.view_ts, t2.click_ts, t3.purchase_ts,
           CAST(CASE WHEN t3.purchase_ts IS NOT NULL THEN 3
                     WHEN t2.click_ts IS NOT NULL THEN 2
                     WHEN t1.view_ts IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS steps_completed
    FROM t1 LEFT JOIN t2 ON t2.user_id = t1.user_id
            LEFT JOIN t3 ON t3.user_id = t1.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis per user: earliest view, the earliest
    click strictly AFTER it, the earliest purchase strictly after
    that — the strict-sequence conversion measure (an unordered
    count would credit click-before-view journeys). Three stacked
    conditional window mins over ONE user partitioning — a single
    shuffle, no self-joins; the oracle spells the same semantics as
    chained CTEs."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    t = F.col("ts")
    typ = F.col("event_type")
    step1 = F.min(F.when(typ == "view", t)).over(w)
    out = ev.withColumn("view_ts", step1)
    step2 = F.min(F.when((typ == "click") & (t > F.col("view_ts")), t)).over(w)
    out = out.withColumn("click_ts", step2)
    step3 = F.min(F.when((typ == "purchase") & (t > F.col("click_ts")), t)).over(w)
    out = out.withColumn("purchase_ts", step3)
    return (
        out.groupBy("user_id")
        .agg(
            F.first("view_ts").alias("view_ts"),
            F.first("click_ts").alias("click_ts"),
            F.first("purchase_ts").alias("purchase_ts"),
        )
        .select(
            "user_id", "view_ts", "click_ts", "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .when(F.col("view_ts").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("steps_completed"),
        )
    )


@register(
    "peak_concurrent_windows",
    tags=("W-ext",),
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS lo, ts + INTERVAL 2 HOUR AS hi
        FROM events WHERE event_type = 'purchase'
    ),
    pts AS (
        SELECT user_id, lo AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT user_id, hi, -1 FROM iv
    ),
    sweep AS (
        SELECT user_id,
               sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS live
        FROM pts
    )
    SELECT user_id, CAST(max(live) AS INT) AS peak_concurrent
    FROM sweep GROUP BY user_id
    """,
)
def peak_concurrent_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval overlap per user (sweep line as a window): each
    purchase opens a 2-hour exposure window; +1/-1 boundary points,
    one running sum ordered by (time, delta) — ends sort before the
    starts they touch, so back-to-back [t, t+w) windows don't fake an
    overlap — and the max of the running count is the answer. The
    velocity-burst measure a theta self-join would answer
    quadratically; this is one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    iv = ev.select(
        "user_id", F.col("ts").alias("lo"), (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi")
    )
    pts = iv.select("user_id", F.col("lo").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select("user_id", F.col("hi").alias("t"), F.lit(-1).alias("delta"))
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        pts.withColumn("live", F.sum("delta").over(w))
        .groupBy("user_id")
        .agg(F.max("live").cast("int").alias("peak_concurrent"))
    )


@register(
    "cohort_retention",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INT)
                   AS weeks_since
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort_week, weeks_since,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_week, weeks_since
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted once per (cohort, weeks-since-first) cell — the retention
    triangle. First-week assignment is a window min (one shuffle on
    user), the distinct cell membership a partial-agg'd distinct; no
    self-join of events against events."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    w = W.partitionBy("user_id")
    cells = (
        ev.select("user_id", week.alias("wk"))
        .withColumn("cohort_week", F.min("wk").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int").alias("weeks_since"),
        )
        .distinct()
    )
    return cells.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )


@register(
    "event_transition_matrix",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition counts: for each user's
    time-ordered event stream, how often each event type follows each
    other type — the Markov-chain fingerprint that behavioral-drift
    monitors compare across periods (an account that suddenly chains
    purchase→purchase→purchase looks nothing like its view→click
    history). One lag window per user (ties broken on event_id so
    every engine orders identically) + one partial-agg'd groupBy."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@register(
    "approx_quantiles_prices",
    tags=("A-ext",),
    # Greenwald-Khanna sketch internals are engine-specific (DuckDB's
    # approx_quantile is t-digest), so the raw estimates can't
    # hash-match — but (mid-r7, mirroring approx_distinct_parts) the
    # sketch's CONTRACT can: each approx value must land between the
    # exact quantiles at p +/- 0.01 (100x the accuracy=10000 rank-error
    # guarantee, so host-independent). Both sides emit hash-stable
    # anchors (count, min, max on the 2-decimal price grid) plus the
    # three booleans; the oracle asserts them literal TRUE, so a sketch
    # drifting out of bound flips the hash. The tighter n/accuracy rank
    # bound stays pinned in
    # tests/test_operators.py::test_approx_quantiles_rank_error_bound.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM orders
    """,
)
def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass mergeable quantile sketch (percentile_approx,
    Greenwald-Khanna): the P50/P90/P99 of order value with relative
    rank error <= 1/accuracy — the sketch family's answer when an
    exact percentile's full sort/shuffle is the bottleneck (the exact
    twin is histogram_equi_height's percentile pass). For attestation
    the query also computes the exact quantile brackets at p +/- 0.01
    (one bounded single-column agg, test-scale only) and emits
    bracket-containment booleans — the estimates themselves are
    engine-specific and stay out of the compared columns."""
    o = load_table(spark, sf_dir, "orders")
    brackets = F.expr(
        "percentile(o_totalprice, array(0.49, 0.51, 0.89, 0.91, 0.98, 1.0))"
    ).alias("__b")
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("__p50"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("__p90"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("__p99"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        brackets,
    )

    def _ok(approx: str, lo_i: int, hi_i: int) -> Column:
        b = F.col("__b")
        return (F.col(approx) >= b[lo_i] - 1e-6) & (F.col(approx) <= b[hi_i] + 1e-6)

    return row.select(
        "n_orders",
        "min_price",
        "max_price",
        _ok("__p50", 0, 1).alias("p50_ok"),
        _ok("__p90", 2, 3).alias("p90_ok"),
        _ok("__p99", 4, 5).alias("p99_ok"),
    )


@register(
    "time_rollup_events",
    tags=("A-ext", "W-ext"),
    oracle="""
    SELECT 'hour' AS grain, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
           CAST(count(*) AS BIGINT), round(sum(value), 2)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'month', strftime(date_trunc('month', ts), '%Y-%m-%d %H:%M:%S'),
           CAST(count(*) AS BIGINT), round(sum(value), 2)
    FROM events GROUP BY 2
    """,
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour/day/month
    event buckets maintained from ONE scan of the fact table via
    GROUPING SETS (operators.time_rollup) — the multi-granularity
    time-series summary a per-grain job chain would read the 100 TB
    fact table three times for. Shuffled rows are bounded by distinct
    buckets x grains after map-side partial aggregation."""
    from anti_money_laundering_spark.operators import time_rollup

    e = load_table(spark, sf_dir, "events")
    return time_rollup(
        e,
        "ts",
        ["hour", "day", "month"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


@register(
    "set_intersect_all_pairs",
    tags=("U-ext",),
    oracle="""
    SELECT user_id, CAST(floor(value) AS INT) AS v FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id, CAST(floor(value) AS INT) FROM events WHERE event_type = 'view'
    """,
)
def set_intersect_all_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two
    sides, vs INTERSECT's dedup): (user, int-bucketed value) rows
    occurring as both clicks and views, kept once per matched
    occurrence. DataFrame face: intersectAll."""
    ev = load_table(spark, sf_dir, "events")
    pair = lambda t: (  # noqa: E731
        ev.filter(F.col("event_type") == t).select(
            "user_id", F.floor("value").cast("int").alias("v")
        )
    )
    return pair("click").intersectAll(pair("view"))


@register(
    "set_except_all_pairs",
    tags=("U-ext",),
    oracle="""
    SELECT user_id, CAST(floor(value) AS INT) AS v FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id, CAST(floor(value) AS INT) FROM events WHERE event_type = 'view'
    """,
)
def set_except_all_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — each left occurrence cancels at
    most one right occurrence, vs EXCEPT's dedup): click (user,
    int-bucketed value) rows surviving after removing one per matching
    view row. DataFrame face: exceptAll."""
    ev = load_table(spark, sf_dir, "events")
    pair = lambda t: (  # noqa: E731
        ev.filter(F.col("event_type") == t).select(
            "user_id", F.floor("value").cast("int").alias("v")
        )
    )
    return pair("click").exceptAll(pair("view"))
