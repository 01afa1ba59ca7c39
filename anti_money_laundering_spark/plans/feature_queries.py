"""Feature-engineering surface: the operators a training-data /
feature pipeline runs between raw events and model input — SCD2
history build, exact rolling medians, calendar-spine gap-filling,
market-basket co-occurrence, BM25 relevance ranking, weighted
deterministic sampling, and per-entity z-score anomaly screens.

None of these exist in the reference (its notebooks stop at graph /
linkage analytics); they're the natural next asks of the same AML
analyst (z-score screens, SCD2 entity history) and of the LLM-pipeline
owner the engine also serves (BM25 retrieval, weighted data mixes).

Scale notes (100 TB discipline):
- every query is pure DataFrame/SQL — no Python UDFs, no collects;
  scalar corpus statistics (max price, avg doclen) travel as
  broadcast cross-joins of 1-row aggregates, never driver round-trips;
- window queries shuffle ONCE on their partition key; the SCD2 build
  reuses the same (user) partitioning for both its windows;
- co-occurrence pair fan-out is bounded by the itemset width (5 event
  types -> <=10 pairs per basket), the classic market-basket guard —
  generated from the per-basket itemset array, not a self-join;
- weighted sampling is md5 arithmetic (engine-portable, rerun-stable),
  the same discipline as ``sampling.hash_sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anti_money_laundering_spark.functions import tokens
from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.plans.llm_queries import _DUCK_TOKS, _duck_hash_bucket
from anti_money_laundering_spark.sampling import hash_bucket
from anti_money_laundering_spark.sources import load_table


def _dec19(c: str):
    """The repo-wide integer-widening convention: cast a LONG column to
    decimal(19,0) so subsequent products promote to decimal(38,0)
    (HUGEINT on the DuckDB oracle side) instead of overflowing a LONG
    — which FAILS the query under this engine's ANSI mode (Spark 4
    default, kept on), or wraps silently with ANSI off — see the r9
    overflow sweep (KS / mann-whitney commit messages) for the
    per-screen ceilings the LONG forms had."""
    return F.col(c).cast("decimal(19,0)")


# ---------------------------------------------------------------------------
# SCD2 history build
# ---------------------------------------------------------------------------


@register(
    "scd2_user_status",
    tags=("W-ext", "OP"),
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type AS status, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, status, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
    FROM changes
    """,
)
def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) history build from a
    change stream: collapse consecutive runs of the same per-user
    status into validity intervals [valid_from, valid_to), open-ended
    (NULL valid_to) for the current row.

    Plan: two windows over the SAME (user_id) partitioning — lag() to
    find run starts, lead() to close intervals — so Catalyst plans one
    shuffle and two in-partition sorts. No joins, no state beyond the
    window frame; at 100 TB this is the standard one-pass SCD2 derivation.
    """
    from anti_money_laundering_spark.features import scd2

    ev = load_table(spark, sf_dir, "events")
    return scd2(ev, key="user_id", status="event_type", ts="ts", tiebreak="event_id")


# ---------------------------------------------------------------------------
# Exact rolling median
# ---------------------------------------------------------------------------


@register(
    "rolling_median_value",
    tags=("W-ext",),
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS rolling_median
    FROM events
    """,
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing median (5-row frame) of event value per user —
    the robust-center feature a fraud model wants where a rolling MEAN
    is poisoned by the very outliers it should detect.

    Spark has no exact median window function, so the frame is
    materialized as a sorted array (collect_list over a ROWS frame +
    array_sort) and the median read positionally with linear
    interpolation on even counts — matching quantile_cont(0.5)
    semantics bit-for-bit at this frame size. The frame is O(1) (5
    rows), so the array never grows with data volume; one shuffle on
    user_id. For wide frames at scale, switch to the t-digest sketch in
    ``functions.approx_quantiles``.
    """
    from anti_money_laundering_spark.features import rolling_median

    ev = load_table(spark, sf_dir, "events")
    med = rolling_median(key="user_id", value="value", order_by=["ts", "event_id"], frame_rows=5)
    return ev.select("event_id", "user_id", F.round(med, 6).alias("rolling_median"))


# ---------------------------------------------------------------------------
# Market-basket co-occurrence
# ---------------------------------------------------------------------------


@register(
    "event_cooccurrence",
    tags=("A-ext", "J-ext"),
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
    ), totals AS (
      SELECT count(*) AS total FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_baskets,
           round(count(*) * 1.0 / any_value(total), 6) AS support
    FROM baskets a
    JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
    CROSS JOIN totals
    GROUP BY 1, 2
    """,
)
def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence support: for every pair of event
    types, in what fraction of (user, day) baskets do both occur —
    the A-priori support-counting primitive (and an AML screen: which
    behaviors travel together on the same day).

    Plan (r14, guide §2.4): ONE basket aggregation —
    ``collect_set(event_type)`` per (user, day) — replaces the former
    distinct itemization + basket self-join + second-distinct totals
    branch (one corpus shuffle vs the distinct shuffle + the join's
    sorts + the totals re-distinct). Pairs come from the sorted
    per-basket itemset in place (k items -> k(k-1)/2 structs, the same
    market-basket fan-out bound, generated by array transforms —
    interpreted per element, but only over k <= |event types| elements
    — with no join), and every basket additionally emits ONE
    (NULL, NULL) marker struct so the SAME aggregation that counts
    pairs also counts baskets. The corpus total then attaches to the
    pair table via an unpartitioned window over <= |types|²/2 + 1 rows
    — bounded by the event-type vocabulary, a schema constant, never
    data-scaled, so the single reducer is safe at any corpus size
    (the corridor_concentration_alerts pattern). Measured
    (order-controlled warm pairs, sf0.1): wall 0.871 -> 0.803 s,
    CPU 1.96 -> 1.47 s.
    """
    ev = load_table(spark, sf_dir, "events")
    bk = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sort_array(F.collect_set("event_type")).alias("__items")
    )
    # all ordered pairs (x < y) of the sorted distinct itemset; NULL
    # event types never pair in either engine (collect_set drops them,
    # the old a.type < b.type join skipped them) but their baskets
    # still count via the marker row
    pairs = F.expr(
        "flatten(transform(__items, (x, i) ->"
        " transform(slice(__items, i + 2, size(__items)), y ->"
        " struct(x AS type_a, y AS type_b))))"
    )
    marker = F.array(
        F.struct(
            F.lit(None).cast("string").alias("type_a"),
            F.lit(None).cast("string").alias("type_b"),
        )
    )
    counts = (
        bk.select(F.explode(F.concat(pairs, marker)).alias("__p"))
        .select("__p.type_a", "__p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    total = F.max(F.when(F.col("type_a").isNull(), F.col("n_baskets"))).over(
        Window.partitionBy()
    )
    return (
        counts.withColumn("__total", total)
        .filter(F.col("type_a").isNotNull())
        .select(
            "type_a",
            "type_b",
            "n_baskets",
            F.round(F.col("n_baskets") / F.col("__total"), 6).alias("support"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 relevance ranking
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


#: BM25 as a reusable CTE chain ending in ``lex(doc_id, bm25)`` —
#: shared verbatim by the bm25_doc_scores oracle and the RRF fusion
#: oracle so the lexical leg can never drift between the two.
_DUCK_BM25_CTES = f"""clean AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM clean GROUP BY 1
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM clean
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), lex AS (
      SELECT tf.doc_id,
             round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * ({_BM25_K1} + 1.0)
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )"""


@register(
    "bm25_doc_scores",
    tags=("LLM", "text"),
    oracle=f"WITH {_DUCK_BM25_CTES} SELECT doc_id, bm25 FROM lex",
)
def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every matching document to a fixed query
    ("spark join stream") — the retrieval scorer behind corpus search
    and RAG candidate generation, exact (Okapi BM25, k1=1.2, b=0.75).

    Plan: one tokenize+explode pass feeds BOTH the per-doc length
    table and the per-(doc, term) tf table (term filter pushed before
    the tf aggregation, so only query-term postings shuffle). The
    corpus stats (N, avgdl) and the per-term document frequencies are
    1-row / k-row aggregates broadcast onto the postings — at 100 TB
    the only large shuffle is the postings groupBy, proportional to
    occurrences of the QUERY terms, not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    # canonical tokenizer (functions.tokens: lowercase, whitespace-class
    # split, empties dropped) — same stats basis as the rest of the
    # text family; _DUCK_TOKS is its DuckDB mirror
    clean = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = clean.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        clean.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    k1, b = _BM25_K1, _BM25_B
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    weight = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(weight), 6).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + dense ANN
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 20


def _install_rrf_oracle() -> None:
    # deferred: _DUCK_COS lives in llm_queries, which imports nothing
    # from this module, so the late bind cannot cycle
    from anti_money_laundering_spark.plans.catalog import _CATALOG
    from anti_money_laundering_spark.plans.llm_queries import _DUCK_COS

    _CATALOG["retrieval_rrf_fusion"].oracle = f"""
    WITH {_DUCK_BM25_CTES},
    lr AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM lex
    ),
    q AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE label = 0 ORDER BY vec_id LIMIT 1
    ),
    scored AS (
      SELECT v.vec_id AS doc_id, {_DUCK_COS} AS cosine
      FROM q, embeddings v WHERE v.vec_id <> q.vec_id
    ),
    dr AS (
      SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS dense_rank
      FROM scored
    ),
    l AS (SELECT * FROM lr WHERE lex_rank <= {_RRF_TOP}),
    d AS (SELECT * FROM dr WHERE dense_rank <= {_RRF_TOP})
    SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
           CAST(l.lex_rank AS BIGINT) AS lex_rank,
           CAST(d.dense_rank AS BIGINT) AS dense_rank,
           round(coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0)
                 + coalesce(1.0 / ({_RRF_K} + d.dense_rank), 0), 6) AS rrf_score
    FROM l FULL JOIN d ON l.doc_id = d.doc_id
    """


@register(
    "retrieval_rrf_fusion",
    tags=("LLM", "text", "ann"),
    oracle=None,  # installed below — composes BM25 + cosine oracle legs
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval the way RAG stacks actually serve it: fuse the
    BM25 top-20 (query "spark join stream") with the dense cosine
    top-20 (query = the first label-0 embedding) by reciprocal-rank
    fusion, rrf = Σ 1/(60 + rank) — score-free, so the incomparable
    BM25/cosine scales never need calibration (operators.rrf_fuse).

    Each leg reuses the exact machinery its standalone query attests
    (bm25_doc_scores; cosine_topk_blas with the ann_cosine_topk
    tie-break). The lexical top-k is taken with a parallel
    orderBy().limit() (TakeOrderedAndProject — per-partition heaps,
    never a single-task global rank window over the full scored set;
    review finding) and only the <= k survivors get the rank window."""
    from anti_money_laundering_spark.operators import rrf_fuse
    from anti_money_laundering_spark.vector import cosine_topk_blas

    lex = bm25_doc_scores(spark, sf_dir)
    wl = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex_ranked = (
        lex.orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_TOP)
        .select("doc_id", F.row_number().over(wl).alias("rank"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("label") == 0).orderBy("vec_id").limit(1)
    dense_ranked = cosine_topk_blas(qvec, emb, k=_RRF_TOP).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse(
        {"lex": lex_ranked, "dense": dense_ranked}, id_col="doc_id", k=_RRF_K
    )
    return fused.select(
        "doc_id", "lex_rank", "dense_rank", F.round("rrf_score", 6).alias("rrf_score")
    )


_install_rrf_oracle()


# ---------------------------------------------------------------------------
# Weighted deterministic sampling
# ---------------------------------------------------------------------------


@register(
    "weighted_sample_orders",
    tags=("sample", "A-ext"),
    oracle=f"""
    WITH mx AS (SELECT max(o_totalprice) AS maxp FROM orders)
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice / maxp, 6) AS weight
    FROM orders CROSS JOIN mx
    WHERE {_duck_hash_bucket("o_orderkey", "wsample-v1", 10000)} * 1.0
          < o_totalprice / maxp * 10000
    """,
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling: keep each order with
    probability proportional to its price (Poisson/Bernoulli weighted
    sampling) — the mechanism for value-weighted training mixes where
    hash_sample's uniform inclusion under-represents heavy rows.

    The inclusion test replays engine-portably: md5 bucket of the key
    (no RNG, rerun/cluster-size stable — ``sampling.hash_bucket``)
    compared against the row's weight, with the normalizing max
    travelling as a broadcast 1-row cross join. Expected sample size =
    sum(weights)/max(weight); per-row work is codegen'd arithmetic on
    the scan, so the filter pipelines with no extra shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("maxp"))
    w = F.col("o_totalprice") / F.col("maxp")
    return (
        orders.crossJoin(F.broadcast(mx))
        .filter(hash_bucket("o_orderkey", 10000, salt="wsample-v1").cast("double") < w * 10000)
        .select("o_orderkey", "o_totalprice", F.round(w, 6).alias("weight"))
    )


# ---------------------------------------------------------------------------
# Calendar-spine gap-fill resample
# ---------------------------------------------------------------------------


@register(
    "resample_daily_gapfill",
    tags=("W-ext", "F-ext"),
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM spans
    )
    SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def resample_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular daily time series per user with silent days zero-filled:
    generate each user's calendar spine (min..max active day) and left-
    join the observed daily counts — the gap-fill step every
    time-series feature pipeline needs before lag/rolling features
    (a missing day must be an explicit 0, not an absent row).

    Plan: the spine comes from sequence()+explode on a 2-column
    aggregate (rows = users x active-span days, never events x days);
    the left join re-shuffles on the same (user, day) key the daily
    aggregate just produced. No driver-side calendar, no UDFs.
    """
    from anti_money_laundering_spark.features import resample_gapfill_daily

    ev = load_table(spark, sf_dir, "events")
    return resample_gapfill_daily(ev, key="user_id", ts="ts").select(
        "user_id",
        # ISO string on both sides: DuckDB DATE surfaces as a midnight
        # timestamp through pandas, which would hash-mismatch a true date.
        F.col("day").cast("string").alias("day"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Per-entity z-score anomaly screen
# ---------------------------------------------------------------------------


@register(
    "zscore_outlier_orders",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH stats AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             avg(o_totalprice) OVER w AS mu,
             stddev_samp(o_totalprice) OVER w AS sd,
             count(*) OVER w AS n
      FROM orders WINDOW w AS (PARTITION BY o_custkey)
    )
    SELECT o_orderkey, o_custkey, o_totalprice,
           round((o_totalprice - mu) / sd, 6) AS z
    FROM stats
    WHERE n >= 5 AND sd > 0 AND abs((o_totalprice - mu) / sd) > 2.0
    """,
)
def zscore_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer z-score screen: orders more than 2 sigma from the
    customer's own mean spend (entities with >=5 orders) — the
    peer-group-of-one anomaly baseline AML teams run alongside the
    graph screens (a $9k order is unremarkable globally, damning for a
    customer whose history is $200 +/- 30).

    Plan: one unbounded window partitioned by customer computes mean /
    stddev / count in a single shuffle (Spark evaluates all three
    window aggregates over one sort); the sigma test is codegen'd row
    arithmetic on top. Equivalent to groupBy + self-join but with half
    the shuffles.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / F.stddev_samp("o_totalprice").over(w)
    return (
        orders.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("sd", F.stddev_samp("o_totalprice").over(w))
        .withColumn("z", z)
        .filter((F.col("n") >= 5) & (F.col("sd") > 0) & (F.abs(F.col("z")) > 2.0))
        .select("o_orderkey", "o_custkey", "o_totalprice", F.round("z", 6).alias("z"))
    )


# ---------------------------------------------------------------------------
# Table profiling
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count({c}) AS BIGINT) AS n_non_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM orders
    """
    for c in _PROFILE_COLS
)


@register("profile_orders", tags=("A-ext", "OP"), oracle=_PROFILE_ORACLE)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the orders table (row/non-null/distinct
    counts, native-typed min/max) via ``operators.profile_table`` —
    the schema-drift and cardinality health check run before any
    pipeline consumes an unfamiliar table. One two-level aggregation
    branch per column over a pruned single-column scan (r14: measured
    6.4x faster than the former single-aggregate expand plan), unioned
    to rows with no driver round-trip."""
    from anti_money_laundering_spark.operators import profile_table

    return profile_table(load_table(spark, sf_dir, "orders"), list(_PROFILE_COLS))


# ---------------------------------------------------------------------------
# Cross-validation fold assignment
# ---------------------------------------------------------------------------


@register(
    "kfold_assign_docs",
    tags=("sample", "LLM"),
    oracle=f"""
    SELECT doc_id, {_duck_hash_bucket("doc_id", "fold-v1", 10000)} % 5 AS fold
    FROM documents
    """,
)
def kfold_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment: fold = md5
    bucket of the document id mod k. Same engine-portable no-RNG
    discipline as ``sampling.assign_split`` — folds are stable across
    reruns, cluster sizes, and engines, and adding documents never
    reassigns existing ones. Codegen'd arithmetic on the scan; zero
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.pmod(hash_bucket("doc_id", 10000, salt="fold-v1"), F.lit(5)).alias("fold")
    )


# ---------------------------------------------------------------------------
# Exact decimal money arithmetic
# ---------------------------------------------------------------------------


@register(
    "decimal_money_totals",
    tags=("A-ext", "F3"),
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS total_exact,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def decimal_money_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL(18,2) money aggregation: regulatory/SAR totals
    must not drift, and double summation order changes the last ulps
    across partitionings — DECIMAL sums are associative-exact, so the
    SAME cents come out on any cluster size. The total is emitted as
    its exact STRING rendering (scale-2, e.g. '1233170551.74'): the
    r7 driver row proved the generic hash compare normalizes Decimal
    objects to 6 significant digits (float64 stays full-precision),
    which can never attest cent-exactness at 1e9 magnitudes — the
    string is both cent-exact AND hash-stable across engines. The
    Decimal-typed contract is separately pinned by
    tests/test_determinism.py::test_decimal_totals_exact_to_the_cent.
    Spark widens the sum to DECIMAL(28,2) internally; map-side partial
    aggregation still applies."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("total_exact"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Exponential-decay (EWMA) feature
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_K = 12  # truncation: (1-a)^12 ~ 0.014, <2% residual mass


def _ewma_terms():
    return [(j, (1.0 - _EWMA_ALPHA) ** j) for j in range(_EWMA_K)]


@register(
    "ewma_event_values",
    tags=("W-ext", "F-ext"),
    oracle=f"""
    SELECT event_id, user_id,
           round((
             {" + ".join(f"coalesce(lag(value, {j}) OVER w * {w!r}, 0.0)" for j, w in _ewma_terms())}
           ) / (
             {" + ".join(f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {w!r} ELSE 0.0 END" for j, w in _ewma_terms())}
           ), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ewma_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed mean of each user's recent event values
    (alpha=0.3, truncated at 12 lags — <2% residual mass), normalized
    over the weights actually present so partition heads are unbiased.
    Exponential-decay features are the fraud-model staple the plain
    rolling mean can't give (recent behavior dominates, old behavior
    never fully leaves).

    The recurrence y_t = a*x_t + (1-a)*y_{{t-1}} is not expressible as
    a Spark window aggregate, and the closed form over a full
    partition overflows (1-a)^-t at a few hundred rows — truncation
    makes it a FIXED lag chain instead: 12 codegen'd lag() terms over
    one (user) sort, identical arithmetic on both engines, no Python,
    no state. One shuffle."""
    from anti_money_laundering_spark.features import ewma

    ev = load_table(spark, sf_dir, "events")
    col = ewma(
        key="user_id",
        value="value",
        order_by=["ts", "event_id"],
        alpha=_EWMA_ALPHA,
        max_lags=_EWMA_K,
    )
    return ev.select("event_id", "user_id", F.round(col, 6).alias("ewma"))


# ---------------------------------------------------------------------------
# Per-entity trend slope
# ---------------------------------------------------------------------------


@register(
    "trend_slope_per_user",
    tags=("A-ext",),
    oracle="""
    WITH xy AS (
      SELECT user_id,
             (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
               / 86400000000.0 AS x_days,
             value AS y
      FROM events
    )
    SELECT user_id,
           round(covar_samp(x_days, y) / var_samp(x_days), 6) AS slope_per_day,
           CAST(count(*) AS BIGINT) AS n
    FROM xy
    GROUP BY user_id
    HAVING count(*) >= 3 AND var_samp(x_days) > 0
    """,
)
def trend_slope_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares activity trend per user: slope of event value over
    time (units/day), the one-number answer to "is this account
    ramping up?". Closed form slope = covar_samp(x, y)/var_samp(x) —
    both are single-pass distributive aggregates, so the whole fit is
    ONE groupBy shuffle with map-side partials, no iteration, no ML
    library. x is re-zeroed per user (days since the user's first
    event) to keep the moments well-conditioned — epoch-microsecond
    magnitudes square to 1e30 and eat the double mantissa."""
    from anti_money_laundering_spark.features import trend_slope

    ev = load_table(spark, sf_dir, "events")
    return trend_slope(ev, key="user_id", ts="ts", value="value", min_points=3).select(
        "user_id", F.round("slope_per_day", 6).alias("slope_per_day"), "n"
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

_CUSUM_SLACK = 0.5  # allowance k: drift below k sigma never accumulates
_CUSUM_H = 4.0  # decision interval h: alarm when either side exceeds

_DUCK_CUSUM_RUN = """PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"""


@register(
    "cusum_changepoints",
    tags=("W-ext", "F-ext", "OP"),
    oracle=f"""
    WITH z AS (
      SELECT user_id, ts, event_id,
             (value - avg(value) OVER (PARTITION BY user_id))
               / nullif(stddev_pop(value) OVER (PARTITION BY user_id), 0) AS z
      FROM events
    ), p AS (
      SELECT user_id, ts, event_id,
             sum(z - {_CUSUM_SLACK}) OVER w AS p_pos,
             sum(-z - {_CUSUM_SLACK}) OVER w AS p_neg
      FROM z WHERE z IS NOT NULL
      WINDOW w AS ({_DUCK_CUSUM_RUN})
    ), s AS (
      SELECT user_id, event_id,
             round(p_pos - least(0, min(p_pos) OVER w), 6) AS cusum_pos,
             round(p_neg - least(0, min(p_neg) OVER w), 6) AS cusum_neg
      FROM p
      WINDOW w AS ({_DUCK_CUSUM_RUN})
    )
    SELECT user_id, event_id, cusum_pos, cusum_neg,
           greatest(cusum_pos, cusum_neg) > {_CUSUM_H} AS alarm
    FROM s
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM level-shift detector per user (Page 1954, the
    control-chart classic): cumulative drift of the user's standardized
    event values above/below a 0.5-sigma allowance, alarming at 4 sigma
    of accumulated evidence — the sustained-shift complement to
    ``zscore_outlier_orders``'s single-point screen. The recurrence
    max(0, S+z-k) is closed-formed as prefix-sum minus running-min
    (features.cusum), so the whole detector is two stacked window
    selects over ONE user-partitioned sort: one shuffle, zero Python,
    zero iteration. Alarm compares the ROUNDED statistic on both
    engines so the boolean can't flip on summation-order ulps."""
    from anti_money_laundering_spark.features import cusum

    ev = load_table(spark, sf_dir, "events")
    out = cusum(
        ev,
        key="user_id",
        ts="ts",
        value="value",
        tiebreak="event_id",
        slack=_CUSUM_SLACK,
        threshold=_CUSUM_H,
    )
    pos = F.round("cusum_pos", 6)
    neg = F.round("cusum_neg", 6)
    return out.select(
        "user_id",
        "event_id",
        pos.alias("cusum_pos"),
        neg.alias("cusum_neg"),
        (F.greatest(pos, neg) > _CUSUM_H).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Bigram PMI collocations
# ---------------------------------------------------------------------------


@register(
    "bigram_pmi_collocations",
    tags=("LLM", "text"),
    oracle=f"""
    WITH clean AS (
      SELECT doc_id,
             unnest({_DUCK_TOKS}) AS term,
             generate_subscripts({_DUCK_TOKS}, 1) AS pos
      FROM documents
    ), bigrams AS (
      SELECT term AS a, lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
      FROM clean
    ), bg AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      FROM bigrams WHERE b IS NOT NULL GROUP BY a, b
    ), uni AS (
      SELECT term, count(*) AS n FROM clean GROUP BY term
    ), tot AS (
      SELECT (SELECT sum(n) FROM uni) AS t_uni,
             (SELECT sum(n_ab) FROM bg) AS t_bg
    )
    SELECT bg.a AS term_a, bg.b AS term_b, bg.n_ab,
           round(ln((bg.n_ab / t_bg) / ((ua.n / t_uni) * (ub.n / t_uni))), 6) AS pmi
    FROM bg
    JOIN uni ua ON ua.term = bg.a
    JOIN uni ub ON ub.term = bg.b
    CROSS JOIN tot
    WHERE bg.n_ab >= 10
    """,
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs — the
    collocation detector ("new york" vs chance co-occurrence) corpus
    analysis runs before vocabulary/tokenizer decisions. PMI =
    ln(p(ab) / (p(a)p(b))), frequent pairs only (n >= 10 — the fixture corpus tops out near 50 occurrences at the driver SF, so a higher floor would silently attest an EMPTY result; FIXTURES.md rule: thresholds must leave every SF non-empty).

    Plan (r14 optimization round; guide §2.4 — the ngram_lm_scores
    pattern): bigrams come from a SHUFFLE-FREE array zip on the scan
    (every token paired with its successor-or-NULL), and ONE
    vocabulary²-bounded aggregation of that stream (``bg_all``,
    including the (last-token, NULL) rows) derives EVERYTHING: bigram
    counts = the non-NULL rows, unigram counts = per-``a`` sums (each
    token occurrence appears exactly once as ``a``), and both corpus
    totals = one global agg. The old lead() window needed a corpus
    shuffle on doc_id and its stream fed two independent counting
    aggregations that each re-ran the tokenize subtree; now the corpus
    is scanned ONCE and everything downstream is vocabulary-sized
    (bg_all is lazily checkpointed for its three consumers — the
    tiny-frame-many-consumers rule)."""
    docs = load_table(spark, sf_dir, "documents")
    # canonical tokenizer (see bm25_doc_scores); adjacency via zip, not
    # position windows — same bigram multiset, no shuffle
    toked = docs.select(tokens("text").alias("__t"))
    nxt = F.slice(
        F.concat(F.col("__t"), F.array(F.lit(None).cast("string"))),
        2,
        F.size("__t"),
    )
    seq = toked.select(
        F.explode(F.arrays_zip(F.col("__t"), nxt.alias("__nx"))).alias("__bg")
    ).select(F.col("__bg.__t").alias("a"), F.col("__bg.__nx").alias("b"))
    bg_all = (
        seq.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    bg = bg_all.filter(F.col("b").isNotNull())
    uni = bg_all.groupBy("a").agg(F.sum("n_ab").alias("n")).withColumnRenamed("a", "term")
    tot = bg_all.agg(
        F.sum("n_ab").alias("t_uni"),
        F.sum(F.when(F.col("b").isNotNull(), F.col("n_ab"))).alias("t_bg"),
    )
    ua = uni.select(F.col("term").alias("a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("term").alias("b"), F.col("n").alias("n_b"))
    return (
        bg.filter(F.col("n_ab") >= 10)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("t_bg"))
                    / ((F.col("n_a") / F.col("t_uni")) * (F.col("n_b") / F.col("t_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Winsorized robust aggregates
# ---------------------------------------------------------------------------


@register(
    "winsorized_value_stats",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH clipped AS (
      SELECT event_type, value,
             quantile_cont(value, 0.05) OVER (PARTITION BY event_type) AS p05,
             quantile_cont(value, 0.95) OVER (PARTITION BY event_type) AS p95
      FROM events
    )
    SELECT event_type,
           -- DuckDB's least/greatest skip NULLs too, which would clamp a
           -- NULL value to p05; mirror the Spark side's null guard so a
           -- NULL row stays NULL and avg() excludes it from wins_mean.
           round(avg(CASE WHEN value IS NOT NULL
                          THEN least(greatest(value, p05), p95) END), 6) AS wins_mean,
           round(avg(value), 6) AS raw_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM clipped
    GROUP BY event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clip values to the group's
    exact [p5, p95] band before averaging — the robust-preprocessing
    step that keeps a handful of extreme rows from owning a feature's
    scale (clipping retains the rows; trimming would discard them).

    Plan: exact interpolated percentiles as UNBOUNDED window
    aggregates over the group partition (one shuffle, one sort,
    both quantiles from the same pass), then codegen'd clamp + a
    re-aggregation on the already-partitioned key. At 100 TB swap the
    exact percentile for approx_percentile and the window for a
    broadcast join of per-group sketches."""
    from anti_money_laundering_spark.features import winsorized_mean

    ev = load_table(spark, sf_dir, "events")
    out = winsorized_mean(ev, group="event_type", value="value", lower=0.05, upper=0.95)
    return out.select(
        "event_type",
        F.round("wins_mean", 6).alias("wins_mean"),
        F.round("raw_mean", 6).alias("raw_mean"),
        "n",
    )


# ---------------------------------------------------------------------------
# Per-source document cap (data-mix balancing)
# ---------------------------------------------------------------------------


@register(
    "per_source_doc_cap",
    tags=("sample", "LLM", "W-ext"),
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap-v1' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def per_source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source/domain at 10 documents — the data-mix balancer
    every corpus build runs so one crawl domain can't dominate
    training (the per-domain cap from public LLM-data recipes, e.g.
    C4/RefinedWeb-style pipelines). Selection is a deterministic
    md5-ordered row_number per source: which documents survive is a
    pure function of their ids — stable across reruns, cluster sizes,
    and engines — and adding documents never evicts survivors ranked
    above them. One shuffle on the source key; at 100 TB this is the
    same plan shape as any top-k-per-group."""
    from anti_money_laundering_spark.features import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, group="source", key="doc_id", max_rows=10, salt="cap-v1").select(
        "doc_id", "source"
    )


# ---------------------------------------------------------------------------
# Vocabulary head (top terms)
# ---------------------------------------------------------------------------


@register(
    "vocab_top_terms",
    tags=("LLM", "text", "W2"),
    oracle=f"""
    SELECT term, n, rank FROM (
      SELECT term, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (ORDER BY count(*) DESC, term) AS rank
      FROM (
        SELECT unnest({_DUCK_TOKS}) AS term FROM documents
      )
      GROUP BY term
    ) WHERE rank <= 30
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: the 30 most frequent corpus terms with
    deterministic tie-breaking (count desc, then term asc) — the
    frequency table behind vocabulary-size / OOV-rate decisions before
    training a tokenizer. The global rank window runs on the
    ALREADY-AGGREGATED vocabulary (thousands of rows at any corpus
    size), so the single-partition sort is trivial; the corpus-scale
    work is the one term-count shuffle with map-side partials."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "term")
    return counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 30)


# ---------------------------------------------------------------------------
# Per-document keywords (top TF-IDF terms)
# ---------------------------------------------------------------------------


@register(
    "doc_keywords",
    tags=("LLM", "text", "W-ext"),
    oracle=f"""
    WITH tcnt AS (
        SELECT doc_id AS doc, tok AS token, count(*) AS cnt
        FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
        GROUP BY doc, tok
    ),
    idf AS (
        SELECT token,
               ln(((SELECT count(*) FROM documents) + 1.0)
                  / (count(DISTINCT doc) + 1.0)) + 1.0 AS idf
        FROM tcnt GROUP BY token
    ),
    w AS (
        SELECT doc, tcnt.token, round(cnt * idf, 6) AS weight
        FROM tcnt JOIN idf ON idf.token = tcnt.token
    )
    SELECT doc AS doc_id, token, weight, rank FROM (
        SELECT doc, token, weight,
               row_number() OVER (PARTITION BY doc ORDER BY weight DESC, token) AS rank
        FROM w
    ) WHERE rank <= 3
    """,
)
def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (smoothed idf, same formula
    as tfidf_exact_pairs) — the per-document summary labels behind
    corpus browsing and weak topic supervision.

    Determinism note: the rank orders by the weight ROUNDED to 6
    decimals, then token — ranking the raw double would let a sub-ulp
    ln() difference between engines flip equal-weight neighbors. Plan:
    one token-count shuffle, vocabulary-sized idf broadcast onto it,
    one top-k-per-doc window on the (doc) key the counts already
    carry."""
    docs = load_table(spark, sf_dir, "documents")
    tcnt = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        tcnt.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
        )
    )
    w = tcnt.join(F.broadcast(idf), "token").select(
        "doc_id", "token", F.round(F.col("cnt") * F.col("idf"), 6).alias("weight")
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("weight").desc(), "token")
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "weight", "rank")
    )


# ---------------------------------------------------------------------------
# Arbitrary GROUPING SETS (beyond rollup/cube)
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_orders",
    tags=("A-ext",),
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the general form rollup/cube are
    shorthands for: here per-status, per-priority, and grand totals in
    ONE pass (no self-union of three aggregations). Spark plans a
    single Expand + partial/final aggregate, so the fact scans once
    regardless of how many sets are requested."""
    orders = load_table(spark, sf_dir, "orders")
    # DataFrame.groupingSets (Spark 4) — same Expand+aggregate plan as
    # the SQL form, without registering a temp view (a session-catalog
    # side effect that would leak across queries and race on the name).
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# Cumulative distinct count (unsupported window aggregate, rewritten)
# ---------------------------------------------------------------------------


@register(
    "cumulative_distinct_users",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH firsts AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), daily_new AS (
      SELECT day, count(*) AS new_users FROM firsts WHERE rn = 1 GROUP BY day
    )
    SELECT day::VARCHAR AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM daily_new
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — count(DISTINCT) over a
    running window is UNSUPPORTED in both engines, so it's rewritten
    exactly: flag each user's first-ever event (row_number = 1), count
    first-occurrences per day, then a plain running sum. Same rewrite
    any growth dashboard uses; two shuffles (per-user first, per-day
    count) + one tiny ordered window over days."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = ev.select(
        F.to_date("ts").alias("day"), "user_id", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") == 1)
    daily = firsts.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("new_users"))
    w2 = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w2).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# Median-absolute-deviation robust outlier screen
# ---------------------------------------------------------------------------


@register(
    "mad_outlier_values",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH med AS (
      SELECT event_id, user_id, value,
             quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
      FROM events
    ), mad AS (
      SELECT event_id, user_id, value, med,
             quantile_cont(abs(value - med), 0.5) OVER (PARTITION BY user_id) AS mad
      FROM med
    )
    SELECT event_id, user_id, value,
           round((value - med) / (1.4826 * mad), 6) AS robust_z
    FROM mad
    WHERE mad > 0 AND abs((value - med) / (1.4826 * mad)) > 3.5
    """,
)
def mad_outlier_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen: robust z-score
    (value - median) / (1.4826 * MAD) per user, flagging |z| > 3.5
    (the Iglewicz-Hoaglin rule). Complements the stddev z-screen
    (zscore_outlier_orders): mean/stddev are themselves dragged by the
    outliers they're meant to find; median/MAD have a 50% breakdown
    point, so a user who is HALF anomalous still gets flagged.

    Plan: two unbounded windows over the SAME user partitioning (one
    sort, both exact medians via the sorted-partition pass), then
    codegen'd arithmetic. At 100 TB swap exact medians for
    approx_percentile sketches per group."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    med = F.expr("percentile(value, 0.5)").over(w)
    step = ev.select("event_id", "user_id", "value", med.alias("med"))
    mad = F.expr("percentile(abs(value - med), 0.5)").over(Window.partitionBy("user_id"))
    step2 = step.withColumn("mad", mad)
    z = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        step2.filter((F.col("mad") > 0) & (F.abs(z) > 3.5))
        .select("event_id", "user_id", "value", F.round(z, 6).alias("robust_z"))
    )


# ---------------------------------------------------------------------------
# Array-valued per-entity profile
# ---------------------------------------------------------------------------


@register(
    "user_event_type_profile",
    tags=("A-ext", "P2"),
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-profile aggregation: each user's sorted distinct event
    types (built as array_sort(collect_set(...)) — deterministic,
    unlike a bare collect_set whose order depends on partitioning)
    plus cardinalities — the per-entity set-profile feature that feeds
    rules ("has error but never purchase") and embedding lookups. The
    set is EMITTED comma-joined: the r7 driver row proved the driver's
    canonicalizer (pandas sort_values over raw columns) crashes on any
    ArrayType output ("unhashable type: list"), so windowed queries
    must emit scalar columns only (enforced repo-wide by the output-
    schema sweep in tests/test_plan_lint.py::
    test_no_catalog_plan_contains_scale_antipatterns)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Behavioral fingerprints: entropy, Gini, burstiness
# ---------------------------------------------------------------------------


@register(
    "behavior_entropy_users",
    tags=("A-ext",),
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
    ), totals AS (
      SELECT user_id, sum(c) AS total FROM counts GROUP BY 1
    )
    SELECT c.user_id,
           round(-sum((c.c / t.total) * ln(c.c / t.total)), 6) + 0.0 AS type_entropy,
           CAST(count(*) AS BIGINT) AS n_types
    FROM counts c JOIN totals t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
)
def behavior_entropy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity fingerprint (a mule account scripted to one
    action has entropy ~0; organic users spread over types). Plan: one
    (user, type) count shuffle, a per-user total as a window over the
    SAME key, one re-aggregation — all partial-aggregated."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id")
    p = F.col("c") / F.sum("c").over(w)
    return (
        counts.withColumn("p", p)
        .groupBy("user_id")
        .agg(
            # + 0.0: a single-type user's entropy is -0.0 before
            # canonicalization — see amount_digit_entropy's docstring
            (F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6) + 0.0).alias("type_entropy"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


@register(
    "gini_order_values",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS i,
             count(*) OVER (PARTITION BY o_custkey) AS n,
             sum(o_totalprice) OVER (PARTITION BY o_custkey) AS total
      FROM orders
    )
    SELECT o_custkey,
           round(2.0 * sum(i * o_totalprice) / (any_value(n) * any_value(total))
                 - (any_value(n) + 1.0) / any_value(n), 6) AS gini,
           CAST(any_value(n) AS BIGINT) AS n
    FROM ranked
    GROUP BY o_custkey
    HAVING any_value(n) >= 5
    """,
)
def gini_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order values per customer — spend
    concentration (0 = every order equal, →1 = one order dominates),
    the inequality fingerprint that flags accounts whose volume hides
    one enormous transfer among camouflage noise. Computed by the
    sorted-rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n: ONE ordered
    window per customer (rank, count, and sum share the partition
    sort) + one re-aggregation; deterministic o_orderkey tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    ranked = orders.select(
        "o_custkey",
        "o_totalprice",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("o_totalprice").over(wp).alias("total"),
    )
    return (
        ranked.groupBy("o_custkey")
        .agg(
            F.round(
                2.0 * F.sum(F.col("i") * F.col("o_totalprice"))
                / (F.first("n") * F.first("total"))
                - (F.first("n") + 1.0) / F.first("n"),
                6,
            ).alias("gini"),
            F.first("n").cast("long").alias("n"),
        )
        .filter(F.col("n") >= 5)
    )


@register(
    "burstiness_daily_users",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id, sum(c) AS s, sum(CAST(c AS HUGEINT) * c) AS ss,
             CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY user_id
      HAVING count(*) >= 5
    )
    SELECT user_id,
           ((2 * (n * ss - CAST(s AS HUGEINT) * s) * 1000000
             + (n - 1) * CAST(s AS HUGEINT))
              // (2 * (n - 1) * CAST(s AS HUGEINT))) / 1000000.0 AS fano,
           n AS n_days
    FROM stats
    """,
)
def burstiness_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) of each user's daily activity:
    variance-to-mean of per-day event counts — ~1 for Poisson-like
    organic activity, >>1 for burst-and-silence patterns (campaign
    scripts, dump days). Two keyed aggregations, both map-side
    partial; the active-day spine comes from the same daily counts the
    gap-fill query builds.

    Exactness (r8 sf0.1 audit find — an INTERMITTENT flip):
    var_samp/avg over integer counts is fully rational, fano =
    (n*Σc² - (Σc)²) / ((n-1)*Σc), and a user's quotient can sit on the
    round-half-to-6 boundary, where Spark's own float summation order
    wobbles the computed double BETWEEN RUNS (one audit pass green,
    the next red on the same code). Both sides now aggregate exact
    integer Σc/Σc² and apply the repo's integer round_half_up
    ((2a*10^6+b) div 2b) — no float enters before the final division
    of identical integers."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # Σc² and the fano numerator run in decimal (HUGEINT in the
    # oracle): the LONG forms overflow once one user's daily counts square
    # past ~3e9/day or n*ss crosses 4.6e12 — hub-account hazards at
    # corpus scale
    stats = (
        daily.groupBy("user_id")
        .agg(
            F.sum("c").alias("s"),
            F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("ss"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .filter(F.col("n") >= 5)
    )
    return (
        stats.withColumn(
            "__a",
            (
                F.col("n") * F.col("ss")
                - F.col("s").cast("decimal(19,0)") * F.col("s")
            ).cast("decimal(38,0)"),
        )
        .withColumn(
            "__b", ((F.col("n") - 1) * F.col("s").cast("decimal(19,0)")).cast(
                "decimal(38,0)"
            )
        )
        .select(
            "user_id",
            (
                F.expr("(2 * __a * 1000000 + __b) div (2 * __b)") / F.lit(1000000.0)
            ).alias("fano"),
            F.col("n").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# Structuring screens on amounts (r9): just-below-threshold clustering and
# round-number bias — the two classic amount-shape indicators the reference's
# network analysis pairs with the motif alerts (01_aml_network_analysis.py's
# structuring narrative; Benford covers leading digits, these cover the
# threshold band and the trailing digits).
# ---------------------------------------------------------------------------


@register(
    "threshold_avoidance_scores",
    tags=("A2", "A3", "W-ext"),
    oracle="""
    WITH pu AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(count(*) FILTER (
                 CAST(round(value * 100) AS BIGINT) BETWEEN 9000 AND 9999
             ) AS BIGINT) AS n_band
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id, n_purchases, n_band,
           ((2 * CAST(n_band AS HUGEINT) * 1000000 + n_purchases)
              // (2 * CAST(n_purchases AS HUGEINT)))
             / 1000000.0 AS band_share,
           (n_band >= 2 AND
            ((2 * CAST(n_band AS HUGEINT) * 1000000 + n_purchases)
               // (2 * CAST(n_purchases AS HUGEINT)))
              / 1000000.0 > 0.25) AS flagged
    FROM pu WHERE n_purchases >= 3
    """,
)
def threshold_avoidance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-threshold structuring screen: per user, the share of
    purchase amounts parked just below the 100-unit reporting
    threshold (value in [90, 100) — the fixture's p97+ band; 4/51/615
    purchases at the three SFs, every user clears the n>=3 floor).
    Deposits shaved to sit under a reporting line are THE textbook
    structuring signature; this is the amount-shape complement to the
    fan-in motif alert.

    Exactness: amounts are 2-decimal on-grid, so round(value*100) is
    an exact integer on both engines; counts are integers; the share
    uses the div-based round-half-up identity (numerators nonnegative
    — counts), and `flagged` compares exact micro-unit rationals
    against on-grid constants, so the boolean cannot wobble. One
    keyed aggregation, map-side partial; the purchase filter pushes
    into the scan."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.when((cents >= 9000) & (cents <= 9999), 1).otherwise(0)
            ).alias("n_band"),
        )
        .filter(F.col("n_purchases") >= 3)
    )
    # decimal identity (HUGEINT in the oracle): same 4.6e12-per-user
    # LONG ceiling class as the rest of the r9 overflow sweep
    share = F.expr(
        "(2 * cast(n_band as decimal(38,0)) * 1000000 + n_purchases)"
        " div (2 * cast(n_purchases as decimal(38,0)))"
    ) / F.lit(1000000.0)
    return agg.select(
        "user_id",
        "n_purchases",
        "n_band",
        share.alias("band_share"),
        ((F.col("n_band") >= 2) & (share > 0.25)).alias("flagged"),
    )


@register(
    "round_amount_bias_orders",
    tags=("A2", "F5"),
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (
               CAST(round(o_totalprice * 100) AS BIGINT) % 100 = 0
           ) AS BIGINT) AS n_round,
           ((2 * CAST(count(*) FILTER (
                 CAST(round(o_totalprice * 100) AS BIGINT) % 100 = 0
             ) AS HUGEINT) * 1000000 + count(*))
             // (2 * CAST(count(*) AS HUGEINT))) / 1000000.0 AS round_share
    FROM orders GROUP BY o_orderpriority
    """,
)
def round_amount_bias_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias per order-priority segment: the share of
    order totals that are exact whole-currency amounts (cents == 0 —
    12/169/1422 orders at the three SFs). Organic priced baskets
    almost never sum to a round number; invented amounts dominated by
    round figures are the trailing-digit complement to Benford's
    leading-digit screen. Same exactness discipline as
    threshold_avoidance_scores: on-grid cents, integer counts,
    div-based round-half-up share."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(cents % 100 == 0, 1).otherwise(0)).alias("n_round"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_round",
            (
                # priority groups hold ~corpus/5 rows, so the share
                # identity runs in decimal (the LONG form overflows past
                # 4.6e12 rows per group)
                F.expr(
                    "(2 * cast(n_round as decimal(38,0)) * 1000000 + n_orders)"
                    " div (2 * cast(n_orders as decimal(38,0)))"
                )
                / F.lit(1000000.0)
            ).alias("round_share"),
        )
    )


#: Benford first-digit expected shares, micro-units of log10(1 + 1/d)
#: for d = 1..9 (301030 = round(log10(2) * 1e6), ...). Rounded
#: constants sum to EXACTLY 1_000_000, so the expected distribution is
#: itself on the micro grid. A single tuple feeds BOTH the Spark plan
#: and the DuckDB oracle below — the two engines cannot disagree on
#: the reference distribution by construction.
_BENFORD_MICRO: tuple[int, ...] = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_MICRO, start=1)
) + " END"


@register(
    "benford_first_digit_lineitem",
    tags=("A-ext", "F-ext"),
    oracle=f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM lineitem GROUP BY 1
    ), spine AS (
      SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) AS t(digit)
    ), j AS (
      SELECT spine.digit AS digit,
             COALESCE(c.n_obs, 0) AS n_obs,
             CAST(sum(COALESCE(c.n_obs, 0)) OVER () AS BIGINT) AS n_total
      FROM spine LEFT JOIN c ON spine.digit = c.digit
    ), m AS (
      SELECT digit, n_obs, n_total,
             (2 * CAST(n_obs AS HUGEINT) * 1000000 + n_total)
               // (2 * CAST(n_total AS HUGEINT)) AS obs_micro,
             {_BENFORD_CASE_SQL} AS ben_micro
      FROM j
    )
    SELECT digit, n_obs, n_total,
           obs_micro / 1000000.0 AS obs_share,
           ben_micro / 1000000.0 AS benford_share,
           CAST(abs(obs_micro - ben_micro) AS BIGINT) AS dev_micro,
           obs_micro > ben_micro AS over_represented
    FROM m
    """,
)
def benford_first_digit_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over line-item prices: one row
    per leading digit 1..9 with the observed share, the Benford
    expectation log10(1+1/d), and the absolute deviation in micro
    units — the classic forensic-accounting test for invented amounts
    (Nigrini's digit analysis). Positioning within the amount-shape
    family: ``benford_digit_scores`` (extended_queries.py) is the
    per-customer chi-square CONFORMANCE score over orders; this query
    is the corpus-level per-digit PROFILE an analyst inspects to see
    WHERE the distribution deviates, in fully exact integer arithmetic
    (the chi-square twin's float pow/log10 terms can't be) — alongside
    ``round_amount_bias_orders``' trailing-digit screen.

    Exactness: prices are 2-decimal on-grid, so round(value*100) is an
    exact BIGINT on both engines and the leading digit is an exact
    substring of its decimal rendering; counts are integers; shares
    use the div-based round-half-up identity (numerators nonnegative —
    counts); the Benford reference shares are the shared integer
    constants in ``_BENFORD_MICRO`` (they sum to exactly 1e6), so
    ``dev_micro`` and ``over_represented`` are pure integer
    arithmetic and cannot wobble. Requires a non-empty table (the
    share denominator) and positive amounts (fixture invariant,
    asserted by ``dq_expectations_orders``-style price_positive).

    Scale: ONE map-side-combinable aggregation on a 9-value key (each
    task emits <= 9 partial rows, so the reduce is trivially small at
    any SF); everything downstream — the 9-row digit spine left join
    (a missing digit must still surface as an n_obs=0 row: its
    |0 - expected| deviation is evidence, exactly what a curated
    sample of fabricated amounts produces) and the unpartitioned
    total window — touches 9 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    counts = (
        li.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    ben_micro = F.lit(None).cast("int")
    for d, p in enumerate(_BENFORD_MICRO, start=1):
        ben_micro = F.when(F.col("digit") == d, p).otherwise(ben_micro)
    joined = (
        spine.join(counts, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_obs"),
        )
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
        .withColumn(
            "obs_micro",
            # decimal identity (HUGEINT in the oracle): the LONG form
            # overflows past 4.6e12 corpus rows — within an order of a
            # 100 TB event table
            F.expr(
                "(2 * cast(n_obs as decimal(38,0)) * 1000000 + n_total)"
                " div (2 * cast(n_total as decimal(38,0)))"
            ),
        )
        .withColumn("ben_micro", ben_micro)
    )
    return joined.select(
        "digit",
        "n_obs",
        "n_total",
        (F.col("obs_micro") / F.lit(1000000.0)).alias("obs_share"),
        (F.col("ben_micro") / F.lit(1000000.0)).alias("benford_share"),
        F.abs(F.col("obs_micro") - F.col("ben_micro")).cast("long").alias("dev_micro"),
        (F.col("obs_micro") > F.col("ben_micro")).alias("over_represented"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations
# ---------------------------------------------------------------------------


@register(
    "dq_expectations_orders",
    tags=("A-ext", "OP"),
    oracle="""
    SELECT 'orderkey_not_null' AS rule,
           CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'price_positive',
           CAST(count(*) FILTER (WHERE NOT (o_totalprice > 0)
                                     OR o_totalprice IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_known',
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P')
                                     OR o_orderstatus IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'date_in_range',
           CAST(count(*) FILTER (WHERE NOT (o_orderdate >= TIMESTAMP '1990-01-01'
                                            AND o_orderdate < TIMESTAMP '2010-01-01')
                                     OR o_orderdate IS NULL) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders via ``operators.expectations``:
    not-null / positive-amount / known-enum / date-range row rules plus
    key uniqueness, ONE aggregate pass, one row per rule — the
    quality gate a pipeline runs before trusting an upstream table
    (violations stay attributable by rule, not just a pass/fail bit).
    NULLs count as violations (unknown is not a pass)."""
    from anti_money_laundering_spark.operators import expectations

    orders = load_table(spark, sf_dir, "orders")
    return expectations(
        orders,
        rules={
            "orderkey_not_null": F.col("o_orderkey").isNotNull(),
            "price_positive": F.col("o_totalprice") > 0,
            "status_known": F.col("o_orderstatus").isin("F", "O", "P"),
            "date_in_range": (
                (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2010-01-01").cast("timestamp"))
            ),
        },
        unique_keys=["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# Deterministic per-group mode
# ---------------------------------------------------------------------------


@register(
    "dominant_event_type",
    tags=("A-ext", "W-ext"),
    oracle="""
    SELECT user_id, event_type AS dominant_type, CAST(c AS BIGINT) AS n
    FROM (
      SELECT user_id, event_type, count(*) AS c,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type
             ) AS rnk
      FROM events GROUP BY user_id, event_type
    ) WHERE rnk = 1
    """,
)
def dominant_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type — the dominant-behavior label. Built
    as count + rank with an explicit tiebreak (count desc, then type
    asc) instead of mode(): both engines' mode() is tie-ARBITRARY,
    which would flip the hash across engines and partitionings exactly
    when two types are equally common. One (user, type) count shuffle
    + a rank window on the user key the counts already carry."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), "event_type")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("user_id", F.col("event_type").alias("dominant_type"), F.col("c").cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Longest streak (gaps-and-islands aggregate)
# ---------------------------------------------------------------------------


@register(
    "longest_streak_users",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH runs AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS grp
      FROM events
    ), lengths AS (
      SELECT user_id, event_type, count(*) AS len
      FROM runs GROUP BY user_id, event_type, grp
    )
    SELECT user_id, CAST(len AS BIGINT) AS longest_streak,
           event_type AS streak_type
    FROM (
      SELECT user_id, event_type, len,
             row_number() OVER (
               PARTITION BY user_id ORDER BY len DESC, event_type
             ) AS rnk
      FROM lengths
    ) WHERE rnk = 1
    """,
)
def longest_streak_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive same-type events per user (the
    gaps-and-islands pattern): a scripted account repeating one action
    500 times in a row looks identical to an organic user in count
    space but not in RUN space. Islands come from the classic
    row_number difference trick (global seq minus per-type seq is
    constant within a run); ties on length break toward the
    alphabetically-first type via an explicit (len desc, type asc)
    rank on both engines. Two windows over one (user) sort, one run
    aggregation, one top-1-per-user window."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    lengths = runs.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    w_best = Window.partitionBy("user_id").orderBy(F.col("len").desc(), "event_type")
    return (
        lengths.withColumn("rnk", F.row_number().over(w_best))
        .filter(F.col("rnk") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak"),
            F.col("event_type").alias("streak_type"),
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out encoding
# ---------------------------------------------------------------------------


@register(
    "loo_value_encoding",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH s AS (
        SELECT event_id, user_id,
               sum(CAST(round(value * 10000) AS BIGINT)) OVER (PARTITION BY user_id)
                 - CAST(round(value * 10000) AS BIGINT) AS num,
               (count(*) OVER (PARTITION BY user_id) - 1) * 10000 AS den
        FROM events
        QUALIFY count(*) OVER (PARTITION BY user_id) >= 2
    )
    SELECT event_id, user_id,
           ((2 * CAST(num AS HUGEINT) * 1000000 + den)
              // (2 * CAST(den AS HUGEINT))) / 1000000.0 AS loo_mean
    FROM s
    """,
)
def loo_value_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out mean encoding: each event's feature is its user's
    mean value EXCLUDING the event itself — the leakage-safe form of
    target encoding (including the row's own target lets the model
    memorize it; LOO is the standard fix). Closed form
    (sum - x)/(n - 1) over one unbounded window: no per-row regroup,
    one shuffle, entities with a single row dropped (undefined).

    Exactness discipline, hardened twice by driver/driver-sim reds:
    (r7) the sum runs over INTEGER-SCALED values (fixture values carry
    at most 4 decimals at every SF), so float summation ORDER can't
    break ties; (r8) the final round-to-6 ITSELF runs in integer
    arithmetic — round_half_up(a/b, 6) = (2a*10^6 + b) div (2b) —
    because the quotient's 7th decimal lands EXACTLY on 5 whenever
    (n-1) divides a power of 10, where Spark's BigDecimal HALF_UP and
    DuckDB's float-multiply rounding disagree (observed 1e-6 flips at
    sf0.1). The emitted double is micro-units / 1e6: identical exact
    integers divided by the same constant on both engines.

    The div identity is round-half-up only for NONNEGATIVE numerators
    (Spark ``div`` truncates toward zero, DuckDB ``//`` floors) — it
    holds here because fixture events.value is nonnegative, pinned by
    tests/test_catalog_oracle.py::
    test_events_value_is_nonnegative_at_all_sfs; if that tripwire ever
    fires, apply the nonnegative-shift pattern
    mannwhitney_value_periods uses for rank_biserial."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    scaled = F.round(F.col("value") * 10000).cast("long")
    num = F.sum(scaled).over(w) - scaled
    den = (F.count(F.lit(1)).over(w) - 1) * 10000
    return (
        ev.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") >= 2)
        .withColumn("__num", num.cast("long"))
        .withColumn("__den", den.cast("long"))
        .select(
            "event_id",
            "user_id",
            (
                # decimal identity (HUGEINT in the oracle): the LONG
                # form overflows once one user's scaled-value sum crosses
                # 4.6e12 — a hub-account hazard at corpus scale
                F.expr(
                    "(2 * cast(__num as decimal(38,0)) * 1000000 + __den)"
                    " div (2 * cast(__den as decimal(38,0)))"
                )
                / F.lit(1000000.0)
            ).alias("loo_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Daily growth rates
# ---------------------------------------------------------------------------


@register(
    "daily_revenue_growth",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS revenue
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT day::VARCHAR AS day, revenue,
           round((revenue - lag(revenue) OVER (ORDER BY day))
                 / lag(revenue) OVER (ORDER BY day), 6) AS pct_change
    FROM daily
    """,
)
def daily_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue growth: aggregate first (events -> one row
    per day), THEN lag on the tiny aggregated series — the growth-rate
    pattern where the window runs over thousands of rows regardless of
    event volume. The purchase filter pushes into the scan; first day's
    change is NULL by construction."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("pct_change"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence screen
# ---------------------------------------------------------------------------


@register(
    "chi2_type_weekday",
    tags=("A-ext",),
    oracle="""
    WITH obs AS (
      SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
             count(*) * 1.0 AS o
      FROM events GROUP BY 1, 2
    ), margins AS (
      SELECT o.event_type, o.dow, o.o,
             sum(o.o) OVER (PARTITION BY o.event_type) AS row_tot,
             sum(o.o) OVER (PARTITION BY o.dow) AS col_tot,
             sum(o.o) OVER () AS grand
      FROM obs o
    )
    SELECT round(sum(pow(o - row_tot * col_tot / grand, 2)
                     / (row_tot * col_tot / grand)), 6) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS dof
    FROM margins
    """,
)
def chi2_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event type vs day-of-week — the
    contingency screen behind "does behavior X cluster on specific
    days" (scripted activity is weekday-periodic; organic isn't).
    Exact statistic: observed cell counts, margins as windows over the
    TINY contingency table (|types| x 7 rows), sum of (O-E)^2/E, plus
    the degrees of freedom. The only data-sized operation is the one
    counting aggregation; everything after runs on dozens of rows."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek(F.to_date("ts")).alias("dow")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wg = Window.partitionBy()
    m = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wg).alias("grand"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    return m.agg(
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("long").alias("dof"),
    )


@register(
    "acf_daily_values",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d, sum(value) AS v
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT v,
               lag(v, 1) OVER (ORDER BY d) AS v1,
               lag(v, 2) OVER (ORDER BY d) AS v2,
               lag(v, 3) OVER (ORDER BY d) AS v3
        FROM daily
    )
    SELECT 1 AS lag, round(corr(v, v1), 6) AS acf FROM lagged WHERE v1 IS NOT NULL
    UNION ALL
    SELECT 2, round(corr(v, v2), 6) FROM lagged WHERE v2 IS NOT NULL
    UNION ALL
    SELECT 3, round(corr(v, v3), 6) FROM lagged WHERE v3 IS NOT NULL
    """,
)
def acf_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the corpus-wide daily event-value series at
    lags 1-3 — the seasonality probe run before fitting any
    forecasting/monitoring model (a weekly-cycle series shows the
    lag-7 echo; near-zero ACF says the daily totals are noise).
    Pearson corr of (x_t, x_{t-k}) over non-null pairs, identical
    arithmetic on both engines (correlation is normalization-invariant
    so sample-vs-population never matters).

    Scale shape: the heavy part is the groupBy-day aggregation
    (map-side partial, one bounded shuffle: rows = distinct days). The
    lag window then runs over the ALREADY-AGGREGATED series — one row
    per day, bounded by the calendar, so its single-task sort is a
    few-KB frame, not a fact-table sort."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.sum("value").alias("v")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "v", *[F.lag("v", k).over(w).alias(f"v{k}") for k in (1, 2, 3)]
    )
    pairs = lagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("lag"), F.col("v"), F.col(f"v{k}").alias("vk"))
                    for k in (1, 2, 3)
                ]
            )
        ).alias("p")
    ).select("p.lag", "p.v", "p.vk")
    return (
        pairs.filter(F.col("vk").isNotNull())
        .groupBy("lag")
        .agg(F.round(F.corr("v", "vk"), 6).alias("acf"))
    )


@register(
    "survival_km_users",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH horizon AS (SELECT max(ts) AS h FROM events),
    users AS (
        SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
        FROM events GROUP BY user_id
    ),
    lif AS (
        SELECT date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE)) AS t,
               CASE WHEN last_ts < h - INTERVAL 1 DAY THEN 1 ELSE 0 END AS churned
        FROM users, horizon
    ),
    per_t AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n_t,
               CAST(sum(churned) AS BIGINT) AS d_events
        FROM lif GROUP BY t
    ),
    risk AS (
        SELECT *,
               CAST(sum(n_t) OVER () AS BIGINT)
                 - CAST(coalesce(sum(n_t) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS n_at_risk
        FROM per_t
    ),
    km AS (
        SELECT *,
               1.0 - d_events * 1.0 / n_at_risk AS factor,
               sum(CASE WHEN d_events < n_at_risk
                        THEN ln(1.0 - d_events * 1.0 / n_at_risk) ELSE 0.0 END)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS logsum,
               max(CASE WHEN d_events >= n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anyzero
        FROM risk
    )
    SELECT t, n_at_risk, d_events,
           round(CASE WHEN anyzero = 1 THEN 0.0 ELSE exp(logsum) END, 6) AS survival
    FROM km WHERE d_events > 0
    """,
)
def survival_km_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetimes: duration = days
    between a user's first and last event, "churned" (the KM event) if
    the last event predates the observation horizon (global max ts) by
    more than 1 day, else right-censored (the fixture spans 29 days
    with near-uniform activity; the 1-day cut keeps 1/17/156 churned
    users at the three SFs — threshold probed per the fixture rule) — the product-limit
    estimator S(t) = prod_{t_i <= t} (1 - d_i/n_i) behind retention /
    time-to-churn analytics. Censored users leave the risk set without
    stepping the curve, which is exactly what a naive retention ratio
    gets wrong.

    Scale shape: one groupBy(user) for lifetimes, one groupBy(t) —
    both map-side-combined shuffles — then the ordered product runs
    over the per-DURATION aggregate (rows bounded by the calendar, a
    few-KB single-task frame). The product is exp(cumulative sum of
    logs) with an any-zero flag so a total-extinction step yields an
    exact 0 instead of ln(0); the cumulative order is deterministic,
    so both engines sum identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("h"))
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    lif = users.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).cast("long").alias("t"),
        (F.col("last_ts") < F.col("h") - F.expr("INTERVAL 1 DAYS")).cast("int").alias("churned"),
    )
    per_t = lif.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_t"), F.sum("churned").cast("long").alias("d_events")
    )
    full = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.withColumn(
        "n_at_risk",
        F.sum("n_t").over(full) - F.coalesce(F.sum("n_t").over(before), F.lit(0)),
    )
    km = risk.select(
        "t",
        "n_at_risk",
        "d_events",
        F.sum(
            F.when(
                F.col("d_events") < F.col("n_at_risk"),
                F.log(F.lit(1.0) - F.col("d_events") / F.col("n_at_risk")),
            ).otherwise(F.lit(0.0))
        ).over(cum).alias("logsum"),
        F.max(
            F.when(F.col("d_events") >= F.col("n_at_risk"), 1).otherwise(0)
        ).over(cum).alias("anyzero"),
    )
    return km.filter(F.col("d_events") > 0).select(
        "t",
        "n_at_risk",
        "d_events",
        F.round(
            F.when(F.col("anyzero") == 1, F.lit(0.0)).otherwise(F.exp("logsum")), 6
        ).alias("survival"),
    )


#: Fixed period split for the drift queries: the events fixture spans
#: 2024-01-01..01-30 at every SF, so the literal midpoint gives two
#: ~equal halves (4829/5171 at sf0.01) without a data-dependent
#: quantile whose interpolation could differ across engines.
_DRIFT_SPLIT = "2024-01-16 00:00:00"

#: PSI bins: fixed width 50 over value in [0, ~560] (probed at all 3
#: SFs), overflow clamped into the top bin — fixed bins keep the bin
#: edges engine-exact where reference-period decile edges (interpolated
#: floats) could flip a boundary value's bin by one ulp.
_PSI_BINS = 10
_PSI_WIDTH = 50.0


@register(
    "psi_value_drift",
    tags=("A-ext", "F-ext"),
    oracle=f"""
    WITH binned AS (
        SELECT least(CAST(floor(value / {_PSI_WIDTH}) AS BIGINT), {_PSI_BINS - 1}) AS bin,
               CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END AS in_a
        FROM events
    ),
    per_bin AS (
        SELECT bin,
               CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(sum(1 - in_a) AS BIGINT) AS n_b
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM per_bin)
    SELECT bin, n_a, n_b,
           round(((n_b + 0.5) / (tb + {_PSI_BINS} * 0.5)
                  - (n_a + 0.5) / (ta + {_PSI_BINS} * 0.5))
                 * ln(((n_b + 0.5) / (tb + {_PSI_BINS} * 0.5))
                      / ((n_a + 0.5) / (ta + {_PSI_BINS} * 0.5))), 6) AS psi_term
    FROM per_bin, tot
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of the event-value distribution
    between the fixture's two calendar halves — the drift metric model
    monitors alarm on (PSI > 0.2 = retrain). Per-bin contribution
    (share_b - share_a) * ln(share_b / share_a) with 0.5 Laplace
    smoothing so a bin observed in only ONE period contributes a
    finite term instead of ln(0) (bins empty in both periods emit no
    row — identically on both engines). One scan, one bounded groupBy
    (rows = bins), period totals folded into the bin table by an
    unpartitioned window (r14, guide §2.4: the former separate
    ``per_bin.agg`` branch re-executed the events scan+agg subtree for
    its broadcast; the window's single reducer sees <= _PSI_BINS rows,
    a fixture constant) — the 100 TB shape is the aggregation's."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        F.least(
            F.floor(F.col("value") / _PSI_WIDTH).cast("long"), F.lit(_PSI_BINS - 1)
        ).alias("bin"),
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    glob = Window.partitionBy()
    per_bin = (
        binned.groupBy("bin")
        .agg(
            F.sum("in_a").cast("long").alias("n_a"),
            F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
        )
        .withColumn("ta", F.sum("n_a").over(glob))
        .withColumn("tb", F.sum("n_b").over(glob))
    )
    smooth = F.lit(_PSI_BINS * 0.5)
    sa = (F.col("n_a") + 0.5) / (F.col("ta") + smooth)
    sb = (F.col("n_b") + 0.5) / (F.col("tb") + smooth)
    return per_bin.select(
        "bin", "n_a", "n_b", F.round((sb - sa) * F.log(sb / sa), 6).alias("psi_term")
    )


@register(
    "mutual_info_type_dow",
    tags=("A-ext",),
    oracle="""
    WITH obs AS (
        SELECT event_type AS x, dayofweek(CAST(ts AS DATE)) + 1 AS y,
               CAST(count(*) AS BIGINT) AS n_xy
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT x, y, n_xy,
               sum(n_xy) OVER (PARTITION BY x) AS n_x,
               sum(n_xy) OVER (PARTITION BY y) AS n_y,
               sum(n_xy) OVER () AS n
        FROM obs
    )
    SELECT round(sum((n_xy * 1.0 / n) * ln(n_xy * 1.0 * n / (n_x * n_y))), 6) AS mi_nats,
           CAST(max(n) AS BIGINT) AS n_events
    FROM m
    """,
)
def mutual_info_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event type and day-of-week —
    the dependence screen that catches what chi2 quantifies but on the
    information scale feature selectors rank by. All terms derive from
    exact integer counts (one bounded groupBy + marginal windows over
    the ~|types|x7 contingency cells), so both engines compute
    identical doubles up to the final rounded sum. DuckDB dayofweek is
    Sun=0 vs Spark's Sun=1 — oracle shifts by +1 (FIXTURES.md)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("x"), F.dayofweek(F.to_date("ts")).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wg = Window.partitionBy()
    m = obs.select(
        "n_xy",
        F.sum("n_xy").over(wx).alias("n_x"),
        F.sum("n_xy").over(wy).alias("n_y"),
        F.sum("n_xy").over(wg).alias("n"),
    )
    term = (F.col("n_xy") / F.col("n")) * F.log(
        F.col("n_xy") * F.col("n") / (F.col("n_x") * F.col("n_y"))
    )
    return m.agg(
        F.round(F.sum(term), 6).alias("mi_nats"),
        F.max("n").cast("long").alias("n_events"),
    )


@register(
    "theilsen_slope_users",
    tags=("A-ext", "J3"),
    oracle="""
    WITH pts AS (
        SELECT user_id, epoch_us(ts) AS us, value FROM events
    ),
    slopes AS (
        SELECT a.user_id,
               (b.value - a.value) * 86400000000.0 / (b.us - a.us) AS slope
        FROM pts a JOIN pts b ON b.user_id = a.user_id AND b.us > a.us
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS ts_slope
    FROM slopes GROUP BY user_id
    """,
)
def theilsen_slope_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user: the MEDIAN of all pairwise
    value slopes (per day) — the outlier-resistant twin of the OLS
    trend_slope_per_user (one wild value can flip an OLS sign; the
    median slope shrugs it off). The pairwise self-join is blocked by
    user (equi-join key, never a cartesian) and is O(k^2) in a user's
    event count — fine for bounded per-entity activity (max 86 events
    per user at every fixture SF); cap or sample per-user history
    upstream before pointing it at unbounded-activity entities.
    Timestamps compare as exact integer microseconds on both engines
    (Spark unix_micros / DuckDB epoch_us); the fixture has no
    duplicate per-user timestamps (probed), and equal-timestamp pairs
    are excluded by the strict inequality anyway."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("user_id", F.unix_micros("ts").alias("us"), "value")
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id")) & (F.col("b.us") > F.col("a.us")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.value") - F.col("a.value"))
            * F.lit(86400000000.0)
            / (F.col("b.us") - F.col("a.us"))
        ).alias("slope"),
    )
    return slopes.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.percentile("slope", 0.5), 6).alias("ts_slope"),
    )


@register(
    "attribution_touchpoints",
    tags=("W-ext", "J-ext"),
    oracle="""
    WITH touches AS (
        SELECT p.event_id AS purchase_id, p.value AS purchase_value,
               c.event_id AS click_id, c.ts AS click_ts
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL 7 DAY
        WHERE p.event_type = 'purchase'
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY purchase_id
                                  ORDER BY click_ts, click_id) AS rk,
               count(*) OVER (PARTITION BY purchase_id) AS n_touches
        FROM touches
    )
    SELECT purchase_id,
           round(purchase_value, 2) AS purchase_value,
           CAST(n_touches AS BIGINT) AS n_touches,
           max(CASE WHEN rk = 1 THEN click_id END) AS first_touch,
           max(CASE WHEN rk = n_touches THEN click_id END) AS last_touch
    FROM ranked
    GROUP BY purchase_id, purchase_value, n_touches
    """,
)
def attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    purchase, the user's earliest and latest click inside a 7-day
    lookback, plus the touch count — the marketing-attribution join
    every funnel warehouse ships. Per-user equi-join with a time-range
    residual (never a cartesian; the per-purchase candidate list is
    bounded by a user's 7-day click activity), deterministic
    tie-breaks on (ts, event_id) so both engines pick identical
    endpoint touches. ONE window sort per partition: (click_ts,
    click_id) is a total order, so the last touch is simply the row
    at rank n_touches — no second descending sort (review finding)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    touches = p.join(c, "user_id").filter(
        (F.col("click_ts") <= F.col("p_ts"))
        & (F.col("click_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    wf = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    wn = Window.partitionBy("purchase_id")
    ranked = touches.select(
        "purchase_id",
        "purchase_value",
        "click_id",
        F.row_number().over(wf).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n_touches"),
    )
    return ranked.groupBy("purchase_id", "purchase_value", "n_touches").agg(
        F.max(F.when(F.col("rk") == 1, F.col("click_id"))).alias("first_touch"),
        F.max(F.when(F.col("rk") == F.col("n_touches"), F.col("click_id"))).alias(
            "last_touch"
        ),
    ).select(
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
        F.col("n_touches").cast("long").alias("n_touches"),
        "first_touch",
        "last_touch",
    )


def _duck_avg_rank_cte(name: str, col: str) -> str:
    """Average-rank dictionary for a BOUNDED-cardinality column:
    rank_avg(v) = (# rows < v) + (# rows = v + 1)/2 — the tie-aware
    (fractional) rank Spearman needs, computed from the value
    histogram, never by ranking the fact table row-wise."""
    return f"""
    {name} AS (
        SELECT {col} AS v,
               coalesce(sum(n) OVER (ORDER BY {col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (n + 1) / 2.0 AS r
        FROM (SELECT {col}, count(*) AS n FROM lineitem GROUP BY {col})
    )"""


@register(
    "spearman_qty_discount",
    tags=("A-ext", "W-ext"),
    oracle=f"""
    WITH
    {_duck_avg_rank_cte("rq", "l_quantity")},
    {_duck_avg_rank_cte("rd", "l_discount")}
    SELECT round(corr(rq.r, rd.r), 6) AS spearman_rho,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN rq ON rq.v = l.l_quantity
    JOIN rd ON rd.v = l.l_discount
    """,
)
def spearman_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line-item quantity and
    discount — the monotone-dependence screen Pearson misses, with
    textbook tie handling (average fractional ranks; both columns are
    heavily tied integers/cents). Scale shape: ranks come from each
    column's VALUE DICTIONARY (50 quantities, 11 discounts — one
    bounded groupBy + a few-row cumulative each), broadcast-joined
    back to the fact rows; the fact table is never row-ranked, so no
    global sort ever exists in the plan. Ranks are exact
    integer-derived doubles, so both engines feed corr identical
    values."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_discount")

    def avg_ranks(col: str) -> DataFrame:
        hist = li.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("n"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return hist.select(
            "v",
            (
                F.coalesce(F.sum("n").over(w), F.lit(0)) + (F.col("n") + 1) / 2.0
            ).alias("r"),
        )

    rq = avg_ranks("l_quantity").select(
        F.col("v").alias("l_quantity"), F.col("r").alias("rq")
    )
    rd = avg_ranks("l_discount").select(
        F.col("v").alias("l_discount"), F.col("r").alias("rd")
    )
    joined = li.join(F.broadcast(rq), "l_quantity").join(F.broadcast(rd), "l_discount")
    return joined.agg(
        F.round(F.corr("rq", "rd"), 6).alias("spearman_rho"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "welch_ttest_periods",
    tags=("A-ext",),
    oracle=f"""
    WITH g AS (
        SELECT CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 'a' ELSE 'b' END AS grp,
               CAST(count(*) AS BIGINT) AS n,
               avg(value) AS m,
               var_samp(value) AS v
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT a.n AS n_a, b.n AS n_b,
               round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
               (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS t,
               pow(a.v / a.n + b.v / b.n, 2)
                 / (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)) AS dof
        FROM (SELECT * FROM g WHERE grp = 'a') a, (SELECT * FROM g WHERE grp = 'b') b
    )
    SELECT n_a, n_b, mean_a, mean_b,
           round(t, 6) AS t_stat, round(dof, 2) AS dof,
           abs(t) > 1.96 AS sig_05
    FROM w
    """,
)
def welch_ttest_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic for the event-value mean between
    the fixture's calendar halves (unequal variances, Satterthwaite
    dof) — the inference screen behind every A/B readout, paired with
    the PSI drift view of the same split. One grouped aggregation
    (count/avg/var_samp are all one-pass partial-aggregable), a 2-row
    self-product, pure arithmetic after; |t| > 1.96 flags ~p<0.05.
    var_samp/avg divide identical sums on both engines, and t has
    O(1) magnitude — round(6) absorbs the summation-order ulps."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), "a")
        .otherwise("b")
        .alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = g.filter(F.col("grp") == "a").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("v").alias("v_a")
    )
    b = g.filter(F.col("grp") == "b").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("v").alias("v_b")
    )
    se2a = F.col("v_a") / F.col("n_a")
    se2b = F.col("v_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2a + se2b)
    dof = F.pow(se2a + se2b, 2) / (
        F.pow(se2a, 2) / (F.col("n_a") - 1) + F.pow(se2b, 2) / (F.col("n_b") - 1)
    )
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 2).alias("dof"),
        (F.abs(t) > 1.96).alias("sig_05"),
    )


@register(
    "mannwhitney_value_periods",
    tags=("A-ext", "W-ext"),
    oracle=f"""
    WITH vals AS (
        SELECT CAST(round(value * 10000) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c,
               CAST(count(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS c1
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT v, c, c1,
               coalesce(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        FROM vals
    ),
    agg AS (
        SELECT sum(CAST(c1 AS HUGEINT) * (2 * cum_excl + c + 1)) AS r1x2,
               CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c) AS BIGINT) AS n,
               sum(CAST(c AS HUGEINT) * c * c - c) AS tie
        FROM ranked
    ),
    stat AS (
        SELECT n1, n - n1 AS n2,
               r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2, n, tie
        FROM agg
    )
    SELECT n1 AS n_a, n2 AS n_b,
           round(u1x2 / 2.0, 1) AS u_a,
           round((u1x2 - CAST(n1 AS HUGEINT) * n2)
                 / (2.0 * sqrt((1.0 * n1) * n2
                               * ((n + 1) - tie / ((1.0 * n) * (n - 1))) / 12.0)),
                 6) AS z_stat,
           (((2 * u1x2 * 1000000 + CAST(n1 AS HUGEINT) * n2)
               // (2 * CAST(n1 AS HUGEINT) * n2)) - 1000000)
             / 1000000.0 AS rank_biserial,
           abs((u1x2 - CAST(n1 AS HUGEINT) * n2)
               / (2.0 * sqrt((1.0 * n1) * n2
                             * ((n + 1) - tie / ((1.0 * n) * (n - 1))) / 12.0))) > 1.96
             AS sig_05
    FROM stat
    """,
)
def mannwhitney_value_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the fixture's
    calendar halves — the NONPARAMETRIC partner of
    ``welch_ttest_periods``: rank-based, so heavy-tailed transaction
    values can't dominate the statistic the way they pull a mean.
    Tie-corrected normal approximation z plus the rank-biserial effect
    size.

    Exactness discipline: ranks are computed from per-VALUE counts
    (values integer-scaled by 1e4 — fixture values carry <= 4
    decimals), so the doubled rank sum 2*R1 = sum c1*(2*cum_excl+c+1)
    is exact on both engines — in decimal(38,0)/HUGEINT, like the tie
    term and the effect-size identity (the LONG forms capped at ~3e6
    total events and failed past it — an ANSI overflow error here,
    a silent wrap with ANSI off). Remaining bounds: one
    value carried by < 4.6e12 rows (the c^3 tie term vs 1e38), and
    the effect-size identity's 2*u1x2*1e6 < 1e38, i.e. n1*n2 <
    ~2.5e31 (~1e16 events total, balanced). z divides identical
    integers
    through a sqrt (irrational — round(6) is boundary-safe), while the
    RATIONAL effect size rank_biserial = 2*U1/(n1*n2) - 1 =
    u1x2/(n1*n2) - 1 (r8 review fix: the first cut dropped the factor
    2 on U1, emitting the sign-inverted (1-r)/2) rounds in integer
    arithmetic on the SHIFTED nonnegative form r+1 = u1x2/(n1*n2),
    subtracting the 10^6 offset while still integral — the
    loo_value_encoding lesson (rational quotients land exactly on the
    round-half boundary, where the engines' round() disagree), plus
    keeping integer division away from negatives (Spark div truncates
    toward zero, DuckDB // floors). Plan:
    one value-keyed count shuffle (~49k distinct values — the window
    and final aggregate run on the compressed value table, never the
    raw events), one ordered prefix-sum window, one 1-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.groupBy(F.round(F.col("value") * 10000).cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.count(F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1))
        .cast("long")
        .alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "v", "c", "c1", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_excl")
    )
    # rank-sum, tie, and effect-size products run in decimal(38,0)
    # (HUGEINT in the oracle): the LONG forms cap at ~3e6 total events
    # (2*u1x2*1e6 needs u1x2 <= n1*n2 < 4.6e12) and the tie term c^3
    # overflows on any single value carried by > 2.1e6 rows — the
    # corpus-scale overflow hazard (ANSI error / non-ANSI silent
    # wrap) the KS widening closed. Remaining
    # exactness bounds: c < 4.6e12 rows on ONE value (c^3 vs 1e38) and
    # n < ~9.2e18 (the n1/n LONG outputs).
    agg = ranked.agg(
        # the rank term 2*cum_excl+c+1 also widens BEFORE its doubling
        # (cum_excl <= n, so the LONG form overflows at n > ~4.6e18)
        F.sum(
            _dec19("c1") * (2 * _dec19("cum_excl") + F.col("c") + 1)
        ).alias("r1x2"),
        F.sum("c1").alias("n1"),
        F.sum("c").alias("n"),
        F.sum(_dec19("c") * _dec19("c") * _dec19("c") - _dec19("c")).alias("tie"),
    )
    n1, n = F.col("n1"), F.col("n")
    n2 = n - n1
    n1d = n1.cast("decimal(19,0)")
    u1x2 = F.col("r1x2") - n1d * (n1 + 1)
    # the float sigma/z path multiplies via (1.0*n1)*n2 so no LONG
    # product ever forms (the integer n1*n2 overflows past ~3e9 a side);
    # the oracle mirrors the same shapes so both engines evaluate the
    # identical correctly-rounded IEEE expression
    sigma_x2 = 2.0 * F.sqrt(
        (1.0 * n1) * n2 * ((n + 1) - F.col("tie") / ((1.0 * n) * (n - 1))) / 12.0
    )
    z = (u1x2 - n1d * n2) / sigma_x2
    return (
        agg.withColumn("__a", u1x2.cast("decimal(38,0)"))
        .withColumn("__b", (n1d * n2).cast("decimal(38,0)"))
        .select(
            n1.alias("n_a"),
            n2.alias("n_b"),
            F.round(u1x2 / 2.0, 1).alias("u_a"),
            F.round(z, 6).alias("z_stat"),
            (
                (F.expr("(2 * __a * 1000000 + __b) div (2 * __b)") - 1000000)
                / F.lit(1000000.0)
            ).alias("rank_biserial"),
            (F.abs(z) > 1.96).alias("sig_05"),
        )
    )


@register(
    "ks_test_periods",
    tags=("A-ext", "W-ext"),
    oracle=f"""
    WITH vals AS (
        SELECT CAST(round(value * 10000) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c,
               CAST(count(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS c1
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT sum(c1) OVER (ORDER BY v) AS cum1,
               sum(c - c1) OVER (ORDER BY v) AS cum2,
               sum(c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n1,
               sum(c - c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n2
        FROM vals
    ),
    agg AS (
        SELECT max(abs(CAST(cum1 AS HUGEINT) * n2
                       - CAST(cum2 AS HUGEINT) * n1)) AS ks_num,
               CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
        FROM cum
    )
    SELECT n1 AS n_a, n2 AS n_b,
           CAST(ks_num AS VARCHAR) AS ks_num,
           ((2 * ks_num * 1000000 + CAST(n1 AS HUGEINT) * n2)
              // (2 * CAST(n1 AS HUGEINT) * n2))
             / 1000000.0 AS ks_d,
           CAST(ks_num AS DOUBLE) / (1.0 * n1 * n2)
             > 1.358 * sqrt((n1 + n2) / (1.0 * n1 * n2)) AS sig_05
    FROM agg WHERE n1 > 0 AND n2 > 0
    """,
)
def ks_test_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the fixture's calendar
    halves — the DISTRIBUTION-SHAPE member of the drift family
    (welch tests the mean, mannwhitney the location, PSI the binned
    histogram; KS is the sup-norm gap of the full ECDFs, so a variance
    or tail change moves it even when the means agree).

    Exactness: D's numerator max|cum1*n2 - cum2*n1| is exact on the
    per-VALUE count table (values integer-scaled by 1e4, the
    mannwhitney convention), with products and the half-up div
    identity computed in decimal(38,0) / HUGEINT (numerator
    nonnegative) — exact to ~1e15 events a side, which is also the
    output bound: ks_num is emitted as a VARCHAR-cast decimal (r9
    verdict item 3 — the old BIGINT cast died at n1*n2 >= 9.2e18,
    ~3e9 events a side), rendered identically by Spark decimal(38,0)
    and DuckDB HUGEINT since the value is a nonnegative scale-0
    integer. sig_05's D is the correctly-rounded double of that
    integer over (1.0*n1)*n2 on both engines. sig_05 compares D
    against the
    alpha=.05 asymptotic line 1.358*sqrt((n1+n2)/(n1*n2)); the
    boundary is irrational while D is rational, so the flag cannot sit
    on a knife edge, and both engines evaluate the identical
    correctly-rounded IEEE expression. Plan: one value-keyed count
    shuffle compresses events to <= ~49k rows; the ordered ECDF window
    and the 1-row max run on the compressed table."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.groupBy(F.round(F.col("value") * 10000).cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.count(F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1))
        .cast("long")
        .alias("c1"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum(F.col("c") - F.col("c1")).over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum(F.col("c") - F.col("c1")).over(w_all).alias("n2"),
    )
    # products and the round identity run in decimal(38,0) (HUGEINT on
    # the oracle side) so the statistic stays exact far past the LONG
    # ceiling; the OUTPUT ks_num is a VARCHAR-cast decimal (plain
    # decimal outputs are driver-canonicalizer-hostile — the r7
    # decimal_money_totals class — but the string of a nonnegative
    # scale-0 integer renders identically on both engines), so the
    # whole query is exact to the internal ~1e15-events-a-side width
    agg = cum.agg(
        F.max(F.abs(_dec19("cum1") * _dec19("n2") - _dec19("cum2") * _dec19("n1")))
        .alias("__ks"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    d = F.col("__ks").cast("double") / (1.0 * n1 * n2)
    # degenerate-split guard (all events one side): emit no row instead
    # of dividing by zero — DuckDB would ERROR where Spark yields NULL
    agg = agg.filter((n1 > 0) & (n2 > 0))
    return agg.select(
        n1.alias("n_a"),
        n2.alias("n_b"),
        F.col("__ks").cast("string").alias("ks_num"),
        (
            F.expr(
                "(2 * __ks * 1000000 + cast(n1 as decimal(38,0)) * n2)"
                " div (2 * cast(n1 as decimal(38,0)) * n2)"
            )
            / F.lit(1000000.0)
        ).alias("ks_d"),
        (d > 1.358 * F.sqrt((n1 + n2) / (1.0 * n1 * n2))).alias("sig_05"),
    )


@register(
    "behavior_shift_users",
    tags=("A-ext", "W-ext"),
    oracle=f"""
    WITH ct AS (
        SELECT user_id, event_type,
               CAST(count(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS c1,
               CAST(count(*) FILTER (ts >= TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS c2
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, event_type, c1, c2,
               sum(c1) OVER (PARTITION BY user_id) AS n1,
               sum(c2) OVER (PARTITION BY user_id) AS n2
        FROM ct
    ),
    agg AS (
        SELECT user_id, CAST(max(n1) AS BIGINT) AS n_a,
               CAST(max(n2) AS BIGINT) AS n_b,
               CAST(sum(abs(CAST(c1 AS HUGEINT) * n2
                            - CAST(c2 AS HUGEINT) * n1)) AS BIGINT) AS tv_num
        FROM tot WHERE n1 > 0 AND n2 > 0 GROUP BY user_id
    )
    SELECT user_id, n_a, n_b, tv_num,
           ((2 * CAST(tv_num AS HUGEINT) * 1000000 + 2 * CAST(n_a AS HUGEINT) * n_b)
              // (2 * 2 * CAST(n_a AS HUGEINT) * n_b))
             / 1000000.0 AS tv_dist,
           5 * CAST(tv_num AS HUGEINT) > 3 * CAST(n_a AS HUGEINT) * n_b AS shifted
    FROM agg
    """,
)
def behavior_shift_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-takeover / repurposing screen: per user, the total
    variation distance between the event-type mix of the first and
    second calendar halves — TV = (1/2) sum_t |p1(t) - p2(t)|, 0 for
    an unchanged profile, 1 for a complete swap. A mule account that
    flips from browsing to transacting moves TV even when its VOLUME
    is steady (which is why this complements the per-user entropy and
    the population-level PSI). ``shifted`` flags TV > 0.3 (~ the
    fixture's p92).

    Exactness: TV's numerator sum|c1*n2 - c2*n1| is an exact BIGINT;
    TV = tv_num/(2*n1*n2) rounds half-up by the div identity
    (nonnegative), and the flag is the exact integer compare
    5*tv_num > 3*n1*n2 (TV > 0.3 with the 2 folded in). Plan:
    one (user, type) count shuffle with map-side partials, then the
    per-user window and final aggregate run on the <= users x types
    compressed table, keyed on user."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_DRIFT_SPLIT).cast("timestamp")
    ct = ev.groupBy("user_id", "event_type").agg(
        F.count(F.when(F.col("ts") < split, 1)).cast("long").alias("c1"),
        F.count(F.when(F.col("ts") >= split, 1)).cast("long").alias("c2"),
    )
    w_u = Window.partitionBy("user_id")
    tot = ct.select(
        "user_id",
        "c1",
        "c2",
        F.sum("c1").over(w_u).alias("n1"),
        F.sum("c2").over(w_u).alias("n2"),
    ).filter((F.col("n1") > 0) & (F.col("n2") > 0))
    # per-user products run in decimal (HUGEINT in the oracle): the
    # LONG tv identity overflows once ONE user's half-counts multiply past
    # ~2.3e12 — a bot/hub account hazard at corpus scale
    agg = tot.groupBy("user_id").agg(
        F.max("n1").cast("long").alias("n_a"),
        F.max("n2").cast("long").alias("n_b"),
        F.sum(F.abs(_dec19("c1") * _dec19("n2") - _dec19("c2") * _dec19("n1")))
        .cast("long")
        .alias("tv_num"),
    )
    return agg.select(
        "user_id",
        "n_a",
        "n_b",
        "tv_num",
        (
            F.expr(
                "(2 * cast(tv_num as decimal(38,0)) * 1000000"
                " + 2 * cast(n_a as decimal(38,0)) * n_b)"
                " div (2 * 2 * cast(n_a as decimal(38,0)) * n_b)"
            )
            / F.lit(1000000.0)
        ).alias("tv_dist"),
        (
            5 * F.col("tv_num").cast("decimal(38,0)")
            > 3 * F.col("n_a").cast("decimal(19,0)") * F.col("n_b")
        ).alias("shifted"),
    )


@register(
    "kendall_tau_qty_discount",
    headline=True,  # r10: bench floor for the contingency-grid family (r9 verdict item 4)
    tags=("A-ext", "J3"),
    oracle="""
    WITH cells AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT CAST(sum(CASE WHEN a.d < b.d
                             THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS BIGINT)
                   AS conc,
               CAST(sum(CASE WHEN a.d > b.d
                             THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS BIGINT)
                   AS disc
        FROM cells a JOIN cells b ON a.q < b.q
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    tq AS (
        SELECT CAST(sum(CAST(cq AS HUGEINT) * (cq - 1)) // 2 AS BIGINT) AS t1
        FROM (SELECT sum(c) AS cq FROM cells GROUP BY q)
    ),
    td AS (
        SELECT CAST(sum(CAST(cd AS HUGEINT) * (cd - 1)) // 2 AS BIGINT) AS t2
        FROM (SELECT sum(c) AS cd FROM cells GROUP BY d)
    )
    SELECT n, coalesce(conc, 0) AS conc, coalesce(disc, 0) AS disc, t1, t2,
           CASE WHEN CAST(n AS HUGEINT) * (n - 1) // 2 > t1
                 AND CAST(n AS HUGEINT) * (n - 1) // 2 > t2
                THEN round((coalesce(conc, 0) - coalesce(disc, 0))
                           / (sqrt((1.0 * n) * (n - 1) / 2.0 - t1)
                              * sqrt((1.0 * n) * (n - 1) / 2.0 - t2)), 6)
           END AS tau_b
    FROM pairs, tot, tq, td
    """,
)
def kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between order quantity and discount — the
    CONCORDANCE member of the association family (spearman ranks the
    margins; tau-b counts concordant vs discordant pairs, with the
    tie corrections both need on coarse grids). The naive O(n^2) pair
    count collapses to the CONTINGENCY-GRID formulation: quantity and
    discount live on a 50 x 11 grid, so concordant/discordant sums run
    over <= 550^2 cell pairs with exact BIGINT products — one count
    shuffle compresses the fact table, then the cell-pair join is a
    broadcast over hundreds of rows, never the row-level self-join.

    Exactness: conc/disc/t1/t2/n are exact integers — products run in
    decimal(38,0)/HUGEINT (the LONG forms overflowed past ~4e9 rows);
    the OUTPUT casts stay BIGINT, valid while n(n-1)/2 < 9.2e18
    (~4e9 rows), the remaining documented bound — so the hash attests
    the full sufficient statistics exactly; tau_b divides the exact integer (conc - disc)
    through sqrt((n0-t1)(n0-t2)). That sqrt is irrational — and
    round(6) therefore boundary-safe — ONLY while the radicand is not
    a perfect square (it IS one in e.g. the tie-free case, where the
    quotient degenerates to the rational (conc-disc)/n0 — the
    documented round(6) landmine class). The fixture radicands are
    non-square and the computed tau_b values sit >= 1e-4 scaled units
    off every round-half boundary, pinned at all SFs by
    tests/test_operators.py::
    test_kendall_runs_stay_off_rounding_boundaries (predriver pin
    list); a regen that breaks the pin must reformulate tau_b with the
    div-based integer identity on the rational branch BEFORE the
    driver runs."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.round("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # 5 plan branches consume `cells` (a, b, tot, tq, td): cut the
        # lineage once so the lineitem scan + count shuffle run ONCE
        # instead of per branch (the r8 tfidf lesson); the grid is
        # <= 550 rows at any SF, so the checkpoint is free. eager=False
        # keeps PLAN CONSTRUCTION lazy (catalog sweeps / plan lint /
        # explain-only tooling must not execute the lineitem scan as a
        # side effect — r9 advice); the checkpoint materializes at the
        # first action and is shared by all branches from then on.
        # Failure mode at cluster scale: localCheckpoint blocks live on
        # executors (not the reliable store), so losing an executor
        # mid-query drops the grid and fails the query — acceptable for
        # a <= 550-row cache that a retry rebuilds in one shuffle; use
        # checkpoint(reliable) only if retries themselves are costly.
        .localCheckpoint(eager=False)
    )
    # cell products, tie terms, and the n0 guard run in decimal(38,0)
    # (HUGEINT in the oracle): the LONG forms overflow past ~4e9 rows
    # (c*c, cq*(cq-1), n*(n-1) all quadratic in corpus size); the
    # conc/disc/t1/t2 OUTPUT casts stay BIGINT — valid to n*(n-1)/2 <
    # 9.2e18 (~4e9 rows), the remaining documented bound
    a, b = cells.alias("a"), cells.alias("b")
    ac, bc = _dec19("a.c"), _dec19("b.c")
    pairs = a.join(b, F.col("a.q") < F.col("b.q")).agg(
        F.sum(F.when(F.col("a.d") < F.col("b.d"), ac * bc).otherwise(0))
        .cast("long")
        .alias("conc"),
        F.sum(F.when(F.col("a.d") > F.col("b.d"), ac * bc).otherwise(0))
        .cast("long")
        .alias("disc"),
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    tq = (
        cells.groupBy("q")
        .agg(F.sum("c").alias("cq"))
        .agg(
            F.expr("sum(cast(cq as decimal(19,0)) * (cq - 1)) div 2")
            .cast("long")
            .alias("t1")
        )
    )
    td = (
        cells.groupBy("d")
        .agg(F.sum("c").alias("cd"))
        .agg(
            F.expr("sum(cast(cd as decimal(19,0)) * (cd - 1)) div 2")
            .cast("long")
            .alias("t2")
        )
    )
    joined = pairs.crossJoin(tot).crossJoin(tq).crossJoin(td)
    # degenerate guard (all rows tied on one variable, or n < 2): the
    # denominator is 0 — emit NULL identically on both engines instead
    # of an engine-specific 0/0; conc/disc coalesce to 0 when the
    # cell-pair join is empty (single q value)
    conc = F.coalesce(F.col("conc"), F.lit(0)).alias("conc")
    disc = F.coalesce(F.col("disc"), F.lit(0)).alias("disc")
    n0 = (1.0 * F.col("n")) * (F.col("n") - 1) / F.lit(2.0)
    n0_int = F.expr("cast(n as decimal(19,0)) * (n - 1) div 2")
    tau = (F.coalesce(F.col("conc"), F.lit(0)) - F.coalesce(F.col("disc"), F.lit(0))) / (
        F.sqrt(n0 - F.col("t1")) * F.sqrt(n0 - F.col("t2"))
    )
    return joined.select(
        "n",
        conc,
        disc,
        "t1",
        "t2",
        F.when(
            (n0_int > F.col("t1")) & (n0_int > F.col("t2")), F.round(tau, 6)
        ).alias("tau_b"),
    )


@register(
    "runs_test_user_values",
    tags=("A-ext", "W-ext"),
    oracle="""
    WITH seq AS (
        SELECT user_id, (value >= 50.0) AS hi,
               lag(value >= 50.0) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev
        FROM events
    ),
    st AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (hi) AS BIGINT) AS n1,
               CAST(count(*) FILTER (NOT hi) AS BIGINT) AS n2,
               CAST(1 + count(*) FILTER (prev IS NOT NULL AND hi <> prev)
                    AS BIGINT) AS runs
        FROM seq GROUP BY user_id
        HAVING 2 * CAST(n1 AS HUGEINT) * n2 > n
    )
    SELECT user_id, n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / n + 1))
                 / sqrt((2.0 * n1 * n2) * ((2.0 * n1 * n2) - n)
                        / (1.0 * n * n * (n - 1))), 6) AS z_stat,
           abs((runs - (2.0 * n1 * n2 / n + 1))
               / sqrt((2.0 * n1 * n2) * ((2.0 * n1 * n2) - n)
                      / (1.0 * n * n * (n - 1)))) > 1.96 AS nonrandom
    FROM st
    """,
)
def runs_test_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per user: is the time-ordered sequence
    of high/low transaction values (threshold 50.00 — the fixture's
    on-grid midscale) random, or does it cluster/alternate? Scripted
    activity (bots, drip schedules) produces too FEW runs (clustered)
    or too MANY (forced alternation); |z| > 1.96 flags either — the
    sequence-order complement of the gap-based periodicity screen.

    Exactness: the run count is an exact integer from a lag window
    ordered by (integer microseconds, event_id) — a total order both
    engines sort identically; n1/n2 are exact counts, the 2*n1*n2 > n
    degeneracy guard is an exact integer predicate (sigma = 0
    otherwise), and z divides exact rationals through
    sqrt(2*n1*n2*(2*n1*n2-n)/(n^2*(n-1))) — irrational (so round(6)
    boundary-safe) ONLY while 2*n1*n2*(2*n1*n2-n)*(n-1) is not a
    perfect square; a user whose counts make it one lands z on the
    documented rational round(6) landmine. The fixture radicands are
    all non-square and every z sits >= 1e-4 scaled units off the
    round-half boundaries, pinned at all SFs by
    tests/test_operators.py::
    test_kendall_runs_stay_off_rounding_boundaries (predriver pin
    list; on failure, reformulate the offending branch with the
    div-based integer identity BEFORE the driver runs). Plan: one lag
    window and one aggregate, both keyed on user_id — a single
    shuffle, reused."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        (F.col("value") >= 50.0).alias("hi"),
        F.lag(F.col("value") >= 50.0).over(w).alias("prev"),
    )
    st = (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("hi"), 1)).cast("long").alias("n1"),
            F.count(F.when(~F.col("hi"), 1)).cast("long").alias("n2"),
            (
                1
                + F.count(
                    F.when(F.col("prev").isNotNull() & (F.col("hi") != F.col("prev")), 1)
                )
            )
            .cast("long")
            .alias("runs"),
        )
        # decimal guard (HUGEINT in the oracle): the LONG 2*n1*n2
        # overflows once one user's half-counts multiply past ~4.6e18
        .filter(
            2 * F.col("n1").cast("decimal(19,0)") * F.col("n2") > F.col("n")
        )
    )
    n, n1, n2 = F.col("n"), F.col("n1"), F.col("n2")
    mu = 2.0 * n1 * n2 / n + 1
    # sigma's products stay float-shaped on BOTH engines so no integer
    # product ever forms (values identical below 2^53, shapes identical
    # above)
    sigma = F.sqrt(
        (2.0 * n1 * n2) * ((2.0 * n1 * n2) - n) / (1.0 * n * n * (n - 1))
    )
    z = (F.col("runs") - mu) / sigma
    return st.select(
        "user_id",
        "n1",
        "n2",
        "runs",
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.96).alias("nonrandom"),
    )


# ---------------------------------------------------------------------------
# Velocity controls (r10): rolling multi-horizon rate limits — the real-time
# control AML programs pair with the retrospective screens above. RANGE
# frames anchored at CURRENT ROW grow incrementally (the O(n^2) window trap
# is UNBOUNDED FOLLOWING re-aggregation — see operators.skyline_2d), so per
# partition this is one sort + one linear pass.
# ---------------------------------------------------------------------------

#: 1h-count and 24h-sum limits sit at the fixture's p99 band (probed at all
#: three SFs: c1h quantiles [p50 1, p99 2, max 3-4]; s24 cents quantiles
#: [p50 ~13.5k, p99 ~52k, max ~96k]) — breaches exist at every SF
#: (4/31/427 count breaches, 15/85/1027 sum breaches) without flagging
#: half the table.
_VELOCITY_MAX_1H = 3
_VELOCITY_MAX_24H_CENTS = 52_000


@register(
    "velocity_limit_breaches",
    tags=("W-ext", "A2"),
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS c1h,
             sum(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS s24
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(c1h) AS BIGINT) AS max_1h_count,
           CAST(max(s24) AS BIGINT) AS max_24h_cents,
           CAST(count(*) FILTER (c1h >= {_VELOCITY_MAX_1H}) AS BIGINT)
             AS n_count_breaches,
           CAST(count(*) FILTER (s24 > {_VELOCITY_MAX_24H_CENTS}) AS BIGINT)
             AS n_sum_breaches
    FROM v GROUP BY user_id
    HAVING count(*) FILTER (c1h >= {_VELOCITY_MAX_1H}) > 0
        OR count(*) FILTER (s24 > {_VELOCITY_MAX_24H_CENTS}) > 0
    """,
)
def velocity_limit_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling velocity-limit screen: per user, every event evaluates
    two trailing-horizon counters — transaction COUNT over the last
    hour and cent VOLUME over the last 24 h — against fixed limits
    (the card-network/KYC control: rapid-fire bursts and daily-volume
    caps), and users with any breach surface with their worst
    readings. The retrospective twin of the streaming façade's
    stateful_user_totals alert.

    Exactness: frames are anchored on exact integer MICROSECONDS
    (unix_micros/epoch_us) so frame membership is identical on both
    engines — ties (same user, same ts) are RANGE-frame peers and
    aggregate identically; counters are integer counts and exact cent
    sums. Plan: ONE shuffle on user_id serves both windows (same
    partitioning, same sort), then a keyed re-aggregation on the same
    key — partial-aggregated, no second exchange."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    cents = F.round(F.col("value") * 100).cast("long")
    w1h = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    w24 = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    v = ev.select(
        "user_id",
        F.count(F.lit(1)).over(w1h).alias("c1h"),
        F.sum(cents).over(w24).alias("s24"),
    )
    count_breach = F.when(F.col("c1h") >= _VELOCITY_MAX_1H, 1).otherwise(0)
    sum_breach = F.when(F.col("s24") > _VELOCITY_MAX_24H_CENTS, 1).otherwise(0)
    return (
        v.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("c1h").cast("long").alias("max_1h_count"),
            F.max("s24").cast("long").alias("max_24h_cents"),
            F.sum(count_breach).cast("long").alias("n_count_breaches"),
            F.sum(sum_breach).cast("long").alias("n_sum_breaches"),
        )
        .filter((F.col("n_count_breaches") > 0) | (F.col("n_sum_breaches") > 0))
    )


# ---------------------------------------------------------------------------
# Counterparty-network churn (r10): NEW counterparties per account-day.
# counterparty_concentration reads the STOCK of a user's network; this reads
# the FLOW — a dormant-then-many-new-counterparties day is the activation
# shape of a mule account handed to an operator.
# ---------------------------------------------------------------------------


@register(
    "new_counterparty_rate",
    tags=("W-ext", "A-ext"),
    oracle="""
    WITH firsts AS (
      SELECT user_id AS src,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst,
             strftime(ts, '%Y-%m-%d') AS day,
             row_number() OVER (PARTITION BY user_id,
                                  CAST(json_extract_string(props, '$.k') AS BIGINT)
                                ORDER BY ts, event_id) = 1 AS is_first
      FROM events
    )
    SELECT src, day,
           CAST(count(*) AS BIGINT) AS n_transfers,
           CAST(count(*) FILTER (is_first) AS BIGINT) AS n_new,
           ((2 * CAST(count(*) FILTER (is_first) AS HUGEINT) * 1000000
             + count(*)) // (2 * CAST(count(*) AS HUGEINT)))
             / 1000000.0 AS new_share
    FROM firsts GROUP BY src, day
    """,
)
def new_counterparty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterparty-churn screen: per payer per day, how many
    transfers went to a counterparty that payer had NEVER paid before
    (first transfer on the (src, dst) channel, ties broken by
    event_id), and the share of the day's transfers that were
    first-contacts. Organic accounts accrete counterparties slowly; a
    taken-over account fans out to a fresh set overnight.

    Exactness: first-ness is a deterministic row_number over exact
    (ts, event_id); days are ISO strings on both engines (the r5 date
    lesson); the share uses the div-based round-half-up identity in
    HUGEINT/decimal. Plan: one shuffle on (src, dst) for the
    first-seen window, then one keyed aggregation on (src, day) —
    at 100 TB the channel key is the natural partitioning (same key
    the reciprocal/periodic screens shuffle on) and the day rollup is
    a near-local re-aggregation."""
    ev = load_table(spark, sf_dir, "events")
    chan = Window.partitionBy(
        "user_id", F.get_json_object("props", "$.k").cast("long")
    ).orderBy("ts", "event_id")
    firsts = ev.select(
        F.col("user_id").alias("src"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.row_number().over(chan) == 1).alias("is_first"),
    )
    share = F.expr(
        "(2 * cast(n_new as decimal(38,0)) * 1000000 + n_transfers)"
        " div (2 * cast(n_transfers as decimal(38,0)))"
    ) / F.lit(1000000.0)
    return (
        firsts.groupBy("src", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transfers"),
            F.sum(F.when(F.col("is_first"), 1).otherwise(0)).cast("long").alias("n_new"),
        )
        .select("src", "day", "n_transfers", "n_new", share.alias("new_share"))
    )


# ---------------------------------------------------------------------------
# Amount ending-digit entropy (r10): the per-account member of the
# amount-shape family — benford screens read LEADING digits corpus/segment
# wide, round_amount_bias reads the 00-ending share per segment; this reads
# each account's full ENDING-digit distribution. Scripted amounts are either
# too concentrated (one template => entropy ~0) or too uniform (RNG cents =>
# entropy ~ln(100)); organic spending sits between.
# ---------------------------------------------------------------------------


@register(
    "amount_digit_entropy",
    tags=("A-ext", "F5"),
    oracle="""
    WITH d AS (
      SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS dp
      FROM orders
    ),
    c AS (SELECT o_custkey, dp, count(*) AS k FROM d GROUP BY 1, 2),
    t AS (SELECT o_custkey, sum(k) AS n, count(*) AS n_distinct FROM c GROUP BY 1)
    SELECT c.o_custkey,
           CAST(t.n AS BIGINT) AS n_orders,
           CAST(t.n_distinct AS BIGINT) AS n_endings,
           round(-sum((c.k / t.n) * ln(c.k / t.n)), 6) + 0.0 AS ending_entropy,
           CAST(max(c.k) AS BIGINT) AS modal_count
    FROM c JOIN t ON c.o_custkey = t.o_custkey
    WHERE t.n >= 5
    GROUP BY c.o_custkey, t.n, t.n_distinct
    """,
)
def amount_digit_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer Shannon entropy of order-amount ENDING digit pairs
    (the cents, 00-99): the account-level structuring fingerprint —
    a template-scripted account repeats one ending (entropy near 0,
    modal_count ~ n), organic accounts spread endings. n >= 5 floor
    (fixture: every SF has 146/1451/14534 qualifying customers,
    median 10 orders).

    Exactness: digit pairs are exact integers (on-grid cents mod
    100); counts are integers, so every p = k/n is the same rational
    on both engines and the entropy is a sum of transcendentals —
    round(6) is boundary-safe (the r8 taxonomy: ln of a non-unit
    rational is irrational). The p=1 single-ending case — the scripted
    account this screen exists to flag — evaluates to NEGATIVE zero
    (-1*ln(1) = -0.0), which DuckDB's round keeps but Spark's
    BigDecimal round normalizes; the + 0.0 on both sides canonicalizes
    the sign (the graph_modularity r8 lesson — the driver compare
    distinguishes IEEE zero signs). Plan: one
    (custkey, digit-pair) count shuffle, per-customer totals as a
    window over the SAME key, one keyed re-aggregation — the
    behavior_entropy_users shuffle shape on the amount axis."""
    orders = load_table(spark, sf_dir, "orders")
    dp = (F.round(F.col("o_totalprice") * 100).cast("long") % 100).alias("dp")
    c = orders.select("o_custkey", dp).groupBy("o_custkey", "dp").agg(
        F.count(F.lit(1)).alias("k")
    )
    w = Window.partitionBy("o_custkey")
    n = F.sum("k").over(w)
    p = F.col("k") / n
    return (
        c.withColumn("n", n)
        .withColumn("p", p)
        .groupBy("o_custkey")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_endings"),
            (F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6) + 0.0).alias("ending_entropy"),
            F.max("k").cast("long").alias("modal_count"),
        )
        .filter(F.col("n_orders") >= 5)
    )


# ---------------------------------------------------------------------------
# Smurfing-day aggregation screen (r10): the canonical CTR-evasion rule —
# several JUST-UNDER-threshold deposits whose 24h AGGREGATE crosses the
# reporting line. threshold_avoidance_scores reads the static share of
# shaved amounts; velocity_limit_breaches reads all-transaction rate
# limits; this composes both into the textbook alert: the shaved amounts
# themselves, aggregating past the threshold inside one day.
# ---------------------------------------------------------------------------

#: The sub-threshold band is the same [90, 100) shaving band
#: threshold_avoidance_scores pins (fixture p97+); an alert needs >= 2
#: band transactions in a trailing 24h whose cents sum to >= 2x the
#: 100-unit reporting threshold minus the shave (19000 cents) — probed
#: 1 / 8 / 71 alerted users at sf0.001 / 0.01 / 0.1: selective at
#: every SF, never empty.
_SMURF_MIN_COUNT = 2
_SMURF_MIN_CENTS = 19_000


@register(
    "structuring_aggregation_alerts",
    tags=("W-ext", "A2", "A3"),
    oracle=f"""
    WITH band AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      -- plain-column predicate (not the computed-cents form): on the
      -- 2-decimal grid value in [90, 100) == cents in [9000, 9999],
      -- and only the plain form reaches the parquet reader's
      -- PushedFilters on the engine side
      WHERE value >= 90.0 AND value < 100.0
    ),
    roll AS (
      SELECT user_id, event_id,
             CAST(count(*) OVER w AS BIGINT) AS c24,
             CAST(sum(cents) OVER w AS BIGINT) AS s24
      FROM band
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_band_txns,
           CAST(count(*) FILTER (c24 >= {_SMURF_MIN_COUNT}
                                 AND s24 >= {_SMURF_MIN_CENTS}) AS BIGINT)
             AS n_smurf_events,
           CAST(max(c24) AS BIGINT) AS max_24h_band_count,
           CAST(max(s24) AS BIGINT) AS max_24h_band_cents
    FROM roll GROUP BY user_id
    HAVING count(*) FILTER (c24 >= {_SMURF_MIN_COUNT}
                            AND s24 >= {_SMURF_MIN_CENTS}) > 0
    """,
)
def structuring_aggregation_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textbook structuring alert (31 USC 5324's evasion shape):
    users with >= 2 transactions shaved into the just-under-threshold
    band whose trailing-24h BAND aggregate crosses ~2x the reporting
    threshold — splitting one reportable movement into several
    sub-threshold pieces inside a day. Surfaces each offender with
    their band-transaction count and worst 24h window.

    Exactness: the band predicate, counts and cent sums are exact
    integers; the RANGE frame is anchored on exact integer
    microseconds with a SINGLE order key (engines reject value-range
    frames over composite orderings) — and that is already
    deterministic: RANGE makes same-microsecond events mutual peers
    by definition on both engines, regardless of tie order. Plan:
    the band filter pushes into the scan (the screen reads ~3% of
    events), then ONE user_id shuffle serves the rolling window and
    the final aggregation."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    band = (
        ev
        # plain-column predicate so it reaches PushedFilters (a
        # round(value*100) form would evaluate post-scan); exact-grid
        # equivalent of cents in [9000, 9999]
        .filter((F.col("value") >= 90.0) & (F.col("value") < 100.0))
        .select(
            "user_id", "event_id", F.unix_micros("ts").alias("us"), cents.alias("cents")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    roll = band.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("c24"),
        F.sum("cents").over(w).alias("s24"),
    )
    smurf = F.when(
        (F.col("c24") >= _SMURF_MIN_COUNT) & (F.col("s24") >= _SMURF_MIN_CENTS), 1
    ).otherwise(0)
    return (
        roll.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_band_txns"),
            F.sum(smurf).cast("long").alias("n_smurf_events"),
            F.max("c24").cast("long").alias("max_24h_band_count"),
            F.max("s24").cast("long").alias("max_24h_band_cents"),
        )
        .filter(F.col("n_smurf_events") > 0)
    )


# ---------------------------------------------------------------------------
# Peer-group deviation (r11): an account's TOTAL against the distribution of
# its segment PEERS — the cross-entity complement of zscore_outlier_orders'
# self-history baseline (a customer whose spend is unremarkable against its
# own past can still be 5 sigma outside its peer group, the classic
# peer-group-analysis AML control).
# ---------------------------------------------------------------------------


@register(
    "peer_group_deviation",
    tags=("J1", "A2", "A3"),
    oracle="""
    WITH t AS (
      SELECT o_custkey, c_mktsegment AS seg,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS tc
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT seg, CAST(sum(tc) AS HUGEINT) AS s_sum,
             sum(CAST(tc AS HUGEINT) * CAST(tc AS HUGEINT)) AS s_sq,
             CAST(count(*) AS HUGEINT) AS n
      FROM t GROUP BY 1
    )
    SELECT t.o_custkey AS custkey, t.seg,
           CAST(t.tc AS BIGINT) AS total_cents,
           CAST(s.n - 1 AS BIGINT) AS n_peers,
           CAST(t.tc AS HUGEINT) * s.n > s.s_sum AS above
    FROM t JOIN s USING (seg)
    WHERE s.n >= 3
      AND (CAST(t.tc AS HUGEINT) * s.n - s.s_sum)
          * (CAST(t.tc AS HUGEINT) * s.n - s.s_sum) * (s.n - 2)
        > 4 * (s.n - 1)
          * ((s.n - 1) * (s.s_sq - CAST(t.tc AS HUGEINT) * CAST(t.tc AS HUGEINT))
             - (s.s_sum - t.tc) * (s.s_sum - t.tc))
    """,
)
def peer_group_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peer-group anomaly screen: customers whose lifetime order total
    sits more than 2 sigma from their market segment's peer
    distribution, peers = the segment's OTHER customers (leave-one-out
    mean and sample variance, so a whale cannot hide inside statistics
    it dominates). ``above`` separates over-spenders (placement-scale
    flow) from under-spenders. Peer sets are customers WITH orders
    (inner join — a dormant account has no spend to deviate).

    Exactness: the 2-sigma test never forms a float — with integer
    cent totals tc, segment sums S = sum(tc), Q = sum(tc^2), n, the
    LOO deviation d = (tc*n - S)/(n-1) and LOO sample variance
    v = [(n-1)(Q - tc^2) - (S - tc)^2] / ((n-1)(n-2)) satisfy
    d^2 > 4v  <=>  (tc*n - S)^2 (n-2) > 4(n-1)[(n-1)(Q - tc^2) -
    (S - tc)^2], an exact integer comparison in decimal(38,0) /
    HUGEINT on the two engines (the r9 widening convention). Bound
    (documented per that convention, loud under ANSI): with totals of
    EITHER sign, |tc*n - S| <= 2*max|tc|*n and the rhs bracket is
    bounded by (n+1)^2*max|tc|^2, so every term stays inside
    decimal(38,0) iff (2*max|tc|*(n+1))^2 * (n+1) <= 10^38 — at
    max|tc| = 1e10 cents that is ~2.9e5 customers per segment, which
    is also the statistical honesty limit: a near-million-account
    "segment" is not a peer group; stratify finer (region x segment x
    size-band) rather than widen the decimals.

    Plan: orders ⋈ customer is a corpus-x-corpus equi-join
    (merge-hinted — never broadcastable at 100 TB); the per-customer
    aggregate rides the join's custkey partitioning (no extra
    exchange); the 5-row segment-stats aggregate is one tiny shuffle
    broadcast back. The stats branch re-derives the totals subtree
    (checkpoint-free plan-builder rule; runtime stage reuse dedups
    identical feeds)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("seg")
    )
    t = (
        orders.hint("merge")
        .join(cust, "o_custkey")
        .groupBy("o_custkey", "seg")
        .agg(F.sum("cents").alias("tc"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = t.groupBy("seg").agg(
        dec(F.sum("tc")).alias("s_sum"),
        F.sum(dec(F.col("tc")) * dec(F.col("tc"))).alias("s_sq"),
        dec(F.count(F.lit(1))).alias("n"),
        F.max(F.abs(F.col("tc"))).alias("__s_max"),
    )
    # explicit segment-size guard (r11 advice item 4): under ANSI an
    # overflow fails loudly anyway, but with ANSI off it wraps to NULL
    # and the row silently vanishes. max of |tc|, not tc (r12 advice
    # item 2): a feed containing refunds/negative totals must bound
    # |tc*n - s_sum| by magnitude. The bound carries the mixed-sign
    # factor 2 and the (n+1) slack (r13 review finding — the bare
    # (max*n)^2*n form was ~4x too loose): |a| <= 2*max|tc|*n makes
    # lhs = a^2*(n-2) <= 4*max^2*n^3, and the rhs bracket's
    # (s_sum - tc)^2 term reaches ((n+1)*max)^2, so the unified safe
    # ceiling is 4*((n+1)*max)^2*(n+1) = (2*max*(n+1))^2*(n+1). The
    # check runs in double over the tiny segment-stats frame at
    # 9.9e37 — ~1% below the decimal(38,0) ceiling, which is all the
    # margin the check needs (it only has to dwarf double's ~1e-16
    # relative error; do NOT "spend" this headroom by relaxing the
    # threshold). A predicate (not an unused column) so Catalyst
    # can't prune it away.
    n1 = F.col("n").cast("double") + F.lit(1.0)
    guard_ok = (
        F.pow(F.lit(2.0) * F.col("__s_max").cast("double") * n1, F.lit(2.0)) * n1
        <= F.lit(9.9e37)
    )
    s = s.filter(
        F.when(guard_ok, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "peer_group_deviation: segment exceeds the decimal(38,0) "
                        "bound (2*max|tc|*(n+1))^2*(n+1) <= 1e38 — stratify "
                        "finer; seg="
                    ),
                    F.col("seg"),
                )
            ).cast("boolean")
        )
    ).drop("__s_max")
    j = t.join(F.broadcast(s), "seg").filter(F.col("n") >= 3)
    a = dec(F.col("tc")) * F.col("n") - F.col("s_sum")
    lhs = a * a * (F.col("n") - 2)
    rhs = (
        F.lit(4)
        * (F.col("n") - 1)
        * (
            (F.col("n") - 1) * (F.col("s_sq") - dec(F.col("tc")) * dec(F.col("tc")))
            - (F.col("s_sum") - dec(F.col("tc")))
            * (F.col("s_sum") - dec(F.col("tc")))
        )
    )
    return j.filter(lhs > rhs).select(
        F.col("o_custkey").alias("custkey"),
        "seg",
        F.col("tc").cast("long").alias("total_cents"),
        (F.col("n") - 1).cast("long").alias("n_peers"),
        (a > 0).alias("above"),
    )


# ---------------------------------------------------------------------------
# Amount ramp-up runs (r11): strictly-increasing spend escalation — the
# VALUE-space complement of longest_streak_users' TYPE-space runs. A mule
# being "tested" ramps amounts monotonically (small probe, then escalate);
# organic spend wiggles. Gaps-and-islands on the comparison-to-predecessor
# break flag, exact cents end-to-end.
# ---------------------------------------------------------------------------

#: Minimum strictly-increasing run length to surface. Probed against the
#: fixture (runs >= 5: 5 / 65 / 640 customers at the three SFs; max
#: observed run = 7) — selective at every SF without going empty.
_RAMP_MIN_RUN = 5


@register(
    "amount_ramp_runs",
    tags=("W-ext", "A-ext"),
    oracle=f"""
    WITH o AS (
      SELECT o_custkey AS c,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    runs AS (
      SELECT c, rn, cents,
             CASE WHEN cents > lag(cents) OVER (PARTITION BY c ORDER BY rn)
                  THEN 0 ELSE 1 END AS brk
      FROM o
    ),
    grp AS (
      SELECT c, rn, cents,
             sum(brk) OVER (PARTITION BY c ORDER BY rn) AS g
      FROM runs
    ),
    lens AS (
      SELECT c, g, CAST(count(*) AS BIGINT) AS run_len,
             CAST(min(cents) AS BIGINT) AS start_cents,
             CAST(max(cents) AS BIGINT) AS peak_cents
      FROM grp GROUP BY c, g
    ),
    best AS (
      SELECT c, run_len, start_cents, peak_cents,
             row_number() OVER (PARTITION BY c ORDER BY run_len DESC, g ASC)
                 AS rk
      FROM lens
    )
    SELECT c AS custkey, run_len AS longest_run, start_cents, peak_cents,
           peak_cents - start_cents AS ramp_cents
    FROM best WHERE rk = 1 AND run_len >= {_RAMP_MIN_RUN}
    """,
)
def amount_ramp_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-escalation screen: customers whose order history contains
    a strictly-increasing run of >= _RAMP_MIN_RUN (5) consecutive order
    amounts (date order, orderkey tiebreak) — the ramp-up signature of
    an account being probed then exploited, invisible to level-based
    screens because every amount can sit inside the customer's normal
    range. Emits the longest run (ties broken toward the EARLIEST run
    via the island id) with its exact start/peak cents and the ramp
    height.

    Within a run min(cents)=first and max(cents)=last BY CONSTRUCTION
    (strict monotonicity), so start/peak need no positional extras.
    Exactness: cents are exact integers; run identity is the
    gaps-and-islands running sum of an integer break flag over a fully
    tie-broken order — the same permutation on both engines. Plan: ONE
    custkey shuffle serves the seq window, the break lag, the island
    cumsum, the per-island aggregate (groupBy (c, g) rides the same
    partitioning) and the top-1 window; no second exchange."""
    orders = load_table(spark, sf_dir, "orders")
    # alias BEFORE any window: a rename between two same-key windows
    # breaks Catalyst's partitioning reuse and costs a second exchange
    # (measured; the alias-first form plans one)
    base = orders.select(
        F.col("o_custkey").alias("c"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
        "o_orderkey",
    )
    w_seq = Window.partitionBy("c").orderBy("o_orderdate", "o_orderkey")
    o = base.select("c", "cents", F.row_number().over(w_seq).alias("rn"))
    w_rn = Window.partitionBy("c").orderBy("rn")
    brk = F.when(F.col("cents") > F.lag("cents").over(w_rn), 0).otherwise(1)
    grp = o.withColumn("g", F.sum(brk).over(w_rn))
    lens = grp.groupBy("c", "g").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("cents").cast("long").alias("start_cents"),
        F.max("cents").cast("long").alias("peak_cents"),
    )
    rk = F.row_number().over(
        Window.partitionBy("c").orderBy(F.col("run_len").desc(), F.col("g").asc())
    )
    best = lens.withColumn("rk", rk).filter(
        (F.col("rk") == 1) & (F.col("run_len") >= _RAMP_MIN_RUN)
    )
    return best.select(
        F.col("c").alias("custkey"),
        F.col("run_len").alias("longest_run"),
        "start_cents",
        "peak_cents",
        (F.col("peak_cents") - F.col("start_cents")).alias("ramp_cents"),
    )


# ---------------------------------------------------------------------------
# Coordinated-amount clusters (r12): many DISTINCT senders moving the
# IDENTICAL amount on the same day — the cross-account coordination
# signature of an organized smurfing ring. The per-account screens
# (structuring_aggregation_alerts, amount_digit_entropy) are blind to
# it by construction: each mule's own history looks unremarkable.
# ---------------------------------------------------------------------------

#: Minimum distinct senders sharing one (amount, day) cell. Fixture
#: probe (FIXTURES.md threshold rule): max senders per cell = 2/3/7 at
#: sf0.001/0.01/0.1 and >=3 flags 0/3/1691 cells — legitimately empty
#: at sf0.001 (too few events for organic collisions), non-empty from
#: the driver SF up.
_COORD_MIN_SENDERS = 3


@register(
    "coordinated_amount_clusters",
    tags=("A1", "A3", "A-ext"),
    oracle=f"""
    SELECT CAST(round(value * 100) AS BIGINT) AS cents,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_senders,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) * CAST(round(value * 100) AS BIGINT) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY 1, 2
    HAVING count(DISTINCT user_id) >= {_COORD_MIN_SENDERS}
    """,
)
def coordinated_amount_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smurfing-ring coordination screen: (exact cent amount, UTC day)
    cells where at least ``_COORD_MIN_SENDERS`` DISTINCT accounts each
    moved that identical amount — scripted mule networks reuse one
    configured amount, and the cross-account view is the only screen
    grain that sees it (every per-account screen normalizes it away).

    Exactness: cents are on-grid 2-decimal amounts; the day is emitted
    as an ISO string on both engines (the r5 date-column rule);
    total_cents = n_events * cents is exact BIGINT (bounded by events
    per cell — millions of same-cell events would need decimal
    widening, see the _dec19 convention). Scale posture: ONE composite
    shuffle on (cents, day) — the distinct-sender count rides Spark's
    two-phase distinct aggregate on the same key (partial counts
    map-side), so the plan is a textbook keyed aggregation with no
    join, no window, no skew exposure beyond a genuinely-hot cell
    (which IS the alert)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    # day-granularity format discards sub-day components — no
    # date_trunc needed (UTC session TZ on both engines)
    day = F.date_format(F.col("ts"), "yyyy-MM-dd")
    return (
        ev.select(cents.alias("cents"), day.alias("day"), "user_id")
        .groupBy("cents", "day")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_senders"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .filter(F.col("n_senders") >= _COORD_MIN_SENDERS)
        .select(
            "cents",
            "day",
            "n_senders",
            "n_events",
            (F.col("n_events") * F.col("cents")).cast("long").alias("total_cents"),
        )
    )


#: Microseconds per day / half-day for the offset-grid windows below —
#: imported from the streaming façade (the canonical home) so the batch
#: screen, its oracle f-string, and the streaming twin can never drift
#: onto different grids (r13 review finding).
from anti_money_laundering_spark.streaming import (  # noqa: E402
    _DAY_US,
    _HALF_DAY_US,
)


@register(
    "coordinated_sliding_windows",
    headline=True,  # r13: bench floor for the 2x-row sliding-grid shape
    tags=("A1", "A3", "A-ext"),
    oracle=f"""
    WITH e AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS us, user_id
      FROM events
    ),
    g AS (
      SELECT cents, us - us % {_DAY_US} AS win_us, user_id FROM e
      UNION ALL
      SELECT cents, us - (us - {_HALF_DAY_US}) % {_DAY_US} AS win_us, user_id
      FROM e
    ),
    c AS (
      SELECT cents, win_us,
             count(DISTINCT user_id) AS n_senders,
             count(*) AS n_events
      FROM g GROUP BY 1, 2
    )
    SELECT cents,
           strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M') AS win_start,
           CAST(n_senders AS BIGINT) AS n_senders,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_events * cents AS BIGINT) AS total_cents
    FROM c
    WHERE n_senders >= {_COORD_MIN_SENDERS}
    """,
)
def coordinated_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-robust coordination screen: the sliding-window variant
    of ``coordinated_amount_clusters`` that closes the calendar-seam
    evasion its own 50M stress exposed (SCALE.md §r12-screens: a ring
    spread hourly across midnight splits 2/10 across calendar-day
    cells, so an adversary who times around known window boundaries
    beats the day grid).

    Formulation: every event lands in TWO 24h windows — the calendar
    day (starts 00:00 UTC) and the noon-offset day (starts 12:00 UTC)
    — and each (exact cent amount, window) cell is screened for
    ``_COORD_MIN_SENDERS`` distinct senders, exactly like the base
    screen. Detection guarantee: the union of the two grids has a
    boundary only every 12h, and a burst spanning <= 12h crosses at
    most ONE combined boundary — i.e. at most one grid's boundary — so
    it lies WHOLE inside some window of the other grid and is counted
    at full strength. A ring must stretch itself past 12h (losing the
    burst shape the screen targets) to straddle both grids. A ring
    fully inside one calendar day flags in both grids (two rows, same
    senders) — duplicate alert cells for the same ring are expected
    output, not a bug; the alert consumer clusters by (cents, senders).

    Exactness: window starts are integer-microsecond arithmetic
    (``unix_micros``/``epoch_us``, the r7 exact-µs rule — ``%`` on
    nonnegative longs agrees across engines) emitted as ISO-minute
    strings; cents/total_cents as in the base screen. Scale posture:
    the explode doubles rows, then ONE composite shuffle on
    (cents, win_us) with the distinct-sender count riding the
    two-phase distinct aggregate — 2x the base screen's shuffle bytes,
    still no join, no window function, and skew lands only on cells
    that ARE the alerts. Reference stake: generalizes the structuring
    alert of 01_aml_network_analysis.py:308-322 across accounts
    without its fixed-calendar seam."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    us = F.unix_micros(F.col("ts"))
    e = ev.select(cents.alias("cents"), us.alias("us"), "user_id")
    win_a = F.col("us") - F.col("us") % F.lit(_DAY_US)
    win_b = F.col("us") - (F.col("us") - F.lit(_HALF_DAY_US)) % F.lit(_DAY_US)
    return (
        e.select(
            "cents",
            "user_id",
            F.explode(F.array(win_a, win_b)).alias("win_us"),
        )
        .groupBy("cents", "win_us")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_senders"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .filter(F.col("n_senders") >= _COORD_MIN_SENDERS)
        .select(
            "cents",
            F.date_format(
                F.timestamp_micros(F.col("win_us")), "yyyy-MM-dd HH:mm"
            ).alias("win_start"),
            "n_senders",
            "n_events",
            (F.col("n_events") * F.col("cents")).cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Trade-mispricing screen (r12): a lineitem priced far outside the SAME
# part's other trades — the over/under-invoicing signature of
# trade-based money laundering (value moves in the INVOICE, not the
# transfer, so transfer-graph screens never see it). Leave-one-out
# extremes keep a single mispriced trade from hiding itself: the flag
# compares each trade against the most extreme of the part's OTHER
# trades.
# ---------------------------------------------------------------------------

#: Peer-set floor and the flag ratio. Probe (FIXTURES.md threshold
#: rule): with n >= 4 peers, unit >= 2x the LOO max flags
#: 79/754/7625 of 6k/60k/600k lineitems at the three SFs (~1.3%) —
#: non-empty everywhere, rare enough to be an alert.
_TBML_MIN_TRADES = 4
_TBML_RATIO = 2


@register(
    "trade_mispricing_alerts",
    tags=("W-ext", "A-ext", "F5"),
    oracle=f"""
    WITH u AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             CAST((2 * CAST(round(l_extendedprice * 100) AS HUGEINT) * 1000000
                   + CAST(l_quantity AS HUGEINT))
                  // (2 * CAST(l_quantity AS HUGEINT)) AS BIGINT) AS um
      FROM lineitem
    ),
    w1 AS (
      SELECT *, count(*) OVER (PARTITION BY l_partkey) AS n,
             max(um) OVER (PARTITION BY l_partkey) AS mx1,
             min(um) OVER (PARTITION BY l_partkey) AS mn1
      FROM u
    ),
    w2 AS (
      SELECT *,
             sum(CASE WHEN um = mx1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_partkey) AS nmx,
             sum(CASE WHEN um = mn1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_partkey) AS nmn,
             max(CASE WHEN um < mx1 THEN um END)
               OVER (PARTITION BY l_partkey) AS mx2,
             min(CASE WHEN um > mn1 THEN um END)
               OVER (PARTITION BY l_partkey) AS mn2
      FROM w1
    ),
    loo AS (
      SELECT l_orderkey, l_linenumber, l_partkey, um, n,
             CASE WHEN um = mx1 AND nmx = 1 THEN mx2 ELSE mx1 END AS loo_max,
             CASE WHEN um = mn1 AND nmn = 1 THEN mn2 ELSE mn1 END AS loo_min
      FROM w2 WHERE n >= {_TBML_MIN_TRADES}
    )
    SELECT l_orderkey, l_linenumber, l_partkey,
           um AS unit_micro, CAST(n AS BIGINT) AS n_trades,
           CASE WHEN um >= {_TBML_RATIO} * loo_max THEN 'over' ELSE 'under' END
             AS side,
           CASE WHEN um >= {_TBML_RATIO} * loo_max THEN loo_max ELSE loo_min END
             AS loo_bound
    FROM loo
    WHERE um >= {_TBML_RATIO} * loo_max OR {_TBML_RATIO} * um <= loo_min
    """,
)
def trade_mispricing_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-based-ML mispricing screen: lineitems whose unit price is
    >= 2x the maximum (over-invoicing) or <= half the minimum
    (under-invoicing) of the SAME part's OTHER trades, with a peer set
    of at least ``_TBML_MIN_TRADES``. TBML moves value through the
    invoice — an importer overpaying 3x ships value out with zero
    anomalous transfers — so the screen's grain is the trade document,
    not the account.

    Exactness: unit price is exact half-up-rounded integer micro-cents
    via the r8 div identity ``(2*e_cents*10^6 + q) div (2q)`` widened
    to decimal(38,0)/HUGEINT (r9 convention; the BIGINT output cast is
    safe — unit_micro <= max extendedprice in micro-cents << 2^63),
    so every comparison is integer-exact on both engines. The LOO
    extremes use the two-extremes trick: a trade AT the unique max
    compares against the second max (a mispriced trade cannot hide by
    BEING the extreme); ties at the extreme compare against the
    extreme itself and structurally cannot flag (um >= 2*um is
    impossible for positive prices). Scale posture: ONE shuffle —
    every window partitions by l_partkey, and the two chained window
    layers (extremes, then tie-aware runners-up) reuse that single
    exchange; no join, no self-join, skew bounded by trades-per-part.
    """
    li = load_table(spark, sf_dir, "lineitem")
    um = F.expr(
        "cast((2 * cast(round(l_extendedprice * 100) as decimal(19,0))"
        " * 1000000 + cast(l_quantity as decimal(19,0)))"
        " div (2 * cast(l_quantity as decimal(19,0))) as long)"
    )
    u = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", um.alias("um")
    )
    wp = Window.partitionBy("l_partkey")
    w1 = u.select(
        "*",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.max("um").over(wp).alias("mx1"),
        F.min("um").over(wp).alias("mn1"),
    )
    w2 = w1.select(
        "*",
        F.sum(F.when(F.col("um") == F.col("mx1"), 1).otherwise(0)).over(wp).alias("nmx"),
        F.sum(F.when(F.col("um") == F.col("mn1"), 1).otherwise(0)).over(wp).alias("nmn"),
        F.max(F.when(F.col("um") < F.col("mx1"), F.col("um"))).over(wp).alias("mx2"),
        F.min(F.when(F.col("um") > F.col("mn1"), F.col("um"))).over(wp).alias("mn2"),
    )
    loo_max = F.when(
        (F.col("um") == F.col("mx1")) & (F.col("nmx") == 1), F.col("mx2")
    ).otherwise(F.col("mx1"))
    loo_min = F.when(
        (F.col("um") == F.col("mn1")) & (F.col("nmn") == 1), F.col("mn2")
    ).otherwise(F.col("mn1"))
    loo = w2.filter(F.col("n") >= _TBML_MIN_TRADES).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "um",
        F.col("n").cast("long").alias("n_trades"),
        loo_max.alias("loo_max"),
        loo_min.alias("loo_min"),
    )
    over = F.col("um") >= F.lit(_TBML_RATIO) * F.col("loo_max")
    under = F.lit(_TBML_RATIO) * F.col("um") <= F.col("loo_min")
    return loo.filter(over | under).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.col("um").alias("unit_micro"),
        "n_trades",
        F.when(over, "over").otherwise("under").alias("side"),
        F.when(over, F.col("loo_max")).otherwise(F.col("loo_min")).alias("loo_bound"),
    )


# ---------------------------------------------------------------------------
# Geographic corridor concentration (TBML risk screen)
# ---------------------------------------------------------------------------

#: Alert when corridor_cents * n_corridors * DEN >= NUM * grand_cents,
#: i.e. the corridor carries more than NUM/DEN (= 1.25x) the mean
#: corridor's value. 5/4 sits between the corridor-share p50 and max at
#: every SF (FIXTURES.md threshold rule: 60/250, 183/625, 47/625
#: corridors alert at sf0.001 / 0.01 / 0.1 — both classes populated).
_CORRIDOR_NUM = 5
_CORRIDOR_DEN = 4


@register(
    "corridor_concentration_alerts",
    headline=True,  # r13: bench floor for the new screen
    tags=("J-ext", "A-ext"),
    oracle=f"""
    WITH f AS (
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    ),
    cor AS (
      SELECT cust_nation, supp_nation,
             sum(cents) AS tot, count(*) AS n_txns
      FROM f GROUP BY 1, 2
    ),
    g AS (SELECT count(*) AS nc, sum(tot) AS gt FROM cor)
    SELECT cust_nation, supp_nation,
           CAST(tot AS BIGINT) AS corridor_cents,
           CAST(n_txns AS BIGINT) AS n_txns
    FROM cor, g
    WHERE tot * nc * {_CORRIDOR_DEN} >= gt * {_CORRIDOR_NUM}
    """,
)
def corridor_concentration_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-corridor concentration screen (TBML geographic risk): the
    (customer nation -> supplier nation) corridors carrying more than
    1.25x the mean corridor's trade value. Over-concentrated corridors
    are where trade-based laundering reviews start (mirror trades and
    mispriced flows cluster on a route before they show per-invoice);
    this is the geographic complement of ``trade_mispricing_alerts``'s
    per-part screen, and the first catalog use of the nation dimension
    on BOTH sides of the trade.

    Exactness: cents are on-grid 2-decimal amounts; the concentration
    predicate is pure integer arithmetic — corridor_total *
    n_corridors * 4 >= 5 * grand_total — computed in decimal
    (HUGEINT on the DuckDB side) so no division and no float share
    ever appears. Widths: corridor sums ride the _dec19 convention
    (decimal(29,0)); n_corridors <= 625 forever (25 nations squared)
    so its decimal(4,0) cast never truncates; the grand total is
    re-cast to decimal(30,0) before *5 so every product stays inside
    decimal(38,0) with zero precision-loss rounding.

    Scale posture: the star join shuffles the two FACT tables on their
    join keys (lineitem x orders on orderkey, then custkey / suppkey)
    while both nation copies broadcast; the corridor aggregate is 625
    cells max, and the grand total is a 1-row aggregate broadcast back
    — never a driver round-trip. Skew lands on genuinely-hot
    corridors, which are exactly the rows the screen exists to
    surface."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    flows = (
        li.select("l_orderkey", "l_suppkey", cents.alias("cents"))
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
    )
    cor = flows.groupBy("cust_nation", "supp_nation").agg(
        F.sum(_dec19("cents")).alias("tot"),  # decimal(29,0)
        F.count(F.lit(1)).cast("long").alias("n_txns"),
    )
    # Global stats via an UNPARTITIONED window over the corridor cells
    # instead of a separate agg + crossJoin(broadcast): the agg branch
    # made `cor` feed two consumers, and AQE does not dedup duplicate
    # static subtrees on this Spark (r11 measurement) — the whole
    # fact-fact star join executed twice per run (measured: plan
    # shrinks 453 -> ~230 lines, wall 1.04 -> ~0.6 s at sf0.1). The
    # window moves all cells to one reducer, which is bounded at 625
    # rows forever (25 nations squared) — a schema constant, not a
    # data size. Same integer predicate, zero value change.
    gw = Window.partitionBy()
    return (
        cor.withColumn("nc", F.count(F.lit(1)).over(gw).cast("decimal(4,0)"))
        .withColumn("gt", F.sum("tot").over(gw).cast("decimal(30,0)"))
        .filter(
            F.col("tot") * F.col("nc") * F.lit(_CORRIDOR_DEN)
            >= F.col("gt") * F.lit(_CORRIDOR_NUM)
        )
        .select(
            "cust_nation",
            "supp_nation",
            F.col("tot").cast("long").alias("corridor_cents"),
            "n_txns",
        )
    )
