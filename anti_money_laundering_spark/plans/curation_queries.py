"""Corpus-curation catalog queries (curation.py operators): benchmark
decontamination, shard manifests, and target-mix rebalancing over the
``documents`` fixture — the pipeline steps between cleaning and
training. All three are hash-compared against DuckDB: n-grams are
re-derived token-exactly on both sides, and every sampling decision is
the shared md5-bucket arithmetic (sampling.py / _duck_hash_bucket), so
the oracles replay the exact selected sets, not just counts.

The simulated benchmark set is ``doc_id % 20 == 0`` (a deterministic
~5% slice standing in for an eval suite); n=4 word-grams chosen by the
fixture-distribution rule (FIXTURES.md §threshold): shared-4-gram doc
counts are 31 / 49 / 2405 at sf0.001 / 0.01 / 0.1 — non-empty at every
SF, unlike n=5 (2 docs at sf0.01) or n=3 (near-total contamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.curation import (
    ngram_overlap,
    repetition_scores,
    rebalance_to_min_source,
    shard_manifest,
)
from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.plans.llm_queries import _duck_hash_bucket, _DUCK_TOKS
from anti_money_laundering_spark.sources import load_table

_NGRAM_N = 4

#: DuckDB 4-gram posting list mirroring curation.doc_ngrams exactly:
#: same token definition (_DUCK_TOKS ≡ functions.tokens), same
#: single-space join (MLlib NGram's separator), DISTINCT per doc.
_DUCK_GRAMS = f"""
    toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(t[u.i:u.i+{_NGRAM_N - 1}], ' ') AS ngram
        FROM toks, UNNEST(range(1, greatest(len(t) - {_NGRAM_N - 2}, 1))) AS u(i)
    )
"""


@register(
    "decontam_ngram_overlap",
    tags=("LLM", "text", "dedup"),
    oracle=f"""
    WITH {_DUCK_GRAMS},
    bench AS (SELECT DISTINCT ngram FROM grams WHERE doc_id % 20 = 0)
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
    FROM grams g JOIN bench b USING (ngram)
    WHERE g.doc_id % 20 <> 0
    GROUP BY g.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination screen: for every corpus document,
    how many distinct word 4-grams it shares with the (simulated) eval
    set — the membership evidence behind dropping contaminated docs
    before training. Plan: JVM-side NGram explode on both sides, the
    eval set's distinct grams broadcast, one agg keyed by doc
    (curation.ngram_overlap; no doc×doc comparison anywhere)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return ngram_overlap(corpus, bench, n=_NGRAM_N)


@register(
    "shard_manifest_docs",
    tags=("LLM", "sample", "A-ext"),
    oracle=f"""
    SELECT {_duck_hash_bucket("doc_id", "shard-v1", 8)} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY 1
    """,
)
def shard_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8-shard training layout manifest: per-shard doc /
    token / char totals under content-hash assignment (adding docs
    never moves existing ones). The same shard expression drives the
    physical ``repartition(n, shard).write`` at scale, so manifest and
    files can't disagree (curation.shard_manifest)."""
    docs = load_table(spark, sf_dir, "documents")
    return shard_manifest(docs, n_shards=8)


@register(
    "rebalance_uniform_mix",
    tags=("LLM", "sample", "A-ext"),
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*) AS n_src FROM documents GROUP BY source
    ),
    mn AS (SELECT min(n_src) AS n_min FROM counts)
    SELECT d.doc_id, d.source
    FROM documents d JOIN counts c USING (source) CROSS JOIN mn
    WHERE {_duck_hash_bucket("d.doc_id", "mix-v1", 10000)} * c.n_src
          < 10000 * mn.n_min
    """,
)
def rebalance_uniform_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing: hash-exact downsample of every source
    stratum to ~the smallest source's size — deterministic keep rule
    (md5 bucket × stratum count < resolution × min count), no RNG, no
    window over the corpus; per-source counts broadcast back and the
    filter is codegen'd row arithmetic (curation.rebalance_to_min_source)."""
    docs = load_table(spark, sf_dir, "documents")
    return rebalance_to_min_source(docs).select("doc_id", "source")


#: DuckDB replay of curation.repetition_scores: unigram mode share via
#: unnest+group (same two-agg shape), bigram dup fraction via list
#: exprs; thresholds below were probed against these distributions at
#: every SF (top share p50≈0.09/p90≈0.14; dup2 p50≈0.026/p90≈0.065;
#: n_tok ∈ [10, 100]) so each rule and both screen outcomes populate.
_DUCK_REPETITION = f"""
    toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    tc AS (
        SELECT doc_id, tok, count(*) AS n
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY doc_id, tok
    ),
    top AS (SELECT doc_id, max(n) * 1.0 / sum(n) AS top_share FROM tc GROUP BY doc_id),
    rep AS (
        SELECT s.doc_id,
               len(s.t) AS n_tokens,
               coalesce(top.top_share, 0.0) AS top_token_share,
               CASE WHEN len(s.t) < 2 THEN 0.0
                    ELSE 1.0 - len(list_distinct(
                             [array_to_string(s.t[i:i+1], ' ') for i in range(1, len(s.t))]
                         )) * 1.0 / (len(s.t) - 1)
               END AS dup_2gram_frac
        FROM toks s LEFT JOIN top ON top.doc_id = s.doc_id
    )
"""


@register(
    "repetition_scores_docs",
    tags=("LLM", "text", "A-ext"),
    oracle=f"""
    WITH {_DUCK_REPETITION}
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(top_token_share, 6) AS top_token_share,
           round(dup_2gram_frac, 6) AS dup_2gram_frac
    FROM rep
    """,
)
def repetition_scores_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: most-common-token
    share (unigram spam) and duplicate-bigram fraction (phrase
    repetition). Bigram stats are pure codegen (NGram +
    array_distinct/size, zero shuffles); the token mode is explode →
    count → max/sum, two partial-agg shuffles keyed by doc
    (curation.repetition_scores — NOT the O(unique×len) interpreted
    higher-order lambda one-liner)."""
    docs = load_table(spark, sf_dir, "documents")
    out = repetition_scores(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("top_token_share", 6).alias("top_token_share"),
        F.round("dup_2gram_frac", 6).alias("dup_2gram_frac"),
    )


@register(
    "quality_rule_screen",
    tags=("LLM", "text", "A-ext"),
    oracle=f"""
    WITH {_DUCK_REPETITION}
    SELECT doc_id,
           CAST((n_tokens < 20)::INT + (top_token_share > 0.12)::INT
                + (dup_2gram_frac > 0.05)::INT AS BIGINT) AS n_violations,
           (n_tokens >= 20 AND top_token_share <= 0.12
            AND dup_2gram_frac <= 0.05) AS keep
    FROM rep
    """,
)
def quality_rule_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gate (too short / unigram spam / phrase
    repetition): (doc_id, n_violations, keep). Thresholds sit between
    the fixture's p50 and p90 for each signal at every SF, so keeps
    AND drops are both populated (threshold rule, FIXTURES.md)."""
    from anti_money_laundering_spark.curation import quality_screen

    docs = load_table(spark, sf_dir, "documents")
    return quality_screen(docs)


@register(
    "corpus_datasheet",
    tags=("LLM", "text", "A-ext"),
    # one aggregation over per-doc signals that are each individually
    # hash-attested elsewhere (tokens: text_token_stats; quality rules:
    # quality_rule_screen) — the datasheet is their per-source rollup
    oracle=f"""
    WITH {_DUCK_REPETITION}
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r.n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
           round(avg(r.n_tokens), 6) AS mean_tokens,
           CAST(sum(CASE WHEN r.n_tokens >= 20 AND r.top_token_share <= 0.12
                          AND r.dup_2gram_frac <= 0.05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
           round(avg(r.top_token_share), 6) AS mean_top_share
    FROM documents d JOIN rep r ON r.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasheet-for-datasets rollup: per-source document/token/char
    volumes, mean length, quality-screen keep counts, and mean
    repetition — the one-page summary a training pipeline publishes
    with each corpus snapshot. Plan: the per-doc signals come from the
    same two-agg repetition pipeline the screen uses (shared shape),
    then ONE rollup keyed by source; at 100 TB this is a pure
    map-side-combinable aggregation over already-needed signals."""
    from anti_money_laundering_spark.curation import repetition_scores

    docs = load_table(spark, sf_dir, "documents")
    rep = repetition_scores(docs)
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("top_token_share") <= 0.12)
        & (F.col("dup_2gram_frac") <= 0.05)
    ).cast("long")
    return (
        docs.select("doc_id", "source", F.length("text").cast("long").alias("__chars"))
        .join(rep, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("__chars").alias("total_chars"),
            F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
            F.sum(keep).alias("n_keep"),
            F.round(F.avg("top_token_share"), 6).alias("mean_top_share"),
        )
    )


@register(
    "rebalance_target_mix",
    tags=("LLM", "sample", "A-ext"),
    # weights by source-number parity (even sources get 2x the share of
    # odd ones — all 20 sources exist at every SF); the oracle replays
    # K = min(n_s/w_s) and the md5 keep rule exactly
    oracle=f"""
    WITH w AS (
        SELECT source, count(*) AS n_src,
               CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 2 = 0
                    THEN 2.0 ELSE 1.0 END / 30.0 AS wgt
        FROM documents GROUP BY source
    ),
    kk AS (SELECT min(n_src / wgt) AS k FROM w)
    SELECT d.doc_id, d.source
    FROM documents d JOIN w USING (source) CROSS JOIN kk
    WHERE {_duck_hash_bucket("d.doc_id", "mix-v1", 10000)} * w.n_src
          < 10000 * w.wgt * kk.k
    """,
)
def rebalance_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-target-mix rebalancing (curation.rebalance_to_target_mix):
    even-numbered sources get twice the corpus share of odd ones; the
    achievable size is K = min(n_s/w_s) and each stratum keeps
    ~w_s·K docs via the deterministic md5 keep rule — no RNG, no
    window, per-source counts broadcast. The 10 even weights of 2 and
    10 odd weights of 1 normalize over 30."""
    from anti_money_laundering_spark.curation import rebalance_to_target_mix

    docs = load_table(spark, sf_dir, "documents")
    weights = {f"src{i}": (2.0 if i % 2 == 0 else 1.0) for i in range(20)}
    return rebalance_to_target_mix(docs, weights).select("doc_id", "source")


@register(
    "lang_trigram_docs",
    tags=("LLM", "text"),
    oracle=None,  # set below — built from the shared SQL generator
)
def lang_trigram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID next to the stopword heuristic,
    with an agreement flag — the two-heuristic consensus view a corpus
    language audit starts from. Both classifiers are pure codegen'd
    column arithmetic; the oracle replays the same argmax SQL text.

    Plan (r14 optimization round, guide §1.2 per-task work): the
    per-language scores are computed ONCE each in a dedicated
    projection layer, and the argmax CASE + agreement flag run over
    the score/label COLUMNS. The single-expression form repeated each
    9-replace() score ~7x inside the CASE's pairwise comparisons
    (codegen subexpression elimination does not hoist from conditional
    CASE branches) and evaluated the whole classifier twice more for
    the agree flag — ~500 full-text replace() passes per row; the
    layered form does 4 trigram + 4 stopword score evaluations total.
    CollapseProject keeps the layers separate because the score
    aliases are non-cheap and multiply referenced. Values are
    identical: same score arithmetic, same argmax_case_sql tie-break,
    applied to columns instead of inline expressions."""
    from anti_money_laundering_spark.functions import (
        STOPWORDS,
        TRIGRAM_PROFILES,
        _stop_count_sql,
        _trigram_score_sql,
        argmax_case_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        *[
            F.expr(_trigram_score_sql("text", g)).alias(f"__t_{lang}")
            for lang, g in TRIGRAM_PROFILES.items()
        ],
        *[
            F.expr(_stop_count_sql("text", ws)).alias(f"__w_{lang}")
            for lang, ws in STOPWORDS.items()
        ],
    )
    labeled = scored.select(
        "doc_id",
        F.expr(
            argmax_case_sql({lang: f"__t_{lang}" for lang in TRIGRAM_PROFILES})
        ).alias("lang_tri"),
        F.expr(
            argmax_case_sql({lang: f"__w_{lang}" for lang in STOPWORDS})
        ).alias("lang_sw"),
    )
    return labeled.select(
        "doc_id",
        "lang_tri",
        "lang_sw",
        (F.col("lang_tri") == F.col("lang_sw")).alias("agree"),
    )


@register(
    "bpe_pair_counts",
    tags=("LLM", "text"),
    oracle=f"""
    WITH words AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest({_DUCK_TOKS}) AS w FROM documents)
      GROUP BY w
    )
    SELECT substr(w, u.i, 1) AS sym_a, substr(w, u.i + 1, 1) AS sym_b,
           CAST(sum(freq) AS BIGINT) AS n
    FROM words, UNNEST(range(1, length(w))) AS u(i)
    WHERE length(w) >= 2
    GROUP BY 1, 2
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-step statistic (Sennrich 2016): adjacent character
    pair counts weighted by word frequency — argmax of this table is
    the tokenizer's first learned merge. Counting runs on the word
    DICTIONARY (one corpus tokenize+count shuffle, then vocab-local
    explode), so iterating it to a full merge list (tokenizer.learn_bpe,
    property-tested against a pure-Python reference) costs one tiny
    argmax collect per merge however large the corpus."""
    from anti_money_laundering_spark.tokenizer import bpe_pair_counts as pair_counts

    docs = load_table(spark, sf_dir, "documents")
    return pair_counts(docs)


_LM_ADD_K = 1.0


@register(
    "ngram_lm_quality",
    tags=("LLM", "text"),
    oracle=f"""
    WITH clean AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term,
             generate_subscripts({_DUCK_TOKS}, 1) AS pos
      FROM documents
    ), seq AS (
      SELECT doc_id, term AS prev,
             lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS cur
      FROM clean
    ), pairs AS (SELECT doc_id, prev, cur FROM seq WHERE cur IS NOT NULL),
    cab AS (SELECT prev, cur, count(*) AS n_ab FROM pairs GROUP BY prev, cur),
    cprev AS (SELECT prev, sum(n_ab) AS n_prev FROM cab GROUP BY prev),
    voc AS (SELECT count(DISTINCT term) AS v FROM clean)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c.n_ab + {_LM_ADD_K}) / (cp.n_prev + {_LM_ADD_K} * voc.v))), 6)
             AS avg_logprob
    FROM pairs p
    JOIN cab c ON c.prev = p.prev AND c.cur = p.cur
    JOIN cprev cp ON cp.prev = p.prev
    CROSS JOIN voc
    GROUP BY p.doc_id
    """,
)
def ngram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram-LM quality score per document (the
    CCNet/KenLM perplexity-filter shape without shipping a model):
    mean ln P(cur|prev) under add-1 smoothing, vocabulary-normalized.
    Low tail = boilerplate/gibberish; the score feeds the same
    keep/drop decision as quality_rule_screen but from sequence
    statistics instead of surface ratios. All counting is two
    aggregations of one lead()-window bigram stream; see
    text_ml.ngram_lm_scores for the plan discipline."""
    from anti_money_laundering_spark.text_ml import ngram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    out = ngram_lm_scores(docs, add_k=_LM_ADD_K)
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_logprob", 6).alias("avg_logprob")
    )


# The trigram side of the oracle is the IDENTICAL SQL text the Spark
# expression compiles from; the stopword side reuses text_lang_id's
# existing DuckDB rebuild (review finding: a second hand-rolled copy of
# that CASE could drift from it and break the parity gate).
def _install_lang_trigram_oracle() -> None:
    from anti_money_laundering_spark.functions import lang_id_trigram_sql
    from anti_money_laundering_spark.plans.catalog import _CATALOG
    from anti_money_laundering_spark.plans.llm_queries import _duck_lang_case

    tri = lang_id_trigram_sql("text")
    sw = _duck_lang_case()
    _CATALOG["lang_trigram_docs"].oracle = f"""
    SELECT doc_id, {tri} AS lang_tri, {sw} AS lang_sw,
           ({tri}) = ({sw}) AS agree
    FROM documents
    """


_install_lang_trigram_oracle()


# ---------------------------------------------------------------------------
# k-anonymity profile (r10): the STRUCTURAL privacy audit that pairs with
# the PII pattern scrub (curation.redact_pii) — regexes catch embedded
# identifiers, but a record is also re-identifiable when its combination
# of quasi-identifiers is (near-)unique in the released table. The
# pre-release check for any training-data or analytics extract.
# ---------------------------------------------------------------------------

#: A record in an equivalence class smaller than this is counted at
#: risk (the conventional k=5 release floor).
_K_ANON_FLOOR = 5


@register(
    "k_anonymity_profile",
    tags=("A-ext", "A1"),
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             CAST(count(*) AS BIGINT) AS class_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(class_size * count(*) AS BIGINT) AS n_records,
           class_size < {_K_ANON_FLOOR} AS at_risk
    FROM classes GROUP BY class_size
    """,
)
def k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    (nation, segment, balance-bucket) quasi-identifier set: every
    record in an equivalence class of size < 5 is re-identifiable by
    an adversary who knows those three attributes (Sweeney's model) —
    the release gate a training-data extract runs AFTER pattern-based
    PII scrubbing (curation.redact_pii), because scrubbing embedded
    identifiers does nothing about combination uniqueness. Output is
    the class-size histogram (class_size, n_classes, n_records,
    at_risk): the at-risk record mass is what a k=5 release policy
    must generalize or suppress.

    Exactness: equivalence classes are exact integer/string keys
    (bucket = floor of an on-grid 2-decimal balance over 1000 — exact
    in double well past the fixture domain); all outputs are integer
    counts. Plan: one keyed aggregation (map-side partial) + one
    re-aggregation on the bounded class-size key — at 100 TB the
    histogram is at most max-class-size rows and the quasi-identifier
    groupBy is the only corpus-scale shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        (F.col("class_size") * F.count(F.lit(1))).cast("long").alias("n_records"),
        (F.col("class_size") < _K_ANON_FLOOR).alias("at_risk"),
    )


@register(
    "l_diversity_profile",
    tags=("A-ext", "A1"),
    oracle="""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(sum(n) AS BIGINT) AS class_size,
             CAST(count(*) AS BIGINT) AS l_distinct,
             CAST(max(n) AS BIGINT) AS modal_count
      FROM cells GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
           ((2 * CAST(modal_count AS HUGEINT) * 1000000 + class_size)
              // (2 * CAST(class_size AS HUGEINT))) / 1000000.0 AS modal_share,
           l_distinct >= 3 AS diverse
    FROM classes
    """,
)
def l_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the k-anonymity companion (Machanavajjhala
    et al.): under the (nation, segment) quasi-identifier set, how
    many DISTINCT values of the sensitive attribute (balance bucket)
    each equivalence class carries — a class can satisfy k-anonymity
    with thousands of members and still leak the sensitive value if
    they all share one bucket (the homogeneity attack). ``diverse``
    flags distinct-l >= 3; ``modal_share`` is the best single-guess
    success rate an attacker gets inside the class (the recursive
    (c, l)-diversity intuition).

    Exactness: classes and cells are exact integer/string keys; counts
    are integers; modal_share uses the div-based round-half-up
    identity in decimal/HUGEINT. Plan: one (quasi, sensitive) cell
    aggregation (map-side partial, the only corpus-scale shuffle) +
    one re-aggregation on the quasi key — the k_anonymity_profile
    shuffle shape with the sensitive dimension folded into the
    first key."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    classes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("class_size"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.max("n").cast("long").alias("modal_count"),
    )
    share = F.expr(
        "(2 * cast(modal_count as decimal(38,0)) * 1000000 + class_size)"
        " div (2 * cast(class_size as decimal(38,0)))"
    ) / F.lit(1000000.0)
    return classes.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "l_distinct",
        share.alias("modal_share"),
        (F.col("l_distinct") >= 3).alias("diverse"),
    )


@register(
    "t_closeness_profile",
    tags=("A-ext", "W-ext", "J2"),
    oracle="""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS B FROM cells),
    gl AS (SELECT b, CAST(sum(n) AS BIGINT) AS N_b FROM cells GROUP BY b),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM cells),
    classes AS (
      SELECT c_nationkey, c_mktsegment, CAST(sum(n) AS BIGINT) AS n_c
      FROM cells GROUP BY 1, 2
    ),
    grid AS (
      SELECT c.c_nationkey, c.c_mktsegment, c.n_c, g.b, g.N_b,
             coalesce(x.n, 0) AS n_cb
      FROM classes c CROSS JOIN gl g
      LEFT JOIN cells x ON x.c_nationkey = c.c_nationkey
                       AND x.c_mktsegment = c.c_mktsegment AND x.b = g.b
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, n_c, b,
             CAST(sum(n_cb) OVER w AS BIGINT) AS C_cb,
             CAST(sum(N_b) OVER w AS BIGINT) AS G_b
      FROM grid
      WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY b)
    ),
    scored AS (
      SELECT c_nationkey, c_mktsegment,
             any_value(n_c) AS class_size,
             sum(abs(CAST(C_cb AS HUGEINT) * (SELECT N FROM tot)
                     - CAST(G_b AS HUGEINT) * n_c)) AS num,
             CAST(any_value(n_c) AS HUGEINT) * (SELECT N FROM tot)
               * ((SELECT B FROM nb) - 1) AS den
      FROM cum GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, CAST(class_size AS BIGINT) AS class_size,
           ((2 * num * 1000000 + den) // (2 * den)) / 1000000.0 AS emd,
           5 * num > den AS t_breach
    FROM scored WHERE (SELECT B FROM nb) > 1
    """,
)
def t_closeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness, completing the privacy-audit trio (Li, Li &
    Venkatasubramanian): per (nation, segment) equivalence class, the
    earth-mover's distance between the class's sensitive-attribute
    distribution (balance buckets, ORDERED — EMD over an ordered
    domain is the mean absolute cumulative-share gap) and the global
    distribution. l-diversity counts distinct values but misses
    skew-disclosure: a class can be l-diverse yet concentrated on the
    distribution's tail, telling the attacker the member is (say)
    high-balance. ``t_breach`` flags EMD > 0.2 (the paper's example
    t); fixture EMD quantiles (p50/max): 0.30/0.52 at sf0.001,
    0.10/0.33 at sf0.01, 0.03/0.07 at sf0.1 — classes converge to the
    global distribution as they grow, so breaches thin out with SF
    (all-false at sf0.1 is the correct reading, and the hash attests
    the EMD values themselves).

    Exactness: EMD = sum_b |C_cb*N - G_b*n_c| / (n_c*N*(B-1)) — an
    integer quotient; the products run in decimal(38,0)/HUGEINT (LONG
    wraps once n_c*N passes ~9.2e18, i.e. ~3e9-row classes), the
    6-decimal output uses the div-based round-half-up identity, and
    the breach flag compares 5*num > den in exact integers — no
    float anywhere. Degenerate single-bucket domains (B=1: every
    class trivially matches global, denominator 0) are excluded on
    both engines. Plan: one corpus-scale (quasi, sensitive) cell
    aggregation; everything after runs on dimension-sized frames —
    the bucket list and 1-row totals attach via broadcast
    nested-loop (the kendall 1-row-attach pattern), the dense
    class x bucket grid is |classes| * B rows, and the cumulative
    window partitions by class over <= B rows each."""
    cells = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        # 5 downstream consumers (gl, tot, nb, classes, grid's left
        # join) — one lazy checkpoint computes the scan+agg once
        .localCheckpoint(eager=False)
    )
    gl = cells.groupBy("b").agg(F.sum("n").cast("long").alias("N_b"))
    tot = cells.agg(F.sum("n").cast("long").alias("N"))
    nb = cells.agg(F.count_distinct("b").cast("long").alias("B"))
    classes = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("n_c")
    )
    grid = (
        classes.crossJoin(F.broadcast(gl))
        .join(cells, ["c_nationkey", "c_mktsegment", "b"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_c",
            "b",
            "N_b",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_cb"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("c_nationkey", "c_mktsegment").orderBy("b")
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "n_c",
        F.sum("n_cb").over(w).cast("long").alias("C_cb"),
        F.sum("N_b").over(w).cast("long").alias("G_b"),
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("n_c").alias("class_size"),
            F.sum(
                F.abs(
                    F.col("C_cb").cast("decimal(38,0)") * F.col("N")
                    - F.col("G_b").cast("decimal(38,0)") * F.col("n_c")
                )
            ).alias("num"),
            (
                F.max(F.col("n_c").cast("decimal(38,0)"))
                * F.max("N")
                * (F.max("B") - 1)
            ).alias("den"),
            F.max("B").alias("__B"),
        )
        .filter(F.col("__B") > 1)
    )
    emd = F.expr("(2 * num * 1000000 + den) div (2 * den)") / F.lit(1000000.0)
    return scored.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("class_size").cast("long").alias("class_size"),
        emd.alias("emd"),
        (5 * F.col("num") > F.col("den")).alias("t_breach"),
    )
