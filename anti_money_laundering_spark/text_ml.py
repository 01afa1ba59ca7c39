"""TF-IDF text vectorization + similarity (MLlib-native; north-star
"MLlib + Delta" approach in BASELINE.json).

``HashingTF`` is the hashing trick — stateless, deterministic, no
vocabulary shuffle, which is exactly what survives 100 TB (a fitted
CountVectorizer vocabulary would itself be a giant broadcast). ``IDF``
is one aggregate pass. Cosine over the resulting sparse vectors runs
as a Pandas UDF on the (blocked) candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.feature import IDF, HashingTF, Tokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tfidf_vectors",
    "tfidf_cosine_pairs",
    "tfidf_exact_cosine_pairs",
    "ngram_lm_scores",
]


def tfidf_exact_cosine_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact (vocabulary-explicit) TF-IDF cosine for candidate
    ``pairs`` (id_a, id_b) — the hash-verifiable twin of
    :func:`tfidf_cosine_pairs`.

    HashingTF buckets collide engine-specifically, so the hashed
    variant can only be rows-only checked; this formulation keeps the
    actual (doc, token, count) table and computes

        w(d, t) = count(d, t) * (ln((N + 1) / (df(t) + 1)) + 1)
        cosine  = Σ_t w(a,t)·w(b,t) / (||w(a)||·||w(b)||)

    entirely in codegen'd aggregates, replayable in ANSI SQL
    (smoothed-IDF convention; MLlib's IDF differs only in the +1 term).

    Scale posture: everything is keyed aggregation/equi-joins — token
    counts shuffle on (doc, token), document frequencies on token, and
    the dot product joins pair x token only for CANDIDATE pairs (LSH/
    blocking-bounded, never the cartesian). The corpus size N is one
    driver-side scalar ``count()`` (parquet answers count-star from
    row-group metadata) folded in as a literal — a 1-row cross join
    would plan as BroadcastNestedLoopJoin and trip the no-BNLJ plan
    gate. Unlike HashingTF there IS a vocabulary-sized table here, but
    it is never broadcast — idf joins back to the token table by key,
    so at 100 TB it just shuffles like any other fact."""
    from anti_money_laundering_spark.functions import tokens_sql

    toks = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.expr(tokens_sql(text_col))).alias("token"),
        )
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = docs.count()
    idf = (
        toks.groupBy("token")
        .agg(F.count_distinct("doc").alias("df"))
        .select(
            "token",
            (F.log((F.lit(float(n)) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
        )
    )
    w = toks.join(idf, "token").select(
        "doc", "token", (F.col("cnt") * F.col("idf")).alias("w")
    )
    # four downstream branches re-derive w otherwise — see the hashed
    # twin below for the measurement; one localCheckpoint computes the
    # tokenize+agg+idf-join subtree once. eager=False keeps plan
    # CONSTRUCTION lazy (catalog sweeps / plan lint must not run the
    # scan as a side effect — r9 advice, applied repo-wide); the
    # branches still share the one materialization after the first
    # action.
    w = w.localCheckpoint(eager=False)
    norms = w.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    wa = w.select(F.col("doc").alias("id_a"), "token", F.col("w").alias("__wa"))
    wb = w.select(F.col("doc").alias("id_b"), "token", F.col("w").alias("__wb"))
    dots = (
        pairs.select("id_a", "id_b")
        .join(wa, "id_a")
        .join(wb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(F.col("doc").alias("id_a"), F.col("nrm").alias("__na"))
    nb = norms.select(F.col("doc").alias("id_b"), F.col("nrm").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("__dot") / (F.col("__na") * F.col("__nb"))).alias("tfidf_cosine"),
        )
    )


def tfidf_hashed_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 4096,
    salt: str = "tfidf-v1",
) -> DataFrame:
    """(doc, bucket, w) hashing-trick TF-IDF weight table: tokens map
    to ``num_features`` buckets via an ENGINE-PORTABLE hash
    (md5-derived ``sampling.hash_bucket``), so there is no vocabulary
    table at all — the property that makes the hashing trick the scale
    choice when the vocabulary itself would be petabyte-skewed.

    Unlike MLlib's ``HashingTF`` (whose murmur3 buckets no other
    engine can replay — the reason tfidf_similar_pairs sat rows-only
    for 7 rounds), the md5 bucket is deterministic arithmetic both
    Spark and DuckDB compute bit-identically, COLLISIONS INCLUDED, so
    downstream cosines hash-verify exactly. IDF uses MLlib's
    convention ln((N+1)/(df+1)) (df counted per bucket), keeping the
    numerics of the HashingTF+IDF pipeline this replaces.

    Cost discipline: the md5 evaluates once per (doc, DISTINCT token)
    — counts aggregate on the raw token first, then re-aggregate onto
    buckets (a cheap map-side combine) — not once per occurrence
    (measured ~3x cpu on the fixture corpus). The idf table is bounded
    at num_features rows by construction, so it broadcasts at ANY
    corpus size, unlike the exact twin's vocabulary-sized idf.

    The returned frame is LAZY; callers that fan it into several plan
    branches should localCheckpoint/memoize it
    (plans/llm_queries._shared_tfidf_w)."""
    from anti_money_laundering_spark.functions import tokens_sql
    from anti_money_laundering_spark.sampling import hash_bucket

    toks = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.expr(tokens_sql(text_col))).alias("token"),
        )
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc", hash_bucket(F.col("token"), num_features, salt=salt).alias("bucket"), "tf")
        .groupBy("doc", "bucket")
        .agg(F.sum("tf").alias("cnt"))
    )
    n = docs.count()
    idf = (
        toks.groupBy("bucket")
        .agg(F.count_distinct("doc").alias("df"))
        .select(
            "bucket",
            F.log((F.lit(float(n)) + 1.0) / (F.col("df") + 1.0)).alias("idf"),
        )
    )
    return toks.join(F.broadcast(idf), "bucket").select(
        "doc", "bucket", (F.col("cnt") * F.col("idf")).alias("w")
    )


def tfidf_hashed_cosine_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 4096,
    salt: str = "tfidf-v1",
    weights: DataFrame | None = None,
) -> DataFrame:
    """Hashing-trick TF-IDF cosine for candidate ``pairs`` — the
    fixed-width-feature-space variant of
    :func:`tfidf_exact_cosine_pairs`; see :func:`tfidf_hashed_weights`
    for the portable-hash and IDF conventions. Pass a precomputed
    (memoized/checkpointed) ``weights`` table to amortize the weight
    build across calls.

    Scale posture: identical to the exact twin — (doc, bucket) and
    (bucket) keyed aggregations, pair×bucket equi-joins bounded by the
    candidate set, corpus size folded in as a literal; bucket count
    bounds the per-doc row fanout at ``num_features``."""
    if weights is not None:
        w = weights
    else:
        # w feeds FOUR plan branches (norms twice via na/nb, wa, wb);
        # without materialization Catalyst re-derives the whole
        # tokenize+agg+join subtree per branch (measured: 23 exchanges,
        # zero reuse). One localCheckpoint computes it once; eager=False
        # keeps plan construction lazy (r9 advice, applied repo-wide).
        w = tfidf_hashed_weights(
            docs, id_col, text_col, num_features, salt
        ).localCheckpoint(eager=False)
    norms = w.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    wa = w.select(F.col("doc").alias("id_a"), "bucket", F.col("w").alias("__wa"))
    wb = w.select(F.col("doc").alias("id_b"), "bucket", F.col("w").alias("__wb"))
    dots = (
        pairs.select("id_a", "id_b")
        .join(wa, "id_a")
        .join(wb, ["id_b", "bucket"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(F.col("doc").alias("id_a"), F.col("nrm").alias("__na"))
    nb = norms.select(F.col("doc").alias("id_b"), F.col("nrm").alias("__nb"))
    # zero-overlap pairs have no shared-bucket rows and would vanish
    # from the inner dot join; keep them at cosine 0.0 like the dense
    # MLlib variant does
    return (
        pairs.select("id_a", "id_b")
        .join(dots, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.coalesce(F.col("__dot"), F.lit(0.0)) / (F.col("__na") * F.col("__nb"))).alias(
                "tfidf_cosine"
            ),
        )
    )


def tfidf_vectors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_features: int = 4096
) -> DataFrame:
    """(id, tfidf) sparse vectors: tokenize -> hashingTF -> IDF."""
    toks = Tokenizer(inputCol=text_col, outputCol="__words").transform(
        docs.select(id_col, text_col)
    )
    tf = HashingTF(inputCol="__words", outputCol="__tf", numFeatures=num_features).transform(toks)
    idf_model = IDF(inputCol="__tf", outputCol="tfidf").fit(tf)
    return idf_model.transform(tf).select(id_col, "tfidf")


def tfidf_cosine_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 4096,
) -> DataFrame:
    """Cosine similarity between TF-IDF vectors for given candidate
    ``pairs`` (id_a, id_b) — candidates come from blocking/LSH, never
    the cartesian. Vector math runs vectorized in a Pandas UDF (sparse
    dot via numpy on Arrow batches)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql.types import DoubleType

    vecs = tfidf_vectors(docs, id_col, text_col, num_features).select(
        id_col, vector_to_array("tfidf").alias("__arr")
    )

    @F.pandas_udf(DoubleType())
    def dense_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        dots = np.einsum("ij,ij->i", ma, mb)
        norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(np.where(norms > 0, dots / np.maximum(norms, 1e-300), 0.0))

    va = vecs.select(F.col(id_col).alias("id_a"), F.col("__arr").alias("__ta"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col("__arr").alias("__tb"))
    joined = pairs.join(va, "id_a").join(vb, "id_b")
    return joined.select(
        "id_a", "id_b", dense_cosine("__ta", "__tb").alias("tfidf_cosine")
    )


def ngram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """CCNet-style statistical quality score: train a word-bigram
    language model on the corpus itself (add-k smoothing) and score
    every document by its mean token log-probability. Documents whose
    word sequences are improbable under the corpus's own statistics
    (boilerplate, gibberish, OCR noise) land in the low tail — the
    scalable stand-in for the reference pipeline's "perplexity filter"
    step that normally needs a pretrained KenLM shipped to executors.

    P(cur|prev) = (c(prev,cur) + k) / (c(prev) + k*V), V = corpus
    vocabulary size.

    Plan (r14 optimization round; guide §2.4 "remove shuffles
    outright"): bigrams come from a SHUFFLE-FREE array zip on the scan
    — ``arrays_zip(toks, slice(toks ++ [null], 2, size))`` pairs every
    token with its successor-or-NULL, all codegen (no lambda beyond the
    tokenizer's linear filter; the winnowing lesson). The old lead()
    window needed a full corpus shuffle on doc_id — and its stream fed
    THREE consumers (scoring join, pair counts, vocabulary), so the
    tokenize+window subtree executed three times per run. Now ALL
    counting derives from ONE aggregation of the zipped stream
    (``cab_all``, distinct (prev, cur) incl. the (last-token, NULL)
    rows): pair counts = the non-NULL rows, context counts = their
    per-prev sums, and V = countDistinct(prev) over cab_all — every
    token appears as ``prev`` exactly once per occurrence, including
    single-token documents and final tokens, so V keeps its all-token
    semantics. cab_all is vocabulary²-bounded (distinct word pairs,
    never corpus-sized) and is lazily checkpointed because it feeds
    three plan branches (the r8/r9 tiny-frame-many-consumers rule).
    The corpus is tokenized exactly TWICE (counting pass + scoring
    pass) instead of four times, with zero window shuffles; the
    scoring join stays keyed by the pair — corpus-sized but perfectly
    partitionable; no step is driver-side and nothing materializes
    pairwise doc x doc state. Documents with fewer than two tokens
    have no bigram evidence and are dropped.

    Returns (id_col, n_bigrams, avg_logprob), natural log."""
    from anti_money_laundering_spark.functions import tokens

    toked = docs.select(id_col, tokens(text_col).alias("__t"))
    nxt = F.slice(
        F.concat(F.col("__t"), F.array(F.lit(None).cast("string"))),
        2,
        F.size("__t"),
    )
    seq = toked.select(
        id_col, F.explode(F.arrays_zip(F.col("__t"), nxt.alias("__nx"))).alias("__bg")
    ).select(
        id_col,
        F.col("__bg.__t").alias("prev"),
        F.col("__bg.__nx").alias("cur"),
    )
    cab_all = (
        seq.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    cab = cab_all.filter(F.col("cur").isNotNull())
    cprev = cab.groupBy("prev").agg(F.sum("n_ab").alias("n_prev"))
    voc = cab_all.agg(F.countDistinct("prev").alias("v"))
    pairs = seq.filter(F.col("cur").isNotNull())
    logprob = F.log(
        (F.col("n_ab") + F.lit(add_k)) / (F.col("n_prev") + F.lit(add_k) * F.col("v"))
    )
    return (
        pairs.join(cab, ["prev", "cur"])
        # no broadcast hint on cprev: it has one row per distinct
        # first-token — vocabulary-sized, unbounded at corpus scale
        # (review finding). The key'd join shuffles boundedly; AQE
        # still picks a broadcast when the dictionary is actually small.
        .join(cprev, "prev")
        .crossJoin(F.broadcast(voc))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.avg(logprob).alias("avg_logprob"),
        )
    )
