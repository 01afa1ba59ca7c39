"""Training-corpus curation operators: benchmark decontamination,
incremental near-dedup, shard manifests, and target-mix rebalancing.

These are the pipeline steps BETWEEN cleaning (dedup/, plans/
llm_queries) and training: make sure eval benchmarks aren't in the
corpus, fold a new crawl batch in without re-deduping the world,
lay the result out as reproducible shards, and rebalance the source
mix — each as declarative DataFrame plans with deterministic
(hash-based, RNG-free) decisions so reruns and engines agree.

Scale notes per operator in the docstrings; the common discipline:
candidate generation is always an equi-join on a derived key
(n-gram / band hash / bucket id), never an all-pairs comparison, and
every "random" choice is md5 arithmetic over row keys (sampling.py's
contract) so the DuckDB oracles can replay it bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anti_money_laundering_spark.functions import token_count, tokens
from anti_money_laundering_spark.sampling import hash_bucket

__all__ = [
    "doc_ngrams",
    "ngram_overlap",
    "decontaminate",
    "shard_manifest",
    "rebalance_to_min_source",
    "rebalance_to_target_mix",
    "repetition_scores",
    "quality_screen",
    "redact_pii",
    "PII_PATTERNS",
]


def doc_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    distinct: bool = True,
) -> DataFrame:
    """(id, ngram) rows: sliding word n-grams of the lowercased
    whitespace tokens (functions.tokens — the engine-wide token
    definition). Uses MLlib's NGram transformer, a JVM-side
    catalyst expression under the hood — NOT a Python UDF and NOT an
    interpreted higher-order lambda (the two slow paths; SKILL.md
    round-1 learning). ``distinct=True`` collapses repeats within a
    document before the explode, which bounds the posting list at one
    row per (doc, unique ngram)."""
    from pyspark.ml.feature import NGram

    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    grams = NGram(n=n, inputCol="__toks", outputCol="__grams").transform(toks)
    out = grams.select("id", F.explode("__grams").alias("ngram"))
    return out.distinct() if distinct else out


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-document count of distinct word n-grams shared with
    ANY benchmark document: (doc_id, n_shared_ngrams). The membership
    primitive behind eval decontamination (an n-gram seen in a
    benchmark marks the corpus doc contaminated).

    Plan: both sides explode to (id, ngram) posting lists; the
    benchmark's DISTINCT n-gram set — eval suites are tiny relative to
    a crawl — is broadcast, the corpus posting list inner-joins it and
    counts per doc. One broadcast join + one agg keyed by doc id: no
    shuffle of the corpus text itself, no pairwise doc×doc
    comparison. At 100 TB the corpus side streams
    through scan→project→explode→join entirely map-side; only the
    (doc_id, count) agg shuffles.

    The corpus posting list is deliberately NOT pre-distinct'd: that
    would shuffle every (doc, 8-gram string) in the corpus just to
    dedupe rows the broadcast join is about to discard. Instead the
    raw exploded stream filters through the broadcast set map-side and
    the per-doc DISTINCT count runs partial-aggregated over the
    survivors — only SHARED grams ever reach a shuffle (r7: 16.8 s →
    ~4 s cold at sf0.1)."""
    c = doc_ngrams(corpus, id_col, text_col, n=n, distinct=False).withColumnRenamed(
        "id", id_col
    )
    b = doc_ngrams(benchmark, id_col, text_col, n=n).select("ngram").distinct()
    return (
        c.join(F.broadcast(b), "ngram")
        .groupBy(id_col)
        .agg(F.countDistinct("ngram").alias("n_shared_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_shared: int = 0,
    drop_benchmark_ids: bool = True,
    validate_ids: bool = True,
) -> DataFrame:
    """Corpus minus documents sharing more than ``max_shared`` distinct
    n-grams with the benchmark (and minus the benchmark docs
    themselves). Anti-join formulation: the contaminated id set from
    :func:`ngram_overlap` is tiny, so both anti-joins broadcast.

    PRECONDITION: the benchmark-id anti-join assumes ``benchmark``'s
    ``id_col`` values live in the CORPUS id space (benchmark ⊆ corpus,
    the simulated-eval-slice shape the catalog query uses). When the
    benchmark is an EXTERNAL suite with its own id space, a colliding
    id would silently drop an unrelated corpus doc — pass such suites
    with ids remapped out of the corpus range, or pass
    ``drop_benchmark_ids=False`` to drop only by overlap evidence.

    ``validate_ids`` ENFORCES the precondition at runtime (r5 advice:
    documentation alone let a real eval suite wired in with colliding
    ids lose data silently): with ``drop_benchmark_ids=True``, the
    benchmark id set must be DISJOINT from the corpus ids (external
    suite, clean id space — the id anti-join is then a no-op) or a
    SUBSET of them (the eval-slice shape); a partial overlap is exactly
    the colliding-external-suite symptom and raises ``ValueError``.
    KNOWN BLIND SPOT: a fully-colliding external suite (every benchmark
    id coincidentally present in the corpus) is INDISTINGUISHABLE from
    a legitimate eval slice by id arithmetic alone — the check cannot
    catch it; external suites should remap ids or pass
    ``drop_benchmark_ids=False`` regardless of this validation.
    Cost: one corpus-scan action plus a tiny benchmark count — pass
    ``validate_ids=False`` in a hot loop where the caller has already
    proven the id discipline."""
    if drop_benchmark_ids and validate_ids:
        b_ids = benchmark.select(id_col).distinct()
        n_bench = b_ids.count()
        # broadcast the TINY benchmark side; the corpus id column
        # streams map-side through the semi-join (never collected)
        n_shared_ids = (
            corpus.select(id_col)
            .join(F.broadcast(b_ids), id_col, "left_semi")
            .distinct()
            .count()
        )
        if 0 < n_shared_ids < n_bench:
            raise ValueError(
                f"decontaminate: benchmark id space partially collides with the "
                f"corpus ({n_shared_ids}/{n_bench} benchmark ids present) — an "
                f"external suite sharing id VALUES would silently drop unrelated "
                f"corpus docs. Remap the benchmark ids out of the corpus range, "
                f"or pass drop_benchmark_ids=False to drop only by overlap "
                f"evidence (validate_ids=False skips this check)."
            )
    bad = (
        ngram_overlap(corpus, benchmark, id_col, text_col, n=n)
        .filter(F.col("n_shared_ngrams") > max_shared)
        .select(id_col)
    )
    out = corpus.join(F.broadcast(bad), id_col, "left_anti")
    if drop_benchmark_ids:
        out = out.join(F.broadcast(benchmark.select(id_col)), id_col, "left_anti")
    return out


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic shard layout for a training corpus: every doc is
    assigned shard = md5-bucket(id) and the manifest aggregates
    per-shard (n_docs, n_tokens, n_chars) — the sizing record a
    dataloader consumes. Content-hash assignment means adding docs
    never reshuffles existing ones (stable incremental builds), and
    md5's uniformity keeps shard skew ~sqrt(n/bins).

    One codegen'd projection + one agg on the shard key; at 100 TB the
    actual shard WRITE is ``df.repartition(n_shards, shard).write``
    using the same expression, so manifest and files can't disagree."""
    shard = hash_bucket(id_col, n_shards, salt=salt).alias("shard")
    return (
        df.select(
            shard,
            token_count(text_col).alias("__tok"),
            F.length(text_col).cast("long").alias("__chr"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
            F.sum("__chr").alias("n_chars"),
        )
    )


def rebalance_to_min_source(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    resolution: int = 10_000,
) -> DataFrame:
    """Downsample every source stratum to (approximately, hash-exactly)
    the size of the SMALLEST source — the uniform-mix special case of
    target-mix rebalancing. Keep rule: md5-bucket(id) in [0, resolution)
    is kept iff bucket * n_source < resolution * n_min, i.e. a
    deterministic per-source keep fraction of n_min/n_source with no
    RNG — rerunning, resharding, or re-ordering the input cannot
    change the selected set.

    Plan: per-source counts via one tiny agg (|sources| rows,
    broadcast back) with the global min folded into that SAME frame by
    an unpartitioned window (r14 optimization round, guide §2.4: the
    former separate ``counts.agg(min)`` branch re-executed the
    corpus-scale scan+agg subtree for its own broadcast — AQE reuses
    identical exchanges, not duplicate static subtrees). The window's
    single reducer sees |sources| rows (a handful of crawl sources —
    a schema constant, never corpus-sized), and the filter stays pure
    codegen'd row arithmetic. No window over the full corpus, no
    shuffle of the data itself."""
    from pyspark.sql.window import Window

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_src"))
    counts = counts.withColumn(
        "__n_min", F.min("__n_src").over(Window.partitionBy())
    )
    keep = hash_bucket(id_col, resolution, salt=salt) * F.col("__n_src") < F.lit(
        resolution
    ) * F.col("__n_min")
    return (
        df.join(F.broadcast(counts), source_col)
        .filter(keep)
        .drop("__n_src", "__n_min")
    )


def repetition_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals (the Gopher-rules family):
    (id, n_tokens, top_token_share, dup_2gram_frac).

    - ``top_token_share``: frequency of the most common token over all
      tokens — catches "word word word" spam.
    - ``dup_2gram_frac``: 1 − distinct/total word bigrams — catches
      repeated phrases that unigram stats miss.

    Plan: bigram counts come straight from JVM-side NGram +
    array_distinct/size (codegen, no shuffle); the token mode is an
    explode → (doc, token) count → per-doc max/sum — two partial-agg
    shuffles keyed by doc id, no interpreted higher-order lambda doing
    O(unique×len) work per row (the tempting one-liner;
    SKILL.md round-1 learning)."""
    from pyspark.ml.feature import NGram

    from anti_money_laundering_spark.functions import tokens

    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    grams = NGram(n=2, inputCol="__toks", outputCol="__g2").transform(toks)
    base = grams.select(
        "id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.when(
            F.size("__g2") > 0,
            1.0 - F.size(F.array_distinct("__g2")) / F.size("__g2"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
    )
    counts = (
        toks.select("id", F.explode("__toks").alias("__tok"))
        .groupBy("id", "__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    top = counts.groupBy("id").agg(
        (F.max("__n") / F.sum("__n")).alias("top_token_share")
    )
    return (
        base.join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce("top_token_share", F.lit(0.0)).alias("top_token_share"),
            "dup_2gram_frac",
        )
    )


def quality_screen(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_top_token_share: float = 0.12,
    max_dup_2gram_frac: float = 0.05,
) -> DataFrame:
    """Rule-based quality gate over :func:`repetition_scores`:
    (id, n_violations, keep) with keep = zero violated rules. The
    thresholds are the Gopher-style screen shape (too short / unigram
    spam / phrase repetition); defaults were checked against the
    fixture distribution at every SF (plans/curation_queries.py
    docstring) so both outcomes are populated."""
    s = repetition_scores(df, id_col, text_col)
    viol = (
        (F.col("n_tokens") < min_tokens).cast("int")
        + (F.col("top_token_share") > max_top_token_share).cast("int")
        + (F.col("dup_2gram_frac") > max_dup_2gram_frac).cast("int")
    )
    return s.select(
        id_col,
        viol.cast("long").alias("n_violations"),
        (viol == 0).alias("keep"),
    )


#: Scrub patterns for the common structured-PII shapes. Deliberately
#: lookahead-free so the same pattern text runs under Java regex
#: (Spark) and RE2 (DuckDB oracles) with identical matches — the same
#: portability constraint as functions.SUBWORD_PATTERN.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace each PII match with ``[<KIND>]`` and append per-kind
    match counts: the pre-training scrub pass. One chained
    regexp_replace projection plus one regexp_count per kind — all
    codegen'd JVM expressions, zero shuffles, so at 100 TB this runs
    at scan speed fused into whatever projection follows. Counts are
    computed BEFORE redaction (ordering would otherwise let an email
    redaction hide the phone digits inside it)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    out_col = out_col or f"{text_col}_redacted"
    cols = [F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(f"n_{k}") for k, p in pats.items()]
    red: Column = F.col(text_col)
    for k, p in pats.items():
        red = F.regexp_replace(red, p, f"[{k.upper()}]")
    return df.select("*", *cols, red.alias(out_col))


def rebalance_to_target_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    resolution: int = 10_000,
) -> DataFrame:
    """Downsample source strata toward an arbitrary TARGET mix
    (e.g. {"web": 0.4, "code": 0.3, ...}) — the general form of
    :func:`rebalance_to_min_source` (which is the uniform special
    case). The achievable corpus size is K = min_s(n_s / w_s) docs
    (the scarcest stratum relative to its target binds everything);
    each source keeps ~w_s·K docs via the same deterministic
    md5-bucket rule: keep iff bucket · n_s < resolution · w_s · K.
    Sources absent from ``weights`` are dropped (weight 0).

    Same plan shape as the uniform case: one tiny per-source count agg
    broadcast back, the binding K folded into that same broadcast by an
    unpartitioned window over the |sources|-row frame (r14, guide
    §2.4 — the former separate ``sized.filter.agg(min)`` branch
    re-executed the corpus scan+agg for its own broadcast; min ignores
    the NULL the ``when`` leaves on zero-weight rows, so K is still
    the min over positively-weighted sources only), codegen'd filter —
    no window over the corpus, no data shuffle."""
    from pyspark.sql.window import Window

    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = sum(weights.values())
    norm = {s: w / total for s, w in weights.items() if w > 0}
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_src"))
    w_expr = F.coalesce(
        *[F.when(F.col(source_col) == s, F.lit(w)) for s, w in norm.items()],
        F.lit(0.0),
    )
    sized = counts.select(source_col, "__n_src", w_expr.alias("__w")).withColumn(
        "__k",
        F.min(
            F.when(F.col("__w") > 0, F.col("__n_src") / F.col("__w"))
        ).over(Window.partitionBy()),
    )
    keep = (
        F.col("__w") > 0
    ) & (
        hash_bucket(id_col, resolution, salt=salt) * F.col("__n_src")
        < F.lit(resolution) * F.col("__w") * F.col("__k")
    )
    return (
        df.join(F.broadcast(sized), source_col)
        .filter(keep)
        .drop("__n_src", "__w", "__k")
    )
