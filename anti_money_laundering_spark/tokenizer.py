"""Byte-pair-encoding primitives, Spark-first (Sennrich et al. 2016).

Classic BPE trains on the WORD-FREQUENCY DICTIONARY, not the raw
corpus — the only corpus-scale pass is one tokenize+count; every merge
iteration then runs over the vocabulary table (millions of rows at
100 TB, not trillions), which is what makes driver-looped training
viable at scale. The reference pipeline reaches for a pretrained
tokenizer; this module lets the engine induce one from the corpus it
is already scanning.

Plan discipline:
- pair counting is explode(sequence) + substring/element_at — all
  codegen'd scalar exprs, no interpreted lambdas in any corpus-scale
  path (the winnowing lesson);
- the one interpreted ``aggregate()`` fold (merge application) runs on
  the vocabulary table only, once per merge;
- each merge iteration collects exactly ONE row (the argmax pair) and
  localCheckpoints the vocab table so lineage doesn't deepen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anti_money_laundering_spark.functions import tokens

__all__ = [
    "word_frequencies",
    "bpe_pair_counts",
    "learn_bpe",
    "bpe_segment",
]


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the canonical whitespace tokenizer — the ONE
    corpus-scale pass of BPE training. One explode + one count shuffle
    with map-side partials."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(words: DataFrame, syms_col: str) -> DataFrame:
    """Explode each word's symbol array into adjacent (a, b) pairs
    carrying the word frequency. element_at over an exploded position
    sequence — codegen'd, no lambda."""
    return (
        words.filter(F.size(syms_col) >= 2)
        .select(
            "freq",
            F.col(syms_col).alias("__s"),
            F.explode(F.sequence(F.lit(1), F.size(syms_col) - 1)).alias("i"),
        )
        .select(
            F.element_at("__s", F.col("i")).alias("a"),
            F.element_at("__s", F.col("i") + 1).alias("b"),
            "freq",
        )
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Frequency-weighted adjacent CHARACTER pair counts over the word
    dictionary — the statistic the first BPE merge argmaxes over.
    Returns (sym_a, sym_b, n) with n = sum of word frequencies; the
    pair domain is alphabet², so the final aggregate is tiny however
    large the corpus."""
    words = word_frequencies(docs, text_col)
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "freq",
            "w",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            F.expr("substring(w, i, 1)").alias("sym_a"),
            F.expr("substring(w, i+1, 1)").alias("sym_b"),
            "freq",
        )
    )
    return pairs.groupBy("sym_a", "sym_b").agg(
        F.sum("freq").cast("long").alias("n")
    )


def _merge_fold(a: str, b: str) -> Column:
    """aggregate() fold replacing every left-to-right non-overlapping
    (a, b) adjacency with the fused symbol. Literal symbols enter via
    F.lit (never interpolated into SQL text — corpus symbols can hold
    quotes/backslashes). Runs on the vocab table only."""
    merged = a + b

    def step(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        "syms", F.array().cast("array<string>"), step
    )


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    min_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Each iteration:
    count adjacent symbol pairs over the vocab (weighted by word
    freq), collect the single argmax row (ties broken by count desc,
    then (a, b) lexicographic — deterministic across engines and
    cluster sizes), apply the merge with one vocabulary-local fold.
    Stops early when the best pair drops below ``min_count``.

    Returns (merges, vocab_df) where merges is [(a, b, count)] in
    learned order and vocab_df holds (w, freq, syms) in the final
    segmentation."""
    words = (
        word_frequencies(docs, text_col)
        # split at inter-character positions only: not at start, and
        # followed by a char — a bare (?!^) also matches end-of-string
        # and Spark's split (limit -1) KEEPS that trailing empty symbol
        .withColumn("syms", F.split("w", r"(?!^)(?=.)"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _adjacent_pairs(words, "syms")
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        words = words.withColumn("syms", _merge_fold(a, b)).localCheckpoint()
    return merges, words


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list: tokenize JVM-side (same canonical
    tokenizer as training), then encode each word by repeatedly fusing
    its lowest-rank adjacent pair (all left-to-right non-overlapping
    occurrences per round — the exact semantics of the training fold).
    One Arrow-batched pandas UDF over the token arrays with a
    per-batch word cache (Zipf makes the cache hit rate ~1); ranks are
    closure-captured (a merge table is KBs, not worth a broadcast
    join)."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def seg(tok_arrays: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) >= 2:
                best = None  # (rank, a, b)
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, syms[i], syms[i + 1])
                if best is None:
                    break
                _, a, b = best
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = syms
            return syms

        # Arrow hands list columns over as numpy arrays: no truthiness
        return tok_arrays.map(
            lambda toks: [s for w in ([] if toks is None else toks) for s in encode(w)]
        )

    return df.withColumn(out_col, seg(tokens(text_col)))
