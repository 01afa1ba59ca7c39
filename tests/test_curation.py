"""Curation-operator tests: closed-form n-gram overlap/decontamination,
shard-manifest conservation, and rebalance determinism + bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from anti_money_laundering_spark.curation import (
    decontaminate,
    doc_ngrams,
    ngram_overlap,
    rebalance_to_min_source,
    shard_manifest,
)
from anti_money_laundering_spark.sources import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_ngrams_closed_form(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "x x x x x")])
    out = {(r.id, r.ngram) for r in doc_ngrams(df, n=3).collect()}
    # doc 2 is shorter than n -> no grams; doc 3's repeats collapse
    assert out == {(1, "a b c"), (1, "b c d"), (3, "x x x")}


def test_ngram_overlap_and_decontaminate_closed_form(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),   # shares 2 distinct 3-grams
            (2, "totally unrelated words here"),
            (3, "quick brown fox somewhere"),   # shares 1
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox ran")])
    ov = {r.doc_id: r.n_shared_ngrams for r in ngram_overlap(corpus, bench, n=3).collect()}
    assert ov == {1: 2, 3: 1}  # doc 2 absent: no shared grams at all
    clean = decontaminate(corpus, bench, n=3, max_shared=1)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 3]  # doc1 dropped (2 > 1)
    # max_shared=0: any shared gram contaminates
    strict = decontaminate(corpus, bench, n=3, max_shared=0)
    assert sorted(r.doc_id for r in strict.collect()) == [2]


def test_shard_manifest_conserves_totals(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    man = shard_manifest(docs, n_shards=8).collect()
    assert {r.shard for r in man} <= set(range(8))
    assert sum(r.n_docs for r in man) == docs.count()
    total_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert sum(r.n_chars for r in man) == total_chars
    # content-hash stability: rerunning yields the identical manifest
    again = shard_manifest(docs, n_shards=8).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, again))


def test_rebalance_bounds_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = rebalance_to_min_source(docs)
    per_src = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_min = min(
        r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    )
    # every stratum lands within hash-noise of the min-source size:
    # bucket-uniformity bounds |kept - n_min| by ~sqrt scatter, and the
    # keep rule can never take MORE than ceil(n_min/n_src * n_src)-ish
    for src, n in per_src.items():
        assert n <= n_min * 1.5 + 5, (src, n, n_min)
        assert n >= n_min * 0.5 - 5, (src, n, n_min)
    # schema passthrough + determinism
    assert set(kept.columns) == set(docs.columns)
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in rebalance_to_min_source(docs).collect())
    assert a == b
