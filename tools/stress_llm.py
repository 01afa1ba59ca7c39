#!/usr/bin/env python
"""LLM-pipeline stress at 20-30x fixture scale: MinHash-LSH dedup over
~100k documents (with planted near-dup groups) and LSH ANN over ~100k
synthetic embeddings — measuring the candidate-generation discipline
(bucketed joins, never all-pairs) holds when the corpus grows.

Inputs are synthesized from the sf0.1 fixtures with codegen expressions
(crossJoin with a small replication range + per-copy mutation token) —
no driver-side data. Results go to SCALE.md §llm-stress.

Usage: python tools/stress_llm.py [replicas] [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_vectors = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="llm_stress", shuffle_partitions=64)

    # --- dedup: replicate each fixture doc `replicas`x, mutating one
    # trailing token per copy — every replica group is a planted
    # near-dup cluster (J well above 0.7 for fixture-length docs).
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", "text", F.concat(F.lit("mut"), F.col("rep"))).alias("text"),
    )
    from anti_money_laundering_spark.dedup import jaccard_pairs, minhash_lsh_candidates

    t0 = time.perf_counter()
    cands = minhash_lsh_candidates(corpus, "doc_id", "text", shingle_k=3)
    n_cand = cands.count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    pairs = jaccard_pairs(corpus, "doc_id", "text", min_jaccard=0.7, pairs=cands, shingle_k=3)
    n_pairs = pairs.count()
    t_ver = time.perf_counter() - t0
    print(
        f"dedup: docs={n_docs * replicas} candidates={n_cand} ({t_cand:.1f}s) "
        f"verified_pairs={n_pairs} ({t_ver:.1f}s)"
    )

    # --- ANN: synthetic unit-ish vectors (dim 16) from xxhash64;
    # 1000 queries against the full corpus through the banded LSH path.
    dim = 16
    vec = F.array(
        *[
            (F.pmod(F.xxhash64("id", F.lit(f"d{i}")), 2000) / 1000.0 - 1.0).cast("double")
            for i in range(dim)
        ]
    )
    emb = spark.range(n_vectors).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    from anti_money_laundering_spark.vector import ann_lsh_topk

    queries = emb.filter(F.col("vec_id") % (n_vectors // 1000) == 0)
    t0 = time.perf_counter()
    topk = ann_lsh_topk(queries, emb, k=5)
    n_topk = topk.count()
    t_ann = time.perf_counter() - t0
    print(f"ann: corpus={n_vectors} queries~1000 topk_rows={n_topk} ({t_ann:.1f}s)")

    # --- decontamination: 5% of the replicated corpus as "benchmark",
    # 4-gram posting-list overlap (broadcast benchmark grams).
    from anti_money_laundering_spark.curation import ngram_overlap

    bench = corpus.filter(F.col("doc_id") % 20 == 0)
    rest = corpus.filter(F.col("doc_id") % 20 != 0)
    t0 = time.perf_counter()
    n_contam = ngram_overlap(rest, bench, n=4).count()
    t_dc = time.perf_counter() - t0
    print(f"decontam: corpus={n_docs * replicas} contaminated_docs={n_contam} ({t_dc:.1f}s)")

    # --- exact-arithmetic Lloyd round (r8): same synthetic corpus at
    # dim 64 (the fixture embedding width); the a1/a2 joins fan out to
    # n_vectors * k * dim rows — the claim under test is that one
    # deterministic k-means round stays keyed-join/agg shaped (no
    # collect, no all-pairs) at 100x the fixture corpus.
    from anti_money_laundering_spark.ml import exact_kmeans_assignments

    dim64 = F.array(
        *[
            (F.pmod(F.xxhash64("id", F.lit(f"e{i}")), 2000) / 1000.0 - 1.0).cast("float")
            for i in range(64)
        ]
    )
    emb64 = spark.range(n_vectors).select(F.col("id").alias("vec_id"), dim64.alias("embedding"))
    t0 = time.perf_counter()
    km = exact_kmeans_assignments(emb64, k=8)
    sizes = sorted(
        (r["cluster"], r["n"]) for r in km.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    )
    t_km = time.perf_counter() - t0
    print(f"kmeans: corpus={n_vectors} dim=64 k=8 cluster_sizes={sizes} ({t_km:.1f}s)")

    # --- embedding-QC label outliers (r11): 10x the kmeans corpus, 10
    # labels, 64 dims, exact catalog formulation via the load_table
    # swap. Plants 30 far vectors (coords shifted +3.0 — organic coords
    # live in [-1, 1)) spread over the labels; EVERY planted id must
    # occupy a top-3 slot for its label (3 per label x 10 labels).
    import anti_money_laundering_spark.plans.llm_queries as lq

    n_out = 10 * n_vectors
    planted = F.col("vec_id") < 30
    dim64p = F.array(
        *[
            F.when(planted, F.lit(3.0) + (F.pmod(F.xxhash64("id", F.lit(f"p{i}")), 100) / 100.0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(f"e{i}")), 2000) / 1000.0 - 1.0)
            .cast("float")
            for i in range(64)
        ]
    )
    embq = spark.range(n_out).select(
        F.col("id").alias("vec_id"),
        dim64p.alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )
    orig = lq.load_table
    lq.load_table = lambda _spark, _sf_dir, _t: embq
    try:
        t0 = time.perf_counter()
        rows = lq.embedding_label_outliers(spark, "stress").collect()
        t_eo = time.perf_counter() - t0
    finally:
        lq.load_table = orig
    got_planted = sorted(r.vec_id for r in rows if r.vec_id < 30)
    print(
        f"embedding_outliers: corpus={n_out} dim=64 labels=10 -> {len(rows)} rows "
        f"({t_eo:.1f}s); planted far vectors in top-3 slots: {len(got_planted)}/30"
    )
    assert got_planted == list(range(30)), got_planted
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
