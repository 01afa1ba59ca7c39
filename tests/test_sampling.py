"""Deterministic hash sampling / splitting invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anti_money_laundering_spark.plans.catalog import get_catalog
from anti_money_laundering_spark.sampling import assign_split, hash_bucket, hash_sample
from anti_money_laundering_spark.sources import load_table

CATALOG = get_catalog()


def test_hash_sample_deterministic_and_sized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, salt="s").select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, salt="s").select("doc_id").collect()}
    assert a == b  # pure function of the key, no RNG state
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~fraction, hash-binomial spread
    # different salt = independent sample
    c = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, salt="t").select("doc_id").collect()}
    assert c != a


def test_hash_sample_nested_fractions(spark, sf_dir):
    # bucket < f*B is monotone in f: the 10% sample is a subset of the
    # 20% sample (same salt) — lets pipelines grow a sample in place
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1, salt="s").collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, salt="s").collect()}
    assert small <= big


def test_assign_split_weights_validated():
    with pytest.raises(ValueError):
        assign_split("id", {"train": 0.5, "test": 0.2})


def test_split_covers_all_rows_with_expected_shares(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(
        assign_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v").alias("s")
    )
    counts = {r.s: r["count"] for r in out.groupBy("s").count().collect()}
    n = docs.count()
    assert sum(counts.values()) == n
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 0.6 * n


def test_cluster_split_has_no_leakage(spark, sf_dir):
    # catalog invariant: every near-dup cluster lands in exactly one
    # split — the anti-contamination property the query exists for
    out = CATALOG["corpus_train_split"].fn(spark, sf_dir)
    per_cluster = out.groupBy("cluster_key").agg(F.countDistinct("split").alias("k"))
    assert per_cluster.filter(F.col("k") > 1).count() == 0


def test_hash_bucket_range(spark):
    df = spark.range(1000).select(hash_bucket("id", buckets=7).alias("b"))
    mm = df.agg(F.min("b"), F.max("b")).collect()[0]
    assert mm[0] >= 0 and mm[1] <= 6


def test_stratified_sample_fractions_and_determinism(spark, sf_dir):
    from anti_money_laundering_spark.sampling import stratified_sample
    from anti_money_laundering_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    frac = {"purchase": 1.0, "click": 0.2}
    out = stratified_sample(ev, "event_id", "event_type", frac, default_fraction=0.0)
    counts = {r.event_type: r["count"] for r in out.groupBy("event_type").count().collect()}
    totals = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert counts.get("purchase", 0) == totals["purchase"]  # fraction 1.0 keeps all
    assert set(counts) <= {"purchase", "click"}  # default 0.0 drops the rest
    got = counts.get("click", 0) / totals["click"]
    assert 0.1 <= got <= 0.3, got  # ~0.2 within hash-binomial noise
    # determinism: a second evaluation (different partitioning) keeps the SAME rows
    again = stratified_sample(
        ev.repartition(7), "event_id", "event_type", frac, default_fraction=0.0
    )
    assert {r.event_id for r in again.collect()} == {r.event_id for r in out.collect()}


def test_negative_samples_deterministic_and_uniformish(spark, sf_dir):
    from anti_money_laundering_spark.sampling import negative_samples
    from anti_money_laundering_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = negative_samples(docs, "doc_id", docs, "doc_id", n_negatives=3)
    rows = [(r.doc_id, r.neg_rank, r.neg_doc_id) for r in a.collect()]
    # no self-negatives, ranks in range
    assert all(d != n for d, _, n in rows)
    assert {r for _, r, _ in rows} <= {1, 2, 3}
    # deterministic under repartitioning
    b = negative_samples(docs.repartition(7), "doc_id", docs, "doc_id", n_negatives=3)
    assert set(rows) == {(r.doc_id, r.neg_rank, r.neg_doc_id) for r in b.collect()}
    # roughly uniform: no corpus doc hogs the draws (loose 10x-mean cap)
    from collections import Counter
    cnt = Counter(n for _, _, n in rows)
    assert max(cnt.values()) <= max(10, 10 * len(rows) / docs.count())


def test_dense_index_matches_global_row_number(spark, sf_dir):
    # r5 verdict item 3: the distributed index (range partitions +
    # per-partition windows + offsets) must produce the EXACT values of
    # row_number() OVER (ORDER BY key) - 1 on a unique key.
    from pyspark.sql.window import Window

    from anti_money_laundering_spark.sampling import dense_index
    from anti_money_laundering_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    got = {(r["doc_id"], r["__idx"]) for r in dense_index(docs, "doc_id").collect()}
    want = {
        (r["doc_id"], r["__idx"])
        for r in docs.select(
            "doc_id", (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("__idx")
        ).collect()
    }
    assert got == want
    # stable under input partitioning
    again = {(r["doc_id"], r["__idx"]) for r in dense_index(docs.repartition(13), "doc_id").collect()}
    assert again == want


def test_dense_index_lazy_matches_global_row_number(spark, sf_dir):
    # r10 advice item 1: the fully-lazy fixed-grid variant must produce
    # the EXACT global rank, run ZERO jobs at plan construction, and be
    # stable under recomputation (no boundary sampling).
    from pyspark.sql.window import Window

    from anti_money_laundering_spark.sampling import dense_index_lazy
    from anti_money_laundering_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs.count()  # warm the scan memo so the job counter isolates construction
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None))
    # a deliberately skew-uneven grid (doc_id div 7) still ranks exactly
    lazy = dense_index_lazy(docs, "doc_id", F.expr("doc_id div 7"))
    lazy._jdf.queryExecution().executedPlan()
    assert len(sc.statusTracker().getJobIdsForGroup(None)) == before, (
        "dense_index_lazy must not execute jobs at plan construction"
    )
    got = {(r["doc_id"], r["__idx"]) for r in lazy.collect()}
    want = {
        (r["doc_id"], r["__idx"])
        for r in docs.select(
            "doc_id", (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("__idx")
        ).collect()
    }
    assert got == want
    # byte-deterministic on recomputation — the property that lets
    # callers skip the checkpoint the eager variant needs
    again = {
        (r["doc_id"], r["__idx"])
        for r in dense_index_lazy(
            docs.repartition(13), "doc_id", F.expr("doc_id div 7")
        ).collect()
    }
    assert again == want


def test_dense_index_lazy_null_bucket_raises(spark):
    # r11 advice item 2: a NULL bucket must fail LOUDLY at execution,
    # not silently drop the row (the eager variant RETAINS such rows,
    # so a silent drop here would make variant migration lossy).
    import pytest

    from anti_money_laundering_spark.sampling import dense_index_lazy

    df = spark.range(10).select(F.col("id").alias("k"))
    bad = F.when(F.col("k") == 7, F.lit(None).cast("long")).otherwise(
        F.expr("k div 3")
    )
    with pytest.raises(Exception, match="dense_index_lazy"):
        dense_index_lazy(df, "k", bad).collect()
    # and the non-null path is unaffected
    ok = dense_index_lazy(df.filter("k <> 7"), "k", F.expr("k div 3"))
    assert [r["__idx"] for r in ok.orderBy("k").collect()] == list(range(9))


def test_dense_index_plan_has_no_single_task_window(spark, sf_dir):
    # The whole point: no Exchange SinglePartition anywhere in the plan
    # (a global window would plan one), and the windows that remain are
    # partitioned by __pid.
    from anti_money_laundering_spark.sampling import dense_index, negative_samples
    from anti_money_laundering_spark.sources import load_table
    from tests.test_plans import explain_str

    docs = load_table(spark, sf_dir, "documents")
    plan = explain_str(dense_index(docs.select("doc_id"), "doc_id"))
    assert "SinglePartition" not in plan
    # the per-partition window clusters on __pid (parallel), never global
    assert "hashpartitioning(__pid" in plan
    neg_plan = explain_str(negative_samples(docs, "doc_id", docs, "doc_id", n_negatives=3))
    assert "SinglePartition" not in neg_plan
