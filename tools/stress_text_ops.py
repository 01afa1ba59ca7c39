#!/usr/bin/env python
"""Stress the r7 text/feature additions at 20-200x fixture scale:
bigram-LM quality scoring over ~100k documents, BPE training over the
same corpus's word dictionary, and CUSUM over ~2M synthetic events —
checking the corpus-scale paths stay aggregation-shaped (no quadratic
blowup, no driver materialization) as volume grows.

Inputs are synthesized from sf0.1 fixtures with codegen expressions
(crossJoin replication + per-copy mutation), same recipe as
stress_llm.py. Results go to SCALE.md §text-ops.

Usage: python tools/stress_text_ops.py [doc_replicas] [event_replicas]
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
    doc_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ev_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="text_ops_stress", shuffle_partitions=64)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = spark.range(doc_reps).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * doc_reps + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", "text", F.concat(F.lit("mut"), F.col("rep"))).alias("text"),
    )
    n_docs = corpus.count()

    from anti_money_laundering_spark.text_ml import ngram_lm_scores

    t0 = time.perf_counter()
    n_scored = ngram_lm_scores(corpus).count()
    t_lm = time.perf_counter() - t0
    print(f"ngram_lm_scores: {n_docs} docs -> {n_scored} scored in {t_lm:.1f}s")

    from anti_money_laundering_spark.tokenizer import learn_bpe

    t0 = time.perf_counter()
    merges, vocab = learn_bpe(corpus, n_merges=20)
    n_vocab = vocab.count()
    t_bpe = time.perf_counter() - t0
    print(
        f"learn_bpe: 20 merges over {n_vocab}-word dict from {n_docs} docs "
        f"in {t_bpe:.1f}s ({t_bpe / 20:.2f}s/merge); top={merges[0]}"
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "user_id", "value")
    ereps = spark.range(ev_reps).select(F.col("id").alias("rep"))
    events = ev.crossJoin(ereps).select(
        (F.col("event_id") * ev_reps + F.col("rep")).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("rep"))).alias("ts"),
        # replicas spread over distinct synthetic users so per-user
        # series lengths stay fixture-like while total volume grows
        (F.col("user_id") * ev_reps + F.col("rep")).alias("user_id"),
        "value",
    )
    n_events = events.count()

    from anti_money_laundering_spark.features import cusum

    t0 = time.perf_counter()
    n_alarms = (
        cusum(events, key="user_id", ts="ts", value="value", tiebreak="event_id")
        .filter(F.col("alarm"))
        .count()
    )
    t_cusum = time.perf_counter() - t0
    print(f"cusum: {n_events} events -> {n_alarms} alarms in {t_cusum:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
