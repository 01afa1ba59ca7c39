#!/usr/bin/env python
"""Repeated-span (ExactSubstr) stress at ~20x fixture scale — the
WORST case for span dedup: every fixture doc replicated with a single
trailing mutation, so nearly EVERY token position in the ~20x corpus is
covered (its 8-gram repeats in 19 sibling copies) and the
gaps-and-islands merge runs at full volume. Measures the wall of the
gram-count shuffle + island windows when covered-position volume ==
corpus token volume (tens of millions of positions).

Inputs synthesized from the sf0.1 fixtures with codegen expressions
(crossJoin replication) — no driver-side data. Results go to
SCALE.md §llm-stress.

Usage: python tools/stress_spans.py [replicas]
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
    spark = get_spark(app_name="span_stress", shuffle_partitions=64)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", "text", F.concat(F.lit("mut"), F.col("rep"))).alias("text"),
    )
    from anti_money_laundering_spark.dedup import repeated_spans
    from anti_money_laundering_spark.functions import token_count

    n_tokens = corpus.select(F.sum(token_count("text"))).collect()[0][0]
    t0 = time.perf_counter()
    spans = repeated_spans(corpus, "doc_id", "text", gram_k=8, min_span_tokens=12)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("span_tokens").alias("covered_tokens"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(
        f"repeated_spans: docs={n_docs * replicas} tokens={n_tokens} "
        f"spans={agg['n_spans']} span_docs={agg['n_docs']} "
        f"covered_tokens={agg['covered_tokens']} wall={wall:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
