"""End-to-end LLM training-data pipeline: raw documents + embeddings
in, training manifest out — the second face of the engine (the first,
examples/reference_workflow.py, is the AML analyst's).

Stages: corpus hygiene (lang-ID -> quality -> exact + near dedup) ->
domain balancing (per-source cap) -> leakage-free split -> sequence
packing, with retrieval (BM25 + ANN) and corpus analytics (keywords,
PMI collocations, vocabulary head) alongside.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from anti_money_laundering_spark.pipeline import Pipeline  # noqa: E402
from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402


def build_pipeline(sf_dir: str) -> Pipeline:
    catalog = get_catalog()
    p = Pipeline()

    def from_catalog(name: str):
        def stage(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
            return catalog[name].fn(spark, sf_dir)

        return stage

    # hygiene -> split -> packed offsets, as one hash-verified composite
    p.stage("training_manifest")(from_catalog("corpus_training_manifest"))
    # domain balancing runs beside the manifest (same corpus, cap view)
    p.stage("source_caps")(from_catalog("per_source_doc_cap"))
    # retrieval surfaces over the same corpus
    p.stage("bm25_scores")(from_catalog("bm25_doc_scores"))
    p.stage("ann_neighbors")(from_catalog("ann_lsh_topk"))
    # corpus analytics for tokenizer/vocab decisions
    p.stage("keywords")(from_catalog("doc_keywords"))
    p.stage("collocations")(from_catalog("bigram_pmi_collocations"))
    p.stage("vocabulary")(from_catalog("vocab_top_terms"))
    # curation (r5): eval decontamination, quality gate, shard layout,
    # mix rebalancing — the steps between cleaning and training
    p.stage("decontamination")(from_catalog("decontam_ngram_overlap"))
    p.stage("quality_gate")(from_catalog("quality_rule_screen"))
    p.stage("shards")(from_catalog("shard_manifest_docs"))
    p.stage("mix_rebalance")(from_catalog("rebalance_uniform_mix"))

    @p.stage("manifest_summary", depends_on=("training_manifest",))
    def manifest_summary(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
        from pyspark.sql import functions as F

        return (
            inputs["training_manifest"]
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    return p


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_pipeline")
    results = build_pipeline(sf_dir).run(spark)
    for name, df in results.items():
        print(f"{name}: {df.count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
