"""The AML alert feed — the composite a monitoring team actually
consumes: every alert family the reference's notebooks produce
separately (structuring fan-in 01:308-322, round-tripping 01:376-405,
synthetic identities 01:164-228, propagated risk 01:450-461), plus the
temporal layering family this engine adds (time-respecting peeling
chains), unioned into one typed feed (alert_type, entity_id,
severity).

This module is imported LAST by ``get_catalog`` so its oracle can be
composed verbatim from the already-registered component oracles — the
composite stays hash-verified end-to-end because each leg is, and the
glue is a UNION ALL of their SQL with severity casts.

Scale posture: the feed is a union of independently-planned legs —
Catalyst executes each leg's (already reviewed) plan and streams the
union without any added shuffle; the only new operator is the final
projection per leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.plans.catalog import _CATALOG, register

#: Alert threshold on propagated risk — ~ the top decile of the
#: fixture distribution (p90 = 145 at sf0.01).
RISK_ALERT_THRESHOLD = 150.0


def _feed_oracle() -> str:
    fanin = _CATALOG["motif_fanin_structuring"].oracle
    cycle = _CATALOG["motif_roundtrip_cycle"].oracle
    synth = _CATALOG["synth_id_scores"].oracle
    risk = _CATALOG["pregel_risk_propagation"].oracle
    peel = _CATALOG["motif_peeling_chain"].oracle
    return f"""
    SELECT 'structuring' AS alert_type, c_id AS entity_id,
           CAST(in_amount AS DOUBLE) AS severity
    FROM ({fanin})
    UNION ALL
    SELECT 'round_trip', a_id, CAST(cycle_amount AS DOUBLE) FROM ({cycle})
    UNION ALL
    SELECT 'synth_id', id0, CAST(synth_score AS DOUBLE) FROM ({synth})
    UNION ALL
    SELECT 'risk_prop', id, CAST(risk_score AS DOUBLE) FROM ({risk})
    WHERE risk_score >= {RISK_ALERT_THRESHOLD}
    UNION ALL
    SELECT 'layering', b_id, CAST(peeled AS DOUBLE) FROM ({peel})
    """


@register(
    "aml_alert_feed",
    tags=("G5", "G4", "G6", "U2"),
    oracle=_feed_oracle(),
)
def aml_alert_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One feed, five alert families: structuring mules (fan-in motif,
    severity = combined inflow), round-trip origins (3-cycle, severity
    = cycle amount), synthetic identities (shared-attribute component
    score), high propagated risk (Pregel score over threshold), and
    temporal layering (first intermediary of each time-respecting
    peeling chain, severity = amount shed along the chain). Each leg
    is the registered catalog query; the union adds no shuffle."""
    fanin = _CATALOG["motif_fanin_structuring"].fn(spark, sf_dir)
    cycle = _CATALOG["motif_roundtrip_cycle"].fn(spark, sf_dir)
    synth = _CATALOG["synth_id_scores"].fn(spark, sf_dir)
    risk = _CATALOG["pregel_risk_propagation"].fn(spark, sf_dir)
    peel = _CATALOG["motif_peeling_chain"].fn(spark, sf_dir)
    legs = [
        fanin.select(
            F.lit("structuring").alias("alert_type"),
            F.col("c_id").alias("entity_id"),
            F.col("in_amount").cast("double").alias("severity"),
        ),
        cycle.select(
            F.lit("round_trip").alias("alert_type"),
            F.col("a_id").alias("entity_id"),
            F.col("cycle_amount").cast("double").alias("severity"),
        ),
        synth.select(
            F.lit("synth_id").alias("alert_type"),
            F.col("id0").alias("entity_id"),
            F.col("synth_score").cast("double").alias("severity"),
        ),
        risk.filter(F.col("risk_score") >= RISK_ALERT_THRESHOLD).select(
            F.lit("risk_prop").alias("alert_type"),
            F.col("id").alias("entity_id"),
            F.col("risk_score").cast("double").alias("severity"),
        ),
        peel.select(
            F.lit("layering").alias("alert_type"),
            F.col("b_id").alias("entity_id"),
            F.col("peeled").cast("double").alias("severity"),
        ),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _manifest_oracle() -> str:
    clean = _CATALOG["corpus_clean_pipeline"].oracle
    split = _CATALOG["corpus_train_split"].oracle
    from anti_money_laundering_spark.plans.llm_queries import _duck_hash_bucket

    shard_s = _duck_hash_bucket("s.doc_id", "pack-v1", 16)
    return f"""
    WITH survivors AS ({clean}),
    splits AS ({split}),
    sharded AS (
        SELECT s.doc_id AS doc_id, sp.split, CAST(s.n_tokens AS BIGINT) AS n_tokens,
               {shard_s} AS shard
        FROM survivors s JOIN splits sp ON sp.doc_id = s.doc_id
    ),
    packed AS (
        SELECT doc_id, split, n_tokens, shard,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY split, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens, 0)
                   AS BIGINT) AS start_offset
        FROM sharded
    )
    SELECT doc_id, split, n_tokens, shard, start_offset,
           CAST(floor(start_offset / 512) AS BIGINT) AS bin_id
    FROM packed
    """


@register(
    "corpus_training_manifest",
    tags=("LLM", "text", "dedup", "sample", "G4"),
    oracle=_manifest_oracle(),
)
def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-side flagship composite — the training-data manifest a
    pipeline hands to the tokenizer: cleaned survivors
    (lang → quality → exact dedup → near-dedup), leakage-free split
    assignment (near-dup-cluster-keyed hash buckets), and per-(split,
    shard) concat-and-chunk packing offsets into 512-token windows.
    Every leg is a registered hash-verified query; the composition
    adds one join and one cumulative-sum window. The LSH/cluster memo
    is shared with the other corpus queries, so in a session the
    manifest costs its own join + window only."""
    from anti_money_laundering_spark.sampling import hash_bucket
    from pyspark.sql import Window as W

    clean = _CATALOG["corpus_clean_pipeline"].fn(spark, sf_dir).select("doc_id", "n_tokens")
    split = _CATALOG["corpus_train_split"].fn(spark, sf_dir).select("doc_id", "split")
    sharded = (
        clean.join(split, "doc_id")
        .select(
            "doc_id", "split", F.col("n_tokens").cast("long").alias("n_tokens"),
            hash_bucket("doc_id", buckets=16, salt="pack-v1").alias("shard"),
        )
    )
    w = W.partitionBy("split", "shard").orderBy("doc_id")
    return (
        sharded.withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)).cast("long"),
        )
        .withColumn("bin_id", F.floor(F.col("start_offset") / 512).cast("long"))
    )
