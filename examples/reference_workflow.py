"""End-to-end reference-parity workflow: the four notebooks of
databricks-industry-solutions/anti-money-laundering re-run as ONE
library pipeline — what a user switching from the reference actually
executes.

Stage mapping (MIGRATION.md has the call-by-call table):
- 01_aml_network_analysis.py  -> network_alerts (motifs, components,
  risk propagation united into the alert feed composite)
- 02_aml_address_verification.py -> address_checks (multimodal
  classify over binary payload columns; fetch/model stubbed
  deterministically in this container, plumbing real)
- 03_aml_entity_resolution.py -> entity_links (blocked pairs -> EM
  scoring -> resolved entity clusters)
- RUNME.py                    -> the Pipeline DAG itself

Run: python examples/reference_workflow.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints one row-count line per
stage, exits 0 on success).
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

    @p.stage("network_alerts")
    def network_alerts(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
        # 01: graph construction -> motifs -> components -> Pregel risk,
        # unioned into one tagged alert feed (the flagship composite).
        return catalog["aml_alert_feed"].fn(spark, sf_dir)

    @p.stage("address_checks")
    def address_checks(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
        # 02: media payloads -> Arrow-batched classification -> label join.
        return catalog["multimodal_classify"].fn(spark, sf_dir)

    @p.stage("entity_links")
    def entity_links(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
        # 03: blocking -> gamma vectors -> EM fit -> scored pairs -> clusters.
        return catalog["linkage_entity_clusters"].fn(spark, sf_dir)

    @p.stage("case_file", depends_on=("network_alerts", "entity_links"))
    def case_file(spark: SparkSession, inputs: dict[str, DataFrame]) -> DataFrame:
        # Downstream consumer of both: alerts whose account resolves to a
        # multi-record entity (the cross-notebook join the reference does
        # through saveAsTable handoffs).
        from pyspark.sql import functions as F

        alerts = inputs["network_alerts"]  # (alert_type, entity_id, severity)
        entities = inputs["entity_links"]  # (c_custkey, entity_id, cluster_size)
        multi = entities.filter(F.col("cluster_size") > 1).select(
            "c_custkey",
            F.col("entity_id").alias("resolved_entity_id"),
            "cluster_size",
        )
        return alerts.join(multi, alerts["entity_id"] == multi["c_custkey"]).select(
            "alert_type", alerts["entity_id"], "severity", "resolved_entity_id", "cluster_size"
        )

    return p


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="reference_workflow")
    results = build_pipeline(sf_dir).run(spark)
    for name, df in results.items():
        print(f"{name}: {df.count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
