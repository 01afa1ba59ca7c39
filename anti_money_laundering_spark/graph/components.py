"""Connected components as an iterative DataFrame program (SURVEY §2.8 G4).

Replaces GraphFrames' connectedComponents (01_aml_network_analysis.py:146)
with min-label propagation: every vertex starts labeled with its own id;
each round, labels flow across (undirected) edges and each vertex keeps
the minimum seen. Fixpoint when no label changes. The component label is
therefore ``min(member id)`` — deterministic and portable, unlike
GraphFrames' packed partition<<32 longs (01:212).

Scale posture:
- each round is one shuffle-join (labels x edges) + one partial-agg'd
  min-groupBy — both keyed on vertex id, so AQE can coalesce/skew-split;
- ``localCheckpoint`` per round truncates the exponentially-growing
  lineage (SURVEY §4 O5), mirroring the reference's mandatory
  setCheckpointDir (01:122, :145);
- a pointer-jumping shortcut each round (label := label(label)) gives
  O(log diameter) rounds — the same asymptotics as alternating
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond") with a simpler driver.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from anti_money_laundering_spark.graph import Graph


def connected_components(
    graph: "Graph",
    max_iter: int = 100,
) -> DataFrame:
    """Return ``(id, component)`` with component = min id reachable.

    Treats edges as undirected (the reference's identity graph is
    stored directed entity→attribute but resolved undirected,
    SURVEY §1.3).
    """
    edges = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    # Undirected: propagate labels both ways.
    bi = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    bi = bi.localCheckpoint(eager=False)

    labels = graph.vertices.select("id").distinct().withColumn("component", F.col("id"))
    labels = labels.localCheckpoint(eager=True)

    # Labels are monotonically non-increasing (each round takes a min over
    # a superset that includes the old label), so the label sum strictly
    # decreases iff any label changed — a one-column agg is a much cheaper
    # fixpoint test than a join-and-compare against the previous round.
    # decimal(38,0) so the sum can't overflow with 64-bit ids at scale.
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # Labels seen by each vertex via incoming propagation.
        incoming = (
            bi.join(labels, bi.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.select("id", "component")
            .union(incoming)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # Pointer jumping: component ids are themselves vertex ids with
        # labels, and labels only decrease — so label(label(u)) <=
        # label(u). One shortcut join per round halves path lengths,
        # turning O(diameter) convergence into O(log diameter) on
        # chain-like graphs (same effect as large-star/small-star).
        parent = new_labels.select(
            F.col("id").alias("__pid"), F.col("component").alias("__pcomp")
        )
        new_labels = (
            new_labels.join(parent, new_labels.component == F.col("__pid"), "left")
            .select("id", F.coalesce("__pcomp", "component").alias("component"))
        )
        # Lazy checkpoint + fixpoint agg = ONE job per round: the sum
        # action materializes the checkpoint blocks, which the next
        # round's join then reads, and the join lineage is truncated
        # (SURVEY §4 O5). An eager checkpoint here would spend a second
        # full pass per round just to materialize before the agg.
        new_labels = new_labels.localCheckpoint(eager=False)
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
