"""Graph analytics over DataFrame pairs (SURVEY.md §2.8).

The reference delegates to GraphFrames (01_aml_network_analysis.py:78,
:109, :292, :441); this module provides the same surface as pure
PySpark algorithmic drivers: a ``Graph`` of two DataFrames, degrees,
degree pruning, iterative connected components, a motif-pattern
compiler, and a Pregel loop. No JVM extensions — every step is a
Catalyst-optimized DataFrame plan; iteration lineage is cut with
localCheckpoint (SURVEY §4 O5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anti_money_laundering_spark.graph.algorithms import (
    label_propagation,
    shortest_paths,
    strongly_connected_components,
    triangle_count,
)
from anti_money_laundering_spark.graph.components import connected_components
from anti_money_laundering_spark.graph.motif import find_motif
from anti_money_laundering_spark.graph.pregel import pagerank, pregel, risk_propagation


@dataclass
class Graph:
    """A property graph: ``vertices`` must carry ``id``; ``edges`` must
    carry ``src`` and ``dst`` (GraphFrames' own convention,
    01_aml_network_analysis.py:109)."""

    vertices: DataFrame
    edges: DataFrame

    def __post_init__(self) -> None:
        if "id" not in self.vertices.columns:
            raise ValueError("vertices DataFrame requires an 'id' column")
        missing = {"src", "dst"} - set(self.edges.columns)
        if missing:
            raise ValueError(f"edges DataFrame missing columns: {sorted(missing)}")

    # -- G2: per-vertex degree (in+out), 01_aml_network_analysis.py:123
    def degrees(self) -> DataFrame:
        """Vertex degree = in + out. One explode + one partial-agg'd
        groupBy; no join against the vertex table needed."""
        return (
            self.edges.select(F.explode(F.array("src", "dst")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))

    # -- G3/O4: degree-1 pruning pre-pass (01_aml_network_analysis.py:119-127)
    def prune_degree_one(self, keep: F.Column | None = None) -> "Graph":
        """Drop degree-1 vertices (optionally except those matching
        ``keep``) before running connected components — the reference's
        graph-size reduction: a degree-1 attribute vertex can't merge
        two components. Edges touching dropped vertices are removed.
        """
        deg = self.degrees()
        cond = F.col("degree") != 1
        if keep is not None:
            cond = cond | keep
        kept = self.vertices.join(deg, "id", "left").filter(F.coalesce(cond, F.lit(False))).drop("degree")
        kept_ids = kept.select("id")
        edges = (
            self.edges.join(kept_ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(kept_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        return Graph(kept, edges)

    def connected_components(self, max_iter: int = 100) -> DataFrame:
        return connected_components(self, max_iter=max_iter)

    def find(self, pattern: str) -> DataFrame:
        return find_motif(self, pattern)

    # -- GraphFrames aggregateMessages parity: the one-shot message
    # primitive Pregel supersteps are built from.
    def aggregate_messages(
        self,
        agg: F.Column,
        to_dst: F.Column | None = None,
        to_src: F.Column | None = None,
    ) -> DataFrame:
        """One round of message passing: for each edge, send ``to_dst``
        to the destination vertex and/or ``to_src`` to the source, then
        aggregate all messages per receiving vertex with ``agg`` (an
        aggregate over the ``msg`` column). Message expressions
        reference ``edge``/``src``/``dst`` structs — e.g.
        ``F.col("edge.amount")``, ``F.col("src.risk")`` (GraphFrames
        AggregateMessages convention).

        Plan shape: edges join vertices (only when a message references
        src/dst attributes), union of the two message directions, one
        partial+final aggregation keyed on vertex id — exactly one
        shuffle beyond the attribute joins.
        """
        if to_dst is None and to_src is None:
            raise ValueError("aggregate_messages: provide to_dst and/or to_src")
        v, e = self.vertices, self.edges
        combined = (
            e.select(F.struct(*e.columns).alias("edge"))
            .join(v.select(F.struct(*v.columns).alias("src")), F.col("edge.src") == F.col("src.id"))
            .join(v.select(F.struct(*v.columns).alias("dst")), F.col("edge.dst") == F.col("dst.id"))
        )
        parts = []
        if to_dst is not None:
            parts.append(combined.select(F.col("dst.id").alias("id"), to_dst.alias("msg")))
        if to_src is not None:
            parts.append(combined.select(F.col("src.id").alias("id"), to_src.alias("msg")))
        msgs = parts[0]
        for p in parts[1:]:
            msgs = msgs.unionByName(p)
        return msgs.groupBy("id").agg(agg.alias("agg_msg"))


__all__ = [
    "Graph",
    "connected_components",
    "find_motif",
    "label_propagation",
    "pagerank",
    "pregel",
    "risk_propagation",
    "shortest_paths",
    "strongly_connected_components",
    "triangle_count",
]
