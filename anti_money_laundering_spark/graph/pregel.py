"""Pregel as an iterative DataFrame loop (SURVEY §2.8 G6).

Replaces GraphFrames' Pregel (01_aml_network_analysis.py:450-459) with
the same superstep decomposition it uses internally: per superstep,

1. **send** — join vertex state onto edges by ``src`` (and/or ``dst``)
   and evaluate the message expression over a ``src``/``edge``/(dst id)
   triplet view;
2. **aggregate** — groupBy receiver id, reduce messages (shuffle);
3. **update** — left-join aggregated messages back onto vertices and
   evaluate the update expression (vertices with no message see NULL,
   so ``coalesce`` implements the reference's keep-old-score rule,
   01:456).

Lineage is cut with localCheckpoint each superstep (SURVEY §4 O5).

Expression conventions: message expressions reference ``src.<col>`` /
``edge.<col>`` / ``dst_id``; the update expression references the
vertex's own columns plus ``msg`` (the aggregated message, NULL when
none arrived).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from anti_money_laundering_spark.graph import Graph


def pregel(
    graph: "Graph",
    state_col: str,
    initial_expr: Column,
    msg_to_dst: Column | None,
    update_expr: Column,
    agg_expr: Column | None = None,
    msg_to_src: Column | None = None,
    max_iter: int = 3,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """Run ``max_iter`` supersteps; returns vertices + ``state_col``.

    ``agg_expr`` defaults to ``sum(msg)`` (the reference's aggMsgs,
    01:458). Messages are Columns over the triplet view (``src.*`` /
    ``edge.*`` structs, ``dst_id``/``src_id``).
    """
    if msg_to_dst is None and msg_to_src is None:
        raise ValueError("at least one of msg_to_dst / msg_to_src is required")
    agg = agg_expr if agg_expr is not None else F.sum(F.col("msg"))

    vcols = graph.vertices.columns
    vertices = graph.vertices.withColumn(state_col, initial_expr)
    vertices = vertices.localCheckpoint(eager=True)
    edges = graph.edges.localCheckpoint(eager=False)
    ecols = edges.columns

    for i in range(max_iter):
        triplets = (
            vertices.select(F.struct(*vertices.columns).alias("src"))
            .join(
                edges.select(F.struct(*ecols).alias("edge")),
                F.col("src.id") == F.col("edge.src"),
            )
            .select("src", "edge", F.col("edge.dst").alias("dst_id"), F.col("edge.src").alias("src_id"))
        )
        parts = []
        if msg_to_dst is not None:
            parts.append(triplets.select(F.col("dst_id").alias("id"), msg_to_dst.alias("msg")))
        if msg_to_src is not None:
            parts.append(triplets.select(F.col("src_id").alias("id"), msg_to_src.alias("msg")))
        msgs = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
        inbox = msgs.filter(F.col("msg").isNotNull()).groupBy("id").agg(agg.alias("msg"))

        vertices = (
            vertices.join(inbox, "id", "left")
            .withColumn(f"__new_{state_col}", update_expr)
            .drop("msg", state_col)
            .withColumnRenamed(f"__new_{state_col}", state_col)
        )
        if (i + 1) % checkpoint_interval == 0:
            vertices = vertices.localCheckpoint(eager=True)
    return vertices.select(*vcols, state_col)


def risk_propagation(graph: "Graph", risk_col: str = "risk", max_iter: int = 3) -> DataFrame:
    """The reference's risk-propagation Pregel, exactly (01:454-459):

    - initial ``risk_score`` = ``risk``;
    - each superstep every vertex sends ``risk_score / 2`` to its
      out-neighbors; receivers sum the messages;
    - update: ``coalesce(msg + risk, risk_score)`` — NOTE the update
      adds the *initial* ``risk``, and vertices with no inbound
      messages keep their previous score (the coalesce fallback).

    Returns the vertex table + final ``risk_score``.
    """
    return pregel(
        graph,
        state_col="risk_score",
        initial_expr=F.col(risk_col),
        msg_to_dst=F.col("src.risk_score") / 2,
        update_expr=F.coalesce(F.col("msg") + F.col(risk_col), F.col("risk_score")),
        agg_expr=F.sum(F.col("msg")),
        max_iter=max_iter,
    )


def pagerank(graph: "Graph", max_iter: int = 3, damping: float = 0.85) -> DataFrame:
    """PageRank on the generic Pregel driver: msg = rank/out_degree to
    out-neighbors, update = (1-d) + d·Σmsg (un-normalized damped form).
    Demonstrates that :func:`pregel` is a reusable superstep engine,
    not a risk-propagation one-off — same shuffles (send join +
    receive agg per round), same checkpoint cadence.

    Returns the vertex table + ``pagerank``. Vertices with no
    out-edges contribute nothing (no sink redistribution) — matching
    the unrolled-SQL oracle in plans/graph_queries.py.
    """
    from anti_money_laundering_spark.graph import Graph

    # internal column name: a caller-supplied out_degree column must not
    # collide (duplicate struct fields make src.<col> ambiguous)
    outd = graph.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("__pr_outd"))
    vertices = (
        graph.vertices.join(outd, "id", "left")
        .select(*graph.vertices.columns, F.coalesce("__pr_outd", F.lit(0)).alias("__pr_outd"))
    )
    out = pregel(
        Graph(vertices, graph.edges),
        state_col="pagerank",
        initial_expr=F.lit(1.0),
        # try_divide: Catalyst pushes this projection below the triplet
        # join, where zero-out-degree vertices still exist — under ANSI
        # a plain `/` then raises; NULL messages are filtered anyway
        msg_to_dst=F.try_divide(F.col("src.pagerank"), F.col("src.__pr_outd")),
        update_expr=F.lit(1.0 - damping) + F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0.0)),
        agg_expr=F.sum(F.col("msg")),
        max_iter=max_iter,
    )
    return out.drop("__pr_outd")
