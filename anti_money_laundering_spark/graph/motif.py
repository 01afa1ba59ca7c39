"""Motif pattern compiler: GraphFrames-style ``find`` as a join chain
(SURVEY §2.8 G5).

The reference expresses structuring fan-in and round-trip detection as
motif patterns (01_aml_network_analysis.py:308-311, :376-379):

    "(a)-[e1]->(b); (b)-[e2]->(c)"            # chain
    "(a)-[e1]->(b); (b)-[e2]->(a)"            # cycle
    "(a)-[]->(b); !(b)-[]->(a)"               # negated term

This compiler parses the pattern into an ordered chain of equi-joins
over the edge table — exactly what GraphFrames' Scala motif planner
emits — then struct-packs each *named* vertex/edge so the result schema
matches GraphFrames' (columns ``a``, ``e1``, ... of struct type,
accessed as ``col("a.id")``, expanded via ``selectExpr("a.*")``).

Semantics (matching GraphFrames):
- named vertex variables unify across terms; anonymous ``()`` are
  fresh existentials each time;
- named edge variables must be unique; anonymous ``[]`` edges are
  unconstrained;
- morphism semantics: distinct variables MAY bind the same graph
  element (GraphFrames does not enforce vertex distinctness — add
  explicit filters like ``col("a.id") != col("c.id")`` when needed);
- ``!(x)-[]->(y)`` = no edge x→y (left-anti join); both endpoints must
  already be bound by positive terms, and negated edges cannot be named.

Scale: each term adds one equi-join keyed on the shared vertex var;
Catalyst/AQE order and size the joins (broadcast for tiny edge subsets,
sort-merge otherwise). Nothing is materialized until the caller acts.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from anti_money_laundering_spark.graph import Graph

_TERM_RE = re.compile(r"^(?P<neg>!?)\((?P<src>\w*)\)-\[(?P<edge>\w*)\]->\((?P<dst>\w*)\)$")


def _parse(pattern: str) -> list[dict]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"cannot parse motif term: {raw!r}")
        terms.append(
            {
                "neg": m.group("neg") == "!",
                "src": m.group("src") or None,
                "edge": m.group("edge") or None,
                "dst": m.group("dst") or None,
            }
        )
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find_motif(
    graph: "Graph",
    pattern: str,
    max_vertex_degree: int | None = None,
    cache_hub_ids: bool = True,
) -> DataFrame:
    """Compile ``pattern`` against ``graph`` into a DataFrame whose
    columns are structs for each named vertex/edge variable, in order
    of first appearance (GraphFrames-compatible output shape).

    ``max_vertex_degree`` is the super-hub guard (the knob GraphFrames
    lacks): when set, matches routed through a CHAIN vertex — a named
    vertex variable joining two or more positive terms — whose total
    degree (in + out) exceeds the cap are excluded STRUCTURALLY, by
    anti-joining each term's edge feed against the hub-id set before
    the pair join ever forms. A chain vertex with in-degree d_i and
    out-degree d_o multiplies d_i*d_o intermediate rows (measured:
    one 30k-in-degree vertex adds 900M pairs, SCALE.md §motif), so at
    100 TB an uncapped fan-in pattern on a retail-bank hub is the #1
    scale killer; endpoint-only variables contribute linearly and are
    deliberately NOT capped. Recall contract: 1.0 for every match
    whose chain vertices all have degree <= cap; matches through
    larger hubs are dropped (cap or pre-aggregate those separately —
    a 100k-degree hub is an institution, not a mule). The hub-id set
    is bounded by 2|E|/cap rows, so it broadcasts.

    Default ``None`` leaves the plan byte-identical to the unguarded
    compiler. ``cache_hub_ids=False`` skips the hub table's lazy
    persist for callers that guard MANY distinct graphs in one session
    (each persist is a session-lifetime cache entry); the trade is one
    degree recomputation per positive term (measured +2.7 s at
    10M edges / 30k hub) — and it additionally assumes the edge
    lineage is RERUN-DETERMINISTIC: without the cache each term's
    anti-join recomputes the hub set independently, so a
    non-deterministic edge source (sample(), limit, a live read) could
    filter different terms against different hub snapshots within one
    action (review finding). The cached default pins one snapshot."""
    terms = _parse(pattern)
    edge_cols = graph.edges.columns
    vertex_cols = graph.vertices.columns

    # --- super-hub guard: ids with in+out degree > cap (small: <=
    # 2|E|/cap rows), anti-joined against each term's edge feed on the
    # CHAIN variables only; broadcast by size at join time. The shared
    # hub table is a lazy PERSIST, not a localCheckpoint (r11 review
    # finding): under AQE even a lazy checkpoint's toRdd executes the
    # upstream stages, so a guarded query could never be plan-built
    # silently (the repo-wide plan-builder rule) — while a cache marks
    # lazily (zero jobs at construction) and still computes the degree
    # aggregation ONCE at first action instead of once per term
    # (measured at 10M edges/30k hub: per-term recompute cost +2.7 s
    # on the capped wall). The cached table is bounded at 2|E|/cap
    # rows and LRU-evictable; no unpersist hook is needed at that
    # size.
    hub_ids: DataFrame | None = None
    chain_vars: set[str] = set()
    if max_vertex_degree is not None:
        occurrences: dict[str, int] = {}
        for t in terms:
            if t["neg"]:
                continue  # anti-joins never multiply rows
            for v in {t["src"], t["dst"]} - {None}:
                occurrences[v] = occurrences.get(v, 0) + 1
        chain_vars = {v for v, n in occurrences.items() if n >= 2}
        if chain_vars:
            # Graph.degrees() is the ONE degree definition (G2): in+out
            # with self-loops/parallel edges counted per edge row —
            # reusing it keeps the guard's notion of "degree" from
            # drifting against the public API's (review finding).
            hub_ids = (
                graph.degrees()
                .filter(F.col("degree") > F.lit(max_vertex_degree))
                .select(F.col("id").alias("__hub_id"))
            )
            if cache_hub_ids:
                # each persist leaves a session-lifetime CacheManager
                # ENTRY (blocks are LRU-evictable, the entry is not) —
                # one per (graph, cap) pair. Callers looping over many
                # distinct graphs (stress sweeps, per-request services)
                # pass cache_hub_ids=False and pay per-term degree
                # recomputation instead (review finding).
                hub_ids = hub_ids.persist()

    named_order: list[str] = []  # output column order (first appearance)
    bound: set[str] = set()  # bound vertex vars
    seen_edges: set[str] = set()
    anon_count = 0
    result: DataFrame | None = None

    def fresh_anon() -> str:
        nonlocal anon_count
        anon_count += 1
        return f"__anon{anon_count}"

    for t in terms:
        src = t["src"] or fresh_anon()
        dst = t["dst"] or fresh_anon()
        if t["neg"]:
            if t["edge"]:
                raise ValueError("negated motif edges cannot be named")
            if src.startswith("__anon") or dst.startswith("__anon"):
                raise ValueError("negated motif terms require named vertices")
            if result is None or src not in bound or dst not in bound:
                raise ValueError("negated terms must follow positive terms binding both vertices")
            anti = graph.edges.select(F.col("src").alias("__n_src"), F.col("dst").alias("__n_dst"))
            result = result.join(
                anti,
                (F.col(f"__v_{src}") == F.col("__n_src")) & (F.col(f"__v_{dst}") == F.col("__n_dst")),
                "left_anti",
            )
            continue

        edge_var = t["edge"]
        if edge_var:
            if edge_var in seen_edges:
                raise ValueError(f"duplicate edge variable: {edge_var}")
            seen_edges.add(edge_var)
        term_df = graph.edges.select(
            F.col("src").alias("__t_src"),
            F.col("dst").alias("__t_dst"),
            F.struct(*edge_cols).alias("__t_edge"),
        )
        if hub_ids is not None:
            # drop hub-incident edges BEFORE this term joins the chain:
            # the d_in*d_out blowup never forms (column names are
            # disjoint, so the shared-lineage self-join is unambiguous)
            if src in chain_vars:
                term_df = term_df.join(
                    hub_ids, F.col("__t_src") == F.col("__hub_id"), "left_anti"
                )
            if dst in chain_vars and dst != src:
                term_df = term_df.join(
                    hub_ids, F.col("__t_dst") == F.col("__hub_id"), "left_anti"
                )
        if result is None:
            if src == dst:  # self-loop term (a)-[]->(a)
                result = term_df.filter(F.col("__t_src") == F.col("__t_dst")).select(
                    F.col("__t_src").alias(f"__v_{src}"), F.col("__t_edge")
                )
            else:
                result = term_df.select(
                    F.col("__t_src").alias(f"__v_{src}"),
                    F.col("__t_dst").alias(f"__v_{dst}"),
                    F.col("__t_edge"),
                )
        else:
            conds = []
            if src in bound:
                conds.append(F.col(f"__v_{src}") == term_df["__t_src"])
            if dst in bound and dst != src:
                conds.append(F.col(f"__v_{dst}") == term_df["__t_dst"])
            if src == dst:
                conds.append(term_df["__t_src"] == term_df["__t_dst"])
            if conds:
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                result = result.join(term_df, cond)
            else:
                result = result.crossJoin(term_df)
            sel = [result[c] for c in result.columns if c != "__t_src" and c != "__t_dst" and c != "__t_edge"]
            if src not in bound:
                sel.append(F.col("__t_src").alias(f"__v_{src}"))
            if dst not in bound and dst != src:
                sel.append(F.col("__t_dst").alias(f"__v_{dst}"))
            sel.append(F.col("__t_edge"))
            result = result.select(*sel)

        if edge_var:
            result = result.withColumnRenamed("__t_edge", f"__e_{edge_var}")
        else:
            result = result.drop("__t_edge")

        for v in (src, dst):
            bound.add(v)
            if not v.startswith("__anon") and v not in named_order:
                named_order.append(v)
        if edge_var:
            named_order.append(edge_var)

    assert result is not None
    # Attach vertex attribute structs for named vertex vars.
    #
    # id-only fast path (r13 optimization round, guide §2.4 "remove
    # shuffles outright"): when the vertex table carries NOTHING but
    # ``id``, the per-variable join adds no attributes, and under the
    # Graph contract (unique vertex ids; edges' endpoints ⊆ vertices —
    # the same endpoint-closure invariant aggregate_messages and the
    # CC round-1 specialization trust) it can neither drop nor
    # multiply matches: every binding IS an edge endpoint, so the
    # inner join on a distinct id-only table matches exactly once.
    # Each named vertex var therefore saves one join (and, for derived
    # vertex tables like flow_graph's endpoints-union-distinct, one
    # full re-derivation of that subtree per variable — the fan-in
    # screen carried FOUR copies). The struct is built directly from
    # the binding column instead.
    id_only = vertex_cols == ["id"]
    out_cols: list = []
    for var in named_order:
        if var in seen_edges:
            out_cols.append(F.col(f"__e_{var}").alias(var))
            continue
        if id_only:
            out_cols.append(F.struct(F.col(f"__v_{var}").alias("id")).alias(var))
            continue
        vstruct = graph.vertices.select(
            F.col("id").alias(f"__vid_{var}"), F.struct(*vertex_cols).alias(var)
        )
        result = result.join(vstruct, F.col(f"__v_{var}") == F.col(f"__vid_{var}"))
        out_cols.append(F.col(var))
    return result.select(*out_cols)
