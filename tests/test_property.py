"""Property-based tests (hypothesis): custom operators checked against
independent in-Python oracles on randomized inputs — the corner-case
net that fixed fixtures can't cast (empty groups, ties, singletons,
self-loops, duplicate timestamps).

Examples are kept small (each runs Spark jobs); determinism comes from
hypothesis' own example database being disabled and derandomize=True.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# --- connected components vs union-find ------------------------------------

edges_strategy = st.lists(
    st.tuples(st.integers(1, 30), st.integers(1, 30)), min_size=1, max_size=60
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    label = {}
    for v in list(parent):
        r = find(v)
        label[v] = min(label.get(r, r), r)
        label[r] = label[v]
    return {v: find(v) for v in parent}, find


@settings(**SETTINGS)
@given(edges=edges_strategy)
def test_cc_matches_union_find(spark, edges):
    from anti_money_laundering_spark.graph import Graph

    verts = sorted({v for e in edges for v in e})
    g = Graph(
        spark.createDataFrame([(v,) for v in verts], "id long"),
        spark.createDataFrame(edges, "src long, dst long"),
    )
    got = {r.id: r.component for r in g.connected_components().collect()}
    # oracle: min vertex id reachable via union-find with path compression
    parent, find = _union_find(edges)
    roots = {}
    for v in verts:
        r = find(v)
        roots.setdefault(r, []).append(v)
    expect = {v: min(roots[find(v)]) for v in verts}
    assert got == expect


# --- as-of join vs pandas merge_asof ---------------------------------------

series_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 1)),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(rows=series_strategy)
def test_asof_matches_pandas_merge_asof(spark, rows):
    from anti_money_laundering_spark.operators import asof_join

    # split rows into left(points)/right(observations); dedupe (key, t)
    # on the right because merge_asof keeps the LAST of equal
    # timestamps while the window fill keeps the last in sort order —
    # both are tie-arbitrary, so only unique (key,t) is comparable
    left = [(k, t) for k, t, side in rows if side == 0]
    right_d = {(k, t): (k, t, float(k * 100 + t)) for k, t, side in rows if side == 1}
    right = list(right_d.values())
    if not left or not right:
        return
    ldf = spark.createDataFrame(
        [(k, (pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t)).to_pydatetime()) for k, t in left],
        "k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, (pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t)).to_pydatetime(), v) for k, t, v in right],
        "k long, ts timestamp, obs double",
    )
    got = {
        (r.k, r.ts): r.obs_matched
        for r in asof_join(ldf, rdf, by=["k"], right_cols=["obs"], how="left").collect()
    }
    lp = pd.DataFrame(left, columns=["k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "t", "obs"]).sort_values("t", kind="stable")
    lp["ts"] = pd.Timestamp(2024, 1, 1) + pd.to_timedelta(lp["t"], unit="s")
    rp["ts"] = pd.Timestamp(2024, 1, 1) + pd.to_timedelta(rp["t"], unit="s")
    exp = pd.merge_asof(lp, rp[["k", "ts", "obs"]], on="ts", by="k", direction="backward")
    # left rows may repeat (same key+ts): compare as sets of (k, ts, obs)
    exp_map = {}
    for _, row in exp.iterrows():
        exp_map[(row.k, row.ts.to_pydatetime())] = None if pd.isna(row.obs) else row.obs
    assert got == exp_map


# --- prefix-filtered Jaccard == brute force --------------------------------

# small vocab + short docs force heavy token overlap, exercising the
# prefix-filter rank boundary and the size-ratio pruning edge cases
docs_strategy = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
    min_size=2,
    max_size=12,
)


@settings(**SETTINGS)
@given(token_lists=docs_strategy, thresh=st.sampled_from([0.34, 0.5, 0.75]))
def test_prefix_filter_jaccard_matches_bruteforce(spark, token_lists, thresh):
    from anti_money_laundering_spark.dedup import jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(docs, "doc_id", "text", min_jaccard=thresh).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(token_lists)}
    expect = {}
    for a in sets:
        for b in sets:
            if a < b:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= thresh:
                    expect[(a, b)] = round(j, 9)
    assert got == expect


# --- salted join == plain join ---------------------------------------------

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=40
)


@settings(**SETTINGS)
@given(lrows=pairs_strategy, rrows=pairs_strategy, salt=st.integers(1, 5))
def test_salted_join_equals_plain_join(spark, lrows, rrows, salt):
    from anti_money_laundering_spark.operators import salted_join

    if not lrows or not rrows:
        return
    ldf = spark.createDataFrame(lrows, "k long, lv long")
    rdf = spark.createDataFrame(rrows, "k long, rv long")
    plain = sorted((r.k, r.lv, r.rv) for r in ldf.join(rdf, "k").collect())
    got = sorted((r.k, r.lv, r.rv) for r in salted_join(ldf, rdf, on=["k"], salt=salt).collect())
    assert got == plain


# --- merge_into vs dict-based reference ------------------------------------

merge_target_strategy = st.lists(
    st.tuples(st.integers(1, 20), st.integers(0, 99)),
    min_size=0, max_size=20, unique_by=lambda t: t[0],
)
merge_source_strategy = st.lists(
    st.tuples(st.integers(1, 25), st.integers(0, 99), st.booleans()),
    min_size=0, max_size=20, unique_by=lambda t: t[0],
)


@settings(**SETTINGS)
@given(tgt=merge_target_strategy, src=merge_source_strategy)
def test_merge_into_matches_dict_semantics(spark, tgt, src):
    """merge_into == the obvious dict program: matched keys update (or
    delete when flagged), unmatched source keys insert (minus deletes),
    untouched target keys survive."""
    from anti_money_laundering_spark.operators import merge_into

    # Like Delta, the delete clause fires only on MATCH; an unmatched
    # delete-flagged row would be inserted by whenNotMatchedInsertAll,
    # so a CDC feed drops unmatched deletes before merging (Delta users
    # condition the insert clause the same way). Mirror that here.
    tgt_keys = {k for k, _ in tgt}
    src = [(k, v, d) for k, v, d in src if not d or k in tgt_keys]

    expect = {k: v for k, v in tgt}
    for k, v, is_del in src:
        if is_del:
            expect.pop(k, None)
        else:
            expect[k] = v
    t_df = spark.createDataFrame(tgt, "id long, val long")
    s_df = spark.createDataFrame(src, "id long, val long, is_del boolean")
    got = {
        r.id: r.val
        for r in merge_into(
            t_df, s_df, on=["id"], matched_delete=F.col("is_del")
        ).collect()
    }
    assert got == expect


# --- rolling median vs numpy ------------------------------------------------

values_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.floats(-100, 100, allow_nan=False, width=32)),
    min_size=1,
    max_size=40,
)


@given(rows=values_strategy)
@settings(**SETTINGS)
def test_rolling_median_matches_numpy(spark, rows):
    """features.rolling_median equals numpy's median over every
    trailing 5-row frame, including the short frames at each partition
    head (even-count interpolation)."""
    import numpy as np

    from anti_money_laundering_spark.features import rolling_median

    df = spark.createDataFrame(
        [(i, int(u), float(v)) for i, (u, v) in enumerate(rows)], "seq int, u int, v double"
    )
    med = rolling_median(key="u", value="v", order_by=["seq"], frame_rows=5)
    got = {r["seq"]: r["m"] for r in df.select("seq", med.alias("m")).collect()}

    by_u: dict[int, list[tuple[int, float]]] = {}
    for i, (u, v) in enumerate(rows):
        by_u.setdefault(int(u), []).append((i, float(v)))
    for u, items in by_u.items():
        items.sort()
        for j, (seq, _) in enumerate(items):
            frame = [v for _, v in items[max(0, j - 4) : j + 1]]
            assert abs(got[seq] - float(np.median(frame))) < 1e-9, (u, seq, frame)


# --- profile_table vs pandas -------------------------------------------------

profile_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=profile_strategy)
@settings(**SETTINGS)
def test_profile_table_matches_pandas(spark, rows):
    from anti_money_laundering_spark.operators import profile_table

    df = spark.createDataFrame(rows, "k int, s string")
    pdf = pd.DataFrame(rows, columns=["k", "s"])
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    for c in ["k", "s"]:
        assert prof[c]["n_rows"] == len(pdf)
        assert prof[c]["n_non_null"] == int(pdf[c].notna().sum())
        assert prof[c]["n_distinct"] == int(pdf[c].nunique())
        if pdf[c].notna().any():
            # pandas promotes int columns with NaN to float ('0.0');
            # Spark keeps the declared int type ('0') — cast back.
            cast = (lambda v: str(int(v))) if c == "k" else str
            assert prof[c]["min_value"] == cast(pdf[c].dropna().min())
            assert prof[c]["max_value"] == cast(pdf[c].dropna().max())
        else:
            assert prof[c]["min_value"] is None and prof[c]["max_value"] is None


# --- SCD2 interval invariants ------------------------------------------------

scd2_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.sampled_from(["a", "b", "c"])),
    min_size=1,
    max_size=25,
)


@given(rows=scd2_strategy)
@settings(**SETTINGS)
def test_scd2_intervals_partition_the_timeline(spark, rows):
    """For every key: intervals are ordered and non-overlapping
    (valid_to = next valid_from), exactly one open interval (the
    current row), statuses alternate (no two consecutive intervals
    share a status), and replaying the intervals classifies every
    source event to the status it carried."""
    from anti_money_laundering_spark.features import scd2

    df = spark.createDataFrame(
        [(i, k, t, s) for i, (k, t, s) in enumerate(rows)],
        "event_id int, user_id int, ts int, status string",
    )
    out = scd2(df, key="user_id", status="status", ts="ts", tiebreak="event_id").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    for key, ivs in by_key.items():
        ivs.sort(key=lambda r: (r["valid_from"] is None, r["valid_from"]))
        opens = [r for r in ivs if r["valid_to"] is None]
        assert len(opens) == 1, f"key {key}: {len(opens)} open intervals"
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], f"key {key}: gap/overlap"
            assert a["status"] != b["status"], f"key {key}: un-collapsed run"
    # replay: each source event's ts falls in an interval with its
    # status — except AMBIGUOUS instants (several distinct statuses at
    # the same (key, ts)), where SCD2 semantics let the last-by-tiebreak
    # status own the instant and earlier same-instant events are
    # legitimately overwritten with a zero-width residence
    multi = {}
    for k, t, s in rows:
        multi.setdefault((k, t), set()).add(s)
    for i, (k, t, s) in enumerate(rows):
        if len(multi[(k, t)]) > 1:
            continue
        ivs = by_key[k]
        hits = [
            r
            for r in ivs
            if r["valid_from"] <= t and (r["valid_to"] is None or t < r["valid_to"])
        ]
        assert any(h["status"] == s for h in hits), (k, t, s, ivs)


# --- cap_per_group stability -------------------------------------------------

cap_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=30, unique=True
)


@given(rows=cap_strategy)
@settings(**SETTINGS)
def test_cap_per_group_bound_and_superset_stability(spark, rows):
    """Per-group bound holds, and survivors are STABLE under data
    growth: capping a superset never evicts a row that ranked inside
    the cap of the subset unless a new row hash-ranks above it —
    concretely, cap(subset) ⊇ cap(superset) ∩ subset is false in
    general, but the md5 ORDER is data-independent, so
    cap(subset, k) equals the first k of the subset in the SAME global
    md5 order as the superset."""
    from anti_money_laundering_spark.features import cap_per_group

    df = spark.createDataFrame(rows, "g int, id int")
    k = 3
    capped = cap_per_group(df, group="g", key="id", max_rows=k)
    got = {}
    for r in capped.collect():
        got.setdefault(r["g"], set()).add(r["id"])
    import hashlib

    by_g: dict[int, list[int]] = {}
    for g, i in rows:
        by_g.setdefault(g, []).append(i)
    for g, ids in by_g.items():
        order = sorted(ids, key=lambda i: (hashlib.md5(f"cap-v1{i}".encode()).hexdigest(), i))
        assert got.get(g, set()) == set(order[:k]), g


# --- repetition scores vs pure-Python oracle --------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@given(token_docs=docs_strategy)
@settings(**SETTINGS)
def test_repetition_scores_match_python_oracle(spark, token_docs):
    """curation.repetition_scores equals a direct Counter-based oracle
    on random small token docs — including empty docs (0 tokens, share
    0), singletons (no bigrams), and all-same-token spam."""
    from collections import Counter

    from anti_money_laundering_spark.curation import repetition_scores

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_scores(df).collect()}
    for i, toks in enumerate(token_docs):
        r = got[i]
        assert r.n_tokens == len(toks)
        if toks:
            exp_share = Counter(toks).most_common(1)[0][1] / len(toks)
        else:
            exp_share = 0.0
        assert abs(r.top_token_share - exp_share) < 1e-9, (i, toks)
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        exp_dup = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
        assert abs(r.dup_2gram_frac - exp_dup) < 1e-9, (i, toks)


# --- motif compiler vs brute-force pattern matching -------------------------

digraph_strategy = st.lists(
    st.tuples(st.integers(1, 7), st.integers(1, 7)), min_size=1, max_size=14
)


@given(edges=digraph_strategy)
@settings(**SETTINGS)
def test_motif_chain_and_negation_match_bruteforce(spark, edges):
    """The motif compiler's join chains equal a brute-force enumeration
    over the edge set for (a)->(b)->(c) and the negated
    (a)->(b); !(b)->(a) — including self-loops and repeated vertices.
    Morphism semantics (GraphFrames): distinct variables MAY bind the
    same vertex or edge — a self-loop matches a->b->c as (v,v,v)."""
    from anti_money_laundering_spark.graph import Graph

    e = spark.createDataFrame(edges, "src long, dst long").distinct()
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    g = Graph(v, e)
    eset = set((a, b) for a, b in edges)

    got_chain = {
        (r["a"]["id"], r["b"]["id"], r["c"]["id"])
        for r in g.find("(a)-[e1]->(b); (b)-[e2]->(c)").collect()
    }
    exp_chain = {
        (a, b, c) for (a, b) in eset for (b2, c) in eset if b2 == b
    }
    assert got_chain == exp_chain

    got_neg = {
        (r["a"]["id"], r["b"]["id"])
        for r in g.find("(a)-[]->(b); !(b)-[]->(a)").collect()
    }
    exp_neg = {(a, b) for (a, b) in eset if (b, a) not in eset}
    assert got_neg == exp_neg


# --- SCC vs iterative Tarjan oracle -----------------------------------------


def _scc_oracle(edges):
    """Iterative Tarjan; returns {vertex: min vertex id of its SCC}."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        verts.update((a, b))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return out


@given(edges=digraph_strategy)
@settings(**SETTINGS)
def test_scc_matches_tarjan(spark, edges):
    """FW-BW-Trim SCC equals an independent Tarjan on random small
    digraphs (cycles, self-loops, chains, diamonds)."""
    from anti_money_laundering_spark.graph import Graph, strongly_connected_components

    e = spark.createDataFrame(edges, "src long, dst long")
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(Graph(v, e)).collect()
    }
    assert got == _scc_oracle(edges)


# --- Pregel risk propagation vs Python superstep simulation -----------------


@given(
    edges=digraph_strategy,
    risks=st.lists(st.integers(0, 16), min_size=7, max_size=7),
)
@settings(**SETTINGS)
def test_risk_propagation_matches_python_simulation(spark, edges, risks):
    """risk_propagation equals a direct per-superstep simulation on
    random digraphs — pinning the reference's exact update rule
    (msg = score/2 summed per receiver over the RAW edge table —
    duplicate edges send twice; update = coalesce(msg + INITIAL risk,
    previous score): no-inbox vertices keep their score)."""
    from anti_money_laundering_spark.graph import Graph, risk_propagation

    e = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({x for ab in edges for x in ab})
    risk = {u: float(risks[u - 1]) for u in verts}
    v = spark.createDataFrame([(u, risk[u]) for u in verts], "id long, risk double")
    got = {r.id: r.risk_score for r in risk_propagation(Graph(v, e)).collect()}

    score = dict(risk)
    for _ in range(3):
        inbox: dict[int, float] = {}
        # multigraph semantics: EVERY edge row sends a message —
        # duplicate edges double the contribution (matches
        # GraphFrames aggregateMessages over the raw edge table)
        for a, b in edges:
            inbox[b] = inbox.get(b, 0.0) + score[a] / 2
        score = {
            u: (inbox[u] + risk[u]) if u in inbox else score[u] for u in verts
        }
    for u in verts:
        assert abs(got[u] - score[u]) < 1e-9, (u, got[u], score[u])


# --- k-core vs Python peeling oracle ----------------------------------------


@given(edges=digraph_strategy)
@settings(**SETTINGS)
def test_k_core_matches_python_peel(spark, edges):
    from anti_money_laundering_spark.graph import Graph
    from anti_money_laundering_spark.graph.algorithms import k_core

    e = spark.createDataFrame(edges, "src long, dst long")
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    k = 2
    got = {r.id for r in k_core(Graph(v, e), k=k).collect()}

    # undirected simple graph, iterative peel
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    alive = {x for ab in und for x in ab}
    while True:
        deg: dict[int, int] = {}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        drop = {u for u in alive if deg.get(u, 0) < k}
        if not drop:
            break
        alive -= drop
    assert got == alive


# --- label propagation vs Python sync simulation ----------------------------


@given(edges=digraph_strategy)
@settings(**SETTINGS)
def test_label_propagation_matches_python_sync(spark, edges):
    """Deterministic sync LPA: every vertex adopts the most frequent
    undirected-neighbor label, ties to the SMALLER label, 3 fixed
    rounds — a pure function of the edge set the Python sim replays."""
    from collections import Counter

    from anti_money_laundering_spark.graph import Graph, label_propagation

    e = spark.createDataFrame(edges, "src long, dst long")
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    got = {r.id: r.label for r in label_propagation(Graph(v, e), max_iter=3).collect()}

    und: dict[int, list[int]] = {}
    for a, b in {tuple(sorted(p)) for p in edges if p[0] != p[1]}:
        und.setdefault(a, []).append(b)
        und.setdefault(b, []).append(a)
    verts = sorted({x for ab in edges for x in ab})
    label = {u: u for u in verts}
    for _ in range(3):
        nxt = {}
        for u in verts:
            nbrs = und.get(u, [])
            if not nbrs:
                nxt[u] = label[u]
                continue
            counts = Counter(label[w] for w in nbrs)
            best = max(counts.values())
            nxt[u] = min(l for l, c in counts.items() if c == best)
        label = nxt
    assert got == label


# --- versioned table vs in-memory model (model-based testing) ---------------

op_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=4)),
        st.tuples(st.just("overwrite"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=0, max_size=4)),
        st.tuples(st.just("merge"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=4)),
        st.tuples(st.just("restore"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=op_strategy)
@settings(**SETTINGS)
def test_versioned_table_matches_model(spark, ops):
    """Model-based test: a random op sequence (append / overwrite /
    merge / restore) applied to VersionedTable and to a plain Python
    model of version→rows must agree on EVERY retained version's
    content — snapshot isolation, merge upsert, and restore sharing
    all fall out of one invariant. Merge sources are deduped by key
    first (merge_into validates source uniqueness); appends replay as
    bags (duplicate keys allowed)."""
    import os as _os
    import tempfile as _tf

    from collections import Counter

    from anti_money_laundering_spark.sources.versioned import VersionedTable

    t = VersionedTable(_os.path.join(_tf.mkdtemp(prefix="vtbl_model_"), "t"))
    model: dict[int, Counter] = {}  # version -> multiset of (k, v)

    def df_of(rows):
        return spark.createDataFrame(rows or [], "k int, v int")

    head = Counter()
    for op, arg in ops:
        if op == "append":
            head = head + Counter(arg)
            v = t.write(df_of(arg))
        elif op == "overwrite":
            head = Counter(arg)
            v = t.write(df_of(arg), mode="overwrite")
        elif op == "merge":
            src = {k: val for k, val in arg}  # dedupe: last wins, like dict
            if not model:
                continue  # merging into an empty table: skip (read() raises)
            # model semantics of merge_into: update matched keys, insert new
            merged = Counter()
            seen = set()
            for (k, val), n in head.items():
                if k in src:
                    merged[(k, src[k])] += n
                    seen.add(k)
                else:
                    merged[(k, val)] += n
            for k, val in src.items():
                if k not in seen:
                    merged[(k, val)] += 1
            head = merged
            v = t.merge(spark, df_of(sorted(src.items())), on=["k"])
        else:  # restore
            if arg not in model:
                continue
            head = Counter(model[arg])
            v = t.restore(arg)
        model[v] = Counter(head)

    for v, expect in model.items():
        got = Counter((r.k, r.v) for r in t.read(spark, version=v).collect())
        assert got == expect, (v, got, expect)


# --- shortest paths / triangle count vs Python oracles ----------------------


@given(edges=digraph_strategy)
@settings(**SETTINGS)
def test_shortest_paths_match_python_bfs(spark, edges):
    """Landmark shortest paths equal a directed Python BFS from every
    vertex toward the landmarks (distances follow edge DIRECTION;
    unreachable pairs absent)."""
    from collections import deque

    from anti_money_laundering_spark.graph import Graph, shortest_paths

    e = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({x for ab in edges for x in ab})
    landmarks = verts[:2]
    v = spark.createDataFrame([(u,) for u in verts], "id long")
    got = {
        (r.id, r.landmark): r.distance
        for r in shortest_paths(Graph(v, e), landmarks).collect()
    }

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    exp = {}
    for lm in landmarks:
        # reverse BFS from the landmark over reversed edges = forward
        # distance from every vertex TO the landmark
        radj: dict[int, set[int]] = {}
        for a, b in edges:
            radj.setdefault(b, set()).add(a)
        dist = {lm: 0}
        dq = deque([lm])
        while dq:
            u = dq.popleft()
            for w in radj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        for u, d in dist.items():
            exp[(u, lm)] = d
    assert got == exp


@given(edges=digraph_strategy)
@settings(**SETTINGS)
def test_triangle_count_matches_python(spark, edges):
    """Per-vertex triangle counts equal brute-force enumeration over
    the canonical undirected simple graph (direction + multiplicity
    collapse, self-loops dropped)."""
    from itertools import combinations

    from anti_money_laundering_spark.graph import Graph, triangle_count

    e = spark.createDataFrame(edges, "src long, dst long")
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    got = {r.id: r.n_triangles for r in triangle_count(Graph(v, e)).collect()}

    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    verts = sorted({x for ab in edges for x in ab})
    tri = {u: 0 for u in verts}
    for a, b, c in combinations(verts, 3):
        if ((a, b) in und) and ((b, c) in und) and ((a, c) in und):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    assert got == tri


# --- EWMA truncation bound vs exact recurrence -------------------------------


@given(
    vals=st.lists(st.floats(0.0, 100.0, allow_nan=False), min_size=1, max_size=30)
)
@settings(**SETTINGS)
def test_ewma_truncation_bound_vs_exact_recurrence(spark, vals):
    """features.ewma truncates the lag chain at max_lags; its docstring
    claims the residual mass (1-alpha)^max_lags bounds the
    approximation. Pin it: |truncated - exact recurrence| <=
    (1-alpha)^max_lags * max|value| on random non-negative series
    (the exact EWMA is a convex combination, so dropped tail weight
    times the value bound majorizes the error)."""
    from anti_money_laundering_spark.features import ewma

    alpha, max_lags = 0.3, 12
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, seq int, v double")
    e = ewma(key="k", value="v", order_by=["seq"], alpha=alpha, max_lags=max_lags)
    got = {r.seq: r.e for r in df.select("seq", e.alias("e")).collect()}

    bound = (1 - alpha) ** max_lags * max(vals)
    # exact normalized EWMA over the full history at position t:
    # sum_j (1-a)^j v[t-j] / sum_j (1-a)^j
    for t in range(len(vals)):
        num = sum((1 - alpha) ** j * vals[t - j] for j in range(t + 1))
        den = sum((1 - alpha) ** j for j in range(t + 1))
        assert abs(got[t] - num / den) <= bound + 1e-9, (t, got[t], num / den)


# --- range join vs brute-force interval containment -------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50000)), min_size=1, max_size=15
    ),
    ivs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50000), st.integers(0, 9000)),
        min_size=1,
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_range_join_matches_bruteforce(spark, pts, ivs):
    """Bucketized range_join equals the brute-force containment join
    on random points/intervals — including intervals spanning multiple
    buckets, zero-length intervals (empty [lo, lo)), and bucket-edge
    points."""
    import datetime as dtt

    from anti_money_laundering_spark.operators import range_join

    base = dtt.datetime(2024, 1, 1)

    def ts(s):
        return base + dtt.timedelta(seconds=s)

    ldf = spark.createDataFrame(
        [(k, ts(s), i) for i, (k, s) in enumerate(pts)], "k int, p timestamp, pid int"
    )
    rdf = spark.createDataFrame(
        [(k, ts(s), ts(s + d), j) for j, (k, s, d) in enumerate(ivs)],
        "k int, lo timestamp, hi timestamp, iid int",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            ldf, rdf, by=["k"], point="p", lo="lo", hi="hi",
            bucket_width_seconds=3600,
        ).collect()
    }
    exp = {
        (i, j)
        for i, (pk, psec) in enumerate(pts)
        for j, (ik, isec, d) in enumerate(ivs)
        if pk == ik and isec <= psec < isec + d
    }
    assert got == exp


# --- dense_index vs sorted-enumerate oracle ---------------------------------


@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=80, unique=True),
    parts=st.integers(1, 9),
)
@settings(**SETTINGS)
def test_dense_index_equals_sorted_enumerate(spark, keys, parts):
    from anti_money_laundering_spark.sampling import dense_index

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["__idx"]
        for r in dense_index(df.repartition(3), "k", num_partitions=parts).collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=80, unique=True),
    width=st.integers(1, 50),
)
@settings(**SETTINGS)
def test_dense_index_lazy_equals_sorted_enumerate(spark, keys, width):
    # r11: the lazy fixed-grid variant must produce the identical dense
    # rank for ANY monotone bucket width (including width 1 = one
    # bucket per key and widths that lump everything into few buckets)
    import pyspark.sql.functions as F

    from anti_money_laundering_spark.sampling import dense_index_lazy

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["__idx"]
        for r in dense_index_lazy(
            df.repartition(3), "k", F.expr(f"(k + 1000) div {width}")
        ).collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


# --- repeated spans vs brute-force k-gram oracle ----------------------------


def _spans_oracle(docs, k, min_span):
    """Brute-force ExactSubstr at k-gram resolution: count every k-gram
    corpus-wide, mark positions whose gram repeats, merge adjacent
    positions into maximal runs, emit runs >= min_span tokens."""
    from collections import Counter

    toks = {d: t.lower().split() for d, t in docs}
    grams = Counter()
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            grams[tuple(ts[i : i + k])] += 1
    out = set()
    for d, ts in toks.items():
        covered = sorted(
            i for i in range(len(ts) - k + 1) if grams[tuple(ts[i : i + k])] >= 2
        )
        run = []
        for i in covered:
            if run and i == run[-1] + 1:
                run.append(i)
            else:
                if run and (run[-1] + k - run[0]) >= min_span:
                    out.add((d, run[0], run[-1] + k - 1, run[-1] + k - run[0]))
                run = [i]
        if run and (run[-1] + k - run[0]) >= min_span:
            out.add((d, run[0], run[-1] + k - 1, run[-1] + k - run[0]))
    return out


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 99),
            st.lists(
                st.sampled_from("a b c d".split()), min_size=0, max_size=12
            ).map(" ".join),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(2, 4),
)
@settings(**SETTINGS)
def test_repeated_spans_equals_bruteforce(spark, docs, k):
    # tiny alphabet forces heavy gram collisions: overlapping islands,
    # same-doc repeats, whole-doc coverage, sub-k docs — the corner net
    from anti_money_laundering_spark.dedup import repeated_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in repeated_spans(
            df, "doc_id", "text", gram_k=k, min_span_tokens=k
        ).collect()
    }
    assert got == _spans_oracle(docs, k, min_span=k)


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 99),
            st.lists(
                st.sampled_from("a b c d".split()), min_size=0, max_size=12
            ).map(" ".join),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(2, 4),
)
@settings(**SETTINGS)
def test_cut_spans_equals_bruteforce(spark, docs, k):
    # find + cut round trip vs pure-Python: every doc present, covered
    # positions excised, token order preserved
    from anti_money_laundering_spark.dedup import cut_spans, repeated_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = repeated_spans(df, "doc_id", "text", gram_k=k, min_span_tokens=k)
    got = {
        r["doc_id"]: (r["text_clean"], r["n_cut_tokens"])
        for r in cut_spans(df, spans, "doc_id", "text").collect()
    }
    span_set = _spans_oracle(docs, k, min_span=k)
    want = {}
    for d, t in docs:
        ts = t.lower().split()
        cut = set()
        for sd, s, e, _ in span_set:
            if sd == d:
                cut.update(range(s, e + 1))
        kept = [tok for i, tok in enumerate(ts) if i not in cut]
        want[d] = (" ".join(kept), len(cut))
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50), st.integers(0, 1)),
    min_size=2, max_size=24,
))
@settings(**SETTINGS)
def test_asof_nearest_matches_bruteforce(spark, rows):
    # direction='nearest' vs a per-row Python scan applying the
    # documented tie rule (equal distance -> backward); unique (k, t)
    # on the right for the same tie-arbitrary reason as the backward test
    from anti_money_laundering_spark.operators import asof_join

    left = [(k, t) for k, t, side in rows if side == 0]
    right_d = {(k, t): float(k * 100 + t) for k, t, side in rows if side == 1}
    if not left or not right_d:
        return
    base = pd.Timestamp(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, (base + pd.Timedelta(seconds=t)).to_pydatetime()) for k, t in left],
        "k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, (base + pd.Timedelta(seconds=t)).to_pydatetime(), v)
         for (k, t), v in right_d.items()],
        "k long, ts timestamp, obs double",
    )
    got = {
        (r.k, r.ts): r.obs_matched
        for r in asof_join(ldf, rdf, by=["k"], right_cols=["obs"],
                           direction="nearest", how="left").collect()
    }
    want = {}
    for k, t in left:
        cands = [(abs(rt - t), 0 if rt <= t else 1, rv)
                 for (rk, rt), rv in right_d.items() if rk == k]
        key = (k, (base + pd.Timedelta(seconds=t)).to_pydatetime())
        want[key] = min(cands)[2] if cands else None
    assert got == want


# --- winnowing vs reference selection (r7) ---------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=24),
    min_size=1,
    max_size=12,
)


def _winnow_ref(toks, k=5, w=4):
    import hashlib

    if not toks:
        return set()
    grams = (
        [" ".join(toks)]
        if len(toks) < k
        else [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    )
    keys = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) * (1 << 21) + i
        for i, g in enumerate(grams)
    ]
    sel = (
        {min(keys)}
        if len(keys) <= w
        else {min(keys[i : i + w]) for i in range(len(keys) - w + 1)}
    )
    return {(x % (1 << 21), x // (1 << 21)) for x in sel}


@given(docs_strategy)
@settings(**SETTINGS)
def test_winnowing_equals_reference_on_random_corpora(spark, docs):
    """Random tiny-vocab corpora maximize gram collisions and tie
    pressure on the window-min; the distributed selection must equal
    the reference algorithm doc-by-doc, including empty and short
    documents."""
    from anti_money_laundering_spark.dedup import winnow_fingerprints

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=5, window=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    for i, toks in enumerate(docs):
        assert got.get(i, set()) == _winnow_ref(toks), (i, toks)


# --- kendall tau-b vs O(n^2) brute force ------------------------------------

qd_strategy = st.lists(
    st.tuples(st.integers(1, 6), st.integers(0, 4)), min_size=1, max_size=40
)


@settings(**SETTINGS)
@given(pts=qd_strategy)
def test_kendall_tau_matches_bruteforce(spark, pts):
    """tau-b's contingency-grid formulation vs the definitional O(n^2)
    pair loop — including the degenerate all-tied / n=1 inputs where
    the query must emit a NULL tau instead of an engine-specific 0/0
    (out-of-family rule: the oracle shares the grid formulation, so
    only an independent derivation can catch a shared formula bug)."""
    import math

    import anti_money_laundering_spark.plans.feature_queries as fq

    li = spark.createDataFrame(
        [(i, float(q), d / 100.0) for i, (q, d) in enumerate(pts)],
        "l_orderkey long, l_quantity double, l_discount double",
    )
    orig = fq.load_table
    fq.load_table = lambda spark, sf_dir, name: li
    try:
        row = fq.kendall_tau_qty_discount(spark, "x").collect()[0]
    finally:
        fq.load_table = orig

    n = len(pts)
    conc = disc = t1 = t2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dq = pts[i][0] - pts[j][0]
            dd = pts[i][1] - pts[j][1]
            if dq == 0:
                t1 += 1
            if dd == 0:
                t2 += 1
            if dq * dd > 0:
                conc += 1
            elif dq * dd < 0:
                disc += 1
    assert (row.n, row.conc, row.disc, row.t1, row.t2) == (n, conc, disc, t1, t2)
    n0 = n * (n - 1) // 2
    if n0 > t1 and n0 > t2:
        want = (conc - disc) / (math.sqrt(n0 - t1) * math.sqrt(n0 - t2))
        assert row.tau_b is not None and abs(row.tau_b - want) < 1e-6
    else:
        assert row.tau_b is None


# --- runs test vs definitional sequence scan ---------------------------------

runs_strategy = st.lists(
    st.lists(st.booleans(), min_size=1, max_size=25), min_size=1, max_size=4
)


@settings(**SETTINGS)
@given(seqs=runs_strategy)
def test_runs_test_matches_bruteforce(spark, seqs):
    """Wald-Wolfowitz z per user vs a definitional python scan of the
    boolean sequence (run count = 1 + sign changes; mu/sigma from
    n1/n2), including the 2*n1*n2 <= n degeneracy drops."""
    import datetime as dt
    import math

    import anti_money_laundering_spark.plans.feature_queries as fq

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (u * 1000 + k, t0 + k * m, u, 80.0 if hi else 20.0)
        for u, seq in enumerate(seqs)
        for k, hi in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        [(eid, ts, u, "click", v, "{}") for eid, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = fq.load_table
    fq.load_table = lambda spark, sf_dir, name: ev
    try:
        got = {r.user_id: r for r in fq.runs_test_user_values(spark, "x").collect()}
    finally:
        fq.load_table = orig

    for u, seq in enumerate(seqs):
        n = len(seq)
        n1 = sum(seq)
        n2 = n - n1
        if 2 * n1 * n2 <= n:
            assert u not in got
            continue
        runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        mu = 2.0 * n1 * n2 / n + 1
        sigma = math.sqrt(2.0 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1)))
        r = got[u]
        assert (r.n1, r.n2, r.runs) == (n1, n2, runs)
        assert abs(r.z_stat - (runs - mu) / sigma) < 1e-6
        assert r.nonrandom == (abs((runs - mu) / sigma) > 1.96)


# --- two-sample KS vs definitional ECDF scan ---------------------------------

ks_strategy = st.tuples(
    st.lists(st.integers(0, 30), max_size=25),
    st.lists(st.integers(0, 30), max_size=25),
)


@settings(**SETTINGS)
@given(ab=ks_strategy)
def test_ks_periods_matches_bruteforce(spark, ab):
    """ks_test_periods vs a definitional python ECDF scan — exact
    integer ks_num / n_a / n_b, div-identity ks_d, and the empty-side
    guard (no row when every event falls in one half)."""
    import datetime as dt

    import anti_money_laundering_spark.plans.feature_queries as fq

    a_vals, b_vals = ab
    a_day = dt.datetime(2024, 1, 10)
    b_day = dt.datetime(2024, 1, 20)
    rows = [(a_day, x) for x in a_vals] + [(b_day, x) for x in b_vals]
    if not rows:
        return
    ev = spark.createDataFrame(
        [(i, ts, 1, "click", x / 100.0, "{}") for i, (ts, x) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = fq.load_table
    fq.load_table = lambda spark, sf_dir, name: ev
    try:
        out = fq.ks_test_periods(spark, "x").collect()
    finally:
        fq.load_table = orig

    n1, n2 = len(a_vals), len(b_vals)
    if n1 == 0 or n2 == 0:
        assert out == []
        return
    ks_num = 0
    cum1 = cum2 = 0
    for v in sorted(set(a_vals) | set(b_vals)):
        cum1 += sum(1 for x in a_vals if x == v)
        cum2 += sum(1 for x in b_vals if x == v)
        ks_num = max(ks_num, abs(cum1 * n2 - cum2 * n1))
    row = out[0]
    assert (row.n_a, row.n_b, row.ks_num) == (n1, n2, str(ks_num))
    assert row.ks_d == ((2 * ks_num * 1000000 + n1 * n2) // (2 * n1 * n2)) / 1000000.0


# --- behavior shift vs dict TV distance --------------------------------------

shift_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(["click", "view", "purchase"]), max_size=12),
        st.lists(st.sampled_from(["click", "view", "purchase"]), max_size=12),
    ),
    min_size=1,
    max_size=4,
)


@settings(**SETTINGS)
@given(users=shift_strategy)
def test_behavior_shift_matches_bruteforce(spark, users):
    """behavior_shift_users vs a dict-based total-variation reference,
    including the drop of users active in only one half."""
    import datetime as dt
    from collections import Counter

    import anti_money_laundering_spark.plans.feature_queries as fq

    a_day = dt.datetime(2024, 1, 10)
    b_day = dt.datetime(2024, 1, 20)
    rows = [
        (u, ts, ty)
        for u, (first, second) in enumerate(users)
        for ts, tys in ((a_day, first), (b_day, second))
        for ty in tys
    ]
    if not rows:
        return
    ev = spark.createDataFrame(
        [(i, ts, u, ty, 1.0, "{}") for i, (u, ts, ty) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = fq.load_table
    fq.load_table = lambda spark, sf_dir, name: ev
    try:
        got = {r.user_id: r for r in fq.behavior_shift_users(spark, "x").collect()}
    finally:
        fq.load_table = orig

    for u, (first, second) in enumerate(users):
        n1, n2 = len(first), len(second)
        if n1 == 0 or n2 == 0:
            assert u not in got
            continue
        c1, c2 = Counter(first), Counter(second)
        tv_num = sum(
            abs(c1.get(t, 0) * n2 - c2.get(t, 0) * n1) for t in set(c1) | set(c2)
        )
        r = got[u]
        assert (r.n_a, r.n_b, r.tv_num) == (n1, n2, tv_num)
        assert r.tv_dist == (
            (2 * tv_num * 1000000 + 2 * n1 * n2) // (2 * 2 * n1 * n2)
        ) / 1000000.0
        assert r.shifted == (5 * tv_num > 3 * n1 * n2)


# --- periodic transfers vs python gap scan -----------------------------------

periodic_strategy = st.lists(
    st.lists(st.integers(0, 5000), min_size=1, max_size=12, unique=True),
    min_size=1,
    max_size=4,
)


@settings(**SETTINGS)
@given(channels=periodic_strategy)
def test_periodic_transfers_matches_bruteforce(spark, channels):
    """periodic_transfer_patterns vs a python gap scan: second-level
    event times floor to minute gaps (div 60000000 on microseconds),
    stats via the exact integer identities, channels with < 3 gaps or
    an all-zero gap sum dropped."""
    import datetime as dt

    import anti_money_laundering_spark.plans.graph_queries as gq

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (ch, t0 + sec * s)
        for ch, secs in enumerate(channels)
        for sec in secs
    ]
    ev = spark.createDataFrame(
        [(i, ts, ch, "transfer", 1.0, f'{{"k": {100 + ch}}}') for i, (ch, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = gq.load_table
    gq.load_table = lambda spark, sf_dir, name: ev
    try:
        got = {
            (r.src, r.dst): r
            for r in gq.periodic_transfer_patterns(spark, "x").collect()
        }
    finally:
        gq.load_table = orig

    for ch, secs in enumerate(channels):
        t = sorted(secs)
        gaps = [(b * 1_000_000 - a * 1_000_000) // 60_000_000 for a, b in zip(t, t[1:])]
        n, ssum = len(gaps), sum(gaps)
        key = (ch, 100 + ch)
        if n < 3 or ssum == 0:
            assert key not in got
            continue
        ss = sum(g * g for g in gaps)
        var_num = n * ss - ssum * ssum
        r = got[key]
        assert r.n_gaps == n
        assert r.mean_gap_min == ((2 * ssum * 100000 + n) // (2 * n)) / 100000.0
        assert r.gap_cv2 == (
            (2 * var_num * 100000 + ssum * ssum) // (2 * ssum * ssum)
        ) / 100000.0
        assert r.periodic == (10 * var_num < ssum * ssum)


# --- pass-through funnel vs nested-loop scan ---------------------------------

pt_edge = st.tuples(
    st.integers(0, 5),          # src
    st.integers(0, 5),          # dst
    st.integers(14001, 14010),  # cents (> flow threshold 14000)
    st.integers(0, 96),         # hour offset
)


@settings(**SETTINGS)
@given(edges=st.lists(pt_edge, min_size=1, max_size=30))
def test_passthrough_matches_bruteforce(spark, edges):
    """passthrough_funds_alerts vs a nested-loop python scan over the
    same edge list: strict (in.ts, in.ts+48h) window, inclusive
    80-100% integer cent band, per-mid pair/source/sink counts and
    exact cent totals."""
    import datetime as dt
    from collections import defaultdict

    import anti_money_laundering_spark.plans.graph_queries as gq

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    ev = spark.createDataFrame(
        [
            (i, t0 + hh * h, src, "transfer", c / 100.0, f'{{"k": {dst}}}')
            for i, (src, dst, c, hh) in enumerate(edges)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = gq.load_table
    gq.load_table = lambda spark, sf_dir, name: ev
    try:
        got = {r.mid: r for r in gq.passthrough_funds_alerts(spark, "x").collect()}
    finally:
        gq.load_table = orig

    agg = defaultdict(lambda: [0, set(), set(), 0, 0])
    for isrc, idst, ic, ih in edges:
        for osrc, odst, oc, oh in edges:
            if (
                osrc == idst
                and ih < oh < ih + 48
                and ic * 8 <= oc * 10 <= ic * 10
            ):
                a = agg[idst]
                a[0] += 1
                a[1].add(isrc)
                a[2].add(odst)
                a[3] += ic
                a[4] += oc
    assert set(got) == set(agg)
    for mid, (np_, srcs, sinks, ict, oct_) in agg.items():
        r = got[mid]
        assert (r.n_passthrough, r.n_sources, r.n_sinks) == (np_, len(srcs), len(sinks))
        assert (r.in_total, r.out_total) == (ict / 100.0, oct_ / 100.0)
