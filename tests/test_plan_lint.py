"""Repo-wide physical-plan lint: every catalog query's plan is swept
for the two unambiguous scale antipatterns this engine claims to have
zero of (SURVEY §2.12 UDF discipline; the 100 TB posture):

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  engine's contract is JVM codegen everywhere, with Arrow-vectorized
  ``ArrowEvalPython`` / ``MapInPandas`` as the only Python path.
- ``CartesianProduct`` — an unkeyed all-pairs join. Every pairwise
  operator here blocks/buckets first (LSH bands, IVF lists, blocking
  rules, bucketized range join); broadcast nested loops over tiny
  broadcast sides (``BroadcastNestedLoopJoin``) are acceptable and not
  flagged.

This executes each query's PLAN BUILD only (eager sub-steps like EM
fits and versioned-table writes do run), at the smallest fixture —
~80 s for the whole catalog. A query that cannot even build is a
failure here too, which doubles as an import/registration smoke for
catalog entries past the driver window.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType

from anti_money_laundering_spark.plans.catalog import get_catalog
from tests.test_plans import explain_str

ANTIPATTERNS = ("BatchEvalPython", "CartesianProduct")

#: Queries ALLOWED to carry interpreted higher-order lambdas
#: (transform/filter/aggregate LambdaFunction nodes) in their plans —
#: the known LINEAR per-row uses (tokenize a document once, walk a
#: short token array). Lambdas evaluate interpreted at ~15x codegen
#: cost (round-1 lesson), and the repo's worst perf bugs were lambdas
#: in QUADRATIC contexts (r7: a transform() re-run per posexplode'd
#: gram, 70.5 s -> 4.8 s when rewritten with lead+concat). This
#: ratchet freezes the accepted set: a NEW query that gains a lambda
#: must either rewrite with codegen'd expressions (lead+concat for
#: grams, explode + keyed agg for signatures) or be added here with a
#: linearity justification in its docstring.
LAMBDA_ALLOWED = frozenset({
    # r14: event_cooccurrence generates per-basket pairs from the
    # sorted distinct itemset — lambdas walk <= |event types| elements
    # per basket (a schema constant), LINEAR in baskets, replacing the
    # distinct+self-join+re-distinct shape (guide §2.4; measured wall
    # 0.871 -> 0.803, CPU 1.96 -> 1.47 at sf0.1)
    "event_cooccurrence",
    "ann_ivf_topk", "bigram_pmi_collocations", "bm25_doc_scores",
    "bpe_pair_counts", "chunk_sliding_windows", "corpus_clean_pipeline",
    "corpus_datasheet", "corpus_despan_clean", "corpus_training_manifest",
    "decontam_ngram_overlap", "dedup_exact_groups", "dedup_repeated_spans",
    "dedup_simhash_candidates", "doc_keywords", "heavy_hitter_tokens",
    "lang_trigram_docs", "map_function_suite", "ml_embedding_pca",
    "ngram_lm_quality", "pack_sequences_docs", "quality_rule_screen",
    "repetition_scores_docs", "retrieval_rrf_fusion", "rolling_median_value",
    "shard_manifest_docs", "text_fingerprints", "text_lang_id",
    "text_length_quantiles", "text_quality_scores", "text_token_stats",
    "user_event_type_profile", "vocab_top_terms", "winnow_fingerprints_docs",
})


def test_no_catalog_plan_contains_scale_antipatterns(spark, sf_dir):
    """One sweep, three repo-wide gates: (a) no scale antipatterns in
    any catalog plan; (b) no ArrayType/MapType column in any catalog
    query's OUTPUT schema — the r7 driver proved its canonicalizer
    (pandas sort_values over raw columns) crashes on collection cells,
    for hash-compared AND rows-only queries alike, so any query is one
    window rotation away from an ERR row if it emits one (collection
    columns are fine mid-plan; outputs must be scalar — array_join /
    per-component projection at the boundary); (c) no query OUTSIDE
    ``LAMBDA_ALLOWED`` carries an interpreted lambda in its plan."""
    bad: dict[str, str] = {}
    unhashable: dict[str, list[str]] = {}
    new_lambdas: list[str] = []
    for name, q in get_catalog().items():
        df = q.fn(spark, sf_dir)
        plan = explain_str(df, "simple")
        hits = [p for p in ANTIPATTERNS if p in plan]
        if hits:
            bad[name] = ",".join(hits)
        if "lambdafunction" in plan.lower() and name not in LAMBDA_ALLOWED:
            new_lambdas.append(name)
        cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if cols:
            unhashable[name] = cols
    assert not bad, f"scale antipatterns in catalog plans: {bad}"
    assert not unhashable, (
        f"array/map columns in catalog query outputs (crash the driver canonicalizer): "
        f"{unhashable}"
    )
    assert not new_lambdas, (
        "interpreted higher-order lambdas in queries outside LAMBDA_ALLOWED "
        f"(~15x codegen cost — rewrite with codegen'd expressions or justify): "
        f"{new_lambdas}"
    )


#: Shuffle-exchange budget per headline query (r6 verdict item 10): the
#: Exchange count (EXCLUDING BroadcastExchange — broadcasts are the
#: desirable replacement for a shuffle, so swapping one for a shuffle
#: must FAIL this ratchet) measured on the plan each query shipped
#: with. A refactor may lower a number; raising one requires editing
#: this table consciously. Iterative/memoized queries (CC, Pregel,
#: MinHash) read localCheckpoints in their FINAL plan, so their stitch
#: plan budgets are 0 — their per-round shuffles are pinned in
#: PLANS.md/SCALE.md instead.
EXCHANGE_BUDGET = {
    "shared_attr_match": 2,
    "motif_fanin_structuring": 4,
    # r11: the guarded fan-in's hub anti-join feeds each inline their
    # own copy of the degree-agg subtree (the guard is checkpoint-free
    # so a guarded plan builds with ZERO side effects — review
    # finding; the former lazy checkpoint collapsed the static count
    # to 5 but executed the degree stages at plan-construction under
    # AQE) + the c_degree join's degree agg + its re-exchange = 8
    # static exchanges, ALL vertex-scale (<= |V| rows), not
    # edge-scale; runtime stage reuse dedups identical feeds
    "motif_fanin_capped": 8,
    "ann_lsh_topk": 1,
    "dedup_minhash_near_dups": 0,
    # r14: the cluster step's small-graph collapse ends the query in a
    # LIVE plan (pair-vertex distinct + the label left join around the
    # single-task MapInPandas) instead of a checkpoint scan — one more
    # static exchange in the stitch plan, ~10 fewer executed per run
    # (the 2-round cluster fixpoint's per-round shuffles are gone)
    "corpus_clean_pipeline": 4,
    # r14: same trade — the pinned 0 was a checkpoint-scan artifact
    # (every per-round shuffle hidden behind the loop's materializations,
    # pinned in PLANS.md/SCALE.md); the small-graph collapse returns a
    # live plan whose TOTAL executed shuffles are the vertex distinct +
    # the label join (2) vs 5 rounds x (join+agg) before
    "connected_components": 2,
    "pregel_risk_propagation": 0,
    "pricing_summary": 2,
    "sessionize_events": 1,
    "ann_cosine_topk": 1,
    # r8: reformulated from MLlib HashingTF+pandas-UDF (2 exchanges) to
    # the portable-hash keyed-aggregation formulation (oracle-able);
    # final plan reads the localCheckpointed weight table: norms agg +
    # dot agg + pair-keep + norm joins = 4
    "tfidf_similar_pairs": 4,
    "motif_roundtrip_cycle": 3,
    "asof_join_last_purchase": 1,
    "self_join_pair_amounts": 0,
    "multiway_join_revenue": 1,
    "window_topk_per_group": 1,
    "stream_user_totals": 1,
    # r9: the _R10_PLAN screens get budgets BEFORE their driver window
    # so a shuffle regression can't slip into their first attestation.
    # kendall's 6 are all over the localCheckpointed <= 550-cell grid
    # (the lineitem scan+count shuffle happens once, at checkpoint
    # time, outside this plan); the rest are their single keyed
    # aggregation / window shuffles.
    "threshold_avoidance_scores": 1,
    "round_amount_bias_orders": 1,
    "passthrough_funds_alerts": 2,
    "periodic_transfer_patterns": 1,
    "ks_test_periods": 2,
    "behavior_shift_users": 2,
    "kendall_tau_qty_discount": 6,
    "runs_test_user_values": 1,
    # r10: the batch face now carries an explicit merge hint
    # (streaming.interval_join_streams — both legs are event-scale,
    # never broadcastable at 100 TB), so the 2-exchange SMJ shape is
    # deterministic at every SF and this pin is exact, not slack
    "stream_passthrough_pairs": 2,
    "benford_first_digit_lineitem": 2,
    # r10: promoted to headline (r9 verdict item 4 — bench floor for the
    # iterative exact-ML family). One Lloyd round over the lazily
    # checkpointed scaled-dims table: seed-window sort + a1/b1
    # (first-pass distance agg + argmin window) + cent (centroid agg) +
    # a2 (second-pass distance agg) = 5; the k*dims centroid tables are
    # BroadcastExchanges, excluded by design.
    "kmeans_lloyd_assignments": 5,
    # r10: the _R11_PLAN screens get budgets BEFORE their driver window
    # (the r9 discipline). reciprocal carries an explicit merge hint
    # (both legs event-scale — the stream_passthrough_pairs pattern);
    # r11's channel-cap guard adds one window count per leg on the SAME
    # (src, dst) key: the out leg's window exchange is REUSED by the
    # join, the back leg pays its window exchange plus the re-exchange
    # on the swapped key = 3 total; velocity's single user_id
    # shuffle serves both RANGE windows and the re-aggregation; the
    # other two are their (channel-window or count) shuffle + the
    # keyed re-aggregation on a different key.
    "reciprocal_transfer_alerts": 3,
    "velocity_limit_breaches": 1,
    # r11: the velocity control's streaming twin — same single user_id
    # shuffle serving both RANGE frames; the breach filter is a per-row
    # predicate on the window outputs, no re-aggregation
    "stream_velocity_breaches": 1,
    # r11: peer-group LOO deviation — the merge-hinted orders⋈customer
    # SMJ (2) rides its custkey partitioning into the per-customer agg
    # (no extra exchange), the 5-row segment-stats agg is 1 tiny
    # shuffle, and the stats branch re-derives the totals subtree
    # (checkpoint-free rule): 2 more = 5 static; the stats join back
    # is an explicit broadcast
    "peer_group_deviation": 5,
    # r11: ramp runs — ONE custkey shuffle serves the seq window, the
    # break lag, the island cumsum, the per-island agg and the top-1
    # window (alias-first keeps the partitioning reusable)
    "amount_ramp_runs": 1,
    # r11: embedding outliers — the (label, d) centroid agg (1 tiny
    # shuffle, broadcast back), the per-vector distance agg, and the
    # per-label top-k window = 3
    "embedding_label_outliers": 3,
    "new_counterparty_rate": 2,
    "amount_digit_entropy": 2,
    # k-anonymity / l-diversity: the quasi-identifier(+sensitive)
    # groupBy + the per-class re-aggregation
    "k_anonymity_profile": 2,
    "l_diversity_profile": 2,
    # t-closeness: everything past the (lazily checkpointed) cell agg
    # runs on dimension-sized frames — gl/classes aggs, grid left
    # join, class-window sort, final agg = 5 tiny exchanges; the one
    # corpus-scale shuffle is the cell agg at checkpoint time
    "t_closeness_profile": 5,
    # smurfing-day: band filter pushes into the scan; one user_id
    # shuffle serves the rolling RANGE window and the re-aggregation
    "structuring_aggregation_alerts": 1,
    # sorted-neighborhood (r11: fully-lazy dense_index_lazy — r10
    # advice item 1): the checkpoint is gone (an AQE lazy checkpoint
    # executes upstream stages at plan-construction), so each join
    # branch carries its own copy of the index subtree: per branch the
    # grid count-agg + the offsets SinglePartition cumsum + the
    # in-bucket window exchange = 3, x2 branches, + the merge-hinted
    # bucket SMJ's 2 side shuffles = 8 STATIC exchanges. Runtime
    # recomputation is byte-deterministic (fixed grid — no boundary
    # sampling) and MEASURED FASTER than the persist alternative at
    # 20M records (r12, SCALE.md §sorted-neighborhood-cache-trade:
    # recompute 22.9/8.9 s vs cache_ranked=True 26.0/13.5 s in
    # order-controlled warm pairs — materializing the corpus-scale
    # ranked frame costs more than replaying its codegen subtree), so
    # the 8-exchange recompute shape is FINAL; cache_ranked=True
    # remains for sessions reusing one rank across many plans.
    "linkage_sorted_neighborhood": 8,
    # r12 headline promotion (r11 verdict item 4 — the
    # posexplode-over-dims family's bench floor): labels x dims
    # centroid agg + per-label ranking window + the final per-vector
    # re-agg = 3 exchanges, dims-amplified but never all-pairs
    "embedding_label_outliers": 3,
    # r12-new screens (pinned BEFORE their r13 driver window, per the
    # r10 rule). coordinated: the two-phase distinct-sender aggregate
    # over one (cents, day) key = 2. mispricing: every window
    # partitions by l_partkey — both chained layers ride ONE exchange.
    # split_leakage: a codegen'd md5 predicate over the checkpointed
    # verified-pairs memo = 0.
    "coordinated_amount_clusters": 2,
    "trade_mispricing_alerts": 1,
    "split_leakage_audit": 0,
    # batch face of the chained-stateful streaming twin: distinct on
    # (user, cents, day) + the (cents, day) re-agg = 2 keyed exchanges
    "stream_coordinated_amounts": 2,
    # r13-new (pinned BEFORE its r14 driver window): the sliding
    # two-grid variant explodes each event into both 24h windows, then
    # rides the SAME two-phase distinct-sender aggregate as the base
    # screen — 2 keyed exchanges, 2x rows, no join
    "coordinated_sliding_windows": 2,
    # its streaming twin's batch face: explode + distinct on
    # (user, cents, win) + the (cents, win) re-agg = 2 keyed exchanges
    "stream_coordinated_sliding": 2,
    # r13-new (pinned BEFORE their r14 driver window). corridor: at the
    # pin fixture AQE broadcasts every dimension-side of the star join,
    # leaving the orderkey fact shuffle + the 625-cell corridor agg +
    # the 1-row grand-total agg = 3 (at corpus scale the custkey /
    # suppkey joins shuffle too — explicit broadcasts are only on the
    # 25-row nation copies, so the budget stays a fixture pin, not a
    # scale claim). tracing: 3 exact-hop levels, each = frontier-join
    # shuffle-agg, with the union branches recomputing their level
    # prefix (1+2+3 level joins; seeds distinct agg x3 union branches
    # and the hop aggs land at 9 static exchanges). The recompute-vs-
    # persist_levels A/B measured a CROSSOVER (SCALE.md
    # §r13-corridor-tracing): persist wins at 50M (6.8 vs 8.5 s) but
    # loses 2.2x at fixture scale to per-job scheduling floors, so the
    # catalog default stays recompute and the pin stays 9 (the persist
    # variant's static text count is 10 — InMemoryRelation definitions
    # embed their child plans' exchanges in toString).
    # histogram: the memoized pair table's band agg + the <= 7-row
    # cumulative window = 2.
    "corridor_concentration_alerts": 3,
    "funds_tracing_alerts": 9,
    "dedup_similarity_histogram": 2,
    # watchlist screening: both sides' deletion-variant explodes meet
    # on an equi-join (candidate agg + the two variant-side exchanges
    # = 3 at the pin fixture; the list side auto-broadcasts past its
    # threshold only at larger SFs — never a cartesian)
    "watchlist_screen_hits": 3,
    # round-trip face of the tracing levels: the same 1+2+3 recompute
    # shape minus the final (seed, node) re-agg (the per-seed return
    # agg replaces it), with the hop-2-branch seed filter folding one
    # level-1 agg into its join = 8
    "funds_roundtrip_alerts": 8,
}

#: Budgets are pinned at this fixture (NOT the sf_dir fixture: the
#: ratchet must be deterministic under SPARK_GRAFT_TEST_SF_DIR
#: overrides; explicit broadcasts keep the plan shape SF-stable, but
#: pinning one scale removes all doubt).
_BUDGET_SF = "/root/testdata/sf0.001"


def test_headline_shuffle_counts_within_budget(spark):
    import re

    cat = get_catalog()
    missing = [n for n, q in cat.items() if q.headline and n not in EXCHANGE_BUDGET]
    assert not missing, f"headline queries without a shuffle budget: {missing}"
    over: dict[str, tuple[int, int]] = {}
    for name, budget in EXCHANGE_BUDGET.items():
        plan = cat[name].fn(spark, _BUDGET_SF)._jdf.queryExecution().executedPlan().toString()
        # ReusedExchange is strictly FEWER executed shuffles — counting
        # it would trip the ratchet on an improvement (review finding)
        n = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange ", plan))
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle count exceeds pinned budget (actual, budget): {over}"
