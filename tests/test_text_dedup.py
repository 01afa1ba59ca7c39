"""Text-function and dedup-pipeline tests: closed-form token/shingle
expectations, LSH recall against exact Jaccard, SimHash pigeonhole
guarantee, multimodal featurizer determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anti_money_laundering_spark.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_candidates,
    near_duplicates_minhash,
    simhash_candidates,
)
from anti_money_laundering_spark.functions import (
    fingerprint_md5,
    lang_id,
    minhash_signature,
    simhash64,
    token_count,
    word_shingles,
)
from anti_money_laundering_spark.multimodal import attach_binary_payload, extract_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different words entirely unrelated text here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "der hund und die katze und das haus ist hier"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_whitespace_class_java_re2_parity(spark):
    """A vertical-tab document must tokenize identically under Java
    regex (Spark) and RE2 (DuckDB oracle) — the reason every tokenizer
    regex uses the explicit WS_CLASS instead of ``\\s`` (Java's \\s
    includes \\x0B, RE2's does not)."""
    import duckdb

    from anti_money_laundering_spark.functions import subword_token_count
    from anti_money_laundering_spark.plans.llm_queries import _DUCK_TOKS

    text = "alpha\x0bbeta gamma\ttab\nline"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = df.select(
        token_count("text").alias("n"),
        subword_token_count("text").alias("ns"),
    ).collect()[0]
    duck_n, duck_ns = duckdb.sql(
        f"""SELECT len({_DUCK_TOKS}),
            len(regexp_extract_all(text,
                '''(?:s|t|re|ve|m|ll|d)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^ \\t\\n\\r\\f\\x0B\\p{{L}}\\p{{N}}]+|[ \\t\\n\\r\\f\\x0B]+'))
            FROM (SELECT ?::VARCHAR AS text)""",
        params=[text],
    ).fetchone()
    assert row.n == duck_n == 5  # VT splits on both engines
    assert row.ns == duck_ns


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([(1, "  A b  c d  ")], "id long, text string")
    row = df.select(
        token_count("text").alias("n"),
        word_shingles("text", k=2).alias("sh"),
        word_shingles("text", k=9).alias("sh_long"),
    ).collect()[0]
    assert row.n == 4
    assert row.sh == ["a b", "b c", "c d"]
    assert row.sh_long == ["a b c d"]  # shorter than k -> whole doc


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([(1, "A  b\tC"), (2, "a b c")], "id long, text string")
    fps = [r.fp for r in df.select(fingerprint_md5("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_lang_id_heuristic(spark):
    rows = [(1, "the cat of a house and to go"), (2, "der hund und die katze ist"),
            (3, "xyzzy plugh qwerty")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_exact_duplicates_groups(docs):
    groups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.doc_ids == [1, 4] and g.keep_id == 1 and g.n_docs == 2


def test_jaccard_pairs_exact_values(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.0).collect()}
    # docs 1 and 4 identical -> jaccard 1.0
    assert pairs[(1, 4)] == 1.0
    # docs 1 and 2: distinct-token sets {the,quick,brown,fox,jumps,over,lazy,dog|cat}
    # 8 tokens each, 7 shared -> 7 / 9
    assert abs(pairs[(1, 2)] - 7 / 9) < 1e-9
    assert (1, 3) not in pairs or pairs[(1, 3)] == 0


def test_minhash_identical_signatures(docs):
    sigs = docs.select(
        "doc_id", word_shingles("text", 3).alias("sh")
    ).select("doc_id", minhash_signature("sh", 16).alias("sig")).collect()
    by_id = {r.doc_id: r.sig for r in sigs}
    assert by_id[1] == by_id[4]  # identical docs -> identical signatures
    assert by_id[1] != by_id[3]


def test_minhash_agg_path_matches_lambda_expression(docs):
    """The codegen'd explode+min-agg signatures must equal the
    higher-order-lambda formulation value-for-value (same xxhash64(h,s)
    seeds) — the lambda stays as the semantic oracle, the agg path is
    what ships."""
    from anti_money_laundering_spark.dedup import minhash_signatures

    expr_sigs = {
        r.doc_id: r.sig
        for r in docs.select(
            "doc_id", word_shingles("text", 3).alias("sh")
        ).select("doc_id", minhash_signature("sh", 16).alias("sig")).collect()
    }
    agg_sigs = {
        r.doc_id: r["__sig"]
        for r in minhash_signatures(docs, "doc_id", "text", num_hashes=16, shingle_k=3).collect()
    }
    assert agg_sigs == expr_sigs


def test_simhash_agg_path_matches_lambda_expression(spark, docs):
    from anti_money_laundering_spark.dedup import simhash_signatures

    expr_sims = {r.doc_id: r.s for r in docs.select("doc_id", simhash64("text").alias("s")).collect()}
    agg_sims = {r.doc_id: r["__sim"] for r in simhash_signatures(docs, "doc_id", "text").collect()}
    assert agg_sims == expr_sims
    # token-less doc -> signature 0 on both paths
    empty = spark.createDataFrame([(9, " ")], "doc_id long, text string")
    assert simhash_signatures(empty, "doc_id", "text").collect()[0]["__sim"] == 0


def test_lsh_candidates_find_exact_and_near_dups(docs):
    cands = {(r.id_a, r.id_b) for r in
             minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=32, bands=16).collect()}
    assert (1, 4) in cands  # identical: every band agrees
    assert (1, 2) in cands  # near-dup: high jaccard, 16 bands of 2 rows catches it


def test_near_duplicates_pipeline(docs):
    out = {(r.id_a, r.id_b): r.jaccard for r in
           near_duplicates_minhash(docs, "doc_id", "text", min_jaccard=0.7).collect()}
    assert set(out) == {(1, 2), (1, 4), (2, 4)}
    assert out[(1, 4)] == 1.0


def test_simhash_identical_and_pigeonhole(docs):
    sims = {r.doc_id: r.s for r in docs.select("doc_id", simhash64("text").alias("s")).collect()}
    assert sims[1] == sims[4]
    cands = {(r.id_a, r.id_b): r.hamming for r in
             simhash_candidates(docs, "doc_id", "text", max_hamming=3).collect()}
    assert cands[(1, 4)] == 0  # identical docs always candidates at hamming 0


def test_minhash_pipeline_equals_exact_jaccard(spark, sf_dir):
    """The full MinHash pipeline must EQUAL the exact trigram-Jaccard
    pair set on the fixtures: verification guarantees precision 1 by
    construction, and this pins LSH recall at 1.0 — the invariant the
    dedup_minhash_near_dups DuckDB oracle (exact-Jaccard SQL at 0.7)
    relies on. If fixture content ever drifts enough to slip a
    borderline pair past 8x4 banding, this fails locally before the
    driver's correctness gate does."""
    from anti_money_laundering_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.id_a, r.id_b) for r in
             jaccard_pairs(docs, "doc_id", "text", min_jaccard=0.7, shingle_k=3).collect()}
    approx = {(r.id_a, r.id_b) for r in
              near_duplicates_minhash(docs, "doc_id", "text", min_jaccard=0.7).collect()}
    assert approx == exact


def test_multimodal_features_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    media = attach_binary_payload(df, "doc_id", "text")
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].n_bytes == 3
    assert rows[1].byte_checksum == ord("a") + ord("b") + ord("c")
    assert abs(rows[1].byte_mean - (97 + 98 + 99) / 3) < 1e-9
    assert rows[1].head_hex == "616263"
    assert rows[2].n_bytes == 0 and rows[2].byte_mean == 0.0


def test_pack_sequences_closed_form(spark):
    """Offsets are contiguous per shard in id order; bin/boundary math
    matches hand computation for a single-shard stream."""
    from anti_money_laundering_spark.functions import pack_sequences

    df = spark.createDataFrame(
        [("a", 100), ("b", 300), ("c", 200), ("d", 50)], "doc_id string, nt int"
    )
    out = pack_sequences(df, "doc_id", "nt", target_len=512, num_shards=1).collect()
    rows = {r.doc_id: r for r in out}
    # shard 0 for all; order a,b,c,d → offsets 0,100,400,600
    assert [rows[d].start_offset for d in "abcd"] == [0, 100, 400, 600]
    assert [rows[d].bin_id for d in "abcd"] == [0, 0, 0, 1]
    # b ends at 399 (<512): stays; c spans 400..599 crossing 512
    assert [rows[d].crosses_boundary for d in "abcd"] == [False, False, True, False]


def test_chunk_sliding_windows_empty_doc_emits_nothing(spark):
    """r5 review finding (verified): Spark's sequence(0, -1) defaults
    to step -1 and yields [0, -1] — an empty document used to emit a
    phantom (pos=0, '', 0) chunk, diverging from the DuckDB oracle.
    Zero-token docs must produce zero chunk rows."""
    from anti_money_laundering_spark.functions import tokens
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    # replicate the catalog query's exact window arithmetic on a frame
    # with empty docs (the fixture has none)

    toks = docs.select("doc_id", tokens("text").alias("t"))
    n = F.size("t")
    n_chunks = (
        F.when(n == 0, 0).when(n <= 8, 1)
        .otherwise(F.ceil((n - F.lit(8)) / 4.0).cast("int") + 1)
    )
    out = (
        toks.filter(n > 0)
        .select("doc_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("p"))
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.p)
    assert 1 not in by_doc and 2 not in by_doc  # empty/whitespace: no rows
    assert by_doc[3] == [0, 1]  # 10 tokens, size 8 stride 4 -> 2 windows


def test_exact_duplicates_mega_group_bounded(spark):
    # r5 verdict item 4: a 10^4-way duplicate group must yield an EXACT
    # n_docs but a doc_ids payload capped at max_ids (enforced before
    # the collect, so no aggregation buffer ever holds the full group).
    big = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit("same exact text").alias("text")
    )
    uniq = spark.createDataFrame([(100_000, "one of a kind")], "doc_id long, text string")
    groups = exact_duplicates(big.unionAll(uniq), "doc_id", "text", max_ids=50).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_docs == 10_000
    assert g.doc_ids == list(range(50))  # first max_ids in id order
    assert g.keep_id == 0


def test_exact_duplicates_plans_single_shuffle(spark):
    # the rank window and the group-by share the fingerprint key, so
    # Catalyst reuses the window's hash partitioning: exactly ONE
    # Exchange in the whole plan (the docstring's claim, pinned)
    from tests.test_plans import explain_str

    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, text string")
    plan = explain_str(exact_duplicates(df, "doc_id", "text"))
    n_exchanges = sum(1 for line in plan.splitlines() if line.strip().startswith("(") and "Exchange" in line)
    assert n_exchanges == 1, plan


def test_repeated_spans_planted_passage(spark):
    # Two docs share a 16-token passage embedded in different contexts;
    # a third doc repeats an internal 10-token run twice. Span dedup
    # must find exactly those runs (k=8 resolution), not whole docs.
    from anti_money_laundering_spark.dedup import repeated_spans

    passage = " ".join(f"p{i}" for i in range(16))
    rep = " ".join(f"r{i}" for i in range(10))
    rows = [
        (1, f"alpha beta gamma {passage} delta epsilon"),
        (2, f"one two {passage} three four five six"),
        (3, f"start {rep} middle words here {rep} finish"),
        (4, "totally unique text with no repeats at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(df, "doc_id", "text", gram_k=8, min_span_tokens=10).collect()
    }
    # doc 1: passage at token offset 3..18; doc 2: offset 2..17
    assert (1, 3, 18, 16) in got
    assert (2, 2, 17, 16) in got
    # doc 3: both copies of the 10-token run are covered spans
    assert (3, 1, 10, 10) in got
    assert (3, 14, 23, 10) in got  # start + 10 run + middle/words/here = offset 14
    assert not any(d == 4 for d, *_ in got)
    assert len(got) == 4


def test_cut_spans_removes_planted_passages(spark):
    from anti_money_laundering_spark.dedup import cut_spans, repeated_spans

    passage = " ".join(f"p{i}" for i in range(16))
    rows = [
        (1, f"alpha beta gamma {passage} delta epsilon"),
        (2, f"one two {passage} three four five six"),
        (4, "totally unique text with no repeats at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_spans(df, "doc_id", "text", gram_k=8, min_span_tokens=10)
    out = {r.doc_id: (r.text_clean, r.n_cut_tokens) for r in cut_spans(df, spans, "doc_id", "text").collect()}
    assert out[1] == ("alpha beta gamma delta epsilon", 16)
    assert out[2] == ("one two three four five six", 16)
    assert out[4] == ("totally unique text with no repeats at all whatsoever", 0)
    # convergence: the cleaned corpus has no repeated spans left
    clean = spark.createDataFrame(
        [(k, v[0]) for k, v in out.items()], "doc_id long, text string"
    )
    assert repeated_spans(clean, "doc_id", "text", gram_k=8, min_span_tokens=10).count() == 0
    # caller policy: keep doc 1's copy by filtering its spans out
    keep_first = spans.filter(F.col("doc_id") != 1)
    kept = {r.doc_id: r.text_clean for r in cut_spans(df, keep_first, "doc_id", "text").collect()}
    assert passage in kept[1] and passage not in kept[2]


def test_cut_spans_fully_covered_doc_yields_empty(spark):
    from anti_money_laundering_spark.dedup import cut_spans

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    spans = spark.createDataFrame([(1, 0, 3, 4)], "doc_id long, span_start long, span_end long, span_tokens long")
    out = cut_spans(df, spans, "doc_id", "text").collect()[0]
    assert out.text_clean == "" and out.n_cut_tokens == 4


def test_span_oracle_token_cap_has_headroom():
    """The dedup_repeated_spans / corpus_despan_clean DuckDB oracles
    enumerate token positions with generate_series(1, 100000) — an
    oracle-side cap the Spark side doesn't have. Pin 10x headroom at
    the driver's SF so a fixture regen with longer documents fails HERE
    (with this explanation) instead of as an inscrutable driver hash
    mismatch. Spark-side repeated_spans itself is unbounded."""
    import duckdb

    max_toks = duckdb.sql(
        "SELECT max(len(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'))) "
        "FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchone()[0]
    assert max_toks * 10 < 100_000, max_toks


def test_cut_spans_keeps_tokenless_docs(spark):
    # r6 review finding: empty/whitespace-only docs never reach
    # posexplode but must still appear in the output with ("", 0).
    from anti_money_laundering_spark.dedup import cut_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long, span_tokens long"
    )
    out = {r.doc_id: (r.text_clean, r.n_cut_tokens) for r in cut_spans(df, spans, "doc_id", "text").collect()}
    assert out == {1: ("a b c", 0), 2: ("", 0), 3: ("", 0)}


def test_winnowing_matches_bruteforce_and_guarantee(spark):
    """Winnowing (r7): the distributed selection must equal the
    reference algorithm (per-window min of hash*2^21+pos, full windows
    only, short docs take the global min, empty docs nothing), and the
    scheme's guarantee must hold: two documents sharing a token run of
    >= window+k-1 tokens share at least one fingerprint hash."""
    import hashlib
    import random
    import re

    from anti_money_laundering_spark.dedup import winnow_fingerprints

    K, W = 5, 4

    def brute(text):
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if not toks:
            return set()
        grams = (
            [" ".join(toks)]
            if len(toks) < K
            else [" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)]
        )
        keys = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) * (1 << 21) + i
            for i, g in enumerate(grams)
        ]
        if len(keys) <= W:
            sel = {min(keys)}
        else:
            sel = {min(keys[i : i + W]) for i in range(len(keys) - W + 1)}
        return {(k % (1 << 21), k // (1 << 21)) for k in sel}

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for d in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=K, window=W).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    for d, text in rows:
        assert got.get(d, set()) == brute(text), (d, text)

    shared = " ".join(rng.choice(vocab) for _ in range(W + K - 1))
    pair = spark.createDataFrame(
        [(0, "alpha beta " + shared + " zeta"), (1, "theta " + shared + " gamma delta")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(pair, "doc_id", "text", k=K, window=W).collect()
    h0 = {r.gram_hash for r in fps if r.doc_id == 0}
    h1 = {r.gram_hash for r in fps if r.doc_id == 1}
    assert h0 & h1, "winnowing guarantee violated"


def test_tfidf_hashed_cosines_stay_off_rounding_boundaries(spark, sf_dir):
    """Pre-driver pin for the tfidf_similar_pairs oracle's ONE
    non-rational ingredient (r8 review finding): idf = ln((N+1)/(df+1))
    relies on JVM Math.log and DuckDB libm ln() agreeing — MEASURED to
    differ in the last ulp on this fixture (e.g. 0.2556007614615914 vs
    ...44), so bit-identity is unachievable and round(6) tolerance is
    what actually protects the hash compare, exactly as it has for the
    ledger-green exact twin since r1. This pin verifies the two
    conditions under which that protection is airtight at the fixture
    SFs: (a) the engines' weight tables agree to <= 1e-12 relative
    (so cosine wiggle is ~1e-12 too), and (b) NO compared cosine sits
    within 1e-9 of a round-half-to-6-decimals boundary — a 1000x
    safety margin. If a fixture regen ever fails (b), drop the oracle
    to rows-only BEFORE the driver runs (the minhash-recall-pin
    protocol)."""
    import duckdb

    from anti_money_laundering_spark.plans.llm_queries import (
        _DUCK_TOKS,
        _duck_hash_bucket,
        _shared_verified_pairs,
    )
    from anti_money_laundering_spark.sources import load_table
    from anti_money_laundering_spark.text_ml import (
        tfidf_hashed_cosine_pairs,
        tfidf_hashed_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["doc"], r["bucket"]): r["w"] for r in tfidf_hashed_weights(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict()
    for doc, bucket, w in con.execute(f"""
        WITH bcnt AS (
            SELECT doc_id AS doc, {_duck_hash_bucket("tok", "tfidf-v1", 4096)} AS bucket,
                   count(*) AS cnt
            FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
            GROUP BY 1, 2
        ),
        idf AS (
            SELECT bucket,
                   ln(((SELECT count(*) FROM documents) + 1.0)
                      / (count(DISTINCT doc) + 1.0)) AS idf
            FROM bcnt GROUP BY bucket
        )
        SELECT doc, bcnt.bucket, cnt * idf AS w
        FROM bcnt JOIN idf ON idf.bucket = bcnt.bucket
    """).fetchall():
        want[(doc, bucket)] = w
    assert set(got) == set(want)  # bucket assignment (md5) must be exact
    worst = max(abs(got[k] - want[k]) / max(abs(want[k]), 1e-300) for k in want)
    assert worst <= 1e-12, f"weight tables diverged beyond ulp noise: {worst}"

    pairs = _shared_verified_pairs(spark, sf_dir).select("id_a", "id_b")
    cosines = [
        r["tfidf_cosine"]
        for r in tfidf_hashed_cosine_pairs(docs, pairs).collect()
    ]
    assert cosines
    # margin is in SCALED units (1.0 here = 1e-6 of cosine), so the
    # 1e-9-of-cosine guard is 1e-3 scaled (r8 review: a 1e-9 scaled
    # threshold would only enforce 1e-15 of cosine — BELOW the 1e-12
    # wiggle condition (a) permits)
    margin = min(abs((abs(c) * 1e6) % 1.0 - 0.5) for c in cosines)
    assert margin > 1e-3, f"a cosine sits {margin * 1e-6} from a round(6) boundary"


def test_split_leakage_audit_python_md5_replay(spark, sf_dir):
    """Out-of-family check for split_leakage_audit: recompute the
    naive doc_id split in pure python (hashlib md5 — independent of
    both engines' md5/conv expressions) and assert (a) every audited
    pair's split labels match the python replay and genuinely differ,
    and (b) COMPLETENESS — every verified near-dup pair whose python
    splits differ is in the audit output (the filter drops nothing it
    shouldn't)."""
    import hashlib

    from anti_money_laundering_spark.plans.catalog import get_catalog
    from anti_money_laundering_spark.plans.llm_queries import _shared_verified_pairs

    def py_split(doc_id: int) -> str:
        b = int(hashlib.md5(f"split-v1{doc_id}".encode()).hexdigest()[:8], 16) % 10000
        return "train" if b < 8000 else ("val" if b < 9000 else "test")

    got = {
        (r.id_a, r.id_b): (r.split_a, r.split_b)
        for r in get_catalog()["split_leakage_audit"].fn(spark, sf_dir).collect()
    }
    for (a, b), (sa, sb) in got.items():
        assert sa == py_split(a) and sb == py_split(b), (a, b)
        assert sa != sb
    all_pairs = [
        (r.id_a, r.id_b)
        for r in _shared_verified_pairs(spark, sf_dir).select("id_a", "id_b").collect()
    ]
    want = {(a, b) for a, b in all_pairs if py_split(a) != py_split(b)}
    assert set(got) == want
    assert want, "fixture must produce at least one leaking pair"


def test_similarity_histogram_hand_case(spark):
    """Hand-computed calibration curve over a planted pair set,
    pinning the round-before-floor band rule: a raw jaccard of
    0.74999999 rounds to 0.75 at 6 dp and must land in the 75 band
    (raw-double floor would put it in 70); 0.7449999 stays at 70.
    Cumulative counts are at-or-above per 5-point band."""
    import anti_money_laundering_spark.plans.llm_queries as lq

    pairs = spark.createDataFrame(
        [
            (1, 2, 0.70),
            (3, 4, 0.7449999),
            (5, 6, 0.74999999),  # round(.,6) = 0.75 -> band 75
            (7, 8, 0.83),
            (9, 10, 1.0),
        ],
        "id_a long, id_b long, jaccard double",
    )
    orig = lq._shared_verified_pairs
    lq._shared_verified_pairs = lambda spark, sf_dir: pairs
    try:
        got = {
            r.band_pct: r
            for r in lq.dedup_similarity_histogram(spark, "x").collect()
        }
    finally:
        lq._shared_verified_pairs = orig
    assert {b: (got[b].n_pairs, got[b].n_at_or_above) for b in got} == {
        70: (2, 5), 75: (1, 3), 80: (1, 2), 100: (1, 1),
    }
