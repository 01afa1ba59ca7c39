"""Curation-operator tests: closed-form n-gram overlap/decontamination,
shard-manifest conservation, and rebalance determinism + bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from anti_money_laundering_spark.curation import (
    decontaminate,
    doc_ngrams,
    ngram_overlap,
    quality_screen,
    rebalance_to_min_source,
    redact_pii,
    repetition_scores,
    shard_manifest,
)
from anti_money_laundering_spark.sources import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_ngrams_closed_form(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "x x x x x")])
    out = {(r.id, r.ngram) for r in doc_ngrams(df, n=3).collect()}
    # doc 2 is shorter than n -> no grams; doc 3's repeats collapse
    assert out == {(1, "a b c"), (1, "b c d"), (3, "x x x")}


def test_ngram_overlap_and_decontaminate_closed_form(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),   # shares 2 distinct 3-grams
            (2, "totally unrelated words here"),
            (3, "quick brown fox somewhere"),   # shares 1
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox ran")])
    ov = {r.doc_id: r.n_shared_ngrams for r in ngram_overlap(corpus, bench, n=3).collect()}
    assert ov == {1: 2, 3: 1}  # doc 2 absent: no shared grams at all
    clean = decontaminate(corpus, bench, n=3, max_shared=1)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 3]  # doc1 dropped (2 > 1)
    # max_shared=0: any shared gram contaminates
    strict = decontaminate(corpus, bench, n=3, max_shared=0)
    assert sorted(r.doc_id for r in strict.collect()) == [2]


def test_shard_manifest_conserves_totals(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    man = shard_manifest(docs, n_shards=8).collect()
    assert {r.shard for r in man} <= set(range(8))
    assert sum(r.n_docs for r in man) == docs.count()
    total_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert sum(r.n_chars for r in man) == total_chars
    # content-hash stability: rerunning yields the identical manifest
    again = shard_manifest(docs, n_shards=8).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, again))


def test_rebalance_bounds_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = rebalance_to_min_source(docs)
    per_src = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_min = min(
        r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    )
    # every stratum lands within hash-noise of the min-source size:
    # bucket-uniformity bounds |kept - n_min| by ~sqrt scatter, and the
    # keep rule can never take MORE than ceil(n_min/n_src * n_src)-ish
    for src, n in per_src.items():
        assert n <= n_min * 1.5 + 5, (src, n, n_min)
        assert n >= n_min * 0.5 - 5, (src, n, n_min)
    # schema passthrough + determinism
    assert set(kept.columns) == set(docs.columns)
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in rebalance_to_min_source(docs).collect())
    assert a == b


def test_repetition_scores_closed_form(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a b"),           # top share 4/5; bigrams: aa aa aa ab -> 2 distinct of 4
            (2, "w x y z"),             # no repetition
            (3, "solo"),                # single token: no bigrams
        ],
    )
    out = {r.doc_id: r for r in repetition_scores(df).collect()}
    assert out[1].n_tokens == 5
    assert abs(out[1].top_token_share - 0.8) < 1e-9
    assert abs(out[1].dup_2gram_frac - 0.5) < 1e-9
    assert out[2].top_token_share == 0.25 and out[2].dup_2gram_frac == 0.0
    assert out[3].n_tokens == 1 and out[3].dup_2gram_frac == 0.0


def test_quality_screen_rules(spark):
    long_clean = " ".join(f"tok{i}" for i in range(30))
    spam = " ".join(["spam"] * 30)
    # 10 DISTINCT tokens: short (< 20) but top share 0.1 <= 0.12, so
    # exactly one rule fires (fewer distinct tokens would trip the
    # share rule too: 1/n > 0.12 for n < 9)
    short = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(1, long_clean), (2, spam), (3, short)])
    out = {r.doc_id: r for r in quality_screen(df).collect()}
    assert out[1].keep and out[1].n_violations == 0
    assert not out[2].keep and out[2].n_violations == 2  # top share + dup bigrams
    assert not out[3].keep and out[3].n_violations == 1  # too short only


def test_redact_pii_counts_and_replacement(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@example.co.uk or call 555-123-4567"),
            (2, "server 10.0.12.34 ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "[EMAIL]" in out[1].text_redacted and "[PHONE]" in out[1].text_redacted
    assert "example" not in out[1].text_redacted
    assert out[2].n_ipv4 == 1 and out[2].n_ssn == 1
    assert "[IPV4]" in out[2].text_redacted and "[SSN]" in out[2].text_redacted
    assert out[3].text_redacted == "nothing sensitive here"
    assert out[3].n_email == out[3].n_phone == out[3].n_ipv4 == out[3].n_ssn == 0


def test_decontaminate_empty_benchmark_keeps_corpus(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma"), (2, "delta eps zeta")])
    bench = _docs(spark, []).limit(0)
    out = decontaminate(corpus, bench, n=3)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_ngram_overlap_n_larger_than_docs_is_empty(spark):
    corpus = _docs(spark, [(1, "a b"), (2, "c")])
    bench = _docs(spark, [(9, "a b")])
    assert ngram_overlap(corpus, bench, n=5).count() == 0


def test_redact_pii_custom_patterns_and_counts_before_redaction(spark):
    """Counts are computed BEFORE redaction: a pattern whose match is
    contained in another's replacement must still count."""
    from anti_money_laundering_spark.curation import redact_pii

    df = _docs(spark, [(1, "id ABC-123 and ABC-999")])
    out = redact_pii(df, patterns={"code": r"ABC-\d{3}"}).collect()[0]
    assert out.n_code == 2
    assert out.text_redacted == "id [CODE] and [CODE]"


def test_decontaminate_external_id_space_opt_out(spark):
    """External benchmark suites with their own id space must not
    collide-drop unrelated corpus docs: with drop_benchmark_ids=False
    only overlap evidence removes documents."""
    corpus = _docs(spark, [(100, "totally unrelated words here"), (2, "x y z")])
    bench = _docs(spark, [(100, "the quick brown fox ran")])  # id collides
    kept = decontaminate(corpus, bench, n=3, drop_benchmark_ids=False)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 100]
    # default behavior (benchmark ⊆ corpus id space) still subtracts
    kept_default = decontaminate(corpus, bench, n=3)
    assert sorted(r.doc_id for r in kept_default.collect()) == [2]


def test_rebalance_target_mix_proportions_and_binding_stratum(spark, sf_dir):
    """Target-mix rebalancing: kept counts track w_s·K where
    K = min(n_s/w_s); the binding stratum is kept (nearly) whole,
    zero-weight sources are dropped, and selection is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    srcs = [r.source for r in docs.select("source").distinct().collect()]
    a, b, c = sorted(srcs)[:3]
    weights = {a: 0.5, b: 0.25, c: 0.25}
    from anti_money_laundering_spark.curation import rebalance_to_target_mix

    kept = rebalance_to_target_mix(docs, weights)
    per = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per) <= {a, b, c}  # zero-weight sources dropped
    n = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    K = min(n[s] / w for s, w in weights.items())
    for s, w in weights.items():
        target = w * K
        assert abs(per.get(s, 0) - target) <= max(5, 0.5 * target), (s, per.get(s), target)
    # determinism
    again = rebalance_to_target_mix(docs, weights)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # uniform weights reduce to ~the min-source behavior
    uni = rebalance_to_target_mix(docs, {s: 1.0 for s in srcs})
    per_u = {r.source: r.n for r in uni.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_min = min(n.values())
    for s, cnt in per_u.items():
        assert abs(cnt - n_min) <= max(5, 0.5 * n_min), (s, cnt, n_min)


def test_decontaminate_partial_id_collision_raises(spark):
    """r5 advice: a benchmark id space PARTIALLY overlapping the corpus
    is the colliding-external-suite symptom — the id anti-join would
    silently drop an unrelated corpus doc, so decontaminate refuses
    unless the caller opts out of id-dropping or validation."""
    import pytest

    corpus = _docs(spark, [(100, "totally unrelated words here"), (2, "x y z")])
    # id 100 collides with an unrelated corpus doc; id 500 is external
    bench = _docs(spark, [(100, "the quick brown fox ran"), (500, "lorem ipsum dolor")])
    with pytest.raises(ValueError, match="partially collides"):
        decontaminate(corpus, bench, n=3)
    # evidence-only mode never needs the id check
    kept = decontaminate(corpus, bench, n=3, drop_benchmark_ids=False)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 100]
    # explicit validation opt-out restores the old (documented) behavior
    kept_forced = decontaminate(corpus, bench, n=3, validate_ids=False)
    assert sorted(r.doc_id for r in kept_forced.collect()) == [2]
    # fully-disjoint external suites pass validation (id drop is a no-op)
    disjoint = _docs(spark, [(900, "the quick brown fox ran")])
    kept_disjoint = decontaminate(corpus, disjoint, n=3)
    assert sorted(r.doc_id for r in kept_disjoint.collect()) == [2, 100]


def test_ngram_lm_scores_match_pure_python(spark):
    """The bigram LM must reproduce hand-computed add-k probabilities:
    same tokenizer, V over the WHOLE corpus (including one-token docs),
    one-token docs dropped from the output (no bigram evidence)."""
    import math
    from collections import Counter

    from anti_money_laundering_spark.text_ml import ngram_lm_scores

    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "mat",  # single token: counts toward V, no score row
        4: "a dog sat on a mat",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_lm_scores(df, add_k=1.0).collect()}
    assert 3 not in got

    toks = {d: t.split() for d, t in texts.items()}
    vocab = {w for ws in toks.values() for w in ws}
    pairs = [(ws[i], ws[i + 1]) for ws in toks.values() for i in range(len(ws) - 1)]
    cab = Counter(pairs)
    cprev = Counter(p for p, _ in pairs)
    for d, ws in toks.items():
        ps = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if not ps:
            continue
        want = sum(
            math.log((cab[p] + 1.0) / (cprev[p[0]] + len(vocab))) for p in ps
        ) / len(ps)
        assert got[d]["n_bigrams"] == len(ps)
        assert abs(got[d]["avg_logprob"] - want) < 1e-9, d


def _py_bpe(texts, n_merges, min_count=2):
    """Pure-Python BPE reference: freq-weighted pair counts over the
    word dict, argmax with (count desc, pair lexicographic) ties,
    left-to-right non-overlapping merge application."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += words[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        n = counts[pair]
        if n < min_count:
            break
        merges.append((pair[0], pair[1], n))
        a, b = pair
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_learn_bpe_matches_pure_python(spark):
    """Merge list AND final vocab segmentation must equal the textbook
    reference exactly — including the 'aaaa' overlap case (left-to-right
    non-overlapping: aa+aa, never a+aaa) and deterministic tiebreaks."""
    from anti_money_laundering_spark.tokenizer import bpe_segment, learn_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest aaaa aaaa",
        "low new wide banana bandana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, vocab_df = learn_bpe(df, n_merges=12, min_count=2)
    want_merges, want_vocab = _py_bpe(texts, 12, min_count=2)
    assert merges == want_merges
    got_vocab = {r["w"]: list(r["syms"]) for r in vocab_df.collect()}
    assert got_vocab == want_vocab

    # segmentation with the learned table reproduces the trained vocab
    seg = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        want = [s for w in t.lower().split() for s in want_vocab[w]]
        assert seg[i] == want, i


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from anti_money_laundering_spark.tokenizer import bpe_pair_counts

    df = spark.createDataFrame([(1, "ab ab AB cd")], "doc_id long, text string")
    got = {(r["sym_a"], r["sym_b"]): r["n"] for r in bpe_pair_counts(df).collect()}
    assert got == {("a", "b"): 3, ("c", "d"): 1}
