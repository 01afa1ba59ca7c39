"""Text-analysis column expressions (LLM-data-pipeline operators).

Everything here is a pure ``pyspark.sql`` Column expression — JVM-side,
whole-stage-codegen'd, no Python in the hot path. These are the
building blocks for the dedup / quality / language operators over the
``documents`` table (BASELINE.json north star; the reference itself has
no text pipeline — its scalar-function surface is SURVEY.md §2.7).

All helpers take the *name* (or SQL expression string) of the input
column so higher-order functions (transform/filter/aggregate) can be
composed as expression text.

Determinism: hashes are ``xxhash64`` (Spark built-in, seed-stable), so
MinHash/SimHash signatures are reproducible across runs and cluster
sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "tokens_sql",
    "chunk_udtf",
    "tokens",
    "token_count",
    "distinct_token_count",
    "SUBWORD_PATTERN",
    "subword_token_count",
    "word_shingles",
    "minhash_signature",
    "MINHASH_A",
    "MINHASH_B",
    "MINHASH_MAX_HASHES",
    "MINHASH_P",
    "simhash64",
    "hamming64",
    "argmax_case_sql",
    "lang_id",
    "lang_id_trigram",
    "lang_id_trigram_sql",
    "quality_features",
    "fingerprint_md5",
    "STOPWORDS",
    "TRIGRAM_PROFILES",
]


#: Explicit whitespace class used in every tokenizing regex instead of
#: ``\s``: Java's \s includes \x0B (vertical tab), RE2's (DuckDB) does
#: not, so a VT-bearing document would tokenize differently on the two
#: sides of the correctness gate. This class is identical under both
#: engines. Regex text: ``[ \t\n\r\f\x0B]``.
WS_CLASS = r"[ \t\n\r\f\x0B]"

#: The same class escaped for a Spark SQL string literal (the SQL
#: parser unescapes ``\\`` once before the regex engine sees it).
_WS_SQL = r"[ \\t\\n\\r\\f\\x0B]"


def tokens_sql(col: str) -> str:
    """SQL text for: lowercased whitespace tokens of ``col``, empties
    dropped. Composable inside higher-order expressions."""
    return f"filter(split(lower({col}), '{_WS_SQL}+'), t -> t != '')"


def tokens(col: str) -> Column:
    return F.expr(tokens_sql(col))


def token_count(col: str) -> Column:
    return F.expr(f"size({tokens_sql(col)})").cast("long")


def distinct_token_count(col: str) -> Column:
    return F.expr(f"size(array_distinct({tokens_sql(col)}))").cast("long")


#: GPT-2-style BPE pre-tokenization pattern, simplified to be
#: lookahead-free so the SAME pattern runs under Java regex (Spark) and
#: RE2 (DuckDB oracles): contraction suffixes, optionally space-prefixed
#: letter runs, digit runs, other-symbol runs, then whitespace runs.
#: Counting its matches approximates a BPE tokenizer's pre-merge token
#: count — the budget metric training-data pipelines size corpora with.
#: Whitespace is the explicit WS_CLASS (not ``\s``) for Java/RE2 parity.
SUBWORD_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    rf"| ?[^ \t\n\r\f\x0B\p{{L}}\p{{N}}]+|{WS_CLASS}+"
)


def subword_token_count(col: str) -> Column:
    """BPE-ish subword token count (matches of SUBWORD_PATTERN) — a
    codegen'd regexp_extract_all, no Python in the hot path."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(SUBWORD_PATTERN), 0)).cast("long")


def word_shingles(col: str, k: int = 3) -> Column:
    """Word k-shingles (the MinHash input unit). Documents shorter than
    k tokens yield their full token string as a single shingle."""
    t = tokens_sql(col)
    return F.expr(
        f"CASE WHEN size({t}) < {k} THEN array(array_join({t}, ' ')) "
        f"ELSE transform(sequence(0, size({t}) - {k}), "
        f"i -> array_join(slice({t}, i + 1, {k}), ' ')) END"
    )


import random as _random

_rng = _random.Random(0x5EED)
#: Universal multiply-mod MinHash family h_i(x) = (a_i*x + b_i) mod p
#: over the 31-bit base hash x = xxhash64(shingle) & (p), p = 2^31-1
#: (Mersenne prime). One string hash per shingle (not num_hashes of
#: them); each h_i is a codegen'd multiply/add/pmod. a_i < 2^31 and
#: x < 2^31 keep a_i*x + b_i < 2^63, so ANSI-mode long arithmetic can
#: never overflow — and the mod-p wrap is what makes each h_i an
#: independent-looking permutation (a plain a*x+b is monotone in x:
#: every h_i would pick the SAME min shingle).
MINHASH_MAX_HASHES = 64
MINHASH_P = (1 << 31) - 1
MINHASH_A: tuple[int, ...] = tuple(
    _rng.randrange(1, MINHASH_P) for _ in range(MINHASH_MAX_HASHES)
)
MINHASH_B: tuple[int, ...] = tuple(
    _rng.randrange(0, MINHASH_P) for _ in range(MINHASH_MAX_HASHES)
)


def minhash_signature(shingle_col: str, num_hashes: int = 32) -> Column:
    """MinHash signature: element i = min over shingles of
    (a_i * (xxhash64(s) & p) + b_i) mod p — a 2-universal multiply-mod
    family over one shared base hash; P(sig_a[i] = sig_b[i]) =
    Jaccard(a, b) (Broder 1997). ``shingle_col`` must be an
    array<string> column. Reference formulation (lambda, interpreted)
    of the codegen'd aggregate in dedup.minhash_signatures — kept
    value-identical for the parity test."""
    if num_hashes > MINHASH_MAX_HASHES:
        raise ValueError(f"num_hashes must be <= {MINHASH_MAX_HASHES}")
    a_arr = ", ".join(str(a) for a in MINHASH_A[:num_hashes])
    b_arr = ", ".join(str(b) for b in MINHASH_B[:num_hashes])
    return F.expr(
        f"transform(sequence(0, {num_hashes - 1}), "
        f"h -> array_min(transform({shingle_col}, "
        f"s -> pmod(element_at(array({a_arr}), h + 1) * (xxhash64(s) & {MINHASH_P}) "
        f"+ element_at(array({b_arr}), h + 1), {MINHASH_P}))))"
    )


def simhash64(col: str) -> Column:
    """64-bit SimHash (Charikar 2002): bit b of the output is the sign
    of the sum over tokens of +/-1 according to bit b of the token's
    xxhash64. Near-duplicate docs differ in few bits."""
    t = tokens_sql(col)
    return F.expr(
        f"""aggregate(
              sequence(0, 63), 0L,
              (acc, b) -> acc + CASE WHEN aggregate(
                  {t},
                  0L,
                  (s, tok) -> s + CASE WHEN (shiftright(xxhash64(tok), b) & 1) = 1
                                 THEN 1L ELSE -1L END
              ) > 0 THEN shiftleft(1L, b) ELSE 0L END
            )"""
    )


def hamming64(a: str, b: str) -> Column:
    """Hamming distance between two int64 SimHash columns."""
    return F.expr(f"bit_count({a} ^ {b})")


#: Minimal per-language stopword lists for the stopword-counting
#: language heuristic. Deliberately tiny and ASCII so the same counting
#: is expressible in the DuckDB oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def _stop_count_sql(col: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({tokens_sql(col)}, t -> array_contains(array({arr}), t)))"


def argmax_case_sql(counts: dict[str, str], default: str = "und") -> str:
    """The argmax-with-first-wins-ties CASE expression over named count
    expressions: a key wins if its count > 0, strictly exceeds every
    EARLIER key's count and >= every LATER key's count; ``default``
    when nothing fires. THE single definition of this tie-break (review
    finding: four hand-maintained copies across the Spark classifiers
    and their DuckDB oracle rebuilds could drift and silently break the
    parity gate). Emits only portable SQL around the provided count
    expressions, so the same text serves both engines when the counts
    do."""
    expr = "CASE "
    keys = list(counts)
    for i, key in enumerate(keys):
        conds = [f"{counts[key]} > 0"]
        for j, other in enumerate(keys):
            if j == i:
                continue
            op = ">" if j < i else ">="
            conds.append(f"{counts[key]} {op} {counts[other]}")
        expr += f"WHEN {' AND '.join(conds)} THEN '{key}' "
    return expr + f"ELSE '{default}' END"


def lang_id(col: str) -> Column:
    """Heuristic language ID: argmax of per-language stopword counts,
    'und' (undetermined) when no stopwords hit. Ties break in
    STOPWORDS key order (first language wins — deterministic)."""
    return F.expr(
        argmax_case_sql({lang: _stop_count_sql(col, ws) for lang, ws in STOPWORDS.items()})
    )


def quality_features(col: str) -> dict[str, Column]:
    """Document-quality signals: length, token stats, punctuation and
    stopword ratios, mean token length. All plain arithmetic — usable
    as filter predicates for corpus cleaning."""
    t = tokens_sql(col)
    n_tok = F.expr(f"size({t})")
    n_chars = F.length(F.col(col))
    punct = n_chars - F.length(F.translate(F.col(col), ".,;:!?'\"", ""))
    en_stops = F.expr(_stop_count_sql(col, STOPWORDS["en"]))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "n_distinct_tokens": F.expr(f"size(array_distinct({t}))").cast("long"),
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": en_stops / F.greatest(n_tok, F.lit(1)),
        "mean_token_len": (n_chars - n_tok + 1) / F.greatest(n_tok, F.lit(1)),
    }


def fingerprint_md5(col: str) -> Column:
    """Canonical-form document fingerprint: md5 of the
    whitespace-normalized, lowercased text — the exact-dedup key."""
    return F.md5(F.expr(f"array_join({tokens_sql(col)}, ' ')"))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: Column | str,
    target_len: int,
    num_shards: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LM-training
    layout: documents are concatenated in a deterministic order and
    the token stream is cut into fixed ``target_len`` context windows.
    Output per document: its shard, the token offset where it starts,
    the chunk (bin) containing that start, and whether it crosses a
    chunk boundary (gets split across training sequences).

    A GLOBAL concatenation order would serialize the corpus through
    one partition, so the stream is sharded first: shard =
    md5-bucket(id) (deterministic, rerun-stable — same discipline as
    sampling.hash_bucket), and packing runs independently per shard
    with one window (cumulative sum ordered by id). One shuffle on
    shard, O(1) state per row, any corpus size; the per-shard padding
    waste (< target_len tokens at each shard's tail) is amortized to
    nothing when shards carry millions of tokens.
    """
    from anti_money_laundering_spark.sampling import hash_bucket

    tok = F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    w = Window.partitionBy("shard").orderBy(id_col)
    out = df.select(
        F.col(id_col),
        tok.cast("long").alias("n_tokens"),
        hash_bucket(id_col, buckets=num_shards, salt="pack-v1").alias("shard"),
    )
    out = out.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)).cast("long"),
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / target_len).cast("long").alias("bin_id"),
        (
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / target_len)
            > F.floor(F.col("start_offset") / target_len)
        ).alias("crosses_boundary"),
    )


def morton_code(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns
    into one locality-preserving sort key — the data-layout trick
    behind Delta's OPTIMIZE ZORDER: sort/partition files by the code
    and ranges selective in EITHER dimension map to few contiguous
    code ranges, so parquet min/max row-group stats prune both ways
    from ONE layout.

    Pure codegen'd bit arithmetic (shift/or/and over longs), ``bits``
    per dimension (values are masked to that width; pre-bucket wider
    domains). DuckDB replays the identical expression, so layouts are
    oracle-checkable.
    """
    return morton_code_n([x, y], bits=bits)


def morton_code_n(cols: list, bits: int | None = None) -> Column:
    """N-dimensional Z-order interleave (Delta's OPTIMIZE ZORDER BY
    accepts any column count): bit ``i`` of dimension ``j`` lands at
    output position ``i*n + j`` — round-robin interleave, so range
    predicates on ANY dimension map to contiguous code ranges at the
    same ~1/n resolution. ``bits`` per dimension defaults to the
    maximum fitting a signed long (``63 // n``); values are masked to
    that width, so pre-bucket wider domains (compact() does this).
    For n=2 this is bit-identical to :func:`morton_code`."""
    n = len(cols)
    if n < 2:
        raise ValueError("morton_code_n interleaves >= 2 columns")
    if bits is None:
        bits = 63 // n
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long (63)")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.lit(1 << i).cast("long")
        for j, c in enumerate(cs):
            # source bit i -> target bit i*n + j: shift by i*(n-1) + j
            out = out.bitwiseOR(F.shiftleft(c.bitwiseAND(bit), i * (n - 1) + j))
    return out


def chunk_udtf():
    """Spark 4 Python UDTF (table function): explode a document into
    fixed-size token chunks with positions — the ONE API family the
    engine hadn't demonstrated (SURVEY §2.12; the reference defines
    zero UDFs and this engine keeps hot paths in native expressions).

    This is deliberately the ESCAPE HATCH, not a hot path: a UDTF runs
    rows through Python (Arrow-batched here via useArrow), so the
    production formulation of this exact operation is the codegen'd
    ``sequence``+``slice`` expression in plans/llm_queries
    (pack_sequences); the UDTF exists for logic that genuinely cannot
    be expressed as expressions (external library calls per row
    group). Returns the UDTF handle; register with
    ``spark.udtf.register("chunk_doc", chunk_udtf())`` for SQL
    ``LATERAL`` use or call it directly over columns.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, chunk string", useArrow=True)
    class ChunkDoc:
        def eval(self, text: str, size: int):  # noqa: D401
            if text is None:
                return
            toks = [t for t in text.lower().split() if t]
            for i in range(0, len(toks), size):
                yield i // size, " ".join(toks[i : i + size])

    return ChunkDoc


#: Character-trigram profiles (top distinctive trigrams per language,
#: ASCII-only so length/replace counting is identical across engines).
#: The complement to the stopword heuristic: trigram evidence fires on
#: morphology (ing/sch/que) even when function words are rare, the
#: classic Cavnar-Trenkle n-gram angle at k=3.
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "and", " an", "ing", "ng ", " of", "ion"),
    "de": ("der", " de", "ein", "ich", "sch", "che", "die", "und", "en "),
    "fr": (" le", "le ", "ent", "les", " la", "que", "des", "ais", "ons"),
    "es": ("de ", " la", "el ", " el", "que", " qu", "los", "cio", "ado"),
}


def _trigram_score_sql(col: str, grams: tuple[str, ...]) -> str:
    """SQL (Spark AND DuckDB portable) for the summed occurrence count
    of ``grams`` in lowercased space-padded ``col``: each occurrence of
    a 3-char gram removes 3 chars under replace(), so the length delta
    counts occurrences x3 — the /3 is dropped since a uniform scale
    cannot change an argmax."""
    padded = f"(' ' || lower({col}) || ' ')"
    terms = [
        f"(length({padded}) - length(replace({padded}, '{g}', '')))" for g in grams
    ]
    return "(" + " + ".join(terms) + ")"


def lang_id_trigram_sql(col: str) -> str:
    """The full CASE expression as SQL text — valid VERBATIM under both
    Spark SQL and DuckDB (lower/replace/length/|| only), which is what
    lets the catalog oracle replay the identical classifier."""
    return argmax_case_sql(
        {lang: _trigram_score_sql(col, grams) for lang, grams in TRIGRAM_PROFILES.items()}
    )


def lang_id_trigram(col: str) -> Column:
    """Character-trigram language ID (Cavnar-Trenkle style at k=3):
    argmax of per-language profile-trigram occurrence counts, 'und'
    when nothing fires, ties broken in TRIGRAM_PROFILES key order.
    Pure length/replace arithmetic — codegen'd, no explode, and the
    identical SQL runs under DuckDB for the oracle. Complements the
    stopword heuristic: trigram evidence fires on morphology
    (ing/sch/que) even when function words are rare."""
    return F.expr(lang_id_trigram_sql(col))
