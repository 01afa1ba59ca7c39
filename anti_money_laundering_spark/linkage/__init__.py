"""Probabilistic record linkage: Fellegi–Sunter with EM training
(SURVEY.md §2.9, E1-E6).

The reference delegates linkage to Splink 2.x
(/root/reference/03_aml_entity_resolution.py:56-58, :131-133); this
module is the same pipeline re-expressed as native DataFrame plans:

1. **block** (E2) — candidate pairs via equi-join on blocking keys
   (never the O(n²) cartesian; /root/reference/03:36-38);
2. **compare** (E3) — per-column similarity discretized into ordered
   agreement levels ("gamma"), using JVM-side expressions
   (``levenshtein``, exact/abs-diff) so comparison stays codegen'd;
3. **EM fit** (A6) — expectation-maximization for the m/u probabilities
   and the match prior λ. Each iteration is ONE aggregate pass over the
   pair table (conditional sums per comparison level) with the current
   parameters folded in as literals — no per-row Python;
4. **score** (E4) — posterior ``match_probability`` and log2
   ``match_weight`` per pair, plus optional term-frequency adjustment
   (E3): agreement on a frequent value is weaker evidence, so the
   agreement-level u is replaced by the value's relative frequency.

Scale posture: the pair table is only ever as large as the blocking
rules allow; EM state is a handful of driver-side floats broadcast back
into expressions (no shuffle of parameters); every pass is a single
partial-aggregated scan of the cached gamma table.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Comparison",
    "exact_comparison",
    "levenshtein_comparison",
    "numeric_bucket_comparison",
    "candidate_pairs",
    "gamma_table",
    "em_fit",
    "score_pairs",
    "term_frequencies",
    "round_params",
    "match_weights",
    "link_dedupe",
]


# ---------------------------------------------------------------------------
# Comparison specs (E3)
# ---------------------------------------------------------------------------


@dataclass
class Comparison:
    """One comparison column: an ordered list of agreement levels.

    ``levels[i]`` is a predicate over ``<col>_l`` / ``<col>_r``; the
    gamma value is the index of the FIRST matching predicate counting
    from the strongest (len(levels)) down to 1, else 0 (disagreement).
    ``n_levels`` = len(levels) + 1 including gamma=0.
    """

    name: str
    levels: list[Column] = field(default_factory=list)
    tf_col: str | None = None  #: apply term-frequency adjustment on this source column

    @property
    def n_levels(self) -> int:
        return len(self.levels) + 1

    def gamma_expr(self) -> Column:
        """CASE chain, strongest level first (Splink's convention:
        higher gamma = stronger agreement)."""
        expr = F.lit(0)
        for i, cond in enumerate(self.levels):  # levels[0] is strongest
            level_val = len(self.levels) - i
            expr = F.when(cond, F.lit(level_val)) if i == 0 else expr.when(cond, F.lit(level_val))
        return expr.otherwise(F.lit(0)).alias(f"gamma_{self.name}")


def _l(col: str) -> Column:
    return F.col(f"{col}_l")


def _r(col: str) -> Column:
    return F.col(f"{col}_r")


def exact_comparison(col: str, tf_adjust: bool = False) -> Comparison:
    """gamma 1 = exact equal, 0 otherwise (03:47-49 country column)."""
    return Comparison(name=col, levels=[_l(col) == _r(col)], tf_col=col if tf_adjust else None)


def levenshtein_comparison(col: str, close: int = 2, tf_adjust: bool = False) -> Comparison:
    """gamma 2 = exact, 1 = levenshtein <= ``close``, 0 otherwise —
    the fuzzy string comparison the reference applies to names and
    addresses (03:39-46)."""
    return Comparison(
        name=col,
        levels=[
            _l(col) == _r(col),
            F.levenshtein(_l(col), _r(col)) <= close,
        ],
        tf_col=col if tf_adjust else None,
    )


def numeric_bucket_comparison(col: str, tolerance: float) -> Comparison:
    """gamma 2 = exact, 1 = |l-r| <= tolerance, 0 otherwise."""
    return Comparison(
        name=col,
        levels=[
            _l(col) == _r(col),
            F.abs(_l(col) - _r(col)) <= tolerance,
        ],
    )


# ---------------------------------------------------------------------------
# Blocking (E1/E2)
# ---------------------------------------------------------------------------


def candidate_pairs(
    df: DataFrame,
    unique_id: str,
    blocking_rules: list[list[str]],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs for dedupe (link_type=dedupe_only, 03:35): the
    union of equi-self-joins over each blocking rule's key columns,
    ordered ``uid_l < uid_r`` so each unordered pair appears once, then
    de-duplicated across rules.

    CONTRACT: ``unique_id`` must be unique per input row (the
    dedupe_only contract). With a SINGLE blocking rule the cross-rule
    dropDuplicates is ELIDED because uniqueness makes the
    equi-self-join emit each (l, r) at most once — a caller that
    passes duplicate ids gets duplicate pairs back rather than the
    silently-deduped output multi-rule blocking would produce (r10
    advice item 3). An id-uniqueness assertion is deliberately NOT
    performed inline: it would cost a full distinct-count action at
    plan-build time on every call; validate ids upstream (the catalog
    fixtures' keys are primary keys by construction).

    Output columns: ``uid_l``, ``uid_r``, and ``<col>_l``/``<col>_r``
    for every compared column. The join is keyed on the blocking
    columns, so Catalyst shuffles each side once on those keys — the
    cartesian never materializes (SURVEY §4 O3).
    """
    cols = compare_cols or [c for c in df.columns if c != unique_id]
    rule_keys = [k for rule in blocking_rules for k in rule]
    keep = [unique_id, *dict.fromkeys([*cols, *rule_keys])]
    base = df.select(*keep)
    parts = []
    for rule in blocking_rules:
        left = base.select(
            *[F.col(c).alias(f"{c}_l") for c in keep],
            *[F.col(k).alias(f"__bk_{k}") for k in rule],
        )
        right = base.select(
            *[F.col(c).alias(f"{c}_r") for c in keep],
            *[F.col(k).alias(f"__bk_{k}") for k in rule],
        )
        pairs = (
            left.join(right, [f"__bk_{k}" for k in rule])
            .filter(F.col(f"{unique_id}_l") < F.col(f"{unique_id}_r"))
            .drop(*[f"__bk_{k}" for k in rule])
        )
        parts.append(pairs)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if len(parts) > 1:
        # Cross-rule dedup: a pair blocked by two rules appears once per
        # rule. With a SINGLE rule the pairs are already distinct (the
        # equi-self-join emits each (l, r) once because ``unique_id`` is
        # unique — the dedupe_only contract), so the dropDuplicates
        # would be a pure extra shuffle over the full pair set — at
        # sf0.1's 4.5M nation-blocked pairs it was 90% of
        # linkage_relink_segment's wall (3.6 s -> 0.35 s measured,
        # SCALE.md §relink), and at 100 TB it is a pair-scale shuffle
        # that buys nothing.
        out = out.dropDuplicates([f"{unique_id}_l", f"{unique_id}_r"])
    return out.withColumnsRenamed({f"{unique_id}_l": "uid_l", f"{unique_id}_r": "uid_r"})


def gamma_table(pairs: DataFrame, comparisons: list[Comparison]) -> DataFrame:
    """Attach one ``gamma_<name>`` column per comparison (E3)."""
    return pairs.select("*", *[c.gamma_expr() for c in comparisons])


# ---------------------------------------------------------------------------
# EM training (A6) + Fellegi-Sunter scoring (E4)
# ---------------------------------------------------------------------------


def _default_params(level_spec: list[tuple[str, int]]) -> dict:
    """Deterministic init: m mass increases geometrically with the
    agreement level, u mass decreases — with DIFFERENT ratios (3 vs 5)
    so no level starts evidence-neutral (equal m and u at a level is an
    EM saddle: that level then never separates the classes).

    Takes ``(name, n_levels)`` pairs (not Comparison objects) so oracle
    generators can call it without an active SparkSession."""
    params: dict = {"lambda": 0.1, "m": {}, "u": {}}
    for name, k in level_spec:
        m_raw = [3.0**lvl for lvl in range(k)]
        u_raw = [5.0 ** (k - 1 - lvl) for lvl in range(k)]
        params["m"][name] = [v / sum(m_raw) for v in m_raw]
        params["u"][name] = [v / sum(u_raw) for v in u_raw]
    return params


_EPS = 1e-6


def em_fit(
    gammas: DataFrame,
    comparisons: list[Comparison],
    max_iter: int = 25,
    tol: float = 1e-5,
    init: dict | None = None,
    stats: dict | None = None,
) -> dict:
    """Fit λ and per-level m/u by EM over the gamma table.

    The E-step posterior depends only on the gamma PATTERN, so the
    sufficient statistics collapse onto the distinct-pattern histogram:
    ONE ``groupBy(γ…).count()`` job (integer counts — bit-exact and
    deterministic), then every EM iteration is driver-side arithmetic
    over at most ``∏ n_levels`` patterns. Zero additional cluster scans
    regardless of ``max_iter`` — at 100 TB the pair table is read once.
    Determinism (patterns iterated in sorted order) is what lets the
    catalog replay this exact fit in a DuckDB oracle
    (plans/linkage_queries.py).
    """
    params = init or _default_params([(c.name, c.n_levels) for c in comparisons])
    it = -1  # max_iter <= 0 => zero sweeps; stats must report 0, not crash
    gcols = [f"gamma_{c.name}" for c in comparisons]
    pat_rows = gammas.groupBy(*gcols).agg(F.count(F.lit(1)).alias("cnt")).collect()
    if not pat_rows:
        raise ValueError(
            "em_fit: empty gamma table — the blocking rules produced no candidate pairs"
        )
    patterns: list[tuple[tuple[int, ...], float]] = sorted(
        (tuple(int(r[g]) for g in gcols), float(r["cnt"])) for r in pat_rows
    )

    for it in range(max_iter):
        lam = params["lambda"]
        sum_p = 0.0  # Σ p·cnt  (m-class mass)
        u_tot = 0.0  # Σ (1-p)·cnt
        n = 0.0
        m_num = {c.name: [0.0] * c.n_levels for c in comparisons}
        u_num = {c.name: [0.0] * c.n_levels for c in comparisons}
        for g, cnt in patterns:
            m_prod = lam
            u_prod = 1.0 - lam
            for i, c in enumerate(comparisons):
                m_prod *= params["m"][c.name][g[i]]
                u_prod *= params["u"][c.name][g[i]]
            p = m_prod / (m_prod + u_prod)
            sum_p += p * cnt
            u_tot += (1.0 - p) * cnt
            n += cnt
            for i, c in enumerate(comparisons):
                m_num[c.name][g[i]] += p * cnt
                u_num[c.name][g[i]] += (1.0 - p) * cnt
        new_params: dict = {"lambda": min(max(sum_p / n, _EPS), 1 - _EPS), "m": {}, "u": {}}
        m_tot = max(sum_p, _EPS)
        ut = max(u_tot, _EPS)
        for c in comparisons:
            new_params["m"][c.name] = [
                min(max(v / m_tot, _EPS), 1 - _EPS) for v in m_num[c.name]
            ]
            new_params["u"][c.name] = [
                min(max(v / ut, _EPS), 1 - _EPS) for v in u_num[c.name]
            ]
        delta = abs(new_params["lambda"] - params["lambda"])
        params = new_params
        if it > 0 and delta < tol:
            break
    if stats is not None:
        # observability out-param (the connected_components convention):
        # how many EM sweeps ran, over how many distinct gamma patterns
        # (the driver-side work unit) collapsing how many pairs.
        stats["iterations"] = it + 1
        stats["n_patterns"] = len(patterns)
        stats["n_pairs"] = int(sum(cnt for _, cnt in patterns))
    return params


def term_frequencies(df: DataFrame, col: str, min_count: int = 1) -> DataFrame:
    """Relative frequency of each value — the TF-adjustment input
    (Splink's term_frequency_adjustments, 03:43, :53). Agreement on
    'John Smith' is weaker evidence than on a rare name.

    ``min_count`` floors the table: values seen fewer times are
    dropped and their pairs fall back to the level's baseline u in
    :func:`score_pairs`. NB this is a deliberate DEVIATION from
    Splink, which keeps every value: a singleton's tf = 1/N sits far
    BELOW u, so TF adjustment on rare values is the STRONGEST
    agreement evidence — flooring down-weights exactly those matches
    (ADVICE r3). The trade is scale: one row per *distinct* value of a
    name/address column is itself a huge table on a 100 TB corpus, but
    the rows surviving ``n >= min_count`` number at most N/min_count
    by construction. Default ``min_count=1`` keeps Splink semantics;
    opt into the floor when the TF table itself is a scale hazard.
    Frequencies stay relative to ALL non-null rows (the denominator is
    computed before the floor), so surviving values' tf is unchanged.
    """
    from pyspark.sql.window import Window

    out = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("value", "n", (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("tf"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def score_pairs(
    gammas: DataFrame,
    comparisons: list[Comparison],
    params: dict,
    tf_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Attach ``match_probability`` and log2 ``match_weight`` (E4).

    With ``tf_tables`` (column -> term_frequencies output), exact-level
    agreement on column c swaps that comparison's u for the value's
    relative frequency — rarer value ⇒ bigger weight (E3).
    """
    lam = params["lambda"]
    log2 = math.log(2.0)
    weight = F.lit(math.log(lam / (1.0 - lam)) / log2)
    out = gammas
    for c in comparisons:
        m_levels, u_levels = params["m"][c.name], params["u"][c.name]
        g = F.col(f"gamma_{c.name}")
        top = c.n_levels - 1
        u_col = F.lit(None).cast("double")
        if tf_tables and c.tf_col and c.tf_col in tf_tables:
            tf = tf_tables[c.tf_col].select(
                F.col("value").alias(f"__tfv_{c.name}"), F.col("tf").alias(f"__tf_{c.name}")
            )
            # No broadcast hint: a TF table is one row per DISTINCT
            # value, unbounded on exactly the high-cardinality columns
            # TF adjustment targets — forcing broadcast is a scale
            # hazard. With the min_count floor the table is small and
            # AQE/Catalyst auto-broadcasts under the threshold anyway.
            out = out.join(
                tf, out[f"{c.tf_col}_l"] == tf[f"__tfv_{c.name}"], "left"
            ).drop(f"__tfv_{c.name}")
            u_col = F.col(f"__tf_{c.name}")
        m_case = F.lit(m_levels[0])
        u_case = F.lit(u_levels[0])
        for lvl in range(1, c.n_levels):
            m_case = F.when(g == lvl, F.lit(m_levels[lvl])).otherwise(m_case)
            base_u = F.lit(u_levels[lvl])
            # TF adjustment applies at the exact-agreement level only.
            u_val = F.coalesce(u_col, base_u) if lvl == top else base_u
            u_case = F.when(g == lvl, u_val).otherwise(u_case)
        weight = weight + F.log(m_case / u_case) / F.lit(log2)
    prob = F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -weight))
    out = out.withColumn("match_weight", weight).withColumn("match_probability", prob)
    return out.drop(*[f"__tf_{c.name}" for c in comparisons])


def round_params(params: dict, ndigits: int = 6) -> dict:
    """Round every fitted parameter to ``ndigits`` decimals.

    Used by the catalog to pin the scored output against ulp-level
    float-summation jitter: score with rounded params and a DuckDB
    oracle replaying the same EM (rounded identically) hash-matches."""
    return {
        "lambda": round(params["lambda"], ndigits),
        "m": {k: [round(v, ndigits) for v in vs] for k, vs in params["m"].items()},
        "u": {k: [round(v, ndigits) for v in vs] for k, vs in params["u"].items()},
    }


def match_weights(spark, params: dict, comparisons: list[Comparison]) -> DataFrame:
    """Splink's match-weight ("waterfall") chart DATA as a DataFrame:
    per comparison level the Bayes factor m/u and its log2 match
    weight, plus the ``__prior__`` row carrying λ/(1-λ) — exactly the
    quantities :func:`score_pairs` sums per pair, exposed so an analyst
    can read WHICH level drives a match decision (the reference leans
    on Splink's chart for this, 03_aml_entity_resolution.py:72-75; E5
    scopes the rendering out, the numbers are the contract).

    Fitted params are a tiny driver-side dict (the same shape
    ``em_fit`` returns), so this is a createDataFrame of
    Σ(levels)+1 rows — no cluster work."""
    import math

    lam = float(params["lambda"])
    rows: list[tuple] = [
        ("__prior__", -1, lam / (1.0 - lam), math.log2(lam / (1.0 - lam)))
    ]
    for c in comparisons:
        for lvl in range(c.n_levels):
            m = float(params["m"][c.name][lvl])
            u = float(params["u"][c.name][lvl])
            rows.append((c.name, lvl, m / u, math.log2(m / u)))
    return spark.createDataFrame(
        rows,
        "comparison string, gamma_level int, bayes_factor double, match_weight double",
    )


def link_dedupe(
    df: DataFrame,
    unique_id: str,
    blocking_rules: list[list[str]],
    comparisons: list[Comparison],
    max_iter: int = 25,
    tf_adjust: bool = True,
    tol: float = 1e-5,
    param_round: int | None = None,
    tf_min_count: int = 1,
) -> DataFrame:
    """End-to-end dedupe linkage (the reference's Splink(settings, df)
    + get_scored_comparisons(), 03:56-58): block -> gamma -> EM ->
    score. Returns the scored pair table. ``tol=0.0`` forces exactly
    ``max_iter`` EM iterations (deterministic, oracle-replayable);
    ``param_round`` rounds fitted params before scoring.
    ``tf_min_count`` > 1 floors the TF tables to bound them at scale —
    a documented deviation from Splink that down-weights rare-value
    agreement (see :func:`term_frequencies`); the default keeps
    Splink's keep-every-value semantics."""
    compare_cols = list(dict.fromkeys(c.tf_col or c.name for c in comparisons))
    pairs = candidate_pairs(df, unique_id, blocking_rules, compare_cols=compare_cols)
    gammas = gamma_table(pairs, comparisons)
    params = em_fit(gammas, comparisons, max_iter=max_iter, tol=tol)
    if param_round is not None:
        params = round_params(params, param_round)
    tf_tables = (
        {
            c.tf_col: term_frequencies(df, c.tf_col, min_count=tf_min_count)
            for c in comparisons
            if c.tf_col
        }
        if tf_adjust
        else None
    )
    return score_pairs(gammas, comparisons, params, tf_tables=tf_tables)


def jaro_winkler_udf():
    """Arrow-batched Jaro-Winkler similarity (standard definition:
    Jaro matches within floor(max/2)-1, half-transpositions, +0.1
    prefix boost up to 4 chars applied only above 0.7) — the string
    comparator Splink configs commonly use alongside levenshtein
    (reference delegates to Splink 2.x, 03_aml_entity_resolution.py:56).
    Spark ships no jaro_winkler builtin, so this is the documented
    Python-when-expressions-can't case. Bit-identical to DuckDB's
    jaro_winkler_similarity (pinned by the catalog oracle), so scores
    hash-verify cross-engine.

    Rows that are non-null, non-empty and pure ASCII — i.e. where
    DuckDB's byte-oriented comparator provably equals the codepoint
    definition — are scored in bulk by the embedded DuckDB kernel
    (single-threaded per task; Spark owns the parallelism), one
    vectorized call per Arrow batch instead of a per-pair Python loop.
    The remaining rows (NULLs -> NaN; ''=='' -> 1.0 here but 0.0 in
    DuckDB; multi-byte codepoints, where DuckDB matches UTF-8 BYTES)
    keep the reference scalar loop, so the function's values are
    unchanged on every input (tests/test_linkage.py pins the hybrid
    against the loop on exactly those edge classes).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jw(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        import duckdb

        con = duckdb.connect()  # once per task (guide §4.5)
        con.execute("SET threads TO 1")  # Spark owns the parallelism
        for a, b in batches:
            yield _jw_score_batch(a, b, con)

    return jw


def _jaro_ref(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    win = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - win), min(l2, i + win + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3


def _jw_ref(s1, s2) -> float:
    """Reference scalar Jaro-Winkler — the pre-r14 per-pair loop,
    kept verbatim as the slow path for rows the DuckDB kernel may not
    score identically (NULL / empty / non-ASCII) and as the parity
    target for tests."""
    if s1 is None or s2 is None:
        return float("nan")
    j = _jaro_ref(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * 0.1 * (1 - j)


def _jw_score_batch(a: pd.Series, b: pd.Series, con) -> pd.Series:
    """Score one Arrow batch: DuckDB kernel for the provably-equal
    fast-path rows (non-null, non-empty, pure ASCII), reference loop
    for the rest. Values identical to mapping :func:`_jw_ref`."""
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    n = len(av)
    fast = np.empty(n, dtype=bool)
    for i in range(n):
        x, y = av[i], bv[i]
        fast[i] = (
            isinstance(x, str)
            and isinstance(y, str)
            and bool(x)
            and bool(y)
            and x.isascii()
            and y.isascii()
        )
    out = np.empty(n, dtype=np.float64)
    if fast.all():
        batch = pd.DataFrame({"a": av, "b": bv})
        con.register("jw_batch", batch)
        out[:] = con.execute(
            "SELECT jaro_winkler_similarity(a, b) AS s FROM jw_batch"
        ).fetchnumpy()["s"]
    else:
        idx = np.flatnonzero(fast)
        if idx.size:
            batch = pd.DataFrame({"a": av[idx], "b": bv[idx]})
            con.register("jw_batch", batch)
            out[idx] = con.execute(
                "SELECT jaro_winkler_similarity(a, b) AS s FROM jw_batch"
            ).fetchnumpy()["s"]
        for i in np.flatnonzero(~fast):
            x, y = av[i], bv[i]
            out[i] = _jw_ref(
                x if isinstance(x, str) else None,
                y if isinstance(y, str) else None,
            )
    return pd.Series(out)
