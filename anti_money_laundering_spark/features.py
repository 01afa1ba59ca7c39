"""Reusable feature-engineering operators (library API).

The catalog queries in ``plans/feature_queries.py`` are fixture-bound
showcases; these are the generic operators they delegate to, usable on
any DataFrame. All are pure DataFrame plans — no Python UDFs, no
collects — and each shuffles at most once on its entity key (see
SCALE.md "Feature engineering").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "scd2",
    "rolling_median",
    "ewma",
    "winsorized_mean",
    "trend_slope",
    "cusum",
    "cap_per_group",
    "resample_gapfill_daily",
]


def scd2(
    df: DataFrame,
    key: str,
    status: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change stream:
    collapse consecutive runs of the same per-``key`` ``status`` into
    validity intervals [valid_from, valid_to), NULL valid_to = current.
    Two windows over ONE (key) partitioning: lag() finds run starts,
    lead() closes intervals."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes = (
        df.withColumn("__prev", F.lag(status).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(status)))
        .select(key, F.col(status).alias("status"), F.col(ts).alias("valid_from"), tiebreak)
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", tiebreak)
    return changes.select(
        key, "status", "valid_from", F.lead("valid_from").over(w2).alias("valid_to")
    )


def rolling_median(
    key: str,
    value: str,
    order_by: list[str],
    frame_rows: int = 5,
) -> Column:
    """Exact trailing median over the last ``frame_rows`` rows per
    ``key`` (quantile_cont(0.5) semantics: linear interpolation on
    even counts). Spark has no exact median window, so the frame is a
    sorted array read positionally — O(frame_rows) per row, so keep
    the frame small; wide frames belong to the quantile sketch.
    Returns an unbound median COLUMN (a pure column expression —
    attach it to the target DataFrame with .select/.withColumn)."""
    w = Window.partitionBy(key).orderBy(*order_by).rowsBetween(-(frame_rows - 1), 0)
    arr = F.array_sort(F.collect_list(value).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    # collect_list drops NULLs, so an all-NULL frame yields n = 0 —
    # element_at(arr, 0) aborts under ANSI (INVALID_INDEX_OF_ZERO).
    # CASE WHEN branches are lazy, so putting the n = 0 arm first
    # (median of nothing = NULL) keeps the positional reads unreached.
    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")))
        .otherwise((lo + hi) / 2.0)
    )


def ewma(
    key: str,
    value: str,
    order_by: list[str],
    alpha: float = 0.3,
    max_lags: int = 12,
) -> Column:
    """Truncated exponentially-weighted mean of ``value`` per ``key``:
    a fixed chain of ``max_lags`` lag() terms with weights (1-alpha)^j,
    normalized over the weights actually present (unbiased partition
    heads). The exact recurrence isn't a window aggregate and its
    closed form overflows (1-alpha)^-t on long partitions — truncation
    keeps it codegen'd, stateless, and one shuffle. Residual mass
    (1-alpha)^max_lags is the approximation bound (<2% at defaults).
    Returns an unbound EWMA COLUMN (attach with .select/.withColumn)."""
    w = Window.partitionBy(key).orderBy(*order_by)
    num = None
    den = None
    for j in range(max_lags):
        wt = (1.0 - alpha) ** j
        lagv = F.lag(value, j).over(w)
        t_num = F.coalesce(lagv * F.lit(wt), F.lit(0.0))
        t_den = F.when(lagv.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    # When every lag in the chain is NULL (all-NULL partition head),
    # den sums to 0.0 and ANSI mode aborts on the division — try_divide
    # yields NULL for those rows instead (same pattern as
    # graph_reciprocity).
    return F.try_divide(num, den)


def winsorized_mean(
    df: DataFrame,
    group: str,
    value: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-group mean after clipping to the group's exact
    [p_lower, p_upper] band. Both percentiles come from ONE unbounded
    window pass over the group partition; the clamp is codegen'd row
    arithmetic; the re-aggregation reuses the same key. At 100 TB swap
    the exact percentile for approx_percentile sketches.

    NULL ``value`` rows stay NULL through the clamp (Spark's
    greatest/least SKIP nulls, which would otherwise coerce a NULL row
    to the lower percentile) — avg() then excludes them from wins_mean
    exactly as it does from raw_mean."""
    w = Window.partitionBy(group)
    clipped = df.select(
        group,
        value,
        F.expr(f"percentile({value}, {lower})").over(w).alias("__lo"),
        F.expr(f"percentile({value}, {upper})").over(w).alias("__hi"),
    )
    clamp = F.when(
        F.col(value).isNotNull(),
        F.least(F.greatest(value, F.col("__lo")), F.col("__hi")),
    )
    return clipped.groupBy(group).agg(
        F.avg(clamp).alias("wins_mean"),
        F.avg(value).alias("raw_mean"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def trend_slope(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    min_points: int = 3,
) -> DataFrame:
    """Per-entity least-squares slope of ``value`` over time
    (units/day): slope = covar_samp(x, y) / var_samp(x) — single-pass
    distributive aggregates, ONE groupBy shuffle, no iteration. x is
    re-zeroed per entity (days since its first point) because
    epoch-microsecond magnitudes square to 1e30 and eat the double
    mantissa. Entities with < ``min_points`` rows or zero time
    variance are dropped (no defined slope)."""
    w = Window.partitionBy(key)
    xy = df.select(
        key,
        ((F.unix_micros(ts) - F.min(F.unix_micros(ts)).over(w)) / 86400000000.0).alias("__x"),
        F.col(value).alias("__y"),
    )
    return (
        xy.groupBy(key)
        .agg(
            (F.covar_samp("__x", "__y") / F.var_samp("__x")).alias("slope_per_day"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.var_samp("__x").alias("__vx"),
        )
        .filter((F.col("n") >= min_points) & (F.col("__vx") > 0))
        .drop("__vx")
    )


def cusum(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str,
    slack: float = 0.5,
    threshold: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint statistic per entity (Page 1954):
    standardize ``value`` against the entity's own mean/std, then track
    how far the standardized series has drifted above/below ``slack``
    since the last implicit reset. Rows where either side exceeds
    ``threshold`` flag a sustained level shift (structuring ramps,
    account takeover) that single-point z-score outliers miss.

    The textbook recurrence S_i = max(0, S_{i-1} + (z_i - k)) is not a
    SQL window aggregate, but its closed form IS:
    ``S_i = P_i - min(0, running_min(P_i))`` with P the ROWS-framed
    prefix sum of (z - k) — two stacked window selects over ONE
    (key)-partitioned sort, no recursion, no Python, one shuffle.
    Entities with zero variance (constant series, single row) have no
    defined z and are dropped."""
    wp = Window.partitionBy(key)
    run = (
        Window.partitionBy(key)
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    std = F.stddev_pop(value).over(wp)
    # divide-by-zero guard, portable: Spark and DuckDB disagree on
    # float x/0 (Infinity vs NULL) — route zero variance to NULL here
    z = (F.col(value) - F.avg(value).over(wp)) / F.when(std > 0, std)
    prefixed = (
        df.select(key, ts, tiebreak, z.alias("__z"))
        .filter(F.col("__z").isNotNull())
        .select(
            key,
            ts,
            tiebreak,
            F.sum(F.col("__z") - slack).over(run).alias("__p_pos"),
            F.sum(-F.col("__z") - slack).over(run).alias("__p_neg"),
        )
    )
    s_pos = F.col("__p_pos") - F.least(F.lit(0.0), F.min("__p_pos").over(run))
    s_neg = F.col("__p_neg") - F.least(F.lit(0.0), F.min("__p_neg").over(run))
    return prefixed.select(
        key,
        ts,
        tiebreak,
        s_pos.alias("cusum_pos"),
        s_neg.alias("cusum_neg"),
        (F.greatest(s_pos, s_neg) > threshold).alias("alarm"),
    )


def cap_per_group(
    df: DataFrame,
    group: str,
    key: str,
    max_rows: int,
    salt: str = "cap-v1",
) -> DataFrame:
    """Keep at most ``max_rows`` rows per ``group``, selected by
    deterministic md5 order of ``key`` (then ``key`` itself as the
    tiebreak) — the per-domain cap of corpus data-mix recipes.
    Survivors are a pure function of ids: stable across reruns,
    cluster sizes, engines; adding rows never evicts survivors ranked
    above them. Plan: one shuffle on ``group`` (top-k-per-group shape)."""
    w = Window.partitionBy(group).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), key
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_rows
    ).drop("__rn")


def resample_gapfill_daily(
    df: DataFrame,
    key: str,
    ts: str,
) -> DataFrame:
    """Regular per-``key`` daily count series with silent days as
    explicit zeros, spanning each key's [first, last] active day. The
    calendar spine is sequence()+explode over a per-key 2-column
    aggregate (rows = keys × active-span days, never events × days);
    the left join reuses the daily aggregate's (key, day) keys."""
    days = df.select(key, F.to_date(ts).alias("day"))
    daily = days.groupBy(key, "day").agg(F.count(F.lit(1)).alias("n"))
    spans = daily.groupBy(key).agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = spans.select(key, F.explode(F.sequence("d0", "d1")).alias("day"))
    return spine.join(daily, [key, "day"], "left").select(
        key, "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )
