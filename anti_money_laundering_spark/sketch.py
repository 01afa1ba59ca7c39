"""Bounded-memory summary operators for high-cardinality keys.

At 100 TB a plain ``GROUP BY`` on a high-cardinality key shuffles
every distinct key; when the question is only about the FREQUENT keys
(vocabulary heads, hot accounts, top URLs) the mergeable-summary
formulation shuffles almost nothing:

- **heavy_hitters** — exact phi-heavy-hitters in two passes: a
  per-partition Misra-Gries candidate summary (no shuffle at all;
  mergeable-summaries truncation per Agarwal et al., PODS 2012), then
  one full-scan recount in which every non-candidate key collapses
  into a single NULL bucket, so the map-side combine leaves at most
  ``capacity + 1`` groups per partition and the shuffle is tiny
  regardless of key cardinality. Output is EXACT (identical to
  GROUP BY ... HAVING count > phi * total) because the recount counts
  candidates exactly and the Misra-Gries guarantee makes the candidate
  set a superset of the true heavy hitters.

The per-day/per-month HLL sketch rollup (the other reaggregatable
summary) composes directly from Spark's built-in ``hll_sketch_agg`` /
``hll_union_agg`` — see plans/sketch_queries.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]

#: Candidate sets above this size stop being "tiny broadcast side" —
#: at that point the plain GROUP BY is the right plan, so refuse
#: loudly instead of silently degrading (same policy as the vector
#: module's all-pairs guard).
_MAX_CAPACITY = 1_000_000


def heavy_hitters(
    df: DataFrame,
    cols: list[str],
    phi: float,
    capacity: int | None = None,
) -> DataFrame:
    """All key tuples occurring in MORE than ``phi`` of ``df``'s rows,
    with their exact counts — identical to::

        SELECT cols, count(*) FROM df GROUP BY cols
        HAVING count(*) > phi * (SELECT count(*) FROM df)

    but without ever shuffling the full distinct-key set. Rows where
    any key column is NULL count toward the total but are never heavy
    hitters (SQL GROUP BY would emit them; a NULL key is a no-key).

    Output columns: ``cols`` + ``cnt`` (exact count) + ``total``
    (total rows scanned, the HAVING denominator).

    ``capacity`` is the Misra-Gries summary size m; any key with true
    frequency > n/(m+1) survives every truncation, so the default
    m = ceil(1/phi) makes the candidate set a guaranteed superset of
    the phi-heavy hitters. Larger m = fewer false candidates to
    recount, more executor memory (m entries per partition).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"heavy_hitters: phi must be in (0, 1), got {phi}")
    m = capacity if capacity is not None else math.ceil(1.0 / phi)
    if m < math.ceil(1.0 / phi):
        raise ValueError(
            f"heavy_hitters: capacity {m} < ceil(1/phi) = {math.ceil(1.0 / phi)} "
            "breaks the superset guarantee"
        )
    if m > _MAX_CAPACITY:
        raise ValueError(
            f"heavy_hitters: capacity {m} > {_MAX_CAPACITY}; at that candidate "
            "scale use a plain groupBy — the summary no longer broadcasts"
        )
    keys = df.select(*cols)

    def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Misra-Gries over the partition, merged batch-at-a-time:
        # add the batch's exact counts, then if over capacity subtract
        # the (m+1)-th largest weight and drop non-positives — the
        # mergeable-summaries truncation, vectorized in pandas.
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf.groupby(cols, sort=False, dropna=True).size()
            acc = acc.add(vc, fill_value=0) if len(acc) else vc.astype("int64")
            if len(acc) > m:
                thresh = acc.nlargest(m + 1).iloc[-1]
                acc = acc[acc > thresh] - thresh
        if len(acc) == 0:
            yield pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
        else:
            out = acc.index.to_frame(index=False)
            out.columns = cols
            yield out

    candidates = keys.mapInPandas(mg_candidates, schema=keys.schema).dropDuplicates()

    # Recount pass: candidate keys keep their identity, everything else
    # folds into one NULL-key group, so per-partition partial
    # aggregation emits <= m + 1 groups no matter the key cardinality.
    marked = df.join(
        F.broadcast(candidates.withColumn("__hh", F.lit(True))), on=cols, how="left"
    )
    bucketed = marked.select(
        *[F.when(F.col("__hh"), F.col(c)).alias(c) for c in cols]
    )
    counts = bucketed.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    keys_present = F.lit(True)
    for c in cols:
        keys_present = keys_present & F.col(c).isNotNull()
    return (
        counts.filter(keys_present)
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.lit(phi) * F.col("total"))
    )
