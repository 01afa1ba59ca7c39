"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-accounts generator.

This is the idiomatic way to add a SOURCE to Spark from Python —
``spark.read.format("synthetic_accounts")`` after registration, with
real partition planning (N independent splits → N parallel tasks, no
driver materialization). The reference has no custom sources (it reads
S3 parquet/CSV); this extends the engine's S-surface the way a
production deployment would wrap an internal feed.

Determinism contract: every cell is a pure function of the row index
via md5 arithmetic (same discipline as ``sampling.hash_bucket``), so
the output is identical across reruns, partition counts, and engines —
DuckDB replays the generator from ``generate_series`` and the catalog
query ``synthetic_source_scan`` hash-verifies the whole connector.

Scale: rows are split evenly across ``partitions`` input splits; each
task generates only its [start, end) range with O(1) memory per row —
a 1e12-row synthetic benchmark table costs no storage and no driver
memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

__all__ = ["SyntheticAccountsDataSource", "register_synthetic_source"]

#: Column formulas (documented so the DuckDB oracle can mirror them):
#: h(i)       = first 8 hex chars of md5('synth-' || i) as uint32
#: account_id = i
#: name       = 'acct-' || lpad(hex bucket % 10000)
#: balance    = (h(i) % 10_000_000) / 100.0
#: segment    = ['retail','corporate','private'][h(i) % 3]


def _h(i: int) -> int:
    return int(hashlib.md5(f"synth-{i}".encode()).hexdigest()[:8], 16)


class _Range(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "4")))
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters):
        """Source-level pruning: range predicates on account_id narrow
        the GENERATED index range — the custom-connector analogue of
        parquet's PushedFilters (rows outside the range are never
        produced, not produced-then-filtered). Pushed filters are fully
        handled here (account_id == row index exactly), so they are NOT
        returned; everything else stays with Spark."""
        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        for f in filters:
            if getattr(f, "attribute", None) != ("account_id",) or not isinstance(
                f, supported
            ):
                yield f  # not ours (e.g. IsNotNull, other columns) — Spark keeps it
                continue
            v = int(f.value)
            if isinstance(f, EqualTo):
                self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            else:  # LessThanOrEqual
                self.hi = min(self.hi, v + 1)

    def partitions(self) -> Sequence[InputPartition]:
        lo0, hi0 = self.lo, max(self.lo, self.hi)
        span = hi0 - lo0
        if span == 0:
            return [_Range(lo0, lo0)]
        step = (span + self.n_parts - 1) // self.n_parts
        return [
            _Range(lo, min(lo + step, hi0)) for lo in range(lo0, hi0, step)
        ]

    #: Arrow transfer granularity: rows per RecordBatch yielded to Spark.
    ARROW_BATCH = 10_000

    def read(self, partition: _Range) -> Iterator["pa.RecordBatch"]:
        # Yield Arrow RecordBatches, not tuples — the DataSource API's
        # high-throughput path (columnar transfer, no per-row pickling).
        import pyarrow as pa

        segs = ("retail", "corporate", "private")
        for lo in range(partition.start, partition.end, self.ARROW_BATCH):
            hi = min(lo + self.ARROW_BATCH, partition.end)
            hs = [_h(i) for i in range(lo, hi)]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(range(lo, hi), type=pa.int64()),
                    pa.array([f"acct-{h % 10000:04d}" for h in hs]),
                    pa.array([(h % 10_000_000) / 100.0 for h in hs], type=pa.float64()),
                    pa.array([segs[h % 3] for h in hs]),
                ],
                names=["account_id", "name", "balance", "segment"],
            )


class SyntheticAccountsDataSource(DataSource):
    """``spark.read.format("synthetic_accounts").option("rows", n)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_accounts"

    def schema(self) -> str:
        return "account_id bigint, name string, balance double, segment string"

    def reader(self, schema) -> _Reader:  # noqa: ARG002 — fixed schema
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> "_StreamReader":  # noqa: ARG002
        return _StreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine).
    Also enables Python-source filter pushdown — Spark 4 REFUSES to
    plan a reader that implements pushFilters while the flag is off
    (sessions built by ``session.get_spark`` set it already; this
    covers foreign sessions)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticAccountsDataSource)


#: DuckDB replay of the generator for the oracle: identical md5
#: arithmetic over generate_series.
def duckdb_generator_sql(n_rows: int) -> str:
    h = (
        "CAST(list_sum([(strpos('0123456789abcdef', "
        "md5('synth-' || CAST(i AS VARCHAR))[j+1]) - 1) "
        "* CAST(16**(7-j) AS BIGINT) for j in range(8)]) AS BIGINT)"
    )
    return f"""
    SELECT i AS account_id,
           'acct-' || lpad(CAST({h} % 10000 AS VARCHAR), 4, '0') AS name,
           ({h} % 10000000) / 100.0 AS balance,
           ['retail', 'corporate', 'private'][({h} % 3) + 1] AS segment
    FROM generate_series(0, {n_rows - 1}) t(i)
    """


class _StreamReader(SimpleDataSourceStreamReader):
    """Micro-batch face of the same generator: each poll emits the next
    ``batch_rows`` row indexes (bounded by ``rows`` when set, unbounded
    otherwise). The offset is just {"index": next_row} — replayable
    from the checkpoint like any Structured Streaming source, and
    because content is a pure function of the index, a restarted query
    regenerates byte-identical rows for any offset range
    (exactly-once-compatible)."""

    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.max_rows = int(options.get("rows", "-1"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = lo + self.batch_rows
        if self.max_rows >= 0:
            hi = min(hi, self.max_rows)
        # materialized list, not a generator: the simple-reader wrapper
        # PICKLES the prefetched records to ship them to executors, and
        # batch_rows bounds the driver-side footprint by construction
        return list(_gen_rows(lo, hi)), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(_gen_rows(start["index"], end["index"]))


def _gen_rows(lo: int, hi: int) -> Iterator[tuple]:
    segs = ("retail", "corporate", "private")
    for i in range(lo, hi):
        h = _h(i)
        yield (i, f"acct-{h % 10000:04d}", (h % 10_000_000) / 100.0, segs[h % 3])
