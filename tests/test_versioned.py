"""Versioned-table (native transaction log) tests: atomic commits,
snapshot isolation, time travel, schema rules, merge, concurrency
conflict, and vacuum safety."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from anti_money_laundering_spark.sources.versioned import CommitConflict, VersionedTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def _tbl():
    return VersionedTable(os.path.join(tempfile.mkdtemp(prefix="vtbl_"), "t"))


def test_append_overwrite_time_travel_history(spark):
    t = _tbl()
    v1 = t.write(_df(spark, [(1, "a")]))
    v2 = t.write(_df(spark, [(2, "b")]))  # append
    assert (v1, v2) == (1, 2)
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    # time travel: v1 still reads exactly its snapshot
    assert [r.k for r in t.read(spark, version=1).collect()] == [1]
    # overwrite replaces content (and may change schema)
    v3 = t.write(_df(spark, [(9, 1.5)], "k int, score double"), mode="overwrite")
    got = t.read(spark).collect()
    assert len(got) == 1 and got[0].score == 1.5
    # history face
    hist = {r.version: r.operation for r in t.history(spark).collect()}
    assert hist == {1: "append", 2: "append", 3: "overwrite"}
    # timestamp travel: as-of v2's commit time sees v2
    ts2 = [r.timestamp for r in t.history(spark).collect() if r.version == 2][0]
    assert sorted(r.k for r in t.read(spark, as_of_ts=ts2).collect()) == [1, 2]
    assert v3 == 3


def test_append_schema_mismatch_refused(spark):
    t = _tbl()
    t.write(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="append schema mismatch"):
        t.write(_df(spark, [(1.0, "a")], "k double, v string"))
    # nullability difference must NOT refuse: same names+types
    nn = _df(spark, [(2, "b")]).withColumn("k", F.col("k") + 0)
    t.write(nn.select("k", "v"))
    assert t.latest_version() == 2


def test_commit_conflict_surfaces_and_loser_can_retry(spark, monkeypatch):
    """Optimistic concurrency: a writer whose view of the log went
    stale (another writer committed the version it targets) must get
    CommitConflict from the exclusive-create — not silently overwrite
    — and a plain retry against the fresh log succeeds."""
    t = _tbl()
    t.write(_df(spark, [(1, "a")]))
    # racing writer commits version 2 first
    VersionedTable(t.path).write(_df(spark, [(2, "b")]))
    # our writer still believes the head is version 1 → targets v2
    monkeypatch.setattr(t, "latest_version", lambda: 1)
    with pytest.raises(CommitConflict):
        t.write(_df(spark, [(3, "c")]), mode="overwrite")
    monkeypatch.undo()
    # retry with a fresh read of the log: commits as version 3
    v = t.write(_df(spark, [(3, "c")]), mode="overwrite")
    assert v == 3
    assert [r.k for r in t.read(spark).collect()] == [3]


def test_snapshot_isolation_under_concurrent_write(spark):
    t = _tbl()
    t.write(_df(spark, [(1, "a")]))
    snap = t.read(spark)  # pinned to v1's manifest
    t.write(_df(spark, [(2, "b")]))
    # the pinned snapshot still returns v1 rows even after v2 commits
    assert [r.k for r in snap.collect()] == [1]


def test_merge_creates_version_with_merge_semantics(spark):
    t = _tbl()
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    src = _df(spark, [(2, "B"), (3, "c")])
    v = t.merge(spark, src, on=["k"])
    assert v == 2
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # update matched, insert new
    assert {r.version: r.operation for r in t.history(spark).collect()}[2] == "merge"


def test_vacuum_drops_only_unreferenced_files(spark):
    t = _tbl()
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]))
    t.write(_df(spark, [(3, "c")]), mode="overwrite")
    # plant an orphan (crashed writer)
    orphan = os.path.join(t.path, "data", "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    deleted = t.vacuum(retain=1)
    assert "part-orphan.parquet" in deleted
    assert t.versions() == [3]
    # retained snapshot fully readable after vacuum
    assert [r.k for r in t.read(spark).collect()] == [3]
    with pytest.raises(FileNotFoundError):
        t._load(1)


def test_empty_overwrite_preserves_schema(spark):
    t = _tbl()
    t.write(_df(spark, [(1, "a")]))
    empty = _df(spark, [], "k int, v string").filter(F.lit(False))
    t.write(empty, mode="overwrite")
    got = t.read(spark)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "v"]


def test_diff_between_versions_is_cdc_feed(spark):
    t = _tbl()
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.write(_df(spark, [(1, "a"), (2, "B"), (4, "d")]), mode="overwrite")
    feed = {r.k: r.op for r in t.diff(spark, 1, 2, on=["k"]).collect()}
    assert feed == {2: "U", 3: "D", 4: "I"}  # unchanged key 1 absent
