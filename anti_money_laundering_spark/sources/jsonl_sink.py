"""Custom Python Data Source WRITER (Spark 4 DataSource API): an
atomic JSONL directory sink with the two-phase commit protocol.

Completes the connector surface next to ``synthetic.py``'s reader and
stream reader: ``df.write.format("jsonl_atomic").option("path", d)``.
Each task writes its partition to a STAGED file (``_staging/<uuid>``)
and returns the staged name as its commit message; only when every
task succeeds does the driver-side ``commit`` rename the staged files
into place and drop a ``_SUCCESS`` marker — a failed/partial job
leaves the destination untouched (``abort`` deletes the staging
leftovers). This is the same observable contract as Hadoop's
FileOutputCommitter v1, expressed in ~60 lines of Python.

Scale note: like any file-committer, this assumes a SHARED filesystem
(HDFS, NFS, a fuse-mounted store) visible to both executors (write)
and driver (commit), with cheap renames; on object stores the staged
files would instead be recorded in a manifest (Delta/Iceberg's
approach — see sources.save_table for the gated Delta path).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import os
import shutil
import time
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

__all__ = ["JsonlSinkDataSource", "register_jsonl_sink"]

#: staged files older than this with no commit message are dead-attempt
#: orphans; younger ones may belong to a concurrent writer (see
#: _StreamWriter.commit)
_ORPHAN_GRACE_S = 300.0


def _json_default(o):
    """Encoder for the Spark types ``json`` can't serialize natively:
    timestamp/date → ISO-8601, decimal → string (exactness over
    float coercion), binary → base64. Anything else falls back to
    ``str`` so the sink never aborts a job on an exotic column."""
    if isinstance(o, (datetime.datetime, datetime.date)):
        return o.isoformat()
    if isinstance(o, decimal.Decimal):
        return str(o)
    if isinstance(o, (bytes, bytearray)):
        return base64.b64encode(bytes(o)).decode("ascii")
    return str(o)


class _Staged(WriterCommitMessage):
    def __init__(self, staged: str) -> None:
        self.staged = staged


class _Writer(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_atomic requires .option('path', ...)")
        self.path = path
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> _Staged:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(staging, name)
        with open(staged, "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), default=_json_default) + "\n")
        return _Staged(name)

    def commit(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.unlink(os.path.join(self.path, f))
        for m in messages:
            os.rename(os.path.join(staging, m.staged), os.path.join(self.path, m.staged))
        # Staging may still hold orphans — files from retried/speculative
        # task attempts whose commit message Spark discarded, or leftovers
        # of a previously aborted job. They are garbage by definition
        # (only message-listed files are part of this commit); remove
        # them rather than letting a bare rmdir fail the job AFTER the
        # renames made the commit observable.
        shutil.rmtree(staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        # A failed task's commit message arrives as None (API contract) —
        # it staged nothing durable under a message-listed name, so skip.
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(os.path.join(staging, m.staged))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_atomic"

    def writer(self, schema, overwrite: bool) -> _Writer:  # noqa: ARG002
        return _Writer(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "_StreamWriter":  # noqa: ARG002
        return _StreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


class _StreamWriter(DataSourceStreamWriter):
    """Streaming face of the atomic sink: per micro-batch two-phase
    commit. Tasks stage exactly as in batch; ``commit(messages,
    batchId)`` renames into place under batch-scoped names
    (``batch-<id>-part-*.jsonl``) and appends the id to a ``_batches``
    log. Because the rename set is derived from the batchId, REPLAYING
    a batch after a failure overwrites the same file names instead of
    duplicating rows — idempotent per batch, the exactly-once
    contract foreachBatch users implement by hand (``merge_stream_sink``)
    expressed through the connector API."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_atomic requires .option('path', ...)")
        self.path = path

    def write(self, rows: Iterator) -> _Staged:
        return _Writer({"path": self.path}, overwrite=False).write(rows)

    def commit(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        # A replayed batch may plan FEWER partitions than the crashed
        # attempt (AQE/repartitioning upstream) — overwriting by index
        # alone would leave the dead attempt's higher-index parts
        # duplicating rows. Idempotency = delete the batch's whole file
        # set first, then rename this attempt's parts in.
        prefix = f"batch-{batchId:05d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".jsonl"):
                os.unlink(os.path.join(self.path, f))
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(self.path, f"{prefix}part-{i:04d}.jsonl")
            os.rename(os.path.join(staging, m.staged), final)
        # Staged files NOT in this batch's message list are orphans from
        # dead/retried attempts; without this prune they accumulate for
        # the lifetime of the stream. Deletion is AGE-GATED (review
        # finding): micro-batches of THIS query run sequentially, but a
        # second query or a batch job writing the same path may be
        # staging concurrently — its files are seconds old, while dead
        # attempts' leftovers only get pruned once they predate the
        # previous batch by a comfortable margin.
        if os.path.isdir(staging):
            committed = {m.staged for m in messages if m is not None}
            now = time.time()
            for f in os.listdir(staging):
                if f in committed:
                    continue
                full = os.path.join(staging, f)
                try:
                    if now - os.path.getmtime(full) >= _ORPHAN_GRACE_S:
                        os.unlink(full)
                except FileNotFoundError:
                    pass
        log = os.path.join(self.path, "_batches")
        logged: set[str] = set()
        if os.path.exists(log):
            with open(log) as f:
                logged = set(f.read().split())
        if str(batchId) not in logged:  # replay must not duplicate the log line
            with open(log, "a") as f:
                f.write(f"{batchId}\n")

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        staging = os.path.join(self.path, "_staging")
        for m in messages:
            if m is not None:
                try:
                    os.unlink(os.path.join(staging, m.staged))
                except FileNotFoundError:
                    pass
