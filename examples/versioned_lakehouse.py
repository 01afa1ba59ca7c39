"""Versioned-table lifecycle demo: the Delta-shaped workflow the
reference's notebooks rely on (write → evolve → MERGE → change feed →
OPTIMIZE → RESTORE → VACUUM → streaming upsert), end-to-end on the
native transaction log (sources/versioned.py) — no Delta jars.

Run: python examples/versioned_lakehouse.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sources import load_table  # noqa: E402
from anti_money_laundering_spark.sources.versioned import VersionedTable  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="versioned_lakehouse")
    t = VersionedTable(os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "accounts"))

    nation = load_table(spark, sf_dir, "nation")
    base = nation.select(F.col("n_nationkey").alias("k"), F.col("n_name").alias("name"))

    v1 = t.write(base, stats_cols=["k"], checks={"k_nonneg": "k >= 0"})
    print(f"v{v1}: initial write,", t.read(spark).count(), "rows")

    # fresh keys: appended rows must not duplicate existing ones, or
    # the keyed MERGE/diff below fans out (same rule as any upsert table)
    evolved = base.limit(5).select(
        (F.col("k") + 100).alias("k"), F.concat(F.lit("ev-"), "name").alias("name"),
        F.lit(0.5).alias("risk"),
    )
    v2 = t.write(evolved, merge_schema=True)
    print(f"v{v2}: additive evolution — old rows read risk=NULL:")
    t.read(spark).orderBy("k").show(3)

    src = base.limit(3).select("k", F.upper("name").alias("name"), F.lit(0.9).alias("risk"))
    v3 = t.merge(spark, src, on=["k"])
    print(f"v{v3}: MERGE upsert; change feed v2->v{v3}:")
    t.diff(spark, v2, v3, on=["k"]).show(5)

    v4 = t.compact(spark, target_files=1, stats_cols=["k"])
    print(f"v{v4}: OPTIMIZE ->", len(t.read(spark).inputFiles()), "file(s)")

    v5 = t.restore(v1)
    print(f"v{v5}: RESTORE(v{v1}) — head rows:", t.read(spark).count())

    print("time travel v2 still readable:", t.read(spark, version=v2).count(), "rows")
    print("pruned read k>=20 plans", len(t.read(spark, prune=("k", 20, None)).inputFiles()), "file(s)")

    # grace 0: the demo owns this table, no concurrent writers
    deleted = t.vacuum(retain=2, orphan_grace_s=0)
    print("vacuum: removed", len(deleted), "unreferenced files; history:")
    t.history(spark).orderBy("version").show()

    # streaming upsert face: exactly-once foreachBatch merge
    stream_src = tempfile.mkdtemp(prefix="lakehouse_stream_")
    base.limit(4).coalesce(1).write.mode("overwrite").parquet(stream_src)
    stream = spark.readStream.schema(base.schema).parquet(stream_src)
    t2 = VersionedTable(os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "stream_t"))
    q = (
        stream.writeStream.foreachBatch(t2.stream_sink(on=["k"]))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="lakehouse_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("streaming sink landed", t2.read(spark).count(), "rows,",
          "versions:", t2.versions())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
