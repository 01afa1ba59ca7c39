"""One-off sweep: find (num_planes, num_tables) where ann_lsh_topk's
output EQUALS the brute-force top-k on every fixture SF (the recall-1.0
pin that lets the catalog attach the exact DuckDB oracle)."""

from __future__ import annotations

import itertools
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.sources import load_table
from anti_money_laundering_spark.vector import ann_lsh_topk, cosine_topk_blas

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

exact_sets = {}
for sf in SFS:
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("label") == 0)
    exact = cosine_topk_blas(q, emb, k=5).collect()
    exact_sets[sf] = {(r.query_id, r.neighbor_id, r.rank) for r in exact}
    print(f"{sf}: exact rows {len(exact)}")

for planes, tables in itertools.product((4, 5, 6), (12, 16, 24, 32)):
    ok = []
    t0 = time.time()
    for sf in SFS:
        emb = load_table(spark, sf, "embeddings")
        q = emb.filter(F.col("label") == 0)
        out = ann_lsh_topk(q, emb, k=5, num_planes=planes, num_tables=tables)
        got = {(r.query_id, r.neighbor_id, r.rank) for r in out.collect()}
        e = exact_sets[sf]
        inter = len(got & e)
        ok.append((sf.rsplit("sf", 1)[1], inter == len(e) == len(got), f"{inter}/{len(e)}"))
    print(f"planes={planes} tables={tables} -> {ok}  ({time.time()-t0:.1f}s)")
