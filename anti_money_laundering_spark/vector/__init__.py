"""Similarity search over embedding columns (north-star operator; the
reference has no vector surface — BASELINE.json extends it).

Two paths:

- **brute-force cosine top-k** — the exact baseline: block-nested
  cross join, dot product as a codegen'd ``aggregate(zip_with(...))``
  expression (JVM-side, no Python), window rank per query. O(n·q) —
  correct at any scale but quadratic; the oracle for the ANN path.
- **LSH-bucketed ANN** — random-hyperplane signatures (Charikar 2002):
  b deterministic pseudo-random hyperplanes hash each vector to a
  b-bit bucket; probing compares only vectors sharing a bucket (with
  multi-probe over Hamming-1 neighbors to recover boundary misses).
  Bucket join = one shuffle on the signature; at 100 TB this is the
  path — brute force is the correctness check.

Hyperplanes are derived from xxhash64(h, d) — deterministic, no stored
model, identical across executors by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cosine_topk", "cosine_topk_blas", "lsh_signature", "ann_lsh_topk", "ann_ivf_topk"]


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + cast(v AS double) * cast(v AS double)))"


def cosine_similarity(a: str, b: str) -> F.Column:
    """Cosine similarity between two array<float|double> columns as a
    single codegen'd expression."""
    return F.expr(f"{_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)})")


def cosine_topk(
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine for every query vector.

    Output: (query_id, neighbor_id, cosine, rank). Ties break on
    neighbor id (deterministic). Self-matches are excluded when query
    and corpus ids collide.
    """
    # queries is typically a filtered view of vectors (shared lineage);
    # qualified aliases keep the self-join unambiguous.
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")).alias("q")
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__vv")).alias("v")
    scored = q.join(
        v, F.col("q.query_id") != F.col("v.neighbor_id"), "inner"
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qv", "__vv").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_blas(
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k via broadcast-queries + per-partition GEMM.

    The scale shape for brute-force scoring: the (small) query matrix
    is collected once and broadcast; the corpus streams through
    ``mapInPandas`` in Arrow batches, each batch scored against ALL
    queries with one numpy (BLAS) matmul, keeping only that batch's
    top-k per query; a final window rank merges the per-batch
    candidates (batches*k rows per query, never the full n*q matrix).
    Same output contract as :func:`cosine_topk`.

    ``max_queries`` guards the driver collect — beyond it, chunk the
    query set or use :func:`ann_lsh_topk`.
    """
    import numpy as np

    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if len(q_rows) > max_queries:
        raise ValueError(f"{len(q_rows)} queries exceed max_queries={max_queries}")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)
    sc = queries.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_mat))

    out_schema = (
        f"query_id {dict(queries.dtypes)[id_col]}, "
        f"neighbor_id {dict(vectors.dtypes)[id_col]}, cosine double"
    )

    def score(batches):
        import pandas as pd

        ids, mat = bc.value
        for pdf in batches:
            v = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
            sims = mat @ v.T  # (n_queries, batch)
            n_ids = pdf[id_col].to_numpy()
            # self-match mask, then per-query partial top-k within batch
            kk = min(k, sims.shape[1])
            for qi in range(sims.shape[0]):
                row = sims[qi]
                mask = n_ids != ids[qi]
                cand = np.flatnonzero(mask)
                if cand.size == 0:
                    continue
                # order by (-cosine, neighbor_id) so boundary ties keep
                # the same winners the final window rank would
                take = cand[np.lexsort((n_ids[cand], -row[cand]))[:kk]]
                yield pd.DataFrame(
                    {
                        "query_id": ids[qi],
                        "neighbor_id": n_ids[take],
                        "cosine": row[take],
                    }
                )

    partial = vectors.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return partial.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _lsh_signature_sql(vec_col: str, num_planes: int, seed: int) -> str:
    return f"""aggregate(
              sequence(0, {num_planes - 1}), 0L,
              (acc, h) -> acc + CASE WHEN aggregate(
                  zip_with({vec_col}, sequence(0, size({vec_col}) - 1),
                           (v, d) -> CASE WHEN (xxhash64({seed}, h, d) & 1) = 1
                                     THEN cast(v AS double) ELSE -cast(v AS double) END),
                  0.0D, (a, x) -> a + x
              ) > 0.0D THEN shiftleft(1L, h) ELSE 0L END
            )"""


def lsh_signature(vec_col: str, num_planes: int = 8, seed: int = 0) -> F.Column:
    """Random-hyperplane signature: bit h = sign of <v, r_h> where
    r_h[d] = ±1 chosen by xxhash64(seed, h, d). Returns an int bucket
    in [0, 2^num_planes). P(bit agrees) = 1 - angle/π (Charikar 2002).
    Distinct seeds give independent hash tables."""
    return F.expr(_lsh_signature_sql(vec_col, num_planes, seed))


def _table_buckets(vec_col: str, num_planes: int, num_tables: int) -> F.Column:
    """array of (tbl, bucket) structs — one signature per hash table."""
    sigs = ", ".join(
        f"named_struct('tbl', {t}, 'bucket', {_lsh_signature_sql(vec_col, num_planes, seed=t)})"
        for t in range(num_tables)
    )
    return F.expr(f"array({sigs})")


def ann_lsh_topk(
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    num_tables: int = 12,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent hash tables of
    ``num_planes`` hyperplanes each; candidates share a bucket in ANY
    table (multi-probe additionally probes every Hamming-1 bucket per
    table); exact cosine + rank over the candidate union.

    Recall math: with per-bit agreement p, one table catches a pair
    w.p. ~p^planes (+ planes·p^(planes-1)(1-p) multi-probed); L tables
    make it 1-(1-hit)^L — tune planes to corpus size (bucket
    occupancy) and tables to recall. Candidate generation is one
    equi-join shuffle on (tbl, bucket); recall is measured against
    cosine_topk in tests/test_vector.py.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vv"),
        F.explode(_table_buckets(vec_col, num_planes, num_tables)).alias("tb"),
    ).select("neighbor_id", "__vv", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_table_buckets(vec_col, num_planes, num_tables)).alias("tb"),
    ).select("query_id", "__qv", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("__sig"))
    if multi_probe:
        # Probe the exact bucket plus every Hamming-1 neighbor bucket.
        q = q.select(
            "query_id",
            "__qv",
            "tbl",
            F.explode(
                F.expr(
                    f"array_union(array(__sig), transform(sequence(0, {num_planes - 1}), "
                    f"h -> __sig ^ shiftleft(1L, h)))"
                )
            ).alias("bucket"),
        )
    else:
        q = q.withColumnRenamed("__sig", "bucket")
    scored = (
        q.join(v, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_similarity("__qv", "__vv").alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_ivf_topk(
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    An MLlib KMeans (cosine distance) partitions the corpus into
    ``n_lists`` inverted lists; each query scores only the lists of its
    ``n_probe`` nearest centroids. Expected work per query drops from
    O(n) to ~O(n * n_probe / n_lists).

    Scale posture: the quantizer fit is one distributed MLlib job whose
    model is tiny (n_lists x dim floats); list assignment is a
    per-row model transform (no shuffle); the probe join is an
    equi-join on list_id, so candidate generation is one shuffle keyed
    by list — the same join-on-derived-key discipline as the LSH path.
    List skew (hot centroids) is AQE's skew-join case. Deterministic
    given ``seed``. Recall measured against :func:`cosine_topk` in
    tests/test_vector.py.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat"),
    )
    km = KMeans(
        k=n_lists,
        seed=seed,
        featuresCol="__feat",
        predictionCol="list_id",
        distanceMeasure="cosine",
        maxIter=20,
    )
    model = km.fit(corpus.select("__feat"))
    assigned = model.transform(corpus).select("neighbor_id", "__vv", "list_id")

    # Centroid table is n_lists rows -> broadcast; each query ranks all
    # centroids with the codegen'd cosine and keeps its n_probe best.
    spark = vectors.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id int, __cv array<double>",
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__csim").desc(), F.col("list_id"))
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .crossJoin(F.broadcast(centroids))
        .select("query_id", "__qv", "list_id", cosine_similarity("__qv", "__cv").alias("__csim"))
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "list_id")
    )
    scored = (
        probes.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_similarity("__qv", "__vv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
