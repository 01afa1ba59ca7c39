"""TF-IDF text vectorization + similarity (MLlib-native; north-star
"MLlib + Delta" approach in BASELINE.json).

``HashingTF`` is the hashing trick — stateless, deterministic, no
vocabulary shuffle, which is exactly what survives 100 TB (a fitted
CountVectorizer vocabulary would itself be a giant broadcast). ``IDF``
is one aggregate pass. Cosine over the resulting sparse vectors runs
as a Pandas UDF on the (blocked) candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.feature import IDF, HashingTF, Tokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tfidf_vectors", "tfidf_cosine_pairs"]


def tfidf_vectors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_features: int = 4096
) -> DataFrame:
    """(id, tfidf) sparse vectors: tokenize -> hashingTF -> IDF."""
    toks = Tokenizer(inputCol=text_col, outputCol="__words").transform(
        docs.select(id_col, text_col)
    )
    tf = HashingTF(inputCol="__words", outputCol="__tf", numFeatures=num_features).transform(toks)
    idf_model = IDF(inputCol="__tf", outputCol="tfidf").fit(tf)
    return idf_model.transform(tf).select(id_col, "tfidf")


def tfidf_cosine_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 4096,
) -> DataFrame:
    """Cosine similarity between TF-IDF vectors for given candidate
    ``pairs`` (id_a, id_b) — candidates come from blocking/LSH, never
    the cartesian. Vector math runs vectorized in a Pandas UDF (sparse
    dot via numpy on Arrow batches)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql.types import DoubleType

    vecs = tfidf_vectors(docs, id_col, text_col, num_features).select(
        id_col, vector_to_array("tfidf").alias("__arr")
    )

    @F.pandas_udf(DoubleType())
    def dense_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        dots = np.einsum("ij,ij->i", ma, mb)
        norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(np.where(norms > 0, dots / np.maximum(norms, 1e-300), 0.0))

    va = vecs.select(F.col(id_col).alias("id_a"), F.col("__arr").alias("__ta"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col("__arr").alias("__tb"))
    joined = pairs.join(va, "id_a").join(vb, "id_b")
    return joined.select(
        "id_a", "id_b", dense_cosine("__ta", "__tb").alias("tfidf_cosine")
    )
