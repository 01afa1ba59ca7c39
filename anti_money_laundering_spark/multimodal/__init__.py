"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched Pandas UDFs.

The reference fetches street-view JPEGs in a serial driver loop and
classifies them one at a time, reloading the model per image
(/root/reference/02_aml_address_verification.py:56-61, :107-132) — the
exact anti-pattern this module replaces (SURVEY.md §4 O10): payload
bytes live IN the DataFrame, decode/featurize runs distributed via
``mapInPandas`` with per-batch (not per-row) model setup.

The container has no image/audio libraries, so the decode step is a
STUB: ``decode_image`` raises NotImplementedError; the default
featurizer is a deterministic fake (byte stats) so the Spark-side
plumbing — schema, Arrow batching, partition parallelism — is real and
tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary_payload",
    "decode_image",
    "fake_byte_features",
    "extract_features",
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
]

#: A media row: opaque payload + typed metadata (the "multimodal
#: column" convention — binary column, never a parsed object).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, source_col: str, mime_type: str = "application/octet-stream"
) -> DataFrame:
    """Materialize a multimodal column from any string column: payload
    = UTF-8 bytes (stand-in for image/audio bytes; at ingest time this
    would be the fetched object). Schema matches MEDIA_SCHEMA."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(source_col), "UTF-8").alias("payload"),
        F.lit(mime_type).alias("mime_type"),
        F.octet_length(F.col(source_col)).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: decode image bytes to a tensor. The production
    implementation needs an image library (PIL/torchvision — not in
    this container). Replaces the reference's per-row driver-side
    VGG16 load (02_aml_address_verification.py:107-132)."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "environment; supply a featurizer to extract_features instead"
    )


def fake_byte_features(payload_series: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in featurizer: byte statistics. Stands where
    a real model inference would run — the Arrow batch shape and
    vectorized (whole-Series) processing are exactly what a model
    featurizer uses."""
    import numpy as np

    n_bytes, means, checksums, heads = [], [], [], []
    for payload in payload_series:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_bytes.append(int(arr.size))
        means.append(float(arr.mean()) if arr.size else 0.0)
        checksums.append(int(arr.sum()) % (1 << 32))
        heads.append(arr[:8].tobytes().hex())
    return pd.DataFrame(
        {"n_bytes": n_bytes, "byte_mean": means, "byte_checksum": checksums, "head_hex": heads}
    )


def extract_features(media: DataFrame, featurizer=fake_byte_features) -> DataFrame:
    """Distributed feature extraction over binary payloads via
    ``mapInPandas``: per-partition Arrow batches, featurizer called
    once per batch (model setup amortized per batch/executor — never
    per row, unlike the reference's loop at 02:129)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-task setup (e.g. model load) would happen HERE, once.
        for pdf in batches:
            feats = featurizer(pdf["payload"])
            feats.insert(0, "media_id", pdf["media_id"].values)
            yield feats

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
