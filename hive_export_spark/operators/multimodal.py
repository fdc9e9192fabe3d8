"""Multimodal column handling (SURVEY.md section 2.2): image/audio/video
as opaque BinaryType payloads with typed metadata, processed by
Arrow-batched Pandas functions over mapInPandas.

The decode step is STUBBED (no media libraries in this environment):
``decode_media`` raises NotImplementedError unless ``fake=True``, in which
case it produces deterministic pseudo-features from the payload bytes. The
Spark-side plumbing — schema, binary payloads, Arrow batch shapes,
partition-parallel mapInPandas — is real and tested; swapping the fake for
PIL/ffmpeg is a one-function change inside the batch iterator.

Scale notes: media payloads dominate row size, so (a) keep metadata in
separate columns to let Catalyst prune payload reads when only metadata is
queried (parquet column pruning skips the binary column entirely), and
(b) size spark.sql.files.maxPartitionBytes so one task's Arrow batches fit
in executor memory at real payload sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_source", T.StringType()),
        T.StructField("meta_lang", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text bytes become the
    opaque payload (UTF-8), metadata stays typed. Stand-in for real
    image/audio ingestion, exercising the exact schema shape."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("meta_source"),
        F.col("lang").alias("meta_lang"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: features derived from payload length.

    Replace with PIL.Image.open / soundfile / ffmpeg frame sampling in a
    real deployment. Formula is intentionally simple so a SQL oracle can
    validate the plumbing end to end.
    """
    n = len(payload)
    if media_type == "image":
        return 64 + n % 512, 64 + (n * 7) % 512, 1
    if media_type == "audio":
        return 0, 0, n % 1000
    return 320, 240, n % 100


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Batches arrive as pandas DataFrames with the payload as bytes objects;
    one output row per input row. ``fake=False`` is the seam for real
    decoders and raises until one is installed.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg/soundfile — not "
            "available in this environment; use fake=True for the "
            "deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
