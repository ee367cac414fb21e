"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata (100-TB training-pipeline surface).

The Spark-side plumbing — schemas, Arrow-batched `mapInPandas`
signatures, partition-preserving shapes — is real and tested. The
actual media decoding is STUBBED: the image/audio codec libraries are
not in this environment, so ``decode`` raises
``NotImplementedError`` unless a decoder is injected, and
``extract_features`` uses a clearly-marked deterministic fake
(bytes → hash → unit vector) where a real model/codec would plug in.
The surrounding plan is exactly what production would run.

Design for scale: media payloads never enter a shuffle — every
operator is a narrow `mapInPandas` over the storage partitioning;
only fixed-width outputs (features, metadata) flow downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def decode(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Decode payloads with an injected codec. No codec libraries ship
    in this environment — calling without *decoder* raises
    ``NotImplementedError`` (deliberate stub; the mapInPandas shape is
    what production uses with e.g. PIL/libav injected)."""
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment; inject decoder=..."
        )

    out_schema = T.StructType(
        list(MEDIA_SCHEMA.fields) + [T.StructField("decoded", T.BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["decoded"] = pdf["payload"].map(decoder)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


FEATURE_DIM = 8


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-item feature vector via Arrow-batched mapInPandas.

    DETERMINISTIC FAKE FEATURES: sha256(payload) expanded to a unit
    vector — stands in for a real encoder (CLIP/wav2vec/...). The
    output schema (media_id, kind, features array<float>) and batch
    shape are the production contract; downstream ANN (queries/llm.py)
    consumes it unchanged."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def featurize(payload: bytes) -> list[float]:
        h = hashlib.sha256(bytes(payload)).digest()
        raw = [int.from_bytes(h[4 * i : 4 * i + 4], "big", signed=True) for i in range(dim)]
        norm = sum(x * x for x in raw) ** 0.5 or 1.0
        return [x / norm for x in raw]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(featurize),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_plan(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize planning: metadata-only transform (scale factors, output
    dims) computed JVM-side; the pixel work would happen inside
    ``decode`` with a real codec. Keeps the 100-TB rule: touch payload
    bytes once, in one narrow stage."""
    return df.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ).alias("meta"),
        (F.col("meta.width") / F.lit(width)).alias("scale_x"),
        (F.col("meta.height") / F.lit(height)).alias("scale_y"),
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp, derived from duration metadata with JVM-side sequence/
    explode — no Python, no payload duplication (the payload column is
    dropped before the explode so the fan-out carries only ids)."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
