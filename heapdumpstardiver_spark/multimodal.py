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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, rgb: bytes,
               filter_type: int | None = None) -> bytes:
    """Minimal 8-bit RGB PNG encoder — stdlib zlib only, used to
    build deterministic image fixtures. By default each scanline
    cycles filter types 0-4 (None/Sub/Up/Average/Paeth) so a decoder
    round-trip exercises every unfilter path in the spec."""
    import struct
    import zlib

    stride = width * 3
    if len(rgb) != stride * height:
        raise ValueError(f"need {stride * height} RGB bytes, got {len(rgb)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = rgb[y * stride:(y + 1) * stride]
        ft = (y % 5) if filter_type is None else filter_type
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - 3] if i >= 3 else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            enc = bytearray()
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((line[i] - pred) & 0xFF)
            raw += enc
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> bytes:
    """Pure-stdlib PNG decode (zlib inflate + scanline unfilter) to
    raw RGB bytes — the built-in codec behind :func:`decode`, covering
    8-bit non-interlaced truecolor (the fixture/export format). All
    five PNG filter types are reconstructed per the spec; anything
    fancier (palette, 16-bit, interlace) still needs an injected
    codec."""
    import struct
    import zlib

    if bytes(payload[:8]) != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, w, h = 8, bytearray(), None, None
    data = bytes(payload)
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or inter != 0:
                raise NotImplementedError(
                    "built-in codec covers 8-bit non-interlaced RGB PNG only"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    out = bytearray()
    prev = bytes(stride)
    p = 0
    for _y in range(h):
        ft = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if ft == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += line
        prev = bytes(line)
    return bytes(out)


def _builtin_decoder(payload: bytes) -> bytes:
    if bytes(payload[:8]) == _PNG_MAGIC:
        return decode_png(payload)
    raise NotImplementedError(
        "no built-in codec for this payload format; inject decoder=... "
        "(only PNG decodes stdlib-side in this environment)"
    )


def decode(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Decode payloads to raw bytes via Arrow-batched ``mapInPandas``.

    PNG payloads decode with the built-in stdlib codec
    (:func:`decode_png`); other formats need an injected *decoder*
    (production would supply PIL/libav — those libraries don't ship in
    this environment, and a non-PNG payload without an injected codec
    raises ``NotImplementedError`` executor-side)."""
    if decoder is None:
        decoder = _builtin_decoder

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
