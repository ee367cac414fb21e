"""Multimodal plumbing tests: schemas, mapInPandas batch shapes, and
the deterministic fake featurizer (the decode step itself is stubbed —
no codec libraries in this environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heapdumpstardiver_spark import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-1", ("png", 640, 480, None, None)),
        (2, "image", b"\x89PNG-fake-2", ("png", 1024, 768, None, None)),
        (3, "audio", b"RIFF-fake", ("wav", None, None, 16000, 2_000)),
        (4, "video", b"mp4-fake", ("mp4", 1920, 1080, None, 5_500)),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode(media)


def test_decode_with_injected_decoder(media):
    out = M.decode(media, decoder=lambda payload: bytes(payload)[:4]).collect()
    assert {bytes(r["decoded"]) for r in out} == {b"\x89PNG", b"RIFF", b"mp4-"}


def test_extract_features_deterministic_unit_vectors(media):
    out = M.extract_features(media).collect()
    assert len(out) == 4
    for r in out:
        assert len(r["features"]) == M.FEATURE_DIM
        norm = sum(x * x for x in r["features"]) ** 0.5
        assert abs(norm - 1.0) < 1e-5
    # deterministic: same payload → same vector
    again = M.extract_features(media).collect()
    assert {r["media_id"]: r["features"] for r in out} == {
        r["media_id"]: r["features"] for r in again
    }


def test_resize_plan_metadata_only(media):
    out = {r["media_id"]: r for r in M.resize_plan(media, 320, 240).collect()}
    assert out[1]["meta"]["width"] == 320 and out[1]["scale_x"] == 2.0
    assert bytes(out[1]["payload"]) == b"\x89PNG-fake-1"  # payload untouched


def test_sample_frames_plan(media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    # only the video row fans out: duration 5500ms → ts 0,1000,...,5000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000, 4000, 5000]
    assert all(r["media_id"] == 4 for r in frames)


def test_features_feed_ann(spark, media):
    """Features flow into the same cosine machinery as embeddings."""
    from heapdumpstardiver_spark.exprs import cosine

    feats = M.extract_features(media).select(
        "media_id", F.col("features").cast("array<double>").alias("v")
    )
    q = feats.filter(F.col("media_id") == 1).select(F.col("v").alias("qv"))
    sims = (
        feats.crossJoin(F.broadcast(q))
        .select("media_id", cosine(F.col("v"), F.col("qv")).alias("sim"))
        .collect()
    )
    by_id = {r["media_id"]: r["sim"] for r in sims}
    assert abs(by_id[1] - 1.0) < 1e-9
    assert all(abs(v) < 1.0 for k, v in by_id.items() if k != 1)
