"""Multimodal plumbing: schemas, batching, and determinism of the
mapInPandas pipelines (decode kernels are deterministic fakes by design)."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    make_fake_media,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    imgs = make_fake_media(spark, n=16, kind="image")
    vids = make_fake_media(spark, n=4, kind="video")
    auds = make_fake_media(spark, n=6, kind="audio")
    return imgs.unionByName(vids).unionByName(auds).cache()


def test_feature_extraction_schema_and_determinism(media):
    feats = extract_image_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 16  # only image rows
    assert all(len(r["feature"]) == 16 for r in rows)
    again = {r["media_id"]: r["feature"] for r in extract_image_features(media, feature_dim=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_resize_updates_metadata(media):
    out = resize_images(media, 32, 24)
    rows = out.collect()
    assert len(rows) == 16
    assert all(r["width"] == 32 and r["height"] == 24 for r in rows)
    assert out.schema == media.schema


def test_frame_sampling_flatmap(media):
    frames = sample_video_frames(media, every_ms=500)
    per_vid = {r["media_id"]: r["n"] for r in
               frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # duration 1000+i ms, sampled every 500 -> 2 or 3 frames
    assert set(per_vid.values()) <= {2, 3}
    assert len(per_vid) == 4


def test_audio_features_schema_and_determinism(media):
    feats = extract_audio_features(media, n_frames=8)
    rows = feats.collect()
    assert len(rows) == 6  # only audio rows
    assert all(len(r["feature"]) == 9 for r in rows)  # 8 RMS frames + ZCR
    assert all(0.0 <= r["feature"][-1] <= 1.0 for r in rows)  # ZCR is a rate
    again = {r["media_id"]: r["feature"] for r in
             extract_audio_features(media, n_frames=8).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_real_backend_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        extract_image_features(media, decode_backend="real")
    with pytest.raises(NotImplementedError):
        extract_audio_features(media, decode_backend="real")
