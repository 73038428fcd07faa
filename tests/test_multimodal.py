"""Multimodal plumbing: schemas, batching, and determinism of the
mapInPandas pipelines (decode kernels are deterministic fakes by design)."""

import pytest
from pyspark.sql import functions as F

from vectordb_cloud_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    make_fake_media,
    make_real_media,
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


@pytest.fixture(scope="module")
def real_media(spark):
    imgs = make_real_media(spark, n=8, kind="image")
    auds = make_real_media(spark, n=4, kind="audio")
    return imgs.unionByName(auds).cache()


def test_real_image_features_match_numpy_truth(real_media):
    """The real backend decodes the ACTUAL PNG payloads; per-channel
    mean/min/max in the feature must match numpy over the pre-encode
    array (round-tripped through the codec)."""
    import numpy as np

    from vectordb_cloud_spark.functions.codecs import decode_png

    rows = {r["media_id"]: r for r in
            extract_image_features(real_media, decode_backend="real").collect()}
    assert len(rows) == 8
    src = {r["media_id"]: r
           for r in real_media.filter(F.col("kind") == "image").collect()}
    for mid, row in rows.items():
        arr = decode_png(bytes(src[mid]["data"])).reshape(-1, 3).astype(np.float64)
        feat = row["feature"]
        for c in range(3):
            assert feat[c] == pytest.approx(arr[:, c].mean(), rel=1e-6)   # mean
            assert feat[6 + c] == arr[:, c].min()                          # min
            assert feat[9 + c] == arr[:, c].max()                          # max
        # dims come from the FILE (here equal to the metadata by fixture)
        assert (feat[12], feat[13]) == (float(src[mid]["width"]),
                                        float(src[mid]["height"]))


def test_real_audio_features_sine_rms(real_media):
    """Real WAV decode: a 0.5+0.25 amplitude two-tone sine has RMS
    ~= sqrt(0.5^2/2 + 0.25^2/2) per frame; ZCR is strictly positive."""
    rows = extract_audio_features(real_media, decode_backend="real",
                                  n_frames=4).collect()
    assert len(rows) == 4
    expected_rms = (0.5 ** 2 / 2 + 0.25 ** 2 / 2) ** 0.5
    for r in rows:
        *rms, zcr = r["feature"]
        assert len(rms) == 4
        for v in rms:
            assert v == pytest.approx(expected_rms, rel=0.05)
        assert zcr > 0.0


def test_real_resize_roundtrips_valid_png(real_media):
    from vectordb_cloud_spark.functions.codecs import decode_png

    out = resize_images(real_media, 32, 24, decode_backend="real")
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        arr = decode_png(bytes(r["data"]))  # still a decodable PNG
        assert arr.shape == (24, 32, 3)
        assert (r["width"], r["height"]) == (32, 24)


def test_video_real_backend_rejects_fake_payload(media):
    """Fake payloads are not AVI: the real backend fails loudly (CodecError
    from the RIFF magic check), not silently."""
    from vectordb_cloud_spark.functions.codecs import CodecError

    with pytest.raises(Exception, match="not an AVI"):
        sample_video_frames(media, decode_backend="real").collect()


def test_real_video_frame_sampling_decodes_true_frames(spark):
    """The last stub is closed: real frame sampling seeks the stdlib AVI
    container — every emitted frame is a valid PNG whose pixels equal the
    frame the timestamp maps to in the source video."""
    import numpy as np

    from vectordb_cloud_spark.functions.codecs import decode_avi, decode_png
    from vectordb_cloud_spark.operators.multimodal import make_real_media

    vids = make_real_media(spark, n=4, kind="video").cache()
    out = sample_video_frames(vids, every_ms=300, decode_backend="real")
    rows = out.collect()
    assert rows

    src = {r["media_id"]: bytes(r["data"]) for r in vids.collect()}
    durs = {r["media_id"]: int(r["duration_ms"]) for r in vids.collect()}
    n_expected = sum(len(range(0, durs[m], 300)) for m in src)
    assert len(rows) == n_expected
    for r in rows:
        frames, fps = decode_avi(src[r["media_id"]])
        idx = min(int(r["frame_ts_ms"] * fps // 1000), len(frames) - 1)
        got = decode_png(bytes(r["frame"]))
        assert (got == frames[idx]).all()


def test_unknown_backend_rejected(media):
    with pytest.raises(ValueError):
        extract_image_features(media, decode_backend="magic")
