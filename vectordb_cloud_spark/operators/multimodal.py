"""Multimodal column plumbing: image/audio/video as opaque binary columns.

North-star requirement (BASELINE.json): treat media as ``binary`` columns
with typed metadata and run decode / feature-extract / resize / frame-sample
as Arrow-batched pandas iterators (``mapInPandas``). The decode kernels are
STUBBED (image/audio libraries are not in this container) behind
``decode_backend="fake"`` — a deterministic fake decoder — while everything
Spark-side is real and tested: schema, batching, partition sizing, UDF
signatures.

Scale design: media rows are fat (MBs); ``repartition`` by size budget before
mapInPandas so a batch of rows fits executor memory, and carry metadata in
plain columns so filters (format/width/duration) prune *before* any decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("format", StringType()),      # png/jpeg/wav/mp4/...
    StructField("data", BinaryType()),        # opaque payload
    StructField("width", LongType()),         # image/video metadata
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),   # audio/video metadata
])


def make_fake_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes) for
    exercising the plumbing without codec libraries."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 32  # 1 KiB
        rows.append((i, kind, "png" if kind == "image" else "wav", bytearray(payload),
                     64 + i % 32, 64 + i % 16, 1000 + i))
    # a tiny synthetic table scattered over default parallelism (32) makes
    # every downstream mapInPandas spin one Python worker per near-empty
    # partition; pack it into a few partitions sized ~16 rows each instead
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(max(1, n // 16))


def _fake_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: seeds a uint8 HxWx3
    array from the payload hash. Replace with PIL/libvips when available."""
    seed = int.from_bytes(hashlib.md5(bytes(data[:64])).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(int(height), int(width), 3), dtype=np.uint8)


def extract_image_features(media: DataFrame, decode_backend: str = "fake",
                           feature_dim: int = 16) -> DataFrame:
    """Decode + feature-extract over image rows via mapInPandas.

    Output: (media_id, format, feature: array<float>) — the feature is the
    per-channel mean/std pyramid of the decoded array (a deterministic,
    library-free stand-in for a CNN embedding). Batches stream through Arrow;
    one decode per row, vectorized math per batch.
    """
    if decode_backend == "real":  # pragma: no cover - codec libs absent here
        raise NotImplementedError(
            "real image decoding requires PIL/opencv, not present in this "
            "container; use decode_backend='fake'"
        )

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("feature", ArrayType(FloatType(), containsNull=False)),
    ])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for data, w, h in zip(pdf["data"], pdf["width"], pdf["height"]):
                arr = _fake_decode(data, w, h).astype(np.float64)
                chans = arr.reshape(-1, 3)
                f = np.concatenate([
                    chans.mean(axis=0), chans.std(axis=0),
                    np.percentile(chans, [25, 50, 75], axis=0).ravel(),
                ])
                f = np.resize(f, feature_dim).astype(np.float32)
                feats.append(f.tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "format": pdf["format"],
                "feature": feats,
            })

    imgs = media.filter(F.col("kind") == "image")
    return imgs.mapInPandas(_batches, out_schema)


def extract_audio_features(media: DataFrame, decode_backend: str = "fake",
                           n_frames: int = 8) -> DataFrame:
    """Decode + feature-extract over audio rows via mapInPandas.

    Output: (media_id, format, feature: array<float>) — per-frame RMS energy
    plus a global zero-crossing rate over a deterministic fake PCM waveform
    seeded from the payload (length ∝ duration_ms, so metadata drives shape
    exactly like a real decoder). Replace ``_fake_pcm`` with soundfile/ffmpeg
    when codec libs exist; the Spark plumbing (Arrow batches, schema,
    partitioning) is the real contract.
    """
    if decode_backend == "real":  # pragma: no cover - codec libs absent here
        raise NotImplementedError(
            "real audio decoding requires soundfile/ffmpeg, not present in "
            "this container; use decode_backend='fake'"
        )

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("feature", ArrayType(FloatType(), containsNull=False)),
    ])

    def _fake_pcm(data: bytes, duration_ms: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(bytes(data[:64])).digest()[:4], "little")
        rng = np.random.default_rng(seed)
        n_samples = max(int(duration_ms) * 8, n_frames)  # 8 kHz-ish
        return rng.standard_normal(n_samples).astype(np.float64)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for data, dur in zip(pdf["data"], pdf["duration_ms"]):
                pcm = _fake_pcm(data, dur)
                frames = np.array_split(pcm, n_frames)
                rms = [float(np.sqrt((f * f).mean())) for f in frames]
                zcr = float((np.diff(np.signbit(pcm)) != 0).mean())
                feats.append(np.asarray(rms + [zcr], dtype=np.float32).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "format": pdf["format"],
                "feature": feats,
            })

    auds = media.filter(F.col("kind") == "audio")
    return auds.mapInPandas(_batches, out_schema)


def resize_images(media: DataFrame, target_w: int, target_h: int,
                  decode_backend: str = "fake") -> DataFrame:
    """Decode -> resize -> re-encode pipeline shape. With the fake backend
    the 'resize' re-seeds at the target dims; the plumbing (schema
    preservation, metadata update, binary round-trip) is real."""
    if decode_backend == "real":  # pragma: no cover
        raise NotImplementedError("real resize requires PIL/opencv")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            new_payloads = []
            for data in pdf["data"]:
                arr = _fake_decode(data, target_w, target_h)
                new_payloads.append(arr.tobytes()[:1024])
            out["data"] = new_payloads
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(_batches, media.schema)


def sample_video_frames(media: DataFrame, every_ms: int = 500,
                        decode_backend: str = "fake") -> DataFrame:
    """Frame sampling: one output row per sampled timestamp (flatMap shape).
    Real backend would seek the container; fake derives frame bytes
    deterministically from (payload, ts)."""
    if decode_backend == "real":  # pragma: no cover
        raise NotImplementedError("real frame sampling requires ffmpeg bindings")

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, tss, frames = [], [], []
            for mid, data, dur in zip(pdf["media_id"], pdf["data"], pdf["duration_ms"]):
                for ts in range(0, int(dur), every_ms):
                    ids.append(mid)
                    tss.append(ts)
                    frames.append(hashlib.md5(bytes(data[:32]) + str(ts).encode()).digest())
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss, "frame": frames})

    vids = media.filter(F.col("kind") == "video")
    return vids.mapInPandas(_batches, out_schema)


def partition_for_media(media: DataFrame, target_mb_per_partition: int = 256,
                        avg_row_mb: float = 1.0) -> DataFrame:
    """Right-size partitions so fat binary rows don't blow executor memory:
    rows-per-partition = budget / avg row size. At 100 TB this is the knob
    that keeps decode tasks uniform."""
    rows_per_part = max(1, int(target_mb_per_partition / max(avg_row_mb, 0.01)))
    n = media.count()
    return media.repartition(max(1, n // rows_per_part))
