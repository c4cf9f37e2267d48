"""Multimodal video/audio plumbing: codec roundtrips, frame sampling,
audio features, real-decoder import gates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from netrunner_spark.media import (
    audio_features_udf,
    decode_audio,
    decode_video,
    encode_audio,
    encode_video,
    sample_frames,
    synth_audio_udf,
    synth_video_udf,
    video_meta_udf,
)


def test_video_roundtrip():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (8, 12, 3), dtype=np.uint8) for _ in range(5)]
    blob = encode_video(frames, fps=24.0)
    meta, back = decode_video(blob)
    assert meta == {"n_frames": 5, "w": 12, "h": 8, "fps_milli": 24000}
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))


def test_audio_roundtrip_and_gate():
    pcm = np.array([100, -200, 300, -400], dtype=np.int16)
    rate, back = decode_audio(encode_audio(pcm, 8000))
    assert rate == 8000 and np.array_equal(back, pcm)
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFFxxxxWAVExxxxxxxxxxxx")
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00 ftypisom" + b"x" * 32)


def test_sample_frames_and_meta(spark):
    ids = spark.range(6).select(F.col("id").alias("video_id"))
    vids = ids.withColumn("bytes", synth_video_udf()(F.col("video_id")))
    meta = vids.withColumn("m", video_meta_udf(F.col("bytes")))
    got = {r["video_id"]: r["m"]["n_frames"] for r in meta.collect()}
    assert got == {v: 4 + v % 5 for v in range(6)}
    frames = sample_frames(vids, every=2)
    counts = {
        r["video_id"]: r["n"]
        for r in frames.groupBy("video_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {v: (4 + v % 5 + 1) // 2 for v in range(6)}
    # phashes are per-frame values, not nulls
    assert frames.filter(F.col("frame_phash").isNull()).count() == 0


def test_audio_features(spark):
    ids = spark.range(5).select(F.col("id").alias("audio_id"))
    a = ids.withColumn("bytes", synth_audio_udf()(F.col("audio_id")))
    f = a.withColumn("ft", audio_features_udf(F.col("bytes"))).select(
        "audio_id", "ft.n_samples", "ft.abs_sum", "ft.zero_crossings"
    )
    for r in f.collect():
        n = 1000 + (r["audio_id"] % 7) * 100
        p = 10 + r["audio_id"] % 5
        assert r["n_samples"] == n
        assert r["abs_sum"] == 1000 * n
        assert r["zero_crossings"] == (n - 1) // p
