"""Multimodal binary columns beyond images: video frame-sampling and
audio feature extraction as Arrow-batched pandas UDFs (task-spec
"multimodal columns": treat video/audio as opaque ``binary`` with typed
metadata; decode / frame-sample / feature-extract batch-wise).

The sandbox has no av/ffmpeg/soundfile, so — like ``images.py`` — the
codecs here are deterministic from-scratch containers that exercise the
REAL contract (schema, batching, UDF signatures, explode shape):

  NRVD1: u32 n_frames, w, h, fps_milli → n_frames raw RGB frames.
  NRAU1: u32 sample_rate, n_samples → int16 little-endian PCM.

Real MP4/WAV decoding is gated behind an import-try (``av`` /
``soundfile``) and raises NotImplementedError otherwise — clearly
marked stub; everything Spark-side is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from netrunner_spark.images import phash64

_MAGIC_VID = b"NRVD1"
_MAGIC_AUD = b"NRAU1"


# ------------------------------------------------------------------ codecs
def encode_video(frames: list[np.ndarray], fps: float = 30.0) -> bytes:
    h, w, _ = frames[0].shape
    head = _MAGIC_VID + struct.pack("<IIII", len(frames), w, h, int(fps * 1000))
    return head + b"".join(f.tobytes() for f in frames)


def decode_video(data: bytes) -> tuple[dict, list[np.ndarray]]:
    """→ (meta, frames). Raises on unknown container (real formats need
    ``av``, unavailable here)."""
    if data[:5] != _MAGIC_VID:
        # Unconditional: even with PyAV installed, routing real MP4 bytes
        # through the NRVD1 header parse would produce garbage metadata —
        # fail clearly instead. The PyAV path is a deliberate stub.
        raise NotImplementedError(
            "real video decoding (PyAV) not implemented in this build; "
            "only NRVD1 containers are supported"
        )
    n, w, h, fps_m = struct.unpack("<IIII", data[5:21])
    body = np.frombuffer(data, dtype=np.uint8, offset=21)
    frames = [
        body[i * w * h * 3 : (i + 1) * w * h * 3].reshape(h, w, 3) for i in range(n)
    ]
    return {"n_frames": n, "w": w, "h": h, "fps_milli": fps_m}, frames


def encode_audio(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    head = _MAGIC_AUD + struct.pack("<II", sample_rate, len(samples))
    return head + samples.astype("<i2").tobytes()


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    if data[:5] != _MAGIC_AUD:
        raise NotImplementedError(
            "real audio decoding (soundfile) not implemented in this "
            "build; only NRAU1 containers are supported"
        )
    rate, n = struct.unpack("<II", data[5:13])
    return rate, np.frombuffer(data, dtype="<i2", offset=13)[:n]


# ------------------------------------------------------------- pandas UDFs
VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fps_milli", T.IntegerType()),
    ]
)


@pandas_udf(VIDEO_META_SCHEMA)
def video_meta_udf(blobs: pd.Series) -> pd.DataFrame:
    rows = []
    for blob in blobs:
        try:
            meta, _ = decode_video(bytes(blob))
            rows.append(
                (True, meta["n_frames"], meta["w"], meta["h"], meta["fps_milli"])
            )
        except Exception:
            rows.append((False, None, None, None, None))
    return pd.DataFrame(
        {
            "decode_ok": pd.array([r[0] for r in rows], dtype="boolean"),
            "n_frames": pd.array([r[1] for r in rows], dtype="Int32"),
            "w": pd.array([r[2] for r in rows], dtype="Int32"),
            "h": pd.array([r[3] for r in rows], dtype="Int32"),
            "fps_milli": pd.array([r[4] for r in rows], dtype="Int32"),
        }
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_phash", T.LongType()),
    ]
)


def sample_frames(videos: DataFrame, every: int = 2) -> DataFrame:
    """(video_id, bytes) → one row per SAMPLED frame (every ``every``-th,
    always including frame 0) with its perceptual hash — the
    frame-sample + feature-extract op, ``mapInPandas`` so one video row
    fans out to many frame rows inside the executor (no driver loop,
    no full-frame materialization in the plan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for vid, blob in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    _, frames = decode_video(bytes(blob))
                except Exception:
                    continue
                for i in range(0, len(frames), every):
                    # per-frame guard: one malformed frame must skip
                    # that frame, never abort the task (r5 review)
                    try:
                        ph = phash64(frames[i])
                    except Exception:
                        continue
                    ids.append(int(vid))
                    idxs.append(i)
                    hashes.append(ph)
            yield pd.DataFrame(
                {
                    "video_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "frame_phash": pd.array(hashes, dtype="Int64"),
                }
            )

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("abs_sum", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


@pandas_udf(AUDIO_FEATURES_SCHEMA)
def audio_features_udf(blobs: pd.Series) -> pd.DataFrame:
    """Feature extraction over PCM — exact-integer features (abs-sum,
    zero-crossing count) so results are oracle-comparable."""
    rows = []
    for blob in blobs:
        try:
            rate, pcm = decode_audio(bytes(blob))
            x = pcm.astype(np.int64)
            crossings = int(np.sum((x[:-1] >= 0) != (x[1:] >= 0))) if len(x) > 1 else 0
            rows.append((True, rate, len(x), int(np.abs(x).sum()), crossings))
        except Exception:
            rows.append((False, None, None, None, None))
    return pd.DataFrame(
        {
            "decode_ok": pd.array([r[0] for r in rows], dtype="boolean"),
            "sample_rate": pd.array([r[1] for r in rows], dtype="Int32"),
            "n_samples": pd.array([r[2] for r in rows], dtype="Int32"),
            "abs_sum": pd.array([r[3] for r in rows], dtype="Int64"),
            "zero_crossings": pd.array([r[4] for r in rows], dtype="Int32"),
        }
    )


# -------------------------------------------------- deterministic builders
def synth_video_udf():
    """(video_id long) → NRVD1 bytes with n_frames = 4 + video_id % 5,
    16×16 frames seeded by (video_id, frame_idx) — the deterministic
    fake used by tests and oracle queries."""

    @pandas_udf(T.BinaryType())
    def build(ids: pd.Series) -> pd.Series:
        out = []
        for vid in ids:
            n = 4 + int(vid) % 5
            frames = [
                np.random.default_rng(int(vid) * 1000 + i)
                .integers(0, 256, (16, 16, 3), dtype=np.uint8)
                for i in range(n)
            ]
            out.append(encode_video(frames))
        return pd.Series(out)

    return build


def synth_audio_udf():
    """(audio_id long) → NRAU1 square wave: n = 1000 + (id%7)·100
    samples, period p = 10 + id%5, amplitude ±1000 — closed-form
    features: abs_sum = 1000·n, zero_crossings = (n-1)//p."""

    @pandas_udf(T.BinaryType())
    def build(ids: pd.Series) -> pd.Series:
        out = []
        for aid in ids:
            n = 1000 + (int(aid) % 7) * 100
            p = 10 + int(aid) % 5
            i = np.arange(n)
            samples = np.where((i // p) % 2 == 0, 1000, -1000).astype(np.int16)
            out.append(encode_audio(samples))
        return pd.Series(out)

    return build
