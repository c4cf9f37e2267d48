"""Image payload: decode / validate / PSNR / phash — batch-wise pandas
UDFs over an opaque ``binary`` column (input_hint schema: image_id,
bytes, w, h, fmt, caption, phash).

The sandbox has no image libraries (no PIL), so the codecs here are
deterministic from-scratch formats that exercise the REAL contract:

  fmt='png'  → NRV1 container, lossless: header + raw RGB bytes.
  fmt='jpeg' → NRQ1 container, lossy: 6-bit/channel quantization →
               deterministic reconstruction error, PSNR ≈ 46 dB > 40 dB,
               so the lossy-path invariant (PSNR ≥ 40) is genuinely
               tested, not vacuously.

Real PNG/JPEG decoding is gated behind an import-try of PIL and raises
NotImplementedError otherwise — clearly-marked stub; the Spark-side
plumbing (schema, batching, UDF signatures) is real and tested.

All UDFs are Arrow-batched (never per-row Python in the plan).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MAGIC_RAW = b"NRV1"
_MAGIC_QNT = b"NRQ1"
_QUANT_BITS = 6  # keep: PSNR ≈ 46 dB (step=4 ⇒ MSE≈1.33)


# ------------------------------------------------------------------ codecs
def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """arr: (h, w, 3) uint8."""
    h, w, _ = arr.shape
    header = struct.pack("<II", w, h)
    if fmt == "png":
        return _MAGIC_RAW + header + arr.tobytes()
    if fmt == "jpeg":
        step = 1 << (8 - _QUANT_BITS)
        q = (arr // step).astype(np.uint8)
        return _MAGIC_QNT + header + q.tobytes()
    raise NotImplementedError(f"unsupported synthetic format: {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8. Raises on unknown container."""
    magic, header = data[:4], data[4:12]
    w, h = struct.unpack("<II", header)
    body = np.frombuffer(data, dtype=np.uint8, offset=12)
    if magic == _MAGIC_RAW:
        return body.reshape(h, w, 3)
    if magic == _MAGIC_QNT:
        step = 1 << (8 - _QUANT_BITS)
        # dequantize to bucket midpoint (deterministic reconstruction)
        return (body.reshape(h, w, 3).astype(np.uint16) * step + step // 2).clip(
            0, 255
        ).astype(np.uint8)
    try:  # pragma: no cover - real decoder path, not available in sandbox
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError as exc:
        raise NotImplementedError(
            "real image decoding requires PIL (unavailable in this sandbox); "
            "synthetic NRV1/NRQ1 containers are supported"
        ) from exc


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(arr: np.ndarray) -> int:
    """Average-hash: gray → 8×8 block means → bits(pixel > mean) → i64.

    From-scratch perceptual hash (role analog of any phash; the
    reference has none — this is the image+caption extension from
    BASELINE.json input_hint).
    """
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h < 8 or w < 8:
        # edge-pad tiny frames to the 8x8 block grid (r5 review: the
        # reshape raised for <8px inputs, crashing the whole Spark
        # task from media.sample_frames and misreporting a validly
        # decoded small image as decode_ok=False). Padding only
        # activates below 8px, so every pinned >=8px hash is unchanged.
        gray = np.pad(
            gray, ((0, max(0, 8 - h)), (0, max(0, 8 - w))), mode="edge"
        )
        h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    g = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (g > g.mean()).flatten()
    # packbits packs bit 0 into the MSB of byte 0 — identical to the
    # former (val << 1) | bit loop, vectorized
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= 1 << 63 else val


# ------------------------------------------------------------- pandas UDFs
DECODE_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("w_actual", T.IntegerType()),
        T.StructField("h_actual", T.IntegerType()),
        T.StructField("phash_actual", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


@pandas_udf(DECODE_CHECK_SCHEMA)
def decode_check_udf(blobs: pd.Series) -> pd.DataFrame:
    rows = []
    for blob in blobs:
        try:
            arr = decode_image(bytes(blob))
            rows.append(
                (
                    True,
                    int(arr.shape[1]),
                    int(arr.shape[0]),
                    phash64(arr),
                    float(arr.mean()),
                )
            )
        except Exception:
            rows.append((False, None, None, None, None))
    # CRITICAL: nullable integer dtypes. A plain pd.DataFrame over mixed
    # int/None rows infers float64, which silently destroys the low bits
    # of 64-bit phashes (float64 has 53 mantissa bits) — every
    # validation in a batch containing one imageless row would then
    # fail the phash equality.
    return pd.DataFrame(
        {
            "decode_ok": pd.array([r[0] for r in rows], dtype="boolean"),
            "w_actual": pd.array([r[1] for r in rows], dtype="Int32"),
            "h_actual": pd.array([r[2] for r in rows], dtype="Int32"),
            "phash_actual": pd.array([r[3] for r in rows], dtype="Int64"),
            "mean_px": pd.array([r[4] for r in rows], dtype="Float64"),
        }
    )


def resize_to(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize (h, w, 3) → (th, tw, 3), from scratch.

    Deterministic index mapping: source index = floor(i * src / dst)
    (the standard NN grid, no half-pixel offset) — pure integer
    arithmetic, identical across platforms. Real bilinear/Lanczos
    resampling needs an image library (PIL path gated elsewhere);
    NN is the honest from-scratch baseline and is what the aspect-
    bucket trainer prep uses for the synthetic corpus.
    """
    h, w, _ = arr.shape
    rows = (np.arange(th, dtype=np.int64) * h) // th
    cols = (np.arange(tw, dtype=np.int64) * w) // tw
    return arr[rows][:, cols]


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("bytes_resized", T.BinaryType()),
        T.StructField("resize_ok", T.BooleanType()),
    ]
)


@pandas_udf(RESIZE_SCHEMA)
def resize_udf(blobs: pd.Series, tws: pd.Series, ths: pd.Series) -> pd.DataFrame:
    """Batch resize-to-bucket: (bytes, target_w, target_h) →
    (bytes_resized, resize_ok). Pairs with
    ``imageops.aspect_bucket`` — the relational pass assigns
    (bucket_w, bucket_h), this Arrow-batched pass materializes the
    pixels. Output re-encodes with the INPUT's container (lossless
    stays lossless). Decode failures → (NULL, false), never a thrown
    batch.
    """
    out_bytes, out_ok = [], []
    for blob, tw, th in zip(blobs, tws, ths):
        try:
            raw = bytes(blob)
            fmt = "png" if raw[:4] == _MAGIC_RAW else "jpeg"
            resized = resize_to(decode_image(raw), int(tw), int(th))
            out_bytes.append(encode_image(resized, fmt))
            out_ok.append(True)
        except Exception:
            out_bytes.append(None)
            out_ok.append(False)
    return pd.DataFrame(
        {
            "bytes_resized": pd.Series(out_bytes, dtype="object"),
            "resize_ok": pd.array(out_ok, dtype="boolean"),
        }
    )


@pandas_udf(T.DoubleType())
def psnr_udf(blobs_a: pd.Series, blobs_b: pd.Series) -> pd.Series:
    out = []
    for a, b in zip(blobs_a, blobs_b):
        try:
            out.append(psnr(decode_image(bytes(a)), decode_image(bytes(b))))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="float64")
