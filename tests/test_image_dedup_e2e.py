"""End-to-end image dedup over REAL binary payloads: synthetic-codec
bytes → decode_check (phash) → hamming LSH → connected components →
resolution keeper; plus the resize-to-bucket pixel path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from netrunner_spark import images
from netrunner_spark.operators import imageops, textops


def _smooth(seed: int, h: int, w: int) -> np.ndarray:
    """Deterministic smooth RGB image — low-frequency sinusoid mix, so
    the average-hash is stable under resampling (noise would not be)."""
    rng = np.random.default_rng(seed)
    ys = np.linspace(0, 1, h)[:, None]
    xs = np.linspace(0, 1, w)[None, :]
    chans = []
    for _ in range(3):
        fy, fx, ph = rng.uniform(0.5, 3.0), rng.uniform(0.5, 3.0), rng.uniform(0, 6)
        chans.append(np.sin(2 * np.pi * (fy * ys + fx * xs) + ph))
    arr = np.stack(chans, axis=2)
    return ((arr + 1) * 127.5).clip(0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 6 distinct base images; 0..2 also get near-dup variants
    for i in range(6):
        arr = _smooth(seed=100 + i, h=128, w=160)
        rows.append((i * 10, images.encode_image(arr, "png")))
        if i < 3:
            # lossy re-encode of the same pixels (quantization noise)
            rows.append((i * 10 + 1, images.encode_image(arr, "jpeg")))
            # NN-downscaled copy — lower resolution, same content
            small = images.resize_to(arr, 80, 64)
            rows.append((i * 10 + 2, images.encode_image(small, "png")))
    return spark.createDataFrame(rows, "image_id long, data binary")


def test_phash_dedup_chain_keeps_full_res(spark, corpus):
    checked = corpus.withColumn("chk", images.decode_check_udf("data")).select(
        "image_id",
        F.col("chk.phash_actual").alias("phash"),
        (
            F.col("chk.w_actual").cast("bigint") * F.col("chk.h_actual")
        ).alias("resolution"),
    )
    assert checked.filter(F.col("phash").isNull()).count() == 0
    pairs = textops.hamming_near_dups(
        checked, id_col="image_id", sig_col="phash", bits=64, bands=8, max_hamming=6
    ).select(F.col("doc_a"), F.col("doc_b"))
    cl = textops.connected_components(pairs, nodes=checked.select(F.col("image_id").alias("doc_id")))
    keep = textops.cluster_keepers(
        cl, checked.select(F.col("image_id").alias("doc_id"), "resolution"),
        quality_col="resolution",
    )
    got = {r["doc_id"]: r for r in keep.collect()}
    assert len(got) == 12
    for i in range(3):
        base = i * 10
        # the variant group clusters together…
        assert got[base + 1]["cluster_id"] == got[base]["cluster_id"]
        assert got[base + 2]["cluster_id"] == got[base]["cluster_id"]
        # …and the full-resolution lossless copy is the keeper
        assert got[base]["keep"], f"group {i}: full-res copy must win"
        assert got[base + 1]["keeper_id"] == base
        assert got[base + 2]["keeper_id"] == base
    # distinct images stay singleton keepers
    for i in range(3, 6):
        assert got[i * 10]["keep"] and got[i * 10]["cluster_id"] == i * 10


def test_resize_udf_to_assigned_bucket(spark, corpus):
    # relational pass: decode dims, assign the AR bucket; pixel pass:
    # resize into it; verify decoded dims equal the bucket and the
    # lossless path round-trips exactly (NN resize is deterministic)
    meta = corpus.withColumn("chk", images.decode_check_udf("data")).select(
        "image_id",
        "data",
        F.col("chk.w_actual").alias("w"),
        F.col("chk.h_actual").alias("h"),
    )
    small = [(64, 64), (64, 80), (80, 64), (96, 64), (64, 96)]
    bucketed = imageops.aspect_bucket(meta, buckets=small)
    resized = bucketed.withColumn(
        "rz", images.resize_udf("data", "bucket_w", "bucket_h")
    ).select(
        "image_id",
        "bucket_w",
        "bucket_h",
        F.col("rz.bytes_resized").alias("data2"),
        F.col("rz.resize_ok").alias("ok"),
    )
    out = resized.withColumn("chk2", images.decode_check_udf("data2")).select(
        "image_id", "bucket_w", "bucket_h", "ok",
        F.col("chk2.w_actual").alias("w2"), F.col("chk2.h_actual").alias("h2"),
    )
    for r in out.collect():
        assert r["ok"]
        assert (r["w2"], r["h2"]) == (r["bucket_w"], r["bucket_h"])
    # driver-side twin: the UDF output must equal resize_to exactly
    arr = _smooth(seed=7, h=100, w=70)
    blob = images.encode_image(arr, "png")
    df = spark.createDataFrame([(1, blob, 64, 80)], "i long, d binary, tw int, th int")
    got = df.select(images.resize_udf("d", "tw", "th").alias("rz")).collect()[0]["rz"]
    expect = images.encode_image(images.resize_to(arr, 64, 80), "png")
    assert bytes(got["bytes_resized"]) == expect


def test_resize_udf_bad_blob_is_soft_failure(spark):
    df = spark.createDataFrame(
        [(1, b"garbage-not-an-image", 64, 64)], "i long, d binary, tw int, th int"
    )
    got = df.select(images.resize_udf("d", "tw", "th").alias("rz")).collect()[0]["rz"]
    assert got["bytes_resized"] is None and got["resize_ok"] is False
