"""Relational image-curation operators (metadata-only plans)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators import imageops


def _images(spark, rows):
    return spark.createDataFrame(
        rows, "image_id long, w int, h int, fmt string, n_bytes long, caption string"
    )


def test_quality_gate_precedence_and_pass(spark):
    rows = [
        (1, 512, 512, "png", 9000, "a fine painting of a fox"),
        (2, 512, 512, "webp", 9000, "ok caption"),          # format
        (3, 16, 512, "png", 9000, "ok caption"),            # too_small
        (4, 512, 512, "png", 10, "ok caption"),             # too_few_bytes
        (5, 4096, 512, "jpeg", 9000, "ok caption"),         # aspect (8:1)
        (6, 512, 512, "jpeg", 9000, "img"),                 # caption too short
        (7, 16, 512, "webp", 10, "x"),                      # format wins (precedence)
        (8, 512, 2048, "png", 9000, "tall but within 1:4"),
    ]
    got = {
        r["image_id"]: (r["pass"], r["reject_reason"])
        for r in imageops.quality_gate(_images(spark, rows)).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "format")
    assert got[3] == (False, "too_small")
    assert got[4] == (False, "too_few_bytes")
    assert got[5] == (False, "aspect")
    assert got[6] == (False, "caption")
    assert got[7] == (False, "format")
    assert got[8] == (True, None)


def test_quality_gate_is_map_only(spark):
    df = _images(spark, [(1, 512, 512, "png", 9000, "caption here")])
    plan = imageops.quality_gate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_aspect_bucket_nearest_and_ties(spark):
    rows = [
        (1, 1000, 1000, "png", 1, "c"),   # → 1024×1024
        (2, 1344, 768, "png", 1, "c"),    # exact 1344×768
        (3, 700, 1500, "png", 1, "c"),    # ~0.467 → 640×1536 (0.4167) vs 768×1344 (0.571)
        (4, 3000, 600, "png", 1, "c"),    # wide → 2048×512
    ]
    got = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in imageops.aspect_bucket(_images(spark, rows)).collect()
    }
    assert got[1] == (1024, 1024)
    assert got[2] == (1344, 768)
    assert got[4] == (2048, 512)
    # AR 700/1500 = 0.4667: ratio to 640/1536=0.4167 is 1.12; to
    # 768/1344=0.5714 is 1.22 → nearer 640×1536
    assert got[3] == (640, 1536)


def test_aspect_bucket_matches_duckdb_case(spark):
    """The generated DuckDB argmin must agree with the Spark ladder on
    a sweep of aspect ratios (same bucket table, same comparison)."""
    dims = [
        (i, w, h)
        for i, (w, h) in enumerate(
            (w, h)
            for w in (64, 333, 512, 1000, 1344, 1999, 4096)
            for h in (64, 500, 768, 1024, 3000)
        )
    ]
    rows = [(i, w, h, "png", 1, "c") for i, w, h in dims]
    df = imageops.aspect_bucket(_images(spark, rows))
    got = {r["image_id"]: (r["bucket_w"], r["bucket_h"]) for r in df.collect()}
    expr = imageops.aspect_bucket_sql_case()
    values = ", ".join(f"({i}, {w}::BIGINT, {h}::BIGINT)" for i, w, h in dims)
    oracle = duckdb.connect().execute(
        f"SELECT image_id, ({expr}).bw AS bw, ({expr}).bh AS bh "
        f"FROM (VALUES {values}) AS t(image_id, w, h)"
    ).fetchall()
    assert {i: (bw, bh) for i, bw, bh in oracle} == got


def test_boilerplate_captions(spark):
    rows = [(i, 64, 64, "png", 512, "image") for i in range(5)] + [
        (10, 64, 64, "png", 512, "a very specific alt text"),
        (11, 64, 64, "png", 512, "another unique caption"),
    ]
    got = {
        r["image_id"]: (r["boilerplate"], r["caption_df"])
        for r in imageops.boilerplate_captions(_images(spark, rows), max_caption_df=3).collect()
    }
    for i in range(5):
        assert got[i] == (True, 5)
    # caption_df is tracked only ABOVE the threshold; below it the df
    # is NULL = unknown (r5 review: the old coalesce-to-1 stamped a
    # confidently wrong df=1 on every sub-threshold caption)
    assert got[10] == (False, None)
    assert got[11] == (False, None)


def test_shard_pack_invariants(spark):
    df = spark.range(200).select(
        F.col("id").alias("image_id"), (F.col("id") % 7 * 100 + 50).alias("n_bytes")
    )
    out = imageops.shard_pack(df, "image_id", "n_bytes", shard_bytes=1500, n_buckets=16)
    rows = sorted(out.collect(), key=lambda r: r["pack_pos"])
    assert len(rows) == 200
    # pack_pos is the exclusive prefix sum in the canonical order
    cum = 0
    for r in rows:
        assert r["pack_pos"] == cum
        assert r["shard_id"] == cum // 1500
        cum += r["n_bytes"]
    # shards are consecutive, start at 0, no gaps
    shard_ids = sorted({r["shard_id"] for r in rows})
    assert shard_ids == list(range(len(shard_ids)))
    # shard totals are within one row's cost of the target on both
    # sides: a row STARTING before the boundary carries its whole cost
    # into the earlier shard (overrun), and the next shard then starts
    # past the boundary (undershoot) — both bounded by max row cost
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], 0)
        by_shard[r["shard_id"]] += r["n_bytes"]
    max_cost = max(r["n_bytes"] for r in rows)
    for s, total in by_shard.items():
        if s != max(shard_ids):
            assert total > 1500 - max_cost
        assert total < 1500 + max_cost


def test_shard_pack_matches_single_window(spark):
    """The distributed prefix-sum must equal the naive single-window
    form over the identical (bucket, pos, key) order."""
    from pyspark.sql import Window

    df = spark.range(300).select(
        F.col("id").alias("image_id"), (F.col("id") % 11 * 37 + 13).alias("n_bytes")
    )
    fast = imageops.shard_pack(df, "image_id", "n_bytes", shard_bytes=997, n_buckets=16)
    naive_order = [
        F.substring(
            F.md5(F.concat(F.lit("shard.b"), F.col("image_id").cast("string"))), 1, 1
        ).asc(),
        F.substring(
            F.md5(F.concat(F.lit("shard"), F.col("image_id").cast("string"))), 1, 12
        ).asc(),
        F.col("image_id").asc(),
    ]
    w = Window.orderBy(*naive_order).rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        df.withColumn("pack_pos", F.coalesce(F.sum("n_bytes").over(w), F.lit(0)))
        .withColumn("shard_id", F.floor(F.col("pack_pos") / 997))
    )
    a = {r["image_id"]: (r["pack_pos"], r["shard_id"]) for r in fast.collect()}
    b = {r["image_id"]: (r["pack_pos"], r["shard_id"]) for r in naive.collect()}
    assert a == b


def test_shard_pack_no_global_window(spark):
    """Plan shape: the corpus-sized window is partitioned by bucket;
    the only unpartitioned window runs on the B-row totals side."""
    df = spark.range(100).select(
        F.col("id").alias("image_id"), F.lit(10).alias("n_bytes")
    )
    out = imageops.shard_pack(df, "image_id", "n_bytes", shard_bytes=100, n_buckets=16)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the per-row window must carry the bucket partition spec
    assert "windowspecdefinition(_bucket" in plan


def test_pair_alignment_gate(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),    # cos 1 → aligned
        (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),    # cos 0 → not
        (3, [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),   # cos -1 → not
        (4, [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),    # cos .707 → aligned at 30%
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, img_vec array<float>, cap_vec array<float>"
    )
    got = {r["pair_id"]: r["aligned"] for r in imageops.pair_alignment(df).collect()}
    assert got == {1: True, 2: False, 3: False, 4: True}
    # threshold is respected: 80% rejects the 45° pair
    strict = {
        r["pair_id"]: r["aligned"]
        for r in imageops.pair_alignment(df, threshold_pct=80).collect()
    }
    assert strict == {1: True, 2: False, 3: False, 4: False}


def test_metadata_ops_prune_bytes_at_scan(spark, tmp_path):
    """The 100 TB claim: curation over an image+caption lake must never
    read the multi-TB `data` (bytes) column. Pin ReadSchema at the
    parquet scan for the gate and the shard packer."""
    src = spark.createDataFrame(
        [(i, bytearray(b"\x00" * 64), 128, 128, "png", 4096, f"caption {i}")
         for i in range(20)],
        "image_id long, data binary, w int, h int, fmt string, n_bytes long, caption string",
    )
    path = str(tmp_path / "imglake")
    src.write.parquet(path)
    lake = spark.read.parquet(path)

    import re

    def read_schemas(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)

    gated = imageops.quality_gate(lake).select("image_id", "pass", "reject_reason")
    schemas = read_schemas(gated)
    assert schemas and all("data" not in s for s in schemas), schemas

    packed = imageops.shard_pack(
        lake.select("image_id", "n_bytes"), "image_id", "n_bytes",
        shard_bytes=10_000, n_buckets=16,
    )
    schemas2 = read_schemas(packed)
    assert schemas2 and all(
        "data" not in s and "caption" not in s for s in schemas2
    ), schemas2


def test_sniff_mime_magic_table(spark):
    cases = {
        b"\x89PNG\r\n\x1a\n....": "image/png",
        b"\xff\xd8\xff\xe0JFIF..": "image/jpeg",
        b"GIF89a........": "image/gif",
        b"%PDF-1.7......": "application/pdf",
        b"\x1f\x8b\x08\x00......": "application/gzip",
        b"<!DOCTYPE html>": "text/html",
        b"<html><head></h": "text/html",
        b"random payload.": "application/octet-stream",
    }
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(cases)],
        "i int, bytes binary",
    )
    got = {r.i: r.mime for r in imageops.sniff_mime(df).collect()}
    for i, b in enumerate(cases):
        assert got[i] == cases[b], b


def test_sniff_mime_is_pure_projection(spark):
    df = spark.createDataFrame([(bytearray(b"x"),)], "bytes binary")
    plan = imageops.sniff_mime(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_gate_rejects_null_metadata(spark):
    """r5 review: NULL fmt/w/h/n_bytes null-propagated through ~ok and
    PASSED the gate; unknown metadata must reject at its gate."""
    from netrunner_spark.operators.imageops import quality_gate

    rows = [
        (1, None, 512, 512, 1024, "a dog photo"),       # null fmt
        (2, "png", None, 512, 1024, "a dog photo"),     # null w
        (3, "png", 512, 512, None, "a dog photo"),      # null bytes
        (4, "png", 512, 512, 1024, "a dog photo"),      # clean
    ]
    df = spark.createDataFrame(
        rows,
        "image_id long, fmt string, w int, h int, n_bytes long, caption string",
    )
    got = {r["image_id"]: (r["pass"], r["reject_reason"])
           for r in quality_gate(df).collect()}
    assert got[1] == (False, "format")
    assert got[2] == (False, "too_small")
    assert got[3] == (False, "too_few_bytes")
    assert got[4] == (True, None)
