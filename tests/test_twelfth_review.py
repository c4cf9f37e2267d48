"""Regressions for the twelfth review batch (operator edge cases:
nulls-ordering quantiles, bloom probe dedup, imageops guards,
index-append guard cost)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators import imageops, sketches


def test_hist_quantiles_null_bin_matches_duckdb(spark):
    """A NULL value bin must sort LAST in the cumsum (DuckDB's ASC
    default) — Spark's nulls-first added the NULL bin's count to every
    real bin and biased all quantiles low vs the twin."""
    vals = [(float(v),) for v in (10, 20, 30, 40, 50, 60, 70, 80, 90, 100)]
    vals += [(None,)] * 10  # half the rows NULL
    df = spark.createDataFrame(vals, "v double")
    bins = sketches.hist_bins(df, "v", bin_width=10)
    got = {
        r["q_permille"]: r["est_value"]
        for r in sketches.hist_quantiles(bins, (500, 900), bin_width=10).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join("(CAST(%s AS DOUBLE))" % ("NULL" if v[0] is None else v[0])
                          for v in vals) + ") AS t(v)")
    want = {
        r[0]: r[1]
        for r in con.execute(
            sketches.hist_quantiles_sql("t", "v", (500, 900), bin_width=10)
        ).fetchall()
    }
    assert got == want


def test_bloom_probe_duplicate_keys_no_false_negative(spark):
    """A key probed twice must still report maybe_present=true when it
    is in the filter (the 2k-hit count failed the ==k full-house
    test)."""
    keys = spark.createDataFrame([("a.test",), ("b.test",)], "host string")
    bits = sketches.bloom_bits(keys, "host")
    probes = spark.createDataFrame(
        [("a.test",), ("a.test",), ("zzz.test",)], "host string"
    )
    got = {
        r["host"]: r["maybe_present"]
        for r in sketches.bloom_probe(bits, probes, "host").collect()
    }
    assert got["a.test"] is True


def test_aspect_bucket_survives_garbage_dims(spark):
    """w = h = 2^31-1 metadata must not overflow the cross-ratio
    comparison: square inputs land in the square bucket."""
    df = spark.createDataFrame(
        [(1, (1 << 31) - 1, (1 << 31) - 1), (2, 1024, 1024)],
        "image_id long, w int, h int",
    )
    got = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in imageops.aspect_bucket(df).collect()
    }
    assert got[1] == (1024, 1024) == got[2]


def test_pair_alignment_zero_norm_not_aligned(spark):
    """All-zero quantized embeddings (encoder failure sentinel) must
    NOT pass the alignment gate — 0 >= 0 used to align them at any
    threshold."""
    pairs = spark.createDataFrame(
        [(1, [0.0] * 8, [0.0] * 8), (2, [1.0] * 8, [1.0] * 8)],
        "pair_id long, img_vec array<double>, cap_vec array<double>",
    )
    got = {
        r["pair_id"]: r["aligned"]
        for r in imageops.pair_alignment(pairs).collect()
    }
    assert got[1] is False
    assert got[2] is True


def test_shard_pack_keeps_null_key_rows(spark):
    """A NULL pack key must not silently vanish from the packed
    output (NULL bucket never matched the offsets equi-join)."""
    df = spark.createDataFrame(
        [("a", 10), (None, 10), ("c", 10)], "image_id string, n_bytes int"
    )
    out = imageops.shard_pack(df, "image_id", "n_bytes", shard_bytes=100, n_buckets=16)
    assert out.count() == 3


def test_search_index_append_guard_uses_bloom(spark, tmp_path):
    """Disjoint appends must skip the exact cross-slice scan via the
    id bloom (O(delta) guard); overlapping appends still raise."""
    from netrunner_spark.operators.retrieval import SearchIndex
    from netrunner_spark.tables import LakeCatalog

    docs = spark.createDataFrame(
        [(i, f"doc number {i} spark join") for i in range(40)],
        "doc_id long, text string",
    )
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    idx = SearchIndex(cat, "g")
    idx.build(docs.filter("doc_id < 20"), n_buckets=4)
    assert cat.exists("g_idbloom")
    idx.append(docs.filter("doc_id >= 20"))  # disjoint: bloom short-circuits
    with pytest.raises(ValueError, match="shares"):
        idx.append(docs.filter("doc_id = 5"))  # overlap still caught
    queries = spark.createDataFrame([(1, "spark join")], "query_id long, query string")
    assert idx.topk(queries, k=3).count() > 0
