"""S11 RON parsed-archive interchange + K5 S3 export shape.

The RON fixture line mirrors fixtures/archives/ron.gz from the
reference (1 record; shape per parser/mod.rs:170-184).
"""

import gzip

from pyspark.sql import functions as F

# reference-shaped record (same field set/order serde emits)
RON_LINE = (
    '(canonical_url:Some("https://www.wikipedia.org/"),'
    'content:"fake wikipedia",'
    'content_hash:"3aa2705839f99b324bdab14cc2936843065e32d5cd7914daa25da8f170fde538",'
    'description:"Wikipedia",'
    'meta:{"viewport":"initial-scale=1","description":"A free encyclopedia."},'
    'title:Some("Wikipedia"))'
)


def test_ron_fixture_read(spark, tmp_path):
    from netrunner_spark.sources.archive import parsed_read

    p = tmp_path / "ron.gz"
    p.write_bytes(gzip.compress((RON_LINE + "\nnot a ron line\n").encode()))
    df = parsed_read(spark, str(p))  # auto-sniff: no '.jsonl' → RON
    rows = df.collect()
    assert len(rows) == 1  # bad line silently dropped (iterator parity)
    r = rows[0]
    assert r["canonical_url"] == "https://www.wikipedia.org/"
    assert r["title"] == "Wikipedia"
    assert r["content"] == "fake wikipedia"
    assert r["meta"]["viewport"] == "initial-scale=1"


def test_ron_export_roundtrip(spark, tmp_path):
    from netrunner_spark.sources.archive import (
        PARSED_COLS,
        parsed_export_ron,
        parsed_read_ron,
    )

    src = spark.createDataFrame(
        [
            (
                "https://a.test/x",
                'Ti "quoted"',
                "desc",
                "body text\nline2",
                "hashhash",
                {"og:type": "article"},
                ["https://a.test/y"],
            ),
            (None, None, "d2", "c2", "h2", {}, []),
        ],
        "canonical_url string, title string, description string, content string,"
        " content_hash string, meta map<string,string>, links array<string>",
    )
    out = str(tmp_path / "parsed_ron")
    parsed_export_ron(src, out)
    back = parsed_read_ron(spark, out + "/part-*.txt.gz")
    got = {r["content_hash"]: r for r in back.collect()}
    assert set(got) == {"hashhash", "h2"}
    assert got["hashhash"]["title"] == 'Ti "quoted"'
    assert got["hashhash"]["content"] == "body text\nline2"
    assert got["hashhash"]["meta"] == {"og:type": "article"}
    assert got["h2"]["canonical_url"] is None
    # links are serde-skipped on export (parser/mod.rs:22-24)
    assert got["hashhash"]["links"] == []
    assert PARSED_COLS[0] == "canonical_url"


def test_jsonl_auto_sniff(spark, tmp_path):
    from netrunner_spark.sources.archive import parsed_export, parsed_read

    src = spark.createDataFrame(
        [("https://b.test/", "T", "D", "c", "h", {}, [])],
        "canonical_url string, title string, description string, content string,"
        " content_hash string, meta map<string,string>, links array<string>",
    )
    out = str(tmp_path / "parsed.jsonl")
    parsed_export(src, out)
    assert parsed_read(spark, out).count() == 1  # '.jsonl' → JSON reader


def test_s3_export_dry_run(spark):
    from netrunner_spark.sources.s3 import s3_export

    df = spark.range(3)
    uri = s3_export(df, "my-bucket", "exports/run1/", dry_run=True)
    assert uri == "s3a://my-bucket/exports/run1"
    import pytest

    with pytest.raises(ValueError):
        s3_export(df, "bad/bucket", "x", dry_run=True)
    with pytest.raises(ValueError):
        s3_export(df, "b", "x", fmt="csvish", dry_run=True)
