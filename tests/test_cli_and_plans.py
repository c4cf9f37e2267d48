"""CLI entry points (§3 command surface) + preprocess plan + RSS feeds
in discovery."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F


def test_preprocess_warc_roundtrip(spark, tmp_path):
    from netrunner_spark.plans.preprocess import preprocess_warc, validate_parsed
    from netrunner_spark.sources.warc import warc_export
    from netrunner_spark.synth import gen_web

    web = gen_web(spark, 2, 20).filter(F.col("status") == 200)
    warc_dir = str(tmp_path / "warc")
    warc_export(web, warc_dir).collect()
    parsed = preprocess_warc(spark, warc_dir)
    n = parsed.count()
    assert 0 < n <= web.count()  # canonical dedup may collapse some
    assert validate_parsed(parsed)
    assert parsed.filter(F.col("content_hash").isNull()).count() == 0


def test_check_urls_with_feeds(spark):
    from netrunner_spark.lens import LensConfig
    from netrunner_spark.plans.check_urls import check_urls
    from netrunner_spark.synth import gen_cdx, gen_feeds, gen_robots, gen_sitemaps

    n, p = 4, 24
    lens = LensConfig(domains=[f"host{h}.test" for h in range(n)])
    urls = check_urls(
        spark,
        lens,
        gen_robots(spark, n),
        gen_sitemaps(spark, n, p),
        gen_cdx(spark, n, p),
        feeds=gen_feeds(spark, n, p),
    )
    got = {r["url"] for r in urls.collect()}
    # host1 exposes a feed with pages ≡1 (mod 6): page 7 is odd → only
    # reachable via RSS (sitemaps carry evens)
    assert "https://host1.test/blog/7" in got


def test_crawl_folder(spark, tmp_path):
    from netrunner_spark.sources.archive import crawl_folder

    d = tmp_path / "docs"
    d.mkdir()
    (d / "alpha.html").write_text("<html><body>A</body></html>")
    (d / "beta.html").write_text("<html><body>B</body></html>")
    df = crawl_folder(spark, str(d), "https://folder.test")
    rows = {r["url"]: r["content"] for r in df.collect()}
    assert set(rows) == {"https://folder.test/alpha", "https://folder.test/beta"}
    assert rows["https://folder.test/alpha"].startswith("<html>")


@pytest.mark.parametrize(
    "argv",
    [["parse", "--url", "https://x.test/", "--file", "/root/reference/fixtures/html/raw.html"]],
)
def test_cli_parse(argv):
    out = subprocess.run(
        [sys.executable, "-m", "netrunner_spark", *argv],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-500:]
    doc = json.loads(out.stdout)
    assert doc["title"] == "Old School RuneScape Wiki"
    assert len(doc["links"]) == 58


def test_scrub_parsed_redacts_and_observes(spark, tmp_path):
    # e2e through the ENGINE path: synthetic web -> WARC -> preprocess
    # -> scrub stage. A PII-bearing page comes out redacted; the
    # observe metric equals the sum of per-row counts from the SAME
    # single pass.
    from netrunner_spark.plans.preprocess import preprocess_warc, scrub_parsed
    from netrunner_spark.sources.warc import warc_export
    from netrunner_spark.synth import gen_web

    web = gen_web(spark, 2, 10).filter(F.col("status") == 200)
    pii_html = (
        "<html><title>contact</title><body>write to ops@leak.example.org "
        "or call +1 415 555 0000 from 10.0.0.7</body></html>"
    )
    extra = spark.createDataFrame(
        [("https://host0.test/contact", "host0.test", 200, pii_html)],
        "url string, host string, status int, content string",
    ).withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit("content-type").alias("name"),
                F.lit("text/html").alias("value"),
            )
        ),
    )
    warc_dir = str(tmp_path / "warc")
    warc_export(
        web.select("url", "host", "status", "headers", "content").unionByName(
            extra
        ),
        warc_dir,
    ).collect()

    scrubbed = scrub_parsed(preprocess_warc(spark, warc_dir))
    rows = scrubbed.collect()
    target = [r for r in rows if r.url == "https://host0.test/contact"]
    assert len(target) == 1
    body = target[0].content
    assert "<EMAIL>" in body and "<PHONE>" in body and "<IP>" in body
    assert "leak.example.org" not in body and "415 555" not in body
    assert target[0].n_pii == 3
    # every non-injected page is untouched (n_pii 0) at synth scale
    assert all(r.n_pii == 0 for r in rows if r.url != target[0].url)
