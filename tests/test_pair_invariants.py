"""Regressions for the sixth review batch: the image+caption pair
invariant in the synthetic world (BASELINE.json input_hint), the
validate-plan's PSNR / caption-equality checks, the canonical-pair
fixture ground truth, and the coverage-join plan shape.
"""

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.coverage import coverage_counts
from netrunner_spark.plans.validate import validate_crawl
from netrunner_spark.synth import (
    _page_html,
    gen_images,
    gen_pair_web,
    page_url,
)


@pytest.fixture(scope="module")
def pair_world(spark):
    web = gen_pair_web(spark, 3, 40).cache()
    images = gen_images(spark, 3, 40, dense=True).cache()
    return {"web": web, "images": images}


def test_caption_pair_invariant(pair_world):
    """web.content must EQUAL images.caption for every fetch-ok row —
    the pair promise from input_hint. Broken before r5: both
    generators shared the (seed,'img',iid) RNG stream but consumed it
    at different positions, so every caption diverged."""
    ok = pair_world["web"].filter(
        (F.col("status") == 200) | (F.col("ia_status") == 200)
    )
    joined = ok.join(
        pair_world["images"].select("image_id", "caption"), "image_id"
    )
    n_ok = joined.count()
    assert n_ok > 0
    mismatched = joined.filter(F.col("content") != F.col("caption")).count()
    assert mismatched == 0


def test_validate_pair_invariants_pass(pair_world):
    web, images = pair_world["web"], pair_world["images"]
    cache = web.filter(F.col("status") == 200)
    result = validate_crawl(
        cache,
        cache.select("url"),
        images,
        crawled_images=images.select("image_id", "bytes"),
        check_captions=True,
    )
    assert result.ok, result.errors
    assert result.caption_mismatches == 0
    assert result.psnr_failures == 0


def test_validate_catches_caption_corruption(pair_world):
    web, images = pair_world["web"], pair_world["images"]
    cache = web.filter(F.col("status") == 200)
    # corrupt exactly one cached caption
    corrupted = cache.withColumn(
        "content",
        F.when(
            F.col("image_id") == "img-0-0", F.lit("corrupted caption")
        ).otherwise(F.col("content")),
    )
    result = validate_crawl(
        corrupted, corrupted.select("url"), images, check_captions=True
    )
    assert not result.ok
    assert result.caption_mismatches == 1


def test_validate_catches_pixel_corruption(spark, pair_world):
    """Lossless rows must be bit-exact, lossy ≥ 40 dB — flip pixels in
    one crawled copy of each kind and both must be caught."""
    from netrunner_spark.images import decode_image, encode_image

    web, images = pair_world["web"], pair_world["images"]
    cache = web.filter(F.col("status") == 200)
    rows = images.filter(F.col("image_id").isin("img-0-0", "img-0-1")).collect()
    by_id = {r["image_id"]: r for r in rows}
    assert by_id["img-0-0"]["fmt"] == "png"
    assert by_id["img-0-1"]["fmt"] == "jpeg"
    corrupt = {}
    for iid, r in by_id.items():
        arr = decode_image(bytes(r["bytes"]))
        # heavy corruption: invert — lossless no longer exact, lossy
        # PSNR collapses far below 40 dB
        corrupt[iid] = encode_image(255 - arr, r["fmt"])
    all_rows = images.select("image_id", "bytes").collect()
    crawled = spark.createDataFrame(
        [
            (r["image_id"], bytearray(corrupt.get(r["image_id"], bytes(r["bytes"]))))
            for r in all_rows
        ],
        "image_id string, bytes binary",
    )
    result = validate_crawl(
        cache,
        cache.select("url"),
        images,
        crawled_images=crawled,
    )
    assert not result.ok
    assert result.psnr_failures == 2


def test_canonical_never_targets_private():
    """Fixture ground truth (r5 review): a declared canonical duplicate
    must point at a crawlable page — never a robots-disallowed
    /private URL (old bug: i ≡ 18 mod 110 targeted private pages and
    the F9 pair could never form)."""
    found_pairs = 0
    for i in range(2, 440):
        html, _ = _page_html(0, i, 3, 440, seed=42)
        if 'rel="canonical"' in html:
            found_pairs += 1
            target = html.split('rel="canonical" href="')[1].split('"')[0]
            assert "/private/" not in target, (i, target)
            assert target == page_url(0, i - 2)
    assert found_pairs > 30  # the F9 fixture is still well-exercised


def test_coverage_counts_zero_hit_prefix_and_plan(spark):
    """coverage_counts must (a) keep zero-hit prefixes (they are the
    whole point — they trigger the CDX second pass) and (b) never
    shuffle the frontier: the old right-outer broadcast hint was
    silently unenforceable (build side = preserved side) and fell back
    to a full sort-merge shuffle of the frontier (r5 review)."""
    frontier = spark.createDataFrame(
        [
            ("https://a.test/docs/1", "a.test"),
            ("https://a.test/docs/2", "a.test"),
            ("https://b.test/blog/1", "b.test"),
        ],
        "url string, host string",
    )
    prefixes = spark.createDataFrame(
        [("https://a.test/docs/",), ("https://c.test/none/",)],
        "prefix string",
    )
    out = coverage_counts(frontier, prefixes)
    got = {r["prefix"]: r["n_hits"] for r in out.collect()}
    assert got == {"https://a.test/docs/": 2, "https://c.test/none/": 0}
    sc = out.sparkSession.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        out._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
