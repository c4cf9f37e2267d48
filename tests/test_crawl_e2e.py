"""End-to-end crawl on the deterministic synthetic web (no network):
seeds → discovery → frontier → round loop (politeness, bloom seen-set,
mock fetch) → cache → parse → validate. Mirrors the reference e2e
(mod.rs:276-321) plus resume determinism (W4) and image invariants.
"""

import pytest
from pyspark.sql import functions as F

from netrunner_spark.images import psnr_udf
from netrunner_spark.lens import LensConfig, LensRule
from netrunner_spark.operators.dedup import canonical_dedup
from netrunner_spark.parser.udf import parse_pages
from netrunner_spark.plans.check_urls import check_urls, write_urls_txt
from netrunner_spark.plans.crawl import CrawlConfig, CrawlJob
from netrunner_spark.plans.validate import validate_crawl
from netrunner_spark.sources.fetcher import MockFetcher
from netrunner_spark.synth import gen_cdx, gen_images, gen_robots, gen_sitemaps, gen_web
from netrunner_spark.tables import LakeCatalog

N_HOSTS, PAGES = 3, 30


@pytest.fixture(scope="module")
def world(spark):
    web = gen_web(spark, N_HOSTS, PAGES).cache()
    return {
        "web": web,
        "images": gen_images(spark, N_HOSTS, PAGES).cache(),
        "robots": gen_robots(spark, N_HOSTS),
        "sitemaps": gen_sitemaps(spark, N_HOSTS, PAGES),
        "cdx": gen_cdx(spark, N_HOSTS, PAGES),
        "lens": LensConfig(
            name="synth",
            domains=[f"host{h}.test" for h in range(N_HOSTS)],
            rules=[LensRule("skip", "https://host0.test/wiki/*")],
        ),
    }


@pytest.fixture(scope="module")
def discovered(spark, world):
    return check_urls(
        spark, world["lens"], world["robots"], world["sitemaps"], world["cdx"]
    ).cache()


def test_check_urls_discovers_and_filters(spark, world, discovered):
    urls = [r["url"] for r in discovered.collect()]
    assert len(urls) == len(set(urls))  # deduped (F8)
    assert any("host0.test/docs" in u for u in urls)
    # skip rule enforced (F2)
    assert not any(u.startswith("https://host0.test/wiki/") for u in urls)
    # sitemap evens present for host1
    assert "https://host1.test/docs/0" in urls


def test_urls_txt_roundtrip(spark, discovered, tmp_path):
    path = str(tmp_path / "urls.txt")
    write_urls_txt(discovered, path)
    back = spark.read.text(path)
    vals = [r["value"] for r in back.collect()]
    assert vals == sorted(vals)  # K1/O1
    assert len(vals) == discovered.count()


@pytest.fixture(scope="module")
def crawled(spark, world, discovered, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    cat = LakeCatalog(spark, root)
    job = CrawlJob(
        spark,
        cat,
        MockFetcher(world["web"]),
        world["robots"],
        CrawlConfig(round_seconds=10.0, max_rounds=30, n_bloom_shards=8),
        lens=world["lens"],
    )
    job.init_frontier(discovered)
    stats = job.run()
    return {"cat": cat, "stats": stats}


def test_crawl_drains_frontier(spark, world, crawled):
    cat = crawled["cat"]
    cache = cat.read_slices("cache")
    frontier = cat.read("frontier")
    # every non-robots-blocked queued URL was attempted exactly once
    assert cache.count() == cache.select("url_hash").distinct().count()
    blocked = frontier.filter(F.col("state") == "queued")
    # only /private/ paths (robots disallow) stay queued
    assert blocked.filter(~F.col("url").contains("/private/")).count() == 0
    # politeness: per-host per-round fetch counts ≤ budget (W1)
    per_round = cache.groupBy("host", "fetched_round").count()
    assert per_round.filter(F.col("count") > 20).count() == 0
    # crawl-delay host (host0, h%7==0) capped at floor(10/2)=5
    assert (
        per_round.filter((F.col("host") == "host0.test") & (F.col("count") > 5)).count()
        == 0
    )


def test_validate_crawl(spark, world, crawled, discovered):
    cat = crawled["cat"]
    cache = cat.read_slices("cache")
    robots_allowed_urls = discovered.filter(~F.col("url").contains("/private/"))
    # every robots-allowed URL must have an attempt recorded in the cache
    # (connection failures keep their row with NULL status, like the
    # reference's per-URL cache files that exist even for errors)
    result = validate_crawl(cache, robots_allowed_urls.select("url"), world["images"])
    assert result.ok, result.errors


def test_parse_and_canonical_dedup(spark, world, crawled):
    cache = crawled["cat"].read_slices("cache")
    ok = cache.filter(F.col("status").between(200, 299))
    parsed = parse_pages(ok.select("url", "content"))
    assert parsed.filter(F.col("title").isNull()).count() == 0
    deduped = canonical_dedup(parsed)
    # pages i%10==8 declare canonical = page i-2 → dropped when both fetched
    assert deduped.count() < parsed.count()
    assert (
        deduped.groupBy("canonical_url").count().filter(F.col("count") > 1).count() == 0
    )


def test_archive_stage_single_pass_stats(spark, world, crawled, monkeypatch):
    """r3 verdict item 7: archive_stage's tallies must ride the ONE
    write pass (observe on input + written rows) — no parsed-table
    re-read, no cache re-count. Pinned by forbidding DataFrame.count and
    cat.read('parsed') during the call, then checking the stats against
    directly recomputed values."""
    from pyspark.sql import DataFrame

    cat = crawled["cat"]
    # expected values, computed independently BEFORE the patch
    cache = cat.read_slices("cache")
    ok = cache.filter(F.col("status").between(200, 299))
    exp_total = ok.count()
    exp_parsed = canonical_dedup(parse_pages(ok.select("url", "content"))).count()

    job = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"],
        CrawlConfig(), lens=world["lens"],
    )

    def no_count(self, *a, **k):
        raise AssertionError("archive_stage ran an extra count() scan")

    orig_read = LakeCatalog.read

    def guarded_read(self, table, *a, **k):
        if table == "parsed":
            raise AssertionError("archive_stage re-read the parsed table")
        return orig_read(self, table, *a, **k)

    monkeypatch.setattr(DataFrame, "count", no_count)
    monkeypatch.setattr(LakeCatalog, "read", guarded_read)
    stats = job.archive_stage()
    monkeypatch.undo()

    assert stats["parsed"] == exp_parsed
    assert stats["dupes_dropped"] == exp_total - exp_parsed
    # synthetic corpus never falls back (rate pinned in test_parser_fast)
    assert stats["parse_fallbacks"] == 0


def test_image_psnr_invariant(spark, world):
    """input_hint: decoded-pixel PSNR ≥ 40 dB for lossy, exact for
    lossless — against the reference image table itself (cache holds
    image_id FKs; bytes live in the images table)."""
    images = world["images"]
    both = images.withColumn("p", psnr_udf(F.col("bytes"), F.col("bytes")))
    # self-PSNR infinite (identity) — sanity of the decode path
    assert both.filter(F.col("p").isNotNull()).count() == images.count()
    # lossy reconstruction vs lossless ground truth: re-encode check done
    # in images unit tests; here assert every fmt is decodable
    from netrunner_spark.images import decode_check_udf

    chk = images.withColumn("c", decode_check_udf(F.col("bytes")))
    bad = chk.filter(
        ~F.col("c.decode_ok")
        | (F.col("c.w_actual") != F.col("w"))
        | (F.col("c.phash_actual") != F.col("phash"))
    )
    assert bad.count() == 0


def test_follow_links_expands_schedule(spark, world, tmp_path_factory):
    """Link expansion (our scalability extension): start from a few
    seed pages only; parsed links must be admitted, robots-checked,
    seen-filtered and scheduled into LATER rounds (schedule_ext),
    then actually fetched — with no URL attempted twice."""
    root = str(tmp_path_factory.mktemp("lake_links"))
    cat = LakeCatalog(spark, root)
    cfg = CrawlConfig(
        round_seconds=10.0,
        max_rounds=30,
        n_bloom_shards=8,
        follow_links=True,
        max_depth=2,
    )
    job = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"], cfg,
        lens=world["lens"],
    )
    seeds = world["web"].filter(F.col("url").endswith("/docs/0")).select(
        "url", "host", F.xxhash64("url").alias("url_hash")
    )
    job.init_frontier(seeds)
    stats = job.run()
    cache = cat.read_slices("cache")
    n_seeds = seeds.count()
    # expansion really happened: more URLs fetched than seeded
    assert cache.count() > n_seeds
    # every URL attempted exactly once (seen guard + schedule dedup)
    assert cache.count() == cache.select("url_hash").distinct().count()
    # depth-1+ rows exist and respect max_depth
    depths = {r["depth"] for r in cache.select("depth").distinct().collect()}
    assert max(depths) >= 1 and max(depths) <= cfg.max_depth
    # skip-rule still enforced on expanded links (F2)
    assert cache.filter(F.col("url").startswith("https://host0.test/wiki/")).count() == 0
    # terminal frontier accounts for everything scheduled
    frontier = cat.read("frontier")
    assert frontier.filter(F.col("state") == "queued").count() == 0
    assert stats["fetched"] == cache.count()


def test_expansion_backfill_heals_crash(spark, world, tmp_path_factory):
    """W4 exactly-once for link expansion (ADVICE r2): a crash after the
    round's cache slice commits but before _expand_links runs must NOT
    lose that round's discovered links on resume. Simulated by
    committing round 0 without expansion (no marker), then resuming
    with follow_links on — the backfill replays the expansion and the
    final cache equals an uninterrupted run's."""

    def mk_cfg():
        return CrawlConfig(
            round_seconds=10.0, max_rounds=30, n_bloom_shards=8,
            follow_links=True, max_depth=2,
        )

    seeds_df = world["web"].filter(F.col("url").endswith("/docs/0")).select(
        "url", "host", F.xxhash64("url").alias("url_hash")
    )

    # uninterrupted reference run
    root_a = str(tmp_path_factory.mktemp("lake_exp_a"))
    cat_a = LakeCatalog(spark, root_a)
    job_a = CrawlJob(
        spark, cat_a, MockFetcher(world["web"]), world["robots"], mk_cfg(),
        lens=world["lens"],
    )
    job_a.init_frontier(seeds_df)
    job_a.run()

    # crashed run: round 0's cache slice commits, expansion never runs
    root_b = str(tmp_path_factory.mktemp("lake_exp_b"))
    cat_b = LakeCatalog(spark, root_b)
    crash_cfg = mk_cfg()
    crash_cfg.follow_links = False  # models dying inside _expand_links
    job_b = CrawlJob(
        spark, cat_b, MockFetcher(world["web"]), world["robots"], crash_cfg,
        lens=world["lens"],
    )
    job_b.init_frontier(seeds_df)
    job_b.run_round(0)
    assert not cat_b.has_marker("schedule_ext", "expanded-0")

    # resume: fresh job, follow_links on → backfill must replay round 0's
    # expansion even though current_round() has moved past it
    job_b2 = CrawlJob(
        spark, cat_b, MockFetcher(world["web"]), world["robots"], mk_cfg(),
        lens=world["lens"],
    )
    job_b2.run()
    assert cat_b.has_marker("schedule_ext", "expanded-0")

    a = {(r["url"], r["status"]) for r in cat_a.read_slices("cache").collect()}
    b = {(r["url"], r["status"]) for r in cat_b.read_slices("cache").collect()}
    assert a == b
    assert len(b) > seeds_df.count()  # expansion genuinely recovered


def test_resume_bit_identity(spark, world, discovered, tmp_path_factory):
    """Kill-resume: running rounds 0..1, then resuming a fresh CrawlJob
    over the same catalog, must converge to the same cache/frontier as
    an uninterrupted run (W4)."""
    cfg = CrawlConfig(round_seconds=10.0, max_rounds=30, n_bloom_shards=8)

    root_a = str(tmp_path_factory.mktemp("lake_a"))
    cat_a = LakeCatalog(spark, root_a)
    job_a = CrawlJob(spark, cat_a, MockFetcher(world["web"]), world["robots"], cfg)
    job_a.init_frontier(discovered)
    job_a.run()

    root_b = str(tmp_path_factory.mktemp("lake_b"))
    cat_b = LakeCatalog(spark, root_b)
    job_b = CrawlJob(spark, cat_b, MockFetcher(world["web"]), world["robots"], cfg)
    job_b.init_frontier(discovered)
    for r in range(2):
        job_b.run_round(r)
    # "kill" → new job object over the same catalog (resume path)
    job_b2 = CrawlJob(spark, cat_b, MockFetcher(world["web"]), world["robots"], cfg)
    job_b2.run()

    a = {(r["url"], r["status"]) for r in cat_a.read_slices("cache").collect()}
    b = {(r["url"], r["status"]) for r in cat_b.read_slices("cache").collect()}
    assert a == b
    fa = {(r["url"], r["state"]) for r in cat_a.read("frontier").collect()}
    fb = {(r["url"], r["state"]) for r in cat_b.read("frontier").collect()}
    assert fa == fb


def test_sharded_drain_equals_unsharded(spark, world, discovered, crawled, tmp_path):
    """Partition-and-drain invariance: splitting the frontier across
    rendezvous workers (host-sticky, so per-host politeness state never
    straddles a shard) and draining each shard independently yields
    exactly the unsharded cache URL set, with disjoint shards — the
    property that makes the HRW address map safe to deploy."""
    from netrunner_spark.operators.crawlintel import rendezvous_shards

    whole = {
        r.url for r in crawled["cat"].read_slices("cache").select("url").collect()
    }
    assigned = rendezvous_shards(discovered, n_workers=2).cache()
    shard_sets = []
    for w in (0, 1):
        cat = LakeCatalog(spark, str(tmp_path / f"w{w}"))
        job = CrawlJob(
            spark,
            cat,
            MockFetcher(world["web"]),
            world["robots"],
            CrawlConfig(round_seconds=10.0, max_rounds=30, n_bloom_shards=8),
            lens=world["lens"],
        )
        shard = assigned.filter(F.col("worker") == w).drop("worker")
        if shard.isEmpty():
            shard_sets.append(set())
            continue
        job.init_frontier(shard)
        job.run()
        shard_sets.append(
            {r.url for r in cat.read_slices("cache").select("url").collect()}
        )
    assert shard_sets[0] | shard_sets[1] == whole
    assert not (shard_sets[0] & shard_sets[1])


def test_enqueue_crash_between_bloom_and_append_is_safe(
    spark, world, tmp_path_factory, monkeypatch
):
    """The enqueue_frontier crash window (r5 review): the bloom folds
    BEFORE the schedule_ext append, so dying between the two leaves a
    bloom false POSITIVE (healed by the exact anti-join on replay) —
    never a false negative that would double-schedule the links. After
    the replay every URL is scheduled exactly once and every scheduled
    key probes maybe_seen."""
    from netrunner_spark.operators.seen import bloom_partition

    cfg = CrawlConfig(
        round_seconds=10.0, max_rounds=30, n_bloom_shards=8,
        follow_links=True, max_depth=2,
    )
    seeds_df = world["web"].filter(F.col("url").endswith("/docs/0")).select(
        "url", "host", F.xxhash64("url").alias("url_hash")
    )
    root = str(tmp_path_factory.mktemp("lake_enq_crash"))
    cat = LakeCatalog(spark, root)
    job = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"], cfg,
        lens=world["lens"],
    )
    job.init_frontier(seeds_df)

    real_append = LakeCatalog.append_partitions
    calls = {"n": 0}

    def crashing_append(self, df, table, part_col):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after bloom fold")
        return real_append(self, df, table, part_col)

    monkeypatch.setattr(LakeCatalog, "append_partitions", crashing_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        job.run_round(0)
    # crash landed between fold and append: bloom grew, ext did not
    assert cat.read_slices("schedule_ext") is None

    # resume: a fresh job replays the expansion (no marker was set)
    job2 = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"], cfg,
        lens=world["lens"],
    )
    job2.run()
    ext = cat.read_slices("schedule_ext")
    assert ext is not None
    rows = ext.select("url_hash").collect()
    keys = [r["url_hash"] for r in rows]
    assert len(keys) == len(set(keys))  # exactly-once despite the crash
    assert len(keys) > 0
    # no-false-negative invariant: every scheduled ext key probes seen
    shards = cat.read("bloom_shards")
    n_sh = int(shards.agg(F.max("n_shards")).first()[0])
    tagged = bloom_partition(
        ext.select("url_hash"), shards, n_sh
    )
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_init_crash_before_bloom_write_heals_on_resume(
    spark, world, tmp_path_factory
):
    """The init_frontier crash window (r5 review): schedule committed,
    bloom write never ran. Resume must rebuild the bloom (previously it
    silently degraded to full anti-joins for the crawl's lifetime)."""
    import shutil

    from netrunner_spark.operators.seen import bloom_partition

    cfg = CrawlConfig(round_seconds=10.0, max_rounds=30, n_bloom_shards=8)
    seeds_df = world["web"].filter(F.col("url").endswith("/docs/0")).select(
        "url", "host", F.xxhash64("url").alias("url_hash")
    )
    root = str(tmp_path_factory.mktemp("lake_init_crash"))
    cat = LakeCatalog(spark, root)
    job = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"], cfg,
        lens=world["lens"],
    )
    job.init_frontier(seeds_df)
    # simulate the crash: bloom vanishes, schedule stays
    shutil.rmtree(cat._tdir("bloom_shards"))
    assert not cat.exists("bloom_shards")

    job2 = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"], cfg,
        lens=world["lens"],
    )
    job2.init_frontier(seeds_df)
    assert cat.exists("bloom_shards")
    shards = cat.read("bloom_shards")
    sched_keys = (
        job2._schedule_df().filter(F.col("sched_round") >= 0).select("url_hash")
    )
    tagged = bloom_partition(sched_keys, shards, cfg.n_bloom_shards)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_archive_fallback_counts_missing_images_as_failures(
    spark, world, tmp_path_factory
):
    """r5 review: the un-stamped fallback image path inner-joined refs
    to the image store, silently dropping refs whose image is missing
    — contradicting attach_image_checks' 'missing image is a failure'
    policy. It must now count them, with per-ref multiplicity."""
    from netrunner_spark.images import encode_image, phash64
    import numpy as np

    cfg = CrawlConfig(round_seconds=10.0, max_rounds=5, n_bloom_shards=4)
    root = str(tmp_path_factory.mktemp("lake_fb_img"))
    cat = LakeCatalog(spark, root)
    job = CrawlJob(
        spark, cat, MockFetcher(world["web"]), world["robots"], cfg,
        lens=world["lens"],
    )
    # hand-build a cache slice WITHOUT the image_ok stamp: 3 rows, two
    # sharing image 1 (present + valid), one referencing image 99
    # (missing from the store)
    arr = np.full((8, 8, 3), 128, dtype=np.uint8)
    blob = encode_image(arr, "png")
    ph = phash64(arr)
    cache = spark.createDataFrame(
        [
            (1, "https://h.test/a", "h.test", 0, 200, "", "<html>a</html>", 1, 1, "origin"),
            (2, "https://h.test/b", "h.test", 0, 200, "", "<html>b</html>", 1, 1, "origin"),
            (3, "https://h.test/c", "h.test", 0, 200, "", "<html>c</html>", 99, 1, "origin"),
        ],
        "url_hash long, url string, host string, depth int, status int,"
        " headers string, content string, image_id long, attempts int,"
        " source string",
    ).withColumn("fetched_round", F.lit(0))
    cat.append_partitions(cache, "cache", "fetched_round")
    images = spark.createDataFrame(
        [(1, blob, 8, 8, ph)],
        "image_id long, bytes binary, w int, h int, phash long",
    )
    stats = job.archive_stage(images=images)
    assert stats["images_checked"] == 3   # every ref row counted
    assert stats["image_failures"] == 1   # the missing image


def test_limit_depth_admits_every_intermediate_depth():
    """r5 review: the depth-limit regex matched only depth 0 or exactly
    max_depth (spyglass-lens LimitURLDepth is {0,N}) — every
    intermediate depth silently vanished from the frontier."""
    import re

    lens = LensConfig(
        name="t",
        domains=[],
        urls=[],
        rules=[
            LensRule(
                kind="limit_depth",
                pattern="https://a.test/docs",
                max_depth=2,
            )
        ],
    )
    allow, _ = lens.alternations()
    assert re.match(allow, "https://a.test/docs")
    assert re.match(allow, "https://a.test/docs/a")       # was dropped
    assert re.match(allow, "https://a.test/docs/a/")      # trailing slash
    assert re.match(allow, "https://a.test/docs/a/b")
    assert not re.match(allow, "https://a.test/docs/a/b/c")
