"""Slice-tree compaction contract (VERDICT r3 #10): a long crawl grows
one cache slice dir per round; ``compact_slices`` folds the committed
slices into ONE bucketed base snapshot without changing what any reader
sees, and W4 resume keeps working from the compacted state."""

from pyspark.sql import functions as F

from netrunner_spark.plans.crawl import CrawlConfig, CrawlJob
from netrunner_spark.sources.fetcher import MockFetcher
from netrunner_spark.synth import gen_robots, gen_web
from netrunner_spark.tables import LakeCatalog


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _crawl(spark, tmp_path, web, robots):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cfg = CrawlConfig(max_rounds=60, n_bloom_shards=8)
    job = CrawlJob(spark, cat, MockFetcher(web), robots, cfg)
    job.init_frontier(
        web.select("url", "host", F.xxhash64("url").alias("url_hash"))
    )
    job.run()
    return cat, cfg, job


def test_compaction_preserves_rows_and_resume(spark, tmp_path):
    web = gen_web(spark, 3, 12).cache()
    robots = gen_robots(spark, 3)
    cat, cfg, job = _crawl(spark, tmp_path, web, robots)

    n_slices = len(cat._slice_values("cache", "fetched_round"))
    assert n_slices >= 2  # multiple rounds → something to compact
    before = _rows(cat.read_slices("cache"), "url", "status", "fetched_round")
    round_before = job.current_round()
    metrics_before = _rows(job.metrics_df(), "host", "round", "n_urls")

    hi = job.compact_cache(n_buckets=4)
    assert hi == round_before - 1

    # slice dirs are gone; the base snapshot carries everything
    assert cat._slice_values("cache", "fetched_round") == []
    assert cat.exists("cache") and cat.bucket_meta("cache")["key"] == ["url_hash"]
    after = _rows(cat.read_slices("cache"), "url", "status", "fetched_round")
    assert after == before  # rows preserved, per-row round lineage intact
    assert _rows(job.metrics_df(), "host", "round", "n_urls") == metrics_before

    # resume from the compacted state: the floor stands in for the
    # deleted slice markers, so a fresh job sees the same next round and
    # its run() is a no-op
    job2 = CrawlJob(spark, cat, MockFetcher(web), robots, cfg)
    job2.init_frontier(
        web.select("url", "host", F.xxhash64("url").alias("url_hash"))
    )
    assert job2.current_round() == round_before
    job2.run()
    assert _rows(cat.read_slices("cache"), "url", "status", "fetched_round") == before


def test_crawl_continues_after_compaction_and_recompacts(spark, tmp_path):
    web = gen_web(spark, 3, 12).cache()
    robots = gen_robots(spark, 3)
    cat, cfg, job = _crawl(spark, tmp_path, web, robots)
    seeds = {r["url"] for r in cat.read_slices("cache").select("url").collect()}
    floor = job.compact_cache(n_buckets=4)

    # enqueue a second wave (a later gen_web page range), drain it: new
    # slices land ABOVE the floor and read_slices unions base + tail
    wave2 = gen_web(spark, 3, 16).filter(~F.col("url").isin(list(seeds)))
    job.enqueue_frontier(
        wave2.select(
            "url", "host", F.xxhash64("url").alias("url_hash"),
            F.lit(1).alias("depth"),
        )
    )
    job.run()
    tail_vals = cat._slice_values("cache", "fetched_round")
    assert tail_vals and min(tail_vals) > floor
    combined = cat.read_slices("cache")
    urls = {r["url"] for r in combined.select("url").collect()}
    assert seeds < urls  # base still visible, wave-2 rows added
    assert combined.count() == combined.select("url").distinct().count()
    n_combined = combined.count()

    # incremental second compaction: bucket-wise merge of the new slices
    hi2 = job.compact_cache(n_buckets=4)
    assert hi2 is not None and hi2 > floor
    assert cat._slice_values("cache", "fetched_round") == []
    assert cat.read_slices("cache").count() == n_combined
    assert {r["url"] for r in cat.read_slices("cache").collect()} == urls


def test_recompaction_crash_before_floor_update_no_double_count(
    spark, tmp_path, monkeypatch
):
    """ADVICE r4 (medium): the SECOND compaction merges the new slices
    into the head snapshot BEFORE updating the ``_compacted`` floor. A
    crash between the two used to double-count: the folded rows were in
    the head AND in the still-on-disk slices above the stale floor.
    ``read_slices`` now bounds the head to the committed floor."""
    import os as _os

    web = gen_web(spark, 2, 10).cache()
    robots = gen_robots(spark, 2)
    cat, _cfg, job = _crawl(spark, tmp_path, web, robots)
    seeds = {r["url"] for r in cat.read_slices("cache").select("url").collect()}
    floor = job.compact_cache(n_buckets=4)
    assert floor is not None

    wave2 = gen_web(spark, 2, 14).filter(~F.col("url").isin(list(seeds)))
    job.enqueue_frontier(
        wave2.select(
            "url", "host", F.xxhash64("url").alias("url_hash"),
            F.lit(1).alias("depth"),
        )
    )
    job.run()
    n_combined = cat.read_slices("cache").count()
    assert n_combined > len(seeds)

    # crash the second compaction exactly between merge-commit and floor
    # update: os.replace onto the _compacted meta file raises
    real_replace = _os.replace

    def crashing_replace(src, dst):
        if _os.path.basename(dst) == "_compacted":
            raise RuntimeError("injected crash before floor update")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", crashing_replace)
    try:
        job.compact_cache(n_buckets=4)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.undo()

    # crash window: head snapshot already carries the folded wave-2 rows,
    # their slices are still on disk above the STALE floor — no dupes
    assert cat.compacted_upto("cache", "fetched_round") == floor
    assert min(cat._slice_values("cache", "fetched_round")) > floor
    combined = cat.read_slices("cache")
    assert combined.count() == n_combined
    assert combined.select("url").distinct().count() == n_combined

    # replaying the compaction heals: floor advances, slices deleted
    hi2 = job.compact_cache(n_buckets=4)
    assert hi2 is not None and hi2 > floor
    assert cat._slice_values("cache", "fetched_round") == []
    assert cat.read_slices("cache").count() == n_combined


def test_read_slices_excludes_sub_floor_stragglers(spark, tmp_path):
    """Crash between snapshot commit and slice deletion leaves a slice
    dir at/below the floor — it must NOT double-count."""
    web = gen_web(spark, 2, 10).cache()
    robots = gen_robots(spark, 2)
    cat, _cfg, job = _crawl(spark, tmp_path, web, robots)
    # materialize round 0 BEFORE compaction deletes its files
    first = cat.read_slice("cache", "fetched_round", 0).localCheckpoint()
    n = cat.read_slices("cache").count()
    job.compact_cache(n_buckets=4)
    # resurrect round 0's slice as a crash would leave it
    cat.write_slice(
        first.withColumn("fetched_round", F.lit(0)), "cache", "fetched_round", 0
    )
    assert cat.read_slices("cache").count() == n
    # and the replayed compaction just re-deletes (nothing above floor)
    assert job.compact_cache(n_buckets=4) is None
    assert cat._slice_values("cache", "fetched_round") == []
