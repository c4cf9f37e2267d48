"""check-urls: frontier discovery (reference §3.2, main.rs:116-136 →
bootstrap.rs:51-167).

seeds → (robots → sitemap BFS | CDX) → admission regex → coverage
re-queue → sanitize/normalize → dedup → sorted URL set.

Pure DataFrame ops + the normalize pandas UDF; discovery sources are
table-backed in the sandbox (synthetic web). The output contract is the
reference's: the SORTED DISTINCT URL set (its iteration order is
HashSet-order and deliberately not reproduced — SURVEY.md §2.7 O3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netrunner_spark.lens import LensConfig
from netrunner_spark.operators.admission import (
    admission_filter,
    dedup_frontier,
    normalize_frontier,
    sanitize,
    seeds_to_frontier,
)
from netrunner_spark.operators.coverage import underseeded
from netrunner_spark.sources.discovery import cdx_lookup, sitemap_bfs
from netrunner_spark.urlnorm import host_udf


def check_urls(
    spark: SparkSession,
    lens: LensConfig,
    robots: DataFrame,
    sitemaps: DataFrame,
    cdx: DataFrame,
    feeds: DataFrame | None = None,
) -> DataFrame:
    """→ DataFrame[url, host, url_hash] — the discovered frontier, deduped.

    ``feeds``: optional RSS/Atom table (host, items array<string>) — the
    S6 source (bootstrap.rs:261-284). Sorted writing is the sink's
    concern (K1: orderBy(url) at write).
    """
    seeds = spark.createDataFrame(lens.seeds(), "seed string, kind string")
    seeded = seeds_to_frontier(seeds)

    # Hosts eligible for discovery (non-exact seeds), bootstrap.rs:70-94
    probe_hosts = (
        seeded.filter(~F.col("skip_discovery"))
        .withColumn("host", host_udf(F.col("url")))
        .select("host")
        .dropDuplicates()
    )

    # robots declare sitemap roots (S2/S3); hosts without — INCLUDING
    # hosts with no robots row at all (probe failure) — go to the CDX
    # queue, matching bootstrap.rs:70-77. Left join keeps robots-less
    # hosts; their sitemap_url is NULL so they land in no_sitemap_hosts.
    host_sitemaps = (
        probe_hosts.join(robots.select("host", "sitemaps"), "host", "left")
        .select("host", F.explode_outer("sitemaps").alias("sitemap_url"))
        .dropDuplicates()
    )
    roots = host_sitemaps.filter(F.col("sitemap_url").isNotNull()).select("sitemap_url")
    no_sitemap_hosts = host_sitemaps.groupBy("host").agg(
        F.max("sitemap_url").alias("any_map")
    ).filter(F.col("any_map").isNull()).select("host")

    sitemap_urls = sitemap_bfs(sitemaps, roots)

    cdx_prefixes = no_sitemap_hosts.select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/")).alias("prefix")
    )
    cdx_urls = cdx_lookup(cdx, cdx_prefixes)

    discovered = sitemap_urls.unionByName(cdx_urls)
    if feeds is not None:
        from netrunner_spark.sources.discovery import rss_links

        discovered = discovered.unionByName(
            rss_links(feeds.join(F.broadcast(probe_hosts), "host"))
        )
    admitted = admission_filter(discovered, lens)

    frontier = seeded.select("url").unionByName(admitted.select("url"))
    frontier = normalize_frontier(sanitize(frontier, lens))

    # Coverage second pass (F14): prefix seeds with ≤1 hit → CDX
    prefix_seeds = seeds.filter(F.col("kind") == "prefix").select(
        F.col("seed").alias("prefix")
    )
    if not prefix_seeds.isEmpty():
        retry_prefixes = underseeded(frontier, prefix_seeds)
        second = admission_filter(cdx_lookup(cdx, retry_prefixes), lens)
        frontier = frontier.unionByName(
            normalize_frontier(sanitize(second.select("url"), lens))
        )

    return dedup_frontier(frontier).select("url", "host", "url_hash")


def check_urls_from_probe(
    spark: SparkSession,
    lens: LensConfig,
    homepages: DataFrame,
    robots_texts: DataFrame,
    sitemaps: DataFrame,
    cdx: DataFrame,
    user_agent: str | None = None,
    feed_items: DataFrame | None = None,
) -> DataFrame:
    """The live-shaped discovery front-end (S2+S3 full path,
    bootstrap.rs:51-94 over site.rs probes): raw homepages + raw
    robots.txt TEXT → parsed rules, declared-or-root-fallback sitemaps,
    detected RSS/Atom feeds → the same downstream pipeline as
    ``check_urls``. Everything stays relational — the probe tables are
    whatever the fetch layer landed (MockFetcher in the sandbox,
    HttpFetcher outside)."""
    from netrunner_spark.sources.robots import USER_AGENT, parse_robots, site_info

    ua = user_agent or USER_AGENT
    rules = parse_robots(robots_texts, ua)
    info = site_info(
        homepages,
        robots_texts,
        ua,
        known_sitemaps=sitemaps.select("sitemap_url"),
    )
    # base the robots table on ALL probed hosts, not only hosts whose
    # robots.txt answered (r5 review): a host with a 200 homepage but a
    # 404 robots.txt has no rules row, and the old left join FROM rules
    # dropped its site_info root-sitemap fallback — combined with the
    # live path's "sitemap answered → skip CDX" exclusion, such a host
    # got zero discovery. Rule-less hosts get the same allow-everything
    # placeholder parse_robots emits for rule-less robots bodies.
    # keep rules' OWN declared sitemaps as a fallback: site_info covers
    # only hosts with a homepage row, so a host whose homepage fetch
    # failed but whose robots.txt declared 'Sitemap:' lines would get a
    # NULL from info and lose its whole declared sitemap tree to the
    # CDX-only path (r5 review). info wins when present (it adds the
    # root fallback + answering filter); rules fill the info-less hosts.
    base = rules.withColumnRenamed("sitemaps", "_declared").join(
        info.select("host", "sitemaps"), "host", "full_outer"
    )
    robots = base.select(
        "host",
        F.coalesce("user_agent", F.lit(ua)).alias("user_agent"),
        F.coalesce("directive", F.lit("allow")).alias("directive"),
        F.coalesce("path_pattern", F.lit("")).alias("path_pattern"),
        "crawl_delay",
        F.coalesce(
            "sitemaps", "_declared", F.array().cast("array<string>")
        ).alias("sitemaps"),
    )
    # ``feed_items``: live mode passes REAL parsed article links per host
    # (live.land_feed_items); the table-backed fallback treats detected
    # feed URLs themselves as discovery output (probe-table analog).
    if feed_items is not None:
        feeds = feed_items
    else:
        feeds = info.select("host", F.col("feeds").alias("items")).filter(
            F.size("items") > 0
        )
    # pass feeds unconditionally: check_urls handles an EMPTY frame via
    # an empty union, and the old isEmpty() probe re-executed the whole
    # site_info/parse_robots lineage once per invocation (r5 review)
    return check_urls(spark, lens, robots, sitemaps, cdx, feeds=feeds)


def write_urls_txt(frontier: DataFrame, path: str) -> None:
    """K1: sorted unique URL list (main.rs:120-133). coalesce(1) is the
    checkpoint-artifact contract, not a scale path."""
    frontier.select("url").dropDuplicates().orderBy("url").coalesce(1).write.mode(
        "overwrite"
    ).text(path)
