"""Frontier discovery sources: sitemap BFS (S4/S5), CDX pager (S7),
RSS links (S6) — driven by synthetic tables in the sandbox, same
iteration structure as the reference.

Reference shapes:
  - recursive sitemap fetch w/ inline regex filter: bootstrap.rs:287-389;
    we run an iterative driver BFS (W2) — each level is ONE distributed
    join against the sitemap table, children re-enter the loop.
  - CDX resume-key pagination: bootstrap.rs:193-227, cdx.rs:25-78; the
    reference filters statuscode=200 & mimetype=text/html server-side
    via query params — our synthetic table carries dirty rows and the
    filter is explicit (F2-adjacent).
  - RSS item links: bootstrap.rs:261-284 → explode(items).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sitemap_bfs(
    sitemaps: DataFrame, roots: DataFrame, max_depth: int = 8
) -> DataFrame:
    """roots(sitemap_url) → all URL entries reachable through nested
    sitemap indexes (BFS, no recursion — W2).

    Each level: broadcast the (small) todo set against the sitemap
    table; `url` rows accumulate, `sitemap` rows become the next todo.
    Cycle-safe via seen-set accumulation. max_depth bounds the loop.
    """
    # todo/seen are eagerly checkpointed per level: todo = anti-join of
    # children vs seen references seen, and seen = seen ∪ todo — without
    # the checkpoint the logical plan DOUBLES every level (2^depth
    # subtree copies by level 8) and each isEmpty() re-executes it all
    # (r5 review; land_sitemaps_live cuts the same BFS lineage the same
    # way). The sets are sitemap-index-sized (tiny) — the checkpoint is
    # one small job per level.
    todo = (
        roots.select("sitemap_url").dropDuplicates().localCheckpoint(eager=True)
    )
    seen = todo
    urls: DataFrame | None = None
    for _ in range(max_depth):
        if todo.isEmpty():
            break
        level = sitemaps.join(F.broadcast(todo), "sitemap_url")
        level_urls = level.filter(F.col("entry_type") == "url").select(
            F.col("loc").alias("url")
        )
        urls = level_urls if urls is None else urls.unionByName(level_urls)
        children = (
            level.filter(F.col("entry_type") == "sitemap")
            .select(F.col("loc").alias("sitemap_url"))
            .dropDuplicates()
        )
        todo = children.join(seen, "sitemap_url", "left_anti").localCheckpoint(
            eager=True
        )
        seen = seen.unionByName(todo).localCheckpoint(eager=True)
    if urls is None:
        return roots.sparkSession.createDataFrame([], "url string")
    return urls.dropDuplicates()


def cdx_lookup(
    cdx: DataFrame, prefixes: DataFrame, page_limit: int | None = None
) -> DataFrame:
    """prefixes(prefix) → CDX URLs, filtered like the reference's query
    params (statuscode:200, mimetype:text/html — cdx.rs:42-49).

    Pagination (O2) is a scan property in our table-backed source: the
    ``page`` column bounds each driver round; ``page_limit`` caps pages
    consumed (resume-key analog).
    """
    rows = cdx.join(F.broadcast(prefixes.select("prefix").dropDuplicates()), "prefix")
    rows = rows.filter(
        (F.col("statuscode") == 200) & (F.col("mimetype") == "text/html")
    )
    if page_limit is not None:
        rows = rows.filter(F.col("page") < page_limit)
    return rows.select(F.col("original").alias("url")).dropDuplicates()


def rss_links(feeds: DataFrame) -> DataFrame:
    """feeds(host, items array<string>) → one url row per item (S6)."""
    return feeds.select(F.explode("items").alias("url")).dropDuplicates()


def sitemap_hints(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """sitemaps(sitemap_url, xml) → one row per <url> entry with the
    sitemap protocol's SCHEDULING hints (sitemaps.org tag set) →
    ``(sitemap_url, url, lastmod, changefreq, priority_pct)``.

    The discovery-side input to freshness scheduling: lastmod and
    changefreq seed `recrawl_priority`-style period estimates before
    the crawler has its own fetch history; priority_pct (0.7 → 70)
    stays integer for exact downstream arithmetic. Parsing is an
    Arrow-batched mapInPandas over whole XML payloads (one python call
    per BATCH of sitemaps, never per entry); each sitemap's entries
    are emitted from its own partition — no shuffle until the caller
    aggregates.
    """
    import pandas as pd

    from netrunner_spark.sources.xmlparse import parse_sitemap_hints

    cols = ["sitemap_url", "url", "lastmod", "changefreq", "priority_pct"]
    schema = (
        "sitemap_url string, url string, lastmod string,"
        " changefreq string, priority_pct int"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for su, xml in zip(pdf["sitemap_url"], pdf[xml_col]):
                for loc, lm, cf, pr in parse_sitemap_hints(xml or ""):
                    rows.append((su, loc, lm, cf, pr))
            out = pd.DataFrame(rows, columns=cols)
            out["priority_pct"] = out["priority_pct"].astype("Int32")
            yield out

    return sitemaps.select("sitemap_url", xml_col).mapInPandas(gen, schema)


#: sitemaps.org changefreq token → nominal revisit period in hours
#: ("always" → 0 = every round, "never" → effectively parked).
CHANGEFREQ_PERIOD_H = {
    "always": 0,
    "hourly": 1,
    "daily": 24,
    "weekly": 168,
    "monthly": 720,
    "yearly": 8760,
    "never": 100 * 8760,
}


def hints_with_period(hints: DataFrame, default_h: int = 168) -> DataFrame:
    """Map changefreq tokens to integer revisit periods (hours) — a
    pure-JVM CASE chain over :data:`CHANGEFREQ_PERIOD_H`; unknown or
    missing tokens fall back to ``default_h``."""
    col = F.lower(F.col("changefreq"))
    branch = None
    for tok, hours in CHANGEFREQ_PERIOD_H.items():
        cond = col == tok
        branch = (
            F.when(cond, hours) if branch is None else branch.when(cond, hours)
        )
    return hints.withColumn(
        "period_h", F.coalesce(branch, F.lit(default_h)).cast("int")
    )
