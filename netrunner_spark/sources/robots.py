"""robots.txt TEXT parser (S3 front half) + domain probe (S2).

Reference behavior being matched (not copied): the reference fetches
robots.txt bodies and parses them with the ``texting_robots`` crate
under UA ``netrunner/0.2.12`` (cache.rs:50-64); SiteInfo probes the
homepage for RSS/Atom ``<link>`` feeds and falls back to
``/sitemap.xml`` when robots declares no sitemap (site.rs:16-69).

Spark-first design: the parse is PURE RELATIONAL — split lines,
posexplode, window-derived group ids, aggregation — zero Python in the
plan, so it whole-stage-codegens and scales to any number of hosts
(per-host text is tiny; the only shuffle keys by host). Output rows
plug straight into the existing evaluators
(``politeness.robots_allowed`` / ``host_budgets`` / check-urls
discovery): (host, user_agent, directive, path_pattern, crawl_delay,
sitemaps).

REP semantics implemented (per Google's REP / texting_robots):
  * a group = one or more consecutive ``User-agent`` lines followed by
    rules; rules before any User-agent line are ignored;
  * the crawler obeys the MOST SPECIFIC matching agent (longest agent
    token that prefixes our UA, case-insensitive); ``*`` matches with
    specificity 0; if several groups tie they all apply;
  * empty ``Disallow:`` / ``Allow:`` values carry no rule;
  * ``Sitemap:`` is host-global (any group); ``Crawl-delay`` is
    group-scoped (max over matching groups);
  * comments (#…) and unknown keys are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

USER_AGENT = "netrunner_spark"

_RULE_KEYS = ("allow", "disallow")


def robots_records(df: DataFrame, text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → one row per recognized line:
    (host, ln, group_id, key, value). Pure column ops + one window."""
    lines = df.select(
        "host", F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw")
    )
    cleaned = lines.withColumn(
        "c",
        F.trim(F.regexp_replace(F.regexp_replace("raw", "\r", ""), "#.*$", "")),
    )
    parsed = (
        cleaned.filter(F.instr("c", ":") > 0)
        .withColumn("key", F.lower(F.trim(F.substring_index("c", ":", 1))))
        .withColumn(
            "value", F.expr("trim(substring(c, instr(c, ':') + 1, length(c)))")
        )
        .filter(
            F.col("key").isin("user-agent", "allow", "disallow", "crawl-delay", "sitemap")
        )
        .drop("raw", "c")
    )
    w = Window.partitionBy("host").orderBy("ln")
    flagged = parsed.withColumn("is_ua", F.col("key") == "user-agent").withColumn(
        "new_group",
        (F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))).cast(
            "int"
        ),
    )
    return flagged.withColumn(
        "group_id",
        F.sum("new_group").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("is_ua", "new_group")


def parse_robots(
    df: DataFrame, user_agent: str = USER_AGENT, text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → rules table
    (host, user_agent, directive, path_pattern, crawl_delay, sitemaps)
    — the same shape ``synth.gen_robots`` produces, consumable by
    ``robots_allowed``/``host_budgets``/check-urls unchanged.

    Hosts whose matching groups yield no rules still get one
    allow-everything placeholder row so their sitemaps/crawl-delay
    survive into discovery."""
    recs = robots_records(df, text_col)
    ua = user_agent.lower()

    # agent → specificity: '*' = 0; a token that case-insensitively
    # prefixes our UA scores its length; anything else doesn't match
    agents = recs.filter(F.col("key") == "user-agent").select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    )
    spec = (
        # an empty 'User-agent:' value is invalid per REP and must NOT
        # match (startswith('') is vacuously true with spec 0, which
        # would tie '*' and e.g. apply a blank-UA 'Disallow: /' to the
        # whole host — r5 review; texting_robots drops such groups)
        F.when(F.col("agent") == "", F.lit(None).cast("int"))
        .when(F.col("agent") == "*", 0)
        .when(F.lit(ua).startswith(F.col("agent")), F.length("agent"))
        .otherwise(F.lit(None).cast("int"))
    )
    grp_spec = agents.select("host", "group_id", spec.alias("spec")).groupBy(
        "host", "group_id"
    ).agg(F.max("spec").alias("spec"))
    w_host = Window.partitionBy("host")
    matching = (
        grp_spec.withColumn("best", F.max("spec").over(w_host))
        .filter(F.col("spec") == F.col("best"))  # drops NULL spec (no match)
        .select("host", "group_id")
    )

    rules = (
        recs.filter(F.col("key").isin(*_RULE_KEYS) & (F.col("value") != ""))
        .join(matching, ["host", "group_id"])
        .select(
            "host",
            F.col("key").alias("directive"),
            F.col("value").alias("path_pattern"),
        )
    )
    delays = (
        recs.filter(F.col("key") == "crawl-delay")
        .join(matching, ["host", "group_id"])
        .groupBy("host")
        .agg(F.max(F.col("value").cast("double")).alias("crawl_delay"))
    )
    sitemaps = (
        recs.filter(F.col("key") == "sitemap")
        .groupBy("host")
        .agg(F.sort_array(F.collect_set("value")).alias("sitemaps"))
    )

    hosts = df.select("host").dropDuplicates()
    placeholders = hosts.join(rules.select("host"), "host", "left_anti").select(
        "host",
        F.lit("allow").alias("directive"),
        F.lit("").alias("path_pattern"),
    )
    out = rules.unionByName(placeholders)
    return (
        out.join(delays, "host", "left")
        .join(sitemaps, "host", "left")
        .select(
            "host",
            F.lit(user_agent).alias("user_agent"),
            "directive",
            "path_pattern",
            "crawl_delay",
            F.coalesce("sitemaps", F.array().cast("array<string>")).alias("sitemaps"),
        )
    )


# ------------------------------------------------------------- domain probe
_LINK_TAG_RX = r"(?i)<link\b[^>]*>"
_HREF_RX = "href\\s*=\\s*[\"']([^\"']+)[\"']"


def detect_feeds(pages: DataFrame, url_col: str = "url", html_col: str = "content") -> DataFrame:
    """Homepage HTML → declared RSS/Atom feed URLs (S2's feed-detection
    half, site.rs:26-32 / feedfinder's link-rel path): regexp-extract
    ``<link>`` tags, keep rel=alternate with an rss/atom type, resolve
    relative hrefs against the page host. All JVM-side regexps."""
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG_RX), 0)).alias(
            "tag"
        ),
    )
    feedish = tags.filter(
        F.lower("tag").rlike(r"rel\s*=\s*[\"']alternate[\"']")
        & F.lower("tag").rlike(r"type\s*=\s*[\"']application/(rss|atom)\+xml[\"']")
    ).select("url", F.regexp_extract("tag", _HREF_RX, 1).alias("href"))
    origin = F.regexp_extract("url", r"^([a-z]+://[^/]+)", 1)
    return feedish.filter(F.col("href") != "").select(
        "url",
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(F.col("href").startswith("/"), F.concat(origin, F.col("href")))
        .otherwise(F.concat(origin, F.lit("/"), F.col("href")))
        .alias("feed_url"),
    )


def site_info(
    homepages: DataFrame,
    robots_texts: DataFrame,
    user_agent: str = USER_AGENT,
    known_sitemaps: DataFrame | None = None,
) -> DataFrame:
    """S2 domain probe, table-backed (site.rs:16-69): per host —
    detected feeds from the homepage, robots rules parsed from text,
    declared sitemaps, with the reference's ``/sitemap.xml`` root
    fallback when robots declares none.

    ``homepages``: (host, url, content) — the fetched homepage.
    ``robots_texts``: (host, robots_txt) — may omit hosts (no robots).
    ``known_sitemaps``: optional (sitemap_url) table — the probe analog:
    the root fallback counts only if that URL actually answers
    (site.rs:47-56 checks the response; table-backed = row exists).
    → (host, feeds array, sitemaps array, has_robots bool).
    """
    feeds = (
        detect_feeds(homepages)
        .join(homepages.select("url", "host"), "url")
        .groupBy("host")
        .agg(F.sort_array(F.collect_set("feed_url")).alias("feeds"))
    )
    rules = parse_robots(robots_texts, user_agent)
    declared = rules.groupBy("host").agg(
        F.array_distinct(F.flatten(F.collect_list("sitemaps"))).alias("sitemaps")
    )
    base = homepages.select("host").dropDuplicates()
    joined = (
        base.join(feeds, "host", "left")
        .join(declared, "host", "left")
        .join(
            robots_texts.select("host").dropDuplicates().withColumn(
                "has_robots", F.lit(True)
            ),
            "host",
            "left",
        )
    )
    # site.rs:45-60: no declared sitemap → always try the root sitemap;
    # it counts only if it answers (known_sitemaps membership). The root
    # URL derives from the homepage's real origin (scheme + netloc incl.
    # port) so live loopback probes resolve; https://host when no
    # homepage landed.
    origins = homepages.select(
        "host",
        F.regexp_extract("url", r"^([a-z]+://[^/]+)", 1).alias("_origin"),
    ).dropDuplicates(["host"])
    joined = joined.join(origins, "host", "left")
    root = F.concat(
        F.coalesce(
            F.col("_origin"), F.concat(F.lit("https://"), F.col("host"))
        ),
        F.lit("/sitemap.xml"),
    )
    joined = joined.withColumn("_root", root)
    if known_sitemaps is not None:
        answering = known_sitemaps.select(
            F.col("sitemap_url").alias("_root")
        ).dropDuplicates().withColumn("_root_ok", F.lit(True))
        joined = joined.join(answering, "_root", "left")
    else:
        joined = joined.withColumn("_root_ok", F.lit(True))
    fallback = F.when(
        F.coalesce("_root_ok", F.lit(False)), F.array(F.col("_root"))
    ).otherwise(F.array().cast("array<string>"))
    return joined.select(
        "host",
        F.coalesce("feeds", F.array().cast("array<string>")).alias("feeds"),
        F.when(F.size(F.coalesce("sitemaps", F.array().cast("array<string>"))) > 0, F.col("sitemaps"))
        .otherwise(fallback)
        .alias("sitemaps"),
        F.coalesce("has_robots", F.lit(False)).alias("has_robots"),
    )
