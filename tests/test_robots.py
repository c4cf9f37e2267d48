"""robots.txt text parser (S3 front half) + domain probe (S2) goldens.

Semantics under test mirror texting_robots/REP as used by the reference
(cache.rs:50-64, site.rs:16-69): grouping, agent specificity, wildcard
and $-anchor patterns (evaluated via politeness.robots_allowed),
crawl-delay scoping, host-global sitemaps.
"""

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.politeness import robots_allowed
from netrunner_spark.sources.robots import detect_feeds, parse_robots, site_info

FIXTURE = """\
# comments are ignored
User-agent: *
Disallow: /private/*
Disallow: /tmp/$
Crawl-delay: 2
Allow: /private/ok*

User-agent: netrunner_spark
User-agent: otherbot
Disallow: /only-for-us/
Crawl-delay: 5

Sitemap: https://a.test/sitemap.xml
Sitemap: https://a.test/sitemap2.xml
"""

NO_GROUP = """\
Disallow: /orphan-rule-before-any-group/
Sitemap: https://b.test/sm.xml
"""

EMPTY_DISALLOW = """\
User-agent: *
Disallow:
Allow:
"""

MID_DOLLAR = """\
User-agent: *
Disallow: /cgi$bin/*
Disallow: /exact$
"""


def _parse(spark, host_texts, ua="netrunner_spark"):
    df = spark.createDataFrame(
        list(host_texts.items()), "host string, robots_txt string"
    )
    return parse_robots(df, user_agent=ua)


class TestParseRobots:
    def test_specific_agent_beats_star(self, spark):
        rules = _parse(spark, {"a.test": FIXTURE}).collect()
        pats = {(r["directive"], r["path_pattern"]) for r in rules}
        # only the netrunner_spark group applies (specificity > '*')
        assert pats == {("disallow", "/only-for-us/")}
        assert all(r["crawl_delay"] == 5.0 for r in rules)

    def test_star_group_for_unknown_agent(self, spark):
        rules = _parse(spark, {"a.test": FIXTURE}, ua="googlebot").collect()
        pats = {(r["directive"], r["path_pattern"]) for r in rules}
        assert pats == {
            ("disallow", "/private/*"),
            ("disallow", "/tmp/$"),
            ("allow", "/private/ok*"),
        }
        assert all(r["crawl_delay"] == 2.0 for r in rules)

    def test_sitemaps_are_host_global(self, spark):
        rules = _parse(spark, {"a.test": FIXTURE}).collect()
        assert rules and all(
            r["sitemaps"]
            == ["https://a.test/sitemap.xml", "https://a.test/sitemap2.xml"]
            for r in rules
        )

    def test_rules_before_any_group_ignored(self, spark):
        rules = _parse(spark, {"b.test": NO_GROUP}).collect()
        # placeholder allow-all row keeps the sitemap discoverable
        assert len(rules) == 1
        assert rules[0]["directive"] == "allow"
        assert rules[0]["path_pattern"] == ""
        assert rules[0]["sitemaps"] == ["https://b.test/sm.xml"]

    def test_empty_values_carry_no_rule(self, spark):
        rules = _parse(spark, {"c.test": EMPTY_DISALLOW}).collect()
        assert [r["path_pattern"] for r in rules] == [""]
        assert rules[0]["directive"] == "allow"  # placeholder only

    def test_eval_wildcards_and_anchor(self, spark):
        rules = _parse(spark, {"a.test": FIXTURE}, ua="googlebot")
        urls = spark.createDataFrame(
            [
                ("https://a.test/private/x", "a.test"),
                ("https://a.test/private/ok-1", "a.test"),
                ("https://a.test/tmp/", "a.test"),
                ("https://a.test/tmp/file", "a.test"),  # $ anchors: allowed
                ("https://a.test/public", "a.test"),
            ],
            "url string, host string",
        )
        allowed = {r["url"] for r in robots_allowed(urls, rules).collect()}
        assert allowed == {
            "https://a.test/private/ok-1",
            "https://a.test/tmp/file",
            "https://a.test/public",
        }

    def test_mid_pattern_dollar_is_literal(self, spark):
        rules = _parse(spark, {"d.test": MID_DOLLAR})
        urls = spark.createDataFrame(
            [
                ("https://d.test/cgi$bin/x", "d.test"),  # blocked (literal $)
                ("https://d.test/cgibin/x", "d.test"),  # allowed
                ("https://d.test/exact", "d.test"),  # blocked ($ anchor)
                ("https://d.test/exactly", "d.test"),  # allowed
            ],
            "url string, host string",
        )
        allowed = {r["url"] for r in robots_allowed(urls, rules).collect()}
        assert allowed == {"https://d.test/cgibin/x", "https://d.test/exactly"}

    def test_parity_with_gen_robots(self, spark):
        """Parsing the rendered text reproduces gen_robots' rule rows."""
        from netrunner_spark.synth import gen_robots, gen_robots_txt

        n = 8
        parsed = parse_robots(gen_robots_txt(spark, n)).filter(
            F.col("path_pattern") != ""
        )
        expected = gen_robots(spark, n)
        key = lambda r: (  # noqa: E731
            r["host"],
            r["directive"],
            r["path_pattern"],
            tuple(r["sitemaps"]),
        )
        assert sorted(map(key, parsed.collect())) == sorted(
            map(key, expected.collect())
        )
        # crawl-delay is host-scoped in the parse (max over matching
        # groups) — compare at host granularity
        delay = lambda df: {  # noqa: E731
            r["host"]: r["d"]
            for r in df.groupBy("host").agg(F.max("crawl_delay").alias("d")).collect()
        }
        assert delay(parsed) == delay(expected)


class TestDomainProbe:
    HOMEPAGE = """<html><head>
      <link rel="alternate" type="application/rss+xml" href="/feed.xml">
      <link rel="alternate" type="application/atom+xml" href="https://e.test/atom">
      <link rel="stylesheet" href="/style.css">
      </head><body>hi</body></html>"""

    def test_detect_feeds(self, spark):
        pages = spark.createDataFrame(
            [("https://e.test/", self.HOMEPAGE)], "url string, content string"
        )
        feeds = {r["feed_url"] for r in detect_feeds(pages).collect()}
        assert feeds == {"https://e.test/feed.xml", "https://e.test/atom"}

    def test_site_info_fallback_sitemap(self, spark):
        homepages = spark.createDataFrame(
            [("e.test", "https://e.test/", self.HOMEPAGE)],
            "host string, url string, content string",
        )
        robots = spark.createDataFrame(
            [("e.test", "User-agent: *\nDisallow: /x\n")],
            "host string, robots_txt string",
        )
        info = site_info(homepages, robots).collect()[0]
        assert info["has_robots"]
        # no declared sitemap → root fallback (site.rs:45-60)
        assert info["sitemaps"] == ["https://e.test/sitemap.xml"]
        assert set(info["feeds"]) == {
            "https://e.test/feed.xml",
            "https://e.test/atom",
        }


class TestProbeDiscovery:
    def test_check_urls_from_probe(self, spark):
        """Full S2+S3 path: raw homepages + raw robots.txt text →
        parse → sitemap/feed discovery. Host 3 declares NO sitemap in
        robots, so the reference's root /sitemap.xml fallback
        (site.rs:45-60) must find its (existing) root sitemap."""
        from netrunner_spark.lens import LensConfig
        from netrunner_spark.plans.check_urls import check_urls_from_probe
        from netrunner_spark.synth import (
            gen_cdx,
            gen_robots_txt,
            gen_sitemaps,
            gen_web,
        )

        n, pages = 6, 12
        web = gen_web(spark, n, pages)
        homepages = web.filter(F.col("url").endswith("/docs/0")).select(
            "host", "url", "content"
        )
        lens = LensConfig(
            name="probe", domains=[f"host{h}.test" for h in range(n)]
        )
        out = check_urls_from_probe(
            spark,
            lens,
            homepages,
            gen_robots_txt(spark, n),
            gen_sitemaps(spark, n, pages),
            gen_cdx(spark, n, pages),
        )
        urls = {r["url"] for r in out.collect()}
        assert "https://host0.test/docs/0" in urls  # declared sitemap
        assert "https://host3.test/docs/0" in urls  # root fallback
        assert len(urls) == len({u for u in urls})  # deduped


class TestCheckDomainCli:
    def test_check_domain(self, spark, capsys):
        from netrunner_spark.__main__ import main

        rc = main(
            ["check-domain", "--domain", "host0.test", "--synth-hosts", "2",
             "--synth-pages", "6", "--cores", "4"]
        )
        out = capsys.readouterr().out
        assert rc in (0, None)
        assert "Domain: host0.test" in out
        assert "Sitemaps" in out
        assert "https://host0.test/sitemap.xml" in out


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


def test_robots_block_report_semantics(spark):
    from netrunner_spark.operators.politeness import robots_block_report

    frontier = spark.createDataFrame(
        [
            ("a.test", "https://a.test/ok/1"),
            ("a.test", "https://a.test/admin/1"),
            ("a.test", "https://a.test/admin/public/1"),  # allow overrides
            ("a.test", "https://a.test/admin/2"),
            ("b.test", "https://b.test/x"),  # ruleless host: all allowed
        ],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", "disallow", "/admin"), ("a.test", "allow", "/admin/public")],
        "host string, directive string, path_pattern string",
    )
    got = {
        r.host: (r.n_urls, r.n_allowed, r.blocked_permille)
        for r in robots_block_report(frontier, robots).collect()
    }
    assert got == {"a.test": (4, 2, 500), "b.test": (1, 1, 0)}


def test_probe_host_without_robots_keeps_root_sitemap_fallback(spark):
    """r5 review: a host whose homepage answered but whose robots.txt
    404'd (absent from robots_texts) lost its site_info root-sitemap
    fallback, because the robots table was based on parse_robots output
    only — combined with the live path's sitemap-answered→skip-CDX
    rule, such a host got ZERO discovery."""
    from netrunner_spark.lens import LensConfig
    from netrunner_spark.plans.check_urls import check_urls_from_probe
    from netrunner_spark.synth import (
        gen_cdx,
        gen_robots_txt,
        gen_sitemaps,
        gen_web,
    )

    n, pages = 4, 8
    web = gen_web(spark, n, pages)
    homepages = web.filter(F.col("url").endswith("/docs/0")).select(
        "host", "url", "content"
    )
    # host2's robots.txt "404s": drop its row from the probe table
    robots_texts = gen_robots_txt(spark, n).filter(
        F.col("host") != "host2.test"
    )
    lens = LensConfig(name="probe", domains=[f"host{h}.test" for h in range(n)])
    out = check_urls_from_probe(
        spark,
        lens,
        homepages,
        robots_texts,
        gen_sitemaps(spark, n, pages),
        gen_cdx(spark, n, pages),
    )
    urls = {r["url"] for r in out.collect()}
    # host2 must still be discovered through its root sitemap
    assert any(u.startswith("https://host2.test/") for u in urls)
