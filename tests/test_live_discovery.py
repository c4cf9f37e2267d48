"""Live-HTTP discovery against a loopback synthetic site (no real
network): seeds → live probe (homepage/robots) → live sitemap BFS
(index → gz child w/ BOM) → live RSS feed → live CDX resume-key chain →
frontier, equal to the table-backed pipeline fed the same content.

Covers VERDICT r2 items 3 (live discovery driver) and 7 (live CDX
resume chaining, cdx.rs:64-95 / bootstrap.rs:201-226)."""

import gzip
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from netrunner_spark.lens import LensConfig
from netrunner_spark.plans.check_urls import check_urls_from_probe
from netrunner_spark.plans.live import (
    check_urls_live,
    fetch_cdx_chain,
    land_cdx_live,
)
from netrunner_spark.sources.fetcher import HttpFetcher

HOME_A = (
    "<html><head><title>A</title>"
    '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    "</head><body>hi</body></html>"
)
HOME_B = "<html><head><title>B</title></head><body>plain</body></html>"
CDX_URLS = []  # filled once the port is known


class _Site(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    port = 0

    def log_message(self, *a):
        pass

    def _send(self, body: bytes, ctype="text/html", status=200):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _404(self):
        self._send(b"", status=404)

    def do_GET(self):
        p = self.port
        host = (self.headers.get("Host") or "").split(":")[0]
        path, _, query = self.path.partition("?")
        a = f"http://127.0.0.1:{p}"
        if path == "/":
            self._send((HOME_A if host == "127.0.0.1" else HOME_B).encode())
        elif path == "/robots.txt" and host == "127.0.0.1":
            body = (
                "User-agent: *\nDisallow: /private/\n"
                f"Sitemap: {a}/sm-index.xml\n"
            )
            self._send(body.encode(), "text/plain")
        elif path == "/sm-index.xml" and host == "127.0.0.1":
            xml = (
                '<?xml version="1.0"?><sitemapindex>'
                f"<sitemap><loc>{a}/sm-child.xml.gz</loc></sitemap>"
                "</sitemapindex>"
            )
            self._send(xml.encode(), "application/xml")
        elif path == "/sm-child.xml.gz" and host == "127.0.0.1":
            xml = (
                "﻿"  # BOM — X10 strip must handle it
                '<?xml version="1.0"?><urlset>'
                f"<url><loc>{a}/docs/1</loc></url>"
                f"<url><loc>{a}/docs/2</loc></url>"
                "</urlset>"
            )
            self._send(gzip.compress(xml.encode("utf-8")), "application/gzip")
        elif path == "/feed.xml" and host == "127.0.0.1":
            xml = (
                '<?xml version="1.0"?><rss><channel>'
                f"<item><link>{a}/blog/1</link></item>"
                f"<item><link>{a}/blog/2</link></item>"
                "</channel></rss>"
            )
            self._send(xml.encode(), "application/rss+xml")
        elif path == "/cdx2":
            # per-prefix synthetic chains with a real per-request delay:
            # the wall-clock evidence for cross-prefix concurrency
            import time as _time

            q = urllib.parse.parse_qs(query)
            pref = q.get("url", [""])[0]
            limit = int(q.get("limit", ["1000"])[0])
            off = int(q.get("resumeKey", ["off-0"])[0].split("-")[1])
            allu = [f"{pref}page-{i}" for i in range(5)]
            _time.sleep(0.25)
            chunk = allu[off : off + limit]
            body = "\n".join(chunk)
            if off + limit < len(allu):
                body += f"\n\noff-{off + limit}"
            self._send(body.encode(), "text/plain")
        elif path == "/cdxdeep":
            # deep chain: 1000 URLs per prefix → many pages at small
            # limits (incremental-landing evidence)
            q = urllib.parse.parse_qs(query)
            pref = q.get("url", [""])[0]
            limit = int(q.get("limit", ["1000"])[0])
            off = int(q.get("resumeKey", ["off-0"])[0].split("-")[1])
            total = 1000
            chunk = [f"{pref}deep-{i}" for i in range(off, min(off + limit, total))]
            body = "\n".join(chunk)
            if off + limit < total:
                body += f"\n\noff-{off + limit}"
            self._send(body.encode(), "text/plain")
        elif path == "/cdx":
            q = urllib.parse.parse_qs(query)
            if not q.get("url", [""])[0].startswith(f"http://localhost:{p}/"):
                self._send(b"", "text/plain")
                return
            limit = int(q.get("limit", ["1000"])[0])
            off = int(q.get("resumeKey", ["off-0"])[0].split("-")[1])
            chunk = CDX_URLS[off : off + limit]
            body = "\n".join(chunk)
            if off + limit < len(CDX_URLS):
                body += f"\n\noff-{off + limit}"
            self._send(body.encode(), "text/plain")
        else:
            self._404()


@pytest.fixture(scope="module")
def site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Site)
    _Site.port = srv.server_port
    CDX_URLS.clear()
    CDX_URLS.extend(
        f"http://localhost:{srv.server_port}/cdx-page-{i}" for i in range(5)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_port
    srv.shutdown()


def test_cdx_resume_chain_three_pages(site):
    """limit=2 over 5 URLs → 3 pages chained through resume keys (W3)."""
    rows = fetch_cdx_chain(
        f"http://127.0.0.1:{site}/cdx", f"http://localhost:{site}/", limit=2
    )
    assert [u for _, u, _ in rows] == CDX_URLS
    assert [pg for _, _, pg in rows] == [0, 0, 1, 1, 2]  # 2+2+1 pages


def test_cdx_chain_lands_table_contract(spark, site):
    pref = spark.createDataFrame(
        [("https://localhost/", f"http://localhost:{site}/")],
        "prefix string, query string",
    )
    cdx = land_cdx_live(spark, f"http://127.0.0.1:{site}/cdx", pref, limit=2)
    got = cdx.collect()
    assert {r["original"] for r in got} == set(CDX_URLS)
    assert all(r["prefix"] == "https://localhost/" for r in got)
    assert all(r["statuscode"] == 200 and r["mimetype"] == "text/html" for r in got)
    assert {r["page"] for r in got} == {0, 1, 2}


def test_cdx_chains_parallel_across_prefixes(spark, site):
    """r3 verdict missing #3: independent prefixes' chains must run
    concurrently (each chain serial internally by protocol). 4 prefixes
    × 3 pages × 0.25 s/request = 3.0 s serial; concurrent must beat the
    serial sum by a wide margin, with every URL on its correct page."""
    import time as _time

    base = f"http://127.0.0.1:{site}/cdx2"
    prefs = [f"http://p{i}.test/" for i in range(4)]
    pref_df = spark.createDataFrame(
        [(p, p) for p in prefs], "prefix string, query string"
    )
    cdx = land_cdx_live(spark, base, pref_df, limit=2)
    got = cdx.collect()
    # 12 × 0.25 s of server delay: serial = 3.0 s; 4-way concurrent ≈
    # 0.75 s. Assert on the CHAIN-phase wall the operator records
    # (HTTP work only) — end-to-end wall also pays the Spark jobs
    # inside land_cdx_live (cold-session prefix collect + landing
    # DataFrame), which under co-tenant load dwarf the 2 s budget and
    # say nothing about chain concurrency. 2.0 s proves >1 in flight
    # (delays are sleeps, not compute).
    wall = land_cdx_live.last_chain_wall_s
    assert wall < 2.0, f"chains look serial: wall={wall:.2f}s"
    for p in prefs:
        mine = {(r["original"], r["page"]) for r in got if r["prefix"] == p}
        assert mine == {
            (f"{p}page-0", 0), (f"{p}page-1", 0),
            (f"{p}page-2", 1), (f"{p}page-3", 1),
            (f"{p}page-4", 2),
        }


def test_cdx_landing_is_incremental(spark, site, tmp_path):
    """VERDICT r4 #3: a deep chain (2 prefixes × 1000 URLs at limit=50
    → 40 pages) must land in lake slices as pages arrive, holding at
    most ~flush_rows rows on the driver — never the full URL union."""
    from netrunner_spark.tables import LakeCatalog

    prefs = ["http://d0.test/", "http://d1.test/"]
    pref_df = spark.createDataFrame(
        [(p, p) for p in prefs], "prefix string, query string"
    )
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cdx = land_cdx_live(
        spark,
        f"http://127.0.0.1:{site}/cdxdeep",
        pref_df,
        limit=50,
        cat=cat,
        flush_rows=120,
    )
    got = cdx.collect()
    assert len(got) == 2000
    # peak driver buffer bounded by flush threshold + one page, far
    # below the 2000-row union the old code accumulated
    peak = land_cdx_live.last_peak_buffer_rows
    assert peak <= 120 + 2 * 50, peak
    # multiple slices actually landed incrementally
    assert len(cat._slice_values("cdx_live", "slice")) >= 2000 // 170
    # per-chain page order preserved in the landed data
    for p in prefs:
        mine = sorted(
            (r["page"], r["original"]) for r in got if r["prefix"] == p
        )
        assert len(mine) == 1000
        assert mine[0] == (0, f"{p}deep-0")
        assert mine[-1][0] == 19  # 1000 / 50 = 20 pages
    # a repeat spilling run against the same catalog must drop the
    # previous run's (more numerous) stale slices, not union them
    cdx2 = land_cdx_live(
        spark,
        f"http://127.0.0.1:{site}/cdxdeep",
        pref_df,
        limit=200,
        cat=cat,
        flush_rows=500,
    )
    assert cdx2.count() == 2000


def test_cdx_rate_gate_bounds_aggregate_rps(site):
    """Concurrent chains share ONE per-host gate: with rps=10, the 12
    requests cannot complete faster than ~1.1 s no matter how many
    worker threads run."""
    import time as _time

    from netrunner_spark.plans.live import _RateGate

    gate = _RateGate(rps=10.0)
    base = f"http://127.0.0.1:{site}/cdx"  # no artificial delay
    t0 = _time.monotonic()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(
            ex.map(
                lambda i: fetch_cdx_chain(
                    base, f"http://localhost:{site}/", limit=2, gate=gate
                ),
                range(4),
            )
        )
    wall = _time.monotonic() - t0
    # 4 chains × 3 pages = 12 gated requests at 10 rps ⇒ ≥ 1.1 s spacing
    assert wall >= 1.1, f"gate not shared: wall={wall:.2f}s"


def test_sitemap_bfs_parses_each_level_once(spark, site):
    """r3 verdict 'what's wrong' #1: the per-level child collect used to
    re-execute the parse over the CUMULATIVE landed union (O(levels²)).
    Now each level is materialized: with a 2-level closure (index → gz
    child) exactly 2 bodies are parsed, and consuming the landed table
    afterwards re-parses nothing."""
    from netrunner_spark.plans.live import land_sitemaps_live

    a = f"http://127.0.0.1:{site}"
    roots = spark.createDataFrame([(f"{a}/sm-index.xml",)], "sitemap_url string")
    acc = spark.sparkContext.accumulator(0)
    landed = land_sitemaps_live(
        spark, roots, HttpFetcher(rps=1000.0, content_binary=True),
        parse_counter=acc,
    )
    assert acc.value == 2  # index + child, parsed once each
    # downstream actions read the materialized levels — no re-parse
    assert landed.count() == 3  # 1 child-sitemap row + 2 url rows
    landed.filter(F.col("entry_type") == "url").count()
    assert acc.value == 2


def test_check_urls_live_equals_table_backed(spark, site):
    """The full live path (probe → robots parse → sitemap BFS over a gz
    child → feed items → CDX chain) must produce the same frontier as
    the relational pipeline fed hand-built tables of the same site."""
    p = site
    a, b = f"http://127.0.0.1:{p}", f"http://localhost:{p}"
    lens = LensConfig(name="live", urls=[f"{a}/", f"{b}/"])
    fetcher = HttpFetcher(rps=1000.0, content_binary=True)

    live = check_urls_live(
        spark, lens, fetcher, cdx_base=f"http://127.0.0.1:{p}/cdx"
    )
    live_urls = {r["url"] for r in live.collect()}

    # the same site, described as landed tables
    homepages = spark.createDataFrame(
        [("127.0.0.1", f"{a}/", HOME_A), ("localhost", f"{b}/", HOME_B)],
        "host string, url string, content string",
    )
    robots_texts = spark.createDataFrame(
        [
            (
                "127.0.0.1",
                f"User-agent: *\nDisallow: /private/\nSitemap: {a}/sm-index.xml\n",
            )
        ],
        "host string, robots_txt string",
    )
    sitemaps = spark.createDataFrame(
        [
            (f"{a}/sm-index.xml", "sitemap", f"{a}/sm-child.xml.gz"),
            (f"{a}/sm-child.xml.gz", "url", f"{a}/docs/1"),
            (f"{a}/sm-child.xml.gz", "url", f"{a}/docs/2"),
        ],
        "sitemap_url string, entry_type string, loc string",
    )
    cdx = spark.createDataFrame(
        [
            ("https://localhost/", u, i // 2, 200, "text/html")
            for i, u in enumerate(CDX_URLS)
        ],
        "prefix string, original string, page int, statuscode int, mimetype string",
    )
    feed_items = spark.createDataFrame(
        [("127.0.0.1", [f"{a}/blog/1", f"{a}/blog/2"])],
        "host string, items array<string>",
    )
    table = check_urls_from_probe(
        spark, lens, homepages, robots_texts, sitemaps, cdx,
        feed_items=feed_items,
    )
    table_urls = {r["url"] for r in table.collect()}

    assert live_urls == table_urls
    # and the set is what the site actually reaches
    assert f"{a}/docs/1" in live_urls and f"{a}/docs/2" in live_urls
    assert f"{a}/blog/1" in live_urls and f"{a}/blog/2" in live_urls
    assert all(u in live_urls for u in CDX_URLS)
    assert f"{a}/" in live_urls and f"{b}/" in live_urls
