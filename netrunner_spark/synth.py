"""Deterministic synthetic web + image corpus (no network, seeded).

Everything is a pure function of (seed, host_idx, page_idx), generated
DISTRIBUTED via mapInPandas over ``spark.range`` — the same generator
scales from the pytest corpus (10² pages) to the bench corpus (10⁶+)
without a driver bottleneck, and two runs at different parallelism
produce identical tables (the scaling-efficiency experiment depends on
this).

Schemas follow FIXTURES.md §4-§7; the page graph exercises every fetch/
parse edge case the reference handles: non-2xx statuses (crawler.rs:48-59),
flaky-once pages (retry, W5), nofollow/anchor/external links (F12),
ignore-list DOM junk (F13), canonical duplicates (F9), robots-disallowed
paths + crawl-delays (S3), nested sitemap indexes (S4), CDX rows that
need status/mime filtering (S7).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from netrunner_spark.images import decode_image, encode_image, phash64

_WORDS = (
    "frontier crawl spark shuffle partition lens robots sitemap parse "
    "archive cache politeness domain schedule round bloom filter hash "
    "canonical dedup fetch scale executor broadcast window rank budget"
).split()


def host_name(h: int) -> str:
    return f"host{h}.test"


def page_url(h: int, i: int) -> str:
    if i % 11 == 5:
        return f"https://{host_name(h)}/private/{i}"
    section = ("docs", "blog", "wiki")[i % 3]
    return f"https://{host_name(h)}/{section}/{i}"


def _rng(*key) -> np.random.Generator:
    digest = hashlib.blake2s("|".join(map(str, key)).encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def _sentence(rng: np.random.Generator, n: int) -> str:
    return " ".join(np.array(_WORDS)[rng.integers(0, len(_WORDS), n)])


def image_id_for(h: int, i: int) -> str | None:
    return f"img-{h}-{i}" if i % 5 == 0 else None


def _page_html(
    h: int,
    i: int,
    n_hosts: int,
    pages_per_host: int,
    seed: int,
    n_paragraphs: int = 6,
) -> tuple[str, list[str]]:
    """→ (html, ground-truth followable hrefs)."""
    rng = _rng(seed, "page", h, i)
    p = pages_per_host
    hrefs = [
        f"/{('docs', 'blog', 'wiki')[((i + 1) % p) % 3]}/{(i + 1) % p}",  # relative
        page_url(h, (i * 7 + 3) % p),  # absolute same-host
        page_url((h + 1) % n_hosts, i % p),  # cross-host
    ]
    if (i * 7 + 3) % p % 11 == 5:
        hrefs[1] = page_url(h, ((i * 7 + 3) + 1) % p)
    body_links = "".join(f'<a href="{u}">link</a> ' for u in hrefs)
    canonical = ""
    if i % 10 == 8 and i >= 2 and (i - 2) % 11 != 5:
        # canonical duplicate of page i-2 (F9); even-indexed so both
        # ends are sitemap-discoverable. Skip when i-2 is a robots-
        # disallowed /private page (i ≡ 18 mod 110) — the pair could
        # never form, so the declared duplicate was a lie in the
        # fixture's own ground truth (r5 review).
        canonical = f'<link rel="canonical" href="{page_url(h, i - 2)}">'
    meta_desc = (
        f'<meta name="description" content="desc {h}-{i} {_sentence(rng, 6)}">'
        if i % 2 == 0
        else ""
    )
    img_tag = f'<img src="/img/{image_id_for(h, i)}.png">' if image_id_for(h, i) else ""
    # realistic page weight: several sectioned paragraphs (~5 KB like a
    # small real page) so parse cost in benches reflects actual crawling
    paragraphs = "\n".join(
        f"<div class='s{k}'><h2>{_sentence(rng, 3)}</h2><p>{_sentence(rng, 70)}</p>"
        f"<span>{_sentence(rng, 10)}</span></div>"
        for k in range(n_paragraphs)
    )
    html = f"""<html><head><title>Page {h}-{i}</title>{meta_desc}{canonical}
<meta property="og:site_name" content="{host_name(h)}"></head><body>
<nav>site navigation junk</nav><header>header junk</header>
<p>{_sentence(rng, 24)}</p>
{paragraphs}
<p>{body_links}</p>
<a href="#top">top</a>
<a rel="nofollow" href="https://tracker.invalid/x">sponsored</a>
<a rel="external" href="https://offsite.invalid/y">offsite</a>
{img_tag}
<script>var junk = 1;</script><footer>footer junk</footer>
</body></html>"""
    full = []
    for u in hrefs:
        if u.startswith("/"):
            full.append(f"https://{host_name(h)}{u}")
        else:
            full.append(u)
    return html, full


def page_status(i: int) -> int:
    """ORIGIN status. Pages i%31==9 are origin-404 but have an
    Internet-Archive snapshot (ia_status 200) → the dual-source policy
    (S9, crawler.rs:62-108) must recover them via the archive side."""
    if i % 31 == 9:
        return 404
    if i % 37 == 1:
        return 404
    if i % 41 == 2:
        return 403
    if i % 53 == 4:
        return 500
    return 200


def ia_status(i: int) -> int | None:
    return 200 if i % 31 == 9 else None


WEB_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("content", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("flaky_once", T.BooleanType(), False),
        T.StructField("ia_status", T.IntegerType(), True),
    ]
)


def gen_web(
    spark: SparkSession,
    n_hosts: int,
    pages_per_host: int,
    seed: int = 42,
    n_paragraphs: int = 6,
) -> DataFrame:
    """The synthetic page store — one row per (host, page).

    ``n_paragraphs`` sets page weight: 6 ≈ 5 KB (tests), 16+ ≈ realistic
    small web pages (benches; the reference's own fixtures are 7-320 KB).
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                h, i = int(pid) // pages_per_host, int(pid) % pages_per_host
                status = page_status(i)
                ia = ia_status(i)
                html, links = _page_html(
                    h, i, n_hosts, pages_per_host, seed, n_paragraphs
                )
                ok_somewhere = status == 200 or ia == 200
                rows.append(
                    {
                        "url": page_url(h, i),
                        "host": host_name(h),
                        "status": status,
                        "ia_status": ia,
                        "headers": [
                            {"name": "content-type", "value": "text/html"},
                            {"name": "server", "value": "synth/1"},
                        ]
                        if status != 500
                        else [],
                        "content": html if ok_somewhere else "",
                        "links": links,
                        "image_id": image_id_for(h, i),
                        "flaky_once": i % 29 == 7,  # first attempt 503s (W5)
                    }
                )
            yield pd.DataFrame(rows)

    n = n_hosts * pages_per_host
    parts = max(4, min(256, n // 2000 + 1))
    return spark.range(n, numPartitions=parts).mapInPandas(build, WEB_SCHEMA)


def gen_pair_web(
    spark: SparkSession, n_hosts: int, pages_per_host: int, seed: int = 42
) -> DataFrame:
    """The NORTH-STAR fetch store (BASELINE.json): one row per frontier
    URL whose payload is an image+caption PAIR reference — content is
    the caption (~100 B), every row carries an image FK (pair with
    ``gen_images(dense=True)``). Same status / retry / dual-source mix
    as gen_web so the politeness+retry semantics stay exercised, but
    ~2 KB/URL instead of ~12 KB — the drain is then compute-bound
    (batch image decode+validate), which is what the metric measures.
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                h, i = int(pid) // pages_per_host, int(pid) % pages_per_host
                status = page_status(i)
                ia = ia_status(i)
                iid = f"img-{h}-{i}"
                ok_somewhere = status == 200 or ia == 200
                rows.append(
                    {
                        "url": page_url(h, i),
                        "host": host_name(h),
                        "status": status,
                        "ia_status": ia,
                        "headers": [
                            {"name": "content-type", "value": "application/json"},
                        ]
                        if status != 500
                        else [],
                        "content": f"caption {iid}: {_sentence(_rng(seed, 'cap', iid), 8)}"
                        if ok_somewhere
                        else "",
                        "links": [],
                        "image_id": iid,
                        "flaky_once": i % 29 == 7,
                    }
                )
            yield pd.DataFrame(rows)

    n = n_hosts * pages_per_host
    parts = max(4, min(256, n // 2000 + 1))
    return spark.range(n, numPartitions=parts).mapInPandas(build, WEB_SCHEMA)


IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def gen_images(
    spark: SparkSession,
    n_hosts: int,
    pages_per_host: int,
    seed: int = 42,
    size: int = 24,
    dense: bool = False,
) -> DataFrame:
    """image+caption table (input_hint schema) for pages carrying images.

    ``dense=True``: EVERY page gets an image — the north-star store is
    image+caption pairs, one per URL (BASELINE.json input_hint)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                h, i = int(pid) // pages_per_host, int(pid) % pages_per_host
                iid = f"img-{h}-{i}" if dense else image_id_for(h, i)
                if iid is None:
                    continue
                # caption text comes from a DEDICATED (seed,'cap',iid)
                # stream in BOTH gen_images and gen_pair_web — a shared
                # stream consumed at different positions made
                # web.content diverge from images.caption for every
                # image_id, silently breaking the pair invariant the
                # input_hint promises (r5 review). Pixels keep the
                # original 'img' stream so pinned phashes are unchanged.
                rng = _rng(seed, "img", iid)
                arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                fmt = "png" if i % 2 == 0 else "jpeg"
                blob = encode_image(arr, fmt)
                # phash is computed on the DECODED pixels (what a consumer
                # sees) so the lossy path stays internally consistent
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": blob,
                        "w": size,
                        "h": size,
                        "fmt": fmt,
                        "caption": f"caption {iid}: {_sentence(_rng(seed, 'cap', iid), 8)}",
                        "phash": phash64(decode_image(blob)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA.fields])

    n = n_hosts * pages_per_host
    parts = max(4, min(256, n // 2000 + 1))
    return spark.range(n, numPartitions=parts).mapInPandas(build, IMAGES_SCHEMA)


def gen_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    """robots rules per host (FIXTURES.md §3)."""
    rows = []
    for h in range(n_hosts):
        host = host_name(h)
        sitemaps = [f"https://{host}/sitemap.xml"] if h % 5 != 3 else []
        rows.append(
            {
                "host": host,
                "user_agent": "*",
                "directive": "disallow",
                "path_pattern": "/private/*",
                "crawl_delay": 2.0 if h % 7 == 0 else None,
                "sitemaps": sitemaps,
            }
        )
        if h % 3 == 0:  # allow beats disallow at equal/greater specificity
            rows.append(
                {
                    "host": host,
                    "user_agent": "*",
                    "directive": "allow",
                    "path_pattern": "/private/ok*",
                    "crawl_delay": None,
                    "sitemaps": sitemaps,
                }
            )
    schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("user_agent", T.StringType(), False),
            T.StructField("directive", T.StringType(), False),
            T.StructField("path_pattern", T.StringType(), False),
            T.StructField("crawl_delay", T.DoubleType(), True),
            T.StructField("sitemaps", T.ArrayType(T.StringType()), False),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


def gen_robots_txt(spark: SparkSession, n_hosts: int) -> DataFrame:
    """The SAME per-host rules as ``gen_robots``, rendered as raw
    robots.txt text — input for the S3 text parser
    (``sources.robots.parse_robots``); parsing this must reproduce
    ``gen_robots`` rows (parity test)."""
    rows = []
    for h in range(n_hosts):
        host = host_name(h)
        lines = [
            "# synthetic robots fixture",
            "User-agent: *",
            "Disallow: /private/*",
        ]
        if h % 7 == 0:
            lines.append("Crawl-delay: 2")
        if h % 3 == 0:
            lines.append("Allow: /private/ok*")
        if h % 5 != 3:
            lines.append(f"Sitemap: https://{host}/sitemap.xml")
        rows.append({"host": host, "robots_txt": "\n".join(lines) + "\n"})
    return spark.createDataFrame(
        pd.DataFrame(rows), schema="host string, robots_txt string"
    )


def gen_sitemaps(spark: SparkSession, n_hosts: int, pages_per_host: int) -> DataFrame:
    """sitemap entries; hosts h%4==0 use a nested index (S4 recursion)."""
    rows = []
    for h in range(n_hosts):
        host = host_name(h)
        root = f"https://{host}/sitemap.xml"
        child = f"https://{host}/sitemap-pages.xml"
        target = child if h % 4 == 0 else root
        if h % 4 == 0:
            rows.append({"sitemap_url": root, "entry_type": "sitemap", "loc": child})
        for i in range(0, pages_per_host, 2):  # evens only; odds found via links
            rows.append({"sitemap_url": target, "entry_type": "url", "loc": page_url(h, i)})
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="sitemap_url string, entry_type string, loc string",
    )


def gen_feeds(spark: SparkSession, n_hosts: int, pages_per_host: int) -> DataFrame:
    """RSS/Atom feed items per host (S6): hosts h%3==1 expose a feed
    listing pages ≡1 (mod 6) — URLs the sitemap (evens) misses."""
    rows = []
    for h in range(n_hosts):
        if h % 3 != 1:
            continue
        items = [page_url(h, i) for i in range(1, pages_per_host, 6)]
        rows.append({"host": host_name(h), "items": items})
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "items"]),
        schema="host string, items array<string>",
    )


def gen_cdx(spark: SparkSession, n_hosts: int, pages_per_host: int) -> DataFrame:
    """synthetic Wayback CDX rows (S7) incl. rows that must be filtered."""
    rows = []
    for h in range(n_hosts):
        prefix = f"https://{host_name(h)}/"
        for i in range(1, pages_per_host, 4):
            rows.append(
                {
                    "prefix": prefix,
                    "original": page_url(h, i),
                    "statuscode": 200,
                    "mimetype": "text/html",
                    "page": i // 40,
                }
            )
        rows.append(
            {
                "prefix": prefix,
                "original": f"https://{host_name(h)}/broken",
                "statuscode": 404,
                "mimetype": "text/html",
                "page": 0,
            }
        )
        rows.append(
            {
                "prefix": prefix,
                "original": f"https://{host_name(h)}/logo.png",
                "statuscode": 200,
                "mimetype": "image/png",
                "page": 0,
            }
        )
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="prefix string, original string, statuscode int, mimetype string, page int",
    )
