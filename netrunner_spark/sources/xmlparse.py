"""XML payload parsing for discovery sources: sitemaps (S4/X10) and
RSS/Atom feeds (S6) — stdlib ElementTree, batch-wise.

Reference semantics matched (not copied):
  - sitemap: <urlset><url><loc> entries and nested <sitemapindex>
    children (bootstrap.rs:342-376); UTF-8 BOM stripped and gzip
    payloads inflated before parse (bootstrap.rs:329-336, X10)
  - RSS: channel item links (bootstrap.rs:261-284); Atom <entry><link
    href> also accepted (extension)

These parse TEXT the fetch layer already retrieved — in the sandbox the
sitemap/cdx tables are pre-parsed, but a live deployment fetches XML
bytes and runs these inside the fetch mapInPandas stage.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
import zlib


def _clean(payload: bytes | str) -> str:
    """Gunzip if needed, strip UTF-8 BOM (X10)."""
    if isinstance(payload, bytes):
        if payload[:2] == b"\x1f\x8b":
            try:
                payload = gzip.decompress(payload)
            except (OSError, EOFError, zlib.error):
                # truncated/garbage body with a gzip magic — one
                # adversarial sitemap must not fail the whole fetch
                # task (r5 review); fall through to the text decode,
                # which then fails ET parse and returns empty lists
                pass
        text = payload.decode("utf-8", errors="replace")
    else:
        text = payload
    return text.lstrip("﻿").strip()


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(payload: bytes | str) -> tuple[list[str], list[str]]:
    """→ (page_urls, child_sitemap_urls). <urlset> entries land in the
    first list; <sitemapindex> children in the second (drives the BFS)."""
    text = _clean(payload)
    if not text:
        return [], []
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return [], []
    urls: list[str] = []
    children: list[str] = []
    is_index = _local(root.tag) == "sitemapindex"
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        for field in entry:
            if _local(field.tag) == "loc" and field.text:
                loc = field.text.strip()
                if is_index or _local(entry.tag) == "sitemap":
                    children.append(loc)
                else:
                    urls.append(loc)
    return urls, children


def parse_rss(payload: bytes | str) -> list[str]:
    """→ item links (RSS <item><link>text</link>, Atom <entry><link href>)."""
    text = _clean(payload)
    if not text:
        return []
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return []
    links: list[str] = []
    for node in root.iter():
        if _local(node.tag) in ("item", "entry"):
            for field in node:
                if _local(field.tag) == "link":
                    # Atom entries carry one <link> per relation; only
                    # rel="alternate" (or no rel — RFC 4287 §4.2.7.2
                    # default) is the article URL. rel=self/replies/
                    # enclosure/edit are comment feeds, media blobs and
                    # edit endpoints — junk frontier entries (r5 review)
                    rel = field.attrib.get("rel", "alternate")
                    if rel != "alternate":
                        continue
                    href = (field.text or "").strip() or field.attrib.get("href", "")
                    if href:
                        links.append(href)
    return links


def parse_sitemap_hints(
    payload: bytes | str,
) -> list[tuple[str, str | None, str | None, int | None]]:
    """→ per <url> entry: (loc, lastmod, changefreq, priority_pct).

    The scheduling HINTS of the sitemap protocol (sitemaps.org §XML
    tag definitions) that plain ``parse_sitemap`` discards: lastmod
    (kept verbatim — W3C datetime), changefreq (lowercased token), and
    priority parsed into an integer PERCENT (0.7 → 70) so downstream
    scheduling arithmetic stays exact-integer. Missing tags → None;
    entries without <loc> are dropped (reference discards loc-less
    entries too, sitemaps.rs:58-74 equivalent)."""
    text = _clean(payload)
    if not text:
        return []
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return []
    out: list[tuple[str, str | None, str | None, int | None]] = []
    for entry in root:
        if _local(entry.tag) != "url":
            continue
        loc = lastmod = changefreq = None
        prio: int | None = None
        for field in entry:
            tag = _local(field.tag)
            val = (field.text or "").strip()
            if not val:
                continue
            if tag == "loc":
                loc = val
            elif tag == "lastmod":
                lastmod = val
            elif tag == "changefreq":
                changefreq = val.lower()
            elif tag == "priority":
                try:
                    prio = int(round(float(val) * 100))
                except (ValueError, OverflowError):
                    # OverflowError: <priority>1e999</priority> parses
                    # to inf and int(inf) raises (r5 review) — one
                    # adversarial sitemap must not fail the job
                    prio = None
        if loc:
            out.append((loc, lastmod, changefreq, prio))
    return out
