"""Fast single-shot HTML tokenizer — a drop-in for the stdlib
``html.parser`` event stream on whole documents.

``html.parser`` walks the input with a char-by-char driver loop
(``goahead``) plus two regex probes and a position update per token;
profiling the X2 parse hot path puts ~85% of ``html_to_text`` inside
that machinery. This tokenizer makes ONE ``finditer`` pass with a
combined markup regex and replays the exact stdlib semantics for the
constructs that occur in practice:

  * text runs → ``handle_data`` with charrefs decoded (only when an
    ``&`` is present — same observable chunking: one call per run)
  * start tags via the stdlib's own ``attrfind_tolerant`` loop at the
    same absolute positions (identical attribute parsing, value
    unescape, lowercase names), ``/>`` → ``handle_startendtag``
  * ``<script>``/``<style>`` switch to CDATA mode: raw text up to a
    ``</script``-style probe, stdlib ``endtagfind`` for the close,
    non-matching closers re-emitted as data (parser.py:378-403)
  * end tags with trailing junk ignored after the name, comments with
    the ``--\\s*>`` close, ``<?pi>`` / ``<!decl>`` consumed silently

Anything rarer — marked sections, ``<!-->``-style degenerate
comments, a ``<`` that opens markup the combined regex cannot place
(unterminated tags, ``</>``, ``</ name>`` bogus-comments) — aborts the
fast pass and the caller re-parses the WHOLE document with the stdlib
parser, so those documents are byte-identical by construction. The
differential test (tests/test_parser_fast.py) asserts fast == stdlib
field-for-field on the reference fixture pages and the synthetic
corpus.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import attrfind_tolerant, endtagfind

_MARKUP = re.compile(
    r"""<(?:
        (?P<start>[a-zA-Z][^\t\n\r\f\ />\x00]*)
            (?P<attrs>(?:"[^"]*"|'[^']*'|[^"'>])*)>
      | /(?P<end>[a-zA-Z][^\t\n\r\f\ />\x00]*)(?P<endrest>[^>]*)>
      | !--(?P<comment>.*?)--\s*>
      | (?P<other>[!?][^>]*)>
    )""",
    re.VERBOSE | re.DOTALL,
)

# CDATA content elements and their close probes (parser.py set_cdata_mode)
_CDATA_CLOSE = {
    name: re.compile(r"</\s*%s" % name, re.IGNORECASE)
    for name in ("script", "style")
}
_GT = re.compile(">")
# tagfind_tolerant's trailing `(?:\s|/(?!>))*` — stdlib consumes it
# between the tag name and the first attribute
_WS_SLASH = re.compile(r"(?:\s|/(?!>))*")


class FallbackNeeded(Exception):
    """Raised when the document needs the stdlib parser for parity."""


_LT_MARKUPISH = re.compile(r"<[a-zA-Z!/?]")


def _emit_text(sink, text: str) -> None:
    if not text:
        return
    lt = text.find("<")
    if lt == -1:  # common case: one scan, no regex
        sink.handle_data(unescape(text) if "&" in text else text)
        return
    if _LT_MARKUPISH.search(text, lt) is not None:
        # a '<' the combined regex could not place as markup — stdlib
        # would enter one of its recovery paths; replay the whole doc
        raise FallbackNeeded
    # literal non-markup '<' (e.g. '<1 day', '< ', '<3'): stdlib chunks
    # the data stream AT each '<' (goahead emits text-up-to-'<', then
    # '<' alone, then continues) and the whitespace-collapse in
    # handle_data is per-chunk — so replay the exact same chunking
    for i, part in enumerate(text.split("<")):
        if i:
            sink.handle_data("<")
        if part:
            sink.handle_data(unescape(part) if "&" in part else part)


def tokenize(doc: str, sink) -> None:
    """Drive ``sink`` (an HTMLParser-style handler object) over ``doc``.

    Raises FallbackNeeded when a construct outside the replicated set
    appears; the caller must then re-parse with the stdlib parser.
    """
    pos = 0
    n = len(doc)
    while pos < n:
        m = _MARKUP.search(doc, pos)
        if m is None:
            _emit_text(sink, doc[pos:])
            return
        _emit_text(sink, doc[pos : m.start()])
        pos = m.end()
        if m.group("start") is not None:
            tag = m.group("start").lower()
            raw_attrs = m.group("attrs")
            if not raw_attrs:
                # attr-less tag (the common case on tag-dense pages):
                # nothing for the attr loop to do — emit directly
                sink.handle_starttag(tag, [])
                if tag in _CDATA_CLOSE:
                    pos = _cdata(doc, pos, tag, sink)
                continue
            # stdlib attr loop, same regex, same absolute positions
            k = _WS_SLASH.match(doc, m.end("start")).end()
            endpos = m.end()
            attrs = []
            while k < endpos:
                am = attrfind_tolerant.match(doc, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = doc[k:endpos].strip()
            if end == "/>":
                sink.handle_startendtag(tag, attrs)
            elif end == ">":
                sink.handle_starttag(tag, attrs)
                if tag in _CDATA_CLOSE:
                    pos = _cdata(doc, pos, tag, sink)
            else:
                # residue the stdlib would re-scan char-wise — rare
                raise FallbackNeeded
        elif m.group("end") is not None:
            # stdlib order (parse_endtag): the strict endtagfind
            # ('</\s*name\s*>', UNICODE \s) wins first — e.g.
            # '</div\xa0>' closes 'div', not 'div\xa0'
            em = endtagfind.match(doc, m.start())
            if em is not None:
                sink.handle_endtag(em.group(1).lower())
                pos = em.end()
                continue
            # tolerant end tag: junk between name and '>' is ignored
            # (parser.py:397-407); quoted '>' inside that junk would
            # diverge, so only accept quote-free residue
            rest = m.group("endrest")
            if "'" in rest or '"' in rest:
                raise FallbackNeeded
            sink.handle_endtag(m.group("end").lower())
        elif m.group("comment") is not None:
            sink.handle_comment(m.group("comment"))
        else:
            other = m.group("other")
            # '<!' declarations that are NOT a plain doctype get stdlib
            # recovery (marked sections, '<!-->', ...)
            if other.startswith(("!-", "![")):
                raise FallbackNeeded
            if other[0] == "!" and not other[1:8].lower() == "doctype":
                # bogus declaration: stdlib emits a COMMENT node with
                # the text after '<!' (parse_bogus_comment) — comments
                # are semantically live here (htdig_noindex)
                sink.handle_comment(other[1:])
            # else doctype / processing instruction: consumed, no tree
            # contribution (handle_decl/handle_pi are no-ops)
    return


def _cdata(doc: str, pos: int, tag: str, sink) -> int:
    """Raw-text content of <script>/<style> (stdlib CDATA mode)."""
    probe = _CDATA_CLOSE[tag]
    n = len(doc)
    while True:
        cm = probe.search(doc, pos)
        if cm is None:
            # EOF in CDATA: stdlib (end=True) leaves the tail unflushed
            # (goahead skips the final flush when cdata_elem is set)
            return n
        if cm.start() > pos:
            sink.handle_data(doc[pos : cm.start()])
        em = endtagfind.match(doc, cm.start())
        if em and em.group(1).lower() == tag:
            sink.handle_endtag(tag)
            return em.end()
        if em:
            # a well-formed closer for a DIFFERENT tag (e.g. </scriptx>)
            # stays data inside CDATA (parser.py cdata_elem check)
            sink.handle_data(doc[cm.start() : em.end()])
            pos = em.end()
            continue
        # '</script junk>' inside CDATA: re-emitted as data up to '>'
        # (parser.py:389-391), then CDATA continues
        gm = _GT.search(doc, cm.start() + 1)
        if gm is None:
            # truncated '</script…' at EOF: stdlib's recovery is
            # position-dependent (it emits '<' alone and drops the
            # tail) — outside the replicated set, so take the exact
            # stdlib path instead of approximating it (r5 review)
            raise FallbackNeeded
        sink.handle_data(doc[cm.start() : gm.end()])
        pos = gm.end()
