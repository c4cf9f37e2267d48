"""RFC-3986 URL normalization + lens sanitize rules.

Reference semantics (cited for parity, not copied):
  - fragment strip + SanitizeUrls query removal: bootstrap.rs:131-164,393-397 (F4)
  - invalid-URL silent drop: bootstrap.rs:150-163 (F5)
  - href resolution incl. scheme-relative + http→https upgrade:
    parser/html/mod.rs:14-41 with goldens at :252-279 (X1)

Our engine's frontier key is ``xxhash64(rfc3986_normalize(url))`` per
BASELINE.json input_hint. Normalization beyond the reference (documented
extensions): lowercase scheme+host, drop default ports, resolve
dot-segments, '' path → '/', uppercase percent-escapes + decode
unreserved octets.

All of this runs batch-wise inside pandas UDFs (never per-row Python in
the Spark plan); xxhash64 itself is Spark's JVM-side builtin
``F.xxhash64`` so hashing stays in whole-stage codegen.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*$")


def _norm_pct(s: str) -> str:
    """Uppercase percent-escapes; decode unreserved octets (RFC 3986 §6.2.2)."""

    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash semantics of '.'/'..' final segments
    if path.endswith(("/.", "/..")) and out and out[-1] != "":
        out.append("")
    return "/".join(out)


def rfc3986_normalize(url: str | None, strip_fragment: bool = True) -> str | None:
    """Normalize one URL; None if unparsable (F5: silent drop)."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not _SCHEME_RE.match(scheme):
        return None
    if scheme in ("http", "https", "ftp") and not parts.netloc:
        return None
    try:
        # urlsplit defers host/port validation to attribute access: a
        # malformed port ('http://h:80x/', port > 65535) or bad IPv6
        # bracket raises ValueError HERE, not at urlsplit() — such URLs
        # are silently dropped per F5 (bootstrap.rs:150-163).
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return None
    if any(c in host for c in " \t\n"):
        return None
    netloc = host
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{netloc}:{port}"
    path = _norm_pct(parts.path)
    if scheme in ("http", "https", "ftp"):
        path = _remove_dot_segments(path) or "/"
    query = _norm_pct(parts.query)
    fragment = "" if strip_fragment else parts.fragment
    return urlunsplit((scheme, netloc, path, query, fragment))


def normalize_href(base_url: str, href: str) -> str | None:
    """Resolve an in-page href exactly like the reference (X1):

    scheme-relative ``//host`` → https; absolute http → https upgrade;
    everything else joined against the page URL. None if unparsable.
    Goldens ported verbatim in tests/test_urlnorm.py from
    parser/html/mod.rs:252-279.
    """
    if href is None or base_url is None:
        return None
    href = href.strip()
    if href.startswith("//"):
        return rfc3986_normalize("https:" + href, strip_fragment=False)
    if href.startswith(("http://", "https://")):
        n = rfc3986_normalize(href, strip_fragment=False)
        if n is not None and n.startswith("http://"):
            n = "https://" + n[len("http://") :]
        return n
    base = rfc3986_normalize(base_url, strip_fragment=False)
    if base is None:
        return None
    try:
        joined = urljoin(base, href)
    except ValueError:
        return None
    return rfc3986_normalize(joined, strip_fragment=False)


def sanitize_url(url: str, remove_query: bool) -> str:
    """SanitizeUrls rule application (bootstrap.rs:393-397): drop query."""
    if not remove_query:
        return url
    parts = urlsplit(url)
    return urlunsplit((parts.scheme, parts.netloc, parts.path, "", ""))


def host_of(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None


# ---------------------------------------------------------------- pandas UDFs

@pandas_udf(T.StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: rfc3986_normalize(u) if isinstance(u, str) else None)


@pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of(u) if isinstance(u, str) else None)


@pandas_udf(T.StringType())
def normalize_href_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    return pd.Series(
        [
            normalize_href(b, h) if isinstance(b, str) and isinstance(h, str) else None
            for b, h in zip(bases, hrefs)
        ]
    )


def wayback_url(url: str, date_yyyymmdd: str) -> str:
    """Internet-Archive snapshot URL (X7, cdx.rs:14-23). The reference
    stamps *today's* date; ours takes the date explicitly (deterministic
    plans — no wall clock inside jobs)."""
    return f"https://web.archive.org/web/{date_yyyymmdd}000000id_/{url}"


def url_hash_col(url_col: str | Column = "url") -> Column:
    """xxhash64 frontier key — JVM-side builtin, stays in codegen (X6).

    Documented divergence from the reference's SipHash-1-3 DefaultHasher
    (crawler.rs:144-146): same role (stable 64-bit URL key), different
    function, per input_hint.
    """
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.xxhash64(col)
