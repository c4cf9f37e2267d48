"""normalize_href goldens ported verbatim from the reference test
(parser/html/mod.rs:252-279) + RFC-3986 normalizer properties."""

from netrunner_spark.urlnorm import (
    host_of,
    normalize_href,
    rfc3986_normalize,
    sanitize_url,
)


def test_normalize_href_goldens():
    url = "https://example.com"
    assert normalize_href(url, "http://foo.com") == "https://foo.com/"
    assert normalize_href(url, "https://foo.com") == "https://foo.com/"
    assert normalize_href(url, "//foo.com") == "https://foo.com/"
    assert normalize_href(url, "/foo.html") == "https://example.com/foo.html"
    assert normalize_href(url, "/foo") == "https://example.com/foo"
    assert normalize_href(url, "foo.html") == "https://example.com/foo.html"


def test_rfc3986_normalize():
    assert rfc3986_normalize("HTTPS://Example.COM/a/../b#frag") == "https://example.com/b"
    assert rfc3986_normalize("https://example.com:443/x") == "https://example.com/x"
    assert rfc3986_normalize("http://example.com:80/") == "http://example.com/"
    assert rfc3986_normalize("http://example.com:8080/") == "http://example.com:8080/"
    assert rfc3986_normalize("https://example.com") == "https://example.com/"
    assert rfc3986_normalize("https://example.com/%7euser/%2F") == "https://example.com/~user/%2F"
    assert rfc3986_normalize("https://example.com/a/./b/../c") == "https://example.com/a/c"
    assert rfc3986_normalize("not a url") is None
    assert rfc3986_normalize("") is None
    assert rfc3986_normalize(None) is None
    # fragment-only difference collapses (bootstrap.rs:146-151)
    assert rfc3986_normalize("http://example.com#Title") == rfc3986_normalize("http://example.com")
    # malformed ports must SILENTLY DROP (F5, bootstrap.rs:150-163) —
    # urlsplit defers port validation to attribute access, so these
    # raise ValueError inside the parse unless guarded. One such href
    # in a page must not crash the link-expansion stage.
    assert rfc3986_normalize("http://host:80x/") is None
    assert rfc3986_normalize("http://host:99999999/") is None
    assert rfc3986_normalize("http://[::1:80/") is None


def test_normalize_href_malformed_port_golden():
    from netrunner_spark.urlnorm import normalize_href

    assert normalize_href("https://a.test/page", "http://host:80x/") is None
    assert normalize_href("https://a.test/page", "//host:bad0/x") is None
    # surrounding good hrefs still resolve
    assert normalize_href("https://a.test/page", "/ok") == "https://a.test/ok"


def test_sanitize_and_host():
    assert sanitize_url("https://a.test/p?q=1", True) == "https://a.test/p"
    assert sanitize_url("https://a.test/p?q=1", False) == "https://a.test/p?q=1"
    assert host_of("https://A.Test:8080/x") == "a.test"
    assert host_of("::bad::") is None
