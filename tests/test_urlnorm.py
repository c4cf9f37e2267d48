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


def test_registrable_domain_rule_tiers(spark):
    from pyspark.sql import functions as F

    from netrunner_spark.urlnorm import registrable_domain_col

    cases = {
        "a.b.shop.co.uk": "shop.co.uk",   # 2-label suffix, deep subdomain
        "shop.co.uk": "shop.co.uk",        # exactly eTLD+1
        "co.uk": "co.uk",                  # the suffix itself (n not > 2)
        "user.github.io": "user.github.io",  # PSL: every user is a site
        "www.example.com": "example.com",  # default rule
        "api.example.com": "example.com",
        "b.data.s3.amazonaws.com": "data.s3.amazonaws.com",  # 3-label tier
        "weird.internal": "weird.internal",  # unknown TLD -> last two
        "localhost": "localhost",          # single label passthrough
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.etld1
        for r in df.select(
            "host", registrable_domain_col("host").alias("etld1")
        ).collect()
    }
    assert got == cases


def test_registrable_domain_sql_twin_matches(spark):
    import duckdb

    from netrunner_spark.urlnorm import (
        registrable_domain_col,
        registrable_domain_sql_expr,
    )

    hosts = [
        "a.b.shop.co.uk", "x.github.io", "www.example.com",
        "b.data.s3.amazonaws.com", "localhost", "weird.internal", "co.uk",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        (r.host, r.etld1)
        for r in df.select(
            "host", registrable_domain_col("host").alias("etld1")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (host VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(h,) for h in hosts])
    want = set(
        con.execute(
            f"SELECT host, {registrable_domain_sql_expr('host')} AS e FROM t"
        ).fetchall()
    )
    assert got == want


def test_registrable_domain_differential_vs_python_reference(spark):
    import random

    from netrunner_spark.urlnorm import (
        PSL_SNAPSHOT_2,
        PSL_SNAPSHOT_3,
        registrable_domain_col,
    )

    rng = random.Random(97)
    labels = ["a", "bb", "shop", "www", "x9"]
    tails = ["com", "co.uk", "github.io", "s3.amazonaws.com", "weird", "uk"]
    hosts = list(
        {
            ".".join([rng.choice(labels) for _ in range(rng.randint(0, 3))] + [rng.choice(tails)]).strip(".")
            for _ in range(300)
        }
    )

    def ref(h):
        ls = h.split(".")
        n = len(ls)
        if n > 3 and ".".join(ls[-3:]) in PSL_SNAPSHOT_3:
            return ".".join(ls[-4:])
        if n > 2 and ".".join(ls[-2:]) in PSL_SNAPSHOT_2:
            return ".".join(ls[-3:])
        if n > 1:
            return ".".join(ls[-2:])
        return h

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r.host: r.etld1
        for r in df.select(
            "host", registrable_domain_col("host").alias("etld1")
        ).collect()
    }
    assert got == {h: ref(h) for h in hosts}
