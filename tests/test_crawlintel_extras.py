"""Anchor-text aggregation, link-farm detection, and content-defined
chunking: semantics on hand-built frames, CDC's offset-insensitivity
(the property fixed-boundary chunking lacks), and plan shape."""

from pyspark.sql import functions as F

from netrunner_spark.operators import crawlintel, textops


# ------------------------------------------------------------ anchor text
def test_anchor_text_topk_ranks_and_tiebreaks(spark):
    rows = [
        ("a", "t1", "Best Spark guide"),
        ("b", "t1", "spark guide"),
        ("c", "t1", "guide"),
        ("d", "t2", "zebra apple"),  # tie n=1: apple before zebra
    ]
    links = spark.createDataFrame(rows, "src string, dst string, anchor string")
    out = crawlintel.anchor_text_topk(links, k=2).collect()
    by_dst = {}
    for r in out:
        by_dst.setdefault(r["dst"], []).append((r["rank"], r["term"], r["n"]))
    assert sorted(by_dst["t1"]) == [(1, "guide", 3), (2, "spark", 2)]
    assert sorted(by_dst["t2"]) == [(1, "apple", 1), (2, "zebra", 1)]


# -------------------------------------------------------------- link spam
def test_link_spam_hosts_flags_farm(spark):
    rows = [("farm.test", "spam.test")] * 30
    rows += [(f"h{i % 10}.test", "organic.test") for i in range(30)]
    rows += [("one.test", "tiny.test")]  # below min_inlinks
    links = spark.createDataFrame(rows, "src_host string, dst_host string")
    out = {r["dst_host"]: r for r in crawlintel.link_spam_hosts(links).collect()}
    spam = out["spam.test"]
    assert spam["is_link_farm"] is True
    assert spam["n_src_hosts"] == 1 and spam["top_src_share_permille"] == 1000
    assert spam["diversity_permille"] == 33
    org = out["organic.test"]
    assert org["is_link_farm"] is False and org["n_src_hosts"] == 10
    assert out["tiny.test"]["is_link_farm"] is False


# --------------------------------------------------------------------- CDC
def test_cdc_chunks_finds_cross_doc_duplicates(spark):
    # 'lorem' hashes to a boundary (md5-prefix ≡ 0 mod 4); the greek
    # words do not — so the shared passage yields one 8-token chunk
    # repeating at period 8
    shared = "alpha beta gamma lorem epsilon zeta eta theta " * 6
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one"),
            (2, "totally different head words here " + shared),
            (3, "nothing in common with the others at all"),
        ],
        "doc_id long, text string",
    )
    out = textops.cdc_chunks(docs, divisor=4)
    rows = out.collect()
    # the shared passage re-synchronizes to identical chunks despite the
    # different prefix in doc 2
    assert len(rows) > 0
    assert all(r["n_docs"] >= 2 for r in rows)
    assert any(r["n_tokens"] == 8 and r["n_occurrences"] >= 8 for r in rows)


def test_cdc_offset_insensitive_where_fixed_chunking_is_not(spark):
    # insert ONE word at the head of a copy: fixed 10-word chunking
    # shares nothing, CDC still finds the duplicated region
    # all-distinct words (no intra-doc repeats for fixed chunking to
    # drop); 'lorem'/'amet'/'elit' are CDC boundaries (≡ 0 mod 4)
    body = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "tempor incididunt labore dolore magna aliqua enim minim veniam quis"
    )
    docs = spark.createDataFrame(
        [(1, body), (2, "INSERTED " + body)], "doc_id long, text string"
    )
    cdc = textops.cdc_chunks(docs, divisor=4).count()
    fixed = (
        textops.chunk_dedup(docs, chunk_words=10)
        .filter(F.col("n_dropped") > 0)
        .count()
    )
    assert cdc > 0
    # fixed chunking only dedups doc 2's chunks if boundaries align;
    # the 1-token shift breaks every boundary, so nothing is dropped
    assert fixed == 0


def test_cdc_single_doc_duplication_not_reported_by_default(spark):
    docs = spark.createDataFrame(
        [(1, "repeat me repeat me repeat me repeat me repeat me")],
        "doc_id long, text string",
    )
    assert textops.cdc_chunks(docs, divisor=2).count() == 0


def test_cdc_no_cartesian_and_window_is_per_doc(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textops.cdc_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only window must be partitioned by the doc key, not global
    assert "partitionBy" not in plan or "_doc" in plan


# ----------------------------------------------------------------- revisit
def test_revisit_plan_kinds_and_bytes(spark):
    old = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2")], "url string, content_hash string"
    )
    new = spark.createDataFrame(
        [("u1", "h1", 100), ("u2", "h9", 200), ("u3", "h3", 300)],
        "url string, content_hash string, n_bytes long",
    )
    out = {r["url"]: r for r in crawlintel.revisit_plan(old, new).collect()}
    assert out["u1"]["kind"] == "revisit" and out["u1"]["bytes_to_write"] == 0
    assert out["u2"]["kind"] == "changed" and out["u2"]["bytes_to_write"] == 200
    assert out["u3"]["kind"] == "new" and out["u3"]["bytes_to_write"] == 300
    assert out["u2"]["prior_hash"] == "h2"


# -------------------------------------------------------------- reciprocity
def test_reciprocal_links_flags_exchange(spark):
    rows = [("a.test", "b.test")] * 5 + [("b.test", "a.test")] * 5
    rows += [("c.test", "d.test")] * 8  # one-way: reciprocity 0
    rows += [("e.test", "f.test")]      # below min_links
    links = spark.createDataFrame(rows, "src_host string, dst_host string")
    out = {(r["host_a"], r["host_b"]): r for r in
           crawlintel.reciprocal_links(links).collect()}
    ab = out[("a.test", "b.test")]
    assert ab["reciprocity_permille"] == 1000 and ab["n_ab"] == ab["n_ba"] == 5
    cd = out[("c.test", "d.test")]
    assert cd["reciprocity_permille"] == 0 and cd["n_ab"] == 8 and cd["n_ba"] == 0
    assert ("e.test", "f.test") not in out


# -------------------------------------------------------------- DUST apply
def test_apply_dust_rules_collapses_families(spark):
    rows = []
    for page in (1, 2):
        for sess in ("a", "b", "c"):
            for sort in ("asc", "desc"):
                rows.append(
                    (
                        f"https://h0.test/p/{page}?sess={sess}&sort={sort}",
                        f"content-{page}-{sort}",
                    )
                )
    rows.append(("https://h0.test/plain", "p0"))
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    rules = crawlintel.dust_params(pages)
    out = crawlintel.apply_dust_rules(pages, rules)
    rws = {r["url"]: r["rewritten"] for r in out.collect()}
    assert len(rws) == 13  # every distinct input URL mapped
    # sess stripped, sort kept, queryless untouched
    assert rws["https://h0.test/p/1?sess=a&sort=asc"] == "https://h0.test/p/1?sort=asc"
    assert rws["https://h0.test/plain"] == "https://h0.test/plain"
    # the collapsed frontier: 2 pages x 2 sorts + 1 plain = 5 rows
    assert out.select("rewritten").distinct().count() == 5


def test_apply_dust_rules_strips_to_bare_base(spark):
    rows = [(f"https://h.test/p?s={v}", "same") for v in ("1", "2", "3")]
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    out = crawlintel.apply_dust_rules(pages, crawlintel.dust_params(pages))
    assert {r["rewritten"] for r in out.collect()} == {"https://h.test/p"}


# ------------------------------------------------- CDC differential fuzz
def test_cdc_chunks_differential_vs_python_reference(spark):
    """Seeded random corpora: the Spark CDC report must equal a
    pure-Python reimplementation of the same boundary rule
    (md5-prefix-52-bit(token) % divisor == 0) exactly."""
    import hashlib
    import random
    from collections import defaultdict

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)] + ["lorem", "amet", "elit"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60))))
        for i in range(25)
    ]
    # plant a shared passage in a few docs at different offsets
    passage = "lorem w1 w2 amet w3 w4 elit w5"
    for i in (3, 7, 12):
        head = " ".join(rng.choice(vocab) for _ in range(i))
        docs[i] = (i, (head + " " + passage).strip())

    divisor = 8

    def ref(rows):
        per_chunk = defaultdict(list)  # chunk_hash -> [(doc, tokens)]
        for doc_id, text in rows:
            toks = [t for t in text.lower().split() if t]
            cur = []
            chunks = []
            for t in toks:
                cur.append(t)
                h = int(hashlib.md5(t.encode()).hexdigest()[:13], 16)
                if h % divisor == 0:
                    chunks.append(cur)
                    cur = []
            if cur:
                chunks.append(cur)
            for c in chunks:
                txt = " ".join(c)
                per_chunk[hashlib.md5(txt.encode()).hexdigest()].append(
                    (doc_id, len(c))
                )
            # empty docs contribute nothing
        out = set()
        for h, occ in per_chunk.items():
            n_docs = len({d for d, _ in occ})
            if n_docs >= 2:
                out.add((h, max(n for _, n in occ), n_docs, len(occ)))
        return out

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["chunk_hash"], r["n_tokens"], r["n_docs"], r["n_occurrences"])
        for r in textops.cdc_chunks(sdf, divisor=divisor).collect()
    }
    assert got == ref(docs)
    assert got  # the planted passage guarantees a non-vacuous comparison


def test_dust_params_differential_vs_python_reference(spark):
    """Seeded random URL corpora: the Spark DUST verdicts must equal an
    independent Python reimplementation of the group/evidence/violation
    rule exactly."""
    import random
    from collections import defaultdict

    rng = random.Random(23)
    rows = []
    for _ in range(250):
        host = f"h{rng.randint(0, 3)}.test"
        page = rng.randint(0, 4)
        params = {}
        if rng.random() < 0.9:
            params["sid"] = str(rng.randint(0, 5))       # never in content
        if rng.random() < 0.8:
            params["sort"] = rng.choice(["a", "d"])      # in content
        if rng.random() < 0.3:
            params["ref"] = rng.choice(["x", "y", "z"])  # never in content
        if not params:
            continue
        qs = "&".join(f"{k}={v}" for k, v in sorted(params.items()))
        url = f"https://{host}/p/{page}?{qs}"
        rows.append((url, f"c-{host}-{page}-{params.get('sort', '')}"))

    def ref(pages):
        seen = {}
        for url, h in pages:
            seen.setdefault(url, h)
        groups = defaultdict(lambda: (set(), set()))  # (vals, hashes)
        for url, h in seen.items():
            host = url.split("//")[1].split("/")[0]
            base, qs = url.split("?", 1)
            kvs = qs.split("&")
            for kv in kvs:
                pname, pval = kv.split("=", 1)
                others = "&".join(sorted(k for k in kvs if k.split("=", 1)[0] != pname))
                gk = (host, pname, base + "?" + others)
                groups[gk][0].add(pval)
                groups[gk][1].add(h)
        agg = defaultdict(lambda: [0, 0])
        for (host, pname, _), (vals, hashes) in groups.items():
            agg[(host, pname)]  # every grouped param gets a row
            if len(vals) >= 2:
                agg[(host, pname)][0] += 1
                if len(hashes) >= 2:
                    agg[(host, pname)][1] += 1
        return {
            (host, p, ev, vi, ev > 0 and vi == 0)
            for (host, p), (ev, vi) in agg.items()
        }

    pages = spark.createDataFrame(rows, "url string, content_hash string")
    got = {
        (r["host"], r["param"], r["n_evidence"], r["n_violations"], r["irrelevant"])
        for r in crawlintel.dust_params(pages).collect()
    }
    want = ref(rows)
    assert got == want
    # the planted structure: sid/ref irrelevant somewhere, sort not
    verdicts = {(h, p): irr for h, p, _, _, irr in want}
    assert any(irr for (h, p), irr in verdicts.items() if p in ("sid", "ref"))
    assert not any(irr for (h, p), irr in verdicts.items() if p == "sort")


# ------------------------------------------------------- rendezvous shards
def test_rendezvous_minimal_disruption(spark):
    hosts = spark.createDataFrame(
        [(f"h{i}.example.com",) for i in range(300)], "host string"
    )
    full = {
        r.host: r.worker
        for r in crawlintel.rendezvous_shards(hosts, n_workers=8).collect()
    }
    # dropping worker 7 (n_workers 8 -> 7) must move ONLY worker 7's
    # hosts — every other host keeps its assignment (the property a
    # mod-N map lacks: there, ~7/8 of all hosts would move)
    shrunk = {
        r.host: r.worker
        for r in crawlintel.rendezvous_shards(hosts, n_workers=7).collect()
    }
    moved = {h for h in full if full[h] != shrunk[h]}
    assert moved == {h for h, w in full.items() if w == 7}
    assert len(moved) > 0  # worker 7 owned something


def test_rendezvous_balance_and_determinism(spark):
    hosts = spark.createDataFrame(
        [(f"site{i}.test",) for i in range(800)], "host string"
    )
    out = crawlintel.rendezvous_shards(hosts, n_workers=8)
    loads = {r.worker: r.n for r in out.groupBy("worker").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(loads) == set(range(8))
    # md5 is uniform: 800 hosts over 8 workers, every load within 3 sigma
    assert all(40 <= n <= 170 for n in loads.values())
    again = crawlintel.rendezvous_shards(hosts, n_workers=8)
    assert {(r.host, r.worker) for r in out.collect()} == {
        (r.host, r.worker) for r in again.collect()
    }


def test_rendezvous_is_pure_projection(spark):
    hosts = spark.createDataFrame([("a.test",), ("b.test",)], "host string")
    plan = (
        crawlintel.rendezvous_shards(hosts, n_workers=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero-shuffle argmax inside one row


# --------------------------------------------------------- co-citation
def test_cocitation_pairs_and_hub_cap(spark):
    edges = (
        # targets 100/200 co-cited by sources 0..3; target 300 only by 0
        [(s, 100) for s in range(4)]
        + [(s, 200) for s in range(4)]
        + [(0, 300)]
        # hub source 9 cites 30 targets -> dropped by max_src_out=20
        + [(9, 1000 + i) for i in range(30)]
        + [(9, 100), (9, 200)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.dst_a, r.dst_b): r.n_common
        for r in crawlintel.cocitation_pairs(
            df, min_common=2, max_src_out=20
        ).collect()
    }
    # (100,200) share sources 0-3 (hub 9 excluded); (100,300) share only
    # source 0 -> below min_common
    assert got == {(100, 200): 4}


def test_cocitation_pair_emission_bounded(spark):
    # a 100-target hub with the cap at 10 must contribute nothing; the
    # remaining sources emit at most C(od,2) each
    edges = [(1, d) for d in range(100)] + [(2, 5), (2, 6), (3, 5), (3, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = crawlintel.cocitation_pairs(df, min_common=1, max_src_out=10)
    assert {(r.dst_a, r.dst_b, r.n_common) for r in out.collect()} == {
        (5, 6, 2)
    }


# ------------------------------------------------------ host alias fold
def test_host_alias_rules_containment_threshold(spark):
    rows = (
        # full mirror: www.a == a
        [("a.test", f"h{i}") for i in range(10)]
        + [("www.a.test", f"h{i}") for i in range(10)]
        # half mirror: below 800 permille -> no rule
        + [("b.test", f"b{i}") for i in range(10)]
        + [("www.b.test", f"b{i}") for i in range(5)]
        + [("www.b.test", f"x{i}") for i in range(5)]
        # www-only host: zero share
        + [("www.c.test", f"c{i}") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "host string, content_hash string")
    got = {
        (r.alias, r.canonical): r.share_permille
        for r in crawlintel.host_alias_rules(df, min_share_permille=800).collect()
    }
    assert got == {("www.a.test", "a.test"): 1000}


def test_fold_host_aliases_rewrites_only_aliases(spark):
    frontier = spark.createDataFrame(
        [("www.a.test", 1), ("a.test", 2), ("other.test", 3)],
        "host string, x int",
    )
    rules = spark.createDataFrame(
        [("www.a.test", "a.test")], "alias string, canonical string"
    )
    got = {
        (r.host, r.x)
        for r in crawlintel.fold_host_aliases(frontier, rules).collect()
    }
    assert got == {("a.test", 1), ("a.test", 2), ("other.test", 3)}


def test_sitemap_coverage_counts(spark):
    cache = spark.createDataFrame(
        [("a", "/1"), ("a", "/2"), ("a", "/extra"), ("b", "/x")],
        "host string, url string",
    )
    smap = spark.createDataFrame(
        [("a", "/1"), ("a", "/2"), ("a", "/unfetched"), ("c", "/only")],
        "host string, url string",
    )
    got = {
        r.host: (r.n_both, r.n_cache_only, r.n_sitemap_only, r.coverage_permille)
        for r in crawlintel.sitemap_coverage(cache, smap).collect()
    }
    assert got["a"] == (2, 1, 1, 666)
    assert got["b"] == (0, 1, 0, None)   # no sitemap: coverage undefined
    assert got["c"] == (0, 0, 1, 0)


def test_rendezvous_differential_vs_python_reference(spark):
    import hashlib

    hosts = [f"host{i}.example" for i in range(250)]
    W = 11

    def ref(h):
        best = max(
            range(W),
            key=lambda w: (
                int(hashlib.md5(f"hrw{h}#{w}".encode()).hexdigest()[:13], 16),
                w,
            ),
        )
        return best

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r.host: r.worker
        for r in crawlintel.rendezvous_shards(df, n_workers=W).collect()
    }
    assert got == {h: ref(h) for h in hosts}


def test_trap_url_signals_silhouettes(spark):
    urls = spark.createDataFrame(
        [
            ("https://t.example/a/b/a/b/a/b/p1",),      # segment loop
            ("https://t.example/cal/2033/5/17",),       # far-future calendar
            ("https://t.example/cal/2025/5/17",),       # near-past: clean
            ("https://t.example/s/0123456789abcdef/view",),  # opaque hex
            ("https://t.example/" + "/".join(f"d{i}" for i in range(13)),),
            ("https://t.example/page/7?x=1",),          # query never counts
            ("https://t.example",),                     # no path at all
        ],
        "url string",
    )
    got = {
        r.url: (r.depth, r.max_seg_repeat, r.seg_loop, r.calendar,
                r.opaque_id, r.trapped)
        for r in crawlintel.trap_url_signals(urls).collect()
    }
    assert got["https://t.example/a/b/a/b/a/b/p1"] == (7, 3, True, False, False, True)
    assert got["https://t.example/cal/2033/5/17"] == (4, 1, False, True, False, True)
    assert got["https://t.example/cal/2025/5/17"] == (4, 1, False, False, False, False)
    assert got["https://t.example/s/0123456789abcdef/view"] == (
        3, 1, False, False, True, False)   # opaque alone is not a verdict
    deep = "https://t.example/" + "/".join(f"d{i}" for i in range(13))
    assert got[deep] == (13, 1, False, False, False, True)  # depth > 12
    assert got["https://t.example/page/7?x=1"] == (2, 1, False, False, False, False)
    assert got["https://t.example"] == (0, 0, False, False, False, False)


def test_trap_hosts_quarantine_split(spark):
    urls = spark.createDataFrame(
        [("https://farm.example/a/b/a/b/a/b/p%d" % i,) for i in range(4)]
        + [("https://farm.example/ok/%d" % i,) for i in range(4)]
        + [("https://clean.example/p/%d" % i,) for i in range(9)]
        + [("https://clean.example/cal/2040/1/1",)],
        "url string",
    )
    sig = crawlintel.trap_url_signals(urls)
    got = {
        r.host: (r.n_urls, r.n_loop, r.n_calendar, r.n_trapped,
                 r.trap_permille, r.quarantine)
        for r in crawlintel.trap_hosts(sig, quarantine_permille=300).collect()
    }
    assert got["farm.example"] == (8, 4, 0, 4, 500, True)
    assert got["clean.example"] == (10, 0, 1, 1, 100, False)


def test_pagination_params_verdicts(spark):
    rows = []
    # true pagination: dense 0..9, content varies
    rows += [(f"https://s.test/l?page={i}", f"pg{i}") for i in range(10)]
    # numeric session id: dense ints but content constant (DUST)
    rows += [(f"https://s.test/d?sid={100 + i}", "same") for i in range(10)]
    # sparse item ids: content varies but span 10x the count
    rows += [(f"https://s.test/s?item={i * 50}", f"it{i}") for i in range(10)]
    # too few values
    rows += [(f"https://s.test/f?tab={i}", f"tb{i}") for i in range(2)]
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    got = {
        r.param: (r.n_vals, r.all_int, r.n_violations, r.is_pagination)
        for r in crawlintel.pagination_params(pages).collect()
    }
    assert got["page"] == (10, True, 1, True)
    assert got["sid"] == (10, True, 0, False)    # numeric DUST, not traversal
    assert got["item"] == (10, True, 1, False)   # id space, density fails
    assert got["tab"] == (2, True, 1, False)     # below min_vals


def test_apply_pagination_caps_gates_only_counters(spark):
    pages = spark.createDataFrame(
        [(f"https://s.test/l?page={i}", f"pg{i}") for i in range(30)]
        + [(f"https://s.test/d?sid={100 + i}", "same") for i in range(10)]
        + [("https://s.test/plain", "p")],
        "url string, content_hash string",
    )
    rules = crawlintel.pagination_params(pages)
    got = {
        r.url: (r.admit, r.capped_param)
        for r in crawlintel.apply_pagination_caps(pages, rules, cap=10).collect()
    }
    assert got["https://s.test/l?page=5"] == (True, None)
    assert got["https://s.test/l?page=10"] == (False, "page")
    assert got["https://s.test/l?page=29"] == (False, "page")
    assert got["https://s.test/d?sid=109"] == (True, None)   # DUST, never gates
    assert got["https://s.test/plain"] == (True, None)
    assert sum(1 for a, _ in got.values() if not a) == 20


def test_politeness_compliance_flags_short_gaps(spark):
    log = spark.createDataFrame(
        [("a.test", f"https://a.test/{i}", i * 1000) for i in range(5)]
        + [("b.test", "https://b.test/0", 0),
           ("b.test", "https://b.test/1", 400),
           ("b.test", "https://b.test/2", 1400)]
        + [("c.test", "https://c.test/only", 7)],
        "host string, url string, ts_ms long",
    )
    delays = spark.createDataFrame(
        [("a.test", 1000), ("b.test", 1000), ("c.test", 1000)],
        "host string, crawl_delay_ms long",
    )
    got = {
        r.host: (r.n_fetches, r.n_gaps, r.min_gap_ms, r.n_violations, r.compliant)
        for r in crawlintel.politeness_compliance(log, delays).collect()
    }
    assert got["a.test"] == (5, 4, 1000, 0, True)
    assert got["b.test"] == (3, 2, 400, 1, False)
    assert got["c.test"] == (1, 0, None, 0, True)  # vacuously compliant


def test_trap_signals_differential_vs_python_reference(spark):
    """Seeded random URL corpora: the Spark trap signals must equal an
    independent Python reimplementation of the segment/year/hex/depth
    rules exactly."""
    import random
    import re

    rng = random.Random(71)
    seg_pool = ["a", "b", "cal", "2029", "2033", "2045", "x", "p1",
                "0123456789abcdef", "deadbeefdeadbeefdead", "Dead",
                "20ab", "page", "v2"]
    rows = []
    for _ in range(300):
        host = f"h{rng.randint(0, 3)}.test"
        depth = rng.randint(0, 15)
        segs = [rng.choice(seg_pool) for _ in range(depth)]
        url = f"https://{host}/" + "/".join(segs)
        if rng.random() < 0.2:
            url += f"?q={rng.randint(0, 9)}"
        rows.append((url,))

    YEAR = re.compile(r"^20(3[1-9]|[4-9][0-9])$")
    HEX = re.compile(r"^[0-9a-f]{16,}$")

    def ref(urls):
        out = {}
        for (u,) in urls:
            if u in out:
                continue
            host = u.split("//")[1].split("/")[0].split("?")[0]
            rest = u.split("//", 1)[1]
            path = rest[len(host):].split("?", 1)[0].split("#", 1)[0]
            segs = [s for s in path.split("/") if s]
            rep = max((segs.count(s) for s in segs), default=0)
            cal = any(YEAR.match(s) for s in segs)
            opq = any(HEX.match(s) for s in segs)
            out[u] = (host, len(segs), rep, cal, opq, rep >= 3,
                      rep >= 3 or cal or len(segs) > 12)
        return out

    urls = spark.createDataFrame(rows, "url string")
    got = {
        r["url"]: (r["host"], r["depth"], r["max_seg_repeat"], r["calendar"],
                   r["opaque_id"], r["seg_loop"], r["trapped"])
        for r in crawlintel.trap_url_signals(urls).collect()
    }
    want = ref(rows)
    assert got == want
    assert any(v[6] for v in want.values()) and not all(v[6] for v in want.values())


def test_pagination_caps_differential_vs_python_reference(spark):
    """Seeded random (host, param, value) corpora: mined pagination
    verdicts and the applied cap must equal an independent Python
    reimplementation exactly."""
    import random
    from collections import defaultdict

    rng = random.Random(97)
    rows = []
    for _ in range(400):
        host = f"h{rng.randint(0, 2)}.test"
        kind = rng.randint(0, 3)
        if kind == 0:   # dense counter, content varies
            v = rng.randint(0, 30)
            rows.append((f"https://{host}/l?page={v}", f"pg-{host}-{v}"))
        elif kind == 1:  # numeric DUST
            v = 100 + rng.randint(0, 30)
            rows.append((f"https://{host}/d?sid={v}", f"sess-{host}"))
        elif kind == 2:  # sparse ids, content varies
            v = rng.randint(0, 25) * 31
            rows.append((f"https://{host}/s?item={v}", f"it-{host}-{v}"))
        else:
            rows.append((f"https://{host}/about", f"ab-{host}"))

    CAP = 12

    def ref(pages):
        seen = {}
        for url, h in pages:
            seen.setdefault(url, h)
        vals = defaultdict(set)
        groups = defaultdict(lambda: (set(), set()))
        for url, h in seen.items():
            if "?" not in url:
                continue
            host = url.split("//")[1].split("/")[0]
            base, qs = url.split("?", 1)
            for kv in qs.split("&"):
                p, v = kv.split("=", 1)
                vals[(host, p)].add(v)
                others = "&".join(
                    sorted(k for k in qs.split("&") if k.split("=", 1)[0] != p)
                )
                groups[(host, p, base + "?" + others)][0].add(v)
                groups[(host, p, base + "?" + others)][1].add(h)
        viol = defaultdict(int)
        for (host, p, _), (vs, hs) in groups.items():
            if len(vs) >= 2 and len(hs) >= 2:
                viol[(host, p)] += 1
        verdict = {}
        for (host, p), vs in vals.items():
            all_int = all(v.isdigit() and len(v) <= 15 for v in vs)
            ints = sorted(int(v) for v in vs if v.isdigit() and len(v) <= 15)
            dense = bool(ints) and (ints[-1] - ints[0] + 1 <= 2 * len(vs))
            verdict[(host, p)] = (
                all_int and len(vs) >= 3 and viol[(host, p)] >= 1 and dense
            )
        admit = {}
        for url in seen:
            if "?" not in url:
                admit[url] = (True, None)
                continue
            host = url.split("//")[1].split("/")[0]
            capped = sorted(
                p for kv in url.split("?", 1)[1].split("&")
                for p, v in [kv.split("=", 1)]
                if verdict.get((host, p))
                and v.isdigit() and len(v) <= 15 and int(v) >= CAP
            )
            admit[url] = (not capped, capped[0] if capped else None)
        return verdict, admit

    pages = spark.createDataFrame(rows, "url string, content_hash string")
    rules = crawlintel.pagination_params(pages)
    got_verdict = {
        (r["host"], r["param"]): r["is_pagination"] for r in rules.collect()
    }
    got_admit = {
        r["url"]: (r["admit"], r["capped_param"])
        for r in crawlintel.apply_pagination_caps(pages, rules, cap=CAP).collect()
    }
    want_verdict, want_admit = ref(rows)
    assert got_verdict == want_verdict
    assert got_admit == want_admit
    assert any(not a for a, _ in want_admit.values())


def test_sitemap_diff_null_lastmod_presence(spark):
    """r5 review: lastmod is optional; presence must come from the join
    side, not lastmod nullity. NULL-lastmod rows previously misfiled as
    added/removed and NULL-vs-value changes were silently dropped."""
    from netrunner_spark.operators.crawlintel import sitemap_diff

    old = spark.createDataFrame(
        [("u/in-both-null", None), ("u/only-old-null", None),
         ("u/was-null", None), ("u/same", 5)],
        "url string, lastmod int",
    )
    new = spark.createDataFrame(
        [("u/in-both-null", None), ("u/was-null", 7),
         ("u/only-new-null", None), ("u/same", 5)],
        "url string, lastmod int",
    )
    got = {r["url"]: r["change"] for r in sitemap_diff(old, new).collect()}
    assert got == {
        "u/only-old-null": "removed",   # was 'added' before the fix
        "u/only-new-null": "added",
        "u/was-null": "changed",        # was silently dropped before
        # u/in-both-null: unchanged -> absent; u/same: unchanged
    }
