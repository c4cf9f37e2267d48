"""Crawl-intelligence operators: mirror detection, DUST param mining,
harvest/trap signals, largest-remainder budget allocation, bounded
redirect resolution, sitemap snapshot diff — semantics on hand-built
frames plus the scale guards (hash-DF cap bounds the mirror join; no
CartesianProduct in any plan)."""

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators import crawlintel


# ---------------------------------------------------------------- mirrors
def _pages(spark):
    # h0/h1 mirror each other on c1..c4; h2 shares only the global
    # boilerplate hash 'bp' (served by every host); h3 is disjoint.
    rows = []
    for h in ("h0", "h1"):
        for c in ("c1", "c2", "c3", "c4"):
            rows.append((h, f"https://{h}.test/{c}", c))
    rows += [("h2", "https://h2.test/x", "x1"), ("h2", "https://h2.test/y", "x2")]
    rows += [("h3", "https://h3.test/z", "z1")]
    for h in ("h0", "h1", "h2", "h3"):
        rows.append((h, f"https://{h}.test/empty", "bp"))
    return spark.createDataFrame(rows, "host string, url string, content_hash string")


def test_mirror_hosts_finds_planted_pair(spark):
    out = crawlintel.mirror_hosts(_pages(spark), min_shared=2).collect()
    pairs = {(r["host_a"], r["host_b"]): r for r in out}
    assert ("h0", "h1") in pairs
    r = pairs[("h0", "h1")]
    assert r["shared"] == 5  # c1..c4 + bp
    assert r["overlap_permille"] == 1000
    # no pair built solely from the boilerplate hash passes min_shared
    assert ("h2", "h3") not in pairs


def test_mirror_hash_df_cap_drops_boilerplate(spark):
    # cap 2: the 'bp' hash (df=4) is dropped; mirror pair survives on
    # its pair-private hashes with totals that exclude the capped hash
    out = crawlintel.mirror_hosts(_pages(spark), min_shared=2, max_hash_df=2)
    rows = out.collect()
    assert {(r["host_a"], r["host_b"]) for r in rows} == {("h0", "h1")}
    assert rows[0]["shared"] == 4


def test_mirror_cap_bounds_pair_emission(spark):
    # every host serves the same single hash → uncapped emits C(40,2)
    # pairs; capped emits none (the hash's DF exceeds the cap)
    rows = [(f"h{i:02d}", f"u{i}", "same") for i in range(40)]
    pages = spark.createDataFrame(rows, "host string, url string, content_hash string")
    assert crawlintel.mirror_hosts(pages, min_shared=1).count() == 40 * 39 // 2
    assert crawlintel.mirror_hosts(pages, min_shared=1, max_hash_df=8).count() == 0


# ------------------------------------------------------------------- DUST
def _dust_pages(spark):
    # content depends on (page, sort) but never on sess; one URL family
    # per (page, sess, sort) triple on one host
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
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_dust_finds_irrelevant_param(spark):
    out = {r["param"]: r for r in crawlintel.dust_params(_dust_pages(spark)).collect()}
    assert out["sess"]["irrelevant"] is True
    assert out["sess"]["n_evidence"] == 4  # (page, sort) groups
    assert out["sess"]["n_violations"] == 0
    assert out["sort"]["irrelevant"] is False
    assert out["sort"]["n_violations"] == out["sort"]["n_evidence"] == 6
    assert out["sess"]["host"] == "h0.test"


def test_dust_single_param_url_groups_on_base(spark):
    # only one param: the group key is the bare base; sess still proved
    # irrelevant because the group spans 3 values with 1 hash
    rows = [(f"https://h.test/p?s={v}", "same") for v in ("1", "2", "3")]
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    out = crawlintel.dust_params(pages).collect()
    assert len(out) == 1 and out[0]["irrelevant"] is True


def test_dust_ignores_queryless_urls(spark):
    rows = [("https://h.test/plain", "c0")]
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    assert crawlintel.dust_params(pages).count() == 0


# ---------------------------------------------------------------- harvest
def test_host_harvest_flags_trap(spark):
    rows = [("trap", f"https://trap.test/?cal={i}", f"c{i % 3}") for i in range(30)]
    rows += [("ok", f"https://ok.test/p{i}", f"k{i}") for i in range(30)]
    rows += [("tiny", "https://tiny.test/a", "t0")]  # too few URLs to flag
    pages = spark.createDataFrame(rows, "host string, url string, content_hash string")
    out = {r["host"]: r for r in crawlintel.host_harvest(pages).collect()}
    assert out["trap"]["is_trap"] is True and out["trap"]["harvest_permille"] == 100
    assert out["ok"]["is_trap"] is False and out["ok"]["harvest_permille"] == 1000
    assert out["tiny"]["is_trap"] is False


# ----------------------------------------------------------------- budget
def test_budget_alloc_sums_exactly_and_ranks_remainders(spark):
    stats = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3), ("d", 0)], "host string, w long"
    )
    out = {r["host"]: r["alloc"] for r in
           crawlintel.budget_alloc(stats, "w", total=10).collect()}
    # floors: a=4 (50/11), b=2 (30/11), c=2, d=0 → leftover 2 goes to the
    # two largest remainders (a: 6, b: 8, c: 8 → b and c win; tie is by
    # remainder first)
    assert sum(out.values()) == 10
    assert out["d"] == 0
    assert out == {"a": 4, "b": 3, "c": 3, "d": 0}


def test_budget_alloc_tie_breaks_by_host_name(spark):
    stats = spark.createDataFrame([("x", 1), ("y", 1), ("z", 1)], "host string, w long")
    out = {r["host"]: r["alloc"] for r in
           crawlintel.budget_alloc(stats, "w", total=4).collect()}
    assert sum(out.values()) == 4
    assert out == {"x": 2, "y": 1, "z": 1}  # leftover slot → smallest name


# -------------------------------------------------------------- redirects
def _edges(spark):
    # chain 3→2→1→0 (0 final); cycle 10↔11; self-loop 20→20
    rows = [(3, 2), (2, 1), (1, 0), (10, 11), (11, 10), (20, 20)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_resolve_redirects_chain_and_loops(spark):
    out = {r["start"]: r for r in
           crawlintel.resolve_redirects(_edges(spark), max_hops=8).collect()}
    assert out[3]["final"] == 0 and out[3]["hops"] == 3 and out[3]["status"] == "resolved"
    assert out[1]["final"] == 0 and out[1]["hops"] == 1
    assert out[10]["status"] == "capped" and out[10]["hops"] == 8
    assert out[20]["status"] == "capped" and out[20]["final"] == 20
    assert len(out) == 6


def test_resolve_redirects_hop_cap_truncates_long_chain(spark):
    rows = [(i, i - 1) for i in range(1, 12)]  # 11→10→...→0
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = {r["start"]: r for r in
           crawlintel.resolve_redirects(edges, max_hops=4).collect()}
    assert out[11]["status"] == "capped" and out[11]["final"] == 7 and out[11]["hops"] == 4
    assert out[4]["status"] == "resolved" and out[4]["final"] == 0


# ------------------------------------------------------------ sitemap diff
def test_sitemap_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30)], "url string, lastmod long"
    )
    new = spark.createDataFrame(
        [("u2", 20), ("u3", 35), ("u4", 40)], "url string, lastmod long"
    )
    out = {r["url"]: r["change"] for r in
           crawlintel.sitemap_diff(old, new).collect()}
    assert out == {"u1": "removed", "u3": "changed", "u4": "added"}


# ------------------------------------------------------------- plan shape
@pytest.mark.parametrize(
    "build",
    [
        lambda spark: crawlintel.mirror_hosts(_pages(spark), max_hash_df=4),
        lambda spark: crawlintel.dust_params(_dust_pages(spark)),
        lambda spark: crawlintel.resolve_redirects(_edges(spark), max_hops=4),
        lambda spark: crawlintel.budget_alloc(
            spark.createDataFrame([("a", 1)], "host string, w long"), "w", 5
        ),
    ],
)
def test_no_cartesian_product(spark, build):
    plan = build(spark)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_budget_alloc_differential_vs_python_reference(spark):
    import random

    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(1, 12)
        weights = [(f"h{i:02d}", rng.randint(0, 9)) for i in range(n)]
        total = rng.randint(1, 500)
        s = sum(w for _, w in weights)
        if s == 0:
            weights[0] = (weights[0][0], 1)
            s = 1
        fl = {h: total * w // s for h, w in weights}
        rem = {h: total * w % s for h, w in weights}
        leftover = total - sum(fl.values())
        order = sorted(weights, key=lambda hw: (-rem[hw[0]], hw[0]))
        for h, _ in order[:leftover]:
            fl[h] += 1
        stats = spark.createDataFrame(weights, "host string, w long")
        out = {
            r["host"]: r["alloc"]
            for r in crawlintel.budget_alloc(stats, "w", total=total).collect()
        }
        assert out == fl, (trial, total, weights)


def test_budget_alloc_withholds_on_all_zero_weights(spark):
    stats = spark.createDataFrame([("a", 0), ("b", 0)], "host string, w long")
    out = {r["host"]: r["alloc"] for r in
           crawlintel.budget_alloc(stats, "w", total=10).collect()}
    assert out == {"a": 0, "b": 0}
