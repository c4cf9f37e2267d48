"""Unit tests for the training-data sampling operators and the
integer fixed-point PageRank (operators/sampling.py, operators/graph.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.graph import pagerank_int
from netrunner_spark.operators.sampling import (
    hash_split,
    rate_sample,
    split_thresholds,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
    )


def _py_split(key, thresholds, salt="split"):
    pos = hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:12]
    for name, upper in thresholds:
        if upper is None or pos < upper:
            return name
    raise AssertionError("unreachable")


def test_hash_split_matches_python_md5(spark, docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    th = split_thresholds(fr)
    got = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", fr).collect()}
    for k, v in got.items():
        assert v == _py_split(k, th)
    # fractions approximately honored (hash-uniformity; 2000 keys)
    n = len(got)
    for name, frac in fr.items():
        share = sum(1 for v in got.values() if v == name) / n
        assert abs(share - frac) < 0.04, (name, share)


def test_hash_split_stable_under_corpus_growth(spark, docs):
    # adding rows must never move an existing row between splits
    small = {r["doc_id"]: r["split"] for r in hash_split(docs.limit(500), "doc_id").collect()}
    big = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    assert all(big[k] == v for k, v in small.items())


def test_rate_sample_nested_and_deterministic(spark, docs):
    s10 = {r["doc_id"] for r in rate_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in rate_sample(docs, "doc_id", 0.3).collect()}
    again = {r["doc_id"] for r in rate_sample(docs, "doc_id", 0.1).collect()}
    assert s10 == again  # deterministic
    assert s10 <= s30  # monotone: raising the rate only adds rows
    assert 0.06 < len(s10) / 2000 < 0.14
    assert rate_sample(docs, "doc_id", 1.0).count() == 2000


def test_rate_sample_rejects_bad_rate(spark, docs):
    with pytest.raises(ValueError):
        rate_sample(docs, "doc_id", 1.5)


def test_split_thresholds_reject_non_unit_sum():
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.1})


def test_stratified_sample_exact_quota(spark, docs):
    out = stratified_sample(docs, "lang", "doc_id", 7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    assert set(by_lang) == {"0", "1", "2", "3", "4"}
    for lang, rks in by_lang.items():
        assert sorted(rks) == list(range(1, 8)), lang
    # deterministic membership across runs
    again = stratified_sample(docs, "lang", "doc_id", 7).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def _numpy_pagerank_int(edges, iters=3, damp=85, scale=10**12):
    """Reference implementation of the SAME integer recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {x: scale // n for x in nodes}
    base = ((100 - damp) * scale) // (100 * n)
    for _ in range(iters):
        contrib = {x: 0 for x in nodes}
        for u, v in edges:
            contrib[v] += r[u] // out[u]
        dang = sum(r[x] for x in nodes if x not in out)
        r = {x: base + (damp * (contrib[x] + dang // n)) // 100 for x in nodes}
    return r


def test_pagerank_matches_python_reference_exactly(spark):
    import random

    rng = random.Random(7)
    edges = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["id"]: r["rank_e12"] for r in pagerank_int(e, iters=3).collect()}
    want = _numpy_pagerank_int(edges)
    assert got == want  # EXACT int equality — the operator's contract


def test_pagerank_star_ranks_center_highest_and_conserves_mass(spark):
    # star: 1..10 -> 0; 0 dangles
    edges = [(i, 0) for i in range(1, 11)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["id"]: r["rank_e12"] for r in pagerank_int(e, iters=5).collect()}
    assert max(got, key=got.get) == 0
    total = sum(got.values())
    # floor division leaks < n ranks-units per iteration
    assert 10**12 * 0.999 < total <= 10**12


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src: long, dst: long")
    assert pagerank_int(e).count() == 0

def test_skewsafe_matches_plain_stratified(spark, docs):
    from netrunner_spark.operators.sampling import stratified_sample_skewsafe

    plain = stratified_sample(docs, "lang", "doc_id", 7)
    safe = stratified_sample_skewsafe(docs, "lang", "doc_id", 7, n_buckets=8)
    a = sorted((r["lang"], r["doc_id"], r["rk"]) for r in plain.collect())
    b = sorted((r["lang"], r["doc_id"], r["rk"]) for r in safe.collect())
    assert a == b  # identical output, skew-pruned plan
    # the local prune really bounds phase-2 input: with 1 bucket it
    # degenerates to the plain single-window result too
    one = stratified_sample_skewsafe(docs, "lang", "doc_id", 7, n_buckets=1)
    assert sorted((r["lang"], r["doc_id"], r["rk"]) for r in one.collect()) == a


def test_budget_cap_inclusive_running_sum(spark):
    from netrunner_spark.operators.sampling import budget_cap

    df = spark.createDataFrame(
        [(i, "h", 40) for i in range(10)] + [(100, "tiny", 9999)],
        "doc_id long, host string, n_chars long",
    )
    out = budget_cap(df, "host", "doc_id", "n_chars", budget=100).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # host "h": 40-cost rows -> exactly 2 admitted (cum 40, 80; 3rd hits 120)
    assert len(by_host["h"]) == 2
    assert sorted(r["cum_cost"] for r in by_host["h"]) == [40, 80]
    # an over-budget FIRST row is dropped whole, never truncated
    assert "tiny" not in by_host
    # monotone: raising the budget only adds rows
    small = {r["doc_id"] for r in out}
    big = {
        r["doc_id"]
        for r in budget_cap(df, "host", "doc_id", "n_chars", budget=200).collect()
    }
    assert small <= big and len(big) > len(small)


def test_hits_int_star_graph_semantics(spark):
    from netrunner_spark.operators.graph import hits_int

    # 5 hubs all point at node 100; node 200 gets a single link
    edges = [(i, 100) for i in range(5)] + [(0, 200)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: (r["hub_e9"], r["auth_e9"]) for r in hits_int(e, iters=3).collect()}
    # 100 is the dominant authority; hubs have zero authority
    assert got[100][1] > got[200][1] > 0
    assert all(got[i][1] == 0 for i in range(5))
    # node 0 links to both targets → strictly better hub than 1..4
    assert got[0][0] > got[1][0] > 0
    # pure authorities have zero hub score
    assert got[100][0] == 0 and got[200][0] == 0


def test_hits_int_matches_python_reference(spark):
    import random

    from netrunner_spark.operators.graph import hits_int

    rng = random.Random(5)
    edges = sorted({(rng.randrange(12), 12 + rng.randrange(8)) for _ in range(40)})
    e = spark.createDataFrame(edges, "src long, dst long")
    scale, iters = 10**9, 3
    ids = sorted({s for s, _ in edges} | {d for _, d in edges})
    hub = {i: scale for i in ids}

    def norm(raw):
        tot = sum(raw.values())
        d = max(tot // scale, 1)
        return {i: v // d for i, v in raw.items()}

    for _ in range(iters):
        a = {i: 0 for i in ids}
        for s, dst in edges:
            a[dst] += hub[s]
        auth = norm(a)
        h = {i: 0 for i in ids}
        for s, dst in edges:
            h[s] += auth[dst]
        hub = norm(h)
    want = {i: (hub[i], auth[i]) for i in ids}
    got = {r["id"]: (r["hub_e9"], r["auth_e9"]) for r in hits_int(e, iters=iters).collect()}
    assert got == want


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    from netrunner_spark.operators.graph import pagerank_int

    # two disconnected 3-cycles; seeds in the first one only
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["rank_e12"] for r in pagerank_int(e, iters=4, seeds=seeds).collect()}
    # all mass stays in the seed component; the other cycle gets zero
    assert all(got[i] > 0 for i in (0, 1, 2))
    assert all(got[i] == 0 for i in (10, 11, 12))
    # uniform variant spreads over both components
    uni = {r["id"]: r["rank_e12"] for r in pagerank_int(e, iters=4).collect()}
    assert all(uni[i] > 0 for i in (0, 1, 2, 10, 11, 12))


def test_personalized_pagerank_requires_in_graph_seed(spark):
    import pytest as _pytest

    from netrunner_spark.operators.graph import pagerank_int

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "id long")  # not in graph
    with _pytest.raises(ValueError):
        pagerank_int(e, iters=1, seeds=seeds)


def test_weighted_pagerank_reduces_to_uniform_on_const_weights(spark):
    """(r·w) div (k·w) = r div k, so constant weights must reproduce
    the unweighted recurrence BIT-FOR-BIT — the exactness contract."""
    from netrunner_spark.operators.graph import pagerank_int, pagerank_weighted_int

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ew = spark.createDataFrame([(s, d, 7) for s, d in edges], "src long, dst long, w long")
    uni = {r["id"]: r["rank_e12"] for r in pagerank_int(e, iters=3).collect()}
    wgt = {r["id"]: r["rank_e12"] for r in pagerank_weighted_int(ew, iters=3).collect()}
    assert uni == wgt


def test_weighted_pagerank_multiplicity_shifts_rank(spark):
    """src 0 links dst 1 three times and dst 2 once → node 1 must
    out-rank node 2; duplicate (src,dst) rows sum into one edge."""
    from netrunner_spark.operators.graph import pagerank_weighted_int

    rows = [(0, 1, 1)] * 3 + [(0, 2, 1), (1, 0, 1), (2, 0, 1)]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    got = {r["id"]: r["rank_e12"] for r in pagerank_weighted_int(e, iters=4).collect()}
    assert got[1] > got[2]


# ---------------------------------------------------------- LPA communities
def test_label_propagation_splits_triangles(spark):
    from netrunner_spark.operators.graph import label_propagation_int

    # two triangles joined by one bridge edge: LPA must keep them as
    # separate communities even though they share a component
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)],
        "src long, dst long",
    )
    out = {r["id"]: r["community"] for r in
           label_propagation_int(edges, iters=3).collect()}
    assert len(out) == 6
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11] == out[12]
    assert out[0] != out[10]


def test_label_propagation_deterministic_and_isolated_nodes(spark):
    from netrunner_spark.operators.graph import label_propagation_int

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(99,)], "id long")
    a = sorted(label_propagation_int(edges, iters=2, nodes=nodes).collect())
    b = sorted(label_propagation_int(edges, iters=2, nodes=nodes).collect())
    assert a == b
    out = {r["id"]: r["community"] for r in a}
    assert out[99] == 99  # isolated node keeps its own label


# ------------------------------------------------------------ seq packing
def test_pack_sequences_layout_invariants(spark):
    from netrunner_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (20 + i)) for i in range(40)], "doc_id long, text string"
    )
    out = pack_sequences(docs, context_len=64, n_buckets=4).collect()
    assert len(out) == 40
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for b, rows in by_bucket.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            # the packing IS the concat stream: offset = cumsum mod L,
            # seq = bucket*2^32 + cumsum div L
            assert r["start_offset"] == cum % 64
            assert r["seq_id"] == b * 2**32 + cum // 64
            cum += r["n_tokens"]


def test_pack_sequences_deterministic_across_repartition(spark):
    from netrunner_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (5 + i % 7)) for i in range(30)], "doc_id long, text string"
    )
    a = sorted(map(tuple, pack_sequences(docs, 32, 4).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(7), 32, 4).collect()))
    assert a == b


# ------------------------------------------------------------- mixture plan
def test_mixture_plan_epoch_dials(spark):
    from netrunner_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b c d", "web"), (2, "a b c d", "web"), (3, "a b", "code")],
        "doc_id long, text string, source string",
    )
    targets = spark.createDataFrame(
        [("web", 600), ("code", 400)], "source string, target_permille long"
    )
    out = {r["source"]: r for r in
           mixture_plan(docs, targets, token_budget=100).collect()}
    web = out["web"]       # 8 tokens available, target 60 → 7500 permille
    assert web["n_tokens"] == 8 and web["target_tokens"] == 60
    assert web["repeat_permille"] == 7500
    code = out["code"]     # 2 tokens available, target 40 → 20 epochs
    assert code["target_tokens"] == 40 and code["repeat_permille"] == 20000


def test_mixture_plan_unlisted_source_gets_zero(spark):
    from netrunner_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(1, "x y", "web"), (2, "x y", "junk")],
        "doc_id long, text string, source string",
    )
    targets = spark.createDataFrame([("web", 1000)], "source string, target_permille long")
    out = {r["source"]: r for r in
           mixture_plan(docs, targets, token_budget=50).collect()}
    assert out["junk"]["target_tokens"] == 0 and out["junk"]["repeat_permille"] == 0


def test_apply_mixture_materializes_epochs(spark):
    from netrunner_spark.operators.sampling import apply_mixture, mixture_plan

    docs = spark.createDataFrame(
        [(i, "a b c d e", "web") for i in range(10)]
        + [(100 + i, "a b c d e", "code") for i in range(10)]
        + [(200, "a b", "junk")],
        "doc_id long, text string, source string",
    )
    targets = spark.createDataFrame(
        [("web", 500), ("code", 500)], "source string, target_permille long"
    )
    # budget 250 tokens: each source has 50 → target 125 → repeat 2500
    plan = mixture_plan(docs, targets, token_budget=250)
    out = apply_mixture(docs, plan).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["copy"])
    # junk excluded entirely
    assert 200 not in per_doc
    # every web/code doc appears 2 or 3 times (2500 permille), copies 0..n-1
    for d, cps in per_doc.items():
        assert sorted(cps) == list(range(len(cps))) and len(cps) in (2, 3)
    # the fractional lottery lands near half the docs (hash-deterministic)
    n3 = sum(1 for c in per_doc.values() if len(c) == 3)
    assert 1 <= n3 <= 19
    # re-run identical
    again = apply_mixture(docs, plan).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bowtie_components(spark):
    from netrunner_spark.operators.graph import bowtie

    edges = []
    edges += [(i, (i + 1) % 10) for i in range(10)]   # SCC ring
    edges += [(20, 21), (21, 0)]                      # IN chain
    edges += [(5, 30), (30, 31)]                      # OUT chain
    edges += [(40, 41)]                               # disconnected
    edges += [(21, 50)]                               # tendril off IN
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in bowtie(df, pivot=0).collect()}
    assert all(got[i] == "scc" for i in range(10))
    assert got[20] == got[21] == "in"
    assert got[30] == got[31] == "out"
    assert got[40] == got[41] == got[50] == "other"


def test_reach_closure_direction_and_fixpoint(spark):
    from netrunner_spark.operators.graph import reach_closure

    df = spark.createDataFrame([(0, 1), (1, 2), (3, 0)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    fwd = {r.id for r in reach_closure(df, seeds).collect()}
    bwd = {r.id for r in reach_closure(df, seeds, reverse=True).collect()}
    assert fwd == {0, 1, 2}
    assert bwd == {0, 3}


def test_degree_histogram_bins(spark):
    from netrunner_spark.operators.graph import degree_histogram

    # node 0 -> 9 targets (bin 4: deg 9), nodes 1..3 -> 1 target (bin 1)
    edges = [(0, 100 + i) for i in range(9)] + [(1, 0), (2, 0), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.side, r.bin): r.n_nodes for r in degree_histogram(df).collect()
    }
    assert got[("out", 4)] == 1        # deg 9 -> bit_length 4
    assert got[("out", 1)] == 3        # deg 1
    assert got[("in", 1)] == 9         # the 9 targets
    assert got[("in", 2)] == 1         # node 0 in-deg 3 -> bit_length 2


def _py_opic_int(edges, iters=3, scale=10**12):
    """Reference implementation of the SAME OPIC integer recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    cash = {x: scale // n for x in nodes}
    hist = {x: 0 for x in nodes}
    for _ in range(iters):
        contrib = {x: 0 for x in nodes}
        for u, v in edges:
            contrib[v] += cash[u] // out[u]
        pot = 0
        for x in nodes:
            if x in out:
                pot += cash[x] - (cash[x] // out[x]) * out[x]
            else:
                pot += cash[x]
        hist = {x: hist[x] + cash[x] for x in nodes}
        cash = {x: contrib[x] + pot // n for x in nodes}
    return {x: (cash[x], hist[x]) for x in nodes}


def test_opic_matches_python_reference_exactly(spark):
    import random

    from netrunner_spark.operators.graph import opic_int

    rng = random.Random(17)
    edges = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r["id"]: (r["cash_e12"], r["hist_e12"])
        for r in opic_int(e, iters=3).collect()
    }
    assert got == _py_opic_int(edges)


def test_opic_conserves_cash_and_accumulates_history(spark):
    from netrunner_spark.operators.graph import opic_int

    # ring + one dangling sink: cash is conserved up to the pot's
    # div-n truncation (< n units per round); history after k rounds
    # sums to ~k·scale
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(2, 9)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    iters, scale = 4, 10**12
    got = {
        r["id"]: (r["cash_e12"], r["hist_e12"])
        for r in opic_int(e, iters=iters, scale=scale).collect()
    }
    n = len(got)
    total_cash = sum(c for c, _ in got.values())
    assert scale - iters * n <= total_cash <= scale
    total_hist = sum(h for _, h in got.values())
    assert iters * (scale - iters * n) <= total_hist <= iters * scale
    # the dangling sink (9) never re-emits: its history still grows
    assert got[9][1] > 0


def test_opic_empty_graph(spark):
    from netrunner_spark.operators.graph import opic_int

    e = spark.createDataFrame([], "src: long, dst: long")
    assert opic_int(e).count() == 0


def test_opic_budget_composition_sums_exactly(spark):
    # OPIC history -> Hamilton apportionment: allocs sum to the budget
    # exactly and a node with strictly larger history never gets a
    # smaller allocation than a same-tie-rank smaller one
    from netrunner_spark.operators.crawlintel import budget_alloc
    from netrunner_spark.operators.graph import opic_int
    from pyspark.sql import functions as F

    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 9), (1, 9), (2, 9)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    imp = opic_int(e, iters=3)
    stats = imp.select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        "hist_e12",
    )
    out = budget_alloc(stats, "hist_e12", total=101).collect()
    assert sum(r["alloc"] for r in out) == 101
    by_host = {r["host"]: r for r in out}
    # node 9 has 3 extra in-edges: strictly more history than its ring
    # peers, so at least as many slots as any of them
    assert by_host["h9"]["alloc"] >= max(
        by_host[f"h{i}"]["alloc"] for i in range(3, 8)
    )


# ---------------------------------------------------------------- HyperBall


def _exact_ball_pairs(edges, iters):
    """Pure-Python (id, member) closure: B(v, t) = {v} ∪ ⋃_{v→w} B(w, t−1)."""
    out_nbrs = {}
    nodes = set()
    for s, d in edges:
        out_nbrs.setdefault(s, set()).add(d)
        nodes.update((s, d))
    balls = {v: {v} for v in nodes}
    for _ in range(iters):
        balls = {
            v: {v}.union(*(balls[w] for w in out_nbrs.get(v, ()))) | balls[v]
            for v in nodes
        }
    return balls


@pytest.fixture(scope="module")
def hb_edges():
    # deterministic sparse digraph with real multi-hop structure:
    # ring + skip-3 chords + a few cross links
    e = [(i, (i + 1) % 20) for i in range(20)]
    e += [(i, (i + 3) % 20) for i in range(0, 20, 4)]
    e += [(2, 11), (7, 0), (15, 4)]
    return e


def test_hyperball_registers_equal_hll_of_exact_ball(spark, hb_edges):
    """THE correctness pin: after t rounds, a node's register row-set is
    EXACTLY hll_registers(exact-ball pairs, by=id) — the sketch of the
    true ball, not an approximation of a sketch."""
    from netrunner_spark.operators.graph import hyperball_registers
    from netrunner_spark.operators.sketches import hll_registers

    e = spark.createDataFrame(hb_edges, "src long, dst long")
    got = {
        (r["id"], r["bucket"]): r["rho"]
        for r in hyperball_registers(e, iters=3, p=4, salt="hb").collect()
    }
    balls = _exact_ball_pairs(hb_edges, 3)
    pairs = spark.createDataFrame(
        [(v, m) for v, ball in balls.items() for m in ball],
        "id long, member long",
    )
    want = {
        (r["id"], r["bucket"]): r["rho"]
        for r in hll_registers(pairs, "member", p=4, salt="hb", by=("id",)).collect()
    }
    assert got == want


def test_hyperball_nf_monotone_and_consistent(spark, hb_edges):
    from netrunner_spark.operators.graph import hyperball_nf

    e = spark.createDataFrame(hb_edges, "src long, dst long")
    rows = hyperball_nf(e, iters=3, p=4).collect()
    by_node = {}
    for r in rows:
        by_node.setdefault(r["id"], {})[r["t"]] = (
            r["nonzero_buckets"],
            r["denom"],
        )
    m, rmax = 16, 49
    for nid, levels in by_node.items():
        assert sorted(levels) == [0, 1, 2, 3]
        # t=0: the ball is {v} — exactly one occupied register
        assert levels[0][0] == 1
        for t in range(1, 4):
            # registers only grow: occupancy up, harmonic denom down
            assert levels[t][0] >= levels[t - 1][0]
            assert levels[t][1] <= levels[t - 1][1]
            assert 1 <= levels[t][0] <= m
            assert levels[t][1] <= m * (1 << rmax)


def test_ball_sizes_exact_ring_growth(spark):
    """On a directed 50-ring the t-ball is exactly the t+1 next nodes."""
    from netrunner_spark.operators.graph import ball_sizes_exact

    e = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    rows = ball_sizes_exact(e, iters=3).collect()
    assert len(rows) == 50 * 4
    for r in rows:
        assert r["ball"] == r["t"] + 1


def test_ball_sizes_match_python_closure(spark, hb_edges):
    from netrunner_spark.operators.graph import ball_sizes_exact

    got = {
        (r["id"], r["t"]): r["ball"]
        for r in ball_sizes_exact(
            spark.createDataFrame(hb_edges, "src long, dst long"), iters=3
        ).collect()
    }
    balls = _exact_ball_pairs(hb_edges, 0)
    want = {(v, 0): len(b) for v, b in balls.items()}
    for t in range(1, 4):
        balls = _exact_ball_pairs(hb_edges, t)
        want.update({(v, t): len(b) for v, b in balls.items()})
    assert got == want


def test_hyperball_estimate_tracks_exact_ball(spark):
    """End-to-end accuracy eval (the graph analog of ann_recall's
    self-measurement): the float HLL estimate derived from the nf
    denominator stays within the usual HLL error envelope of the exact
    ball size on a 200-node ring at p=6."""
    from netrunner_spark.operators.graph import hyperball_nf

    n, p = 200, 6
    m = 1 << p
    rmax = 52 - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    rows = hyperball_nf(e, iters=8, p=p).collect()
    # every node's 8-ball on the ring is exactly 9 nodes
    errs = []
    for r in rows:
        if r["t"] != 8:
            continue
        est = alpha * m * m * (2.0**rmax) / r["denom"]
        zeros = m - r["nonzero_buckets"]
        if est <= 2.5 * m and zeros:
            import math

            est = m * math.log(m / zeros)
        errs.append(abs(est - 9.0) / 9.0)
    assert len(errs) == n
    # small-range linear counting: well under the 1.04/sqrt(m)≈13% envelope
    assert sum(errs) / len(errs) < 0.13


def test_hyperball_empty_graph(spark):
    from netrunner_spark.operators.graph import hyperball_registers

    e = spark.createDataFrame([], "src long, dst long")
    assert hyperball_registers(e, iters=2, p=4).count() == 0


def test_harmonic_centrality_matches_python_closure(spark, hb_edges):
    from netrunner_spark.operators.graph import harmonic_centrality_exact

    e = spark.createDataFrame(hb_edges, "src long, dst long")
    got = {
        r["id"]: r["hc6"]
        for r in harmonic_centrality_exact(e, iters=3).collect()
    }
    prev = {v: len(b) for v, b in _exact_ball_pairs(hb_edges, 0).items()}
    want = {v: 0 for v in prev}
    for t in (1, 2, 3):
        cur = {v: len(b) for v, b in _exact_ball_pairs(hb_edges, t).items()}
        for v in want:
            want[v] += (6 // t) * (cur[v] - prev[v])
        prev = cur
    assert got == want


def test_neighborhood_function_exact_ring(spark):
    """On a 50-ring NF(t) = 50·(t+1); frac_e6 is the integerized
    cumulative fraction of NF(3)=200."""
    from netrunner_spark.operators.graph import neighborhood_function_exact

    e = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    rows = {
        r["t"]: (r["nf_pairs"], r["frac_e6"])
        for r in neighborhood_function_exact(e, iters=3).collect()
    }
    assert rows == {
        0: (50, 250000),
        1: (100, 500000),
        2: (150, 750000),
        3: (200, 1000000),
    }


def _md5_52_py(salt, s):
    return int(hashlib.md5(f"{salt}{s}".encode()).hexdigest()[:13], 16)


def test_random_walks_match_python_reference(spark, hb_edges):
    """Differential: the argmin-of-md5 next-hop recurrence re-run in
    pure Python yields identical walks."""
    from netrunner_spark.operators.graph import random_walks

    e = spark.createDataFrame(hb_edges, "src long, dst long")
    got = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(e, walk_len=4, walks_per_node=2).collect()
    }
    out_nbrs = {}
    nodes = set()
    for s, d in hb_edges:
        out_nbrs.setdefault(s, set()).add(d)
        nodes.update((s, d))
    want = {}
    for v in nodes:
        for w in (0, 1):
            wid = v * 2 + w
            want[(wid, 0)] = v
            cur = v
            for i in range(1, 5):
                nbrs = out_nbrs.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs, key=lambda d: (_md5_52_py("rw", f"{wid}#{i}#{d}"), d)
                )
                want[(wid, i)] = cur
    assert got == want


def test_random_walks_follow_edges_and_cover_starts(spark, hb_edges):
    from netrunner_spark.operators.graph import random_walks

    e = spark.createDataFrame(hb_edges, "src long, dst long")
    rows = random_walks(e, walk_len=3, walks_per_node=1).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    edge_set = set(hb_edges)
    nodes = {v for ed in hb_edges for v in ed}
    assert len(walks) == len(nodes)  # one walk per node
    for wid, steps in walks.items():
        assert steps[0] == wid  # walks_per_node=1 → walk_id == start
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in edge_set


def test_neighbor_sample_caps_fanout_and_is_subset(spark):
    from netrunner_spark.operators.graph import neighbor_sample

    # star: hub 0 → 1..10, plus 1 → 2 (outdeg < k keeps all)
    edges = [(0, d) for d in range(1, 11)] + [(1, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = neighbor_sample(e, k=3).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append((r["rk"], r["dst"]))
        assert (r["src"], r["dst"]) in set(edges)
    assert len(by_src[0]) == 3
    assert sorted(rk for rk, _ in by_src[0]) == [1, 2, 3]
    assert by_src[1] == [(1, 2)]
    # deterministic re-run
    again = {(r["src"], r["dst"], r["rk"]) for r in neighbor_sample(e, k=3).collect()}
    assert again == {(r["src"], r["dst"], r["rk"]) for r in rows}


def test_skipgram_pairs_window_semantics(spark):
    from netrunner_spark.operators.graph import skipgram_pairs

    # one hand-built walk: 7 → 8 → 9 → 8
    walks = spark.createDataFrame(
        [(0, 0, 7), (0, 1, 8), (0, 2, 9), (0, 3, 8)],
        "walk_id long, step int, node long",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=1).collect()
    }
    # window=1: adjacent pairs only, both directions, multiplicity kept
    # ((8, 9) arises twice: steps (1,2) and (3,2))
    assert got == {(7, 8): 1, (8, 7): 1, (8, 9): 2, (9, 8): 2}
    # window=2 adds the step-distance-2 pairs
    got2 = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got2 == {
        (7, 8): 1, (8, 7): 1, (8, 9): 2, (9, 8): 2,
        (7, 9): 1, (9, 7): 1, (8, 8): 2,  # steps (1,3) and (3,1)
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_hyperball_differential_on_random_digraphs(spark, seed):
    """Seeded random digraphs: hyperball registers must equal the
    pure-Python HLL of the exact closure (same md5-52 hash, same
    bucket split, same bitlen) — and the nf table must equal the
    Python aggregate of those registers."""
    import random

    from netrunner_spark.operators.graph import (
        hyperball_nf,
        hyperball_registers,
    )

    rng = random.Random(seed)
    n = rng.randint(12, 28)
    edges = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    if not edges:
        edges = [(0, 1)]
    p, iters = 4, 3
    m, rest_bits = 1 << p, 52 - p
    rmax = rest_bits + 1

    balls = _exact_ball_pairs(edges, iters)
    want = {}
    for v, ball in balls.items():
        regs = {}
        for mem in ball:
            h = _md5_52_py("hb", mem)
            bucket, rest = h % m, h // m
            rho = rmax - rest.bit_length()
            regs[bucket] = max(regs.get(bucket, 0), rho)
        for b, rho in regs.items():
            want[(v, b)] = rho

    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["id"], r["bucket"]): r["rho"]
        for r in hyperball_registers(e, iters=iters, p=p, salt="hb").collect()
    }
    assert got == want

    # nf at t=iters: occupancy + integer harmonic denominator
    per_node = {}
    for (v, _b), rho in want.items():
        per_node.setdefault(v, []).append(rho)
    nf_want = {
        v: (
            len(rhos),
            sum(1 << (rmax - r) for r in rhos) + (m - len(rhos)) * (1 << rmax),
        )
        for v, rhos in per_node.items()
    }
    nf_got = {
        r["id"]: (r["nonzero_buckets"], r["denom"])
        for r in hyperball_nf(e, iters=iters, p=p).collect()
        if r["t"] == iters
    }
    assert nf_got == nf_want


@pytest.mark.parametrize("seed", [5, 42])
def test_random_walks_differential_on_random_digraphs(spark, seed):
    import random

    from netrunner_spark.operators.graph import random_walks

    rng = random.Random(seed)
    n = rng.randint(8, 16)
    edges = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 2 * n))
        }
    )
    edges = [(s, d) for s, d in edges if s != d] or [(0, 1)]
    out_nbrs = {}
    nodes = set()
    for s, d in edges:
        out_nbrs.setdefault(s, set()).add(d)
        nodes.update((s, d))
    wpn, wl = 2, 3
    want = {}
    for v in nodes:
        for w in range(wpn):
            wid = v * wpn + w
            want[(wid, 0)] = v
            cur = v
            for i in range(1, wl + 1):
                nbrs = out_nbrs.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda d: (_md5_52_py("rw", f"{wid}#{i}#{d}"), d),
                )
                want[(wid, i)] = cur
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(e, walk_len=wl, walks_per_node=wpn).collect()
    }
    assert got == want


def test_reach_budget_weights_monotone_in_ball_estimate(spark):
    """The loop's invariant: a strictly larger exact 2-ball must never
    earn a strictly smaller integer reach weight than a smaller ball
    UNLESS the HLL sketch collides (p=4 is coarse) — verify weight is
    a deterministic function of the register multiset and the Hamilton
    sum is exact."""
    from netrunner_spark.operators import crawlintel
    from netrunner_spark.operators.graph import hyperball_nf

    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 3), (0, 5), (0, 7)]
    e = spark.createDataFrame(edges, "src long, dst long")
    p = 4
    m, rmax = 1 << p, 52 - p + 1
    nf = hyperball_nf(e, iters=2, p=p)
    stats = nf.filter(F.col("t") == 2).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.expr(
            f"CAST(({m * (1 << rmax)} - denom) DIV {1 << 30} AS BIGINT)"
        ).alias("reach_w"),
    )
    rows = crawlintel.budget_alloc(stats, "reach_w", total=997).collect()
    assert sum(r["alloc"] for r in rows) == 997
    w = {r["host"]: r["weight"] for r in rows}
    a = {r["host"]: r["alloc"] for r in rows}
    # node 0 reaches {0,1,2,3,4,5,6,7,8} within 2 hops vs a plain ring
    # node's 3 — the hub must out-earn a plain ring node on both
    # weight and allocation
    assert w["h0"] > w["h2"]
    assert a["h0"] > a["h2"]
    # every weight positive (every node has a nonempty ball)
    assert all(v > 0 for v in w.values())
