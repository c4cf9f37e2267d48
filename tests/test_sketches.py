"""KMV distinct-count and count-min frequency sketches: estimator
accuracy, exactness guarantees, mergeability, and the no-global-sort
plan shape."""

from pyspark.sql import functions as F

from netrunner_spark.operators import sketches


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(1000)], "k long")
    row = sketches.kmv_distinct(df, "k", k=256).first()
    assert row["k_used"] == 10
    assert row["est_distinct"] == 10


def test_kmv_estimate_within_error_bound(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    row = sketches.kmv_distinct(df, "k", k=128).first()
    assert row["k_used"] == 128
    # KMV relative error ~ 1/sqrt(k) ≈ 0.09; allow 3σ
    assert abs(row["est_distinct"] - n) / n < 0.27


def test_kmv_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    hashes = df.select(sketches.md5_hash52("k").alias("h")).dropDuplicates()
    plan = hashes.orderBy("h").limit(16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global sort


def test_kmv_sql_twin_matches(spark):
    import duckdb

    rows = [(i % 700,) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long")
    got = sketches.kmv_distinct(df, "k", k=64).first()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(sketches.kmv_sql("t", "k", k=64)).fetchone()
    assert (got["k_used"], got["kth_hash"], got["est_distinct"]) == want


def _tok(spark, words):
    return spark.createDataFrame([(w,) for w in words], "gram string")


def test_cms_point_estimates(spark):
    corpus = ["aa"] * 5 + ["bb"] * 3 + ["cc"]
    cells = sketches.cms_cells(_tok(spark, corpus))
    est = sketches.cms_estimate(cells, _tok(spark, ["aa", "bb", "zz"]))
    got = {r["token"]: r["est_count"] for r in est.collect()}
    # few tokens, width 256 → no collisions: estimates are exact;
    # absent token reads 0 (CMS never under-counts)
    assert got == {"aa": 5, "bb": 3, "zz": 0}


def test_cms_cells_merge_additively(spark):
    a = ["aa"] * 4 + ["bb"] * 2
    b = ["aa"] * 3 + ["cc"] * 5
    full = sketches.cms_cells(_tok(spark, a + b))
    halves = (
        sketches.cms_cells(_tok(spark, a))
        .unionByName(sketches.cms_cells(_tok(spark, b)))
        .groupBy("j", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_map = lambda df: {(r["j"], r["cell"]): r["cnt"] for r in df.collect()}
    assert as_map(full) == as_map(halves)


def test_hist_quantiles_exact_ints(spark):
    # 100 values 0..99, bin width 10: p50 rank=50 → cum hits at bin 4
    # (values 40..49 reach cum 50) → est 40; p90 → bin 8 → 80
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    bins = sketches.hist_bins(df, "v", 10)
    got = {
        r["q_permille"]: r["est_value"]
        for r in sketches.hist_quantiles(bins, (500, 900, 1000), 10).collect()
    }
    assert got == {500: 40, 900: 80, 1000: 90}


def test_hist_bins_merge_additively(spark):
    a = spark.createDataFrame([(i % 30,) for i in range(50)], "v long")
    b = spark.createDataFrame([(i % 70,) for i in range(90)], "v long")
    full = sketches.hist_bins(a.unionByName(b), "v", 10)
    merged = (
        sketches.hist_bins(a, "v", 10)
        .unionByName(sketches.hist_bins(b, "v", 10))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_map = lambda df: {r["bin"]: r["cnt"] for r in df.collect()}
    assert as_map(full) == as_map(merged)


def test_hll_registers_mergeable_across_shards(spark):
    df = spark.createDataFrame([(i % 500,) for i in range(3000)], "k long")
    whole = {
        (r.bucket, r.rho) for r in sketches.hll_registers(df, "k", p=6).collect()
    }
    a = sketches.hll_registers(df.filter("k % 2 = 0"), "k", p=6)
    b = sketches.hll_registers(df.filter("k % 2 = 1"), "k", p=6)
    merged = {
        (r.bucket, r.rho)
        for r in a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho")).collect()
    }
    assert merged == whole  # groupBy-max IS the sketch merge


def test_hll_estimate_within_error_bound(spark):
    n = 20_000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    regs = sketches.hll_registers(df, "k", p=8)
    est = sketches.hll_estimate(regs, p=8)
    # HLL relative error ~ 1.04/sqrt(m) = 6.5% at m=256; allow 3σ
    assert abs(est - n) / n < 0.20


def test_hll_sql_twin_matches(spark):
    import duckdb

    rows = [(i % 77,) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long")
    got = {(r.bucket, r.rho) for r in sketches.hll_registers(df, "k", p=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = set(con.execute(sketches.hll_sql("t", "k", p=5)).fetchall())
    assert got == want


def test_hll_bitlen_case_is_exact_at_boundaries(spark):
    # powers of two are exactly where a float log2 path would wobble
    vals = [0, 1, 2, 3, 4, 7, 8, 1 << 20, (1 << 20) - 1, (1 << 46) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "rest long")
    got = {
        r.rest: r.bl
        for r in df.select(
            "rest", F.expr(sketches._bitlen_case("rest", 46)).alias("bl")
        ).collect()
    }
    assert got == {v: v.bit_length() for v in vals}


def test_hll_registers_grouped_by_matches_merge(spark):
    df = spark.createDataFrame(
        [(i % 3, i % 400) for i in range(2000)], "g int, k long"
    )
    grouped = sketches.hll_registers(df, "k", p=6, by=("g",))
    merged = {
        (r.bucket, r.rho)
        for r in grouped.groupBy("bucket").agg(F.max("rho").alias("rho")).collect()
    }
    whole = {
        (r.bucket, r.rho) for r in sketches.hll_registers(df, "k", p=6).collect()
    }
    assert merged == whole
    # each group's register table is itself a valid sketch of the slice
    g0 = {
        (r.bucket, r.rho) for r in grouped.filter("g = 0").select("bucket", "rho").collect()
    }
    slice0 = {
        (r.bucket, r.rho)
        for r in sketches.hll_registers(df.filter("g = 0"), "k", p=6).collect()
    }
    assert g0 == slice0


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(300)], "key string"
    )
    bits = sketches.bloom_bits(members, "key", m=4096, k=3)
    # members ∪ strangers probed together
    probes = spark.createDataFrame(
        [(f"m{i}",) for i in range(300)] + [(f"s{i}",) for i in range(300)],
        "key string",
    )
    got = {
        r.key: r.maybe_present
        for r in sketches.bloom_probe(bits, probes, "key", m=4096, k=3).collect()
    }
    assert all(got[f"m{i}"] for i in range(300))  # no false negatives
    fps = sum(got[f"s{i}"] for i in range(300))
    # expected FP rate (1-e^{-kn/m})^3 ~ 0.8%; 3 sigma head-room
    assert fps <= 20


def test_bloom_union_is_merge(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
    both = a.unionByName(b)
    merged = (
        sketches.bloom_bits(a, "key")
        .unionByName(sketches.bloom_bits(b, "key"))
        .dropDuplicates()
    )
    whole = sketches.bloom_bits(both, "key")
    assert {(r.j, r.bit) for r in merged.collect()} == {
        (r.j, r.bit) for r in whole.collect()
    }


def test_grouped_hist_quantiles_exactness_and_window_scope(spark):
    # group a: 1..100 -> P50 bin holds 50, P99 bin holds 99 (width 10)
    # group b: constant 5 -> every quantile lands in bin 0
    rows = [("a", v) for v in range(1, 101)] + [("b", 5)] * 20
    df = spark.createDataFrame(rows, "host string, v long")
    got = {
        (r.host, r.q_permille): r.est_value
        for r in sketches.grouped_hist_quantiles(
            df, "host", "v", bin_width=10, qs_permille=(500, 990)
        ).collect()
    }
    assert got[("a", 500)] == 50   # rank 50 -> value 50 -> bin 5 -> 50
    assert got[("a", 990)] == 90   # rank 99 -> value 99 -> bin 9 -> 90
    assert got[("b", 500)] == 0 and got[("b", 990)] == 0
    # plan: the only Window partitions by group over BINS, and the raw
    # table is collapsed by a hash aggregate before any window
    plan = (
        sketches.grouped_hist_quantiles(df, "host", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan and "HashAggregate" in plan


def test_hll_registers_differential_vs_python_reference(spark):
    import hashlib
    import random

    rng = random.Random(83)
    keys = [rng.randrange(10_000) for _ in range(1500)]
    p, rest_bits = 6, 46

    def ref(ks):
        regs = {}
        for k in ks:
            h = int(hashlib.md5(f"hll{k}".encode()).hexdigest()[:13], 16)
            bucket, rest = h % (1 << p), h >> p
            rho = rest_bits + 1 - rest.bit_length()
            regs[bucket] = max(regs.get(bucket, 0), rho)
        return set(regs.items())

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {(r.bucket, r.rho) for r in sketches.hll_registers(df, "k", p=p).collect()}
    assert got == ref(keys)


def test_kmv_set_ops_exact_when_under_k(spark):
    # tiny sets: every sketch is the full set, so the "estimates" are
    # the exact union / intersection cardinalities
    a = spark.createDataFrame([(i,) for i in range(10)], "k long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "k long")
    r = sketches.kmv_set_ops(a, b, key="k", k=64).collect()[0]
    assert r["k_used"] == 15  # |A ∪ B|
    assert r["est_union"] == 15
    assert r["rho"] == 5  # |A ∩ B| members inside the union sketch
    assert r["est_intersect"] == 5


def test_kmv_set_ops_estimates_within_error_bound(spark):
    # 1200 ∪-distinct keys with a 400-key overlap at k=128: the KMV
    # standard error is ~1/sqrt(k-2) ≈ 9%, assert a generous 3-sigma
    n, overlap, k = 800, 400, 128
    a = spark.createDataFrame([(i,) for i in range(n)], "k long")
    b = spark.createDataFrame(
        [(i,) for i in range(n - overlap, 2 * n - overlap)], "k long"
    )
    r = sketches.kmv_set_ops(a, b, key="k", k=k).collect()[0]
    true_union = 2 * n - overlap
    assert r["k_used"] == k
    assert abs(r["est_union"] - true_union) <= true_union * 0.3
    assert abs(r["est_intersect"] - overlap) <= true_union * 0.3
    # determinism: identical rerun
    r2 = sketches.kmv_set_ops(a, b, key="k", k=k).collect()[0]
    assert r.asDict() == r2.asDict()


def test_kmv_set_ops_plan_is_take_ordered(spark):
    # both input sketches and the union re-sketch must plan as
    # TakeOrdered (per-partition top-k), never a global sort
    a = spark.createDataFrame([(i,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i,) for i in range(25, 75)], "k long")
    plan = (
        sketches.kmv_set_ops(a, b, key="k", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_kmv_set_ops_differential_vs_python_reference(spark):
    # full-algebra differential: same md5-prefix hash, merge and
    # integer estimator re-derived with hashlib — several random set
    # shapes including subset, disjoint-heavy and saturated cases
    import hashlib
    import random

    def ref(A, B, k):
        def h(v):
            return int(hashlib.md5(f"kmv{v}".encode()).hexdigest()[:13], 16)

        sa = sorted({h(v) for v in A})[:k]
        sb = sorted({h(v) for v in B})[:k]
        u = sorted(set(sa) | set(sb))[:k]
        k_used, kth = len(u), max(u)
        rho = sum(1 for x in u if x in set(sa) and x in set(sb))
        est_union = k_used if k_used < k else (k - 1) * 16**13 // kth
        return {
            "k_used": k_used,
            "kth_hash": kth,
            "rho": rho,
            "est_union": est_union,
            "est_intersect": rho * est_union // k_used,
        }

    rng = random.Random(97)
    shapes = [
        (list(range(40)), list(range(20, 60))),          # partial overlap
        (list(range(300)), list(range(150, 450))),       # saturated
        (list(range(100)), list(range(100))),            # identical
        (list(range(100)), list(range(200, 260))),       # disjoint
        (list(range(500)), list(range(10, 20))),         # B ⊂ A, tiny B
        (
            [rng.randrange(10_000) for _ in range(400)],
            [rng.randrange(10_000) for _ in range(400)],
        ),
    ]
    for A, B in shapes:
        a = spark.createDataFrame([(v,) for v in A], "k long")
        b = spark.createDataFrame([(v,) for v in B], "k long")
        got = sketches.kmv_set_ops(a, b, key="k", k=32).collect()[0].asDict()
        assert got == ref(A, B, 32), (len(A), len(B))


def test_hist_bins_floor_division_for_negatives(spark):
    """r5 review: truncate-toward-zero binning put -99..-1 and 0..99
    into one double-width bin 0. Floor binning keeps the bin-width
    error bound for signed columns."""
    from netrunner_spark.operators.sketches import hist_bins

    df = spark.createDataFrame([(-99,), (-1,), (0,), (99,)], "v long")
    got = {r["bin"]: r["cnt"] for r in hist_bins(df, "v", 100).collect()}
    assert got == {-1: 2, 0: 2}
