"""Z-order layout: Morton interleave correctness and the pruning
claim itself — a z-ordered layout must touch fewer partitions than a
single-column range sort for 2-d box queries, measured from the same
min/max extents a parquet reader would use."""

from pyspark.sql import functions as F

from netrunner_spark.operators import layout


def test_zvalue_interleave_exact(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (63, 63)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(layout.zvalue("a", "b", bits=6).alias("z"))
        .orderBy("z")
        .collect()
    ]

    def morton(a, b):
        z = 0
        for i in range(6):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == sorted(morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (63, 63)])


def test_zvalue_sql_twin_matches(spark):
    import duckdb

    rows = [(i * 37 % 64, i * 53 % 64) for i in range(50)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(
        r["z"] for r in df.select(layout.zvalue("a", "b", bits=6).alias("z")).collect()
    )
    sql = f"SELECT {layout.zvalue_sql('a', 'b', 6)} AS z FROM t"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(r[0] for r in con.execute(sql).fetchall())
    assert got == want


def test_zorder_prunes_2d_box(spark):
    n = 64
    rows = [(i, i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zdf = layout.zorder(df, "x", "y", bits=6, num_partitions=16)
    lin = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    ez = layout.partition_extents(zdf, "x", "y").cache()
    el = layout.partition_extents(lin, "x", "y").cache()

    # 16×16 corner box: linear-by-x must read every partition whose x
    # stripe overlaps (~4); z-order packs the box into ~1 rectangle
    tz = layout.touched_partitions(ez, 0, 15, 0, 15)
    tl = layout.touched_partitions(el, 0, 15, 0, 15)
    assert tz < tl
    assert tz <= 2

    # y-only predicate: the x-sorted layout prunes NOTHING (every
    # stripe spans all y); z-order still bounds it
    assert layout.touched_partitions(el, 0, 63, 0, 7) == 16
    assert layout.touched_partitions(ez, 0, 63, 0, 7) <= 8

    # layout is a permutation, not a filter
    assert zdf.count() == n * n


def _xy2d_ref(n_bits, x, y):
    """Classic public-domain Hilbert xy2d walk (Wikipedia)."""
    d = 0
    s = 1 << (n_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_walk(spark):
    import random

    rng = random.Random(71)
    pts = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(300)]
    pts += [(0, 0), (1023, 1023), (0, 1023), (1023, 0), (512, 511)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.hval
        for r in layout.hilbert_df(df, "x", "y", bits=10).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(10, x, y)


def test_hilbert_is_bijective_and_adjacent(spark):
    # full 16x16 grid: d must be a permutation of 0..255 and every
    # consecutive pair of d values must be GRID-adjacent (the locality
    # property z-order lacks)
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = layout.hilbert_df(df, "x", "y", bits=4).collect()
    by_d = {r.hval: (r.x, r.y) for r in rows}
    assert sorted(by_d) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_wide_bits_no_overflow(spark):
    """r5 review: F.lit(s)*F.lit(s) multiplied two 32-bit literals, so
    bits >= 17 overflowed (ANSI raise, or silent wrong hvals) while the
    DuckDB twin's ::BIGINT product stayed exact. The full documented
    range (bits <= 26) must match the reference walk."""
    import random

    rng = random.Random(72)
    n = 1 << 26
    pts = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    pts += [(n - 1, n - 1), (0, n - 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.hval
        for r in layout.hilbert_df(df, "x", "y", bits=26).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(26, x, y)
