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
