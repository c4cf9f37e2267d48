"""Multi-dimensional file layout: Z-order (Morton) clustering for
scan pruning — the lakehouse answer to "my queries filter on TWO
columns but files can only be range-sorted by one".

A 100 TB events/cache table is usually laid out by one key (time, or
url_hash). A query constraining a second dimension (user, host, size
band) then touches EVERY file: per-file min/max stats on the second
column span its whole domain. Interleaving the bits of both keys into
one Morton code and range-partitioning by it gives every file a small
RECTANGLE of the key space, so min/max pruning works on both
dimensions at once (the Delta/Iceberg `ZORDER BY` layout, built here
from plain DataFrame ops).

Everything is exact integer bit arithmetic (unrolled shift/mask terms,
whole-stage-codegen-friendly; no UDFs, no floats), so the DuckDB twin
reproduces z-values bit-for-bit.

Scale shape: `zvalue` is a map-only projection; `zorder` is ONE
repartitionByRange (a range shuffle — the same cost any sorted write
already pays) + an in-partition sort that parquet writers need anyway
for min/max tightness. Nothing is driver-side; sampling for range
bounds is Spark's own reservoir pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(a, b, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns → one long: bit i of ``a`` lands at z-bit 2i, bit i of
    ``b`` at 2i+1. Unrolled into 2·bits shift/mask terms — a single
    codegen'd projection, exact int64 (bits ≤ 31)."""
    assert 0 < bits <= 31
    ac = (F.col(a) if isinstance(a, str) else a).cast("long")
    bc = (F.col(b) if isinstance(b, str) else b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(ac, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton interleave as ANSI/DuckDB SQL (same
    unrolled terms), so oracles cannot drift from the operator."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for a z-ordered write: range-partition on the
    Morton code of (col_a, col_b) and sort within partitions by it.
    Write the result with any parquet/lake sink — each output file then
    covers a near-rectangular region of both key domains, and both
    columns' min/max footer stats become selective."""
    z = zvalue(col_a, col_b, bits).alias("_z")
    tagged = df.withColumn("_z", z)
    parted = (
        tagged.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else tagged.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")


def partition_extents(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Layout diagnostics: per-physical-partition min/max of both key
    columns → (pid, min_a, max_a, min_b, max_b, n_rows) — exactly the
    footer stats a parquet file written from that partition would
    carry. Used to PROVE pruning: count partitions whose box overlaps
    a query box, under different layouts."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.min(col_a).alias("min_a"),
            F.max(col_a).alias("max_a"),
            F.min(col_b).alias("min_b"),
            F.max(col_b).alias("max_b"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumnRenamed("_pid", "pid")
    )


def touched_partitions(
    extents: DataFrame,
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
) -> int:
    """How many files/partitions a box query must read under the
    layout described by ``extents`` (min/max overlap test — the same
    decision a reader makes from parquet footers)."""
    return (
        extents.filter(
            (F.col("max_a") >= a_lo)
            & (F.col("min_a") <= a_hi)
            & (F.col("max_b") >= b_lo)
            & (F.col("min_b") <= b_hi)
        ).count()
    )


def hilbert_df(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 10,
    out: str = "hval",
) -> DataFrame:
    """Hilbert-curve index of two non-negative integer columns (low
    ``bits`` each) → the input plus ``out``.

    Z-order's locality has seams: Morton adjacency jumps at power-of-
    two boundaries, so a rectangle can straddle distant z-ranges. The
    Hilbert curve is the locality-optimal space-filling curve (every
    curve-adjacent pair is grid-adjacent), giving measurably tighter
    file rectangles for the same range-partitioned write — Delta/
    Iceberg grew `OPTIMIZE ... HILBERT` for exactly this reason.

    The classic per-level rotate-and-accumulate walk (Wikipedia's
    `xy2d`, public domain) is sequential per row; here each level is
    ONE chained projection rewriting (x, y, d) with branch-free CASEs
    — Catalyst collapses all ``bits`` levels into a single codegen
    stage, exact int64 throughout, and :func:`hilbert_sql` emits the
    identical arithmetic as chained CTEs so the twin cannot drift.
    """
    assert 0 < bits <= 26  # d < 4^bits must fit comfortably in int64
    res = df.withColumn("_hx", F.col(col_a).cast("long")).withColumn(
        "_hy", F.col(col_b).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = (F.col("_hx").bitwiseAND(F.lit(s)) > 0).cast("long")
        ry = (F.col("_hy").bitwiseAND(F.lit(s)) > 0).cast("long")
        # (3*rx) XOR ry spelled as a CASE so both engines share text
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when((rx == 0) & (ry == 1), 1)
            .when((rx == 1) & (ry == 1), 2)
            .otherwise(3)
        )
        # s*s computed in PYTHON and emitted as one long literal: two
        # IntegerType lits multiply in 32-bit, so bits >= 17 overflowed
        # (ANSI raise / silent wrap) while the DuckDB twin's ::BIGINT
        # product was exact (r5 review, reproduced at bits=17)
        res = res.withColumn(out, F.col(out) + F.lit(s * s).cast("long") * quad)
        nx = (
            F.when(ry == 1, F.col("_hx"))
            .when(rx == 1, F.lit(s) - 1 - F.col("_hy"))
            .otherwise(F.col("_hy"))
        )
        ny = (
            F.when(ry == 1, F.col("_hy"))
            .when(rx == 1, F.lit(s) - 1 - F.col("_hx"))
            .otherwise(F.col("_hx"))
        )
        res = res.withColumn("_nx", nx).withColumn("_ny", ny).withColumn(
            "_hx", F.col("_nx")
        ).withColumn("_hy", F.col("_ny")).drop("_nx", "_ny")
    return res.drop("_hx", "_hy")


def hilbert_sql(a: str, b: str, bits: int = 10, src: str = "k") -> str:
    """DuckDB twin of :func:`hilbert_df`: the identical per-level
    rewrite as chained CTEs over source ``src`` (which must provide
    ``{a}``, ``{b}`` and any passthrough columns). Returns the chain
    ending in CTE ``hN`` with column ``hval``; callers SELECT from it."""
    parts = [
        f", h{bits} AS (SELECT *, CAST({a} AS BIGINT) AS _hx,"
        f" CAST({b} AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS hval FROM {src})"
    ]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        prev = f"h{level + 1}"
        parts.append(
            f""", h{level} AS (
  SELECT * EXCLUDE (_hx, _hy, hval),
         CASE WHEN (_hy & {s}) > 0 THEN _hx
              WHEN (_hx & {s}) > 0 THEN {s} - 1 - _hy
              ELSE _hy END AS _hx,
         CASE WHEN (_hy & {s}) > 0 THEN _hy
              WHEN (_hx & {s}) > 0 THEN {s} - 1 - _hx
              ELSE _hx END AS _hy,
         hval + {s}::BIGINT * {s} * (
           CASE WHEN (_hx & {s}) = 0 AND (_hy & {s}) = 0 THEN 0
                WHEN (_hx & {s}) = 0 THEN 1
                WHEN (_hy & {s}) > 0 THEN 2
                ELSE 3 END) AS hval
  FROM {prev}
)"""
        )
    return "".join(parts)
