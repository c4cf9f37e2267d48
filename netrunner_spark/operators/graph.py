"""Link-graph operators: deterministic fixed-point PageRank.

Crawl frontiers prioritize by authority; the reference's priority is
depth + host-budget (`crawler.rs` scheduling), and PageRank over the
discovered link graph is the standard next signal a crawler feeds its
priority queue. Implemented Spark-first as iterated DataFrame joins —
the shape GraphX/Pregel compiles to anyway, minus the RDD detour.

Arithmetic is INTEGER fixed-point (rank ≈ probability × `scale`,
`div` = floor division), deliberately:

1. **Bit-identical re-runs.** Float PageRank depends on the summation
   order a shuffle happens to produce; integer sums are exact and
   orderless, so a resume, an AQE re-plan, or a 4N-executor re-shard
   reproduces the same ranks bit-for-bit — the same determinism
   contract the frontier scheduler guarantees (BASELINE north_rule:
   "resumes bit-identically").
2. **Oracle-checkable.** The DuckDB twin runs the identical integer
   recurrence and must match EXACTLY — no float tolerance windows.

Floor division leaks < 1 rank-unit (10^-12 of total mass) per node
per iteration — ranks are a hair conservative, ordering is unaffected
at any practical scale.

Scale audit: per iteration = one join edges⋈ranks on src (edges can be
pre-bucketed by src; ranks is |V| rows), one groupBy dst, one
broadcast of a single dangling-mass row. Lineage is cut per iteration
with an eager localCheckpoint so the DAG stays O(1)-deep, mirroring
`connected_components` (textops.py:395).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` (long ids) →
    ``(id, rank_e12)`` where rank_e12 ≈ stationary probability × scale.

    damping_pct is an integer percent (85 = the classic 0.85) so the
    damping step stays in exact integer arithmetic. Dangling mass
    (nodes with no out-edges) is redistributed uniformly each
    iteration, per the standard formulation.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(nodes.columns[0]).alias("id")))
    ids = ids.dropDuplicates().localCheckpoint(eager=True)
    n = ids.count()  # single-row scalar, bounded (node count)
    if n == 0:
        return ids.withColumn("rank_e12", F.lit(0).cast("long"))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = ((100 - damping_pct) * scale) // (100 * n)

    ranks = ids.withColumn("rank_e12", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        # per-source share once (not per-edge): rank div outdeg
        src_share = ranks.join(outdeg, ranks.id == outdeg.src).select(
            F.col("src"), F.expr("rank_e12 div outdeg").alias("share")
        )
        contrib = (
            e.join(src_share, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        # dangling mass: ranks of nodes with no out-edges, one row
        dang = (
            ranks.join(outdeg, ranks.id == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank_e12"), F.lit(0)).alias("dang"))
        )
        ranks = (
            ids.join(contrib, ids.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0L)"
                        f" + (dang div {n}))) div 100"
                    )
                ).alias("rank_e12"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
