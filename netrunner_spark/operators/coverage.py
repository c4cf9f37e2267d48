"""Seed-coverage re-queue (F14/J5/A4, bootstrap.rs:106-129).

After sitemap discovery: for each non-exact seed prefix, count frontier
URLs starting with that prefix; prefixes with ≤1 hit go to the CDX
queue for a second discovery pass.

Spark shape: a prefix theta-join. Naive ``url LIKE prefix%`` against
10^10 frontier rows is a broadcast-nested-loop — fine because the seed
side is tiny (broadcast), and the filter evaluates JVM-side with
``startswith``. The groupBy then counts per prefix. To avoid scanning
the frontier per-prefix at extreme scale, an equi-join on host first
restricts candidates, then the startswith filter runs within matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netrunner_spark.urlnorm import host_udf


def coverage_counts(frontier: DataFrame, prefixes: DataFrame) -> DataFrame:
    """frontier(url, host) × prefixes(prefix) → (prefix, n_hits).

    Prefixes gain a host column so the theta-join becomes
    (host equi-join) + startswith residual — shuffle-free on the
    frontier side when prefixes are broadcast.
    """
    # broadcast INNER join for the hits, then left-join the tiny
    # per-prefix counts back to preserve zero-hit prefixes (r5 review:
    # Spark cannot build-side-broadcast the PRESERVED side of an outer
    # join — the old right-outer silently ignored the hint and sort-
    # merge-shuffled the whole frontier; fetcher.fetch documents the
    # identical pitfall and uses this same shape)
    p = prefixes.withColumn("p_host", host_udf(F.col("prefix")))
    hits = (
        frontier.join(
            F.broadcast(p),
            (F.col("host") == F.col("p_host"))
            & F.col("url").startswith(F.col("prefix")),
            "inner",
        )
        .groupBy("prefix")
        .agg(F.count(F.col("url")).alias("n_hits"))
    )
    # hits is the BUILD (non-preserved) side here, so this broadcast is
    # honored — both sides are O(#prefixes), never frontier-sized
    return p.select("prefix").join(F.broadcast(hits), "prefix", "left").select(
        "prefix", F.coalesce("n_hits", F.lit(0)).alias("n_hits")
    )


def underseeded(frontier: DataFrame, prefixes: DataFrame, threshold: int = 1) -> DataFrame:
    """Prefixes needing the CDX second pass (count ≤ threshold)."""
    return coverage_counts(frontier, prefixes).filter(
        F.col("n_hits") <= threshold
    ).select("prefix")
