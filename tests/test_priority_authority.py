"""with_priority's optional authority boost (PageRank → frontier
priority): authoritative hosts drain earlier within a depth tier,
never across tiers at weight ≤ 1; default path unchanged."""

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.politeness import with_priority


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        # (url, host, depth, url_hash)
        ("https://big.test/a", "big.test", 1, 1),
        ("https://big.test/b", "big.test", 1, 2),
        ("https://small.test/a", "small.test", 1, 3),
        ("https://deep.test/a", "deep.test", 0, 4),
        ("https://unknown.test/a", "unknown.test", 1, 5),
    ]
    return spark.createDataFrame(rows, "url string, host string, depth int, url_hash long")


def test_default_path_unchanged_without_authority(spark, frontier):
    base = {r["url"]: r["priority"] for r in with_priority(frontier).collect()}
    # north_rule formula: depth + log10(queue+1)/10
    import math

    assert base["https://small.test/a"] == pytest.approx(1 + math.log10(2) / 10)
    assert base["https://big.test/a"] == pytest.approx(1 + math.log10(3) / 10)


def test_authority_reorders_within_depth_tier(spark, frontier):
    auth = spark.createDataFrame(
        [("small.test", 10**12), ("big.test", 10**6)], "host string, rank_e12 long"
    )
    got = {r["url"]: r["priority"] for r in with_priority(frontier, auth).collect()}
    # high-authority small.test now beats big.test despite bigger queue
    assert got["https://small.test/a"] < got["https://big.test/a"]
    # unknown host (no authority row) unpenalized vs its base priority
    base = {r["url"]: r["priority"] for r in with_priority(frontier).collect()}
    assert got["https://unknown.test/a"] == pytest.approx(
        base["https://unknown.test/a"]
    )
    # bounded: a full depth level still dominates any authority boost
    assert got["https://deep.test/a"] < min(
        v for k, v in got.items() if k != "https://deep.test/a"
    )
