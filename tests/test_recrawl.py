"""recrawl_priority: freshness-driven change-rate estimation — hand
checks of the integer estimator and its scheduling semantics."""

from datetime import datetime

from netrunner_spark.operators.politeness import recrawl_priority


def _log(spark, rows):
    return spark.createDataFrame(rows, "url_hash long, ts timestamp, changed boolean")


def test_recrawl_hand_computed(spark):
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # url 1: changes every observation → short period, crawled
        # at the horizon → age 0
        (1, t(0), False),
        (1, t(10), True),
        (1, t(20), True),
        # url 2: never changes, last seen at t=10 → age 10s,
        # period = full span (deprioritized)
        (2, t(0), False),
        (2, t(10), False),
    ]
    got = {r["url_hash"]: r for r in recrawl_priority(_log(spark, rows)).collect()}
    u1, u2 = got[1], got[2]
    assert (u1["n_obs"], u1["n_changes"]) == (3, 2)
    assert u1["period_us"] == 10_000_000  # 20 s span / 2 changes
    assert u1["age_us"] == 0  # last obs IS the horizon
    assert u1["priority_q"] == 0
    assert u2["period_us"] == 10_000_000  # span/max(0,1)=span
    assert u2["age_us"] == 10_000_000
    # one full period stale → ≈1000 (off-by-one from the +1 guard)
    assert u2["priority_q"] == (10_000_000 * 1000) // (10_000_000 + 1)


def test_recrawl_staleness_ordering(spark):
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # fast-changing page, somewhat stale → highest urgency
        (1, t(0), False),
        (1, t(2), True),
        (1, t(4), True),
        # slow page, equally stale in wall-clock → lower urgency
        (2, t(0), False),
        (2, t(4), True),
        # clock anchor
        (3, t(30), False),
    ]
    got = {r["url_hash"]: r["priority_q"] for r in recrawl_priority(_log(spark, rows)).collect()}
    assert got[1] > got[2] > got[3]


def test_recrawl_single_observation(spark):
    # one observation: span 0 → period 0 → priority = age*1000 div 1
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t(0), False), (2, t(5), False)]
    got = {r["url_hash"]: r for r in recrawl_priority(_log(spark, rows)).collect()}
    assert got[1]["period_us"] == 0
    assert got[1]["priority_q"] == got[1]["age_us"] * 1000
