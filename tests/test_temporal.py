"""Temporal operators (operators/temporal.py): sessionize / asof_join /
interval_join — differential-tested against brute-force references on
seeded random data."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.temporal import asof_join, interval_join, sessionize

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: gaps 10, 40 (break), 5 → sessions 1,1,2,2
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(50)),
        (4, 1, _ts(55)),
        # user 2: single event
        (5, 2, _ts(0)),
        # user 3: exactly-30-min gap is NOT a break (strict >)
        (6, 3, _ts(0)),
        (7, 3, _ts(30)),
        (8, 3, _ts(60, )),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_no"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1, 8: 1}


def test_asof_join_matches_bruteforce(spark):
    rng = random.Random(11)
    rights = [
        (u, _ts(rng.randrange(0, 500)), rng.randrange(1000))
        for u in range(8)
        for _ in range(6)
    ]
    # unique per (key, ts): keep max payload like the driver query does
    dedup = {}
    for u, ts, p in rights:
        dedup[(u, ts)] = max(dedup.get((u, ts), -1), p)
    rights = [(u, ts, p) for (u, ts), p in dedup.items()]
    lefts = [(i, rng.randrange(8), _ts(rng.randrange(0, 500))) for i in range(120)]

    l = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    r = spark.createDataFrame(rights, "user_id long, ts timestamp, payload long")
    got = {
        row["event_id"]: row["payload"]
        for row in asof_join(l, r, on="user_id", ts_col="ts").collect()
    }
    assert len(got) == 120  # left-join: every left row survives
    for eid, u, ts in lefts:
        cand = [(rts, p) for (ru, rts, p) in rights if ru == u and rts <= ts]
        want = max(cand)[1] if cand else None
        assert got[eid] == want, (eid, u, ts)


def test_interval_join_matches_bruteforce_any_width(spark):
    rng = random.Random(23)
    pts = [(i, rng.uniform(-10, 110)) for i in range(300)]
    ivs = []
    for j in range(40):
        lo = rng.uniform(-10, 100)
        ivs.append((j, lo, lo + rng.uniform(0.1, 30)))
    p = spark.createDataFrame(pts, "pid long, x double")
    iv = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    want = sorted(
        (pid, iid) for pid, x in pts for iid, lo, hi in ivs if lo <= x < hi
    )
    for width in (1.0, 7.3, 30.0, 200.0):  # correct for ANY width
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(p, iv, "x", "lo", "hi", bucket_width=width).collect()
        )
        assert got == want, width
    assert len(want) > 100  # non-vacuous


def test_interval_join_plan_is_equijoin_not_nested_loop(spark):
    p = spark.range(10).select(F.col("id").alias("pid"), (F.col("id") * 1.0).alias("x"))
    iv = spark.range(5).select(
        F.col("id").alias("iid"),
        (F.col("id") * 2.0).alias("lo"),
        (F.col("id") * 2.0 + 3.0).alias("hi"),
    )
    plan = interval_join(p, iv, "x", "lo", "hi", bucket_width=3.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_asof_join_is_single_shuffle(spark):
    # the whole point vs an inequality join: ONE exchange on the key
    l = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("event_id"),
    )
    r = spark.range(20).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        F.col("id").alias("payload"),
    )
    out = asof_join(l, r, on="k", ts_col="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "NestedLoop" not in plan


def test_interval_join_rejects_bad_width(spark):
    p = spark.range(1).select(F.col("id").alias("x"))
    with pytest.raises(ValueError):
        interval_join(p, p, "x", "x", "x", bucket_width=0)


def test_funnel_requires_strict_order(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1 converts fully: view < click < purchase
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: purchase BEFORE click -> stops at click
        (2, t(1), "view"), (2, t(3), "click"), (2, t(2), "purchase"),
        # user 3: click before view -> never enters stage 1
        (3, t(2), "view"), (3, t(1), "click"),
        # user 4: view only
        (4, t(1), "view"),
        # user 5: no view at all -> not even stage 0
        (5, t(1), "click"), (5, t(2), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    from netrunner_spark.operators.temporal import funnel

    got = {r.stage: r.n_users for r in funnel(
        ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_first_touch_anchor(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    # click at s=2 is AFTER the first view (s=1): converts even though
    # a later view (s=5) would not have; greedy first-touch is optimal
    ev = spark.createDataFrame(
        [(1, t(1), "view"), (1, t(5), "view"), (1, t(2), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    from netrunner_spark.operators.temporal import funnel

    got = {r.stage: r.n_users for r in funnel(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_retention_cohorts_offsets(spark):
    import datetime as dt

    d = lambda day, typ, u: (u, dt.datetime(2026, 1, day, 12, 0, 0), typ)
    rows = [
        d(1, "signup", 1), d(1, "view", 1), d(3, "click", 1),
        d(2, "signup", 2), d(2, "view", 2), d(3, "view", 2),
        # user 3 active BEFORE signup: day-1 activity must not count
        d(1, "view", 3), d(2, "signup", 3),
        # user 4 never signs up: absent entirely
        d(1, "view", 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    from netrunner_spark.operators.temporal import retention_cohorts

    got = {
        (str(r.cohort_day), r.offset_day): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2026-01-01", 0): 1,  # user 1 day 1
        ("2026-01-01", 2): 1,  # user 1 day 3
        ("2026-01-02", 0): 2,  # users 2 and 3 on their signup day
        ("2026-01-02", 1): 1,  # user 2 day 3
    }


def test_transition_counts_order_and_ties(spark):
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: a -> b -> b ; the two ts-tied events order by event_id
        (1, t, 10, "a"), (1, t, 11, "b"), (1, dt.datetime(2026, 1, 2), 12, "b"),
        # user 2: single event, no transition
        (2, t, 20, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    from netrunner_spark.operators.temporal import transition_counts

    got = {
        (r.src_type, r.dst_type): r.cnt for r in transition_counts(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1}


def test_funnel_differential_vs_python_reference(spark):
    """Seeded random event streams: funnel counts must equal a greedy
    per-user Python scan (first-touch, strictly-later anchors)."""
    import datetime as dt
    import random

    rng = random.Random(61)
    stages = ["view", "click", "purchase"]
    types = stages + ["error", "signup"]
    rows = []
    for u in range(40):
        for k in range(rng.randint(0, 12)):
            rows.append(
                (u, dt.datetime(2026, 1, 1) + dt.timedelta(
                    seconds=rng.randint(0, 10_000)), rng.choice(types))
            )

    def ref(evs):
        from collections import defaultdict

        by_user = defaultdict(list)
        for u, ts, t in evs:
            by_user[u].append((ts, t))
        counts = [0] * len(stages)
        for u, stream in by_user.items():
            anchor = None
            for i, stage in enumerate(stages):
                cand = [
                    ts for ts, t in stream
                    if t == stage and (anchor is None or ts > anchor)
                ]
                if not cand:
                    break
                anchor = min(cand)
                counts[i] += 1
        return {stages[i]: c for i, c in enumerate(counts) if c > 0}

    from netrunner_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {r.stage: r.n_users for r in funnel(ev, stages).collect()}
    assert got == ref(rows)


def test_daily_spikes_threshold_and_warmup(spark):
    import datetime as dt

    rows = []
    # type 'a': 10/day for 7 days, then 16 on day 8 (16*7*10 > 15*70 -> spike)
    for day in range(1, 8):
        rows += [(i, dt.datetime(2026, 1, day, 1, 0, i), "a") for i in range(10)]
    rows += [(i, dt.datetime(2026, 1, 8, 1, 0, i), "a") for i in range(16)]
    # type 'b': big day-1 volume -> zero trail days, never flags
    rows += [(i, dt.datetime(2026, 1, 1, 2, 0, i), "b") for i in range(50)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    from netrunner_spark.operators.temporal import daily_spikes

    got = {
        (str(r.day), r.event_type): (r.cnt, r.trail_days, r.spike)
        for r in daily_spikes(ev).collect()
    }
    assert got[("2026-01-08", "a")] == (16, 7, True)
    assert got[("2026-01-02", "a")][2] is False  # 1 trail day < min 3
    assert got[("2026-01-01", "b")] == (50, 0, False)
    # steady days never spike
    assert got[("2026-01-07", "a")][2] is False
