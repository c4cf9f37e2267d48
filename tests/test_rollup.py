"""RollupTable (incremental continuous aggregate): multi-append
equality with the direct GROUP BY, bucket-range pruning, and resume
from persisted config."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.rollup import RollupTable
from netrunner_spark.tables import LakeCatalog


@pytest.fixture()
def events(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=17 * i), ["view", "click"][i % 2], i * 1.07)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _direct(events):
    vq = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
                "bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(vq).alias("sum_q"),
            F.min(vq).alias("min_q"),
            F.max(vq).alias("max_q"),
        )
    )


def test_rollup_three_slices_equal_direct(spark, events, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    ru = RollupTable(cat, "r3")
    ru.build(events.filter("event_id % 3 = 0"))
    ru.append(events.filter("event_id % 3 = 1"))
    ru.append(events.filter("event_id % 3 = 2"))
    got = sorted(map(tuple, ru.read().collect()))
    want = sorted(map(tuple, _direct(events).collect()))
    assert got == want  # bit-for-bit, integer-cent partials


def test_rollup_range_read_prunes(spark, events, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    ru = RollupTable(cat, "rr")
    ru.build(events)
    all_buckets = sorted(r["bucket"] for r in ru.read().select("bucket").distinct().collect())
    lo, hi = all_buckets[1], all_buckets[-1]
    got = ru.read(bucket_lo=lo, bucket_hi=hi)
    bs = {r["bucket"] for r in got.collect()}
    assert bs == set(b for b in all_buckets if lo <= b < hi)


def test_rollup_resume_uses_persisted_config(spark, events, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    RollupTable(cat, "rp").build(
        events.filter("event_id < 100"), bucket_hours=2, key_cols=("event_type",)
    )
    # a NEW instance (fresh session state) appends with the stored
    # 2-hour bucket config — not the 1-hour default
    ru2 = RollupTable(cat, "rp")
    ru2.append(events.filter("event_id >= 100"))
    got = ru2.read()
    vq = F.round(F.col("value") * 100).cast("long")
    want = (
        events.groupBy(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 7200000000"
            ).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(vq).alias("sum_q"),
            F.min(vq).alias("min_q"),
            F.max(vq).alias("max_q"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
