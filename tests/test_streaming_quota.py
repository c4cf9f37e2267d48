"""Stateful streaming politeness (applyInPandasWithState): per-host
token bucket carried ACROSS micro-batches via the streaming checkpoint
— the streaming twin of the batch round budget (W1/J6)."""

import datetime

import pandas as pd

from netrunner_spark.streaming.ingest import CANDIDATE_SCHEMA, run_quota_once


def _write_batch(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["url", "discovered_at", "depth"])
    spark.createDataFrame(pdf, schema=CANDIDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stateful_quota_across_batches(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # burst = 2 tokens, rps = 1: six same-second arrivals → only the
    # first 2 admitted in batch one
    _write_batch(
        spark,
        in_dir,
        [(f"https://q.test/a{i}", t0, 0) for i in range(6)],
    )
    run_quota_once(spark, in_dir, out_dir, ckpt, rps=1.0, burst=2.0)
    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == 6
    assert int(got["admitted"].sum()) == 2

    # batch two, 3 seconds later: bucket refilled by 3·rps but capped at
    # burst=2 → exactly 2 more admitted. State carried via checkpoint.
    t1 = t0 + datetime.timedelta(seconds=3)
    _write_batch(
        spark,
        in_dir,
        [(f"https://q.test/b{i}", t1, 0) for i in range(5)],
    )
    run_quota_once(spark, in_dir, out_dir, ckpt, rps=1.0, burst=2.0)
    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == 11
    b_rows = got[got["url"].str.contains("/b")]
    assert int(b_rows["admitted"].sum()) == 2

    # independent hosts have independent buckets
    _write_batch(
        spark,
        in_dir,
        [(f"https://other.test/c{i}", t1, 0) for i in range(3)],
    )
    run_quota_once(spark, in_dir, out_dir, ckpt, rps=1.0, burst=2.0)
    got = spark.read.parquet(out_dir).toPandas()
    c_rows = got[got["url"].str.contains("other.test")]
    assert int(c_rows["admitted"].sum()) == 2  # fresh bucket: burst=2
