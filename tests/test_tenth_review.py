"""Regressions for the tenth review batch (streaming quota payload
fidelity + requeue anchoring + pre-quota lens; graph degenerate
args)."""

import datetime

import pandas as pd

from netrunner_spark.lens import LensConfig, LensRule
from netrunner_spark.streaming.ingest import (
    CANDIDATE_SCHEMA,
    handoff_admitted,
    run_quota_once,
)


def _write_batch(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["url", "discovered_at", "depth"])
    spark.createDataFrame(pdf, schema=CANDIDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_quota_output_keeps_null_timestamp(spark, tmp_path):
    """The NaT→epoch-0 fill must stay INTERNAL to the bucket math —
    the output row keeps its original null (old bug: 1970-01-01 was
    persisted and poisoned the requeue window)."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    _write_batch(
        spark,
        in_dir,
        [
            ("https://n.test/real", t0, 0),
            ("https://n.test/timeless", None, 0),
        ],
    )
    run_quota_once(spark, in_dir, out_dir, ckpt, rps=1.0, burst=2.0)
    got = {r["url"]: r["discovered_at"] for r in spark.read.parquet(out_dir).collect()}
    assert got["https://n.test/timeless"] is None
    assert got["https://n.test/real"] is not None


class _StubJob:
    def __init__(self):
        self.enqueued = []

    def enqueue_frontier(self, links):
        self.enqueued.append(links.count())


def test_requeue_anchored_to_full_batch_host_max(spark, tmp_path):
    """Deferred rows must be restamped AFTER the host's batch max
    (which set the quota's last_ts), not after the deferred subset's
    own lagging max — otherwise no tokens accrue on replay and the
    rows churn (livelock in the null→epoch-0 case)."""
    out_dir = str(tmp_path / "qout")
    requeue = str(tmp_path / "requeue")
    late = datetime.datetime(2026, 6, 1, 12, 0, 0)
    early = datetime.datetime(2026, 6, 1, 0, 0, 0)
    rows = [
        # the admitted row carries the LATE timestamp that advanced
        # the quota's last_ts; the deferred rows are earlier
        ("https://r.test/adm", 1, "r.test", 0, late, True),
        ("https://r.test/d1", 2, "r.test", 0, early, False),
        ("https://r.test/d2", 3, "r.test", 0, None, False),
    ]
    from netrunner_spark.streaming.ingest import QUOTA_OUT_SCHEMA

    spark.createDataFrame(rows, QUOTA_OUT_SCHEMA).coalesce(1).write.parquet(out_dir)
    job = _StubJob()
    stats = handoff_admitted(
        spark, out_dir, job, requeue_input_dir=requeue, rps=2.0
    )
    assert stats == {"admitted": 1, "deferred": 2, "files": 0}
    req = spark.read.parquet(requeue).collect()
    assert len(req) == 2
    for r in req:
        assert r["discovered_at"] > late  # strictly past last_ts


def test_lens_filters_before_quota(spark, tmp_path):
    """Out-of-scope URLs must not drain a host's politeness tokens:
    with burst=2 and 4 junk + 2 in-scope same-second candidates, both
    in-scope rows are admitted (old order: junk consumed the bucket
    and the real URLs deferred)."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    t0 = datetime.datetime(2026, 1, 2, 0, 0, 0)
    lens = LensConfig(
        name="scope",
        domains=["l.test"],
        rules=[LensRule(kind="skip", pattern="https://l.test/junk/*")],
    )
    _write_batch(
        spark,
        in_dir,
        [(f"https://l.test/junk/{i}", t0, 0) for i in range(4)]
        + [("https://l.test/ok/1", t0, 0), ("https://l.test/ok/2", t0, 0)],
    )
    run_quota_once(spark, in_dir, out_dir, ckpt, rps=1.0, burst=2.0, lens=lens)
    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == 2  # junk never reached the bucket
    assert int(got["admitted"].sum()) == 2


def test_hits_zero_iters_returns_initial_state(spark):
    from netrunner_spark.operators.graph import hits_int

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["id"]: (r["hub_e9"], r["auth_e9"]) for r in hits_int(edges, iters=0).collect()}
    assert len(got) == 3
    assert len({v for v in got.values()}) == 1  # uniform initial scores
