"""Streaming frontier ingestion: candidate URLs arrive continuously
(discovery emits files / a queue), are normalized + admitted + deduped
with a watermark, and appended to the frontier staging area.

readStream → normalize pandas UDF → admission rlike → watermark +
dropDuplicates(url_hash) → writeStream (append). State is bounded by
the watermark: a URL seen twice within the horizon dedups in-stream;
cross-horizon dedup is the batch seen-set's job (operators.seen).

windowed_host_rates: per-host tumbling-window arrival counts — the
streaming twin of the per-round metrics table (A1-analog), with
late-data handling via the same watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netrunner_spark.lens import LensConfig
from netrunner_spark.urlnorm import host_udf, normalize_url_udf

CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("discovered_at", T.TimestampType()),
        T.StructField("depth", T.IntegerType()),
    ]
)


def read_candidates(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 32)
        .parquet(input_dir)
    )


def ingest_stream(
    candidates: DataFrame,
    lens: LensConfig | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """candidate stream → admitted, normalized, in-horizon-deduped
    frontier rows (url, url_hash, host, depth, discovered_at)."""
    df = candidates.withColumn("url", normalize_url_udf(F.col("url"))).filter(
        F.col("url").isNotNull()
    )
    if lens is not None:
        allow, skip = lens.alternations()
        df = df.filter(F.col("url").rlike(allow) & ~F.col("url").rlike(skip))
    df = (
        df.withColumn("host", host_udf(F.col("url")))
        .withColumn("url_hash", F.xxhash64("url"))
        .withWatermark("discovered_at", watermark)
        .dropDuplicates(["url_hash"])
    )
    return df.select("url", "url_hash", "host", "depth", "discovered_at")


def windowed_host_rates(
    ingested: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-host arrival counts on event-time tumbling windows."""
    return (
        ingested.withWatermark("discovered_at", watermark)
        .groupBy(F.window("discovered_at", window).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_urls",
        )
    )


QUOTA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovered_at", T.TimestampType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)
QUOTA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("tokens", T.DoubleType()),
    ]
)


def stateful_host_quota(
    ingested: DataFrame, rps: float = 2.0, burst: float = 4.0
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    per-host token bucket whose fill level survives ACROSS micro-batches
    — the streaming twin of the batch round-budget (W1/J6): the
    reference awaits a governor token before each fetch
    (crawler.rs:21,80-88); here each host group carries
    (last event-time, tokens) as GroupState, replenishes by event-time
    progress (rate ``rps``, cap ``burst``), and stamps each candidate
    admitted / deferred. Rows keep their payload so deferred rows can
    re-enter a later batch.

    Scale shape: state is per HOST (bounded by host count, not URL
    count), grouped processing is Arrow-batched, and the state store
    shuffles only by host key.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def quota(key, pdfs, state: GroupState):
        if state.exists:
            last_ts, tokens = state.get
        else:
            last_ts, tokens = None, float(burst)
        out = []
        # applyInPandasWithState may deliver a host's rows split across
        # multiple Arrow chunks in arbitrary order; the token bucket is
        # order-sensitive (replenish on ts > last_ts), so concatenate and
        # sort the whole micro-batch by event time first — otherwise
        # which rows get admitted depends on the input partitioning.
        chunks = list(pdfs)
        whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(whole):
            whole = whole.sort_values(
                "discovered_at", kind="mergesort"
            )  # stable: ties keep arrival order deterministically
            for r in whole.itertuples(index=False):
                ts = r.discovered_at.timestamp()
                if last_ts is not None and ts > last_ts:
                    tokens = min(float(burst), tokens + (ts - last_ts) * rps)
                last_ts = ts if last_ts is None else max(last_ts, ts)
                ok = tokens >= 1.0
                if ok:
                    tokens -= 1.0
                out.append(
                    (r.url, r.url_hash, r.host, r.depth, r.discovered_at, ok)
                )
        state.update((last_ts, tokens))
        yield pd.DataFrame(
            out,
            columns=["url", "url_hash", "host", "depth", "discovered_at", "admitted"],
        )

    return ingested.groupBy("host").applyInPandasWithState(
        quota,
        QUOTA_OUT_SCHEMA,
        QUOTA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_quota_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    rps: float = 2.0,
    burst: float = 4.0,
) -> None:
    """AvailableNow deployment of the stateful quota: state persists in
    the streaming checkpoint, so a later invocation CONTINUES each
    host's bucket where the previous one left off."""
    # NOTE: normalize/admit only — no dropDuplicates here; chaining a
    # second stateful operator behind applyInPandasWithState is not
    # supported, and cross-batch dedup is the batch seen-set's job.
    cands = read_candidates(spark, input_dir)
    df = (
        cands.withColumn("url", normalize_url_udf(F.col("url")))
        .filter(F.col("url").isNotNull())
        .withColumn("host", host_udf(F.col("url")))
        .withColumn("url_hash", F.xxhash64("url"))
        .select("url", "url_hash", "host", "depth", "discovered_at")
    )
    out = stateful_host_quota(df, rps=rps, burst=burst)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def handoff_admitted(
    spark: SparkSession,
    quota_out_dir: str,
    job,
    lens: LensConfig | None = None,
) -> None:
    """Streaming→batch handoff (W1 stream front-end feeding the W4
    drain): read the stateful quota's output, keep the ADMITTED rows,
    and enqueue them into the CrawlJob's schedule via
    ``enqueue_frontier`` — robots + the F7 seen guard run there, so a
    candidate that was already scheduled (or re-streamed after a
    restart) is dropped exactly once, and deferred rows never reach the
    drain until a later quota pass admits them."""
    df = spark.read.parquet(quota_out_dir).filter(F.col("admitted"))
    if lens is not None:
        allow, skip = lens.alternations()
        df = df.filter(F.col("url").rlike(allow) & ~F.col("url").rlike(skip))
    links = df.select(
        "url", "url_hash", "host", F.coalesce(F.col("depth"), F.lit(0)).alias("depth")
    ).dropDuplicates(["url_hash"])
    job.enqueue_frontier(links)


def micro_batch_cycle(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    job,
    rps: float = 2.0,
    burst: float = 4.0,
    lens: LensConfig | None = None,
) -> dict:
    """One continuous-frontend cycle: pull whatever candidates have
    arrived through the stateful per-host quota (exactly-once on the
    input via the streaming checkpoint), hand the ADMITTED rows to the
    batch drain, and run the drain until the schedule is empty.

    Safe to call in a loop — each cycle's quota pass only consumes NEW
    candidate files, the handoff re-reads the full quota output but the
    drain's seen guard (F7) drops anything already scheduled, so a URL
    is fetched at most once across all cycles — and across restarts: a
    fresh CrawlJob over the same catalog resumes from the committed
    slices (W4), and the quota's token buckets resume from the streaming
    state store. Deferred rows re-enter by being re-submitted with a
    later event time (producer's retry loop), exactly like the reference
    re-queues governor-deferred URLs (crawler.rs:80-88)."""
    run_quota_once(
        spark, input_dir, output_dir, checkpoint_dir, rps=rps, burst=burst
    )
    handoff_admitted(spark, output_dir, job, lens=lens)
    return job.run()


def run_ingest_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lens: LensConfig | None = None,
) -> None:
    """Process everything currently available, exactly-once via the
    streaming checkpoint, then stop (Trigger.AvailableNow) — the
    incremental-batch deployment mode for frontier ingestion."""
    out = ingest_stream(read_candidates(spark, input_dir), lens)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
