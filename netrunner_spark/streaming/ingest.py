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
