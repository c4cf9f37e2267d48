"""Parsed-page archive: writer (K4) + reader (S11) + folder crawl (S12).

Reference: parsed.gz is one serialized ParseResult per line, RON or
JSON by filename (parser/mod.rs:36-105, archive.rs:356-403). Our system
of record is the ``parsed`` lake table; the .jsonl.gz artifact is an
interchange export — Spark-native both ways (json codec=gzip / read.json).

Folder crawl (archive.rs:33-49, main.rs:174-213): every file under a
directory becomes one record with URL ``<base_url>/<stem>`` — a
binaryFile scan + projection, no Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_COLS = [
    "canonical_url",
    "title",
    "description",
    "content",
    "content_hash",
    "meta",
    "links",
]


def parsed_export(parsed: DataFrame, path: str) -> None:
    """K4: parsed rows → .jsonl.gz lines (canonical-dedup is the
    caller's concern, operators.dedup.canonical_dedup)."""
    parsed.select(*PARSED_COLS).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(path)


def parsed_read(spark: SparkSession, path: str) -> DataFrame:
    """S11: JSONL(.gz) parsed archive → DataFrame (native reader; RON
    variant intentionally unsupported — JSON is the interchange format,
    documented divergence from parser/mod.rs:41-45)."""
    return spark.read.json(path)


def crawl_folder(spark: SparkSession, directory: str, base_url: str) -> DataFrame:
    """S12: one file → one ArchiveRecord-shaped row with status 200."""
    files = spark.read.format("binaryFile").load(directory)
    stem = F.regexp_extract(
        F.reverse(F.split(F.col("path"), "/")).getItem(0), r"^(.*?)(\.[^.]*)?$", 1
    )
    return files.select(
        F.concat(F.lit(base_url.rstrip("/") + "/"), stem).alias("url"),
        F.lit(200).alias("status"),
        F.array().cast("array<struct<name:string,value:string>>").alias("headers"),
        F.col("content").cast("string").alias("content"),
    )
