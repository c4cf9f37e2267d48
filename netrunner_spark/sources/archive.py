"""Parsed-page archive: writer (K4) + reader (S11) + folder crawl (S12).

Reference: parsed.gz is one serialized ParseResult per line, RON or
JSON sniffed by filename (``.jsonl.gz`` → JSON, else RON —
parser/mod.rs:41-45). Our system of record is the ``parsed`` lake
table; the line archives are interchange formats: JSON is Spark-native
both ways (json codec=gzip / read.json); the RON variant reuses the
RON-lite parser from ``lens.py`` inside an Arrow-batched mapInPandas
(one task per .gz file — the file is the parallelism unit, exactly
like the reference's per-file iterator).

Folder crawl (archive.rs:33-49, main.rs:174-213): every file under a
directory becomes one record with URL ``<base_url>/<stem>`` — a
binaryFile scan + projection, no Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


PARSED_SCHEMA = T.StructType(
    [
        T.StructField("canonical_url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def parsed_read(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    """S11: parsed archive → DataFrame. ``fmt``: 'json' | 'ron' |
    'auto' (the reference's filename sniff, parser/mod.rs:41-45:
    ``.jsonl`` in the name → JSON, otherwise RON)."""
    if fmt == "auto":
        import os

        name = path.rstrip("/").rsplit("/", 1)[-1]
        if os.path.isdir(path):
            # a DIRECTORY (e.g. parsed_export_ron output) carries no
            # format hint in its own name - sniff the part files, or a
            # RON dir is misread as JSON into all-corrupt rows (r5
            # review)
            parts = [
                e.name
                for e in os.scandir(path)
                if e.is_file() and not e.name.startswith(("_", "."))
            ]
            name = parts[0] if parts else name
        fmt = "json" if ".jsonl" in name or not name.endswith(".gz") else "ron"
    if fmt == "json":
        return spark.read.json(path)
    return parsed_read_ron(spark, path)


def parsed_read_ron(spark: SparkSession, path: str) -> DataFrame:
    """RON-line .gz archive → DataFrame (parser/mod.rs:62-105 parity;
    fixture shape from parser/mod.rs:170-184). Unparsable lines are
    skipped, matching the reference iterator's silent-None behavior."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        from netrunner_spark.lens import _RonParser, _tokenize

        cols = [f.name for f in PARSED_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for line in data.decode("utf-8", errors="replace").splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        obj = _RonParser(_tokenize(line)).value()
                    except (ValueError, AssertionError, IndexError):
                        continue  # reference iterator drops bad lines
                    if not isinstance(obj, dict):
                        continue
                    rows.append(
                        {
                            "canonical_url": obj.get("canonical_url"),
                            "title": obj.get("title"),
                            "description": obj.get("description"),
                            "content": obj.get("content"),
                            "content_hash": obj.get("content_hash"),
                            "meta": obj.get("meta") or {},
                            "links": sorted(obj.get("links") or []),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(parse, PARSED_SCHEMA)


def _ron_str(s) -> str:
    import json

    return json.dumps(s if s is not None else "")


def ron_line(row: dict) -> str:
    """One ParseResult as a RON line — serde field order
    (canonical_url, content, content_hash, description, meta, title;
    links are #[serde(skip)], parser/mod.rs:22-24)."""
    opt = lambda v: "None" if v is None else f"Some({_ron_str(v)})"  # noqa: E731
    meta = row.get("meta") or {}
    meta_s = ",".join(
        f"{_ron_str(k)}:{_ron_str(v)}" for k, v in sorted(meta.items())
    )
    return (
        f"(canonical_url:{opt(row.get('canonical_url'))},"
        f"content:{_ron_str(row.get('content'))},"
        f"content_hash:{_ron_str(row.get('content_hash'))},"
        f"description:{_ron_str(row.get('description'))},"
        f"meta:{{{meta_s}}},"
        f"title:{opt(row.get('title'))})"
    )


def parsed_export_ron(parsed: DataFrame, path: str) -> None:
    """K4 RON variant: one RON line per record, gzip'd text files."""

    def to_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"value": [ron_line(r) for r in pdf.to_dict("records")]}
            )

    lines = parsed.select(*PARSED_COLS).mapInPandas(
        to_lines, "value string"
    )
    lines.write.mode("overwrite").option("compression", "gzip").text(path)


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
