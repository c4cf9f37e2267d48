"""preprocess: existing WARC archive → parsed archive (reference
main.rs:221-232 → archive.rs:260-306 preprocess_warc_archive), plus the
single-page `parse` entry (main.rs:214-220 → X2 on one document).

Pipeline: warc_read → 2xx filter (F6) → parse UDF (X2) → canonical
dedup (F9, first-wins pinned to min(url)) → parsed table / .jsonl.gz
export. The uniqueness assert (archive.rs:308-323) is validate_parsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netrunner_spark.operators.dedup import canonical_dedup
from netrunner_spark.parser.udf import parse_pages
from netrunner_spark.sources.warc import warc_read


def preprocess_warc(spark: SparkSession, warc_path: str) -> DataFrame:
    """WARC file/dir → deduped parsed rows."""
    records = warc_read(spark, warc_path)
    ok = records.filter(F.col("status").between(200, 299))
    parsed = parse_pages(ok.select("url", "content"))
    return canonical_dedup(parsed)


def validate_parsed(parsed: DataFrame) -> bool:
    """archive.rs:308-323: every canonical_url unique."""
    dupes = (
        parsed.groupBy("canonical_url").count().filter(F.col("count") > 1).count()
    )
    return dupes == 0


def parse_one(url: str, html: str) -> dict:
    """The `parse` CLI command: one document, driver-side (X2)."""
    from netrunner_spark.parser.html import html_to_text

    return html_to_text(url, html).as_row()
