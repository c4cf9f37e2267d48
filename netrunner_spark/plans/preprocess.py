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


def scrub_parsed(parsed: DataFrame, content_col: str = "content") -> DataFrame:
    """PII-scrub the parsed archive before it is written/exported: the
    page body is replaced by its redacted form (ordered
    ``PII_PATTERNS`` chain — same column definition the ``pii_scrub``
    driver query hashes, so the stored body and the audited hash can
    never diverge) and the row is annotated with ``n_pii``, the match
    count in the ORIGINAL body.

    The count is attached via ``observe`` too (``scrub`` /
    ``n_pii_total``) so the pipeline's metrics come from the same
    single pass that writes the data — no second scan. Map-only:
    regex projections, zero shuffles (pinned by
    tests/test_plan_shape.py's scrub-family test for the operator
    core).
    """
    from netrunner_spark.operators.textops import pii_count, scrubbed_text

    return parsed.withColumn("n_pii", pii_count(content_col)).observe(
        "scrub", F.sum("n_pii").alias("n_pii_total")
    ).withColumn(content_col, scrubbed_text(content_col))
