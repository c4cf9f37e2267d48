"""validate: archive vs expected URL set (reference §3.3,
validator.rs:10-84) + the image+caption invariants from input_hint.

Two DataFrames + anti-join + conditional aggregates; plus — when the
caller supplies the crawled payload copies — the input_hint's per-row
invariants vs the reference image table: decoded-pixel PSNR ≥ 40 dB
for lossy formats / exact pixels for lossless (``crawled_images``),
and caption equality between the cached content and the reference
caption (``check_captions``, for pair-store worlds where the cache
payload IS the caption).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netrunner_spark.images import decode_check_udf, psnr_udf
from netrunner_spark.operators.dedup import missing_urls, validation_tallies

PSNR_LOSSY_MIN_DB = 40.0


@dataclass
class ValidationResult:
    ok: bool
    n_records: int = 0
    empty_headers: int = 0
    empty_content: int = 0
    n_missing: int = 0
    image_failures: int = 0
    caption_mismatches: int = 0
    psnr_failures: int = 0
    errors: list[str] = field(default_factory=list)


def validate_crawl(
    cache: DataFrame,
    expected_urls: DataFrame,
    images: DataFrame | None = None,
    crawled_images: DataFrame | None = None,
    check_captions: bool = False,
) -> ValidationResult:
    """cache: fetched records; expected_urls(url): the urls.txt set.

    ``images``: reference image table (input_hint schema) — enables the
    decode/shape/phash self-checks. ``crawled_images``: the crawl's own
    cached payload copies (image_id, bytes) — enables the per-row
    PSNR-vs-reference invariant (≥ 40 dB lossy, exact lossless).
    ``check_captions``: compare cache content to the reference caption
    per image_id (pair-store worlds only — an HTML-page world's content
    is a page, not a caption).
    """
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

    caption_mismatches = 0
    if check_captions and images is not None:
        # per-row caption equality vs the reference table (input_hint).
        # A ref whose image is missing from the reference counts as a
        # mismatch (left join ⇒ NULL caption ≠ content).
        refs = ok_rows.filter(F.col("image_id").isNotNull()).select(
            "image_id", "content"
        )
        caption_mismatches = (
            refs.join(images.select("image_id", "caption"), "image_id", "left")
            .filter(~F.col("content").eqNullSafe(F.col("caption")))
            .count()
        )
        if caption_mismatches:
            errors.append(
                f"{caption_mismatches} cached rows whose content != reference caption"
            )

    psnr_failures = 0
    if crawled_images is not None and images is not None:
        # decoded-pixel invariant vs the reference copy: lossless must be
        # bit-exact (infinite PSNR — identical pixels), lossy ≥ 40 dB.
        # NULL psnr = either side failed to decode ⇒ failure. Inner join:
        # refs absent from the reference table are already counted by the
        # decode/shape/phash pass above.
        ref = images.select(
            "image_id", F.col("bytes").alias("_ref_bytes"), "fmt"
        )
        pairs = crawled_images.select("image_id", "bytes").join(ref, "image_id")
        scored = pairs.withColumn(
            "p", psnr_udf(F.col("bytes"), F.col("_ref_bytes"))
        )
        psnr_failures = scored.filter(
            F.col("p").isNull()
            | ((F.col("fmt") == "png") & (F.col("p") < F.lit(float("inf"))))
            | ((F.col("fmt") != "png") & (F.col("p") < F.lit(PSNR_LOSSY_MIN_DB)))
        ).count()
        if psnr_failures:
            errors.append(
                f"{psnr_failures} crawled images failed the PSNR-vs-reference invariant"
            )

    return ValidationResult(
        ok=not errors,
        n_records=tallies["n_records"],
        empty_headers=tallies["empty_headers"],
        empty_content=tallies["empty_content"],
        n_missing=missing,
        image_failures=image_failures,
        caption_mismatches=caption_mismatches,
        psnr_failures=psnr_failures,
        errors=errors,
    )
