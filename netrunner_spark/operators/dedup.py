"""Archive-side dedup + validation aggregates.

F9 canonical dedup (archive.rs:284-295,383-390): first page per
canonical URL wins. The reference's "first" is file-scan order; our
pinned deterministic tiebreak is min(url) then min(url_hash) — matching
the reference's set semantics (uniqueness assert archive.rs:308-323)
with a reproducible winner.

A2/A3 validation tallies: validator.rs:32-73.
J2 expected − found: validator.rs:67-73.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_dedup(parsed: DataFrame, tiebreak: list[str] = ("url",)) -> DataFrame:
    """Keep one row per canonical_url (F9).

    A NULL canonical (possible only via the archive RON source — the
    parser always falls back to the page URL) means "no canonical
    declared": the row groups by its OWN url, so NULL pages are never
    collapsed into one arbitrary survivor (r5 review)."""
    key = F.coalesce(F.col("canonical_url"), F.col("url"))
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in tiebreak])
    return (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_count(parsed: DataFrame) -> int:
    """A2: pages dropped by canonical dedup — the SAME grouping key as
    ``canonical_dedup`` (countDistinct skips NULLs, so the raw column
    under-counted groups by the NULL slot and the tally disagreed with
    what the dedup actually drops)."""
    row = parsed.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(F.coalesce(F.col("canonical_url"), F.col("url")))
        ).alias("dupes")
    ).collect()[0]
    return row["dupes"]


def validation_tallies(records: DataFrame) -> DataFrame:
    """A3: zero-length header / zero-length content counts (one row)."""
    return records.agg(
        F.sum(F.when(F.size("headers") == 0, 1).otherwise(0)).alias("empty_headers"),
        F.sum(F.when(F.length("content") == 0, 1).otherwise(0)).alias("empty_content"),
        F.count(F.lit(1)).alias("n_records"),
    )


def missing_urls(expected: DataFrame, found: DataFrame) -> DataFrame:
    """J2: expected(url) − found(url) via left_anti."""
    return expected.select("url").join(found.select("url"), "url", "left_anti")
