"""Spark-side parse stage: html_to_text as an Arrow-batched pandas UDF.

The parse is THE heavy per-row transform (X2); it runs batch-wise via
``pandas_udf`` returning a struct column — one Python worker call per
Arrow batch, never per-row Python in the plan. Downstream consumers
explode ``links`` to feed the next frontier round (§2.9 UDTF-like).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from netrunner_spark.parser.html import html_to_text

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("canonical_url", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("title", T.StringType()),
    ]
)


def _parse_batch(urls: pd.Series, docs: pd.Series) -> pd.DataFrame:
    rows = []
    for url, doc in zip(urls, docs):
        if not isinstance(doc, str) or not isinstance(url, str):
            rows.append(
                {
                    "canonical_url": url,
                    "content": "",
                    "content_hash": None,
                    "description": "",
                    "links": [],
                    "meta": {},
                    "title": None,
                }
            )
            continue
        try:
            rows.append(html_to_text(url, doc).as_row())
        except RecursionError:
            # a pathologically nested page (1000+ levels) blows the
            # recursive DOM walk (r5 review); one wild page must not
            # fail the task — degrade to an empty parse for THAT row
            # (hash of empty content, no links) and keep the batch
            rows.append(
                {
                    "canonical_url": url,
                    "content": "",
                    "content_hash": None,
                    "description": "",
                    "links": [],
                    "meta": {},
                    "title": None,
                }
            )
    return pd.DataFrame(rows)


@pandas_udf(PARSE_SCHEMA)
def parse_html_udf(urls: pd.Series, docs: pd.Series) -> pd.DataFrame:
    return _parse_batch(urls, docs)


def make_parse_udf(fallback_counter=None):
    """Parse UDF wired to a Spark accumulator counting docs that hit
    the stdlib-fallback path — the fast tokenizer's escape hatch is
    silent per-row, so the drain surfaces its rate (archive_stage
    'parse_fallbacks'); a drift toward fallback-heavy HTML shows up in
    stats instead of as an unexplained slowdown."""

    @pandas_udf(PARSE_SCHEMA)
    def udf(urls: pd.Series, docs: pd.Series) -> pd.DataFrame:
        from netrunner_spark.parser import html as H

        before = H.FALLBACK_COUNT
        out = _parse_batch(urls, docs)
        if fallback_counter is not None:
            delta = H.FALLBACK_COUNT - before
            if delta:
                fallback_counter.add(delta)
        return out

    return udf


def parse_pages(
    fetched: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
    fallback_counter=None,
) -> DataFrame:
    """fetched(url, content, ...) → one parsed row per page.

    Only 2xx rows should be fed here (F6 filter applied by caller, as in
    create_archives, archive.rs:378).
    """
    udf = (
        parse_html_udf
        if fallback_counter is None
        else make_parse_udf(fallback_counter)
    )
    return fetched.withColumn(
        "parsed", udf(F.col(url_col), F.col(content_col))
    ).select(
        F.col(url_col).alias("url"),
        F.col("parsed.canonical_url").alias("canonical_url"),
        F.col("parsed.title").alias("title"),
        F.col("parsed.description").alias("description"),
        F.col("parsed.content").alias("content"),
        F.col("parsed.content_hash").alias("content_hash"),
        F.col("parsed.meta").alias("meta"),
        F.col("parsed.links").alias("links"),
    )
