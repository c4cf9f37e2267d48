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


@pandas_udf(PARSE_SCHEMA)
def parse_html_udf(urls: pd.Series, docs: pd.Series) -> pd.DataFrame:
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
        rows.append(html_to_text(url, doc).as_row())
    return pd.DataFrame(rows)


def parse_pages(fetched: DataFrame, url_col: str = "url", content_col: str = "content") -> DataFrame:
    """fetched(url, content, ...) → one parsed row per page.

    Only 2xx rows should be fed here (F6 filter applied by caller, as in
    create_archives, archive.rs:378).
    """
    return fetched.withColumn(
        "parsed", parse_html_udf(F.col(url_col), F.col(content_col))
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
