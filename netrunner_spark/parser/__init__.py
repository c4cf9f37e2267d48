"""HTML parse family (X1-X5, F12, F13) — see html.py and udf.py."""

from netrunner_spark.parser.html import ParseResult, html_to_text, process_canonical_url

__all__ = ["ParseResult", "html_to_text", "process_canonical_url"]
