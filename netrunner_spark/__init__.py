"""netrunner_spark — a from-scratch PySpark-native URL-frontier + fetch
scheduler + page cacher with the capabilities of spyglass-search/netrunner.

Reference semantics: /root/reference (spyglass-netrunner v0.2.12, Rust).
This is NOT a port — the reference defines WHAT to compute (frontier
admission, politeness, dedup, parse contracts); Spark defines HOW
(DataFrames over snapshot-versioned tables, window-ranked scheduling
rounds, applyInPandas bloom shards, AQE).

Package map (SURVEY.md section in parens):
  session      SparkSession factory (§7 M0)
  urlnorm      RFC-3986 normalization + sanitize rules (F4/F5/X1)
  lens         lens-config loading, allow/skip regex compile (S1/F1)
  tables       snapshot-versioned parquet catalog (Iceberg stand-in, §7 M0)
  synth        deterministic synthetic web + image generators (§7 M0)
  images       fake codecs + decode/PSNR/phash pandas UDFs (§7 M6)
  parser/      html_to_text family (X1-X5, F12, F13, §7 M2)
  operators/   admission, seen-set, politeness, dedup, text/vector ops
  sources/     mock fetcher, sitemap BFS, CDX pager, RSS, WARC, folder
  plans/       check_urls, crawl round loop, validate (§3.1-3.3)
  streaming/   Structured Streaming frontier ingestion
"""

__version__ = "0.1.0"
