"""Page fetch stage (S8/S9) with retry/backoff semantics (F10/F11/W5).

Two implementations behind one contract
``fetch(frontier) -> DataFrame[url, url_hash, host, depth, status,
headers, content, image_id, attempts, source]``:

* ``MockFetcher`` — deterministic, network-free: a fetch against the
  synthetic page store IS a key lookup, so it's expressed as an
  equi-join on url_hash (sort-merge or broadcast — Catalyst decides;
  at 10^10 frontier rows the page store is the big side and the round
  batch the small side, so the join broadcasts the BATCH, never the
  store). Retry semantics become column logic:
    - flaky_once pages cost one extra attempt then succeed (expo
      backoff budget: 3 tries, crawler.rs:73-75)
    - 403/404 are terminal, never retried (crawler.rs:48-59)
    - 5xx consume all 3 attempts and stay failed
    - missing URL = connection failure → 3 attempts, status NULL
* ``HttpFetcher`` — real HTTP via urllib inside ``mapInPandas``
  (per-partition connection reuse, 1 s connect / 10 s total timeout,
  UA ``netrunner_spark/<version>`` — envelope per crawler.rs:37-43).
  Optional: not exercised in the sandbox (no network), import-gated.

Dual-source policy (S9): ``og_first`` picks origin vs archive column
first; the mock store carries both variants via ``ia_ok`` flag logic —
``source`` records which side served the page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRY_BUDGET = 3  # crawler.rs:73-75
NO_RETRY_STATUSES = (403, 404)  # crawler.rs:48-59


class MockFetcher:
    def __init__(self, web: DataFrame, og_first: bool = True):
        """``web``: synthetic page store (synth.gen_web schema)."""
        self.web = web.withColumn("url_hash", F.xxhash64("url"))
        self.og_first = og_first

    def fetch(self, batch: DataFrame, prefer_broadcast: bool = True) -> DataFrame:
        """batch: frontier rows selected for this round.

        The round batch (≤ Σ host budgets rows) is small relative to the
        page store, and Spark cannot broadcast the PRESERVED side of an
        outer join — so a naive ``batch LEFT JOIN store`` would sort-merge
        the whole store every round. Instead: broadcast INNER join for
        hits + broadcast LEFT-ANTI for misses (connection failures),
        union. Both joins broadcast the batch and stream the store once,
        shuffle-free — the plan that survives a 10^10-row store.

        ``prefer_broadcast=False``: the caller determined the batch is
        too big to broadcast (a round at 10^10-frontier scale is
        millions of URLs — a multi-million-row broadcast with URL
        strings would kill the driver); fall back to a shuffle-hash
        join on url_hash, which stays shuffle-light on the store side
        when the store is bucketed by url_hash.
        """
        has_ia = "ia_status" in self.web.columns
        pages = self.web.select(
            "url_hash",
            F.col("status").alias("_status"),
            F.col("headers").alias("_headers"),
            F.col("content").alias("_content"),
            F.col("image_id").alias("_image_id"),
            "flaky_once",
            (F.col("ia_status") if has_ia else F.lit(None).cast("int")).alias(
                "_ia_status"
            ),
        )
        batch_cols = list(batch.columns)
        # dual-source policy (S9, crawler.rs:62-108): primary side first;
        # on failure fall back to the other side — column logic, one pass
        primary = F.col("_status") if self.og_first else F.col("_ia_status")
        secondary = F.col("_ia_status") if self.og_first else F.col("_status")
        primary_ok = primary.between(200, 299)
        secondary_ok = secondary.between(200, 299)
        eff_status = (
            F.when(primary_ok, primary)
            .when(secondary_ok, secondary)
            .otherwise(F.coalesce(primary, secondary))
        )
        src_primary = "origin" if self.og_first else "archive"
        src_secondary = "archive" if self.og_first else "origin"
        bset = F.broadcast(batch) if prefer_broadcast else batch.hint("shuffle_hash")
        hits = pages.join(bset, "url_hash").select(
            *batch_cols,
            eff_status.alias("status"),
            F.col("_headers").alias("headers"),
            F.when(eff_status.between(200, 299), F.col("_content"))
            .otherwise(F.lit(""))
            .alias("content"),
            F.col("_image_id").alias("image_id"),
            F.when(primary_ok & F.col("flaky_once"), F.lit(2))  # 429→retry (F11)
            .when(primary_ok, F.lit(1))
            .when(secondary_ok & primary.isin(*NO_RETRY_STATUSES), F.lit(2))
            .when(secondary_ok, F.lit(RETRY_BUDGET + 1))
            .when(eff_status.isin(*NO_RETRY_STATUSES), F.lit(1))
            .otherwise(F.lit(RETRY_BUDGET))
            .alias("attempts"),
            F.when(primary_ok, F.lit(src_primary))
            .when(secondary_ok, F.lit(src_secondary))
            .otherwise(F.lit(src_primary))
            .alias("source"),
        )
        # keys present in the store: column-pruned scan (url_hash only) ×
        # broadcast batch — small result, safe to broadcast into the anti
        bkeys = (
            F.broadcast(batch.select("url_hash"))
            if prefer_broadcast
            else batch.select("url_hash").hint("shuffle_hash")
        )
        present = pages.select("url_hash").join(bkeys, "url_hash")
        present = F.broadcast(present) if prefer_broadcast else present
        misses = batch.join(present, "url_hash", "left_anti").select(
            *batch_cols,
            F.lit(None).cast("int").alias("status"),  # connection failure
            F.lit(None).cast(
                "array<struct<name:string,value:string>>"
            ).alias("headers"),
            F.lit(None).cast("string").alias("content"),
            F.lit(None).cast("string").alias("image_id"),
            F.lit(RETRY_BUDGET).alias("attempts"),  # all retries consumed (W5)
            F.lit("origin" if self.og_first else "archive").alias("source"),
        )
        return hits.unionByName(misses)


class HttpFetcher:  # pragma: no cover - requires network, absent in sandbox
    """Real-HTTP fetch via mapInPandas; envelope mirrors crawler.rs:37-43."""

    CONNECT_TIMEOUT = 1.0
    TOTAL_TIMEOUT = 10.0
    USER_AGENT = "netrunner_spark/0.1.0"

    def __init__(self, og_first: bool = True):
        self.og_first = og_first

    def fetch(self, batch: DataFrame, prefer_broadcast: bool = True) -> DataFrame:
        import pandas as pd
        from pyspark.sql import types as T

        del prefer_broadcast  # join-strategy hint; meaningless for real HTTP

        schema = T.StructType(
            list(batch.schema.fields)
            + [
                T.StructField("status", T.IntegerType()),
                T.StructField(
                    "headers",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("name", T.StringType()),
                                T.StructField("value", T.StringType()),
                            ]
                        )
                    ),
                ),
                T.StructField("content", T.StringType()),
                T.StructField("image_id", T.StringType()),
                T.StructField("attempts", T.IntegerType()),
                T.StructField("source", T.StringType()),
            ]
        )
        total_timeout = self.TOTAL_TIMEOUT
        ua = self.USER_AGENT

        def run(batches):
            import time
            import urllib.request

            for pdf in batches:
                rows = []
                for _, row in pdf.iterrows():
                    status, headers, content, attempts = None, [], None, 0
                    for attempt in range(RETRY_BUDGET):
                        attempts = attempt + 1
                        try:
                            req = urllib.request.Request(
                                row["url"], headers={"User-Agent": ua}
                            )
                            with urllib.request.urlopen(req, timeout=total_timeout) as r:
                                status = r.status
                                headers = [
                                    {"name": k, "value": v} for k, v in r.getheaders()
                                ]
                                content = r.read().decode("utf-8", errors="replace")
                            break
                        except urllib.error.HTTPError as e:
                            status = e.code
                            if status in NO_RETRY_STATUSES:
                                break
                            time.sleep(min(0.1 * (2**attempt), 5.0))
                        except Exception:
                            time.sleep(min(0.1 * (2**attempt), 5.0))
                    out = dict(row)
                    out.update(
                        status=status,
                        headers=headers,
                        content=content,
                        image_id=None,
                        attempts=attempts,
                        source="origin",
                    )
                    rows.append(out)
                yield pd.DataFrame(rows)

        return batch.mapInPandas(run, schema)
