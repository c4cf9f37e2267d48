"""The flagship: round-based frontier drain (reference §3.1,
mod.rs:120-143,211-263) — Spark-first redesign.

The reference drains the queue SERIALLY under a 2 req/s/domain token
bucket. We schedule whole ROUNDS: politeness becomes a per-host slot
budget per round; the round batch is window-ranked by
(priority, url_hash) within host (W1/O3); fetch+cache run with full
partition parallelism. Same politeness envelope, ~N_hosts × budget
pages per round instead of one in flight.

Cost structure (what survives 10^10 rows — each round):
  * ONE window shuffle over the queued set (the rank) — keyed by host,
    AQE skew-split for hot hosts;
  * fetch = broadcast joins of the small batch against the page store
    (store is streamed, never shuffled — see MockFetcher);
  * cache + metrics commits are APPEND SLICES keyed by round
    (Iceberg append-snapshot analog) — no table rewrite, idempotent on
    replay, O(round) not O(total);
  * robots allow/deny is evaluated ONCE per URL at enqueue time
    (init or link-expansion), not per round;
  * the seen-set guard (bloom shards + exact anti-join backstop) runs
    at ENQUEUE time over new links only — the reference checks its
    seen set before enqueue/fetch too (mod.rs:221-241); nothing
    re-probes the whole frontier every round.

Commit order per round: cache slice → metrics slice → bloom snapshot →
frontier snapshot LAST. A crash between any two steps resumes at the
same round (current_round derives from the frontier, the last commit);
replay overwrites the same slices — exactly-once effect (W4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netrunner_spark.operators.admission import (
    admission_filter,
    dedup_frontier,
    normalize_frontier,
    sanitize,
)
from netrunner_spark.operators.politeness import (
    DEFAULT_RPS,
    host_budgets,
    rank_round,
    robots_allowed,
    with_priority,
)
from netrunner_spark.operators.seen import unseen_only, upsert_shards
from netrunner_spark.parser.udf import parse_pages
from netrunner_spark.tables import LakeCatalog

FRONTIER_COLS = ["url", "url_hash", "host", "depth", "priority", "state", "round"]


def attach_image_checks(fetched: DataFrame, images: DataFrame) -> DataFrame:
    """Join the batch's image FKs to the image table and decode/validate
    batch-wise (decode_check_udf, Arrow batches — never per-row Python).
    Cache rows gain (image_ok, image_phash): NULL for pages without an
    image payload; image_ok=false records a corrupt/mismatched payload
    without dropping the row (validation reads it later)."""
    from netrunner_spark.images import decode_check_udf

    refs = fetched.filter(F.col("image_id").isNotNull())
    no_img = fetched.filter(F.col("image_id").isNull())
    checked = (
        refs.join(images.select("image_id", "bytes", "w", "h", "phash"), "image_id", "left")
        .withColumn("chk", decode_check_udf(F.col("bytes")))
        .select(
            *fetched.columns,
            (
                F.col("chk.decode_ok")
                & (F.col("chk.w_actual") == F.col("w"))
                & (F.col("chk.h_actual") == F.col("h"))
                & (F.col("chk.phash_actual") == F.col("phash"))
            ).alias("image_ok"),
            F.col("chk.phash_actual").alias("image_phash"),
        )
    )
    return no_img.select(
        *fetched.columns,
        F.lit(None).cast("boolean").alias("image_ok"),
        F.lit(None).cast("long").alias("image_phash"),
    ).unionByName(checked)
CACHE_COLS = [
    "url_hash",
    "url",
    "host",
    "status",
    "headers",
    "content",
    "image_id",
    "attempts",
    "source",
]


@dataclass
class CrawlConfig:
    """Live config (the reference's requests_per_second is dead config,
    mod.rs:37-51 — ours is real)."""

    rps: float = DEFAULT_RPS
    round_seconds: float = 10.0  # logical politeness window per round
    max_rounds: int = 100
    follow_links: bool = False  # reference drains a fixed queue; we can expand
    max_depth: int = 3
    n_bloom_shards: int = 64
    og_first: bool = True


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        catalog: LakeCatalog,
        fetcher,
        robots: DataFrame,
        config: CrawlConfig | None = None,
        lens=None,
        images: DataFrame | None = None,
    ):
        """``images``: the image+caption table (input_hint schema). When
        given, every round decodes + validates the batch's image payloads
        batch-wise (pandas UDF) and the cache rows carry the verdicts —
        the north_star places image validation INSIDE the caching path."""
        self.spark = spark
        self.cat = catalog
        self.fetcher = fetcher
        self.robots = robots
        self.cfg = config or CrawlConfig()
        self.lens = lens
        self.images = images
        self._budgets = None

    # ------------------------------------------------------------ lifecycle
    def init_frontier(self, urls: DataFrame) -> None:
        """urls(url, host, url_hash) → frontier table; robots verdict is
        stamped HERE (once per URL): disallowed rows enter as 'blocked'.
        No-op if a frontier snapshot exists (resume, W4/mod.rs:121-128)."""
        if self.cat.exists("frontier"):
            return
        base = urls.select(
            "url", "url_hash", "host", F.lit(0).alias("depth")
        )
        ok = robots_allowed(base, self.robots).withColumn("state", F.lit("queued"))
        blocked = base.join(ok.select("url_hash"), "url_hash", "left_anti").withColumn(
            "state", F.lit("blocked")
        )
        frontier = ok.unionByName(blocked).select(
            "url",
            "url_hash",
            "host",
            "depth",
            F.lit(0.0).alias("priority"),
            "state",
            F.lit(-1).alias("round"),
        )
        self.cat.write(frontier, "frontier", bucket_hint="url_hash")

    def current_round(self) -> int:
        """Next round to run = 1 + last round stamped on a terminal
        frontier transition (the frontier commit is the round's LAST
        step, so this resumes a half-committed round for replay)."""
        if not self.cat.exists("frontier"):
            return 0
        row = (
            self.cat.read("frontier")
            .filter(F.col("state").isin("fetched", "failed"))
            .agg(F.max("round").alias("r"))
            .collect()[0]
        )
        return 0 if row["r"] is None else row["r"] + 1

    def budgets(self) -> DataFrame:
        if self._budgets is None:
            self._budgets = host_budgets(
                self.robots, self.cfg.round_seconds, self.cfg.rps
            ).cache()
        return self._budgets

    def cache_df(self) -> DataFrame | None:
        return self.cat.read_slices("cache")

    def metrics_df(self) -> DataFrame | None:
        return self.cat.read_slices("metrics")

    # ------------------------------------------------------------ one round
    def run_round(self, round_no: int) -> int:
        """→ number of URLs attempted this round."""
        frontier = self.cat.read("frontier")
        queued = frontier.filter(F.col("state") == "queued")

        batch = rank_round(with_priority(queued), self.budgets()).persist()
        n_batch = batch.count()
        if n_batch == 0:
            batch.unpersist()
            return 0

        # bloom shards depend only on the batch keys — overlap their
        # grouped-pandas upsert with the content-heavy cache write
        # (Spark schedules concurrent jobs from driver threads; the
        # frontier commit below still happens LAST).
        from concurrent.futures import ThreadPoolExecutor

        def bloom_step():
            old = (
                self.cat.read("bloom_shards")
                if self.cat.exists("bloom_shards")
                else None
            )
            self.cat.write(
                upsert_shards(old, batch.select("url_hash"), self.cfg.n_bloom_shards),
                "bloom_shards",
            )

        pool = ThreadPoolExecutor(max_workers=1)
        bloom_future = pool.submit(bloom_step)

        # 1. cache slice — the ONE pass that materializes fetched content
        #    (idempotent overwrite on replay). Nothing content-sized is
        #    persisted on the heap: downstream steps read the written
        #    slice back, and parquet column pruning keeps content out of
        #    the metrics/transition scans entirely.
        fetched = self.fetcher.fetch(batch).select(*CACHE_COLS)
        if self.images is not None:
            fetched = attach_image_checks(fetched, self.images)
        self.cat.write_slice(
            fetched.withColumn("fetched_round", F.lit(round_no)),
            "cache",
            "fetched_round",
            round_no,
        )
        slice_df = self.cat.read_slice("cache", "fetched_round", round_no)

        # 2. per-host lineage/metrics slice (north_rule)
        metrics = slice_df.groupBy("host").agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.when(F.col("status").between(200, 299), 1).otherwise(0)).alias(
                "n_ok"
            ),
            F.sum(
                F.when(
                    F.col("status").isNull() | ~F.col("status").between(200, 299), 1
                ).otherwise(0)
            ).alias("n_failed"),
            F.sum("attempts").alias("attempts"),
        )
        self.cat.write_slice(
            metrics.withColumn("round", F.lit(round_no)), "metrics", "round", round_no
        )

        # 3. bloom shards: OR this round's keys in — single grouped-pandas
        #    pass, idempotent re-OR on replay (ran concurrently above)
        bloom_future.result()
        pool.shutdown()

        # 4. frontier transition — committed LAST (resume anchor);
        #    reads only slim columns of the written slice
        transitions = slice_df.join(
            batch.select("url_hash", "depth", "priority"), "url_hash"
        ).select(
            "url",
            "url_hash",
            "host",
            "depth",
            "priority",
            F.when(F.col("status").between(200, 299), "fetched")
            .otherwise("failed")
            .alias("state"),
            F.lit(round_no).alias("round"),
        )
        remaining = frontier.join(batch.select("url_hash"), "url_hash", "left_anti")
        next_frontier = remaining.select(*FRONTIER_COLS).unionByName(transitions)
        if self.cfg.follow_links:
            with_depth = slice_df.join(batch.select("url_hash", "depth"), "url_hash")
            next_frontier = self._expand_links(with_depth, next_frontier, round_no)
        self.cat.write(next_frontier, "frontier", bucket_hint="url_hash")

        batch.unpersist()
        return n_batch

    def _expand_links(
        self, fetched: DataFrame, frontier: DataFrame, round_no: int
    ) -> DataFrame:
        """Parse 2xx pages, admit + normalize links, robots-check, then
        the F7 seen guard (bloom pre-filter + exact anti-join vs cache
        keys) — all at enqueue time; unseen links queue at depth+1.

        (Link-following is our scalability extension; the reference
        drains a fixed queue — its ParseResult.links are serde-skipped,
        parser/mod.rs:24.)
        """
        ok = fetched.filter(
            F.col("status").between(200, 299) & (F.col("depth") < self.cfg.max_depth)
        )
        parsed = parse_pages(ok.select("url", "content"))
        links = parsed.join(ok.select("url", "depth"), "url").select(
            F.explode("links").alias("url"), (F.col("depth") + 1).alias("depth")
        )
        if self.lens is not None:
            links = admission_filter(sanitize(links, self.lens), self.lens)
        links = dedup_frontier(normalize_frontier(links))
        links = robots_allowed(links, self.robots)

        shards = (
            self.cat.read("bloom_shards") if self.cat.exists("bloom_shards") else None
        )
        cache = self.cache_df()
        seen_keys = (
            cache.select("url_hash")
            if cache is not None
            else self.spark.createDataFrame([], "url_hash long")
        )
        fresh = unseen_only(links, seen_keys, shards, self.cfg.n_bloom_shards)
        # also unseen w.r.t. anything already in the frontier (any state)
        fresh = fresh.join(frontier.select("url_hash"), "url_hash", "left_anti")
        new_rows = fresh.select(
            "url",
            "url_hash",
            "host",
            "depth",
            F.lit(0.0).alias("priority"),
            F.lit("queued").alias("state"),
            F.lit(-1).alias("round"),
        )
        return frontier.unionByName(new_rows.select(*FRONTIER_COLS))

    # ------------------------------------------------------------ archive
    def archive_stage(self, images: DataFrame | None = None) -> dict:
        """The reference crawl's tail (§3.1, create_archives,
        archive.rs:356-403): 2xx filter (F6) → html_to_text parse (X2,
        Arrow-batched) → canonical dedup (F9) → parsed table; plus the
        north_star image path: join cached image_id FKs to the image
        table and decode/validate batch-wise (decode_check_udf) —
        phash/shape mismatches are counted, never silently dropped.

        This is the perfectly-parallel stage of the drain (pure
        per-partition Python over Arrow batches; one shuffle for the
        canonical dedup)."""
        cache = self.cache_df()
        if cache is None:
            return {"parsed": 0, "dupes_dropped": 0, "images_checked": 0, "image_failures": 0}
        ok = cache.filter(F.col("status").between(200, 299))
        parsed = parse_pages(ok.select("url", "content"))
        from netrunner_spark.operators.dedup import canonical_dedup

        deduped = canonical_dedup(parsed)
        self.cat.write(deduped, "parsed", bucket_hint="canonical_url")
        n_parsed = self.cat.read("parsed").count()
        n_total = ok.count()

        images_checked = image_failures = 0
        if "image_ok" in ok.columns:
            # per-round validation already stamped the cache rows
            v = ok.filter(F.col("image_id").isNotNull()).select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(~F.coalesce(F.col("image_ok"), F.lit(False)), 1).otherwise(0)
                ).alias("bad"),
            ).collect()[0]
            images_checked, image_failures = v["n"], v["bad"] or 0
        elif images is not None:
            from netrunner_spark.images import decode_check_udf

            refs = ok.filter(F.col("image_id").isNotNull()).select("image_id")
            joined = refs.join(images, "image_id")
            checked = joined.withColumn("chk", decode_check_udf(F.col("bytes")))
            verdicts = checked.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        ~F.col("chk.decode_ok")
                        | (F.col("chk.w_actual") != F.col("w"))
                        | (F.col("chk.h_actual") != F.col("h"))
                        | (F.col("chk.phash_actual") != F.col("phash")),
                        1,
                    ).otherwise(0)
                ).alias("bad"),
            ).collect()[0]
            images_checked, image_failures = verdicts["n"], verdicts["bad"] or 0

        return {
            "parsed": n_parsed,
            "dupes_dropped": n_total - n_parsed,
            "images_checked": images_checked,
            "image_failures": image_failures,
        }

    # ------------------------------------------------------------ full run
    def run(self) -> dict:
        start_round = self.current_round()
        total = 0
        rounds = 0
        for r in range(start_round, start_round + self.cfg.max_rounds):
            n = self.run_round(r)
            rounds += 1
            total += n
            if n == 0:
                break
            self.cat.vacuum("frontier")
            self.cat.vacuum("bloom_shards")
        return {"rounds": rounds, "fetched": total}
