"""The flagship: round-based frontier drain (reference §3.1,
mod.rs:120-143,211-263) — Spark-first redesign, round 2.

The reference drains the queue SERIALLY under a 2 req/s/domain token
bucket. We schedule whole ROUNDS: politeness becomes a per-host slot
budget per round. Round 2 moves the scheduling itself out of the loop:

  * ``init_frontier`` window-ranks the WHOLE queue ONCE
    (politeness.schedule_rounds) and writes a ``schedule`` table
    partitioned by ``sched_round`` — provably the same per-round batches
    as re-ranking every round (the within-host order is static), at
    O(N) total instead of O(R·N).
  * each round is then: partition-pruned read of ``sched_round=r`` →
    fetch join (broadcast below a size cap, shuffle-hash above) →
    batch-wise image decode/validate (single left join — ONE pass) →
    ONE cache-slice write (with ``observe`` supplying the row count, so
    no separate count job) → one tiny column-pruned metrics job.
    That's 2 Spark jobs per round; round 1 needed 5-6 plus an
    O(frontier) snapshot rewrite.
  * the URL-seen bloom covers every SCHEDULED key from init (enqueue-
    time membership, exactly when the reference consults its seen set,
    mod.rs:221-241) — it only changes when link expansion enqueues new
    URLs, so the per-round "bloom checkpoint" is the unchanged
    committed snapshot, not a rewrite.
  * the terminal ``frontier`` snapshot (url, state, round) is an O(N)
    MATERIALIZATION at drain end / on demand — per-round frontier state
    is fully determined by (schedule, committed cache slices), which is
    what resume reads.

Durability / resume (W4): the cache slice IS the round commit — a round
is committed iff its slice directory carries Spark's ``_SUCCESS``
marker. ``current_round`` = max committed slice + 1 (driver-side
listdir, zero jobs). A crash mid-round leaves a marker-less partial
slice that the replay overwrites; a crash between the cache and metrics
writes is healed by the metrics backfill at ``run()`` start. All writes
are idempotent overwrites of per-round paths — exactly-once effect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
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
    robots_allowed,
    schedule_rounds,
    with_priority,
)
from netrunner_spark.operators.seen import unseen_only, upsert_shards
from netrunner_spark.parser.udf import parse_pages
from netrunner_spark.tables import LakeCatalog

FRONTIER_COLS = ["url", "url_hash", "host", "depth", "priority", "state", "round"]
SCHEDULE_COLS = ["url", "url_hash", "host", "depth", "priority", "sched_round"]
CACHE_COLS = [
    "url_hash",
    "url",
    "host",
    "depth",
    "status",
    "headers",
    "content",
    "image_id",
    "attempts",
    "source",
]

# round batches below this on-disk size broadcast into the fetch join;
# above it (millions of URLs at 10^10-frontier scale) the join falls
# back to shuffle-hash so the driver never holds the batch
BROADCAST_BATCH_BYTES = 32 * 1024 * 1024


def attach_image_checks(
    fetched: DataFrame,
    images: DataFrame,
    prefer_broadcast: bool = True,
    refs: DataFrame | None = None,
) -> DataFrame:
    """Decode/validate the batch's image payloads batch-wise
    (decode_check_udf, Arrow batches — never per-row Python) and stamp
    (image_ok, image_phash) onto the cache rows.

    Shuffle-minimal shape (single pass over ``fetched``): the
    content-heavy fetched rows NEVER shuffle. The slim ref keys join
    into the image store (streaming it once), the decode verdicts —
    O(batch) narrow rows — join back by broadcast (shuffle-hash when
    the caller says the batch is too big to broadcast). Round 1 instead
    unioned a refs/no-image split, recomputing the unpersisted fetch
    join twice AND shuffling content through the image join.

    image_ok is NULL for pages without an image payload (left join
    miss); false records a corrupt/mismatched/absent payload without
    dropping the row (validation reads it later)."""
    from netrunner_spark.images import decode_check_udf

    if refs is None:
        # generic fallback: derive refs from the fetch output. NOTE:
        # broadcasting the verdicts below MATERIALIZES this subtree, so
        # with an expensive ``fetched`` pipeline the caller should pass
        # ``refs`` from a slim source (fetcher.image_refs) instead —
        # deriving here re-executes the whole fetch join once.
        refs = (
            fetched.filter(F.col("image_id").isNotNull())
            .select("image_id")
            .dropDuplicates()
        )
    refs = F.broadcast(refs) if prefer_broadcast else refs.hint("shuffle_hash")
    checked = images.select("image_id", "bytes", "w", "h", "phash").join(
        refs, "image_id"
    ).withColumn("chk", decode_check_udf(F.col("bytes")))
    verdicts = checked.select(
        "image_id",
        (
            F.col("chk.decode_ok")
            & (F.col("chk.w_actual") == F.col("w"))
            & (F.col("chk.h_actual") == F.col("h"))
            & (F.col("chk.phash_actual") == F.col("phash"))
        ).alias("image_ok"),
        F.col("chk.phash_actual").alias("image_phash"),
    )
    # shuffle_hash on the non-broadcast path too: an un-hinted left join
    # sort-merge-joined — shuffling AND sorting the content-heavy
    # fetched side by image_id at exactly the scale where broadcast is
    # off (r5 review)
    verdicts = (
        F.broadcast(verdicts) if prefer_broadcast else verdicts.hint("shuffle_hash")
    )
    joined = fetched.join(verdicts, "image_id", "left")
    # a ref whose image is MISSING from the store is a failure, not a
    # no-image page: image_ok false, never null, when image_id is set
    return joined.select(
        *fetched.columns,
        F.when(
            F.col("image_id").isNotNull(),
            F.coalesce(F.col("image_ok"), F.lit(False)),
        ).alias("image_ok"),
        "image_phash",
    )


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
    # round batches below this on-disk size broadcast into the fetch /
    # image joins; above it they fall back to shuffle-hash (a broadcast
    # build is driver-serial — at multi-100k-row rounds that serial
    # cost is the scaling bottleneck)
    broadcast_batch_bytes: int = BROADCAST_BATCH_BYTES
    # >1: salt the scheduling window by pmod(url_hash, S) so a hot host
    # spreads over S tasks (north_rule skew mitigation); politeness
    # budget stays an upper bound (see politeness.schedule_rounds)
    schedule_salts: int = 1
    # enforce the politeness window against the wall clock: a round that
    # finishes early sleeps out its remainder, so the per-host request
    # rate NEVER exceeds rps even when compute is fast (live-crawl
    # mode). Off by default: batch/mock runs model politeness logically
    # (budget slots per round) and stay deterministic + fast.
    enforce_wall_clock: bool = False
    # colocated rounds: batches below this size broadcast over the
    # bucketed scan (exchange-free BHJ, no merge-sort startup); above
    # it they sort-merge co-located. Much lower than
    # broadcast_batch_bytes because the alternative here is an
    # exchange-free merge join, not a shuffle: measured crossover is
    # ~100k slim rows (merge won at 330k-row rounds, broadcast at 15k)
    colocated_broadcast_bytes: int = 4 * 1024 * 1024
    # set to a bucket count to store the SCHEDULE as a Spark bucketed
    # table on url_hash (same count as the fetcher's bucketed store):
    # every round's fetch join is then a co-located, exchange-free
    # sort-merge join with NO driver-serial broadcast build — the
    # round-2 serial floor (BENCH/BASELINE.md §5). Pair with
    # fetcher.prepare_colocated_fetcher.
    colocated_buckets: int | None = None


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
    def _colocated(self) -> bool:
        return bool(self.cfg.colocated_buckets)

    def _schedule_df(self) -> DataFrame:
        # empty-schema fallback: a purely streaming-fed crawl calls
        # enqueue_frontier before any init_frontier, so no ``schedule``
        # snapshot exists yet — the documented handoff entry point must
        # not raise (r5 review). All rounds then live in schedule_ext.
        try:
            return (
                self.cat.read_table("schedule")
                if self._colocated()
                else self.cat.read("schedule")
            )
        except FileNotFoundError:
            return self.spark.createDataFrame(
                [],
                "url string, url_hash long, host string, depth int,"
                " priority double, sched_round int",
            )

    def _sched_rounds(self) -> list[int]:
        return (
            self.cat.table_partition_values("schedule", "sched_round")
            if self._colocated()
            else self.cat.partition_values("schedule", "sched_round")
        )

    def init_frontier(self, urls: DataFrame) -> None:
        """urls(url, host, url_hash) → ``schedule`` table: robots verdict
        stamped ONCE per URL (disallowed rows park at sched_round=-1),
        then every allowed URL gets its drain round assigned up front
        (schedule_rounds — one window job for the whole crawl). The
        URL-seen bloom is built over all scheduled keys in the same
        step. No-op if a schedule exists (resume, W4/mod.rs:121-128)."""
        if self.cat.exists("schedule") or (
            self._colocated() and self.cat.table_meta("schedule") is not None
        ):
            # heal the init crash window: schedule committed but the
            # bloom write never ran. Without this the seen guard
            # degrades to the full exact anti-join for the lifetime of
            # the crawl (enqueue_frontier only FOLDS into an existing
            # shards table, never creates one). Rebuild from schedule
            # PLUS any schedule_ext appends that ran bloom-less.
            if not self.cat.exists("bloom_shards"):
                keys = (
                    self._schedule_df()
                    .filter(F.col("sched_round") >= 0)
                    .select("url_hash")
                )
                ext = self.cat.read_slices("schedule_ext")
                if ext is not None:
                    keys = keys.unionByName(ext.select("url_hash"))
                self.cat.write(
                    upsert_shards(None, keys, self.cfg.n_bloom_shards),
                    "bloom_shards",
                )
            return
        base = urls.select("url", "url_hash", "host", F.lit(0).alias("depth"))
        ok = robots_allowed(base, self.robots)
        sched = schedule_rounds(
            with_priority(ok),
            self.budgets(),
            default_budget=self._default_budget(),
            n_salts=self.cfg.schedule_salts,
        ).select(*SCHEDULE_COLS)
        blocked = base.join(ok.select("url_hash"), "url_hash", "left_anti").select(
            "url",
            "url_hash",
            "host",
            "depth",
            F.lit(0.0).alias("priority"),
            F.lit(-1).alias("sched_round"),
        )
        full = sched.unionByName(blocked)
        if self._colocated():
            # bucket-aligned with the fetcher's store: per-round reads are
            # partition-pruned AND carry bucketing metadata into the join
            self.cat.write_table_bucketed(
                full,
                "schedule",
                key="url_hash",
                n_buckets=self.cfg.colocated_buckets,
                partition_by=["sched_round"],
            )
        else:
            self.cat.write(full, "schedule", partition_by=["sched_round"])
        keys = (
            self._schedule_df()
            .filter(F.col("sched_round") >= 0)
            .select("url_hash")
        )
        self.cat.write(
            upsert_shards(None, keys, self.cfg.n_bloom_shards), "bloom_shards"
        )

    def current_round(self) -> int:
        """Next round to run = 1 + last COMMITTED cache slice (driver-side
        listdir + _SUCCESS check — zero Spark jobs). The cache slice is
        the round's commit anchor; a marker-less partial slice from a
        crash is replayed/overwritten."""
        m = self.cat.max_committed_slice("cache", "fetched_round")
        return 0 if m is None else m + 1

    def max_round(self) -> int:
        """Highest scheduled round (init schedule + link-expansion
        appends); -1 when nothing is scheduled. Driver-side listing."""
        vals = [v for v in self._sched_rounds() if v >= 0]
        m = max(vals, default=-1)
        ext = self.cat.max_slice("schedule_ext", "sched_round")
        return max(m, ext if ext is not None else -1)

    def _default_budget(self) -> int:
        """Slots/round for hosts with no robots row — derived from the
        CONFIGURED politeness rate (r5 review: the previous hardcoded
        20 matched rps=2.0 x round_seconds=10 only by coincidence and
        overshot any stricter configuration 4x+)."""
        return max(1, int(self.cfg.round_seconds * self.cfg.rps))

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
    def _round_batch(self, round_no: int) -> DataFrame | None:
        parts = []
        if round_no in self._sched_rounds():
            if self._colocated():
                # catalog-table read: the sched_round predicate prunes to
                # one partition at plan time AND the scan keeps its
                # url_hash bucketing → exchange-free fetch join
                parts.append(
                    self.cat.read_table("schedule")
                    .filter(F.col("sched_round") == round_no)
                    .drop("sched_round")
                )
            else:
                parts.append(
                    self.cat.read_partition("schedule", "sched_round", round_no)
                )
        if self.cat.slice_exists("schedule_ext", "sched_round", round_no):
            parts.append(self.cat.read_slice("schedule_ext", "sched_round", round_no))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _batch_bytes(self, round_no: int) -> int:
        base = (
            self.cat.table_partition_bytes("schedule", "sched_round", round_no)
            if self._colocated()
            else self.cat.partition_bytes("schedule", "sched_round", round_no)
        )
        return base + self.cat.slice_bytes("schedule_ext", "sched_round", round_no)

    _METRIC_AGGS = (
        lambda: [
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
        ]
    )

    def _write_metrics(self, round_no: int) -> None:
        """Per-host lineage/metrics for one committed round (north_rule).
        Column-pruned scan of the written slice — content never read."""
        slice_df = self.cat.read_slice("cache", "fetched_round", round_no)
        metrics = slice_df.groupBy("host").agg(*CrawlJob._METRIC_AGGS())
        self.cat.write_slice(metrics, "metrics", "round", round_no)

    def _write_metrics_bulk(self, rounds: list[int]) -> None:
        """Metrics for MANY committed cache rounds in ONE pass (r6
        optimization): the per-round read-back + slice write was two
        jobs per round (~0.5 s/round of fixed job latency at bench
        scale, O(rounds) jobs on a long crawl); one partition-pruned
        scan + one dynamic-partition write produces byte-identical
        per-round slice dirs. Each round dir then gets the same
        per-slice ``_SUCCESS`` marker ``write_slice``'s committer
        emits, written AFTER the data commit — the crash window
        (data committed, marker missing ⇒ slice replayed) is unchanged.
        Column-pruned: content is never read."""
        cache = self.cat.read_slices("cache")
        agg = (
            cache.filter(F.col("fetched_round").isin(rounds))
            .groupBy("host", "fetched_round")
            .agg(*CrawlJob._METRIC_AGGS())
            .withColumnRenamed("fetched_round", "round")
        )
        self.cat.append_partitions(agg, "metrics", "round")
        self.cat.mark_slices_committed("metrics", "round", rounds)

    def _backfill_metrics(self) -> None:
        """Write the metrics slice for every committed cache round
        missing one — the round loop defers metrics to one bulk pass
        at the end of ``run()`` (r6 optimization), and this same call
        heals a crash that lost them. Normally driver-side listdir +
        one Spark job; a no-op when nothing is missing."""
        done = self.cat.max_committed_slice("cache", "fetched_round")
        if done is None:
            return
        missing = [
            r
            for r in range(done + 1)
            if self.cat.slice_exists("cache", "fetched_round", r)
            and not self.cat.slice_committed("metrics", "round", r)
        ]
        if missing:
            self._write_metrics_bulk(missing)

    def run_round(self, round_no: int) -> int:
        """→ number of URLs attempted this round (from ``observe`` on the
        cache write — no separate count job)."""
        batch = self._round_batch(round_no)
        if batch is None:
            return 0

        # 1. cache slice — the ONE pass that materializes fetched content
        #    (idempotent overwrite on replay). Colocated mode: bucketed
        #    sort-merge join, no broadcast sizing needed (and image
        #    validation is fused into the fetch stage). Otherwise the
        #    fetch join broadcasts the batch only while it is genuinely
        #    small (driver-side stat of the schedule partition, no job).
        # colocated layout enables the exchange-free merge join; batch
        # size still picks merge vs broadcast-over-the-bucketed-scan
        # (both exchange-free; BHJ skips the merge-sort startup, which
        # dominates at small rounds). Non-colocated: broadcast only
        # while the batch is genuinely small. Inline-image fetchers
        # stamp (image_ok, image_phash) during fetch — dropping the
        # stamp would silently pay the decode and discard the verdict.
        inline_images = getattr(self.fetcher, "images_by_url", None) is not None
        threshold = (
            self.cfg.colocated_broadcast_bytes
            if self._colocated()
            else self.cfg.broadcast_batch_bytes
        )
        small = self._batch_bytes(round_no) < threshold
        fetched = self.fetcher.fetch(batch, prefer_broadcast=small).select(
            *(CACHE_COLS + ["image_ok", "image_phash"])
            if inline_images
            else CACHE_COLS
        )
        if self.images is not None and not inline_images:
            # reuse the SAME size verdict as the fetch join (line above):
            # the old colocated arm hardcoded small=True, broadcasting
            # O(round)-sized refs/verdicts regardless of batch size —
            # exactly the driver-kill the thresholds exist to prevent
            # (r5 review; also removes a duplicate directory stat)
            refs = (
                self.fetcher.image_refs(batch, prefer_broadcast=small)
                if hasattr(self.fetcher, "image_refs")
                else None
            )
            if refs is None:
                # generic fallback derives refs FROM the fetch output and
                # materializes it for the verdict broadcast; checkpoint
                # so the cache write below reuses the same materialized
                # rows — with a network fetcher the recompute was a
                # second full HTTP pass per round, doubling the per-host
                # request rate past the politeness budget (r5 review)
                fetched = fetched.localCheckpoint(eager=True)
            fetched = attach_image_checks(
                fetched, self.images, prefer_broadcast=small, refs=refs
            )
        obs = Observation()
        fetched = fetched.observe(obs, F.count(F.lit(1)).alias("n"))
        # no fetched_round literal: write_slice drops the slice column
        # anyway — it exists only as the partition directory name
        self.cat.write_slice(fetched, "cache", "fetched_round", round_no)
        n_batch = int(obs.get["n"])

        # 2. per-host lineage/metrics: deferred to ONE bulk pass at the
        #    end of run() (r6 optimization — the per-round read-back +
        #    write cost two jobs/round); a crash before that pass is
        #    healed by the same _backfill_metrics that healed the old
        #    per-round crash window

        # 3. link expansion (our scalability extension; the reference
        #    drains a fixed queue) appends NEW schedule partitions and
        #    folds the new keys into the bloom — O(new links), never
        #    O(frontier).
        if self.cfg.follow_links:
            self._expand_links(round_no)
            self.cat.set_marker("schedule_ext", f"expanded-{round_no}")
        return n_batch

    def _backfill_expansion(self) -> None:
        """Heal a crash AFTER the cache slice committed but BEFORE its
        link expansion landed (ADVICE r2): without this, resume skips
        past the round and its discovered links are never scheduled.
        Re-running _expand_links is idempotent — already-scheduled keys
        vanish in the seen anti-join — so replay appends only what the
        crash lost. Driver-side marker check; normally a no-op."""
        if not self.cfg.follow_links:
            return
        done = self.cat.max_committed_slice("cache", "fetched_round")
        if done is None:
            return
        for r in range(done + 1):
            if self.cat.slice_committed(
                "cache", "fetched_round", r
            ) and not self.cat.has_marker("schedule_ext", f"expanded-{r}"):
                self._expand_links(r)
                self.cat.set_marker("schedule_ext", f"expanded-{r}")

    def _expand_links(self, round_no: int) -> None:
        """Parse this round's 2xx pages, admit + normalize links,
        robots-check, then the F7 seen guard (bloom pre-filter + exact
        anti-join vs ALL scheduled keys) — at enqueue time; unseen links
        are window-scheduled into rounds AFTER the current maximum
        (budget-safe: a host's new rounds never exceed its slot budget).

        (Link-following is our scalability extension; the reference
        drains a fixed queue — its ParseResult.links are serde-skipped,
        parser/mod.rs:24.)
        """
        slice_df = self.cat.read_slice("cache", "fetched_round", round_no)
        ok = slice_df.filter(
            F.col("status").between(200, 299) & (F.col("depth") < self.cfg.max_depth)
        )
        parsed = parse_pages(ok.select("url", "content"))
        links = parsed.join(ok.select("url", "depth"), "url").select(
            F.explode("links").alias("url"), (F.col("depth") + 1).alias("depth")
        )
        if self.lens is not None:
            links = admission_filter(sanitize(links, self.lens), self.lens)
        links = dedup_frontier(normalize_frontier(links))
        self.enqueue_frontier(links)

    def enqueue_frontier(self, links: DataFrame) -> None:
        """Admit NEW URLs into rounds after the current maximum — the
        shared enqueue tail of link expansion AND the streaming→batch
        handoff (streaming.ingest.handoff_admitted): robots check →
        F7 seen guard (bloom pre-filter + exact anti-join vs ALL
        scheduled keys) → window-scheduled schedule_ext appends
        (budget-safe) → bloom fold. Idempotent: already-scheduled keys
        vanish in the seen guard.

        ``links``: (url, url_hash, host, depth) — normalized/admitted
        by the caller."""
        links = robots_allowed(links, self.robots)

        shards = (
            self.cat.read("bloom_shards") if self.cat.exists("bloom_shards") else None
        )
        n_sh = self.cfg.n_bloom_shards
        if shards is not None and "n_shards" in shards.columns:
            n_sh = int(shards.agg(F.max("n_shards")).first()[0])

        scheduled = self._schedule_df().select("url_hash", "sched_round")
        ext = self.cat.read_slices("schedule_ext")
        seen_keys = scheduled.filter(F.col("sched_round") >= 0).select("url_hash")
        if ext is not None:
            seen_keys = seen_keys.unionByName(ext.select("url_hash"))
        # blocked keys are NOT in the bloom; robots_allowed above already
        # re-filters them, so they can't re-enter via this path
        fresh = unseen_only(links, seen_keys, shards, n_sh)

        base_round = self.max_round() + 1
        newly = (
            schedule_rounds(
                with_priority(fresh),
                self.budgets(),
                default_budget=self._default_budget(),
                round_offset=base_round,
                n_salts=self.cfg.schedule_salts,
            )
            .select(*SCHEDULE_COLS)
            .localCheckpoint(eager=True)
        )
        if not newly.take(1):
            return
        # fold the bloom BEFORE appending the schedule partitions: a
        # crash between the two then leaves keys in the bloom that are
        # not yet scheduled — a bloom false POSITIVE, healed by the
        # exact anti-join on replay (the key isn't in seen_keys, so it
        # re-enters and both writes re-run idempotently). The reverse
        # order had the fatal window: keys in schedule_ext but not in
        # the bloom probe as definitely-unseen and are scheduled AGAIN
        # on replay — a false NEGATIVE no backstop can catch.
        if shards is not None:
            self.cat.write(
                upsert_shards(shards, newly.select("url_hash"), n_sh),
                "bloom_shards",
            )
        elif not self.cat.exists("bloom_shards"):
            # streaming-only mode (no init_frontier ever ran): build the
            # bloom from the first enqueue so later cycles get the
            # probe pre-filter instead of exact-anti-join-only forever
            # (r5 review); same fold-before-append ordering as above
            self.cat.write(
                upsert_shards(None, newly.select("url_hash"), n_sh),
                "bloom_shards",
            )
            self.cat.vacuum("bloom_shards")
        self.cat.append_partitions(newly, "schedule_ext", "sched_round")

    # ------------------------------------------------------- frontier state
    def materialize_frontier(self) -> None:
        """Write the ``frontier`` snapshot (url, state, round) — an O(N)
        join of the schedule against the committed cache slices, run
        ONCE at drain end (round 1 rewrote this table every round).
        State is fully derivable: blocked (sched_round=-1) / fetched
        (2xx cache row) / failed (cache row) / queued (no cache row)."""
        sched = self._schedule_df().select(*SCHEDULE_COLS)
        ext = self.cat.read_slices("schedule_ext")
        if ext is not None:
            sched = sched.unionByName(ext.select(*SCHEDULE_COLS))
        cache = self.cache_df()
        if cache is None:
            attempts = self.spark.createDataFrame(
                [], "url_hash long, status int, fetched_round int"
            )
        else:
            attempts = cache.select("url_hash", "status", "fetched_round")
        frontier = sched.join(attempts, "url_hash", "left").select(
            "url",
            "url_hash",
            "host",
            "depth",
            "priority",
            F.when(F.col("sched_round") == -1, "blocked")
            .when(
                F.col("fetched_round").isNotNull()
                & F.col("status").between(200, 299),
                "fetched",
            )
            .when(F.col("fetched_round").isNotNull(), "failed")
            .otherwise("queued")
            .alias("state"),
            F.coalesce(F.col("fetched_round"), F.lit(-1)).alias("round"),
        )
        self.cat.write(
            frontier.select(*FRONTIER_COLS), "frontier", bucket_hint="url_hash"
        )
        self.cat.vacuum("frontier")

    # ------------------------------------------------------------ archive
    def archive_stage(self, images: DataFrame | None = None) -> dict:
        """The reference crawl's tail (§3.1, create_archives,
        archive.rs:356-403): 2xx filter (F6) → html_to_text parse (X2,
        Arrow-batched) → canonical dedup (F9) → parsed table; plus the
        north_star image path: join cached image_id FKs to the image
        table and decode/validate batch-wise (decode_check_udf) —
        phash/shape mismatches are counted, never silently dropped.

        This is the perfectly-parallel stage of the drain (pure
        per-partition Python over Arrow batches; ONE pass over the
        cache: input/image tallies ride the parse plan via ``observe``,
        the parsed count via ``observe`` on the written rows — the r3
        verdict's two extra full scans (parsed re-read + ok.count) are
        gone; one shuffle for the canonical dedup)."""
        from pyspark.sql import Observation

        cache = self.cache_df()
        if cache is None:
            return {
                "parsed": 0,
                "dupes_dropped": 0,
                "images_checked": 0,
                "image_failures": 0,
                "parse_fallbacks": 0,
            }
        ok = cache.filter(F.col("status").between(200, 299))
        in_aggs = [F.count(F.lit(1)).alias("n")]
        stamped = "image_ok" in ok.columns
        if stamped:
            # per-round validation already stamped the cache rows —
            # tally them on the same scan the parse consumes
            in_aggs += [
                F.sum(
                    F.when(F.col("image_id").isNotNull(), 1).otherwise(0)
                ).alias("img_n"),
                F.sum(
                    F.when(
                        F.col("image_id").isNotNull()
                        & ~F.coalesce(F.col("image_ok"), F.lit(False)),
                        1,
                    ).otherwise(0)
                ).alias("img_bad"),
            ]
        obs_in, obs_out = Observation(), Observation()
        ok = ok.observe(obs_in, *in_aggs)
        fb_acc = self.spark.sparkContext.accumulator(0)
        parsed = parse_pages(
            ok.select("url", "content"), fallback_counter=fb_acc
        )
        from netrunner_spark.operators.dedup import canonical_dedup

        deduped = canonical_dedup(parsed).observe(
            obs_out, F.count(F.lit(1)).alias("n")
        )
        self.cat.write(deduped, "parsed", bucket_hint="canonical_url")
        got_in, got_out = obs_in.get, obs_out.get
        n_total, n_parsed = got_in["n"], got_out["n"]

        images_checked = image_failures = 0
        if stamped:
            images_checked = got_in["img_n"] or 0
            image_failures = got_in["img_bad"] or 0
        elif images is not None:
            from netrunner_spark.images import decode_check_udf

            # match attach_image_checks' stamped policy exactly (r5
            # review): a ref whose image is MISSING from the store is a
            # failure — the old inner join silently dropped it from
            # both tallies. Decode each DISTINCT image once, then count
            # per ref row (the stamped path's per-row multiplicity).
            refs = ok.filter(F.col("image_id").isNotNull()).select("image_id")
            per_image = (
                refs.dropDuplicates()
                .join(
                    images.select("image_id", "bytes", "w", "h", "phash"),
                    "image_id",
                    "left",
                )
                .withColumn("chk", decode_check_udf(F.col("bytes")))
                .select(
                    "image_id",
                    (
                        ~F.coalesce(
                            F.col("chk.decode_ok")
                            & (F.col("chk.w_actual") == F.col("w"))
                            & (F.col("chk.h_actual") == F.col("h"))
                            & (F.col("chk.phash_actual") == F.col("phash")),
                            F.lit(False),
                        )
                    ).alias("bad"),
                )
            )
            verdicts = (
                refs.join(per_image, "image_id", "left")
                .select(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("bad"), 1).otherwise(0)).alias("bad"),
                )
                .collect()[0]
            )
            images_checked, image_failures = verdicts["n"], verdicts["bad"] or 0

        return {
            "parsed": n_parsed,
            "dupes_dropped": n_total - n_parsed,
            "images_checked": images_checked,
            "image_failures": image_failures,
            "parse_fallbacks": fb_acc.value,
        }

    # -------------------------------------------------------- maintenance
    def compact_cache(self, n_buckets: int | None = None) -> int | None:
        """Optional maintenance for long crawls (VERDICT r3 #10): fold
        the committed per-round cache slices into one bucketed base
        snapshot (key = url_hash, so the compacted cache joins the
        bucketed store/schedule exchange-free). Metric/expansion
        backfills run first, so a round folded away has nothing left to
        heal; resume keeps working because the compaction floor stands
        in for the deleted slice markers (``max_committed_slice``).
        Returns the highest round compacted, or None if < 1 slice.

        Metrics slices are folded too — they're tiny but also one dir
        per round; keyed on (host, round) so nothing collapses."""
        self._backfill_metrics()
        self._backfill_expansion()
        nb = n_buckets or self.cfg.colocated_buckets or 64
        hi = self.cat.compact_slices(
            "cache", "fetched_round", key="url_hash", n_buckets=nb
        )
        if hi is not None:
            self.cat.compact_slices(
                "metrics", "round", key=["host", "round"], n_buckets=1, upto=hi
            )
        return hi

    # ------------------------------------------------------------ full run
    def run(self) -> dict:
        import time as _time

        t0 = _time.time()
        self._backfill_metrics()
        self._backfill_expansion()
        start = self.current_round()
        total = 0
        rounds = 0
        r = start
        while rounds < self.cfg.max_rounds and r <= self.max_round():
            t_round = _time.time()
            total += self.run_round(r)
            if self.cfg.enforce_wall_clock and r < self.max_round():
                # politeness window is real time in live mode (W1):
                # each host got ≤ budget slots THIS window, so the next
                # window must not start before round_seconds elapse
                remaining = self.cfg.round_seconds - (_time.time() - t_round)
                if remaining > 0:
                    _time.sleep(remaining)
            rounds += 1
            r += 1
        # bulk per-host lineage/metrics for every round this run
        # committed (plus any a previous crash lost) — one scan + one
        # partitioned write instead of two jobs per round
        self._backfill_metrics()
        t_loop = _time.time() - t0
        self.materialize_frontier()
        return {
            "rounds": rounds,
            "fetched": total,
            "seconds_round_loop": round(t_loop, 3),
            "seconds_materialize": round(_time.time() - t0 - t_loop, 3),
        }
