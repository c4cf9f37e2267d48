"""Ranked retrieval over the crawled corpus — the "search" the crawl
feeds. The reference repo is the *crawler* crate of a search engine;
the corpus it lands exists to be queried. This module adds the query
side as Spark-first relational plans: an inverted-postings build and
BM25 top-k scoring for a (small) query set.

Beyond-reference training-pipeline operator (like textops' dedup
family): no reference twin exists; semantics follow Robertson &
Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond"
(2009), with one deliberate twist — ALL scoring arithmetic is exact
int64 (quantized rational idf, cross-multiplied saturation term) so
Spark and the DuckDB oracle produce bit-identical scores and the
driver's value-hash check is meaningful. A float BM25 can differ in
the last ulp across engines and flip tie-adjacent ranks.

Quantization (k1 = 6/5, b = 3/4 — the classic 1.2 / 0.75 as exact
rationals):

    idf_q(t)   = floor( (N - df + 0.5) * 1000 / (df + 0.5) )
               = ((N - df) * 2000 + 1000) div (2*df + 1)
    contrib(t) = floor( idf_q * tf * (k1+1) /
                        (tf + k1 * (1 - b + b * dl/avgdl)) )
               = (idf_q * 44 * tf * T) div (20*tf*T + 6*T + 18*dl*N)
      (both sides multiplied by 20·T; avgdl = T/N stays exact)
    score_q    = sum(contrib) over query terms

int64 bound: idf_q*44*tf*T < 2^63 → holds while N·T ≲ 2e14
(e.g. 1e6 docs × 1e8 tokens). Past that, production ranking drops the
quantization for float64 (ranking tolerates ulp noise; only the
oracle needs exactness) — the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["postings", "bm25_topk", "snippets", "SearchIndex", "phrase_match", "facet_counts"]

TOKEN_PATTERN = "[^a-z]+"


def _tokens(docs: DataFrame, id_col: str, text_col: str, pattern: str) -> DataFrame:
    return docs.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), pattern)).alias("token"),
    ).filter(F.col("token") != "")


def postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Inverted postings: one row per (token, doc) with term frequency
    → ``(token, doc_id, tf)``. The materialization a search index is
    built from; also the left side of :func:`bm25_topk`.

    Shape at 100 TB: explode is map-side; ONE shuffle (hash aggregate
    on (doc_id, token) — partial map-side combine absorbs within-doc
    repetition before the exchange). Zipf-hot tokens are aggregate
    groups, never a join fan-out.
    """
    return (
        _tokens(docs, id_col, text_col, pattern)
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _query_terms(queries: DataFrame, pattern: str) -> DataFrame:
    return (
        queries.select(
            "query_id",
            F.explode(F.split(F.lower(F.col("query")), pattern)).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def _qweights(qterms: DataFrame, dft: DataFrame, stats: DataFrame) -> DataFrame:
    """Per-(query, term) quantized idf + corpus stats — tiny, broadcast."""
    return (
        qterms.join(dft, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "token",
            F.expr("((nd - df) * 2000 + 1000) div (2 * df + 1)").alias("idf_q"),
            "tt",
            "nd",
        )
    )


def _score_and_rank(
    tf: DataFrame,
    dl: DataFrame,
    qweights: DataFrame,
    k: int,
    id_col: str,
    rank_buckets: int,
) -> DataFrame:
    """Shared scoring tail of the direct and index-backed paths:
    postings ⨝ broadcast(query weights) → per-(query, doc) exact-int
    BM25 sum → deterministic top-k (optionally two-level skew-safe)."""
    contrib = (
        tf.join(F.broadcast(qweights), "token")
        .join(dl, id_col)
        .select(
            "query_id",
            id_col,
            F.expr(
                "(idf_q * 44 * tf * tt) div (20 * tf * tt + 6 * tt + 18 * dl * nd)"
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", id_col).agg(F.sum("c").alias("score_q"))

    order = [F.col("score_q").desc(), F.col(id_col).asc()]
    if rank_buckets > 0:
        wb = Window.partitionBy(
            "query_id", F.pmod(F.xxhash64(id_col), F.lit(rank_buckets))
        ).orderBy(*order)
        scored = (
            scored.withColumn("brk", F.row_number().over(wb))
            .filter(F.col("brk") <= k)
            .drop("brk")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score_q", "rk")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
    rank_buckets: int = 0,
) -> DataFrame:
    """BM25 top-k docs per query → ``(query_id, doc_id, score_q, rk)``,
    exact-integer scoring (module docstring), total order
    (score_q DESC, doc_id ASC) so the k-boundary is deterministic.

    ``queries`` is ``(query_id, query)`` and is assumed SMALL (a query
    batch, not a table): its term set is broadcast into the postings
    join, so the corpus-sized side never shuffles on token.

    Shape at 100 TB:
      * postings + doc lengths: the explode feeds two hash aggregates
        (map-side combined); corpus stats (N, T) come from a 1-row agg
        cross-joined back (no driver collect).
      * candidate generation: postings ⨝ broadcast(query-term weights)
        — filters the corpus to docs containing ≥1 query term BEFORE
        any shuffle on doc.
      * per-(query, doc) score: one hash aggregate over candidates.
      * top-k: Spark ≥3.5's rank-limit pushdown already plants a
        PARTIAL WindowGroupLimit before the window exchange (each map
        partition forwards ≤ k rows per query — pinned in tests), so
        the plain rank is skew-bounded natively. ``rank_buckets = B >
        0`` adds an explicit two-level rank — per (query,
        pmod(hash(doc), B)) row_number ≤ k, THEN the global per-query
        rank (same treatment as sampling.stratified_sample_skewsafe) —
        belt-and-braces for engines without the pushdown; identical
        output (each bucket keeps ≥ its global-top-k members).
    """
    toks = _tokens(docs, id_col, text_col, pattern)
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("tt"), F.count(F.lit(1)).alias("nd")
    )  # 1 row, stays lazy
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qweights = _qweights(_query_terms(queries, pattern), dft, stats)
    return _score_and_rank(tf, dl, qweights, k, id_col, rank_buckets)


class SearchIndex:
    """INCREMENTAL build-once / query-many inverted index persisted to
    the lake — the architecture a 100 TB search corpus actually needs:
    queries must not re-tokenize the corpus (bm25_topk's two corpus
    aggregates) on every batch, and a crawl round's NEW pages must not
    force a full index rebuild.

    Layout: one SLICE per ``build``/``append`` call —
      * ``<name>_postings_<i>`` (token, doc, tf) — BUCKETED on token,
        so a query batch's ``token IN (...)`` scan prunes to the
        buckets containing the query terms (Spark bucket pruning; the
        scan's ``SelectedBucketsCount`` is pinned in tests). At 100 TB
        this is the difference between reading |postings| and reading
        ~|terms|/|buckets| of it per query batch.
      * ``<name>_dft_<i>`` (token, df) — vocabulary-sized, same
        bucketing.
      * ``<name>_dl_<i>`` (doc, dl) — per-slice doc lengths.
      * ``<name>_stats`` — one row per slice (slice, tt, nd,
        n_buckets, id_col, pattern); the tokenizer/bucket config is
        persisted so a resumed session (or an append) can't silently
        diverge from the built index.

    Incrementality is exact, not approximate: slices index DISJOINT
    doc sets (``append`` enforces this with an anti-join guard), so
    df/dl/tt/nd are all ADDITIVE — query-time df is the per-slice sum
    for the (tiny) query-term set only, never a corpus-wide re-merge.
    Scoring equals a from-scratch rebuild bit-for-bit (tested), which
    also makes the index-backed driver query share bm25_search's
    DuckDB oracle verbatim.

    ``topk`` = same exact-int scoring as :func:`bm25_topk` (shared
    ``_score_and_rank``). The query batch's term list is collected
    driver-side (bounded: it is the query batch) to plant literal
    ``isin`` predicates the bucket pruner can use.
    """

    def __init__(self, cat, name: str = "search_index"):
        self.cat = cat
        self.name = name

    # ------------------------------------------------------------ write
    def _write_slice(
        self, docs, i, n_buckets, id_col, text_col, pattern, positions
    ):
        from pyspark import StorageLevel

        words = F.filter(
            F.split(F.lower(F.col(text_col)), pattern), lambda t: t != F.lit("")
        )
        # persist the exploded tokens + tf across the 4-5 artifact
        # writes below (r5 review: each write re-ran split+posexplode
        # over the whole corpus — ~4x the indexing cost for nothing)
        toks = docs.select(
            id_col, F.posexplode(words).alias("pos", "token")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        tf = (
            toks.groupBy("token", id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
        self.cat.write_table_bucketed(
            tf, f"{self.name}_postings_{i}", "token", n_buckets
        )
        dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        self.cat.write_table_bucketed(
            dft, f"{self.name}_dft_{i}", "token", n_buckets
        )
        self.cat.write(dl, f"{self.name}_dl_{i}")
        if positions:
            # positional postings: (token, doc, sorted positions) —
            # same bucketing, feeds indexed phrase search
            pos = toks.groupBy("token", id_col).agg(
                F.sort_array(F.collect_list("pos")).alias("positions")
            )
            self.cat.write_table_bucketed(
                pos, f"{self.name}_pos_{i}", "token", n_buckets
            )
        stats = dl.agg(
            F.lit(i).alias("slice"),
            F.sum("dl").alias("tt"),
            F.count(F.lit(1)).alias("nd"),
            F.lit(n_buckets).alias("n_buckets"),
            F.lit(id_col).alias("id_col"),
            F.lit(pattern).alias("pattern"),
            F.lit(positions).alias("positions"),
        ).localCheckpoint(eager=True)
        toks.unpersist()
        tf.unpersist()
        return stats

    def build(
        self,
        docs: DataFrame,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        pattern: str = TOKEN_PATTERN,
        positions: bool = False,
    ) -> None:
        # a rebuild invalidates any prior delete() markers (r5 review:
        # stale tombstones silently excluded freshly indexed docs with
        # recycled ids AND corrupted the dead-stats subtraction)
        self.cat.drop(f"{self.name}_tombstones")
        stats = self._write_slice(
            docs, 0, n_buckets, id_col, text_col, pattern, positions
        )
        self.cat.write(stats, f"{self.name}_stats")
        self._fold_idbloom(docs, id_col, fresh=True)

    _IDBLOOM_SHARDS = 8

    def _fold_idbloom(self, docs: DataFrame, id_col: str, fresh: bool = False) -> None:
        """Fold the slice's doc ids into the index's id-membership bloom
        — the O(delta) pre-filter for append's disjointness guard."""
        from netrunner_spark.operators.seen import upsert_shards

        t = f"{self.name}_idbloom"
        keys = docs.select(
            F.xxhash64(F.col(id_col).cast("string")).alias("url_hash")
        )
        old = None if fresh else (self.cat.read(t) if self.cat.exists(t) else None)
        self.cat.write(upsert_shards(old, keys, self._IDBLOOM_SHARDS), t)

    def append(self, docs_delta: DataFrame, text_col: str = "text") -> None:
        """Index a crawl round's NEW docs as one more slice — O(delta)
        work, no rebuild. Raises if the delta shares ids with an
        existing slice (additivity of df/dl/tt/nd requires disjoint
        doc sets; re-crawled pages belong in a compact-and-rebuild,
        the same policy as tables.compact_slices)."""
        prior = self.cat.read(f"{self.name}_stats")
        rows = prior.collect()  # bounded: one row per slice
        cfg = rows[0]
        i = 1 + max(r["slice"] for r in rows)
        id_col = cfg["id_col"]
        # overlap is judged against LIVE docs: a tombstoned id may be
        # re-indexed (that is exactly what update() does).
        # Bloom pre-filter keeps the guard O(delta) (r5 review: the
        # unconditional anti-join scanned EVERY slice's dl table per
        # append — O(total indexed docs), the quadratic-resume shape
        # this module's slicing exists to avoid). Only ids the bloom
        # flags maybe-present pay the exact cross-slice check; a bloom
        # false positive merely costs that scan, never a wrong verdict.
        check = docs_delta.select(id_col)
        bloom = (
            self.cat.read(f"{self.name}_idbloom")
            if self.cat.exists(f"{self.name}_idbloom")
            else None
        )
        if bloom is not None:
            from netrunner_spark.operators.seen import bloom_partition

            tagged = bloom_partition(
                check.withColumn(
                    "url_hash", F.xxhash64(F.col(id_col).cast("string"))
                ),
                bloom,
                self._IDBLOOM_SHARDS,
            )
            check = tagged.filter(F.col("maybe_seen")).select(id_col)
            if not check.take(1):
                check = None
        if check is not None:
            dl_old = self._dl_union(
                [r["slice"] for r in rows], self._tombstones(), id_col
            )
            overlap = check.join(
                dl_old.select(id_col), id_col, "left_semi"
            ).count()
            if overlap:
                raise ValueError(
                    f"append delta shares {overlap} doc ids with the index; "
                    "slices must be disjoint — compact and rebuild instead"
                )
        stats = self._write_slice(
            docs_delta,
            i,
            cfg["n_buckets"],
            id_col,
            text_col,
            cfg["pattern"],
            cfg["positions"],
        )
        self.cat.write(prior.unionByName(stats), f"{self.name}_stats")
        self._fold_idbloom(docs_delta, id_col)

    # ----------------------------------------------------------- delete
    def _tombstones(self):
        t = f"{self.name}_tombstones"
        return self.cat.read(t) if self.cat.exists(t) else None

    @staticmethod
    def _live(df, i, tomb, id_col):
        """Drop slice ``i``'s rows for docs tombstoned AT OR AFTER it.

        Tombstones are slice-scoped (``upto`` = the max slice at delete
        time), so a doc re-added in a LATER slice survives: the
        tombstone kills only the old slices' rows. Tombstone batches
        are bounded (explicit delete calls), hence broadcast."""
        if tomb is None:
            return df
        kill = tomb.filter(F.col("upto") >= i).select(id_col)
        return df.join(F.broadcast(kill), id_col, "left_anti")

    def delete(self, doc_ids: DataFrame) -> None:
        """Tombstone-delete docs from the index — O(batch) write, no
        slice rewrite. Queries stay EXACT: postings/dl rows of
        tombstoned docs are anti-joined out per slice, query-term df is
        recomputed from the live postings, and tt/nd are corrected by
        one map-only pass over the (doc, dl) tables (the cheapest
        corpus-order table; the broadcast anti-join adds no shuffle).
        A compact-and-rebuild folds tombstones away when they grow."""
        stats = self.cat.read(f"{self.name}_stats")
        rows = stats.collect()  # bounded: one row per slice
        id_col = rows[0]["id_col"]
        upto = max(r["slice"] for r in rows)
        tomb = (
            doc_ids.select(F.col(doc_ids.columns[0]).alias(id_col))
            .dropDuplicates()
            .withColumn("upto", F.lit(upto))
        )
        old = self._tombstones()
        if old is not None:
            tomb = old.unionByName(tomb)
        self.cat.write(
            tomb.localCheckpoint(eager=True), f"{self.name}_tombstones"
        )

    def update(self, docs_new: DataFrame, text_col: str = "text") -> None:
        """Replace docs (the recrawl case): tombstone the old rows,
        index the new text as a fresh slice. Exact — a query on the
        updated index matches a from-scratch rebuild bit-for-bit
        (pinned in tests/test_retrieval_delete.py)."""
        rows = self.cat.read(f"{self.name}_stats").collect()
        self.delete(docs_new.select(rows[0]["id_col"]))
        self.append(docs_new, text_col)

    # ------------------------------------------------------------- read
    def _dl_union(self, slices, tomb=None, id_col=None):
        dfs = [
            self._live(
                self.cat.read(f"{self.name}_dl_{i}"), i, tomb, id_col
            )
            for i in sorted(slices)
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        rank_buckets: int = 0,
    ) -> DataFrame:
        stats_df = self.cat.read(f"{self.name}_stats")
        rows = stats_df.collect()  # bounded: one row per slice
        id_col, pattern = rows[0]["id_col"], rows[0]["pattern"]
        slices = sorted(r["slice"] for r in rows)
        tomb = self._tombstones()
        qterms = _query_terms(queries, pattern)
        # literal term list → isin predicate the bucket pruner can use
        terms = [r["token"] for r in qterms.select("token").distinct().collect()]

        def _union(kind):
            dfs = [
                self._live(
                    self.cat.read_table(f"{self.name}_{kind}_{i}").filter(
                        F.col("token").isin(terms)
                    ),
                    i,
                    tomb,
                    id_col,
                )
                for i in slices
            ]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out

        tf = _union("postings")
        if tomb is None:
            # df is additive across disjoint slices; this aggregate runs
            # on the bucket-pruned query-term rows only, not the
            # vocabulary
            dft = _union("dft").groupBy("token").agg(F.sum("df").alias("df"))
            stats = stats_df.agg(F.sum("tt").alias("tt"), F.sum("nd").alias("nd"))
        else:
            # with tombstones the stored per-slice df is stale for
            # deleted docs — recount from the LIVE pruned postings
            # (exact: one row per (token, live doc)); tt/nd get the
            # tombstoned docs' dl subtracted via one map-only pass
            dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
            dead = [
                self.cat.read(f"{self.name}_dl_{i}").join(
                    F.broadcast(
                        tomb.filter(F.col("upto") >= i).select(id_col)
                    ),
                    id_col,
                    "left_semi",
                )
                for i in slices
            ]
            dead_u = dead[0]
            for d in dead[1:]:
                dead_u = dead_u.unionByName(d)
            corr = dead_u.agg(
                F.coalesce(F.sum("dl"), F.lit(0)).alias("dtt"),
                F.count(F.lit(1)).alias("dnd"),
            )
            stats = (
                stats_df.agg(F.sum("tt").alias("_tt"), F.sum("nd").alias("_nd"))
                .crossJoin(corr)
                .select(
                    (F.col("_tt") - F.col("dtt")).alias("tt"),
                    (F.col("_nd") - F.col("dnd")).alias("nd"),
                )
            )
        dl = self._dl_union(slices, tomb, id_col)
        qweights = _qweights(qterms, dft, stats)
        return _score_and_rank(tf, dl, qweights, k, id_col, rank_buckets)

    def phrase(self, phrases: DataFrame) -> DataFrame:
        """Indexed exact-phrase search → ``(query_id, doc_id, n_occ)``
        — :func:`phrase_match` semantics WITHOUT re-tokenizing the
        corpus: the positional postings slices are bucket-pruned to the
        phrase's tokens, exploded back to (token, doc, pos), and the
        same positional full-house (countDistinct(qpos) = m at
        s = pos − qpos) counts occurrences. Requires
        ``build(..., positions=True)``."""
        stats_df = self.cat.read(f"{self.name}_stats")
        rows = stats_df.collect()  # bounded: one row per slice
        if not rows[0]["positions"]:
            raise ValueError("index built without positions=True")
        id_col, pattern = rows[0]["id_col"], rows[0]["pattern"]
        slices = sorted(r["slice"] for r in rows)
        qwords = F.filter(
            F.split(F.lower(F.col("phrase")), pattern), lambda t: t != F.lit("")
        )
        qt = phrases.select(
            "query_id", F.posexplode(qwords).alias("qpos", "token")
        )
        qm = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("m"))
        terms = [
            r["token"] for r in qt.select("token").distinct().collect()
        ]  # bounded: the phrase batch
        tomb = self._tombstones()
        dfs = [
            self._live(
                self.cat.read_table(f"{self.name}_pos_{i}").filter(
                    F.col("token").isin(terms)
                ),
                i,
                tomb,
                id_col,
            )
            for i in slices
        ]
        pos = dfs[0]
        for d in dfs[1:]:
            pos = pos.unionByName(d)
        toks = pos.select(
            "token", id_col, F.explode("positions").alias("pos")
        )
        cand = (
            toks.join(F.broadcast(qt), "token")
            .select(
                "query_id", id_col, (F.col("pos") - F.col("qpos")).alias("s"), "qpos"
            )
            .filter(F.col("s") >= 0)
        )
        occ = cand.groupBy("query_id", id_col, "s").agg(
            F.countDistinct("qpos").alias("hit")
        )
        return (
            occ.join(F.broadcast(qm), "query_id")
            .filter(F.col("hit") == F.col("m"))
            .groupBy("query_id", id_col)
            .agg(F.count(F.lit(1)).alias("n_occ"))
        )


def snippets(
    hits: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Search-result snippet per hit: the ±``window``-token context
    around the EARLIEST query-term occurrence in the doc →
    ``hits`` columns + ``snippet`` (null when no term matches — can't
    happen for BM25 hits, whose score requires ≥1 matching term).

    Entirely JVM-side higher-order functions (transform / filter /
    array_min / slice) over the tokenized doc — no Python UDF, no
    extra shuffle beyond the two joins:

      * hits (k·|queries| rows — SMALL) broadcast into the corpus scan
        on ``id_col``: only hit docs survive the join, so the
        tokenize+slice work is O(hits), not O(corpus).
      * queries joined in the same broadcast (tiny).
    """
    small = F.broadcast(hits.join(queries, "query_id"))
    joined = docs.select(id_col, text_col).join(small, id_col)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), pattern), lambda t: t != F.lit("")
    )
    qtoks = F.filter(
        F.split(F.lower(F.col("query")), pattern), lambda t: t != F.lit("")
    )
    first_pos = F.array_min(
        F.filter(
            F.transform(qtoks, lambda t: F.array_position(words, t)),
            lambda p: p > 0,
        )
    )
    start = F.greatest(F.lit(1), (first_pos - window).cast("int"))
    snippet = F.array_join(F.slice(words, start, 2 * window + 1), " ")
    return joined.withColumn("snippet", snippet).drop(text_col, "query")


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Exact-phrase search → ``(query_id, doc_id, n_occ)`` for docs
    containing the phrase's tokens ADJACENT and in order (over the
    blank-filtered token sequence), with the occurrence count.

    The positional trick keeps this one broadcast join + two hash
    aggregates — no per-term self-joins, no UDFs: a phrase of length m
    starts at position s iff for EVERY phrase offset qpos there is a
    doc token match at pos = s + qpos. Join tokens to the (broadcast,
    tiny) phrase terms on token, derive s = pos − qpos, and count
    DISTINCT qpos per (query, doc, s): a full house (= m) is one
    occurrence. Repeated phrase terms ("batch batch") work because one
    doc position can witness several qpos rows.

    Shape at 100 TB: posexplode is map-side; the token join broadcasts
    the phrase terms so the corpus never shuffles on token; the (query,
    doc, s) aggregate is map-side combined and its groups are at most
    phrase-length-sized. Hot tokens fan out pre-aggregate rows, never
    pairs.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), pattern), lambda t: t != F.lit("")
    )
    toks = docs.select(id_col, F.posexplode(words).alias("pos", "token"))
    qwords = F.filter(
        F.split(F.lower(F.col("phrase")), pattern), lambda t: t != F.lit("")
    )
    qt = phrases.select(
        "query_id", F.posexplode(qwords).alias("qpos", "token")
    )
    qm = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("m"))
    cand = toks.join(F.broadcast(qt), "token").select(
        "query_id", id_col, (F.col("pos") - F.col("qpos")).alias("s"), "qpos"
    ).filter(F.col("s") >= 0)
    occ = cand.groupBy("query_id", id_col, "s").agg(
        F.countDistinct("qpos").alias("hit")
    )
    return (
        occ.join(F.broadcast(qm), "query_id")
        .filter(F.col("hit") == F.col("m"))
        .groupBy("query_id", id_col)
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )


def facet_counts(
    hits: DataFrame,
    docs: DataFrame,
    facets: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Result-page facets → ``(query_id, facet, value, cnt)``: per
    query, the distribution of the hit set over each facet column
    (lang, source, …), values stringified so heterogeneous facets share
    one output schema.

    Shape at 100 TB: hits are SMALL (k per query) and broadcast into
    the corpus scan — only hit docs survive, column-pruned to the facet
    columns; the multi-facet unpivot is one map-side explode of a
    literal map; the final count is a tiny hash aggregate. O(hits),
    not O(corpus).
    """
    joined = docs.select(id_col, *facets).join(
        F.broadcast(hits.select("query_id", id_col)), id_col
    )
    pairs = []
    for f in facets:
        pairs.extend([F.lit(f), F.col(f).cast("string")])
    return (
        joined.select(
            "query_id", F.explode(F.create_map(*pairs)).alias("facet", "value")
        )
        .groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def boolean_and(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Conjunctive (AND-semantics) boolean retrieval → docs containing
    EVERY distinct query term, ranked by total matched term frequency
    → ``(query_id, doc_id, tf_total, rk)`` (ties → smaller doc id).

    The filter-style complement to :func:`bm25_topk`'s OR-semantics
    ranking — "all words must appear" is the default mode of most
    search UIs and the candidate pre-filter of a two-stage ranker.

    Shape at 100 TB: postings ⨝ BROADCAST(query terms) keeps only
    matching rows (the corpus never shuffles on token); the AND test is
    a full-house count — ``countDistinct(token) == n_terms`` per
    (query, doc) — one hash aggregate, NOT the textbook m-way postings
    self-intersection join. Zipf-hot query terms fan out postings rows
    already aggregated per (token, doc), never per occurrence.
    """
    qterms = _query_terms(queries, pattern)
    nterms = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms")
    )
    tf = postings(docs, id_col, text_col, pattern)
    grp = (
        tf.join(F.broadcast(qterms), "token")
        .groupBy("query_id", id_col)
        .agg(
            F.countDistinct("token").alias("n_hit"),
            F.sum("tf").alias("tf_total"),
        )
    )
    full = (
        grp.join(F.broadcast(nterms), "query_id")
        .filter(F.col("n_hit") == F.col("n_terms"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("tf_total").desc(), F.col(id_col).asc()
    )
    return (
        full.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "tf_total", "rk")
    )


def spell_candidates(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """SymSpell-style spelling-variant pairs over the corpus vocabulary
    → ``(tok_a, tok_b, cnt_a, cnt_b)`` with Levenshtein distance
    exactly 1, tok_a < tok_b (the query-correction / vocabulary-
    normalization table of a search stack).

    The scale trick (Garbe's SymSpell, public domain): two tokens
    within edit distance 1 MUST share a member of each other's
    deletion neighborhood (the token itself + every 1-deletion
    variant), so candidate generation is an EQUI-join on variant
    strings — never the vocabulary cross join (|V|² at 10⁸ tokens).
    Shared variants can also reach distance-2 pairs (substitutions /
    swaps both deleting), so candidates are VERIFIED with the exact
    Levenshtein filter; both Spark and DuckDB implement classic
    Levenshtein, making the twin bit-exact. ``min_count`` prunes the
    vocabulary to tokens worth correcting toward/from, which also
    bounds the variant join's bucket sizes.

    Shape at 100 TB: one vocab aggregate; variants are a map-side
    explode of (len+1) strings per token; the self-equi-join on
    variant has Zipf-bounded buckets (a variant is shared by few real
    words); dedup + verify are row-local after the join.
    """
    vocab = (
        _tokens(docs, id_col, text_col, pattern)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    variants = vocab.select(
        "token",
        "cnt",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("token")),
                    F.expr(
                        "transform(sequence(1, length(token)),"
                        " i -> concat(substr(token, 1, i - 1),"
                        "             substr(token, i + 1, length(token))))"
                    ),
                )
            )
        ).alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    pairs = (
        a.join(b, "v")
        .filter(F.col("a.token") < F.col("b.token"))
        .select(
            F.col("a.token").alias("tok_a"),
            F.col("a.cnt").alias("cnt_a"),
            F.col("b.token").alias("tok_b"),
            F.col("b.cnt").alias("cnt_b"),
        )
        .dropDuplicates(["tok_a", "tok_b"])
    )
    return pairs.filter(
        F.levenshtein(F.col("tok_a"), F.col("tok_b")) == 1
    ).select("tok_a", "tok_b", "cnt_a", "cnt_b")


def correct_query_terms(
    queries: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
    min_count: int = 1,
) -> DataFrame:
    """Did-you-mean query correction → ``(query_id, token, corrected,
    cnt)``: each query term maps to itself when in-vocabulary, else to
    the most frequent vocabulary token within Levenshtein distance 1
    (cnt desc, token asc tie-break — deterministic); terms with no
    candidate are dropped, the standard "no results for X" path.

    The online half of :func:`spell_candidates`: the QUERY side's
    deletion neighborhood equi-joins the vocabulary's — candidates
    verified with exact levenshtein ≤ 1, never a |Q|×|V| cross join.
    Query terms are tiny, so their variant explosion broadcasts; the
    vocabulary variant table is the same map-side explode the offline
    operator uses.
    """
    vocab = (
        _tokens(docs, id_col, text_col, pattern)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    qterms = _query_terms(queries, pattern)
    exact = qterms.join(vocab, "token").select(
        "query_id", "token", F.col("token").alias("corrected"), "cnt"
    )
    unknown = qterms.join(vocab, "token", "left_anti")

    def variants(df, tok_col):
        return df.select(
            *df.columns,
            F.explode(
                F.array_distinct(
                    F.concat(
                        F.array(F.col(tok_col)),
                        F.expr(
                            f"transform(sequence(1, length({tok_col})),"
                            f" i -> concat(substr({tok_col}, 1, i - 1),"
                            f"             substr({tok_col}, i + 1, length({tok_col}))))"
                        ),
                    )
                )
            ).alias("v"),
        )

    qv = variants(unknown, "token")
    vv = variants(
        vocab.withColumnRenamed("token", "corrected"), "corrected"
    )
    cand = (
        F.broadcast(qv)
        .join(vv, "v")
        .filter(F.levenshtein(F.col("token"), F.col("corrected")) <= 1)
        .dropDuplicates(["query_id", "token", "corrected"])
    )
    w = Window.partitionBy("query_id", "token").orderBy(
        F.col("cnt").desc(), F.col("corrected").asc()
    )
    fixed = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("query_id", "token", "corrected", "cnt")
    )
    return exact.unionByName(fixed)
