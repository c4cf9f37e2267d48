"""Training-data text operators over a documents corpus — the 100 TB
pipeline toolkit the engine adds beyond the reference (task spec):
exact dedup, MinHash+LSH, SimHash, n-gram Jaccard, language-ID,
quality scoring, token counting, document fingerprinting.

Design rules for scale AND oracle-matching:
  * everything is built-in pyspark.sql.functions (JVM, codegen) — the
    higher-order array functions (transform/aggregate/filter) run
    JVM-side; zero Python UDFs in any of these plans;
  * hash arithmetic is EXACT int64 (polynomial rolling hashes,
    (a·x+b) mod p permutations) so a DuckDB oracle reproduces values
    bit-for-bit — no engine-specific hash functions in compared output;
  * heavy self-joins (Jaccard) go through explode → equi-join → count
    (shuffle on the gram key, partial aggregation applies) instead of
    array intersections on a cross join — the difference between O(n²)
    and O(pairs-with-shared-gram) at corpus scale.

MOD is 2^31-1 so (acc·31 + code) stays < 2^36 ≪ int64 — no overflow in
either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MOD = 2_147_483_647  # 2^31 - 1
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


# ------------------------------------------------------------------ scalars
def char_fingerprint(col: str = "text"):
    """Polynomial rolling hash over characters (X5-analog content
    fingerprint): fold(acc*31 + codepoint) mod 2^31-1. Exact int64."""
    return F.aggregate(
        F.split(F.col(col), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(MOD),
    )


def gram_hash(gram_col, fixed_len: int | None = None):
    """Hash one n-gram string with the same polynomial fold.

    ``fixed_len``: when every input is known to be exactly that many
    characters (the char-shingle call sites), the fold is UNROLLED into
    a codegen-friendly arithmetic chain — identical value (verified
    per-row against the fold at sf0.1), no per-gram array allocation
    or interpreted lambda (r6 optimization, guide §4.1)."""
    if fixed_len is not None:
        h = F.lit(0).cast("long")
        for i in range(1, fixed_len + 1):
            h = (h * F.lit(31) + F.ascii(F.substring(gram_col, i, 1))) % F.lit(MOD)
        return h
    return F.aggregate(
        F.split(gram_col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(MOD),
    )


def exploded_grams(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """docs → (doc_id, pos, gram) — one row per n-gram occurrence."""
    c = F.col(text_col)
    return (
        docs.select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.length(c) - F.lit(n), F.lit(0))),
                    lambda i: c.substr(i + F.lit(1), F.lit(n)),
                )
            ).alias("pos", "gram"),
        )
        .filter(F.length("gram") == n)
    )


# --------------------------------------------------------------- operators
def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash (md5 — same in DuckDB)."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def cross_source_dups(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Exact-duplicate groups that span MULTIPLE sources — the signal a
    training mix uses to pick which source keeps a shared document (and
    to measure inter-source contamination, e.g. the same page arriving
    via two crawls). Extends `dedup_exact` with the source dimension.

    → (text_hash, n_copies, n_sources, keep_id, keep_source) for groups
    with n_sources > 1; keeper = min doc_id, keep_source = that doc's
    source via min_by (single aggregate, no second join).

    Shape at 100 TB: one hash aggregate on md5(text) with map-side
    partial combine; the n_sources > 1 filter runs post-agg on the
    already-tiny group table. No window, no self-join.
    """
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.count_distinct(F.col(source_col)).alias("n_sources"),
            F.min("doc_id").alias("keep_id"),
            F.min_by(F.col(source_col), F.col("doc_id")).alias("keep_source"),
        )
        .filter(F.col("n_sources") > 1)
    )


# PII-ish patterns kept to syntax both Java regex (Spark) and RE2
# (DuckDB) evaluate identically: plain classes + quantifiers, no
# lookaround/backrefs. Counts are signals for a scrubbing pass, not a
# redactor — the engine stays policy-free.
PATTERN_SCAN = (
    ("n_emails", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("n_urls", r"https?://[^\s]+"),
    ("n_long_digits", r"[0-9]{9,}"),
)


def pattern_scan(docs: DataFrame, patterns=PATTERN_SCAN) -> DataFrame:
    """Per-document occurrence counts of scrub-relevant patterns
    (emails, URLs, long digit runs ≈ phone/ID/card candidates) — the
    pre-filter a pipeline runs to route documents to PII review or
    drop them outright.

    → (doc_id, n_emails, n_urls, n_long_digits) exact ints. Pure
    projection (regexp_count is JVM codegen): map-only at 100 TB,
    zero shuffles, column-pruned to (doc_id, text).
    """
    return docs.select(
        "doc_id",
        *[
            F.regexp_count(F.col("text"), F.lit(rx)).cast("long").alias(name)
            for name, rx in patterns
        ],
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Token/char counting + quality counters, all exact ints:
    n_tokens (whitespace split), n_alpha, n_digit, n_stopwords."""
    text = F.col("text")
    toks = F.split(F.trim(text), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(text, "[^0-9]", "")).alias("n_digit"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stopwords"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristic in basis points (int: ratio×10000 floor) —
    stopword presence, alpha ratio, length band."""
    s = token_stats(docs)
    return s.select(
        "doc_id",
        (F.col("n_alpha") * 10000 / F.greatest(F.col("n_chars_actual"), F.lit(1)))
        .cast("long")
        .alias("alpha_bps"),
        (F.col("n_stopwords") * 10000 / F.greatest(F.col("n_tokens"), F.lit(1)))
        .cast("long")
        .alias("stopword_bps"),
        F.when(F.col("n_tokens") < 10, "too_short")
        .when(F.col("n_tokens") > 100000, "too_long")
        .otherwise("ok")
        .alias("length_band"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language heuristic (deterministic, SQL-expressible):
    argmax of per-language marker hits; CJK codepoints force zh;
    nothing matched → und."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    markers = {
        "en": ("the", "of", "and", "a"),
        "de": ("der", "die", "das", "und"),
        "es": ("el", "la", "los", "que"),
        "fr": ("le", "les", "des", "et"),
    }
    cols = []
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        cols.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                f"hits_{lang}"
            )
        )
    scored = docs.select("doc_id", F.col("text"), *cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in markers])
    pred = F.when(F.col("text").rlike(r"[一-鿿]"), "zh")
    for lang in markers:  # first-wins tie order: en, de, es, fr
        pred = pred.when((best > 0) & (F.col(f"hits_{lang}") == best), lang)
    return scored.select("doc_id", pred.otherwise("und").alias("pred_lang"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): rolling-hash content fingerprint."""
    return docs.select("doc_id", char_fingerprint().alias("fingerprint"))


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    max_doc_id: int | None = None,
    max_gram_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity for candidate pairs sharing ≥1 gram.

    Relational formulation (explode → join on gram → count): scales by
    shuffling gram keys (partial agg on (gram, doc) first) instead of
    cross-joining documents. Output exact ints: n_common over distinct
    grams + each side's distinct-gram count.

    ``max_gram_df``: hot-gram cap — the gram self-join is QUADRATIC in
    per-gram document frequency (a stop-gram in 10^8 docs would emit
    10^16 join rows), so grams appearing in more than this many docs
    are dropped from the JOIN side before pairing (the standard
    stop-gram cut; n_grams denominators still count every gram). The
    LSH path (``minhash_lsh_pairs``) is the preferred scale route.
    """
    base = docs if max_doc_id is None else docs.filter(F.col("doc_id") < max_doc_id)
    grams = exploded_grams(base, n).select("doc_id", "gram").dropDuplicates()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    join_grams = grams
    if max_gram_df is not None:
        hot = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_gram_df)
            .select("gram")
        )
        join_grams = grams.join(hot, "gram", "left_anti")
    a = join_grams.alias("a")
    b = join_grams.alias("b")
    common = (
        a.join(b, "gram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_grams", "grams_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_grams", "grams_b"
            ),
            "doc_b",
        )
        .select("doc_a", "doc_b", "n_common", "grams_a", "grams_b")
    )


def minhash_signatures(
    docs: DataFrame, k: int = 16, n: int = 3, max_doc_id: int | None = None
) -> DataFrame:
    """MinHash signatures: h_j(g) = (a_j·g + b_j) mod p over distinct
    gram hashes, j < k. → (doc_id, j, minhash). Exact int64 arithmetic
    (g < 2^31, a_j < 2^31 ⇒ products < 2^62)."""
    base = docs if max_doc_id is None else docs.filter(F.col("doc_id") < max_doc_id)
    grams = (
        exploded_grams(base, n)
        .select("doc_id", gram_hash(F.col("gram"), fixed_len=n).alias("g"))
        .dropDuplicates()
    )
    perms = F.sequence(F.lit(0), F.lit(k - 1))
    expanded = grams.select(
        "doc_id", "g", F.explode(perms).alias("j")
    ).select(
        "doc_id",
        "j",
        (
            ((F.col("j") * 2 + 1) * 104729 % MOD * F.col("g") + F.col("j") * 7919 + 1)
            % MOD
        ).alias("h"),
    )
    return expanded.groupBy("doc_id", "j").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_doc_id: int | None = None,
    max_band_df: int | None = None,
) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of k/bands rows;
    docs sharing any full band are candidate near-dup pairs.

    ``max_band_df``: band-bucket cap (VERDICT r4 #2) — the band-key
    self-join emits C(m,2) pairs for a bucket of m docs, and boilerplate
    corpora at 10^8+ docs produce mega-buckets (every near-identical
    page shares all bands → 10^12-row joins). Buckets larger than the
    cap switch to STAR emission: only (hub, doc) pairs with hub = the
    bucket's min doc_id — O(m) rows, and every bucket member stays
    connected through the hub, so ``dedup_clusters`` over the output
    still finds the full duplicate cluster. Small buckets keep the
    complete pair set (downstream exact verification sees every pair).
    Mirrors ``max_gram_df`` on the Jaccard path.
    """
    # r6 optimization: all k minhashes in ONE per-doc aggregate (k min
    # columns with the permutation constants inlined as literals —
    # identical arithmetic: a_j = (2j+1)·104729 < 2^31 so the inline
    # `% MOD` is exact), band keys assembled map-side from the columns
    # in j order. The old path materialized (doc_id, j, minhash) rows —
    # an explode(k) + groupBy(doc_id, j) shuffle of k× the gram rows,
    # then a second groupBy(doc_id, band) collect_list shuffle — for an
    # identical band_key set (pinned in tests/test_r06_optimizations).
    base = docs if max_doc_id is None else docs.filter(F.col("doc_id") < max_doc_id)
    grams = (
        exploded_grams(base, n)
        .select("doc_id", gram_hash(F.col("gram"), fixed_len=n).alias("g"))
        .dropDuplicates()
    )
    r = k // bands
    mins = grams.groupBy("doc_id").agg(
        *[
            F.min(
                (
                    F.lit((2 * j + 1) * 104729 % MOD) * F.col("g")
                    + F.lit(j * 7919 + 1)
                )
                % F.lit(MOD)
            ).alias(f"_m{j}")
            for j in range(k)
        ]
    )
    band_keys = mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bd).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"_m{bd * r + i}").cast("string")
                                for i in range(r)
                            ],
                        ).alias("band_key"),
                    )
                    for bd in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    if max_band_df is None:
        a = band_keys.alias("a")
        b = band_keys.alias("b")
        return (
            a.join(b, ["band", "band_key"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .dropDuplicates()
        )
    # bucket sizes + hub in one pass; the join back is co-partitioned
    # with the groupBy (same keys), so this adds no extra exchange
    stats = band_keys.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bdf"), F.min("doc_id").alias("hub")
    )
    keyed = band_keys.join(stats, ["band", "band_key"])
    small = keyed.filter(F.col("bdf") <= max_band_df)
    a = small.alias("a")
    b = small.alias("b")
    small_pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    big_pairs = (
        keyed.filter((F.col("bdf") > max_band_df) & (F.col("doc_id") != F.col("hub")))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return small_pairs.unionByName(big_pairs).dropDuplicates()


def hamming_near_dups(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    max_band_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs under Hamming distance over a ≤64-bit integer
    signature column → ``(doc_a, doc_b, hamming)``. Works on any such
    signature: text SimHash (:func:`simhash`) or the image perceptual
    hash the crawl cache stamps per row (``images.phash64``).

    Pigeonhole LSH: the signature splits into ``bands`` contiguous
    bit-bands; two signatures with hamming distance d < ``bands`` must
    agree on at least one full band, so banding has PERFECT recall for
    ``max_hamming`` < ``bands``. Candidates (equal band value at the
    same band index) are then verified exactly with
    ``bit_count(a XOR b) <= max_hamming`` — exact precision in every
    mode. Both stages are pure JVM (shift/mask/bit_count, codegen); the
    only shuffle is the band-key equi-join.

    ``bits`` defaults to 16 to COMPOSE with :func:`simhash`'s default
    width (r5 review: the old 64-bit default over 16-bit signatures
    made bands 1-3 all-zero — every doc in one bucket, the quadratic
    blowup banding exists to avoid). Pass ``bits=64`` explicitly for
    the image phash.

    ``max_band_df`` mirrors :func:`minhash_lsh_pairs`: a band bucket of
    m ids emits C(m,2) candidate pairs, and a corpus of 10^8 images
    where one logo/banner dominates produces mega-buckets. Buckets over
    the cap switch to hub-star emission (min-id hub, O(m) rows) so
    downstream :func:`connected_components` still sees the bucket as
    one component; star candidates are hamming-verified too.
    """
    assert bits % bands == 0 and 0 < bits <= 64
    width = bits // bands
    mask = (1 << width) - 1
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).cast("bigint").alias("_sig"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        # arithmetic >> then mask: the mask drops sign-extension bits,
        # so the top band of a negative signature keys correctly
        "band_key",
        F.expr(f"shiftright(_sig, band * {width}) & {mask}L"),
    )

    def _verify(pairs: DataFrame) -> DataFrame:
        return (
            pairs.withColumn(
                "hamming",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
            )
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming")
            .dropDuplicates(["doc_a", "doc_b"])
        )

    if max_band_df is None:
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("doc_a"),
                F.col("b._id").alias("doc_b"),
                F.col("a._sig").alias("sig_a"),
                F.col("b._sig").alias("sig_b"),
            )
        )
        return _verify(cand)
    # bucket stats in one pass; the join back shares the groupBy keys
    # (no extra exchange). Hub carries its sig so star pairs verify too.
    stats = banded.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bdf"),
        F.min(F.struct("_id", "_sig")).alias("hub"),
    )
    keyed = banded.join(stats, ["band", "band_key"])
    small = keyed.filter(F.col("bdf") <= max_band_df)
    a, b = small.alias("a"), small.alias("b")
    small_pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
    )
    big_pairs = keyed.filter(
        (F.col("bdf") > max_band_df) & (F.col("_id") != F.col("hub._id"))
    ).select(
        F.col("hub._id").alias("doc_a"),
        F.col("_id").alias("doc_b"),
        F.col("hub._sig").alias("sig_a"),
        F.col("_sig").alias("sig_b"),
    )
    return _verify(small_pairs.unionByName(big_pairs))


CC_LOCAL_MAX_EDGES = 200_000  # small-graph cutover, see connected_components


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    local_max_edges: int | None = None,
) -> DataFrame:
    """Connected components over an undirected pair graph →
    ``(doc_id, cluster_id)`` with cluster_id = the component's MIN doc_id
    (deterministic labels). Alternating large-star / small-star
    iterations (Kiveris et al., "Connected Components in MapReduce and
    Beyond") as pure DataFrame joins — converges in O(log²) rounds
    regardless of component diameter, unlike naive label propagation
    which needs O(diameter) rounds on chain-shaped near-dup graphs.

    ``nodes``: optional (doc_id) universe; isolated docs come back as
    singleton clusters labeled by themselves. Each iteration
    localCheckpoints the edge list so the lineage (and the DAG the
    scheduler must walk) stays O(1) per round, not O(rounds).

    Small graphs (r6 optimization): when the DISTINCT edge set fits
    the driver comfortably (``local_max_edges``, default
    ``CC_LOCAL_MAX_EDGES`` = 200 k edges ≈ a few MB of int64 pairs —
    the same "one side fits → don't shuffle" logic as a broadcast
    join), the star-contraction loop is replaced by a driver-side
    union-find over the already-materialized edge checkpoint. The
    labels are identical by definition (component minima don't depend
    on the algorithm; pinned against the distributed path in tests);
    dedup pair graphs are capped far below the corpus by construction
    (max_band_df / max_gram_df hub-star caps), so at 100 TB this path
    triggers exactly when the per-round fixed cost would dominate, and
    the distributed loop still handles genuinely large graphs. The
    edge count is read from the SAME observe() that materializes the
    checkpoint — no extra job decides the branch.
    """
    from pyspark.sql import Observation

    # XOR fold, not SUM: orderless over the distinct edge set and
    # immune to int64 overflow under ANSI mode
    _SIG_AGGS = (
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(least(u, v), greatest(u, v)))"), F.lit(0)
        ).alias("h"),
    )

    ob0 = Observation()
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .observe(ob0, *_SIG_AGGS)
        .localCheckpoint(eager=True)
    )

    cutover = CC_LOCAL_MAX_EDGES if local_max_edges is None else local_max_edges
    if int(ob0.get["n"] or 0) <= cutover:
        spark = pairs.sparkSession
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in edges.collect():
            u, v = row["u"], row["v"]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN root so the final label is the component min
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        members_rows = [(x, find(x)) for x in parent]
        members = spark.createDataFrame(
            members_rows, "doc_id long, cluster_id long"
        )
        if nodes is not None:
            singletons = (
                nodes.select("doc_id")
                .join(members.select("doc_id"), "doc_id", "left_anti")
                .select("doc_id", F.col("doc_id").alias("cluster_id"))
            )
            members = members.unionByName(singletons)
        return members

    def _large_star(e: DataFrame) -> DataFrame:
        # for each node u: connect every strictly-larger neighbor to
        # m = min(neighborhood ∪ {u}).
        # No trailing dropDuplicates (r6 optimization): the only
        # consumer is _small_star, whose first step re-orients and
        # dedups (`le = ... .dropDuplicates()`) and whose aggregates
        # are min() — multiplicity-insensitive — so deduping here only
        # paid an extra corpus-wide shuffle per round for an identical
        # round output.
        nb = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = nb.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        return (
            nb.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient larger→smaller; for each u connect its ≤-neighbors and
        # itself to m = min of that set.
        # ``le`` is NOT deduplicated (r6 optimization): min() is
        # multiplicity-insensitive and the round's trailing
        # dropDuplicates below already canonicalizes the output set,
        # so the early dedup only added a corpus-wide shuffle per
        # round for an identical round output.
        le = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = le.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            le.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
        )
        return out.filter(F.col("u") != F.col("v")).dropDuplicates()

    got0 = ob0.get
    sig = (got0["n"], got0["h"])
    for _ in range(max_iter):
        # convergence signature rides the SAME job as the checkpoint
        # materialization via observe() (r6 optimization — one job per
        # round instead of two; verified identical labels and
        # iteration counts at sf0.1)
        ob = Observation()
        edges = (
            _small_star(_large_star(edges))
            .observe(ob, *_SIG_AGGS)
            .localCheckpoint(eager=True)
        )
        got = ob.get
        new_sig = (got["n"], got["h"])
        if new_sig == sig:
            break
        sig = new_sig
    # converged: every edge links a member to its component min
    labels = (
        edges.select(
            F.greatest("u", "v").alias("doc_id"), F.least("u", "v").alias("cluster_id")
        )
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    members = labels.unionByName(
        labels.select(F.col("cluster_id").alias("doc_id"), "cluster_id")
    ).dropDuplicates()
    if nodes is not None:
        singletons = (
            nodes.select("doc_id")
            .join(members.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.col("doc_id").alias("cluster_id"))
        )
        members = members.unionByName(singletons)
    return members


def dedup_clusters(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_doc_id: int | None = None,
    max_band_df: int | None = 64,
) -> DataFrame:
    """Near-dup clusters with a deterministic keeper: capped-LSH
    candidate pairs → connected components → ``(doc_id, cluster_id,
    is_keeper)``. The keeper is the cluster's min doc_id — a training
    pipeline keeps ``is_keeper`` rows and drops the rest."""
    pairs = minhash_lsh_pairs(
        docs, k=k, bands=bands, n=n, max_doc_id=max_doc_id, max_band_df=max_band_df
    )
    base = docs if max_doc_id is None else docs.filter(F.col("doc_id") < max_doc_id)
    comp = connected_components(pairs, nodes=base.select("doc_id"))
    return comp.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def soft_dedup_weights(clusters: DataFrame) -> DataFrame:
    """Duplication-aware SAMPLING WEIGHTS over near-dup clusters →
    ``(doc_id, cluster_id, cluster_size, weight_pm, is_keeper)``.

    The soft alternative to hard dropping (the published ablations —
    e.g. Lee et al. 2022 §6 discussion — keep duplicates DOWN-WEIGHTED
    rather than deleted when diversity inside a family matters): every
    member of an m-doc cluster gets weight 1000/m permille, so each
    near-dup family contributes exactly one document's probability
    mass to the training mixture, singletons stay at 1000.

    Shape: one window over ``cluster_id`` on the CLUSTERS table —
    already corpus-keyed rows, partition size bounded by the largest
    near-dup family, which the upstream ``max_band_df`` hub-star cap
    bounds in turn. No corpus re-scan.
    """
    w = Window.partitionBy("cluster_id")
    return (
        clusters.withColumn(
            "cluster_size", F.count(F.lit(1)).over(w).cast("long")
        )
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            F.expr("CAST(1000 div cluster_size AS BIGINT)").alias("weight_pm"),
            "is_keeper",
        )
    )


def chunk_dedup(
    docs: DataFrame,
    chunk_words: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chunks: int = 400,
) -> DataFrame:
    """Sub-document EXACT dedup at word-chunk granularity (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): split
    every document into consecutive ``chunk_words``-word chunks, keep
    only the globally FIRST occurrence of each distinct chunk, and
    reassemble → ``(doc_id, text_dedup, n_chunks, n_dropped)``.

    Doc-level dedup misses the dominant duplication mode in web
    corpora — boilerplate paragraphs repeated across otherwise-distinct
    pages. First occurrence = min(doc_id · 100000 + pos), a single
    int64 key so the DuckDB twin computes the identical keeper without
    struct-ordering subtleties. Documents are truncated to
    ``max_chunks`` chunks (must stay < 100000 for the key packing) —
    state the cap, don't silently assume short docs.

    100 TB shape: explode is map-side; then exactly two shuffles —
    one hash aggregate on the chunk (min first-key; hot boilerplate
    chunks are just big COUNTing groups, never a pair join), and the
    doc_id regroup for reassembly. The chunk→keeper join back reuses
    the aggregate's hash partitioning. No windows, no self-joins.
    """
    assert 0 < max_chunks < 100000
    words = F.split(F.col(text_col), " ")
    n_chunks = F.least(
        F.ceil(F.size(words) / F.lit(chunk_words)).cast("int"), F.lit(max_chunks)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * chunk_words + 1, chunk_words), " "),
    )
    occ = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "chunk")
    ).withColumn("occ_key", F.col(id_col) * 100000 + F.col("pos"))
    first = occ.groupBy("chunk").agg(F.min("occ_key").alias("first_key"))
    kept = occ.join(first, "chunk").withColumn(
        "kept", F.col("occ_key") == F.col("first_key")
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("kept"), F.struct("pos", "chunk")))
                ),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_dropped"),
    )


def cdc_chunks(
    docs: DataFrame,
    divisor: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Content-defined chunking (CDC) duplicate report → one row per
    chunk seen in ≥ ``min_docs`` distinct documents:
    ``(chunk_hash, n_tokens, n_docs, n_occurrences)``.

    :func:`chunk_dedup` cuts at FIXED word offsets, so inserting one
    word at the top of a copied page shifts every boundary and hides
    the duplication. CDC (the LBFS/restic/borg trick) instead cuts
    after any token whose hash ≡ 0 (mod ``divisor``): boundaries are
    decided by CONTENT, so a shared passage re-synchronizes to the same
    chunks regardless of offset, at an expected chunk length of
    ``divisor`` tokens. Token hash is the house md5-prefix (52-bit) so
    the DuckDB twin matches bit-for-bit.

    100 TB shape: tokenize/explode is map-side; ONE window partitioned
    by doc (cumulative boundary count → chunk index, bounded by doc
    length); one (doc, chunk) aggregate rebuilding chunk text in token
    order; one final hash aggregate on chunk_hash. Hot boilerplate
    chunks are big counting groups — never a pair join, so no DF cap is
    needed (contrast ``jaccard_pairs``).
    """
    tok = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), pattern), lambda x: x != ""
            )
        ).alias("pos", "token"),
    ).withColumn(
        "boundary",
        (
            F.conv(F.substring(F.md5("token"), 1, 13), 16, 10).cast("bigint")
            % divisor
            == 0
        ).cast("int"),
    )
    w = (
        Window.partitionBy("_doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = tok.withColumn(
        "chunk_id", F.coalesce(F.sum("boundary").over(w), F.lit(0))
    )
    per_chunk = chunked.groupBy("_doc", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda x: x["token"],
                ),
                " ",
            )
        ).alias("chunk_hash"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    return (
        per_chunk.groupBy("chunk_hash")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.countDistinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def cluster_keepers(
    clusters: DataFrame,
    docs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup DECISION a training mix actually consumes: per
    near-dup cluster, keep the highest-quality copy and list the rest
    for dropping. Policy: max `quality_col` (default: longest text),
    tie → min doc_id — deterministic total order.

    → (doc_id, cluster_id, keeper_id, keep). Composes with
    :func:`dedup_clusters`, :func:`hamming_near_dups` +
    :func:`connected_components`, or the embedding-side clusters.

    Shape at 100 TB: one join on doc_id (clusters ⨝ quality — both
    corpus-keyed, co-partitionable) then ONE window on cluster_id;
    partitions are cluster-sized (mostly singletons, bounded by the
    largest near-dup family — already capped upstream by max_band_df's
    hub-star emission). No corpus-sized aggregate-and-join-back.
    """
    scored = clusters.select(id_col, "cluster_id").join(
        docs.select(id_col, quality_col), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("keeper_id", F.first(id_col).over(w))
        .withColumn("keep", F.col(id_col) == F.col("keeper_id"))
        .select(id_col, "cluster_id", "keeper_id", "keep")
    )


def vocab_topk(docs: DataFrame, k: int = 100, pattern: str = "[^a-z]+") -> DataFrame:
    """Corpus vocabulary: top-k tokens by frequency → ``(token, cnt)``.

    The first step of tokenizer training / frequency-based filtering
    over a training corpus. Tokens = lowercase text split on `pattern`
    (a character-class regex both Spark's Java regex and DuckDB's RE2
    evaluate identically — keep it to plain classes for oracle parity).

    Shape at 100 TB: explode → partial map-side count → one shuffle on
    token (vocabulary-sized, Zipf-headed; partial aggregation absorbs
    the hot head so no salt needed) → global top-k. Ordering is TOTAL
    (cnt desc, token asc) so the k-boundary is deterministic.
    """
    toks = F.explode(F.split(F.lower(F.col("text")), pattern)).alias("token")
    return (
        docs.select(toks)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def doc_top_terms(docs: DataFrame, k: int = 3, pattern: str = "[^a-z]+") -> DataFrame:
    """Per-document distinctive terms — the rank-based TF-IDF variant:
    top-k tokens per doc ordered by (tf DESC, global df ASC, token ASC).
    Rank arithmetic stays in exact integers (no log-idf floats), so the
    result is engine-reproducible and oracle-checkable exactly.

    → (doc_id, token, tf, df, rk). Shape at scale: explode → two hash
    aggregations (doc-term tf, then term df — both map-side combined)
    → join on token (vocabulary-sized right side, broadcastable for
    real corpora) → per-doc window (small partitions: one doc's
    distinct terms). No unbounded intermediate.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), pattern)).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are distinct (doc, token) pairs → df = row count per token
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc()
    )
    return (
        tf.join(dft, "token")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "token", "tf", "df", "rk")
    )


def _gram_array(toks, n: int):
    """Word-n-gram array over a token-array column — the shared builder
    behind :func:`token_ngrams` / :func:`token_ngrams_pos`.

    Implementation note (r6 optimization, guide §4.1 "prefer built-ins
    with cheap per-element work"): the original form —
    ``transform(sequence(1, hi), i -> concat_ws(' ', slice(toks, i, n)))``
    — pays an interpreted ``slice`` array allocation plus a varargs
    ``concat_ws`` per gram and measured 3.8 s for 266 k grams at sf0.1.
    Folding n−1 ``zip_with`` passes over SHIFTED SLICES of the token
    array does one cheap binary ``concat`` per element per pass
    (0.63 s, 6× faster, bit-identical output — verified by full
    groupBy(doc_id, gram) comparison). Still map-side only: no shuffle
    is introduced, so the 100 TB shape is unchanged.

    Short-doc guard: docs with fewer than n tokens emit an empty array
    (``slice`` with a non-positive length would be garbage).
    """
    L = F.size(toks) - F.lit(n - 1)  # number of grams
    acc = F.slice(toks, 1, L)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, L),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(L >= 1, acc).otherwise(F.array().cast("array<string>"))


def token_ngrams(
    docs: DataFrame,
    n: int = 2,
    pattern: str = "[^a-z]+",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs → ``(doc_id, gram)`` — one row per word n-gram OCCURRENCE
    (space-joined lowercase tokens). All JVM-side array functions:
    split → filter empties → zip_with gram fold (see
    :func:`_gram_array`) → explode."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), pattern), lambda t: t != ""
    )
    return docs.select(id_col, F.explode(_gram_array(toks, n)).alias("gram"))


def repetition_stats(docs: DataFrame, n: int = 2, pattern: str = "[^a-z]+") -> DataFrame:
    """Gopher-style within-document repetition signals over word
    n-grams — the quality filter a training pipeline applies before
    mixing (high repeated-n-gram mass ⇒ boilerplate/spam page).

    → (doc_id, n_grams, n_distinct_grams, n_rep_grams, max_gram_reps,
    top_gram, top_gram_count), all exact ints/strings so the DuckDB
    oracle matches bit-for-bit (callers derive the fractional scores).

    Shape at 100 TB: explode → shuffle on (doc_id, gram) with map-side
    partial counts → ONE per-doc hash aggregate. The top gram is fused
    into that aggregate via ``min_by(gram, struct(-cnt, gram))`` —
    struct comparison is lexicographic, so -cnt ASC = cnt DESC with
    gram ASC as a total tie-break (deterministic) — instead of a
    row_number window + self-join, which would cost an extra shuffle
    + sort + join over the same corpus-sized intermediate. Its count
    equals max(cnt) by construction, so no second pass is needed.
    """
    per = token_ngrams(docs, n, pattern).groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    order = F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("gram").alias("g"))
    return per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_rep_grams"
        ),
        F.max("cnt").alias("max_gram_reps"),
        F.min_by("gram", order).alias("top_gram"),
        F.max("cnt").alias("top_gram_count"),
    )


def contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    pattern: str = "[^a-z]+",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-decontamination scan: word n-gram overlap of every
    training doc against a held-out benchmark set (the pass a training
    pipeline runs before mixing, to drop eval-set leakage).

    → (doc_id, n_grams, n_hits): distinct grams in the doc, and how
    many of them also appear anywhere in the benchmark. Callers filter
    n_hits thresholds; emitting counts keeps the operator policy-free.

    Shape at 100 TB: the benchmark gram set is DISTINCT and tiny
    relative to the corpus (eval suites are ~10^5 docs → ~10^7 grams)
    → broadcast left-join against the exploded train grams: the 100 TB
    side never shuffles. Set ``broadcast_benchmark=False`` to fall back
    to a shuffle equi-join on gram when the benchmark is genuinely
    large; Catalyst's partial aggregation still bounds the per-doc agg.
    """
    tg = token_ngrams(train, n, pattern).distinct()
    bg = (
        token_ngrams(benchmark, n, pattern)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        tg.join(bg, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0).cast("long"))).alias("n_hits"),
        )
    )


def simhash(docs: DataFrame, bits: int = 16, n: int = 3, max_doc_id: int | None = None) -> DataFrame:
    """SimHash over gram hashes: bit b set iff Σ_grams (±1 by gram bit b)
    > 0. → (doc_id, simhash) exact int64."""
    base = docs if max_doc_id is None else docs.filter(F.col("doc_id") < max_doc_id)
    grams = (
        exploded_grams(base, n)
        .select("doc_id", gram_hash(F.col("gram"), fixed_len=n).alias("g"))
        .dropDuplicates()
    )
    expanded = grams.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"), "g"
    ).select(
        "doc_id",
        "b",
        F.when(F.expr("(g >> b) & 1") == 1, 1).otherwise(-1).alias("w"),
    )
    return (
        expanded.groupBy("doc_id", "b")
        .agg(F.sum("w").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(0)
            ).alias("simhash")
        )
    )


def doc_surprisal(docs: DataFrame, pattern: str = "[^a-z]+") -> DataFrame:
    """CCNet-style unigram LM quality signal, exact-integer →
    ``(doc_id, n_tokens, surprisal_q)``.

    The corpus IS the language model: per-token inverse unigram
    probability quantized as ``s_q(t) = (tt · 1000) div cnt(t)`` (tt =
    total corpus tokens) — monotone in true surprisal −log p(t), so
    ranking/filtering decisions match the float form while every
    quantity stays a positive int64 (Spark ``div`` ≡ DuckDB ``//``).
    Doc score = occurrence-weighted mean, ``(Σ tf·s_q) div n_tokens``:
    LOW = boilerplate/stopword soup, HIGH = rare-token noise; the
    CCNet head/middle/tail split is a percentile cut over this column
    (compose with ``length_percentiles``-style approx_percentile).

    Shape at 100 TB: explode → per-(doc, token) tf aggregate (map-side
    combined) → token-count aggregate (vocabulary-sized, Zipf head
    absorbed map-side) → join tf⨝counts on token (right side is the
    vocabulary — broadcastable for real corpora) → one per-doc
    aggregate. No windows, no self-joins; overflow-safe while
    tt·1000 < 2⁶³ (corpus ≲ 9·10¹⁵ tokens).
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), pattern)).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    cnts = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    stats = cnts.agg(F.sum("cnt").alias("tt"))
    return (
        tf.join(cnts, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "tf",
            F.expr("tf * ((tt * 1000) div cnt)").alias("w"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.expr("sum(w) div sum(tf)").alias("surprisal_q"),
        )
    )


def bigram_pmi(
    docs: DataFrame,
    pattern: str = "[^a-z]+",
    min_count: int = 2,
    k: int = 100,
) -> DataFrame:
    """Collocation mining: top-k adjacent token pairs by quantized PMI
    → ``(tok_a, tok_b, co, pmi_q)`` ordered (pmi_q desc, tok_a, tok_b).

    The phrase/tokenizer-merge discovery pass of corpus preprocessing
    (what BPE-style merges and "new york"-type phrase tables are
    trained from). PMI is computed as the all-integer surrogate
    ``pmi_q = (co · tt · 1000) div (cnt_a · cnt_b)`` — monotone in
    true PMI = log(p(ab)/(p(a)p(b))) at fixed tt, so ranking matches
    the float form while staying bit-exact cross-engine (all positive
    → div ≡ //). ``min_count`` drops hapax pairs whose PMI is pure
    noise. Overflow bound: co·tt·1000 < 2⁶³ holds through tt ≈ 3·10⁹
    tokens at worst-case co = tt; for larger corpora rescale the
    quantizer (PMI ranks only need relative order).

    Shape at 100 TB: bigrams come from zipping the word array with its
    own tail (slice+zip_with — map-side, no self-join); then two hash
    aggregates (pair counts, unigram counts — both map-side combined,
    Zipf heads absorbed) and two vocabulary-sized joins a real corpus
    broadcasts. Global top-k via total order.
    """
    words = docs.select(
        F.filter(
            F.split(F.lower(F.col("text")), pattern), lambda t: t != ""
        ).alias("w")
    ).filter(F.size("w") >= 2)
    pairs = words.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, F.size("w") - 1),
                F.slice(F.col("w"), 2, F.size("w") - 1),
                lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    co = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= min_count)
    )
    uni = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), pattern)).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = uni.agg(F.sum("cnt").alias("tt"))
    return (
        co.join(uni.withColumnRenamed("t", "tok_a").withColumnRenamed("cnt", "ca"), "tok_a")
        .join(uni.withColumnRenamed("t", "tok_b").withColumnRenamed("cnt", "cb"), "tok_b")
        .crossJoin(F.broadcast(stats))
        .select(
            "tok_a",
            "tok_b",
            "co",
            F.expr("(co * tt * 1000) div (ca * cb)").alias("pmi_q"),
        )
        .orderBy(F.col("pmi_q").desc(), F.col("tok_a").asc(), F.col("tok_b").asc())
        .limit(k)
    )


def doc_lm_score(docs: DataFrame, pattern: str = "[^a-z]+") -> DataFrame:
    """Interpolated bigram-LM doc scoring → ``(doc_id, n_transitions,
    lm_score_q)`` — the next modeling rung above :func:`doc_surprisal`
    (CCNet's KenLM filter, reduced to the corpus-trained bigram case).

    Per transition a→b, p = ½·p(b|a) + ½·p(b) =
    (c(ab)·tt + c(a)·c(b)) / (2·c(a)·tt); the quantized INVERSE
    probability ``inv_q = (2000·c(a)·tt) div (c(ab)·tt + c(a)·c(b))``
    stays all-positive int64 (div ≡ //), and the doc score is the
    transition-weighted integer mean. High = improbable word-to-word
    transitions (gibberish / word salad — invisible to unigram
    surprisal, which only sees token rarity); low = fluent boilerplate.
    Docs with < 2 tokens have no transitions and drop out. Overflow
    bound: 2000·c(a)·tt < 2⁶³ holds through tt ≈ 6.8·10⁷ tokens at the
    worst case c(a)=tt; for larger corpora shrink the quantizer —
    only relative order feeds the filter decision.

    Shape at 100 TB: transitions come from zipping each word array
    with its own tail (map-side, no self-join), pre-aggregated per
    (doc, a, b) so hot in-doc repetitions collapse before the joins;
    then the corpus bigram table (one hash aggregate) and the unigram
    vocabulary join in — both Zipf-headed aggregate tables a real
    corpus broadcasts or bucket-joins; one final per-doc aggregate.
    """
    words = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), pattern), lambda t: t != ""
        ).alias("w"),
    ).filter(F.size("w") >= 2)
    trans = words.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, F.size("w") - 1),
                F.slice(F.col("w"), 2, F.size("w") - 1),
                lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            )
        ).alias("p"),
    ).select("doc_id", "p.tok_a", "p.tok_b")
    dt = trans.groupBy("doc_id", "tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("n")
    )
    co = dt.groupBy("tok_a", "tok_b").agg(F.sum("n").alias("co"))
    uni = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), pattern)).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = uni.agg(F.sum("cnt").alias("tt"))
    scored = (
        dt.join(co, ["tok_a", "tok_b"])
        .join(
            uni.withColumnRenamed("t", "tok_a").withColumnRenamed("cnt", "ca"),
            "tok_a",
        )
        .join(
            uni.withColumnRenamed("t", "tok_b").withColumnRenamed("cnt", "cb"),
            "tok_b",
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "n",
            F.expr(
                "n * ((2000 * ca * tt) div (co * tt + ca * cb))"
            ).alias("wq"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_transitions"),
        F.expr("sum(wq) div sum(n)").alias("lm_score_q"),
    )


def text_quality_gate(
    docs: DataFrame,
    min_tokens: int = 10,
    min_surprisal_q: int = 5_000,
    max_surprisal_q: int = 500_000,
    max_lm_score_q: int = 3_000_000,
    pattern: str = "[^a-z]+",
) -> DataFrame:
    """The text-side ADMISSION DECISION (mirror of
    ``imageops.quality_gate``): combine the statistical quality signals
    into one keep/drop verdict with a fixed reject-reason precedence →
    ``(doc_id, n_tokens, surprisal_q, lm_score_q, pass, reject_reason)``.

    Precedence (first failing rule wins, like Gopher's rule cascade):
    ``empty`` (no tokens at all) → ``too_short`` (< min_tokens) →
    ``low_surprisal`` (boilerplate/stopword soup: mean 1/p below
    min_surprisal_q/1000) → ``high_surprisal`` (rare-token noise) →
    ``word_salad`` (bigram-LM score above max_lm_score_q: plausible
    tokens, improbable transitions). Thresholds are on the QUANTIZED
    inverse-probability scales of :func:`doc_surprisal` /
    :func:`doc_lm_score`, which are corpus-size invariant (1/p of a
    fixed-relative-frequency token is scale-free), so one config
    carries from sf0.001 tests to the 100 TB corpus.

    Shape: the two signal plans (each a couple of map-side-combined
    aggregates + vocabulary joins) plus two LEFT joins back to the
    full doc list — every row is decided, including empty docs that
    produce no tokens.
    """
    base = docs.select("doc_id")
    s = doc_surprisal(docs, pattern=pattern)
    l = doc_lm_score(docs, pattern=pattern).select(
        "doc_id", "lm_score_q"
    )
    j = (
        base.join(s, "doc_id", "left")
        .join(l, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "surprisal_q",
            "lm_score_q",
        )
    )
    reason = (
        F.when(F.col("n_tokens") == 0, "empty")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("surprisal_q") < min_surprisal_q, "low_surprisal")
        .when(F.col("surprisal_q") > max_surprisal_q, "high_surprisal")
        .when(F.col("lm_score_q") > max_lm_score_q, "word_salad")
        .otherwise(None)
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "surprisal_q",
        "lm_score_q",
        reason.isNull().alias("pass"),
        reason.alias("reject_reason"),
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    max_doc_id: int | None = None,
    max_gram_df: int | None = None,
    min_cont_q: int = 500,
) -> DataFrame:
    """Broder CONTAINMENT pairs: |A∩B| / |A| (and / |B|) over distinct
    char n-grams — the asymmetric near-dup signal Jaccard dilutes. A
    short document quoted wholesale inside a long one has tiny Jaccard
    (union is dominated by the long doc) but containment ≈ 1 on the
    short side; training-data pipelines use it to catch quote/subset
    duplication and boilerplate-wrapped reposts that symmetric
    similarity misses (Broder, "On the resemblance and containment of
    documents", 1997).

    → (doc_a, doc_b, n_common, grams_a, grams_b, cont_a_q, cont_b_q)
    where cont_x_q = ⌊1000·n_common/grams_x⌋ (exact integer quantized —
    the DuckDB twin reproduces it bit-for-bit), filtered to pairs whose
    LARGER side-containment reaches ``min_cont_q`` permille.

    100 TB shape: identical to ``jaccard_pairs`` — explode → equi-join
    on the gram key with the same ``max_gram_df`` hot-gram cut bounding
    the per-gram quadratic; the containment projection and filter are
    post-aggregation on the already-reduced pair table. The filter
    prunes the dominant cost of the UNCAPPED output: web corpora emit
    ~|docs|·avg_df candidate pairs, of which subset-dups are a sliver.
    """
    p = jaccard_pairs(docs, n=n, max_doc_id=max_doc_id, max_gram_df=max_gram_df)
    p = p.withColumn(
        "cont_a_q", F.expr("CAST(n_common * 1000 AS BIGINT) div grams_a")
    ).withColumn("cont_b_q", F.expr("CAST(n_common * 1000 AS BIGINT) div grams_b"))
    return p.filter(F.greatest("cont_a_q", "cont_b_q") >= F.lit(min_cont_q))


def token_ngrams_pos(
    docs: DataFrame,
    n: int = 2,
    pattern: str = "[^a-z]+",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional variant of ``token_ngrams``: docs → ``(doc_id, pos,
    gram)`` with ``pos`` the 1-based TOKEN index of the gram's first
    word — the coordinate system span-merging needs. Same zip_with
    gram fold as :func:`token_ngrams` (see :func:`_gram_array`), same
    short-doc guard; posexplode supplies the position."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), pattern), lambda t: t != ""
    )
    return docs.select(
        id_col, F.posexplode(_gram_array(toks, n)).alias("idx", "gram")
    ).select(id_col, (F.col("idx") + 1).cast("long").alias("pos"), "gram")


def duplicate_spans(
    docs: DataFrame,
    n: int = 4,
    min_span_grams: int = 2,
    max_gram_df: int | None = 50,
    max_doc_id: int | None = None,
    pattern: str = "[^a-z]+",
) -> DataFrame:
    """MAXIMAL cross-document duplicated token spans — the
    exact-substring-dedup signal of Lee et al. ("Deduplicating Training
    Data Makes Language Models Better", 2022), relationally: a word
    n-gram occurring in ≥2 distinct documents marks its start position
    duplicated; overlapping/adjacent duplicated starts within a doc
    merge (gaps-and-islands) into maximal spans. Unlike ``chunk_dedup``
    (fixed chunk boundaries, exact match only at chunk granularity)
    this finds duplicated regions at ARBITRARY offsets — the suffix
    -array result, built from shuffle-friendly primitives.

    → (doc_id, span_start, span_end, span_tokens, n_dup_grams): 1-based
    inclusive token coordinates; spans must contain ≥ ``min_span_grams``
    duplicated gram starts (single stray shared n-grams are noise).

    100 TB shape: explode is map-side O(tokens); the gram-DF aggregate
    shuffles on the gram key with partial combine; the join back is an
    equi-join on the same key; the island merge is ONE window partitioned
    by doc_id (per-doc bounded work, no cross-doc sort). ``max_gram_df``
    is the stop-gram cut — a gram in >cap docs ("in the of") is dropped
    from span evidence, bounding the join fan-out exactly as in
    ``jaccard_pairs``; genuinely viral boilerplate is recovered by
    ``chunk_dedup``'s hash-aggregate path, which has no pair join.
    """
    base = docs if max_doc_id is None else docs.filter(F.col("doc_id") < max_doc_id)
    g = token_ngrams_pos(base, n=n, pattern=pattern)
    df_ = g.groupBy("gram").agg(F.count_distinct("doc_id").alias("df"))
    keep = df_.filter(F.col("df") >= 2)
    if max_gram_df is not None:
        keep = keep.filter(F.col("df") <= max_gram_df)
    starts = g.join(keep.select("gram"), "gram").select("doc_id", "pos").dropDuplicates()
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0)).otherwise(
        F.lit(1)
    )
    isl = starts.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(
            Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            (F.max("pos") + F.lit(n - 1) - F.min("pos") + F.lit(1)).alias(
                "span_tokens"
            ),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .filter(F.col("n_dup_grams") >= min_span_grams)
        .select("doc_id", "span_start", "span_end", "span_tokens", "n_dup_grams")
    )


def winnow_fingerprints(
    docs: DataFrame,
    n: int = 4,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = "[^a-z]+",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm) → ``(doc_id, fp_pos, fp_hash)``.

    From every window of ``window`` consecutive token-``n``-gram
    hashes, select the minimum (ties → RIGHTMOST, per the paper); the
    distinct selected (position, hash) pairs are the fingerprint set.
    The winnowing guarantee: any shared substring of at least
    ``n + window − 1`` tokens produces at least one shared fingerprint
    — detection like :func:`cdc_chunks` but with a density bound
    (≈ 2/(window+1) of grams selected) instead of chunk granularity.

    Rightmost-min inside a window function without argmax: the ordered
    key packs ``hash(40 bits) · 2^20 + (2^20 − 1 − pos)`` into one
    int64 — minimizing it minimizes hash first, then PREFERS THE
    LARGEST pos. Caps: per-doc token position < 2^20 (a million-token
    doc is out of contract, asserted by the pack), hash folded to 40
    bits (collisions only merge fingerprints, never lose the
    guarantee). Only FULL windows emit (pos ≥ window), matching the
    paper. One window per doc, everything else map-side; both engines
    run the identical integer recurrence.
    """
    g = token_ngrams_pos(docs, n=n, pattern=pattern, id_col=id_col, text_col=text_col)
    h40 = (
        F.conv(F.substring(F.md5("gram"), 1, 13), 16, 10).cast("bigint")
        % F.lit(2**40)
    )
    # enforce the documented pos < 2^20 contract LOUDLY (r5 review:
    # the docstring claimed an assert that didn't exist — an oversize
    # doc would borrow into the hash bits and silently corrupt every
    # fingerprint in it)
    pos_ok = F.when(
        F.col("pos") < F.lit(2**20),
        F.col("pos"),
    ).otherwise(
        F.raise_error(
            F.lit("winnow_fingerprints: doc exceeds 2^20 token positions")
        )
    )
    combo = h40 * F.lit(2**20) + (F.lit(2**20 - 1) - pos_ok)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    sel = (
        g.withColumn("_combo", combo)
        .withColumn("_cm", F.min("_combo").over(w))
        .filter(F.col("pos") >= window)
        .select(id_col, "_cm")
        .dropDuplicates()
    )
    return sel.select(
        id_col,
        (F.lit(2**20 - 1) - F.col("_cm") % F.lit(2**20)).cast("long").alias("fp_pos"),
        # integer DIV, not `/`: the 60-bit combo exceeds double's 52-bit
        # mantissa, so float division would garble large hashes
        F.expr(f"_cm DIV {2**20}").cast("long").alias("fp_hash"),
    )


def hamming_radius_search(
    sigs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    query_id_col: str = "query_id",
    query_sig_col: str = "qsig",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Point-lookup twin of :func:`hamming_near_dups`: for each QUERY
    signature, every corpus id within ``max_hamming`` →
    ``(query_id, doc_id, hamming)``.

    Same pigeonhole banding (perfect recall for ``max_hamming`` <
    ``bands``), but corpus × query-batch instead of corpus × corpus:
    the query side is a BATCH (broadcast), so the corpus is probed by
    one band-key equi-join against ~|queries|·bands broadcast rows and
    never self-joins — the "find this image's near-dups NOW" path a
    dedup service runs per ingest, vs the batch pair sweep.
    """
    assert bits % bands == 0 and 0 < bits <= 64
    width = bits // bands
    mask = (1 << width) - 1

    def banded(df, idc, sigc, out_id, out_sig):
        return df.select(
            F.col(idc).alias(out_id),
            F.col(sigc).cast("bigint").alias(out_sig),
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        ).withColumn(
            "band_key",
            F.expr(f"shiftright({out_sig}, band * {width}) & {mask}L"),
        )
    corpus = banded(sigs, id_col, sig_col, "_id", "_sig")
    qb = banded(queries, query_id_col, query_sig_col, "_qid", "_qsig")
    cand = corpus.join(F.broadcast(qb), ["band", "band_key"]).select(
        "_qid", "_id", "_sig", "_qsig"
    ).dropDuplicates(["_qid", "_id"])
    return (
        cand.withColumn("hamming", F.expr("bit_count(_sig ^ _qsig)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            F.col("hamming").cast("int").alias("hamming"),
        )
    )


def boilerplate_strip(
    docs: DataFrame,
    group_col: str = "source",
    min_df_permille: int = 600,
    min_docs: int = 5,
    pattern: str = "[^a-z]+",
) -> DataFrame:
    """Per-group boilerplate-token detection + per-doc strip report →
    ``(doc_id, grp, n_tokens, boiler_tokens, content_permille)``.

    Main-content extraction at corpus scale: a token that appears in
    ``≥ min_df_permille`` of a group's documents (group = host/source —
    nav bars, footers, cookie banners) is *boilerplate* THERE, not
    content; training-data curation wants the per-doc content fraction
    (jusText/trafilatura make this call per-page from DOM blocks — this
    is the corpus-statistical form over already-extracted text, the
    same df-threshold family as ``boilerplate_captions`` on the image
    side). Groups smaller than ``min_docs`` docs never flag (no
    statistical footing), mirroring ``reciprocal_links.min_links``.

    ``content_permille`` = 1000·(n_tokens − boiler_tokens) ÷ n_tokens —
    the quality gate reads it directly (a page that is 90 % chrome
    carries little training signal regardless of its fluency score).

    Shape at 100 TB: explode → per-(grp, doc, token) tf (map-side
    combined) → df aggregate over the tf table (vocabulary × groups —
    the broadcastable side) → one join back on (grp, token) → per-doc
    aggregate. No windows, no self-joins; empty-token docs drop out
    (zero tokens ⇒ no content fraction to report).
    """
    toks = docs.select(
        F.col("doc_id"),
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.col("text")), pattern)).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("grp", "doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    grp_docs = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    df = (
        tf.groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(grp_docs, "grp")
        .select(
            "grp",
            "token",
            (
                (F.col("df") * 1000 >= F.lit(min_df_permille) * F.col("n_docs"))
                & (F.col("n_docs") >= min_docs)
            ).alias("boiler"),
        )
    )
    return (
        tf.join(df, ["grp", "token"])
        .groupBy("doc_id", "grp")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.when(F.col("boiler"), F.col("tf")).otherwise(0)).alias(
                "boiler_tokens"
            ),
        )
        .withColumn(
            "content_permille",
            F.expr("(n_tokens - boiler_tokens) * 1000 DIV n_tokens"),
        )
    )


def line_dedup(
    docs: DataFrame,
    max_doc_df: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document exact LINE dedup → per-doc cleaned text
    ``(doc_id, n_lines, kept_lines, clean_text)``.

    The RefinedWeb/C4 curation step `boilerplate_strip` does NOT
    cover: a *line* (nav bar, cookie banner, copyright footer) that
    appears verbatim in more than ``max_doc_df`` distinct documents is
    chrome, not content, and is removed from EVERY document it appears
    in; surviving lines are re-joined in original order. Matching is
    on a normalized form (lowercase, trimmed, inner whitespace
    collapsed) so ``"  Copyright 2026 "`` and ``"copyright 2026"``
    dedup together; normalized-empty lines are dropped outright.

    Complements ``boilerplate_strip`` (token DF within a group) with
    the corpus-wide exact-line rule the big pretraining sets actually
    shipped: C4 dropped any 3-sentence span seen twice; RefinedWeb
    removed exact duplicated lines. ``n_lines`` counts the doc's
    non-blank lines, ``kept_lines`` the survivors.

    Shape at 100 TB: posexplode (linear) → line-DF hash aggregate
    (map-side combined; the DF table is the corpus's distinct-line
    vocabulary) → one shuffle join on the normalized line → per-doc
    re-aggregate. The re-join of surviving lines is
    collect_list+array_sort per doc — bounded by the doc's own line
    count, never corpus-wide. No windows, no self-joins, no UDFs.
    """
    lines = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), sep)).alias("pos", "line")
    ).withColumn(
        "norm", F.lower(F.trim(F.regexp_replace(F.col("line"), r"\s+", " ")))
    )
    nonblank = lines.filter(F.col("norm") != "").localCheckpoint(eager=True)
    line_df = nonblank.groupBy("norm").agg(
        F.countDistinct("doc_id").alias("doc_df")
    )
    kept = nonblank.join(line_df, "norm").filter(F.col("doc_df") <= max_doc_df)
    per_doc_kept = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
    )
    totals = nonblank.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(per_doc_kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("kept_lines", F.lit(0)).alias("kept_lines"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    token_pattern: str = "[^a-z]+",
) -> DataFrame:
    """Byte-pair-encoding merge training over a corpus →
    ``(step, pair, cnt)``: the first ``n_merges`` BPE merge rules
    (Sennrich et al. 2016), each the most-frequent adjacent symbol
    pair (count DESC, pair ASC tie-break) at that step, trained on the
    word-frequency table exactly like the classic implementation.

    The tokenizer-training half of the pretraining pipeline
    (`pack_sequences`/`mixture_plan` consume token counts; this is
    where the tokens come from). Words start as space-joined character
    sequences; each step counts adjacent pairs weighted by word
    frequency, picks the top pair, and rewrites every word with ONE
    left-to-right non-overlapping replace pass over the space-padded
    sequence — the retokenization semantics both engines (Spark
    `replace`, DuckDB `replace`) implement identically, which is what
    the oracle twin (:func:`bpe_sql`) unrolls.

    Fully declarative — no driver loop over data: the chosen pair stays
    in-plan via a one-row broadcast crossJoin per step. Scale shape:
    everything after the first aggregate runs on the word-frequency
    table (the VOCABULARY, ≪ corpus — explode/groupBy once over the
    corpus, then k tiny aggregates); top-1 is TakeOrdered; lineage cut
    per step with eager localCheckpoints (k ≤ tens).
    """
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), token_pattern)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"), "freq"
    ).localCheckpoint(eager=True)
    merges, _ = _bpe_recurrence(seqs, n_merges)
    return merges


def _bpe_recurrence(seqs: DataFrame, n_merges: int):
    """Shared BPE fixed-point: ``seqs`` must carry (seq, freq) plus any
    passthrough columns (e.g. word). Returns (merges, final_seqs)."""
    merges = None
    for step in range(1, n_merges + 1):
        toks = F.split(F.col("seq"), " ")
        pairs_arr = F.when(
            F.size(toks) > 1,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat(
                    F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            seqs.select(F.explode(pairs_arr).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .select(F.lit(step).alias("step"), "pair", "cnt")
            .localCheckpoint(eager=True)  # ONE row
        )
        merges = top if merges is None else merges.unionByName(top)
        passthrough = [c for c in seqs.columns if c != "seq"]
        seqs = (
            seqs.crossJoin(F.broadcast(top.select("pair")))
            .select(
                F.trim(
                    F.expr(
                        "replace(concat(' ', seq, ' '), concat(' ', pair, ' '),"
                        " concat(' ', replace(pair, ' ', ''), ' '))"
                    )
                ).alias("seq"),
                *passthrough,
            )
            .localCheckpoint(eager=True)
        )
    return merges, seqs


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 3,
    token_pattern: str = "[^a-z]+",
) -> DataFrame:
    """Train ``n_merges`` BPE rules on the corpus and apply them BACK
    to it → ``(doc_id, n_tokens)``: real tokenizer-aware token counts,
    the number the packing/mixture planners actually need (input_hint
    asks for "token counting (… a BPE-ish regex)"; this is the trained
    upgrade of ``token_stats``' whitespace counts).

    Scale shape: the recurrence runs on the VOCABULARY (word, seq,
    freq) — corpus-sized work is exactly two passes: one explode →
    (doc_id, word) counts, and one join of those counts against the
    vocabulary-sized (word → tokens-after-merges) map, then a per-doc
    sum. The map side is broadcastable (distinct words ≪ corpus).
    """
    doc_words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), token_pattern)).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    vocab = doc_words.groupBy("word").agg(F.sum("cnt").alias("freq"))
    seqs = vocab.select(
        "word",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
        "freq",
    ).localCheckpoint(eager=True)
    _, final = _bpe_recurrence(seqs, n_merges)
    tok_map = final.select(
        "word", F.size(F.split(F.col("seq"), " ")).alias("ntok")
    )
    return (
        doc_words.join(F.broadcast(tok_map), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("ntok")).alias("n_tokens"))
    )


def bpe_sql(words_sql: str, n_merges: int = 3) -> str:
    """DuckDB twin of :func:`bpe_merges`: the same recurrence unrolled
    — per step one pair aggregate, one top-1, one scalar-subquery
    replace rewrite. ``words_sql`` must yield a ``word`` column (the
    un-aggregated word stream; the twin builds the frequency table)."""
    parts = [
        f"""WITH w0 AS (
  SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq,
         CAST(count(*) AS BIGINT) AS freq
  FROM ({words_sql}) GROUP BY 1
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f""", p{i} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(string_split(seq, ' ')) - 1),
             j -> string_split(seq, ' ')[j] || ' ' || string_split(seq, ' ')[j + 1]
           )) AS pair, freq
    FROM {prev}
  ) GROUP BY pair
), m{i} AS (
  SELECT CAST({i} AS INT) AS step, pair, cnt
  FROM p{i} ORDER BY cnt DESC, pair LIMIT 1
), w{i} AS (
  SELECT trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT pair FROM m{i}) || ' ',
                      ' ' || (SELECT replace(pair, ' ', '') FROM m{i}) || ' ')) AS seq,
         freq
  FROM {prev}
)"""
        )
    sel = " UNION ALL ".join(
        f"SELECT step, pair, cnt FROM m{i}" for i in range(1, n_merges + 1)
    )
    return "\n".join(parts) + "\n" + sel


def bpe_tokens_sql(doc_words_sql: str, n_merges: int = 3) -> str:
    """DuckDB twin of :func:`bpe_token_counts`. ``doc_words_sql`` must
    yield (doc_id, word) — one row per word OCCURRENCE."""
    parts = [
        f"""WITH dw AS (
  SELECT doc_id, word FROM ({doc_words_sql})
), w0 AS (
  SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq,
         CAST(count(*) AS BIGINT) AS freq
  FROM dw GROUP BY word
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f""", p{i} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(string_split(seq, ' ')) - 1),
             j -> string_split(seq, ' ')[j] || ' ' || string_split(seq, ' ')[j + 1]
           )) AS pair, freq
    FROM {prev}
  ) GROUP BY pair
), m{i} AS (SELECT pair FROM p{i} ORDER BY cnt DESC, pair LIMIT 1
), w{i} AS (
  SELECT word,
         trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT pair FROM m{i}) || ' ',
                      ' ' || (SELECT replace(pair, ' ', '') FROM m{i}) || ' ')) AS seq,
         freq
  FROM {prev}
)"""
        )
    parts.append(
        f""", tok AS (
  SELECT word, CAST(len(string_split(seq, ' ')) AS INT) AS ntok FROM w{n_merges}
)
SELECT dw.doc_id, CAST(sum(ntok) AS BIGINT) AS n_tokens
FROM dw JOIN tok USING (word) GROUP BY dw.doc_id"""
    )
    return "\n".join(parts)


def bit_balance(
    sigs: DataFrame, bits: int = 16, sig_col: str = "simhash"
) -> DataFrame:
    """Per-bit balance audit of a signature column → ``(bit,
    ones_permille, skewed)``: the fraction of signatures with bit b
    set, exact integer permille; ``skewed`` when it strays more than
    300 from 500.

    Why it matters: every hamming-LSH band scheme
    (`hamming_near_dups`, `phash_radius_search`) assumes bits are
    roughly balanced — a stuck bit makes its band uninformative
    (everything collides) and silently halves effective band count.
    This is the audit to run before choosing ``bands``. Pure
    projection (per-bit literals, no lambda-shift) + one aggregate of
    ``bits`` rows.
    """
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("bit"),
                    # shiftright & 1, not DIV/% — for a NEGATIVE
                    # signature (sign bit set: half of all phash64
                    # values) DIV-then-mod yields -1/0 and the ones
                    # count goes wrong (r5 review); arithmetic shift +
                    # mask extracts the two's-complement bit exactly,
                    # same as hamming_near_dups
                    F.expr(
                        f"shiftright(CAST({sig_col} AS BIGINT), {i}) & 1"
                    ).alias("v"),
                )
                for i in range(bits)
            ]
        )
    )
    per_bit = (
        sigs.select(pairs.alias("p"))
        .select(F.col("p.bit").alias("bit"), F.col("p.v").alias("v"))
        .groupBy("bit")
        .agg(F.sum("v").alias("ones"), F.count(F.lit(1)).alias("n"))
    )
    return per_bit.select(
        "bit",
        F.expr("ones * 1000 DIV n").alias("ones_permille"),
        F.expr("abs(ones * 1000 DIV n - 500) > 300").alias("skewed"),
    )


def vocab_drift(
    docs_a: DataFrame, docs_b: DataFrame, k: int = 50, pattern: str = "[^a-z]+"
) -> DataFrame:
    """Corpus drift between two crawl rounds → the ``k`` tokens whose
    relative frequency moved most: ``(token, cnt_a, cnt_b, freq_a_ppm,
    freq_b_ppm, delta_ppm)`` ordered by drift.

    The monitoring step a continuous crawl runs between rounds: a
    sudden vocabulary shift (new spam campaign, a big host changing
    language, a template rollout) shows up as high-``delta_ppm``
    tokens long before aggregate quality scores move. Frequencies are
    exact integer parts-per-million (``cnt * 1e6 DIV total``) so the
    result is bit-identical across engines — no float log-ratios.

    Shape at 100 TB: two explode → map-side-combined hash aggregates
    (one per round), a vocabulary-sized full-outer join on token
    (Zipf-headed input is absorbed by the partial aggregation; the
    join itself is vocab-sized, millions not billions), a broadcast
    1-row totals join, then a global top-k. No quadratic anywhere;
    nothing driver-side. Precondition: both corpora non-empty
    (ppm denominators).
    """

    def _counts(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.split(F.lower(F.col("text")), pattern)
                ).alias("token")
            )
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(f"cnt_{tag}"))
        )

    both = (
        _counts(docs_a, "a")
        .join(_counts(docs_b, "b"), "token", "full_outer")
        .fillna(0, ["cnt_a", "cnt_b"])
    )
    totals = both.agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    scored = both.crossJoin(F.broadcast(totals)).select(
        "token",
        "cnt_a",
        "cnt_b",
        F.expr("cnt_a * 1000000 DIV tot_a").alias("freq_a_ppm"),
        F.expr("cnt_b * 1000000 DIV tot_b").alias("freq_b_ppm"),
        F.expr(
            "abs(cnt_a * 1000000 DIV tot_a - cnt_b * 1000000 DIV tot_b)"
        ).alias("delta_ppm"),
    )
    return scored.orderBy(
        F.col("delta_ppm").desc(), F.col("token").asc()
    ).limit(k)


def source_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    source_col: str = "source",
    pattern: str = "[^a-z]+",
) -> DataFrame:
    """Per-source corpus drift between two crawl rounds →
    ``(source, n_tokens, tv_ppm)``: the exact integer total-variation
    distance (×10⁶, i.e. ``Σ|p_a − p_b| DIV 2`` over per-source
    integer-ppm frequencies) between the source's round-A and round-B
    token distributions, plus its distinct-token vocabulary size.

    This is :func:`vocab_drift` rolled up to the unit a recrawl
    scheduler actually budgets by: a feed whose content distribution
    moved is worth refetching; a static one is not (see
    ``drift_recrawl_alloc``, which apportions budget ∝ ``tv_ppm``).
    A source present in only one round scores the degenerate maximum
    (≈500000) via the ``tot=0 → freq 0`` convention — mirrored in the
    oracle so both engines agree on the edge.

    Shape at 100 TB: union (no shuffle) → explode → one hash aggregate
    on (source, token) with map-side combine → per-source totals
    (second tiny aggregate, broadcast join back; #sources rows) → one
    final per-source aggregate. Never wider than the (source, token)
    count table; no window over data.
    """
    tagged = docs_a.select(
        F.col(source_col).alias("source"), F.lit("a").alias("round"), "text"
    ).unionByName(
        docs_b.select(
            F.col(source_col).alias("source"), F.lit("b").alias("round"), "text"
        )
    )
    counts = (
        tagged.select(
            "source",
            "round",
            F.explode(F.split(F.lower(F.col("text")), pattern)).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(
            F.sum(F.when(F.col("round") == "a", 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("round") == "b", 1).otherwise(0)).alias("cnt_b"),
        )
    )
    totals = counts.groupBy("source").agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    per_token = counts.join(F.broadcast(totals), "source").select(
        "source",
        F.expr(
            "abs(CASE WHEN tot_a = 0 THEN 0 ELSE cnt_a * 1000000 DIV tot_a END"
            " - CASE WHEN tot_b = 0 THEN 0 ELSE cnt_b * 1000000 DIV tot_b END)"
        ).alias("d"),
    )
    return (
        per_token.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("CAST(sum(d) DIV 2 AS BIGINT)").alias("tv_ppm"),
        )
        .orderBy(F.col("tv_ppm").desc(), F.col("source").asc())
    )


def dup_spans(
    docs: DataFrame,
    width: int = 30,
    stride: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-text FRACTION via fixed-width character
    shingles — the cheap gate-metric companion to
    :func:`duplicate_spans` (which emits the maximal span *extents*
    for surgical removal; both approximate Lee et al. 2021
    suffix-array substring dedup) → ``(doc_id, n_spans, n_dup_spans,
    dup_ppm)``. Use this one to DROP mostly-duplicated docs
    (``scrub_admission``), the other to TRIM spans from kept docs.

    A *span* is the ``width``-char substring at positions 1, 1+stride,
    1+2·stride, … (1-based); a span is *duplicated* when its exact text
    occurs in ≥2 distinct documents. ``dup_ppm = n_dup_spans·10⁶ DIV
    n_spans`` is the per-doc duplicated-text fraction a curation
    pipeline thresholds on (docs that are mostly shared boilerplate /
    syndicated copy score high). Docs shorter than ``width`` emit no
    spans and are absent from the output — mirror the convention in
    any oracle.

    Shape at 100 TB: pure projection explode (len/stride spans per
    doc) → distinct (span, doc) → one hash aggregate on the 64-bit
    span hash (map-side combined) → join back on the hash → per-doc
    aggregate. LINEAR end-to-end — unlike pair-emitting dedup there is
    no self-join, so no DF cap is needed; the hot-span join side is
    post-aggregation (one row per distinct span). Join keys are
    ``xxhash64(span)`` (8 bytes instead of ``width`` chars through the
    shuffle); a hash collision merging two distinct spans has
    probability ~2⁻⁶⁴ per pair and only ever *overcounts* a dup span.
    """
    spans = (
        docs.filter(F.length(F.col(text_col)) >= width)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length(F.col(text_col)) - width + 1,
                    F.lit(stride),
                )
            ).alias("pos"),
            F.col(text_col).alias("_t"),
        )
        .select(
            "doc_id",
            F.xxhash64(
                F.expr(f"substring(_t, pos, {width})")
            ).alias("span_h"),
        )
    )
    df_per_span = (
        spans.select("span_h", "doc_id")
        .distinct()
        .groupBy("span_h")
        .agg(F.count(F.lit(1)).alias("doc_df"))
    )
    return (
        spans.join(df_per_span, "span_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("doc_df") >= 2, 1).otherwise(0)).alias(
                "n_dup_spans"
            ),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.expr("n_dup_spans * 1000000 DIV n_spans").alias("dup_ppm"),
        )
    )


# PII scrub patterns: kept to the regex subset Java (Spark) and RE2
# (DuckDB) evaluate identically — character classes, bounded repeats,
# \b anchors; no backrefs or lookaround. Replacement order is part of
# the contract (emails first, then IPs, then phone-ish runs, so digit
# runs inside an already-redacted token are never double-scrubbed).
PII_PATTERNS = (
    # mixed-case class matches the pattern_scan router (r5 review: a
    # lowercase-only scrub let 'John.Doe@Example.COM' through while the
    # router counted it — a PII leak in the written archive)
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the curation step after :func:`pattern_scan`'s
    routing: replace emails, IPv4s, and phone-like digit runs with
    typed placeholders → ``(doc_id, n_emails, n_ips, n_phones,
    scrubbed_md5)``.

    Counts are measured on the ORIGINAL text; the scrub applies the
    replacements in ``PII_PATTERNS`` order so later patterns cannot
    re-match inside an earlier placeholder. ``scrubbed_md5`` stands in
    for the (potentially huge) scrubbed body in oracle comparisons —
    the cache writer stores the scrubbed text itself.

    Map-only at 100 TB: every expression is JVM-codegen
    (``regexp_count`` / chained ``regexp_replace``), zero shuffles,
    column-pruned to (doc_id, text).
    """
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.regexp_count(text, F.lit(PII_PATTERNS[0][1])).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_PATTERNS[1][1])).cast("long").alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PATTERNS[2][1])).cast("long").alias("n_phones"),
        F.md5(scrubbed_text(text_col)).alias("scrubbed_md5"),
    )


def scrubbed_text(text_col: str = "text"):
    """The PII-scrubbed body as a Column — the ordered
    ``PII_PATTERNS`` replace chain. Shared by :func:`pii_scrub` (which
    hashes it for oracle comparison) and the preprocess plan (which
    stores it); one definition so the two can never diverge."""
    col = F.col(text_col)
    for _, rx, repl in PII_PATTERNS:
        col = F.regexp_replace(col, rx, repl)
    return col


def pii_count(text_col: str = "text"):
    """Total PII matches in the original body as a Column (sum over
    ``PII_PATTERNS``) — the per-row metric the preprocess plan
    observes."""
    c = None
    for _, rx, _repl in PII_PATTERNS:
        cnt = F.regexp_count(F.col(text_col), F.lit(rx)).cast("long")
        c = cnt if c is None else c + cnt
    return c
