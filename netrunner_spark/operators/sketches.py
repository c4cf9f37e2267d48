"""Mergeable approximate-aggregate sketches, exact-integer flavored.

At 100 TB, "how many distinct URLs/users" and "how often does this
token occur" are sketch questions: the exact answers cost a full
shuffle on the key, while a sketch is a tiny, MERGEABLE summary that
partial aggregation combines map-side for free. Spark ships HLL++
(`approx_count_distinct`) whose binary state no oracle can reproduce —
these two sketches are deliberately built from EXACT integer
arithmetic (md5-derived hashes, (a·x+b) mod p rows) so a DuckDB twin
matches bit-for-bit, and every estimate is auditable.

* KMV (k-minimum-values) distinct count: keep the k smallest hash
  values of the key; estimate D ≈ (k−1)·M / h_k where M is the hash
  domain. The "keep k smallest" is Spark's TakeOrdered (sort+limit
  fuses into a per-partition top-k + driver merge of k·P values — no
  global sort shuffle), which IS the sketch merge.
* Count-min frequency sketch: d hash rows × w cells of SUM counts;
  point estimate = min over rows. Cell building is ONE hash aggregate
  with map-side partial sums — the aggregation is the merge; the
  sketch table is d·w rows regardless of corpus size.

Hashing: md5 hex → BIGINT (first 13 hex digits, 52 bits) — the one
hash both engines compute identically (`sampling._pos_hex` uses the
same trick for split hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MOD = 2_147_483_647  # 2^31 − 1, matches textops permutation arithmetic
# CMS row-hash multiplier: 104729 (the minhash family's prime) mixed
# with Knuth's 2654435761 so a_j·Δg wraps MOD many times — with the
# bare minhash multipliers, tokens whose gram hashes are congruent
# mod `width` collided in EVERY row (no wrap ⇒ the mod-width residue
# survived all j), breaking the CMS guarantee. (2j+1)·CMS_A ≈ 2e15
# and (a_j mod MOD)·g < 2^62 — all exact int64 in both engines.
CMS_A = 104729 * 2654435761
HASH_MAX = 16**13  # md5-prefix domain: 52 bits — (k-1)*M fits int64


def md5_hash52(col, salt: str = "kmv") -> Column:
    """Deterministic 52-bit integer hash both engines agree on:
    CAST(first 13 hex chars of md5(salt || value) AS BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 13), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame, key: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """K-minimum-values distinct-count sketch over ``key`` → ONE row
    (k_used, kth_hash, est_distinct): est = (k−1)·HASH_MAX // h_k
    (Bar-Yossef et al. 2002). If the table has fewer than k distinct
    hashes the sketch is exact and est_distinct = that count.

    Scale shape: distinct-hash projection, then ``orderBy(h).limit(k)``
    — Catalyst plans TakeOrderedAndProject: each partition keeps its
    own top-k and only k·P candidate values ever leave the executors.
    No full sort, no wide shuffle; k is the whole memory story.
    """
    hashes = df.select(md5_hash52(key, salt).alias("h")).dropDuplicates()
    smallest = hashes.orderBy("h").limit(k)
    return smallest.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("long")
        ).otherwise(
            F.expr(f"CAST(({k} - 1) * {16**13} AS BIGINT) div kth_hash")
        ).alias("est_distinct"),
    )


def kmv_sql(table: str, key: str, k: int = 256, salt: str = "kmv") -> str:
    """DuckDB twin of ``kmv_distinct`` — identical hash + estimator."""
    return f"""
        WITH h AS (
          SELECT DISTINCT CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 13) AS BIGINT) AS h
          FROM {table}
        ), sk AS (SELECT h FROM h ORDER BY h LIMIT {k})
        SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS BIGINT)
                    ELSE CAST(({k} - 1) * CAST({HASH_MAX} AS BIGINT) // max(h) AS BIGINT)
               END AS est_distinct
        FROM sk
    """


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str = "user_id",
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al., SIGMOD 2007: synopses for
    distinct-value estimation under multiset operations) → ONE row
    ``(k_used, kth_hash, rho, est_union, est_intersect)``.

    The union sketch is the k smallest of the two sketches' merged
    hash sets (KMV's closure property — merging sketches IS the union
    sketch); ``rho`` counts its members present in BOTH input sketches,
    and the intersection estimate is the textbook
    ``rho · est_union div k_used`` in exact int64 — deterministic given
    the shared md5-prefix hash, so the DuckDB twin is bit-identical.
    When the union has fewer than k distinct hashes every sketch is the
    exact set and the "estimates" are exact counts.

    Scale shape: two distinct-hash projections each collapsed by
    TakeOrderedAndProject (per-partition top-k, only k·P candidates
    ever move), then joins over k-row frames — broadcast-sized by
    construction. The sketch algebra itself never touches the big side
    again: this is why engines ship KMV for cross-segment distinct
    set-overlap questions at 10^10 rows.
    """
    ha = df_a.select(md5_hash52(key, salt).alias("h")).dropDuplicates()
    hb = df_b.select(md5_hash52(key, salt).alias("h")).dropDuplicates()
    sa = ha.orderBy("h").limit(k)
    sb = hb.orderBy("h").limit(k)
    u = sa.unionByName(sb).dropDuplicates().orderBy("h").limit(k)
    marked = u.join(
        sa.withColumn("in_a", F.lit(1)), "h", "left"
    ).join(sb.withColumn("in_b", F.lit(1)), "h", "left")
    agg = marked.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
        F.sum(
            F.when(
                F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("rho"),
    )
    return agg.select(
        "k_used",
        "kth_hash",
        "rho",
        F.when(F.col("k_used") < k, F.col("k_used").cast("long"))
        .otherwise(F.expr(f"CAST(({k} - 1) * {HASH_MAX} AS BIGINT) div kth_hash"))
        .alias("est_union"),
    ).select(
        "k_used",
        "kth_hash",
        "rho",
        "est_union",
        F.expr("CAST(rho * est_union div k_used AS BIGINT)").alias(
            "est_intersect"
        ),
    )


def kmv_set_sql(
    from_a: str,
    from_b: str,
    key: str,
    k: int = 128,
    salt: str = "kmv",
) -> str:
    """DuckDB twin of :func:`kmv_set_ops` — identical hash, merge and
    estimator arithmetic. ``from_a``/``from_b`` are FROM-clause bodies
    (table or subquery) supplying the ``key`` column."""
    h = (
        f"CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 13)"
        " AS BIGINT)"
    )
    return f"""
        WITH sa AS (
          SELECT DISTINCT {h} AS h FROM {from_a} ORDER BY h LIMIT {k}
        ), sb AS (
          SELECT DISTINCT {h} AS h FROM {from_b} ORDER BY h LIMIT {k}
        ), u AS (
          SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
          ORDER BY h LIMIT {k}
        ), m AS (
          SELECT u.h,
                 CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                      THEN 1 ELSE 0 END AS in_both
          FROM u LEFT JOIN sa ON sa.h = u.h LEFT JOIN sb ON sb.h = u.h
        ), a AS (
          SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
                 CAST(sum(in_both) AS BIGINT) AS rho
          FROM m
        ), e AS (
          SELECT k_used, kth_hash, rho,
                 CASE WHEN k_used < {k} THEN k_used
                      ELSE CAST(({k} - 1) * CAST({HASH_MAX} AS BIGINT)
                                // kth_hash AS BIGINT)
                 END AS est_union
          FROM a
        )
        SELECT k_used, kth_hash, rho, est_union,
               CAST(rho * est_union // k_used AS BIGINT) AS est_intersect
        FROM e
    """


def kmv_set_full(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str = "user_id",
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """The COMPLETE KMV set algebra (Beyer et al., SIGMOD 2007 §4) →
    ONE row ``(k_used, kth_hash, rho_ab, rho_a_only, rho_b_only,
    est_union, est_intersect, est_a_minus_b, est_b_minus_a,
    jaccard_pm)``.

    :func:`kmv_set_ops` answers "how many in BOTH"; the remaining
    multiset questions a crawl corpus asks of two synopses are the
    DIFFERENCES ("how many URLs did source A contribute that B never
    saw") and the resemblance. All come from the same union sketch:
    each member of the k smallest union hashes is classified
    a∩b / a-only / b-only against the two input sketches, and every
    estimate is the textbook ``count · est_union div k_used`` in exact
    int64; ``jaccard_pm`` is ``rho_ab · 1000 div k_used`` (the KMV
    resemblance estimator, permille). Sub-k inputs degrade to exact
    counts, same as the sibling.

    Scale shape: identical to :func:`kmv_set_ops` — two
    TakeOrderedAndProject sketches (k·P candidate rows move, no wide
    shuffle), then joins over ≤k-row frames. The raw tables are
    touched exactly once each.
    """
    ha = df_a.select(md5_hash52(key, salt).alias("h")).dropDuplicates()
    hb = df_b.select(md5_hash52(key, salt).alias("h")).dropDuplicates()
    sa = ha.orderBy("h").limit(k)
    sb = hb.orderBy("h").limit(k)
    u = sa.unionByName(sb).dropDuplicates().orderBy("h").limit(k)
    marked = u.join(
        sa.withColumn("in_a", F.lit(1)), "h", "left"
    ).join(sb.withColumn("in_b", F.lit(1)), "h", "left")
    a_in = F.col("in_a").isNotNull()
    b_in = F.col("in_b").isNotNull()
    agg = marked.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
        F.sum(F.when(a_in & b_in, 1).otherwise(0)).cast("long").alias("rho_ab"),
        F.sum(F.when(a_in & ~b_in, 1).otherwise(0))
        .cast("long")
        .alias("rho_a_only"),
        F.sum(F.when(~a_in & b_in, 1).otherwise(0))
        .cast("long")
        .alias("rho_b_only"),
    )
    est_u = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("long"))
        .otherwise(F.expr(f"CAST(({k} - 1) * {HASH_MAX} AS BIGINT) div kth_hash"))
        .alias("est_union")
    )
    return agg.select(
        "k_used", "kth_hash", "rho_ab", "rho_a_only", "rho_b_only", est_u
    ).select(
        "*",
        F.expr("CAST(rho_ab * est_union div k_used AS BIGINT)").alias(
            "est_intersect"
        ),
        F.expr("CAST(rho_a_only * est_union div k_used AS BIGINT)").alias(
            "est_a_minus_b"
        ),
        F.expr("CAST(rho_b_only * est_union div k_used AS BIGINT)").alias(
            "est_b_minus_a"
        ),
        F.expr("CAST(rho_ab * 1000 div k_used AS BIGINT)").alias("jaccard_pm"),
    )


def kmv_full_sql(
    from_a: str,
    from_b: str,
    key: str,
    k: int = 128,
    salt: str = "kmv",
) -> str:
    """DuckDB twin of :func:`kmv_set_full` — identical hash, merge,
    classification and estimator arithmetic."""
    h = (
        f"CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 13)"
        " AS BIGINT)"
    )
    return f"""
        WITH sa AS (
          SELECT DISTINCT {h} AS h FROM {from_a} ORDER BY h LIMIT {k}
        ), sb AS (
          SELECT DISTINCT {h} AS h FROM {from_b} ORDER BY h LIMIT {k}
        ), u AS (
          SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
          ORDER BY h LIMIT {k}
        ), m AS (
          SELECT u.h,
                 CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
                 CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
          FROM u LEFT JOIN sa ON sa.h = u.h LEFT JOIN sb ON sb.h = u.h
        ), a AS (
          SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
                 CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rho_ab,
                 CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rho_a_only,
                 CAST(sum(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rho_b_only
          FROM m
        ), e AS (
          SELECT *,
                 CASE WHEN k_used < {k} THEN k_used
                      ELSE CAST(({k} - 1) * CAST({HASH_MAX} AS BIGINT)
                                // kth_hash AS BIGINT)
                 END AS est_union
          FROM a
        )
        SELECT k_used, kth_hash, rho_ab, rho_a_only, rho_b_only, est_union,
               CAST(rho_ab * est_union // k_used AS BIGINT) AS est_intersect,
               CAST(rho_a_only * est_union // k_used AS BIGINT) AS est_a_minus_b,
               CAST(rho_b_only * est_union // k_used AS BIGINT) AS est_b_minus_a,
               CAST(rho_ab * 1000 // k_used AS BIGINT) AS jaccard_pm
        FROM e
    """


def bloom_novelty(
    corpus: DataFrame,
    batch: DataFrame,
    key: str,
    group_col: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "blm",
) -> DataFrame:
    """Per-group NOVELTY of a new batch against an existing corpus,
    answered from a Bloom synopsis of the corpus → ``(<group>,
    n_batch, n_maybe_dup, n_novel, novelty_pm)``.

    The incremental-crawl question ("how much NEW content did this
    round's fetches bring per host", reference crawler's seen-set role,
    crawler.rs dedup pass) at 10^10 rows: the corpus is summarized once
    into a ≤k·m-row bit table (:func:`bloom_bits` — building is
    merging, so per-partition partial filters union for free) and the
    batch is probed against it. Bloom has no false negatives, so
    ``n_novel`` is a LOWER bound on true novelty (false positives
    deflate it at the standard rate); with the deterministic md5 bits
    the DuckDB twin reproduces the exact same false positives.
    ``novelty_pm`` = ``n_novel·1000 div n_batch`` (permille, exact
    int).

    Scale shape: one hash-dedup of corpus keys into the bit table
    (bounded k·m rows → auto-broadcast), one explode+equi-join probe
    of the batch, one group aggregate. The corpus is never joined
    against the batch directly.
    """
    keys = batch.select(F.col(group_col).alias("grp"), F.col(key)).dropDuplicates()
    bits = bloom_bits(corpus, key, m=m, k=k, salt=salt)
    probed = bloom_probe(bits, keys.select(key).dropDuplicates(), key, m=m, k=k, salt=salt)
    j = keys.join(probed, key)
    return (
        j.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum(F.when(F.col("maybe_present"), 1).otherwise(0))
            .cast("long")
            .alias("n_maybe_dup"),
        )
        .select(
            group_col,
            "n_batch",
            "n_maybe_dup",
            (F.col("n_batch") - F.col("n_maybe_dup")).alias("n_novel"),
            F.expr(
                "CAST((n_batch - n_maybe_dup) * 1000 div n_batch AS BIGINT)"
            ).alias("novelty_pm"),
        )
    )


def bloom_novelty_sql(
    corpus_sql: str,
    batch_sql: str,
    key: str,
    group_col: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "blm",
    extra_cte: str = "",
) -> str:
    """DuckDB twin of :func:`bloom_novelty`: ``corpus_sql`` yields the
    corpus ``key`` column, ``batch_sql`` yields ``(group_col, key)``;
    ``extra_cte`` (a ``name AS (...)`` body) is prepended to the WITH
    chain so both inputs can reference a shared source CTE."""
    pre = f"{extra_cte}," if extra_cte else ""
    return f"""
WITH {pre} ks AS (SELECT unnest(generate_series(0, {k - 1})) AS j),
corpus AS ({corpus_sql}),
bits AS (
  SELECT DISTINCT j,
         CAST('0x' || substr(md5('{salt}' || CAST(j AS VARCHAR) || '#' || CAST({key} AS VARCHAR)), 1, 13) AS BIGINT) % {m} AS bit
  FROM corpus, ks
), batch AS (
  SELECT DISTINCT {group_col}, {key} FROM ({batch_sql})
), pk AS (SELECT DISTINCT {key} FROM batch),
pb AS (
  SELECT pk.{key}, j,
         CAST('0x' || substr(md5('{salt}' || CAST(j AS VARCHAR) || '#' || CAST(pk.{key} AS VARCHAR)), 1, 13) AS BIGINT) % {m} AS bit
  FROM pk, ks
), probed AS (
  SELECT pb.{key},
         CAST(count(bits.bit) AS BIGINT) = {k} AS maybe_present
  FROM pb LEFT JOIN bits ON bits.j = pb.j AND bits.bit = pb.bit
  GROUP BY pb.{key}
), agg AS (
  SELECT batch.{group_col},
         CAST(count(*) AS BIGINT) AS n_batch,
         CAST(sum(CASE WHEN maybe_present THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe_dup
  FROM batch JOIN probed ON probed.{key} = batch.{key}
  GROUP BY batch.{group_col}
)
SELECT {group_col}, n_batch, n_maybe_dup,
       n_batch - n_maybe_dup AS n_novel,
       CAST((n_batch - n_maybe_dup) * 1000 // n_batch AS BIGINT) AS novelty_pm
FROM agg
"""


def cms_cells(
    tokens: DataFrame,
    token_col: str = "gram",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch cells over a token-occurrence table → (j, cell,
    cnt), d·w rows total. Row hashes are h_j(g) = ((2j+1)·CMS_A·g +
    7919·j + 1) mod p, folded mod width — exact int64; see CMS_A for
    why the multiplier must be large here (mod-width congruence must
    not survive the row family). ONE hash aggregate; partial map-side sums make the
    shuffle O(d·w·partitions) regardless of corpus size — the
    aggregation IS the sketch merge."""
    from netrunner_spark.operators.textops import gram_hash

    g = tokens.select(gram_hash(F.col(token_col)).alias("g"))
    rows = g.select(
        "g", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    cell = (
        (F.lit(2) * F.col("j") + 1) * F.lit(CMS_A) % F.lit(MOD) * F.col("g")
        + F.col("j") * F.lit(7919)
        + F.lit(1)
    ) % F.lit(MOD) % F.lit(width)
    return (
        rows.withColumn("cell", cell.cast("long"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    queries: DataFrame,
    token_col: str = "gram",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``queries`` tokens from a cells
    table → (token, est_count): min over the d row cells (the classic
    CMS upper-bound estimate; over-counts only via collisions, never
    under). Broadcast-joins the d·w-row sketch to the query tokens —
    no corpus access at query time."""
    from netrunner_spark.operators.textops import gram_hash

    q = queries.select(
        F.col(token_col).alias("token"), gram_hash(F.col(token_col)).alias("g")
    )
    qr = q.select(
        "token", "g", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    cell = (
        (F.lit(2) * F.col("j") + 1) * F.lit(CMS_A) % F.lit(MOD) * F.col("g")
        + F.col("j") * F.lit(7919)
        + F.lit(1)
    ) % F.lit(MOD) % F.lit(width)
    qr = qr.withColumn("cell", cell.cast("long"))
    joined = qr.join(F.broadcast(cells), ["j", "cell"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy("token").agg(F.min("cnt").alias("est_count"))


def hist_bins(df: DataFrame, col: str, bin_width: int = 100) -> DataFrame:
    """Fixed-width histogram sketch over an integer column → (bin,
    cnt) with bin = value div bin_width. ONE hash aggregate with
    map-side partial sums; the bin table is |domain|/bin_width rows
    regardless of corpus size, and two sketches merge by summing
    counts (same contract as ``cms_cells``)."""
    return (
        # FLOOR division via pmod (r5 review): plain `div` truncates
        # toward zero, so negatives -99..-1 shared bin 0 with 0..99 — a
        # double-width bin whose reported lower bound broke the
        # bin-width error contract. pmod's non-negative remainder makes
        # this exact floor in both engines.
        df.select(
            F.expr(
                f"(CAST({col} AS BIGINT) - pmod(CAST({col} AS BIGINT),"
                f" {bin_width})) div {bin_width}"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    bins: DataFrame, qs_permille: tuple[int, ...] = (500, 900, 990), bin_width: int = 100
) -> DataFrame:
    """Quantile estimates from a histogram sketch → (q_permille,
    est_value): the lower bound of the first bin whose cumulative
    count reaches rank ⌈q·n/1000⌉. Exact integer arithmetic end to
    end (rank, cumsum, bin edge), so the DuckDB twin is bit-identical —
    unlike ``percentile_approx``/t-digest state, every estimate is
    auditable, and the error bound is the bin width by construction.

    Work is O(bins log bins) on a sketch-sized table: one window
    cumsum over the ordered bins, one broadcast of the q list."""
    total = bins.agg(F.sum("cnt").alias("n"))
    from pyspark.sql import Window

    # NULLS LAST to match DuckDB's ASC default: Spark's nulls-first put
    # a NULL bin (NULL values in the source column) at the START of the
    # cumsum, biasing every quantile low vs the twin (r5 review — the
    # same nulls-ordering class caption_consensus already pins)
    w = Window.orderBy(F.col("bin").asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(total)
    )
    qdf = bins.sparkSession.createDataFrame(
        [(q,) for q in qs_permille], "q_permille int"
    )
    joined = F.broadcast(qdf).crossJoin(cum).filter(
        F.col("cum") * 1000 >= F.col("q_permille") * F.col("n")
    )
    return (
        joined.groupBy("q_permille")
        .agg(F.min("bin").alias("first_bin"))
        .select(
            "q_permille", (F.col("first_bin") * bin_width).alias("est_value")
        )
        .orderBy("q_permille")
    )


def hist_quantiles_sql(
    table: str,
    col: str,
    qs_permille: tuple[int, ...] = (500, 900, 990),
    bin_width: int = 100,
) -> str:
    """DuckDB twin of ``hist_bins`` → ``hist_quantiles`` (identical
    integer rank/cumsum arithmetic)."""
    vals = ", ".join(f"({q})" for q in qs_permille)
    return f"""
        WITH bins AS (
          SELECT (CAST({col} AS BIGINT)
                  - ((CAST({col} AS BIGINT) % {bin_width}) + {bin_width})
                    % {bin_width}) // {bin_width} AS bin,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM {table} GROUP BY bin
        ), cum AS (
          SELECT bin, sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
          FROM bins
        ), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM bins),
        q AS (SELECT * FROM (VALUES {vals}) AS v(q_permille))
        SELECT CAST(q_permille AS INT) AS q_permille,
               CAST(min(bin) * {bin_width} AS BIGINT) AS est_value
        FROM q, cum, tot
        WHERE cum * 1000 >= q_permille * n
        GROUP BY q_permille
        ORDER BY q_permille
    """


def _bitlen_case(expr: str, bits: int) -> str:
    """SQL CASE computing bit_length(expr) for a non-negative integer
    < 2**bits — EXACT integer arithmetic, no log2 float round-trip, and
    the identical text runs in both Spark SQL (F.expr) and DuckDB, so
    the twin cannot drift on a boundary value (floor(log2(2^k)) is one
    ulp from disaster in either engine's double path)."""
    whens = " ".join(
        f"WHEN {expr} >= {1 << (b - 1)} THEN {b}" for b in range(bits, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def hll_registers(
    df: DataFrame,
    key: str,
    p: int = 6,
    salt: str = "hll",
    by: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog register table over ``key`` → ``(bucket, rho)`` for
    the NON-EMPTY buckets of an m = 2**p register array (Flajolet et
    al. 2007). bucket = low p bits of the 52-bit md5 hash; rho =
    leading-zero count of the remaining (52−p)-bit window + 1, i.e.
    (52−p) + 1 − bit_length(rest); the register keeps max(rho).

    Why next to KMV: KMV answers one global distinct count; the HLL
    register TABLE is the mergeable per-partition / per-day sketch a
    100 TB crawl unions across shards and time — merging = groupBy
    bucket, max(rho), exactly this aggregate re-run over unions. The
    register table is ≤ 2**p rows regardless of corpus size, built by
    one map-side-combinable hash aggregate; empty buckets are implicit
    (rho 0) so a sparse sketch of a small shard stays small.

    Exactness: the bit_length step is a generated integer CASE chain
    (`_bitlen_case`) rather than floor(log2(x)) — bit-identical in
    Spark and DuckDB. The float harmonic-mean estimate lives in
    :func:`hll_estimate` and is NOT part of the oracle-checked output.

    ``by``: optional grouping columns → one register table PER GROUP
    (per-day / per-shard sketches); merging groups back is
    ``groupBy(bucket).max(rho)``, and the merged table is identical to
    sketching the whole input — the identity the `sketch_hll_merged`
    driver query pins against the whole-table oracle.
    """
    rest_bits = 52 - p
    rows = df.select(*by, md5_hash52(key, salt).alias("h")).select(
        *by,
        (F.col("h") % (1 << p)).alias("bucket"),
        F.expr(f"h DIV {1 << p}").alias("rest"),
    )
    bitlen = F.expr(_bitlen_case("rest", rest_bits))
    return (
        rows.withColumn("rho", (F.lit(rest_bits + 1) - bitlen).cast("int"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers, p: int = 6) -> float:
    """Classic HLL harmonic-mean estimate from a ``(bucket, rho)``
    register table (small-range linear counting below 2.5·m). Float —
    for consumers, not for the oracle (which checks the registers)."""
    m = 1 << p
    regs = {int(r["bucket"]): int(r["rho"]) for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -regs.get(i, 0) for i in range(m))
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros:
        import math

        est = m * math.log(m / zeros)
    return est


def hll_sql(table: str, key: str, p: int = 6, salt: str = "hll") -> str:
    """DuckDB twin of ``hll_registers`` — identical hash, bucket split,
    and generated bit-length CASE."""
    rest_bits = 52 - p
    case = _bitlen_case("rest", rest_bits)
    return f"""
        WITH h AS (
          SELECT CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 13) AS BIGINT) AS h
          FROM {table}
        ), split AS (
          SELECT h % {1 << p} AS bucket, h // {1 << p} AS rest FROM h
        )
        SELECT bucket, CAST(max({rest_bits + 1} - {case}) AS INT) AS rho
        FROM split GROUP BY bucket
    """


def bloom_bits(
    df: DataFrame, key: str, m: int = 4096, k: int = 3, salt: str = "blm"
) -> DataFrame:
    """Relational Bloom filter → the DISTINCT set-bit table
    ``(j, bit)`` (k hash rows × m-bit domain).

    The oracle-expressible twin of the engine's numpy seen-shards
    (`operators/seen.py`): bit j,i is set iff some key hashes there —
    a groupBy-distinct, so building IS merging (union of shards =
    union of bit tables), and the table is ≤ k·m rows regardless of
    input size. Hashing reuses the md5-52 trick with per-row salts so
    DuckDB reproduces every bit exactly.
    """
    rows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.struct(
                j.alias("j"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(salt),
                                    j.cast("string"),
                                    F.lit("#"),
                                    F.col(key).cast("string"),
                                )
                            ),
                            1,
                            13,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % m
                ).alias("bit"),
            ),
        )
    )
    return (
        df.select(rows.alias("r"))
        .select(F.col("r.j").alias("j"), F.col("r.bit").alias("bit"))
        .dropDuplicates()
    )


def bloom_probe(
    bits: DataFrame, probes: DataFrame, key: str, m: int = 4096, k: int = 3,
    salt: str = "blm",
) -> DataFrame:
    """Probe a :func:`bloom_bits` table → ``(<key>, maybe_present)``:
    true iff ALL k probe bits are set (standard Bloom semantics — no
    false negatives, false positives at the usual (1-e^{-kn/m})^k
    rate, and the EXACT same false positives in both engines since the
    bits are deterministic). One explode + one equi-join on (j, bit)
    + a full-house count, the `boolean_search` counting pattern."""
    # dedup the probe keys: a key probed twice yielded n_hits == 2k and
    # failed the == k full-house test — a FALSE NEGATIVE for a present
    # key (r5 review; the SQL twin dedups identically)
    probes = probes.select(key).dropDuplicates()
    prows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.struct(
                j.alias("j"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(salt),
                                    j.cast("string"),
                                    F.lit("#"),
                                    F.col(key).cast("string"),
                                )
                            ),
                            1,
                            13,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % m
                ).alias("bit"),
            ),
        )
    )
    exploded = probes.select(F.col(key), prows.alias("r")).select(
        key, F.col("r.j").alias("j"), F.col("r.bit").alias("bit")
    )
    hits = (
        exploded.join(bits.withColumn("_set", F.lit(1)), ["j", "bit"], "left")
        .groupBy(key)
        .agg(F.sum(F.coalesce("_set", F.lit(0))).alias("n_hits"))
    )
    return hits.select(key, (F.col("n_hits") == k).alias("maybe_present"))


def bloom_sql(
    table: str, key: str, probes_sql: str, m: int = 4096, k: int = 3,
    salt: str = "blm",
) -> str:
    """DuckDB twin of bloom_bits + bloom_probe composed: identical
    per-row-salted md5 bits, full-house membership."""
    return f"""
WITH ks AS (SELECT unnest(generate_series(0, {k - 1})) AS j),
bits AS (
  SELECT DISTINCT j,
         CAST('0x' || substr(md5('{salt}' || CAST(j AS VARCHAR) || '#' || CAST({key} AS VARCHAR)), 1, 13) AS BIGINT) % {m} AS bit
  FROM {table}, ks
), p AS (SELECT DISTINCT {key} FROM ({probes_sql}) _probes_dedup),
pb AS (
  SELECT p.{key}, j,
         CAST('0x' || substr(md5('{salt}' || CAST(j AS VARCHAR) || '#' || CAST(p.{key} AS VARCHAR)), 1, 13) AS BIGINT) % {m} AS bit
  FROM p, ks
)
SELECT pb.{key},
       CAST(count(bits.bit) AS BIGINT) = {k} AS maybe_present
FROM pb LEFT JOIN bits ON bits.j = pb.j AND bits.bit = pb.bit
GROUP BY pb.{key}
"""


def grouped_hist_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: int = 10,
    qs_permille: tuple[int, ...] = (500, 950, 990),
) -> DataFrame:
    """Per-GROUP histogram quantiles → ``(group, q_permille,
    est_value)``: the lower bound of the first bin whose cumulative
    count reaches rank ⌈q·n/1000⌉ within that group.

    The skew-safe way to ask "P99 fetch latency PER HOST" at 10^10
    rows: a naive per-group sort/percentile puts a hot host's entire
    event stream into one task; here the raw table is collapsed by ONE
    hash aggregate into (group, bin) counts first, and the only window
    runs over each group's BINS — bounded by value-domain/bin_width
    (e.g. latency 0–60 s at 10 ms bins = ≤ 6 000 rows per group, no
    matter how hot the host). Same exact-integer contract as
    :func:`hist_quantiles`, grouped.
    """
    from pyspark.sql import Window

    bins = (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(
                f"(CAST({value_col} AS BIGINT) - pmod(CAST({value_col}"
                f" AS BIGINT), {bin_width})) div {bin_width}"
            ).alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # NULLS LAST: see hist_quantiles (cross-engine nulls ordering)
    w = Window.partitionBy("grp").orderBy(F.col("bin").asc_nulls_last())
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    qs = F.explode(F.array(*[F.lit(q) for q in qs_permille])).alias("q_permille")
    hit = cum.select("grp", "bin", "cum", "total", qs).filter(
        F.col("cum") * 1000 >= F.col("q_permille") * F.col("total")
    )
    return (
        hit.groupBy(F.col("grp").alias(group_col), "q_permille")
        .agg(F.min("bin").alias("first_bin"))
        .select(
            group_col,
            "q_permille",
            (F.col("first_bin") * bin_width).alias("est_value"),
        )
    )


def grouped_hist_quantiles_sql(
    src: str,
    group_col: str,
    value_col: str,
    bin_width: int = 10,
    qs_permille: tuple[int, ...] = (500, 950, 990),
) -> str:
    """DuckDB twin of :func:`grouped_hist_quantiles` over source
    ``src`` (must provide group and value columns)."""
    qvals = ", ".join(f"({q})" for q in qs_permille)
    return f"""
WITH bins AS (
  SELECT {group_col} AS grp,
         (CAST({value_col} AS BIGINT)
          - ((CAST({value_col} AS BIGINT) % {bin_width}) + {bin_width})
            % {bin_width}) // {bin_width} AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {src} GROUP BY 1, 2
), cum AS (
  SELECT grp, bin,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY grp) AS total
  FROM bins
), qs AS (SELECT * FROM (VALUES {qvals}) AS t(q_permille))
SELECT grp AS {group_col}, q_permille,
       CAST(min(bin) * {bin_width} AS BIGINT) AS est_value
FROM cum, qs
WHERE cum * 1000 >= q_permille * total
GROUP BY 1, 2
"""


def kmv_group_overlap(
    df: DataFrame,
    key: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise set-overlap MATRIX across groups from per-group KMV
    sketches → one row per group pair ``(grp_a, grp_b, k_used,
    est_union, est_intersect, jaccard_pm)`` (``grp_a < grp_b``).

    The group-level generalization of :func:`kmv_set_full`: "how much
    do my sources/segments overlap, pairwise" answered from G synopses
    of k hashes each instead of G² distinct-joins of the raw data —
    the sketch-scale sibling of the exact ``cross_source_dups``
    matrix. Same md5-52 hash and estimator arithmetic, so the DuckDB
    twin is bit-identical; sub-k pairs degrade to exact counts.

    Scale shape: the raw table is touched ONCE (distinct (group, hash)
    projection). Per-group top-k is the TWO-LEVEL window — first rank
    within (group, pmod(h, 64)) stripes, then rank the ≤64·k
    survivors per group — so no window ever sorts a whole hot group's
    hash set (the exact top-k is preserved: a group's k smallest are
    each within their stripe's k smallest). Everything after operates
    on ≤G·k sketch rows: the pair matrix is G²-bounded, never
    data-bounded.
    """
    from pyspark.sql import Window

    hashes = df.select(
        F.col(group_col).alias("grp"), md5_hash52(key, salt).alias("h")
    ).dropDuplicates()
    w1 = Window.partitionBy("grp", F.pmod(F.col("h"), F.lit(64))).orderBy("h")
    pruned = hashes.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    sk = (
        pruned.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .select("grp", "h")
    )
    groups = sk.select("grp").dropDuplicates()
    pairs = (
        groups.alias("ga")
        .join(groups.alias("gb"), F.col("ga.grp") < F.col("gb.grp"))
        .select(F.col("ga.grp").alias("grp_a"), F.col("gb.grp").alias("grp_b"))
    )
    cand = (
        pairs.join(sk.alias("sa"), F.col("sa.grp") == F.col("grp_a"))
        .select("grp_a", "grp_b", "h")
        .unionByName(
            pairs.join(sk.alias("sb"), F.col("sb.grp") == F.col("grp_b")).select(
                "grp_a", "grp_b", "h"
            )
        )
        .dropDuplicates()
    )
    wu = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    u = cand.withColumn("_ru", F.row_number().over(wu)).filter(F.col("_ru") <= k)
    m = (
        u.join(
            sk.select(F.col("grp").alias("_ga"), F.col("h").alias("_ha")),
            (F.col("_ga") == F.col("grp_a")) & (F.col("_ha") == F.col("h")),
            "left",
        )
        .join(
            sk.select(F.col("grp").alias("_gb"), F.col("h").alias("_hb")),
            (F.col("_gb") == F.col("grp_b")) & (F.col("_hb") == F.col("h")),
            "left",
        )
        .select(
            "grp_a",
            "grp_b",
            "h",
            (F.col("_ha").isNotNull() & F.col("_hb").isNotNull()).alias("in_both"),
        )
    )
    agg = m.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("_kth"),
        F.sum(F.when(F.col("in_both"), 1).otherwise(0)).cast("long").alias("_rho"),
    )
    return (
        agg.withColumn(
            "est_union",
            F.when(F.col("k_used") < k, F.col("k_used").cast("long")).otherwise(
                F.expr(f"CAST(({k} - 1) * {HASH_MAX} AS BIGINT) div _kth")
            ),
        )
        .select(
            "grp_a",
            "grp_b",
            "k_used",
            "est_union",
            F.expr("CAST(_rho * est_union div k_used AS BIGINT)").alias(
                "est_intersect"
            ),
            F.expr("CAST(_rho * 1000 div k_used AS BIGINT)").alias("jaccard_pm"),
        )
    )


def kmv_group_overlap_sql(
    src: str,
    key: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> str:
    """DuckDB twin of :func:`kmv_group_overlap` over source ``src``
    (must provide group and key columns)."""
    h = (
        f"CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 13)"
        " AS BIGINT)"
    )
    return f"""
WITH hs AS (
  SELECT DISTINCT {group_col} AS grp, {h} AS h FROM ({src})
), sk AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= {k}
), g AS (SELECT DISTINCT grp FROM sk),
p AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b FROM g a JOIN g b ON a.grp < b.grp
), cand AS (
  SELECT grp_a, grp_b, h FROM p JOIN sk ON sk.grp = p.grp_a
  UNION
  SELECT grp_a, grp_b, h FROM p JOIN sk ON sk.grp = p.grp_b
), u AS (
  SELECT grp_a, grp_b, h FROM (
    SELECT grp_a, grp_b, h,
           row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn
    FROM cand
  ) WHERE rn <= {k}
), m AS (
  SELECT u.grp_a, u.grp_b, u.h,
         CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END AS in_both
  FROM u
  LEFT JOIN sk sa ON sa.grp = u.grp_a AND sa.h = u.h
  LEFT JOIN sk sb ON sb.grp = u.grp_b AND sb.h = u.h
), a AS (
  SELECT grp_a, grp_b, CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth,
         CAST(sum(in_both) AS BIGINT) AS rho
  FROM m GROUP BY 1, 2
), e AS (
  SELECT grp_a, grp_b, k_used, rho,
         CASE WHEN k_used < {k} THEN k_used
              ELSE CAST(({k} - 1) * CAST({HASH_MAX} AS BIGINT) // kth AS BIGINT)
         END AS est_union
  FROM a
)
SELECT grp_a, grp_b, k_used, est_union,
       CAST(rho * est_union // k_used AS BIGINT) AS est_intersect,
       CAST(rho * 1000 // k_used AS BIGINT) AS jaccard_pm
FROM e
"""
