"""Similarity search over an embedding column (array<float>):
brute-force top-k as the baseline, LSH-bucketed as the scale path.

Exactness strategy: compared outputs use QUANTIZED integer dot products
(elements → round(x·1000) as int64; products summed exactly) so results
hash-match a DuckDB oracle regardless of float summation order. The
float cosine variant is provided for real use (rows-only check).

Scale notes: brute-force is a broadcast nested-loop of queries × corpus
— correct choice when queries ≪ corpus (broadcast the queries, stream
the corpus, no shuffle of the big side; top-k via window per query).
The LSH variant buckets by sign-random-projection bits so candidate
generation is an equi-join on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netrunner_spark.operators.textops import MOD


def _quantized(col, scale: int = 1000):
    return F.transform(col, lambda x: F.round(x * scale).cast("long"))


def brute_topk_int(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k by quantized dot product.

    → (query_id, neighbor_id, dot_q) — rank by (dot_q desc, neighbor_id)
    with deterministic ties; self-match excluded.
    """
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    joined = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("q"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Float cosine top-k (the real-use baseline; rows-only oracle)."""
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    base = embeddings.select(
        "vec_id", F.col("embedding").alias("v"), norm(F.col("embedding")).alias("nv")
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    joined = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("nq") * F.col("nv"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_quantized(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Deterministic cosine top-k: dot and squared norms are EXACT
    int64 over quantized elements; the cosine is then ONE IEEE-754
    division+sqrt from those exact ints — bit-identical in any engine
    (both ops are correctly rounded), so ordering and the exported
    ``cos_e6 = floor(cos·10⁶)`` hash-match a DuckDB oracle. This is the
    oracle-checkable twin of ``cosine_topk`` (float accumulation order
    makes the naive version engine-dependent).

    Bounds (dim 64, |x|≲1 → |q|≤1000): dot ≤ 6.4e7, na·nb ≤ 4e15 <
    2^53 — every intermediate is exactly representable.
    """
    q = _quantized(F.col("embedding"))
    sq = F.aggregate(
        _quantized(F.col("embedding")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    base = embeddings.select("vec_id", q.alias("q"), sq.alias("n2"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    joined = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot.cast("double")
            / F.sqrt((F.col("qn2") * F.col("n2")).cast("double"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.floor(F.col("cos") * 1000000).cast("long").alias("cos_e6"),
            "rank",
        )
    )


def srp_bucket(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """Sign-random-projection bucket key (LSH for cosine).

    Projection vectors are pseudo-random but EXACT: p[b][d] =
    ((b·1009 + d·9176 + 7) mod 2003) - 1001, applied to quantized
    embeddings — integer arithmetic, oracle-reproducible.
    """
    q = _quantized(F.col("embedding"))
    dims = F.size(F.col("embedding"))
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        proj = F.aggregate(
            F.zip_with(
                q,
                F.sequence(F.lit(0), dims - 1),
                lambda x, d: x * (((F.lit(b * 1009) + d * 9176 + 7) % 2003) - 1001),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << b)).otherwise(0)
    return embeddings.select("vec_id", bucket.alias("bucket"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    embeddings: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 2,
    n_queries: int = 10,
    k: int = 5,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_centroids``
    cells, probe only the query's ``nprobe`` closest cells, exact top-k
    within the candidates — the inverted-file scale path next to the
    SRP-LSH one.

    Deterministic/oracle-able: default centroids are the first
    ``n_centroids`` vectors (a fixed, reproducible quantizer); pass
    ``centroids=(cid, cq quantized array)`` — e.g. the output of
    :func:`kmeans_centroids` — for a TRAINED coarse quantizer with
    better-balanced cells (the train→serve composition real IVF
    deployments use). Assignment and scoring are exact int64 dots over
    quantized elements, ties broken by id.

    Scale shape: assignment is a narrow crossJoin against the
    BROADCAST centroid set (K ≪ corpus, one streaming pass);
    candidate generation is an EQUI-join on cell id — candidates are
    |corpus|·nprobe/K on balanced cells, never all-pairs.
    """
    base = embeddings.select("vec_id", _quantized(F.col("embedding")).alias("q"))
    if centroids is None:
        cents = base.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("q").alias("cq")
        )
    else:
        cents = centroids.select("cid", "cq")
    dots = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", _dot(F.col("q"), F.col("cq")).alias("cd")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cd").desc(), F.col("cid"))
    ranked = dots.withColumn("rn", F.row_number().over(w))
    cells = ranked.filter(F.col("rn") == 1).select("vec_id", "q", "cid")
    probes = (
        ranked.filter((F.col("rn") <= nprobe) & (F.col("vec_id") < n_queries))
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qv"), "cid")
    )
    cands = probes.join(cells, "cid").filter(F.col("vec_id") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _dot(F.col("qv"), F.col("q")).alias("dot_q"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", "rank")
    )


def lsh_candidates(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """Candidate near-neighbor pairs sharing an SRP bucket (equi-join)."""
    b = srp_bucket(embeddings, bits)
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            "bucket",
        )
    )


def auto_srp_bits(
    n: int, target_bucket: int = 32, lo: int = 8, hi: int = 24
) -> int:
    """SRP hash width scaled to corpus size: enough buckets that the
    EXPECTED bucket holds ~``target_bucket`` vectors, clamped to
    [lo, hi]. The within-bucket self-join is quadratic in bucket size,
    so a fixed 8-bit key (256 buckets) at 10^9 vectors would mean
    ~4·10^6-row buckets → ~10^13 candidate pairs per bucket; 24 bits
    keeps expected buckets at ~60 rows there. lo=8 preserves the
    oracle-checked behavior at test scales (≤ ~8k vectors)."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(1.0, n / target_bucket)))))


def embedding_near_dups(
    embeddings: DataFrame, bits: int | None = None, min_dot_q: int = 500_000
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by quantized dot
    (embedding-cosine near-dup from the task spec: LSH candidates →
    exact verify, never a full cross join).

    ``bits=None`` derives the hash width from the corpus size
    (auto_srp_bits) so the default stays scale-safe: the bucket
    equi-join's per-bucket work is bounded instead of going quadratic
    when the corpus outgrows a fixed bucket count. The sizing count is
    one column-pruned pass, amortized across the whole dedup job."""
    if bits is None:
        bits = auto_srp_bits(embeddings.select("vec_id").count())
    cands = lsh_candidates(embeddings, bits)
    base = embeddings.select("vec_id", _quantized(F.col("embedding")).alias("q"))
    withv = (
        cands.join(base.withColumnRenamed("vec_id", "vec_a"), "vec_a")
        .withColumnRenamed("q", "qa")
        .join(base.withColumnRenamed("vec_id", "vec_b"), "vec_b")
        .withColumnRenamed("q", "qb")
    )
    return withv.select(
        "vec_a",
        "vec_b",
        F.aggregate(
            F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_q"),
    ).filter(F.col("dot_q") >= min_dot_q)


def embedding_dedup_clusters(
    embeddings: DataFrame, bits: int | None = None, min_dot_q: int = 500_000
) -> DataFrame:
    """Embedding near-dup CLUSTERS with a deterministic keeper:
    ``embedding_near_dups`` pairs → large-star/small-star connected
    components → ``(vec_id, cluster_id, is_keeper)``, cluster_id = the
    component's min vec_id. The embedding-side twin of
    ``textops.dedup_clusters`` — a training pipeline keeps the keeper
    row of each cluster and drops the rest."""
    from netrunner_spark.operators.textops import connected_components

    pairs = embedding_near_dups(embeddings, bits=bits, min_dot_q=min_dot_q)
    comp = connected_components(
        pairs.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        ),
        nodes=embeddings.select(F.col("vec_id").alias("doc_id")),
    )
    return comp.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def semdedup(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    min_dot_q: int = 300_000,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): candidate pairs come from the TRAINED k-means
    cells (not LSH buckets — the paper's pre-clustering step), are
    verified by exact quantized dot ≥ ``min_dot_q``, duplicate groups
    are connected components of verified pairs, and the kept
    representative is the member FARTHEST from its centroid (the
    paper's low-centroid-similarity keeper rule, which preferentially
    retains the cluster's outliers), ties → smaller vec_id.

    → ``(vec_id, cid, dist_q, group_id, is_keeper)`` over the full
    corpus; singletons are their own group and always keepers.

    Shape at 100 TB: Lloyd's training + assignment are the map-only /
    broadcast plan of :func:`kmeans_int`. The intra-cell self-join is
    quadratic in CELL size by design (that is SemDeDup's accuracy
    contract) — ``k`` is the knob: size it to ``n / target_cell`` so
    the equi-join on ``cid`` has bounded per-key work, and audit the
    actual occupancy with ``kmeans_cell_balance`` before running the
    pairing. Components never span cells (edges are intra-cell), so
    the keeper window partitions are bounded by cell size too.
    """
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    # checkpoint the k-row centroid frame: the assignment `a` below is
    # referenced by three consumers (pairs, CC nodes, the scored join)
    # and each lazy reference would otherwise re-run the whole Lloyd's
    # training chain (r6 optimization — measured 2-3 recomputes of the
    # training at sf0.1). The checkpointed frame is k rows of metadata;
    # the corpus side stays map-only per consumer.
    cents = _lloyd(base, k, iters, checkpoint=True)
    a = _kmeans_assign(base, cents)  # (vec_id, q, cid, dist_q)

    # Intra-cell verified pairs via a per-cell BLOCKED int64 matmul
    # (r6 optimization, guide §4.2): the original formulation was a
    # cid self-join emitting every ordered pair and computing the dot
    # through interpreted aggregate(zip_with(...)) lambdas — measured
    # 11 s at sf0.1 (2 000 vectors, k=4) with the HOF evaluation as
    # the entire cost. One applyInPandas group per cell moves only
    # (vec_id, q) once, runs the exact same int64 arithmetic through
    # numpy (quantized |q| ≤ ~10^3·scale ⇒ dots ≪ 2^63, matmul is
    # exact), and emits only the verified pairs. Row blocks of 1 024
    # bound peak memory at O(block · cell) regardless of cell size;
    # per-cell work remains quadratic in cell size BY DESIGN (the
    # SemDeDup accuracy contract — ``k`` stays the scale knob, and a
    # cell's (vec_id, q) rows must fit one task, consistent with the
    # bounded-cell sizing contract above). Pair set and dot_q values
    # are bit-identical to the join form (same ids, same products).
    def _cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "dot_q": pd.Series([], dtype="int64"),
            }
        )
        c = len(pdf)
        if c < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        qm = np.stack(
            [np.asarray(q, dtype=np.int64) for q in pdf["q"].iloc[order]]
        )
        out = []
        jj = np.arange(c)[None, :]
        block = 1024
        for s in range(0, c, block):
            e = min(s + block, c)
            g = qm[s:e] @ qm.T  # exact int64
            mask = (jj > np.arange(s, e)[:, None]) & (g >= min_dot_q)
            bi, bj = np.nonzero(mask)
            if len(bi):
                out.append(
                    pd.DataFrame(
                        {
                            "vec_a": ids[s + bi],
                            "vec_b": ids[bj],
                            "dot_q": g[bi, bj],
                        }
                    )
                )
        return pd.concat(out, ignore_index=True) if out else empty

    pairs = (
        a.select("cid", "vec_id", "q")
        .groupBy("cid")
        .applyInPandas(_cell_pairs, "vec_a long, vec_b long, dot_q long")
    )
    from netrunner_spark.operators.textops import connected_components

    comp = connected_components(
        pairs.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        ),
        nodes=a.select(F.col("vec_id").alias("doc_id")),
    )
    scored = a.select("vec_id", "cid", "dist_q").join(
        comp.select(
            F.col("doc_id").alias("vec_id"),
            F.col("cluster_id").alias("group_id"),
        ),
        "vec_id",
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("dist_q").desc(), F.col("vec_id").asc()
    )
    return scored.select(
        "vec_id",
        "cid",
        "dist_q",
        "group_id",
        (F.row_number().over(w) == 1).alias("is_keeper"),
    )


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _kmeans_assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmin squared-L2 assignment of quantized ``base(vec_id, q)``:
    the k centroids are PACKED into one broadcast row
    (collect_list of (cid, cq) structs) and the per-vector argmin is
    ``array_min(transform(...))`` over that array — so the corpus
    side is a single map-only pass: no shuffle, no window-sort, and
    the only join is a broadcast nested loop against ONE row. Ties →
    smaller cid via the struct's (dist_q, cid) lexicographic order;
    collect_list's nondeterministic order is harmless because min is
    order-insensitive."""
    packed = cents.agg(F.collect_list(F.struct("cid", "cq")).alias("cents"))
    m = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _sq_l2(F.col("q"), c["cq"]).alias("dist_q"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return base.crossJoin(F.broadcast(packed)).select(
        "vec_id", "q", m["cid"].alias("cid"), m["dist_q"].alias("dist_q")
    )


def _lloyd(
    base: DataFrame, k: int, iters: int, checkpoint: bool = False
) -> DataFrame:
    """The Lloyd's loop over an already-quantized ``(vec_id, q)``
    frame → trained ``(cid, cq)`` — shared by full-vector k-means and
    per-subspace PQ codebook training."""
    cents = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    for _ in range(iters):
        assigned = _kmeans_assign(base, cents)
        means = (
            assigned.select("cid", F.posexplode("q").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.expr("sum(v) div count(1)").alias("m"))
        )
        cents = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cq")
        )
        if checkpoint:
            cents = cents.localCheckpoint(eager=True)
    return cents


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    checkpoint: bool = False,
) -> DataFrame:
    """Trained Lloyd's centroids ``(cid, cq)`` over quantized
    embeddings — the reusable half of :func:`kmeans_int`; feed the
    result to :func:`ivf_topk` as a trained coarse quantizer.
    ``checkpoint=True`` localCheckpoints the k-row centroid frame each
    iteration (O(1) lineage for long runs; result identical)."""
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    return _lloyd(base, k, iters, checkpoint)


def kmeans_int(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    checkpoint: bool = False,
) -> DataFrame:
    """Deterministic integer Lloyd's k-means over quantized embeddings
    → final assignment ``(vec_id, cid, dist_q)``.

    The corpus-ORGANIZATION operator next to :func:`ivf_topk`'s fixed
    quantizer: topic/near-domain clustering of an embedding corpus for
    mixture balancing, per-cluster sampling quotas, and IVF centroid
    training. Exactness strategy (same as the rest of this module):

    - init: centroids = the first ``k`` vectors (vec_id < k) — a fixed,
      reproducible seeding, no RNG;
    - assignment: exact int64 squared-L2 over quantized elements, ties
      broken by the smaller centroid id;
    - update: element-wise integer mean ``sum(v) div count`` — Spark
      ``div`` and DuckDB ``//`` both truncate toward zero, so the twin
      reproduces centroids bit-exactly (verified for negative sums);
    - a cluster that loses all members simply drops out (no
      re-seeding), which the SQL twin's GROUP BY mirrors for free.

    Shape at 100 TB: per iteration, assignment is a MAP-ONLY pass over
    the corpus — the k·D centroid set is packed into ONE broadcast row
    and the argmin is array_min over a transform, so the big side
    never shuffles or window-sorts — and the update is ONE hash
    aggregate producing k·D rows (map-side combine collapses each
    partition to k·D partials before the exchange). Lloyd's is
    embarrassingly map-reduce; the whole run stays ONE lazy plan (no
    per-iteration driver action), with ``checkpoint=True`` available
    to cut lineage on long runs. Plan pinned window-free and
    shuffle-join-free in tests.
    """
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    cents = kmeans_centroids(embeddings, k=k, iters=iters, checkpoint=checkpoint)
    return _kmeans_assign(base, cents).select("vec_id", "cid", "dist_q")


def _emb_dims(embeddings: DataFrame) -> int:
    # bounded metadata: one column-pruned row
    return len(embeddings.select("embedding").first()["embedding"])


def pq_train(
    embeddings: DataFrame, m: int = 4, ks: int = 4, iters: int = 2
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011) →
    ``(subspace, cid, cq)``: split each quantized vector into ``m``
    contiguous subvectors and train an independent Lloyd's codebook of
    ``ks`` centroids per subspace (same first-k seeding / integer-mean
    recurrence as :func:`kmeans_centroids`, so the DuckDB twin is
    generated from the same template). Codebook size is m·ks·(D/m)
    int64s — broadcast metadata."""
    dims = _emb_dims(embeddings)
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub = dims // m
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("qfull")
    )
    out = None
    for j in range(m):
        bj = base.select(
            "vec_id", F.slice("qfull", j * sub + 1, sub).alias("q")
        )
        cj = _lloyd(bj, ks, iters).select(
            F.lit(j).alias("subspace"), "cid", "cq"
        )
        out = cj if out is None else out.unionByName(cj)
    # NOTE (r6): an eager localCheckpoint of the codebooks here was
    # tried and REVERTED on measurement — it made pq_topk alone ~8%
    # faster (codebooks are referenced by both pq_encode and the ADC
    # table) but pq_recall ~40% SLOWER: with one lazy action, AQE runs
    # the independent stages (brute-force arm + the m subspace
    # trainings) concurrently, which an upfront checkpoint job
    # serializes. Net across the timed pair the lazy form wins.
    return out


def pq_encode(
    embeddings: DataFrame, codebooks: DataFrame, m: int = 4
) -> DataFrame:
    """PQ encoding → ``(vec_id, codes array<long>)``: per subspace the
    argmin-centroid id, m int64s per vector (the 10^10-vector memory
    story: D floats → m small ints).

    Shape: ONE map-only pass — the full codebook packs into one
    broadcast row and each subspace's argmin is array_min over a
    filtered transform, exactly the kmeans assignment trick; the
    corpus never shuffles."""
    dims = _emb_dims(embeddings)
    sub = dims // m
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("qfull")
    )
    packed = codebooks.agg(
        F.collect_list(F.struct("subspace", "cid", "cq")).alias("cb")
    )
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_min(
            F.transform(
                F.filter(F.col("cb"), lambda c: c["subspace"] == j),
                lambda c: F.struct(
                    _sq_l2(
                        F.slice(F.col("qfull"), j * sub + 1, sub), c["cq"]
                    ).alias("dist_q"),
                    c["cid"].alias("cid"),
                ),
            )
        )["cid"],
    )
    return base.crossJoin(F.broadcast(packed)).select(
        "vec_id", codes.alias("codes")
    )


def _adc_dtab(qrows, cb, sub: int, qid_col: str = "query_id"):
    """Per-query ADC distance table → (query_id, mp): ONE flat map
    keyed subspace·1000 + cid (structs holding maps aren't
    array_sort-able in Spark; a single flat map is, and the composite
    key stays collision-free for any ks < 1000). ONE shared builder for
    pq_topk / PQIndex.topk / ivfpq_topk (r5 review: the ~25-line block
    was triplicated; a one-sided change to the key packing would
    silently return wrong distances elsewhere)."""
    return (
        qrows.crossJoin(F.broadcast(cb))
        .select(
            F.col(qid_col).alias("query_id"),
            (F.col("subspace").cast("long") * 1000 + F.col("cid")).alias(
                "skey"
            ),
            _sq_l2(
                F.expr(f"slice(qfull, subspace * {sub} + 1, {sub})"),
                F.col("cq"),
            ).alias("d"),
        )
        .groupBy("query_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("skey", "d"))).alias(
                "mp"
            )
        )
    )


def _adc_dist(m: int):
    """The ADC lookup-sum column over `codes` against the `mp` table
    from :func:`_adc_dtab` — the other half of the shared triple."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)).cast("array<long>"),
            lambda code, j: F.element_at(F.col("mp"), j * 1000 + code),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_topk(
    embeddings: DataFrame,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k → ``(query_id, neighbor_id,
    adist_q, rank)``: queries stay unquantized-by-codebook; each query
    precomputes an m×ks distance TABLE to the codebooks and a corpus
    vector's approximate distance is m map-lookups + adds over its
    codes — the FAISS IVF-PQ scan shape, here as pure DataFrame ops.

    Shape at 100 TB: codebooks and the per-query tables (n_queries ×
    m × ks longs) are broadcast; the scan is the same broadcast
    nested loop as :func:`brute_topk_int` but touches m int64 codes
    per vector instead of D floats — the memory-bandwidth win PQ
    exists for. Exact-int distances → deterministic ties → exact
    oracle.
    """
    dims = _emb_dims(embeddings)
    sub = dims // m
    cb = pq_train(embeddings, m=m, ks=ks, iters=iters)
    codes = pq_encode(embeddings, cb, m=m)
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("qfull")
    )
    # per-query distance table: ONE map keyed subspace·1000 + cid
    # (structs holding maps aren't array_sort-able in Spark; a single
    # flat map is, and the composite key stays collision-free for any
    # ks < 1000)
    qrows = base.filter(F.col("vec_id") < n_queries)
    dtab = _adc_dtab(qrows, cb, sub, qid_col="vec_id")
    scored = codes.crossJoin(F.broadcast(dtab)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    adist = _adc_dist(m)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_q").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adist.alias("adist_q"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


class PQIndex:
    """Persisted PQ vector index on the LakeCatalog — the embedding
    side's build-once/query-many structure next to
    retrieval.SearchIndex, and INCREMENTAL the same way: codebooks are
    trained once at build; an ingest round's new vectors append as one
    more CODES slice encoded with the STORED codebooks (O(delta), no
    retrain — exactly how production PQ deployments ingest). Codes are
    m int64s per vector, so the index is the compact artifact the raw
    embeddings can be dropped from after encoding.

    Config (m, ks, dims) persists in the stats table with the slices
    (SearchIndex pattern); appends verify vec_id disjointness so ADC
    results stay well-defined.
    """

    def __init__(self, cat, name: str = "pq_index"):
        self.cat = cat
        self.name = name

    def build(
        self,
        embeddings: DataFrame,
        m: int = 4,
        ks: int = 4,
        iters: int = 2,
    ) -> None:
        dims = _emb_dims(embeddings)
        cb = pq_train(embeddings, m=m, ks=ks, iters=iters)
        self.cat.write(cb, f"{self.name}_codebooks")
        codes = pq_encode(embeddings, cb, m=m)
        self.cat.write(codes, f"{self.name}_codes_0")
        stats = codes.agg(
            F.lit(0).alias("slice"),
            F.count(F.lit(1)).alias("n_vecs"),
            F.lit(m).alias("m"),
            F.lit(ks).alias("ks"),
            F.lit(dims).alias("dims"),
        )
        self.cat.write(stats, f"{self.name}_stats")

    def append(self, delta: DataFrame) -> None:
        """Encode NEW vectors with the stored codebooks as one more
        slice — no retrain, O(delta). Raises on vec_id overlap with
        the existing slices (same disjointness contract as
        SearchIndex.append)."""
        prior = self.cat.read(f"{self.name}_stats")
        rows = prior.collect()  # bounded: one row per slice
        cfg = rows[0]
        i = 1 + max(r["slice"] for r in rows)
        existing = self._codes_union(sorted(r["slice"] for r in rows))
        overlap = (
            delta.select("vec_id")
            .join(existing.select("vec_id"), "vec_id", "left_semi")
            .count()
        )
        if overlap:
            raise ValueError(
                f"append delta shares {overlap} vec ids with the index; "
                "slices must be disjoint"
            )
        cb = self.cat.read(f"{self.name}_codebooks")
        codes = pq_encode(delta, cb, m=cfg["m"])
        self.cat.write(codes, f"{self.name}_codes_{i}")
        stats = codes.agg(
            F.lit(i).alias("slice"),
            F.count(F.lit(1)).alias("n_vecs"),
            F.lit(cfg["m"]).alias("m"),
            F.lit(cfg["ks"]).alias("ks"),
            F.lit(cfg["dims"]).alias("dims"),
        )
        self.cat.write(prior.unionByName(stats), f"{self.name}_stats")

    def _codes_union(self, slices):
        dfs = [self.cat.read(f"{self.name}_codes_{i}") for i in slices]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def topk(self, queries: DataFrame, k: int = 5) -> DataFrame:
        """ADC top-k over the indexed codes for raw query vectors
        ``(query_id, embedding)`` → ``(query_id, neighbor_id, adist_q,
        rank)``; an indexed vector with vec_id == query_id is excluded
        (self-match parity with the direct :func:`pq_topk`)."""
        rows = self.cat.read(f"{self.name}_stats").collect()
        cfg = rows[0]
        m, sub = cfg["m"], cfg["dims"] // cfg["m"]
        cb = self.cat.read(f"{self.name}_codebooks")
        qrows = queries.select(
            "query_id", _quantized(F.col("embedding")).alias("qfull")
        )
        dtab = _adc_dtab(qrows, cb, sub)
        codes = self._codes_union(sorted(r["slice"] for r in rows))
        scored = codes.crossJoin(F.broadcast(dtab)).filter(
            F.col("vec_id") != F.col("query_id")
        )
        adist = _adc_dist(m)
        w = Window.partitionBy("query_id").orderBy(
            F.col("adist_q").asc(), F.col("neighbor_id").asc()
        )
        return (
            scored.select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                adist.alias("adist_q"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )


def ivfpq_topk(
    embeddings: DataFrame,
    n_cells: int = 4,
    nprobe: int = 2,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """IVF-PQ: the full FAISS serving shape — a coarse Lloyd's
    quantizer restricts each query to its ``nprobe`` closest cells,
    and only those cells' PQ codes are ADC-scanned → ``(query_id,
    neighbor_id, adist_q, rank)``. (Non-residual variant: codes
    quantize the raw vectors, not the cell residuals — keeps every
    quantity in the same exact-int domain as :func:`pq_topk` so the
    generated oracle composes; residual encoding is a quantizer swap,
    not a plan change.)

    Shape at 100 TB: candidate generation is an EQUI-join of the
    (codes ⨝ cell) corpus with the BROADCAST (query, cell) probe pairs
    — the scan touches |corpus|·nprobe/n_cells code rows on balanced
    cells, never the whole corpus; distance tables and codebooks are
    broadcast; scoring is m map-lookups per candidate. All exact int64
    → deterministic ties → exact oracle.
    """
    base = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("qfull")
    )
    coarse = _lloyd(
        base.select("vec_id", F.col("qfull").alias("q")), n_cells, iters
    )
    cells = _kmeans_assign(
        base.select("vec_id", F.col("qfull").alias("q")), coarse
    ).select("vec_id", F.col("cid").alias("cell"))
    cb = pq_train(embeddings, m=m, ks=ks, iters=iters)
    codes = pq_encode(embeddings, cb, m=m)
    corpus = codes.join(cells, "vec_id")

    # query probes: nprobe closest coarse cells by exact squared-L2
    packed = coarse.agg(F.collect_list(F.struct("cid", "cq")).alias("cents"))
    qrows = base.filter(F.col("vec_id") < n_queries)
    probes = (
        qrows.crossJoin(F.broadcast(packed))
        .select(
            F.col("vec_id").alias("query_id"),
            "qfull",
            F.explode(
                F.slice(
                    F.array_sort(
                        F.transform(
                            F.col("cents"),
                            lambda c: F.struct(
                                _sq_l2(F.col("qfull"), c["cq"]).alias("d"),
                                c["cid"].alias("cell"),
                            ),
                        )
                    ),
                    1,
                    nprobe,
                )
            ).alias("p"),
        )
        .select("query_id", F.col("p.cell").alias("cell"))
    )

    dims = _emb_dims(embeddings)
    sub = dims // m
    dtab = _adc_dtab(qrows, cb, sub, qid_col="vec_id")
    cands = corpus.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.join(F.broadcast(dtab), "query_id")
    adist = _adc_dist(m)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_q").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adist.alias("adist_q"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
