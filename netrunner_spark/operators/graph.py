"""Link-graph operators: deterministic fixed-point PageRank.

Crawl frontiers prioritize by authority; the reference's priority is
depth + host-budget (`crawler.rs` scheduling), and PageRank over the
discovered link graph is the standard next signal a crawler feeds its
priority queue. Implemented Spark-first as iterated DataFrame joins —
the shape GraphX/Pregel compiles to anyway, minus the RDD detour.

Arithmetic is INTEGER fixed-point (rank ≈ probability × `scale`,
`div` = floor division), deliberately:

1. **Bit-identical re-runs.** Float PageRank depends on the summation
   order a shuffle happens to produce; integer sums are exact and
   orderless, so a resume, an AQE re-plan, or a 4N-executor re-shard
   reproduces the same ranks bit-for-bit — the same determinism
   contract the frontier scheduler guarantees (BASELINE north_rule:
   "resumes bit-identically").
2. **Oracle-checkable.** The DuckDB twin runs the identical integer
   recurrence and must match EXACTLY — no float tolerance windows.

Floor division leaks < 1 rank-unit (10^-12 of total mass) per node
per iteration — ranks are a hair conservative, ordering is unaffected
at any practical scale.

Scale audit: per iteration = one join edges⋈ranks on src (edges can be
pre-bucketed by src; ranks is |V| rows), one groupBy dst, one
broadcast of a single dangling-mass row. Lineage is cut per iteration
with an eager localCheckpoint so the DAG stays O(1)-deep, mirroring
`connected_components` (textops.py:395).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    nodes: DataFrame | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` (long ids) →
    ``(id, rank_e12)`` where rank_e12 ≈ stationary probability × scale.

    damping_pct is an integer percent (85 = the classic 0.85) so the
    damping step stays in exact integer arithmetic. Dangling mass
    (nodes with no out-edges) is redistributed each iteration, per the
    standard formulation.

    ``seeds`` (one id column) switches to PERSONALIZED PageRank — the
    crawl-frontier variant: teleport and dangling mass land uniformly
    on the SEED set instead of all nodes, so authority concentrates
    around the lens's seed pages (the "crawl outward from what the
    user asked for" prior). Uniform PageRank is exactly the
    seeds-=-all-nodes special case, and the code runs one unified
    recurrence: rank = is_seed·base + d·(contrib + is_seed·dang/s)/100.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(nodes.columns[0]).alias("id")))
    ids = ids.dropDuplicates().localCheckpoint(eager=True)
    n = ids.count()  # single-row scalar, bounded (node count)
    if n == 0:
        return ids.withColumn("rank_e12", F.lit(0).cast("long"))

    # r6 optimization (measured identical output, uniform AND
    # personalized): the iteration state carries (is_seed, outdeg,
    # rank) in ONE frame, so each round is a single corpus join —
    # e ⋈ broadcast share → groupBy dst — plus the state update; the
    # old shape additionally re-joined outdeg twice per round and ran
    # a separate anti-join + 1-row broadcast job for the dangling
    # mass. The dangling sum now rides the PREVIOUS round's checkpoint
    # job via observe() (it is a function of the previous ranks) and
    # is inlined as an exact int literal; the seed count rides the
    # state-init checkpoint the same way.
    from pyspark.sql import Observation

    if seeds is None:
        marked = ids.withColumn("is_seed", F.lit(True))
    else:
        sd = (
            seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
            .dropDuplicates()
            .join(ids, "id", "left_semi")
        )
        marked = ids.join(sd.withColumn("is_seed", F.lit(True)), "id", "left").select(
            "id", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
        )

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ob0 = Observation()
    state = (
        marked.join(outdeg, marked.id == outdeg.src, "left")
        .select("id", "is_seed", "outdeg")
        .observe(ob0, F.sum(F.col("is_seed").cast("long")).alias("s"))
        .localCheckpoint(eager=True)
    )
    s = int(ob0.get["s"] or 0)  # bounded scalar (seed count)
    if s == 0:
        raise ValueError("personalized pagerank needs ≥1 seed inside the graph")
    base = ((100 - damping_pct) * scale) // (100 * s)

    dang_agg = F.sum(
        F.when(F.col("outdeg").isNull(), F.col("rank_e12")).otherwise(0)
    ).alias("d")

    ob = Observation()
    ranks = (
        state.withColumn(
            "rank_e12",
            F.when(F.col("is_seed"), F.lit(scale // s)).otherwise(0).cast("long"),
        )
        .observe(ob, dang_agg)
        .localCheckpoint(eager=True)
    )
    dang = int(ob.get["d"] or 0)
    for _ in range(iters):
        # per-source share once (not per-edge): rank div outdeg —
        # map-only over the checkpointed state, no join
        src_share = ranks.filter(F.col("outdeg").isNotNull()).select(
            F.col("id").alias("src"), F.expr("rank_e12 div outdeg").alias("share")
        )
        contrib = (
            e.join(src_share, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ob = Observation()
        ranks = (
            ranks.join(contrib, ranks.id == contrib.dst, "left")
            .select(
                "id",
                "is_seed",
                "outdeg",
                (
                    F.when(F.col("is_seed"), F.lit(base)).otherwise(0)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0L)"
                        f" + (case when is_seed then {dang} div {s} else 0 end)))"
                        " div 100"
                    )
                ).alias("rank_e12"),
            )
            .observe(ob, dang_agg)
            .localCheckpoint(eager=True)
        )
        dang = int(ob.get["d"] or 0)
    return ranks.select("id", "rank_e12")


def opic_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003) over a directed edge list ``(src, dst)``
    → ``(id, cash_e12, hist_e12)``. THE crawl-ordering importance
    metric: unlike PageRank it needs no damping parameter and its
    history converges to importance *while the crawl is still
    running*, which is why frontier schedulers use it to pick what to
    fetch next (rank by ``hist_e12``).

    Synchronous batch formulation in exact int64 arithmetic:

    - every node starts with cash ``scale div n`` and zero history;
    - each round: history += cash (the page is "read"); each out-edge
      receives ``cash div outdeg``; the per-node truncation remainder
      and ALL cash of dangling nodes go to OPIC's virtual page, which
      redistributes its pot uniformly (``pot div n`` each — the
      ``pot mod n`` tail simply decays, deterministic in both engines);
    - new cash = incoming contributions + the virtual share.

    Shape at 100 TB: per round ONE equi-join of the edge list with the
    node-sized cash table + ONE hash aggregate on dst, plus a 1-row
    broadcast pot (dangling + remainders in the same single aggregate);
    state is localCheckpointed per round so lineage stays O(1). Same
    skeleton as :func:`pagerank_int` — no windows, no driver loops.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(nodes.columns[0]).alias("id")))
    ids = ids.dropDuplicates().localCheckpoint(eager=True)
    n = ids.count()  # single-row scalar, bounded (node count)
    if n == 0:
        return ids.select(
            "id",
            F.lit(0).cast("long").alias("cash_e12"),
            F.lit(0).cast("long").alias("hist_e12"),
        )

    # r6 optimization (same restructure as pagerank_int, verified
    # bit-identical): the state carries outdeg, so each round's corpus
    # work is ONE e ⋈ share join + hash aggregate; the virtual-page pot
    # (dangling cash + truncation remainders — a function of the
    # PREVIOUS round's state) rides the previous checkpoint job via
    # observe() and is inlined as an exact int literal.
    from pyspark.sql import Observation

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pot_agg = F.coalesce(
        F.sum(
            F.expr(
                "case when outdeg is null then cash"
                " else cash - (cash div outdeg) * outdeg end"
            )
        ),
        F.lit(0),
    ).alias("pot")
    ob = Observation()
    state = (
        ids.join(outdeg, ids.id == outdeg.src, "left")
        .select(
            "id",
            "outdeg",
            F.lit(scale // n).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
        )
        .observe(ob, pot_agg)
        .localCheckpoint(eager=True)
    )
    pot = int(ob.get["pot"] or 0)
    for _ in range(iters):
        contrib = (
            e.join(
                state.filter(F.col("outdeg").isNotNull()).select(
                    F.col("id").alias("src"),
                    F.expr("cash div outdeg").alias("share"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ob = Observation()
        state = (
            state.join(contrib, state.id == contrib.dst, "left")
            .select(
                "id",
                "outdeg",
                (
                    F.coalesce(F.col("contrib"), F.lit(0))
                    + F.expr(f"{pot} div {n}")
                ).cast("long").alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
            )
            .observe(ob, pot_agg)
            .localCheckpoint(eager=True)
        )
        pot = int(ob.get["pot"] or 0)
    return state.select(
        "id",
        F.col("cash").alias("cash_e12"),
        F.col("hist").alias("hist_e12"),
    )


def hits_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**9,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    list ``(src, dst)`` → ``(id, hub_e9, auth_e9)`` — the second
    classic link-quality signal next to :func:`pagerank_int` (a good
    HUB is a directory/seed page; a good AUTHORITY is a crawl target).

    Exact-integer fixed point: each half-iteration sums the opposite
    score over edges, then renormalizes by the SCALED QUOTIENT
    ``score div greatest(total div scale, 1)`` — a deterministic
    integer stand-in for the usual norm division that keeps every
    quantity int64 (all positive → div ≡ //) and both engines
    bit-identical. Only relative order feeds ranking, so the
    quotient's rounding is harmless. Overflow bound: the 1-row total
    is Σ_edges(score) ≤ |E|·scale — lower ``scale`` for graphs beyond
    ~9·10⁹ edges at the default.

    Shape at 100 TB: per half-iteration ONE equi-join of the edge list
    with the (node-sized) score table and ONE hash aggregate, plus a
    broadcast 1-row total; scores are localCheckpointed per iteration
    so lineage stays O(1). Same skeleton as pagerank_int — no windows,
    no driver loops over data.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(nodes.columns[0]).alias("id")))
    ids = ids.dropDuplicates().localCheckpoint(eager=True)

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        # raw: (id, col) possibly missing ids → coalesce to 0, then
        # scaled-quotient renormalize with a broadcast 1-row total
        full = ids.join(raw, "id", "left").select(
            "id", F.coalesce(F.col(col), F.lit(0)).alias(col)
        )
        tot = full.agg(F.sum(col).alias("_tot"))
        return (
            full.crossJoin(F.broadcast(tot))
            .select(
                "id",
                F.expr(
                    f"{col} div greatest(_tot div {scale}, 1L)"
                ).alias(col),
            )
        )

    hub = ids.withColumn("hub", F.lit(scale).cast("long"))
    # iters=0 returns the uniform initial state like pagerank_int/
    # opic_int do, instead of crashing on hub.join(None) (r5 review)
    auth = ids.withColumn("auth", F.lit(scale).cast("long"))
    for _ in range(iters):
        a_raw = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .withColumnRenamed("dst", "id")
        )
        auth = _norm(a_raw, "auth").localCheckpoint(eager=True)
        h_raw = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "id")
        )
        hub = _norm(h_raw, "hub").localCheckpoint(eager=True)
    return (
        hub.join(auth, "id")
        .select(
            "id",
            F.col("hub").alias("hub_e9"),
            F.col("auth").alias("auth_e9"),
        )
    )


def pagerank_weighted_int(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """WEIGHTED PageRank over ``(src, dst, w)`` (long ids, positive
    integer weights) → ``(id, rank_e12)``: each source distributes its
    rank proportionally to edge weight — the natural recurrence for a
    web graph where a page links a target MANY times, or where edges
    carry click/anchor counts. Duplicate (src, dst) rows are summed
    into one weighted edge first, so feeding the raw (unduplicated)
    link table is the intended usage.

    Same exact-integer contract as :func:`pagerank_int` (the w ≡ const
    case reduces to it bit-for-bit, since (r·w) div (k·w) = r div k —
    pinned in tests). Per-edge contribution is ``rank·w div out_w``;
    overflow bound: rank ≤ scale = 10¹² ⇒ weights up to ~9·10⁶ stay
    inside int64 — lower ``scale`` for heavier multiplicities.

    Shape at 100 TB: per iteration one equi-join edges⋈ranks on src
    (+ the broadcast-sized out_w join on the same key), one hash
    aggregate on dst, one 1-row dangling broadcast; lineage cut per
    iteration. The only delta vs the unweighted plan is that the
    per-SOURCE share becomes a per-EDGE multiply — same joins, same
    shuffles.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("w").cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(nodes.columns[0]).alias("id")))
    ids = ids.dropDuplicates().localCheckpoint(eager=True)
    n = ids.count()  # single-row scalar, bounded (node count)
    if n == 0:
        return ids.withColumn("rank_e12", F.lit(0).cast("long"))

    # r6 optimization (same restructure as pagerank_int, verified
    # bit-identical): state carries out_w; the per-round corpus work
    # is ONE e ⋈ rank-state join + hash aggregate; dangling mass rides
    # the previous checkpoint via observe() as an exact int literal.
    from pyspark.sql import Observation

    outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    base = ((100 - damping_pct) * scale) // (100 * n)
    dang_agg = F.sum(
        F.when(F.col("out_w").isNull(), F.col("rank_e12")).otherwise(0)
    ).alias("d")
    ob = Observation()
    ranks = (
        ids.join(outw, ids.id == outw.src, "left")
        .select("id", "out_w", F.lit(scale // n).cast("long").alias("rank_e12"))
        .observe(ob, dang_agg)
        .localCheckpoint(eager=True)
    )
    dang = int(ob.get["d"] or 0)
    for _ in range(iters):
        contrib = (
            e.join(
                ranks.filter(F.col("out_w").isNotNull()).select(
                    F.col("id").alias("src"), "rank_e12", "out_w"
                ),
                "src",
            )
            .select("dst", F.expr("rank_e12 * w div out_w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ob = Observation()
        ranks = (
            ranks.join(contrib, ranks.id == contrib.dst, "left")
            .select(
                "id",
                "out_w",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0L)"
                        f" + {dang} div {n})) div 100"
                    )
                ).alias("rank_e12"),
            )
            .observe(ob, dang_agg)
            .localCheckpoint(eager=True)
        )
        dang = int(ob.get["d"] or 0)
    return ranks.select("id", "rank_e12")


def label_propagation_int(
    edges: DataFrame,
    iters: int = 3,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007) over an edge list ``(src, dst)`` → ``(id, community)``.

    Community detection is the graph signal between PageRank (global
    authority) and connected components (reachability): it splits a
    CONNECTED graph into densely-linked groups — mirror families, link
    farms, and topic pockets that share a component but not a
    community. Classic async LPA is run-order-dependent; this variant
    is exactly reproducible, same contract as :func:`pagerank_int`:

    * synchronous rounds (every node updates from the PREVIOUS round's
      labels),
    * labels start as the node id (int64),
    * a node adopts the neighbor label with the highest vote count,
      ties broken by SMALLEST label; isolated nodes keep their own,
    * fixed ``iters`` rounds — no convergence test, so the DuckDB twin
      can replay the identical recurrence.

    Edges are treated as undirected (links are symmetric evidence of
    affinity). Per round: one join labels⋈edges on the neighbor id,
    one (node, label) count aggregate, one window partitioned by node
    (bounded by per-node distinct neighbor labels). Lineage is cut per
    round with an eager localCheckpoint like the other iterated
    operators here.
    """
    from pyspark.sql.window import Window

    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    ids = und.select(F.col("src").alias("id"))
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(nodes.columns[0]).alias("id")))
    ids = ids.dropDuplicates().localCheckpoint(eager=True)

    labels = ids.select("id", F.col("id").alias("community"))
    w = Window.partitionBy("_v").orderBy(
        F.col("_c").desc(), F.col("community").asc()
    )
    for _ in range(iters):
        votes = (
            und.join(labels, und.src == labels.id)
            .groupBy(F.col("dst").alias("_v"), "community")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        winners = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("_v").alias("id"), F.col("community").alias("_new"))
        )
        labels = (
            labels.join(winners, "id", "left")
            .select(
                "id", F.coalesce("_new", "community").alias("community")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """Min-hop distance from a seed set over a directed edge list →
    ``(id, hops)``; nodes unreachable within ``max_hops`` are absent.

    The crawl-depth prior made exact: the reference's frontier priority
    is depth + host budget (crawler.rs scheduling) where depth is the
    hop count from the Lens seed list — this computes that distance for
    an ALREADY-CRAWLED graph so recrawl priorities can be re-derived
    from the cache instead of trusted from frontier bookkeeping.
    Complements personalized PageRank (authority concentrated near
    seeds) with plain proximity.

    Level-synchronous BFS as iterated equi-joins: per level one join
    frontier⋈edges (edges pre-deduped, broadcastable frontier when
    small), one anti-join against the settled set, lineage cut with an
    eager localCheckpoint (O(1) DAG depth like pagerank_int). At most
    ``max_hops`` levels; early-exits when a level is empty (bounded
    driver actions, one isEmpty per level).
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
        .dropDuplicates()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    # r6 optimization: per level ONE job instead of three — the level's
    # row count rides the checkpoint via observe() (no isEmpty job) and
    # the settled set is a LAZY union of the per-level checkpointed
    # frontiers (≤ max_hops unions of O(1)-lineage RDD scans) instead
    # of a re-materialized snapshot per level. Identical results.
    from pyspark.sql import Observation

    frontier = dist.select("id")
    for h in range(1, max_hops + 1):
        ob = Observation()
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"))
            .dropDuplicates()
            .join(dist, "id", "left_anti")
            .observe(ob, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if int(ob.get["n"] or 0) == 0:
            break
        dist = dist.unionByName(nxt.withColumn("hops", F.lit(h).cast("long")))
        frontier = nxt
    return dist


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph → ``(id,
    n_triangles)`` (nodes in no triangle are absent).

    Triangles are the densest local link structure — the clustering
    signal behind spam-ring detection (link farms triangulate heavily;
    organic link neighborhoods are sparse) and a community-strength
    score to read next to :func:`label_propagation_int`'s labels.

    Degree-ordered orientation (the standard shuffle-bound trick):
    every undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher, so each triangle is counted exactly once
    from its lowest-degree corner AND the wedge self-join fans out by
    ORIENTED out-degree, which is O(√m) for any graph — a celebrity
    node with 10^7 followers contributes no wedges from its own
    adjacency because nearly all its edges point INTO it. One wedge
    self-join on src + one closing equi-join against the canonical
    edge set; no windows.
    """
    und = _undirected(edges).localCheckpoint(eager=True)
    return _triangles_from(und, _und_degrees(und))


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonical u<v undirected edge set (shared by triangle_count and
    clustering_coefficient so the coefficient doesn't scan/canonicalize
    the edge table twice — r5 review)."""
    return (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("u"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias(
                "v"
            ),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )


def _und_degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _triangles_from(und: DataFrame, deg: DataFrame) -> DataFrame:
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.d").alias("d"))
        .localCheckpoint(eager=True)
    )
    a = oriented.select(F.col("s"), F.col("d").alias("d1"))
    b = oriented.select(F.col("s"), F.col("d").alias("d2"))
    wedges = a.join(b, "s").filter(F.col("d1") < F.col("d2"))
    tris = wedges.join(
        und,
        (wedges.d1 == und.u) & (wedges.d2 == und.v),
    ).select(F.col("s").alias("a"), F.col("d1").alias("b"), F.col("d2").alias("c"))
    corners = (
        tris.select(F.col("a").alias("id"))
        .unionByName(tris.select(F.col("b").alias("id")))
        .unionByName(tris.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient in exact integer permille →
    ``(id, deg, n_triangles, coeff_permille)``.

    coeff = triangles ÷ C(deg, 2) — how much of a node's neighborhood
    is itself interconnected. Link farms cluster near 1000 (every farm
    page links every other); organic hubs sit near 0. Computed as
    2000·triangles div (deg·(deg−1)) so the DuckDB twin matches
    bit-for-bit; deg < 2 nodes report 0 (no possible wedge). One
    degree aggregate + :func:`triangle_count` + a left join.
    """
    und = _undirected(edges).localCheckpoint(eager=True)
    deg = _und_degrees(und)
    tris = _triangles_from(und, deg)
    return (
        deg.join(tris, "id", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)))
        .withColumn(
            "coeff_permille",
            F.when(
                F.col("deg") >= 2,
                F.expr("2000 * n_triangles DIV (deg * (deg - 1))"),
            )
            .otherwise(0)
            .cast("long"),
        )
    )


def k_core(edges: DataFrame, k: int = 2, max_iters: int = 50) -> DataFrame:
    """The k-core of an undirected graph → ``(id, deg)`` for every node
    surviving iterative removal of all nodes with degree < k (deg is
    the degree INSIDE the core).

    The k-core is the standard "dense heart" extraction: link-analysis
    keeps only pages embedded in mutually-connected neighborhoods
    (pendant chains and leaf clusters peel away), and spam rings show
    up as unusually deep cores — read next to
    :func:`clustering_coefficient` (local density) and
    :func:`label_propagation_int` (membership).

    Level-synchronous peeling: per round one degree aggregate over the
    surviving edge set and two semi-joins dropping edges that touch a
    sub-k node; lineage cut with eager localCheckpoints, one bounded
    isEmpty per round, loop exits at the fixpoint (or ``max_iters`` —
    a peel removes ≥1 node per round, so iterations are bounded by the
    peel depth, rarely > tens on web graphs).
    """
    cur = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("u"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias(
                "v"
            ),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # r6 optimization: the fixpoint test (any node under k?) rides the
    # degree checkpoint via observe() instead of a separate isEmpty job
    from pyspark.sql import Observation

    for _ in range(max_iters):
        ob = Observation()
        deg = (
            cur.select(F.col("u").alias("id"))
            .unionByName(cur.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .observe(ob, F.sum((F.col("deg") < k).cast("long")).alias("n_drop"))
            .localCheckpoint(eager=True)
        )
        if int(ob.get["n_drop"] or 0) == 0:
            return deg
        keep = deg.filter(F.col("deg") >= k).select("id")
        cur = (
            cur.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        cur.select(F.col("u").alias("id"))
        .unionByName(cur.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
    )


def reach_closure(
    edges: DataFrame,
    seeds: DataFrame,
    reverse: bool = False,
    max_iters: int = 50,
) -> DataFrame:
    """Transitive reachability closure from a seed set → ``(id)``:
    every node reachable from (``reverse=False``) or reaching
    (``reverse=True``) the seeds, seeds included. Level-synchronous
    frontier joins with an anti-join against the settled set and an
    eager localCheckpoint per level (same scaling shape as
    :func:`bfs_hops`, minus the hop labels); terminates at the
    fixpoint or ``max_iters`` (graph diameter bound)."""
    a, b = ("dst", "src") if reverse else ("src", "dst")
    e = (
        edges.select(F.col(a).cast("long").alias("a"), F.col(b).cast("long").alias("b"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    settled = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # r6 optimization: one job per level — level count via observe()
    # on the checkpoint (no isEmpty job), settled as a lazy union of
    # the checkpointed levels (same trim as bfs_hops; identical
    # results).
    from pyspark.sql import Observation

    frontier = settled
    for _ in range(max_iters):
        ob = Observation()
        nxt = (
            frontier.join(e, frontier["id"] == e["a"])
            .select(F.col("b").alias("id"))
            .dropDuplicates()
            .join(settled, "id", "left_anti")
            .observe(ob, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if int(ob.get["n"] or 0) == 0:
            break
        settled = settled.unionByName(nxt)
        frontier = nxt
    return settled


def bowtie(edges: DataFrame, pivot: int, max_iters: int = 50) -> DataFrame:
    """Broder bow-tie decomposition of a directed graph around a pivot
    → ``(id, component)`` with component ∈ {scc, in, out, other}.

    The web graph's macroscopic map (Broder et al., WWW 2000): SCC =
    the pivot's strongly connected component (forward ∩ backward
    reachability — the FW-BW coloring step), IN = reaches the SCC
    without belonging (backward \\ forward), OUT = reachable from it
    (forward \\ backward), OTHER = tendrils/tubes/disconnected. A
    crawler seeded inside the SCC eventually sees SCC+OUT and never
    IN — which is precisely why seed lists need IN-side entries; this
    operator measures that exposure over the discovered link graph.

    Cost: two BFS closures (≤ diameter rounds of one equi-join +
    anti-join each) + two membership left-joins over the node list —
    no per-node loops, no all-pairs anything.
    """
    spark = edges.sparkSession
    seeds = spark.createDataFrame([(int(pivot),)], "id long")
    fwd = reach_closure(edges, seeds, reverse=False, max_iters=max_iters)
    bwd = reach_closure(edges, seeds, reverse=True, max_iters=max_iters)
    nodes = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionByName(edges.select(F.col("dst").cast("long").alias("id")))
        .dropDuplicates()
    )
    return (
        nodes.join(fwd.withColumn("f", F.lit(True)), "id", "left")
        .join(bwd.withColumn("b", F.lit(True)), "id", "left")
        .select(
            "id",
            F.when(F.col("f") & F.col("b"), "scc")
            .when(F.col("b"), "in")
            .when(F.col("f"), "out")
            .otherwise("other")
            .alias("component"),
        )
    )


def degree_histogram(edges: DataFrame, max_bits: int = 48) -> DataFrame:
    """Log2-binned degree distribution of a directed graph →
    ``(side, bin, n_nodes)`` with side ∈ {in, out} and bin =
    bit_length(degree) (so bin b covers degrees [2^(b-1), 2^b)).

    The first diagnostic over a discovered link graph: a crawl whose
    out-degree tail fattens round-over-round is walking into a link
    farm or calendar trap long before harvest permille says so, and
    the histogram is what sizes every downstream degree cap
    (`cocitation_pairs.max_src_out`, `mirror_hosts.max_hash_df`).

    Two hash aggregates (degree per node, nodes per bin) — the bin
    step reuses the exact-integer bit-length CASE from the HLL sketch
    (`sketches._bitlen_case`), so the DuckDB twin is bit-identical
    with no float log2 anywhere.
    """
    from netrunner_spark.operators.sketches import _bitlen_case

    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).dropDuplicates()
    case = _bitlen_case("deg", max_bits)
    out = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.lit("out").alias("side"), F.expr(case).alias("bin"))
    )
    inn = (
        e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.lit("in").alias("side"), F.expr(case).alias("bin"))
    )
    return (
        out.unionByName(inn)
        .groupBy("side", "bin")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def _hyperball_r0(edges: DataFrame, p: int, salt: str):
    """Shared init for the HyperBall family: deduped long edges, the
    node set, and the t=0 register table (each node's ball is itself).
    Returns ``(e, nodes, r0, m, rmax)``."""
    from netrunner_spark.operators.sketches import _bitlen_case, md5_hash52

    m, rest_bits = 1 << p, 52 - p
    rmax = rest_bits + 1
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    bitlen = F.expr(_bitlen_case("rest", rest_bits))
    r0 = (
        nodes.select("id", md5_hash52("id", salt).alias("h"))
        .select(
            "id",
            (F.col("h") % m).alias("bucket"),
            F.expr(f"h DIV {m}").alias("rest"),
        )
        .select(
            "id",
            "bucket",
            (F.lit(rmax) - bitlen).cast("int").alias("rho"),
        )
        .localCheckpoint(eager=True)
    )
    return e, nodes, r0, m, rmax


def _hyperball_step(e: DataFrame, r: DataFrame) -> DataFrame:
    """One HyperBall iteration: B(v, t) = {v} ∪ ⋃_{v→w} B(w, t−1),
    realized on register tables as a register-wise max-merge — one
    equi-join edges⋈registers on dst plus one (id, bucket) hash
    aggregate. max() is orderless so the merge is shuffle-order
    independent (bit-identical re-runs, same contract as
    pagerank_int)."""
    moved = e.join(r, r.id == e.dst).select(
        e.src.alias("id"), r.bucket.alias("bucket"), r.rho.alias("rho")
    )
    return (
        moved.unionByName(r.select("id", "bucket", "rho"))
        .groupBy("id", "bucket")
        .agg(F.max("rho").alias("rho"))
        .localCheckpoint(eager=True)
    )


def hyperball_registers(
    edges: DataFrame, iters: int = 3, p: int = 4, salt: str = "hb"
) -> DataFrame:
    """HyperBall (Boldi & Vigna, 2013) register table after ``iters``
    rounds → ``(id, bucket, rho)``: per node, the HLL sketch of its
    out-ball B(id, iters) = nodes reachable in ≤ iters hops.

    THE published algorithm for distance metrics on 10^10-node web
    graphs (it produced the Facebook "four degrees of separation"
    numbers): exact per-node ball sizes need all-pairs BFS (quadratic,
    impossible); HyperBall keeps one m=2**p-register HLL per node and
    iterates register-wise max-merges, so each round is ONE equi-join
    + ONE hash aggregate over ≤ |V|·m rows — the same join/agg shape
    as pagerank_int, with the same linear-per-iteration scale story.

    Identity the tests pin: these registers are EXACTLY
    ``hll_registers(exact-ball pairs, by=id)`` — the sketch of the
    true ball, not an approximation of a sketch. (The reference has no
    graph analytics at all; this extends the crawl-intel family that
    feeds frontier priority, cf. crawler.rs scheduling depth prior.)
    """
    e, _, r, _, _ = _hyperball_r0(edges, p, salt)
    for _ in range(iters):
        r = _hyperball_step(e, r)
    return r


def hyperball_nf(
    edges: DataFrame, iters: int = 3, p: int = 4, salt: str = "hb"
) -> DataFrame:
    """HyperBall neighborhood-function table → one row per (id, t),
    t = 0..iters: ``(id, t, nonzero_buckets, denom)`` where
    nonzero_buckets counts occupied registers and denom is the EXACT
    integer harmonic-mean denominator Σ_buckets 2^(rmax − rho) scaled
    by 2^rmax (empty bucket ⇒ rho = 0 ⇒ 2^rmax), rmax = 52 − p + 1.

    The float HLL ball-size estimate is alpha·m²·2^rmax / denom — a
    CONSUMER-side division; the oracle-checked surface stays pure
    int64 (denom ≤ m·2^rmax = 2^(p + 53 − p) < 2^63 ✓). From this
    table per node: ball growth curve, harmonic centrality
    Σ_t (|B(t)|−|B(t−1)|)/t, and (summed over nodes) the graph's
    neighborhood function / effective diameter.
    """
    e, _, r, m, rmax = _hyperball_r0(edges, p, salt)

    def nf_at(t: int, regs: DataFrame) -> DataFrame:
        return regs.groupBy("id").agg(
            F.lit(t).cast("int").alias("t"),
            F.count(F.lit(1)).alias("nonzero_buckets"),
            (
                F.sum(F.expr(f"shiftleft(1L, {rmax} - rho)"))
                + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << rmax)
            )
            .cast("long")
            .alias("denom"),
        )

    out = nf_at(0, r)
    for t in range(1, iters + 1):
        r = _hyperball_step(e, r)
        out = out.unionByName(nf_at(t, r))
    return out.select("id", "t", "nonzero_buckets", "denom")


def ball_sizes_exact(edges: DataFrame, iters: int = 3) -> DataFrame:
    """EXACT out-ball sizes for every node → ``(id, t, ball)`` for
    t = 0..iters, via an iterated (id, member) pair closure — the
    all-sources analog of :func:`reach_closure`.

    Quadratic in the worst case (dense balls ⇒ |V|·ball rows): this is
    the DIAGNOSTIC twin HyperBall exists to replace, kept for
    small-scale accuracy evaluation (`hyperball_eval`, the graph
    analog of ann_recall's self-measurement) — run it on a sample,
    never the full web graph.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    pairs = nodes.select("id", F.col("id").alias("member")).localCheckpoint(
        eager=True
    )

    def sizes_at(t: int, pr: DataFrame) -> DataFrame:
        return pr.groupBy("id").agg(
            F.lit(t).cast("int").alias("t"), F.count(F.lit(1)).alias("ball")
        )

    out = sizes_at(0, pairs)
    for t in range(1, iters + 1):
        pairs = (
            e.join(pairs, pairs.id == e.dst)
            .select(e.src.alias("id"), pairs.member.alias("member"))
            .unionByName(pairs)
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(sizes_at(t, pairs))
    return out.select("id", "t", "ball")


def harmonic_centrality_exact(edges: DataFrame, iters: int = 3) -> DataFrame:
    """EXACT truncated harmonic centrality → ``(id, hc_lcm)``:
    HC_R(v) = Σ_{t=1..R} |B(v,t) − B(v,t−1)| / t, scaled by
    lcm(1..R) so the oracle surface stays pure int64 (hc6 for R=3).

    The standard centrality HyperBall was built to estimate at
    10^10 nodes (Boldi & Vigna 2014 use exactly this Δball/t form);
    this exact variant is the small-scale ground truth, derived from
    the same pair closure as :func:`ball_sizes_exact` — run on a
    sample, never the full web graph.
    """
    import math

    from pyspark.sql.window import Window

    lcm = math.lcm(*range(1, iters + 1))
    sizes = ball_sizes_exact(edges, iters)
    w = Window.partitionBy("id").orderBy("t")
    delta = sizes.withColumn("prev", F.lag("ball").over(w)).filter(
        F.col("t") > 0
    )
    return delta.groupBy("id").agg(
        F.sum(F.expr(f"({lcm} DIV t) * (ball - prev)"))
        .cast("long")
        .alias(f"hc{lcm}")
    )


def neighborhood_function_exact(edges: DataFrame, iters: int = 3) -> DataFrame:
    """EXACT graph neighborhood function → ``(t, nf_pairs, frac_e6)``:
    NF(t) = Σ_v |B(v,t)| (reachable pairs within t hops) and
    frac_e6 = 10^6·NF(t) // NF(R) — the integerized cumulative-reach
    fraction whose first t with frac ≥ 0.9·10^6 is the classic
    effective-diameter read-off. Ground truth for the HyperBall
    estimate (sum the per-node HLL ball estimates from
    :func:`hyperball_nf` at scale); exact closure → diagnostic only.
    """
    nf = (
        ball_sizes_exact(edges, iters)
        .groupBy("t")
        .agg(F.sum("ball").cast("long").alias("nf_pairs"))
    )
    total = nf.filter(F.col("t") == iters).select(
        F.col("nf_pairs").alias("nf_total")
    )
    return (
        nf.crossJoin(total)
        .select(
            "t",
            "nf_pairs",
            # guard the 10^6 scale-up: NF > ~9.2e12 would silently wrap
            # int64 under non-ANSI Spark and corrupt the effective-
            # diameter read-off (r5 review). This op is exact-closure
            # diagnostic only, so fail loudly at the operating bound.
            F.when(
                F.col("nf_pairs") > F.lit((1 << 63) // 1_000_000 - 1),
                F.raise_error(
                    F.lit(
                        "neighborhood_function_exact: NF exceeds int64/1e6"
                        " — use hyperball_nf at this scale"
                    )
                ).cast("long"),
            )
            .otherwise(
                F.expr("CAST(1000000 * nf_pairs DIV nf_total AS BIGINT)")
            )
            .alias("frac_e6"),
        )
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    salt: str = "rw",
) -> DataFrame:
    """Deterministic uniform random walks → ``(walk_id, step, node)``:
    ``walks_per_node`` walks from every node, each ``walk_len`` steps
    (or shorter at a dangling node) — the DeepWalk / node2vec (p=q=1)
    corpus generator (Perozzi et al. 2014), THE graph-structured
    training-data op: walks become token sequences for embedding
    training exactly like documents become text batches.

    Determinism instead of RNG: the next hop from walk w at step i is
    argmin over out-edges of md5_52(salt‖walk_id‖#‖i‖#‖dst) — a fresh
    uniform draw per (walk, step) that both engines reproduce exactly
    (same trick as sampling.hash_split; ties broken by (score, dst)
    struct-min, so even a hash collision is order-stable). Each step
    is ONE equi-join current-frontier⋈edges plus ONE map-side-
    combinable aggregate over candidate rows (struct-min plans as
    SortAggregate — the partial combine is the scale property, cutting
    candidates to one row per walk per partition before the shuffle)
    — state is |walks| rows, never materializing
    multi-hop paths, so a 10^10-edge graph costs walk_len scans of the
    (bucketable) edge table. walk_id = node·walks_per_node + w keeps
    ids collision-free in int64 for node ids < 2^58.
    """
    from netrunner_spark.operators.sketches import md5_hash52

    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    starts = nodes.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("w"),
        F.col("id"),
    ).select(
        (F.col("id") * walks_per_node + F.col("w")).alias("walk_id"),
        F.lit(0).cast("int").alias("step"),
        F.col("id").alias("node"),
    ).localCheckpoint(eager=True)
    out = starts
    cur = starts.select("walk_id", "node")
    for i in range(1, walk_len + 1):
        score = md5_hash52(
            F.concat(
                F.col("walk_id").cast("string"),
                F.lit("#"),
                F.lit(str(i)),
                F.lit("#"),
                F.col("dst").cast("string"),
            ),
            salt,
        )
        nxt = (
            cur.join(e, cur.node == e.src)
            .select("walk_id", e.dst.alias("dst"))
            .withColumn("score", score)
            .groupBy("walk_id")
            .agg(F.min(F.struct("score", "dst")).alias("m"))
            .select("walk_id", F.col("m.dst").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            nxt.select(
                "walk_id", F.lit(i).cast("int").alias("step"), "node"
            )
        )
        cur = nxt
    return out.select("walk_id", "step", "node")


def neighbor_sample(edges: DataFrame, k: int = 3, salt: str = "ns") -> DataFrame:
    """Deterministic k-out-neighbor sample → ``(src, dst, rk)``: per
    source, the k out-edges with the smallest md5_52(salt‖src‖#‖dst)
    — GraphSAGE-style minibatch fan-out capping (Hamilton et al.
    2017), the standard prep before training GNNs on a web graph
    (unbounded hub fan-out would blow up any sampled subgraph).

    One window (partitionBy src, orderBy score,dst) over the edge
    table; rank order is a fresh uniform permutation per src, so the
    sample is unbiased and re-runs bit-identically. Hot hubs with
    10^6+ out-edges make the per-key sort the cost ceiling — at that
    scale pre-filter candidates with a score threshold (keep rows
    with score < c·k·2^52/outdeg) before ranking, the same
    hot-key-cap pattern as textops.max_gram_df.
    """
    from pyspark.sql.window import Window

    from netrunner_spark.operators.sketches import md5_hash52

    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).dropDuplicates()
    score = md5_hash52(
        F.concat(
            F.col("src").cast("string"), F.lit("#"), F.col("dst").cast("string")
        ),
        salt,
    )
    w = Window.partitionBy("src").orderBy("score", "dst")
    return (
        e.withColumn("score", score)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("src", "dst", "rk")
    )


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram training pairs from a walk corpus →
    ``(center, context, n_pairs)``: for every walk, all ordered pairs
    of nodes within ``window`` steps of each other (word2vec over
    DeepWalk sentences — Perozzi et al. 2014 §4.2 feeds exactly these
    pairs to the embedding trainer).

    ONE self-equi-join on walk_id with a bounded step-band predicate —
    per-walk row count is walk_len+1, so the join fans out ≤ 2·window
    rows per position regardless of graph size — then one hash
    aggregate for multiplicities (deterministic output; the trainer
    can re-expand or weight by n_pairs).
    """
    a = walks.select(
        F.col("walk_id"), F.col("step").alias("s1"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("walk_id"), F.col("step").alias("s2"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("s1") != F.col("s2"))
            & (F.abs(F.col("s1") - F.col("s2")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
