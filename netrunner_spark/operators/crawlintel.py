"""Crawl-intelligence operators: what a frontier learns FROM its own cache.

The reference crawls what the Lens tells it to (`/root/reference/src/lib/
crawler.rs` drains a fixed frontier under politeness); at 10^10-URL scale
the frontier itself must be *curated* or the budget drowns in mirrors,
session-id traps, and redirect chains. These operators close that loop:
they read the crawl cache (url, host, content_hash — all metadata, the
bytes column is never touched) and emit the decisions the next scheduling
round consumes — hosts to collapse, URL parameters to strip at admission
(feeding F4 `urlnorm.normalize`), hosts to de-prioritize, and an exact
integer budget split.

Everything is pure `pyspark.sql.functions` — hash aggregates, one
equi-join each, window functions; no Python UDFs, no driver-side loops
over data. Each operator documents its scale guard:

* :func:`mirror_hosts` — content-overlap host pairs. The self-join on
  content_hash is quadratic in per-hash host-frequency, exactly the
  blowup class of ``textops.jaccard_pairs``; ``max_hash_df`` caps it the
  same way (a boilerplate hash shared by every host would otherwise emit
  C(H,2) rows for 10^6 hosts).
* :func:`dust_params` — DUST ("different URLs, same text",
  Bar-Yossef et al., WWW'07) restricted to query parameters: a parameter
  is *content-irrelevant* on a host when, across URL groups that agree on
  everything else, varying it never changes the content hash. Admission
  can then strip it, collapsing session-id URL families to one frontier
  row. Group-by/aggregate only; the explode is bounded by params-per-URL.
* :func:`host_harvest` — per-host harvest rate (distinct content per
  distinct URL, integer permille) + trap flag. A calendar/session trap
  yields unbounded URLs over bounded content; harvest permille is the
  standard detector. One hash aggregate.
* :func:`budget_alloc` — largest-remainder (Hamilton) apportionment of an
  integer fetch budget over hosts, proportional to a weight column.
  Exact-integer, sums to the budget bit-for-bit; windows run over the
  per-HOST table (bounded ≪ data; the 10^10 rows were already collapsed
  by host_harvest's aggregate).
* :func:`resolve_redirects` — bounded multi-hop redirect resolution as
  ``max_hops`` iterative equi-joins (our ``HttpFetcher`` caps per-fetch
  redirect hops the same way, `sources/fetcher.py`); starts that still
  have an outgoing edge at the cap are flagged ``capped`` (loop or
  over-long chain) instead of looping forever.
* :func:`sitemap_diff` — snapshot delta (added/removed/changed) between
  two sitemap reads; the recrawl scheduler's cheapest signal
  (`sources/xmlparse.py` parses lastmod; this diffs two parses). One
  full-outer equi-join on url.
* :func:`apply_dust_rules` — the DUST loop closed: strip the mined
  irrelevant params and re-serialize canonically; distinct rewritten
  URLs are the collapsed frontier.
* :func:`revisit_plan` — WARC revisit planning (ISO 28500 §6.7.2):
  classify recrawl rows new/revisit/changed by payload digest so the
  archive writer stores only what changed.
* :func:`anchor_text_topk` — per-target top-k anchor terms, the
  off-page relevance signal the search index joins in.
* :func:`link_spam_hosts` / :func:`reciprocal_links` — link-farm
  (single-source concentration) and link-exchange (mutual-link
  reciprocity) signals; both collapse the edge list with hash
  aggregates before any pair-level row exists.
* :func:`change_rate_plan` — Cho–Garcia-Molina-style change-rate
  estimation from revisit history → per-URL recrawl interval, exact
  integer; one window + one aggregate, both keyed on url.
* :func:`url_path_templates` — the PATH half of DUST: numeric/hex
  segments collapse to ``<n>``/``<h>`` templates; unbounded-id-space
  routes flagged per template. One hash aggregate, no joins.
* :func:`host_health` — per-host error/latency permilles from the
  fetch log → tiered backoff multiplier feeding the politeness delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------- mirrors
def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    hash_col: str = "content_hash",
    min_shared: int = 2,
    max_hash_df: int | None = None,
) -> DataFrame:
    """Host pairs that serve overlapping content → one row per pair
    ``(host_a, host_b, shared, overlap_permille)`` with host_a < host_b.

    ``shared`` counts distinct content hashes served by both;
    ``overlap_permille`` is the containment against the SMALLER host's
    distinct-content count (mirror-of-a-subsection still scores high).
    A crawl scheduler drops or down-weights the lexicographically later
    host of any high-overlap pair.

    Scale: the candidate join is on content_hash; a hash served by m
    hosts emits C(m,2) pair rows. ``max_hash_df`` drops hashes above the
    cap (global boilerplate — empty pages, error bodies — carries no
    mirror signal anyway), bounding the join exactly like
    ``textops.jaccard_pairs(max_gram_df=...)``.
    """
    ph = pages.select(
        F.col(host_col).alias("host"), F.col(hash_col).alias("chash")
    ).dropDuplicates()
    if max_hash_df is not None:
        hot = (
            ph.groupBy("chash")
            .agg(F.count(F.lit(1)).alias("hdf"))
            .filter(F.col("hdf") <= max_hash_df)
            .select("chash")
        )
        ph = ph.join(hot, "chash")
    totals = ph.groupBy("host").agg(F.count(F.lit(1)).alias("n_hashes"))
    a = ph.select(F.col("host").alias("host_a"), "chash")
    b = ph.select(F.col("host").alias("host_b"), "chash")
    pairs = (
        a.join(b, "chash")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(totals.select(F.col("host").alias("host_a"), F.col("n_hashes").alias("n_a")), "host_a")
        .join(totals.select(F.col("host").alias("host_b"), F.col("n_hashes").alias("n_b")), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            F.expr("CAST(shared * 1000 DIV least(n_a, n_b) AS BIGINT)").alias(
                "overlap_permille"
            ),
        )
    )


# ------------------------------------------------------------------ DUST
def dust_params(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Mine query parameters that never change content (DUST rules) →
    ``(host, param, n_evidence, n_violations, irrelevant)``.

    For every URL and every parameter ``p`` it carries, the *group key*
    is the URL with ``p`` removed (base + the sorted remaining
    ``k=v`` pairs). Within a group, everything except ``p`` is equal by
    construction; so if the group spans ≥2 distinct values of ``p``
    (an *evidence* group) and still has exactly one distinct content
    hash, varying ``p`` provably did not change content there. A param
    is ``irrelevant`` on a host when it has ≥1 evidence group and ZERO
    violating groups (evidence group with ≥2 hashes). Admission strips
    irrelevant params before ``urlnorm.normalize`` hashing, collapsing
    session-id families to one frontier row.

    Precondition: a URL names each parameter at most once (true of the
    crawl cache after F4 normalization). Pure relational: explode is
    bounded by params-per-URL; the rest is two hash aggregates.
    """
    base_urls = (
        pages.select(F.col(url_col).alias("url"), F.col(hash_col).alias("chash"))
        .dropDuplicates(["url"])
        .filter(F.col("url").contains("?"))
    )
    kv = base_urls.select(
        "url",
        "chash",
        F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
        F.substring_index("url", "?", 1).alias("base"),
        F.split(F.substring_index("url", "?", -1), "&").alias("kvs"),
    )
    exploded = kv.select(
        "url",
        "chash",
        "host",
        "base",
        "kvs",
        F.explode("kvs").alias("kvpair"),
    ).select(
        "url",
        "chash",
        "host",
        F.substring_index("kvpair", "=", 1).alias("param"),
        F.substring_index("kvpair", "=", -1).alias("pval"),
        F.concat(
            F.col("base"),
            F.lit("?"),
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.col("kvs"),
                        lambda x: F.substring_index(x, "=", 1)
                        != F.substring_index(F.col("kvpair"), "=", 1),
                    )
                ),
                "&",
            ),
        ).alias("group_key"),
    )
    groups = exploded.groupBy("host", "param", "group_key").agg(
        F.countDistinct("pval").alias("n_vals"),
        F.countDistinct("chash").alias("n_hashes"),
    )
    return (
        groups.groupBy("host", "param")
        .agg(
            F.sum(F.when(F.col("n_vals") >= 2, 1).otherwise(0)).alias("n_evidence"),
            F.sum(
                F.when((F.col("n_vals") >= 2) & (F.col("n_hashes") >= 2), 1).otherwise(0)
            ).alias("n_violations"),
        )
        .withColumn(
            "irrelevant",
            (F.col("n_evidence") > 0) & (F.col("n_violations") == 0),
        )
    )


# ------------------------------------------------------------- DUST apply
def apply_dust_rules(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Apply :func:`dust_params` verdicts to a URL set → ``(url,
    rewritten)``: every parameter ruled content-irrelevant on its host
    is stripped, the survivors re-serialized in sorted order (the same
    canonical form the miner grouped on). Distinct ``rewritten`` values
    are the COLLAPSED frontier — session-id families become one row, so
    the politeness budget stops re-fetching the same content.

    ``rules`` is dust_params output (bounded: hosts × param names) —
    broadcast into the kv join; the rest is one explode (bounded by
    params-per-URL) and one re-aggregate per URL. Query-less URLs pass
    through unchanged.
    """
    u = pages.select(F.col(url_col).alias("url")).dropDuplicates()
    noq = u.filter(~F.col("url").contains("?")).select(
        "url", F.col("url").alias("rewritten")
    )
    strip = rules.filter(F.col("irrelevant")).select(
        F.col("host").alias("_rh"), F.col("param").alias("_rp"), F.lit(True).alias("_strip")
    )
    kv = (
        u.filter(F.col("url").contains("?"))
        .select(
            "url",
            F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
            F.substring_index("url", "?", 1).alias("base"),
            F.explode(F.split(F.substring_index("url", "?", -1), "&")).alias("kv"),
        )
        .withColumn("param", F.substring_index("kv", "=", 1))
    )
    j = kv.join(
        F.broadcast(strip),
        (kv.host == F.col("_rh")) & (kv.param == F.col("_rp")),
        "left",
    )
    rw = (
        j.groupBy("url", "base")
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("_strip").isNull(), F.col("kv")))
            ).alias("kept")
        )
        .select(
            "url",
            F.when(
                F.size("kept") > 0,
                F.concat(F.col("base"), F.lit("?"), F.array_join("kept", "&")),
            )
            .otherwise(F.col("base"))
            .alias("rewritten"),
        )
    )
    return noq.unionByName(rw)


# --------------------------------------------------------------- harvest
def host_harvest(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    hash_col: str = "content_hash",
    trap_max_permille: int = 200,
    trap_min_urls: int = 20,
) -> DataFrame:
    """Per-host harvest rate → ``(host, n_urls, n_content,
    harvest_permille, is_trap)``.

    ``harvest_permille`` = 1000 · distinct-content / distinct-URLs. A
    session-id or calendar trap mints unbounded URLs over bounded
    content, so its harvest rate collapses; ``is_trap`` flags hosts at
    or below ``trap_max_permille`` once ``trap_min_urls`` URLs give the
    ratio statistical footing. The scheduler multiplies the host budget
    by this signal (see :func:`budget_alloc`). One hash aggregate with
    map-side partials; no joins.
    """
    return (
        pages.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.countDistinct(F.col(url_col)).alias("n_urls"),
            F.countDistinct(F.col(hash_col)).alias("n_content"),
        )
        .withColumn(
            "harvest_permille",
            F.expr("CAST(n_content * 1000 DIV n_urls AS BIGINT)"),
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") >= trap_min_urls)
            & (F.col("harvest_permille") <= trap_max_permille),
        )
    )


# ---------------------------------------------------------------- budget
def budget_alloc(
    stats: DataFrame,
    weight_col: str,
    total: int,
    host_col: str = "host",
) -> DataFrame:
    """Largest-remainder integer apportionment of ``total`` fetch slots
    over hosts proportional to ``weight_col`` → ``(host, weight,
    alloc)`` with ``sum(alloc) == total`` exactly.

    Each host gets ``floor(total·w/S)`` slots; the ``total − Σfloor``
    leftover slots go to the largest remainders (ties broken by host
    name, so the split is deterministic). Zero-weight hosts get zero;
    if EVERY weight is zero (all hosts trapped/demoted) the budget is
    withheld entirely — every alloc is 0 — rather than divided by 0.

    Scale note: the two unpartitioned windows run over the PER-HOST
    stats table — already collapsed from the 10^10-row cache by
    :func:`host_harvest`'s aggregate — so a single-partition sort of
    ~10^6 host rows, not of the data. Exact int64 throughout
    (``total·w`` must fit int64: budgets ≤ 10^12 against weights ≤ 10^6
    are fine).
    """
    w_all = Window.partitionBy(F.lit(1))
    w_rank = Window.partitionBy(F.lit(1)).orderBy(
        F.col("rem").desc(), F.col("host").asc()
    )
    base = stats.select(
        F.col(host_col).alias("host"), F.col(weight_col).cast("long").alias("weight")
    )
    shares = base.withColumn("s_tot", F.sum("weight").over(w_all)).select(
        "host",
        "weight",
        "s_tot",
        F.expr(
            f"CAST(CASE WHEN s_tot = 0 THEN 0 ELSE {total} * weight DIV s_tot END AS BIGINT)"
        ).alias("fl"),
        F.expr(
            f"CAST(CASE WHEN s_tot = 0 THEN 0 ELSE {total} * weight % s_tot END AS BIGINT)"
        ).alias("rem"),
    )
    return (
        shares.withColumn(
            "leftover",
            F.when(F.col("s_tot") == 0, F.lit(0)).otherwise(
                F.lit(total) - F.sum("fl").over(w_all)
            ),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .select(
            "host",
            "weight",
            (F.col("fl") + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0))
            .cast("long")
            .alias("alloc"),
        )
    )


# ------------------------------------------------------------- redirects
def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve every redirect source to its final target in ≤
    ``max_hops`` hops → ``(start, final, hops, status)``.

    ``status`` is ``resolved`` when the walk reached a URL with no
    outgoing redirect, ``capped`` when ``max_hops`` edges were taken
    and an outgoing edge still exists (a loop or an over-long chain —
    fetchers cap exactly like this instead of detecting cycles;
    ``HttpFetcher`` bounds per-fetch hops the same way,
    `sources/fetcher.py`).

    Plan: ``max_hops − 1`` iterative left equi-joins of the frontier
    state (one row per start, constant size) against the edge table,
    plus one final join for the status flag — no driver-side data, no
    recursion state beyond the fixed-depth plan. Precondition: at most
    one outgoing edge per source (true of HTTP redirects; enforce
    upstream with a canonical-pick if needed).
    """
    assert max_hops >= 1
    e = edges.select(F.col(src_col).alias("_es"), F.col(dst_col).alias("_ed"))
    cur = edges.select(
        F.col(src_col).alias("start"),
        F.col(dst_col).alias("cur"),
        F.lit(1).alias("hops"),
    )
    for _ in range(max_hops - 1):
        cur = (
            cur.join(e, cur.cur == e._es, "left")
            .select(
                "start",
                F.coalesce("_ed", "cur").alias("cur"),
                (F.col("hops") + F.when(F.col("_ed").isNotNull(), 1).otherwise(0)).alias(
                    "hops"
                ),
            )
        )
    out = (
        cur.join(e.select("_es").dropDuplicates(), cur.cur == F.col("_es"), "left")
        .select(
            "start",
            F.col("cur").alias("final"),
            F.col("hops").cast("int").alias("hops"),
            F.when(F.col("_es").isNull(), "resolved").otherwise("capped").alias(
                "status"
            ),
        )
    )
    return out


# ---------------------------------------------------------------- revisit
def revisit_plan(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    bytes_col: str | None = "n_bytes",
) -> DataFrame:
    """WARC revisit planning for a recrawl → one row per re-fetched URL:
    ``(url, kind, prior_hash, bytes_to_write)``.

    The WARC standard dedups recrawl storage with *revisit* records
    (ISO 28500 §6.7.2: an identical-payload-digest revisit refers to the
    prior response instead of re-storing the bytes — our WARC writer is
    `sources/warc.py`). This operator makes that decision relationally:

    * ``new``      — first fetch of this URL → full response record,
    * ``revisit``  — digest unchanged → reference record, ~0 bytes,
    * ``changed``  — digest differs → full response record.

    ``bytes_to_write`` is the new payload size for new/changed rows and
    0 for revisits (the ~70-byte revisit header is noise), so
    ``sum(bytes_to_write)`` is the recrawl's real archive cost. One
    left equi-join on url, both sides partitioned on the key; at
    10^10-URL recrawls this replaces re-storing the ~60-90 % of the web
    that did not change between visits.
    """
    # deterministic collapse when the prior cache holds several rows
    # per URL (append slices across rounds do): max(hash), NOT
    # dropDuplicates — an arbitrary keeper made kind/bytes_to_write
    # flip between runs/partitionings (r5 review). For true latest-
    # visit semantics pre-dedupe the frame upstream (e.g. max_by on
    # fetched_round) before passing it in.
    o = (
        old.select(
            F.col(url_col).alias("url"), F.col(hash_col).alias("prior_hash")
        )
        .groupBy("url")
        .agg(F.max("prior_hash").alias("prior_hash"))
    )
    cols = [F.col(url_col).alias("url"), F.col(hash_col).alias("_h")]
    if bytes_col is not None:
        cols.append(F.col(bytes_col).cast("long").alias("_b"))
    n = new.select(*cols)
    if bytes_col is None:
        n = n.withColumn("_b", F.lit(0).cast("long"))
    j = n.join(o, "url", "left")
    return j.select(
        "url",
        F.when(F.col("prior_hash").isNull(), "new")
        .when(F.col("prior_hash") == F.col("_h"), "revisit")
        .otherwise("changed")
        .alias("kind"),
        "prior_hash",
        F.when(F.col("prior_hash") == F.col("_h"), F.lit(0).cast("long"))
        .otherwise(F.col("_b"))
        .alias("bytes_to_write"),
    )


# ------------------------------------------------------------- reciprocity
def reciprocal_links(
    links: DataFrame,
    src_host_col: str = "src_host",
    dst_host_col: str = "dst_host",
    min_links: int = 4,
) -> DataFrame:
    """Nepotistic-linking signal (Fetterly et al.): host pairs that link
    to EACH OTHER → ``(host_a, host_b, n_ab, n_ba,
    reciprocity_permille)`` with host_a < host_b.

    Organic linking is largely one-directional; heavy mutual linking is
    the classic link-exchange footprint. ``reciprocity_permille`` =
    1000 · 2·min(n_ab, n_ba) / (n_ab + n_ba) — 1000 means perfectly
    balanced exchange, near 0 means one-way. Pairs below ``min_links``
    total are dropped (no statistical footing). Complements
    :func:`link_spam_hosts` (single-source concentration): exchange
    rings spread sources wide but reciprocate.

    Scale: one hash aggregate on the DIRECTED pair (map-side partials
    collapse the edge list), then one self-equi-join on the ~|host
    pairs| aggregate — never on edges.
    """
    per_pair = (
        links.select(
            F.col(src_host_col).alias("s"), F.col(dst_host_col).alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fwd = per_pair.filter(F.col("s") < F.col("d")).select(
        F.col("s").alias("host_a"), F.col("d").alias("host_b"), F.col("n").alias("n_ab")
    )
    rev = per_pair.filter(F.col("s") > F.col("d")).select(
        F.col("d").alias("host_a"), F.col("s").alias("host_b"), F.col("n").alias("n_ba")
    )
    return (
        fwd.join(rev, ["host_a", "host_b"], "full_outer")
        .select(
            "host_a",
            "host_b",
            F.coalesce("n_ab", F.lit(0)).alias("n_ab"),
            F.coalesce("n_ba", F.lit(0)).alias("n_ba"),
        )
        .filter(F.col("n_ab") + F.col("n_ba") >= min_links)
        .withColumn(
            "reciprocity_permille",
            F.expr(
                "CAST(2 * least(n_ab, n_ba) * 1000 DIV (n_ab + n_ba) AS BIGINT)"
            ),
        )
    )


# ------------------------------------------------------------ anchor text
def anchor_text_topk(
    links: DataFrame,
    k: int = 3,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Top-k anchor terms per link target → ``(dst, term, n, rank)``.

    Anchor text is the classic off-page relevance signal (the linking
    page describes the target better than the target describes
    itself); a search index joins this against the BM25 postings
    (`operators/retrieval.py`). Terms are lower-cased, split on
    ``pattern``, counted per (dst, term); ``rank`` is by count
    descending with term ascending as the deterministic tie-break.

    Scale: explode is bounded by anchor length (anchors are a few
    words); one hash aggregate + one window partitioned BY DST — never
    a global sort. A hub page with 10^7 in-links still aggregates to
    ≤ vocabulary-size rows before the window sees it.
    """
    terms = links.select(
        F.col(dst_col).alias("dst"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(anchor_col)), pattern), lambda x: x != ""
            )
        ).alias("term"),
    )
    counts = terms.groupBy("dst", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dst", "term", "n", F.col("rank").cast("int").alias("rank"))
    )


# -------------------------------------------------------------- link spam
def link_spam_hosts(
    links: DataFrame,
    src_host_col: str = "src_host",
    dst_host_col: str = "dst_host",
    min_inlinks: int = 20,
    min_top_share_permille: int = 600,
) -> DataFrame:
    """Link-farm signal per target host → ``(dst_host, n_inlinks,
    n_src_hosts, top_src_share_permille, diversity_permille,
    is_link_farm)``.

    An organically popular host collects links from MANY source hosts;
    a farm-boosted one collects them overwhelmingly from one. Two
    integer ratios capture it: ``top_src_share_permille`` = 1000 ·
    links-from-the-single-biggest-source / in-links (the flag basis —
    robust even when the organic source pool is small), and
    ``diversity_permille`` = 1000 · distinct-source-hosts / in-links
    (reported for diagnostics). ``is_link_farm`` flags hosts with
    ≥ ``min_inlinks`` where one source supplies at least
    ``min_top_share_permille`` of them. PageRank/HITS
    (`operators/graph.py`) consume this as a pre-filter: farm edges are
    dropped before the power iteration, the standard anti-spam step.

    Scale: two chained hash aggregates (by (dst,src) then by dst) —
    map-side partials collapse the 10^10-edge graph before any wide
    row exists; no joins, no windows.
    """
    per_src = links.groupBy(
        F.col(dst_host_col).alias("dst_host"), F.col(src_host_col).alias("src_host")
    ).agg(F.count(F.lit(1)).alias("n_from_src"))
    return (
        per_src.groupBy("dst_host")
        .agg(
            F.sum("n_from_src").alias("n_inlinks"),
            F.count(F.lit(1)).alias("n_src_hosts"),
            F.max("n_from_src").alias("max_from_src"),
        )
        .select(
            "dst_host",
            "n_inlinks",
            "n_src_hosts",
            F.expr("CAST(max_from_src * 1000 DIV n_inlinks AS BIGINT)").alias(
                "top_src_share_permille"
            ),
            F.expr("CAST(n_src_hosts * 1000 DIV n_inlinks AS BIGINT)").alias(
                "diversity_permille"
            ),
            (
                (F.col("n_inlinks") >= min_inlinks)
                & (
                    F.expr("max_from_src * 1000 DIV n_inlinks")
                    >= min_top_share_permille
                )
            ).alias("is_link_farm"),
        )
    )


# ----------------------------------------------------------- sitemap diff
def sitemap_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    mod_col: str = "lastmod",
) -> DataFrame:
    """Delta between two sitemap snapshots → ``(url, old_lastmod,
    new_lastmod, change)`` for every URL that changed state; unchanged
    URLs are dropped (the recrawl scheduler only consumes deltas).

    ``change``: ``added`` (new only), ``removed`` (old only),
    ``changed`` (present in both with different lastmod). One
    full-outer equi-join on url; at 10^8-URL sitemaps both sides are
    partitioned on the join key and AQE handles the skew of giant
    hosts. Input frames must carry one row per URL (sitemap parse
    already dedupes; enforce with max(lastmod) upstream otherwise).
    """
    # presence markers, NOT lastmod nullity (r5 review): lastmod is
    # OPTIONAL in the sitemaps protocol, so a URL present with a NULL
    # lastmod must not read as absent — that misfiled added/removed and
    # silently dropped NULL-vs-value changes through the != filter
    o = old.select(
        F.col(url_col).alias("url"),
        F.col(mod_col).alias("old_lastmod"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.col(mod_col).alias("new_lastmod"),
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, "url", "full_outer")
    return joined.select(
        "url",
        "old_lastmod",
        "new_lastmod",
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        "_in_old",
        "_in_new",
    ).filter(
        F.col("_in_old").isNull()
        | F.col("_in_new").isNull()
        # null-safe inequality: both-NULL lastmods are UNCHANGED
        | ~F.col("old_lastmod").eqNullSafe(F.col("new_lastmod"))
    ).drop("_in_old", "_in_new")


# ------------------------------------------------------------- freshness
def change_rate_plan(
    visits: DataFrame,
    base_interval_s: int = 86400,
    min_interval_s: int = 3600,
    max_interval_s: int = 30 * 86400,
    url_col: str = "url",
    visit_col: str = "visit_no",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change-rate estimation from revisit history → the recrawl
    schedule: ``(url, n_visits, n_changes, change_permille,
    next_interval_s)``.

    The freshness literature (Cho & Garcia-Molina, "Estimating frequency
    of change", TOIT'03) models page change as Poisson and schedules
    revisits inversely to the observed change rate; the reference's
    archive keeps one record per fetch (`/root/reference/src/lib/
    archive.rs` content hashing), which is exactly the observation
    stream this needs. We keep the estimator in exact integer
    arithmetic so re-runs and the DuckDB twin are bit-identical:

    * ``n_changes`` — consecutive-visit digest flips (lag over visit_no),
    * ``change_permille`` = 1000·n_changes ÷ (n_visits−1); NULL with a
      single visit (zero observation intervals),
    * ``next_interval_s`` — base·1000 ÷ change_permille clamped to
      [min, max]; a never-changing page coasts at ``max_interval_s``,
      an every-visit changer is pinned to ``min_interval_s``, and an
      unobserved page (one visit) retries at ``base_interval_s``.

    Scale: one window (lag) and one hash aggregate, both keyed on url —
    a single shuffle, no joins. Feeds the same scheduler slot as
    :func:`sitemap_diff` (which covers the sitemap-declared subset).
    """
    w = Window.partitionBy("url").orderBy("visit_no")
    obs = visits.select(
        F.col(url_col).alias("url"),
        F.col(visit_col).cast("long").alias("visit_no"),
        F.col(hash_col).alias("chash"),
    ).withColumn("prior", F.lag("chash").over(w))
    per_url = obs.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum(
            F.when(
                F.col("prior").isNotNull() & (F.col("prior") != F.col("chash")), 1
            ).otherwise(0)
        ).alias("n_changes"),
    )
    cp = F.when(
        F.col("n_visits") >= 2,
        F.expr("n_changes * 1000 DIV (n_visits - 1)"),
    ).cast("long")
    return per_url.withColumn("change_permille", cp).withColumn(
        "next_interval_s",
        F.when(F.col("change_permille").isNull(), F.lit(base_interval_s))
        .when(F.col("change_permille") == 0, F.lit(max_interval_s))
        .otherwise(
            F.greatest(
                F.lit(min_interval_s),
                F.least(
                    F.lit(max_interval_s),
                    F.expr(f"{base_interval_s} * 1000 DIV change_permille"),
                ),
            )
        )
        .cast("long"),
    )


# --------------------------------------------------------- path templates
def _url_template(url_col: str):
    """THE url→path-template column: numeric segments → <n>, long-hex
    segments → <h>. One definition shared by the miner
    (:func:`url_path_templates`) and the applier
    (:func:`apply_template_caps`) — r5 review: the expression was
    duplicated verbatim, and any one-sided tweak would make mined
    verdicts never match apply-side templates (caps silently stop
    applying, keep=true for everything)."""
    path = F.regexp_extract(F.col(url_col), r"^https?://[^/?#]+(/[^?#]*)?", 1)
    seg = lambda s: (
        F.when(s.rlike("^[0-9]+$"), F.lit("<n>"))
        .when(s.rlike("^[0-9a-f]{8,}$"), F.lit("<h>"))
        .otherwise(s)
    )
    return F.array_join(
        F.transform(
            F.split(F.when(path == "", F.lit("/")).otherwise(path), "/"), seg
        ),
        "/",
    )


def url_path_templates(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    min_urls: int = 5,
    ratio_permille: int = 3000,
) -> DataFrame:
    """Collapse URL *paths* into templates and flag the unbounded ones →
    ``(host, template, n_urls, n_hashes, urls_per_hash_permille,
    unbounded)``.

    :func:`dust_params` handles query parameters; this is the PATH half
    of DUST (Bar-Yossef et al., WWW'07 §5 mines path rules too): numeric
    segments become ``<n>`` and long-hex segments (ids, session tokens,
    digests — 8+ chars of [0-9a-f]) become ``<h>``, so
    ``/item/8231``, ``/item/97`` share the template ``/item/<n>``. A
    template minting ``≥ min_urls`` distinct URLs whose URL:content
    ratio exceeds ``ratio_permille`` (default 3:1) is *unbounded* — an
    id-space the frontier can enumerate forever for little new content;
    the scheduler caps or samples it (same consumer as
    ``host_harvest``'s trap flag, but per-template, so one bad route
    doesn't starve the host's good routes).

    Scale: a projection (split + transform + join) and ONE hash
    aggregate on (host, template); no joins, no explode.
    """
    tmpl = _url_template(url_col)
    return (
        pages.select(
            F.regexp_extract(F.col(url_col), r"^https?://([^/?#]+)", 1).alias("host"),
            tmpl.alias("template"),
            F.col(url_col).alias("u"),
            F.col(hash_col).alias("h"),
        )
        .groupBy("host", "template")
        .agg(
            F.countDistinct("u").alias("n_urls"),
            F.countDistinct("h").alias("n_hashes"),
        )
        .select(
            "host",
            "template",
            "n_urls",
            "n_hashes",
            F.expr("n_urls * 1000 DIV n_hashes").alias("urls_per_hash_permille"),
            (
                (F.col("n_urls") >= min_urls)
                & (F.col("n_urls") * 1000 >= ratio_permille * F.col("n_hashes"))
            ).alias("unbounded"),
        )
    )


# ------------------------------------------------------------ host health
def host_health(
    fetches: DataFrame,
    slow_ms: int = 500,
    base_delay_ms: int = 500,
    host_col: str = "host",
    status_col: str = "status",
    latency_col: str = "latency_ms",
) -> DataFrame:
    """Per-host fetch health → the adaptive-politeness dial:
    ``(host, n_fetches, ok_permille, err4_permille, err5_permille,
    mean_latency_ms, slow_permille, backoff, crawl_delay_ms)``.

    The reference schedules a fixed per-domain delay (crawler.rs
    politeness); operationally a crawler must *widen* that delay for
    hosts that are erroring or slow (RFC 9309 has no signal for this —
    it's learned from the fetch log). Tiers: ≥20 % 5xx or ≥50 % slow
    fetches → 4× backoff; ≥5 % 5xx or ≥20 % slow → 2×; else 1×.
    ``crawl_delay_ms = base_delay_ms × backoff`` feeds
    ``operators/politeness.py`` as the per-host delay override.

    Exact integer permille throughout; ONE hash aggregate (map-side
    partials collapse the 10^10-row fetch log before any shuffle).
    """
    agg = fetches.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(
            F.when(
                (F.col(status_col) >= 200) & (F.col(status_col) < 300), 1
            ).otherwise(0)
        ).alias("_ok"),
        F.sum(
            F.when(
                (F.col(status_col) >= 400) & (F.col(status_col) < 500), 1
            ).otherwise(0)
        ).alias("_e4"),
        F.sum(F.when(F.col(status_col) >= 500, 1).otherwise(0)).alias("_e5"),
        F.sum(F.col(latency_col).cast("long")).alias("_lat"),
        F.sum(F.when(F.col(latency_col) > slow_ms, 1).otherwise(0)).alias("_slow"),
    )
    pm = lambda c: F.expr(f"{c} * 1000 DIV n_fetches")
    with_pm = agg.select(
        "host",
        "n_fetches",
        pm("_ok").alias("ok_permille"),
        pm("_e4").alias("err4_permille"),
        pm("_e5").alias("err5_permille"),
        F.expr("_lat DIV n_fetches").alias("mean_latency_ms"),
        pm("_slow").alias("slow_permille"),
    )
    backoff = (
        F.when(
            (F.col("err5_permille") >= 200) | (F.col("slow_permille") >= 500), 4
        )
        .when((F.col("err5_permille") >= 50) | (F.col("slow_permille") >= 200), 2)
        .otherwise(1)
        .cast("long")
    )
    return with_pm.withColumn("backoff", backoff).withColumn(
        "crawl_delay_ms", (F.lit(base_delay_ms) * F.col("backoff")).cast("long")
    )


# -------------------------------------------------------- template caps
def apply_template_caps(
    pages: DataFrame,
    verdicts: DataFrame,
    cap: int = 100,
    url_col: str = "url",
) -> DataFrame:
    """Apply :func:`url_path_templates` verdicts to a URL set →
    ``(url, host, template, keep)``: URLs under an *unbounded* template
    survive only up to ``cap`` per (host, template) — chosen by md5(url)
    order, so the sample is deterministic and re-shard-stable — while
    bounded-template URLs all pass. The template loop closed, exactly
    the :func:`apply_dust_rules` pattern for the path axis: mine on the
    cache, apply at admission, and the calendar/id-space trap stops
    minting frontier rows past the cap.

    Scale: verdicts are bounded (hosts × templates — broadcast). The
    cap itself is SKEW-PROOF: a naive per-(host, template) row_number
    window would sort a mega-trap template (10^8 URLs of one calendar)
    in a single task; instead the cap-th smallest sort key is found by
    an exact two-level top-k — per-(group, input-partition) local
    top-cap (the giant group splinters across P keys, collect_list
    bounded by partition size), then a global top-cap over ≤ cap·P
    survivors, then one broadcast threshold join. The sort key is
    ``md5(url) || url`` (fixed-width hash prefix ⇒ concat order ==
    (md5, url) tuple order; urls are distinct ⇒ keys unique ⇒ the
    threshold keeps exactly min(cap, n) rows). No window, no skewed
    shuffle; plan pinned window-free in tests.
    """
    tmpl = _url_template(url_col)
    u = pages.select(F.col(url_col).alias("url")).dropDuplicates().select(
        "url",
        F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
        tmpl.alias("template"),
    )
    unb = verdicts.filter(F.col("unbounded")).select(
        "host", "template", F.lit(True).alias("_unb")
    )
    j = u.join(F.broadcast(unb), ["host", "template"], "left")
    bounded = j.filter(F.col("_unb").isNull()).select(
        "url", "host", "template", F.lit(True).alias("keep")
    )
    cand = j.filter(F.col("_unb").isNotNull()).withColumn(
        "_k", F.concat(F.md5("url"), F.col("url"))
    )
    loc = (
        cand.withColumn("_pid", F.spark_partition_id())
        .groupBy("host", "template", "_pid")
        .agg(F.slice(F.array_sort(F.collect_list("_k")), 1, cap).alias("_loc"))
    )
    thr = (
        loc.select("host", "template", F.explode("_loc").alias("_k"))
        .groupBy("host", "template")
        .agg(
            F.element_at(
                F.slice(F.array_sort(F.collect_list("_k")), 1, cap), -1
            ).alias("_thr")
        )
    )
    capped = cand.join(F.broadcast(thr), ["host", "template"]).select(
        "url", "host", "template", (F.col("_k") <= F.col("_thr")).alias("keep")
    )
    return bounded.unionByName(capped)


# ------------------------------------------------------ robots freshness
def robots_revalidation(
    robots_meta: DataFrame,
    active_hosts: DataFrame,
    now_s: int,
    ttl_s: int = 86400,
    host_col: str = "host",
    fetched_col: str = "fetched_at",
) -> DataFrame:
    """Which hosts need a robots.txt refetch BEFORE their next scheduled
    fetches → ``(host, age_s, stale, refetch)``.

    RFC 9309 §2.4 allows caching robots for up to 24 hours (our
    ``ttl_s`` default); a compliant crawler must revalidate stale rules
    before drawing on a host's budget, and a host with planned fetches
    but NO cached robots at all must fetch it first (the reference
    probes robots per domain up front, `sources/robots.py` S2/S3 — this
    is the recrawl-loop analog). ``refetch`` = active ∧ (stale ∨ never
    fetched); inactive hosts never refetch (no budget wasted on rules
    nobody will use).

    One full-outer equi-join on host between two bounded per-host
    tables (both already collapsed from the frontier by aggregates).
    """
    m = robots_meta.select(
        F.col(host_col).alias("host"),
        F.col(fetched_col).cast("long").alias("_fetched"),
    ).dropDuplicates(["host"])
    a = (
        active_hosts.select(F.col(host_col).alias("host"))
        .dropDuplicates()
        .withColumn("_active", F.lit(True))
    )
    j = m.join(a, "host", "full_outer")
    age = F.when(
        F.col("_fetched").isNotNull(), F.lit(now_s) - F.col("_fetched")
    ).cast("long")
    stale = F.coalesce(age > ttl_s, F.lit(False))
    return j.select(
        "host",
        age.alias("age_s"),
        stale.alias("stale"),
        (
            F.coalesce(F.col("_active"), F.lit(False))
            & (stale | F.col("_fetched").isNull())
        ).alias("refetch"),
    )


# --------------------------------------------------------------- CDX index
def cdx_index(
    records: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    bytes_col: str = "n_bytes",
    file_col: str = "file_id",
) -> DataFrame:
    """Build the CDX(J) lookup index for a set of WARC records →
    ``(urlkey, file_id, ts, digest, offset, length)``.

    Web archives resolve a URL to (file, byte offset) through a CDX
    index whose primary key is the SURT form of the URL (host labels
    reversed and comma-joined, then ``)`` + path?query — so one host's
    captures sort together and prefix scans cover subdomains); our CDX
    *pager* reads such an index remotely (`sources/discovery.py` S7),
    and this operator produces the same artifact for archives WE write
    (`sources/warc.py` K3). ``offset`` is the byte position of each
    record inside its WARC file: the running sum of preceding record
    lengths in (ts, url) order — exactly the order a sequential writer
    appends.

    Scale: the SURT key is a projection; the offset cumsum is a window
    per WARC FILE — bounded by the 1 GB-per-file WARC convention (a
    file's record list fits one task by construction), with files
    themselves unbounded in number. One shuffle on file_id.
    """
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/?#]+)", 1)
    pathq = F.regexp_extract(F.col(url_col), r"^https?://[^/?#]+(.*)$", 1)
    urlkey = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(pathq == "", F.lit("/")).otherwise(pathq),
    )
    w = (
        Window.partitionBy("file_id")
        .orderBy("ts", "url", "digest")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = records.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(digest_col).alias("digest"),
        F.col(bytes_col).cast("long").alias("length"),
        F.col(file_col).alias("file_id"),
        urlkey.alias("urlkey"),
    )
    return base.select(
        "urlkey",
        "file_id",
        "ts",
        "digest",
        F.coalesce(F.sum("length").over(w), F.lit(0)).cast("long").alias("offset"),
        "length",
    )


def rendezvous_shards(
    hosts: DataFrame,
    n_workers: int = 16,
    host_col: str = "host",
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) assignment of hosts to
    crawler workers → input columns + ``(worker)``.

    The frontier must be sharded host-sticky (politeness state —
    robots rules, crawl-delay clocks, seen blooms — lives with the
    host), and the shard map must survive worker-count changes without
    reshuffling the world: HRW hashing (Thaler & Ravishankar '98, the
    scheme memcached/Ceph style placement uses) moves ONLY the hosts
    owned by a removed worker — the minimal-disruption property a
    mod-N map lacks (mod-N reshuffles (N−1)/N of all hosts on N→N−1;
    the reference pins one politeness governor per domain in a single
    process, crawler.rs:237-260 — this is that governor's address map
    at cluster scale).

    worker(h) = argmax_w md5_52(salt‖h‖'#'‖w); ties (≈ W²·2⁻⁵² — never
    in practice) break to the larger w in BOTH engines. Pure projection
    — the argmax runs inside one array expression (sequence → transform
    → array_max on (score, w) structs), zero shuffle, zero UDF; W is a
    config constant ≪ 10³, so the per-row array is trivially bounded.
    """
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(n_workers - 1)),
        lambda w: F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col(host_col),
                            F.lit("#"),
                            w.cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("score"),
            w.alias("w"),
        ),
    )
    return hosts.withColumn("worker", F.array_max(scores)["w"].cast("int"))


def rendezvous_sql(
    table: str, n_workers: int = 16, host_col: str = "host", salt: str = "hrw"
) -> str:
    """DuckDB twin of :func:`rendezvous_shards` — identical hash;
    argmax spelled as a window (score DESC, w DESC = array_max's
    struct order)."""
    return f"""
        WITH cand AS (
          SELECT t.*, w,
                 CAST('0x' || substr(md5('{salt}' || {host_col} || '#' || CAST(w AS VARCHAR)), 1, 13) AS BIGINT) AS score
          FROM {table} t, (SELECT unnest(generate_series(0, {n_workers - 1})) AS w)
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY {host_col} ORDER BY score DESC, w DESC
                 ) AS rn
          FROM cand
        )
        SELECT * EXCLUDE (w, score, rn), CAST(w AS INT) AS worker
        FROM ranked WHERE rn = 1
    """


def cocitation_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_src_out: int = 20,
) -> DataFrame:
    """Co-citation similarity over a directed link graph →
    ``(dst_a, dst_b, n_common)``: target pairs sharing ≥ ``min_common``
    distinct link SOURCES (dst_a < dst_b).

    The structural mirror signal next to :func:`mirror_hosts`' content
    overlap: two URLs consistently cited together by the same pages
    (navigation siblings, mirrored section roots, translated variants)
    — Kessler's bibliographic-coupling dual, the classic web-IR
    co-citation measure.

    Scale guard — same class as ``mirror_hosts.max_hash_df``: the
    self-join is quadratic in per-SOURCE out-degree, so sources with
    more than ``max_src_out`` distinct targets (sitemap pages, "all
    posts" indexes — structurally uninformative citers) are dropped
    BEFORE the join, bounding pair emission at C(max_src_out, 2) per
    source. One aggregate + one equi-self-join + one aggregate.
    """
    e = edges.select("src", "dst").dropDuplicates()
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    kept = e.join(
        od.filter(F.col("od") <= max_src_out).select("src"), "src"
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") < F.col("b.dst")),
        )
        .groupBy(
            F.col("a.dst").alias("dst_a"), F.col("b.dst").alias("dst_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def host_alias_rules(
    pages: DataFrame, min_share_permille: int = 800
) -> DataFrame:
    """Mine www→bare host-alias fold rules from the crawl cache →
    ``(alias, canonical, shared, total, share_permille)``.

    The single most common mirror class on the web is not an exotic
    DUST rule but ``www.x`` ≡ ``x``; folding it halves those hosts'
    frontier and doubles their effective politeness budget. A rule is
    minted when the www variant's distinct content hashes are
    ≥ ``min_share_permille`` covered by the bare host's (asymmetric
    containment, like ``containment_pairs``) — a www host serving its
    OWN content (share below threshold) never folds.

    One hash-dedup per side + one equi-join on (bare-host,
    content_hash) + one aggregate over the per-host-pair table; the
    join key includes the content hash, so per-key fan-out is the
    number of www-variants of one host with one hash — bounded by 1.
    """
    www = (
        pages.filter(F.col("host").startswith("www."))
        .select(
            F.col("host").alias("alias"),
            F.expr("substring(host, 5)").alias("canonical"),
            "content_hash",
        )
        .dropDuplicates()
    )
    bare = (
        pages.filter(~F.col("host").startswith("www."))
        .select(F.col("host").alias("canonical"), "content_hash")
        .dropDuplicates()
    )
    totals = www.groupBy("alias", "canonical").agg(
        F.count(F.lit(1)).alias("total")
    )
    shared = (
        www.join(bare, ["canonical", "content_hash"])
        .groupBy("alias", "canonical")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        totals.join(shared, ["alias", "canonical"], "left")
        .select(
            "alias",
            "canonical",
            F.coalesce("shared", F.lit(0)).alias("shared"),
            "total",
        )
        .withColumn("share_permille", F.expr("shared * 1000 DIV total"))
        .filter(F.col("share_permille") >= min_share_permille)
    )


def fold_host_aliases(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Apply mined alias rules to a frontier(host, path, …) → the same
    rows with ``host`` rewritten to its canonical form (the dust_apply
    pattern: broadcast the small rule table, one left join, zero
    frontier shuffles)."""
    r = F.broadcast(rules.select(F.col("alias").alias("host"), "canonical"))
    return (
        frontier.join(r, "host", "left")
        .withColumn("host", F.coalesce("canonical", F.col("host")))
        .drop("canonical")
    )


def sitemap_coverage(
    cache: DataFrame, sitemap: DataFrame
) -> DataFrame:
    """Cache-vs-sitemap coverage audit per host → ``(host, n_both,
    n_cache_only, n_sitemap_only, coverage_permille)``.

    :func:`sitemap_diff` compares two sitemap SNAPSHOTS; this compares
    the sitemap against what the crawl actually banked. Low coverage =
    fetch debt (the host publishes more than we take); high cache-only
    = link-discovered URLs the publisher doesn't list — both feed the
    next round's budget weights. Inputs are (host, url) sets; one
    full-outer equi-join on the composite key + one host aggregate.
    """
    c = cache.select("host", "url").dropDuplicates().withColumn(
        "in_cache", F.lit(1)
    )
    s = sitemap.select("host", "url").dropDuplicates().withColumn(
        "in_map", F.lit(1)
    )
    j = c.join(s, ["host", "url"], "full_outer")
    return (
        j.groupBy("host")
        .agg(
            F.sum(
                F.when(
                    F.col("in_cache").isNotNull() & F.col("in_map").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_both"),
            F.sum(F.when(F.col("in_map").isNull(), 1).otherwise(0)).alias(
                "n_cache_only"
            ),
            F.sum(F.when(F.col("in_cache").isNull(), 1).otherwise(0)).alias(
                "n_sitemap_only"
            ),
        )
        .withColumn(
            "coverage_permille",
            F.expr(
                "CASE WHEN n_both + n_sitemap_only > 0"
                " THEN n_both * 1000 DIV (n_both + n_sitemap_only) END"
            ),
        )
    )


# ------------------------------------------------------------ trap signals
# far-future 4-digit year (2031-2099), matched textually so neither
# engine needs a string->int cast inside a lambda (ANSI-safe)
_TRAP_YEAR_RE = r"^20(3[1-9]|[4-9][0-9])$"
# >=16-char lowercase-hex path segment: session ids / unbounded opaque
# id spaces (reported, not a verdict on its own -- CDNs use hash paths)
_TRAP_HEX_RE = r"^[0-9a-f]{16,}$"


def trap_url_signals(
    pages: DataFrame,
    url_col: str = "url",
    max_depth: int = 12,
) -> DataFrame:
    """Per-URL structural crawler-trap signals -> ``(host, url, depth,
    max_seg_repeat, calendar, opaque_id, seg_loop, trapped)``.

    :func:`host_harvest` detects traps AFTER fetching (unbounded URLs
    over bounded content); this is the admission-time complement -- the
    classic spider-trap silhouettes are visible in the URL string
    itself, before any budget is spent (Heritrix's pathological-path
    rule; IRLbot's budget defense, Lee et al., TWEB'09):

    * ``seg_loop`` -- some path segment appears >=3 times
      (``/a/b/a/b/a/b``: relative-link cycles minting infinite
      synthetic URLs),
    * ``calendar`` -- a path segment names a far-future year (2031+):
      auto-generated calendar pages with no content bound,
    * ``opaque_id`` -- a >=16-char lowercase-hex segment (session ids;
      reported for DUST/template mining, not a verdict alone),
    * ``depth`` -- path-segment count; ``depth > max_depth`` marks
      ``trapped`` (link-graph recursion that survived the loop rule).

    ``trapped = seg_loop OR calendar OR depth > max_depth``. Pure
    projection -- one split + higher-order array ops per row, no
    shuffle, no UDF, no join -- safe at any frontier scale. The
    admission filter consumes :func:`trap_hosts`' quarantine verdict
    the same way it consumes robots disallow.
    """
    u = pages.select(F.col(url_col).alias("url")).dropDuplicates()
    path = F.regexp_extract("url", r"^https?://[^/?#]+(/[^?#]*)?", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    rep = F.array_max(
        F.transform(segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))
    )
    sig = u.select(
        F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
        "url",
        F.size(segs).alias("depth"),
        F.coalesce(rep, F.lit(0)).alias("max_seg_repeat"),
        F.exists(segs, lambda x: x.rlike(_TRAP_YEAR_RE)).alias("calendar"),
        F.exists(segs, lambda x: x.rlike(_TRAP_HEX_RE)).alias("opaque_id"),
    )
    return sig.withColumn("seg_loop", F.col("max_seg_repeat") >= 3).withColumn(
        "trapped",
        F.col("seg_loop") | F.col("calendar") | (F.col("depth") > max_depth),
    )


def trap_hosts(
    signals: DataFrame, quarantine_permille: int = 300
) -> DataFrame:
    """Host rollup over :func:`trap_url_signals` -> ``(host, n_urls,
    n_loop, n_calendar, n_opaque, n_trapped, max_depth, trap_permille,
    quarantine)``.

    ``quarantine`` (trap share >= ``quarantine_permille`` permille)
    feeds admission: the frontier stops minting URLs for hosts whose
    link graph is mostly synthetic -- IRLbot's budget defense as one
    hash aggregate over the per-URL signal table. Exact integer
    permille so the oracle twin matches bit-for-bit.
    """
    return (
        signals.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.col("seg_loop").cast("int")).alias("n_loop"),
            F.sum(F.col("calendar").cast("int")).alias("n_calendar"),
            F.sum(F.col("opaque_id").cast("int")).alias("n_opaque"),
            F.sum(F.col("trapped").cast("int")).alias("n_trapped"),
            F.max("depth").alias("max_depth"),
        )
        .withColumn("trap_permille", F.expr("n_trapped * 1000 DIV n_urls"))
        .withColumn(
            "quarantine", F.col("trap_permille") >= quarantine_permille
        )
    )


def apply_quarantine(frontier: DataFrame, verdicts: DataFrame) -> DataFrame:
    """Drop frontier rows for quarantined hosts (the trap loop closed:
    :func:`trap_url_signals` -> :func:`trap_hosts` -> this, before
    ``politeness.schedule_rounds``). ``verdicts`` is trap_hosts output
    — bounded per-host, so it broadcasts into a left-anti join and the
    frontier itself never shuffles; same shape as robots disallow and
    :func:`fold_host_aliases`."""
    q = F.broadcast(
        verdicts.filter(F.col("quarantine")).select("host").dropDuplicates()
    )
    return frontier.join(q, "host", "left_anti")


# ---------------------------------------------------------- pagination
# bounded decimal integer: the guarded long cast below cannot overflow
_PAG_INT_RE = r"^[0-9]{1,15}$"


def pagination_params(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    min_vals: int = 3,
    max_span_factor: int = 2,
) -> DataFrame:
    """Mine pagination-style traversal parameters — the anti-DUST →
    ``(host, param, n_vals, all_int, min_val, max_val, n_evidence,
    n_violations, is_pagination)``.

    :func:`dust_params` finds parameters whose variation NEVER changes
    content (strip them); this finds the complement worth budget caps:
    a parameter is ``is_pagination`` on a host when every observed
    value is a decimal integer, it takes ≥ ``min_vals`` distinct
    values, varying it DOES change content (``n_violations ≥ 1`` from
    the dust evidence groups — real traversal, not a session id that
    happens to be numeric), and the values form a dense run
    (``max−min+1 ≤ max_span_factor × n_vals`` — sparse ids are item
    keys, not page counters). The crawl budget then caps the traversal
    depth per (host, param) instead of following ``?page=`` forever —
    the query-string sibling of the calendar trap
    (:func:`trap_url_signals`).

    Scale: one bounded explode (params-per-URL) + two hash aggregates
    + the dust join on the bounded (host, param) key space. The long
    cast is guarded by the integer regex (≤15 digits), so ANSI mode
    can never throw.
    """
    base = (
        pages.select(F.col(url_col).alias("url"), F.col(hash_col).alias("chash"))
        .dropDuplicates(["url"])
        .filter(F.col("url").contains("?"))
    )
    kv = base.select(
        F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
        F.explode(F.split(F.substring_index("url", "?", -1), "&")).alias("kvp"),
    ).select(
        "host",
        F.substring_index("kvp", "=", 1).alias("param"),
        F.substring_index("kvp", "=", -1).alias("pval"),
    )
    is_int = F.col("pval").rlike(_PAG_INT_RE)
    stats = kv.groupBy("host", "param").agg(
        F.countDistinct("pval").alias("n_vals"),
        (F.sum(F.when(~is_int, 1).otherwise(0)) == 0).alias("all_int"),
        F.min(F.when(is_int, F.col("pval").cast("long"))).alias("min_val"),
        F.max(F.when(is_int, F.col("pval").cast("long"))).alias("max_val"),
    )
    dust = dust_params(pages, url_col=url_col, hash_col=hash_col).select(
        "host", "param", "n_evidence", "n_violations"
    )
    return stats.join(dust, ["host", "param"]).withColumn(
        "is_pagination",
        F.col("all_int")
        & (F.col("n_vals") >= min_vals)
        & (F.col("n_violations") >= 1)
        & (
            F.col("max_val") - F.col("min_val") + 1
            <= F.lit(max_span_factor) * F.col("n_vals")
        ),
    )


def apply_pagination_caps(
    pages: DataFrame,
    rules: DataFrame,
    cap: int = 20,
    url_col: str = "url",
) -> DataFrame:
    """Apply :func:`pagination_params` verdicts to a URL set → ``(url,
    admit, capped_param)``: a URL is dropped when ANY of its query
    parameters is a mined page counter on its host with an integer
    value ≥ ``cap`` — the pagination loop closed, exactly the
    :func:`apply_template_caps` pattern for the query-string axis:
    ``?page=0..19`` keeps minting frontier rows, ``?page=20..∞`` stops,
    and non-pagination params (session ids, item ids) never gate.

    ``capped_param`` names the (first, alphabetically) parameter that
    tripped the cap, for the crawl report. Query-less URLs pass
    through. Scale: rules are bounded (hosts × params — broadcast into
    the kv join); one bounded explode + one URL-keyed re-aggregate; no
    window, no skewed shuffle; the value cap is a pure comparison so a
    10^8-URL ?page= trap needs no sorting at all.
    """
    u = pages.select(F.col(url_col).alias("url")).dropDuplicates()
    noq = u.filter(~F.col("url").contains("?")).select(
        "url", F.lit(True).alias("admit"),
        F.lit(None).cast("string").alias("capped_param"),
    )
    pg = F.broadcast(
        rules.filter(F.col("is_pagination")).select(
            F.col("host").alias("_rh"),
            F.col("param").alias("_rp"),
            F.lit(True).alias("_pg"),
        )
    )
    kv = (
        u.filter(F.col("url").contains("?"))
        .select(
            "url",
            F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
            F.explode(F.split(F.substring_index("url", "?", -1), "&")).alias("kvp"),
        )
        .select(
            "url",
            "host",
            F.substring_index("kvp", "=", 1).alias("param"),
            F.substring_index("kvp", "=", -1).alias("pval"),
        )
    )
    j = kv.join(pg, (kv.host == F.col("_rh")) & (kv.param == F.col("_rp")), "left")
    # CASE-guarded cast (ANSI-safe: AND does not short-circuit casts);
    # a non-integer value yields NULL, and NULL >= cap is NULL => not over
    pval_int = F.when(F.col("pval").rlike(_PAG_INT_RE), F.col("pval").cast("long"))
    over = F.col("_pg").isNotNull() & (pval_int >= cap)
    agg = j.groupBy("url").agg(
        F.min(F.when(over, F.col("param"))).alias("capped_param")
    )
    return noq.unionByName(
        agg.select(
            "url", F.col("capped_param").isNull().alias("admit"), "capped_param"
        )
    )


def politeness_compliance(
    fetches: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Audit the fetch log against the per-host crawl-delay contract →
    ``(host, n_fetches, n_gaps, min_gap_ms, crawl_delay_ms,
    n_violations, compliant)``.

    The politeness bound is the north rule's hard invariant; the
    scheduler *plans* it (`operators/politeness.py`) and the wall-clock
    tests *enforce* it in-process — this is the third leg: a
    post-hoc relational audit over the recorded fetch log, the query an
    operator runs after an incident ("did round 412 actually respect
    example.com's 2 s delay?"). A violation is any same-host
    consecutive gap < ``crawl_delay_ms``. One lag window partitioned by
    host (ordered by timestamp) + one hash aggregate; ``delays`` is
    bounded per-host (broadcast). Hosts with a single fetch have no
    gaps and are vacuously compliant (``min_gap_ms`` NULL).
    """
    w = Window.partitionBy(host_col).orderBy(F.col(ts_col), F.col("url"))
    gaps = fetches.select(
        F.col(host_col).alias("host"),
        "url",
        F.col(ts_col).alias("ts_ms"),
    ).withColumn("gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w))
    d = F.broadcast(delays.select("host", "crawl_delay_ms"))
    return (
        gaps.join(d, "host", "left")
        .groupBy("host", "crawl_delay_ms")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.count("gap_ms").alias("n_gaps"),
            F.min("gap_ms").alias("min_gap_ms"),
            F.sum(
                F.when(F.col("gap_ms") < F.col("crawl_delay_ms"), 1).otherwise(0)
            ).alias("n_violations"),
        )
        .withColumn("compliant", F.col("n_violations") == 0)
        .select(
            "host",
            "n_fetches",
            "n_gaps",
            "min_gap_ms",
            "crawl_delay_ms",
            "n_violations",
            "compliant",
        )
    )


def adaptive_delay_plan(
    fetches: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    ok_col: str = "ok",
    delay_factor_pct: int = 200,
    min_delay_ms: int = 500,
    max_delay_ms: int = 30_000,
    err_escalate_pm: int = 100,
    bin_width: int = 50,
) -> DataFrame:
    """Next-round per-host crawl delay ADAPTED to observed server
    health → ``(host, n_fetches, p95_ms, err_pm, delay_ms)``.

    The reference drains at a fixed per-domain pace (crawler.rs fetch
    loop, 2 req/s); production crawlers (Heritrix's politeness policy
    is the public model) scale the delay with the server's own response
    time — a struggling origin gets backed off, a fast CDN gets the
    floor. The plan here is deterministic integer math so the next
    round's scheduler input is oracle-checkable:

      base     = p95_latency · delay_factor_pct / 100
      escalate = ×2 when the error rate exceeds ``err_escalate_pm``
      delay_ms = clamp(base·escalation, min_delay_ms, max_delay_ms)

    p95 comes from :func:`~netrunner_spark.operators.sketches.
    grouped_hist_quantiles` — the skew-safe per-group histogram
    quantile (a hot host's 10^8 fetch rows collapse to (host, bin)
    counts in ONE hash aggregate; the only window runs over each
    host's ≤ domain/bin_width bins), not a per-host sort. The error
    tally is a second hash aggregate on the same key; the two
    host-level frames join on host (both already partitioned by it).
    """
    from netrunner_spark.operators.sketches import grouped_hist_quantiles

    p95 = (
        grouped_hist_quantiles(
            fetches.select(host_col, latency_col),
            host_col,
            latency_col,
            bin_width=bin_width,
            qs_permille=(950,),
        )
        .select(F.col(host_col).alias("host"), F.col("est_value").alias("p95_ms"))
    )
    health = (
        fetches.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(F.when(F.col(ok_col), 0).otherwise(1)).alias("n_err"),
        )
        .select(
            "host",
            "n_fetches",
            F.expr("CAST(n_err * 1000 div n_fetches AS BIGINT)").alias("err_pm"),
        )
    )
    esc = F.when(F.col("err_pm") > err_escalate_pm, 2).otherwise(1)
    base = F.expr(f"CAST(p95_ms * {delay_factor_pct} div 100 AS BIGINT)")
    return (
        health.join(p95, "host")
        .select(
            "host",
            "n_fetches",
            "p95_ms",
            "err_pm",
            F.least(
                F.lit(max_delay_ms).cast("long"),
                F.greatest(F.lit(min_delay_ms).cast("long"), base * esc),
            ).alias("delay_ms"),
        )
    )


def adaptive_delay_sql(
    src: str,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    ok_col: str = "ok",
    delay_factor_pct: int = 200,
    min_delay_ms: int = 500,
    max_delay_ms: int = 30_000,
    err_escalate_pm: int = 100,
    bin_width: int = 50,
) -> str:
    """DuckDB twin of :func:`adaptive_delay_plan` over source ``src``
    (must provide host, latency and ok columns)."""
    return f"""
WITH f AS ({src}),
bins AS (
  SELECT {host_col} AS host, CAST({latency_col} AS BIGINT) // {bin_width} AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM f GROUP BY 1, 2
), cum AS (
  SELECT host, bin,
         sum(cnt) OVER (PARTITION BY host ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY host) AS total
  FROM bins
), p95 AS (
  SELECT host, CAST(min(bin) * {bin_width} AS BIGINT) AS p95_ms
  FROM cum WHERE cum * 1000 >= 950 * total GROUP BY host
), health AS (
  SELECT {host_col} AS host, CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN {ok_col} THEN 0 ELSE 1 END) * 1000
              // count(*) AS BIGINT) AS err_pm
  FROM f GROUP BY 1
)
SELECT h.host, h.n_fetches, p.p95_ms, h.err_pm,
       least(CAST({max_delay_ms} AS BIGINT),
             greatest(CAST({min_delay_ms} AS BIGINT),
                      CAST(p.p95_ms * {delay_factor_pct} // 100 AS BIGINT)
                      * CASE WHEN h.err_pm > {err_escalate_pm} THEN 2 ELSE 1 END)
       ) AS delay_ms
FROM health h JOIN p95 p ON p.host = h.host
"""
