"""Deterministic sampling & split operators for training-data curation.

A 100 TB corpus is never trained on whole: pipelines carve train/val/
test splits, downsample over-represented sources, and cap per-domain /
per-language contributions. Everything here is HASH-deterministic —
membership depends only on the row's own key (never on partitioning,
row order, or cluster size), so a re-run, a resume, or a 4N-executor
re-shard produces the identical sample. That is the property random()
sampling cannot give and the reason `df.sample()` is not used.

The hash is md5 over (salt || key): portable (identical lowercase hex
in Spark, DuckDB, Python hashlib — the oracle twins rely on this),
uniform, and cheap JVM-side. Positions in [0, 1) are realized as the
first 12 hex chars compared LEXICOGRAPHICALLY against precomputed
thresholds — fixed-width lowercase hex compares identically to its
numeric value, so no engine-specific hex→int conversion is needed.

All pure `pyspark.sql.functions` — no UDFs, no shuffles except the
single window partition-by-stratum in `stratified_sample` (one
exchange on the stratum key, the minimum possible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 12 hex chars = 48 bits of md5: collision-free thresholds down to
# sampling rates of 2^-48, far below any practical split fraction
_HEX_WIDTH = 12
_HEX_SPACE = 16**_HEX_WIDTH


def _pos_hex(key_col: str, salt: str):
    """First 12 hex chars of md5(salt || key) — the row's deterministic
    position in [0, 1) as a fixed-width lowercase-hex string. NULL keys
    coalesce to '' so the row still gets a position: concat(salt, NULL)
    is NULL → NULL pos/bucket, and shard_pack's inner offset join then
    silently DROPPED the row from the packed output (r5 review)."""
    return F.substring(
        F.md5(
            F.concat(
                F.lit(salt), F.coalesce(F.col(key_col).cast("string"), F.lit(""))
            )
        ),
        1,
        _HEX_WIDTH,
    )


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative [0,1) thresholds as fixed-width hex strings. The LAST
    split is the catch-all (no threshold) so float rounding can never
    drop a row. Returns [(name, upper_hex_or_None), ...] in order."""
    names = list(fractions)
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, format(min(int(cum * _HEX_SPACE), _HEX_SPACE - 1), f"0{_HEX_WIDTH}x")))
    out.append((names[-1], None))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label (train/val/test by
    default). Pure projection — zero shuffles, fully pushdown-friendly;
    at 100 TB this is a map-only pass. A row's split depends only on
    (salt, key): stable under re-runs, resumes, and corpus growth
    (new rows never move old rows between splits).

    Reference parity note: the reference has no sampling layer; this is
    part of the training-data-pipeline surface the Spark engine adds.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    pos = _pos_hex(key_col, salt)
    expr = None
    for name, upper in split_thresholds(fractions):
        if upper is None:
            expr = expr.otherwise(F.lit(name)) if expr is not None else F.lit(name)
        elif expr is None:
            expr = F.when(pos < upper, F.lit(name))
        else:
            expr = expr.when(pos < upper, F.lit(name))
    return df.withColumn("split", expr)


def rate_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows by key hash.
    Map-only (filter pushes to the scan); membership is stable across
    runs and monotone in `rate` (raising the rate only ADDS rows —
    nested samples for scaling-law curves come free)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    thr = format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), f"0{_HEX_WIDTH}x")
    if rate >= 1.0:
        return df
    return df.filter(_pos_hex(key_col, salt) < thr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """At most `n_per_stratum` rows per stratum (language, domain,
    source...), chosen by hash order with the key as tie-break — a
    deterministic uniform sample within each stratum, exact quota.

    One shuffle (window partitioned by stratum). Skew note: a hot
    stratum (one language = 40% of a 100 TB corpus) lands on one
    task for ranking — but only the TOP-n_per_stratum of each partition
    survive, so pre-aggregation via a per-partition rank-and-prune
    would be the next step if a stratum's raw rows overflow a task;
    for quota ≪ stratum size the window's sort is the cost, and AQE
    skew-split handles the imbalance. Adds `rk` (1-based rank within
    stratum) so callers can post-filter to smaller quotas for free.
    """

    w = Window.partitionBy(stratum_col).orderBy(
        _pos_hex(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_stratum)
    )


def stratified_sample_skewsafe(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "strat",
    n_buckets: int = 32,
) -> DataFrame:
    """`stratified_sample` with the hot-stratum fix its docstring
    promises: per-partition rank-and-prune BEFORE the global rank.

    Phase 1 ranks within (stratum, hash-bucket) — n_buckets ways — and
    keeps only the top n_per_stratum of each, so the phase-2 global
    rank per stratum sees at most n_buckets × n_per_stratum rows
    instead of the raw stratum. A 40%-of-corpus language that would
    dump 10^10 rows on one window task is pruned 10^10 → ≤ 32·n in a
    salted (skew-free) first pass.

    Output is IDENTICAL to `stratified_sample` (asserted in tests):
    every global top-n row ranks ≤ n inside its own bucket, so phase 1
    never drops a survivor, and phase 2 recomputes the same total
    order (hash position, then key). Same oracle SQL applies.
    """

    pos = _pos_hex(key_col, salt)
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    w_local = Window.partitionBy(stratum_col, bucket).orderBy(
        pos.asc(), F.col(key_col).asc()
    )
    pruned = (
        df.withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= n_per_stratum)
        .drop("_lrk")
    )
    w_global = Window.partitionBy(stratum_col).orderBy(
        pos.asc(), F.col(key_col).asc()
    )
    return (
        pruned.withColumn("rk", F.row_number().over(w_global))
        .filter(F.col("rk") <= n_per_stratum)
    )


def budget_cap(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    cost_col: str,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Cap each stratum's total COST (tokens, chars, bytes) at `budget`
    instead of its row count — the per-domain token cap a training mix
    applies so no single host dominates (C4/RefinedWeb-style).

    Rows are admitted in deterministic hash order (position, then key —
    the same total order as `stratified_sample`, so re-runs and
    resumes admit the identical prefix) while the INCLUSIVE running
    sum of `cost_col` stays ≤ budget. A single over-budget first row
    is dropped, never truncated — document atomicity.

    → input columns + (cum_cost, rk). One shuffle (window on the
    stratum). Monotone in `budget`: raising it only ADDS rows, so
    nested mixes for scaling-law ladders reuse the same pass.
    """

    w = Window.partitionBy(stratum_col).orderBy(
        _pos_hex(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn(
            "cum_cost",
            F.sum(F.col(cost_col).cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("cum_cost") <= budget)
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Pretraining sequence packing — the concat-and-slice plan → one
    row per doc: ``(doc_id, n_tokens, bucket, seq_id, start_offset)``.

    LLM pretraining concatenates documents and slices the stream into
    fixed ``context_len``-token windows; a doc belongs to the window
    where it STARTS (``seq_id``) at ``start_offset`` tokens in, possibly
    spilling into the next windows. Packing a 10^10-doc corpus as ONE
    stream would serialize on a global cumsum, so the stream is split
    into ``n_buckets`` independent sub-streams by the house md5-prefix
    hash (deterministic: membership depends only on doc_id) — each
    bucket packs with its own running total, exactly how a distributed
    packer shards the work. Within a bucket, docs are ordered by id, so
    the layout is reproducible run-to-run and engine-to-engine.

    ``seq_id`` = bucket · 2^32 + windows-before-this-doc (int64-safe up
    to 4 G windows per bucket). One window per bucket (bounded
    partitions), everything else map-side.
    """
    toks = F.size(
        F.filter(F.split(F.lower(F.col(text_col)), pattern), lambda t: t != "")
    ).cast("long")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % n_buckets
    )
    base = docs.select(
        F.col(id_col), toks.alias("n_tokens"), bucket.alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "n_tokens",
        "bucket",
        (F.col("bucket") * F.lit(2**32) + F.floor(cum / context_len))
        .cast("long")
        .alias("seq_id"),
        (cum % context_len).cast("long").alias("start_offset"),
    )


def mixture_plan(
    docs: DataFrame,
    targets: DataFrame,
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Training-mix planning (the Pile/Dolma recipe step) → one row per
    source: ``(source, n_docs, n_tokens, target_permille,
    target_tokens, repeat_permille)``.

    ``targets`` is the desired mixture ``(source, target_permille)``
    summing to ≤1000; ``token_budget`` is the total training tokens.
    ``repeat_permille`` = 1000 · target_tokens / available_tokens — the
    epochs-over-this-source dial: 1000 means exactly one pass, >1000
    upsampling (the source repeats), <1000 downsampling (feed a
    hash-sampled subset, :func:`rate_sample`). Exact integer
    arithmetic; sources missing from ``targets`` get 0. One hash
    aggregate over the corpus + a broadcast join against the
    bounded targets table.
    """
    toks = F.size(
        F.filter(F.split(F.lower(F.col(text_col)), pattern), lambda t: t != "")
    ).cast("long")
    per_src = docs.select(F.col(source_col).alias("source"), toks.alias("t")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("n_tokens"))
    t = targets.select(
        F.col("source"), F.col("target_permille").cast("long").alias("target_permille")
    )
    j = per_src.join(F.broadcast(t), "source", "left").withColumn(
        "target_permille", F.coalesce("target_permille", F.lit(0))
    )
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        "target_permille",
        F.expr(f"CAST({token_budget} * target_permille DIV 1000 AS BIGINT)").alias(
            "target_tokens"
        ),
        F.expr(
            f"CAST({token_budget} * target_permille DIV 1000 * 1000 DIV n_tokens AS BIGINT)"
        ).alias("repeat_permille"),
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a :func:`mixture_plan` → ``(doc_id, source, copy)``,
    one row per training-stream copy of each document.

    ``repeat_permille`` splits into whole epochs (every doc emits
    ``repeat DIV 1000`` copies) plus a fractional epoch realized as a
    HASH-deterministic per-doc lottery: the doc joins the extra epoch
    iff ``md5(salt‖id) % 1000 < repeat % 1000`` — so the achieved
    token count converges on the target while membership stays a pure
    function of (salt, doc_id), re-run/re-shard stable like
    :func:`hash_split`. Docs from zero-weight sources vanish
    (explode of an empty copy array).

    Plan is per-source (bounded) → broadcast; the explode multiplies
    rows by the epoch count — callers bound that by choosing the token
    budget, exactly as a real mixture does.
    """
    p = plan.select(
        F.col(source_col),
        # integer DIV, not float `/`-then-cast: the module's exact-
        # integer contract (mixture_plan uses DIV 1000 for the same
        # quantity; float rounding near int64 range could mint an
        # extra epoch, r5 review)
        F.expr("repeat_permille DIV 1000").alias("_full"),
        (F.col("repeat_permille") % 1000).cast("long").alias("_frac"),
    )
    lottery = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    j = docs.select(id_col, source_col).join(F.broadcast(p), source_col)
    copies = (F.col("_full") + F.when(lottery < F.col("_frac"), 1).otherwise(0)).cast(
        "long"
    )
    return (
        j.withColumn("_n", copies)
        .select(
            id_col,
            source_col,
            F.explode(
                F.when(F.col("_n") > 0, F.sequence(F.lit(0), F.col("_n") - 1))
                .otherwise(F.array().cast("array<bigint>"))
            ).alias("copy"),
        )
    )
