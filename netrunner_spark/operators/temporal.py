"""Temporal operators Spark lacks as built-ins: gap sessionization,
as-of join, and a bucketed interval (range) join.

These are the time-series half of a log/training-data pipeline
(sessionize clickstreams, stitch each event to the most recent
profile/model snapshot, bucket measurements into windows). All three
are compositions of built-in DataFrame ops — windows, unions, explode
— no UDFs, so Catalyst sees through them (pushdown, AQE, codegen).

Determinism notes (the repo-wide contract): every window orders by
(ts, id) so equal timestamps can never make results run-dependent;
interval arithmetic uses native timestamp + INTERVAL comparison — no
epoch truncation, which engines round differently (that is the parity
bug class the oracle twins would otherwise hit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the inter-event
    gap within a key exceeds `gap_minutes`. Adds ``session_no``
    (1-based per key).

    One shuffle (window on key). At 100 TB the key cardinality (users)
    dwarfs the per-key row count, so the window partitions are small
    and AQE coalesces; a single mega-key (bot traffic) is the skew
    case — cap it upstream with `stratified_sample` or a per-key row
    limit, the same remedy the politeness scheduler applies to hot
    hosts. Streaming twin: `session_window` in Structured Streaming
    gives the same semantics with watermarked state.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(ts_col).over(w)
    brk = (
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTE"))
    ).cast("int")
    return events.withColumn(
        "session_no",
        F.sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the right
    row with the greatest ``right.ts <= left.ts`` for the same key —
    the "most recent snapshot as of this event" join (DuckDB/kdb
    ASOF JOIN; Spark has no built-in).

    Single-shuffle composition: tag right rows 0 / left rows 1, union,
    one window per key ordered by (ts, tag), and carry the last
    non-null right payload forward (`last(..., ignorenulls=True)` over
    an unbounded-preceding frame). Equal timestamps: right sorts
    before left, so a same-instant snapshot IS visible to the event —
    the inclusive (<=) convention, matching DuckDB's ``ASOF JOIN ON
    l.ts >= r.ts``. The right side should be unique per (key, ts)
    (pre-aggregate if not) — otherwise "the" row at a timestamp is
    ill-defined in any engine.

    Scale shape: ONE shuffle on the key for both inputs, no range
    explosion, no broadcast requirement — strictly better than the
    naive inequality join (O(n·m) per key) at any size. Left rows
    with no prior right row keep NULL payloads (left-join semantics).
    """
    rcols = right_value_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in rcols]).alias("_payload"),
    )
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols, F.lit(1).alias("_tag"), F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload")
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_tag") == 1).select(
        *lcols, *[F.col(f"_asof.{c}").alias(c) for c in rcols]
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join: point ∈ [lo, hi) — via the bucketed equi-join
    strategy, not the O(|points|·|intervals|) theta-join Spark would
    otherwise plan (BroadcastNestedLoopJoin).

    Each interval explodes into the coarse buckets it overlaps; each
    point hashes to one bucket; the join is a plain equi-join on
    bucket + a residual filter. With `bucket_width` ≈ the typical
    interval length, each interval lands in ~2 buckets, so the join
    input grows by ~2× instead of cross-product — the standard
    bucketed range-join (what Databricks' range-join hint does under
    the hood). Correct for any width; width only tunes duplication
    vs per-bucket fan-in.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    wlit = F.lit(float(bucket_width))
    pb = points.withColumn("_b", F.floor(F.col(point_col) / wlit).cast("long"))
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / wlit).cast("long"),
                F.floor(F.col(hi_col) / wlit).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "_b")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_b")
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel → ``(stage_idx, stage, n_users)``:
    users whose event stream contains stage₁ < stage₂ < … as a strictly
    time-increasing subsequence (first-touch semantics: each stage
    anchors at its EARLIEST occurrence after the previous anchor —
    the standard product-analytics funnel, and the greedy choice is
    optimal: no later stage₁ anchor can convert a user an earlier one
    cannot).

    Crawl relevance aside (discover → fetch → parse → index is itself
    a funnel over per-URL pipeline events), this is the events-table
    workhorse every analytics engine ships.

    Shape at scale: one filtered aggregate per stage (min ts over the
    stage's events, keyed by user) + one equi-join per stage on the
    user key — stage tables shrink monotonically, and the per-user
    anchor table is ≤ |users| rows. No windows over raw events, no
    per-user sort.
    """
    u, t, c = user_col, ts_col, type_col
    anchors = (
        events.filter(F.col(c) == stages[0])
        .groupBy(u)
        .agg(F.min(t).alias("t0"))
    )
    out_rows = [anchors.select(F.lit(0).alias("stage_idx"), F.col(u))]
    prev, prev_t = anchors, "t0"
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.filter(F.col(c) == stage)
            .join(prev.select(u, prev_t), u)
            .filter(F.col(t) > F.col(prev_t))
            .groupBy(u)
            .agg(F.min(t).alias(f"t{i}"))
        )
        out_rows.append(nxt.select(F.lit(i).alias("stage_idx"), F.col(u)))
        prev, prev_t = nxt, f"t{i}"
    reached = out_rows[0]
    for r in out_rows[1:]:
        reached = reached.unionByName(r)
    stage_names = F.array(*[F.lit(s) for s in stages])
    return (
        reached.groupBy("stage_idx")
        .agg(F.countDistinct(u).alias("n_users"))
        .select(
            "stage_idx",
            F.element_at(stage_names, F.col("stage_idx") + 1).alias("stage"),
            "n_users",
        )
    )


def retention_cohorts(
    events: DataFrame,
    anchor_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention matrix → ``(cohort_day, offset_day, n_users)``:
    users cohorted by their FIRST ``anchor_type`` day, counted on every
    later day they show any activity (offset in days from the anchor).

    The other events-table staple next to :func:`funnel` — and the
    crawl reading is real too: cohort hosts by first-discovery day and
    the matrix shows how long a discovery wave keeps yielding fetches.

    Shape: one filtered min-aggregate (anchor day per user), one
    distinct projection of (user, active day) — both map-side
    combinable — and one user-key join; the output is |cohorts| ×
    |offsets| rows, never event-sized. No windows.
    """
    u, t, c = user_col, ts_col, type_col
    anchor = (
        events.filter(F.col(c) == anchor_type)
        .groupBy(u)
        .agg(F.min(F.to_date(t)).alias("cohort_day"))
    )
    active = events.select(F.col(u), F.to_date(t).alias("day")).dropDuplicates()
    return (
        active.join(anchor, u)
        .filter(F.col("day") >= F.col("cohort_day"))
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("offset_day"),
        )
        .agg(F.countDistinct(u).alias("n_users"))
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user event streams
    → ``(src_type, dst_type, cnt)``: one lag window per user ordered by
    (ts, order_col) — the deterministic tie-break matters for exactness
    — then a hash aggregate over type pairs.

    Per-user window state is bounded by that user's own events (the
    10^10-row table never sorts globally); the output is |types|² rows.
    Session-path analysis, anomaly detection (error-loop hosts), and
    the crawl reading: per-host fetch-status transition rates feed the
    same host_health tiers.
    """

    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("src_type"),
        F.col(type_col).alias("dst_type"),
    ).filter(F.col("src_type").isNotNull())
    return pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def daily_spikes(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
    min_trail_days: int = 3,
    num: int = 15,
    den: int = 10,
) -> DataFrame:
    """Per-type daily volume spikes against a trailing window →
    ``(day, event_type, cnt, trail_sum, trail_days, spike)``.

    spike ⇔ at least ``min_trail_days`` of history AND
    ``cnt · trail_days · den > num · trail_sum`` — i.e. today exceeds
    num/den × the trailing mean, in EXACT integer arithmetic (the
    mean is never materialized, both sides stay int64). The
    error-burst / crawler-trap alarm next to ``host_health``'s level
    tiers: health sees rates, this sees drift against each type's own
    baseline.

    Shape: one daily aggregate (days × types rows — tiny), one
    bounded range self-join (≤ window_days matches per row), one
    aggregate. The raw event table is touched exactly once.
    """
    d = events.groupBy(
        F.to_date(ts_col).alias("day"), F.col(type_col).alias("event_type")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cur, past = d.alias("cur"), d.alias("past")
    trail = (
        cur.join(
            past,
            (F.col("past.event_type") == F.col("cur.event_type"))
            & (F.col("past.day") < F.col("cur.day"))
            & (F.col("past.day") >= F.date_sub(F.col("cur.day"), window_days)),
            "left",
        )
        .groupBy(
            F.col("cur.day").alias("day"),
            F.col("cur.event_type").alias("event_type"),
            F.col("cur.cnt").alias("cnt"),
        )
        .agg(
            F.coalesce(F.sum("past.cnt"), F.lit(0)).alias("trail_sum"),
            F.count("past.cnt").alias("trail_days"),
        )
    )
    return trail.withColumn(
        "spike",
        (F.col("trail_days") >= min_trail_days)
        & (F.col("cnt") * F.col("trail_days") * den > num * F.col("trail_sum")),
    )
