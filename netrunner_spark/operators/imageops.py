"""Relational image-corpus curation: the JVM-side half of the image
payload (codec/pixel UDFs live in ``netrunner_spark.images``).

A 100 TB image+caption crawl (BASELINE.json input_hint: image_id,
bytes, w, h, fmt, caption, phash) is curated almost entirely on the
METADATA columns — resolution/aspect/format gates, caption hygiene,
shard packing, phash dedup keepers. None of that needs pixel access,
so every operator here is a pure ``pyspark.sql.functions`` plan
(zero Python in the hot path); the binary column is never read.

Role analogs, not ports: the reference crawler caches image bytes +
captions (netrunner stores page/media payloads per URL hash) but has
no curation layer — these are the LAION/DataComp-style operators a
training mix applies downstream of the crawl cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netrunner_spark.operators.sampling import _pos_hex

# Canonical aspect-ratio ladder (SDXL-style multi-AR training buckets,
# (w, h) at ~1 MPx). Shared with the DuckDB oracle via
# `aspect_bucket_sql_case` so both engines pick from the SAME table.
AR_BUCKETS: list[tuple[int, int]] = [
    (512, 2048),
    (640, 1536),
    (768, 1344),
    (896, 1152),
    (1024, 1024),
    (1152, 896),
    (1344, 768),
    (1536, 640),
    (2048, 512),
]


def quality_gate(
    images: DataFrame,
    min_w: int = 64,
    min_h: int = 64,
    min_bytes: int = 256,
    ar_min: float = 0.25,
    ar_max: float = 4.0,
    formats: tuple[str, ...] = ("png", "jpeg"),
    min_caption_chars: int = 5,
    max_caption_chars: int = 2048,
) -> DataFrame:
    """LAION-style admission gate over image METADATA → input columns +
    ``(pass, reject_reason)``.

    ``reject_reason`` is the FIRST failing gate in a fixed precedence
    (format > too_small > too_few_bytes > aspect > caption) so the
    tally is deterministic and re-runs bucket rejects identically.

    Aspect bounds are evaluated as integer cross-products
    (``w * ar_den ≥/≤ h * ar_num``) — no float division, so the DuckDB
    twin computes bit-identical booleans. `ar_min`/`ar_max` must be
    exactly representable as small rationals (they are: 1/4 and 4/1
    by default); pass custom bounds as floats that are n/d with d ≤ 100.

    Map-only: one projection, no shuffle, pushes the scan down to the
    metadata columns (the multi-GB ``bytes`` column is pruned).
    """
    ar_min_n, ar_min_d = _as_ratio(ar_min)
    ar_max_n, ar_max_d = _as_ratio(ar_max)
    # every gate coalesces NULL → False (r5 review): a NULL fmt/w/h/
    # n_bytes made ~ok NULL, the when-branch skipped, and the row
    # PASSED the whitelist — unknown metadata must reject, not admit
    fmt_ok = F.coalesce(F.col("fmt").isin(*formats), F.lit(False))
    size_ok = F.coalesce(
        (F.col("w") >= min_w) & (F.col("h") >= min_h), F.lit(False)
    )
    bytes_ok = F.coalesce(F.col("n_bytes") >= min_bytes, F.lit(False))
    # ar = w/h;  ar >= ar_min  ⟺  w * ar_min_d >= h * ar_min_n
    ar_ok = F.coalesce(
        (F.col("w") * ar_min_d >= F.col("h") * ar_min_n)
        & (F.col("w") * ar_max_d <= F.col("h") * ar_max_n),
        F.lit(False),
    )
    cap_len = F.length(F.col("caption"))
    cap_ok = (
        F.col("caption").isNotNull()
        & (cap_len >= min_caption_chars)
        & (cap_len <= max_caption_chars)
    )
    reason = (
        F.when(~fmt_ok, F.lit("format"))
        .when(~size_ok, F.lit("too_small"))
        .when(~bytes_ok, F.lit("too_few_bytes"))
        .when(~ar_ok, F.lit("aspect"))
        .when(~cap_ok, F.lit("caption"))
        .otherwise(F.lit(None).cast("string"))
    )
    return images.withColumn("reject_reason", reason).withColumn(
        "pass", F.col("reject_reason").isNull()
    )


def _as_ratio(x: float, max_den: int = 100) -> tuple[int, int]:
    """Exact small-rational form of an aspect bound (n, d)."""
    from fractions import Fraction

    f = Fraction(x).limit_denominator(max_den)
    if float(f) != x:
        raise ValueError(f"aspect bound {x} is not a small rational")
    return f.numerator, f.denominator


def _bucket_cost_sq(w_col, h_col, bw: int, bh: int):
    """Integer-exact squared log-AR distance surrogate.

    argmin |log(w/h) - log(bw/bh)| = argmin over buckets of the
    cross-ratio max(w*bh, h*bw) / min(w*bh, h*bw)  (both sides of the
    log are monotone). Comparing two buckets i, j:
        max_i/min_i < max_j/min_j  ⟺  max_i * min_j < max_j * min_i
    — pure int64 products, no floats, so Spark and DuckDB agree
    exactly. Ties break to the SMALLER bucket index (fixed iteration
    order below).
    """
    a = w_col * bh
    b = h_col * bw
    return F.greatest(a, b), F.least(a, b)


def aspect_bucket(images: DataFrame, buckets: list[tuple[int, int]] | None = None) -> DataFrame:
    """Assign every image to its nearest aspect-ratio training bucket →
    input columns + ``(bucket_w, bucket_h)``.

    Multi-AR training (SDXL-style) batches images of like aspect so the
    resize-to-bucket crop is minimal; the assignment is the curation
    step, the resize itself is :func:`netrunner_spark.images.resize_to`.

    Nearest = min |log AR ratio|, computed with integer cross-products
    only (see ``_bucket_cost_sq``) so the DuckDB twin
    (:func:`aspect_bucket_sql_case`) is bit-identical. Map-only
    projection — the CASE ladder is O(len(buckets)) comparisons per
    row, whole-stage-codegen'd, no shuffle.
    """
    bks = buckets or AR_BUCKETS
    # clamp dims to [1, 2^20]: the cross-ratio comparison multiplies two
    # (dim × bucket-dim) products, so garbage metadata beyond ~2^20 px
    # overflowed int64 — silent wrap in non-ANSI Spark, an error in the
    # DuckDB twin (r5 review). Within the clamp the products stay
    # ≤ 2^62; both engines clamp identically so sane inputs are
    # bit-identical to before.
    w_col = F.least(
        F.greatest(F.col("w").cast("bigint"), F.lit(1)), F.lit(1 << 20)
    )
    h_col = F.least(
        F.greatest(F.col("h").cast("bigint"), F.lit(1)), F.lit(1 << 20)
    )
    best_w, best_h = F.lit(bks[0][0]), F.lit(bks[0][1])
    best_max, best_min = _bucket_cost_sq(w_col, h_col, *bks[0])
    for bw, bh in bks[1:]:
        cand_max, cand_min = _bucket_cost_sq(w_col, h_col, bw, bh)
        better = cand_max * best_min < best_max * cand_min
        best_w = F.when(better, F.lit(bw)).otherwise(best_w)
        best_h = F.when(better, F.lit(bh)).otherwise(best_h)
        new_max = F.when(better, cand_max).otherwise(best_max)
        new_min = F.when(better, cand_min).otherwise(best_min)
        best_max, best_min = new_max, new_min
    return images.withColumn("bucket_w", best_w).withColumn("bucket_h", best_h)


def aspect_bucket_sql_case(buckets: list[tuple[int, int]] | None = None) -> str:
    """The DuckDB twin of :func:`aspect_bucket`'s argmin ladder, built
    from the SAME bucket table so the two engines cannot drift.

    Emits a ``list_reduce`` left-fold over (bmax, bmin, bw, bh) structs
    using the identical strict integer cross-product comparison (and
    the identical iteration order) as the Spark ladder — ties keep the
    earlier bucket in both engines. The expression references columns
    ``w`` and ``h``; select ``(...).bw, (...).bh`` from it.
    """
    bks = buckets or AR_BUCKETS
    # identical clamp to the Spark ladder (overflow guard, r5 review)
    cw = "least(greatest(CAST(w AS BIGINT), 1), 1048576)"
    ch = "least(greatest(CAST(h AS BIGINT), 1), 1048576)"
    rows = ", ".join(
        "{bmax: greatest(%s * %d, %s * %d), bmin: least(%s * %d, %s * %d), "
        "bw: %d, bh: %d, i: %d}" % (cw, bh, ch, bw, cw, bh, ch, bw, bw, bh, i)
        for i, (bw, bh) in enumerate(bks)
    )
    # exact rational comparison via cross-multiplied sort key is not a
    # single scalar; DuckDB's list_sort is lexicographic on struct
    # fields, so sort on (bmax * <lcm-free> ...) cannot be exact.
    # Instead: argmin over the list with list_reduce and the SAME
    # integer cross-product comparison the Spark ladder uses.
    return (
        "list_reduce([" + rows + "], (acc, x) -> CASE WHEN "
        "x.bmax * acc.bmin < acc.bmax * x.bmin THEN x ELSE acc END)"
    )


def boilerplate_captions(images: DataFrame, max_caption_df: int = 100) -> DataFrame:
    """Flag images whose EXACT caption repeats more than
    ``max_caption_df`` times corpus-wide → input + ``(caption_df,
    boilerplate)``.

    LAION-style hygiene: "image", "logo", "photo" captions carry no
    supervision signal; a caption shared by 10^6 images is navigation
    boilerplate, not a description. One hash aggregate on a 64-bit
    caption digest + a join back that REUSES the aggregate's
    partitioning (same key) — one shuffle total, and the join side is
    the tiny over-threshold set, broadcast.
    """
    # coalesce NULL captions to one sentinel key (r5 review):
    # xxhash64(NULL) is NULL and the equi-join back never matches, so
    # a million caption-less images each reported caption_df=1 — the
    # rows with the LEAST supervision signal are exactly the ones the
    # hygiene filter must see as one hot group
    digest = F.xxhash64(F.coalesce(F.col("caption"), F.lit(""))).alias(
        "cap_key"
    )
    hot = (
        images.select(digest)
        .groupBy("cap_key")
        .agg(F.count(F.lit(1)).alias("caption_df"))
        .filter(F.col("caption_df") > max_caption_df)
    )
    return (
        images.withColumn(
            "cap_key", F.xxhash64(F.coalesce(F.col("caption"), F.lit("")))
        )
        .join(F.broadcast(hot), "cap_key", "left")
        .withColumn("boilerplate", F.col("caption_df").isNotNull())
        # caption_df is tracked only ABOVE the threshold (the hot set is
        # what keeps the join broadcastable); below it the df is NULL =
        # unknown. The old coalesce-to-1 stamped a confidently WRONG
        # df=1 on every sub-threshold caption (r5 review).
        .drop("cap_key")
    )


def shard_pack(
    df: DataFrame,
    key_col: str,
    cost_col: str,
    shard_bytes: int,
    n_buckets: int = 256,
    salt: str = "shard",
) -> DataFrame:
    """WebDataset-style shard assignment: pack rows into consecutive
    size-bounded shards in a deterministic global order → input +
    ``(pack_pos, shard_id)``.

    The training-side consumer of this corpus reads fixed-size tar
    shards; the packing rule is the standard straddle-free running
    split: rows ordered by a deterministic hash position, shard_id =
    floor(exclusive_prefix_sum(cost) / shard_bytes). A shard may
    overrun by < one row's cost (rows are atomic), never underfill
    except the tail.

    100 TB shape — the naive form is ONE global window (a single
    partition doing a 10^10-row running sum: driver-killer). This
    implementation is the distributed prefix-sum:

      1. bucket = a short md5-hex prefix of (salt.b || key) — up to 256
         values; the canonical global order is (bucket, pos_in_bucket),
         bucket-major, so a global prefix decomposes into per-bucket
         offsets + local sums. md5-hex (not xxhash64) so the DuckDB
         oracle twin computes the identical order.
      2. per-bucket totals: one B-row aggregate, cumulated into
         exclusive offsets with a tiny B-row window, broadcast back.
      3. local exclusive prefix via a window PARTITIONED by bucket
         (B-way parallel, each partition 1/B of the data).

    Equality with the single-window form over the same (bucket, pos)
    order is asserted in tests — the skew-safe plan IS the spec.
    """
    if n_buckets not in (16, 256):
        raise ValueError("n_buckets must be 16 or 256 (md5-hex prefix width)")
    hex_width = 1 if n_buckets == 16 else 2
    pos = _pos_hex(key_col, salt)
    keyed = df.withColumn("_pos", pos).withColumn(
        "_bucket",
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ".b"),
                    # NULL key → '' (same policy as _pos_hex): a NULL
                    # bucket never equi-joined the offsets table and
                    # the row vanished from the packed output
                    F.coalesce(F.col(key_col).cast("string"), F.lit("")),
                )
            ),
            1,
            hex_width,
        ),
    )
    totals = keyed.groupBy("_bucket").agg(F.sum(cost_col).alias("_btotal"))
    # B rows: exclusive running offset per bucket (tiny window — B ≤ 256)
    off_w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_boffset", F.coalesce(F.sum("_btotal").over(off_w), F.lit(0))
    ).select("_bucket", "_boffset")
    local_w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_pos").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        keyed.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "pack_pos",
            F.col("_boffset") + F.coalesce(F.sum(cost_col).over(local_w), F.lit(0)),
        )
        .withColumn("shard_id", F.floor(F.col("pack_pos") / shard_bytes))
        .drop("_pos", "_bucket", "_boffset")
    )


def pair_alignment(
    pairs: DataFrame,
    threshold_pct: int = 30,
    img_col: str = "img_vec",
    cap_col: str = "cap_vec",
    scale: int = 100,
) -> DataFrame:
    """CLIP-style image↔caption alignment gate over embedding pairs →
    ``(pair columns) + (dot_q, img_norm2, cap_norm2, aligned)``.

    The DataComp/LAION admission rule "keep pairs with CLIP cosine ≥ t"
    — here over pre-computed embedding columns (the encoder itself is
    a model-serving concern, out of engine scope). Works entirely in
    quantized int64 arithmetic so the oracle is hash-exact:

        cos ≥ t  ⟺  dot ≥ 0  ∧  dot² · 100² ≥ t_pct² · |a|² · |b|²

    with a, b quantized to int(round(x · scale)). No sqrt, no floats.
    Overflow check: dim 64, |x| ≤ ~3 → dot ≤ 64·(3·100)² ≈ 5.8e6;
    dot²·10⁴ ≈ 3.3e17 < 2⁶³. Keep `scale` ≤ 100 for dim ≤ 128.

    Plan: zip_with + aggregate (JVM higher-order functions, no UDF) —
    map-only over the joined pair table.
    """
    q = lambda c: F.transform(F.col(c), lambda x: F.round(x * scale).cast("bigint"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda s, v: s + v
        )

    with_q = pairs.withColumn("_qa", q(img_col)).withColumn("_qb", q(cap_col))
    out = (
        with_q.withColumn("dot_q", dot(F.col("_qa"), F.col("_qb")))
        .withColumn("img_norm2", dot(F.col("_qa"), F.col("_qa")))
        .withColumn("cap_norm2", dot(F.col("_qb"), F.col("_qb")))
        .withColumn(
            "aligned",
            # zero-norm guard: an all-zero quantized vector (encoder
            # failure sentinel / sub-quantum magnitudes) made 0 ≥ 0
            # pass at ANY threshold — exactly the pairs with no
            # alignment signal sailed through the gate (r5 review)
            (F.col("img_norm2") > 0)
            & (F.col("cap_norm2") > 0)
            & (F.col("dot_q") >= 0)
            & (
                F.col("dot_q") * F.col("dot_q") * (100 * 100)
                >= F.lit(threshold_pct * threshold_pct) * F.col("img_norm2") * F.col("cap_norm2")
            ),
        )
        .drop("_qa", "_qb")
    )
    return out


def multimodal_dup_pairs(
    images: DataFrame,
    max_band_df: int = 8,
    max_image_id: int | None = None,
) -> DataFrame:
    """Multimodal duplicate candidates: image pairs whose CAPTIONS are
    MinHash-LSH near-dups AND whose raster dims/format agree exactly —
    the LAION-style "same asset re-hosted under a paraphrased alt-text"
    detector. Either signal alone over-fires (stock captions repeat
    across unrelated images; 512×512 jpeg matches everything); the
    conjunction is the high-precision pre-filter that decides which
    pairs are worth a byte-level phash/PSNR verify (``images.psnr_udf``
    / ``hamming_near_dups`` on the stored phash).

    → (image_a, image_b, w, h, fmt). Caption pairing delegates to
    ``textops.minhash_lsh_pairs`` with its band-bucket DF cap, so the
    quadratic-bucket guard carries over; the dims check is two hash
    equi-joins on image_id (the pair table is orders smaller than the
    corpus, and the join keys are the ids the lake is already bucketed
    by). The binary column is never read.
    """
    from netrunner_spark.operators import textops

    docs = images.select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
    )
    pairs = textops.minhash_lsh_pairs(
        docs, max_doc_id=max_image_id, max_band_df=max_band_df
    )
    dims = images.select("image_id", "w", "h", "fmt")
    dims_b = dims.select(
        F.col("image_id").alias("doc_b"),
        F.col("w").alias("w_b"),
        F.col("h").alias("h_b"),
        F.col("fmt").alias("fmt_b"),
    )
    return (
        pairs.join(dims.withColumnRenamed("image_id", "doc_a"), "doc_a")
        .join(dims_b, "doc_b")
        .filter(
            (F.col("w") == F.col("w_b"))
            & (F.col("h") == F.col("h_b"))
            & (F.col("fmt") == F.col("fmt_b"))
        )
        .select(
            F.col("doc_a").alias("image_a"),
            F.col("doc_b").alias("image_b"),
            "w",
            "h",
            "fmt",
        )
    )


# Magic-byte prefixes (hex, uppercase) -> MIME. The crawl stores payloads
# as opaque binary; Content-Type headers lie (misconfigured origins,
# mislabeled CDN caches), so the cache audit sniffs the leading bytes —
# the same first check `images.decode_check_udf` makes before spending
# decode time.
MAGIC_PREFIXES = (
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
    ("3C21444F", "text/html"),
    ("3C68746D", "text/html"),
)


def sniff_mime(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Magic-byte MIME detection over a binary column → input +
    ``mime`` (``application/octet-stream`` when nothing matches).

    Pure projection: hex the first 8 payload bytes (JVM builtin) and
    prefix-match the magic table — zero UDFs, zero shuffles, and the
    bytes column is read only for its first bytes (Parquet still loads
    the page, but nothing crosses to Python). The claimed-vs-sniffed
    mismatch matrix is the image-axis integrity audit: a "jpeg" row
    carrying a PNG magic is a mislabeled payload the resize stage
    would otherwise reject at full decode cost.
    """
    head = F.upper(F.hex(F.substring(F.col(bytes_col), 1, 8)))
    mime = None
    for prefix, label in MAGIC_PREFIXES:
        cond = head.startswith(prefix)
        mime = F.when(cond, label) if mime is None else mime.when(cond, label)
    return df.withColumn("mime", mime.otherwise("application/octet-stream"))


def caption_consensus(
    images: DataFrame,
    group_col: str = "content_key",
    caption_col: str = "caption",
    id_col: str = "image_id",
) -> DataFrame:
    """Canonical-caption election for duplicate-image groups →
    ``(<id>, <group>, <caption>, canon_caption, n_copies, n_captions,
    agrees)``.

    The same image bytes recur across mirrors/CDNs with DIFFERENT alt
    texts (reference cache dedups bytes by content hash, archive.rs
    content_hash; the caption side is left ambiguous). A training pair
    wants ONE caption per distinct image: the election is majority
    caption per content group, ties broken by shorter length then
    lexicographic order — fully deterministic, so the DuckDB twin is
    exact.

    Scale shape: captions collapse to (group, caption, votes) by ONE
    hash aggregate (map-side combine eats the per-image fan-in), the
    winner window runs over each group's DISTINCT captions (bounded by
    caption variety, not copies — a 10^6-copy boilerplate image is
    still a handful of variant rows), and the winner table joins back
    on the group key reusing the aggregate's partitioning. No
    image-bytes column is ever touched.
    """

    votes = (
        images.groupBy(F.col(group_col).alias("grp"), F.col(caption_col).alias("cap"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    # nulls LAST explicitly (r5 review): Spark ASC defaults nulls
    # first, DuckDB defaults nulls last — a vote tie involving a NULL
    # caption elected different winners per engine, breaking the
    # bit-identical-twin contract. A NULL caption should never beat a
    # real one anyway. length(NULL) is NULL too, so both keys pin it.
    w = Window.partitionBy("grp").orderBy(
        F.col("votes").desc(),
        F.length("cap").asc_nulls_last(),
        F.col("cap").asc_nulls_last(),
    )
    grp_w = Window.partitionBy("grp")
    winners = (
        votes.withColumn("rk", F.row_number().over(w))
        .withColumn("n_captions", F.count(F.lit(1)).over(grp_w))
        # copies per group = Σ votes — computed over the VARIANT rows,
        # never a window over the raw per-copy table (hot-image skew)
        .withColumn("n_copies", F.sum("votes").over(grp_w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("grp"),
            F.col("cap").alias("canon_caption"),
            "n_copies",
            "n_captions",
        )
    )
    return (
        images.select(id_col, group_col, caption_col)
        .join(winners, F.col(group_col) == F.col("grp"))
        .select(
            id_col,
            group_col,
            caption_col,
            "canon_caption",
            "n_copies",
            "n_captions",
            (F.col(caption_col) == F.col("canon_caption")).alias("agrees"),
        )
    )


def caption_consensus_sql(
    src: str,
    group_col: str = "content_key",
    caption_col: str = "caption",
    id_col: str = "image_id",
) -> str:
    """DuckDB twin of :func:`caption_consensus` over source ``src``
    (must provide id, group and caption columns)."""
    return f"""
WITH imgs AS ({src}),
votes AS (
  SELECT {group_col} AS grp, {caption_col} AS cap,
         CAST(count(*) AS BIGINT) AS votes
  FROM imgs GROUP BY 1, 2
), winners AS (
  SELECT grp, cap AS canon_caption,
         CAST(sum(votes) OVER (PARTITION BY grp) AS BIGINT) AS n_copies,
         CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n_captions,
         row_number() OVER (
           PARTITION BY grp
           ORDER BY votes DESC, length(cap) ASC, cap ASC
         ) AS rk
  FROM votes
)
SELECT s.{id_col}, s.{group_col}, s.{caption_col},
       w.canon_caption, w.n_copies, w.n_captions,
       s.{caption_col} = w.canon_caption AS agrees
FROM imgs s JOIN winners w ON w.grp = s.{group_col} AND w.rk = 1
"""
