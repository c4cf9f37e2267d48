"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps SURVEY.md §2 operators (plus the training-data
pipeline ops) onto the driver's testdata tables; every compared output
uses EXACT arithmetic (int64 counts/cents/quantized hashes) so the
DuckDB oracle hash-matches regardless of float summation order.

Crawl-shaped operators are exercised on the `events` table reinterpreted
as a frontier log: user_id → host, event_id → page, ts → enqueue time.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


# Schema memo for the testdata tables (r6 optimization): a bare
# spark.read.parquet() re-reads footers to infer the schema on EVERY
# call — measured 75 ms/call warm vs 8.8 ms with an explicit schema,
# and the bench constructs ~500 readers per run. This caches METADATA
# only (the StructType per file path); every action still scans the
# parquet files, so no results or data are memoized. The testdata
# tables are immutable per path (deterministic generator).
_SCHEMA_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


# A synthetic URL per event: the crawl-shaped queries run over this.
def _event_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.concat(
            F.lit("https://host"),
            (F.col("user_id") % 20).cast("string"),
            F.lit(".test/"),
            F.col("event_type"),
            F.lit("/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
    )


_EVENT_URL_SQL = (
    "concat('https://host', CAST(user_id % 20 AS VARCHAR), '.test/', "
    "event_type, '/', CAST(event_id AS VARCHAR))"
)

# Pinned query batch for bm25_search — mirrored literally in the
# oracle's VALUES clause; terms drawn from the synthetic corpus vocab.
_BM25_QUERIES = [
    (1, "spark join window"),
    (2, "merge sort batch"),
    (3, "customer table scan"),
]

# Shared oracle CTE pieces: exact-int BM25 for _BM25_QUERIES,
# parameterized over (source CTE, id column, text column); the body
# ends in `ranked(query_id, <idc>, score_q, rk)`.
_BM25_Q_VALUES = """q(query_id, query) AS (
      VALUES (1, 'spark join window'),
             (2, 'merge sort batch'),
             (3, 'customer table scan')
    )"""


def _bm25_body(src: str, idc: str, txt: str) -> str:
    return f"""tok AS (
      SELECT {idc}, token FROM (
        SELECT {idc},
               unnest(regexp_split_to_array(lower({txt}), '[^a-z]+')) AS token
        FROM {src}
      ) WHERE token <> ''
    ), tf AS (
      SELECT {idc}, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY {idc}, token
    ), dl AS (
      SELECT {idc}, CAST(count(*) AS BIGINT) AS dl
      FROM tok GROUP BY {idc}
    ), stats AS (
      SELECT CAST(sum(dl) AS BIGINT) AS tt,
             CAST(count(*) AS BIGINT) AS nd FROM dl
    ), dft AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
    ), qt AS (
      SELECT DISTINCT query_id, token FROM (
        SELECT query_id,
               unnest(regexp_split_to_array(lower(query), '[^a-z]+')) AS token
        FROM q
      ) WHERE token <> ''
    ), qw AS (
      SELECT qt.query_id, qt.token,
             ((s.nd - d.df) * 2000 + 1000) // (2 * d.df + 1) AS idf_q,
             s.tt, s.nd
      FROM qt JOIN dft d USING (token) CROSS JOIN stats s
    ), contrib AS (
      SELECT qw.query_id, tf.{idc},
             (qw.idf_q * 44 * tf.tf * qw.tt)
               // (20 * tf.tf * qw.tt + 6 * qw.tt + 18 * dl.dl * qw.nd) AS c
      FROM tf JOIN qw USING (token) JOIN dl USING ({idc})
    ), scored AS (
      SELECT query_id, {idc}, CAST(sum(c) AS BIGINT) AS score_q
      FROM contrib GROUP BY query_id, {idc}
    ), ranked AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id
        ORDER BY score_q DESC, {idc} ASC) AS INT) AS rk
      FROM scored
    )"""


_BM25_CTE = (
    "WITH "
    + _BM25_Q_VALUES
    + ", "
    + _bm25_body("documents", "doc_id", "text")
    + "\n"
)


# Deterministic image-metadata view over documents — the input_hint's
# (image_id, w, h, fmt, caption, n_bytes) shape, derived via md5 so the
# DuckDB twin (_IMG_CTE) reproduces it bit-exactly. Captions are the
# document texts (exact caption dups exist by construction).
def _image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")

    def hx(salt: str, width: int):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, width
            ),
            16,
            10,
        ).cast("bigint")

    fmt_sel = hx("imf", 1) % 3
    return d.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(32) + hx("imw", 2) * 8).cast("int").alias("w"),
        (F.lit(32) + hx("imh", 2) * 8).cast("int").alias("h"),
        F.when(fmt_sel == 0, "png")
        .when(fmt_sel == 1, "jpeg")
        .otherwise("gif")
        .alias("fmt"),
        (F.col("n_chars") * 19 + hx("imb", 2)).alias("n_bytes"),
        F.col("text").alias("caption"),
    )


_IMG_CTE = """
WITH img AS (
  SELECT doc_id AS image_id,
         CAST(32 + CAST('0x' || substr(md5('imw' || CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) * 8 AS INT) AS w,
         CAST(32 + CAST('0x' || substr(md5('imh' || CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) * 8 AS INT) AS h,
         CASE CAST('0x' || substr(md5('imf' || CAST(doc_id AS VARCHAR)), 1, 1) AS BIGINT) % 3
              WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
         n_chars * 19 + CAST('0x' || substr(md5('imb' || CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS n_bytes,
         text AS caption
  FROM documents
)
"""


def _crawl_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic crawl-cache slice (host, url, content_hash) derived
    from events, exercising every crawl-intelligence signal at once:
    8 hosts where pairs (h0,h1)(h2,h3)(h4,h5)(h6,h7) mirror pages 1-2,
    page 0 is global boilerplate served by every host, pages 3-4 are
    host-unique; every URL carries a content-irrelevant ``sess`` param
    and a content-relevant ``sort`` param; events with event_id%13==0
    land on a ``trap.test`` host whose extra unique ``cal`` param mints
    unbounded URLs over 10 content hashes (a calendar trap)."""
    ev = _t(spark, sf_dir, "events")
    hid = (F.col("user_id") % 8).cast("string")
    page = (F.col("event_id") % 5).cast("string")
    sess = (F.col("event_id") % 3).cast("string")
    srt = (F.col("event_id") % 2).cast("string")
    is_trap = F.col("event_id") % 13 == 0
    host = F.when(is_trap, F.lit("trap.test")).otherwise(
        F.concat(F.lit("h"), hid, F.lit(".test"))
    )
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit("/p/"),
        page,
        F.lit("?sess="),
        sess,
        F.lit("&sort="),
        srt,
        F.when(
            is_trap, F.concat(F.lit("&cal="), F.col("event_id").cast("string"))
        ).otherwise(F.lit("")),
    )
    mirror_group = F.expr("CAST((user_id % 8) DIV 2 AS STRING)")
    chash = F.md5(
        F.when(is_trap, F.concat(F.lit("t-"), page, F.lit("-"), srt))
        .when(F.col("event_id") % 5 == 0, F.concat(F.lit("common-"), srt))
        .when(
            F.col("event_id") % 5 <= 2,
            F.concat(F.lit("m-"), mirror_group, F.lit("-"), page, F.lit("-"), srt),
        )
        .otherwise(F.concat(F.lit("u-"), hid, F.lit("-"), page, F.lit("-"), srt))
    )
    return ev.select(
        host.alias("host"), url.alias("url"), chash.alias("content_hash")
    )


_PAGES_CTE = """
pages AS (
  SELECT CASE WHEN event_id % 13 = 0 THEN 'trap.test'
              ELSE 'h' || CAST(user_id % 8 AS VARCHAR) || '.test' END AS host,
         'https://'
           || CASE WHEN event_id % 13 = 0 THEN 'trap.test'
                   ELSE 'h' || CAST(user_id % 8 AS VARCHAR) || '.test' END
           || '/p/' || CAST(event_id % 5 AS VARCHAR)
           || '?sess=' || CAST(event_id % 3 AS VARCHAR)
           || '&sort=' || CAST(event_id % 2 AS VARCHAR)
           || CASE WHEN event_id % 13 = 0
                   THEN '&cal=' || CAST(event_id AS VARCHAR) ELSE '' END AS url,
         md5(CASE WHEN event_id % 13 = 0
                  THEN 't-' || CAST(event_id % 5 AS VARCHAR) || '-' || CAST(event_id % 2 AS VARCHAR)
                  WHEN event_id % 5 = 0
                  THEN 'common-' || CAST(event_id % 2 AS VARCHAR)
                  WHEN event_id % 5 <= 2
                  THEN 'm-' || CAST((user_id % 8) // 2 AS VARCHAR) || '-'
                       || CAST(event_id % 5 AS VARCHAR) || '-' || CAST(event_id % 2 AS VARCHAR)
                  ELSE 'u-' || CAST(user_id % 8 AS VARCHAR) || '-'
                       || CAST(event_id % 5 AS VARCHAR) || '-' || CAST(event_id % 2 AS VARCHAR)
             END) AS content_hash
  FROM events
)
"""


def _path_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-shape synth for the template miner: /item/<event_id> is an
    unbounded id space over 7 content hashes (flags as unbounded),
    /cat/<n>/list is a bounded 5-page route, /u/<16-hex> exercises the
    <h> rewrite rule. Twin: _PATHPAGES_CTE."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.expr(
            "concat('https://h', CAST(user_id % 4 AS STRING), '.test',"
            " CASE CAST(event_id % 3 AS INT)"
            " WHEN 0 THEN concat('/item/', CAST(event_id AS STRING))"
            " WHEN 1 THEN concat('/cat/', CAST(event_id % 5 AS STRING), '/list')"
            " ELSE concat('/u/', substring(md5(concat('s',"
            "   CAST(event_id % 9 AS STRING))), 1, 16)) END)"
        ).alias("url"),
        F.md5(
            F.expr(
                "CASE CAST(event_id % 3 AS INT)"
                " WHEN 0 THEN concat('i-', CAST(event_id % 7 AS STRING))"
                " WHEN 1 THEN concat('c-h', CAST(user_id % 4 AS STRING), '-',"
                "   CAST(event_id % 5 AS STRING))"
                " ELSE concat('u-', CAST(event_id % 9 AS STRING)) END"
            )
        ).alias("content_hash"),
    )


# Shared twin pieces for the template family: the pathpages synth and the
# host/template projection, used verbatim by BOTH the url_templates and
# template_cap_apply oracles so the apply twin cannot drift from the miner.
_PATHPAGES_CTE = """pathpages AS (
  SELECT 'https://h' || CAST(user_id % 4 AS VARCHAR) || '.test'
           || CASE event_id % 3
              WHEN 0 THEN '/item/' || CAST(event_id AS VARCHAR)
              WHEN 1 THEN '/cat/' || CAST(event_id % 5 AS VARCHAR) || '/list'
              ELSE '/u/' || substr(md5('s' || CAST(event_id % 9 AS VARCHAR)), 1, 16)
              END AS url,
         md5(CASE event_id % 3
             WHEN 0 THEN 'i-' || CAST(event_id % 7 AS VARCHAR)
             WHEN 1 THEN 'c-h' || CAST(user_id % 4 AS VARCHAR) || '-'
                         || CAST(event_id % 5 AS VARCHAR)
             ELSE 'u-' || CAST(event_id % 9 AS VARCHAR) END) AS content_hash
  FROM events
)"""

_TMPL_T_CTE = """t AS (
  SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         array_to_string(list_transform(string_split(
             CASE WHEN p = '' THEN '/' ELSE p END, '/'),
             s -> CASE WHEN regexp_full_match(s, '[0-9]+') THEN '<n>'
                       WHEN regexp_full_match(s, '[0-9a-f]{8,}') THEN '<h>'
                       ELSE s END), '/') AS template,
         url, content_hash
  FROM (SELECT url, content_hash,
               regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)?', 1) AS p
        FROM pathpages)
)"""

_TMPL_G_CTE = """g AS (
  SELECT host, template,
         CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT content_hash) AS BIGINT) AS n_hashes
  FROM t GROUP BY host, template
)"""


_TRI_CTE_CHAIN = """und AS (
  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
  FROM raw WHERE x <> y
), deg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und
  ) GROUP BY id
), o AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS s,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS d
  FROM und JOIN deg du ON du.id = und.u JOIN deg dv ON dv.id = und.v
), w AS (
  SELECT a.s AS s, a.d AS d1, b.d AS d2
  FROM o a JOIN o b ON a.s = b.s AND a.d < b.d
), t AS (
  SELECT w.s AS a, w.d1 AS b, w.d2 AS c
  FROM w JOIN und ON und.u = w.d1 AND und.v = w.d2
), tri AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS id FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
  GROUP BY id
)"""


def _kcore_sql(rounds: int = 4, k: int = 2) -> str:
    """DuckDB twin of graph.k_core over the ring+chord+pendant-chain
    synth: one degree CTE + one keep CTE + one surviving-edge CTE per
    peel round, unrolled. The operator loops to the FIXPOINT; the twin
    unrolls ``rounds`` ≥ the synth's peel depth (2), and extra rounds
    are identity on a converged edge set, so the two always agree."""
    parts = [
        """WITH raw AS (
  SELECT CASE (event_id // 30) % 4
         WHEN 0 THEN event_id % 30
         WHEN 1 THEN event_id % 30
         WHEN 2 THEN (event_id % 30) % 10
         ELSE 200 + (event_id % 30) % 10 END AS x,
         CASE (event_id // 30) % 4
         WHEN 0 THEN (event_id % 30 + 1) % 30
         WHEN 1 THEN (event_id % 30 + 2) % 30
         WHEN 2 THEN 200 + (event_id % 30) % 10
         ELSE 230 + (event_id % 30) % 10 END AS y
  FROM events
), c0 AS (
  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
  FROM raw WHERE x <> y
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", d{i} AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM ("
            f"SELECT u AS id FROM c{i - 1} UNION ALL SELECT v AS id FROM c{i - 1}"
            f") GROUP BY id)"
        )
        parts.append(f", k{i} AS (SELECT id FROM d{i} WHERE deg >= {k})")
        parts.append(
            f", c{i} AS (SELECT c.u, c.v FROM c{i - 1} c"
            f" JOIN k{i} a ON a.id = c.u JOIN k{i} b ON b.id = c.v)"
        )
    parts.append(
        f"SELECT id, CAST(count(*) AS BIGINT) AS deg FROM ("
        f"SELECT u AS id FROM c{rounds} UNION ALL SELECT v AS id FROM c{rounds}"
        f") GROUP BY id"
    )
    return "\n".join(parts)


def _bowtie_sql(levels: int = 12) -> str:
    """DuckDB twin of graph.bowtie over the ring+chains synth: one
    settled-union CTE per level per direction, unrolled past the
    graph's diameter (9); extra levels are identity on a converged
    closure."""
    parts = [
        """WITH e AS (
  SELECT DISTINCT
    CASE (event_id // 10) % 5
      WHEN 0 THEN event_id % 10
      WHEN 1 THEN CASE event_id % 2 WHEN 0 THEN 20 ELSE 21 END
      WHEN 2 THEN CASE event_id % 2 WHEN 0 THEN 5 ELSE 30 END
      WHEN 3 THEN 40 ELSE 21 END AS src,
    CASE (event_id // 10) % 5
      WHEN 0 THEN (event_id % 10 + 1) % 10
      WHEN 1 THEN CASE event_id % 2 WHEN 0 THEN 21 ELSE 0 END
      WHEN 2 THEN CASE event_id % 2 WHEN 0 THEN 30 ELSE 31 END
      WHEN 3 THEN 41 ELSE 50 END AS dst
  FROM events
), f0 AS (SELECT CAST(0 AS BIGINT) AS id),
   b0 AS (SELECT CAST(0 AS BIGINT) AS id)"""
    ]
    for i in range(1, levels + 1):
        parts.append(
            f", f{i} AS (SELECT DISTINCT id FROM (SELECT id FROM f{i - 1}"
            f" UNION ALL SELECT e.dst FROM f{i - 1} f JOIN e ON e.src = f.id))"
        )
        parts.append(
            f", b{i} AS (SELECT DISTINCT id FROM (SELECT id FROM b{i - 1}"
            f" UNION ALL SELECT e.src FROM b{i - 1} b JOIN e ON e.dst = b.id))"
        )
    parts.append(
        f""", n AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))
SELECT n.id,
  CASE WHEN f.id IS NOT NULL AND b.id IS NOT NULL THEN 'scc'
       WHEN b.id IS NOT NULL THEN 'in'
       WHEN f.id IS NOT NULL THEN 'out'
       ELSE 'other' END AS component
FROM n LEFT JOIN f{levels} f ON f.id = n.id
       LEFT JOIN b{levels} b ON b.id = n.id"""
    )
    return "\n".join(parts)


def _bfs_sql(max_hops: int = 6) -> str:
    """DuckDB twin of graph.bfs_hops over the 50-node ring with seeds
    {0, 25}: one frontier CTE (new nodes this level, anti-joined against
    the settled set) + one settled CTE per level, unrolled exactly like
    the operator's level-synchronous joins."""
    parts = [
        "WITH e AS (SELECT DISTINCT event_id % 50 AS src,"
        " (event_id % 50 + 1) % 50 AS dst FROM events)",
        ", d0 AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),"
        " (25, 0)) AS t(id, hops))",
        ", f0 AS (SELECT id FROM d0)",
    ]
    for h in range(1, max_hops + 1):
        parts.append(
            f", f{h} AS (SELECT DISTINCT e.dst AS id"
            f" FROM f{h - 1} f JOIN e ON e.src = f.id"
            f" ANTI JOIN d{h - 1} d ON d.id = e.dst)"
        )
        parts.append(
            f", d{h} AS (SELECT id, hops FROM d{h - 1}"
            f" UNION ALL SELECT id, CAST({h} AS BIGINT) AS hops FROM f{h})"
        )
    parts.append(f"SELECT id, hops FROM d{max_hops}")
    return "\n".join(parts)


_RING50_EDGE_PARTS = [
    "WITH e AS (SELECT DISTINCT CAST(event_id % 50 AS BIGINT) AS src,"
    " CAST((event_id % 50 + 1) % 50 AS BIGINT) AS dst FROM events)",
    ", nodes AS (SELECT DISTINCT src AS id FROM e"
    " UNION SELECT DISTINCT dst AS id FROM e)",
]


def _pair_closure_parts(edge_parts: list, iters: int) -> list:
    """Append the unrolled exact-ball pair closure p0..p{iters} to an
    edge/nodes CTE prefix — ONE generator for every closure twin, so
    the 'identical expressions' guarantee can't drift between
    copies."""
    parts = list(edge_parts) + [
        ", p0 AS (SELECT id, id AS member FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f", p{t} AS (SELECT DISTINCT id, member FROM ("
            f"SELECT e.src AS id, p.member FROM e"
            f" JOIN p{t - 1} p ON p.id = e.dst"
            f" UNION ALL SELECT id, member FROM p{t - 1}))"
        )
    return parts


def _hyperball_parts(
    iters: int, p: int, salt: str, edge_parts: list | None = None
) -> list[str]:
    """Shared CTE prefix for the HyperBall twins over the 50-node
    directed ring (the bfs_hops topology): the identical md5-52 hash,
    bucket split, and generated bit-length CASE as
    operators/graph.py:_hyperball_r0, then one unrolled CTE per round
    — each round is the IDENTICAL register-wise max-merge (edges ⋈
    registers on dst, union, group-by max), so the match is exact
    int64, no float tolerance."""
    from netrunner_spark.operators.sketches import _bitlen_case

    m, rest_bits = 1 << p, 52 - p
    rmax = rest_bits + 1
    case = _bitlen_case("rest", rest_bits)
    h = _md5_52("CAST(id AS VARCHAR)", salt)
    parts = list(edge_parts or _RING50_EDGE_PARTS) + [
        f", hh AS (SELECT id, {h} AS h FROM nodes)",
        f", sp AS (SELECT id, h % {m} AS bucket, h // {m} AS rest FROM hh)",
        f", r0 AS (SELECT id, bucket, CAST({rmax} - {case} AS INT) AS rho"
        " FROM sp)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f", r{t} AS (SELECT id, bucket, CAST(max(rho) AS INT) AS rho"
            " FROM ("
            f"SELECT e.src AS id, r.bucket, r.rho FROM e"
            f" JOIN r{t - 1} r ON r.id = e.dst"
            f" UNION ALL SELECT id, bucket, rho FROM r{t - 1}"
            ") GROUP BY id, bucket)"
        )
    return parts


def _hyperball_sql(iters: int = 3, p: int = 4, salt: str = "hb") -> str:
    """DuckDB twin of graph.hyperball_registers → (id, bucket, rho)."""
    parts = _hyperball_parts(iters, p, salt)
    parts.append(f"SELECT id, bucket, rho FROM r{iters}")
    return "\n".join(parts)


def _hyperball_nf_sql(iters: int = 3, p: int = 4, salt: str = "hb") -> str:
    """DuckDB twin of graph.hyperball_nf → (id, t, nonzero_buckets,
    denom): per round, count occupied registers and the exact integer
    harmonic denominator Σ 2^(rmax−rho) with empty buckets contributing
    2^rmax — pure int64 in both engines (denom ≤ m·2^rmax < 2^63)."""
    m = 1 << p
    rmax = 52 - p + 1
    parts = _hyperball_parts(iters, p, salt)
    levels = [
        f"SELECT id, CAST({t} AS INT) AS t,"
        " CAST(count(*) AS BIGINT) AS nonzero_buckets,"
        f" CAST(sum(CAST(1 AS BIGINT) << ({rmax} - rho))"
        f" + ({m} - count(*)) * (CAST(1 AS BIGINT) << {rmax}) AS BIGINT)"
        f" AS denom FROM r{t} GROUP BY id"
        for t in range(iters + 1)
    ]
    parts.append("\nUNION ALL ".join(levels))
    return "\n".join(parts)


def _ball_sizes_sql(iters: int = 3) -> str:
    """DuckDB twin of graph.ball_sizes_exact over the 50-node ring →
    (id, t, ball): the exact pair closure unrolled per level, the
    diagnostic HyperBall exists to replace (kept small-scale for
    accuracy evaluation)."""
    parts = _pair_closure_parts(_RING50_EDGE_PARTS, iters)
    levels = [
        f"SELECT id, CAST({t} AS INT) AS t, CAST(count(*) AS BIGINT) AS ball"
        f" FROM p{t} GROUP BY id"
        for t in range(iters + 1)
    ]
    parts.append("\nUNION ALL ".join(levels))
    return "\n".join(parts)


_RICH_EDGE_PARTS = [
    "WITH e AS (SELECT DISTINCT src, dst FROM ("
    "SELECT CAST(event_id % 20 AS BIGINT) AS src,"
    " CAST((event_id + 1) % 20 AS BIGINT) AS dst FROM events"
    " UNION ALL"
    " SELECT CAST(event_id % 20 AS BIGINT),"
    " CAST((event_id + 7) % 20 AS BIGINT) FROM events"
    " WHERE event_id % 4 = 0))",
    ", nodes AS (SELECT DISTINCT src AS id FROM e"
    " UNION SELECT DISTINCT dst AS id FROM e)",
]


def _rich_closure_parts(iters: int) -> list[str]:
    """Unrolled exact-ball pair closure over the ring-20 + chord
    topology (ring edges for every event, +7 chords for event_id%4==0
    nodes) — multi-hop variety so harmonic centrality genuinely
    differs across nodes. Identical expressions to the Spark query."""
    parts = _pair_closure_parts(_RICH_EDGE_PARTS, iters)
    for t in range(iters + 1):
        parts.append(
            f", b{t} AS (SELECT id, CAST(count(*) AS BIGINT) AS ball"
            f" FROM p{t} GROUP BY id)"
        )
    return parts


def _harmonic_sql(iters: int = 3) -> str:
    """DuckDB twin of graph.harmonic_centrality_exact → (id, hc6):
    lcm-scaled Σ Δball/t, exact int64 in both engines."""
    import math

    lcm = math.lcm(*range(1, iters + 1))
    parts = _rich_closure_parts(iters)
    terms = " + ".join(
        f"{lcm // t} * (b{t}.ball - b{t - 1}.ball)"
        for t in range(1, iters + 1)
    )
    joins = " ".join(f"JOIN b{t} USING (id)" for t in range(1, iters + 1))
    parts.append(
        f"SELECT id, CAST({terms} AS BIGINT) AS hc{lcm} FROM b0 {joins}"
    )
    return "\n".join(parts)


def _nf_exact_sql(iters: int = 3) -> str:
    """DuckDB twin of graph.neighborhood_function_exact →
    (t, nf_pairs, frac_e6)."""
    parts = _rich_closure_parts(iters)
    levels = " UNION ALL ".join(
        f"SELECT CAST({t} AS INT) AS t,"
        f" CAST(sum(ball) AS BIGINT) AS nf_pairs FROM b{t}"
        for t in range(iters + 1)
    )
    parts.append(f", nf AS ({levels})")
    parts.append(
        f", tot AS (SELECT nf_pairs AS nf_total FROM nf WHERE t = {iters})"
    )
    parts.append(
        "SELECT t, nf_pairs,"
        " CAST(1000000 * nf_pairs // nf_total AS BIGINT) AS frac_e6"
        " FROM nf CROSS JOIN tot"
    )
    return "\n".join(parts)


def _md5_52(expr: str, salt: str) -> str:
    """The engines' shared 52-bit hash as DuckDB SQL text —
    CAST(first 13 md5 hex chars AS BIGINT), same as
    sketches.md5_hash52."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || {expr}), 1, 13) AS BIGINT)"
    )


def _walk_parts(
    walk_len: int = 4, walks_per_node: int = 2, salt: str = "rw"
) -> list[str]:
    """CTE prefix shared by the walk twins: the ring-20 + chord edges
    plus one CTE per step — each the identical argmin-of-md5 next-hop
    pick (ROW_NUMBER ordered by score, dst = the struct-min the Spark
    side takes) — ending with a `walks` CTE of (walk_id, step, node)."""
    ws = ", ".join(f"({w})" for w in range(walks_per_node))
    parts = list(_RICH_EDGE_PARTS) + [
        f", c0 AS (SELECT id * {walks_per_node} + w AS walk_id,"
        f" id AS node FROM nodes CROSS JOIN (VALUES {ws}) AS t(w))",
    ]
    for i in range(1, walk_len + 1):
        score = _md5_52(
            "CAST(c.walk_id AS VARCHAR) || '#' ||"
            f" '{i}' || '#' || CAST(e.dst AS VARCHAR)",
            salt,
        )
        parts.append(
            f", c{i} AS (SELECT walk_id, dst AS node FROM ("
            f"SELECT c.walk_id, e.dst, ROW_NUMBER() OVER ("
            f"PARTITION BY c.walk_id ORDER BY {score}, e.dst) AS rn"
            f" FROM c{i - 1} c JOIN e ON e.src = c.node"
            ") WHERE rn = 1)"
        )
    levels = " UNION ALL ".join(
        f"SELECT walk_id, CAST({i} AS INT) AS step, node FROM c{i}"
        for i in range(walk_len + 1)
    )
    parts.append(f", walks AS ({levels})")
    return parts


def _random_walks_sql(
    walk_len: int = 4, walks_per_node: int = 2, salt: str = "rw"
) -> str:
    """DuckDB twin of graph.random_walks over the ring-20 + chord
    topology → (walk_id, step, node)."""
    parts = _walk_parts(walk_len, walks_per_node, salt)
    parts.append("SELECT walk_id, step, node FROM walks")
    return "\n".join(parts)


def _skipgram_sql(
    window: int = 2,
    walk_len: int = 4,
    walks_per_node: int = 2,
    salt: str = "rw",
) -> str:
    """DuckDB twin of graph.skipgram_pairs over the same walk corpus →
    (center, context, n_pairs)."""
    parts = _walk_parts(walk_len, walks_per_node, salt)
    parts.append(
        "SELECT a.node AS center, b.node AS context,"
        " CAST(count(*) AS BIGINT) AS n_pairs"
        " FROM walks a JOIN walks b ON a.walk_id = b.walk_id"
        f" AND a.step <> b.step AND abs(a.step - b.step) <= {window}"
        " GROUP BY a.node, b.node"
    )
    return "\n".join(parts)


def _reach_budget_sql(total: int = 997, p: int = 4, iters: int = 2) -> str:
    """DuckDB twin of the reach_budget_alloc loop: HyperBall nf at
    t=iters over the ring-20 + chord host graph → integer reach weight
    (m·2^rmax − denom, shifted 30 bits so total·weight stays deep
    inside int64) → the same largest-remainder apportionment as
    crawl_budget_alloc."""
    m = 1 << p
    rmax = 52 - p + 1
    cap = m * (1 << rmax)
    parts = _hyperball_parts(iters, p, "hb", edge_parts=_RICH_EDGE_PARTS)
    parts.append(
        f", nf AS (SELECT id,"
        f" CAST(sum(CAST(1 AS BIGINT) << ({rmax} - rho))"
        f" + ({m} - count(*)) * (CAST(1 AS BIGINT) << {rmax}) AS BIGINT)"
        f" AS denom FROM r{iters} GROUP BY id)"
    )
    parts.append(
        ", nv AS (SELECT 'h' || CAST(id AS VARCHAR) AS host,"
        f" CAST(({cap} - denom) // {1 << 30} AS BIGINT) AS reach_w FROM nf)"
    )
    parts.append(
        f""", sh AS (
  SELECT host, reach_w AS weight,
         sum(reach_w) OVER () AS s_tot,
         CAST(CASE WHEN sum(reach_w) OVER () = 0 THEN 0
              ELSE {total} * reach_w // sum(reach_w) OVER () END AS BIGINT) AS fl,
         CAST(CASE WHEN sum(reach_w) OVER () = 0 THEN 0
              ELSE {total} * reach_w % sum(reach_w) OVER () END AS BIGINT) AS rem
  FROM nv
), r AS (
  SELECT *, CASE WHEN s_tot = 0 THEN 0 ELSE {total} - sum(fl) OVER () END AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
  FROM sh
)
SELECT host, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r"""
    )
    return "\n".join(parts)


def _neighbor_sample_sql(k: int = 3, salt: str = "ns") -> str:
    """DuckDB twin of graph.neighbor_sample over the ring-20 + chord
    topology → (src, dst, rk)."""
    score = _md5_52(
        "CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR)", salt
    )
    return "\n".join(
        list(_RICH_EDGE_PARTS)
        + [
            ", rk AS (SELECT src, dst, CAST(ROW_NUMBER() OVER ("
            f"PARTITION BY src ORDER BY {score}, dst) AS INT) AS rk"
            " FROM e)",
            f"SELECT src, dst, rk FROM rk WHERE rk <= {k}",
        ]
    )


def _lpa_sql(iters: int = 3) -> str:
    """DuckDB twin of graph.label_propagation_int over the two-ring
    community topology, generated per iteration: each synchronous round
    is one vote CTE (count neighbor labels) + one winner CTE (top count,
    min-label tie-break) + one relabel CTE (isolated nodes keep their
    own) — the identical integer recurrence, so the match is exact."""
    parts = [
        """
WITH nodes AS (SELECT DISTINCT event_id % 30 AS n FROM events),
ed AS (
  SELECT n AS src, (n // 15) * 15 + ((n % 15) + 1) % 15 AS dst FROM nodes
  UNION
  SELECT n, (n // 15) * 15 + ((n % 15) + 2) % 15 FROM nodes
  UNION
  SELECT CAST(14 AS BIGINT), CAST(15 AS BIGINT)
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM ed WHERE src <> dst
    UNION SELECT dst, src FROM ed WHERE src <> dst
  )
),
l0 AS (SELECT DISTINCT src AS id, src AS community FROM und)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
v{i} AS (
  SELECT e.dst AS v, l.community, count(*) AS c
  FROM und e JOIN l{i - 1} l ON l.id = e.src
  GROUP BY e.dst, l.community
), p{i} AS (
  SELECT v, community FROM (
    SELECT v, community,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, community ASC) AS rn
    FROM v{i}) WHERE rn = 1
), l{i} AS (
  SELECT o.id, coalesce(p.community, o.community) AS community
  FROM l{i - 1} o LEFT JOIN p{i} p ON p.v = o.id
)"""
        )
    parts.append(f"\nSELECT id, community FROM l{iters}")
    return "".join(parts)


def _kmeans_sql(k: int = 4, iters: int = 2, select: str | None = None) -> str:
    """DuckDB twin of vectors.kmeans_int, generated for a fixed
    iteration count: each Lloyd's round is one assignment CTE (argmin
    exact-int squared-L2, ties → smaller cid) + one update CTE
    (element-wise integer mean via `//`, which truncates toward zero
    exactly like Spark's `div`). ``select`` overrides the final SELECT
    over the ``afinal(vec_id, qe, cid, d)`` assignment CTE so
    compositions (cluster-balanced sampling, kmeans-trained IVF) can
    reuse the generated Lloyd's body."""

    def assign(csrc: str, name: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, qe, cid, d FROM (
        SELECT vec_id, qe, cid, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (
          SELECT q.vec_id, q.qe, c.cid,
                 list_reduce(list_transform(generate_series(1, len(q.qe)),
                     i -> (q.qe[i] - c.cq[i]) * (q.qe[i] - c.cq[i])),
                     (x, y) -> x + y) AS d
          FROM q CROSS JOIN {csrc} c
        )
      ) WHERE rn = 1
    )"""

    parts = [
        f"""WITH q AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
      FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cid, qe AS cq FROM q WHERE vec_id < {k}
    )"""
    ]
    for t in range(iters):
        parts.append(assign(f"c{t}", f"a{t}"))
        parts.append(
            f"""c{t + 1} AS (
      SELECT cid, list(m ORDER BY pos) AS cq FROM (
        SELECT cid, pos, CAST(sum(v) // count(*) AS BIGINT) AS m FROM (
          SELECT cid, unnest(generate_series(1, len(qe))) AS pos,
                 unnest(qe) AS v
          FROM a{t}
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""
        )
    parts.append(assign(f"c{iters}", "afinal"))
    final = select or "SELECT vec_id, cid, d AS dist_q FROM afinal"
    return ", ".join(parts) + "\n" + final


def _pq_sql(
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    sub: int = 16,
    n_queries: int = 10,
    k: int = 5,
    train_pred: str | None = None,
) -> str:
    """DuckDB twin of vectors.pq_topk, generated: per subspace a
    Lloyd's codebook block (same template as _kmeans_sql on sliced
    lists), then argmin encoding, per-query distance tables, and the
    ADC sum via per-subspace cid joins. ``train_pred`` restricts
    CODEBOOK TRAINING to a subset (PQIndex's build half) while
    encoding and query tables still span the full corpus — the
    index's train-once/encode-everything contract."""

    def dist(b: str, c: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, len({b}.qe)),"
            f" i -> ({b}.qe[i] - {c}.cq[i]) * ({b}.qe[i] - {c}.cq[i])),"
            " (x, y) -> x + y)"
        )

    parts = [
        """WITH q AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
      FROM embeddings
    )"""
    ]
    for j in range(m):
        parts.append(
            f"q{j} AS (SELECT vec_id, qe[{j * sub + 1}:{(j + 1) * sub}] AS qe FROM q)"
        )
        tsrc = f"q{j}"
        if train_pred is not None:
            parts.append(
                f"qt{j} AS (SELECT * FROM q{j} WHERE {train_pred})"
            )
            tsrc = f"qt{j}"
        parts.append(
            f"c{j}x0 AS (SELECT vec_id AS cid, qe AS cq FROM {tsrc} WHERE vec_id < {ks})"
        )
        for t in range(iters):
            parts.append(
                f"""a{j}x{t} AS (
      SELECT vec_id, qe, cid FROM (
        SELECT vec_id, qe, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, b.qe, c.cid, {dist('b', 'c')} AS d
              FROM {tsrc} b CROSS JOIN c{j}x{t} c)
      ) WHERE rn = 1
    )"""
            )
            parts.append(
                f"""c{j}x{t + 1} AS (
      SELECT cid, list(mm ORDER BY pos) AS cq FROM (
        SELECT cid, pos, CAST(sum(v) // count(*) AS BIGINT) AS mm FROM (
          SELECT cid, unnest(generate_series(1, len(qe))) AS pos,
                 unnest(qe) AS v
          FROM a{j}x{t}
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""
            )
        parts.append(
            f"""e{j} AS (
      SELECT vec_id, cid AS code{j} FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {dist('b', 'c')} AS d
              FROM q{j} b CROSS JOIN c{j}x{iters} c)
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""dt{j} AS (
      SELECT b.vec_id AS query_id, c.cid, {dist('b', 'c')} AS d
      FROM q{j} b CROSS JOIN c{j}x{iters} c WHERE b.vec_id < {n_queries}
    )"""
        )
    enc_joins = " JOIN ".join(
        ["e0"] + [f"e{j} USING (vec_id)" for j in range(1, m)]
    )
    parts.append(
        "enc AS (SELECT vec_id, "
        + ", ".join(f"code{j}" for j in range(m))
        + f" FROM {enc_joins})"
    )
    dt_joins = " ".join(
        f"JOIN dt{j} ON dt{j}.cid = enc.code{j}"
        + (" AND dt{j}.query_id = dt0.query_id".format(j=j) if j else "")
        for j in range(m)
    )
    adist = " + ".join(f"dt{j}.d" for j in range(m))
    parts.append(
        f"""scored AS (
      SELECT dt0.query_id, enc.vec_id AS neighbor_id,
             CAST({adist} AS BIGINT) AS adist_q
      FROM enc {dt_joins}
      WHERE enc.vec_id != dt0.query_id
    )"""
    )
    return (
        ", ".join(parts)
        + f"""
    SELECT query_id, neighbor_id, adist_q, rn AS rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id
        ORDER BY adist_q ASC, neighbor_id ASC) AS INT) AS rn
      FROM scored
    ) WHERE rn <= {k}"""
    )


def _ivfpq_sql(
    n_cells: int = 4,
    nprobe: int = 2,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    sub: int = 16,
    n_queries: int = 10,
    k: int = 5,
) -> str:
    """DuckDB twin of vectors.ivfpq_topk: the coarse Lloyd's blocks on
    the FULL vectors (cells + query probes) prepended to the _pq_sql
    per-subspace blocks, with candidate generation restricted to the
    probed cells before the ADC joins."""

    def dist(b: str, c: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, len({b}.qe)),"
            f" i -> ({b}.qe[i] - {c}.cq[i]) * ({b}.qe[i] - {c}.cq[i])),"
            " (x, y) -> x + y)"
        )

    parts = [
        """WITH q AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
      FROM embeddings
    )"""
    ]
    # coarse quantizer on the full vectors
    parts.append(
        f"gc0 AS (SELECT vec_id AS cid, qe AS cq FROM q WHERE vec_id < {n_cells})"
    )
    for t in range(iters):
        parts.append(
            f"""ga{t} AS (
      SELECT vec_id, qe, cid FROM (
        SELECT vec_id, qe, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, b.qe, c.cid, {dist('b', 'c')} AS d
              FROM q b CROSS JOIN gc{t} c)
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""gc{t + 1} AS (
      SELECT cid, list(mm ORDER BY pos) AS cq FROM (
        SELECT cid, pos, CAST(sum(v) // count(*) AS BIGINT) AS mm FROM (
          SELECT cid, unnest(generate_series(1, len(qe))) AS pos,
                 unnest(qe) AS v
          FROM ga{t}
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""
        )
    parts.append(
        f"""cells AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {dist('b', 'c')} AS d
              FROM q b CROSS JOIN gc{iters} c)
      ) WHERE rn = 1
    )"""
    )
    parts.append(
        f"""gprobe AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {dist('b', 'c')} AS d
              FROM q b CROSS JOIN gc{iters} c WHERE b.vec_id < {n_queries})
      ) WHERE rn <= {nprobe}
    )"""
    )
    # per-subspace PQ blocks (same template as _pq_sql)
    for j in range(m):
        parts.append(
            f"q{j} AS (SELECT vec_id, qe[{j * sub + 1}:{(j + 1) * sub}] AS qe FROM q)"
        )
        parts.append(
            f"c{j}x0 AS (SELECT vec_id AS cid, qe AS cq FROM q{j} WHERE vec_id < {ks})"
        )
        for t in range(iters):
            parts.append(
                f"""a{j}x{t} AS (
      SELECT vec_id, qe, cid FROM (
        SELECT vec_id, qe, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, b.qe, c.cid, {dist('b', 'c')} AS d
              FROM q{j} b CROSS JOIN c{j}x{t} c)
      ) WHERE rn = 1
    )"""
            )
            parts.append(
                f"""c{j}x{t + 1} AS (
      SELECT cid, list(mm ORDER BY pos) AS cq FROM (
        SELECT cid, pos, CAST(sum(v) // count(*) AS BIGINT) AS mm FROM (
          SELECT cid, unnest(generate_series(1, len(qe))) AS pos,
                 unnest(qe) AS v
          FROM a{j}x{t}
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""
            )
        parts.append(
            f"""e{j} AS (
      SELECT vec_id, cid AS code{j} FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT b.vec_id, c.cid, {dist('b', 'c')} AS d
              FROM q{j} b CROSS JOIN c{j}x{iters} c)
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""dt{j} AS (
      SELECT b.vec_id AS query_id, c.cid, {dist('b', 'c')} AS d
      FROM q{j} b CROSS JOIN c{j}x{iters} c WHERE b.vec_id < {n_queries}
    )"""
        )
    enc_joins = " JOIN ".join(
        ["e0"] + [f"e{j} USING (vec_id)" for j in range(1, m)]
    )
    parts.append(
        "enc AS (SELECT vec_id, "
        + ", ".join(f"code{j}" for j in range(m))
        + f" FROM {enc_joins})"
    )
    parts.append(
        """cand AS (
      SELECT p.query_id, enc.*
      FROM enc
      JOIN cells USING (vec_id)
      JOIN gprobe p ON p.cell = cells.cell
      WHERE enc.vec_id != p.query_id
    )"""
    )
    dt_joins = " ".join(
        f"JOIN dt{j} ON dt{j}.cid = cand.code{j}"
        f" AND dt{j}.query_id = cand.query_id"
        for j in range(m)
    )
    adist = " + ".join(f"dt{j}.d" for j in range(m))
    parts.append(
        f"""scored AS (
      SELECT cand.query_id, cand.vec_id AS neighbor_id,
             CAST({adist} AS BIGINT) AS adist_q
      FROM cand {dt_joins}
    )"""
    )
    return (
        ", ".join(parts)
        + f"""
    SELECT query_id, neighbor_id, adist_q, rn AS rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id
        ORDER BY adist_q ASC, neighbor_id ASC) AS INT) AS rn
      FROM scored
    ) WHERE rn <= {k}"""
    )


# --------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one frontier scheduling round over the event-frontier —
    admission regex → dedup → politeness window-rank quota → batch
    (reference crawl §3.1's rank step, W1/O3)."""
    sf_dir = "/root/testdata/sf0.001"
    urls = _event_urls(spark, sf_dir)
    admitted = urls.filter(
        F.col("url").rlike(r"^https://host\d+\.test/(view|click|purchase)/")
    )
    frontier = admitted.withColumn("url_hash", F.xxhash64("url")).dropDuplicates(
        ["url_hash"]
    )
    # rank per ACTUAL host (the URL's host is user_id % 20): the quota
    # the name claims. Partitioning by raw user_id admitted up to
    # 5 × 20 users per host — a per-user rank mislabeled as per-host
    # (r5 review).
    host = (F.col("user_id") % 20).alias("_host")
    w = Window.partitionBy(host).orderBy(F.col("ts"), F.col("event_id"))
    batch = (
        frontier.withColumn("rank_in_host", F.row_number().over(w))
        .filter(F.col("rank_in_host") <= 5)
        .select("event_id", "user_id", "url", "rank_in_host")
    )
    return batch.orderBy("rank_in_host", "event_id")


# ---------------------------------------------------------------- queries
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from netrunner_spark.operators import textops, vectors

    def w1_politeness_quota(spark, sf):
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("event_id", "user_id", "event_type", "rn")
        )

    def f2_admission_filter(spark, sf):
        urls = _event_urls(spark, sf)
        allow = r"^https://host\d+\.test/(view|click|purchase)/"
        skip = r"^https://host1\.test/click/"
        return urls.filter(F.col("url").rlike(allow) & ~F.col("url").rlike(skip)).select(
            "event_id", "url"
        )

    def f7_seen_antijoin(spark, sf):
        cust = _t(spark, sf, "customer")
        orders = _t(spark, sf, "orders")
        return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
            "c_custkey", "c_name"
        )

    def f8_frontier_dedup(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.select("user_id", "event_type").dropDuplicates()

    def f9_canonical_dedup(spark, sf):
        orders = _t(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return (
            orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
        )

    def j4_domain_memo_join(spark, sf):
        orders = _t(spark, sf, "orders")
        cust = _t(spark, sf, "customer")
        nation = _t(spark, sf, "nation")
        return (
            # nation is the bounded memo dim (25 rows) — broadcast it.
            # customer grows with SF (150k × SF): a forced broadcast
            # hits Spark's 8 GB cap / driver OOM at large SF and robs
            # AQE of the shuffle fallback (r5 review) — let AQE pick.
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                    "cents_total"
                ),
            )
        )

    def j5_prefix_coverage(spark, sf):
        # NOTE: a URL under prefix "blueberry ..." also startswith
        # "blue" — counting it under BOTH is the intended semantics of
        # seed-prefix coverage (F14/coverage_counts behaves the same);
        # the broadcast theta-join is fine because prefixes is tiny.
        part = _t(spark, sf, "part")
        prefixes = part.select(
            F.split(F.col("p_name"), " ").getItem(0).alias("prefix")
        ).dropDuplicates()
        joined = part.join(
            F.broadcast(prefixes), F.col("p_name").startswith(F.col("prefix"))
        )
        return joined.groupBy("prefix").agg(F.count(F.lit(1)).alias("n_hits"))

    def a3_validation_tallies(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0)).alias("n_hi"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents_sum"),
        )

    def o1_sorted_limit(spark, sf):
        docs = _t(spark, sf, "documents")
        return docs.orderBy("doc_id").limit(50).select("doc_id", "n_chars")

    def q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                    "sum_base_cents"
                ),
                F.sum(
                    F.round(
                        F.round(F.col("l_extendedprice") * 100)
                        * (100 - F.round(F.col("l_discount") * 100))
                    ).cast("long")
                ).alias("disc_price_e4"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def q3_top_orders(spark, sf):
        cust = _t(spark, sf, "customer")
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        joined = (
            # customer scales with SF — no forced broadcast (r5 review)
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .filter(F.col("c_mktsegment") == "BUILDING")
        )
        rev = joined.groupBy("l_orderkey").agg(
            F.sum(
                F.round(
                    F.round(F.col("l_extendedprice") * 100)
                    * (100 - F.round(F.col("l_discount") * 100))
                ).cast("long")
            ).alias("revenue_e4")
        )
        return rev.orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey")).limit(10)

    def f4_url_normalize(spark, sf):
        # normalize restricted to SQL-expressible parts (F4: fragment
        # strip + case-fold; the full RFC-3986 UDF is golden-tested)
        ev = _t(spark, sf, "events")
        raw = F.concat(
            F.lit("HTTPS://Host"),
            (F.col("user_id") % 20).cast("string"),
            F.lit(".TEST/"),
            F.col("event_id").cast("string"),
            F.lit("#section"),
        )
        return ev.select(
            "event_id", F.lower(F.split(raw, "#").getItem(0)).alias("norm_url")
        )

    def j1_frontier_union(spark, sf):
        # union-distinct of two discovery sources (J1)
        a = _event_urls(spark, sf).filter(F.col("event_type") == "view").select("url")
        b = (
            _event_urls(spark, sf)
            .filter(F.col("value") > 200.0)
            .select("url")
        )
        return a.unionByName(b).dropDuplicates()

    def j2_missing_nations(spark, sf):
        # expected − found (J2): nations with no customers
        nation = _t(spark, sf, "nation")
        cust = _t(spark, sf, "customer")
        return nation.join(
            cust, nation.n_nationkey == cust.c_nationkey, "left_anti"
        ).select("n_nationkey", "n_name")

    def a2_duplicate_count(spark, sf):
        docs = _t(spark, sf, "documents")
        return docs.agg(
            (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_dupes"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    def o2_resume_page(spark, sf):
        # CDX-style page-2 slice under a pinned total order (O2).
        # sort + offset/limit, NOT an unpartitioned row_number window:
        # a no-PARTITION-BY window shuffles the ENTIRE table into one
        # task (r5 review); offset+limit plans as a per-partition
        # partial top-(offset+limit) merged on one task of only 200
        # rows — the scalable form of pagination. event_id is unique,
        # so the slice is identical.
        ev = _t(spark, sf, "events")
        return (
            ev.orderBy("event_id")
            .offset(100)
            .limit(100)
            .select("event_id", "event_type")
        )

    def dedup_exact(spark, sf):
        return textops.dedup_exact(_t(spark, sf, "documents"))

    def text_token_stats(spark, sf):
        return textops.token_stats(_t(spark, sf, "documents"))

    def text_quality(spark, sf):
        return textops.quality_score(_t(spark, sf, "documents"))

    def lang_id(spark, sf):
        return textops.lang_id(_t(spark, sf, "documents"))

    def doc_fingerprint(spark, sf):
        return textops.fingerprint(_t(spark, sf, "documents"))

    def jaccard_pairs(spark, sf):
        return textops.jaccard_pairs(_t(spark, sf, "documents"), max_doc_id=150)

    def minhash_lsh(spark, sf):
        return textops.minhash_lsh_pairs(_t(spark, sf, "documents"), max_doc_id=150)

    def simhash(spark, sf):
        return textops.simhash(_t(spark, sf, "documents"), max_doc_id=150)

    def hamming_near_dups(spark, sf):
        # pigeonhole hamming LSH over the 16-bit SimHash (perfect
        # recall for max_hamming < bands) + exact bit_count verify;
        # same operator runs over the image phash in the crawl cache
        sigs = textops.simhash(_t(spark, sf, "documents"), max_doc_id=150)
        return textops.hamming_near_dups(
            sigs, bits=16, bands=4, max_hamming=2
        ).withColumn("hamming", F.col("hamming").cast("int"))

    def drain_schedule_table(spark, sf):
        # the CORE scheduler oracle-checked per URL: schedule_rounds'
        # precomputed (host, priority, url_hash) -> sched_round
        # assignment over a 5-host frontier with per-host budgets
        # (h0=3, h1=5, default 7); the twin replays the exact window
        # recurrence
        from netrunner_spark.operators.politeness import schedule_rounds

        ev = _t(spark, sf, "events")
        frontier = ev.select(
            F.concat(F.lit("h"), (F.col("event_id") % 5).cast("string")).alias(
                "host"
            ),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("u"), F.col("event_id").cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("url_hash"),
            (F.col("event_id") % 3).alias("priority"),
        )
        budgets = spark.createDataFrame(
            [("h0", 3), ("h1", 5)], "host string, budget int"
        )
        out = schedule_rounds(frontier, budgets, default_budget=7)
        return out.select("host", "url_hash", "sched_round")

    def drain_schedule_salted(spark, sf):
        # the SALTED scheduler (north_rule's hot-host skew breaker)
        # oracle-checked per URL: window partitions by (host, url_hash
        # mod s_eff), each stripe gets floor(budget/s_eff) slots — the
        # politeness bound preserved by construction, and now the full
        # salted assignment is value-hashed too
        from netrunner_spark.operators.politeness import schedule_rounds

        ev = _t(spark, sf, "events")
        frontier = ev.select(
            F.concat(F.lit("h"), (F.col("event_id") % 5).cast("string")).alias(
                "host"
            ),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("u"), F.col("event_id").cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("url_hash"),
            (F.col("event_id") % 3).alias("priority"),
        )
        budgets = spark.createDataFrame(
            [("h0", 9), ("h1", 5)], "host string, budget int"
        )
        out = schedule_rounds(frontier, budgets, default_budget=8, n_salts=4)
        return out.select("host", "url_hash", "sched_round")

    def q5_local_supplier_volume(spark, sf):
        # TPC-H Q5 shape: 6-way join (region>nation>customer>orders>
        # lineitem>supplier) with the same-nation constraint, revenue
        # in exact integer cents x (100 - disc_pct); the join-breadth
        # benchmark row next to q1/q3
        r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        joined = (
            r.join(n, n.n_regionkey == r.r_regionkey)
            .join(c, c.c_nationkey == n.n_nationkey)
            .join(o, o.o_custkey == c.c_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(
                s,
                (s.s_suppkey == li.l_suppkey)
                & (s.s_nationkey == c.c_nationkey),
            )
        )
        rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
            F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
        )
        return joined.groupBy("n_name").agg(
            F.sum(rev).alias("revenue_scaled"),
            F.count(F.lit(1)).alias("n_items"),
        )

    def etld1_budget(spark, sf):
        # politeness budget keyed on the SITE, not the hostname: the
        # domain_rollup eTLD+1 counts feed Hamilton apportionment —
        # blogspot subdomains share one site budget, every github.io
        # user gets their own (rollup + alloc twins nested)
        from netrunner_spark.operators import crawlintel

        rolled = domain_rollup(spark, sf)
        return crawlintel.budget_alloc(
            rolled.select(F.col("etld1"), F.col("n_urls").alias("w")),
            "w",
            total=4999,
            host_col="etld1",
        ).select(F.col("host").alias("etld1"), "weight", "alloc")

    def _trap_pages(spark, sf):
        # deterministic spider-trap silhouette over events: hosts h0/h1
        # serve mostly-clean routes (plus one deep-recursion page every
        # 7th id); h2-h4 mix the three classic traps — /a/b relative-
        # link loops, far-future calendar years, 16-hex session ids.
        # Twin: _TRAPURLS_CTE (verbatim nested by both trap oracles).
        ev = _t(spark, sf, "events")
        return ev.select(
            F.expr(
                "concat('https://h', CAST(event_id % 5 AS STRING), '.test',"
                " CASE WHEN event_id % 5 < 2 THEN"
                "   CASE WHEN event_id % 7 = 0"
                "     THEN '/l0/l1/l2/l3/l4/l5/l6/l7/l8/l9/l10/l11/l12/page'"
                "     ELSE concat('/page/', CAST(event_id % 20 AS STRING)) END"
                " ELSE CASE CAST(event_id % 4 AS INT)"
                "   WHEN 0 THEN concat(repeat('/a/b', CAST(2 + event_id % 3 AS INT)),"
                "     '/p', CAST(event_id % 10 AS STRING))"
                "   WHEN 1 THEN concat('/cal/', CAST(2024 + event_id % 15 AS STRING),"
                "     '/', CAST(1 + event_id % 12 AS STRING))"
                "   WHEN 2 THEN concat('/s/', substring(md5(concat('t',"
                "     CAST(event_id % 50 AS STRING))), 1, 16), '/view')"
                "   ELSE concat('/page/', CAST(event_id % 20 AS STRING)) END END)"
            ).alias("url")
        )

    def trap_url_signals(spark, sf):
        # admission-time spider-trap audit: per-URL structural signals
        # (segment loops, far-future calendar years, opaque hex ids,
        # path depth) read off the URL string BEFORE any fetch budget
        # is spent — the pre-fetch complement to host_harvest's
        # post-fetch harvest-rate trap flag. Pure projection, no UDF.
        from netrunner_spark.operators import crawlintel

        return crawlintel.trap_url_signals(_trap_pages(spark, sf))

    def trap_hosts(spark, sf):
        # host quarantine rollup over the per-URL trap signals: hosts
        # whose link graph is >=25% synthetic stop minting frontier
        # rows (IRLbot's budget defense as one hash aggregate)
        from netrunner_spark.operators import crawlintel

        return crawlintel.trap_hosts(
            crawlintel.trap_url_signals(_trap_pages(spark, sf)),
            quarantine_permille=250,
        )

    def _pag_pages(spark, sf):
        # pagination silhouette over events: ?page= walks 0..39 with
        # per-page content (true traversal), ?sid= is numeric but never
        # changes content (numeric DUST), ?item= is content-relevant
        # but sparse (x17 stride: an id space, not a counter).
        # Twin: the pages CTE inside the pagination_params oracle.
        ev = _t(spark, sf, "events")
        return ev.select(
            F.expr(
                "concat('https://h', CAST(event_id % 2 AS STRING), '.test',"
                " CASE CAST(event_id % 4 AS INT)"
                " WHEN 0 THEN concat('/list?page=', CAST((event_id DIV 4) % 40 AS STRING))"
                " WHEN 1 THEN concat('/doc?sid=', CAST(1000 + (event_id DIV 4) % 50 AS STRING))"
                " WHEN 2 THEN concat('/shop?item=', CAST(((event_id DIV 4) % 30) * 17 AS STRING))"
                " ELSE '/about' END)"
            ).alias("url"),
            F.md5(
                F.expr(
                    "CASE CAST(event_id % 4 AS INT)"
                    " WHEN 0 THEN concat('pg-', CAST(event_id % 2 AS STRING), '-',"
                    "   CAST((event_id DIV 4) % 40 AS STRING))"
                    " WHEN 1 THEN concat('sess-', CAST(event_id % 2 AS STRING))"
                    " WHEN 2 THEN concat('item-', CAST(event_id % 2 AS STRING), '-',"
                    "   CAST((event_id DIV 4) % 30 AS STRING))"
                    " ELSE concat('about-', CAST(event_id % 2 AS STRING)) END"
                )
            ).alias("content_hash"),
        )

    def pagination_params(spark, sf):
        # the anti-DUST: integer query params whose variation CHANGES
        # content in dense runs are page counters — cap the traversal
        # instead of following ?page= forever; numeric session ids
        # (content-constant) and sparse item ids both stay excluded
        from netrunner_spark.operators import crawlintel

        return crawlintel.pagination_params(_pag_pages(spark, sf))

    def pagination_cap_apply(spark, sf):
        # the pagination loop closed: mined page counters cap the
        # traversal at 20 — ?page=20..39 stops minting frontier rows,
        # session ids and item ids never gate (rules nested twin)
        from netrunner_spark.operators import crawlintel

        pages = _pag_pages(spark, sf)
        return crawlintel.apply_pagination_caps(
            pages, crawlintel.pagination_params(pages), cap=20
        )

    def politeness_compliance(spark, sf):
        # post-hoc audit of the fetch log against the crawl-delay
        # contract (the north rule's hard invariant, third leg after
        # the scheduler plan and the wall-clock tests): hosts pace at
        # their delay except h2 (one 200ms-short gap at fetch #5) and
        # h4 (paces at half its delay — systematic violator)
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        log = ev.select(
            F.expr("concat('h', CAST(event_id % 5 AS STRING), '.test')").alias(
                "host"
            ),
            F.expr(
                "concat('https://h', CAST(event_id % 5 AS STRING), '.test/p/',"
                " CAST(event_id DIV 5 AS STRING))"
            ).alias("url"),
            F.expr(
                "CASE WHEN event_id % 5 = 4 THEN (event_id DIV 5) * 1250"
                " ELSE (event_id DIV 5) * (500 * (event_id % 5 + 1))"
                "  - (CASE WHEN event_id % 5 = 2 AND event_id DIV 5 >= 5"
                "     THEN 200 ELSE 0 END)"
                " END"
            ).cast("long").alias("ts_ms"),
        )
        delays = spark.createDataFrame(
            [(f"h{i}.test", 500 * (i + 1)) for i in range(5)],
            "host string, crawl_delay_ms long",
        )
        return crawlintel.politeness_compliance(log, delays)

    def priority_compose(spark, sf):
        # the north-star priority formula pinned per URL: depth +
        # log10(host queue + 1)/10, on queue sizes 9 and 99 so the
        # log10 points (1.0, 2.0) are bit-identical across engines —
        # small hosts drain ahead of megahosts within a depth tier.
        # ids are ENUMERATED (0..107), not derived from events: a data
        # slice missing one event_id%108 residue would shift a queue
        # count off its exact power-of-10 point and expose JVM-vs-libm
        # log10 last-ULP divergence to the row hash (r5 review)
        from netrunner_spark.operators.politeness import with_priority

        ids = spark.range(108).select(F.col("id").cast("long").alias("i"))
        frontier = ids.select(
            F.expr("CASE WHEN i < 9 THEN 'h0.test' ELSE 'h1.test' END").alias(
                "host"
            ),
            F.expr(
                "concat('https://', CASE WHEN i < 9 THEN 'h0.test' ELSE 'h1.test' END,"
                " '/d/', CAST(i AS STRING))"
            ).alias("url"),
            F.expr("CAST(i % 4 AS INT)").alias("depth"),
        )
        return with_priority(frontier)

    def session_duration_hist(spark, sf):
        # session-length spectrum in whole minutes (user_sessions twin
        # nested): the engagement histogram product analytics reads
        # first
        s = user_sessions(spark, sf)
        return (
            s.select(
                F.expr("(last_us - first_us) DIV 60000000").alias(
                    "duration_min"
                ),
                "n_events",
            )
            .groupBy("duration_min")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
        )

    def source_quality_matrix(spark, sf):
        # the curation dashboard head-count: per (source, reject
        # reason) document counts — text_quality_gate twin nested, one
        # documents join
        g = text_quality_gate(spark, sf)
        d = _t(spark, sf, "documents").select("doc_id", "source")
        return g.join(d, "doc_id").groupBy("source", "reject_reason").agg(
            F.count(F.lit(1)).alias("n_docs")
        )

    def redirect_hops_hist(spark, sf):
        # redirect-chain depth spectrum (+ the capped bucket): how much
        # latency budget chains burn before content; nests the bounded
        # multi-hop resolver twin
        r = redirect_resolve(spark, sf)
        return r.groupBy("hops", "status").agg(
            F.count(F.lit(1)).alias("n_chains")
        )

    def postings_df_hist(spark, sf):
        # index health: log2-binned document-frequency spectrum of the
        # corpus vocabulary (the bit-length CASE again) — how heavy the
        # stopword head is, how long the singleton tail
        from netrunner_spark.operators.sketches import _bitlen_case

        d = _t(spark, sf, "documents")
        df_tab = (
            d.select(
                "doc_id",
                F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                    "token"
                ),
            )
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.countDistinct("doc_id").alias("deg"))
        )
        return (
            df_tab.select(F.expr(_bitlen_case("deg", 48)).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_tokens"))
        )

    def embedding_norm_audit(spark, sf):
        # unnormalized-vector detection: quantized squared-norm
        # histogram (bin = ||q||^2 DIV 100000); cosine paths assume
        # unit-ish norms, this is the pre-flight that catches raw
        # (unscaled) embeddings before they skew every dot product
        from netrunner_spark.operators.vectors import _quantized

        emb = _t(spark, sf, "embeddings")
        norm_sq = F.aggregate(
            F.transform(
                _quantized(F.col("embedding")), lambda x: x * x
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return (
            emb.select(norm_sq.alias("nsq"))
            .select(F.expr("nsq DIV 100000").alias("norm_bin"))
            .groupBy("norm_bin")
            .agg(F.count(F.lit(1)).alias("n_vecs"))
        )

    def kmeans_cell_balance(spark, sf):
        # IVF/k-means health: cell occupancy + share permille (a hot
        # cell makes every probe of it slow); kmeans twin nested
        a = kmeans_clusters(spark, sf)
        sizes = a.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
        total = sizes.agg(F.sum("n_vecs").alias("tot"))
        return sizes.crossJoin(F.broadcast(total)).select(
            "cid",
            "n_vecs",
            F.expr("n_vecs * 1000 DIV tot").alias("share_permille"),
        )

    def dup_cluster_size_hist(spark, sf):
        # dedup economics: the size spectrum of near-dup clusters
        # (dedup_clusters twin nested) — how much of the corpus sits in
        # families of 2, 3, 5+ copies
        cl = dedup_clusters(spark, sf)
        sizes = cl.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        return sizes.groupBy("cluster_size").agg(
            F.count(F.lit(1)).alias("n_clusters")
        )

    def text_dedup_savings(spark, sf):
        # what the keeper policy saves, per source: dropped docs and
        # dropped chars (cluster_keepers twin nested + one documents
        # join); the text-side mirror of image_dedup_savings
        d = _t(spark, sf, "documents")
        k = cluster_keepers(spark, sf)
        return (
            k.filter(~F.col("keep"))
            .join(d.select("doc_id", "source", "n_chars"), "doc_id")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_dropped"),
                F.sum("n_chars").alias("chars_dropped"),
            )
        )

    def host_latency_quantiles(spark, sf):
        # per-host P50/P95/P99 fetch latency, skew-safe: the raw log
        # collapses to (host, bin) counts first; the only window runs
        # over each host's BINS (host 5 carries a +2 s tail)
        from netrunner_spark.operators.sketches import grouped_hist_quantiles

        ev = _t(spark, sf, "events")
        lat = ev.select(
            F.concat(
                F.lit("h"), (F.col("event_id") % 6).cast("string"), F.lit(".test")
            ).alias("host"),
            F.expr(
                "20 + event_id % 500"
                " + CASE WHEN event_id % 6 = 5 THEN 2000 ELSE 0 END"
            ).alias("latency_ms"),
        )
        return grouped_hist_quantiles(
            lat, "host", "latency_ms", bin_width=50
        )

    def mime_mismatch_report(spark, sf):
        # payload integrity audit: claimed format vs magic-byte sniff
        # over synthesized binary payloads (doc_id % 7 picks the real
        # magic, % 3 the claimed label -> a full mismatch matrix);
        # binary never crosses the oracle boundary, only the counts
        from netrunner_spark.operators.imageops import sniff_mime

        d = _t(spark, sf, "documents")
        payload = d.select(
            "doc_id",
            F.expr(
                "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'"
                " ELSE 'gif' END"
            ).alias("claimed_fmt"),
            F.unhex(
                F.concat(
                    F.expr(
                        "CASE doc_id % 7"
                        " WHEN 0 THEN '89504E47'"
                        " WHEN 1 THEN 'FFD8FFE0'"
                        " WHEN 2 THEN '47494638'"
                        " WHEN 3 THEN '25504446'"
                        " WHEN 4 THEN '1F8B0800'"
                        " WHEN 5 THEN '3C21444F'"
                        " ELSE '00112233' END"
                    ),
                    F.md5(F.col("doc_id").cast("string")),
                )
            ).alias("bytes"),
        )
        return (
            sniff_mime(payload)
            .groupBy("claimed_fmt", "mime")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def pq_recall(spark, sf):
        # PQ quality evaluation next to ann_recall's IVF: recall@5 of
        # the ADC scan vs the L2 brute truth, integer percent — the
        # compression-loss audit for the FAISS-family path
        from netrunner_spark.operators import vectors

        emb = _t(spark, sf, "embeddings")
        t = vectors.brute_topk_int(emb, n_queries=10, k=5).select(
            "query_id", "neighbor_id"
        )
        a = vectors.pq_topk(
            emb, m=4, ks=4, iters=2, n_queries=10, k=5
        ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
        j = t.join(
            a,
            (t.query_id == a.query_id) & (t.neighbor_id == a.a_neighbor),
            "left",
        ).select(t.query_id, "neighbor_id", "a_neighbor")
        return j.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("k"),
            F.count("a_neighbor").alias("n_hit"),
            F.expr("count(a_neighbor) * 100 div count(1)").alias("recall_pct"),
        )

    def hamming_distance_hist(spark, sf):
        # banding calibration: the distance spectrum of verified LSH
        # pairs (max_hamming twin nested) — where the near-dup
        # threshold actually bites on this corpus
        pairs = hamming_near_dups(spark, sf)
        return pairs.groupBy("hamming").agg(
            F.count(F.lit(1)).alias("n_pairs")
        )

    def ann_topk_int(spark, sf):
        return vectors.brute_topk_int(_t(spark, sf, "embeddings"))

    def ann_cosine_topk(spark, sf):
        # deterministic: exact int dot/norms + one IEEE division —
        # bit-identical ordering in Spark and DuckDB (was rows-only)
        return vectors.cosine_topk_quantized(_t(spark, sf, "embeddings"))

    def embedding_near_dups(spark, sf):
        # bits pinned to 8: the DuckDB oracle hard-codes an 8-bit SRP
        # (generate_series(0,7)), so the driver row must agree at ANY
        # sf — auto_srp_bits would pick 9+ past 8192 vectors and the
        # candidate sets would diverge. The scale-safe auto default is
        # the operator's API default, tested in test_textops_scale.
        return vectors.embedding_near_dups(_t(spark, sf, "embeddings"), bits=8)

    def ann_ivf_topk(spark, sf):
        return vectors.ivf_topk(_t(spark, sf, "embeddings"))

    def embedding_dedup_clusters(spark, sf):
        # bits pinned to 8 for the same oracle-parity reason as
        # embedding_near_dups above; scale default is auto
        return vectors.embedding_dedup_clusters(
            _t(spark, sf, "embeddings"), bits=8
        )

    def media_video_sample(spark, sf):
        # multimodal: build deterministic NRVD1 videos, frame-sample
        # every 2nd frame via mapInPandas; oracle derives the expected
        # sample counts from the generation arithmetic
        from netrunner_spark.media import sample_frames, synth_video_udf

        ids = (
            _t(spark, sf, "embeddings")
            .select(F.col("vec_id").alias("video_id"))
            .filter(F.col("video_id") < 100)
        )
        vids = ids.withColumn("bytes", synth_video_udf()(F.col("video_id")))
        return sample_frames(vids, every=2).groupBy("video_id").agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_idx").alias("max_idx"),
        )

    def media_audio_features(spark, sf):
        from netrunner_spark.media import audio_features_udf, synth_audio_udf

        ids = (
            _t(spark, sf, "embeddings")
            .select(F.col("vec_id").alias("audio_id"))
            .filter(F.col("audio_id") < 100)
        )
        a = ids.withColumn("bytes", synth_audio_udf()(F.col("audio_id")))
        f = a.withColumn("ft", audio_features_udf(F.col("bytes")))
        return f.select(
            "audio_id",
            F.col("ft.n_samples").alias("n_samples"),
            F.col("ft.abs_sum").alias("abs_sum"),
            F.col("ft.zero_crossings").alias("zero_crossings"),
        )

    def jaccard_pairs_capped(spark, sf):
        # hot-gram document-frequency cap — the 100 TB-safe variant
        return textops.jaccard_pairs(
            _t(spark, sf, "documents"), max_doc_id=150, max_gram_df=25
        )

    def containment_pairs(spark, sf):
        # Broder containment: asymmetric subset/quote duplication the
        # symmetric Jaccard dilutes; same capped gram join underneath
        return textops.containment_pairs(
            _t(spark, sf, "documents"),
            max_doc_id=150,
            max_gram_df=25,
            min_cont_q=400,
        )

    def duplicate_spans(spark, sf):
        # maximal cross-doc duplicated token spans (Lee et al. exact
        # -substring dedup signal): positional word 4-grams with df>=2
        # merged gaps-and-islands into spans
        return textops.duplicate_spans(
            _t(spark, sf, "documents"), n=4, min_span_grams=2,
            max_gram_df=50, max_doc_id=150,
        )

    def minhash_lsh_capped(spark, sf):
        # band-bucket DF cap (VERDICT r4 #2): buckets >8 docs emit a
        # hub star instead of all C(m,2) pairs — the 100 TB-safe variant
        return textops.minhash_lsh_pairs(
            _t(spark, sf, "documents"), max_doc_id=150, max_band_df=8
        )

    def dedup_clusters(spark, sf):
        # capped-LSH pairs → large-star/small-star connected components
        # → deterministic min-id cluster labels + keeper flag
        return textops.dedup_clusters(
            _t(spark, sf, "documents"), max_doc_id=150, max_band_df=8
        )

    def cluster_keepers(spark, sf):
        # the dedup decision: per near-dup cluster keep the longest
        # copy (tie → min doc_id), list the rest for dropping
        d = _t(spark, sf, "documents")
        cl = textops.dedup_clusters(d, max_doc_id=150, max_band_df=8)
        return textops.cluster_keepers(cl, d)

    def chunk_dedup(spark, sf):
        # sub-document exact dedup: 10-word chunks, keep globally-first
        # occurrence, reassemble (Lee et al.-style substring dedup)
        return textops.chunk_dedup(_t(spark, sf, "documents"), chunk_words=10)

    def sketch_kmv_events(spark, sf):
        # KMV distinct-count sketch: per-partition top-k of a 52-bit
        # md5 hash (TakeOrdered — no global sort), exact-int estimator;
        # event_id cardinality >> k so the ESTIMATOR branch is the one
        # the oracle must reproduce
        from netrunner_spark.operators import sketches

        return sketches.kmv_distinct(_t(spark, sf, "events"), "event_id", k=64)

    def sketch_kmv_intersect(spark, sf):
        # KMV set algebra (Beyer et al. 2007): union-merge of the
        # view-day and purchase-day user-activity sketches + the
        # rho-fraction intersection estimator, exact int64 — the
        # cross-segment overlap question ("how many user-days did
        # BOTH") answered from two k-row synopses instead of a
        # distinct-join of the raw logs; user-day keys keep both sets
        # well past k so the ESTIMATOR branch is the one oracle-checked
        from netrunner_spark.operators import sketches

        ev = _t(spark, sf, "events").select(
            "event_type",
            F.concat_ws(
                "#",
                F.col("user_id").cast("string"),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("uday"),
        )
        return sketches.kmv_set_ops(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
            key="uday",
            k=64,
        )

    def sketch_cms_tokens(spark, sf):
        # count-min frequency sketch over word occurrences (4×256
        # cells, minhash-family row hashes) + broadcast point queries
        from netrunner_spark.operators import sketches

        toks = textops.token_ngrams(_t(spark, sf, "documents"), n=1)
        cells = sketches.cms_cells(toks)
        q = spark.createDataFrame(
            [(t,) for t in ("the", "of", "and", "to", "zebra")], "gram string"
        )
        return sketches.cms_estimate(cells, q)

    def sketch_hist_quantiles(spark, sf):
        # mergeable histogram sketch → integer quantile estimates
        # (error bound = bin width; auditable, unlike t-digest state)
        from netrunner_spark.operators import sketches

        bins = sketches.hist_bins(_t(spark, sf, "documents"), "n_chars", 100)
        return sketches.hist_quantiles(bins, (500, 900, 990), 100)

    def curation_pipeline(spark, sf):
        # the END-TO-END curation decision a training mix runs per doc:
        # quality gate ∧ near-dup keeper ∧ decontaminated → split
        # label; one row per candidate with the FIRST rejecting stage.
        # Every stage is the same operator (same params) as its
        # standalone driver query, so this also pins composability.
        from netrunner_spark.operators.sampling import hash_split

        d = _t(spark, sf, "documents")
        gate = textops.text_quality_gate(d).select(
            "doc_id",
            F.col("pass").alias("q_pass"),
            F.col("reject_reason").alias("q_reason"),
        )
        clusters = textops.dedup_clusters(
            d, max_doc_id=150, max_band_df=8
        ).select("doc_id", "is_keeper")
        cont = textops.contamination(
            d.filter(F.col("doc_id") % 10 != 0),
            d.filter(F.col("doc_id") % 10 == 0),
            n=3,
        ).select("doc_id", "n_grams", "n_hits")
        split = hash_split(d, "doc_id").select("doc_id", "split")
        cand = d.filter(
            (F.col("doc_id") < 150) & (F.col("doc_id") % 10 != 0)
        ).select("doc_id")
        j = (
            cand.join(gate, "doc_id", "left")
            .join(clusters, "doc_id", "left")
            .join(cont, "doc_id", "left")
            .join(split, "doc_id", "left")
        )
        contaminated = F.col("n_hits") * 5 > F.col("n_grams")
        stage = (
            F.when(~F.col("q_pass"), F.concat(F.lit("quality:"), F.col("q_reason")))
            .when(~F.coalesce(F.col("is_keeper"), F.lit(True)), F.lit("duplicate"))
            .when(F.coalesce(contaminated, F.lit(False)), F.lit("contaminated"))
            .otherwise(F.lit(None).cast("string"))
        )
        return j.select(
            "doc_id",
            stage.isNull().alias("admitted"),
            stage.alias("reject_stage"),
            F.when(stage.isNull(), F.col("split")).alias("split"),
        )

    def zorder_curve(spark, sf):
        # Morton z-values over two integer event dimensions — the
        # file-clustering key behind 2-d min/max scan pruning
        from netrunner_spark.operators import layout

        e = _t(spark, sf, "events")
        keyed = e.select(
            "event_id",
            (F.col("user_id") % 1024).alias("x"),
            (F.length("props") % 1024).cast("long").alias("y"),
        )
        return keyed.withColumn("zval", layout.zvalue("x", "y", bits=10))

    def tokenizer_fertility(spark, sf):
        # tokens-per-word of the trained tokenizer, per source: the
        # standard tokenizer-eval metric, composed from bpe_tokenize's
        # counts (twin nested verbatim)
        from netrunner_spark.operators.textops import bpe_token_counts

        d = _t(spark, sf, "documents")
        bt = bpe_token_counts(d, n_merges=3)
        words = (
            d.select(
                "doc_id",
                "source",
                F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                    "word"
                ),
            )
            .filter(F.col("word") != "")
            .groupBy("doc_id", "source")
            .agg(F.count(F.lit(1)).alias("n_words"))
        )
        return (
            words.join(bt, "doc_id")
            .groupBy("source")
            .agg(
                F.sum("n_words").alias("n_words"),
                F.sum("n_tokens").alias("n_tokens"),
            )
            .withColumn(
                "fertility_permille", F.expr("n_tokens * 1000 DIV n_words")
            )
        )

    def token_budget_by_source(spark, sf):
        # the pretraining budget in REAL tokenizer tokens: Hamilton
        # apportionment of a 1M-token budget across sources weighted by
        # trained-BPE token mass (bpe_tokenize + budget_alloc composed)
        from netrunner_spark.operators import crawlintel
        from netrunner_spark.operators.textops import bpe_token_counts

        d = _t(spark, sf, "documents")
        bt = bpe_token_counts(d, n_merges=3)
        per_src = (
            bt.join(d.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(F.sum("n_tokens").alias("w"))
        )
        return crawlintel.budget_alloc(
            per_src, "w", total=1_000_000, host_col="source"
        ).select(F.col("host").alias("source"), "weight", "alloc")

    def hilbert_curve(spark, sf):
        # Hilbert index over the same two event dimensions as
        # zorder_curve — the locality-optimal clustering key (no
        # Morton power-of-two seams); per-level rewrites collapse into
        # one codegen stage
        from netrunner_spark.operators import layout

        e = _t(spark, sf, "events")
        keyed = e.select(
            "event_id",
            (F.col("user_id") % 1024).alias("x"),
            (F.length("props") % 1024).cast("long").alias("y"),
        )
        return layout.hilbert_df(keyed, "x", "y", bits=10)

    def multimodal_dup_pairs(spark, sf):
        # image axis: caption MinHash-LSH near-dup AND exact dims/fmt
        # agreement — the high-precision multimodal dedup pre-filter
        from netrunner_spark.operators import imageops

        return imageops.multimodal_dup_pairs(
            _image_meta(spark, sf), max_band_df=8, max_image_id=150
        )

    def image_quality_gate(spark, sf):
        # LAION-style metadata admission gate over the image+caption
        # table (input_hint shape); map-only, bytes column never read
        from netrunner_spark.operators import imageops

        return imageops.quality_gate(_image_meta(spark, sf)).select(
            "image_id",
            "w",
            "h",
            "fmt",
            "n_bytes",
            F.col("pass").alias("admitted"),
            "reject_reason",
        )

    def image_aspect_buckets(spark, sf):
        # nearest SDXL-style multi-AR training bucket, integer-exact
        from netrunner_spark.operators import imageops

        return imageops.aspect_bucket(_image_meta(spark, sf)).select(
            "image_id", "w", "h", "bucket_w", "bucket_h"
        )

    def image_shard_pack(spark, sf):
        # WebDataset-style size-bounded shard assignment via the
        # distributed (bucket-major) prefix sum — no global window
        from netrunner_spark.operators import imageops

        meta = _image_meta(spark, sf).select("image_id", "n_bytes")
        return imageops.shard_pack(
            meta, "image_id", "n_bytes", shard_bytes=100_000, n_buckets=16
        ).select("image_id", "n_bytes", "pack_pos", "shard_id")

    def caption_boilerplate(spark, sf):
        # captions repeated corpus-wide carry no supervision signal
        from netrunner_spark.operators import imageops

        return imageops.boilerplate_captions(
            _image_meta(spark, sf), max_caption_df=2
        ).select("image_id", "caption_df", "boilerplate")

    def image_pair_alignment(spark, sf):
        # CLIP-style image↔caption cosine gate in quantized int64 —
        # even vec_ids are image embeddings, odd are caption embeddings
        from netrunner_spark.operators import imageops

        e = _t(spark, sf, "embeddings")
        img = e.filter(F.col("vec_id") % 2 == 0).select(
            (F.col("vec_id") / 2).cast("long").alias("pair_id"),
            F.col("embedding").alias("img_vec"),
        )
        cap = e.filter(F.col("vec_id") % 2 == 1).select(
            F.floor(F.col("vec_id") / 2).cast("long").alias("pair_id"),
            F.col("embedding").alias("cap_vec"),
        )
        return imageops.pair_alignment(
            img.join(cap, "pair_id"), threshold_pct=30, scale=1000
        ).select("pair_id", "dot_q", "img_norm2", "cap_norm2", "aligned")

    def image_cluster_keepers(spark, sf):
        # the image-side dedup decision: phash-class signature →
        # hamming LSH → connected components → keep the highest-
        # resolution copy per cluster
        d = _t(spark, sf, "documents")
        sigs = textops.simhash(d, max_doc_id=150)
        prs = textops.hamming_near_dups(sigs, bits=16, bands=4, max_hamming=2)
        nodes = d.filter(F.col("doc_id") < 150).select("doc_id")
        cl = textops.connected_components(
            prs.select("doc_a", "doc_b"), nodes=nodes
        )
        quality = _image_meta(spark, sf).select(
            F.col("image_id").alias("doc_id"),
            (F.col("w").cast("bigint") * F.col("h")).alias("resolution"),
        )
        return textops.cluster_keepers(cl, quality, quality_col="resolution")

    def image_dedup_savings(spark, sf):
        # the storage economics of the image dedup decision: per format,
        # how many near-dup copies the keeper policy drops and how many
        # bytes that saves — composed from the SAME stages as
        # image_cluster_keepers, metadata-only (bytes column never read)
        keepers = image_cluster_keepers(spark, sf)
        meta = _image_meta(spark, sf).filter(F.col("image_id") < 150)
        j = keepers.join(meta, keepers.doc_id == meta.image_id)
        return (
            j.groupBy("fmt")
            .agg(
                F.count(F.lit(1)).alias("n_images"),
                F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
                F.sum(F.when(~F.col("keep"), F.col("n_bytes")).otherwise(0)).alias(
                    "bytes_dropped"
                ),
                F.sum("n_bytes").alias("bytes_total"),
            )
            .withColumn(
                "saved_permille",
                F.expr("CAST(bytes_dropped * 1000 DIV bytes_total AS BIGINT)"),
            )
        )

    def sample_split(spark, sf):
        # deterministic md5-hash train/val/test split — map-only, zero
        # shuffle; membership depends only on (salt, doc_id)
        from netrunner_spark.operators.sampling import hash_split

        return hash_split(_t(spark, sf, "documents"), "doc_id").select(
            "doc_id", "split"
        )

    def stratified_sample(spark, sf):
        # per-language quota sample: ≤25 docs per lang by hash order
        from netrunner_spark.operators import sampling

        return sampling.stratified_sample(
            _t(spark, sf, "documents"), "lang", "doc_id", 25
        ).select("doc_id", "lang", "rk")

    def stratified_skewsafe(spark, sf):
        # hot-stratum-safe two-phase quota sample: per-(stratum,bucket)
        # prune before the global rank — output provably identical to
        # the single-window form, so the plain-SQL oracle checks it
        from netrunner_spark.operators import sampling

        return sampling.stratified_sample_skewsafe(
            _t(spark, sf, "documents"), "lang", "doc_id", 10, n_buckets=8
        ).select("doc_id", "lang", "rk")

    def source_budget_cap(spark, sf):
        # per-source token-budget cap (domain mixing): admit docs in
        # deterministic hash order while cumulative n_chars ≤ 5000
        from netrunner_spark.operators import sampling

        return sampling.budget_cap(
            _t(spark, sf, "documents"), "source", "doc_id", "n_chars", budget=5000
        ).select("doc_id", "source", "cum_cost", "rk")

    def cross_source_dups(spark, sf):
        # inter-source contamination scan; the synthetic corpus has no
        # cross-source copies, so mirror every 7th doc into a second
        # source deterministically (both sides build the same union)
        d = _t(spark, sf, "documents")
        mirror = d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text",
            "lang",
            F.lit("mirror").alias("source"),
            "n_chars",
        )
        return textops.cross_source_dups(d.unionByName(mirror))

    def pii_pattern_scan(spark, sf):
        # scrub-signal counts; the synthetic docs carry no PII, so affix
        # deterministic contact strings to every 5th doc in both engines
        d = _t(spark, sf, "documents")
        sid = F.col("doc_id").cast("string")
        enriched = d.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" contact a"), sid, F.lit("@example.com or see "),
                    F.lit("https://ex.org/p/"), sid,
                    F.lit(" ref 123456789"), sid,
                ),
            ).otherwise(F.col("text")),
        )
        return textops.pattern_scan(enriched)

    def vocab_topk(spark, sf):
        # tokenizer-training first step: corpus top-100 token frequencies
        return textops.vocab_topk(_t(spark, sf, "documents"), k=100)

    # Round split for the drift family: alternating blocks of 20
    # doc_ids. The generator assigns source = src(doc_id % 20), so a
    # plain parity split would put every source wholly in one round
    # (degenerate TV ≈ 0.5 everywhere); block parity gives every
    # source presence in both rounds.
    _ROUND_A = "(doc_id DIV 20) % 2 = 0"

    def vocab_drift(spark, sf):
        # between-round corpus drift monitor: block split stands in
        # for two crawl rounds; exact integer-ppm frequency deltas
        docs = _t(spark, sf, "documents")
        return textops.vocab_drift(
            docs.filter(F.expr(_ROUND_A)),
            docs.filter(~F.expr(_ROUND_A)),
            k=50,
        )

    def _source_drift_df(spark, sf):
        docs = _t(spark, sf, "documents")
        return textops.source_drift(
            docs.filter(F.expr(_ROUND_A)),
            docs.filter(~F.expr(_ROUND_A)),
        )

    def source_drift(spark, sf):
        # drift rolled up to the recrawl-budget unit: per-source
        # total-variation distance between the two rounds
        return _source_drift_df(spark, sf)

    def dup_spans(spark, sf):
        # exact duplicate-span detection (Lee-et-al-style substring
        # dedup, fixed 30-char shingles at stride 10): docs enriched
        # with a shared syndication prefix on doc_id % 4 = 0 so real
        # cross-doc duplicate spans exist at synth scale
        docs = _t(spark, sf, "documents").withColumn(
            "text",
            F.expr(
                "CASE WHEN doc_id % 4 = 0 THEN"
                " 'all rights reserved contact the admin at example dot com '"
                " || text ELSE text END"
            ),
        )
        return textops.dup_spans(docs, width=30, stride=10).orderBy("doc_id")

    def pii_scrub(spark, sf):
        # PII redaction over docs enriched with deterministic injected
        # contacts (emails / IPs / phones) so every branch fires;
        # scrubbed body compared via md5
        docs = _t(spark, sf, "documents").withColumn(
            "text",
            F.expr(
                "text"
                " || CASE WHEN doc_id % 5 = 0 THEN"
                "   ' contact user' || CAST(doc_id AS STRING) || '@example.com'"
                "   ELSE '' END"
                " || CASE WHEN doc_id % 7 = 0 THEN"
                "   ' call +1 415 555 0132 now' ELSE '' END"
                " || CASE WHEN doc_id % 11 = 0 THEN"
                "   ' origin 10.42.7.' || CAST(doc_id % 256 AS STRING)"
                "   ELSE '' END"
            ),
        )
        return textops.pii_scrub(docs).orderBy("doc_id")

    def scrub_admission(spark, sf):
        # the scrub loop CLOSED: dup-span gate ∧ PII gate → verdict
        # with the first rejecting stage, one row per doc. Both stages
        # ARE the standalone driver queries called verbatim (same
        # enrichment, same params), so composability is pinned.
        spans = dup_spans(spark, sf).select("doc_id", "dup_ppm")
        pii = pii_scrub(spark, sf).select(
            "doc_id",
            (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias(
                "n_pii"
            ),
        )
        verdict = (
            F.when(F.col("dup_ppm") > 100000, F.lit("dup_spans"))
            .when(F.col("n_pii") >= 2, F.lit("pii"))
            .otherwise(F.lit("admitted"))
        )
        return (
            spans.join(pii, "doc_id")
            .select("doc_id", "dup_ppm", "n_pii", verdict.alias("verdict"))
            .orderBy("doc_id")
        )

    def drift_recrawl_alloc(spark, sf):
        # close the drift loop: 499 recrawl slots apportioned by
        # measured per-source drift (largest-remainder, exact ints)
        from netrunner_spark.operators.crawlintel import budget_alloc

        return (
            budget_alloc(
                _source_drift_df(spark, sf),
                weight_col="tv_ppm",
                total=499,
                host_col="source",
            )
            .withColumnRenamed("host", "source")
            .orderBy(F.col("alloc").desc(), F.col("source").asc())
        )

    def link_pagerank(spark, sf):
        # crawl-priority authority signal: integer fixed-point PageRank
        # (exact int64 arithmetic → bit-identical re-runs, exact oracle)
        # over the customer→supplier purchase graph as the test topology
        from netrunner_spark.operators.graph import pagerank_int

        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        return pagerank_int(edges, iters=3)

    def opic_importance(spark, sf):
        # OPIC (Abiteboul et al. WWW'03): the online crawl-ordering
        # importance metric — cash/history recurrence with a virtual
        # page absorbing dangling mass and truncation remainders; rank
        # frontier URLs by hist_e12 while the crawl is still running
        from netrunner_spark.operators.graph import opic_int

        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        return opic_int(edges, iters=3)

    def opic_budget_alloc(spark, sf):
        # the OPIC loop closed: online importance (history) becomes the
        # Hamilton-apportioned fetch budget — ranking the frontier by
        # accumulated cash history is WHY crawlers run OPIC; this is
        # the budget table the politeness governor consumes. Supplier
        # nodes (odd ids) are the fetchable side; twins nested verbatim.
        from netrunner_spark.operators import crawlintel
        from netrunner_spark.operators.graph import opic_int

        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        imp = opic_int(edges, iters=3)
        stats = imp.filter(F.col("id") % 2 == 1).select(
            F.concat(
                F.lit("s"), ((F.col("id") - 1) / 2).cast("long").cast("string")
            ).alias("host"),
            "hist_e12",
        )
        return crawlintel.budget_alloc(stats, "hist_e12", total=997)

    def weighted_pagerank(spark, sf):
        # WEIGHTED PageRank: rank distributed proportional to link
        # multiplicity (raw edge rows carry w=1 and the operator sums
        # duplicates) — the web-graph recurrence for repeated links
        from netrunner_spark.operators.graph import pagerank_weighted_int

        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
            F.lit(1).alias("w"),
        )
        return pagerank_weighted_int(edges, iters=3)

    def doc_top_terms(spark, sf):
        # rank-based TF-IDF (exact ints, no log floats): top-3 tokens
        # per doc by (tf desc, global df asc, token asc)
        return textops.doc_top_terms(_t(spark, sf, "documents"), k=3)

    def seed_pagerank(spark, sf):
        # PERSONALIZED PageRank: teleport + dangling mass land on the
        # lens's seed set only (customer nodes with id < 100) — the
        # crawl-outward-from-the-seeds authority prior
        from netrunner_spark.operators.graph import pagerank_int

        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        seeds = _t(spark, sf, "customer").select(
            (F.col("c_custkey").cast("long") * 2).alias("id")
        ).filter("id < 100")
        return pagerank_int(edges, iters=3, seeds=seeds)

    def bm25_search(spark, sf):
        # BM25 ranked retrieval (quantized exact-int scoring, k1=1.2
        # b=0.75 as rationals) for a pinned 3-query batch: query-term
        # weights broadcast into the postings join
        from netrunner_spark.operators import retrieval

        queries = spark.createDataFrame(
            _BM25_QUERIES, "query_id long, query string"
        )
        return retrieval.bm25_topk(_t(spark, sf, "documents"), queries, k=10)

    def search_snippets(spark, sf):
        # result assembly: BM25 top-5 per query + ±5-token snippet
        # around the earliest query-term hit (JVM higher-order fns,
        # broadcast hits into the corpus scan)
        from netrunner_spark.operators import retrieval

        docs = _t(spark, sf, "documents")
        queries = spark.createDataFrame(
            _BM25_QUERIES, "query_id long, query string"
        )
        hits = retrieval.bm25_topk(docs, queries, k=5)
        return retrieval.snippets(hits, docs, queries, window=5)

    def search_index_topk(spark, sf):
        # index-backed BM25 exercised INCREMENTALLY: build the
        # token-bucketed lake index on half the corpus, append the
        # other half as a second slice — must still equal the direct
        # bm25_search row-for-row, so it shares that oracle SQL
        import tempfile

        from netrunner_spark.operators import retrieval
        from netrunner_spark.tables import LakeCatalog

        docs = _t(spark, sf, "documents")
                # FIXED per-(process, sf) dir, cleared each call — mkdtemp per
        # invocation leaked a full index copy into /tmp on every bench
        # rep / lazy recompute (r5 review; same fix as warc_roundtrip)
        import shutil
        _root = os.path.join(
            tempfile.gettempdir(), f"nr_si_{os.getpid()}_{_safe_tag(sf)}"
        )
        shutil.rmtree(_root, ignore_errors=True)
        cat = LakeCatalog(spark, _root)
        idx = retrieval.SearchIndex(cat, "q_si")
        idx.build(docs.filter("doc_id % 2 = 0"), n_buckets=16)
        idx.append(docs.filter("doc_id % 2 = 1"))
        queries = spark.createDataFrame(
            _BM25_QUERIES, "query_id long, query string"
        )
        return idx.topk(queries, k=10)

    def phrase_search(spark, sf):
        # exact-phrase retrieval via positional matching: one broadcast
        # join + countDistinct(qpos) full-house per candidate start
        from netrunner_spark.operators import retrieval

        phrases = spark.createDataFrame(
            [(1, "merge sort"), (2, "spark join"), (3, "batch batch")],
            "query_id long, phrase string",
        )
        return retrieval.phrase_match(_t(spark, sf, "documents"), phrases)

    def phrase_index_search(spark, sf):
        # indexed phrase search over positional postings (built half +
        # appended half) — must equal the direct phrase_search
        # row-for-row, so it shares that oracle SQL
        import tempfile

        from netrunner_spark.operators import retrieval
        from netrunner_spark.tables import LakeCatalog

        docs = _t(spark, sf, "documents")
                # FIXED per-(process, sf) dir, cleared each call — mkdtemp per
        # invocation leaked a full index copy into /tmp on every bench
        # rep / lazy recompute (r5 review; same fix as warc_roundtrip)
        import shutil
        _root = os.path.join(
            tempfile.gettempdir(), f"nr_pi_{os.getpid()}_{_safe_tag(sf)}"
        )
        shutil.rmtree(_root, ignore_errors=True)
        cat = LakeCatalog(spark, _root)
        idx = retrieval.SearchIndex(cat, "q_pi")
        idx.build(docs.filter("doc_id % 2 = 0"), n_buckets=16, positions=True)
        idx.append(docs.filter("doc_id % 2 = 1"))
        phrases = spark.createDataFrame(
            [(1, "merge sort"), (2, "spark join"), (3, "batch batch")],
            "query_id long, phrase string",
        )
        return idx.phrase(phrases)

    def search_facets(spark, sf):
        # result-page facets: distribution of the BM25 top-10 hit set
        # over (lang, source) per query — O(hits) broadcast join
        from netrunner_spark.operators import retrieval

        docs = _t(spark, sf, "documents")
        queries = spark.createDataFrame(
            _BM25_QUERIES, "query_id long, query string"
        )
        hits = retrieval.bm25_topk(docs, queries, k=10)
        return retrieval.facet_counts(hits, docs, ["lang", "source"])

    def boolean_search(spark, sf):
        # conjunctive (AND) boolean retrieval: docs containing EVERY
        # query term, ranked by total matched tf — postings ⨝
        # broadcast(query terms) + a full-house countDistinct, never an
        # m-way postings intersection join
        from netrunner_spark.operators import retrieval

        queries = spark.createDataFrame(
            _BM25_QUERIES, "query_id long, query string"
        )
        return retrieval.boolean_and(
            _t(spark, sf, "documents"), queries, k=10
        )

    def kmeans_clusters(spark, sf):
        # deterministic integer Lloyd's k-means (k=4, 2 iterations):
        # per-iteration map-only assignment against broadcast centroids
        # + one k·D-row aggregate; the corpus-organization operator
        # next to the fixed IVF quantizer
        from netrunner_spark.operators import vectors

        return vectors.kmeans_int(_t(spark, sf, "embeddings"), k=4, iters=2)

    def semdedup_prune(spark, sf):
        # SemDeDup (Abbas et al. 2023): semantic dedup inside trained
        # k-means cells — intra-cell pairs verified by exact quantized
        # dot, duplicate groups = connected components, keeper = the
        # member FARTHEST from its centroid (the paper's rule)
        from netrunner_spark.operators import vectors

        return vectors.semdedup(
            _t(spark, sf, "embeddings"), k=4, iters=2, min_dot_q=300_000
        )

    def dup_source_matrix(spark, sf):
        # cross-source duplication matrix: for every dropped near-dup,
        # which source keeps the canonical copy vs which source carried
        # the duplicate — the signal mixture planners use to decide
        # which redundant source to down-weight (text_dedup_savings
        # gives the per-source total; this gives the source×source
        # structure). dedup_clusters twin nested verbatim + one
        # documents join + one hash aggregate.
        d = _t(spark, sf, "documents")
        cl = textops.dedup_clusters(d, max_doc_id=150, max_band_df=8)
        j = cl.join(d.select("doc_id", "source", "n_chars"), "doc_id")
        keep = j.filter(F.col("is_keeper")).select(
            "cluster_id", F.col("source").alias("keeper_source")
        )
        dup = j.filter(~F.col("is_keeper")).select(
            "cluster_id", F.col("source").alias("dup_source"), "n_chars"
        )
        return (
            dup.join(keep, "cluster_id")
            .groupBy("keeper_source", "dup_source")
            .agg(
                F.count(F.lit(1)).alias("n_dups"),
                F.sum("n_chars").alias("dup_chars"),
            )
        )

    def sketch_kmv_difference(spark, sf):
        # the COMPLETE KMV set algebra over the same two user-day
        # activity sets as sketch_kmv_intersect: union-sketch members
        # classified both/a-only/b-only -> difference estimators
        # ("view-days that never purchased") + the permille Jaccard
        # resemblance, all exact int64 over two k-row synopses
        from netrunner_spark.operators import sketches

        ev = _t(spark, sf, "events").select(
            "event_type",
            F.concat_ws(
                "#",
                F.col("user_id").cast("string"),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("uday"),
        )
        return sketches.kmv_set_full(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
            key="uday",
            k=64,
        )

    def caption_consensus(spark, sf):
        # duplicate-image caption election: images sharing a content
        # key (byte-dedup groups) carry variant alt texts across
        # mirrors; majority -> shorter -> lexicographic picks ONE
        # canonical caption per group. Hash-agg votes, winner window
        # over each group's DISTINCT captions (never the raw copies)
        from netrunner_spark.operators import imageops

        img = _image_meta(spark, sf).select(
            "image_id",
            (F.col("image_id") % 40).alias("content_key"),
            F.when(
                F.col("image_id") % 4 < 2,
                F.concat(
                    F.lit("stock photo "), (F.col("image_id") % 40).cast("string")
                ),
            )
            .when(F.col("image_id") % 4 == 2, F.substring("caption", 1, 24))
            .otherwise(F.substring("caption", 1, 16))
            .alias("caption"),
        )
        return imageops.caption_consensus(img)

    def adaptive_delay_plan(spark, sf):
        # Heritrix-style adaptive politeness: next-round per-host
        # crawl delay = clamp(2 x p95 latency, 0.5s, 30s), doubled for
        # hosts erroring above 100 permille; p95 via the skew-safe
        # grouped histogram (one hash agg + per-host bin window)
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        log = ev.select(
            F.concat(
                F.lit("h"), (F.col("event_id") % 6).cast("string"), F.lit(".test")
            ).alias("host"),
            F.expr(
                "20 + event_id % 500"
                " + CASE WHEN event_id % 6 = 5 THEN 2000 ELSE 0 END"
            ).alias("latency_ms"),
            # h3.test errors on half its fetches (ids ≡3 mod 12 are
            # half of the ≡3-mod-6 host-3 stream) -> err_pm ≈ 500
            # exercises the ×2 escalation; other hosts stay ≈ 59 pm
            F.expr(
                "NOT (event_id % 17 = 0 OR event_id % 12 = 3)"
            ).alias("ok"),
        )
        return crawlintel.adaptive_delay_plan(log)

    def batch_novelty(spark, sf):
        # incremental-crawl novelty: summarize the already-cached
        # corpus' content hashes into a bloom bit table (<= k*m rows,
        # broadcast), probe this round's batch against it, report
        # per-host novel-content permille — the corpus is never joined
        # against the batch directly. The corpus holds pages 0-2; the
        # round refetches the boilerplate page 0 (dup) and crawls the
        # fresh page 3 everywhere plus page 4 on even hosts — so the
        # per-host novelty matrix is genuinely mixed (667 vs 500 pm)
        from netrunner_spark.operators import sketches

        pages = _crawl_pages(spark, sf)
        pg = F.regexp_extract("url", "/p/([0-9])", 1)
        hd = F.regexp_extract("url", "^https://h([0-9])", 1)
        corpus = pages.filter(pg.isin("0", "1", "2")).select("content_hash")
        batch = pages.filter(
            pg.isin("0", "3") | ((pg == "4") & hd.isin("0", "2", "4", "6"))
        ).select("host", "content_hash")
        return sketches.bloom_novelty(
            corpus, batch, key="content_hash", group_col="host"
        )

    def kmv_source_overlap(spark, sf):
        # pairwise segment-overlap MATRIX from per-group KMV synopses:
        # which event-type audiences (user-days) overlap, estimated
        # from G sketches of k hashes instead of G^2 distinct-joins —
        # the sketch-scale sibling of the exact cross_source_dups
        from netrunner_spark.operators import sketches

        ev = _t(spark, sf, "events").select(
            "event_type",
            F.concat_ws(
                "#",
                F.col("user_id").cast("string"),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("uday"),
        )
        return sketches.kmv_group_overlap(
            ev, key="uday", group_col="event_type", k=32
        )

    def novelty_budget_alloc(spark, sf):
        # the novelty loop closed into the budget: hosts whose batches
        # bring more NOVEL content (bloom-synopsis novelty permille)
        # win proportionally more of the next round's fetch slots via
        # the same largest-remainder apportionment the harvest budget
        # uses — batch_novelty's stage reused unchanged
        from netrunner_spark.operators import crawlintel

        nov = batch_novelty(spark, sf)
        return crawlintel.budget_alloc(nov, "novelty_pm", total=997)

    def soft_dedup_weights(spark, sf):
        # duplication-aware sampling weights: each near-dup family
        # contributes one document's probability mass (1000/m permille
        # per member) — the down-weighting alternative to hard drops,
        # composed over the SAME dedup_clusters stage as cluster_keepers
        cl = textops.dedup_clusters(
            _t(spark, sf, "documents"), max_doc_id=150, max_band_df=8
        )
        return textops.soft_dedup_weights(cl)

    def image_canonical_pairs(spark, sf):
        # the image-side END PRODUCT: one (keeper image, canonical
        # caption) training pair per near-dup cluster — composes
        # image_cluster_keepers (bytes-side decision) with
        # caption_consensus (caption-side election), both unchanged
        keepers = image_cluster_keepers(spark, sf).filter(F.col("keep"))
        cons = caption_consensus(spark, sf).select(
            "image_id", "canon_caption", "n_copies"
        )
        meta = _image_meta(spark, sf).select("image_id", "w", "h", "fmt")
        return (
            keepers.select(F.col("doc_id").alias("image_id"), "cluster_id")
            .join(cons, "image_id")
            .join(meta, "image_id")
            .select(
                "image_id", "cluster_id", "w", "h", "fmt",
                "canon_caption", "n_copies",
            )
        )

    def doc_surprisal(spark, sf):
        # CCNet-style unigram-LM quality signal in exact positive
        # int64: corpus-trained inverse-probability weights, doc score
        # = occurrence-weighted integer mean
        return textops.doc_surprisal(_t(spark, sf, "documents"))

    def cluster_balanced_sample(spark, sf):
        # mixture balancing: learned k-means clusters as sampling
        # strata — at most 50 vectors per cluster in deterministic
        # hash order. k clusters over the whole corpus are the
        # canonical MEGA-stratum (corpus/k rows per window partition),
        # so this composes the skew-safe two-level sampler (result-
        # identical to stratified_sample; same oracle)
        from netrunner_spark.operators import sampling, vectors

        a = vectors.kmeans_int(_t(spark, sf, "embeddings"), k=4, iters=2)
        return sampling.stratified_sample_skewsafe(
            a.select("vec_id", "cid"), "cid", "vec_id", 50, salt="kbal"
        ).select("vec_id", "cid", "rk")

    def bigram_pmi(spark, sf):
        # collocation mining: top-100 adjacent token pairs by
        # quantized-integer PMI (zip-with-tail bigrams, no self-join)
        return textops.bigram_pmi(_t(spark, sf, "documents"), min_count=2, k=100)

    def ann_pq_topk(spark, sf):
        # product-quantization ADC top-k: per-subspace Lloyd's
        # codebooks → m-int codes → broadcast distance tables → the
        # FAISS-style scan as pure DataFrame ops (exact int oracle)
        from netrunner_spark.operators import vectors

        return vectors.pq_topk(
            _t(spark, sf, "embeddings"), m=4, ks=4, iters=2,
            n_queries=10, k=5,
        )

    def ann_ivfpq_topk(spark, sf):
        # the full FAISS serving shape: coarse Lloyd's cells restrict
        # each query to nprobe cells; only those cells' PQ codes are
        # ADC-scanned (candidates = |corpus|·nprobe/n_cells)
        from netrunner_spark.operators import vectors

        return vectors.ivfpq_topk(
            _t(spark, sf, "embeddings"),
            n_cells=4, nprobe=2, m=4, ks=4, iters=2, n_queries=10, k=5,
        )

    def pq_index_topk(spark, sf):
        # persisted incremental PQ index: train codebooks on the build
        # half (vec_id < 100), append the rest encoded with the STORED
        # codebooks (O(delta), no retrain), ADC top-k for raw query
        # vectors — oracle trains on the same half, encodes everything
        import tempfile

        from netrunner_spark.operators.vectors import PQIndex
        from netrunner_spark.tables import LakeCatalog

        emb = _t(spark, sf, "embeddings")
                # FIXED per-(process, sf) dir, cleared each call — mkdtemp per
        # invocation leaked a full index copy into /tmp on every bench
        # rep / lazy recompute (r5 review; same fix as warc_roundtrip)
        import shutil
        _root = os.path.join(
            tempfile.gettempdir(), f"nr_pq_{os.getpid()}_{_safe_tag(sf)}"
        )
        shutil.rmtree(_root, ignore_errors=True)
        cat = LakeCatalog(spark, _root)
        idx = PQIndex(cat, "q_pq")
        idx.build(emb.filter("vec_id < 100"), m=4, ks=4, iters=2)
        idx.append(emb.filter("vec_id >= 100"))
        queries = emb.filter("vec_id < 10").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return idx.topk(queries, k=5)

    def ann_recall(spark, sf):
        # ANN quality evaluation: recall@5 of the IVF probe path vs the
        # exact brute-force ground truth, as integer percent — the
        # engine measuring its own approximate operator
        from netrunner_spark.operators import vectors

        emb = _t(spark, sf, "embeddings")
        t = vectors.brute_topk_int(emb, n_queries=10, k=5).select(
            "query_id", "neighbor_id"
        )
        a = vectors.ivf_topk(
            emb, n_centroids=8, nprobe=2, n_queries=10, k=5
        ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
        j = t.join(
            a,
            (t.query_id == a.query_id)
            & (t.neighbor_id == a.a_neighbor),
            "left",
        ).select(t.query_id, "neighbor_id", "a_neighbor")
        return j.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("k"),
            F.count("a_neighbor").alias("n_hit"),
            F.expr("count(a_neighbor) * 100 div count(1)").alias(
                "recall_pct"
            ),
        )

    def rollup_hourly(spark, sf):
        # hypertable-style continuous aggregate exercised INCREMENTALLY:
        # build hourly partials on half the events, append the other
        # half as a second slice — the merged read must equal a direct
        # GROUP BY bit-for-bit (integer-cent quantized sums)
        import tempfile

        from netrunner_spark.operators.rollup import RollupTable
        from netrunner_spark.tables import LakeCatalog

        ev = _t(spark, sf, "events")
                # FIXED per-(process, sf) dir, cleared each call — mkdtemp per
        # invocation leaked a full index copy into /tmp on every bench
        # rep / lazy recompute (r5 review; same fix as warc_roundtrip)
        import shutil
        _root = os.path.join(
            tempfile.gettempdir(), f"nr_ru_{os.getpid()}_{_safe_tag(sf)}"
        )
        shutil.rmtree(_root, ignore_errors=True)
        cat = LakeCatalog(spark, _root)
        ru = RollupTable(cat, "q_ru")
        ru.build(ev.filter("event_id % 2 = 0"))
        ru.append(ev.filter("event_id % 2 = 1"))
        return ru.read()

    def query_spell_correct(spark, sf):
        # did-you-mean: query terms map to themselves when in-vocab,
        # else to the most frequent vocab token within levenshtein 1
        # (deletion-neighborhood equi-join, broadcast query side)
        from netrunner_spark.operators import retrieval

        queries = spark.createDataFrame(
            [(1, "spark joim windoww"), (2, "mergee sort"), (3, "zzqqzz batch")],
            "query_id long, query string",
        )
        return retrieval.correct_query_terms(
            queries, _t(spark, sf, "documents")
        )

    def text_quality_gate(spark, sf):
        # the text-side admission DECISION: surprisal + bigram-LM
        # signals combined under a fixed reject-reason precedence
        # (empty → too_short → low/high_surprisal → word_salad)
        return textops.text_quality_gate(_t(spark, sf, "documents"))

    def sitemap_hints(spark, sf):
        # sitemap-protocol scheduling hints: build REAL <urlset> XML
        # per nation from customer rows (JVM concat), parse it back
        # with the Arrow-batched hint parser, map changefreq → integer
        # revisit periods; oracle derives every field in closed form
        from netrunner_spark.sources import discovery

        cust = _t(spark, sf, "customer")
        entry = F.concat(
            F.lit("<url><loc>https://s.test/c/"),
            F.col("c_custkey").cast("string"),
            F.lit("</loc><lastmod>2024-01-"),
            F.lpad(((F.col("c_custkey") % 28) + 1).cast("string"), 2, "0"),
            F.lit("</lastmod><changefreq>"),
            F.element_at(
                F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
                (F.col("c_custkey") % 3 + 1).cast("int"),
            ),
            F.lit("</changefreq><priority>0."),
            (F.col("c_custkey") % 10).cast("string"),
            F.lit("</priority></url>"),
        )
        # sitemaps are SHARDED (<=512 entries each, like the protocol's
        # own 50k-URL cap): one monolithic <urlset> per nation grew
        # linearly with SF toward the JVM string limit and parsed in 25
        # fixed straggler tasks regardless of cluster size (r5 review).
        # sort_array pins the XML bytes (collect_list order is
        # partitioning-dependent).
        sm = cust.groupBy(
            F.col("c_nationkey").alias("nk"),
            F.expr("c_custkey DIV 512").alias("shard"),
        ).agg(
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.array_join(F.sort_array(F.collect_list(entry)), ""),
                F.lit("</urlset>"),
            ).alias("xml")
        ).select(
            F.concat(
                F.lit("sm-n"),
                F.col("nk").cast("string"),
                F.lit("-"),
                F.col("shard").cast("string"),
            ).alias("sitemap_url"),
            "xml",
        )
        return discovery.hints_with_period(discovery.sitemap_hints(sm))

    def link_hits(spark, sf):
        # HITS hubs & authorities (integer fixed point, scaled-quotient
        # normalization) over the same purchase graph as link_pagerank
        from netrunner_spark.operators.graph import hits_int

        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        return hits_int(edges, iters=3)

    def spell_candidates(spark, sf):
        # SymSpell deletion-neighborhood join + exact levenshtein
        # verify: spelling-variant pairs in the corpus vocabulary,
        # never the |V|^2 cross join
        from netrunner_spark.operators import retrieval

        return retrieval.spell_candidates(
            _t(spark, sf, "documents"), min_count=2
        )

    def doc_lm_score(spark, sf):
        # interpolated bigram-LM doc scoring (CCNet's KenLM filter at
        # the corpus-trained bigram rung): transition-weighted integer
        # mean of quantized inverse probabilities
        return textops.doc_lm_score(_t(spark, sf, "documents"))

    def recrawl_priority(spark, sf):
        # freshness-driven recrawl scheduling: per-key change-rate
        # estimation from an observation log (events stands in for the
        # fetch log: user_id = url key, purchase/signup = "content
        # changed" observations), integer-micros staleness ratio
        from netrunner_spark.operators.politeness import recrawl_priority as rp

        ev = _t(spark, sf, "events").select(
            F.col("user_id").alias("key"),
            "ts",
            F.col("event_type").isin("purchase", "signup").alias("changed"),
        )
        return rp(ev, key_col="key")

    def ann_ivf_kmeans(spark, sf):
        # the train→serve composition: Lloyd's-trained coarse quantizer
        # (kmeans_centroids, k=8) feeding the IVF probe path — better-
        # balanced cells than the fixed first-k quantizer
        from netrunner_spark.operators import vectors

        emb = _t(spark, sf, "embeddings")
        cents = vectors.kmeans_centroids(emb, k=8, iters=2)
        return vectors.ivf_topk(
            emb, nprobe=2, n_queries=10, k=5, centroids=cents
        )

    def image_caption_search(spark, sf):
        # the image-axis result page: LAION-style quality gate →
        # caption BM25 top-5 per query → join back (w, h) for display;
        # the same retrieval operator, keyed on image_id/caption
        from netrunner_spark.operators import imageops, retrieval

        img = _image_meta(spark, sf)
        adm = imageops.quality_gate(img).filter("pass").select(
            "image_id", "caption"
        )
        queries = spark.createDataFrame(
            _BM25_QUERIES, "query_id long, query string"
        )
        hits = retrieval.bm25_topk(
            adm, queries, k=5, id_col="image_id", text_col="caption"
        )
        return hits.join(img.select("image_id", "w", "h"), "image_id").select(
            "query_id", "image_id", "score_q", "rk", "w", "h"
        )

    def length_percentiles(spark, sf):
        # exact linear-interpolation percentiles of doc length per lang
        # (F.percentile is the EXACT aggregate; approx_percentile is the
        # sketch path for when a single-pass estimate suffices at scale)
        d = _t(spark, sf, "documents")
        return d.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.percentile(F.col("n_chars"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("n_chars"), F.lit(0.9)).alias("p90"),
            F.percentile(F.col("n_chars"), F.lit(0.99)).alias("p99"),
        )

    def table_profile(spark, sf):
        # single-pass data-quality profile of the documents table
        d = _t(spark, sf, "documents")
        return d.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )

    def repetition_signals(spark, sf):
        # Gopher-style repeated-bigram mass per doc (exact ints)
        return textops.repetition_stats(_t(spark, sf, "documents"), n=2)

    def benchmark_contamination(spark, sf):
        # decontamination scan: train side vs a deterministic held-out
        # benchmark slice (doc_id % 10 == 0), 3-token-gram overlap
        d = _t(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 10 == 0)
        train = d.filter(F.col("doc_id") % 10 != 0)
        return textops.contamination(train, bench, n=3)

    def user_sessions(spark, sf):
        # gap-based sessionization (30-min): per-session aggregates in
        # exact ints (epoch micros, cents) for oracle parity
        from netrunner_spark.operators.temporal import sessionize

        s = sessionize(_t(spark, sf, "events"), gap_minutes=30)
        return s.groupBy("user_id", "session_no").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("first_us"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_us"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )

    def asof_view_before_purchase(spark, sf):
        # as-of join from composition (union-tag + last ignorenulls):
        # each purchase gets the most recent view at ts <= purchase ts;
        # oracle is DuckDB's NATIVE ASOF LEFT JOIN — a true differential
        from netrunner_spark.operators.temporal import asof_join

        ev = _t(spark, sf, "events")
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        views = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("view_event_id"))
        )
        out = asof_join(
            purchases, views, on="user_id", ts_col="ts",
            right_value_cols=["view_event_id"],
        )
        return out.select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "view_event_id",
        )

    def value_interval_join(spark, sf):
        # bucketed range join (points in [lo, hi)) vs the naive
        # inequality join the oracle runs — same rows, O(2x) not O(n*m)
        from netrunner_spark.operators.temporal import interval_join

        ev = _t(spark, sf, "events").select("event_id", "value")
        nat = _t(spark, sf, "nation").select(
            "n_nationkey",
            (F.col("n_nationkey") * 15.0).alias("lo"),
            (F.col("n_nationkey") * 15.0 + 25.0).alias("hi"),
        )
        return interval_join(ev, nat, "value", "lo", "hi", bucket_width=25.0).select(
            "event_id", "n_nationkey"
        )

    def robots_parse(spark, sf):
        # S3 front half: REAL robots.txt text (built deterministically
        # from the nation table) through the relational parser; the
        # oracle derives the expected rules independently
        from netrunner_spark.sources.robots import parse_robots

        nat = _t(spark, sf, "nation")
        host = F.concat(
            F.lower(F.regexp_replace("n_name", " ", "-")), F.lit(".test")
        )
        k = F.col("n_nationkey")
        txt = F.concat(
            F.lit("# synthetic\nUser-agent: *\nDisallow: /private/*\n"),
            F.when(k % 3 == 0, F.lit("Allow: /private/ok*\n")).otherwise(F.lit("")),
            F.when(
                k % 2 == 0,
                F.concat(
                    F.lit("Crawl-delay: "), (k % 5 + 1).cast("string"), F.lit("\n")
                ),
            ).otherwise(F.lit("")),
            F.when(
                k % 4 != 3,
                F.concat(F.lit("Sitemap: https://"), host, F.lit("/sm.xml\n")),
            ).otherwise(F.lit("")),
        )
        parsed = parse_robots(nat.select(host.alias("host"), txt.alias("robots_txt")))
        return parsed.select(
            "host",
            "directive",
            "path_pattern",
            "crawl_delay",
            F.size("sitemaps").alias("n_sitemaps"),
        )

    def x2_html_parse(spark, sf):
        # X2/X3: real HTML (built from documents) through the stdlib
        # parser; og:description must beat meta description (X3)
        from netrunner_spark.parser.udf import parse_pages

        docs = _t(spark, sf, "documents")
        d = F.col("doc_id").cast("string")
        # X3 precedence (meta description > og:description, mod.rs:196-220):
        # docs %4==0 carry ONLY og:description → the fallback must fire
        desc_tag = F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit('<meta property="og:description" content="og '),
                d,
                F.lit('">'),
            ),
        ).otherwise(
            F.concat(
                F.lit('<meta name="description" content="meta '), d, F.lit('">')
            )
        )
        html = F.concat(
            F.lit("<html><head><title>Doc "),
            d,
            F.lit("</title>"),
            desc_tag,
            F.lit("</head><body><p>body</p></body></html>"),
        )
        pages = docs.select(
            F.concat(F.lit("https://docs.test/"), d).alias("url"),
            html.alias("content"),
            "doc_id",
        )
        parsed = parse_pages(pages.select("url", "content"))
        return parsed.join(pages.select("url", "doc_id"), "url").select(
            "doc_id", "title", "description"
        )

    def f3_seed_classification(spark, sf):
        from netrunner_spark.operators.admission import seeds_to_frontier

        part = _t(spark, sf, "part")
        key = F.col("p_partkey").cast("string")
        raw = (
            F.when(F.col("p_partkey") % 5 == 0, F.concat(F.lit("p"), key, F.lit(".test")))
            .when(
                F.col("p_partkey") % 3 == 0,
                F.concat(F.lit("https://p"), key, F.lit(".test/x$")),
            )
            .otherwise(F.concat(F.lit("https://p"), key, F.lit(".test/pre")))
        )
        seeds = part.select(raw.alias("raw")).select(
            F.when(F.col("raw").endswith("$"), F.expr("substring(raw, 1, length(raw)-1)"))
            .otherwise(F.col("raw"))
            .alias("seed"),
            F.when(~F.col("raw").startswith("http"), "domain")
            .when(F.col("raw").endswith("$"), "exact")
            .otherwise("prefix")
            .alias("kind"),
        )
        return seeds_to_frontier(seeds).select("url", "kind", "skip_discovery")

    def s4_sitemap_closure(spark, sf):
        # nested sitemap BFS over a 3-level index built from
        # region→nation→customer; only even regions hang off the root,
        # so reachability is real (W2/S4)
        from netrunner_spark.sources.discovery import sitemap_bfs

        region = _t(spark, sf, "region")
        nation = _t(spark, sf, "nation")
        cust = _t(spark, sf, "customer")
        sm = F.lit("sitemap")
        level1 = region.filter(F.col("r_regionkey") % 2 == 0).select(
            F.lit("root.xml").alias("sitemap_url"),
            sm.alias("entry_type"),
            F.concat(F.lit("sm-r"), F.col("r_regionkey").cast("string")).alias("loc"),
        )
        level2 = nation.select(
            F.concat(F.lit("sm-r"), F.col("n_regionkey").cast("string")).alias(
                "sitemap_url"
            ),
            sm.alias("entry_type"),
            F.concat(F.lit("sm-n"), F.col("n_nationkey").cast("string")).alias("loc"),
        )
        level3 = cust.select(
            F.concat(F.lit("sm-n"), F.col("c_nationkey").cast("string")).alias(
                "sitemap_url"
            ),
            F.lit("url").alias("entry_type"),
            F.concat(
                F.lit("https://t.test/c/"), F.col("c_custkey").cast("string")
            ).alias("loc"),
        )
        sitemaps = level1.unionByName(level2).unionByName(level3)
        roots = spark.createDataFrame([("root.xml",)], "sitemap_url string")
        return sitemap_bfs(sitemaps, roots)

    def lsh_bucket_sizes(spark, sf):
        b = vectors.srp_bucket(_t(spark, sf, "embeddings"))
        return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))

    def _safe_tag(sf: str) -> str:
        return "".join(c if c.isalnum() else "_" for c in str(sf))

    def _warc_docs(spark, sf):
        """Deterministic ArchiveRecords from documents: every 10th doc is
        a connection failure (status NULL — K3 must skip it), the rest
        roundtrip through real WARC bytes."""
        docs = _t(spark, sf, "documents")
        d = F.col("doc_id").cast("string")
        return docs.select(
            "doc_id",
            F.concat(F.lit("https://w.test/doc/"), d).alias("url"),
            F.when(F.col("doc_id") % 10 == 0, F.lit(None))
            .otherwise(F.when(F.col("doc_id") % 7 == 3, 404).otherwise(200))
            .cast("int")
            .alias("status"),
            F.array(
                F.struct(
                    F.lit("content-type").alias("name"),
                    F.lit("text/html").alias("value"),
                )
            ).alias("headers"),
            # body contains a blank line — the reader must not split on it
            F.concat(
                F.lit("payload "), d, F.lit("\n\nsecond "),
                (F.col("doc_id") % 7).cast("string"),
            ).alias("content"),
        )

    def warc_roundtrip(spark, sf):
        # K3→S10: records → real gzip'd WARC bytes on disk → reader →
        # parsed fields. The oracle derives every field in closed form;
        # the Spark side must REPRODUCE them through the actual bytes.
        # A FIXED per-(process, sf) dir, overwritten each call: mkdtemp
        # per invocation leaked a gzip'd corpus into /tmp on every run
        # (bench runs each headline query twice; lazy recomputes re-export)
        import shutil
        import tempfile

        from netrunner_spark.sources.warc import warc_export, warc_read

        recs = _warc_docs(spark, sf)
        out = os.path.join(
            tempfile.gettempdir(), f"nr_warc_q_{os.getpid()}_{_safe_tag(sf)}"
        )
        shutil.rmtree(out, ignore_errors=True)
        warc_export(recs, out, single_file=True).collect()  # run the export
        back = warc_read(spark, out)
        return back.select(
            "url",
            "status",
            F.size("headers").alias("n_headers"),
            F.length("content").alias("content_len"),
            F.substring("content", 1, 12).alias("head12"),
        )

    def a6_compression_ratio(spark, sf):
        # A6 (archive.rs:160-187): exact raw-byte accounting + skip
        # count from the export manifest; the gzip'd size can't be
        # derived in closed form, so the oracle checks it as a bound.
        import shutil
        import tempfile

        from netrunner_spark.sources.warc import warc_export

        recs = _warc_docs(spark, sf)
        out = os.path.join(
            tempfile.gettempdir(), f"nr_warc_a6_{os.getpid()}_{_safe_tag(sf)}"
        )
        shutil.rmtree(out, ignore_errors=True)
        m = warc_export(recs, out, single_file=True)
        return m.select(
            "n_records",
            "n_skipped",
            "bytes_raw",
            (
                (F.col("compression_ratio") > 0)
                & (F.col("compression_ratio") < 1)
                & (F.col("bytes_written") < F.col("bytes_raw"))
            ).alias("ratio_bounded"),
        )

    def mirror_hosts(spark, sf):
        from netrunner_spark.operators import crawlintel

        return crawlintel.mirror_hosts(
            _crawl_pages(spark, sf), min_shared=3, max_hash_df=4
        )

    def dust_params(spark, sf):
        from netrunner_spark.operators import crawlintel

        return crawlintel.dust_params(_crawl_pages(spark, sf))

    def host_harvest(spark, sf):
        from netrunner_spark.operators import crawlintel

        return crawlintel.host_harvest(_crawl_pages(spark, sf))

    def crawl_budget_alloc(spark, sf):
        from netrunner_spark.operators import crawlintel

        stats = crawlintel.host_harvest(_crawl_pages(spark, sf))
        return crawlintel.budget_alloc(stats, "harvest_permille", total=997)

    def redirect_resolve(spark, sf):
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        nodes = (
            ev.select((F.col("event_id") % 60).alias("n"))
            .dropDuplicates()
            .filter(F.col("n") % 10 != 0)
        )
        edges = nodes.select(
            F.col("n").alias("src"),
            F.when(F.col("n") == 41, F.lit(49)).otherwise(F.col("n") - 1).alias("dst"),
        )
        return crawlintel.resolve_redirects(edges, max_hops=12)

    def sitemap_diff(spark, sf):
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        url = F.concat(
            F.lit("https://h"),
            (F.col("user_id") % 8).cast("string"),
            F.lit(".test/s/"),
            (F.col("event_id") % 200).cast("string"),
        ).alias("url")
        day = (F.col("event_id") % 37).cast("long")
        old = (
            ev.filter(F.col("event_id") % 7 != 0)
            .select(url, day.alias("day"))
            .groupBy("url")
            .agg(F.max("day").alias("lastmod"))
        )
        new = (
            ev.filter(F.col("event_id") % 5 != 0)
            .select(
                url,
                (
                    day
                    + F.when(F.col("event_id") % 11 == 0, F.lit(3)).otherwise(F.lit(0))
                ).alias("day"),
            )
            .groupBy("url")
            .agg(F.max("day").alias("lastmod"))
        )
        return crawlintel.sitemap_diff(old, new)

    def recrawl_schedule(spark, sf):
        # Revisit history synth: 200 URLs, visit_no = event_id DIV 200;
        # url class (url_id % 4) changes content every 1st/3rd/never/10th
        # visit. Exercises all next_interval branches: min-clamp,
        # mid-range, max (never changes), and base (single visit) when
        # the tail url_ids get only one visit at tiny SFs.
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        visits = ev.select(
            F.expr(
                "concat('https://h', CAST((event_id % 200) % 8 AS STRING),"
                " '.test/p/', CAST(event_id % 200 AS STRING))"
            ).alias("url"),
            F.expr("event_id DIV 200").alias("visit_no"),
            F.md5(
                F.expr(
                    "CASE CAST((event_id % 200) % 4 AS INT)"
                    " WHEN 0 THEN concat('u', CAST(event_id % 200 AS STRING), '-',"
                    "   CAST(event_id DIV 200 AS STRING))"
                    " WHEN 1 THEN concat('u', CAST(event_id % 200 AS STRING), '-',"
                    "   CAST((event_id DIV 200) DIV 3 AS STRING))"
                    " WHEN 2 THEN concat('u', CAST(event_id % 200 AS STRING))"
                    " ELSE concat('u', CAST(event_id % 200 AS STRING), '-',"
                    "   CAST((event_id DIV 200) DIV 10 AS STRING)) END"
                )
            ).alias("content_hash"),
        )
        return crawlintel.change_rate_plan(visits)

    def url_templates(spark, sf):
        from netrunner_spark.operators import crawlintel

        return crawlintel.url_path_templates(_path_pages(spark, sf))

    def template_cap_apply(spark, sf):
        # the template loop CLOSED: mine unbounded templates, then cap
        # each (host, template) id-space at 3 URLs by md5 order — the
        # apply_dust_rules pattern for the path axis
        from netrunner_spark.operators import crawlintel

        pages = _path_pages(spark, sf)
        verdicts = crawlintel.url_path_templates(pages)
        return crawlintel.apply_template_caps(pages, verdicts, cap=3)

    def host_health(spark, sf):
        # Fetch-log synth: h0 ~25% 5xx (4x backoff), h1 ~8% 5xx (2x),
        # h7 +600ms latency (all-slow, 4x), the rest healthy (1x).
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        log = ev.select(
            F.expr("concat('h', CAST(user_id % 8 AS STRING), '.test')").alias("host"),
            F.expr(
                "CASE WHEN event_id % (CASE CAST(user_id % 8 AS INT)"
                " WHEN 0 THEN 4 WHEN 1 THEN 12 ELSE 50 END) = 0 THEN 503"
                " WHEN event_id % 17 = 0 THEN 404 ELSE 200 END"
            ).alias("status"),
            F.expr(
                "40 + (event_id % 11) * 37"
                " + CASE WHEN user_id % 8 = 7 THEN 600 ELSE 0 END"
            ).alias("latency_ms"),
        )
        return crawlintel.host_health(log)

    def boilerplate_strip(spark, sf):
        from netrunner_spark.operators import textops

        return textops.boilerplate_strip(_t(spark, sf, "documents"))

    def crawl_policy_table(spark, sf):
        # THE operational table: cache intelligence (harvest/mirror/trap
        # -> budget) joined with fetch telemetry (error/latency ->
        # backoff); a health-degraded host's round allocation shrinks by
        # its backoff factor. Composed by CALLING the two constituent
        # queries, so this cannot drift from them.
        r = host_crawl_report(spark, sf)
        h = host_health(spark, sf)
        return (
            r.join(h.select("host", "backoff", "crawl_delay_ms"), "host", "left")
            .select(
                "host",
                "harvest_permille",
                "is_trap",
                "mirror_secondary",
                "alloc",
                F.coalesce("backoff", F.lit(1)).cast("long").alias("backoff"),
                F.coalesce("crawl_delay_ms", F.lit(500)).cast("long").alias(
                    "crawl_delay_ms"
                ),
            )
            .withColumn("eff_alloc", F.expr("alloc DIV backoff"))
        )

    def split_leakage(spark, sf):
        # the decontamination AUDIT: near-dup pairs whose members land
        # in DIFFERENT hash-split buckets are train/test leakage. Pairs
        # and split are the SAME operators (same params) as their
        # standalone queries, so the audit pins their composition.
        from netrunner_spark.operators.sampling import hash_split

        d = _t(spark, sf, "documents")
        pairs = textops.minhash_lsh_pairs(
            d, max_doc_id=150, max_band_df=8
        ).select("doc_a", "doc_b")
        split = hash_split(d, "doc_id").select("doc_id", "split")
        sa = split.select(
            F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
        )
        sb = split.select(
            F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
        )
        return (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .withColumn("leaky", F.col("split_a") != F.col("split_b"))
        )

    def robots_refetch_plan(spark, sf):
        # RFC 9309 robots-cache revalidation: hosts h0..h9 have robots
        # aged id*20000s (stale past the 86400 TTL from h5 up); the
        # active set is h0..h10, so h10 (never fetched) must refetch too
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        meta = (
            ev.select(
                F.expr("concat('h', CAST(user_id % 10 AS STRING))").alias("host"),
                F.expr("1000000 - (user_id % 10) * 20000").alias("fetched_at"),
            )
            .groupBy("host")
            .agg(F.max("fetched_at").alias("fetched_at"))
        )
        active = ev.filter(F.col("event_id") % 12 <= 10).select(
            F.expr("concat('h', CAST(event_id % 12 AS STRING))").alias("host")
        )
        return crawlintel.robots_revalidation(
            meta, active, now_s=1_000_000, ttl_s=86400
        )

    def drain_eta_report(spark, sf):
        # how many rounds until each host's queue drains at its
        # health-adjusted allocation — the starvation audit over the
        # SAME report/policy compositions as their standalone queries
        r = host_crawl_report(spark, sf).select("host", "n_urls")
        p = crawl_policy_table(spark, sf).select("host", "eff_alloc")
        j = r.join(p, "host")
        rounds = F.when(
            F.col("eff_alloc") > 0,
            F.expr("(n_urls + eff_alloc - 1) DIV eff_alloc"),
        ).cast("long")
        return j.select(
            "host",
            "n_urls",
            "eff_alloc",
            rounds.alias("rounds_to_drain"),
            (rounds.isNull() | (rounds > 10)).alias("starved"),
        )

    def warc_cdx_index(spark, sf):
        # the CDX(J) index for archives WE write: SURT urlkeys over a
        # multi-label host (label reversal exercised), query strings on
        # every 5th capture, per-file byte offsets from the (ts, url,
        # digest) writer order; ts = event_id DIV 4 is unique per file
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        rec = ev.select(
            F.expr(
                "concat('https://h', CAST(event_id % 8 AS STRING), '.sub.test/p/',"
                " CAST(event_id % 50 AS STRING),"
                " CASE WHEN event_id % 5 = 0"
                " THEN concat('?x=', CAST(event_id % 3 AS STRING)) ELSE '' END)"
            ).alias("url"),
            F.expr("event_id DIV 4").alias("ts"),
            F.md5(F.expr("concat('d', CAST(event_id % 97 AS STRING))")).alias(
                "digest"
            ),
            F.expr("100 + event_id % 900").alias("n_bytes"),
            (F.col("event_id") % 4).alias("file_id"),
        )
        return crawlintel.cdx_index(rec)

    def host_triangles(spark, sf):
        # per-node triangle counts over a 30-node synthetic link graph —
        # the clustering-coefficient numerator next to LPA communities
        from netrunner_spark.operators.graph import triangle_count

        ev = _t(spark, sf, "events")
        # ring + chord: {x, x+1} and {x, x+2} edges -> every consecutive
        # triple (x, x+1, x+2) is a triangle (30 in total, 3 per node).
        # The family bit comes from event_id DIV 30 so it is independent
        # of x = event_id % 30 (e % 2 would correlate with x's parity
        # and leave each node only ONE family -> a triangle-free graph).
        edges = ev.select(
            (F.col("event_id") % 30).alias("src"),
            F.expr("(event_id % 30 + 1 + (event_id DIV 30) % 2) % 30").alias("dst"),
        )
        return triangle_count(edges)

    def link_kcore(spark, sf):
        # 2-core extraction: pendant chains (ring node -> 200+i -> 230+i)
        # peel away in two rounds, the ring+chord heart survives intact
        from netrunner_spark.operators.graph import k_core

        ev = _t(spark, sf, "events")
        edges = ev.select(
            F.expr(
                "CASE (event_id DIV 30) % 4"
                " WHEN 0 THEN event_id % 30"
                " WHEN 1 THEN event_id % 30"
                " WHEN 2 THEN (event_id % 30) % 10"
                " ELSE 200 + (event_id % 30) % 10 END"
            ).alias("src"),
            F.expr(
                "CASE (event_id DIV 30) % 4"
                " WHEN 0 THEN (event_id % 30 + 1) % 30"
                " WHEN 1 THEN (event_id % 30 + 2) % 30"
                " WHEN 2 THEN 200 + (event_id % 30) % 10"
                " ELSE 230 + (event_id % 30) % 10 END"
            ).alias("dst"),
        )
        return k_core(edges, k=2)

    def recrawl_budget(spark, sf):
        # the recrawl round's fetch budget: hosts weighted by how many
        # of their URLs are DUE FAST (estimated recrawl interval within
        # a day), split exactly by the same Hamilton apportionment as
        # the crawl budget; composes the freshness estimator with the
        # allocator, twins nested verbatim
        from netrunner_spark.operators import crawlintel

        plan = recrawl_schedule(spark, sf)
        due = plan.filter(F.col("next_interval_s") <= 86400).select(
            F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host")
        )
        counts = due.groupBy("host").agg(F.count(F.lit(1)).alias("n_due"))
        return crawlintel.budget_alloc(counts, "n_due", total=500)

    def clustering_coeff(spark, sf):
        # the ring+chord graph plus a 10-spoke hub whose neighborhood is
        # partially interconnected: hub coefficient sits between the
        # tight ring nodes and an organic star's 0
        from netrunner_spark.operators.graph import clustering_coefficient

        ev = _t(spark, sf, "events")
        base = ev.select(
            (F.col("event_id") % 30).alias("src"),
            F.expr("(event_id % 30 + 1 + (event_id DIV 30) % 2) % 30").alias("dst"),
        )
        hub = ev.filter(F.col("event_id") % 7 == 0).select(
            F.lit(100).cast("long").alias("src"),
            (F.col("event_id") % 10).alias("dst"),
        )
        return clustering_coefficient(base.unionByName(hub))

    def quality_mixture(spark, sf):
        # quality-weighted training mix (the DCLM/CCNet head-middle-tail
        # recipe): the corpus's own unigram-LM surprisal bands replace
        # the source column, so the mix upweights the fluent center band
        # over boilerplate (low) and rare-token noise (high). Same
        # mixture_plan operator as the standalone query; twin nests the
        # doc_surprisal oracle.
        from netrunner_spark.operators.sampling import mixture_plan

        d = _t(spark, sf, "documents")
        s = textops.doc_surprisal(d).select("doc_id", "surprisal_q")
        tier = (
            F.when(F.col("surprisal_q") < 30000, "low")
            .when(F.col("surprisal_q") <= 31000, "mid")
            .otherwise("high")
        )
        tiers = d.join(s, "doc_id").select(tier.alias("source"), "text")
        targets = spark.createDataFrame(
            [("mid", 700), ("low", 200), ("high", 100)],
            "source string, target_permille long",
        )
        return mixture_plan(tiers, targets, token_budget=1_000_000)

    def seed_distance(spark, sf):
        # min-hop BFS distance from the seed set over a 50-node ring
        # with seeds {0, 25}: hops = ring distance, capped at 6 levels
        # (nodes farther than 6 from both seeds are absent)
        from netrunner_spark.operators.graph import bfs_hops

        ev = _t(spark, sf, "events")
        edges = ev.select(
            (F.col("event_id") % 50).alias("src"),
            ((F.col("event_id") % 50 + 1) % 50).alias("dst"),
        )
        seeds = spark.createDataFrame([(0,), (25,)], "id long")
        return bfs_hops(edges, seeds, max_hops=6)

    def _ring_edges(spark, sf):
        # the bfs_hops 50-node directed ring — multi-hop growth so the
        # ball genuinely expands each round (t+1 nodes after t hops)
        ev = _t(spark, sf, "events")
        return ev.select(
            (F.col("event_id") % 50).alias("src"),
            ((F.col("event_id") % 50 + 1) % 50).alias("dst"),
        )

    def graph_hyperball(spark, sf):
        # HyperBall (Boldi & Vigna 2013) register table after 3 rounds:
        # per-node HLL sketch of the 3-hop out-ball — THE web-scale
        # distance-analytics primitive (one join + one hash agg per
        # round, ≤ |V|·m rows of state; exact all-pairs BFS is
        # impossible at 10^10 nodes). Integer registers → exact oracle.
        from netrunner_spark.operators.graph import hyperball_registers

        return hyperball_registers(_ring_edges(spark, sf), iters=3, p=4)

    def graph_hyperball_nf(spark, sf):
        # neighborhood function per node and radius t=0..3: occupied
        # registers + the exact integer harmonic-mean denominator; the
        # float ball-size estimate is a consumer-side division, so the
        # oracle surface stays pure int64
        from netrunner_spark.operators.graph import hyperball_nf

        return hyperball_nf(_ring_edges(spark, sf), iters=3, p=4)

    def graph_ball_sizes(spark, sf):
        # exact out-ball sizes (the quadratic diagnostic HyperBall
        # replaces) — small-scale ground truth for the estimator eval
        from netrunner_spark.operators.graph import ball_sizes_exact

        return ball_sizes_exact(_ring_edges(spark, sf), iters=3)

    def _rich_edges(spark, sf):
        # ring-20 + chords (+7 skip for event_id%4==0) — enough hop
        # variety that harmonic centrality differs across nodes
        ev = _t(spark, sf, "events")
        ring = ev.select(
            (F.col("event_id") % 20).alias("src"),
            ((F.col("event_id") + 1) % 20).alias("dst"),
        )
        chords = ev.filter(F.col("event_id") % 4 == 0).select(
            (F.col("event_id") % 20).alias("src"),
            ((F.col("event_id") + 7) % 20).alias("dst"),
        )
        return ring.unionByName(chords)

    def graph_harmonic_centrality(spark, sf):
        # truncated harmonic centrality HC_3(v) = Σ Δball/t, scaled by
        # lcm(1..3)=6 to stay pure int64 — the centrality HyperBall
        # estimates at 10^10 nodes (Boldi & Vigna 2014); the exact
        # closure is the small-scale ground truth the estimate is
        # judged against
        from netrunner_spark.operators.graph import harmonic_centrality_exact

        return harmonic_centrality_exact(_rich_edges(spark, sf), iters=3)

    def graph_neighborhood_function(spark, sf):
        # graph-level NF(t) + integerized cumulative-reach fraction:
        # the effective-diameter curve (first t with frac_e6 ≥ 900000)
        from netrunner_spark.operators.graph import (
            neighborhood_function_exact,
        )

        return neighborhood_function_exact(_rich_edges(spark, sf), iters=3)

    def graph_random_walks(spark, sf):
        # DeepWalk corpus generation (Perozzi et al. 2014): 2 walks of
        # length 4 from every node — walks are the token sequences a
        # graph-embedding trainer consumes; next hop is the
        # argmin-of-md5 deterministic uniform draw, one join + one agg
        # per step (state = |walks| rows at any moment)
        from netrunner_spark.operators.graph import random_walks

        return random_walks(
            _rich_edges(spark, sf), walk_len=4, walks_per_node=2
        )

    def graph_skipgram_pairs(spark, sf):
        # word2vec training pairs from the DeepWalk corpus (Perozzi et
        # al. 2014 §4.2): one self-equi-join on walk_id with a bounded
        # step band (≤2·window rows per position) + one hash agg
        from netrunner_spark.operators.graph import (
            random_walks,
            skipgram_pairs,
        )

        walks = random_walks(
            _rich_edges(spark, sf), walk_len=4, walks_per_node=2
        )
        return skipgram_pairs(walks, window=2)

    def graph_neighbor_sample(spark, sf):
        # GraphSAGE fan-out capping: keep 3 deterministic-uniform out-
        # neighbors per node, the minibatch prep for GNN training on a
        # web graph where hub fan-out is unbounded
        from netrunner_spark.operators.graph import neighbor_sample

        return neighbor_sample(_rich_edges(spark, sf), k=3)

    def reach_budget_alloc(spark, sf):
        # the HyperBall loop closed into the fetch budget: hosts whose
        # 2-hop out-ball is larger open more of the frontier, so they
        # earn proportionally more Hamilton-apportioned slots — the
        # reach analog of opic_budget_alloc. Weight stays exact int64:
        # m·2^rmax − denom is monotone in the HLL ball estimate
        # (estimate = α·m²·2^rmax / denom), and the 30-bit shift keeps
        # total·weight far from overflow for budgets ≤ 10^6.
        from netrunner_spark.operators import crawlintel
        from netrunner_spark.operators.graph import hyperball_nf

        p = 4
        m, rmax = 1 << p, 52 - p + 1
        nf = hyperball_nf(_rich_edges(spark, sf), iters=2, p=p)
        stats = nf.filter(F.col("t") == 2).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            F.expr(
                f"CAST(({m * (1 << rmax)} - denom) DIV {1 << 30} AS BIGINT)"
            ).alias("reach_w"),
        )
        return crawlintel.budget_alloc(stats, "reach_w", total=997)

    def image_curation_pipeline(spark, sf):
        # the image-axis curation decision (text curation_pipeline's
        # sibling): LAION metadata gate ∧ near-dup keeper (highest
        # resolution per cluster) ∧ caption-boilerplate drop → admitted
        # + first rejecting stage; every stage is the SAME callable as
        # its standalone driver query
        gate = image_quality_gate(spark, sf).select(
            "image_id",
            F.col("admitted").alias("q_pass"),
            F.col("reject_reason").alias("q_reason"),
        )
        keep = image_cluster_keepers(spark, sf).select(
            F.col("doc_id").alias("image_id"), "keep"
        )
        boiler = caption_boilerplate(spark, sf).select("image_id", "boilerplate")
        cand = _image_meta(spark, sf).filter(F.col("image_id") < 150).select(
            "image_id"
        )
        j = (
            cand.join(gate, "image_id", "left")
            .join(keep, "image_id", "left")
            .join(boiler, "image_id", "left")
        )
        stage = (
            F.when(~F.col("q_pass"), F.concat(F.lit("quality:"), F.col("q_reason")))
            .when(~F.coalesce(F.col("keep"), F.lit(True)), F.lit("duplicate"))
            .when(
                F.coalesce(F.col("boilerplate"), F.lit(False)),
                F.lit("boilerplate_caption"),
            )
            .otherwise(F.lit(None).cast("string"))
        )
        return j.select(
            "image_id",
            stage.isNull().alias("admitted"),
            stage.alias("reject_stage"),
        )

    def anchor_text_topk(spark, sf):
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        links = ev.select(
            F.concat(
                F.lit("https://t.test/d/"), (F.col("event_id") % 40).cast("string")
            ).alias("dst"),
            F.concat(
                F.col("event_type"), F.lit(" page"), (F.col("user_id") % 5).cast("string")
            ).alias("anchor"),
        )
        return crawlintel.anchor_text_topk(links, k=3)

    def link_spam_hosts(spark, sf):
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        is_farm = F.col("event_id") % 4 == 0
        links = ev.select(
            F.when(is_farm, F.lit("farm.test"))
            .otherwise(
                F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"), F.lit(".test"))
            )
            .alias("src_host"),
            F.when(is_farm, F.lit("spam.test"))
            .otherwise(
                F.concat(F.lit("d"), (F.col("event_id") % 6).cast("string"), F.lit(".test"))
            )
            .alias("dst_host"),
        )
        return crawlintel.link_spam_hosts(links)

    def cdc_chunks(spark, sf):
        return textops.cdc_chunks(_t(spark, sf, "documents"))

    def pack_sequences(spark, sf):
        # pretraining concat-and-slice packing plan: 4 independent
        # bucket streams, 256-token context windows
        from netrunner_spark.operators.sampling import pack_sequences as _pack

        return _pack(
            _t(spark, sf, "documents"), context_len=256, n_buckets=4
        )

    def mixture_plan(spark, sf):
        # training-mix planning: 4 weighted sources, the rest excluded;
        # repeat_permille is the per-source epochs dial
        from netrunner_spark.operators.sampling import mixture_plan as _mix

        targets = spark.createDataFrame(
            [("src0", 400), ("src1", 300), ("src2", 200), ("src3", 100)],
            "source string, target_permille long",
        )
        return _mix(_t(spark, sf, "documents"), targets, token_budget=1000000)

    def link_authority_report(spark, sf):
        # anti-spam authority: link-farm targets flagged by top-source
        # concentration, their inbound edges dropped BEFORE the integer
        # PageRank recurrence — the composed spam-resistant host ranking
        from netrunner_spark.operators import crawlintel
        from netrunner_spark.operators.graph import pagerank_int

        ev = _t(spark, sf, "events")
        m4 = F.col("event_id") % 4 == 0
        links = ev.select(
            F.when(m4, F.lit(50))
            .otherwise(F.col("user_id") % 10)
            .cast("long")
            .alias("src_host"),
            F.when(m4, F.lit(150))
            .otherwise(F.lit(100) + F.col("event_id") % 6)
            .cast("long")
            .alias("dst_host"),
        )
        flags = crawlintel.link_spam_hosts(links)
        farms = flags.filter("is_link_farm").select("dst_host")
        clean = links.join(farms, "dst_host", "left_anti")
        ranks = pagerank_int(
            clean.select(
                F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
            ),
            iters=3,
        )
        return ranks.join(
            flags.select(F.col("dst_host").alias("id"), "is_link_farm"),
            "id",
            "left",
        ).select(
            "id",
            "rank_e12",
            F.coalesce("is_link_farm", F.lit(False)).alias("is_link_farm"),
        )

    def phash_radius_search(spark, sf):
        # the dedup SERVICE path: given query signatures (3 planted
        # 2-bit perturbations of corpus signatures), find every corpus
        # member within hamming radius 2 via broadcast band probes —
        # the per-ingest lookup vs hamming_near_dups' batch sweep
        from netrunner_spark.operators.textops import hamming_radius_search

        sigs = textops.simhash(_t(spark, sf, "documents"), max_doc_id=150)
        queries = sigs.filter(F.col("doc_id").isin(5, 17, 42)).select(
            (F.col("doc_id") + 1000).alias("query_id"),
            F.expr("simhash ^ 3L").alias("qsig"),
        )
        return hamming_radius_search(
            sigs, queries, bits=16, bands=4, max_hamming=2
        )

    def winnow_dups(spark, sf):
        # MOSS winnowing fingerprints shared across documents — the
        # density-bounded dedup signature (guarantee: any shared run of
        # >= n + window - 1 tokens surfaces here)
        from netrunner_spark.operators.textops import winnow_fingerprints

        fps = winnow_fingerprints(_t(spark, sf, "documents"), n=4, window=5)
        return (
            fps.groupBy("fp_hash")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occurrences"),
            )
            .filter(F.col("n_docs") >= 2)
        )

    def dedup_eval(spark, sf):
        # dedup-quality measurement: the capped MinHash-LSH candidate
        # pairs scored against exact n-gram Jaccard ground truth (same
        # stage configs as their standalone queries) — the P/R dial a
        # pipeline tunes bands/rows/caps against. Truth bar 20‰ sits at
        # this synthetic corpus's p99 (its max pairwise Jaccard is 71‰;
        # a web corpus would use 500-800‰)
        truth = (
            jaccard_pairs_capped(spark, sf)
            .filter(
                F.expr("n_common * 1000 >= 20 * (grams_a + grams_b - n_common)")
            )
            .select("doc_a", "doc_b")
            .withColumn("t", F.lit(1))
        )
        pred = (
            minhash_lsh_capped(spark, sf)
            .select("doc_a", "doc_b")
            .withColumn("p", F.lit(1))
        )
        lab = truth.join(pred, ["doc_a", "doc_b"], "full_outer").select(
            F.coalesce("t", F.lit(0)).alias("t"),
            F.coalesce("p", F.lit(0)).alias("p"),
        )
        return lab.agg(
            F.sum("t").alias("n_truth"),
            F.sum("p").alias("n_pred"),
            F.sum(F.col("t") * F.col("p")).alias("n_tp"),
            F.expr(
                "CAST(sum(t * p) * 1000 DIV greatest(sum(p), 1) AS BIGINT)"
            ).alias("precision_permille"),
            F.expr(
                "CAST(sum(t * p) * 1000 DIV greatest(sum(t), 1) AS BIGINT)"
            ).alias("recall_permille"),
        )

    def mixture_apply(spark, sf):
        # the mix materialized: whole epochs + a hash-deterministic
        # fractional-epoch lottery per doc; zero-weight sources vanish
        from netrunner_spark.operators.sampling import apply_mixture, mixture_plan

        targets = spark.createDataFrame(
            [("src0", 400), ("src1", 300), ("src2", 200), ("src3", 100)],
            "source string, target_permille long",
        )
        docs = _t(spark, sf, "documents")
        plan = mixture_plan(docs, targets, token_budget=30000)
        return apply_mixture(docs, plan)

    def dust_apply(spark, sf):
        # the DUST loop closed: mine the irrelevant params, strip them,
        # and report per host how far the frontier collapses — the
        # session-id/trap families fold into their canonical rows
        from netrunner_spark.operators import crawlintel

        pages = _crawl_pages(spark, sf)
        rules = crawlintel.dust_params(pages)
        rw = crawlintel.apply_dust_rules(pages, rules)
        return rw.groupBy(
            F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host")
        ).agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("rewritten").alias("n_collapsed"),
            F.expr(
                "CAST(count(DISTINCT rewritten) * 1000 DIV count(DISTINCT url) AS BIGINT)"
            ).alias("collapse_permille"),
        )

    def warc_revisit_plan(spark, sf):
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        k = F.col("event_id") % 150
        url = F.concat(
            F.lit("https://h"), (k % 8).cast("string"), F.lit(".test/r/"),
            k.cast("string"),
        )
        old = (
            ev.filter(F.col("event_id") % 7 != 0)
            .select(
                url.alias("url"),
                F.md5(F.concat(F.lit("a-"), k.cast("string"))).alias("content_hash"),
            )
            .dropDuplicates(["url"])
        )
        new = (
            ev.filter(F.col("event_id") % 5 != 0)
            .select(
                url.alias("url"),
                F.when(
                    k % 5 == 0, F.md5(F.concat(F.lit("b-"), k.cast("string")))
                )
                .otherwise(F.md5(F.concat(F.lit("a-"), k.cast("string"))))
                .alias("content_hash"),
                (F.lit(50) + k).cast("long").alias("n_bytes"),
            )
            .dropDuplicates(["url"])
        )
        return crawlintel.revisit_plan(old, new)

    def reciprocal_links(spark, sf):
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        m9 = F.col("event_id") % 9
        s = (
            F.when(m9 == 0, F.lit("x.test"))
            .when(m9 == 3, F.lit("y.test"))
            .otherwise(
                F.concat(F.lit("h"), (F.col("user_id") % 6).cast("string"), F.lit(".test"))
            )
        )
        d = (
            F.when(m9 == 0, F.lit("y.test"))
            .when(m9 == 3, F.lit("x.test"))
            .otherwise(
                F.concat(F.lit("h"), (F.col("event_id") % 6).cast("string"), F.lit(".test"))
            )
        )
        links = ev.select(s.alias("src_host"), d.alias("dst_host"))
        return crawlintel.reciprocal_links(links)

    def search_rerank_anchors(spark, sf):
        # the L1/L2 search architecture: BM25 candidate pool (L1, exact
        # same stages as bm25_search) re-ranked by the link graph's
        # anchor-text signal (L2) — a candidate whose in-link anchors
        # repeat a query term outranks a same-score text-only match
        from netrunner_spark.operators import crawlintel, retrieval

        cands = bm25_search(spark, sf)
        # three synthetic in-links per document: two repeat a
        # doc-id-keyed content word, one is navigation filler — so every
        # doc has an anchor profile at every scale factor
        d = _t(spark, sf, "documents")
        word = F.element_at(
            F.array(
                F.lit("spark"), F.lit("merge"), F.lit("customer"),
                F.lit("window"), F.lit("batch"),
            ),
            (F.col("dst") % 5 + 1).cast("int"),
        )
        links = d.select(
            F.col("doc_id").alias("dst"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        ).select(
            "dst",
            F.when(F.col("k") < 2, word).otherwise(F.lit("homepage")).alias("anchor"),
        )
        anchors = crawlintel.anchor_text_topk(links, k=3)
        queries_df = spark.createDataFrame(_BM25_QUERIES, "query_id long, query string")
        qt = retrieval._query_terms(queries_df, retrieval.TOKEN_PATTERN)
        j = cands.join(qt, "query_id").join(
            anchors.select(
                F.col("dst").alias("a_dst"), F.col("term").alias("a_term"), "n"
            ),
            (F.col("a_dst") == F.col("doc_id")) & (F.col("a_term") == F.col("token")),
            "left",
        )
        b = j.groupBy("query_id", "doc_id", "score_q").agg(
            (F.coalesce(F.sum("n"), F.lit(0)) * 500).alias("anchor_bonus")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("final_q").desc(), F.col("doc_id").asc()
        )
        return (
            b.withColumn("final_q", F.col("score_q") + F.col("anchor_bonus"))
            .withColumn("rk", F.row_number().over(w).cast("int"))
            .select(
                "query_id", "doc_id", "score_q", "anchor_bonus", "final_q", "rk"
            )
        )

    def host_crawl_report(spark, sf):
        # THE per-host decision table the next scheduling round consumes,
        # composed from the SAME operators as their standalone queries:
        # harvest/trap scoring, mirror detection (the lexicographically
        # later host of a >=50%-overlap pair is demoted), traps and
        # mirror-secondaries zero-weighted, then the exact integer
        # budget split over what remains
        from netrunner_spark.operators import crawlintel

        pages = _crawl_pages(spark, sf)
        hh = crawlintel.host_harvest(pages)
        mm = crawlintel.mirror_hosts(pages, min_shared=3, max_hash_df=4)
        sec = (
            mm.filter(F.col("overlap_permille") >= 500)
            .select(F.col("host_b").alias("host"))
            .dropDuplicates()
            .withColumn("mirror_secondary", F.lit(True))
        )
        stats = (
            hh.join(sec, "host", "left")
            .withColumn(
                "mirror_secondary", F.coalesce("mirror_secondary", F.lit(False))
            )
            .withColumn(
                "eff_w",
                F.when(
                    F.col("mirror_secondary") | F.col("is_trap"), F.lit(0)
                ).otherwise(F.col("harvest_permille")),
            )
        )
        alloc = crawlintel.budget_alloc(stats, "eff_w", total=997)
        return stats.join(alloc.select("host", "alloc"), "host").select(
            "host",
            "n_urls",
            "harvest_permille",
            "is_trap",
            "mirror_secondary",
            "alloc",
        )

    def link_communities(spark, sf):
        # deterministic synchronous label propagation over a two-ring
        # host topology with one bridge: communities within a component
        from netrunner_spark.operators.graph import label_propagation_int

        ev = _t(spark, sf, "events")
        nodes = ev.select((F.col("event_id") % 30).alias("n")).dropDuplicates()
        ring = nodes.select(
            F.col("n").alias("src"),
            F.expr("(n DIV 15) * 15 + ((n % 15) + 1) % 15").alias("dst"),
        )
        chord = nodes.select(
            F.col("n").alias("src"),
            F.expr("(n DIV 15) * 15 + ((n % 15) + 2) % 15").alias("dst"),
        )
        bridge = spark.range(1).select(
            F.lit(14).cast("long").alias("src"), F.lit(15).cast("long").alias("dst")
        )
        edges = ring.unionByName(chord).unionByName(bridge)
        return label_propagation_int(edges, iters=3)

    def line_dedup(spark, sf):
        # RefinedWeb-style exact duplicated-LINE removal over a lined
        # corpus synthesized from documents: nav/footer/newsletter
        # chrome (corpus-wide doc-DF) is stripped from every page, the
        # per-doc content lines survive in original order; the footer
        # variant pair pins the whitespace/case normalization
        from netrunner_spark.operators.textops import line_dedup as _ld

        d = _t(spark, sf, "documents")
        corpus = d.select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.lit("home about contact"),
                F.substring("text", 1, 60),
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.lit("subscribe to the newsletter"),
                ).otherwise(F.substring("text", 61, 60)),
                F.when(
                    F.col("doc_id") % 2 == 0, F.lit("  Copyright 2026  ")
                ).otherwise(F.lit("copyright 2026")),
            ).alias("text"),
        )
        return _ld(corpus, max_doc_df=2)

    def crawl_shard_assign(spark, sf):
        # rendezvous (HRW) host->worker map for the sharded frontier:
        # minimal-disruption property unit-pinned; here the full
        # assignment over 200 synthetic hosts, 8 workers
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        hosts = ev.select(
            F.concat(
                F.lit("h"),
                (F.col("event_id") % 200).cast("string"),
                F.lit(".example.com"),
            ).alias("host")
        ).dropDuplicates()
        return crawlintel.rendezvous_shards(hosts, n_workers=8)

    def domain_rollup(spark, sf):
        # eTLD+1 rollup over a host mix that exercises every PSL rule
        # tier: 2-label suffix (shop.co.uk subdomains group; github.io
        # users DON'T), 3-label suffix (s3.amazonaws.com), default rule
        # (www/api.exampleK.com group), single-label passthrough
        from netrunner_spark.urlnorm import registrable_domain_col

        ev = _t(spark, sf, "events")
        urls = ev.select(
            F.expr(
                "CASE event_id % 6"
                " WHEN 0 THEN concat('a', CAST(event_id % 3 AS STRING), '.shop.co.uk')"
                " WHEN 1 THEN concat('u', CAST(event_id % 5 AS STRING), '.github.io')"
                " WHEN 2 THEN concat('www.example', CAST(event_id % 3 AS STRING), '.com')"
                " WHEN 3 THEN concat('api.example', CAST(event_id % 3 AS STRING), '.com')"
                " WHEN 4 THEN concat('b', CAST(event_id % 2 AS STRING), '.data.s3.amazonaws.com')"
                " ELSE 'localhost' END"
            ).alias("host")
        )
        return urls.groupBy(
            registrable_domain_col("host").alias("etld1")
        ).agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_urls"),
        )

    def web_bowtie(spark, sf):
        # Broder bow-tie map around pivot 0: SCC ring 0-9, IN chain
        # 20->21->0, OUT chain 5->30->31, tendril 21->50 and the
        # disconnected pair 40->41 land in OTHER
        from netrunner_spark.operators.graph import bowtie

        ev = _t(spark, sf, "events")
        edges = ev.select(
            F.expr(
                "CASE (event_id DIV 10) % 5"
                " WHEN 0 THEN event_id % 10"
                " WHEN 1 THEN CASE event_id % 2 WHEN 0 THEN 20 ELSE 21 END"
                " WHEN 2 THEN CASE event_id % 2 WHEN 0 THEN 5 ELSE 30 END"
                " WHEN 3 THEN 40 ELSE 21 END"
            ).alias("src"),
            F.expr(
                "CASE (event_id DIV 10) % 5"
                " WHEN 0 THEN (event_id % 10 + 1) % 10"
                " WHEN 1 THEN CASE event_id % 2 WHEN 0 THEN 21 ELSE 0 END"
                " WHEN 2 THEN CASE event_id % 2 WHEN 0 THEN 30 ELSE 31 END"
                " WHEN 3 THEN 41 ELSE 50 END"
            ).alias("dst"),
        )
        return bowtie(edges, pivot=0)

    def bpe_tokenize(spark, sf):
        # the trained tokenizer applied back to its corpus: per-doc
        # token counts after 3 BPE merges (vocab-sized recurrence, one
        # broadcast word->ntok join back)
        from netrunner_spark.operators.textops import bpe_token_counts

        d = _t(spark, sf, "documents")
        return bpe_token_counts(d, n_merges=3)

    def shard_drain_plan(spark, sf):
        # the address map meets the budget: Hamilton host allocations
        # (crawl_budget_alloc stage, twin nested verbatim) routed to
        # workers by rendezvous hashing -> per-worker load plan
        from netrunner_spark.operators import crawlintel

        alloc = crawl_budget_alloc(spark, sf)
        assigned = crawlintel.rendezvous_shards(alloc, n_workers=4)
        return assigned.groupBy("worker").agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.sum("alloc").alias("alloc_total"),
        )

    def url_depth_profile(spark, sf):
        # frontier shape audit: per (host, path-depth) URL counts +
        # how many carry query strings — deep tails and param-heavy
        # levels are the calendar-trap silhouette url_templates then
        # confirms; pure projection + one aggregate
        ev = _t(spark, sf, "events")
        urls = ev.select(
            F.concat(
                F.lit("h"), (F.col("event_id") % 4).cast("string"), F.lit(".test")
            ).alias("host"),
            F.expr(
                "concat('/a', CASE WHEN event_id % 3 = 0 THEN '/b' ELSE '' END,"
                " CASE WHEN event_id % 9 = 0 THEN '/c/d' ELSE '' END,"
                " '/p', CAST(event_id % 10 AS STRING),"
                " CASE WHEN event_id % 5 = 0 THEN '?page=' || CAST(event_id % 7 AS STRING)"
                " ELSE '' END)"
            ).alias("path"),
        )
        seg = F.expr("regexp_replace(path, '\\\\?.*$', '')")
        return (
            urls.select(
                "host",
                (F.size(F.split(seg, "/")) - 1).alias("depth"),
                F.col("path").contains("?").cast("int").alias("has_q"),
            )
            .groupBy("host", "depth")
            .agg(
                F.count(F.lit(1)).alias("n_urls"),
                F.sum("has_q").alias("n_with_query"),
            )
        )

    def image_bpp_outliers(spark, sf):
        # bytes-per-kilopixel audit: corrupt/suspicious payloads stick
        # out as extreme storage density; exact integer permille, fixed
        # threshold, per-format outlier counts
        img = _image_meta(spark, sf)
        bpp = F.expr("n_bytes * 1000 DIV (CAST(w AS BIGINT) * h)")
        return (
            img.select("fmt", bpp.alias("bytes_per_kpx"))
            .groupBy("fmt")
            .agg(
                F.count(F.lit(1)).alias("n_images"),
                F.max("bytes_per_kpx").alias("max_bpp"),
                F.sum(
                    (F.col("bytes_per_kpx") > 400).cast("long")
                ).alias("n_outliers"),
            )
        )

    def sitemap_coverage(spark, sf):
        # fetch-debt audit: cache paths 0-9 vs sitemap paths 3-10 per
        # host -> both 3-9, cache-only 0-2, sitemap-only 10
        from netrunner_spark.operators.crawlintel import (
            sitemap_coverage as _smc,
        )

        ev = _t(spark, sf, "events")
        host = F.concat(
            F.lit("h"), (F.col("event_id") % 4).cast("string"), F.lit(".test")
        )
        cache = ev.select(
            host.alias("host"),
            F.concat(F.lit("/p/"), (F.col("event_id") % 10).cast("string")).alias(
                "url"
            ),
        )
        smap = ev.select(
            host.alias("host"),
            F.concat(
                F.lit("/p/"), ((F.col("event_id") % 8) + 3).cast("string")
            ).alias("url"),
        )
        return _smc(cache, smap)

    def signature_bit_balance(spark, sf):
        # LSH banding pre-flight: per-bit ones permille of the 16-bit
        # simhash family; a stuck bit silently halves band count
        from netrunner_spark.operators.textops import bit_balance

        sigs = textops.simhash(_t(spark, sf, "documents"), max_doc_id=150)
        return bit_balance(sigs, bits=16, sig_col="simhash")

    def caption_lang_mix(spark, sf):
        # CLIP-style caption-language audit per image format: lang_id
        # over the captions joined back to the image view; the mix
        # table a multilingual image-text curation run starts from
        img = _image_meta(spark, sf)
        docs = img.select(
            F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
        )
        return (
            textops.lang_id(docs)
            .join(
                img.select(F.col("image_id").alias("doc_id"), "fmt"), "doc_id"
            )
            .groupBy("pred_lang", "fmt")
            .agg(F.count(F.lit(1)).alias("n_images"))
        )

    def image_res_tiers(spark, sf):
        # training-resolution tier plan: min-side thresholds route each
        # image to drop/256/512/1024; per (fmt, tier) row and byte
        # totals size the decode+resize stages
        img = _image_meta(spark, sf)
        tier = (
            F.when(F.least("w", "h") < 256, "drop")
            .when(F.least("w", "h") < 512, "t256")
            .when(F.least("w", "h") < 1024, "t512")
            .otherwise("t1024")
        )
        return img.groupBy("fmt", tier.alias("tier")).agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_bytes").alias("total_bytes"),
        )

    def degree_profile(spark, sf):
        # log2-binned in/out degree histogram over the ring+chord graph
        # plus a 10-spoke hub (out-deg 10 -> bin 4) — the trap/farm
        # early-warning profile that sizes every degree cap
        from netrunner_spark.operators.graph import degree_histogram

        ev = _t(spark, sf, "events")
        base = ev.select(
            (F.col("event_id") % 30).alias("src"),
            F.expr("(event_id % 30 + 1 + (event_id DIV 30) % 2) % 30").alias("dst"),
        )
        hub = ev.filter(F.col("event_id") % 7 == 0).select(
            F.lit(100).cast("long").alias("src"),
            (F.col("event_id") % 10).alias("dst"),
        )
        return degree_histogram(base.unionByName(hub))

    def event_spikes(spark, sf):
        # per-type daily volume vs its own 7-day trailing window,
        # exact-integer 1.5x threshold; warm-up days never flag
        from netrunner_spark.operators.temporal import daily_spikes

        ev = _t(spark, sf, "events")
        return daily_spikes(ev)

    def host_alias_fold(spark, sf):
        # the www-mirror loop closed: mine www->bare fold rules from
        # content-hash containment (sites 0-2,5 full share -> fold;
        # site 3 disjoint, site 4 at 500 permille -> keep), apply to
        # the frontier, report the folded per-host rollup
        from netrunner_spark.operators import crawlintel

        ev = _t(spark, sf, "events")
        pg = ev.select(
            F.expr(
                "CASE event_id % 2 WHEN 0 THEN"
                " concat('site', CAST(event_id % 6 AS STRING), '.test')"
                " ELSE concat('www.site', CAST(event_id % 6 AS STRING), '.test') END"
            ).alias("host"),
            F.expr(
                "CASE WHEN event_id % 6 IN (0,1,2,5) THEN"
                " md5(concat('c', CAST(event_id % 6 AS STRING), '/',"
                " CAST(event_id % 10 AS STRING)))"
                " WHEN event_id % 6 = 3 THEN"
                " md5(concat('c3', CAST(event_id % 2 AS STRING), '/',"
                " CAST(event_id % 10 AS STRING)))"
                " ELSE md5(concat('c4',"
                " CASE WHEN event_id % 10 < 5 THEN concat('s', CAST(event_id % 10 AS STRING))"
                " ELSE concat('d', CAST(event_id % 2 AS STRING), CAST(event_id % 10 AS STRING)) END)) END"
            ).alias("content_hash"),
        )
        rules = crawlintel.host_alias_rules(pg, min_share_permille=800)
        folded = crawlintel.fold_host_aliases(pg.select("host"), rules)
        return folded.groupBy("host").agg(F.count(F.lit(1)).alias("n_urls"))

    def sketch_bloom_probe(spark, sf):
        # relational Bloom filter: 500 member keys, 800 probe keys ->
        # zero false negatives and the EXACT same false positives in
        # both engines (deterministic md5 bits, m=2048, k=3)
        from netrunner_spark.operators.sketches import bloom_bits, bloom_probe

        ev = _t(spark, sf, "events")
        members = ev.select(
            F.concat(F.lit("u"), (F.col("event_id") % 500).cast("string")).alias(
                "key"
            )
        ).dropDuplicates()
        probes = ev.select(
            F.concat(F.lit("u"), (F.col("event_id") % 800).cast("string")).alias(
                "key"
            )
        ).dropDuplicates()
        bits = bloom_bits(members, "key", m=2048, k=3)
        return bloom_probe(bits, probes, "key", m=2048, k=3)

    def rolling_active_sketch(spark, sf):
        # rolling 7-day active-user HLL: per-day register shards merged
        # per window END day (one range join on the 30-row day table +
        # groupBy max) — O(days x m) state instead of re-scanning 7 days
        # of raw events per window; the sliding-window reuse that makes
        # register sketches worth keeping
        from netrunner_spark.operators.sketches import hll_registers

        ev = _t(spark, sf, "events").withColumn("day", F.to_date("ts"))
        daily = hll_registers(ev, "user_id", p=6, by=("day",))
        ends = daily.select("day").dropDuplicates().alias("w")
        d = daily.alias("d")
        return (
            ends.join(
                d,
                (F.col("d.day") <= F.col("w.day"))
                & (F.col("d.day") >= F.date_sub(F.col("w.day"), 6)),
            )
            .groupBy(F.col("w.day").alias("win_end"), F.col("d.bucket").alias("bucket"))
            .agg(F.max("d.rho").alias("rho"))
        )

    def cocitation_links(spark, sf):
        # mirrored section roots (100+j, 200+j) co-cited by the same 4
        # sources; a 50-target hub source exceeds max_src_out and is
        # dropped before the pair join
        from netrunner_spark.operators.crawlintel import cocitation_pairs

        ev = _t(spark, sf, "events")
        edges = ev.select(
            F.expr(
                "CASE (event_id DIV 20) % 3 WHEN 2 THEN 19"
                " ELSE event_id % 20 END"
            ).alias("src"),
            F.expr(
                "CASE (event_id DIV 20) % 3"
                " WHEN 0 THEN 100 + event_id % 20 % 5"
                " WHEN 1 THEN 200 + event_id % 20 % 5"
                " ELSE 400 + event_id % 50 END"
            ).alias("dst"),
        )
        return cocitation_pairs(edges, min_common=2, max_src_out=20)

    def budget_fairness(spark, sf):
        # exact-integer Gini permille over the Hamilton allocation
        # (alloc-asc, host-asc rank on the per-HOST table — bounded);
        # the scheduler's fairness audit, alloc twin nested verbatim
        from pyspark.sql import Window

        alloc = crawl_budget_alloc(spark, sf)
        w = Window.orderBy(F.col("alloc"), F.col("host"))
        ranked = alloc.select(
            "alloc", F.row_number().over(w).alias("i")
        )
        return ranked.agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.sum("alloc").alias("total_alloc"),
            F.expr(
                "(2 * sum(i * alloc) - (count(1) + 1) * sum(alloc)) * 1000"
                " DIV (count(1) * sum(alloc))"
            ).alias("gini_permille"),
        )

    def robots_block_report(spark, sf):
        # per-host frontier exposure under robots longest-match eval:
        # h0 path-tier allow/disallow, h1 wildcard, h2 blanket
        # disallow-/ over allow-'', h3 ruleless
        from netrunner_spark.operators.politeness import (
            robots_block_report as _rbr,
        )

        ev = _t(spark, sf, "events")
        frontier = ev.select(
            F.concat(
                F.lit("h"), (F.col("event_id") % 4).cast("string"), F.lit(".test")
            ).alias("host"),
            F.expr(
                "concat('https://h', CAST(event_id % 4 AS STRING), '.test',"
                " CASE event_id % 5"
                " WHEN 0 THEN concat('/p/', CAST(event_id % 7 AS STRING))"
                " WHEN 1 THEN concat('/admin/', CAST(event_id % 7 AS STRING))"
                " WHEN 2 THEN concat('/admin/public/', CAST(event_id % 7 AS STRING))"
                " WHEN 3 THEN concat('/tmp/', CAST(event_id % 7 AS STRING))"
                " ELSE '/' END)"
            ).alias("url"),
        )
        robots = spark.createDataFrame(
            [
                ("h0.test", "disallow", "/admin"),
                ("h0.test", "allow", "/admin/public"),
                ("h1.test", "disallow", "/tmp"),
                ("h1.test", "disallow", "/p/1*"),
                ("h2.test", "allow", ""),
                ("h2.test", "disallow", "/"),
            ],
            "host string, directive string, path_pattern string",
        )
        return _rbr(frontier, robots)

    def sketch_hll_merged(spark, sf):
        # per-day HLL register shards merged back (groupBy bucket, max
        # rho): the oracle is the WHOLE-TABLE sketch, so merge-equals-
        # whole is oracle-checked, not just unit-tested
        from netrunner_spark.operators.sketches import hll_registers

        ev = _t(spark, sf, "events").withColumn("day", F.to_date("ts"))
        daily = hll_registers(ev, "user_id", p=6, by=("day",))
        return daily.groupBy("bucket").agg(F.max("rho").alias("rho"))

    def user_retention(spark, sf):
        # cohort-by-first-signup retention matrix in day offsets
        from netrunner_spark.operators.temporal import retention_cohorts

        ev = _t(spark, sf, "events")
        return retention_cohorts(ev, anchor_type="signup")

    def event_transitions(spark, sf):
        # first-order Markov transition counts, (ts, event_id) tie-break
        from netrunner_spark.operators.temporal import transition_counts

        ev = _t(spark, sf, "events")
        return transition_counts(ev)

    def event_funnel(spark, sf):
        # ordered first-touch conversion funnel view > click > purchase:
        # per-stage min-ts anchors chained by strictly-later joins
        from netrunner_spark.operators.temporal import funnel

        ev = _t(spark, sf, "events")
        return funnel(ev, ["view", "click", "purchase"])

    def bpe_train(spark, sf):
        # first 4 BPE merge rules trained on the corpus word-frequency
        # table; the merge choice stays in-plan (one-row broadcast per
        # step), twin unrolls the identical recurrence
        from netrunner_spark.operators.textops import bpe_merges

        d = _t(spark, sf, "documents")
        return bpe_merges(d, n_merges=4)

    def sketch_hll_registers(spark, sf):
        # HyperLogLog register table over event users: the mergeable
        # per-shard distinct sketch next to KMV's one global estimate;
        # registers (not the float estimate) are the oracle surface
        from netrunner_spark.operators.sketches import hll_registers

        ev = _t(spark, sf, "events")
        return hll_registers(ev, "user_id", p=6)

    return {
        "w1_politeness_quota": w1_politeness_quota,
        "f2_admission_filter": f2_admission_filter,
        "f7_seen_antijoin": f7_seen_antijoin,
        "f8_frontier_dedup": f8_frontier_dedup,
        "f9_canonical_dedup": f9_canonical_dedup,
        "j4_domain_memo_join": j4_domain_memo_join,
        "j5_prefix_coverage": j5_prefix_coverage,
        "a3_validation_tallies": a3_validation_tallies,
        "o1_sorted_limit": o1_sorted_limit,
        "f4_url_normalize": f4_url_normalize,
        "j1_frontier_union": j1_frontier_union,
        "j2_missing_nations": j2_missing_nations,
        "a2_duplicate_count": a2_duplicate_count,
        "o2_resume_page": o2_resume_page,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_orders": q3_top_orders,
        "dedup_exact": dedup_exact,
        "text_token_stats": text_token_stats,
        "text_quality": text_quality,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "jaccard_pairs": jaccard_pairs,
        "minhash_lsh": minhash_lsh,
        "simhash": simhash,
        "hamming_near_dups": hamming_near_dups,
        "ann_topk_int": ann_topk_int,
        "ann_cosine_topk": ann_cosine_topk,
        "lsh_bucket_sizes": lsh_bucket_sizes,
        "embedding_near_dups": embedding_near_dups,
        "embedding_dedup_clusters": embedding_dedup_clusters,
        "ann_ivf_topk": ann_ivf_topk,
        "media_video_sample": media_video_sample,
        "media_audio_features": media_audio_features,
        "jaccard_pairs_capped": jaccard_pairs_capped,
        "containment_pairs": containment_pairs,
        "duplicate_spans": duplicate_spans,
        "minhash_lsh_capped": minhash_lsh_capped,
        "dedup_clusters": dedup_clusters,
        "cluster_keepers": cluster_keepers,
        "chunk_dedup": chunk_dedup,
        "multimodal_dup_pairs": multimodal_dup_pairs,
        "curation_pipeline": curation_pipeline,
        "sketch_kmv_events": sketch_kmv_events,
        "sketch_cms_tokens": sketch_cms_tokens,
        "sketch_hist_quantiles": sketch_hist_quantiles,
        "zorder_curve": zorder_curve,
        "image_quality_gate": image_quality_gate,
        "image_aspect_buckets": image_aspect_buckets,
        "image_shard_pack": image_shard_pack,
        "caption_boilerplate": caption_boilerplate,
        "image_pair_alignment": image_pair_alignment,
        "image_cluster_keepers": image_cluster_keepers,
        "sample_split": sample_split,
        "stratified_sample": stratified_sample,
        "stratified_skewsafe": stratified_skewsafe,
        "source_budget_cap": source_budget_cap,
        "cross_source_dups": cross_source_dups,
        "pii_pattern_scan": pii_pattern_scan,
        "vocab_topk": vocab_topk,
        "vocab_drift": vocab_drift,
        "source_drift": source_drift,
        "drift_recrawl_alloc": drift_recrawl_alloc,
        "dup_spans": dup_spans,
        "pii_scrub": pii_scrub,
        "scrub_admission": scrub_admission,
        "link_pagerank": link_pagerank,
        "weighted_pagerank": weighted_pagerank,
        "user_sessions": user_sessions,
        "asof_view_before_purchase": asof_view_before_purchase,
        "value_interval_join": value_interval_join,
        "doc_top_terms": doc_top_terms,
        "bm25_search": bm25_search,
        "search_snippets": search_snippets,
        "search_index_topk": search_index_topk,
        "phrase_search": phrase_search,
        "phrase_index_search": phrase_index_search,
        "search_facets": search_facets,
        "boolean_search": boolean_search,
        "kmeans_clusters": kmeans_clusters,
        "doc_surprisal": doc_surprisal,
        "cluster_balanced_sample": cluster_balanced_sample,
        "bigram_pmi": bigram_pmi,
        "ann_ivf_kmeans": ann_ivf_kmeans,
        "recrawl_priority": recrawl_priority,
        "doc_lm_score": doc_lm_score,
        "spell_candidates": spell_candidates,
        "link_hits": link_hits,
        "sitemap_hints": sitemap_hints,
        "text_quality_gate": text_quality_gate,
        "query_spell_correct": query_spell_correct,
        "rollup_hourly": rollup_hourly,
        "ann_recall": ann_recall,
        "seed_pagerank": seed_pagerank,
        "ann_pq_topk": ann_pq_topk,
        "pq_index_topk": pq_index_topk,
        "ann_ivfpq_topk": ann_ivfpq_topk,
        "image_caption_search": image_caption_search,
        "length_percentiles": length_percentiles,
        "table_profile": table_profile,
        "repetition_signals": repetition_signals,
        "benchmark_contamination": benchmark_contamination,
        "robots_parse": robots_parse,
        "x2_html_parse": x2_html_parse,
        "f3_seed_classification": f3_seed_classification,
        "s4_sitemap_closure": s4_sitemap_closure,
        "warc_roundtrip": warc_roundtrip,
        "a6_compression_ratio": a6_compression_ratio,
        "mirror_hosts": mirror_hosts,
        "dust_params": dust_params,
        "host_harvest": host_harvest,
        "crawl_budget_alloc": crawl_budget_alloc,
        "redirect_resolve": redirect_resolve,
        "sitemap_diff": sitemap_diff,
        "anchor_text_topk": anchor_text_topk,
        "image_dedup_savings": image_dedup_savings,
        "link_spam_hosts": link_spam_hosts,
        "cdc_chunks": cdc_chunks,
        "link_communities": link_communities,
        "host_crawl_report": host_crawl_report,
        "search_rerank_anchors": search_rerank_anchors,
        "warc_revisit_plan": warc_revisit_plan,
        "dust_apply": dust_apply,
        "pack_sequences": pack_sequences,
        "mixture_plan": mixture_plan,
        "mixture_apply": mixture_apply,
        "dedup_eval": dedup_eval,
        "winnow_dups": winnow_dups,
        "phash_radius_search": phash_radius_search,
        "link_authority_report": link_authority_report,
        "reciprocal_links": reciprocal_links,
        "recrawl_schedule": recrawl_schedule,
        "url_templates": url_templates,
        "host_health": host_health,
        "boilerplate_strip": boilerplate_strip,
        "template_cap_apply": template_cap_apply,
        "crawl_policy_table": crawl_policy_table,
        "split_leakage": split_leakage,
        "image_curation_pipeline": image_curation_pipeline,
        "quality_mixture": quality_mixture,
        "seed_distance": seed_distance,
        "graph_hyperball": graph_hyperball,
        "graph_hyperball_nf": graph_hyperball_nf,
        "graph_ball_sizes": graph_ball_sizes,
        "graph_harmonic_centrality": graph_harmonic_centrality,
        "graph_neighborhood_function": graph_neighborhood_function,
        "graph_random_walks": graph_random_walks,
        "graph_skipgram_pairs": graph_skipgram_pairs,
        "graph_neighbor_sample": graph_neighbor_sample,
        "reach_budget_alloc": reach_budget_alloc,
        "robots_refetch_plan": robots_refetch_plan,
        "drain_eta_report": drain_eta_report,
        "warc_cdx_index": warc_cdx_index,
        "host_triangles": host_triangles,
        "clustering_coeff": clustering_coeff,
        "recrawl_budget": recrawl_budget,
        "link_kcore": link_kcore,
        "line_dedup": line_dedup,
        "sketch_hll_registers": sketch_hll_registers,
        "crawl_shard_assign": crawl_shard_assign,
        "domain_rollup": domain_rollup,
        "event_funnel": event_funnel,
        "bpe_train": bpe_train,
        "web_bowtie": web_bowtie,
        "bpe_tokenize": bpe_tokenize,
        "shard_drain_plan": shard_drain_plan,
        "user_retention": user_retention,
        "event_transitions": event_transitions,
        "robots_block_report": robots_block_report,
        "sketch_hll_merged": sketch_hll_merged,
        "cocitation_links": cocitation_links,
        "budget_fairness": budget_fairness,
        "rolling_active_sketch": rolling_active_sketch,
        "host_alias_fold": host_alias_fold,
        "sketch_bloom_probe": sketch_bloom_probe,
        "degree_profile": degree_profile,
        "event_spikes": event_spikes,
        "caption_lang_mix": caption_lang_mix,
        "image_res_tiers": image_res_tiers,
        "sitemap_coverage": sitemap_coverage,
        "signature_bit_balance": signature_bit_balance,
        "url_depth_profile": url_depth_profile,
        "image_bpp_outliers": image_bpp_outliers,
        "hilbert_curve": hilbert_curve,
        "tokenizer_fertility": tokenizer_fertility,
        "token_budget_by_source": token_budget_by_source,
        "hamming_distance_hist": hamming_distance_hist,
        "pq_recall": pq_recall,
        "mime_mismatch_report": mime_mismatch_report,
        "host_latency_quantiles": host_latency_quantiles,
        "dup_cluster_size_hist": dup_cluster_size_hist,
        "text_dedup_savings": text_dedup_savings,
        "embedding_norm_audit": embedding_norm_audit,
        "kmeans_cell_balance": kmeans_cell_balance,
        "redirect_hops_hist": redirect_hops_hist,
        "postings_df_hist": postings_df_hist,
        "session_duration_hist": session_duration_hist,
        "source_quality_matrix": source_quality_matrix,
        "etld1_budget": etld1_budget,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "drain_schedule_table": drain_schedule_table,
        "drain_schedule_salted": drain_schedule_salted,
        "trap_url_signals": trap_url_signals,
        "trap_hosts": trap_hosts,
        "pagination_params": pagination_params,
        "pagination_cap_apply": pagination_cap_apply,
        "priority_compose": priority_compose,
        "politeness_compliance": politeness_compliance,
        "semdedup_prune": semdedup_prune,
        "opic_importance": opic_importance,
        "opic_budget_alloc": opic_budget_alloc,
        "dup_source_matrix": dup_source_matrix,
        "sketch_kmv_intersect": sketch_kmv_intersect,
        "sketch_kmv_difference": sketch_kmv_difference,
        "caption_consensus": caption_consensus,
        "adaptive_delay_plan": adaptive_delay_plan,
        "batch_novelty": batch_novelty,
        "soft_dedup_weights": soft_dedup_weights,
        "image_canonical_pairs": image_canonical_pairs,
        "kmv_source_overlap": kmv_source_overlap,
        "novelty_budget_alloc": novelty_budget_alloc,
    }


# ----------------------------------------------------------------- oracles
def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_dict()
    # the index-backed paths must reproduce their direct twins exactly
    d["phrase_index_search"] = d["phrase_search"]
    # scrub_admission composes the dup_spans and pii_scrub twins
    # verbatim — the composed gate can never drift from the parts
    d["scrub_admission"] = f"""
        WITH ds AS ({d["dup_spans"]}), p AS ({d["pii_scrub"]})
        SELECT ds.doc_id, ds.dup_ppm,
               CAST(p.n_emails + p.n_ips + p.n_phones AS BIGINT) AS n_pii,
               CASE WHEN ds.dup_ppm > 100000 THEN 'dup_spans'
                    WHEN p.n_emails + p.n_ips + p.n_phones >= 2 THEN 'pii'
                    ELSE 'admitted' END AS verdict
        FROM ds JOIN p ON ds.doc_id = p.doc_id
        ORDER BY ds.doc_id
    """
    # ann_recall composes the exact-ANN and IVF twins verbatim (nested
    # WITH keeps their CTE names scoped), so the recall oracle can
    # never drift from the operators it measures
    d["ann_recall"] = f"""
        WITH t AS ({d["ann_topk_int"]}), a AS ({d["ann_ivf_topk"]})
        SELECT t.query_id,
               CAST(count(*) AS BIGINT) AS k,
               CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(count(a.neighbor_id) * 100 // count(*) AS BIGINT) AS recall_pct
        FROM t LEFT JOIN a
          ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
        GROUP BY t.query_id
    """
    # pq_recall: identical composition with the ADC scan as the
    # approximate side
    d["pq_recall"] = f"""
        WITH t AS ({d["ann_topk_int"]}), a AS ({d["ann_pq_topk"]})
        SELECT t.query_id,
               CAST(count(*) AS BIGINT) AS k,
               CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(count(a.neighbor_id) * 100 // count(*) AS BIGINT) AS recall_pct
        FROM t LEFT JOIN a
          ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
        GROUP BY t.query_id
    """
    return d


def _oracle_sql_dict() -> dict[str, str]:
    # notes: list_reduce has no init arg → prepend 0; generate_series as a
    # lateral table function cannot take column bounds → constant bound +
    # WHERE filter (documents are ≤ ~2000 chars).

    # source_drift twin: per-source integer-ppm total-variation between
    # the doc_id-parity "rounds"; shared verbatim with the
    # drift_recrawl_alloc Hamilton tail (no-drift composition).
    source_drift_sql = """
        WITH cnt AS (
          SELECT source, token,
                 CAST(sum(CASE WHEN rnd = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
                 CAST(sum(CASE WHEN rnd = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
          FROM (
            SELECT source,
                   CASE WHEN (doc_id // 20) % 2 = 0 THEN 'a' ELSE 'b' END AS rnd,
                   unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
            FROM documents
          ) WHERE token <> ''
          GROUP BY source, token
        ), tot AS (
          SELECT source, CAST(sum(cnt_a) AS BIGINT) AS tot_a,
                 CAST(sum(cnt_b) AS BIGINT) AS tot_b
          FROM cnt GROUP BY source
        ), d AS (
          SELECT cnt.source,
                 abs(CASE WHEN tot_a = 0 THEN 0 ELSE cnt_a * 1000000 // tot_a END
                   - CASE WHEN tot_b = 0 THEN 0 ELSE cnt_b * 1000000 // tot_b END) AS d
          FROM cnt JOIN tot ON cnt.source = tot.source
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(d) // 2 AS BIGINT) AS tv_ppm
        FROM d GROUP BY source
        ORDER BY tv_ppm DESC, source ASC
    """

    # doc_surprisal / doc_lm_score twins, shared verbatim with the
    # text_quality_gate composition (nested-WITH scoping keeps their
    # CTE names private).
    _surprisal_sql = """
            WITH tok AS (
              SELECT doc_id, token FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents
              ) WHERE token <> ''
            ), tf AS (
              SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, token
            ), cnts AS (
              SELECT token, CAST(sum(tf) AS BIGINT) AS cnt
              FROM tf GROUP BY token
            ), stats AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM cnts
            )
            SELECT doc_id,
                   CAST(sum(tf) AS BIGINT) AS n_tokens,
                   CAST(sum(tf * ((tt * 1000) // cnt)) // sum(tf) AS BIGINT) AS surprisal_q
            FROM tf JOIN cnts USING (token) CROSS JOIN stats
            GROUP BY doc_id
        """
    _lm_sql = """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 t -> t <> '') AS w
              FROM documents
            ), trans AS (
              SELECT doc_id,
                     unnest(w[1:len(w) - 1]) AS tok_a,
                     unnest(w[2:len(w)]) AS tok_b
              FROM w WHERE len(w) >= 2
            ), dt AS (
              SELECT doc_id, tok_a, tok_b, CAST(count(*) AS BIGINT) AS n
              FROM trans GROUP BY doc_id, tok_a, tok_b
            ), co AS (
              SELECT tok_a, tok_b, CAST(sum(n) AS BIGINT) AS co
              FROM dt GROUP BY tok_a, tok_b
            ), uni AS (
              SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t
                FROM documents
              ) WHERE t <> '' GROUP BY t
            ), stats AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM uni
            )
            SELECT doc_id,
                   CAST(sum(n) AS BIGINT) AS n_transitions,
                   CAST(sum(n * ((2000 * ua.cnt * tt) // (co.co * tt + ua.cnt * ub.cnt)))
                        // sum(n) AS BIGINT) AS lm_score_q
            FROM dt
            JOIN co USING (tok_a, tok_b)
            JOIN uni ua ON ua.t = dt.tok_a
            JOIN uni ub ON ub.t = dt.tok_b
            CROSS JOIN stats
            GROUP BY doc_id
        """
    grams_cte = """
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
), grams AS (
  SELECT DISTINCT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT))),
           (a, b) -> (a * 31 + b) % 2147483647) AS g
  FROM (
    SELECT doc_id, substr(text, i, 3) AS g
    FROM base, generate_series(1, 4000) AS t(i)
    WHERE i <= greatest(length(text) - 2, 1)
  )
  WHERE length(g) = 3
)
"""

    # shared MinHash→LSH→connected-components chain (ends at `reach`);
    # dedup_clusters and cluster_keepers append different final selects
    clusters_cte = grams_cte.replace("WITH base", "WITH RECURSIVE base", 1) + """
            , sig AS (
              SELECT doc_id, j,
                     min(((j * 2 + 1) * 104729 % 2147483647 * g + j * 7919 + 1) % 2147483647) AS minhash
              FROM grams, generate_series(0, 15) AS s(j)
              GROUP BY doc_id, j
            ), bands AS (
              SELECT doc_id, CAST(j // 4 AS INT) AS band,
                     string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS band_key
              FROM sig GROUP BY doc_id, CAST(j // 4 AS INT)
            ), bcnt AS (
              SELECT band, band_key, count(*) AS bdf, min(doc_id) AS hub
              FROM bands GROUP BY band, band_key
            ), keyed AS (
              SELECT bands.doc_id, bands.band, bands.band_key, bcnt.bdf, bcnt.hub
              FROM bands JOIN bcnt USING (band, band_key)
            ), pairs AS (
              SELECT DISTINCT doc_a, doc_b FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM keyed a JOIN keyed b
                  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
                WHERE a.bdf <= 8
                UNION ALL
                SELECT hub AS doc_a, doc_id AS doc_b
                FROM keyed WHERE bdf > 8 AND doc_id != hub
              )
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs
            ), reach(u, v) AS (
              SELECT doc_id, doc_id FROM base
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
    """

    # aspect-bucket argmin from the SAME bucket table + comparison the
    # Spark ladder uses (imageops.AR_BUCKETS), so the twin cannot drift
    from netrunner_spark.operators.imageops import aspect_bucket_sql_case

    _ar_case = aspect_bucket_sql_case()

    # sample_split: thresholds from the SAME helper the operator uses,
    # so the oracle cannot drift from the implementation
    from netrunner_spark.operators.sampling import split_thresholds

    _th = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    _pos = "substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 12)"
    _case = "CASE"
    for _name, _upper in _th:
        if _upper is None:
            _case += f" ELSE '{_name}' END"
        else:
            _case += f" WHEN {_pos} < '{_upper}' THEN '{_name}'"
    sample_split_sql = f"SELECT doc_id, {_case} AS split FROM documents"

    # link_pagerank: the IDENTICAL integer fixed-point recurrence as
    # operators/graph.py:pagerank_int (floor division, damping as an
    # integer percent, uniform dangling redistribution) unrolled as
    # chained CTEs — exact int64 arithmetic means EXACT equality, no
    # float tolerance
    _scale, _damp, _iters = 10**12, 85, 3
    _pr = """
WITH edges AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst AS id FROM edges
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), ncount AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes
), r0 AS (
  SELECT id, CAST({scale} // nc.n_nodes AS BIGINT) AS rank_e12
  FROM nodes CROSS JOIN ncount nc
)""".format(scale=_scale)
    for _i in range(1, _iters + 1):
        _pr += """, r{i} AS (
  SELECT nodes.id AS id,
         CAST(((100 - {damp}) * {scale}) // (100 * nc.n_nodes)
              + ({damp} * (COALESCE(c.contrib, 0) + d.dang // nc.n_nodes)) // 100
              AS BIGINT) AS rank_e12
  FROM nodes
  CROSS JOIN ncount nc
  CROSS JOIN (SELECT CAST(COALESCE(SUM(r.rank_e12), 0) AS BIGINT) AS dang
              FROM r{p} r LEFT JOIN deg dg ON dg.src = r.id
              WHERE dg.src IS NULL) d
  LEFT JOIN (SELECT e.dst AS id,
                    CAST(SUM(r.rank_e12 // dg.outdeg) AS BIGINT) AS contrib
             FROM edges e
             JOIN r{p} r ON r.id = e.src
             JOIN deg dg ON dg.src = e.src
             GROUP BY e.dst) c ON c.id = nodes.id
)""".format(i=_i, p=_i - 1, damp=_damp, scale=_scale)
    link_pagerank_sql = _pr + f"\nSELECT id, rank_e12 FROM r{_iters}"

    # link_authority_report: the anti-spam composition — the farm flag
    # (link_spam_hosts algebra) drops edges INTO flagged hosts BEFORE
    # the identical pagerank recurrence runs over what remains
    _ar = """
WITH links AS (
  SELECT CAST(CASE WHEN event_id % 4 = 0 THEN 50
              ELSE user_id % 10 END AS BIGINT) AS src_host,
         CAST(CASE WHEN event_id % 4 = 0 THEN 150
              ELSE 100 + event_id % 6 END AS BIGINT) AS dst_host
  FROM events
), per_src AS (
  SELECT dst_host, src_host, CAST(count(*) AS BIGINT) AS n
  FROM links GROUP BY dst_host, src_host
), flags AS (
  SELECT dst_host,
         sum(n) >= 20 AND max(n) * 1000 // sum(n) >= 600 AS is_link_farm
  FROM per_src GROUP BY dst_host
), farms AS (SELECT dst_host FROM flags WHERE is_link_farm),
edges AS (
  SELECT DISTINCT l.src_host AS src, l.dst_host AS dst
  FROM links l LEFT JOIN farms f ON f.dst_host = l.dst_host
  WHERE f.dst_host IS NULL
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst AS id FROM edges
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), ncount AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes
), r0 AS (
  SELECT id, CAST({scale} // nc.n_nodes AS BIGINT) AS rank_e12
  FROM nodes CROSS JOIN ncount nc
)""".format(scale=_scale)
    for _i in range(1, _iters + 1):
        _ar += """, r{i} AS (
  SELECT nodes.id AS id,
         CAST(((100 - {damp}) * {scale}) // (100 * nc.n_nodes)
              + ({damp} * (COALESCE(c.contrib, 0) + d.dang // nc.n_nodes)) // 100
              AS BIGINT) AS rank_e12
  FROM nodes
  CROSS JOIN ncount nc
  CROSS JOIN (SELECT CAST(COALESCE(SUM(r.rank_e12), 0) AS BIGINT) AS dang
              FROM r{p} r LEFT JOIN deg dg ON dg.src = r.id
              WHERE dg.src IS NULL) d
  LEFT JOIN (SELECT e.dst AS id,
                    CAST(SUM(r.rank_e12 // dg.outdeg) AS BIGINT) AS contrib
             FROM edges e
             JOIN r{p} r ON r.id = e.src
             JOIN deg dg ON dg.src = e.src
             GROUP BY e.dst) c ON c.id = nodes.id
)""".format(i=_i, p=_i - 1, damp=_damp, scale=_scale)
    link_authority_report_sql = _ar + f"""
SELECT r.id, r.rank_e12, coalesce(fl.is_link_farm, FALSE) AS is_link_farm
FROM r{_iters} r LEFT JOIN flags fl ON fl.dst_host = r.id
"""

    # seed_pagerank: the personalized recurrence — teleport + dangling
    # mass only on the seed set (customer nodes < 100), otherwise the
    # identical integer arithmetic as link_pagerank.
    _sp = """
WITH edges AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst AS id FROM edges
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), seeds AS (
  SELECT id FROM nodes WHERE id % 2 = 0 AND id < 100
), m AS (
  SELECT nodes.id, (s.id IS NOT NULL) AS is_seed
  FROM nodes LEFT JOIN seeds s ON s.id = nodes.id
), scount AS (
  SELECT CAST(count(*) AS BIGINT) AS s FROM seeds
), p0 AS (
  SELECT id, is_seed,
         CAST(CASE WHEN is_seed THEN {scale} // sc.s ELSE 0 END AS BIGINT) AS rank_e12
  FROM m CROSS JOIN scount sc
)""".format(scale=_scale)
    for _i in range(1, _iters + 1):
        _sp += """, p{i} AS (
  SELECT m.id, m.is_seed,
         CAST(CASE WHEN m.is_seed
                   THEN ((100 - {damp}) * {scale}) // (100 * sc.s)
                   ELSE 0 END
              + ({damp} * (COALESCE(c.contrib, 0)
                           + CASE WHEN m.is_seed THEN d.dang // sc.s
                                  ELSE 0 END)) // 100
              AS BIGINT) AS rank_e12
  FROM m
  CROSS JOIN scount sc
  CROSS JOIN (SELECT CAST(COALESCE(SUM(r.rank_e12), 0) AS BIGINT) AS dang
              FROM p{p} r LEFT JOIN deg dg ON dg.src = r.id
              WHERE dg.src IS NULL) d
  LEFT JOIN (SELECT e.dst AS id,
                    CAST(SUM(r.rank_e12 // dg.outdeg) AS BIGINT) AS contrib
             FROM edges e
             JOIN p{p} r ON r.id = e.src
             JOIN deg dg ON dg.src = e.src
             GROUP BY e.dst) c ON c.id = m.id
)""".format(i=_i, p=_i - 1, damp=_damp, scale=_scale)
    seed_pagerank_sql = _sp + f"\nSELECT id, rank_e12 FROM p{_iters}"

    # weighted_pagerank: identical integer recurrence with per-edge
    # rank·w div out_w shares (multiplicity-weighted distribution)
    _wp = """
WITH edges AS (
  SELECT CAST(o_custkey AS BIGINT) * 2 AS src,
         CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst AS id FROM edges
), outw AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src
), ncount AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes
), w0 AS (
  SELECT id, CAST({scale} // nc.n_nodes AS BIGINT) AS rank_e12
  FROM nodes CROSS JOIN ncount nc
)""".format(scale=_scale)
    for _i in range(1, _iters + 1):
        _wp += """, w{i} AS (
  SELECT nodes.id AS id,
         CAST(((100 - {damp}) * {scale}) // (100 * nc.n_nodes)
              + ({damp} * (COALESCE(c.contrib, 0) + d.dang // nc.n_nodes)) // 100
              AS BIGINT) AS rank_e12
  FROM nodes
  CROSS JOIN ncount nc
  CROSS JOIN (SELECT CAST(COALESCE(SUM(r.rank_e12), 0) AS BIGINT) AS dang
              FROM w{p} r LEFT JOIN outw o ON o.src = r.id
              WHERE o.src IS NULL) d
  LEFT JOIN (SELECT e.dst AS id,
                    CAST(SUM(r.rank_e12 * e.w // o.out_w) AS BIGINT) AS contrib
             FROM edges e
             JOIN w{p} r ON r.id = e.src
             JOIN outw o ON o.src = e.src
             GROUP BY e.dst) c ON c.id = nodes.id
)""".format(i=_i, p=_i - 1, damp=_damp, scale=_scale)
    weighted_pagerank_sql = _wp + f"\nSELECT id, rank_e12 FROM w{_iters}"

    # opic_importance: graph.opic_int unrolled — per round, history
    # absorbs the previous cash, the virtual-page pot collects dangling
    # cash plus every div-truncation remainder in ONE aggregate, and
    # new cash = in-edge contributions + pot // n. Exact int64.
    _op = """
WITH edges AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst AS id FROM edges
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), ncount AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes
), s0 AS (
  SELECT id, CAST({scale} // nc.n_nodes AS BIGINT) AS cash,
         CAST(0 AS BIGINT) AS hist
  FROM nodes CROSS JOIN ncount nc
)""".format(scale=_scale)
    for _i in range(1, _iters + 1):
        _op += """, s{i} AS (
  SELECT n.id AS id,
         CAST(COALESCE(c.contrib, 0) + p.pot // nc.n_nodes AS BIGINT) AS cash,
         CAST(pv.hist + pv.cash AS BIGINT) AS hist
  FROM nodes n
  JOIN s{p} pv ON pv.id = n.id
  CROSS JOIN ncount nc
  CROSS JOIN (SELECT CAST(COALESCE(SUM(
                CASE WHEN dg.src IS NULL THEN s.cash
                     ELSE s.cash - (s.cash // dg.outdeg) * dg.outdeg END), 0)
                AS BIGINT) AS pot
              FROM s{p} s LEFT JOIN deg dg ON dg.src = s.id) p
  LEFT JOIN (SELECT e.dst AS id,
                    CAST(SUM(s.cash // dg.outdeg) AS BIGINT) AS contrib
             FROM edges e
             JOIN s{p} s ON s.id = e.src
             JOIN deg dg ON dg.src = e.src
             GROUP BY e.dst) c ON c.id = n.id
)""".format(i=_i, p=_i - 1)
    opic_sql = _op + f"\nSELECT id, cash AS cash_e12, hist AS hist_e12 FROM s{_iters}"

    # link_hits: the IDENTICAL scaled-quotient HITS recurrence as
    # operators/graph.py:hits_int unrolled — per iteration one auth
    # half (sum of hubs over in-edges, coalesce-to-0, quotient norm)
    # then one hub half, exact int64 throughout.
    _hs, _hiters = 10**9, 3
    _hq = """
WITH edges AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
  UNION
  SELECT DISTINCT dst AS id FROM edges
), h0 AS (
  SELECT id, CAST({s} AS BIGINT) AS hub FROM nodes
)""".format(s=_hs)
    for _i in range(_hiters):
        _hq += """, af{i} AS (
  SELECT nodes.id, CAST(COALESCE(ar.auth, 0) AS BIGINT) AS auth
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, CAST(SUM(h.hub) AS BIGINT) AS auth
    FROM edges e JOIN h{i} h ON h.id = e.src GROUP BY e.dst) ar
  ON ar.id = nodes.id
), an{i} AS (
  SELECT id, CAST(auth // greatest(t.tot // {s}, 1) AS BIGINT) AS auth
  FROM af{i} CROSS JOIN (SELECT CAST(SUM(auth) AS BIGINT) AS tot FROM af{i}) t
), hf{i} AS (
  SELECT nodes.id, CAST(COALESCE(hr.hub, 0) AS BIGINT) AS hub
  FROM nodes LEFT JOIN (
    SELECT e.src AS id, CAST(SUM(a.auth) AS BIGINT) AS hub
    FROM edges e JOIN an{i} a ON a.id = e.dst GROUP BY e.src) hr
  ON hr.id = nodes.id
), h{n} AS (
  SELECT id, CAST(hub // greatest(t.tot // {s}, 1) AS BIGINT) AS hub
  FROM hf{i} CROSS JOIN (SELECT CAST(SUM(hub) AS BIGINT) AS tot FROM hf{i}) t
)""".format(i=_i, n=_i + 1, s=_hs)
    link_hits_sql = _hq + (
        f"\nSELECT h.id, h.hub AS hub_e9, a.auth AS auth_e9"
        f"\nFROM h{_hiters} h JOIN an{_hiters - 1} a ON a.id = h.id"
    )

    oracles = {
        "sample_split": sample_split_sql,
        "stratified_sample": """
            SELECT doc_id, lang, rk FROM (
              SELECT doc_id, lang,
                     CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY substring(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 12) ASC,
                                doc_id ASC) AS INT) AS rk
              FROM documents
            ) WHERE rk <= 25
        """,
        "stratified_skewsafe": """
            SELECT doc_id, lang, rk FROM (
              SELECT doc_id, lang,
                     CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY substring(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 12) ASC,
                                doc_id ASC) AS INT) AS rk
              FROM documents
            ) WHERE rk <= 10
        """,
        "source_budget_cap": """
            SELECT doc_id, source, cum_cost, rk FROM (
              SELECT doc_id, source,
                     CAST(sum(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY substring(md5('budget' || CAST(doc_id AS VARCHAR)), 1, 12) ASC,
                                doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_cost,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY substring(md5('budget' || CAST(doc_id AS VARCHAR)), 1, 12) ASC,
                                doc_id ASC) AS INT) AS rk
              FROM documents
            ) WHERE cum_cost <= 5000
        """,
        "cross_source_dups": """
            WITH corpus AS (
              SELECT doc_id, text, source FROM documents
              UNION ALL
              SELECT doc_id + 100000, text, 'mirror' FROM documents
              WHERE doc_id % 7 = 0
            )
            SELECT md5(text) AS text_hash,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   min(doc_id) AS keep_id,
                   min_by(source, doc_id) AS keep_source
            FROM corpus GROUP BY md5(text)
            HAVING count(DISTINCT source) > 1
        """,
        "pii_pattern_scan": """
            WITH enriched AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN
                       text || ' contact a' || CAST(doc_id AS VARCHAR)
                            || '@example.com or see https://ex.org/p/'
                            || CAST(doc_id AS VARCHAR)
                            || ' ref 123456789' || CAST(doc_id AS VARCHAR)
                     ELSE text END AS text
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
                     AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text, 'https?://[^\\s]+'))
                     AS BIGINT) AS n_urls,
                   CAST(len(regexp_extract_all(text, '[0-9]{9,}'))
                     AS BIGINT) AS n_long_digits
            FROM enriched
        """,
        "vocab_topk": """
            SELECT token, cnt FROM (
              SELECT token, count(*) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents
              ) WHERE token <> ''
              GROUP BY token
            ) ORDER BY cnt DESC, token ASC LIMIT 100
        """,
        "source_drift": source_drift_sql,
        # pii_scrub: same injection CASEs; counts via
        # len(regexp_extract_all) on the original text, scrub via the
        # same ordered replace chain with the 'g' flag (DuckDB defaults
        # to first-match-only). Patterns are in the Java∩RE2 subset.
        "pii_scrub": r"""
            WITH t AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 5 = 0 THEN
                          ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com' ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN
                          ' call +1 415 555 0132 now' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN
                          ' origin 10.42.7.' || CAST(doc_id % 256 AS VARCHAR)
                          ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id,
              CAST(len(regexp_extract_all(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(text,
                '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
              CAST(len(regexp_extract_all(text,
                '\+?[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS n_phones,
              md5(regexp_replace(regexp_replace(regexp_replace(text,
                  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                  '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                  '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS scrubbed_md5
            FROM t ORDER BY doc_id
        """,
        # dup_spans: same enrichment CASE + same span positions
        # (1, 11, 21, … — constant-bound series, column-bound WHERE;
        # docs are ≤ ~640 chars enriched). Grouping is by raw span
        # text where Spark groups by xxhash64(span) — identical
        # modulo 2⁻⁶⁴ collisions, absent at test scale.
        "dup_spans": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0 THEN
                       'all rights reserved contact the admin at example dot com '
                       || text ELSE text END AS text
              FROM documents
            ), s AS (
              SELECT doc_id, substr(text, CAST(pos AS INT), 30) AS span
              FROM t CROSS JOIN generate_series(1, 1000, 10) AS g(pos)
              WHERE pos <= len(text) - 29
            ), dfs AS (
              SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_df
              FROM s GROUP BY span
            )
            SELECT s.doc_id,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(CASE WHEN doc_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_spans,
                   CAST(sum(CASE WHEN doc_df >= 2 THEN 1 ELSE 0 END) * 1000000
                        // count(*) AS BIGINT) AS dup_ppm
            FROM s JOIN dfs USING (span)
            GROUP BY s.doc_id ORDER BY doc_id
        """,
        # drift_recrawl_alloc: the source_drift twin nested verbatim,
        # then the same Hamilton tail as opic_budget_alloc (total 499,
        # remainder ties by source)
        "drift_recrawl_alloc": f"""
WITH sd AS ({source_drift_sql}),
sh AS (
  SELECT source, tv_ppm AS weight,
         CAST(CASE WHEN sum(tv_ppm) OVER () = 0 THEN 0
              ELSE 499 * tv_ppm // sum(tv_ppm) OVER () END AS BIGINT) AS fl,
         CAST(CASE WHEN sum(tv_ppm) OVER () = 0 THEN 0
              ELSE 499 * tv_ppm % sum(tv_ppm) OVER () END AS BIGINT) AS rem,
         sum(tv_ppm) OVER () AS s_tot
  FROM sd
), r AS (
  SELECT *, CASE WHEN s_tot = 0 THEN 0 ELSE 499 - sum(fl) OVER () END AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rn
  FROM sh
)
SELECT source, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r ORDER BY alloc DESC, source ASC
""",
        # vocab_drift: same tokenizer CTE as vocab_topk per round half,
        # integer-ppm arithmetic (all BIGINT casts — DuckDB sum() is
        # HUGEINT), total order (delta DESC, token ASC; token unique)
        "vocab_drift": """
            WITH ca AS (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt_a FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents WHERE (doc_id // 20) % 2 = 0
              ) WHERE token <> '' GROUP BY token
            ), cb AS (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt_b FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents WHERE (doc_id // 20) % 2 = 1
              ) WHERE token <> '' GROUP BY token
            ), j AS (
              SELECT coalesce(ca.token, cb.token) AS token,
                     coalesce(cnt_a, 0) AS cnt_a,
                     coalesce(cnt_b, 0) AS cnt_b
              FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
            ), t AS (
              SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
                     CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM j
            )
            SELECT token, cnt_a, cnt_b,
                   CAST(cnt_a * 1000000 // tot_a AS BIGINT) AS freq_a_ppm,
                   CAST(cnt_b * 1000000 // tot_b AS BIGINT) AS freq_b_ppm,
                   CAST(abs(cnt_a * 1000000 // tot_a
                            - cnt_b * 1000000 // tot_b) AS BIGINT) AS delta_ppm
            FROM j, t
            ORDER BY delta_ppm DESC, token ASC LIMIT 50
        """,
        "link_pagerank": link_pagerank_sql,
        "opic_importance": opic_sql,
        # opic_budget_alloc: the OPIC twin nested verbatim, supplier
        # history mass through the same Hamilton tail as
        # crawl_budget_alloc (total 997, ties by host)
        "opic_budget_alloc": f"""
WITH o AS ({opic_sql}),
hh AS (
  SELECT 's' || CAST((id - 1) // 2 AS VARCHAR) AS host,
         hist_e12 AS w
  FROM o WHERE id % 2 = 1
), sh AS (
  SELECT host, w AS weight,
         CAST(997 * w // sum(w) OVER () AS BIGINT) AS fl,
         CAST(997 * w % sum(w) OVER () AS BIGINT) AS rem
  FROM hh
), r AS (
  SELECT *, 997 - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
  FROM sh
)
SELECT host, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
""",
        "link_authority_report": link_authority_report_sql,
        "weighted_pagerank": weighted_pagerank_sql,
        "seed_pagerank": seed_pagerank_sql,
        "link_hits": link_hits_sql,
        "user_sessions": """
            WITH s AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s2 AS (
              SELECT *, CAST(SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS INT) AS session_no
              FROM s
            )
            SELECT user_id, session_no,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM s2 GROUP BY user_id, session_no
        """,
        # native ASOF LEFT JOIN as the differential for our union-tag
        # composition (operators/temporal.py:asof_join)
        "asof_view_before_purchase": """
            WITH purch AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
            ), views AS (
              SELECT user_id, ts, max(event_id) AS view_event_id
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
                   v.view_event_id
            FROM purch p ASOF LEFT JOIN views v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        """,
        "value_interval_join": """
            SELECT e.event_id, n.n_nationkey
            FROM events e JOIN nation n
              ON e.value >= n.n_nationkey * 15.0
             AND e.value <  n.n_nationkey * 15.0 + 25.0
        """,
        "doc_top_terms": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM toks WHERE token <> '' GROUP BY doc_id, token
            ), dft AS (
              SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
            )
            SELECT doc_id, token, tf, df, rk FROM (
              SELECT tf.doc_id, tf.token, tf.tf, dft.df,
                     CAST(row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dft.df ASC, tf.token ASC) AS INT) AS rk
              FROM tf JOIN dft USING (token)
            ) WHERE rk <= 3
        """,
        # bm25_search: every arithmetic step is int64 (quantized
        # rational idf, cross-multiplied BM25 saturation) — Spark `div`
        # and DuckDB `//` agree on positive operands, so score_q is
        # bit-identical across engines.
        "bm25_search": _BM25_CTE
        + """
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_q, rk
            FROM ranked WHERE rk <= 10
        """,
        # search_index_topk: the index-backed path must reproduce the
        # direct path exactly — same oracle by construction.
        "search_index_topk": _BM25_CTE
        + """
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_q, rk
            FROM ranked WHERE rk <= 10
        """,
        # search_facets: hit-set distribution over lang and source.
        "search_facets": _BM25_CTE
        + """
            , hits AS (
              SELECT query_id, doc_id FROM ranked WHERE rk <= 10
            ), j AS (
              SELECT h.query_id, d.lang, d.source
              FROM hits h JOIN documents d USING (doc_id)
            )
            SELECT CAST(query_id AS BIGINT) AS query_id, facet, value,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM (
              SELECT query_id, 'lang' AS facet, lang AS value FROM j
              UNION ALL
              SELECT query_id, 'source' AS facet, source AS value FROM j
            ) GROUP BY query_id, facet, value
        """,
        # boolean_search: AND semantics — docs holding EVERY distinct
        # query term (full-house countDistinct), ranked by total tf.
        "boolean_search": "WITH "
        + _BM25_Q_VALUES
        + """
            , tok AS (
              SELECT doc_id, token FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents
              ) WHERE token <> ''
            ), tf AS (
              SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, token
            ), qt AS (
              SELECT DISTINCT query_id, token FROM (
                SELECT query_id,
                       unnest(regexp_split_to_array(lower(query), '[^a-z]+')) AS token
                FROM q
              ) WHERE token <> ''
            ), nterms AS (
              SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
              FROM qt GROUP BY query_id
            ), grp AS (
              SELECT query_id, doc_id,
                     CAST(count(DISTINCT token) AS BIGINT) AS n_hit,
                     CAST(sum(tf) AS BIGINT) AS tf_total
              FROM tf JOIN qt USING (token) GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, tf_total, rk FROM (
              SELECT g.query_id, g.doc_id, g.tf_total,
                     CAST(row_number() OVER (
                       PARTITION BY g.query_id
                       ORDER BY g.tf_total DESC, g.doc_id ASC) AS INT) AS rk
              FROM grp g JOIN nterms n USING (query_id)
              WHERE g.n_hit = n.n_terms
            ) WHERE rk <= 10
        """,
        # ann_pq_topk: generated PQ twin — per-subspace Lloyd's blocks
        # + argmin encoding + ADC via per-subspace cid joins.
        "ann_pq_topk": _pq_sql(m=4, ks=4, iters=2, sub=16, n_queries=10, k=5),
        # pq_index_topk: same generated twin but codebooks train on
        # the index's build half only (encode/query span everything).
        "pq_index_topk": _pq_sql(
            m=4, ks=4, iters=2, sub=16, n_queries=10, k=5,
            train_pred="vec_id < 100",
        ),
        # ann_ivfpq_topk: coarse blocks + probed-cell candidates + ADC.
        "ann_ivfpq_topk": _ivfpq_sql(
            n_cells=4, nprobe=2, m=4, ks=4, iters=2, sub=16,
            n_queries=10, k=5,
        ),
        # kmeans_clusters: generated iterative twin of kmeans_int
        # (k=4, iters=2) — integer argmin assignment + `//` means.
        "kmeans_clusters": _kmeans_sql(k=4, iters=2),
        # cluster_balanced_sample: the same generated Lloyd's body,
        # final select = per-cluster hash-order quota (md5 position,
        # identical to sampling._pos_hex with salt 'kbal').
        "cluster_balanced_sample": _kmeans_sql(
            k=4,
            iters=2,
            select="""SELECT vec_id, cid, rk FROM (
              SELECT vec_id, cid,
                     CAST(row_number() OVER (
                       PARTITION BY cid
                       ORDER BY substring(md5('kbal' || CAST(vec_id AS VARCHAR)), 1, 12) ASC,
                                vec_id ASC) AS INT) AS rk
              FROM afinal
            ) WHERE rk <= 50""",
        ),
        # rollup_hourly: incremental build+append must equal the direct
        # GROUP BY (integer-cent value quantization makes merge order
        # irrelevant).
        "rollup_hourly": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket,
                   event_type,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_q,
                   CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_q,
                   CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_q
            FROM events
            GROUP BY 1, 2
        """,
        # query_spell_correct: exact matches pass through; unknown
        # terms take the best (cnt desc, token asc) vocab token within
        # levenshtein 1 via the deletion-neighborhood join.
        "query_spell_correct": """
            WITH q(query_id, query) AS (
              VALUES (1, 'spark joim windoww'), (2, 'mergee sort'),
                     (3, 'zzqqzz batch')
            ), vocab AS (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents
              ) WHERE token <> '' GROUP BY token
            ), qt AS (
              SELECT DISTINCT query_id, token FROM (
                SELECT query_id,
                       unnest(regexp_split_to_array(lower(query), '[^a-z]+')) AS token
                FROM q
              ) WHERE token <> ''
            ), exact AS (
              SELECT qt.query_id, qt.token, qt.token AS corrected, v.cnt
              FROM qt JOIN vocab v USING (token)
            ), unknown AS (
              SELECT query_id, token FROM qt ANTI JOIN vocab USING (token)
            ), qv AS (
              SELECT query_id, token, unnest(list_distinct(list_append(
                       list_transform(generate_series(1, len(token)),
                         i -> substr(token, 1, i - 1) || substr(token, i + 1, len(token))),
                       token))) AS v
              FROM unknown
            ), vv AS (
              SELECT token AS corrected, cnt, unnest(list_distinct(list_append(
                       list_transform(generate_series(1, len(token)),
                         i -> substr(token, 1, i - 1) || substr(token, i + 1, len(token))),
                       token))) AS v
              FROM vocab
            ), cand AS (
              SELECT DISTINCT qv.query_id, qv.token, vv.corrected, vv.cnt
              FROM qv JOIN vv USING (v)
              WHERE levenshtein(qv.token, vv.corrected) <= 1
            ), fixed AS (
              SELECT query_id, token, corrected, cnt FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY query_id, token
                  ORDER BY cnt DESC, corrected ASC) AS rk
                FROM cand
              ) WHERE rk = 1
            )
            SELECT * FROM exact UNION ALL SELECT * FROM fixed
        """,
        # sitemap_hints: the Spark side round-trips REAL XML through
        # the hint parser; the oracle derives each field in closed form
        # from the same customer-row generators.
        "sitemap_hints": """
            SELECT 'sm-n' || CAST(c_nationkey AS VARCHAR)
                     || '-' || CAST(c_custkey // 512 AS VARCHAR) AS sitemap_url,
                   'https://s.test/c/' || CAST(c_custkey AS VARCHAR) AS url,
                   '2024-01-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
                   CASE c_custkey % 3 WHEN 0 THEN 'daily'
                                      WHEN 1 THEN 'weekly'
                                      ELSE 'monthly' END AS changefreq,
                   CAST((c_custkey % 10) * 10 AS INT) AS priority_pct,
                   CAST(CASE c_custkey % 3 WHEN 0 THEN 24
                                           WHEN 1 THEN 168
                                           ELSE 720 END AS INT) AS period_h
            FROM customer
        """,
        # spell_candidates: deletion-neighborhood equi-join (token +
        # every 1-deletion variant), verified by exact levenshtein = 1.
        "spell_candidates": """
            WITH vocab AS (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
                FROM documents
              ) WHERE token <> '' GROUP BY token HAVING count(*) >= 2
            ), variants AS (
              SELECT token, cnt, unnest(list_distinct(
                       list_append(
                         list_transform(generate_series(1, len(token)),
                           i -> substr(token, 1, i - 1)
                                || substr(token, i + 1, len(token))),
                         token))) AS v
              FROM vocab
            ), pairs AS (
              SELECT DISTINCT a.token AS tok_a, a.cnt AS cnt_a,
                              b.token AS tok_b, b.cnt AS cnt_b
              FROM variants a JOIN variants b USING (v)
              WHERE a.token < b.token
            )
            SELECT tok_a, tok_b, cnt_a, cnt_b FROM pairs
            WHERE levenshtein(tok_a, tok_b) = 1
        """,
        # doc_lm_score: interpolated bigram LM, quantized inverse
        # probability (2000·ca·tt) // (co·tt + ca·cb), per-doc
        # transition-weighted integer mean.
        "doc_lm_score": _lm_sql,
        # recrawl_priority: integer-micros change-rate estimator; the
        # global clock is the log's own max ts.
        "recrawl_priority": """
            WITH obs AS (
              SELECT user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                     CASE WHEN event_type IN ('purchase', 'signup')
                          THEN 1 ELSE 0 END AS chg
              FROM events
            ), per AS (
              SELECT key,
                     CAST(count(*) AS BIGINT) AS n_obs,
                     CAST(sum(chg) AS BIGINT) AS n_changes,
                     CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
                     CAST(max(ts_us) AS BIGINT) AS last_us
              FROM obs GROUP BY key
            ), clock AS (
              SELECT CAST(max(ts_us) AS BIGINT) AS now_us FROM obs
            )
            SELECT key, n_obs, n_changes,
                   CAST(span_us // greatest(n_changes, 1) AS BIGINT) AS period_us,
                   CAST(now_us - last_us AS BIGINT) AS age_us,
                   CAST(((now_us - last_us) * 1000)
                        // (span_us // greatest(n_changes, 1) + 1) AS BIGINT) AS priority_q
            FROM per CROSS JOIN clock
        """,
        # ann_ivf_kmeans: the generated Lloyd's body (k=8, iters=2)
        # CONTINUED with the IVF probe CTEs — `select` starts with
        # ", dots AS (" so it extends the WITH list, and the centroid
        # source is the trained c2 instead of the fixed first-k set.
        "ann_ivf_kmeans": _kmeans_sql(
            k=8,
            iters=2,
            select=""", dots AS (
              SELECT q.vec_id, q.qe, c.cid,
                     list_reduce(list_transform(generate_series(1, len(q.qe)),
                                 i -> q.qe[i] * c.cq[i]), (x, y) -> x + y) AS cd
              FROM q, c2 c
            ), ivfranked AS (
              SELECT vec_id, qe, cid,
                     row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, cid) AS rn
              FROM dots
            ), cells AS (
              SELECT vec_id, qe, cid FROM ivfranked WHERE rn = 1
            ), probes AS (
              SELECT vec_id AS query_id, qe AS qv, cid FROM ivfranked
              WHERE rn <= 2 AND vec_id < 10
            ), scored AS (
              SELECT p.query_id, ce.vec_id AS neighbor_id,
                     CAST(list_reduce(list_transform(generate_series(1, len(p.qv)),
                          i -> p.qv[i] * ce.qe[i]), (x, y) -> x + y) AS BIGINT) AS dot_q
              FROM probes p JOIN cells ce ON p.cid = ce.cid
              WHERE ce.vec_id != p.query_id
            )
            SELECT query_id, neighbor_id, dot_q, rn AS rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS INT) AS rn
              FROM scored
            ) WHERE rn <= 5""",
        ),
        # bigram_pmi: zip-with-tail adjacent pairs, all-integer PMI
        # surrogate (co·tt·1000) // (ca·cb), total-order top-k.
        "bigram_pmi": """
            WITH w AS (
              SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 t -> t <> '') AS w
              FROM documents
            ), pairs AS (
              SELECT unnest(w[1:len(w) - 1]) AS tok_a,
                     unnest(w[2:len(w)]) AS tok_b
              FROM w WHERE len(w) >= 2
            ), co AS (
              SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS co
              FROM pairs GROUP BY tok_a, tok_b HAVING count(*) >= 2
            ), uni AS (
              SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t
                FROM documents
              ) WHERE t <> '' GROUP BY t
            ), stats AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM uni
            )
            SELECT tok_a, tok_b, co,
                   CAST((co * tt * 1000) // (ua.cnt * ub.cnt) AS BIGINT) AS pmi_q
            FROM co
            JOIN uni ua ON ua.t = co.tok_a
            JOIN uni ub ON ub.t = co.tok_b
            CROSS JOIN stats
            ORDER BY pmi_q DESC, tok_a ASC, tok_b ASC
            LIMIT 100
        """,
        # doc_surprisal: corpus-unigram inverse-probability weights,
        # all-positive int64 so `div` ≡ `//` exactly.
        "doc_surprisal": _surprisal_sql,
        # text_quality_gate: the two signal SELECTs embedded verbatim
        # as scoped nested-WITH CTEs, then the precedence CASE — the
        # thresholds are literals matching textops.text_quality_gate's
        # defaults.
        "text_quality_gate": f"""
            WITH s AS ({_surprisal_sql}), l AS ({_lm_sql})
            SELECT d.doc_id,
                   CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
                   s.surprisal_q, l.lm_score_q,
                   (CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 'empty'
                         WHEN coalesce(s.n_tokens, 0) < 10 THEN 'too_short'
                         WHEN s.surprisal_q < 5000 THEN 'low_surprisal'
                         WHEN s.surprisal_q > 500000 THEN 'high_surprisal'
                         WHEN l.lm_score_q > 3000000 THEN 'word_salad'
                         ELSE NULL END) IS NULL AS pass,
                   CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 'empty'
                        WHEN coalesce(s.n_tokens, 0) < 10 THEN 'too_short'
                        WHEN s.surprisal_q < 5000 THEN 'low_surprisal'
                        WHEN s.surprisal_q > 500000 THEN 'high_surprisal'
                        WHEN l.lm_score_q > 3000000 THEN 'word_salad'
                        ELSE NULL END AS reject_reason
            FROM documents d
            LEFT JOIN s ON s.doc_id = d.doc_id
            LEFT JOIN l ON l.doc_id = d.doc_id
        """,
        # phrase_search: phrase of length m starts at s iff every
        # offset qpos has a token match at pos = s + qpos — count
        # DISTINCT qpos per (query, doc, s), full house = occurrence.
        "phrase_search": """
            WITH p(query_id, phrase) AS (
              VALUES (1, 'merge sort'), (2, 'spark join'), (3, 'batch batch')
            ), dw AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 t -> t <> '') AS w
              FROM documents
            ), toks AS (
              -- constant-range series + filter (DuckDB generate_series
              -- takes no lateral args); corpus docs are <= 512 tokens
              SELECT doc_id, i - 1 AS pos, w[i] AS token
              FROM dw, generate_series(1, 512) AS t(i)
              WHERE i <= len(w)
            ), qw AS (
              SELECT query_id,
                     list_filter(regexp_split_to_array(lower(phrase), '[^a-z]+'),
                                 t -> t <> '') AS w
              FROM p
            ), qt AS (
              SELECT query_id, i - 1 AS qpos, w[i] AS token
              FROM qw, generate_series(1, 16) AS t(i)
              WHERE i <= len(w)
            ), qm AS (
              SELECT query_id, count(*) AS m FROM qt GROUP BY query_id
            ), cand AS (
              SELECT qt.query_id, toks.doc_id,
                     toks.pos - qt.qpos AS s, qt.qpos
              FROM toks JOIN qt USING (token)
              WHERE toks.pos - qt.qpos >= 0
            ), occ AS (
              SELECT query_id, doc_id, s, count(DISTINCT qpos) AS hit
              FROM cand GROUP BY query_id, doc_id, s
            )
            SELECT CAST(o.query_id AS BIGINT) AS query_id, o.doc_id,
                   CAST(count(*) AS BIGINT) AS n_occ
            FROM occ o JOIN qm USING (query_id)
            WHERE o.hit = qm.m
            GROUP BY o.query_id, o.doc_id
        """,
        # image_caption_search: quality gate (mirrors image_quality_gate
        # admission) → exact-int caption BM25 → (w, h) join-back.
        "image_caption_search": _IMG_CTE
        + ", "
        + _BM25_Q_VALUES
        + """, adm AS (
              SELECT image_id, caption FROM img
              WHERE fmt IN ('png', 'jpeg')
                AND w >= 64 AND h >= 64 AND n_bytes >= 256
                AND w * 4 >= h * 1 AND w * 1 <= h * 4
                AND caption IS NOT NULL
                AND length(caption) >= 5 AND length(caption) <= 2048
            ), """
        + _bm25_body("adm", "image_id", "caption")
        + """
            SELECT CAST(r.query_id AS BIGINT) AS query_id, r.image_id,
                   r.score_q, r.rk, i.w, i.h
            FROM ranked r JOIN img i USING (image_id)
            WHERE r.rk <= 5
        """,
        # search_snippets: ±5-token context around the earliest
        # query-term hit; Spark slice(w, s, 11) ↔ DuckDB
        # list_slice(w, s, s+10); both engines' greatest() skips nulls.
        "search_snippets": _BM25_CTE
        + """
            , snip AS (
              SELECT r.query_id, r.doc_id, r.score_q, r.rk, d.text, q.query
              FROM ranked r JOIN documents d USING (doc_id)
              JOIN q USING (query_id)
              WHERE r.rk <= 5
            ), toked AS (
              SELECT query_id, doc_id, score_q, rk,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 t -> t <> '') AS words,
                     list_filter(regexp_split_to_array(lower(query), '[^a-z]+'),
                                 t -> t <> '') AS qwords
              FROM snip
            ), pos AS (
              SELECT *, greatest(1, list_min(list_filter(
                       list_transform(qwords, t -> list_position(words, t)),
                       p -> p IS NOT NULL AND p > 0)) - 5) AS s
              FROM toked
            )
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_q, rk,
                   array_to_string(list_slice(words, s, s + 10), ' ') AS snippet
            FROM pos
        """,
        "length_percentiles": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   quantile_cont(n_chars, 0.5) AS p50,
                   quantile_cont(n_chars, 0.9) AS p90,
                   quantile_cont(n_chars, 0.99) AS p99
            FROM documents GROUP BY lang
        """,
        "repetition_signals": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS t
              FROM documents
            ), idx AS (
              SELECT doc_id, t, unnest(range(1, len(t))) AS i
              FROM toks WHERE len(t) >= 2
            ), grams AS (
              SELECT doc_id,
                     array_to_string(t[CAST(i AS INT):CAST(i+1 AS INT)], ' ') AS gram
              FROM idx
            ), per AS (
              SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
              FROM grams GROUP BY doc_id, gram
            ), stats AS (
              SELECT doc_id,
                     CAST(sum(cnt) AS BIGINT) AS n_grams,
                     CAST(count(*) AS BIGINT) AS n_distinct_grams,
                     CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                       AS n_rep_grams,
                     max(cnt) AS max_gram_reps
              FROM per GROUP BY doc_id
            ), top AS (
              SELECT doc_id, gram AS top_gram, cnt AS top_gram_count FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rk
                FROM per
              ) WHERE rk = 1
            )
            SELECT s.doc_id, s.n_grams, s.n_distinct_grams, s.n_rep_grams,
                   s.max_gram_reps, t.top_gram, t.top_gram_count
            FROM stats s JOIN top t USING (doc_id)
        """,
        "benchmark_contamination": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS t
              FROM documents
            ), idx AS (
              SELECT doc_id, t, unnest(range(1, len(t)-1)) AS i
              FROM toks WHERE len(t) >= 3
            ), grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') AS gram
              FROM idx
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
            train AS (SELECT * FROM grams WHERE doc_id % 10 <> 0)
            SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits
            FROM train t LEFT JOIN bench b USING (gram)
            GROUP BY t.doc_id
        """,
        "table_profile": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
        """,
        "w1_politeness_quota": """
            SELECT event_id, user_id, event_type, rn FROM (
              SELECT event_id, user_id, event_type,
                     CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
              FROM events
            ) WHERE rn <= 3
        """,
        "f2_admission_filter": f"""
            SELECT event_id, {_EVENT_URL_SQL} AS url
            FROM events
            WHERE regexp_matches({_EVENT_URL_SQL}, '^https://host\\d+\\.test/(view|click|purchase)/')
              AND NOT regexp_matches({_EVENT_URL_SQL}, '^https://host1\\.test/click/')
        """,
        "f7_seen_antijoin": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "f8_frontier_dedup": "SELECT DISTINCT user_id, event_type FROM events",
        "f9_canonical_dedup": """
            SELECT o_custkey, first_orderkey FROM (
              SELECT o_custkey, o_orderkey AS first_orderkey,
                     row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders
            ) WHERE rn = 1
        """,
        "j4_domain_memo_join": """
            SELECT n_name,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_total
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "j5_prefix_coverage": """
            WITH prefixes AS (SELECT DISTINCT split_part(p_name, ' ', 1) AS prefix FROM part)
            SELECT prefix, count(*) AS n_hits
            FROM part JOIN prefixes ON starts_with(p_name, prefix)
            GROUP BY prefix
        """,
        "a3_validation_tallies": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum
            FROM events GROUP BY event_type
        """,
        "o1_sorted_limit": "SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 50",
        "f4_url_normalize": f"""
            SELECT event_id,
                   lower(split_part(concat('HTTPS://Host', CAST(user_id % 20 AS VARCHAR),
                         '.TEST/', CAST(event_id AS VARCHAR), '#section'), '#', 1)) AS norm_url
            FROM events
        """,
        "j1_frontier_union": f"""
            SELECT DISTINCT url FROM (
              SELECT {_EVENT_URL_SQL} AS url FROM events WHERE event_type = 'view'
              UNION
              SELECT {_EVENT_URL_SQL} AS url FROM events WHERE value > 200.0
            )
        """,
        "j2_missing_nations": """
            SELECT n_nationkey, n_name FROM nation
            WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
        """,
        "a2_duplicate_count": """
            SELECT count(*) - count(DISTINCT md5(text)) AS n_dupes,
                   count(*) AS n_docs
            FROM documents
        """,
        "o2_resume_page": """
            SELECT event_id, event_type FROM (
              SELECT event_id, event_type, row_number() OVER (ORDER BY event_id) AS rn
              FROM events
            ) WHERE rn > 100 AND rn <= 200
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(round(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) AS BIGINT)) AS BIGINT) AS disc_price_e4,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT l_orderkey,
                   CAST(sum(CAST(round(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) AS BIGINT)) AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue_e4 DESC, l_orderkey
            LIMIT 10
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "text_token_stats": r"""
            SELECT doc_id,
                   CAST(length(text) AS INT) AS n_chars_actual,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INT) AS n_digit,
                   CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> t IN ('the','a','of','and','to','in','is'))) AS INT) AS n_stopwords
            FROM documents
        """,
        "text_quality": r"""
            WITH s AS (
              SELECT doc_id,
                     length(text) AS n_chars_actual,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                     length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                     len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
              FROM documents
            )
            SELECT doc_id,
                   CAST(floor(n_alpha * 10000.0 / greatest(n_chars_actual, 1)) AS BIGINT) AS alpha_bps,
                   CAST(floor(n_stopwords * 10000.0 / greatest(n_tokens, 1)) AS BIGINT) AS stopword_bps,
                   CASE WHEN n_tokens < 10 THEN 'too_short'
                        WHEN n_tokens > 100000 THEN 'too_long'
                        ELSE 'ok' END AS length_band
            FROM s
        """,
        "lang_id": r"""
            WITH toks AS (
              SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS t FROM documents
            ), hits AS (
              SELECT doc_id, text,
                     len(list_filter(t, x -> x IN ('the','of','and','a'))) AS hits_en,
                     len(list_filter(t, x -> x IN ('der','die','das','und'))) AS hits_de,
                     len(list_filter(t, x -> x IN ('el','la','los','que'))) AS hits_es,
                     len(list_filter(t, x -> x IN ('le','les','des','et'))) AS hits_fr
              FROM toks
            )
            SELECT doc_id,
                   CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                        WHEN greatest(hits_en, hits_de, hits_es, hits_fr) > 0
                             AND hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
                        WHEN greatest(hits_en, hits_de, hits_es, hits_fr) > 0
                             AND hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
                        WHEN greatest(hits_en, hits_de, hits_es, hits_fr) > 0
                             AND hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
                        WHEN greatest(hits_en, hits_de, hits_es, hits_fr) > 0
                             AND hits_fr = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'fr'
                        ELSE 'und' END AS pred_lang
            FROM hits
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                                  list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                     (a, b) -> (a * 31 + b) % 2147483647) AS fingerprint
            FROM documents
        """,
        "jaccard_pairs": grams_cte
        + """
            , sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
            , common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_b, doc_a, n_common,
                   sa.n_grams AS grams_a, sb.n_grams AS grams_b
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
        """,
        "minhash_lsh": grams_cte
        + """
            , sig AS (
              SELECT doc_id, j,
                     min(((j * 2 + 1) * 104729 % 2147483647 * g + j * 7919 + 1) % 2147483647) AS minhash
              FROM grams, generate_series(0, 15) AS s(j)
              GROUP BY doc_id, j
            ), bands AS (
              SELECT doc_id, CAST(j // 4 AS INT) AS band,
                     string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS band_key
              FROM sig GROUP BY doc_id, CAST(j // 4 AS INT)
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        """,
        "minhash_lsh_capped": grams_cte
        + """
            , sig AS (
              SELECT doc_id, j,
                     min(((j * 2 + 1) * 104729 % 2147483647 * g + j * 7919 + 1) % 2147483647) AS minhash
              FROM grams, generate_series(0, 15) AS s(j)
              GROUP BY doc_id, j
            ), bands AS (
              SELECT doc_id, CAST(j // 4 AS INT) AS band,
                     string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS band_key
              FROM sig GROUP BY doc_id, CAST(j // 4 AS INT)
            ), bcnt AS (
              SELECT band, band_key, count(*) AS bdf, min(doc_id) AS hub
              FROM bands GROUP BY band, band_key
            ), keyed AS (
              SELECT bands.doc_id, bands.band, bands.band_key, bcnt.bdf, bcnt.hub
              FROM bands JOIN bcnt USING (band, band_key)
            )
            SELECT DISTINCT doc_a, doc_b FROM (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM keyed a JOIN keyed b
                ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
              WHERE a.bdf <= 8
              UNION ALL
              SELECT hub AS doc_a, doc_id AS doc_b
              FROM keyed WHERE bdf > 8 AND doc_id != hub
            )
        """,
        "sketch_kmv_events": __import__(
            "netrunner_spark.operators.sketches", fromlist=["kmv_sql"]
        ).kmv_sql("events", "event_id", k=64),
        "sketch_kmv_intersect": __import__(
            "netrunner_spark.operators.sketches", fromlist=["kmv_set_sql"]
        ).kmv_set_sql(
            "(SELECT CAST(user_id AS VARCHAR) || '#' || strftime(ts, '%Y-%m-%d')"
            " AS uday FROM events WHERE event_type = 'view')",
            "(SELECT CAST(user_id AS VARCHAR) || '#' || strftime(ts, '%Y-%m-%d')"
            " AS uday FROM events WHERE event_type = 'purchase')",
            "uday",
            k=64,
        ),
        "sketch_kmv_difference": __import__(
            "netrunner_spark.operators.sketches", fromlist=["kmv_full_sql"]
        ).kmv_full_sql(
            "(SELECT CAST(user_id AS VARCHAR) || '#' || strftime(ts, '%Y-%m-%d')"
            " AS uday FROM events WHERE event_type = 'view')",
            "(SELECT CAST(user_id AS VARCHAR) || '#' || strftime(ts, '%Y-%m-%d')"
            " AS uday FROM events WHERE event_type = 'purchase')",
            "uday",
            k=64,
        ),
        "kmv_source_overlap": __import__(
            "netrunner_spark.operators.sketches",
            fromlist=["kmv_group_overlap_sql"],
        ).kmv_group_overlap_sql(
            "SELECT event_type, CAST(user_id AS VARCHAR) || '#'"
            " || strftime(ts, '%Y-%m-%d') AS uday FROM events",
            key="uday",
            group_col="event_type",
            k=32,
        ),
        "caption_consensus": __import__(
            "netrunner_spark.operators.imageops",
            fromlist=["caption_consensus_sql"],
        ).caption_consensus_sql(
            """
            SELECT image_id, image_id % 40 AS content_key,
                   CASE WHEN image_id % 4 < 2
                        THEN 'stock photo ' || CAST(image_id % 40 AS VARCHAR)
                        WHEN image_id % 4 = 2 THEN substr(caption, 1, 24)
                        ELSE substr(caption, 1, 16) END AS caption
            FROM (SELECT doc_id AS image_id, text AS caption FROM documents)
            """
        ),
        "adaptive_delay_plan": __import__(
            "netrunner_spark.operators.crawlintel",
            fromlist=["adaptive_delay_sql"],
        ).adaptive_delay_sql(
            """
            SELECT 'h' || CAST(event_id % 6 AS VARCHAR) || '.test' AS host,
                   20 + event_id % 500
                      + CASE WHEN event_id % 6 = 5 THEN 2000 ELSE 0 END AS latency_ms,
                   NOT (event_id % 17 = 0 OR event_id % 12 = 3) AS ok
            FROM events
            """
        ),
        "sketch_hist_quantiles": __import__(
            "netrunner_spark.operators.sketches", fromlist=["hist_quantiles_sql"]
        ).hist_quantiles_sql("documents", "n_chars", (500, 900, 990), 100),
        "sketch_cms_tokens": """
            WITH toks AS (
              SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                            x -> x <> '')) AS w
              FROM documents
            ), gh AS (
              SELECT list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                       (a, b) -> (a * 31 + b) % 2147483647) AS g
              FROM toks
            ), cells AS (
              SELECT j,
                     ((2 * j + 1) * 277996402813769 % 2147483647 * g + j * 7919 + 1) % 2147483647 % 256 AS cell,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM gh, generate_series(0, 3) AS s(j)
              GROUP BY j, cell
            ), q AS (
              SELECT * FROM (VALUES ('the'), ('of'), ('and'), ('to'), ('zebra')) AS v(token)
            ), qg AS (
              SELECT token,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(token, ''), c -> CAST(ascii(c) AS BIGINT))),
                       (a, b) -> (a * 31 + b) % 2147483647) AS g
              FROM q
            ), qr AS (
              SELECT token, j,
                     ((2 * j + 1) * 277996402813769 % 2147483647 * g + j * 7919 + 1) % 2147483647 % 256 AS cell
              FROM qg, generate_series(0, 3) AS s(j)
            )
            SELECT token, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_count
            FROM qr LEFT JOIN cells USING (j, cell)
            GROUP BY token
        """,
        "zorder_curve": """
            WITH k AS (
              SELECT event_id, user_id % 1024 AS x,
                     CAST(length(props) % 1024 AS BIGINT) AS y
              FROM events
            )
            SELECT event_id, x, y, {zv} AS zval FROM k
        """.format(zv=__import__(
            "netrunner_spark.operators.layout", fromlist=["zvalue_sql"]
        ).zvalue_sql("x", "y", 10)),
        "multimodal_dup_pairs": grams_cte
        + """
            , sig AS (
              SELECT doc_id, j,
                     min(((j * 2 + 1) * 104729 % 2147483647 * g + j * 7919 + 1) % 2147483647) AS minhash
              FROM grams, generate_series(0, 15) AS s(j)
              GROUP BY doc_id, j
            ), bands AS (
              SELECT doc_id, CAST(j // 4 AS INT) AS band,
                     string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS band_key
              FROM sig GROUP BY doc_id, CAST(j // 4 AS INT)
            ), bcnt AS (
              SELECT band, band_key, count(*) AS bdf, min(doc_id) AS hub
              FROM bands GROUP BY band, band_key
            ), keyed AS (
              SELECT bands.doc_id, bands.band, bands.band_key, bcnt.bdf, bcnt.hub
              FROM bands JOIN bcnt USING (band, band_key)
            ), p AS (
              SELECT DISTINCT doc_a, doc_b FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM keyed a JOIN keyed b
                  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
                WHERE a.bdf <= 8
                UNION ALL
                SELECT hub AS doc_a, doc_id AS doc_b
                FROM keyed WHERE bdf > 8 AND doc_id != hub
              )
            )"""
        + _IMG_CTE.replace("WITH img AS", ", img AS", 1)
        + """
            SELECT p.doc_a AS image_a, p.doc_b AS image_b, ia.w, ia.h, ia.fmt
            FROM p
            JOIN img ia ON ia.image_id = p.doc_a
            JOIN img ib ON ib.image_id = p.doc_b
            WHERE ia.w = ib.w AND ia.h = ib.h AND ia.fmt = ib.fmt
        """,
        "dedup_clusters": clusters_cte
        + """
            SELECT u AS doc_id, min(v) AS cluster_id, min(v) = u AS is_keeper
            FROM reach GROUP BY u
        """,
        # dup_source_matrix: the same component closure, folded into the
        # (keeper source × duplicate source) economics matrix
        "dup_source_matrix": clusters_cte
        + """
            , cl AS (
              SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
            ), j AS (
              SELECT cl.doc_id, cl.cluster_id, d.source, d.n_chars
              FROM cl JOIN documents d USING (doc_id)
            ), keep AS (
              SELECT cluster_id, source AS keeper_source
              FROM j WHERE doc_id = cluster_id
            ), dup AS (
              SELECT cluster_id, source AS dup_source, n_chars
              FROM j WHERE doc_id <> cluster_id
            )
            SELECT k.keeper_source, dr.dup_source,
                   CAST(count(*) AS BIGINT) AS n_dups,
                   CAST(sum(dr.n_chars) AS BIGINT) AS dup_chars
            FROM dup dr JOIN keep k USING (cluster_id)
            GROUP BY 1, 2
        """,
        "cluster_keepers": clusters_cte
        + """
            , cl AS (
              SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
            ), scored AS (
              SELECT cl.doc_id, cl.cluster_id, d.n_chars
              FROM cl JOIN documents d USING (doc_id)
            ), ranked AS (
              SELECT cluster_id, doc_id AS keeper_id,
                     row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id ASC) AS rk
              FROM scored
            )
            SELECT s.doc_id, s.cluster_id, k.keeper_id,
                   s.doc_id = k.keeper_id AS keep
            FROM scored s
            JOIN ranked k ON s.cluster_id = k.cluster_id AND k.rk = 1
        """,
        "chunk_dedup": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS words FROM documents
            ), p AS (
              SELECT doc_id, i AS pos,
                     array_to_string(words[(i * 10 + 1):(i * 10 + 10)], ' ') AS chunk,
                     doc_id * 100000 + i AS occ_key
              FROM w, generate_series(0, 399) AS t(i)
              WHERE i < least(ceil(len(words) / 10.0), 400)
            ), first AS (
              SELECT chunk, min(occ_key) AS first_key FROM p GROUP BY chunk
            ), j AS (
              SELECT p.doc_id, p.pos, p.chunk, p.occ_key = f.first_key AS kept
              FROM p JOIN first f USING (chunk)
            )
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN kept THEN chunk END, ' ' ORDER BY pos), '') AS text_dedup,
                   count(*) AS n_chunks,
                   CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
            FROM j GROUP BY doc_id
        """,
        "image_quality_gate": _IMG_CTE
        + """
            SELECT image_id, w, h, fmt, n_bytes,
                   reject_reason IS NULL AS admitted, reject_reason
            FROM (
              SELECT *,
                CASE WHEN NOT COALESCE(fmt IN ('png', 'jpeg'), FALSE) THEN 'format'
                     WHEN NOT COALESCE(w >= 64 AND h >= 64, FALSE) THEN 'too_small'
                     WHEN NOT COALESCE(n_bytes >= 256, FALSE) THEN 'too_few_bytes'
                     WHEN NOT COALESCE(w * 4 >= h * 1 AND w * 1 <= h * 4, FALSE) THEN 'aspect'
                     WHEN NOT (caption IS NOT NULL AND length(caption) >= 5
                               AND length(caption) <= 2048) THEN 'caption'
                     ELSE NULL END AS reject_reason
              FROM img
            )
        """,
        "image_aspect_buckets": _IMG_CTE
        + f"""
            SELECT image_id, w, h,
                   ({_ar_case}).bw AS bucket_w, ({_ar_case}).bh AS bucket_h
            FROM img
        """,
        "image_shard_pack": _IMG_CTE
        + """
            , pos AS (
              SELECT image_id, n_bytes,
                     coalesce(sum(n_bytes) OVER (
                       ORDER BY substr(md5('shard.b' || CAST(image_id AS VARCHAR)), 1, 1),
                                substr(md5('shard' || CAST(image_id AS VARCHAR)), 1, 12),
                                image_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_pos
              FROM img
            )
            SELECT image_id, n_bytes, pack_pos, pack_pos // 100000 AS shard_id
            FROM pos
        """,
        "caption_boilerplate": _IMG_CTE
        + """
            , hot AS (
              SELECT caption, count(*) AS c FROM img
              GROUP BY caption HAVING count(*) > 2
            )
            SELECT image_id, c AS caption_df, c IS NOT NULL AS boilerplate
            FROM img LEFT JOIN hot USING (caption)
        """,
        "image_pair_alignment": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS q
              FROM embeddings
            ), pr AS (
              SELECT a.vec_id // 2 AS pair_id, a.q AS qa, b.q AS qb
              FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
              WHERE a.vec_id % 2 = 0
            ), dots AS (
              SELECT pair_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(qa)), i -> qa[i] * qb[i])),
                       (x, y) -> x + y) AS dot_q,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(qa)), i -> qa[i] * qa[i])),
                       (x, y) -> x + y) AS img_norm2,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, len(qb)), i -> qb[i] * qb[i])),
                       (x, y) -> x + y) AS cap_norm2
              FROM pr
            )
            SELECT pair_id, dot_q, img_norm2, cap_norm2,
                   (img_norm2 > 0 AND cap_norm2 > 0 AND dot_q >= 0 AND
                    dot_q * dot_q * 10000 >= 900 * img_norm2 * cap_norm2) AS aligned
            FROM dots
        """,
        "image_cluster_keepers": grams_cte.replace("WITH base", "WITH RECURSIVE base", 1)
        + """
            , bitsum AS (
              SELECT doc_id, b, sum(CASE WHEN (g >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM grams, generate_series(0, 15) AS t(b)
              GROUP BY doc_id, b
            ), sh AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
              FROM bitsum GROUP BY doc_id
            ), banded AS (
              SELECT doc_id, simhash, b AS band, (simhash >> (b * 4)) & 15 AS band_key
              FROM sh, generate_series(0, 3) AS t(b)
            ), hpairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM banded a
              JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
                           AND a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM hpairs
              UNION SELECT doc_b, doc_a FROM hpairs
            ), reach(u, v) AS (
              SELECT doc_id, doc_id FROM base
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            ), cl AS (
              SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
            ), res AS (
              SELECT doc_id,
                     CAST(32 + CAST('0x' || substr(md5('imw' || CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) * 8 AS BIGINT)
                     * (32 + CAST('0x' || substr(md5('imh' || CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) * 8) AS resolution
              FROM base
            ), scored AS (
              SELECT cl.doc_id, cl.cluster_id, res.resolution
              FROM cl JOIN res USING (doc_id)
            ), ranked AS (
              SELECT cluster_id, doc_id AS keeper_id,
                     row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY resolution DESC, doc_id ASC) AS rk
              FROM scored
            )
            SELECT s.doc_id, s.cluster_id, k.keeper_id,
                   s.doc_id = k.keeper_id AS keep
            FROM scored s
            JOIN ranked k ON s.cluster_id = k.cluster_id AND k.rk = 1
        """,
        "simhash": grams_cte
        + """
            , bitsum AS (
              SELECT doc_id, b, sum(CASE WHEN (g >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM grams, generate_series(0, 15) AS t(b)
              GROUP BY doc_id, b
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
            FROM bitsum GROUP BY doc_id
        """,
        "hamming_near_dups": grams_cte
        + """
            , bitsum AS (
              SELECT doc_id, b, sum(CASE WHEN (g >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM grams, generate_series(0, 15) AS t(b)
              GROUP BY doc_id, b
            ), sh AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
              FROM bitsum GROUP BY doc_id
            ), banded AS (
              SELECT doc_id, simhash, b AS band, (simhash >> (b * 4)) & 15 AS band_key
              FROM sh, generate_series(0, 3) AS t(b)
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
                         AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        """,
        "ann_topk_int": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     list_reduce(list_transform(generate_series(1, len(a.qe)),
                                 i -> a.qe[i] * b.qe[i]), (x, y) -> x + y) AS dot_q
              FROM q a JOIN q b ON a.vec_id < 10 AND b.vec_id != a.vec_id
            )
            SELECT query_id, neighbor_id, dot_q, rn AS rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS INT) AS rn
              FROM pairs
            ) WHERE rn <= 5
        """,
        "lsh_bucket_sizes": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
              FROM embeddings
            ), proj AS (
              SELECT vec_id, b,
                     list_reduce(list_transform(generate_series(1, len(qe)),
                         i -> qe[i] * (((b * 1009) + (i - 1) * 9176 + 7) % 2003 - 1001)),
                         (x, y) -> x + y) AS p
              FROM q, generate_series(0, 7) AS t(b)
            )
            SELECT bucket, count(*) AS n_vecs FROM (
              SELECT vec_id,
                     CAST(sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
              FROM proj GROUP BY vec_id
            ) GROUP BY bucket
        """,
        # ann_cosine_topk: dot and squared norms are EXACT ints; the one
        # division+sqrt is IEEE-correctly-rounded in both engines, so the
        # ordering and floor(cos*1e6) hash-match deterministically.
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
              FROM embeddings
            ), n AS (
              SELECT vec_id, qe,
                     list_reduce(list_transform(qe, x -> x * x), (a, b) -> a + b) AS n2
              FROM q
            ), pairs AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     CAST(list_reduce(list_transform(generate_series(1, len(a.qe)),
                                  i -> a.qe[i] * b.qe[i]), (x, y) -> x + y) AS DOUBLE)
                       / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) AS cos
              FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id != a.vec_id
            )
            SELECT query_id, neighbor_id,
                   CAST(floor(cos * 1000000) AS BIGINT) AS cos_e6,
                   rn AS rank
            FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
              FROM pairs
            ) WHERE rn <= 5
        """,
        "ann_ivf_topk": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
              FROM embeddings
            ), c AS (
              SELECT vec_id AS cid, qe AS cq FROM q WHERE vec_id < 8
            ), dots AS (
              SELECT q.vec_id, q.qe, c.cid,
                     list_reduce(list_transform(generate_series(1, len(q.qe)),
                                 i -> q.qe[i] * c.cq[i]), (x, y) -> x + y) AS cd
              FROM q, c
            ), ranked AS (
              SELECT vec_id, qe, cid,
                     row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, cid) AS rn
              FROM dots
            ), cells AS (
              SELECT vec_id, qe, cid FROM ranked WHERE rn = 1
            ), probes AS (
              SELECT vec_id AS query_id, qe AS qv, cid FROM ranked
              WHERE rn <= 2 AND vec_id < 10
            ), scored AS (
              SELECT p.query_id, ce.vec_id AS neighbor_id,
                     CAST(list_reduce(list_transform(generate_series(1, len(p.qv)),
                          i -> p.qv[i] * ce.qe[i]), (x, y) -> x + y) AS BIGINT) AS dot_q
              FROM probes p JOIN cells ce ON p.cid = ce.cid
              WHERE ce.vec_id != p.query_id
            )
            SELECT query_id, neighbor_id, dot_q, rn AS rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS INT) AS rn
              FROM scored
            ) WHERE rn <= 5
        """,
        # media oracles: independent closed-form derivation of what the
        # Spark side must reproduce by actually building + decoding the
        # binary containers (n_frames = 4 + id%5, sampled every 2nd;
        # square wave n = 1000 + (id%7)·100, period p = 10 + id%5)
        "media_video_sample": """
            SELECT vec_id AS video_id,
                   CAST((4 + vec_id % 5 + 1) // 2 AS BIGINT) AS n_sampled,
                   CAST(((4 + vec_id % 5 - 1) // 2) * 2 AS INT) AS max_idx
            FROM embeddings WHERE vec_id < 100
        """,
        "media_audio_features": """
            WITH a AS (
              SELECT vec_id AS audio_id,
                     1000 + (vec_id % 7) * 100 AS n,
                     10 + vec_id % 5 AS p
              FROM embeddings WHERE vec_id < 100
            )
            SELECT audio_id,
                   CAST(n AS INT) AS n_samples,
                   CAST(1000 * n AS BIGINT) AS abs_sum,
                   CAST((n - 1) // p AS INT) AS zero_crossings
            FROM a
        """,
        "embedding_near_dups": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
              FROM embeddings
            ), proj AS (
              SELECT vec_id, b,
                     list_reduce(list_transform(generate_series(1, len(qe)),
                         i -> qe[i] * (((b * 1009) + (i - 1) * 9176 + 7) % 2003 - 1001)),
                         (x, y) -> x + y) AS p
              FROM q, generate_series(0, 7) AS t(b)
            ), buckets AS (
              SELECT vec_id,
                     CAST(sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
              FROM proj GROUP BY vec_id
            ), cands AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM buckets a JOIN buckets b
                ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            )
            SELECT vec_a, vec_b, dot_q FROM (
              SELECT vec_a, vec_b,
                     CAST(list_reduce(list_transform(generate_series(1, len(qa.qe)),
                          i -> qa.qe[i] * qb.qe[i]), (x, y) -> x + y) AS BIGINT) AS dot_q
              FROM cands
              JOIN q qa ON qa.vec_id = vec_a
              JOIN q qb ON qb.vec_id = vec_b
            ) WHERE dot_q >= 500000
        """,
        "embedding_dedup_clusters": """
            WITH RECURSIVE q AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
              FROM embeddings
            ), proj AS (
              SELECT vec_id, b,
                     list_reduce(list_transform(generate_series(1, len(qe)),
                         i -> qe[i] * (((b * 1009) + (i - 1) * 9176 + 7) % 2003 - 1001)),
                         (x, y) -> x + y) AS p
              FROM q, generate_series(0, 7) AS t(b)
            ), buckets AS (
              SELECT vec_id,
                     CAST(sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
              FROM proj GROUP BY vec_id
            ), cands AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM buckets a JOIN buckets b
                ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ), pairs AS (
              SELECT vec_a, vec_b FROM (
                SELECT vec_a, vec_b,
                       CAST(list_reduce(list_transform(generate_series(1, len(qa.qe)),
                            i -> qa.qe[i] * qb.qe[i]), (x, y) -> x + y) AS BIGINT) AS dot_q
                FROM cands
                JOIN q qa ON qa.vec_id = vec_a
                JOIN q qb ON qb.vec_id = vec_b
              ) WHERE dot_q >= 500000
            ), edges AS (
              SELECT vec_a AS u, vec_b AS v FROM pairs
              UNION SELECT vec_b, vec_a FROM pairs
            ), reach(u, v) AS (
              SELECT vec_id, vec_id FROM q
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
            SELECT u AS vec_id, min(v) AS cluster_id, min(v) = u AS is_keeper
            FROM reach GROUP BY u
        """,
        "containment_pairs": grams_cte
        + """
            , sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
            , gdf AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
            , jg AS (SELECT grams.doc_id, grams.g FROM grams JOIN gdf USING (g) WHERE df <= 25)
            , common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM jg a JOIN jg b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT * FROM (
              SELECT doc_b, doc_a, n_common,
                     sa.n_grams AS grams_a, sb.n_grams AS grams_b,
                     (CAST(n_common AS BIGINT) * 1000) // sa.n_grams AS cont_a_q,
                     (CAST(n_common AS BIGINT) * 1000) // sb.n_grams AS cont_b_q
              FROM common
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
            ) WHERE greatest(cont_a_q, cont_b_q) >= 400
        """,
        "duplicate_spans": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS t
              FROM documents WHERE doc_id < 150
            ), g AS (
              SELECT doc_id, CAST(i AS BIGINT) AS pos,
                     array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' ') AS gram
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
                    FROM toks WHERE len(t) >= 4)
            ), gdf AS (
              SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
            ), starts AS (
              SELECT DISTINCT g.doc_id, g.pos
              FROM g JOIN gdf USING (gram) WHERE df >= 2 AND df <= 50
            ), isl AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
                          THEN 0 ELSE 1 END AS brk
              FROM starts
            ), grp AS (
              SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS island
              FROM isl
            )
            SELECT doc_id, min(pos) AS span_start, max(pos) + 3 AS span_end,
                   max(pos) + 3 - min(pos) + 1 AS span_tokens,
                   CAST(count(*) AS BIGINT) AS n_dup_grams
            FROM grp GROUP BY doc_id, island HAVING count(*) >= 2
        """,
        "jaccard_pairs_capped": grams_cte
        + """
            , sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
            , gdf AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
            , jg AS (SELECT grams.doc_id, grams.g FROM grams JOIN gdf USING (g) WHERE df <= 25)
            , common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM jg a JOIN jg b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_b, doc_a, n_common,
                   sa.n_grams AS grams_a, sb.n_grams AS grams_b
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
        """,
        # robots_parse: the oracle derives the expected rule rows
        # INDEPENDENTLY from the same generation arithmetic — the Spark
        # side must reproduce them by actually parsing the text.
        "robots_parse": """
            WITH n AS (
              SELECT lower(replace(n_name, ' ', '-')) || '.test' AS host,
                     n_nationkey AS k
              FROM nation
            )
            SELECT host, 'disallow' AS directive, '/private/*' AS path_pattern,
                   CASE WHEN k % 2 = 0 THEN CAST(k % 5 + 1 AS DOUBLE) END AS crawl_delay,
                   CAST(CASE WHEN k % 4 <> 3 THEN 1 ELSE 0 END AS INT) AS n_sitemaps
            FROM n
            UNION ALL
            SELECT host, 'allow', '/private/ok*',
                   CASE WHEN k % 2 = 0 THEN CAST(k % 5 + 1 AS DOUBLE) END,
                   CAST(CASE WHEN k % 4 <> 3 THEN 1 ELSE 0 END AS INT)
            FROM n WHERE k % 3 = 0
        """,
        "x2_html_parse": """
            SELECT doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS title,
                   CASE WHEN doc_id % 4 = 0 THEN 'og ' || CAST(doc_id AS VARCHAR)
                        ELSE 'meta ' || CAST(doc_id AS VARCHAR) END AS description
            FROM documents
        """,
        "f3_seed_classification": """
            WITH s AS (
              SELECT CASE
                       WHEN p_partkey % 5 = 0 THEN 'p' || CAST(p_partkey AS VARCHAR) || '.test'
                       WHEN p_partkey % 3 = 0 THEN 'https://p' || CAST(p_partkey AS VARCHAR) || '.test/x$'
                       ELSE 'https://p' || CAST(p_partkey AS VARCHAR) || '.test/pre'
                     END AS raw
              FROM part
            ), cls AS (
              SELECT CASE WHEN raw LIKE '%$' THEN substr(raw, 1, length(raw) - 1) ELSE raw END AS seed,
                     CASE WHEN raw NOT LIKE 'http%' THEN 'domain'
                          WHEN raw LIKE '%$' THEN 'exact'
                          ELSE 'prefix' END AS kind
              FROM s
            )
            SELECT CASE WHEN kind = 'domain' THEN 'http://' || seed || '/' ELSE seed END AS url,
                   kind,
                   kind = 'exact' AS skip_discovery
            FROM cls
        """,
        "s4_sitemap_closure": """
            SELECT DISTINCT 'https://t.test/c/' || CAST(c_custkey AS VARCHAR) AS url
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_regionkey % 2 = 0
        """,
        # warc oracles: the Spark side writes REAL gzip'd WARC bytes and
        # reads them back; the oracle derives every parsed field (and the
        # exact raw byte count — record = 277 + 2·digits(doc_id) bytes
        # for this fixed header/content shape) in closed form.
        "warc_roundtrip": """
            SELECT 'https://w.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(CASE WHEN doc_id % 7 = 3 THEN 404 ELSE 200 END AS INT) AS status,
                   CAST(1 AS INT) AS n_headers,
                   CAST(18 + length(CAST(doc_id AS VARCHAR)) AS INT) AS content_len,
                   substr('payload ' || CAST(doc_id AS VARCHAR)
                          || chr(10) || chr(10) || 'second '
                          || CAST(doc_id % 7 AS VARCHAR), 1, 12) AS head12
            FROM documents WHERE doc_id % 10 <> 0
        """,
        "a6_compression_ratio": """
            SELECT CAST(sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
                   CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
                   CAST(sum(CASE WHEN doc_id % 10 <> 0
                        THEN 277 + 2 * length(CAST(doc_id AS VARCHAR)) ELSE 0 END) AS BIGINT) AS bytes_raw,
                   TRUE AS ratio_bounded
            FROM documents
        """,
    }

    # curation_pipeline: the composed twin — each stage is the SAME SQL
    # as its standalone oracle (nested as CTE subqueries), so the
    # composite cannot drift from the parts.
    oracles["curation_pipeline"] = """
WITH gate AS ({g}),
     cl AS ({c}),
     cont AS ({k}),
     spl AS ({s}),
     cand AS (SELECT doc_id FROM documents WHERE doc_id < 150 AND doc_id % 10 <> 0),
     j AS (
       SELECT cand.doc_id, gate."pass" AS q_pass, gate.reject_reason AS q_reason,
              cl.is_keeper, cont.n_grams, cont.n_hits, spl.split
       FROM cand
       LEFT JOIN gate ON gate.doc_id = cand.doc_id
       LEFT JOIN cl ON cl.doc_id = cand.doc_id
       LEFT JOIN cont ON cont.doc_id = cand.doc_id
       LEFT JOIN spl ON spl.doc_id = cand.doc_id
     ), staged AS (
       SELECT doc_id, split,
              CASE WHEN NOT q_pass THEN 'quality:' || q_reason
                   WHEN NOT COALESCE(is_keeper, TRUE) THEN 'duplicate'
                   WHEN COALESCE(n_hits * 5 > n_grams, FALSE) THEN 'contaminated'
                   ELSE NULL END AS reject_stage
       FROM j
     )
SELECT doc_id, reject_stage IS NULL AS admitted, reject_stage,
       CASE WHEN reject_stage IS NULL THEN split ELSE NULL END AS split
FROM staged
""".format(
        g=oracles["text_quality_gate"],
        c=oracles["dedup_clusters"],
        k=oracles["benchmark_contamination"],
        s=oracles["sample_split"],
    )

    # crawl-intelligence twins over the shared deterministic pages CTE
    oracles["batch_novelty"] = __import__(
        "netrunner_spark.operators.sketches", fromlist=["bloom_novelty_sql"]
    ).bloom_novelty_sql(
        "SELECT content_hash FROM pages"
        " WHERE regexp_extract(url, '/p/([0-9])', 1) IN ('0', '1', '2')",
        "SELECT host, content_hash FROM pages"
        " WHERE regexp_extract(url, '/p/([0-9])', 1) IN ('0', '3')"
        " OR (regexp_extract(url, '/p/([0-9])', 1) = '4'"
        " AND regexp_extract(url, '^https://h([0-9])', 1)"
        " IN ('0', '2', '4', '6'))",
        key="content_hash",
        group_col="host",
        extra_cte=_PAGES_CTE,
    )
    # novelty_budget_alloc: the novelty twin nested verbatim, fed into
    # the same largest-remainder apportionment as crawl_budget_alloc
    oracles["novelty_budget_alloc"] = f"""
WITH nv AS ({oracles["batch_novelty"]}),
sh AS (
  SELECT host, novelty_pm AS weight,
         sum(novelty_pm) OVER () AS s_tot,
         CAST(CASE WHEN sum(novelty_pm) OVER () = 0 THEN 0
              ELSE 997 * novelty_pm // sum(novelty_pm) OVER () END AS BIGINT) AS fl,
         CAST(CASE WHEN sum(novelty_pm) OVER () = 0 THEN 0
              ELSE 997 * novelty_pm % sum(novelty_pm) OVER () END AS BIGINT) AS rem
  FROM nv
), r AS (
  SELECT *, CASE WHEN s_tot = 0 THEN 0 ELSE 997 - sum(fl) OVER () END AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
  FROM sh
)
SELECT host, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""
    oracles["mirror_hosts"] = (
        "WITH "
        + _PAGES_CTE
        + """
, ph AS (SELECT DISTINCT host, content_hash FROM pages),
hot AS (SELECT content_hash FROM ph GROUP BY content_hash HAVING count(*) <= 4),
keep AS (SELECT ph.host, ph.content_hash FROM ph JOIN hot USING (content_hash)),
tot AS (SELECT host, count(*) AS n FROM keep GROUP BY host),
pr AS (SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS shared
       FROM keep a JOIN keep b ON a.content_hash = b.content_hash AND a.host < b.host
       GROUP BY a.host, b.host HAVING count(*) >= 3)
SELECT host_a, host_b, shared,
       CAST(shared * 1000 // least(ta.n, tb.n) AS BIGINT) AS overlap_permille
FROM pr
JOIN tot ta ON ta.host = pr.host_a
JOIN tot tb ON tb.host = pr.host_b
"""
    )
    oracles["dust_params"] = (
        "WITH "
        + _PAGES_CTE
        + """
, u AS (
  SELECT url, max(content_hash) AS chash FROM pages
  WHERE url LIKE '%?%' GROUP BY url
), pp AS (
  SELECT url, chash,
         regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         split_part(url, '?', 1) AS base,
         split_part(kv, '=', 1) AS param,
         split_part(kv, '=', 2) AS pval,
         kv
  FROM (SELECT url, chash, unnest(string_split(split_part(url, '?', 2), '&')) AS kv
        FROM u)
), gk AS (
  SELECT h.url, h.param,
         h.base || '?' || coalesce(string_agg(o.kv, '&' ORDER BY o.kv), '') AS group_key
  FROM (SELECT DISTINCT url, base, param FROM pp) h
  LEFT JOIN pp o ON o.url = h.url AND o.param <> h.param
  GROUP BY h.url, h.param, h.base
), g AS (
  SELECT p.host, p.param, gk.group_key,
         count(DISTINCT p.pval) AS n_vals,
         count(DISTINCT p.chash) AS n_hashes
  FROM pp p JOIN gk ON gk.url = p.url AND gk.param = p.param
  GROUP BY p.host, p.param, gk.group_key
)
SELECT host, param,
       CAST(sum(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_evidence,
       CAST(sum(CASE WHEN n_vals >= 2 AND n_hashes >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       sum(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN n_vals >= 2 AND n_hashes >= 2 THEN 1 ELSE 0 END) = 0
         AS irrelevant
FROM g GROUP BY host, param
"""
    )
    oracles["host_harvest"] = (
        "WITH "
        + _PAGES_CTE
        + """
SELECT host,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT content_hash) AS BIGINT) AS n_content,
       CAST(count(DISTINCT content_hash) * 1000 // count(DISTINCT url) AS BIGINT)
         AS harvest_permille,
       count(DISTINCT url) >= 20
         AND count(DISTINCT content_hash) * 1000 // count(DISTINCT url) <= 200
         AS is_trap
FROM pages GROUP BY host
"""
    )
    oracles["crawl_budget_alloc"] = (
        "WITH "
        + _PAGES_CTE
        + """
, hh AS (
  SELECT host,
         CAST(count(DISTINCT content_hash) * 1000 // count(DISTINCT url) AS BIGINT) AS w
  FROM pages GROUP BY host
), sh AS (
  SELECT host, w AS weight,
         CAST(997 * w // sum(w) OVER () AS BIGINT) AS fl,
         CAST(997 * w % sum(w) OVER () AS BIGINT) AS rem
  FROM hh
), r AS (
  SELECT *, 997 - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
  FROM sh
)
SELECT host, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""
    )
    oracles["redirect_resolve"] = """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT event_id % 60 AS n FROM events WHERE (event_id % 60) % 10 <> 0
), edges AS (
  SELECT n AS src, CASE WHEN n = 41 THEN 49 ELSE n - 1 END AS dst FROM nodes
), walk AS (
  SELECT src AS start, dst AS cur, 1 AS hops FROM edges
  UNION ALL
  SELECT w.start, e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.cur
  WHERE w.hops < 12
), last AS (
  SELECT start, cur, hops,
         row_number() OVER (PARTITION BY start ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT l.start, l.cur AS final, CAST(l.hops AS INT) AS hops,
       CASE WHEN o.src IS NULL THEN 'resolved' ELSE 'capped' END AS status
FROM last l
LEFT JOIN (SELECT DISTINCT src FROM edges) o ON o.src = l.cur
WHERE rn = 1
"""
    oracles["sitemap_diff"] = """
WITH u AS (
  SELECT 'https://h' || CAST(user_id % 8 AS VARCHAR) || '.test/s/'
           || CAST(event_id % 200 AS VARCHAR) AS url,
         event_id, event_id % 37 AS day
  FROM events
), o AS (
  SELECT url, CAST(max(day) AS BIGINT) AS old_lastmod
  FROM u WHERE event_id % 7 <> 0 GROUP BY url
), n AS (
  SELECT url,
         CAST(max(day + CASE WHEN event_id % 11 = 0 THEN 3 ELSE 0 END) AS BIGINT)
           AS new_lastmod
  FROM u WHERE event_id % 5 <> 0 GROUP BY url
)
SELECT COALESCE(o.url, n.url) AS url, old_lastmod, new_lastmod,
       CASE WHEN o.url IS NULL THEN 'added'
            WHEN n.url IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM o FULL OUTER JOIN n ON o.url = n.url
WHERE o.url IS NULL OR n.url IS NULL
   OR old_lastmod IS DISTINCT FROM new_lastmod
"""
    oracles["link_communities"] = _lpa_sql(3)
    # host_crawl_report: harvest + mirror twins nested verbatim (the
    # no-drift composition trick), then the budget window over the
    # composed effective weight
    oracles["host_crawl_report"] = (
        "WITH hh AS (\n"
        + oracles["host_harvest"]
        + "\n), mm AS (\n"
        + oracles["mirror_hosts"]
        + "\n)"
        + """
, sec AS (SELECT DISTINCT host_b AS host FROM mm WHERE overlap_permille >= 500),
st AS (
  SELECT hh.host, hh.n_urls, hh.harvest_permille, hh.is_trap,
         sec.host IS NOT NULL AS mirror_secondary,
         CASE WHEN sec.host IS NOT NULL OR hh.is_trap
              THEN 0 ELSE hh.harvest_permille END AS eff_w
  FROM hh LEFT JOIN sec ON sec.host = hh.host
), sh AS (
  SELECT host, eff_w,
         CAST(997 * eff_w // sum(eff_w) OVER () AS BIGINT) AS fl,
         CAST(997 * eff_w % sum(eff_w) OVER () AS BIGINT) AS rem
  FROM st
), r AS (
  SELECT *, 997 - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
  FROM sh
)
SELECT st.host, st.n_urls, st.harvest_permille, st.is_trap, st.mirror_secondary,
       CAST(r.fl + CASE WHEN r.rn <= r.leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM st JOIN r ON r.host = st.host
"""
    )
    # search_rerank_anchors: the bm25 twin nested verbatim as the L1
    # candidate CTE, anchor profile + query-term literals joined for the
    # L2 bonus, then the deterministic re-rank window
    oracles["search_rerank_anchors"] = (
        "WITH c AS (\n"
        + oracles["bm25_search"]
        + "\n)"
        + """
, links AS (
  SELECT doc_id AS dst,
         CASE WHEN t.k < 2 THEN
           CASE doc_id % 5 WHEN 0 THEN 'spark' WHEN 1 THEN 'merge'
                WHEN 2 THEN 'customer' WHEN 3 THEN 'window'
                ELSE 'batch' END
         ELSE 'homepage' END AS anchor
  FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(k)
), aterms AS (
  SELECT dst, unnest(regexp_split_to_array(lower(anchor), '[^a-z0-9]+')) AS term
  FROM links
), ac AS (
  SELECT dst, term, CAST(count(*) AS BIGINT) AS n
  FROM aterms WHERE term <> '' GROUP BY dst, term
), a AS (
  SELECT dst, term, n FROM (
    SELECT *, row_number() OVER (PARTITION BY dst ORDER BY n DESC, term ASC) AS rnk
    FROM ac) WHERE rnk <= 3
), qt(query_id, term) AS (
  VALUES __QT_VALUES__
), b AS (
  SELECT c.query_id, c.doc_id, c.score_q,
         CAST(coalesce(sum(a.n), 0) * 500 AS BIGINT) AS anchor_bonus
  FROM c
  JOIN qt ON qt.query_id = c.query_id
  LEFT JOIN a ON a.dst = c.doc_id AND a.term = qt.term
  GROUP BY c.query_id, c.doc_id, c.score_q
)
SELECT query_id, doc_id, score_q, anchor_bonus,
       CAST(score_q + anchor_bonus AS BIGINT) AS final_q,
       CAST(row_number() OVER (
         PARTITION BY query_id
         ORDER BY score_q + anchor_bonus DESC, doc_id ASC) AS INT) AS rk
FROM b
"""
    ).replace("__QT_VALUES__", "(1, 'join'), (1, 'spark'), (1, 'window'), (2, 'batch'), (2, 'merge'), (2, 'sort'), (3, 'customer'), (3, 'scan'), (3, 'table')")
    # dust_apply: the dust_params twin nested verbatim as the rules CTE,
    # then the same strip/re-serialize algebra and the per-host collapse
    oracles["dust_apply"] = (
        "WITH rules AS (\n"
        + oracles["dust_params"]
        + "\n), "
        + _PAGES_CTE.strip()
        + """
, u AS (SELECT DISTINCT url FROM pages),
kv AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         split_part(url, '?', 1) AS base,
         unnest(string_split(split_part(url, '?', 2), '&')) AS kv
  FROM u WHERE url LIKE '%?%'
), j AS (
  SELECT kv.url, kv.base, kv.kv, r.irrelevant
  FROM kv LEFT JOIN rules r
    ON r.host = kv.host AND r.param = split_part(kv.kv, '=', 1)
), rw AS (
  SELECT url,
         CASE WHEN count(CASE WHEN NOT coalesce(irrelevant, FALSE) THEN 1 END) > 0
              THEN base || '?' || string_agg(
                     CASE WHEN NOT coalesce(irrelevant, FALSE) THEN kv END,
                     '&' ORDER BY kv)
              ELSE base END AS rewritten
  FROM j GROUP BY url, base
), all_u AS (
  SELECT url, url AS rewritten FROM u WHERE url NOT LIKE '%?%'
  UNION ALL SELECT url, rewritten FROM rw
)
SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT rewritten) AS BIGINT) AS n_collapsed,
       CAST(count(DISTINCT rewritten) * 1000 // count(DISTINCT url) AS BIGINT)
         AS collapse_permille
FROM all_u GROUP BY 1
"""
    )
    oracles["pack_sequences"] = """
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 4
           AS bucket
  FROM documents
), c AS (
  SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM base
)
SELECT doc_id, n_tokens, bucket,
       CAST(bucket * 4294967296 + cum // 256 AS BIGINT) AS seq_id,
       CAST(cum % 256 AS BIGINT) AS start_offset
FROM c
"""
    oracles["mixture_plan"] = """
WITH t(source, target_permille) AS (
  VALUES ('src0', CAST(400 AS BIGINT)), ('src1', 300), ('src2', 200), ('src3', 100)
), per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT p.source, p.n_docs, p.n_tokens,
       CAST(coalesce(t.target_permille, 0) AS BIGINT) AS target_permille,
       CAST(1000000 * coalesce(t.target_permille, 0) // 1000 AS BIGINT)
         AS target_tokens,
       CAST(1000000 * coalesce(t.target_permille, 0) // 1000 * 1000 // p.n_tokens
            AS BIGINT) AS repeat_permille
FROM per_src p LEFT JOIN t ON t.source = p.source
"""
    oracles["mixture_apply"] = """
WITH t(source, target_permille) AS (
  VALUES ('src0', CAST(400 AS BIGINT)), ('src1', 300), ('src2', 200), ('src3', 100)
), per_src AS (
  SELECT source,
         CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), plan AS (
  SELECT p.source,
         30000 * coalesce(t.target_permille, 0) // 1000 * 1000 // p.n_tokens AS rp
  FROM per_src p LEFT JOIN t ON t.source = p.source
), j AS (
  SELECT d.doc_id, d.source,
         plan.rp // 1000
           + CASE WHEN CAST('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 12)
                       AS BIGINT) % 1000 < plan.rp % 1000
                  THEN 1 ELSE 0 END AS n
  FROM documents d JOIN plan ON plan.source = d.source
)
SELECT doc_id, source, CAST(unnest(range(n)) AS BIGINT) AS copy
FROM j WHERE n > 0
"""
    # dedup_eval: both stage twins nested verbatim, then the P/R math
    oracles["dedup_eval"] = (
        "WITH tr0 AS (\n"
        + oracles["jaccard_pairs_capped"]
        + "\n), pr AS (\n"
        + oracles["minhash_lsh_capped"]
        + "\n)"
        + """
, tr AS (
  SELECT doc_a, doc_b FROM tr0
  WHERE n_common * 1000 >= 20 * (grams_a + grams_b - n_common)
), lab AS (
  SELECT CASE WHEN t.doc_a IS NULL THEN 0 ELSE 1 END AS t,
         CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END AS p
  FROM tr t FULL OUTER JOIN pr p
    ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
)
SELECT CAST(sum(t) AS BIGINT) AS n_truth,
       CAST(sum(p) AS BIGINT) AS n_pred,
       CAST(sum(t * p) AS BIGINT) AS n_tp,
       CAST(sum(t * p) * 1000 // greatest(sum(p), 1) AS BIGINT)
         AS precision_permille,
       CAST(sum(t * p) * 1000 // greatest(sum(t), 1) AS BIGINT)
         AS recall_permille
FROM lab
"""
    )
    oracles["winnow_dups"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM documents
), g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 4)
), h AS (
  SELECT doc_id, pos,
         (CAST('0x' || substr(md5(gram), 1, 13) AS BIGINT) % 1099511627776)
           * 1048576 + (1048575 - pos) AS combo
  FROM g
), m AS (
  SELECT doc_id, pos,
         min(combo) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS cm
  FROM h
), f AS (SELECT DISTINCT doc_id, cm FROM m WHERE pos >= 5)
SELECT CAST(cm // 1048576 AS BIGINT) AS fp_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM f GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
"""
    # phash_radius_search: the simhash twin nested, planted queries,
    # identical banding/verify algebra
    oracles["phash_radius_search"] = (
        "WITH sh AS (\n"
        + oracles["simhash"]
        + "\n)"
        + """
, q AS (
  SELECT doc_id + 1000 AS query_id, xor(simhash, 3) AS qsig
  FROM sh WHERE doc_id IN (5, 17, 42)
), cb AS (
  SELECT doc_id, simhash, b AS band, (simhash >> (b * 4)) & 15 AS band_key
  FROM sh, generate_series(0, 3) AS t(b)
), qb AS (
  SELECT query_id, qsig, b AS band, (qsig >> (b * 4)) & 15 AS band_key
  FROM q, generate_series(0, 3) AS t(b)
), cand AS (
  SELECT DISTINCT qb.query_id, cb.doc_id, cb.simhash, qb.qsig
  FROM cb JOIN qb ON cb.band = qb.band AND cb.band_key = qb.band_key
)
SELECT query_id, doc_id,
       CAST(bit_count(xor(simhash, qsig)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(simhash, qsig)) <= 2
"""
    )
    oracles["warc_revisit_plan"] = """
WITH u AS (SELECT event_id, event_id % 150 AS k FROM events),
o AS (
  SELECT DISTINCT
         'https://h' || CAST(k % 8 AS VARCHAR) || '.test/r/' || CAST(k AS VARCHAR) AS url,
         md5('a-' || CAST(k AS VARCHAR)) AS prior_hash
  FROM u WHERE event_id % 7 <> 0
), n AS (
  SELECT DISTINCT
         'https://h' || CAST(k % 8 AS VARCHAR) || '.test/r/' || CAST(k AS VARCHAR) AS url,
         CASE WHEN k % 5 = 0 THEN md5('b-' || CAST(k AS VARCHAR))
              ELSE md5('a-' || CAST(k AS VARCHAR)) END AS h,
         CAST(50 + k AS BIGINT) AS b
  FROM u WHERE event_id % 5 <> 0
)
SELECT n.url,
       CASE WHEN o.prior_hash IS NULL THEN 'new'
            WHEN o.prior_hash = n.h THEN 'revisit' ELSE 'changed' END AS kind,
       o.prior_hash,
       CAST(CASE WHEN o.prior_hash = n.h THEN 0 ELSE n.b END AS BIGINT)
         AS bytes_to_write
FROM n LEFT JOIN o ON o.url = n.url
"""
    oracles["reciprocal_links"] = """
WITH links AS (
  SELECT CASE WHEN event_id % 9 = 0 THEN 'x.test'
              WHEN event_id % 9 = 3 THEN 'y.test'
              ELSE 'h' || CAST(user_id % 6 AS VARCHAR) || '.test' END AS s,
         CASE WHEN event_id % 9 = 0 THEN 'y.test'
              WHEN event_id % 9 = 3 THEN 'x.test'
              ELSE 'h' || CAST(event_id % 6 AS VARCHAR) || '.test' END AS d
  FROM events
), pp AS (
  SELECT s, d, CAST(count(*) AS BIGINT) AS n
  FROM links WHERE s <> d GROUP BY s, d
), f AS (SELECT s AS host_a, d AS host_b, n AS n_ab FROM pp WHERE s < d),
r AS (SELECT d AS host_a, s AS host_b, n AS n_ba FROM pp WHERE s > d)
SELECT COALESCE(f.host_a, r.host_a) AS host_a,
       COALESCE(f.host_b, r.host_b) AS host_b,
       CAST(coalesce(n_ab, 0) AS BIGINT) AS n_ab,
       CAST(coalesce(n_ba, 0) AS BIGINT) AS n_ba,
       CAST(2 * least(coalesce(n_ab, 0), coalesce(n_ba, 0)) * 1000
            // (coalesce(n_ab, 0) + coalesce(n_ba, 0)) AS BIGINT)
         AS reciprocity_permille
FROM f FULL OUTER JOIN r ON f.host_a = r.host_a AND f.host_b = r.host_b
WHERE coalesce(n_ab, 0) + coalesce(n_ba, 0) >= 4
"""
    oracles["anchor_text_topk"] = """
WITH links AS (
  SELECT 'https://t.test/d/' || CAST(event_id % 40 AS VARCHAR) AS dst,
         event_type || ' page' || CAST(user_id % 5 AS VARCHAR) AS anchor
  FROM events
), terms AS (
  SELECT dst, unnest(regexp_split_to_array(lower(anchor), '[^a-z0-9]+')) AS term
  FROM links
), c AS (
  SELECT dst, term, CAST(count(*) AS BIGINT) AS n
  FROM terms WHERE term <> '' GROUP BY dst, term
), r AS (
  SELECT *, row_number() OVER (PARTITION BY dst ORDER BY n DESC, term ASC) AS rnk
  FROM c
)
SELECT dst, term, n, CAST(rnk AS INT) AS "rank" FROM r WHERE rnk <= 3
"""
    oracles["link_spam_hosts"] = """
WITH links AS (
  SELECT CASE WHEN event_id % 4 = 0 THEN 'farm.test'
              ELSE 'h' || CAST(user_id % 10 AS VARCHAR) || '.test' END AS src_host,
         CASE WHEN event_id % 4 = 0 THEN 'spam.test'
              ELSE 'd' || CAST(event_id % 6 AS VARCHAR) || '.test' END AS dst_host
  FROM events
), per_src AS (
  SELECT dst_host, src_host, CAST(count(*) AS BIGINT) AS n_from_src
  FROM links GROUP BY dst_host, src_host
)
SELECT dst_host,
       CAST(sum(n_from_src) AS BIGINT) AS n_inlinks,
       CAST(count(*) AS BIGINT) AS n_src_hosts,
       CAST(max(n_from_src) * 1000 // sum(n_from_src) AS BIGINT)
         AS top_src_share_permille,
       CAST(count(*) * 1000 // sum(n_from_src) AS BIGINT) AS diversity_permille,
       sum(n_from_src) >= 20
         AND max(n_from_src) * 1000 // sum(n_from_src) >= 600 AS is_link_farm
FROM per_src GROUP BY dst_host
"""
    oracles["cdc_chunks"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
), tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i AS INT)] AS token
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)
), b AS (
  SELECT doc_id, pos, token,
         CASE WHEN CAST('0x' || substr(md5(token), 1, 13) AS BIGINT) % 16 = 0
              THEN 1 ELSE 0 END AS boundary
  FROM tok
), ch AS (
  SELECT doc_id, pos, token,
         coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM b
), pc AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM ch GROUP BY doc_id, chunk_id
)
SELECT chunk_hash,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM pc GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
"""
    # image_dedup_savings: the keeper twin nested verbatim (same
    # no-drift trick as curation_pipeline), joined to the image meta CTE
    oracles["image_dedup_savings"] = (
        "WITH k AS (\n"
        + oracles["image_cluster_keepers"]
        + "\n)"
        + _IMG_CTE.replace("\nWITH img AS", ", img AS")
        + """
SELECT img.fmt,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CASE WHEN NOT k.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN NOT k.keep THEN img.n_bytes ELSE 0 END) AS BIGINT)
         AS bytes_dropped,
       CAST(sum(img.n_bytes) AS BIGINT) AS bytes_total,
       CAST(sum(CASE WHEN NOT k.keep THEN img.n_bytes ELSE 0 END) * 1000
            // sum(img.n_bytes) AS BIGINT) AS saved_permille
FROM k JOIN img ON img.image_id = k.doc_id
GROUP BY img.fmt
"""
    )
    # soft_dedup_weights: the dedup_clusters twin nested verbatim +
    # one window over the cluster table (1000/m permille per member)
    oracles["soft_dedup_weights"] = (
        "WITH c AS (\n"
        + oracles["dedup_clusters"]
        + """
), sized AS (
  SELECT doc_id, cluster_id,
         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
         is_keeper
  FROM c
)
SELECT doc_id, cluster_id, cluster_size,
       CAST(1000 // cluster_size AS BIGINT) AS weight_pm, is_keeper
FROM sized
"""
    )
    # image_canonical_pairs: keeper twin + caption-consensus twin
    # nested verbatim (no-drift), joined to the image meta CTE
    oracles["image_canonical_pairs"] = (
        "WITH kp AS (\n"
        + oracles["image_cluster_keepers"]
        + "\n), cc AS (\n"
        + oracles["caption_consensus"]
        + "\n)"
        + _IMG_CTE.replace("\nWITH img AS", ", img AS")
        + """
SELECT kp.doc_id AS image_id, kp.cluster_id, img.w, img.h, img.fmt,
       cc.canon_caption, cc.n_copies
FROM kp
JOIN cc ON cc.image_id = kp.doc_id
JOIN img ON img.image_id = kp.doc_id
WHERE kp.keep
"""
    )
    oracles["recrawl_schedule"] = """
WITH revisits AS (
  SELECT 'https://h' || CAST((event_id % 200) % 8 AS VARCHAR)
           || '.test/p/' || CAST(event_id % 200 AS VARCHAR) AS url,
         event_id // 200 AS visit_no,
         md5(CASE (event_id % 200) % 4
             WHEN 0 THEN 'u' || CAST(event_id % 200 AS VARCHAR) || '-'
                         || CAST(event_id // 200 AS VARCHAR)
             WHEN 1 THEN 'u' || CAST(event_id % 200 AS VARCHAR) || '-'
                         || CAST((event_id // 200) // 3 AS VARCHAR)
             WHEN 2 THEN 'u' || CAST(event_id % 200 AS VARCHAR)
             ELSE 'u' || CAST(event_id % 200 AS VARCHAR) || '-'
                  || CAST((event_id // 200) // 10 AS VARCHAR) END) AS content_hash
  FROM events
), lagd AS (
  SELECT url, content_hash,
         lag(content_hash) OVER (PARTITION BY url ORDER BY visit_no) AS prior
  FROM revisits
), agg AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_visits,
         CAST(sum(CASE WHEN prior IS NOT NULL AND prior <> content_hash
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
  FROM lagd GROUP BY url
)
SELECT url, n_visits, n_changes,
       CASE WHEN n_visits >= 2
            THEN CAST(n_changes * 1000 // (n_visits - 1) AS BIGINT) END
         AS change_permille,
       CAST(CASE WHEN n_visits < 2 THEN 86400
                 WHEN n_changes = 0 THEN 2592000
                 ELSE greatest(3600, least(2592000,
                      86400 * 1000 // (n_changes * 1000 // (n_visits - 1))))
            END AS BIGINT) AS next_interval_s
FROM agg
"""
    oracles["url_templates"] = (
        "WITH "
        + _PATHPAGES_CTE
        + ", "
        + _TMPL_T_CTE
        + ", "
        + _TMPL_G_CTE
        + """
SELECT host, template, n_urls, n_hashes,
       CAST(n_urls * 1000 // n_hashes AS BIGINT) AS urls_per_hash_permille,
       (n_urls >= 5 AND n_urls * 1000 >= 3000 * n_hashes) AS unbounded
FROM g
"""
    )
    oracles["template_cap_apply"] = (
        "WITH "
        + _PATHPAGES_CTE
        + ", "
        + _TMPL_T_CTE
        + ", "
        + _TMPL_G_CTE
        + """
, v AS (
  SELECT host, template FROM g
  WHERE n_urls >= 5 AND n_urls * 1000 >= 3000 * n_hashes
), u AS (
  SELECT DISTINCT t.host, t.template, t.url FROM t
), rn AS (
  SELECT u.url, u.host, u.template,
         row_number() OVER (PARTITION BY u.host, u.template
                            ORDER BY md5(u.url), u.url) AS rn
  FROM u JOIN v ON v.host = u.host AND v.template = u.template
)
SELECT url, host, template, TRUE AS keep
FROM u ANTI JOIN v ON v.host = u.host AND v.template = u.template
UNION ALL
SELECT url, host, template, rn <= 3 AS keep FROM rn
"""
    )
    oracles["host_health"] = """
WITH fetchlog AS (
  SELECT 'h' || CAST(user_id % 8 AS VARCHAR) || '.test' AS host,
         CASE WHEN event_id % (CASE user_id % 8
                   WHEN 0 THEN 4 WHEN 1 THEN 12 ELSE 50 END) = 0 THEN 503
              WHEN event_id % 17 = 0 THEN 404 ELSE 200 END AS status,
         40 + (event_id % 11) * 37
           + CASE WHEN user_id % 8 = 7 THEN 600 ELSE 0 END AS latency_ms
  FROM events
), agg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN status BETWEEN 200 AND 299 THEN 1 ELSE 0 END)
              * 1000 // count(*) AS BIGINT) AS ok_permille,
         CAST(sum(CASE WHEN status BETWEEN 400 AND 499 THEN 1 ELSE 0 END)
              * 1000 // count(*) AS BIGINT) AS err4_permille,
         CAST(sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END)
              * 1000 // count(*) AS BIGINT) AS err5_permille,
         CAST(sum(latency_ms) // count(*) AS BIGINT) AS mean_latency_ms,
         CAST(sum(CASE WHEN latency_ms > 500 THEN 1 ELSE 0 END)
              * 1000 // count(*) AS BIGINT) AS slow_permille
  FROM fetchlog GROUP BY host
)
SELECT host, n_fetches, ok_permille, err4_permille, err5_permille,
       mean_latency_ms, slow_permille,
       CAST(CASE WHEN err5_permille >= 200 OR slow_permille >= 500 THEN 4
                 WHEN err5_permille >= 50 OR slow_permille >= 200 THEN 2
                 ELSE 1 END AS BIGINT) AS backoff,
       CAST(500 * (CASE WHEN err5_permille >= 200 OR slow_permille >= 500 THEN 4
                        WHEN err5_permille >= 50 OR slow_permille >= 200 THEN 2
                        ELSE 1 END) AS BIGINT) AS crawl_delay_ms
FROM agg
"""
    oracles["boilerplate_strip"] = """
WITH tok AS (
  SELECT doc_id, grp, token FROM (
    SELECT doc_id, source AS grp,
           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents
  ) WHERE token <> ''
), tf AS (
  SELECT grp, doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY grp, doc_id, token
), gd AS (
  SELECT source AS grp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), dfb AS (
  SELECT tf.grp, tf.token,
         (CAST(count(*) AS BIGINT) * 1000 >= 600 * max(gd.n_docs)
          AND max(gd.n_docs) >= 5) AS boiler
  FROM tf JOIN gd ON gd.grp = tf.grp
  GROUP BY tf.grp, tf.token
)
SELECT doc_id, tf.grp AS grp,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN boiler THEN tf ELSE 0 END) AS BIGINT) AS boiler_tokens,
       CAST((sum(tf) - sum(CASE WHEN boiler THEN tf ELSE 0 END)) * 1000
            // sum(tf) AS BIGINT) AS content_permille
FROM tf JOIN dfb ON dfb.grp = tf.grp AND dfb.token = tf.token
GROUP BY doc_id, tf.grp
"""
    oracles["seed_distance"] = _bfs_sql(6)
    oracles["graph_hyperball"] = _hyperball_sql(3, 4, "hb")
    oracles["graph_hyperball_nf"] = _hyperball_nf_sql(3, 4, "hb")
    oracles["graph_ball_sizes"] = _ball_sizes_sql(3)
    oracles["graph_harmonic_centrality"] = _harmonic_sql(3)
    oracles["graph_neighborhood_function"] = _nf_exact_sql(3)
    oracles["graph_random_walks"] = _random_walks_sql(4, 2, "rw")
    oracles["graph_skipgram_pairs"] = _skipgram_sql(2, 4, 2, "rw")
    oracles["graph_neighbor_sample"] = _neighbor_sample_sql(3, "ns")
    oracles["reach_budget_alloc"] = _reach_budget_sql(997, 4, 2)
    oracles["link_kcore"] = _kcore_sql(4, 2)
    oracles["warc_cdx_index"] = """
WITH rec AS (
  SELECT 'https://h' || CAST(event_id % 8 AS VARCHAR) || '.sub.test/p/'
           || CAST(event_id % 50 AS VARCHAR)
           || CASE WHEN event_id % 5 = 0
                   THEN '?x=' || CAST(event_id % 3 AS VARCHAR) ELSE '' END AS url,
         CAST(event_id // 4 AS BIGINT) AS ts,
         md5('d' || CAST(event_id % 97 AS VARCHAR)) AS digest,
         CAST(100 + event_id % 900 AS BIGINT) AS length,
         event_id % 4 AS file_id
  FROM events
), base AS (
  SELECT *,
         array_to_string(list_reverse(string_split(
             regexp_extract(url, '^https?://([^/?#]+)', 1), '.')), ',')
           || ')'
           || CASE WHEN regexp_extract(url, '^https?://[^/?#]+(.*)$', 1) = ''
                   THEN '/'
                   ELSE regexp_extract(url, '^https?://[^/?#]+(.*)$', 1) END
           AS urlkey
  FROM rec
)
SELECT urlkey, file_id, ts, digest,
       CAST(coalesce(sum(length) OVER (
              PARTITION BY file_id ORDER BY ts, url, digest
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS "offset",
       length
FROM base
"""
    oracles["host_triangles"] = (
        """
WITH raw AS (
  SELECT event_id % 30 AS x,
         (event_id % 30 + 1 + (event_id // 30) % 2) % 30 AS y
  FROM events
), """
        + _TRI_CTE_CHAIN
        + "\nSELECT id, n_triangles FROM tri\n"
    )
    oracles["clustering_coeff"] = (
        """
WITH raw AS (
  SELECT event_id % 30 AS x,
         (event_id % 30 + 1 + (event_id // 30) % 2) % 30 AS y
  FROM events
  UNION ALL
  SELECT 100 AS x, event_id % 10 AS y FROM events WHERE event_id % 7 = 0
), """
        + _TRI_CTE_CHAIN
        + """
SELECT deg.id, deg.deg, coalesce(tri.n_triangles, 0) AS n_triangles,
       CAST(CASE WHEN deg.deg >= 2
                 THEN 2000 * coalesce(tri.n_triangles, 0) // (deg.deg * (deg.deg - 1))
                 ELSE 0 END AS BIGINT) AS coeff_permille
FROM deg LEFT JOIN tri ON tri.id = deg.id
"""
    )
    oracles["robots_refetch_plan"] = """
WITH meta AS (
  SELECT 'h' || CAST(user_id % 10 AS VARCHAR) AS host,
         CAST(max(1000000 - (user_id % 10) * 20000) AS BIGINT) AS fetched_at
  FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT 'h' || CAST(event_id % 12 AS VARCHAR) AS host
  FROM events WHERE event_id % 12 <= 10
), j AS (
  SELECT coalesce(meta.host, active.host) AS host, meta.fetched_at,
         active.host IS NOT NULL AS _active
  FROM meta FULL OUTER JOIN active ON active.host = meta.host
)
SELECT host,
       CASE WHEN fetched_at IS NOT NULL
            THEN CAST(1000000 - fetched_at AS BIGINT) END AS age_s,
       coalesce(1000000 - fetched_at > 86400, FALSE) AS stale,
       _active AND (coalesce(1000000 - fetched_at > 86400, FALSE)
                    OR fetched_at IS NULL) AS refetch
FROM j
"""
    # recrawl_budget: the freshness-plan twin nested verbatim, due-fast
    # counts per host, then the same Hamilton apportionment SQL
    oracles["recrawl_budget"] = f"""
WITH plan AS ({oracles["recrawl_schedule"]}),
cnt AS (
  SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         CAST(count(*) AS BIGINT) AS w
  FROM plan WHERE next_interval_s <= 86400 GROUP BY 1
), sh AS (
  SELECT host, w AS weight,
         CAST(500 * w // sum(w) OVER () AS BIGINT) AS fl,
         CAST(500 * w % sum(w) OVER () AS BIGINT) AS rem
  FROM cnt
), r AS (
  SELECT *, 500 - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
  FROM sh
)
SELECT host, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""
    # quality_mixture: the doc_surprisal twin nested verbatim as the
    # tiering stage; mixture arithmetic mirrors the mixture_plan twin
    oracles["quality_mixture"] = """
WITH s AS ({sp}),
tiers AS (
  SELECT CASE WHEN s.surprisal_q < 30000 THEN 'low'
              WHEN s.surprisal_q <= 31000 THEN 'mid'
              ELSE 'high' END AS source,
         d.text
  FROM documents d JOIN s ON s.doc_id = d.doc_id
),
t(source, target_permille) AS (
  VALUES ('mid', CAST(700 AS BIGINT)), ('low', 200), ('high', 100)
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM tiers GROUP BY source
)
SELECT p.source, p.n_docs, p.n_tokens,
       CAST(coalesce(t.target_permille, 0) AS BIGINT) AS target_permille,
       CAST(1000000 * coalesce(t.target_permille, 0) // 1000 AS BIGINT)
         AS target_tokens,
       CAST(1000000 * coalesce(t.target_permille, 0) // 1000 * 1000 // p.n_tokens
            AS BIGINT) AS repeat_permille
FROM per_src p LEFT JOIN t ON t.source = p.source
""".format(
        sp=oracles["doc_surprisal"]
    )
    # split_leakage: capped-LSH pairs and hash_split twins nested
    # verbatim; leakage = pair members in different split buckets
    oracles["split_leakage"] = """
WITH p AS ({m}), s AS ({spl})
SELECT sa.split AS split_a, sb.split AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       sa.split <> sb.split AS leaky
FROM p
JOIN s sa ON sa.doc_id = p.doc_a
JOIN s sb ON sb.doc_id = p.doc_b
GROUP BY sa.split, sb.split
""".format(
        m=oracles["minhash_lsh_capped"], spl=oracles["sample_split"]
    )
    # image_curation_pipeline: the three image-stage twins nested
    # verbatim (curation_pipeline no-drift trick)
    oracles["image_curation_pipeline"] = """
WITH q AS ({g}), k AS ({kp}), b AS ({bl}),
cand AS (SELECT image_id FROM q WHERE image_id < 150),
j AS (
  SELECT cand.image_id, q.admitted AS q_pass, q.reject_reason AS q_reason,
         k.keep, b.boilerplate
  FROM cand
  JOIN q ON q.image_id = cand.image_id
  LEFT JOIN k ON k.doc_id = cand.image_id
  LEFT JOIN b ON b.image_id = cand.image_id
), staged AS (
  SELECT image_id,
         CASE WHEN NOT q_pass THEN 'quality:' || q_reason
              WHEN NOT COALESCE(keep, TRUE) THEN 'duplicate'
              WHEN COALESCE(boilerplate, FALSE) THEN 'boilerplate_caption'
              ELSE NULL END AS reject_stage
  FROM j
)
SELECT image_id, reject_stage IS NULL AS admitted, reject_stage FROM staged
""".format(
        g=oracles["image_quality_gate"],
        kp=oracles["image_cluster_keepers"],
        bl=oracles["caption_boilerplate"],
    )
    # crawl_policy_table: the report and health twins nested verbatim
    # (curation_pipeline no-drift trick) joined on host
    oracles["crawl_policy_table"] = f"""
WITH r AS ({oracles["host_crawl_report"]}), h AS ({oracles["host_health"]})
SELECT r.host, r.harvest_permille, r.is_trap, r.mirror_secondary, r.alloc,
       CAST(coalesce(h.backoff, 1) AS BIGINT) AS backoff,
       CAST(coalesce(h.crawl_delay_ms, 500) AS BIGINT) AS crawl_delay_ms,
       CAST(r.alloc // coalesce(h.backoff, 1) AS BIGINT) AS eff_alloc
FROM r LEFT JOIN h ON h.host = r.host
"""
    # drain_eta_report: report (queue length) ⋈ policy (effective
    # allocation) nested verbatim; ceil-division rounds-to-drain
    oracles["drain_eta_report"] = f"""
WITH r AS ({oracles["host_crawl_report"]}), p AS ({oracles["crawl_policy_table"]})
SELECT r.host, r.n_urls, p.eff_alloc,
       CASE WHEN p.eff_alloc > 0
            THEN CAST((r.n_urls + p.eff_alloc - 1) // p.eff_alloc AS BIGINT)
       END AS rounds_to_drain,
       (p.eff_alloc = 0
        OR (r.n_urls + p.eff_alloc - 1) // p.eff_alloc > 10) AS starved
FROM r JOIN p ON p.host = r.host
"""
    # line_dedup: identical lined-corpus synth + normalization + doc-DF
    # rule as the Spark query (textops.line_dedup, max_doc_df=2)
    oracles["line_dedup"] = r"""
WITH t AS (
  SELECT doc_id,
         'home about contact' || chr(10) ||
         substr(text, 1, 60) || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN 'subscribe to the newsletter'
              ELSE substr(text, 61, 60) END || chr(10) ||
         CASE WHEN doc_id % 2 = 0 THEN '  Copyright 2026  '
              ELSE 'copyright 2026' END AS text
  FROM documents
), l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM t
), nb AS (
  SELECT doc_id, line, pos,
         lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) AS norm
  FROM l WHERE lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) <> ''
), ldf AS (
  SELECT norm, count(DISTINCT doc_id) AS doc_df FROM nb GROUP BY norm
), k AS (
  SELECT nb.doc_id, nb.line, nb.pos
  FROM nb JOIN ldf USING (norm) WHERE ldf.doc_df <= 2
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_lines,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM k GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM nb GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(tot.n_lines, 0) AS n_lines,
       coalesce(agg.kept_lines, 0) AS kept_lines,
       coalesce(agg.clean_text, '') AS clean_text
FROM t LEFT JOIN tot USING (doc_id) LEFT JOIN agg USING (doc_id)
"""
    oracles["sketch_hll_registers"] = __import__(
        "netrunner_spark.operators.sketches", fromlist=["hll_sql"]
    ).hll_sql("events", "user_id", p=6)
    oracles["crawl_shard_assign"] = __import__(
        "netrunner_spark.operators.crawlintel", fromlist=["rendezvous_sql"]
    ).rendezvous_sql(
        "(SELECT DISTINCT 'h' || CAST(event_id % 200 AS VARCHAR)"
        " || '.example.com' AS host FROM events)",
        n_workers=8,
    )
    _etld1 = __import__(
        "netrunner_spark.urlnorm", fromlist=["registrable_domain_sql_expr"]
    ).registrable_domain_sql_expr("host")
    oracles["domain_rollup"] = f"""
WITH u AS (
  SELECT CASE event_id % 6
   WHEN 0 THEN 'a' || CAST(event_id % 3 AS VARCHAR) || '.shop.co.uk'
   WHEN 1 THEN 'u' || CAST(event_id % 5 AS VARCHAR) || '.github.io'
   WHEN 2 THEN 'www.example' || CAST(event_id % 3 AS VARCHAR) || '.com'
   WHEN 3 THEN 'api.example' || CAST(event_id % 3 AS VARCHAR) || '.com'
   WHEN 4 THEN 'b' || CAST(event_id % 2 AS VARCHAR) || '.data.s3.amazonaws.com'
   ELSE 'localhost' END AS host
  FROM events
)
SELECT {_etld1} AS etld1,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(count(*) AS BIGINT) AS n_urls
FROM u GROUP BY 1
"""
    # event_funnel: per-stage min-ts anchor CTEs chained by strictly-
    # later joins (first-touch semantics, same as temporal.funnel)
    oracles["event_funnel"] = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s1 AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage,
         CAST(count(*) AS BIGINT) AS n_users FROM s0
  UNION ALL SELECT CAST(1 AS INT), 'click', CAST(count(*) AS BIGINT) FROM s1
  UNION ALL SELECT CAST(2 AS INT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
) WHERE n_users > 0
"""
    oracles["bpe_train"] = __import__(
        "netrunner_spark.operators.textops", fromlist=["bpe_sql"]
    ).bpe_sql(
        "SELECT word FROM (SELECT unnest(string_split(regexp_replace("
        "lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word FROM documents)"
        " WHERE word <> ''",
        n_merges=4,
    )
    oracles["web_bowtie"] = _bowtie_sql(12)
    # shard_drain_plan: the crawl_budget_alloc twin nested verbatim
    # into the rendezvous twin's table slot, then the per-worker rollup
    _rdvz = __import__(
        "netrunner_spark.operators.crawlintel", fromlist=["rendezvous_sql"]
    ).rendezvous_sql(f"({oracles['crawl_budget_alloc']})", n_workers=4)
    oracles["shard_drain_plan"] = f"""
SELECT worker, CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(alloc) AS BIGINT) AS alloc_total
FROM ({_rdvz})
GROUP BY worker
"""
    oracles["user_retention"] = """
WITH fd AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort_day,
       CAST(datediff('day', cohort_day, day) AS INT) AS offset_day,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM a JOIN fd ON fd.user_id = a.user_id
WHERE day >= cohort_day
GROUP BY 1, 2
"""
    oracles["event_transitions"] = """
WITH lagged AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS src_type,
         event_type AS dst_type
  FROM events
)
SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS cnt
FROM lagged WHERE src_type IS NOT NULL
GROUP BY src_type, dst_type
"""
    # robots_block_report: independent longest-match reimplementation
    # (regex from pattern, spec DESC / allow-wins window) over the same
    # synthetic frontier + rule set
    oracles["robots_block_report"] = """
WITH f AS (
  SELECT 'h' || CAST(event_id % 4 AS VARCHAR) || '.test' AS host,
         CASE event_id % 5
           WHEN 0 THEN '/p/' || CAST(event_id % 7 AS VARCHAR)
           WHEN 1 THEN '/admin/' || CAST(event_id % 7 AS VARCHAR)
           WHEN 2 THEN '/admin/public/' || CAST(event_id % 7 AS VARCHAR)
           WHEN 3 THEN '/tmp/' || CAST(event_id % 7 AS VARCHAR)
           ELSE '/' END AS path
  FROM events
), fd AS (
  SELECT host, path, CAST(count(*) AS BIGINT) AS cnt
  FROM f GROUP BY host, path
), r AS (
  SELECT * FROM (VALUES
    ('h0.test', 'disallow', '/admin'),
    ('h0.test', 'allow', '/admin/public'),
    ('h1.test', 'disallow', '/tmp'),
    ('h1.test', 'disallow', '/p/1*'),
    ('h2.test', 'allow', ''),
    ('h2.test', 'disallow', '/')
  ) AS t(host, directive, path_pattern)
), m AS (
  SELECT fd.host, fd.path,
         length(r.path_pattern) AS spec,
         CASE WHEN r.directive = 'allow' THEN 1 ELSE 0 END AS is_allow
  FROM fd JOIN r ON r.host = fd.host
  WHERE r.path_pattern = ''
     OR regexp_matches(fd.path, '^' || replace(r.path_pattern, '*', '.*'))
), best AS (
  SELECT host, path, is_allow,
         row_number() OVER (
           PARTITION BY host, path ORDER BY spec DESC, is_allow DESC
         ) AS rn
  FROM m
), verdict AS (
  SELECT fd.host, fd.cnt, coalesce(b.is_allow, 1) AS ok
  FROM fd LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
    ON b.host = fd.host AND b.path = fd.path
)
SELECT host, CAST(sum(cnt) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN ok = 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_allowed,
       CAST((sum(cnt) - sum(CASE WHEN ok = 1 THEN cnt ELSE 0 END)) * 1000
            // sum(cnt) AS BIGINT) AS blocked_permille
FROM verdict GROUP BY host
"""
    # sketch_hll_merged: the oracle is the WHOLE-TABLE sketch — the
    # Spark side computes per-day shards and merges, so mergeability
    # is itself oracle-checked
    oracles["sketch_hll_merged"] = oracles["sketch_hll_registers"]
    oracles["drain_schedule_table"] = """
WITH f AS (
  SELECT 'h' || CAST(event_id % 5 AS VARCHAR) AS host,
         CAST('0x' || substr(md5('u' || CAST(event_id AS VARCHAR)), 1, 13) AS BIGINT) AS url_hash,
         CAST(event_id % 3 AS BIGINT) AS priority
  FROM events
), b AS (SELECT * FROM (VALUES ('h0', 3), ('h1', 5)) AS t(host, budget)),
j AS (
  SELECT f.*, coalesce(b.budget, 7) AS budget
  FROM f LEFT JOIN b ON b.host = f.host
), rk AS (
  SELECT *, row_number() OVER (
           PARTITION BY host ORDER BY priority, url_hash
         ) AS rn
  FROM j
)
SELECT host, url_hash, CAST((rn - 1) // budget AS INT) AS sched_round FROM rk
"""
    oracles["drain_schedule_salted"] = """
WITH f AS (
  SELECT 'h' || CAST(event_id % 5 AS VARCHAR) AS host,
         CAST('0x' || substr(md5('u' || CAST(event_id AS VARCHAR)), 1, 13) AS BIGINT) AS url_hash,
         CAST(event_id % 3 AS BIGINT) AS priority
  FROM events
), b AS (SELECT * FROM (VALUES ('h0', 9), ('h1', 5)) AS t(host, budget)),
j AS (
  SELECT f.*, coalesce(b.budget, 8) AS budget,
         least(4, coalesce(b.budget, 8)) AS s_eff
  FROM f LEFT JOIN b ON b.host = f.host
), rk AS (
  SELECT *, row_number() OVER (
           PARTITION BY host, url_hash % s_eff
           ORDER BY priority, url_hash
         ) AS rn
  FROM j
)
SELECT host, url_hash,
       CAST((rn - 1) // (budget // s_eff) AS INT) AS sched_round
FROM rk
"""
    oracles["q5_local_supplier_volume"] = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_scaled,
       CAST(count(*) AS BIGINT) AS n_items
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
"""
    oracles["etld1_budget"] = f"""
WITH rolled AS ({oracles["domain_rollup"]}),
w AS (SELECT etld1, n_urls AS w FROM rolled),
sh AS (
  SELECT etld1, w AS weight,
         CAST(4999 * w // sum(w) OVER () AS BIGINT) AS fl,
         CAST(4999 * w % sum(w) OVER () AS BIGINT) AS rem
  FROM w
), r AS (
  SELECT *, 4999 - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, etld1 ASC) AS rn
  FROM sh
)
SELECT etld1, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""
    oracles["session_duration_hist"] = f"""
WITH s AS ({oracles["user_sessions"]})
SELECT (last_us - first_us) // 60000000 AS duration_min,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM s GROUP BY 1
"""
    oracles["source_quality_matrix"] = f"""
WITH g AS ({oracles["text_quality_gate"]})
SELECT d.source, g.reject_reason, CAST(count(*) AS BIGINT) AS n_docs
FROM g JOIN documents d ON d.doc_id = g.doc_id
GROUP BY d.source, g.reject_reason
"""
    oracles["redirect_hops_hist"] = f"""
WITH r AS ({oracles["redirect_resolve"]})
SELECT hops, status, CAST(count(*) AS BIGINT) AS n_chains
FROM r GROUP BY hops, status
"""
    _pbl = __import__(
        "netrunner_spark.operators.sketches", fromlist=["_bitlen_case"]
    )._bitlen_case("deg", 48)
    oracles["postings_df_hist"] = f"""
WITH toks AS (
  SELECT doc_id, word AS token FROM (
    SELECT doc_id, unnest(string_split(regexp_replace(
      lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word FROM documents
  ) WHERE word <> ''
), dfs AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS deg
  FROM toks GROUP BY token
)
SELECT CAST({_pbl} AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_tokens
FROM dfs GROUP BY 1
"""
    oracles["embedding_norm_audit"] = """
WITH q AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(embedding,
               x -> CAST(round(x * 1000) AS BIGINT) * CAST(round(x * 1000) AS BIGINT))),
           (a, b) -> a + b) AS nsq
  FROM embeddings
)
SELECT nsq // 100000 AS norm_bin, CAST(count(*) AS BIGINT) AS n_vecs
FROM q GROUP BY 1
"""
    oracles["kmeans_cell_balance"] = f"""
WITH a AS ({oracles["kmeans_clusters"]}),
sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs FROM a GROUP BY cid),
tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS tot FROM sizes)
SELECT cid, n_vecs, CAST(n_vecs * 1000 // tot AS BIGINT) AS share_permille
FROM sizes, tot
"""
    oracles["dup_cluster_size_hist"] = f"""
WITH cl AS ({oracles["dedup_clusters"]}),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM cl GROUP BY cluster_id
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size
"""
    oracles["text_dedup_savings"] = f"""
WITH k AS ({oracles["cluster_keepers"]})
SELECT d.source, CAST(count(*) AS BIGINT) AS n_dropped,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_dropped
FROM k JOIN documents d ON d.doc_id = k.doc_id
WHERE NOT k.keep GROUP BY d.source
"""
    oracles["host_latency_quantiles"] = __import__(
        "netrunner_spark.operators.sketches",
        fromlist=["grouped_hist_quantiles_sql"],
    ).grouped_hist_quantiles_sql(
        "(SELECT 'h' || CAST(event_id % 6 AS VARCHAR) || '.test' AS host,"
        " 20 + event_id % 500"
        " + CASE WHEN event_id % 6 = 5 THEN 2000 ELSE 0 END AS latency_ms"
        " FROM events)",
        "host",
        "latency_ms",
        bin_width=50,
    )
    # mime_mismatch_report: the twin works on hex text end-to-end (the
    # engine's binary column never crosses the oracle boundary)
    oracles["mime_mismatch_report"] = """
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
              ELSE 'gif' END AS claimed_fmt,
         CASE doc_id % 7
           WHEN 0 THEN '89504E47' WHEN 1 THEN 'FFD8FFE0'
           WHEN 2 THEN '47494638' WHEN 3 THEN '25504446'
           WHEN 4 THEN '1F8B0800' WHEN 5 THEN '3C21444F'
           ELSE '00112233' END || upper(md5(CAST(doc_id AS VARCHAR))) AS hx
  FROM documents
), sniffed AS (
  SELECT claimed_fmt,
         CASE WHEN starts_with(hx, '89504E47') THEN 'image/png'
              WHEN starts_with(hx, 'FFD8FF') THEN 'image/jpeg'
              WHEN starts_with(hx, '47494638') THEN 'image/gif'
              WHEN starts_with(hx, '25504446') THEN 'application/pdf'
              WHEN starts_with(hx, '1F8B') THEN 'application/gzip'
              WHEN starts_with(hx, '3C21444F') THEN 'text/html'
              WHEN starts_with(hx, '3C68746D') THEN 'text/html'
              ELSE 'application/octet-stream' END AS mime
  FROM p
)
SELECT claimed_fmt, mime, CAST(count(*) AS BIGINT) AS n
FROM sniffed GROUP BY 1, 2
"""
    oracles["hamming_distance_hist"] = f"""
WITH p AS ({oracles["hamming_near_dups"]})
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
FROM p GROUP BY hamming
"""
    oracles["bpe_tokenize"] = __import__(
        "netrunner_spark.operators.textops", fromlist=["bpe_tokens_sql"]
    ).bpe_tokens_sql(
        "SELECT doc_id, word FROM (SELECT doc_id, unnest(string_split("
        "regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word"
        " FROM documents) WHERE word <> ''",
        n_merges=3,
    )
    # tokenizer_fertility / token_budget_by_source: bpe_tokenize twin
    # nested verbatim; Hamilton CTEs mirror budget_alloc exactly
    oracles["tokenizer_fertility"] = f"""
WITH bt AS ({oracles["bpe_tokenize"]}),
wc AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_words
  FROM (SELECT doc_id, source, unnest(string_split(regexp_replace(
          lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY doc_id, source
)
SELECT source, CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(n_tokens) * 1000 // sum(n_words) AS BIGINT) AS fertility_permille
FROM wc JOIN bt USING (doc_id) GROUP BY source
"""
    oracles["token_budget_by_source"] = f"""
WITH bt AS ({oracles["bpe_tokenize"]}),
w AS (
  SELECT d.source, CAST(sum(bt.n_tokens) AS BIGINT) AS w
  FROM bt JOIN documents d ON d.doc_id = bt.doc_id GROUP BY d.source
), sh AS (
  SELECT source, w AS weight,
         CAST(1000000 * w // sum(w) OVER () AS BIGINT) AS fl,
         CAST(1000000 * w % sum(w) OVER () AS BIGINT) AS rem
  FROM w
), r AS (
  SELECT *, 1000000 - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rn
  FROM sh
)
SELECT source, weight,
       CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r
"""
    _hsql = __import__(
        "netrunner_spark.operators.layout", fromlist=["hilbert_sql"]
    ).hilbert_sql("x", "y", bits=10, src="k")
    oracles["hilbert_curve"] = f"""
WITH k AS (
  SELECT event_id, user_id % 1024 AS x,
         CAST(length(props) % 1024 AS BIGINT) AS y
  FROM events
){_hsql}
SELECT event_id, x, y, hval FROM h0
"""
    oracles["url_depth_profile"] = r"""
WITH u AS (
  SELECT 'h' || CAST(event_id % 4 AS VARCHAR) || '.test' AS host,
         '/a' || CASE WHEN event_id % 3 = 0 THEN '/b' ELSE '' END
              || CASE WHEN event_id % 9 = 0 THEN '/c/d' ELSE '' END
              || '/p' || CAST(event_id % 10 AS VARCHAR)
              || CASE WHEN event_id % 5 = 0
                      THEN '?page=' || CAST(event_id % 7 AS VARCHAR)
                      ELSE '' END AS path
  FROM events
)
SELECT host,
       CAST(len(string_split(regexp_replace(path, '\?.*$', ''), '/')) - 1 AS INT) AS depth,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN contains(path, '?') THEN 1 ELSE 0 END) AS BIGINT) AS n_with_query
FROM u GROUP BY 1, 2
"""
    oracles["image_bpp_outliers"] = (
        _IMG_CTE
        + """
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       max(n_bytes * 1000 // (CAST(w AS BIGINT) * h)) AS max_bpp,
       CAST(sum(CASE WHEN n_bytes * 1000 // (CAST(w AS BIGINT) * h) > 400
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM img GROUP BY fmt
"""
    )
    oracles["sitemap_coverage"] = """
WITH c AS (
  SELECT DISTINCT 'h' || CAST(event_id % 4 AS VARCHAR) || '.test' AS host,
         '/p/' || CAST(event_id % 10 AS VARCHAR) AS url
  FROM events
), s AS (
  SELECT DISTINCT 'h' || CAST(event_id % 4 AS VARCHAR) || '.test' AS host,
         '/p/' || CAST(event_id % 8 + 3 AS VARCHAR) AS url
  FROM events
), j AS (
  SELECT coalesce(c.host, s.host) AS host,
         CASE WHEN c.url IS NOT NULL AND s.url IS NOT NULL THEN 'b'
              WHEN s.url IS NULL THEN 'c' ELSE 's' END AS k
  FROM c FULL OUTER JOIN s ON s.host = c.host AND s.url = c.url
)
SELECT host,
       CAST(sum(CASE WHEN k = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN k = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_cache_only,
       CAST(sum(CASE WHEN k = 's' THEN 1 ELSE 0 END) AS BIGINT) AS n_sitemap_only,
       CASE WHEN sum(CASE WHEN k IN ('b', 's') THEN 1 ELSE 0 END) > 0
            THEN CAST(sum(CASE WHEN k = 'b' THEN 1 ELSE 0 END) * 1000
                 // sum(CASE WHEN k IN ('b', 's') THEN 1 ELSE 0 END) AS BIGINT)
       END AS coverage_permille
FROM j GROUP BY host
"""
    _pw = ", ".join(f"({i}, {1 << i})" for i in range(16))
    oracles["signature_bit_balance"] = f"""
WITH sg AS ({oracles["simhash"]}),
ks AS (SELECT * FROM (VALUES {_pw}) AS t(bit, p))
SELECT bit,
       CAST(sum((simhash >> bit) & 1) * 1000 // count(*) AS BIGINT) AS ones_permille,
       abs(sum((simhash >> bit) & 1) * 1000 // count(*) - 500) > 300 AS skewed
FROM sg, ks GROUP BY bit
"""
    # caption_lang_mix: lang_id twin nested verbatim over the captions
    # (captions ARE the document texts), joined to the image view
    oracles["caption_lang_mix"] = (
        _IMG_CTE
        + f""", lp AS ({oracles["lang_id"]})
SELECT lp.pred_lang, img.fmt, CAST(count(*) AS BIGINT) AS n_images
FROM lp JOIN img ON img.image_id = lp.doc_id
GROUP BY 1, 2
"""
    )
    oracles["image_res_tiers"] = (
        _IMG_CTE
        + """
SELECT fmt,
       CASE WHEN least(w, h) < 256 THEN 'drop'
            WHEN least(w, h) < 512 THEN 't256'
            WHEN least(w, h) < 1024 THEN 't512'
            ELSE 't1024' END AS tier,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM img GROUP BY 1, 2
"""
    )
    _dbl = __import__(
        "netrunner_spark.operators.sketches", fromlist=["_bitlen_case"]
    )._bitlen_case("deg", 48)
    oracles["degree_profile"] = f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT event_id % 30 AS src,
           (event_id % 30 + 1 + (event_id // 30) % 2) % 30 AS dst
    FROM events
    UNION ALL
    SELECT 100 AS src, event_id % 10 AS dst FROM events WHERE event_id % 7 = 0
  )
), degs AS (
  SELECT 'out' AS side, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
  UNION ALL
  SELECT 'in' AS side, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY dst
)
SELECT side, CAST({_dbl} AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_nodes
FROM degs GROUP BY side, bin
"""
    oracles["event_spikes"] = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT cur.day, cur.event_type, cur.cnt,
       CAST(coalesce(sum(past.cnt), 0) AS BIGINT) AS trail_sum,
       CAST(count(past.cnt) AS BIGINT) AS trail_days,
       (count(past.cnt) >= 3
        AND cur.cnt * count(past.cnt) * 10 > 15 * coalesce(sum(past.cnt), 0))
         AS spike
FROM d cur LEFT JOIN d past
  ON past.event_type = cur.event_type
 AND past.day < cur.day AND past.day >= cur.day - 7
GROUP BY cur.day, cur.event_type, cur.cnt
"""
    oracles["host_alias_fold"] = """
WITH pg AS (
  SELECT CASE event_id % 2 WHEN 0 THEN 'site' || CAST(event_id % 6 AS VARCHAR) || '.test'
          ELSE 'www.site' || CAST(event_id % 6 AS VARCHAR) || '.test' END AS host,
         CASE
           WHEN event_id % 6 IN (0, 1, 2, 5)
             THEN md5('c' || CAST(event_id % 6 AS VARCHAR) || '/' || CAST(event_id % 10 AS VARCHAR))
           WHEN event_id % 6 = 3
             THEN md5('c3' || CAST(event_id % 2 AS VARCHAR) || '/' || CAST(event_id % 10 AS VARCHAR))
           ELSE md5('c4' || CASE WHEN event_id % 10 < 5
                                 THEN 's' || CAST(event_id % 10 AS VARCHAR)
                                 ELSE 'd' || CAST(event_id % 2 AS VARCHAR) || CAST(event_id % 10 AS VARCHAR) END)
         END AS content_hash
  FROM events
), www AS (
  SELECT DISTINCT host AS alias, substr(host, 5) AS canonical, content_hash
  FROM pg WHERE host LIKE 'www.%'
), bare AS (
  SELECT DISTINCT host AS canonical, content_hash FROM pg WHERE host NOT LIKE 'www.%'
), tot AS (
  SELECT alias, canonical, CAST(count(*) AS BIGINT) AS total FROM www GROUP BY 1, 2
), sh AS (
  SELECT w.alias, w.canonical, CAST(count(*) AS BIGINT) AS shared
  FROM www w JOIN bare b ON b.canonical = w.canonical AND b.content_hash = w.content_hash
  GROUP BY 1, 2
), rules AS (
  SELECT t.alias, t.canonical
  FROM tot t LEFT JOIN sh ON sh.alias = t.alias AND sh.canonical = t.canonical
  WHERE coalesce(sh.shared, 0) * 1000 // t.total >= 800
), folded AS (
  SELECT coalesce(r.canonical, pg.host) AS host
  FROM pg LEFT JOIN rules r ON r.alias = pg.host
)
SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM folded GROUP BY host
"""
    oracles["sketch_bloom_probe"] = __import__(
        "netrunner_spark.operators.sketches", fromlist=["bloom_sql"]
    ).bloom_sql(
        "(SELECT DISTINCT 'u' || CAST(event_id % 500 AS VARCHAR) AS key FROM events)",
        "key",
        "SELECT DISTINCT 'u' || CAST(event_id % 800 AS VARCHAR) AS key FROM events",
        m=2048,
        k=3,
    )
    _blc = __import__(
        "netrunner_spark.operators.sketches", fromlist=["_bitlen_case"]
    )._bitlen_case("rest", 46)
    oracles["rolling_active_sketch"] = f"""
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) AS h
  FROM events
), split AS (
  SELECT day, h % 64 AS bucket, h // 64 AS rest FROM h
), daily AS (
  SELECT day, bucket, CAST(max(47 - {_blc}) AS INT) AS rho
  FROM split GROUP BY day, bucket
)
SELECT w.day AS win_end, d.bucket, CAST(max(d.rho) AS INT) AS rho
FROM (SELECT DISTINCT day FROM daily) w
JOIN daily d ON d.day <= w.day AND d.day >= w.day - 6
GROUP BY w.day, d.bucket
"""
    oracles["cocitation_links"] = """
WITH e AS (
  SELECT DISTINCT
    CASE (event_id // 20) % 3 WHEN 2 THEN 19 ELSE event_id % 20 END AS src,
    CASE (event_id // 20) % 3
      WHEN 0 THEN 100 + event_id % 20 % 5
      WHEN 1 THEN 200 + event_id % 20 % 5
      ELSE 400 + event_id % 50 END AS dst
  FROM events
), kept AS (
  SELECT e.* FROM e JOIN (
    SELECT src FROM e GROUP BY src HAVING count(*) <= 20
  ) s ON s.src = e.src
)
SELECT a.dst AS dst_a, b.dst AS dst_b, CAST(count(*) AS BIGINT) AS n_common
FROM kept a JOIN kept b ON a.src = b.src AND a.dst < b.dst
GROUP BY a.dst, b.dst
HAVING count(*) >= 2
"""
    oracles["budget_fairness"] = f"""
WITH alloc AS ({oracles["crawl_budget_alloc"]}),
ranked AS (
  SELECT alloc, row_number() OVER (ORDER BY alloc, host) AS i FROM alloc
)
SELECT CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(alloc) AS BIGINT) AS total_alloc,
       CAST((2 * sum(i * alloc) - (count(*) + 1) * sum(alloc)) * 1000
            // (count(*) * sum(alloc)) AS BIGINT) AS gini_permille
FROM ranked
"""
    # trap family: the synth CTE and the per-URL signal CTE are shared
    # verbatim by BOTH oracles so the rollup twin cannot drift from the
    # signal twin (same pattern as _PATHPAGES_CTE / _TMPL_T_CTE)
    _trapurls_cte = """trapurls AS (
  SELECT DISTINCT 'https://h' || CAST(event_id % 5 AS VARCHAR) || '.test'
    || CASE WHEN event_id % 5 < 2 THEN
         CASE WHEN event_id % 7 = 0
              THEN '/l0/l1/l2/l3/l4/l5/l6/l7/l8/l9/l10/l11/l12/page'
              ELSE '/page/' || CAST(event_id % 20 AS VARCHAR) END
       ELSE CASE event_id % 4
         WHEN 0 THEN repeat('/a/b', CAST(2 + event_id % 3 AS INT))
                     || '/p' || CAST(event_id % 10 AS VARCHAR)
         WHEN 1 THEN '/cal/' || CAST(2024 + event_id % 15 AS VARCHAR)
                     || '/' || CAST(1 + event_id % 12 AS VARCHAR)
         WHEN 2 THEN '/s/' || substr(md5('t' || CAST(event_id % 50 AS VARCHAR)), 1, 16)
                     || '/view'
         ELSE '/page/' || CAST(event_id % 20 AS VARCHAR) END
       END AS url
  FROM events
)"""
    _trapsig_cte = """trapsig AS (
  SELECT host, url,
         CAST(len(segs) AS INT) AS depth,
         CAST(coalesce(list_aggregate(list_transform(segs,
             s -> len(list_filter(segs, x -> x = s))), 'max'), 0) AS INT)
           AS max_seg_repeat,
         len(list_filter(segs,
             x -> regexp_full_match(x, '20(3[1-9]|[4-9][0-9])'))) > 0 AS calendar,
         len(list_filter(segs,
             x -> regexp_full_match(x, '[0-9a-f]{16,}'))) > 0 AS opaque_id
  FROM (SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host, url,
               list_filter(string_split(
                 regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)?', 1), '/'),
                 x -> x <> '') AS segs
        FROM trapurls)
)"""
    oracles["trap_url_signals"] = f"""
WITH {_trapurls_cte}, {_trapsig_cte}
SELECT host, url, depth, max_seg_repeat, calendar, opaque_id,
       max_seg_repeat >= 3 AS seg_loop,
       (max_seg_repeat >= 3) OR calendar OR depth > 12 AS trapped
FROM trapsig
"""
    oracles["trap_hosts"] = f"""
WITH sig AS ({oracles["trap_url_signals"]})
SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN seg_loop THEN 1 ELSE 0 END) AS BIGINT) AS n_loop,
       CAST(sum(CASE WHEN calendar THEN 1 ELSE 0 END) AS BIGINT) AS n_calendar,
       CAST(sum(CASE WHEN opaque_id THEN 1 ELSE 0 END) AS BIGINT) AS n_opaque,
       CAST(sum(CASE WHEN trapped THEN 1 ELSE 0 END) AS BIGINT) AS n_trapped,
       max(depth) AS max_depth,
       CAST(sum(CASE WHEN trapped THEN 1 ELSE 0 END) AS BIGINT) * 1000
         // CAST(count(*) AS BIGINT) AS trap_permille,
       (CAST(sum(CASE WHEN trapped THEN 1 ELSE 0 END) AS BIGINT) * 1000
         // CAST(count(*) AS BIGINT)) >= 250 AS quarantine
FROM sig GROUP BY host
"""
    oracles["pagination_params"] = """
WITH pages AS (
  SELECT 'https://h' || CAST(event_id % 2 AS VARCHAR) || '.test'
    || CASE event_id % 4
       WHEN 0 THEN '/list?page=' || CAST((event_id // 4) % 40 AS VARCHAR)
       WHEN 1 THEN '/doc?sid=' || CAST(1000 + (event_id // 4) % 50 AS VARCHAR)
       WHEN 2 THEN '/shop?item=' || CAST(((event_id // 4) % 30) * 17 AS VARCHAR)
       ELSE '/about' END AS url,
    md5(CASE event_id % 4
        WHEN 0 THEN 'pg-' || CAST(event_id % 2 AS VARCHAR) || '-'
                    || CAST((event_id // 4) % 40 AS VARCHAR)
        WHEN 1 THEN 'sess-' || CAST(event_id % 2 AS VARCHAR)
        WHEN 2 THEN 'item-' || CAST(event_id % 2 AS VARCHAR) || '-'
                    || CAST((event_id // 4) % 30 AS VARCHAR)
        ELSE 'about-' || CAST(event_id % 2 AS VARCHAR) END) AS content_hash
  FROM events
), u AS (
  SELECT url, max(content_hash) AS chash FROM pages
  WHERE url LIKE '%?%' GROUP BY url
), pp AS (
  SELECT url, chash,
         regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         split_part(url, '?', 1) AS base,
         split_part(kv, '=', 1) AS param,
         split_part(kv, '=', 2) AS pval,
         kv
  FROM (SELECT url, chash, unnest(string_split(split_part(url, '?', 2), '&')) AS kv
        FROM u)
), gk AS (
  SELECT h.url, h.param,
         h.base || '?' || coalesce(string_agg(o.kv, '&' ORDER BY o.kv), '') AS group_key
  FROM (SELECT DISTINCT url, base, param FROM pp) h
  LEFT JOIN pp o ON o.url = h.url AND o.param <> h.param
  GROUP BY h.url, h.param, h.base
), g AS (
  SELECT p.host, p.param, gk.group_key,
         count(DISTINCT p.pval) AS n_vals,
         count(DISTINCT p.chash) AS n_hashes
  FROM pp p JOIN gk ON gk.url = p.url AND gk.param = p.param
  GROUP BY p.host, p.param, gk.group_key
), dust AS (
  SELECT host, param,
         CAST(sum(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_evidence,
         CAST(sum(CASE WHEN n_vals >= 2 AND n_hashes >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations
  FROM g GROUP BY host, param
), vstats AS (
  SELECT host, param,
         CAST(count(DISTINCT pval) AS BIGINT) AS n_vals,
         sum(CASE WHEN NOT regexp_full_match(pval, '[0-9]{1,15}') THEN 1 ELSE 0 END) = 0
           AS all_int,
         min(CASE WHEN regexp_full_match(pval, '[0-9]{1,15}')
                  THEN CAST(pval AS BIGINT) END) AS min_val,
         max(CASE WHEN regexp_full_match(pval, '[0-9]{1,15}')
                  THEN CAST(pval AS BIGINT) END) AS max_val
  FROM pp GROUP BY host, param
)
SELECT v.host, v.param, v.n_vals, v.all_int, v.min_val, v.max_val,
       d.n_evidence, d.n_violations,
       v.all_int AND v.n_vals >= 3 AND d.n_violations >= 1
         AND (v.max_val - v.min_val + 1 <= 2 * v.n_vals) AS is_pagination
FROM vstats v JOIN dust d ON d.host = v.host AND d.param = v.param
"""
    oracles["pagination_cap_apply"] = f"""
WITH rules AS ({oracles["pagination_params"]}),
pages2 AS (
  SELECT DISTINCT 'https://h' || CAST(event_id % 2 AS VARCHAR) || '.test'
    || CASE event_id % 4
       WHEN 0 THEN '/list?page=' || CAST((event_id // 4) % 40 AS VARCHAR)
       WHEN 1 THEN '/doc?sid=' || CAST(1000 + (event_id // 4) % 50 AS VARCHAR)
       WHEN 2 THEN '/shop?item=' || CAST(((event_id // 4) % 30) * 17 AS VARCHAR)
       ELSE '/about' END AS url
  FROM events
),
noq AS (
  SELECT url, TRUE AS admit, CAST(NULL AS VARCHAR) AS capped_param
  FROM pages2 WHERE NOT contains(url, '?')
),
kv AS (
  SELECT url, regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         split_part(kvp, '=', 1) AS param, split_part(kvp, '=', 2) AS pval
  FROM (SELECT url, unnest(string_split(split_part(url, '?', 2), '&')) AS kvp
        FROM pages2 WHERE contains(url, '?'))
),
j AS (
  SELECT kv.url,
         CASE WHEN r.is_pagination
                   AND regexp_full_match(kv.pval, '[0-9]{{1,15}}')
                   AND TRY_CAST(kv.pval AS BIGINT) >= 20
              THEN kv.param END AS cp
  FROM kv LEFT JOIN rules r ON r.host = kv.host AND r.param = kv.param
),
a AS (SELECT url, min(cp) AS capped_param FROM j GROUP BY url)
SELECT url, capped_param IS NULL AS admit, capped_param FROM a
UNION ALL SELECT * FROM noq
"""
    oracles["politeness_compliance"] = """
WITH log AS (
  SELECT 'h' || CAST(event_id % 5 AS VARCHAR) || '.test' AS host,
         'https://h' || CAST(event_id % 5 AS VARCHAR) || '.test/p/'
           || CAST(event_id // 5 AS VARCHAR) AS url,
         CAST(CASE WHEN event_id % 5 = 4 THEN (event_id // 5) * 1250
              ELSE (event_id // 5) * (500 * (event_id % 5 + 1))
                - (CASE WHEN event_id % 5 = 2 AND event_id // 5 >= 5
                   THEN 200 ELSE 0 END)
              END AS BIGINT) AS ts_ms
  FROM events
),
delays AS (
  SELECT 'h' || CAST(i AS VARCHAR) || '.test' AS host,
         CAST(500 * (i + 1) AS BIGINT) AS crawl_delay_ms
  FROM range(5) t(i)
),
gaps AS (
  SELECT host, ts_ms,
         ts_ms - lag(ts_ms) OVER (PARTITION BY host ORDER BY ts_ms, url) AS gap_ms
  FROM log
)
SELECT g.host,
       CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(count(gap_ms) AS BIGINT) AS n_gaps,
       min(gap_ms) AS min_gap_ms,
       d.crawl_delay_ms,
       CAST(sum(CASE WHEN gap_ms < d.crawl_delay_ms THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       sum(CASE WHEN gap_ms < d.crawl_delay_ms THEN 1 ELSE 0 END) = 0 AS compliant
FROM gaps g LEFT JOIN delays d ON d.host = g.host
GROUP BY g.host, d.crawl_delay_ms
"""
    # semdedup_prune: the generated Lloyd's body (identical to the
    # kmeans_clusters twin) extended with the SemDeDup tail — intra-cell
    # verified pairs, recursive-CTE components, farthest-from-centroid
    # keeper — so the dedup oracle can never drift from the quantizer
    # it clusters with.
    oracles["semdedup_prune"] = _kmeans_sql(
        k=4,
        iters=2,
        select=""", pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM afinal a JOIN afinal b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(generate_series(1, len(a.qe)),
                i -> a.qe[i] * b.qe[i]), (x, y) -> x + y) >= 300000
    ), uedges AS (
      SELECT va AS u, vb AS v FROM pairs
      UNION SELECT vb, va FROM pairs
    ), reach(u, v) AS (
      SELECT vec_id, vec_id FROM afinal
      UNION
      SELECT r.u, e.v FROM reach r JOIN uedges e ON r.v = e.u
    ), grp AS (
      SELECT u AS vec_id, min(v) AS group_id FROM reach GROUP BY u
    )
    SELECT a.vec_id, a.cid, a.d AS dist_q, g.group_id,
           row_number() OVER (
             PARTITION BY g.group_id ORDER BY a.d DESC, a.vec_id ASC) = 1
             AS is_keeper
    FROM afinal a JOIN grp g ON g.vec_id = a.vec_id""",
    ).replace("WITH q AS", "WITH RECURSIVE q AS", 1)

    oracles["priority_compose"] = """
WITH ids AS (SELECT range AS i FROM range(108)),
f AS (
  SELECT CASE WHEN i < 9 THEN 'h0.test' ELSE 'h1.test' END AS host,
         'https://' || CASE WHEN i < 9 THEN 'h0.test' ELSE 'h1.test' END
           || '/d/' || CAST(i AS VARCHAR) AS url,
         CAST(i % 4 AS INT) AS depth
  FROM ids)
SELECT host, url, depth,
       CAST(depth AS DOUBLE)
         + log10(CAST(count(*) OVER (PARTITION BY host) AS DOUBLE) + 1.0) / 10.0
         AS priority
FROM f
"""
    return oracles
