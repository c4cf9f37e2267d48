"""BM25 ranked retrieval: exact-integer scoring differential-tested
against an independent pure-Python implementation, plus the two-level
skew-safe top-k equivalence."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators import retrieval

DOCS = [
    (1, "spark join window merge sort spark spark"),
    (2, "window merge sort batch stream"),
    (3, "customer table scan filter key"),
    (4, "slow query filter the a of"),
    (5, "spark stream batch batch batch"),
    (6, "join join join window"),
    (7, "table scan scan scan customer"),
    (8, "merge sort merge sort merge sort"),
]
QUERIES = [(1, "spark join"), (2, "merge sort batch"), (3, "customer table scan")]


def _py_bm25(docs, queries, k=10):
    """Independent reference: same quantization, dict-and-loop impl."""
    tok = lambda s: [t for t in re.split("[^a-z]+", s.lower()) if t]
    tf = {d: Counter(tok(t)) for d, t in docs}
    tf = {d: c for d, c in tf.items() if c}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    nd, tt = len(dl), sum(dl.values())
    df = Counter(t for c in tf.values() for t in c)
    out = {}
    for qid, q in queries:
        scores = {}
        for term in set(tok(q)):
            if term not in df:
                continue
            idf_q = ((nd - df[term]) * 2000 + 1000) // (2 * df[term] + 1)
            for d, c in tf.items():
                if term in c:
                    f = c[term]
                    contrib = (idf_q * 44 * f * tt) // (
                        20 * f * tt + 6 * tt + 18 * dl[d] * nd
                    )
                    scores[d] = scores.get(d, 0) + contrib
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    return docs, queries


def test_bm25_matches_independent_reference(spark, frames):
    docs, queries = frames
    got = {
        (r.query_id, r.doc_id): (r.score_q, r.rk)
        for r in retrieval.bm25_topk(docs, queries, k=10).collect()
    }
    want = _py_bm25(DOCS, QUERIES)
    flat = {(q, d): (s, rk) for q, rows in want.items() for d, s, rk in rows}
    assert got == flat
    # sanity: the spark-heavy doc wins the spark query, exact-int scores
    assert got[(1, 1)][1] == 1 and got[(1, 1)][0] > 0


def test_two_level_rank_equals_plain(spark, frames):
    docs, queries = frames
    plain = sorted(
        map(tuple, retrieval.bm25_topk(docs, queries, k=3).collect())
    )
    bucketed = sorted(
        map(tuple, retrieval.bm25_topk(docs, queries, k=3, rank_buckets=4).collect())
    )
    assert plain == bucketed and len(plain) > 0


def test_postings_tf(spark, frames):
    docs, _ = frames
    p = {
        (r.token, r.doc_id): r.tf for r in retrieval.postings(docs).collect()
    }
    assert p[("spark", 1)] == 3 and p[("batch", 5)] == 3 and p[("join", 6)] == 3
    assert ("", 1) not in p


def test_snippets_window_and_edges(spark, frames):
    docs, queries = frames
    hits = retrieval.bm25_topk(docs, queries, k=3)
    snips = {
        (r.query_id, r.doc_id): r.snippet
        for r in retrieval.snippets(hits, docs, queries, window=2).collect()
    }
    # doc 8 = "merge sort merge sort merge sort"; query 2 first term hit
    # at pos 1 → window clamps to doc start, 5 tokens max
    assert snips[(2, 8)] == "merge sort merge sort merge"
    # every snippet contains at least one query term
    qterms = {qid: set(q.split()) for qid, q in QUERIES}
    for (qid, _), s in snips.items():
        assert qterms[qid] & set(s.split()), (qid, s)


def test_search_index_equals_direct_and_prunes_buckets(spark, frames, tmp_path):
    """Index-backed topk must equal the direct path exactly, and the
    postings scan must bucket-prune to the query terms' buckets."""
    from netrunner_spark.tables import LakeCatalog

    docs, queries = frames
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    idx = retrieval.SearchIndex(cat, "si")
    idx.build(docs, n_buckets=8)

    via_index = idx.topk(queries, k=5)
    direct = retrieval.bm25_topk(docs, queries, k=5)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )

    plan = via_index._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "postings scan is not bucket-pruned"
    assert int(m.group(1)) < int(m.group(2)), m.group(0)


def test_search_index_survives_new_session_reregister(spark, frames, tmp_path):
    """stats persists the tokenizer config; read_table re-registers the
    bucketed tables from metadata (resume path)."""
    from netrunner_spark.tables import LakeCatalog

    docs, queries = frames
    root = str(tmp_path / "lake2")
    idx = retrieval.SearchIndex(LakeCatalog(spark, root), "si2")
    idx.build(docs, n_buckets=4)
    # a fresh catalog object over the same root (same JVM session — the
    # sandbox allows one master) must re-register and answer identically
    idx2 = retrieval.SearchIndex(LakeCatalog(spark, root), "si2")
    got = idx2.topk(queries, k=3).collect()
    want = retrieval.bm25_topk(docs, queries, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_search_index_incremental_append_equals_rebuild(spark, frames, tmp_path):
    """build(half) + append(half) must score bit-identically to the
    direct path over the full corpus (df/dl/tt/nd additive across
    disjoint slices), and overlapping appends must be rejected."""
    from netrunner_spark.tables import LakeCatalog

    docs, queries = frames
    first = docs.filter("doc_id <= 4")
    second = docs.filter("doc_id > 4")
    idx = retrieval.SearchIndex(LakeCatalog(spark, str(tmp_path / "lk")), "si3")
    idx.build(first, n_buckets=4)
    idx.append(second)
    got = sorted(map(tuple, idx.topk(queries, k=5).collect()))
    want = sorted(map(tuple, retrieval.bm25_topk(docs, queries, k=5).collect()))
    assert got == want

    with pytest.raises(ValueError, match="disjoint"):
        idx.append(docs.filter("doc_id = 2"))


def test_query_weights_are_broadcast(spark, frames):
    """The corpus-sized postings must never shuffle on token: the
    query-term weight side joins in as a BroadcastHashJoin."""
    docs, queries = frames
    plan = (
        retrieval.bm25_topk(docs, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_topk_window_is_skew_bounded(spark, frames):
    """Scale shape of the top-k tail. Spark ≥3.5 plants a PARTIAL
    WindowGroupLimit before the window exchange (rank-limit pushdown):
    each map partition forwards ≤ k rows per query, so even the PLAIN
    path never shuffles a corpus-sized candidate set into one window
    partition — pin that pushdown. With rank_buckets=B the pre-prune
    window additionally partitions by (query_id, pmod(hash(doc), B))
    (pmod is projected into a _w* attr; pin the two-column partition
    spec) and must emit identical rows."""
    import re as _re

    docs, queries = frames
    plain = retrieval.bm25_topk(docs, queries, k=2)
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"WindowGroupLimit .*row_number\(\), 2, Partial", plan), plan
    bucketed = retrieval.bm25_topk(docs, queries, k=2, rank_buckets=8)
    bplan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert _re.search(
        r"WindowGroupLimit \[query_id#\d+L?, _w\d+#\d+L?\]", bplan
    ), bplan[:900]
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_phrase_match_adjacency_and_overlaps(spark, frames):
    docs, _ = frames
    phrases = spark.createDataFrame(
        [(1, "merge sort"), (2, "sort merge"), (3, "batch batch"), (4, "spark window")],
        "query_id long, phrase string",
    )
    got = {
        (r.query_id, r.doc_id): r.n_occ
        for r in retrieval.phrase_match(docs, phrases).collect()
    }
    # doc 8 = "merge sort merge sort merge sort"
    assert got[(1, 8)] == 3          # starts 0, 2, 4
    assert got[(2, 8)] == 2          # overlapping starts 1, 3
    assert got[(1, 1)] == 1 and got[(1, 2)] == 1
    # repeated-term phrase, overlapping occurrences: "batch batch batch"
    assert got[(3, 5)] == 2
    # adjacency required: doc 1 has spark...window but never adjacent
    assert (4, 1) not in got
    # in-order required: no doc has "window spark" → query 4 empty
    assert not any(q == 4 for q, _ in got)


def test_facet_counts_sum_to_hits(spark, frames):
    docs, queries = frames
    docs2 = docs.withColumn(
        "lang", (F.col("doc_id") % 2).cast("string")
    ).withColumn("source", F.lit("s"))
    hits = retrieval.bm25_topk(docs2, queries, k=3)
    fc = retrieval.facet_counts(hits, docs2, ["lang", "source"]).collect()
    n_hits = {r.query_id: 0 for r in fc}
    for r in hits.collect():
        n_hits[r.query_id] += 1
    for qid, n in n_hits.items():
        for facet in ("lang", "source"):
            assert (
                sum(r.cnt for r in fc if r.query_id == qid and r.facet == facet)
                == n
            )


def test_indexed_phrase_equals_direct(spark, frames, tmp_path):
    """Positional-postings phrase search must equal phrase_match
    without re-tokenizing the corpus, across an incremental append."""
    from netrunner_spark.tables import LakeCatalog

    docs, _ = frames
    phrases = spark.createDataFrame(
        [(1, "merge sort"), (2, "batch batch"), (3, "table scan")],
        "query_id long, phrase string",
    )
    idx = retrieval.SearchIndex(LakeCatalog(spark, str(tmp_path / "pl")), "sp")
    idx.build(docs.filter("doc_id <= 4"), n_buckets=4, positions=True)
    idx.append(docs.filter("doc_id > 4"))
    got = sorted(map(tuple, idx.phrase(phrases).collect()))
    want = sorted(map(tuple, retrieval.phrase_match(docs, phrases).collect()))
    assert got == want and len(got) > 0

    nopos = retrieval.SearchIndex(LakeCatalog(spark, str(tmp_path / "np")), "sq")
    nopos.build(docs, n_buckets=4)
    with pytest.raises(ValueError, match="positions"):
        nopos.phrase(phrases)
