"""SearchIndex tombstone deletes + recrawl updates: the gold invariant
is EXACT equivalence with a from-scratch rebuild — delete/update are
O(batch) writes, but every query (BM25 topk AND indexed phrase) must
return bit-identical results to an index rebuilt over the live corpus.
Also pins slice-scoped tombstones (a re-added doc survives its own
earlier tombstone) and the append-overlap check against live docs."""

from pyspark.sql import functions as F

from netrunner_spark.operators import retrieval
from netrunner_spark.tables import LakeCatalog


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "spark window"), (2, "merge batch")], "query_id long, query string"
    )


V1 = [
    (1, "spark window join spark"),
    (2, "merge batch sort"),
    (3, "spark table scan window"),
    (4, "merge merge batch data"),
    (5, "filler words only here"),
]


def _collect(df):
    return sorted(map(tuple, df.collect()))


def test_delete_matches_rebuild_for_topk_and_phrase(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lk"))
    idx = retrieval.SearchIndex(cat, "di")
    idx.build(_docs(spark, V1), n_buckets=8, positions=True)
    idx.delete(spark.createDataFrame([(1,), (4,)], "doc_id long"))

    live = [r for r in V1 if r[0] not in (1, 4)]
    cat2 = LakeCatalog(spark, str(tmp_path / "lk2"))
    fresh = retrieval.SearchIndex(cat2, "di2")
    fresh.build(_docs(spark, live), n_buckets=8, positions=True)

    q = _queries(spark)
    assert _collect(idx.topk(q, k=5)) == _collect(fresh.topk(q, k=5))
    ph = spark.createDataFrame([(1, "spark window")], "query_id long, phrase string")
    assert _collect(idx.phrase(ph)) == _collect(fresh.phrase(ph))
    # deleted docs are really gone
    hits = {r["doc_id"] for r in idx.topk(q, k=5).collect()}
    assert 1 not in hits and 4 not in hits


def test_update_recrawl_matches_rebuild(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lk"))
    idx = retrieval.SearchIndex(cat, "ui")
    idx.build(_docs(spark, V1), n_buckets=8, positions=True)
    # recrawl: doc 3 loses its spark terms, doc 5 gains them
    idx.update(
        _docs(spark, [(3, "quiet page now"), (5, "spark window spark")])
    )

    v2 = [
        (1, "spark window join spark"),
        (2, "merge batch sort"),
        (3, "quiet page now"),
        (4, "merge merge batch data"),
        (5, "spark window spark"),
    ]
    cat2 = LakeCatalog(spark, str(tmp_path / "lk2"))
    fresh = retrieval.SearchIndex(cat2, "ui2")
    fresh.build(_docs(spark, v2), n_buckets=8, positions=True)

    q = _queries(spark)
    assert _collect(idx.topk(q, k=5)) == _collect(fresh.topk(q, k=5))
    ph = spark.createDataFrame([(1, "spark window")], "query_id long, phrase string")
    assert _collect(idx.phrase(ph)) == _collect(fresh.phrase(ph))
    # the re-added doc outlives its own tombstone (slice-scoped)
    hits = {r["doc_id"] for r in idx.topk(q, k=5).collect()}
    assert 5 in hits and 3 not in hits


def test_double_delete_and_append_overlap_vs_live(spark, tmp_path):
    import pytest

    cat = LakeCatalog(spark, str(tmp_path / "lk"))
    idx = retrieval.SearchIndex(cat, "xi")
    idx.build(_docs(spark, V1), n_buckets=8)
    idx.update(_docs(spark, [(5, "spark anew")]))   # delete 5, re-add 5
    idx.delete(spark.createDataFrame([(5,)], "doc_id long"))  # kill again
    q = _queries(spark)
    hits = {r["doc_id"] for r in idx.topk(q, k=5).collect()}
    assert 5 not in hits
    # appending a LIVE doc id still raises
    with pytest.raises(ValueError):
        idx.append(_docs(spark, [(2, "dup")]))


def test_rebuild_clears_stale_tombstones(spark, tmp_path):
    """r5 review: build() after delete() left the old tombstones in
    place, silently excluding freshly indexed docs with recycled ids."""
    from netrunner_spark.operators.retrieval import SearchIndex
    from netrunner_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    idx = SearchIndex(cat, "rb")
    idx.build(docs, n_buckets=4)
    idx.delete(spark.createDataFrame([(1,)], "doc_id long"))
    q = spark.createDataFrame([(0, "alpha")], "query_id long, query string")
    assert {r["doc_id"] for r in idx.topk(q, k=5).collect()} == set()
    idx.build(docs, n_buckets=4)  # compact-and-rebuild
    hits = {r["doc_id"] for r in idx.topk(q, k=5).collect()}
    assert hits == {1}  # doc 1 is BACK — no stale tombstone
