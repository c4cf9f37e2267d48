"""kmeans_int (integer Lloyd's), boolean_and (conjunctive retrieval),
and doc_surprisal (unigram-LM quality signal): differential tests
against independent plain-Python references, plus semantic pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators import retrieval, textops, vectors


# ---------------------------------------------------------------- kmeans


def _ref_kmeans(vecs: np.ndarray, k: int, iters: int):
    """Independent Lloyd's in int64 numpy: same seeding (first k), same
    tie rules (min cid), same truncating integer mean."""
    q = np.array([[int(round(x * 1000)) for x in v] for v in vecs], dtype=np.int64)
    cents = {cid: q[cid].copy() for cid in range(k)}

    def assign(cents):
        out = {}
        for vid in range(len(q)):
            best = None
            for cid in sorted(cents):
                d = int(((q[vid] - cents[cid]) ** 2).sum())
                if best is None or d < best[1]:
                    best = (cid, d)
            out[vid] = best
        return out

    for _ in range(iters):
        a = assign(cents)
        groups = {}
        for vid, (cid, _d) in a.items():
            groups.setdefault(cid, []).append(q[vid])
        # truncating mean toward zero, matching Spark div / DuckDB //
        def tdiv(a, b):
            qd = abs(a) // b
            return qd if a >= 0 else -qd

        cents = {
            cid: np.array(
                [
                    tdiv(int(sum(int(v[i]) for v in vs)), len(vs))
                    for i in range(q.shape[1])
                ],
                dtype=np.int64,
            )
            for cid, vs in groups.items()
        }
    return assign(cents)


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    vecs = rng.uniform(-1, 1, size=(40, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cid"], r["dist_q"])
        for r in vectors.kmeans_int(df, k=3, iters=2).collect()
    }
    want = _ref_kmeans(vecs, k=3, iters=2)
    assert got == want


def test_kmeans_checkpoint_path_identical(spark):
    rng = np.random.default_rng(11)
    vecs = rng.uniform(-1, 1, size=(25, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, vectors.kmeans_int(df, k=3, iters=2).collect()))
    b = sorted(
        map(tuple, vectors.kmeans_int(df, k=3, iters=2, checkpoint=True).collect())
    )
    assert a == b


def test_kmeans_empty_cluster_drops_out(spark):
    # two tight groups far apart; k=3 seeds the first three vectors —
    # after one update the two seeds inside the same group collapse and
    # one centroid loses all members on the next assignment
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.01, 0.0]),
        (2, [0.9, 0.9]),
        (3, [0.91, 0.9]),
        (4, [0.0, 0.01]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = vectors.kmeans_int(df, k=3, iters=2).collect()
    assert {r["vec_id"] for r in out} == set(range(5))  # total assignment
    cids = {r["cid"] for r in out}
    assert len(cids) <= 3


# ----------------------------------------------------------- boolean AND


def test_boolean_and_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join window spark"),
            (2, "spark window"),  # missing 'join'
            (3, "window join spark extra words"),
            (4, "join spark window join"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "spark join window")], "query_id long, query string")
    got = {r["doc_id"]: (r["tf_total"], r["rk"]) for r in retrieval.boolean_and(docs, q).collect()}
    # doc 2 excluded (AND); tf_total counts all matched occurrences
    assert set(got) == {1, 3, 4}
    assert got[1] == (4, 1)  # spark×2 + join + window
    assert got[4] == (4, 2)  # tie on tf_total=4 → larger doc_id ranks after
    assert got[3] == (3, 3)


def test_boolean_and_duplicate_query_terms_counted_once(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "alpha alpha beta")], "query_id long, query string")
    got = [r["doc_id"] for r in retrieval.boolean_and(docs, q).collect()]
    assert got == [1]  # distinct terms {alpha, beta}; doc 2 lacks beta


# ----------------------------------------------------------- surprisal


def test_doc_surprisal_orders_common_vs_rare(spark):
    # 10 docs of pure boilerplate + 1 doc of unique tokens: the unique
    # doc must score strictly higher (rarer unigrams)
    rows = [(i, "the quick brown fox") for i in range(10)]
    rows.append((99, "zygomorphic quasar xenolith"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["surprisal_q"] for r in textops.doc_surprisal(docs).collect()}
    assert got[99] > got[0]
    assert all(got[i] == got[0] for i in range(10))  # identical docs tie


def test_doc_surprisal_matches_python_reference(spark):
    rows = [
        (1, "a a b"),
        (2, "b c"),
        (3, "a c c d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {i: t.split() for i, t in rows}
    cnt = {}
    for ts in toks.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    tt = sum(cnt.values())
    want = {
        i: (len(ts), sum((tt * 1000) // cnt[t] for t in ts) // len(ts))
        for i, ts in toks.items()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_q"])
        for r in textops.doc_surprisal(docs).collect()
    }
    assert got == want
