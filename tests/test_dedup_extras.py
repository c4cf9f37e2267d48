"""Round-5 continuation dedup operators: Broder containment pairs
(asymmetric subset duplication), maximal cross-doc duplicated token
spans (Lee et al.-style exact-substring signal, gaps-and-islands), and
the multimodal caption-LSH × dims conjunction on the image axis."""

from pyspark.sql import functions as F

from netrunner_spark.operators import imageops, textops


def test_containment_catches_subset_dup(spark):
    quote = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, quote),
            (
                1,
                "intro words here. "
                + quote
                + " trailing commentary of many more tokens entirely distinct",
            ),
            (2, "completely different page about something else unrelated"),
        ],
        "doc_id long, text string",
    )
    out = textops.containment_pairs(docs, min_cont_q=900)
    rows = {(r.doc_a, r.doc_b): r for r in out.collect()}
    assert set(rows) == {(0, 1)}
    r = rows[(0, 1)]
    # every char 3-gram of the quote occurs in doc 1 → containment = 1
    assert r.cont_a_q == 1000
    # ...while symmetric Jaccard on the same pair is diluted
    jacc = r.n_common / (r.grams_a + r.grams_b - r.n_common)
    assert jacc < 0.6


def test_duplicate_spans_merges_maximal_span(spark):
    shared = "one two three four five six seven eight"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, "aa bb cc " + shared + " dd ee"),
            (1, "zz " + shared + " yy xx ww vv uu"),
            (2, "totally different words qq rr ss tt"),
        ],
        "doc_id long, text string",
    )
    out = textops.duplicate_spans(docs, n=4, min_span_grams=2, max_gram_df=None)
    spans = {r.doc_id: r for r in out.collect()}
    assert set(spans) == {0, 1}
    # doc 0: shared run covers tokens 4..11; dup 4-gram starts 4..8
    assert (spans[0].span_start, spans[0].span_end, spans[0].span_tokens) == (4, 11, 8)
    assert spans[0].n_dup_grams == 5
    # doc 1: same run shifted to tokens 2..9
    assert (spans[1].span_start, spans[1].span_end, spans[1].span_tokens) == (2, 9, 8)


def test_duplicate_spans_islands_do_not_merge_across_gaps(spark):
    head = "alpha beta gamma delta"
    tail = "omega psi chi phi"
    docs = spark.createDataFrame(
        [
            (0, head + " ga gb gc gd ge " + tail),
            (1, head + " mid filler words here " + tail),
        ],
        "doc_id long, text string",
    )
    out = textops.duplicate_spans(docs, n=4, min_span_grams=1, max_gram_df=None)
    spans = sorted(
        ((r.doc_id, r.span_start, r.span_end) for r in out.collect())
    )
    # gap (5 unique tokens > n) keeps the two duplicated runs separate
    assert spans == [(0, 1, 4), (0, 10, 13), (1, 1, 4), (1, 9, 12)]


def test_duplicate_spans_stop_gram_cap(spark):
    # a 4-gram present in EVERY doc is cut by max_gram_df, so no spans
    # survive; raising the cap brings them back
    boiler = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    assert textops.duplicate_spans(docs, n=4, max_gram_df=5).count() == 0
    assert textops.duplicate_spans(docs, n=4, max_gram_df=10).count() == 10


def test_multimodal_dup_pairs_requires_both_signals(spark):
    cap = "a red fox jumps over the lazy dog near the river bank " * 2
    rows = [
        (0, 512, 512, "jpeg", cap),
        (1, 512, 512, "jpeg", cap),  # caption dup + same dims → pair
        (2, 640, 480, "jpeg", cap),  # caption dup, different dims → cut
        (
            3,
            512,
            512,
            "jpeg",
            "entirely different caption about mountains and snow and wind",
        ),
    ]
    images = spark.createDataFrame(
        rows, "image_id long, w int, h int, fmt string, caption string"
    )
    out = imageops.multimodal_dup_pairs(images)
    assert {(r.image_a, r.image_b) for r in out.collect()} == {(0, 1)}
    assert out.columns == ["image_a", "image_b", "w", "h", "fmt"]


def test_new_dedup_ops_plan_shapes(spark):
    """containment_pairs / duplicate_spans / multimodal_dup_pairs must
    never plan a cartesian product — every pairing step is an equi-join
    on a gram/band/id key (the 100 TB contract)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)],
        "doc_id long, text string",
    )
    images = spark.createDataFrame(
        [(i, 64, 64, "png", "a caption of several words here") for i in range(20)],
        "image_id long, w int, h int, fmt string, caption string",
    )
    for df in (
        textops.containment_pairs(docs, max_gram_df=25),
        textops.duplicate_spans(docs),
        imageops.multimodal_dup_pairs(images),
    ):
        plan = df.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- winnowing
def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: a shared run of >= n + window - 1
    tokens must yield >= 1 shared fingerprint; and the fingerprint set
    is much denser-bounded than the full gram set."""
    from netrunner_spark.operators.textops import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, shared + " totally different tail words here now"),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, n=4, window=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    # guarantee: docs 1 and 2 share the 10-token run (>= 4+5-1=8)
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # density: far fewer fingerprints than grams
    n_grams = 13 + 4  # doc1 has 16 tokens -> 13 grams; selected << grams
    assert len([r for r in fps if r["doc_id"] == 1]) < n_grams


def test_winnow_rightmost_tie_and_determinism(spark):
    from netrunner_spark.operators.textops import winnow_fingerprints

    # identical repeated token => all gram hashes equal; rightmost-min
    # selection must pick exactly one fingerprint per full window chain
    docs = spark.createDataFrame(
        [(1, "same " * 20)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(docs, n=4, window=5).collect()
    # every window's min is the same hash; rightmost tie-break slides to
    # the window end, so each window-end position selects (pos) distinct
    # (hash,pos) pairs -> one fingerprint per window-end, same hash
    hashes = {r["fp_hash"] for r in fps}
    assert len(hashes) == 1
    poss = sorted(r["fp_pos"] for r in fps)
    # rightmost of window ending at q is q itself here
    assert poss == list(range(5, 5 + len(poss)))
    a = sorted(map(tuple, winnow_fingerprints(docs, n=4, window=5).collect()))
    b = sorted(map(tuple,
                   winnow_fingerprints(docs.repartition(3), n=4, window=5).collect()))
    assert a == b


def test_hamming_radius_search_recall_and_radius(spark):
    from netrunner_spark.operators.textops import hamming_radius_search

    sigs = spark.createDataFrame(
        [(1, 0b1111000011110000), (2, 0b1111000011110001),
         (3, 0b1111000011111111), (4, 0)],
        "doc_id long, simhash long",
    )
    # query = doc1's signature with one bit flipped
    queries = spark.createDataFrame(
        [(100, 0b1111000011110010)], "query_id long, qsig long"
    )
    out = {(r["query_id"], r["doc_id"]): r["hamming"] for r in
           hamming_radius_search(sigs, queries, bits=16, bands=4,
                                 max_hamming=2).collect()}
    assert out == {(100, 1): 1, (100, 2): 2}  # doc3 at d=3, doc4 far

    # perfect recall at d = 3 < bands: q2 agrees with doc4 (sig 0) on
    # only one band (band 0) yet must still be found at hamming 3
    q2 = spark.createDataFrame([(200, 0b0000000001110000)],
                               "query_id long, qsig long")
    out2 = {r["doc_id"]: r["hamming"] for r in
            hamming_radius_search(sigs, q2, bits=16, bands=4,
                                  max_hamming=3).collect()}
    assert out2.get(4) == 3


def test_hamming_radius_search_broadcasts_query_side(spark):
    from netrunner_spark.operators.textops import hamming_radius_search

    sigs = spark.createDataFrame(
        [(i, i * 37 % 65536) for i in range(50)], "doc_id long, simhash long"
    )
    queries = spark.createDataFrame([(1, 5)], "query_id long, qsig long")
    plan = (
        hamming_radius_search(sigs, queries, bits=16, bands=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus side must be probed by a broadcast of the query batch —
    # never a shuffle of the corpus onto band keys against a big side
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_winnow_differential_vs_python_reference(spark):
    """Seeded random corpora: Spark winnowing must equal an independent
    Python reimplementation (hash fold, rightmost-min window selection,
    full windows only) exactly."""
    import hashlib
    import random

    from netrunner_spark.operators.textops import winnow_fingerprints

    rng = random.Random(31)
    # letters only: the operator tokenizes on [^a-z]+, so digit-bearing
    # tokens would split differently than the reference's .split()
    vocab = ["".join(chr(97 + (i * 7 + j) % 26) for j in range(3)) for i in range(25)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(20)
    ]
    n, window = 4, 5

    def ref(rows):
        out = set()
        for doc_id, text in rows:
            toks = [t for t in text.lower().split() if t]
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            hs = [
                int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % 2**40
                for g in grams
            ]
            picked = set()
            for q in range(window - 1, len(hs)):  # full windows only
                lo = q - window + 1
                m = min(hs[lo : q + 1])
                # rightmost position achieving the min
                p = max(i for i in range(lo, q + 1) if hs[i] == m)
                picked.add((p + 1, hs[p]))  # 1-based pos like the operator
            for pos, h in picked:
                out.add((doc_id, pos, h))
        return out

    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in winnow_fingerprints(
            spark.createDataFrame(docs, "doc_id long, text string"),
            n=n, window=window,
        ).collect()
    }
    want = ref(docs)
    assert got == want
    assert got  # seeded corpus yields fingerprints


def test_line_dedup_strips_chrome_keeps_content_in_order(spark):
    nav, footer = "home | about", "copyright 2026"
    docs = spark.createDataFrame(
        [
            (0, f"{nav}\nunique zero content\nmore zero\n{footer}"),
            (1, f"{nav}\nunique one content\n{footer}"),
            (2, f"{nav}\nunique two content\n  COPYRIGHT   2026 "),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.line_dedup(docs, max_doc_df=1).collect()}
    # nav appears in 3 docs, footer in 3 (normalization folds the
    # shouty variant into the lowercase one) -> both stripped everywhere
    assert out[0].clean_text == "unique zero content\nmore zero"
    assert out[0].n_lines == 4 and out[0].kept_lines == 2
    assert out[1].clean_text == "unique one content"
    assert out[2].clean_text == "unique two content"


def test_line_dedup_df_threshold_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [
            (0, "shared pair line\nalpha"),
            (1, "shared pair line\nbeta"),
            (2, "   \n\n"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.line_dedup(docs, max_doc_df=2).collect()}
    # df == 2 <= threshold -> the shared line SURVIVES in both docs
    assert out[0].clean_text == "shared pair line\nalpha"
    assert out[1].clean_text == "shared pair line\nbeta"
    # blank-only doc: zero non-blank lines, empty cleaned text, still reported
    assert out[2].n_lines == 0 and out[2].kept_lines == 0
    assert out[2].clean_text == ""


def test_line_dedup_within_doc_repeat_survives(spark):
    # a line repeated inside ONE doc has doc-DF 1 -> both copies stay
    docs = spark.createDataFrame(
        [(0, "la la la\nmiddle\nla la la"), (1, "other page")],
        "doc_id long, text string",
    )
    row = textops.line_dedup(docs, max_doc_df=1).filter("doc_id = 0").first()
    assert row.clean_text == "la la la\nmiddle\nla la la"
    assert row.n_lines == 3 and row.kept_lines == 3


def test_line_dedup_differential_vs_python_reference(spark):
    """Seeded random lined docs (shared pool + whitespace/case variants):
    Spark line_dedup must equal a straight Python reimplementation."""
    import random
    import re

    rng = random.Random(53)
    pool = [f"line {i} payload" for i in range(12)]
    variants = [str.upper, str.lower, lambda s: "  " + s + " ", lambda s: s.replace(" ", "   ")]
    docs = []
    for i in range(25):
        lines = [
            rng.choice(variants)(rng.choice(pool))
            for _ in range(rng.randint(0, 6))
        ]
        if rng.random() < 0.3:
            lines.insert(rng.randrange(len(lines) + 1), "   ")  # blank-ish
        docs.append((i, "\n".join(lines)))
    max_df = 3

    def norm(line):
        return re.sub(r"\s+", " ", line).strip().lower()

    def ref(rows):
        from collections import defaultdict

        df_docs = defaultdict(set)
        for doc_id, text in rows:
            for ln in text.split("\n"):
                n = norm(ln)
                if n:
                    df_docs[n].add(doc_id)
        out = {}
        for doc_id, text in rows:
            nb = [ln for ln in text.split("\n") if norm(ln)]
            kept = [ln for ln in nb if len(df_docs[norm(ln)]) <= max_df]
            out[doc_id] = (len(nb), len(kept), "\n".join(kept))
        return out

    got = {
        r.doc_id: (r.n_lines, r.kept_lines, r.clean_text)
        for r in textops.line_dedup(
            spark.createDataFrame(docs, "doc_id long, text string"),
            max_doc_df=max_df,
        ).collect()
    }
    assert got == ref(docs)


def test_bit_balance_detects_stuck_bit(spark):
    # bit 0 always 1 (all odd), bit 1 balanced, bit 2 always 0
    sigs = spark.createDataFrame(
        [(i,) for i in (1, 3, 1, 3, 1, 3)], "simhash long"
    )
    got = {r.bit: (r.ones_permille, r.skewed) for r in
           textops.bit_balance(sigs, bits=3).collect()}
    assert got[0] == (1000, True)
    assert got[1] == (500, False)
    assert got[2] == (0, True)


def test_dup_source_matrix_attributes_dups_to_keeper_source(spark):
    # three exact copies of one doc across sources A, B, B (keeper =
    # min doc_id, in source A) plus an unrelated singleton in C: the
    # matrix must be exactly {(A,B): 2 dups} — singletons and keepers
    # themselves never appear
    from netrunner_spark.operators import textops
    from pyspark.sql import functions as F

    body = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame(
        [
            (0, body, "A", len(body)),
            (1, body, "B", len(body)),
            (2, body, "B", len(body)),
            (3, "completely different text about spark plans " * 20, "C", 880),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    cl = textops.dedup_clusters(docs, max_band_df=8)
    j = cl.join(docs.select("doc_id", "source", "n_chars"), "doc_id")
    keep = j.filter(F.col("is_keeper")).select(
        "cluster_id", F.col("source").alias("keeper_source")
    )
    dup = j.filter(~F.col("is_keeper")).select(
        "cluster_id", F.col("source").alias("dup_source"), "n_chars"
    )
    out = (
        dup.join(keep, "cluster_id")
        .groupBy("keeper_source", "dup_source")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.sum("n_chars").alias("dup_chars"))
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert (r["keeper_source"], r["dup_source"]) == ("A", "B")
    assert r["n_dups"] == 2 and r["dup_chars"] == 2 * len(body)


def test_bit_balance_handles_negative_signatures(spark):
    """r5 review: DIV/%2 bit extraction yielded -1 for negative
    signatures (sign bit set — half of all phash64 values), corrupting
    ones_permille. shiftright&1 extracts the two's-complement bit."""
    from netrunner_spark.operators.textops import bit_balance

    sigs = spark.createDataFrame([(-1,), (-1,)], "simhash long")
    rows = {r["bit"]: r["ones_permille"] for r in bit_balance(sigs, bits=4).collect()}
    assert rows == {0: 1000, 1: 1000, 2: 1000, 3: 1000}  # -1 = all ones
