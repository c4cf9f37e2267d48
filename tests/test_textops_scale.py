"""Scale-safety checks for the dedup operators: the hot-gram
document-frequency cap must bound the n-gram self-join's candidate
row count (the uncapped join is quadratic in per-gram df), and the
embedding near-dup SRP hash must widen with the corpus so bucket
self-joins stay bounded."""

from pyspark.sql import functions as F

from netrunner_spark.operators import textops, vectors


def _docs(spark, n_docs=40):
    # every doc shares the stop-gram-rich prefix; each pair also shares
    # a rare suffix with its neighbor → capped join must keep real
    # pairs while dropping the hot-gram blowup
    rows = [
        (i, ("the the the the common prefix " * 3) + f"rare{i // 2}tail")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_gram_cap_bounds_join(spark):
    docs = _docs(spark)
    uncapped = textops.jaccard_pairs(docs)
    capped = textops.jaccard_pairs(docs, max_gram_df=4)
    n_unc = uncapped.count()
    n_cap = capped.count()
    # uncapped: every doc pairs with every other via the shared prefix
    assert n_unc == 40 * 39 // 2
    # capped: only the rare-suffix neighbor pairs survive as candidates
    assert n_cap < n_unc / 10
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (0, 1) in pairs and (38, 39) in pairs
    # denominators still count ALL grams (cap affects candidates only)
    row = capped.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1)).first()
    full = textops.exploded_grams(docs.filter(F.col("doc_id") == 0), 3).select(
        "gram"
    ).dropDuplicates().count()
    assert row["grams_a"] == full


def test_band_bucket_cap_bounds_lsh_pairs(spark):
    """VERDICT r4 #2: a boilerplate corpus where EVERY doc shares all
    bands (one mega-bucket per band) used to emit C(m,2) pairs per
    bucket; with ``max_band_df`` the mega-bucket emits a hub star —
    O(m) rows — while connectivity survives for clustering."""
    m = 60
    same = [(i, "identical boilerplate page body " * 4) for i in range(m)]
    docs = spark.createDataFrame(same, "doc_id long, text string")
    uncapped = textops.minhash_lsh_pairs(docs)
    capped = textops.minhash_lsh_pairs(docs, max_band_df=8)
    assert uncapped.count() == m * (m - 1) // 2  # the quadratic blowup
    rows = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert rows == {(0, i) for i in range(1, m)}  # hub star, O(m)
    # clustering over the capped pairs still recovers the full cluster
    cl = textops.dedup_clusters(docs, max_band_df=8)
    got = {(r["doc_id"], r["cluster_id"]) for r in cl.collect()}
    assert got == {(i, 0) for i in range(m)}
    # mixed corpus: small buckets keep their complete pair set
    mixed = spark.createDataFrame(
        same[:3] + [(100 + i, f"unique-{i} " + "x" * 30) for i in range(4)],
        "doc_id long, text string",
    )
    small = {
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(mixed, max_band_df=8).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= small


def test_connected_components_chain_and_singletons(spark):
    """Chain-shaped pair graph (the worst case for label propagation):
    large-star/small-star must converge and label the whole chain with
    its min id; isolated nodes come back as singletons."""
    chain = [(i, i + 1) for i in range(0, 30)]  # 0-1-2-...-30 one chain
    other = [(50, 51), (51, 52)]
    pairs = spark.createDataFrame(chain + other, "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 31)] + [(50,), (51,), (52,), (99,)],
        "doc_id long",
    )
    out = {
        (r["doc_id"], r["cluster_id"])
        for r in textops.connected_components(pairs, nodes=nodes).collect()
    }
    want = {(i, 0) for i in range(0, 31)}
    want |= {(50, 50), (51, 50), (52, 50), (99, 99)}
    assert out == want


def test_srp_bits_scale_with_corpus():
    """The near-dup default must widen the hash as the corpus grows —
    a fixed 256-bucket key is quadratic death at 10^9 vectors."""
    assert vectors.auto_srp_bits(500) == 8  # oracle-scale behavior pinned
    assert vectors.auto_srp_bits(5_000) == 8
    assert vectors.auto_srp_bits(1_000_000) == 15
    assert vectors.auto_srp_bits(10**9) == 24  # hi clamp
    # monotone non-decreasing
    vals = [vectors.auto_srp_bits(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert vals == sorted(vals)
    # expected bucket occupancy stays bounded at every scale
    for n in (10**4, 10**6, 10**8, 10**9):
        b = vectors.auto_srp_bits(n)
        assert n / (2**b) <= 64  # ≤ 2× the 32-row target


def test_near_dup_default_bounds_bucket_size(spark, sf_dir):
    """At the knob's DEFAULT (bits=None → auto), the realized max SRP
    bucket must stay far below the corpus — the bucket self-join's
    per-bucket cost bound."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    bits = vectors.auto_srp_bits(n)
    sizes = (
        vectors.srp_bucket(emb, bits)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    max_bucket = sizes.agg(F.max("n")).first()[0]
    # SRP buckets are not uniform, but the max must be O(target), not O(n)
    assert max_bucket <= max(8 * 32, n // 4)
    # and the default path still returns verified pairs without error
    out = vectors.embedding_near_dups(emb)
    assert out.columns == ["vec_a", "vec_b", "dot_q"]
    out.count()


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized differential check: large-star/small-star labels must
    equal a plain union-find's component minima on arbitrary pair
    graphs (merge order, star shapes, cross-links between big and small
    components — topologies the chain test can't cover). Seeded, so
    failures reproduce."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(4):
        n = rng.randrange(10, 80)
        m = rng.randrange(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # union-find oracle
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in range(n)}
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in textops.connected_components(pairs, nodes=nodes).collect()
        }
        assert got == want, f"trial {trial}: n={n} edges={edges}"


def test_hamming_near_dups_known_distances(spark):
    """Pigeonhole hamming LSH: exact pair set for max_hamming < bands,
    including a negative signature (bit 63 set — arithmetic-shift band
    extraction must still key correctly)."""
    import numpy as np

    base = 0x0123456789ABCDEF
    sigs = {
        1: base,
        2: base ^ 0b1,                         # d=1
        3: base ^ 0b110000,                    # d=2
        4: base ^ (1 << 63),                   # d=1, negative int64
        5: ~base & 0xFFFFFFFFFFFFFFFF,         # d=64
        6: base ^ 0b10101,                     # d=3
    }
    rows = [(i, int(np.uint64(s).astype(np.int64))) for i, s in sigs.items()]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in textops.hamming_near_dups(df, bits=64, bands=4, max_hamming=3).collect()
    }
    # expected: every pair within hamming 3, computed independently
    want = {}
    for a in sigs:
        for b in sigs:
            if a < b:
                d = bin(sigs[a] ^ sigs[b]).count("1")
                if d <= 3:
                    want[(a, b)] = d
    assert got == want


def test_hamming_band_cap_bounds_pairs(spark):
    """A corpus of m identical signatures (one mega-bucket in every
    band) must emit a hub star — O(m) verified rows — under
    ``max_band_df``, not C(m,2); clustering connectivity survives."""
    m = 50
    df = spark.createDataFrame(
        [(i, 0x7EADBEEF) for i in range(m)], "doc_id long, simhash long"
    )
    uncapped = textops.hamming_near_dups(df, bits=64, bands=4, max_hamming=0)
    assert uncapped.count() == m * (m - 1) // 2
    capped = textops.hamming_near_dups(
        df, bits=64, bands=4, max_hamming=0, max_band_df=8
    )
    rows = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert rows == {(0, i) for i in range(1, m)}
    comp = textops.connected_components(capped)
    assert {(r["doc_id"], r["cluster_id"]) for r in comp.collect()} == {
        (i, 0) for i in range(m)
    }
    # star candidates are STILL hamming-verified: a far signature that
    # shares no band emits nothing even in star mode
    far = df.unionByName(
        spark.createDataFrame([(99, -0x7EADBEF0)], "doc_id long, simhash long")
    )
    capped2 = textops.hamming_near_dups(
        far, bits=64, bands=4, max_hamming=0, max_band_df=8
    )
    assert {r["doc_b"] for r in capped2.collect()} == set(range(1, m))


def test_phash_near_dups_images(spark):
    """The same operator over the image perceptual hash: exact copies
    pair at hamming 0, a lightly perturbed image pairs at small
    distance, an unrelated image does not pair. Differential against
    numpy popcount on the actual phash values."""
    import numpy as np

    from netrunner_spark.images import phash64

    rng = np.random.default_rng(7)
    a = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    b = a.copy()                                  # exact dup
    c = a.copy()
    c[:8, :8] = 255                               # one block blown out
    d = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    hashes = {1: phash64(a), 2: phash64(b), 3: phash64(c), 4: phash64(d)}
    df = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "image_id long, phash long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in textops.hamming_near_dups(
            df, id_col="image_id", sig_col="phash", bits=64, bands=4, max_hamming=8
        ).collect()
    }
    def pop(x, y):
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
    want = {
        (i, j): pop(hashes[i], hashes[j])
        for i in hashes
        for j in hashes
        if i < j and pop(hashes[i], hashes[j]) <= 8
        and any(
            (hashes[i] >> (band * 16)) & 0xFFFF == (hashes[j] >> (band * 16)) & 0xFFFF
            for band in range(4)
        )
    }
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 0     # exact dup found
    assert all(4 not in pair for pair in got)     # unrelated image excluded


# --------------------------------------------------- repetition/contamination
def test_token_ngrams_short_doc_guard(spark):
    # docs shorter than n emit ZERO grams (the F.sequence descending
    # pitfall: sequence(1, 0) would yield [1, 0] without the guard)
    docs = spark.createDataFrame(
        [(0, "one"), (1, "a b"), (2, ""), (3, "x y z")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["gram"])
        for r in textops.token_ngrams(docs, n=2).collect()
    }
    assert out == {(1, "a b"), (3, "x y"), (3, "y z")}
    # n=3: only doc 3 qualifies
    out3 = [r["gram"] for r in textops.token_ngrams(docs, n=3).collect()]
    assert out3 == ["x y z"]


def test_repetition_stats_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b a"), (1, "x y z")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in textops.repetition_stats(docs, n=2).collect()}
    # doc 0 bigrams: "a b" x2, "b a" x2 → all 4 occurrences repeated
    r0 = rows[0]
    assert (r0["n_grams"], r0["n_distinct_grams"], r0["n_rep_grams"]) == (4, 2, 4)
    assert r0["max_gram_reps"] == 2 and r0["top_gram"] == "a b"
    r1 = rows[1]
    assert (r1["n_grams"], r1["n_rep_grams"], r1["top_gram"]) == (2, 0, "x y")
    # plan pin: top-gram is fused into the per-doc aggregate via
    # min_by — exactly 2 shuffles ((doc_id,gram) then doc_id), no
    # window or self-join over the corpus-sized per-gram counts
    plan = textops.repetition_stats(docs, n=2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "Window" not in plan and "Join" not in plan


def test_contamination_counts_and_broadcast(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "foo bar baz")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_hits"])
        for r in textops.contamination(train, bench, n=3).collect()
    }
    # doc 1 grams: {alpha beta gamma, beta gamma delta} — 1 hit
    assert out[1] == (2, 1)
    assert out[2] == (1, 0)
    # the scale path broadcasts the benchmark gram set: the 100 TB
    # train side must never shuffle for this join
    df = textops.contamination(train, bench, n=3)
    sc = spark.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan


def test_cross_source_dups(spark):
    docs = spark.createDataFrame(
        [
            (1, "same text", "crawlA"),
            (2, "same text", "crawlB"),
            (3, "same text", "crawlA"),
            (4, "only in A", "crawlA"),
            (5, "only in A", "crawlA"),
            (6, "unique", "crawlB"),
        ],
        "doc_id long, text string, source string",
    )
    rows = textops.cross_source_dups(docs).collect()
    # only the group spanning two sources survives; keeper is min doc_id
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_copies"], r["n_sources"], r["keep_id"], r["keep_source"]) == (
        3, 2, 1, "crawlA",
    )
    # single hash aggregate: no window, no join in the plan
    plan = textops.cross_source_dups(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan


def test_pattern_scan_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b@test.org or c@d.io via https://x.y/z"),
            (2, "card 1234567890123456 and id 987654321"),
            (3, "clean text, no signals"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_urls"], r["n_long_digits"])
        for r in textops.pattern_scan(docs).collect()
    }
    assert got == {1: (2, 1, 0), 2: (0, 0, 2), 3: (0, 0, 0)}


def test_cluster_keepers_policy(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text"), (3, "medium txt"), (9, "x")],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    rows = {r["doc_id"]: r for r in textops.cluster_keepers(clusters, docs).collect()}
    assert rows[2]["keep"] and rows[2]["keeper_id"] == 2     # longest wins
    assert not rows[1]["keep"] and rows[1]["keeper_id"] == 2
    assert not rows[3]["keep"]
    assert rows[9]["keep"] and rows[9]["keeper_id"] == 9     # singleton keeps
    # tie on quality → min doc_id wins
    tie = spark.createDataFrame(
        [(5, 7), (4, 7)], "doc_id long, cluster_id long"
    )
    tdocs = spark.createDataFrame(
        [(4, "aaaa"), (5, "bbbb")], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text"))
    trows = {r["doc_id"]: r for r in textops.cluster_keepers(tie, tdocs).collect()}
    assert trows[4]["keep"] and not trows[5]["keep"]


def test_chunk_dedup_first_occurrence_wins(spark):
    ws = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    shared = ws(10, "s")                      # one exact 10-word chunk
    docs = spark.createDataFrame(
        [
            (1, shared + " " + ws(10, "a")),  # first occurrence of `shared`
            (2, shared + " " + ws(10, "b")),  # later doc: `shared` dropped
            (3, ws(10, "c") + " " + shared),  # later pos: dropped too
            (4, shared + " " + shared),       # both are global dups of doc 1
            (5, ws(10, "d") + " " + ws(10, "d")),  # in-doc repeat only
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.chunk_dedup(docs).collect()}
    assert got[1]["text_dedup"] == shared + " " + ws(10, "a")
    assert got[1]["n_dropped"] == 0
    assert got[2]["text_dedup"] == ws(10, "b") and got[2]["n_dropped"] == 1
    assert got[3]["text_dedup"] == ws(10, "c") and got[3]["n_dropped"] == 1
    # doc 4 holds no first occurrence at all → fully deduped away
    assert got[4]["text_dedup"] == "" and got[4]["n_dropped"] == 2
    # in-doc repeat: first copy kept, second dropped
    assert got[5]["text_dedup"] == ws(10, "d") and got[5]["n_dropped"] == 1
    assert all(r["n_chunks"] == 2 for r in got.values())


def test_chunk_dedup_trailing_partial_and_truncation(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(25)))], "doc_id long, text string"
    )
    r = textops.chunk_dedup(docs).collect()[0]
    assert r["n_chunks"] == 3 and r["n_dropped"] == 0
    assert r["text_dedup"] == docs.collect()[0]["text"]
    # max_chunks truncates deterministically
    r2 = textops.chunk_dedup(docs, max_chunks=2).collect()[0]
    assert r2["n_chunks"] == 2
    assert r2["text_dedup"] == " ".join(f"w{i}" for i in range(20))


def test_bpe_merges_classic_example(spark):
    # Sennrich's canonical toy corpus: low*5 lower*2 newest*6 widest*3
    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id long, text string",
    )
    rows = textops.bpe_merges(docs, n_merges=3).orderBy("step").collect()
    # step 1: 'e s' appears in newest(6) + widest(3) = 9 — the max
    assert (rows[0].pair, rows[0].cnt) == ("e s", 9)
    # step 2: 'es t' (same 9) wins over everything else
    assert (rows[1].pair, rows[1].cnt) == ("es t", 9)
    # step 3: 'l o' in low(5)+lower(2) = 7
    assert (rows[2].pair, rows[2].cnt) == ("l o", 7)


def test_bpe_replace_semantics_match_duckdb_on_repeats(spark):
    import duckdb

    # 'aaaa' is the pathological case: the padded one-pass replace
    # rewrites 'a a a a' -> 'aa a a' (trailing overlap unconsumed);
    # both engines must agree on that exact semantics
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aa baab")], "doc_id long, text string"
    )
    got = [
        (r.step, r.pair, r.cnt)
        for r in textops.bpe_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (text VARCHAR)")
    con.execute("INSERT INTO d VALUES ('aaaa aaaa aa baab')")
    want = con.execute(
        textops.bpe_sql(
            "SELECT word FROM (SELECT unnest(string_split(regexp_replace("
            "lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word FROM d)"
            " WHERE word <> ''",
            n_merges=3,
        )
        + " ORDER BY step"
    ).fetchall()
    assert got == want


def test_bpe_vocab_sized_work(spark):
    # the per-step aggregates run over the VOCABULARY (distinct words),
    # not the corpus: 1000 docs of the same 4 words -> w0 has 4 rows
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(1000)],
        "doc_id long, text string",
    )
    out = textops.bpe_merges(docs, n_merges=1).collect()
    assert len(out) == 1
    assert out[0].cnt >= 1000  # frequency-weighted, not vocab-weighted


def test_bpe_token_counts_apply_back(spark):
    # corpus 'ab ab ab cd': merge 1 = 'a b' (freq 3) -> ab is 1 token,
    # cd stays 2 chars
    docs = spark.createDataFrame(
        [(0, "ab ab ab cd"), (1, "cd cd")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_tokens
        for r in textops.bpe_token_counts(docs, n_merges=1).collect()
    }
    # doc 0: 3 x 'ab'(1 tok after merge) + 'cd'(2) = 5
    # doc 1: 2 x 'cd'(2) = 4
    assert got == {0: 5, 1: 4}


def test_bpe_token_counts_sql_twin(spark):
    import duckdb

    docs = [(0, "low low lower newest"), (1, "newest widest widest")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.n_tokens)
        for r in textops.bpe_token_counts(df, n_merges=2).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    want = set(
        con.execute(
            textops.bpe_tokens_sql(
                "SELECT doc_id, word FROM (SELECT doc_id, unnest(string_split("
                "regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word"
                " FROM d) WHERE word <> ''",
                n_merges=2,
            )
        ).fetchall()
    )
    assert got == want


def test_bpe_differential_vs_python_reference(spark):
    """Seeded random corpora heavy on repeats/overlaps: Spark BPE must
    equal an independent Python reimplementation (Counter pair counts,
    cnt-desc/pair-asc tie-break, padded str.replace rewrite) exactly —
    a third witness next to the DuckDB twin."""
    import random
    from collections import Counter

    from netrunner_spark.operators.textops import bpe_merges

    rng = random.Random(47)
    vocab = ["aa", "aaa", "abab", "ba", "ab", "b", "aab", "bbaa", "abba"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(15)
    ]

    def ref(rows, n_merges):
        freqs = Counter()
        for _, text in rows:
            for w in text.lower().split():
                if w:
                    freqs[w] += 1
        seqs = {w: " ".join(w) for w in freqs}
        merges = []
        for step in range(1, n_merges + 1):
            cnt = Counter()
            for w, seq in seqs.items():
                toks = seq.split(" ")
                for a, b in zip(toks, toks[1:]):
                    cnt[a + " " + b] += freqs[w]
            if not cnt:
                break
            maxc = max(cnt.values())
            pair = min(p for p, c in cnt.items() if c == maxc)
            merges.append((step, pair, maxc))
            for w, seq in seqs.items():
                seqs[w] = (
                    (" " + seq + " ")
                    .replace(" " + pair + " ", " " + pair.replace(" ", "") + " ")
                    .strip()
                )
        return merges

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.step, r.pair, r.cnt)
        for r in bpe_merges(df, n_merges=5).orderBy("step").collect()
    ]
    assert got == ref(docs, 5)
