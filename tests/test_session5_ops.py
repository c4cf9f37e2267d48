"""Unit semantics for the round-5 continuation operators: KMV full set
algebra, caption consensus election, adaptive politeness delays, and
bloom batch novelty. The entry-level oracle parity is covered by
test_entry_oracle; these pin the BRANCHES the synthetic driver data may
or may not hit (tie-breaks, clamps, escalation, exact sub-k regime)."""

import pytest
from pyspark.sql import functions as F

from netrunner_spark.operators.crawlintel import adaptive_delay_plan
from netrunner_spark.operators.imageops import caption_consensus
from netrunner_spark.operators.sketches import bloom_novelty, kmv_set_full


def test_kmv_set_full_exact_subk_regime(spark):
    # |union| < k -> every sketch is the exact set: the "estimates"
    # must be exact set-algebra counts
    a = spark.createDataFrame([(i,) for i in range(1, 11)], "key long")
    b = spark.createDataFrame([(i,) for i in range(6, 16)], "key long")
    row = kmv_set_full(a, b, key="key", k=64).collect()[0]
    assert row.k_used == 15
    assert row.rho_ab == 5
    assert row.rho_a_only == 5
    assert row.rho_b_only == 5
    assert row.est_union == 15
    assert row.est_intersect == 5
    assert row.est_a_minus_b == 5
    assert row.est_b_minus_a == 5
    assert row.jaccard_pm == 5 * 1000 // 15


def test_kmv_set_full_estimator_partitions_union(spark):
    # estimator regime: the three rho classes partition the union
    # sketch, so the three estimates sum to ~est_union (integer-div
    # truncation loses at most 2)
    a = spark.createDataFrame([(i,) for i in range(2000)], "key long")
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], "key long")
    row = kmv_set_full(a, b, key="key", k=32).collect()[0]
    assert row.k_used == 32
    assert row.rho_ab + row.rho_a_only + row.rho_b_only == row.k_used
    s = row.est_intersect + row.est_a_minus_b + row.est_b_minus_a
    assert row.est_union - 2 <= s <= row.est_union
    # true union is 3000; KMV at k=32 should land the right decade
    assert 1500 <= row.est_union <= 6000


def test_caption_consensus_majority_and_tiebreaks(spark):
    rows = [
        # g1: clear majority
        (1, 10, "a cat"),
        (2, 10, "a cat"),
        (3, 10, "the second variant"),
        # g2: count tie -> shorter caption wins
        (4, 20, "wordy caption"),
        (5, 20, "short"),
        # g3: count+length tie -> lexicographically smallest
        (6, 30, "bbb"),
        (7, 30, "aaa"),
    ]
    img = spark.createDataFrame(
        rows, "image_id long, content_key long, caption string"
    )
    out = {
        r.image_id: r for r in caption_consensus(img).collect()
    }
    assert out[1].canon_caption == "a cat" and out[1].agrees
    assert out[3].canon_caption == "a cat" and not out[3].agrees
    assert out[3].n_copies == 3 and out[3].n_captions == 2
    assert out[4].canon_caption == "short" and not out[4].agrees
    assert out[6].canon_caption == "aaa"
    assert out[7].agrees


def test_adaptive_delay_clamps_and_escalation(spark):
    rows = []
    # fast.test: p95 = 0-bin (latency 10ms) -> base 20 -> clamp to min
    rows += [("fast.test", 10, True)] * 20
    # slow.test: p95 ~ 60s -> base 120s -> clamp to max
    rows += [("slow.test", 60_000, True)] * 20
    # flaky.test: p95 bin 1000 -> base 2000; 50% errors -> x2 = 4000
    rows += [("flaky.test", 1000, ok) for ok in (True, False) * 10]
    log = spark.createDataFrame(rows, "host string, latency_ms long, ok boolean")
    out = {r.host: r for r in adaptive_delay_plan(log).collect()}
    assert out["fast.test"].delay_ms == 500
    assert out["slow.test"].delay_ms == 30_000
    assert out["flaky.test"].err_pm == 500
    assert out["flaky.test"].delay_ms == 4000
    assert out["fast.test"].n_fetches == 20


def test_bloom_novelty_no_false_negatives(spark):
    corpus = spark.createDataFrame(
        [(f"k{i}",) for i in range(5)], "content_hash string"
    )
    batch = spark.createDataFrame(
        [("hx", "k0"), ("hx", "k1"), ("hx", "new-a"), ("hx", "new-b"),
         ("hy", "k2"), ("hy", "new-c")],
        "host string, content_hash string",
    )
    out = {r.host: r for r in
           bloom_novelty(corpus, batch, "content_hash", "host").collect()}
    # bloom has NO false negatives: every corpus-present key must count
    # as maybe_dup; at 5 keys in 4096x3 bits false positives are
    # deterministic-absent for these literals
    assert out["hx"].n_batch == 4
    assert out["hx"].n_maybe_dup == 2
    assert out["hx"].n_novel == 2 and out["hx"].novelty_pm == 500
    assert out["hy"].n_maybe_dup == 1 and out["hy"].novelty_pm == 500


def test_bloom_novelty_plan_never_joins_corpus_to_batch(spark):
    # the corpus reaches the batch only through the <=k*m-row bit
    # table; the physical plan must not contain a sort-merge join
    # (bounded side -> broadcast hash joins only)
    corpus = spark.range(0, 1000).select(
        F.concat(F.lit("c"), F.col("id")).alias("content_hash")
    )
    batch = spark.range(0, 1000).select(
        F.lit("h0").alias("host"),
        F.concat(F.lit("c"), (F.col("id") * 2)).alias("content_hash"),
    )
    plan = bloom_novelty(
        corpus, batch, "content_hash", "host"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_adaptive_delays_close_into_scheduler(spark):
    # E2E loop closure: wave-1 fetch observations -> adaptive delay
    # plan -> slot budgets -> wave-2 schedule. The slow host is
    # throttled, the erroring host doubly so, the fast host gets the
    # 500 ms floor; every (host, round) batch respects its budget.
    from netrunner_spark.operators.politeness import (
        budgets_from_delays,
        schedule_rounds,
    )

    rows = []
    rows += [("fast.test", 10, True)] * 20
    rows += [("slow.test", 1000, True)] * 20
    rows += [("flaky.test", 1000, ok) for ok in (True, False) * 10]
    log = spark.createDataFrame(rows, "host string, latency_ms long, ok boolean")
    budgets = budgets_from_delays(adaptive_delay_plan(log), round_seconds=10.0)
    b = {r.host: r.budget for r in budgets.collect()}
    # fast: clamp floor 500ms -> 20 slots; slow: 2xp95=2s -> 5;
    # flaky: escalated 4s -> 2
    assert b == {"fast.test": 20, "slow.test": 5, "flaky.test": 2}

    frontier = spark.createDataFrame(
        [(h, i * 7919 + j, 0) for h in b for j, i in enumerate(range(30))],
        "host string, url_hash long, priority long",
    ).dropDuplicates(["host", "url_hash"])
    sched = schedule_rounds(frontier, budgets)
    per = {
        (r.host, r.sched_round): r.n
        for r in sched.groupBy("host", "sched_round")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for (host, rnd), n in per.items():
        assert n <= b[host], (host, rnd, n)
    # full rounds are exactly at budget (30 URLs each)
    assert per[("flaky.test", 0)] == 2 and per[("flaky.test", 14)] == 2
    assert per[("slow.test", 0)] == 5
    assert per[("fast.test", 0)] == 20 and per[("fast.test", 1)] == 10


def test_kmv_group_overlap_exact_and_matches_pairwise(spark):
    from netrunner_spark.operators.sketches import kmv_group_overlap

    rows = (
        [("a", i) for i in range(0, 20)]
        + [("b", i) for i in range(10, 30)]
        + [("c", i) for i in range(100, 105)]
    )
    df = spark.createDataFrame(rows, "grp string, key long")
    # k large -> exact regime: the matrix must be exact set algebra
    out = {
        (r.grp_a, r.grp_b): r
        for r in kmv_group_overlap(df, "key", "grp", k=64).collect()
    }
    assert out[("a", "b")].est_union == 30
    assert out[("a", "b")].est_intersect == 10
    assert out[("a", "b")].jaccard_pm == 10 * 1000 // 30
    assert out[("a", "c")].est_intersect == 0
    assert out[("b", "c")].est_union == 25


def test_kmv_group_overlap_equals_kmv_set_full(spark):
    # the group matrix must reproduce the two-set operator's numbers
    # bit-for-bit for the same (key, k, salt) — same hash, same union
    # sketch, same estimator arithmetic; pins the two-level top-k as
    # an EXACT per-group top-k, not an approximation
    from netrunner_spark.operators.sketches import (
        kmv_group_overlap,
        kmv_set_full,
    )

    rows = [("a", i * 13) for i in range(800)] + [
        ("b", i * 13) for i in range(400, 1600)
    ]
    df = spark.createDataFrame(rows, "grp string, key long")
    mat = kmv_group_overlap(df, "key", "grp", k=16).collect()[0]
    two = kmv_set_full(
        df.filter(F.col("grp") == "a"),
        df.filter(F.col("grp") == "b"),
        key="key",
        k=16,
    ).collect()[0]
    assert mat.k_used == two.k_used
    assert mat.est_union == two.est_union
    assert mat.est_intersect == two.est_intersect
    assert mat.jaccard_pm == two.jaccard_pm


def test_vocab_drift_detects_shift_and_is_exact_ppm(spark):
    from netrunner_spark.operators.textops import vocab_drift

    # round A: "cat" heavy; round B: "dog" heavy; "the" stable filler
    a = spark.createDataFrame(
        [(1, "the cat cat cat"), (2, "the cat")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(3, "the dog dog dog"), (4, "the dog")], "doc_id long, text string"
    )
    rows = {r.token: r for r in vocab_drift(a, b, k=10).collect()}
    # totals: 6 tokens per round
    assert rows["cat"].cnt_a == 4 and rows["cat"].cnt_b == 0
    assert rows["dog"].cnt_a == 0 and rows["dog"].cnt_b == 4
    assert rows["cat"].freq_a_ppm == 4 * 1000000 // 6
    assert rows["cat"].delta_ppm == 4 * 1000000 // 6
    assert rows["the"].delta_ppm == 0
    # drift order: cat/dog (tied) before the; tie broken token asc
    ordered = [r.token for r in vocab_drift(a, b, k=10).collect()]
    assert ordered[:2] == ["cat", "dog"]
    assert ordered[-1] == "the"


def test_vocab_drift_unseen_tokens_survive_full_outer(spark):
    from netrunner_spark.operators.textops import vocab_drift

    a = spark.createDataFrame([(1, "only alpha")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "only beta")], "doc_id long, text string")
    toks = {r.token: (r.cnt_a, r.cnt_b) for r in vocab_drift(a, b).collect()}
    assert toks["alpha"] == (1, 0)
    assert toks["beta"] == (0, 1)
    assert toks["only"] == (1, 1)


def test_source_drift_identical_rounds_zero_and_single_round_max(spark):
    from netrunner_spark.operators.textops import source_drift

    # s_same: identical text both rounds -> tv 0
    # s_only_a: present only in round A -> degenerate max (~500000)
    a = spark.createDataFrame(
        [("s_same", "alpha beta alpha"), ("s_only_a", "gamma gamma")],
        "source string, text string",
    )
    b = spark.createDataFrame(
        [("s_same", "alpha beta alpha")], "source string, text string"
    )
    rows = {r.source: r for r in source_drift(a, b).collect()}
    assert rows["s_same"].tv_ppm == 0
    # one token at freq 1e6 in A, tot_b=0 -> freqs (1e6, 0) -> tv 500000
    assert rows["s_only_a"].tv_ppm == 500000
    # ordering: drifted source first
    ordered = [r.source for r in source_drift(a, b).collect()]
    assert ordered == ["s_only_a", "s_same"]


def test_source_drift_half_swap_is_half_tv(spark):
    from netrunner_spark.operators.textops import source_drift

    # round A: 2x alpha 2x beta; round B: 2x alpha 2x gamma
    # p_a = {alpha:.5, beta:.5}; p_b = {alpha:.5, gamma:.5} -> TV = 0.5
    a = spark.createDataFrame(
        [("s", "alpha beta alpha beta")], "source string, text string"
    )
    b = spark.createDataFrame(
        [("s", "alpha gamma alpha gamma")], "source string, text string"
    )
    row = source_drift(a, b).collect()[0]
    assert row.tv_ppm == 500000
    assert row.n_tokens == 3


def test_dup_spans_counts_shared_shingles_only(spark):
    from netrunner_spark.operators.textops import dup_spans

    docs = spark.createDataFrame(
        [
            (1, "0123456789abcdefghij"),   # shares span@1 with doc 2
            (2, "0123456789zzzzzzzzzz"),
            (3, "unique-text-here-xyz"),   # no shared spans
            (4, "short"),                   # < width -> absent
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_spans(docs, width=10, stride=5).collect()}
    assert set(out) == {1, 2, 3}
    # len 20, width 10, stride 5 -> positions 1, 6, 11 -> 3 spans
    assert out[1].n_spans == 3 and out[1].n_dup_spans == 1
    assert out[1].dup_ppm == 1_000_000 // 3
    assert out[2].n_dup_spans == 1
    assert out[3].n_dup_spans == 0 and out[3].dup_ppm == 0


def test_dup_spans_within_doc_repeat_is_not_cross_doc_dup(spark):
    from netrunner_spark.operators.textops import dup_spans

    # the same span repeated INSIDE one doc is not a duplicate (doc_df
    # counts distinct docs) — substring dedup targets cross-doc copy
    docs = spark.createDataFrame(
        [(1, "ababababab" * 3)], "doc_id long, text string"
    )
    row = dup_spans(docs, width=10, stride=10).collect()[0]
    assert row.n_dup_spans == 0


def test_pii_scrub_redacts_all_types_in_order(spark):
    from netrunner_spark.operators.textops import pii_scrub, PII_PATTERNS

    docs = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@mail-host.org today"),
            (2, "server 192.168.1.250 then call +44 20 7946 0958 done"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 1, 1)
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 0)
    # md5 equals the md5 of the expected scrubbed bodies
    import hashlib

    exp = {
        1: "mail me at <EMAIL> today",
        2: "server <IP> then call <PHONE> done",
        3: "no pii here at all",
    }
    for i, s in exp.items():
        assert out[i].scrubbed_md5 == hashlib.md5(s.encode()).hexdigest(), i
    # order contract: phone runs inside an IP are never double-counted
    # (IP is replaced before the phone pass; dots break the phone class)
    assert len(PII_PATTERNS) == 3


def test_pii_scrub_differential_vs_python_re(spark):
    """One Spark job over 300 seeded random bodies; Java-regex scrub
    must equal a pure-Python `re` reference (same ordered chain) on
    counts AND the scrubbed body hash — the patterns live in the
    Java∩RE2∩`re` subset, so any divergence is a real bug."""
    import hashlib
    import random
    import re

    from netrunner_spark.operators.textops import PII_PATTERNS, pii_scrub

    rng = random.Random(42)
    words = ["alpha", "beta", "kappa", "call", "at", "mail", "now", "ip"]
    piis = [
        lambda i: f"user{i}@ex{i % 7}.org",
        lambda i: f"{10 + i % 200}.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}",
        lambda i: f"+{1 + i % 9} {400 + i % 500} {500 + i % 400} {1000 + i % 9000}",
        lambda i: f"{i}" ,                     # bare number: NOT pii unless long
        lambda i: "a@b",                        # not a valid email (no tld)
        lambda i: "1.2.3",                      # not an ip (3 octets)
    ]
    rows = []
    for i in range(300):
        toks = [rng.choice(words) for _ in range(rng.randrange(0, 8))]
        for _ in range(rng.randrange(0, 3)):
            toks.insert(rng.randrange(0, len(toks) + 1), rng.choice(piis)(i))
        rows.append((i, " ".join(toks)))
    got = {
        r.doc_id: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i, text in rows:
        exp_counts = [len(re.findall(rx, text)) for _, rx, _ in PII_PATTERNS]
        scrubbed = text
        for _, rx, repl in PII_PATTERNS:
            scrubbed = re.sub(rx, repl, scrubbed)
        r = got[i]
        assert (r.n_emails, r.n_ips, r.n_phones) == tuple(exp_counts), (i, text)
        assert r.scrubbed_md5 == hashlib.md5(scrubbed.encode()).hexdigest(), (
            i,
            text,
            scrubbed,
        )


def test_dup_spans_differential_vs_python(spark):
    """50 seeded docs over a 3-word alphabet (shared shingles occur
    naturally); Spark result must equal the brute-force Python
    reference exactly."""
    import random
    from collections import defaultdict

    from netrunner_spark.operators.textops import dup_spans

    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choice(["ab", "cd", "ef"]) for _ in range(rng.randrange(5, 20))))
        for i in range(50)
    ]
    W, S = 12, 4
    span_docs = defaultdict(set)
    per_doc = {}
    for i, text in rows:
        spans = [text[p : p + W] for p in range(0, len(text) - W + 1, S)]
        per_doc[i] = spans
        for s in spans:
            span_docs[s].add(i)
    exp = {}
    for i, spans in per_doc.items():
        if not spans:
            continue
        ndup = sum(1 for s in spans if len(span_docs[s]) >= 2)
        exp[i] = (len(spans), ndup, ndup * 1_000_000 // len(spans))
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_ppm)
        for r in dup_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            width=W,
            stride=S,
        ).collect()
    }
    assert got == exp


def test_pii_scrub_handles_mixed_case_email(spark):
    """r5 review: the scrub chain was lowercase-only while the
    pattern_scan router matched mixed case — flagged docs kept their
    PII. Both must agree."""
    import hashlib

    from netrunner_spark.operators.textops import pii_scrub, scrubbed_text

    docs = spark.createDataFrame(
        [(1, "reach John.Doe@Example.COM today")], "doc_id long, text string"
    )
    row = pii_scrub(docs).collect()[0]
    assert row["n_emails"] == 1
    scrubbed = docs.select(scrubbed_text().alias("s")).collect()[0]["s"]
    assert scrubbed == "reach <EMAIL> today"
    assert row["scrubbed_md5"] == hashlib.md5(scrubbed.encode()).hexdigest()
