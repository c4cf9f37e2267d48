"""Regressions for the eighth review batch (dedup NULL semantics,
rollup single-read fold)."""

from pyspark.sql import functions as F

from netrunner_spark.operators.dedup import canonical_dedup, duplicate_count


def _parsed(spark):
    return spark.createDataFrame(
        [
            ("https://h.test/a", "https://h.test/canon"),
            ("https://h.test/b", "https://h.test/canon"),  # dup of a
            ("https://h.test/c", None),  # archive RON row, no canonical
            ("https://h.test/d", None),  # another NULL — NOT a dup of c
        ],
        "url string, canonical_url string",
    )


def test_null_canonical_rows_each_survive(spark):
    """No canonical declared ⇒ the row is its own group. The old
    partitionBy(canonical_url) put every NULL row in ONE window group
    and kept a single arbitrary survivor."""
    out = canonical_dedup(_parsed(spark))
    urls = {r["url"] for r in out.collect()}
    assert "https://h.test/c" in urls and "https://h.test/d" in urls
    # the real duplicate pair still collapses to the min-url winner
    assert "https://h.test/a" in urls and "https://h.test/b" not in urls


def test_duplicate_count_matches_what_dedup_drops(spark):
    """A2 tally must equal rows-in minus rows-out of canonical_dedup —
    countDistinct's NULL exclusion made it disagree whenever a NULL
    canonical existed."""
    df = _parsed(spark)
    dropped = df.count() - canonical_dedup(df).count()
    assert duplicate_count(df) == dropped == 1


def test_rollup_fold_batch_idempotent(spark, tmp_path):
    from netrunner_spark.operators.rollup import RollupTable
    from netrunner_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    ru = RollupTable(cat, "ru")
    ev = spark.createDataFrame(
        [(1, "a", "2026-01-01 00:30:00", 1.5), (2, "a", "2026-01-01 01:30:00", 2.5)],
        "event_id long, event_type string, ts string, value double",
    )
    assert ru.fold_batch(ev, "batch_0") == "built"
    assert ru.fold_batch(ev, "batch_0") == "skipped"  # replay
    assert ru.fold_batch(ev, "batch_1") == "appended"
    got = {r["bucket"]: r["cnt"] for r in ru.read().collect()}
    assert list(got.values()) == [2, 2]  # both buckets folded twice
    # stats ledger records exact per-slice event counts (now derived
    # from the written partial, not a second delta scan)
    stats = {r["slice"]: r["n_events"] for r in cat.read("ru_stats").collect()}
    assert stats == {0: 2, 1: 2}
