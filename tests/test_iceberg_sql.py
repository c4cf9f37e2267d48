"""Golden tests for the Iceberg facade's generated SQL (r3 verdict
item 5): the sandbox has no Iceberg jars, so the statements the facade
emits (CREATE NAMESPACE / MERGE INTO / rollback CALL / snapshot query /
DROP) would otherwise never be checked at all. Three layers, none
skipped:

  1. golden strings — a refactor can't silently change the emitted SQL;
  2. the stock Spark parser accepts every statement (syntax pinned —
     Spark 4.1 parses MERGE INTO and CALL without Iceberg extensions);
  3. wiring — each catalog method executes EXACTLY the builder's output
     (recorded through a stub session), so the goldens govern the real
     calls, not a parallel copy of the strings.

The semantic contract itself still runs via tests/test_catalog_contract
when a runtime is present (skip-gated)."""

from __future__ import annotations

import pytest

from netrunner_spark.iceberg import (
    IcebergCatalog,
    create_namespace_sql,
    current_snapshot_sql,
    drop_sql,
    expire_snapshots_sql,
    insert_overwrite_slice_sql,
    merge_sql,
    rewrite_data_files_sql,
    rollback_sql,
)

GOLDENS = {
    "create_namespace": (
        create_namespace_sql("nrlake", "nr"),
        "CREATE NAMESPACE IF NOT EXISTS nrlake.nr",
    ),
    "current_snapshot": (
        current_snapshot_sql("nrlake.nr.cache"),
        "SELECT snapshot_id FROM nrlake.nr.cache.history "
        "WHERE is_current_ancestor ORDER BY made_current_at DESC LIMIT 1",
    ),
    "merge_single_key": (
        merge_sql("nrlake.nr.cache", "_nr_merge_src_cache", ["url_hash"]),
        "MERGE INTO nrlake.nr.cache t USING _nr_merge_src_cache s "
        "ON t.url_hash = s.url_hash "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    ),
    "merge_compound_key": (
        merge_sql("nrlake.nr.store", "v", ["url_hash", "host"]),
        "MERGE INTO nrlake.nr.store t USING v s "
        "ON t.url_hash = s.url_hash AND t.host = s.host "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    ),
    "rollback": (
        rollback_sql("nrlake", "nr", "cache", 42),
        "CALL nrlake.system.rollback_to_snapshot('nr.cache', 42)",
    ),
    "drop": (
        drop_sql("nrlake.nr.cache"),
        "DROP TABLE IF EXISTS nrlake.nr.cache",
    ),
    # r4 verdict item 6: the remaining LakeCatalog codepaths' twins
    "slice_overwrite": (
        insert_overwrite_slice_sql(
            "nrlake.nr.schedule_ext", "_nr_slice_src_schedule_ext",
            "sched_round", 7,
        ),
        "INSERT OVERWRITE nrlake.nr.schedule_ext "
        "PARTITION (sched_round = 7) "
        "SELECT * FROM _nr_slice_src_schedule_ext",
    ),
    "rewrite_data_files": (
        rewrite_data_files_sql("nrlake", "nr", "cache"),
        "CALL nrlake.system.rewrite_data_files(table => 'nr.cache')",
    ),
    "expire_snapshots": (
        expire_snapshots_sql("nrlake", "nr", "cache", 2),
        "CALL nrlake.system.expire_snapshots"
        "(table => 'nr.cache', retain_last => 2)",
    ),
}


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_sql_golden(name):
    got, want = GOLDENS[name]
    assert got == want


def test_sql_parses_with_stock_parser(spark):
    parser = spark._jsparkSession.sessionState().sqlParser()
    for name, (got, _) in GOLDENS.items():
        parser.parsePlan(got)  # raises ParseException on bad syntax


class _RecordingSpark:
    """Stub SparkSession capturing spark.sql() text."""

    def __init__(self):
        self.executed: list[str] = []

    def sql(self, text):
        self.executed.append(text)

        class _R:
            def first(self):
                return None

        return _R()


class _StubDF:
    def dropDuplicates(self, keys):
        return self

    def drop(self, *cols):
        return self

    def createOrReplaceTempView(self, name):
        pass


def _facade_with_recorder():
    cat = IcebergCatalog.__new__(IcebergCatalog)
    cat.spark = _RecordingSpark()
    cat.catalog, cat.db = "nrlake", "nr"
    return cat


def test_methods_execute_exactly_the_builders(monkeypatch):
    cat = _facade_with_recorder()
    # merge on an existing table
    monkeypatch.setattr(IcebergCatalog, "exists", lambda self, t: True)
    cat.merge(_StubDF(), "cache", "url_hash")
    cat.rollback("cache", 42)
    cat.drop("cache")
    cat.version("cache")
    assert cat.spark.executed == [
        merge_sql("nrlake.nr.cache", "_nr_merge_src_cache", ["url_hash"]),
        current_snapshot_sql("nrlake.nr.cache"),  # merge's return value
        rollback_sql("nrlake", "nr", "cache", 42),
        drop_sql("nrlake.nr.cache"),
        current_snapshot_sql("nrlake.nr.cache"),
    ]


def test_slice_append_and_compaction_wiring():
    """r4 verdict item 6: schedule_ext per-round appends and cache
    compaction execute exactly the pinned builders."""
    cat = _facade_with_recorder()
    cat.append_slice(_StubDF(), "schedule_ext", "sched_round", 7)
    cat.compact("cache", retain_last=2)
    assert cat.spark.executed == [
        insert_overwrite_slice_sql(
            "nrlake.nr.schedule_ext", "_nr_slice_src_schedule_ext",
            "sched_round", 7,
        ),
        rewrite_data_files_sql("nrlake", "nr", "cache"),
        expire_snapshots_sql("nrlake", "nr", "cache", 2),
    ]


def test_restore_after_partial_commit_wiring():
    """W4 crash recovery: a round that committed cache but died before
    metrics/bloom rolls EVERY checkpoint table back to the recorded
    pre-round snapshots — deterministic order, one rollback per table."""
    cat = _facade_with_recorder()
    cat.restore({"metrics": 11, "cache": 17, "bloom_shards": 5})
    assert cat.spark.executed == [
        rollback_sql("nrlake", "nr", "bloom_shards", 5),
        rollback_sql("nrlake", "nr", "cache", 17),
        rollback_sql("nrlake", "nr", "metrics", 11),
    ]


def test_slice_overwrite_quotes_string_values():
    """r5 review: an unquoted string slice value emitted invalid SQL
    (and a quote in the value could break out of the literal)."""
    got = insert_overwrite_slice_sql("nrlake.nr.t", "v", "day", "2026-08-20")
    assert "PARTITION (day = '2026-08-20')" in got
    got = insert_overwrite_slice_sql("nrlake.nr.t", "v", "day", "o'clock")
    assert "PARTITION (day = 'o''clock')" in got
    # ints stay bare (pinned by the golden above)
    assert "PARTITION (sched_round = 7)" in insert_overwrite_slice_sql(
        "nrlake.nr.schedule_ext", "_v", "sched_round", 7
    )
