"""Snapshot-versioned table catalog — the Iceberg stand-in.

The north_rule targets Iceberg tables (MERGE cache keyed by url_hash,
per-round frontier/bloom/metrics checkpoints, snapshot-based resume).
Iceberg jars are not available in this sandbox, so this module provides
the same contract over plain parquet with atomic snapshot pointers:

    <root>/<table>/snap-<version>/part-*.parquet
    <root>/<table>/_latest            # text file: committed version

Writes go to a new ``snap-N`` directory first; the ``_latest`` pointer
is flipped last via atomic rename — a killed job never observes a
half-written snapshot, which is exactly the resume guarantee we need
(reference analog: per-URL RON cache files, crawler.rs:140-152 /
urls.txt checkpoint, mod.rs:121-128). On a real cluster, swap this
class for an Iceberg catalog; call sites only use read/write/merge.

MERGE semantics (K2): new rows win over existing rows with the same
key — replaces the reference's first-wins file dedup (mod.rs:177-208)
with deterministic last-write-wins keyed upserts.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- plumbing
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_latest")

    def version(self, table: str) -> int | None:
        """Committed snapshot version, or None if the table doesn't exist."""
        try:
            with open(self._pointer(table), encoding="utf-8") as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self, table: str) -> bool:
        return self.version(table) is not None

    def snapshot_path(self, table: str, version: int | None = None) -> str:
        v = self.version(table) if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        return os.path.join(self._tdir(table), f"snap-{v}")

    def _commit(self, table: str, version: int) -> None:
        tmp = self._pointer(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(table))  # atomic on POSIX

    # ------------------------------------------------------------------ API
    def read(self, table: str, version: int | None = None) -> DataFrame:
        df = self.spark.read.parquet(self.snapshot_path(table, version))
        # bucketed layout column is physical, not logical — hide it
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        bucket_hint: str | None = None,
    ) -> int:
        """Write a new snapshot; returns committed version.

        ``bucket_hint``: column to hash-repartition on before writing —
        the local-mode analog of Iceberg ``bucket(N, col)`` layout, so a
        downstream key-equi join/merge reads co-located files (cache is
        bucketed by host/url_hash per SURVEY.md §4 item 3).
        """
        cur = self.version(table)
        new = 1 if cur is None else cur + 1
        path = os.path.join(self._tdir(table), f"snap-{new}")
        if bucket_hint is not None:
            df = df.repartition(F.col(bucket_hint))
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        # a plain write produces an UNBUCKETED snapshot: stale _buckets
        # metadata from an earlier write_bucketed would make the next
        # keyed merge treat this snapshot as bucket-laid-out, find zero
        # bucket dirs, and silently drop every existing row
        try:
            os.remove(self._bucket_meta_path(table))
        except FileNotFoundError:
            pass
        self._commit(table, new)
        return new

    def write_slice(self, df: DataFrame, table: str, slice_col: str, slice_val) -> None:
        """Append-style write of one slice (Iceberg append-snapshot
        analog): data lands in ``<table>/data/<slice_col>=<val>`` and is
        OVERWRITTEN on replay — so a crashed-and-resumed round commits
        exactly-once without rewriting the rest of the table (the O(R²)
        full-table MERGE is gone; read_slices unions all slices via
        parquet partition discovery)."""
        base = os.path.join(self._tdir(table), "data")
        path = os.path.join(base, f"{slice_col}={slice_val}")
        df.drop(slice_col).write.mode("overwrite").parquet(path)

    def read_slice(self, table: str, slice_col: str, slice_val) -> DataFrame:
        """One committed slice (no partition column attached)."""
        path = os.path.join(self._tdir(table), "data", f"{slice_col}={slice_val}")
        return self.spark.read.parquet(path)

    # ------------------------------------------------- partitioned snapshots
    def partition_values(self, table: str, part_col: str) -> list[int]:
        """Committed partition values of a hive-partitioned snapshot —
        driver-side listdir, ZERO Spark jobs (the round loop's
        "how many rounds" question must not cost a job)."""
        try:
            snap = self.snapshot_path(table)
        except FileNotFoundError:
            return []
        return sorted(
            int(e.name.split("=", 1)[1])
            for e in os.scandir(snap)
            if e.is_dir() and e.name.startswith(f"{part_col}=")
        )

    def read_partition(self, table: str, part_col: str, val) -> DataFrame:
        """One partition of a snapshot, read by DIRECT PATH — skips the
        full partition-discovery listing a filter-on-read would do every
        round (the partition column is not attached; the caller knows it)."""
        return self.spark.read.parquet(
            os.path.join(self.snapshot_path(table), f"{part_col}={val}")
        )

    def partition_bytes(self, table: str, part_col: str, val) -> int:
        """On-disk bytes of one snapshot partition (driver stat, no job)
        — used to pick broadcast vs shuffle join for the round batch.
        0 when the table has no snapshot (streaming-only crawls have no
        ``schedule`` table at all — partition_values already returns []
        for that case, r5 review)."""
        try:
            snap = self.snapshot_path(table)
        except FileNotFoundError:
            return 0
        d = os.path.join(snap, f"{part_col}={val}")
        if not os.path.isdir(d):
            return 0
        return sum(
            e.stat().st_size for e in os.scandir(d) if e.name.endswith(".parquet")
        )

    def append_partitions(self, df: DataFrame, table: str, part_col: str) -> None:
        """Append whole NEW partitions into a slice-tree table
        (``<table>/data/<part_col>=v``) in one job. Dynamic partition
        overwrite keeps a replayed append idempotent: only the
        partitions in ``df`` are replaced."""
        base = os.path.join(self._tdir(table), "data")
        (
            df.write.partitionBy(part_col)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(base)
        )

    def mark_slices_committed(self, table: str, slice_col: str, vals) -> None:
        """Stamp the per-slice ``_SUCCESS`` markers after a BATCHED
        multi-partition write (``append_partitions``): Spark's
        committer emits one marker at the table root for such a write,
        but the slice protocol (``slice_committed``) is per-dir.
        Written after the data commit, so the crash window matches
        ``write_slice`` exactly: data present + marker missing ⇒ the
        slice is replayed."""
        base = os.path.join(self._tdir(table), "data")
        for v in vals:
            d = os.path.join(base, f"{slice_col}={v}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "_SUCCESS"), "w"):
                pass

    def read_slices(self, table: str) -> DataFrame | None:
        """All rows of a slice-tree table: the compacted base snapshot
        (if ``compact_slices`` has run) plus every slice ABOVE the
        compaction floor. Slices at/below the floor are excluded even if
        their directories still exist (crash between snapshot commit and
        slice deletion) — the snapshot is authoritative below the floor,
        so the union stays duplicate-free."""
        base = os.path.join(self._tdir(table), "data")
        meta = self.compact_meta(table)
        tail = None
        if os.path.isdir(base) and any(e.is_dir() for e in os.scandir(base)):
            tail = self.spark.read.option("basePath", base).parquet(base)
            if meta is not None:
                tail = tail.filter(F.col(meta["slice_col"]) > meta["upto"])
        if meta is not None and self.exists(table):
            # bound the head to the COMMITTED floor: compact_slices commits
            # the merged snapshot before it updates _compacted, so a crash
            # between the two leaves freshly folded rows (slice_col > stale
            # floor) in the head AND their slices on disk above the floor —
            # the filter excludes exactly those head rows, keeping the
            # union duplicate-free through the crash window (ADVICE r4)
            head = self.read(table).filter(F.col(meta["slice_col"]) <= meta["upto"])
            return head if tail is None else head.unionByName(tail)
        return tail

    def slice_exists(self, table: str, slice_col: str, slice_val) -> bool:
        path = os.path.join(self._tdir(table), "data", f"{slice_col}={slice_val}")
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )

    def slice_committed(self, table: str, slice_col: str, slice_val) -> bool:
        """True iff the slice write COMPLETED (Spark's _SUCCESS marker) —
        a crash mid-write leaves part files but no marker; such a slice
        must be replayed, not trusted."""
        path = os.path.join(self._tdir(table), "data", f"{slice_col}={slice_val}")
        return os.path.isfile(os.path.join(path, "_SUCCESS"))

    def max_committed_slice(self, table: str, slice_col: str) -> int | None:
        vals = [
            v
            for v in (self._slice_values(table, slice_col) or [])
            if self.slice_committed(table, slice_col, v)
        ]
        # the compaction floor stands in for deleted slice markers —
        # rounds folded into the base snapshot were all committed (W4
        # resume must not replay them)
        floor = self.compacted_upto(table, slice_col)
        if floor is not None:
            vals.append(floor)
        return max(vals) if vals else None

    def _slice_values(self, table: str, slice_col: str) -> list[int]:
        base = os.path.join(self._tdir(table), "data")
        if not os.path.isdir(base):
            return []
        return [
            int(e.name.split("=", 1)[1])
            for e in os.scandir(base)
            if e.is_dir() and e.name.startswith(f"{slice_col}=")
        ]

    def slice_bytes(self, table: str, slice_col: str, slice_val) -> int:
        """On-disk bytes of one slice (driver stat, no job)."""
        d = os.path.join(self._tdir(table), "data", f"{slice_col}={slice_val}")
        if not os.path.isdir(d):
            return 0
        return sum(
            e.stat().st_size for e in os.scandir(d) if e.name.endswith(".parquet")
        )

    def max_slice(self, table: str, slice_col: str) -> int | None:
        base = os.path.join(self._tdir(table), "data")
        if not os.path.isdir(base):
            return None
        vals = [
            int(e.name.split("=", 1)[1])
            for e in os.scandir(base)
            if e.is_dir() and e.name.startswith(f"{slice_col}=")
        ]
        return max(vals) if vals else None

    # ----------------------------------------- Spark-native bucketed tables
    # (the co-located-join layout: two tables bucketBy'd on the same key
    # with the same bucket count join with ZERO exchanges and no
    # driver-built broadcast relation — the local-mode twin of Iceberg
    # ``bucket(N, key)`` storage-partitioned joins on a cluster)

    def table_name(self, table: str) -> str:
        """Session-catalog name, unique per (lake root, table)."""
        tag = hashlib.md5(self.root.encode()).hexdigest()[:8]
        return f"nrtbl_{tag}_{table}"

    def _table_meta_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_table_meta")

    def table_meta(self, table: str) -> dict | None:
        try:
            with open(self._table_meta_path(table), encoding="utf-8") as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def write_table_bucketed(
        self,
        df: DataFrame,
        table: str,
        key: str,
        n_buckets: int,
        partition_by: list[str] | None = None,
        provenance: dict | None = None,
    ) -> None:
        """Write ``df`` as a Spark bucketed+sorted table. The pre-write
        ``repartition(n_buckets, key)`` uses the same murmur3 pmod as the
        bucketing spec, so every task holds exactly one bucket → ONE file
        per (partition, bucket) → no extra sort in downstream merge joins.
        Metadata (schema DDL, bucket spec) is persisted so a NEW session
        can re-register the table for resume (W4)."""
        name = self.table_name(table)
        path = os.path.join(self._tdir(table), "bucketed")
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(path, ignore_errors=True)
        writer = (
            df.repartition(n_buckets, F.col(key))
            .write.format("parquet")
            .mode("overwrite")
            .option("path", path)
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.bucketBy(n_buckets, key).sortBy(key).saveAsTable(name)
        meta = {
            "name": name,
            "key": key,
            "n_buckets": n_buckets,
            "partition_by": partition_by or [],
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in df.schema.fields
            ],
            # caller-supplied source identity (e.g. row count + key xor):
            # lets reuse checks reject a stale/mismatched pre-seeded
            # layout instead of silently crawling the wrong corpus
            "provenance": provenance,
        }
        tmp = self._table_meta_path(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        os.replace(tmp, self._table_meta_path(table))

    def read_table(self, table: str) -> DataFrame:
        """Catalog-backed read of a bucketed table (a direct parquet path
        read would DROP the bucketing metadata and reintroduce shuffles).
        Re-registers from persisted metadata when the session is new."""
        meta = self.table_meta(table)
        if meta is None:
            raise FileNotFoundError(f"no bucketed table {table!r}")
        # derive from the CURRENT root, not the persisted name: a lake
        # seeded by copying/hardlinking another lake's table dirs (e.g.
        # a pre-bucketed store template) must register under ITS name,
        # or two lakes sharing a template would collide in the session
        # catalog and read each other's (possibly deleted) paths
        name = self.table_name(table)
        if not self.spark.catalog.tableExists(name):
            path = os.path.join(self._tdir(table), "bucketed")
            # keep the PERSISTED column order — partition dirs nest in
            # write order, so sorting here would make recoverPartitions
            # walk a tree that doesn't exist for any multi-column spec
            # (r5 review; latent — all current callers pass one column)
            parts = list(meta["partition_by"])
            cols = ", ".join(
                f"`{c['name']}` {c['type']}" for c in meta["columns"]
            )
            stmt = f"CREATE TABLE {name} ({cols}) USING parquet "
            if parts:
                stmt += f"PARTITIONED BY ({', '.join(parts)}) "
            stmt += (
                f"CLUSTERED BY ({meta['key']}) SORTED BY ({meta['key']}) "
                f"INTO {meta['n_buckets']} BUCKETS LOCATION '{path}'"
            )
            self.spark.sql(stmt)
            if parts:
                self.spark.catalog.recoverPartitions(name)
        return self.spark.table(name)

    def table_partition_bytes(self, table: str, part_col: str, val) -> int:
        """On-disk bytes of one partition of a BUCKETED table (driver
        stat, no job) — the broadcast-vs-merge dial for colocated
        rounds."""
        d = os.path.join(self._tdir(table), "bucketed", f"{part_col}={val}")
        if not os.path.isdir(d):
            return 0
        return sum(
            e.stat().st_size for e in os.scandir(d) if e.name.endswith(".parquet")
        )

    def table_partition_values(self, table: str, part_col: str) -> list[int]:
        """Partition values of a bucketed table — driver-side listdir."""
        base = os.path.join(self._tdir(table), "bucketed")
        if not os.path.isdir(base):
            return []
        return sorted(
            int(e.name.split("=", 1)[1])
            for e in os.scandir(base)
            if e.is_dir() and e.name.startswith(f"{part_col}=")
        )

    # ------------------------------------------------------------- markers
    def set_marker(self, table: str, name: str) -> None:
        """Durable driver-side marker (atomic create) — records that a
        non-table side effect tied to ``table`` completed, e.g. that a
        round's link expansion ran (W4 exactly-once)."""
        d = self._tdir(table)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".marker-tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8"):
            pass
        os.replace(tmp, os.path.join(d, f"_marker-{name}"))

    def has_marker(self, table: str, name: str) -> bool:
        return os.path.isfile(os.path.join(self._tdir(table), f"_marker-{name}"))

    # --------------------------------------------------- bucketed merge (K2)
    def _bucket_meta_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_buckets")

    def bucket_meta(self, table: str) -> dict | None:
        try:
            with open(self._bucket_meta_path(table), encoding="utf-8") as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    @staticmethod
    def _bucket_expr(keys: list[str], n_buckets: int):
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))

    def write_bucketed(
        self, df: DataFrame, table: str, key: str | list[str], n_buckets: int = 64
    ) -> int:
        """Snapshot write with an explicit Iceberg-style ``bucket(N, key)``
        layout: rows land under ``snap-V/_bucket=k`` with
        k = pmod(xxhash64(key), N). This is what makes ``merge`` touch
        O(affected buckets) instead of O(table)."""
        keys = [key] if isinstance(key, str) else list(key)
        cur = self.version(table)
        new = 1 if cur is None else cur + 1
        path = os.path.join(self._tdir(table), f"snap-{new}")
        out = df.withColumn(BUCKET_COL, self._bucket_expr(keys, n_buckets))
        out.repartition(F.col(BUCKET_COL)).write.mode("overwrite").partitionBy(
            BUCKET_COL
        ).parquet(path)
        tmp = self._bucket_meta_path(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"n_buckets": n_buckets, "key": keys}, f)
        os.replace(tmp, self._bucket_meta_path(table))
        self._commit(table, new)
        return new

    def read_bucketed(self, table: str, version: int | None = None) -> DataFrame:
        """Read a bucketed snapshot WITHOUT the layout column."""
        return (
            self.spark.read.option("basePath", self.snapshot_path(table, version))
            .parquet(self.snapshot_path(table, version))
            .drop(BUCKET_COL)
        )

    def merge(
        self,
        df: DataFrame,
        table: str,
        key: str | list[str],
        bucket_hint: str | None = None,
    ) -> int:
        """MERGE INTO: upsert by key, new rows win (K2 semantics,
        replacing the reference's first-wins file dedup mod.rs:177-208).

        Bucket-wise when the table has a bucketed layout
        (``write_bucketed``): only the buckets containing incoming keys
        are rewritten — one Spark job over O(affected buckets) of old
        data — and every untouched bucket's files are HARDLINKED from
        the previous snapshot (zero copy, the parquet analog of Iceberg
        reusing unchanged manifests). A 2-bucket upsert against a
        10^10-row 64-bucket cache reads/writes 2/64ths of it.
        Falls back to the O(table) rewrite for unbucketed tables."""
        keys = [key] if isinstance(key, str) else list(key)
        meta = self.bucket_meta(table)
        if meta is not None and self.exists(table):
            # defense-in-depth vs stale metadata: the bucket-wise path
            # is only valid if the CURRENT snapshot really has the
            # layout (at least one _bucket=* dir)
            snap = self.snapshot_path(table)
            has_layout = any(
                e.is_dir() and e.name.startswith(f"{BUCKET_COL}=")
                for e in os.scandir(snap)
            )
            if not has_layout:
                meta = None
        if meta is None or not self.exists(table) or meta.get("key") != keys:
            if self.exists(table):
                old = self.read(table)
                keep = old.join(
                    df.select(*keys).dropDuplicates(keys), keys, "left_anti"
                )
                merged = keep.unionByName(df.dropDuplicates(keys))
            else:
                merged = df.dropDuplicates(keys)
            return self.write(merged, table, bucket_hint=bucket_hint)

        n_buckets = int(meta["n_buckets"])
        incoming = df.dropDuplicates(keys).withColumn(
            BUCKET_COL, self._bucket_expr(keys, n_buckets)
        )
        # affected buckets: ≤ n_buckets values — driver-safe collect
        affected = sorted(
            r[0] for r in incoming.select(BUCKET_COL).distinct().collect()
        )
        cur = self.version(table)
        old_snap = self.snapshot_path(table, cur)
        new = cur + 1
        new_snap = os.path.join(self._tdir(table), f"snap-{new}")
        if os.path.isdir(new_snap):
            # uncommitted leftover (crashed merge, or a rollback left a
            # higher snap dir behind): the pointer still references cur,
            # so the dir is garbage. It MUST be cleared here — the
            # empty-``affected`` path below runs no overwrite job, and
            # the hardlink loop would otherwise commit the stale files
            # alongside the old buckets' (silent duplicate keys).
            shutil.rmtree(new_snap)
        os.makedirs(new_snap, exist_ok=True)

        if affected:
            old_paths = [
                p
                for b in affected
                if os.path.isdir(p := os.path.join(old_snap, f"{BUCKET_COL}={b}"))
            ]
            if old_paths:
                old_rows = self.spark.read.option("basePath", old_snap).parquet(
                    *old_paths
                )
                keep = old_rows.join(
                    incoming.select(*keys).dropDuplicates(keys), keys, "left_anti"
                )
                merged = keep.unionByName(incoming.select(*old_rows.columns))
            else:
                merged = incoming
            merged.repartition(F.col(BUCKET_COL)).write.mode(
                "overwrite"
            ).partitionBy(BUCKET_COL).parquet(new_snap)

        # untouched buckets: hardlink every file from the old snapshot
        affected_set = {f"{BUCKET_COL}={b}" for b in affected}
        for entry in os.scandir(old_snap):
            if not entry.is_dir() or not entry.name.startswith(f"{BUCKET_COL}="):
                continue
            if entry.name in affected_set:
                continue
            dst_dir = os.path.join(new_snap, entry.name)
            os.makedirs(dst_dir, exist_ok=True)
            for f_ in os.scandir(entry.path):
                if f_.is_file() and not f_.name.startswith("_"):
                    dst = os.path.join(dst_dir, f_.name)
                    if not os.path.exists(dst):
                        os.link(f_.path, dst)
        self._commit(table, new)
        return new

    # ------------------------------------------------- slice-tree compaction
    def _compact_meta_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_compacted")

    def compact_meta(self, table: str) -> dict | None:
        try:
            with open(self._compact_meta_path(table), encoding="utf-8") as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def compacted_upto(self, table: str, slice_col: str) -> int | None:
        meta = self.compact_meta(table)
        if meta is not None and meta.get("slice_col") == slice_col:
            return int(meta["upto"])
        return None

    def compact_slices(
        self,
        table: str,
        slice_col: str,
        key: str | list[str],
        n_buckets: int = 64,
        upto: int | None = None,
    ) -> int | None:
        """Fold committed slices ≤ ``upto`` (default: all committed) into
        ONE bucketed base snapshot (VERDICT r3 #10): a months-long crawl
        otherwise grows one ``<slice_col>=r`` directory per round forever,
        and every ``read_slices`` pays the ever-longer file listing.
        Incremental — a second compaction bucket-wise-MERGEs the new
        slices into the existing snapshot (only affected buckets rewritten,
        untouched ones hardlinked), so each round's rows are rewritten
        O(1) times, not O(rounds).

        If the same key appears in several slices, the HIGHEST slice
        value wins (K2 new-rows-win, matching ``merge``); the slice
        column survives as an ordinary data column, so per-row lineage
        (e.g. frontier materialization's ``round``) is preserved.

        Crash-safe ordering: snapshot + floor commit BEFORE slice
        deletion; ``read_slices`` excludes slices at/below the floor, so
        a crash between the two steps never double-counts, and replaying
        the compaction just re-deletes."""
        keys = [key] if isinstance(key, str) else list(key)
        committed = sorted(
            v
            for v in self._slice_values(table, slice_col)
            if self.slice_committed(table, slice_col, v)
        )
        base_dir = os.path.join(self._tdir(table), "data")
        floor = self.compacted_upto(table, slice_col)
        if floor is not None:
            # heal a crash between floor commit and slice deletion:
            # slices at/below the floor are already in the snapshot
            # (read_slices ignores them) — just re-delete
            for v in [v for v in committed if v <= floor]:
                shutil.rmtree(
                    os.path.join(base_dir, f"{slice_col}={v}"), ignore_errors=True
                )
            committed = [v for v in committed if v > floor]
        if upto is not None:
            committed = [v for v in committed if v <= upto]
        if not committed:
            return None
        hi = max(committed)
        df = self.spark.read.option("basePath", base_dir).parquet(
            *[os.path.join(base_dir, f"{slice_col}={v}") for v in committed]
        )
        # highest-slice-wins dedup BEFORE the merge (merge's own
        # dropDuplicates would pick an arbitrary row among rounds)
        w = Window.partitionBy(*keys).orderBy(F.col(slice_col).desc())
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if self.exists(table):
            self.merge(df, table, key=keys)
        else:
            self.write_bucketed(df, table, key=keys, n_buckets=n_buckets)
        tmp = self._compact_meta_path(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"slice_col": slice_col, "upto": hi}, f)
        os.replace(tmp, self._compact_meta_path(table))
        for v in committed:
            shutil.rmtree(
                os.path.join(base_dir, f"{slice_col}={v}"), ignore_errors=True
            )
        self.vacuum(table)
        return hi

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)

    def rollback(self, table: str, version: int) -> None:
        """Point _latest at an earlier snapshot (resume-from-checkpoint)."""
        if not os.path.isdir(os.path.join(self._tdir(table), f"snap-{version}")):
            raise FileNotFoundError(f"{table} snap-{version} missing")
        self._commit(table, version)

    def vacuum(self, table: str, keep_last: int = 2) -> None:
        """Drop snapshots older than the last ``keep_last`` (bounded disk)."""
        cur = self.version(table)
        if cur is None:
            return
        tdir = self._tdir(table)
        for name in os.listdir(tdir):
            if name.startswith("snap-"):
                v = int(name.split("-", 1)[1])
                if v <= cur - keep_last:
                    shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)
