"""WARC 1.1 interchange: export job (K3) + reader (S10).

From-scratch minimal WARC implementation (no warcio in the sandbox).
Reference behavior being matched (not copied): one ``response`` record
per page whose block is an HTTP/1.1-style status line + ``k: v`` header
lines + blank line + body (archive.rs:238-246); WARC headers carry
record-id, RFC3339 date, target-URI, content-length (archive.rs:192-232);
the whole file is gzip'd (archive.rs:152-190). The reader re-derives
(status, headers, content) by splitting the block (parse_body,
archive.rs:85-107).

Divergences (documented): record-id is uuid5(url) — deterministic where
the reference uses uuid4 (archive.rs:205) — and the export writes one
``part-<n>.warc.gz`` per partition (a distributed export, not a single
file; pass ``single_file=True`` for the reference's one-file layout).

Export runs in ``mapInPandas`` (side-effect file writes per partition +
a returned manifest row per file) — the Spark-idiomatic foreachPartition
shape with an auditable result.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WARC_VERSION = "WARC/1.1"
_DATE = "2024-01-01T00:00:00Z"  # deterministic export stamp (no Date.now in plans)


def _record_bytes(url: str, status: int, headers: list, content: str) -> bytes:
    http_lines = [f"HTTP/1.1 {status} OK"]
    if headers is None:
        headers = []
    for h in headers:
        name = h["name"] if isinstance(h, dict) else h.name
        value = h["value"] if isinstance(h, dict) else h.value
        http_lines.append(f"{name}: {value}")
    block = ("\n".join(http_lines) + "\n\n" + (content or "")).encode("utf-8")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, url)
    warc_headers = (
        f"{WARC_VERSION}\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {_DATE}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: text/html\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("utf-8")
    return warc_headers + block + b"\r\n\r\n"


MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_skipped", T.LongType()),
        T.StructField("bytes_written", T.LongType()),
        # A6 compression accounting (archive.rs:160-187 logs
        # before/after bytes and the % saved)
        T.StructField("bytes_raw", T.LongType()),
        T.StructField("compression_ratio", T.DoubleType()),
    ]
)


def warc_export(records: DataFrame, out_dir: str, single_file: bool = False) -> DataFrame:
    """records(url, status, headers, content) → gzip'd WARC files.

    Returns the manifest DataFrame (materialize it to run the export).
    """
    os.makedirs(out_dir, exist_ok=True)
    if single_file:
        records = records.coalesce(1)

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:

        buf = io.BytesIO()
        gz = gzip.GzipFile(fileobj=buf, mode="wb", mtime=0)
        n = skipped = raw = 0
        first_url = None
        for pdf in batches:
            for _, row in pdf.iterrows():
                # connection-failure cache rows carry status NULL (the
                # schema allows it) — there is no HTTP response to
                # archive, so skip them instead of crashing on int(None)
                if row["status"] is None or pd.isna(row["status"]):
                    skipped += 1
                    continue
                if first_url is None:
                    first_url = row["url"]
                rec = _record_bytes(
                    row["url"], int(row["status"]), row["headers"], row["content"]
                )
                raw += len(rec)
                gz.write(rec)
                n += 1
        gz.close()
        if n == 0:
            yield pd.DataFrame(columns=[f.name for f in MANIFEST_SCHEMA.fields])
            return
        # deterministic per-partition name: first record's url + count
        # + PARTITION ID — without the id two partitions opening with
        # the same duplicate URL and equal counts collide and silently
        # overwrite each other's file (r5 review)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        tag = uuid.uuid5(
            uuid.NAMESPACE_URL, f"{first_url}|{n}|{pid}"
        ).hex[:12]
        path = os.path.join(out_dir, f"part-{tag}.warc.gz")
        data = buf.getvalue()
        with open(path, "wb") as f:
            f.write(data)
        yield pd.DataFrame(
            [
                {
                    "path": path,
                    "n_records": n,
                    "n_skipped": skipped,
                    "bytes_written": len(data),
                    "bytes_raw": raw,
                    "compression_ratio": round(len(data) / raw, 6) if raw else None,
                }
            ]
        )

    return records.select("url", "status", "headers", "content").mapInPandas(
        write, MANIFEST_SCHEMA
    )


# ----------------------------------------------------------------- reader
def parse_warc_bytes(data: bytes, non_utf8: str = "drop") -> list[dict]:
    """gzip'd (or raw) WARC bytes → [{url, status, headers, content}].

    Records are delimited by the Content-Length written in their own
    WARC header — NOT by scanning for the version string, so a page
    body that itself contains 'WARC/1.1' reads back intact.

    Non-UTF-8 policy (pinned, VERDICT r4 #8): a record whose HTTP block
    is not valid UTF-8 is DROPPED by default — exact parity with the
    reference, which silently skips such records on archive read
    (``if let Ok(body) = String::from_utf8(...)``, archive.rs:137).
    ``non_utf8="replace"`` keeps them with U+FFFD substitution instead
    (the fetch-path convention) for pipelines that must not lose rows.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    records = []
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", errors="replace")
        if not head.startswith("WARC/"):
            break  # malformed stream: stop rather than misparse
        url, clen = None, 0
        for line in head.split("\r\n")[1:]:
            key, _, val = line.partition(":")
            key = key.strip().lower()
            if key == "warc-target-uri":
                url = val.strip()
            elif key == "content-length":
                try:
                    clen = int(val.strip())
                except ValueError:
                    clen = 0
        block_bytes = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen + 4  # skip the \r\n\r\n record separator
        try:
            block = block_bytes.decode("utf-8")
        except UnicodeDecodeError:
            if non_utf8 == "drop":
                continue  # reference parity: skip the record
            block = block_bytes.decode("utf-8", errors="replace")
        # block = status line + header lines + BLANK LINE + body: split
        # on the first blank line FIRST (an empty header section would
        # otherwise swallow the body into the header part)
        http_head, _, content = block.partition("\n\n")
        status_line, _, header_part = http_head.partition("\n")
        try:
            status = int(status_line.split(" ")[1])
        except (IndexError, ValueError):
            status = 0
        headers = []
        for line in header_part.splitlines():
            if ": " in line:
                k, v = line.split(": ", 1)
                headers.append({"name": k, "value": v})
        records.append(
            {"url": url, "status": status, "headers": headers, "content": content}
        )
    return records


RECORD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("content", T.StringType()),
    ]
)


def warc_read(spark, path: str, non_utf8: str = "drop") -> DataFrame:
    """Directory (or glob) of .warc.gz → records DataFrame.

    binaryFile source streams each file to one task; parse happens
    batch-wise in mapInPandas (S10). ``non_utf8``: see
    ``parse_warc_bytes`` (default drops non-UTF-8 records, reference
    parity archive.rs:137).
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                rows.extend(
                    parse_warc_bytes(bytes(row["content"]), non_utf8=non_utf8)
                )
            yield pd.DataFrame(
                rows, columns=["url", "status", "headers", "content"]
            )

    return files.select("content").mapInPandas(parse, RECORD_SCHEMA)
