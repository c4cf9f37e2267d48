"""North_rule execution mode: the drain runs via ``spark-submit
--py-files`` with the engine shipped as a zip (no repo on sys.path) —
the same invocation a real N/4N-executor cluster uses, with only the
--master changing.

Covers: scripts/make_pyfiles.py (artifact), scripts/submit_drain.py
(jobfile). The subprocess runs from a temp cwd so the derby metastore /
spark-warehouse of the test session are untouched and the zip must be
self-contained.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_selfcontained(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    out = build(str(tmp_path / "netrunner_spark.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "netrunner_spark/__init__.py" in names
    assert "netrunner_spark/plans/crawl.py" in names
    assert all(n.endswith(".py") for n in names)  # no caches/data in the artifact


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_submit_drain_via_spark_submit(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "netrunner_spark.zip"))
    lake = str(tmp_path / "lake")
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_drain.py"),
            "--hosts",
            "3",
            "--pages",
            "20",
            "--mode",
            "pairs",
            "--buckets",
            "4",
            "--lake",
            lake,
        ],
        cwd=str(tmp_path),  # keeps derby/spark-warehouse off the repo; zip must carry the engine
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"metric"')][-1]
    stats = json.loads(line)
    assert stats["metric"] == "submit_drain"
    assert stats["master"] == "local[4]"
    # synthetic web has robots-blocked hosts + permanent-fail URLs by
    # design; the drain caches the fetchable subset
    assert 0 < stats["urls"] <= 3 * 20
    assert stats["rounds"] >= 1
    # the lake the submitted app wrote is readable back (resume surface)
    assert os.path.isdir(os.path.join(lake, "cache"))
