#!/usr/bin/env python
"""Package ``netrunner_spark`` for ``spark-submit --py-files``.

The north_rule runs the drain "via spark-submit --py-files on a
multi-executor cluster"; this builds the artifact that ships the engine
to executors: a single zip with the package at its root, importable on
every executor's PYTHONPATH.

    python scripts/make_pyfiles.py [out.zip]   # default dist/netrunner_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "netrunner_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "netrunner_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                path = os.path.join(root, name)
                arc = os.path.relpath(path, REPO)
                zf.write(path, arc)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
