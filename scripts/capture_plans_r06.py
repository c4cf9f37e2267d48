#!/usr/bin/env python
"""Capture .explain("formatted") for the r6-touched queries.

Usage: python scripts/capture_plans_r06.py <repo_root> <suffix> [name ...]
Writes plans/r06/<query>_<suffix>.txt under THIS repo (cwd repo), while
importing the engine from <repo_root> (a git worktree of the round-start
commit for the "before" pass, the live tree for "after").
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

HERE = "/root/repo"
ROOT = sys.argv[1]
SUFFIX = sys.argv[2]
NAMES = sys.argv[3:]

sys.path.insert(0, ROOT)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOUCHED = [
    # token n-gram family (zip_with gram fold)
    "repetition_signals",
    "benchmark_contamination",
    "winnow_dups",
    "dup_spans",
    "duplicate_spans",
    # gram_hash unroll consumers
    "minhash_lsh",
    "minhash_lsh_capped",
    "simhash",
    "hamming_near_dups",
    # semdedup numpy pairing + centroid checkpoint
    "semdedup_prune",
    # connected-components trims
    "dedup_clusters",
    "dup_cluster_size_hist",
    "text_dedup_savings",
    "soft_dedup_weights",
    "curation_pipeline",
    "dup_source_matrix",
    "image_canonical_pairs",
    "image_curation_pipeline",
    "image_dedup_savings",
    "embedding_dedup_clusters",
    "dedup_eval",
]


def main() -> None:
    names = NAMES or TOUCHED
    from netrunner_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plans_r06", master="local[8]")
    qs = entry_mod.queries()
    out_dir = os.path.join(HERE, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, SUFFIX, flush=True)


if __name__ == "__main__":
    main()
