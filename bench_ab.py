#!/usr/bin/env python
"""A/B config experiment harness (guide §1): run a subset of headline
queries under runtime-settable SQL-conf variants in ONE process (same
JVM, same JIT state), interleaved A/B/A/B so co-tenant noise hits all
variants equally. Reports per-query best per variant.

Usage: python bench_ab.py [query ...]      (default: a representative set)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# runtime-settable SQL confs only (same JVM)
VARIANTS: dict[str, dict[str, str]] = {
    "base": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "coalesce_shj": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
}

DEFAULT_QUERIES = [
    "link_pagerank",
    "seed_pagerank",
    "opic_importance",
    "web_bowtie",
    "dedup_clusters",
    "curation_pipeline",
    "soft_dedup_weights",
    "semdedup_prune",
    "ann_pq_topk",
    "repetition_signals",
    "winnow_dups",
    "benchmark_contamination",
    "source_quality_matrix",
    "template_cap_apply",
    "bm25_search",
    "phrase_search",
    "quality_mixture",
    "dedup_eval",
    "kmeans_cell_balance",
    "seed_distance",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from netrunner_spark.session import get_spark

    spark = get_spark("netrunner_ab", master=f"local[{CPUS}]")
    sc = spark.sparkContext

    names = sys.argv[1:] or DEFAULT_QUERIES
    qs = entry_mod.queries()
    reps = int(os.environ.get("AB_REPS", "2"))

    results: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in VARIANTS} for n in names
    }
    for rep in range(reps):
        for vname, confs in VARIANTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            for name in names:
                sc.setJobDescription(f"ab:{vname}:{name}:r{rep}")
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.count()
                results[name][vname].append(round(time.time() - t0, 3))

    print(f"\n{'query':34s}" + "".join(f"{v:>14s}" for v in VARIANTS))
    tots = {v: 0.0 for v in VARIANTS}
    for name in names:
        row = f"{name:34s}"
        for v in VARIANTS:
            best = min(results[name][v])
            tots[v] += best
            row += f"{best:14.3f}"
        print(row)
    print(f"{'TOTAL(best)':34s}" + "".join(f"{tots[v]:14.3f}" for v in VARIANTS))
    out = os.path.join(REPO, "BENCH", f"ab_{time.strftime('%H%M%S')}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(out)


if __name__ == "__main__":
    main()
