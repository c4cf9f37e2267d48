#!/usr/bin/env python
"""Per-query overhead profiler (guide §1): decompose each headline
query's wall time into (a) DataFrame construction (driver-side: parquet
listing + schema inference + plan building) and (b) execution
(`.count()`, same action as the frozen bench), and record the number of
Spark jobs each execution launched.  Writes BENCH/profile_<tag>.json.

Usage: python bench_profile.py [query ...]   (default: all HEADLINE)
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


def main() -> None:
    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from netrunner_spark.session import get_spark

    spark = get_spark("netrunner_profile", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = sys.argv[1:] or bench_mod.HEADLINE
    qs = entry_mod.queries()
    reps = int(os.environ.get("PROFILE_REPS", "2"))

    rows = []
    for name in names:
        fn = qs[name]
        per = []
        for rep in range(reps):
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            n = df.count()
            t2 = time.time()
            jobs_after = len(tracker.getJobIdsForGroup(None) or [])
            per.append(
                {
                    "construct_s": round(t1 - t0, 3),
                    "count_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "rows": n,
                    "jobs": jobs_after - jobs_before,
                }
            )
        best = min(per, key=lambda r: r["total_s"])
        rows.append({"name": name, "best": best, "passes": per})
        print(
            f"{name:32s} total={best['total_s']:6.3f} "
            f"construct={best['construct_s']:6.3f} count={best['count_s']:6.3f} "
            f"jobs={best['jobs']:3d} rows={best['rows']}",
            flush=True,
        )

    tag = time.strftime("%H%M%S")
    out = os.path.join(REPO, "BENCH", f"profile_{tag}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    # summary: where does the time go?
    tot = sum(r["best"]["total_s"] for r in rows)
    con = sum(r["best"]["construct_s"] for r in rows)
    print(f"\nTOTAL best-pass {tot:.1f}s  construct {con:.1f}s  ({out})")
    by_total = sorted(rows, key=lambda r: -r["best"]["total_s"])[:20]
    print("slowest:")
    for r in by_total:
        print(f"  {r['name']:32s} {r['best']['total_s']:6.3f}s jobs={r['best']['jobs']}")


if __name__ == "__main__":
    main()
