#!/usr/bin/env python
"""Hardware controls for the scaling experiment (BENCH/BASELINE.md §3):
establish what THIS box can evidence before interpreting N→4N pairs.

  busyloop  — pure-CPU (no memory traffic): do the cores exist?
  memcopy   — 50 MB numpy copies into FRESH allocations: bus bandwidth
              PLUS the kernel's cost of faulting-in new pages each copy.
  memcopy_resident — 50 MB copies into a PREALLOCATED warm buffer: pure
              bus bandwidth with zero page faults.

The alloc/resident split matters on this VM: round-5 measurement caught
a window where fresh-alloc copy read 0.2 GB/s aggregate (8 procs) while
resident copy read 70 GB/s — i.e. host-side page-fault servicing
(ballooning/EPT), not the bus, had collapsed.  A JVM-heavy Spark drain
reuses pooled heap/Arrow memory, so RESIDENT bandwidth is the control
that predicts whether a scaling leg measures the plan or the co-tenant;
the alloc number is still recorded for startup/allocation-heavy phases.

Writes BENCH/controls.json. Run with the box otherwise idle.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BUSY = """
import time
t_end = time.time() + %f
n = 0
while time.time() < t_end:
    for _ in range(10000): n += 1
print(n)
"""

MEM = """
import numpy as np, time
a = np.ones(50_000_000, dtype=np.uint8)
t_end = time.time() + %f
n = 0
while time.time() < t_end:
    b = a.copy(); n += 1
print(n)
"""

MEM_RESIDENT = """
import numpy as np, time
a = np.ones(50_000_000, dtype=np.uint8)
b = np.empty_like(a)
np.copyto(b, a)
t_end = time.time() + %f
n = 0
while time.time() < t_end:
    np.copyto(b, a); n += 1
print(n)
"""


def run(n_procs: int, cpus: str, code: str) -> int:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", cpus, sys.executable, "-c", code],
            stdout=subprocess.PIPE,
        )
        for _ in range(n_procs)
    ]
    total = 0
    for p in procs:
        stdout, _ = p.communicate()
        if p.returncode != 0 or not stdout.strip():
            # a failed leg (e.g. taskset on a smaller box) must not
            # throw away every earlier measurement (r5 review)
            raise RuntimeError(f"control leg failed (rc={p.returncode})")
        total += int(stdout)
    return total


def main() -> None:
    secs = float(os.environ.get("CTL_SECONDS", "5"))
    busy, mem, memres = BUSY % secs, MEM % secs, MEM_RESIDENT % secs
    out: dict = {"seconds_per_leg": secs, "points": {}}
    n_cpus = os.cpu_count() or 1
    for n, cpus in ((2, "0-1"), (4, "0-3"), (8, "0-7"), (16, "0-15"), (32, "0-31")):
        if n > n_cpus:
            out["points"][str(n)] = {"skipped": f"only {n_cpus} cpus"}
            continue
        try:
            b = run(n, cpus, busy)
            m = run(n, cpus, mem)
            mr = run(n, cpus, memres)
        except RuntimeError as exc:
            out["points"][str(n)] = {"error": str(exc)}
            continue
        out["points"][str(n)] = {
            "busyloop_iters": b,
            "memcopy_gb_per_s": round(m * 0.05 / secs, 2),
            "memcopy_resident_gb_per_s": round(mr * 0.05 / secs, 2),
        }
    p = out["points"]

    def _eff(metric: str, lo: str, hi: str):
        a, b = p.get(lo, {}).get(metric), p.get(hi, {}).get(metric)
        return round(b / (4 * a), 2) if a and b else None

    out["busyloop_eff_8_to_32"] = _eff("busyloop_iters", "8", "32")
    out["memcopy_eff_8_to_32"] = _eff("memcopy_gb_per_s", "8", "32")
    out["memcopy_eff_2_to_8"] = _eff("memcopy_gb_per_s", "2", "8")
    out["memcopy_resident_eff_2_to_8"] = _eff(
        "memcopy_resident_gb_per_s", "2", "8"
    )
    # the resident number is THE bus control this module's docstring
    # argues for — it must exist for the 8→32 pair too, or readers fall
    # back to the page-fault-confounded alloc figure (r5 review)
    out["memcopy_resident_eff_8_to_32"] = _eff(
        "memcopy_resident_gb_per_s", "8", "32"
    )
    os.makedirs(os.path.join(os.path.dirname(__file__), "BENCH"), exist_ok=True)
    with open(
        os.path.join(os.path.dirname(__file__), "BENCH", "controls.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
