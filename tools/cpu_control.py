"""Host-hardware CPU control: N independent Python processes each run a
FIXED busy-loop work unit; prints aggregate work-units/sec at that N.

This is engine-independent (no Spark, no JVM, no I/O): it measures what
the sandbox's CPUs can actually deliver at a given parallelism in the
current co-tenant phase.  Two facts it establishes (see BENCH/BASELINE.md):

* the host's per-core speed swings up to ~8x over minutes (co-tenant
  phases that show neither in steal%% nor in load),
* aggregate throughput scales ~linearly to 8 processes but only ~2.5x
  from 8 -> 32 (the 32 vCPUs sit on roughly 16-20 physical cores' worth
  of hardware), so 0.8 scaling efficiency is physically unattainable at
  the 8 -> 32 pairing for ANY engine — the gate pairing must stay inside
  the linear regime.

Usage: python tools/cpu_control.py <nprocs> [reps_per_proc]
"""

import json
import multiprocessing as mp
import sys
import time

_WORK = 10_000_000


def _burn(q):
    t0 = time.time()
    acc = 0
    for i in range(_WORK):
        acc ^= hash(i)
    q.put(time.time() - t0)


def measure(n: int, reps: int = 1) -> dict:
    best = 0.0
    per_proc = []
    for _ in range(reps):
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(n)]
        t0 = time.time()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        wall = time.time() - t0
        per_proc = [round(q.get(), 2) for _ in range(n)]
        best = max(best, n / wall)
    return {"procs": n, "work_units_per_sec": round(best, 3),
            "per_proc_sec": per_proc}


if __name__ == "__main__":
    n = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print(json.dumps(measure(n, reps)))
