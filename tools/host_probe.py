"""Host-contention probe: measure hypervisor CPU steal under full-width
load (round 11 s2).

Wide parallel stages (32-way joins, full-corpus scans) degrade 2-4x when
the hypervisor reclaims cores from this VM, while single-threaded work and
loadavg look normal — so a bench flag on a wide workload is uninterpretable
without a steal reading. Measured discovery: the jaccard AllPairs build
read 4.1-15.6 s across one day on identical code/data; a 32-process burn
showed 9.8% steal and a 1.44x per-core throughput spread at loadavg 0.2.

`measure_steal()` runs an all-cores burn for a few seconds and returns the
/proc/stat steal fraction plus the max/min per-process throughput spread.
tools/adjudicate_regressions.py records it next to every verdict batch.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time


def _cpu_times() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:9]))


def steal_fraction(before: list[int], after: list[int]) -> float:
    """Steal share of all CPU time between two /proc/stat aggregate
    readings (fields: user nice system idle iowait irq softirq steal)."""
    delta = [b - a for b, a in zip(after, before)]
    total = sum(delta)
    return delta[7] / total if total > 0 else 0.0


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def measure_steal(seconds: float = 2.0, procs: int | None = None) -> dict:
    """{steal_pct, throughput_spread, procs}: steal share and the max/min
    per-process op-count ratio under an all-cores burn. spread ~1.0 on a
    quiet host; >1.3 with steal >5% means wide stages are being squeezed
    and bench numbers on wide workloads are host-noise-dominated."""
    n = procs or os.cpu_count() or 1
    before = _cpu_times()
    # spawn, not fork: the probe is called from inside bench/adjudicate
    # processes holding a live JVM/py4j with many threads, and forking a
    # heavily multithreaded process can deadlock the child (r11 ADVICE).
    # _burn is module-level, so spawn pickles cleanly.
    with mp.get_context("spawn").Pool(n) as pool:
        counts = pool.map(_burn, [seconds] * n)
    after = _cpu_times()
    return {
        "steal_pct": round(100.0 * steal_fraction(before, after), 1),
        "throughput_spread": round(max(counts) / max(min(counts), 1), 2),
        "procs": n,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(measure_steal()))
