"""Block until the box looks bench-able, then print the final bracket.

Why: the round-close gate runs bench.py immediately after ~40 minutes
of all-core pytest stages, so the close bench starts on the gate's own
stale load — r13 and r14 BOTH produced a flag-churn record this way
(r14: 219 s / 16 flags at loadavg 3.9, followed by a 157 s / 2-flag
clean-bracket retry on the same code twenty minutes later). Every such
record costs an adjudication pass. This stage makes the settle-wait
part of the gate instead of a manual retry ritual.

Criteria (both must hold on the same probe):
* 1-min loadavg below LOAD_MAX (own dissipating load);
* hypervisor steal below STEAL_MAX (co-tenant bursts; loadavg cannot
  see these — r11 s2 measured 9.8% steal at loadavg 0.2).

Gives up after TIMEOUT_S and proceeds anyway (exit 0 — the gate must
never deadlock on a busy host; the bench record carries its own
brackets, and the adjudication pipeline handles a dirty record exactly
as before). Exit code is 0 in both cases; the printed JSON says which.

Usage: ``python tools/wait_for_idle.py`` (tunables via env:
D2P_IDLE_LOAD_MAX / D2P_IDLE_STEAL_MAX / D2P_IDLE_TIMEOUT_S).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOAD_MAX = float(os.environ.get("D2P_IDLE_LOAD_MAX", "1.0"))
STEAL_MAX = float(os.environ.get("D2P_IDLE_STEAL_MAX", "1.5"))
TIMEOUT_S = float(os.environ.get("D2P_IDLE_TIMEOUT_S", "600"))
#: Consecutive clean probes required. One clean probe is not enough:
#: the first live run of this stage saw steal oscillate
#: 9.6% -> 4.6% -> 20.2% -> clean, cleared on the single clean probe,
#: and the burst resumed at bench start (record bracketed 4.6%).
#: Two clean probes ~45 s apart demand a sustained quiet window.
CONSECUTIVE_OK = int(os.environ.get("D2P_IDLE_CONSECUTIVE_OK", "2"))
PROBE_GAP_S = 45  # between probes: the burn itself loads the box

#: The steal probe's own all-core burn (host_probe.measure_steal default)
#: adds ~ncpu*(1-exp(-burn/60)) ≈ 1.05 to the 1-min loadavg on a 32-core
#: box, decaying to ~0.5 by the next probe 45 s later — near the 1.0
#: threshold the gate's own probing could keep resetting the streak and
#: drive an otherwise-quiet box to the timeout (r14 ADVICE). Each probe
#: therefore subtracts the expected residual of OUR last burn before
#: comparing to LOAD_MAX. The residual is capped at _BURN_JUMP (~1.05),
#: so a genuinely loaded box cannot ride the discount past the bar.
BURN_S = 2.0  # host_probe.measure_steal's default burn duration
_BURN_JUMP = (os.cpu_count() or 1) * (1.0 - math.exp(-BURN_S / 60.0))


def _burn_residual(elapsed_s: float) -> float:
    """1-min loadavg still attributable to our own last steal burn,
    ``elapsed_s`` seconds after it ended (exponential 60 s decay)."""
    return _BURN_JUMP * math.exp(-elapsed_s / 60.0)


def main() -> int:
    from host_probe import measure_steal

    t0 = time.monotonic()
    attempts = []
    ok_streak = 0
    last_burn_end: float | None = None
    while True:
        residual = (
            _burn_residual(time.monotonic() - last_burn_end)
            if last_burn_end is not None
            else 0.0
        )
        load1 = os.getloadavg()[0]
        load_ok = load1 - residual < LOAD_MAX
        # only pay the all-core burn when loadavg already qualifies
        steal = measure_steal().get("steal_pct") if load_ok else None
        if steal is not None:
            last_burn_end = time.monotonic()
        attempts.append(
            {
                "load1": round(load1, 2),
                "burn_residual": round(residual, 2),
                "steal_pct": steal,
            }
        )
        if load_ok and steal is not None and steal < STEAL_MAX:
            ok_streak += 1
        else:
            ok_streak = 0
        if ok_streak >= CONSECUTIVE_OK:
            print(
                json.dumps(
                    {
                        "idle": True,
                        "waited_s": round(time.monotonic() - t0, 1),
                        "attempts": attempts,
                    }
                )
            )
            return 0
        if time.monotonic() - t0 > TIMEOUT_S:
            print(
                json.dumps(
                    {
                        "idle": False,
                        "waited_s": round(time.monotonic() - t0, 1),
                        "attempts": attempts,
                        "note": (
                            "timeout - proceeding on a busy box; read the "
                            "bench record's own brackets before trusting it"
                        ),
                    }
                )
            )
            return 0
        time.sleep(PROBE_GAP_S)


if __name__ == "__main__":
    sys.exit(main())
