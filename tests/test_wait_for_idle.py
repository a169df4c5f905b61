"""Pins for tools/wait_for_idle.py's streak logic (r14): the gate's
settle-wait must demand a SUSTAINED quiet window — its first live run
cleared on a single clean probe between co-tenant bursts and the burst
resumed at bench start. Probes are monkeypatched; no real 32-core
burns run here.
"""

from __future__ import annotations

import importlib
import json
import os
import sys

import pytest

TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
sys.path.insert(0, TOOLS)


@pytest.fixture()
def wfi(monkeypatch):
    monkeypatch.setenv("D2P_IDLE_TIMEOUT_S", "600")
    mod = importlib.import_module("wait_for_idle")
    mod = importlib.reload(mod)  # re-read env-derived constants
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def _run(mod, monkeypatch, capsys, loads, steals):
    """Drive main() with scripted (loadavg, steal) sequences."""
    load_it = iter(loads)
    steal_it = iter(steals)
    monkeypatch.setattr(
        mod.os, "getloadavg", lambda: (next(load_it), 0.0, 0.0)
    )
    fake_probe = type(
        "hp", (), {"measure_steal": staticmethod(
            lambda: {"steal_pct": next(steal_it)}
        )}
    )
    monkeypatch.setitem(sys.modules, "host_probe", fake_probe)
    assert mod.main() == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_single_clean_probe_between_bursts_does_not_clear(
    wfi, monkeypatch, capsys
):
    # the live failure shape: burst, one clean probe, burst, then a
    # sustained window — must clear only after TWO consecutive cleans
    out = _run(
        wfi,
        monkeypatch,
        capsys,
        loads=[0.2, 0.2, 0.2, 0.2, 0.2],
        steals=[9.6, 0.1, 20.2, 0.1, 0.2],
    )
    assert out["idle"] is True
    assert len(out["attempts"]) == 5  # cleared on the 2-streak, not probe 2


def test_two_consecutive_cleans_clear_immediately(wfi, monkeypatch, capsys):
    out = _run(
        wfi, monkeypatch, capsys, loads=[0.1, 0.1], steals=[0.0, 0.5]
    )
    assert out["idle"] is True and len(out["attempts"]) == 2


def test_high_load_skips_burn_and_resets_streak(wfi, monkeypatch, capsys):
    # loadavg over the bar never pays the 32-core probe (steal None)
    # and resets the streak
    out = _run(
        wfi,
        monkeypatch,
        capsys,
        loads=[0.1, 5.0, 0.1, 0.1],
        steals=[0.1, 0.1, 0.1],  # consumed only on low-load probes
    )
    assert out["idle"] is True
    assert out["attempts"][1]["steal_pct"] is None
    assert len(out["attempts"]) == 4


def test_own_burn_residual_does_not_reset_streak(wfi, monkeypatch, capsys):
    # r14 ADVICE: the steal probe's own 2 s all-core burn adds ~1.0 to
    # the 1-min loadavg; near the threshold the gate's probing used to
    # reset its own streak. The second probe's load1 of 1.2 is the
    # first burn's residual on a 0.2 base — the discount must let it
    # count as clean (1.2 - ~1.0 < 1.0) instead of restarting.
    monkeypatch.setattr(wfi, "_BURN_JUMP", 1.05)
    out = _run(
        wfi,
        monkeypatch,
        capsys,
        loads=[0.3, 1.2],
        steals=[0.1, 0.1],
    )
    assert out["idle"] is True and len(out["attempts"]) == 2
    assert out["attempts"][0]["burn_residual"] == 0.0  # no burn yet
    assert out["attempts"][1]["burn_residual"] > 0.9


def test_residual_discount_is_capped_at_the_burn_jump(wfi, monkeypatch, capsys):
    # a genuinely loaded box cannot ride the discount: load 2.5 minus
    # the full ~1.05 residual is still over the 1.0 bar, so the streak
    # resets and the gate only clears on the later sustained window
    monkeypatch.setattr(wfi, "_BURN_JUMP", 1.05)
    out = _run(
        wfi,
        monkeypatch,
        capsys,
        loads=[0.3, 2.5, 0.3, 0.3],
        steals=[0.1, 0.1, 0.1],  # probe 2 skips the burn (load too high)
    )
    assert out["idle"] is True and len(out["attempts"]) == 4
    assert out["attempts"][1]["steal_pct"] is None


def test_timeout_proceeds_with_note(wfi, monkeypatch, capsys):
    clock = iter([0.0] + [i * 100.0 for i in range(1, 50)])
    monkeypatch.setattr(wfi.time, "monotonic", lambda: next(clock))
    out = _run(
        wfi,
        monkeypatch,
        capsys,
        loads=[9.0] * 50,
        steals=[99.0] * 50,
    )
    assert out["idle"] is False and "timeout" in out["note"]
