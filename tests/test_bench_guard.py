"""Unit pins for bench.py's round-over-round drift guard — the driver runs
bench every round, so the guard's parsing of prior-round artifacts (both the
raw bench line and the driver's wrapper-with-tail format) must not rot."""

from __future__ import annotations

import json

from bench import _vs_previous_round


def _write(tmp_path, name, doc):
    (tmp_path / name).write_text(json.dumps(doc))


def test_no_prior_files(tmp_path):
    assert _vs_previous_round({"q": 9.9}, root=str(tmp_path)) == {}


def test_raw_format_flags_only_real_drift(tmp_path):
    _write(
        tmp_path,
        "BENCH_r01.json",
        {"queries": {"fast": 0.05, "slow": 2.0, "ok": 1.0}},
    )
    out = _vs_previous_round(
        # fast: below the then>=0.2 floor (timer noise) — never flagged;
        # slow: 3x — flagged; ok: 1.2x — under threshold
        {"fast": 0.4, "slow": 6.0, "ok": 1.2},
        root=str(tmp_path),
    )
    assert set(out) == {"slow"}
    assert "3.0x" in out["slow"]


def test_driver_wrapper_format_and_newest_round_wins(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"queries": {"q": 0.5}})
    line = json.dumps(
        {"metric": "total_query_wall_time", "queries": {"q": 2.0}}
    )
    _write(
        tmp_path,
        "BENCH_r02.json",
        {"n": 2, "rc": 0, "tail": f"progress noise\r\n{line}\n"},
    )
    # vs r02 (2.0s) a 2.4s run is fine; vs r01 (0.5s) it would flag — the
    # NEWEST round must win, through the wrapper's tail field
    assert _vs_previous_round({"q": 2.4}, root=str(tmp_path)) == {}
    out = _vs_previous_round({"q": 9.0}, root=str(tmp_path))
    assert "BENCH_r02.json" in out["q"]


def test_truncated_tail_falls_back_to_full_record(tmp_path):
    # Round-5 failure mode: the driver captures only 2000 chars of stdout,
    # so the >120-entry per-query line arrives truncated mid-JSON. The
    # guard must skip the unparseable fragment and read the committed
    # BENCH_FULL.json that bench.py writes after every complete run.
    truncated = '{"metric": "total_query_wall_time", "queries": {"q": 0.5, "oth'
    _write(
        tmp_path,
        "BENCH_r05.json",
        {"n": 5, "rc": 0, "tail": f'{truncated}\n{{"value": 1.0, "n_queries": 2}}\n'},
    )
    _write(tmp_path, "BENCH_FULL.json", {"queries": {"q": 0.5}})
    out = _vs_previous_round({"q": 2.0}, root=str(tmp_path))
    assert set(out) == {"q"}
    # without the full record the guard degrades to "no prior", not a crash
    (tmp_path / "BENCH_FULL.json").unlink()
    assert _vs_previous_round({"q": 2.0}, root=str(tmp_path)) == {}


def test_sf_mismatched_tail_falls_back_to_full_record(tmp_path):
    """ADVICE r7 regression pin: a driver-tail prior recorded at another
    sf must not disable regression detection outright — the guard falls
    through to BENCH_FULL.json, which has its own sf check."""
    line = json.dumps({"metric": "t", "sf": 0.01, "queries": {"q": 0.1}})
    _write(
        tmp_path,
        "BENCH_r06.json",
        {"n": 6, "rc": 0, "tail": f"{line}\n"},
    )
    _write(tmp_path, "BENCH_FULL.json", {"sf": 0.1, "queries": {"q": 0.5}})
    out = _vs_previous_round({"q": 2.0}, root=str(tmp_path), current_sf=0.1)
    assert set(out) == {"q"}
    assert "BENCH_FULL.json" in out["q"]
    # and a BENCH_FULL recorded at yet another sf is still rejected
    _write(tmp_path, "BENCH_FULL.json", {"sf": 0.01, "queries": {"q": 0.5}})
    assert (
        _vs_previous_round({"q": 2.0}, root=str(tmp_path), current_sf=0.1)
        == {}
    )


def test_stray_non_numeric_artifact_is_ignored(tmp_path):
    # BENCH_rerun.json matches the BENCH_r*.json glob but has no round
    # number — must degrade to "no prior"/newest-numeric, not crash.
    _write(tmp_path, "BENCH_rerun.json", {"queries": {"q": 0.5}})
    assert _vs_previous_round({"q": 9.9}, root=str(tmp_path)) == {}
    _write(tmp_path, "BENCH_r01.json", {"queries": {"q": 3.0}})
    assert _vs_previous_round({"q": 3.1}, root=str(tmp_path)) == {}


def test_corrupt_prior_is_ignored(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    assert _vs_previous_round({"q": 9.9}, root=str(tmp_path)) == {}


def test_full_record_carries_adjudication_forward(tmp_path):
    """r8: a complete bench run rewrites BENCH_FULL.json; the dated
    regression_adjudication block written by
    tools/adjudicate_regressions.py must survive the rewrite (the
    driver's own per-round bench run would otherwise delete the
    evidence the judge reads)."""
    from bench import _write_full_record

    full = tmp_path / "BENCH_FULL.json"
    adjudication = {"date": "2026-08-15", "queries": {"q": {"verdict": "noise"}}}
    full.write_text(
        json.dumps(
            {"queries": {"q": 1.0}, "regression_adjudication": adjudication}
        )
    )
    _write_full_record({"queries": {"q": 0.9}, "sf": 0.1}, str(full))
    doc = json.loads(full.read_text())
    assert doc["queries"] == {"q": 0.9}  # new record won
    assert doc["regression_adjudication"] == adjudication  # block survived
    # the adjudicate tool's "no flags in the current record" note must NOT
    # ride into a record that HAS flags (it would read as dismissing live
    # regressions); the rest of the block still carries forward
    noted = dict(adjudication, note="no regression flags in the current...")
    full.write_text(
        json.dumps({"queries": {"q": 0.9}, "regression_adjudication": noted})
    )
    _write_full_record(
        {"queries": {"q": 2.0}, "regressions": {"q": "0.9s -> 2.0s"}},
        str(full),
    )
    doc = json.loads(full.read_text())
    assert "note" not in doc["regression_adjudication"]
    assert doc["regression_adjudication"]["queries"] == adjudication["queries"]
    # ...and the carried block is tagged stale so last round's per-query
    # "noise" verdicts can't read as adjudicating THIS record's live
    # flags (r8 ADVICE)
    assert "stale" in doc["regression_adjudication"]
    # ...but a flag-free record keeps the note verbatim
    full.write_text(
        json.dumps({"queries": {"q": 0.9}, "regression_adjudication": noted})
    )
    _write_full_record({"queries": {"q": 0.9}}, str(full))
    assert json.loads(full.read_text())["regression_adjudication"] == noted
    # corrupt/missing prior degrades to a plain write, not a crash
    full.unlink()
    _write_full_record({"queries": {"q": 0.5}}, str(full))
    assert json.loads(full.read_text())["queries"] == {"q": 0.5}
