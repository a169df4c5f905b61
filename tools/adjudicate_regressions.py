"""Adjudicate driver-flagged bench regressions with an idle re-measure.

The driver's bench box is often loaded when the round's BENCH record is
taken (r6: loadavg 7+; r7: 7.33), so its >1.5x flags mix real regressions
with co-tenant noise. Rounds 6 and 7 settled those flags by hand-running
``tools/idle_remeasure.py`` and pasting the numbers into the verdict;
this tool makes that a standing round-close stage (VERDICT r7 item 6):

1. read ``regressions`` from BENCH_FULL.json (written by bench.py's
   drift guard after every complete run);
2. re-measure each flagged query with idle_remeasure's methodology
   (same warmup contract, REPS reps, loadavg recorded);
3. write the evidence into BENCH_FULL.json under
   ``regression_adjudication`` — dated, with a per-query verdict:
   ``noise`` when the idle minimum comes back at or below 1.1x the
   recorded prior (the flag does not survive an idle box), ``regressed``
   otherwise — so the next judge reads the adjudication instead of
   re-litigating the flag.

Usage: ``python tools/adjudicate_regressions.py [--date YYYY-MM-DD]``
Exit code is 0 even when queries re-measure as regressed — the gate's
job is to RECORD the evidence; VERDICT grades it.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
NOISE_TOLERANCE = 1.1  # idle min within 10% of the recorded prior = noise


def _remeasure_sf(sf_dir: str) -> float | str:
    """The sf value idle_remeasure's run will record for ``sf_dir`` —
    same derivation as bench.py's result line, so the two compare."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def _recorded_prior(flag: str) -> float | None:
    """The 'then' seconds out of a drift-guard string '0.891s -> 1.559s…'."""
    m = re.match(r"([0-9.]+)s\s*->", flag)
    return float(m.group(1)) if m else None


def _load_bands(sf: float | None) -> dict[str, dict]:
    """BANDS.json per-query bands when they exist AND were generated at
    the flagged record's scale factor (cross-sf bands adjudicate
    nothing). Missing/unparseable file -> empty dict: the band arm is
    an extra exculpatory check, never a gate dependency."""
    try:
        with open(os.path.join(REPO, "BANDS.json")) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {}
    if sf is not None and doc.get("sf") != sf:
        return {}
    return doc.get("queries") or {}


def _verdicts(
    flags: dict[str, str],
    measured: dict[str, dict],
    bands: dict[str, dict] | None = None,
) -> dict:
    """Per-query adjudication records from the flags and idle re-measures.

    The basis must match the REGIME the bench prior was recorded in
    (r8 ADVICE + two r9 manual adjudications):

    * plain queries — min_s across reps (bench measures steady state);
    * memo-backed queries whose prior is memo-WARM (a family member
      earlier in bench order built their shared memo —
      bench.memo_warm_prior_queries()): the warm reps (all_s[1:]) are
      the same regime, so min over them adjudicates both directions;
    * SELF-CACHED memo queries whose re-measure ran their family
      predecessors first (``family_warmed`` in the measurement, written
      by idle_remeasure since r11): the first rep ran with the shared
      memo warm and its own cache cold — the exact regime its bench
      prior recorded — so it adjudicates BOTH directions;
    * memo-backed queries whose prior paid the memo BUILD (first of
      family in bench order), or self-cached queries measured without
      the family warm-up: the fresh-subprocess first rep is the only
      cold number, but it also pays memo build + session ramp the
      deep-warm bench prior never paid — so it can prove noise (cold
      at-or-below prior) but never auto-"regressed"; that residue
      stays manual.
    """
    from bench import _MEMO_BACKED, memo_warm_prior_queries

    warm_prior = memo_warm_prior_queries()
    adjudicated: dict[str, dict] = {}
    for name in sorted(flags):
        prior = _recorded_prior(flags[name])
        idle = measured[name]
        memo_backed = name in _MEMO_BACKED
        cold_memo_basis = False
        if not memo_backed:
            basis, basis_label = idle["min_s"], "min_s across reps"
        elif name in warm_prior and len(idle["all_s"]) > 1:
            basis = min(idle["all_s"][1:])
            basis_label = "min over warm reps (memo-warm prior)"
        elif idle.get("family_warmed"):
            basis = idle["all_s"][0]
            basis_label = (
                "all_s[0] after family warm (shared memo warm, self-cache "
                "cold — bench-comparable regime)"
            )
        else:
            # memo builders, self-cached queries (their warm reps are
            # pure cache reads), and single-rep runs: only the cold rep
            # carries signal, and it is never auto-"regressed" (it pays
            # memo build + session ramp the bench prior may not have)
            basis = idle["all_s"][0]
            basis_label = "all_s[0] (first/cold rep; no comparable warm basis)"
            cold_memo_basis = True
        verdict = "unparseable_flag"
        if prior is not None:
            if basis <= prior * NOISE_TOLERANCE:
                verdict = "noise"
            elif cold_memo_basis:
                verdict = "memo_cold_exceeds_prior: manual adjudication required"
            else:
                verdict = "regressed"
        entry = {
            "flag": flags[name],
            "recorded_prior_s": prior,
            "idle_min_s": idle["min_s"],
            "idle_median_s": idle["median_s"],
            "basis": basis_label,
            "basis_s": basis,
            "verdict": verdict,
        }
        # Lucky-prior band rule (r14 VERDICT item 1, generalizing the
        # r12 manual regime): a prior at/near the query's ALL-TIME band
        # minimum cannot anchor a regression claim — it records the
        # luckiest draw ever observed, so the first normal reading
        # after it trips the ratio guard on identical code (both r14
        # driver flags had exactly this shape after the r13 burst
        # re-base). When the auto-verdict would be "regressed" but the
        # prior sits within NOISE_TOLERANCE of the band min AND the
        # idle basis is inside the band envelope (<= all-time max and
        # <= 2.5x median, bench.py's own band-acceptance thresholds),
        # the verdict becomes noise_lucky_prior with the band recorded.
        band = (bands or {}).get(name)
        if band and prior is not None:
            entry["history_band_s"] = [band["min"], band["max"]]
            entry["history_band_median_s"] = band["median"]
            entry["history_band_n_records"] = band["n"]
            if (
                verdict == "regressed"
                and prior <= band["min"] * NOISE_TOLERANCE
                and basis <= band["max"]
                and basis <= 2.5 * band["median"]
            ):
                entry["verdict"] = "noise_lucky_prior"
                entry["band_note"] = (
                    f"prior {prior}s is within {NOISE_TOLERANCE}x of the "
                    f"all-time band min {band['min']}s over "
                    f"{band['n']} records while the idle basis {basis}s "
                    f"sits inside the band (max {band['max']}, median "
                    f"{band['median']}) — a band-minimum prior records "
                    f"the luckiest draw ever observed and cannot anchor "
                    f"a regression claim"
                )
        adjudicated[name] = entry
    return adjudicated


def main(argv: list[str]) -> int:
    date = datetime.date.today().isoformat()
    if len(argv) == 2 and argv[0] == "--date":
        date = argv[1]

    full_path = os.path.join(REPO, "BENCH_FULL.json")
    with open(full_path) as f:
        doc = json.load(f)
    flags = doc.get("regressions") or {}

    # The flagged priors were recorded at doc["sf"]; idle_remeasure will
    # run at SPARK_GRAFT_SF_DIR (default sf0.1). Comparing across scale
    # factors makes every verdict meaningless — record the mismatch and
    # stop instead (mirrors _vs_previous_round's sf guard; r8 ADVICE).
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    remeasure_sf = _remeasure_sf(sf_dir)
    if flags and doc.get("sf") is not None and doc["sf"] != remeasure_sf:
        # the abort record replaces the block too — keep voluntary
        # entries here for the same reason as the main path below
        kept_voluntary = {
            n: v
            for n, v in doc.get("regression_adjudication", {})
            .get("queries", {})
            .items()
            if isinstance(v, dict) and v.get("voluntary")
        }
        doc["regression_adjudication"] = {
            "date": date,
            "verdict": "sf_mismatch",
            "note": (
                f"BENCH_FULL.json was recorded at sf={doc['sf']} but the "
                f"re-measure sf_dir is {sf_dir} (sf={remeasure_sf}); "
                f"adjudication aborted — re-run with SPARK_GRAFT_SF_DIR "
                f"pointing at the recorded scale factor"
            ),
            "queries": kept_voluntary,
        }
        with open(full_path, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
        print(json.dumps({"date": date, "error": "sf_mismatch"}))
        return 1

    if not flags:
        # The carry-forward (bench._write_full_record) may have preserved
        # an adjudication for flags from an EARLIER record; annotate it so
        # a reader doesn't mistake it for evidence about this flag-free
        # record (the dated block itself stays — it is still the closure
        # record for the flags it names, also kept in git history).
        prior = doc.get("regression_adjudication")
        if prior is not None and "note" not in prior:
            prior["note"] = (
                f"no regression flags in the current bench record (checked "
                f"{date}); the adjudication below refers to flags from an "
                f"earlier record — see its date and per-query flag strings"
            )
            with open(full_path, "w") as f:
                json.dump(doc, f, indent=1)
                f.write("\n")
        print(json.dumps({"date": date, "adjudicated": {}, "note": "no flags"}))
        return 0

    names = sorted(flags)
    # Each memo-backed flag gets its OWN idle_remeasure subprocess: in a
    # shared session an alphabetically-earlier flagged query can populate
    # a shared memo (e.g. the jaccard signature table) and deflate a
    # later query's "cold" first rep, letting a real regression
    # auto-adjudicate as noise — the same trap the cold-rep basis exists
    # to close (r9 review). Non-memo queries share one session.
    from bench import _MEMO_BACKED

    batches = [[n for n in names if n not in _MEMO_BACKED]]
    batches += [[n] for n in names if n in _MEMO_BACKED]
    measured: dict | None = None
    # per-batch idle-ness evidence: with several subprocesses the overall
    # start/end loadavg can read calm while one batch ran under a
    # co-tenant burst — record each batch's own window (r9 review)
    batch_loads: list[dict] = []
    for batch in batches:
        if not batch:
            continue
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "idle_remeasure.py"),
                *batch,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if proc.returncode != 0:
            print(proc.stdout)
            print(proc.stderr, file=sys.stderr)
            return proc.returncode
        # idle_remeasure prints one JSON line last (Spark may interleave
        # noise, including lines that START with '{' — skip unparseable
        # candidates instead of crashing the round-close gate, the same
        # recovery rule as bench.py's driver-tail scan)
        batch_measured = None
        for line in reversed(proc.stdout.splitlines()):
            # re-strip after the CR split: a progress overwrite can leave
            # the final segment with leading padding (r8 review)
            line = line.strip().split("\r")[-1].strip()
            if line.startswith("{") and '"queries"' in line:
                try:
                    batch_measured = json.loads(line)
                except ValueError:
                    continue
                break
        if batch_measured is None:
            print(proc.stdout)
            raise SystemExit("idle_remeasure produced no JSON line")
        batch_loads.append(
            {
                "names": batch,
                "loadavg_at_start": batch_measured["loadavg_at_start"],
                "loadavg_at_end": batch_measured["loadavg_at_end"],
            }
        )
        if measured is None:
            measured = batch_measured
        else:
            measured["queries"].update(batch_measured["queries"])
            measured["loadavg_at_end"] = batch_measured["loadavg_at_end"]

    adjudicated = _verdicts(
        flags, measured["queries"], bands=_load_bands(doc.get("sf"))
    )

    # Carry forward VOLUNTARY entries (manual family adjudications not
    # driven by a flag, marked "voluntary": true) from the prior block:
    # this tool owns only the flag-driven verdicts, and replacing the
    # whole block used to silently delete hand-recorded evidence the
    # verdict had asked for (r11: the dedup-family idle re-measure was
    # wiped by the same gate run it was recorded for). A voluntary entry
    # for a query that is ALSO freshly flagged yields to the fresh
    # verdict.
    prior_queries = doc.get("regression_adjudication", {}).get(
        "queries", {}
    )
    for name, entry in prior_queries.items():
        if (
            isinstance(entry, dict)
            and entry.get("voluntary")
            and name not in adjudicated
        ):
            adjudicated[name] = entry

    # Host-contention context: loadavg is VM-local and reads calm even
    # while the hypervisor reclaims cores from co-tenants, which degrades
    # WIDE stages 2-4x while narrow queries barely move (r11 s2: measured
    # 9.8% steal / 1.44x per-core spread under a 32-process burn on a
    # loadavg-0.2 box while the jaccard AllPairs build read 2-4x its
    # prior). Record steal next to the verdicts so a "regressed" reading
    # on a wide workload can be discounted against the host state.
    try:
        from host_probe import measure_steal

        host = measure_steal()
    except Exception as exc:  # noqa: BLE001 — the probe must not kill the gate
        host = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    doc["regression_adjudication"] = {
        "date": date,
        "method": "tools/idle_remeasure.py, reps="
        + str(measured["reps"])
        + ", warmup per bench.py contract",
        "loadavg_at_start": measured["loadavg_at_start"],
        "loadavg_at_end": measured["loadavg_at_end"],
        "batch_loadavgs": batch_loads,
        "host_steal_after": host,
        "queries": adjudicated,
    }
    with open(full_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"date": date, "adjudicated": adjudicated}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
