"""Pins for the all-time bench-band machinery (r13 VERDICT items 1+7).

The scenario these tests encode is the one that motivated the feature:
multimodal_resize_digest's committed reading walked 2.15 -> 3.30 ->
5.89 -> 8.46 s across four successive BENCH_FULL records, each step
under the 1.5x last-record threshold, so the ratio guard never flagged
— while an idle re-measure at a 0.1%-steal bracket read 1.35 s. The
band check must catch exactly that shape without churning on ordinary
+/-20% host noise.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench import _vs_alltime_band  # noqa: E402
from bench_bands import compute_bands, record_readings  # noqa: E402


def _rec(queries, regressions=None, sf=0.1):
    doc = {"sf": sf, "queries": queries}
    if regressions:
        doc["regressions"] = regressions
    return doc


class TestComputeBands:
    def test_basic_stats(self):
        bands = compute_bands(
            [_rec({"q": 1.0}), _rec({"q": 3.0}), _rec({"q": 2.0})]
        )
        assert bands["q"] == {"n": 3, "min": 1.0, "median": 2.0, "max": 3.0}

    def test_flagged_reading_excluded_from_own_record(self):
        # the 9.01 s reading was flagged in its own record -> not band
        # material; the unflagged readings still count
        bands = compute_bands(
            [
                _rec({"q": 2.0}),
                _rec({"q": 9.01}, regressions={"q": "2.0s -> 9.01s"}),
                _rec({"q": 2.2}),
            ]
        )
        assert bands["q"]["n"] == 2
        assert bands["q"]["max"] == 2.2

    def test_identical_recommits_deduplicated(self):
        # the history contains byte-identical re-commits; they must not
        # double-weight the median
        same = {"q": 5.0, "r": 1.0}
        bands = compute_bands(
            [_rec(same), _rec(same), _rec({"q": 1.0, "r": 1.0})]
        )
        assert bands["q"]["n"] == 2
        assert bands["q"]["median"] == 3.0

    def test_non_numeric_and_missing_skipped(self):
        readings = record_readings(
            {"queries": {"q": 1.5, "bad": "oops"}, "regressions": {}}
        )
        assert readings == {"q": 1.5}


class TestVsAlltimeBand:
    def _write_bands(self, tmp_path, queries, sf=0.1):
        with open(os.path.join(tmp_path, "BANDS.json"), "w") as f:
            json.dump({"sf": sf, "queries": queries}, f)

    def test_monotone_climb_flags_via_median(self, tmp_path):
        # the r13 shape: band median 3.118 (23 records) with a max
        # already ratcheted to 8.46 by an unflagged burst record —
        # reading 8.46 is only 1.44x the prior record (ratio guard
        # blind) and inside 1.5x the polluted max, but 2.71x the
        # median, which bursts cannot move -> band flag
        self._write_bands(
            tmp_path,
            {"mrd": {"n": 23, "min": 1.752, "median": 3.118, "max": 8.46}},
        )
        flags = _vs_alltime_band(
            {"mrd": 8.46}, root=str(tmp_path), current_sf=0.1
        )
        assert "mrd" in flags
        assert "median" in flags["mrd"]
        # adjudicate_regressions must be able to parse the prior
        import re

        assert re.match(r"([0-9.]+)s\s*->", flags["mrd"])

    def test_beyond_alltime_max_flags(self, tmp_path):
        self._write_bands(
            tmp_path,
            {"q": {"n": 10, "min": 1.0, "median": 2.0, "max": 3.0}},
        )
        flags = _vs_alltime_band(
            {"q": 4.6}, root=str(tmp_path), current_sf=0.1
        )
        assert "q" in flags and "max" in flags["q"]

    def test_ordinary_noise_does_not_flag(self, tmp_path):
        # +-20% host noise and readings inside the historic envelope
        # stay quiet (flag churn is the failure mode r13 documented)
        self._write_bands(
            tmp_path,
            {"q": {"n": 10, "min": 1.0, "median": 2.0, "max": 3.0}},
        )
        assert (
            _vs_alltime_band({"q": 3.6}, root=str(tmp_path), current_sf=0.1)
            == {}
        )

    def test_thin_band_does_not_flag(self, tmp_path):
        # <5 readings is not a band yet (new queries would churn)
        self._write_bands(
            tmp_path, {"q": {"n": 4, "min": 1.0, "median": 1.0, "max": 1.0}}
        )
        assert (
            _vs_alltime_band({"q": 9.0}, root=str(tmp_path), current_sf=0.1)
            == {}
        )

    def test_subsecond_reading_does_not_flag(self, tmp_path):
        # sub-0.5s readings are GC-pause territory (same floor as the
        # ratio guard)
        self._write_bands(
            tmp_path, {"q": {"n": 10, "min": 0.1, "median": 0.1, "max": 0.1}}
        )
        assert (
            _vs_alltime_band({"q": 0.4}, root=str(tmp_path), current_sf=0.1)
            == {}
        )

    def test_sf_mismatch_disables(self, tmp_path):
        self._write_bands(
            tmp_path,
            {"q": {"n": 10, "min": 1.0, "median": 2.0, "max": 3.0}},
            sf=0.01,
        )
        assert (
            _vs_alltime_band({"q": 99.0}, root=str(tmp_path), current_sf=0.1)
            == {}
        )

    def test_missing_bands_file_disables(self, tmp_path):
        assert (
            _vs_alltime_band({"q": 99.0}, root=str(tmp_path), current_sf=0.1)
            == {}
        )


class TestCommittedArtifact:
    def test_bands_json_is_valid_and_covers_bench_queries(self):
        """The committed BANDS.json must parse, be at bench sf, and carry
        a band for every long-benched query (new queries accrue bands as
        rounds pass — only completely absent coverage is a bug)."""
        path = os.path.join(REPO, "BANDS.json")
        if not os.path.exists(path):
            pytest.skip("BANDS.json not yet generated")
        with open(path) as f:
            bands = json.load(f)
        assert bands["sf"] == 0.1
        assert bands["n_records"] >= 1
        for name, b in bands["queries"].items():
            assert set(b) == {"n", "min", "median", "max"}, name
            assert b["min"] <= b["median"] <= b["max"], name
        # spot-check: the queries benched since round 1 must have bands
        for name in ("q1_pricing_summary", "dedup_minhash_pairs"):
            assert bands["queries"][name]["n"] >= 5, name
