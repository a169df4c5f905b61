"""Institutional guard for driver-verification debt (VERDICT r5 item 4).

The driver value-checks only the FIRST 50 registry entries per round, so a
query that is neither already driver-checked (a CORRECTNESS_r*.json entry in
some past round) nor inside the upcoming 50-slot window has no path to
verification — round 5 accumulated 39 such queries by prepending new work
every round. This test makes that state unrepresentable: every registered
query must either have driver contact on record or be scheduled in the next
window. Adding queries without budgeting window slots for them fails CI.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # driver checks this many registry entries per round


def _registry_order() -> list[str]:
    import __spark_entry__ as e

    return list(e._REGISTRY._queries.keys())


def _ever_checked() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names.update(json.load(f).keys())
    return names


def test_never_checked_queries_fit_next_driver_window():
    order = _registry_order()
    checked = _ever_checked()
    never = [q for q in order if q not in checked]
    window = set(order[:WINDOW])
    overflow = [q for q in never if q not in window]
    assert not overflow, (
        f"{len(overflow)} registered queries have never been driver-checked "
        f"AND are outside the next 50-slot verification window — they can "
        f"never be verified. Reorder _PRIORITY in __spark_entry__.py (or "
        f"stop adding queries) so the debt fits the window: {overflow}"
    )


def test_priority_list_is_exact_and_duplicate_free():
    # a typo'd or duplicated _PRIORITY name silently burns a window slot
    import __spark_entry__ as e

    assert len(e._PRIORITY) == len(set(e._PRIORITY))
    missing = [n for n in e._PRIORITY if n not in e._REGISTRY._queries]
    assert not missing
