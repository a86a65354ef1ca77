"""The registry's ``_STAMP_FIRST`` window must equal what the
generator computes from the CORRECTNESS files — the r12 verdict found
the hand-carried rotation plan had miscounted the r7 cohort by 31
queries; this test makes that error class impossible to reintroduce.

Only CORRECTNESS files for rounds < ``_STAMP_ROUND`` feed the
computation, so the assertion stays stable after the driver writes the
current round's own file (regenerate the window and bump
``_STAMP_ROUND`` at the start of each round)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stamp_rotation import WINDOW, compute_window, latest_green_stamps

from lab04_spark_streaming_spark import registry


def test_stamp_first_matches_generator():
    order = [s.name for s in registry.all_specs()]
    stamps = latest_green_stamps(REPO, registry._STAMP_ROUND)
    expected = compute_window(order, stamps, registry._ROUND_CHANGED)
    assert registry._STAMP_FIRST == expected, (
        "registry._STAMP_FIRST drifted from the generated rotation — "
        "run `python scripts/stamp_rotation.py` and paste its output"
    )


def test_window_covers_oldest_cohort():
    """Every query on the globally oldest stamp must be in the window
    (the r12 verdict's stretch (c)): stale stamps may never be left
    behind while newer ones are refreshed."""
    stamps = latest_green_stamps(REPO, registry._STAMP_ROUND)
    if not stamps:
        return
    oldest = min(stamps.values())
    cohort = {n for n, r in stamps.items() if r == oldest}
    in_window = cohort & set(registry._STAMP_FIRST)
    missed = cohort - in_window
    assert len(cohort) > WINDOW or not missed, (
        f"oldest-stamp (r{oldest}) queries missing from the window: "
        f"{sorted(missed)}"
    )


def test_changed_list_names_registered_queries():
    names = {s.name for s in registry.all_specs()}
    bad = [n for n in registry._ROUND_CHANGED if n not in names]
    assert not bad, f"_ROUND_CHANGED names not registered: {bad}"
