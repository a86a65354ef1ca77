"""Stamp-rotation generator — computes the registry's ``_STAMP_FIRST``
window FROM the CORRECTNESS_r*.json files instead of hand-carrying
cohort lists across rounds (the r12 verdict found the hand-carried r13
plan miscounted the r7 cohort by 31 queries; this script makes that
error class structurally impossible).

The driver's per-round correctness gate stamps the FIRST ``WINDOW``
entries of ``queries()`` in registry order.  The rotation rule, in
priority order (matching the standing wedge rule from the r11/r12
verdicts):

1. **Oldest cohort first**: every query whose latest green driver
   stamp is the globally oldest stamp value, in registry order.
2. **Wedges**: queries whose code changed this round (the explicit
   ``changed`` list recorded in registry.py), oldest stamp first,
   registry order within a stamp.
3. **Fillers**: unchanged queries, oldest stamp first, registry order
   within a stamp.

Only CORRECTNESS files for rounds **strictly below** ``stamp_round``
feed the computation, so the generated window stays reproducible after
the driver writes this round's own CORRECTNESS file.

Usage::

    python scripts/stamp_rotation.py          # print the r-window
    python -m pytest tests/test_stamp_rotation.py   # enforce it
"""

from __future__ import annotations

import glob
import json
import os
import re

WINDOW = 50


def latest_green_stamps(repo_dir: str, before_round: int) -> dict[str, int]:
    """name -> latest round (< before_round) with all checks green."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        rnd = int(m.group(1))
        if rnd >= before_round:
            continue
        with open(f) as fh:
            data = json.load(fh)
        for name, v in data.items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match", True)
                and v.get("hash_match", True)
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
            else:
                latest.setdefault(name, 0)
    return latest


def compute_window(
    registry_order: list[str],
    stamps: dict[str, int],
    changed: list[str],
    window: int = WINDOW,
) -> list[str]:
    idx = {n: i for i, n in enumerate(registry_order)}
    stamped = [n for n in registry_order if n in stamps]
    if not stamped:
        return registry_order[:window]
    oldest = min(stamps[n] for n in stamped)
    out = [n for n in registry_order if stamps.get(n) == oldest][:window]
    chosen = set(out)
    changed_set = set(changed)

    def pick(pool: list[str]) -> None:
        for n in sorted(pool, key=lambda n: (stamps.get(n, 0), idx[n])):
            if len(out) >= window:
                return
            if n not in chosen:
                out.append(n)
                chosen.add(n)

    pick([n for n in stamped if n in changed_set])
    pick([n for n in stamped if n not in changed_set])
    # Brand-new queries (no stamp yet) outrank everything; they evict
    # fillers/wedges from the tail.  If that would evict part of the
    # oldest cohort itself, the window cannot satisfy its own
    # covers-oldest-cohort invariant — fail loudly instead of emitting
    # a window the test will (rightly) reject (r13 advisor note).
    new = [n for n in registry_order if n not in stamps]
    oldest_cohort = [n for n in registry_order if stamps.get(n) == oldest]
    # (a cohort larger than the window alone is already impossible to
    # cover in one round — the test carries that escape hatch — so the
    # guard fires only when NEW registrations cause the eviction)
    if len(oldest_cohort) <= window and len(new) + len(oldest_cohort) > window:
        raise SystemExit(
            f"window overflow: {len(new)} new queries + "
            f"{len(oldest_cohort)} oldest-cohort (r{oldest}) queries "
            f"exceed the {window}-slot window; the oldest cohort must "
            "stay covered — split the new-query registration across "
            "rounds or raise WINDOW for this round"
        )
    return (new + out)[:window]


def main() -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lab04_spark_streaming_spark import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    order = [s.name for s in registry.all_specs()]
    stamps = latest_green_stamps(repo, registry._STAMP_ROUND)
    win = compute_window(order, stamps, registry._ROUND_CHANGED)
    for n in win:
        print(f'    "{n}",  # stamp r{stamps.get(n, 0)}')


if __name__ == "__main__":
    main()
