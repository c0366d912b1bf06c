#!/usr/bin/env python3
"""Derive the driver-verification window obligations from actuals.

The driver verifies the FIRST ~50 entries of ``queries()`` order per
round (pinned by ``__spark_entry__._FRONT``).  The freshness invariant:
at the end of round N, the union of windows N-2..N must cover the whole
battery — no entry's newest driver-green row may be older than two
rounds.  The rotation arithmetic was hand-derived and WRONG once
(round 10, corrected in round 11); this script makes the derivation
mechanical, always from the CORRECTNESS_r*.json actuals:

    python scripts/derive_window.py            # report + due list
    python scripts/derive_window.py --check    # exit 1 unless _FRONT
                                               # == the due set exactly

Rules (documented in the _FRONT comment, encoded here):
- newest(k) = max round whose CORRECTNESS file has rows_match AND
  schema_match for k; entries never green anywhere rank MOST urgent.
- Entries DUE in round N+1 (the next window): never-green first, then
  newest <= N-2 (they would violate the invariant at end of N+1).
- The window is exactly ``WINDOW`` entries; if more are due than fit,
  the overflow must be an explicit, documented deferral (the script
  lists the overflow rather than choosing silently).
- Plan-changed gates belong in the window of the round that changed
  them; that is a judgment call the script cannot see — it only checks
  the freshness floor.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_green(repo: str = REPO) -> tuple[dict[str, int], int]:
    """(newest driver-green round per gated key, latest round seen)."""
    newest: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        latest = max(latest, r)
        with open(f) as fh:
            data = json.load(fh)
        for k, v in data.items():
            if v.get("rows_match") and v.get("schema_match"):
                newest[k] = max(newest.get(k, 0), r)
            else:
                newest.setdefault(k, 0)  # attempted, never green → urgent
    return newest, latest


def battery_keys(repo: str = REPO) -> list[str]:
    """Every key the driver could verify = queries() order."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(repo, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, repo)
    try:
        spec.loader.exec_module(mod)
        return list(mod.queries()), list(mod._FRONT)
    finally:
        sys.path.remove(repo)


def derive(repo: str = REPO):
    newest, latest = newest_green(repo)
    keys, front = battery_keys(repo)
    # a key in the battery but absent from every CORRECTNESS file has
    # never been in a window at all — most urgent of all
    for k in keys:
        newest.setdefault(k, -1)
    # due for the NEXT window (round latest+1): invariant needs newest
    # >= latest-1 at the end of it
    due = sorted((k for k in keys if newest[k] <= latest - 2),
                 key=lambda k: (newest[k], k))
    return {
        "latest_round": latest,
        "next_round": latest + 1,
        "battery": len(keys),
        "distribution": _dist(newest, keys),
        "due": due,
        "overflow": due[WINDOW:],
        "front": front,
    }


def _dist(newest, keys):
    from collections import Counter

    return dict(sorted(Counter(newest[k] for k in keys).items()))


def main() -> int:
    rep = derive()
    print(f"battery {rep['battery']} entries; newest-green distribution "
          f"{rep['distribution']}")
    print(f"round r{rep['next_round']:02d} window obligation: "
          f"{len(rep['due'])} due (window {WINDOW})")
    for k in rep["due"]:
        print("  ", k)
    if rep["overflow"]:
        print(f"OVERFLOW — {len(rep['overflow'])} more due than fit; "
              "defer explicitly and document:")
        for k in rep["overflow"]:
            print("  ", k)
    if "--check" in sys.argv:
        want = set(rep["due"][:WINDOW])
        got = set(rep["front"])
        if got == want and len(rep["front"]) == min(WINDOW, len(rep["due"])):
            print("CHECK OK: _FRONT is exactly the due set")
            return 0
        print("CHECK FAILED:")
        for k in sorted(want - got):
            print("  missing from _FRONT:", k)
        for k in sorted(got - want):
            print("  in _FRONT but not due:", k)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
