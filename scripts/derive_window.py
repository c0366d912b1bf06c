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
    python scripts/derive_window.py --check    # exit 1 if _FRONT breaks
                                               # the freshness floor
                                               # (see check())

Rules (documented in the _FRONT comment, encoded here):
- newest(k) = max round whose CORRECTNESS file has rows_match AND
  schema_match for k; entries never green anywhere rank MOST urgent.
- Entries DUE in round N+1 (the next window): never-green first, then
  newest <= N-2 (they would violate the invariant at end of N+1).
- The window holds ``WINDOW`` entries; when more are due than fit the
  overflow must be an explicit, documented deferral (the script lists
  the deferral rather than choosing silently), and when fewer are due
  the free slots may carry plan-changed-but-fresh gates — a judgment
  call the script cannot see.  ``--check`` therefore enforces only the
  freshness FLOOR (every due entry windowed when it fits; a full
  window drawn from the due set when it doesn't), never a unique
  window choice.
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


def battery_keys(repo: str = REPO) -> tuple[list[str], list[str]]:
    """(queries() key order, the pinned _FRONT window) — every key the
    driver could verify plus the window the repo currently declares."""
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
        return check(rep)
    return 0


def check(rep) -> int:
    """Enforce the freshness FLOOR, not a unique window choice.

    - No overflow (len(due) <= WINDOW): every due entry must be in
      _FRONT; remaining slots may carry anything (the documented
      plan-changed-gate rule puts fresh-but-rewritten gates there).
    - Overflow (len(due) > WINDOW): the maintainer must defer SOME due
      entries — any choice is a documented judgment call (the r11
      precedent deferred the two oldest), so the check only requires a
      FULL window drawn entirely from the due set, and prints the
      deferral loudly so it cannot be silent.
    - _FRONT larger than the window the driver verifies is always an
      error: the tail entries would silently never run.
    """
    due, front = rep["due"], rep["front"]
    errors = []
    if len(front) > WINDOW:
        errors.append(f"_FRONT has {len(front)} entries; the driver "
                      f"verifies only {WINDOW}")
    if len(due) <= WINDOW:
        missing = sorted(set(due) - set(front))
        errors += [f"due entry missing from _FRONT: {k}" for k in missing]
    else:
        if len(front) < WINDOW:
            errors.append(
                f"overflow round ({len(due)} due) but _FRONT has only "
                f"{len(front)} slots filled")
        stray = sorted(set(front) - set(due))
        errors += [f"overflow round, but _FRONT spends a slot on a "
                   f"non-due entry: {k}" for k in stray]
        deferred = sorted(set(due) - set(front))
        print(f"DEFERRAL ({len(deferred)} due entries left out — "
              "document them in the _FRONT comment):")
        for k in deferred:
            print("  ", k)
    if not errors:
        print("CHECK OK: _FRONT satisfies the freshness floor")
        return 0
    print("CHECK FAILED:")
    for e in errors:
        print("  ", e)
    return 1


if __name__ == "__main__":
    sys.exit(main())
