"""The driver-window rotation must be DERIVED, not remembered: round 10
shipped a wrong hand-derived schedule (caught and corrected in r11).
scripts/derive_window.py recomputes the obligation from the
CORRECTNESS_r*.json actuals; this test fails the suite whenever
``__spark_entry__._FRONT`` drifts from the derived due set — e.g. a
new round starts and the window was not rotated, or an entry was added
without re-deriving the whole schedule."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_front_window_is_exactly_the_derived_obligation():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "derive_window.py"),
         "--check"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_front_entries_resolve_and_lead_queries_order():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from derive_window import battery_keys

        keys, front = battery_keys(REPO)
        assert keys[:len(front)] == front
        assert len(set(front)) == len(front)
        missing = [k for k in front if k not in set(keys)]
        assert not missing, missing
    finally:
        sys.path.remove(os.path.join(REPO, "scripts"))
