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
    sys.path.insert(0, REPO)
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(REPO, "__spark_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        q = mod.queries()
        assert list(q)[:len(mod._FRONT)] == list(mod._FRONT)
        assert len(set(mod._FRONT)) == len(mod._FRONT)
        missing = [k for k in mod._FRONT if k not in q]
        assert not missing, missing
    finally:
        sys.path.remove(REPO)
