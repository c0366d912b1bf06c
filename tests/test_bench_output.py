"""bench.py's JSON record must not let a crashed query read as a faster
suite (round-5 ADVICE: a partial sum silently compared against full-run
totals)."""

import sys
sys.path.insert(0, ".")

from bench import build_output


def test_clean_run_sums_total():
    out = build_output({"q1": 1.0, "q2": 2.5}, {}, "0.1", 4)
    assert out["value"] == 3.5
    assert "partial" not in out and "errors" not in out


def test_errored_run_nulls_headline_value():
    out = build_output({"q1": 1.0}, {"q2": "AnalysisException: boom"}, "0.1", 4)
    assert out["value"] is None
    assert out["partial"] is True
    assert out["error_count"] == 1
    assert out["partial_total_sec"] == 1.0
    assert out["queries"] == {"q1": 1.0}
    assert "q2" in out["errors"]
