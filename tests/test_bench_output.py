"""bench.py's JSON record must not let a crashed query read as a faster
suite (round-5 ADVICE: a partial sum silently compared against full-run
totals)."""

import sys
sys.path.insert(0, ".")

import json

from bench import COMPACT_MAX_BYTES, build_output, compact_output


def test_compact_line_fits_driver_tail_budget():
    # BENCH_r10 regression: the full per-query line outgrew the driver's
    # ~2 KB stdout tail capture and the recorded file failed to parse.
    timings = {f"x_some_rather_long_query_name_{i:03d}": 0.001 * i for i in range(200)}
    out = build_output(timings, {}, "0.1", 35)
    out["load_avg"] = [1.0, 2.0]
    line = json.dumps(compact_output(out))
    assert len(line) <= COMPACT_MAX_BYTES
    rec = json.loads(line)
    assert rec["value"] == out["value"]
    assert rec["n_queries"] == 200
    assert rec["load_avg"] == [1.0, 2.0]
    # heaviest entries ride along
    assert max(timings, key=timings.get) in rec["top"]


def test_compact_line_keeps_error_signal():
    out = build_output({"q1": 1.0}, {"q2": "AnalysisException: boom"}, "0.1", 4)
    rec = compact_output(out)
    assert rec["value"] is None
    assert rec["partial"] is True
    assert rec["error_count"] == 1
    assert rec["error_names"] == ["q2"]


def test_compact_line_fits_even_in_heavy_failure_round():
    # r11 ADVICE: top_n halving alone can't save a record whose bulk is
    # 10 long error names — error_names must shrink (10→3→0) before the
    # fit guarantee gives up.
    long = "x_" + "very_long_query_name_segment_" * 6
    errors = {f"{long}{i:02d}": "boom" for i in range(40)}
    out = build_output({f"q{i}": 0.1 for i in range(5)}, errors, "0.1", 0)
    line = json.dumps(compact_output(out))
    assert len(line) <= COMPACT_MAX_BYTES
    rec = json.loads(line)
    assert rec["error_count"] == 40  # the count survives even if names drop
    assert rec["partial"] is True


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


def test_count_prunes_projection_work_so_bench_must_noop(spark):
    """Pins the r15 measurement finding: under ``count()`` Catalyst
    prunes a projection-shaped gate's expressions down to a row count
    (the operator never runs), while the noop-sink write — the action
    bench.py/scale_probe.py now use — keeps them.  If a Spark upgrade
    ever changes either side, this fails and the bench methodology
    note needs revisiting."""
    from sparkdon.pipeline.staged_gates import x_fasttext_score

    df = x_fasttext_score(spark, "/root/testdata/sf0.001")

    def optimized(dataframe):
        return dataframe._jdf.queryExecution().optimizedPlan().toString()

    count_plan = optimized(df.groupBy().count())
    assert "score_scaled" not in count_plan  # pruned: nothing timed
    noop_plan = optimized(df)
    assert "score_scaled" in noop_plan  # the write action evaluates it


def test_canonical_stamp_load_gate(monkeypatch):
    """r16 (VERDICT r15 #7): a contended run must not clobber the
    committed canonical bench_detail.json — above the 5-min load
    threshold the detail goes to the unstamped file with a retry hint,
    unless the stamp is forced."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_FORCE_STAMP", raising=False)
    name, hint = bench.stamp_target(0.5)
    assert name == "bench_detail.json" and hint is None
    name, hint = bench.stamp_target(bench.STAMP_MAX_LOAD_5M + 0.1)
    assert name == "bench_detail.unstamped.json"
    assert "NOT stamping" in hint
    monkeypatch.setenv("SPARK_GRAFT_FORCE_STAMP", "1")
    name, hint = bench.stamp_target(14.3)
    assert name == "bench_detail.json" and hint is None


def test_canonical_stamp_steal_gate(monkeypatch):
    """r17: hypervisor neighbor steal that begins mid-run is invisible
    to the start-load check — whole-run steal% above the threshold must
    also divert the detail to the unstamped file (measured on this
    host: quiet-start runs degraded 1.6-2.6x while steal hit 4-14%)."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_FORCE_STAMP", raising=False)
    name, hint = bench.stamp_target(0.5, 0.8)
    assert name == "bench_detail.json" and hint is None
    name, hint = bench.stamp_target(0.5, bench.STAMP_MAX_STEAL_PCT + 0.1)
    assert name == "bench_detail.unstamped.json"
    assert "steal" in hint
    # off-Linux (no /proc/stat): steal unknown, load gate alone decides
    name, hint = bench.stamp_target(0.5, None)
    assert name == "bench_detail.json" and hint is None
    monkeypatch.setenv("SPARK_GRAFT_FORCE_STAMP", "1")
    name, hint = bench.stamp_target(0.5, 99.0)
    assert name == "bench_detail.json" and hint is None
