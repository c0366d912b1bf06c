"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round 4 — isolates the measurement from JVM-state drift that
smeared BENCH_r03 ~1.5x across queries whose plans had not changed):

- Queries run in GROUPS ordered light -> heavy, so the memory/GC pressure
  of the big ANN/embedding entries cannot tax the cheap queries' timings.
- Between groups the cache is dropped and a JVM GC is requested, so each
  group starts from a comparable heap state.
- Each query is executed twice and the MIN wall time is recorded (standard
  best-of-N practice: the min is the least-noise estimate of the plan's
  cost; a single transiently-contended run cannot inflate the suite).
- Round 8: sub-second queries get a THIRD timed run — on a contended
  host the sub-second band has repeatedly shown 1.4-1.7x round-over-round
  smear on unchanged plans; one extra sample of a cheap query buys the
  most variance reduction per second spent.  The record also carries the
  host's 1-minute load average before and after the suite (``load_avg``),
  so a noisy number ships with its own context.
- One untimed warm-up pass pays whole-stage-codegen compilation and
  stage-scheduling setup before anything is timed.

SCOPE (round 16; cap made explicit in round 14): GROUPS times 96 of
the 150 gated battery entries (97 timings with the flagship — the r16
battery swap retired two timed pipeline gates and registered two,
which enter the timed set per the rule; net timed-set size unchanged)
— every non-streaming pipeline gate plus one
shape-representative per relational/SPARQL micro-gate family (see the
SET SELECTION RULE at GROUPS below).  The ~54 untimed entries are the
cheap relational/SPARQL siblings (plan-shape duplicates of a timed
representative) and the streaming gates (wall time dominated by fixed
query-startup machinery, not plan quality) — so the suite total and
``n_queries`` measure the representative set, NOT full-battery
coverage; correctness of all 150 is the driver gate's job.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# (group name, query names) — light first, heavy ANN/embedding last.
#
# SET SELECTION RULE (round 10, VERDICT r9 item 8 — also stated in
# PERF.md): every non-streaming pipeline gate (x_*) is benched; the
# relational and SPARQL micro-gate batteries are benched by SHAPE
# REPRESENTATIVE (one scan/filter, one bind, one join chain, one
# anti-join, one grouped agg, one multi-agg, one subquery, one top-k,
# one union, one decollect — their siblings differ only in expression
# content, not plan shape, so a regression in the shared machinery
# shows in the representative); streaming gates are excluded because
# their wall time is dominated by fixed per-query streaming machinery
# (checkpoint dir, query startup), not plan quality.  Any NEW gate
# whose Spark plan is novel (not a sibling of an existing shape) must
# be added here in the round that introduces it.
GROUPS: list[tuple[str, list[str]]] = [
    (
        "relational",
        [
            "p1_scan_filter",
            "p8_bind",
            "j1_inner_join_chain",
            "j3_anti_not_exists",
            "a1_group_count",
            "a9_multi_agg",
            "x_pivot_source_lang",
            "x_events_rollup",
            "a6_subquery_filter",
            "o2_topk_desc",
            "u1_union",
            "q10_seq_decollect",
        ],
    ),
    (
        "sparql",
        [
            "sparql_census",
            "sparql_census_ids",
            "sparql_join_agg",
            "sparql_join_agg_ids",
            "sparql_late_ids",
            "sparql_census_orders",
            "sparql_path_plus",
            "sparql_path_plus_ids",
            "sparql_path_star_sip",
            "sparql_path_nps",
            "sparql_strfuncs",
            "sparql_describe",
            "sparql_service",
        ],
    ),
    (
        "pipeline_light",
        [
            "x_dedup_exact",
            "x_chunk_dedup",
            "x_dedup_intra",
            "x_ngram_novelty",
            "x_boilerplate",
            "x_dedup_jaccard",
            "x_pii_scrub",
            "x_pq_codes",
            "x_text_stats",
            "x_text_repetition",
            "x_vocab_topk",
            "x_event_percentiles",
            "x_winsorize",
            "x_json_extract",
            "x_sample_stratified",
            "x_sample_exact_k",
            "x_sample_weighted",
            "x_mix_sample",
            "x_mix_temperature",
            # x_lm_score retired from the battery at the r17 swap (its
            # explode→tf→vocab-agg→join-back skeleton stays timed via
            # x_lm_bigram and x_tfidf_topk); its slot's registered
            # successor x_chunk_stride times below (novel zero-exchange
            # stride-overlap window chunking — tokenize-once + one
            # explode(sequence))
            "x_chunk_stride",
            "x_lm_bigram",
            "x_bpe_pairs",
            "x_pack_sequences",
            "x_tfidf_topk",
            "x_neg_sample",
            "x_length_buckets",
            "x_asof_join",
            "x_window_sliding",
            "x_window_sessionize",
            "x_window_tumbling",
            "x_event_lag",
            # round 10: the previously-unbenched non-streaming pipeline
            # gates (set-selection rule above)
            "x_fingerprint",
            "x_fingerprint_winnow",
            "x_lang_id",
            "x_text_quality",
            "x_topk_per_lang",
            # x_embed_norm retired from the battery at the r16 swap
            # (plan shape kept by x_embed_quantize); its slot's
            # registered successor x_soft_dedup times in pipeline_heavy
            "x_embed_quantize",
            "x_salted_census",
            # round 10 (late): novel plan — grouped two-pass prefix-sum
            # rank normalization + value-key join-back
            "x_rank_normalize",
            # round 10 (late): char-explode entropy + vocab-bounded
            # co-occurrence self-join (both novel shapes)
            "x_char_entropy",
            "x_cooccur_pmi",
            # round 10 (late): mergeable sketches — CMS (i,bucket)-keyed
            # partial agg, HLL (group,register) max-agg
            "x_cms_heavy_hitters",
            "x_hll_distinct",
            # round 15: the battery-swap trio enters the timed set the
            # round it registers (set-selection rule above).  Shapes:
            # trained-merge-list BPE apply (novel — the replace-twice
            # separator proof over a 48-merge list), hashed-n-gram
            # linear scoring (zero-shuffle like the fastText gate but
            # over a trained weight vector), and curriculum-ordered
            # pack assignment (the (score, doc_id) sort-key variant of
            # x_pack_sequences' two-pass prefix sum).
            "x_bpe_encode",
            "x_fasttext_score",
            "x_pack_shard",
        ],
    ),
    # NOTE: the streaming gates (x_dedup_stream, x_window_stream,
    # x_sliding_stream, x_session_stream) are correctness-gated but not
    # benched: their wall time is dominated by per-query streaming
    # machinery (checkpoint dir, query startup), not plan quality, and
    # would smear the suite total with fixed overhead.
    (
        "pipeline_heavy",
        [
            "x_contamination",
            "x_cross_dedup",
            "x_dedup_substring",
            # round 16: the battery-swap pair enters the timed set the
            # round it registers (set-selection rule above); the
            # retired x_dedup_substring_hashed / x_embed_norm leave it
            # (no longer gated).  Shapes: span-trim endgame (window
            # marks -> kept-token reassembly, doc-partitioned windows)
            # and cluster-size downweighting over the memoized
            # component frame (one rep-keyed agg + join-back).
            "x_trim_spans",
            "x_soft_dedup",
            "x_semantic_dedup",
            "x_dedup_minhash",
            "x_dedup_simhash",
            "x_sim_lsh_bucketed",
            "x_token_bpe",
            "x_dedup_clusters",
            # round 10 (late): 10-iteration integer fixed-point PageRank
            # (novel plan shape: Pregel-style message-passing loop)
            "x_pagerank",
            "x_dedup_priority",
            "x_split_by_cluster",
            "x_corpus_keep",
            "x_corpus_pack",
            # x_sim_topk retired from the battery at the r17 swap (its
            # broadcast-query + cosine-fold + salted-topk plan is every
            # surviving ANN gate's refine stage); its slot's registered
            # successor x_decontam_embed times here (broadcast benchmark
            # side + per-pair cosine fold + vec_id-keyed max partial agg)
            "x_decontam_embed",
            "x_sim_lsh_refined",
            "x_sim_ivf",
            "x_sim_pq",
            # round 10 (late): IVF+PQ residual ADC (novel plan shape)
            "x_sim_ivfpq",
            "x_pq_trained",
            "x_dedup_embed_strict",
            "x_dedup_embed",
            # last: its 20M-row decimal partial agg generates the most
            # allocation garbage in the suite — running it after the
            # iterative entries keeps their timings out of its GC shadow
            "x_embed_gram",
        ],
    ),
]

N_RUNS = 2  # timed executions per query; min is recorded
#: queries whose best-of-2 lands under this get one extra timed run —
#: the sub-second band is where host contention distorts ratios most
SMALL_QUERY_SEC = 1.0

#: Canonical-stamp load gate (round 16, VERDICT r15 #7 — mechanizing
#: three rounds of manual quiet-start adjudication): a canonical
#: ``bench_detail.json`` must come from a quiet host, yet every bench
#: invocation used to overwrite it — which is exactly how the driver's
#: contended post-session runs kept clobbering the committed canonical
#: (r13/r14/r15, restored by hand each round).  When the 5-minute load
#: average at start exceeds this threshold, the run still executes and
#: prints its JSON (the driver parses stdout — that contract is
#: untouched), but the detail record is written to
#: ``bench_detail.unstamped.json`` instead, with a retry hint on
#: stderr.  Override for a deliberate contended stamp:
#: ``SPARK_GRAFT_FORCE_STAMP=1``.
STAMP_MAX_LOAD_5M = 2.0

#: r17 companion gate: the start-load check cannot see HYPERVISOR
#: NEIGHBOR STEAL that begins mid-run (measured on this host: runs
#: starting at 1-min load 0.13 degraded 1.6–2.6× on random victims
#: while /proc/stat steal climbed to 4–14% of all cores and user%
#: stayed under 25 — runnable threads simply not scheduled).  Steal is
#: accumulated over the WHOLE run and checked when the detail is
#: written; a stolen run still prints its stdout JSON (the driver
#: contract) but must not clobber the committed quiet canonical.
#: Healthy windows on this host read ≤1%.
STAMP_MAX_STEAL_PCT = 3.0

_LOAD_START = 0.0
_LOAD5_START = 0.0


def read_steal() -> tuple[int, int] | None:
    """(steal ticks, total ticks) from /proc/stat, or None off-Linux."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def stamp_target(load5_start: float,
                 steal_pct: float | None = None) -> tuple[str, str | None]:
    """(detail filename, stderr hint or None) for this run — the
    quiet-canonical gate's one decision, factored out so the test can
    pin it without a Spark session.  Two independent refusals: start
    5-min load (contention visible up front) and whole-run steal%
    (hypervisor contention invisible up front)."""
    if not os.environ.get("SPARK_GRAFT_FORCE_STAMP"):
        if load5_start > STAMP_MAX_LOAD_5M:
            return ("bench_detail.unstamped.json",
                    f"bench: start 5-min load {load5_start:.2f} > "
                    f"{STAMP_MAX_LOAD_5M} — NOT stamping bench_detail.json "
                    "(detail written to bench_detail.unstamped.json); retry "
                    "on a quiet host or set SPARK_GRAFT_FORCE_STAMP=1")
        if steal_pct is not None and steal_pct > STAMP_MAX_STEAL_PCT:
            return ("bench_detail.unstamped.json",
                    f"bench: {steal_pct:.2f}% CPU steal during the run > "
                    f"{STAMP_MAX_STEAL_PCT}% — NOT stamping "
                    "bench_detail.json (detail written to "
                    "bench_detail.unstamped.json); retry when the "
                    "hypervisor neighbors quiet down or set "
                    "SPARK_GRAFT_FORCE_STAMP=1")
    return "bench_detail.json", None


def main() -> None:
    global _LOAD_START, _LOAD5_START
    _LOAD_START = os.getloadavg()[0] if hasattr(os, "getloadavg") else 0.0
    _LOAD5_START = os.getloadavg()[1] if hasattr(os, "getloadavg") else 0.0
    steal_start = read_steal()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkdon-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from sparkdon.relational import flagship

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def pre_run(name) -> None:
        # x_dedup_clusters memoizes its component frame (shared with
        # x_corpus_keep).  Without this reset, min-of-2 would record the
        # memo-READ time (~0.08 s) instead of the propagation it claims
        # to measure; clearing before each run keeps the clusters number
        # honest while x_corpus_keep, which follows it in the group,
        # legitimately reuses the frame (computed once, consumed twice —
        # the pipeline shape the memo models).
        if name == "x_dedup_clusters":
            from sparkdon.pipeline import _COMPONENTS_MEMO

            _COMPONENTS_MEMO.clear()
        # x_pagerank persists its repartitioned edge frame (r16 — the
        # partitioning-preserving cache that removes the per-iteration
        # message shuffle).  Spark's CacheManager matches the SECOND
        # run's identical logical plan to the first run's materialized
        # cache, which would time a cache read instead of the edge
        # build; clearing keeps min-of-2 honest (same reasoning as the
        # memo reset above).
        if name == "x_pagerank":
            spark.catalog.clearCache()

    def timed(name, fn) -> None:
        # A single failing query must not kill the whole bench (round 4
        # lost every number to one AnalysisException): record the error
        # and keep timing the rest.
        best = None
        try:
            runs = N_RUNS
            done = 0
            while done < runs:
                pre_run(name)
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
                done += 1
                if done == N_RUNS and best < SMALL_QUERY_SEC:
                    runs = N_RUNS + 1  # min-of-3 for the sub-second band
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return
        timings[name] = round(best, 3)

    def group_barrier() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # JVM/codegen warm-up: one untimed pass (first execution pays
    # whole-stage-codegen compilation + stage-scheduling setup, ~2x the
    # steady-state time)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    try:
        flagship(spark, sf_dir).collect()
    except Exception:  # noqa: BLE001
        pass

    flag_rows: list = []

    def run_flagship() -> None:
        nonlocal flag_rows
        flag_rows = flagship(spark, sf_dir).collect()

    timed("flagship", run_flagship)

    def materialize(df) -> None:
        # Round 15 MEASUREMENT FIX: ``count()`` let Catalyst prune every
        # expression the count doesn't need — for projection-shaped gates
        # (score/encode/normalize: no filter, no agg) the "timing" was a
        # parquet-footer row count that never ran the operator AT ALL
        # (measured: x_fasttext_score count 0.21 s vs real work 66.8 s
        # on a 100x corpus — 320x under-measurement).  The noop sink
        # evaluates the COMPLETE plan (every output column, JVM-side)
        # and discards rows without driver transfer — the standard Spark
        # benchmarking action.  Agg/join-shaped gates are unaffected
        # (count already forced their work); timings are NOT
        # entry-comparable to pre-r15 canonicals for projection-shaped
        # entries (see PERF.md r15 "bench action fix").
        df.write.format("noop").mode("overwrite").save()

    for _group, names in GROUPS:
        group_barrier()
        for name in names:
            if name in qs:
                timed(name, lambda n=name: materialize(qs[n](spark, sf_dir)))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = build_output(timings, errors, sf, len(flag_rows))
    load_end = os.getloadavg()[0] if hasattr(os, "getloadavg") else None
    if load_end is not None:
        out["load_avg"] = [round(_LOAD_START, 2), round(load_end, 2)]
    steal_pct = None
    steal_end = read_steal()
    if steal_start and steal_end and steal_end[1] > steal_start[1]:
        steal_pct = round(100.0 * (steal_end[0] - steal_start[0])
                          / (steal_end[1] - steal_start[1]), 2)
        out["steal_pct"] = steal_pct
    # Round 11: the driver records only the last ~2 KB of stdout and
    # parses JSON out of it; BENCH_r10's full per-query line outgrew
    # that budget and the recorded file ended up unparseable
    # ("parsed": null, tail cut mid-key).  So stdout now carries ONE
    # line that is guaranteed to fit: the canonical totals plus the
    # heaviest per-query timings.  The full per-query record goes to
    # ``bench_detail.json`` next to this script (committed per round by
    # the builder's canonical run) and to stderr.
    detail_name, hint = stamp_target(_LOAD5_START, steal_pct)
    if hint:
        print(hint, file=sys.stderr)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh)
            fh.write("\n")
    except OSError:
        pass
    print(json.dumps(out), file=sys.stderr)
    print(json.dumps(compact_output(out)))
    spark.stop()


#: how many of the heaviest per-query timings ride along on the compact
#: stdout line (the full dict lives in bench_detail.json / stderr)
COMPACT_TOP_N = 15
#: hard ceiling for the compact line — the driver's stdout tail capture
#: is ~2 KB; staying well under it guarantees the line survives intact
COMPACT_MAX_BYTES = 1500


def compact_output(out: dict) -> dict:
    """The one guaranteed-to-fit stdout record.

    Carries everything the driver/judge adjudicates on (canonical total,
    sf, load_avg, error count, query count) plus the ``COMPACT_TOP_N``
    heaviest per-query timings — the entries whose regressions matter.
    If the record exceeds ``COMPACT_MAX_BYTES``, the top dict is halved
    until it fits, then ``error_names`` shrinks 10→3→0 — so a
    heavy-failure round (many long error names) cannot re-create the
    truncated-stdout failure this line exists to prevent.  The headline
    numbers are never dropped.
    """
    timings = out.get("queries", {})
    top_n = COMPACT_TOP_N
    n_errors = 10
    while True:
        heavy = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:top_n])
        rec = {
            "metric": out["metric"],
            "value": out["value"],
            "unit": out["unit"],
            "sf": out["sf"],
            "n_queries": len(timings),
            "flagship_rows": out.get("flagship_rows"),
            "detail": "bench_detail.json",
            "top": heavy,
        }
        for key in ("load_avg", "steal_pct", "partial", "error_count",
                    "partial_total_sec"):
            if key in out:
                rec[key] = out[key]
        if "errors" in out and n_errors:
            rec["error_names"] = sorted(out["errors"])[:n_errors]
        if len(json.dumps(rec)) <= COMPACT_MAX_BYTES:
            return rec
        if top_n > 0:
            top_n //= 2
        elif n_errors > 3:
            n_errors = 3
        elif n_errors > 0:
            n_errors = 0
        else:
            return rec


def build_output(timings: dict, errors: dict, sf, flagship_rows: int) -> dict:
    """Assemble the one-line JSON record.

    A failing query is excluded from the timing sum — but a partial sum
    is NOT comparable round-over-round (a crash would read as a *faster*
    suite), so when any query errored the headline ``value`` is null and
    ``partial``/``error_count`` flag the record; the surviving per-query
    timings stay available under ``queries``.
    """
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if str(sf).replace(".", "").isdigit() else sf,
        "flagship_rows": flagship_rows,
    }
    if errors:
        out["errors"] = errors
        out["partial"] = True
        out["error_count"] = len(errors)
        out["partial_total_sec"] = total
        out["value"] = None
    return out


if __name__ == "__main__":
    main()
