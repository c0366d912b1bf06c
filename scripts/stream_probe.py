"""Streaming micro-latency probe (round 11, VERDICT r10 #4).

The bench set deliberately excludes the streaming gates (their wall time
is dominated by fixed per-query machinery), which left the state-store
hot path — ``dropDuplicatesWithinWatermark`` state, windowed-agg state,
``applyInPandasWithState`` (streaming/stateful.py), stream-stream join
state — invisible to the round-over-round record.  This probe makes a
regression there visible: the events fixture is split into N
time-ordered files and streamed with ``maxFilesPerTrigger=1``, so every
family runs a REAL multi-micro-batch execution (state carried across
batches, watermark advancing between them), and the per-batch
``triggerExecution`` durations from the query's progress feed a
throughput + latency record.

Usage: python scripts/stream_probe.py [sf_dir] [n_files] [family...]
Prints ONE JSON line:
  {"sf_dir": ..., "n_files": N, "families": {name:
    {"rows": R, "wall_s": W, "rows_per_sec": RPS, "batches": B,
     "batch_ms_p50": ..., "batch_ms_max": ...}}}

Record the line in PERF.md's "streaming latency probe" table each round;
compare rows_per_sec round-over-round (same host-noise policy as
bench.py — sub-second batches smear under co-tenant load, so adjudicate
on a quiet host).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _split_by_ts(spark, src_parquet: str, out_dir: str, n_files: int,
                 ts_col: str = "ts") -> int:
    """Write ``src_parquet`` as ``n_files`` single-file parquet dirs in
    ascending time order with staggered mtimes, so the file stream
    source (which orders by modification time) replays arrival order.
    Returns the row count."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_parquet)
    total = df.count()
    qs = df.approxQuantile(ts_col, [i / n_files for i in range(1, n_files)], 0.001) \
        if dict(df.dtypes)[ts_col] in ("bigint", "double", "int") else None
    if qs is None:
        # timestamp column: quantile over epoch micros
        with_e = df.withColumn("_e", F.unix_micros(F.col(ts_col).cast("timestamp")))
        qs = with_e.approxQuantile("_e", [i / n_files for i in range(1, n_files)], 0.001)
        edge = F.unix_micros(F.col(ts_col).cast("timestamp"))
    else:
        edge = F.col(ts_col)
    bounds = qs
    now = time.time()
    for i in range(n_files):
        part = df
        if i > 0:
            part = part.filter(edge >= bounds[i - 1])
        if i < n_files - 1:
            part = part.filter(edge < bounds[i])
        d = os.path.join(out_dir, f"b{i:02d}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))
    return total


#: per-family wall-clock cap; a family that cannot drain the fixture in
#: this long is recorded as timed out rather than wedging the probe
FAMILY_TIMEOUT_S = int(os.environ.get("STREAM_PROBE_TIMEOUT_S", "240"))


def _run(stream_df, out_mode: str, ckpt: str):
    """Drive a streaming frame to a throwaway sink under AvailableNow +
    maxFilesPerTrigger (set on the source) and return
    (wall_s, [(rows, trigger_ms), ...], timed_out)."""
    t0 = time.time()
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(out_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(FAMILY_TIMEOUT_S)
    if not finished:
        q.stop()  # never leave a wedged query contending with the rest
        q.awaitTermination(30)
    wall = time.time() - t0
    prog = []
    for p in q.recentProgress:
        rows = p["numInputRows"]
        ms = p["durationMs"].get("triggerExecution", 0)
        if rows:
            prog.append((rows, ms))
    return wall, prog, not finished


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    only = set(sys.argv[3:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("stream-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="sparkdon_stream_probe_")
    ev_dir = os.path.join(scratch, "events")
    doc_dir = os.path.join(scratch, "docs")

    # events arrive as nanos-long under the legacy flag; the split files
    # carry a proper timestamp column so every family can watermark it
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_t = dict(raw.dtypes)["ts"]
    ev_src = os.path.join(scratch, "events_src")
    if ts_t == "bigint":  # legacy nanos-long → micros → timestamp
        fixed = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    else:
        fixed = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    fixed.write.mode("overwrite").parquet(ev_src)
    n_events = _split_by_ts(spark, ev_src, ev_dir, n_files)

    ev_schema = spark.read.parquet(os.path.join(ev_dir, "b00")).schema

    def event_stream():
        return (
            spark.readStream.format("parquet")
            .schema(ev_schema)
            .option("maxFilesPerTrigger", "1")
            .load(os.path.join(ev_dir, "*"))
        )

    from sparkdon.streaming.joins import view_click_join
    from sparkdon.streaming.neardup import corpus_band_index, near_dup_matches
    from sparkdon.streaming.stateful import user_profiles
    from sparkdon.streaming.windows import (
        dedup_stream,
        session_windows,
        sliding_rates,
        tumbling_counts,
    )

    families = {
        "dedup_stream": lambda: (
            dedup_stream(event_stream(), keys=("user_id", "event_type")), "append"),
        "tumbling_agg": lambda: (tumbling_counts(event_stream()), "update"),
        "sliding_agg": lambda: (sliding_rates(event_stream()), "update"),
        # session windows reject update mode on streams; the gate uses a
        # complete-mode snapshot too
        "session_agg": lambda: (session_windows(event_stream()), "complete"),
        # expire_idle_ms=None: processing-time timers never let an
        # AvailableNow query terminate (see streaming/stateful.py)
        "stateful_profiles": lambda: (
            user_profiles(event_stream(), expire_idle_ms=None), "update"),
        "stream_stream_join": lambda: (view_click_join(event_stream()), "append"),
    }

    # stream-static LSH collision join streams the documents table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_src = os.path.join(scratch, "docs_src")
    docs.withColumn("_ord", F.xxhash64("doc_id")).write.mode("overwrite").parquet(doc_src)
    _split_by_ts(spark, doc_src, doc_dir, n_files, ts_col="_ord")
    doc_schema = spark.read.parquet(os.path.join(doc_dir, "b00")).schema
    corpus = corpus_band_index(spark, sf_dir).localCheckpoint()
    n_docs = docs.count()

    def doc_stream():
        return (
            spark.readStream.format("parquet")
            .schema(doc_schema)
            .option("maxFilesPerTrigger", "1")
            .load(os.path.join(doc_dir, "*"))
        )

    families["stream_static_neardup"] = lambda: (
        near_dup_matches(doc_stream(), corpus), "append")

    if only:
        unknown = only - set(families)
        if unknown:
            raise SystemExit(f"unknown families: {sorted(unknown)}")
        families = {k: v for k, v in families.items() if k in only}

    results = {}
    for name, build in families.items():
        print(f"[stream_probe] {name} ...", file=sys.stderr, flush=True)
        rows_in = n_docs if name == "stream_static_neardup" else n_events
        ckpt = os.path.join(scratch, "ckpt", name)
        try:
            df, mode = build()
            wall, prog, timed_out = _run(df, mode, ckpt)
        except Exception as exc:  # noqa: BLE001 — record, keep probing
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"[stream_probe] {name} ERROR", file=sys.stderr, flush=True)
            continue
        ms = sorted(m for _r, m in prog) or [0]
        results[name] = {
            "rows": rows_in,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(rows_in / wall) if wall else None,
            "batches": len(prog),
            "batch_ms_p50": round(statistics.median(ms)),
            "batch_ms_max": max(ms),
        }
        if timed_out:
            results[name]["timed_out"] = True
        print(f"[stream_probe] {name} {results[name]}",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": sf_dir, "n_files": n_files, "families": results}))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
