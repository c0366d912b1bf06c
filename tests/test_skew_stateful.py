"""Skew-salted aggregation and the custom stateful streaming operator."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    from sparkdon.operators.skew import salted_agg

    # synthetic skew: one key holds ~90% of rows
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))).alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    plain = {
        (r["key"]): (r["cnt"], r["sv"], r["mn"], r["mx"])
        for r in df.groupBy("key").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv"),
            F.min("v").alias("mn"), F.max("v").alias("mx")).collect()
    }
    salted = {
        (r["key"]): (r["cnt"], r["sv"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["key"],
            {"cnt": ("count", "v"), "sv": ("sum", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")},
            salt_buckets=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_partials(spark):
    from sparkdon.operators.skew import salted_agg

    df = spark.range(0, 1000).select(F.lit("only").alias("key"),
                                     F.lit(1.0).alias("v"))
    out = salted_agg(df, ["key"], {"cnt": ("count", "v")}, salt_buckets=8)
    # one output row, correct count, and the plan contains TWO aggregations
    rows = out.collect()
    assert rows[0]["cnt"] == 1000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final for both phases


def test_stateful_user_profiles(spark, tmp_path):
    from sparkdon.streaming.stateful import user_profiles
    from sparkdon.streaming.windows import read_event_stream

    df = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime(
                ["2024-01-01 09:00", "2024-01-01 09:10", "2024-01-01 09:20",
                 "2024-01-01 09:05", "2024-01-01 09:15", "2024-01-01 09:25"]),
            "user_id": [1, 1, 1, 2, 2, 2],
            "event_type": ["click"] * 6,
            "value": [1.0, 2.0, 3.0, 10.0, 20.0, 30.0],
            "props": ["{}"] * 6,
        }
    )
    df.iloc[:3].to_parquet(tmp_path / "b1.parquet", coerce_timestamps="us")
    df.iloc[3:].to_parquet(tmp_path / "b2.parquet", coerce_timestamps="us")

    stream = read_event_stream(spark, str(tmp_path))
    q = (
        # expire_idle_ms=None: a registered processing-time timer keeps
        # an AvailableNow query alive after the drain — before round 11
        # this test silently burned its whole 120 s awaitTermination
        user_profiles(stream, expire_idle_ms=None)
        .writeStream.format("memory")
        .queryName("profiles_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "drain-mode stateful query must terminate"
    rows = spark.sql(
        "SELECT user_id, max(total_events) AS n, max(total_value) AS v "
        "FROM profiles_test GROUP BY user_id ORDER BY user_id").collect()
    got = {r["user_id"]: (r["n"], r["v"]) for r in rows}
    assert got == {1: (3, 6.0), 2: (3, 60.0)}


def test_streaming_gates_match_batch(spark):
    """The oracle-gated streaming entries (x_dedup_stream,
    x_window_stream) must agree with their batch equivalents on the
    fixture — the same claim the DuckDB gate makes, kept in the pytest
    suite so a regression is caught before the driver run."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline import x_dedup_stream, x_window_stream, x_window_tumbling

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")

    got = x_dedup_stream(spark, sf)
    assert got.count() == events.select("user_id", "event_type").distinct().count()
    assert set(got.columns) == {"user_id", "event_type"}

    stream_rows = {
        (r["bucket"], r["event_type"], r["cnt"], round(r["sum_value"], 2))
        for r in x_window_stream(spark, sf).collect()
    }
    batch_rows = {
        (r["bucket"], r["event_type"], r["cnt"], round(r["sum_value"], 2))
        for r in x_window_tumbling(spark, sf)
        .withColumn("bucket", F.col("bucket").cast("timestamp")).collect()
    }
    assert stream_rows == batch_rows


def test_session_window_boundary(spark):
    """Pin Spark's session_window merge rule at the exact gap boundary:
    a gap of EXACTLY the session gap merges; one microsecond more
    splits.  The x_session_stream DuckDB oracle encodes the same strict
    inequality — if a Spark upgrade ever flips this, this test fails
    before the driver gate does."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base), (1, base + dt.timedelta(seconds=1800)),
            (2, base), (2, base + dt.timedelta(seconds=1800, microseconds=1))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_user = {r["user_id"]: r["cnt"]
                for r in out.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("cnt")).collect()}
    assert per_user == {1: 1, 2: 2}


def test_streaming_session_sliding_match_batch(spark):
    """The two round-7 streaming gates agree with batch recomputation on
    the fixture (same pattern as test_streaming_gates_match_batch)."""
    from sparkdon.pipeline import (
        x_session_stream, x_sliding_stream, x_window_sliding,
    )

    sf = "/root/testdata/sf0.001"
    sliding = {
        (r["bucket"], r["cnt"]) for r in x_sliding_stream(spark, sf).collect()
    }
    batch = {
        (r["bucket"].replace(tzinfo=None) if r["bucket"].tzinfo else r["bucket"],
         r["cnt"])
        for r in x_window_sliding(spark, sf).collect()
    }
    sliding = {(b.replace(tzinfo=None) if getattr(b, "tzinfo", None) else b, c)
               for b, c in sliding}
    assert sliding == batch

    # session snapshot: per-user session counts equal the batch
    # gaps-and-islands sessionization
    events = spark.read.parquet(f"{sf}/events.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    batch_sessions = (
        events.withColumn("ns", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id").agg(F.sum("ns").alias("n"))
    )
    got = (
        x_session_stream(spark, sf)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    lhs = {(r["user_id"], r["n"]) for r in got.collect()}
    rhs = {(r["user_id"], r["n"]) for r in batch_sessions.collect()}
    assert lhs == rhs


def test_stream_join_matches_across_batches(spark, tmp_path):
    """A view arriving in batch 1 must still join a click arriving in
    batch 2 (the view is held in join state across the trigger), and a
    click outside the 6-hour interval must not match."""
    from sparkdon.streaming.joins import view_click_join
    from sparkdon.streaming.windows import read_event_stream

    views = pd.DataFrame(
        {
            "event_id": [100, 101],
            "ts": pd.to_datetime(["2024-01-01 09:00", "2024-01-01 09:30"]),
            "user_id": [1, 2],
            "event_type": ["view"] * 2,
            "value": [0.0] * 2,
            "props": ["{}"] * 2,
        }
    )
    clicks = pd.DataFrame(
        {
            "event_id": [200, 201],
            # user 1 clicks inside the window; user 2 clicks 7h later
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 16:30"]),
            "user_id": [1, 2],
            "event_type": ["click"] * 2,
            "value": [0.0] * 2,
            "props": ["{}"] * 2,
        }
    )
    views.to_parquet(tmp_path / "b1.parquet", coerce_timestamps="us")
    clicks.to_parquet(tmp_path / "b2.parquet", coerce_timestamps="us")

    stream = read_event_stream(spark, str(tmp_path))  # 1 file per trigger
    q = (
        view_click_join(stream)
        .writeStream.format("memory")
        .queryName("join_incremental_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT view_id, click_id, user_id FROM join_incremental_test"
    ).collect()
    assert {(r["view_id"], r["click_id"], r["user_id"]) for r in rows} == {
        (100, 200, 1)}


def test_join_back_hot_lane_matches_plain(spark, monkeypatch):
    """Round 10: `_join_back_skew_robust` with a planted hot key must
    (a) produce bit-identical rows to the plain join-back, and (b)
    actually route the hot key through the broadcast lane (hot set
    non-empty, BroadcastHashJoin in the executed plan) — the
    deterministic half of scripts/skew_probe.py's evidence."""
    from sparkdon.pipeline import dedup

    hot = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("ci"),
        F.lit("permission is hereby granted free of charge").alias("chunk"))
    bg = spark.range(500).select(
        (F.col("id") + 2000).alias("doc_id"), F.lit(1).alias("ci"),
        F.concat(F.lit("unique chunk "), F.col("id").cast("string"))
        .alias("chunk"))
    ch = hot.unionByName(bg)
    first = ch.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "ci")).alias("first_occ"),
        F.count(F.lit(1)).alias("cnt"))

    plain = sorted(map(tuple, ch.join(first, "chunk").collect()))

    monkeypatch.setattr(dedup, "HOT_KEY_MIN_COUNT", 1000)
    robust_df = dedup._join_back_skew_robust(ch, first, "chunk")
    robust = sorted(map(tuple, robust_df.collect()))
    assert robust == plain

    # the hot lane must have engaged: one key over the threshold, and
    # the executed plan carries the broadcast joins of the hot/cold split
    n_hot = first.filter(F.col("cnt") >= 1000).count()
    assert n_hot == 1
    plan = robust_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    # no-hot-key corpus: hot lane empty, output still identical (the
    # gate-fixture regime)
    monkeypatch.setattr(dedup, "HOT_KEY_MIN_COUNT", 100_000)
    robust2 = sorted(map(tuple,
                         dedup._join_back_skew_robust(ch, first, "chunk")
                         .collect()))
    assert robust2 == plain


def test_chunk_dedup_output_stable_under_hot_threshold(spark, monkeypatch):
    """x_chunk_dedup's output must not depend on HOT_KEY_MIN_COUNT: the
    hot/cold routing is a pure execution-strategy choice."""
    from sparkdon.pipeline import dedup

    base = sorted(map(tuple, dedup.x_chunk_dedup(spark, SF).collect()))
    monkeypatch.setattr(dedup, "HOT_KEY_MIN_COUNT", 2)
    routed = sorted(map(tuple, dedup.x_chunk_dedup(spark, SF).collect()))
    assert routed == base
