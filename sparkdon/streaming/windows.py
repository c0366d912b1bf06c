"""Streaming windowed aggregation over the ``events`` stream shape.

readStream → watermark → window agg → writeStream, per the Structured
Streaming model.  The batch twins of these aggregations are gated against
DuckDB in :mod:`sparkdon.pipeline` (``x_window_tumbling``,
``x_window_sessionize``); this module provides the streaming plans and a
test harness that drives them with file-source micro-batches
(``Trigger.AvailableNow``) into a memory sink.

Scale notes: state is keyed by (window, event_type) — bounded by the
watermark horizon; late rows beyond 10 minutes are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source event stream (one file per micro-batch in tests)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time windows with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w").start.alias("bucket"), "event_type", "cnt", "sum_value")
    )


def sliding_rates(events: DataFrame, window: str = "10 minutes",
                  slide: str = "5 minutes") -> DataFrame:
    """Sliding windows (overlapping buckets)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w").start.alias("bucket"), "cnt")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows keyed by user (gap-based)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "user_id",
            "cnt",
        )
    )


def dedup_stream(events: DataFrame, keys: tuple = ("user_id", "event_type", "value"),
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact-dedup: keep the first arrival of each key, even
    across micro-batches, via ``dropDuplicatesWithinWatermark``.

    The streaming twin of ``x_dedup_exact`` for a training-data ingest
    pipeline: state holds one entry per key only until the watermark
    passes its event time, so memory is bounded by the dedup horizon
    rather than the stream's lifetime (plain ``dropDuplicates`` on a
    stream retains state forever)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_s: int = 120,
                  output_mode: str = "complete"):
    """Drive a streaming plan to completion with AvailableNow, collect from
    the memory sink.  Test/dev helper — production uses a real sink.
    Aggregations use the default complete mode; non-aggregating plans
    (dedup) need ``output_mode='append'``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query '{name}' did not finish within {timeout_s}s")
    return q
