"""Stream-stream joins over the ``events`` stream shape.

The canonical attribution join: a *view* stream joined to a *click*
stream on user within an event-time interval.  Structured Streaming's
inner stream-stream join emits a row as soon as both sides have
arrived; the watermarks plus the time-range condition bound how long
each side's rows are retained in state (Spark derives the state
eviction horizon from ``cts BETWEEN vts AND vts + interval``), so
state is O(events inside the horizon), not O(stream history).

The batch twin of :func:`view_click_join` is SQL-expressible, so the
gate ``x_join_stream`` in :mod:`sparkdon.pipeline` drives this plan to
completion under ``Trigger.AvailableNow`` and compares the emitted set
against a DuckDB interval self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: attribution horizon: a click within this much of a view counts
JOIN_INTERVAL = "6 hours"

#: late-data allowance on both sides
JOIN_WATERMARK = "1 hour"


def view_click_join(events: DataFrame, interval: str = JOIN_INTERVAL,
                    watermark: str = JOIN_WATERMARK) -> DataFrame:
    """Inner stream-stream interval join: clicks attributed to the views
    they follow within ``interval``, per user.

    Both sides carry a watermark and the join condition carries the
    time bound — the combination Spark needs to evict join state
    (views older than ``watermark + interval`` past the click-side
    watermark can never match again and are dropped).

    100 TB shape: the join shuffles both sides on ``user_id`` once;
    state per key is the in-horizon events only.  Skewed users are
    split by AQE on the batch twin; on the stream side the horizon
    bounds the blow-up.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("vts"),
        )
        .withWatermark("vts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            f"v_user = c_user AND cts >= vts AND cts <= vts + interval {interval}"
        ),
    )
    return joined.select(
        "view_id", "click_id", F.col("v_user").alias("user_id"))
