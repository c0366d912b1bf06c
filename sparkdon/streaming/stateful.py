"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10: 'applyInPandasWithState for custom stateful operators').

Implements a per-user running profile over the events stream: cumulative
event count, cumulative value, and last-seen timestamp — state that
windowed aggregation can't express (it never closes).  State is one
small tuple per user_id, partitioned by the group key; a processing-time
timeout expires idle users so state stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, total_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "total_events long, total_value double"


def _make_update_user_profile(expire_idle_ms: int | None):
    def _update_user_profile(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            total_events, total_value = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "total_events": [total_events],
                 "total_value": [total_value], "last_ts": [None]})
            return
        total_events, total_value = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdf_iter:
            total_events += len(pdf)
            total_value += float(pdf["value"].sum())
            ts_max = pdf["ts"].max()
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
        state.update((total_events, total_value))
        if expire_idle_ms is not None:
            state.setTimeoutDuration(expire_idle_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "total_events": [total_events],
             "total_value": [total_value], "last_ts": [last_ts]})

    return _update_user_profile


def user_profiles(events: DataFrame,
                  expire_idle_ms: int | None = 60 * 60 * 1000) -> DataFrame:
    """Streaming per-user running profile (update output mode).

    ``expire_idle_ms`` sets the processing-time idle expiry that keeps
    state bounded on a continuous stream (default 1 h).  Pass ``None``
    for NO timeout — REQUIRED for drain-style runs
    (``Trigger.AvailableNow`` / replaying a finite fixture): a
    registered processing-time timer keeps the query alive after the
    data is drained waiting for the timer's batch, so an AvailableNow
    query with timeouts never terminates (measured: the fixture test
    burned its full ``awaitTermination`` budget before round 11 made
    this configurable).  A continuous production stream should keep the
    timeout — its triggers fire forever anyway."""
    timeout = (GroupStateTimeout.NoTimeout if expire_idle_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user_profile(expire_idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
