"""Streaming session windows: the native Structured-Streaming twin of
the batch gap sessionization (operators/events.py:sessionize).

``F.session_window`` is Spark's built-in dynamic-gap window: events for
a key merge into one session while each arrives within ``gap`` of the
session so far; the state store holds one open window per key, closed
and emitted once the watermark passes ``last_event + gap``.  That is
the same session assignment the batch lag/cumsum formulation computes
— so a bounded drain (availableNow) must produce exactly the batch
answer, which is what the oracle checks.

At scale this is the right shape for infinite streams: state is
O(open sessions), eviction is watermark-driven, and the aggregation is
partial-aggregated per micro-batch before the state-store update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_windows(stream_df: DataFrame, key_col: str = "user_id",
                    ts_col: str = "ts", gap: str = "30 minutes",
                    watermark: str = "0 seconds") -> DataFrame:
    """Per-key session aggregate over a streaming DataFrame:
    ``key, session_start, session_end, n_events`` — ``session_end`` is
    Spark's session-window end, i.e. last event + gap.

    Works identically on a batch DataFrame (session_window is a plain
    grouping expression), which is how the streaming/batch parity test
    pins the semantics.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.col(key_col), w.alias("sw"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .select(F.col(key_col),
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    "n_events"))
