"""Event-stream relational operators (sessionization & friends).

No reference counterpart (SURVEY.md §2.6 — the reference has no
window/sort/time surface at all); these are the standard event-pipeline
shapes, expressed as pure window functions so Catalyst plans one shuffle
on the partition key and sorts within partitions — the shape that holds
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    to their previous event exceeds ``gap_s`` seconds.

    ``ts_col`` is BIGINT epoch-nanoseconds (the events table contract).
    Returns one row per (user, session): ``user_id, session_id`` (1-based
    per user in time order), ``n_events, start_s, end_s, duration_s``.

    Physical shape: one hash shuffle on ``user_col``, two window passes
    (lag + running sum) over the same partitioning — the second window
    reuses the first's sort, then a hash aggregate on (user, session).
    """
    gap_ns = int(gap_s) * 1_000_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap_ns), 1).otherwise(0)
    sess = (events
            .withColumn("_new", new_session)
            .withColumn("session_id", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    # integer DIV, not float division: epoch-nanos (~1.7e18) exceed
    # double's exact-integer range, so a float path can round the second
    return (sess.groupBy(user_col, "session_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.expr(f"CAST(min({ts_col}) DIV 1000000000 AS BIGINT)")
                 .alias("start_s"),
                 F.expr(f"CAST(max({ts_col}) DIV 1000000000 AS BIGINT)")
                 .alias("end_s"))
            .withColumn("duration_s",
                        (F.col("end_s") - F.col("start_s")).cast("bigint")))
