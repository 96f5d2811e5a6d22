"""Watermarked stream-stream joins.

Structured Streaming's stateful join: both sides buffer rows in the
state store, matches emit as rows arrive, and the WATERMARK + the
event-time RANGE CONDITION together bound the buffer — a right row can
be evicted once the left watermark passes ``right_ts + upper``, so
state is O(events inside the join window), not O(stream).  Without the
range condition the state grows forever; this wrapper therefore makes
the bound mandatory.

Batch DataFrames run through the same plan (an ordinary equi-join +
range filter), which is how the parity test and the DuckDB oracle pin
the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key_col: str, left_ts: str, right_ts: str,
                         upper: str = "1 hour",
                         watermark: str = "0 seconds",
                         left_prefix: str = "l_",
                         right_prefix: str = "r_") -> DataFrame:
    """Inner-join two streams on ``key_col`` where the right event's
    time falls in ``[left_ts, left_ts + upper]`` — "purchases within an
    hour of the click".

    Output columns: the key, then every non-key column of each side
    under its prefix (prefixing makes the two event streams' columns
    collision-free without positional renames).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    lsel = lw.select(
        F.col(key_col),
        *[F.col(c).alias(f"{left_prefix}{c}")
          for c in left.columns if c != key_col])
    rsel = rw.select(
        F.col(key_col).alias("__rk"),
        *[F.col(c).alias(f"{right_prefix}{c}")
          for c in right.columns if c != key_col])
    lt, rt = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = ((F.col(key_col) == F.col("__rk"))
            & (F.col(rt) >= F.col(lt))
            & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {upper}")))
    return lsel.join(rsel, cond, "inner").drop("__rk")
