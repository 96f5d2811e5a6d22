"""Streaming sketch maintenance.

A sketch whose cells are order-free sums or maxes is AUTOMATICALLY a
streaming operator: the same ``groupBy`` that builds it in batch runs
as a stateful streaming aggregation whose state IS the sketch —
bounded at depth·width (CM) or 2^p (HLL) rows by construction, the
rare stateful streaming shape that needs NO watermark to stay bounded.
The drained stream equals the batch sketch exactly (additive/max
cells, no ordering anywhere), which is the gate contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import _h48


def cms_stream(stream_df: DataFrame, key_col: str,
               count_col: str | None = None,
               depth: int = 4, width: int = 1024) -> DataFrame:
    """Streaming twin of :func:`~..operators.sketches.count_min_sketch`:
    maintain the (d, w, count) cell relation over an unbounded keyed
    stream.  Use COMPLETE output mode (the state is the ≤ depth·width-
    row sketch itself — tiny forever); the drained result of a bounded
    replay is the batch sketch bit-for-bit.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got "
                         f"depth={depth}, width={width}")
    cnt = (F.col(count_col).cast("bigint") if count_col
           else F.lit(1).cast("bigint"))
    rows = None
    for d in range(depth):
        r = stream_df.select(
            F.lit(d).alias("d"),
            (_h48(F.col(key_col), d) % width).cast("int").alias("w"),
            cnt.alias("__c"))
        rows = r if rows is None else rows.unionByName(r)
    return (rows.groupBy("d", "w")
            .agg(F.sum("__c").cast("bigint").alias("count")))


def hist_stream(stream_df: DataFrame, value_col: str,
                lo: float, hi: float, bins: int = 128,
                group_cols: tuple = ()) -> DataFrame:
    """Streaming twin of
    :func:`~..operators.sketches.histogram_sketch`: maintain the
    ``(*group_cols, bin, count)`` cell relation over an unbounded
    stream — state bounded at groups·bins rows by construction (the
    fixed [lo, hi) grid is what makes the streaming form possible:
    adaptive sketches re-center buckets and cannot be a pure
    streaming aggregation).  COMPLETE mode; drained == batch
    bit-for-bit (additive integer cells)."""
    if bins < 1 or not hi > lo:
        raise ValueError(
            f"need bins >= 1 and hi > lo; got bins={bins}, "
            f"lo={lo}, hi={hi}")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo)))
                  * F.lit(bins / (hi - lo))).cast("int")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return (stream_df.where(v.isNotNull())
            .select(*g, b.alias("bin"))
            .groupBy(*g, "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("count")))


def hll_stream(stream_df: DataFrame, key_col: str,
               p: int = 9) -> DataFrame:
    """Streaming twin of :func:`~..operators.sketches.hll_registers`:
    maintain the (bucket, rho) register relation (max per bucket) over
    a stream — ≤ 2^p rows of state, COMPLETE mode, drained == batch."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    rem_bits = 48 - p
    h = _h48(F.col(key_col), 0)
    bucket = F.shiftright(h, rem_bits).cast("int")
    rem = h % F.lit(1 << rem_bits).cast("bigint")
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.conv(rem, 10, 2)))
    return (stream_df.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").cast("int").alias("rho")))


def psi_stream(stream_df: DataFrame, value_col: str,
               ref_cells: DataFrame, lo: float, hi: float,
               bins: int = 20) -> DataFrame:
    """Live PSI drift monitor: maintain the ``(bin, ca, cb)`` cell
    relation over an unbounded stream — ``cb`` is the stream's
    :func:`hist_stream` histogram (stateful aggregation, state ≤ bins
    rows by construction), ``ca`` rides a broadcast stream-static
    join against the STATIC reference snapshot's
    :func:`~..operators.sketches.histogram_sketch` cells.  COMPLETE
    output mode; the drift ALARM is constant-time batch arithmetic
    over the drained ≤ bins rows via
    :func:`~..operators.profile.psi_terms_from_cells` — Structured
    Streaming forbids a second aggregation (the totals) in the same
    query, and a static-LEFT outer join (which would carry the full
    spine) is unsupported, so bins the stream never touched are
    ABSENT from the output; the reader completes the spine with
    cb-side rows coalesced from the reference (the gate replays
    exactly that).  This split keeps the streaming query a pure
    bounded-state aggregation — the shape that survives an unbounded
    100 TB/day ingest — and the probability arithmetic in one shared,
    engine-exact batch tail."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    cells = hist_stream(stream_df, value_col, lo, hi, bins) \
        .withColumnRenamed("count", "cb")
    ref = ref_cells.select(F.col("bin").cast("int").alias("bin"),
                           F.col("count").cast("bigint").alias("ca"))
    return (cells.join(F.broadcast(ref), "bin", "left")
            .select("bin", F.coalesce("ca", F.lit(0)).cast("bigint")
                    .alias("ca"), F.col("cb").cast("bigint")))


def psi_complete_spine(drained: DataFrame, ref_cells: DataFrame,
                       bins: int) -> DataFrame:
    """Spine completion for a drained :func:`psi_stream` table: bins
    the stream never observed re-enter with their reference count and
    cb = 0, yielding the completed ``(bin, ca, cb)`` relation
    :func:`~..operators.profile.psi_terms_from_cells` expects."""
    spine = (ref_cells.sparkSession.range(1)
             .select(F.explode(F.sequence(F.lit(0), F.lit(bins - 1)))
                     .alias("__b"))
             .select(F.col("__b").cast("int").alias("bin")))
    ref = ref_cells.select(F.col("bin").cast("int").alias("bin"),
                           F.col("count").cast("bigint").alias("__ca"))
    return (spine.join(ref, "bin", "left")
            .join(drained.select("bin", "cb"), "bin", "left")
            .select("bin",
                    F.coalesce("__ca", F.lit(0)).cast("bigint")
                    .alias("ca"),
                    F.coalesce("cb", F.lit(0)).cast("bigint")
                    .alias("cb")))


def ivf_drift_stream(stream_cells: DataFrame,
                     occupancy: DataFrame) -> DataFrame:
    """Live IVF index-health monitor: the streaming twin of
    :func:`~..operators.similarity.ivf_ingest_drift` — maintain the
    arriving vectors' per-cell assignment counts as a stateful
    aggregation (state ≤ n_cells rows by construction, no watermark)
    and attach the STATIC index occupancy per trigger via a broadcast
    stream-static join.  ``stream_cells`` is the vector stream already
    scored by the index's frozen codebook (``score_stream`` /
    ``classify``-side assignment — the same stateless pass the batch
    twin uses); ``occupancy`` is
    :func:`~..operators.similarity.ivf_occupancy` of the index.

    COMPLETE output mode; like :func:`psi_stream`, cells the stream
    never touched are ABSENT — the reader completes the spine
    (:func:`psi_complete_spine` with the occupancy renamed to
    ``(bin, count)``) and feeds
    :func:`~..operators.profile.psi_terms_from_cells`, so the live
    append-vs-retrain PSI is constant-time batch arithmetic over
    ≤ n_cells drained rows, bit-identical to the batch audit on the
    same data (pinned by test)."""
    cells = (stream_cells.groupBy(F.col("cluster_id").cast("int")
                                  .alias("bin"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("cb")))
    ref = occupancy.select(F.col("cluster_id").cast("int").alias("bin"),
                           F.col("n").cast("bigint").alias("ca"))
    return (cells.join(F.broadcast(ref), "bin", "left")
            .select("bin",
                    F.coalesce("ca", F.lit(0)).cast("bigint")
                    .alias("ca"), "cb"))
