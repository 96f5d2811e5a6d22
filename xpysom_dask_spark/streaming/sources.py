"""Streaming source wrappers.

File streams are the engine's production path (parquet/JSONL
directories with schema pinned); the rate sources here are the
load-generation harness — deterministic row production at a configured
throughput, for soak tests and sink/backpressure experiments without
standing up a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def rate_stream(spark: SparkSession, rows_per_second: int = 1000,
                num_partitions: int | None = None,
                ramp_up_seconds: int = 0) -> DataFrame:
    """Wall-clock rate source: ``timestamp, value`` rows produced at
    ``rows_per_second`` (Spark's built-in ``rate`` format).  Throughput
    is wall-clock-driven, so totals depend on how long the query runs —
    use :func:`rate_micro_batch_stream` when a test needs exact
    per-batch row counts.
    """
    r = (spark.readStream.format("rate")
         .option("rowsPerSecond", int(rows_per_second)))
    if num_partitions is not None:
        r = r.option("numPartitions", int(num_partitions))
    if ramp_up_seconds:
        r = r.option("rampUpTime", f"{int(ramp_up_seconds)}s")
    return r.load()


def rate_micro_batch_stream(spark: SparkSession,
                            rows_per_batch: int = 1000,
                            num_partitions: int | None = None,
                            start_timestamp_ms: int = 0,
                            advance_ms: int = 1000) -> DataFrame:
    """Deterministic rate source: EXACTLY ``rows_per_batch`` rows per
    micro-batch with timestamps advancing ``advance_ms`` per batch
    (Spark's ``rate-micro-batch`` format) — reproducible load tests:
    the same trigger count always yields the same rows, independent of
    wall clock and scheduler jitter.
    """
    r = (spark.readStream.format("rate-micro-batch")
         .option("rowsPerBatch", int(rows_per_batch))
         .option("startTimestamp", int(start_timestamp_ms))
         .option("advanceMillisPerBatch", int(advance_ms)))
    if num_partitions is not None:
        r = r.option("numPartitions", int(num_partitions))
    return r.load()
