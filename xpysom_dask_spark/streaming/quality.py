"""Streaming data-quality monitoring: constraint validation per
micro-batch, accumulated as an auditable parquet log.

The batch-side :func:`~xpysom_dask_spark.operators.profile.check_constraints`
report runs inside ``foreachBatch`` — same single-scan rule batching —
stamped with the batch id and appended to a parquet directory, so a
long-running ingest stream leaves a queryable history of when a feed
went bad (nulls appearing, duplicate keys, referential drift) instead
of a log line that scrolled away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_monitor_stream(stream_df: DataFrame, report_path: str,
                           checkpoint: str,
                           complete=(), unique=(), bounds=None,
                           refs=None, trigger_once: bool = True):
    """Attach a per-micro-batch constraint report to ``stream_df``.

    Every batch appends its ``(batch_id, rule, col, n_violations,
    passed)`` rows to ``report_path``.  NB ``unique`` here means
    unique WITHIN each micro-batch — cross-batch uniqueness needs the
    keyed-state dedup operator (streaming/dedup.py), not an aggregate.
    Returns the started ``StreamingQuery``.
    """
    from ..operators.profile import check_constraints

    def _audit(batch_df, batch_id):
        rep = check_constraints(batch_df, complete=complete,
                                unique=unique, bounds=bounds, refs=refs)
        (rep.withColumn("batch_id", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("append").parquet(report_path))

    w = (stream_df.writeStream.foreachBatch(_audit)
         .option("checkpointLocation", checkpoint))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
