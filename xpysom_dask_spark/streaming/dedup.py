"""Streaming deduplication — keyed-state exact dedup for ingest streams.

A training-data ingest stream (crawl batches, upload feeds) wants exact
duplicates dropped ON ARRIVAL, not in a nightly batch job.  Structured
Streaming's keyed dedup state is the right primitive: the content
fingerprint (operators.text.md5_fingerprint — the same normalization as
batch dedup_exact, so stream and batch decisions agree) keys the state
store, which is hash-partitioned across executors — each fingerprint's
state lives on exactly one partition, so the operator scales out with
the shuffle.

Two state-lifetime modes:

* ``ts_col=None`` — global dedup: state is kept forever.  Right for
  bounded backfills (availableNow drains); unbounded streams must
  bound state.
* ``ts_col=...`` — dedup within ``watermark`` of event time via
  ``dropDuplicatesWithinWatermark``: duplicates arriving within the
  window are dropped, state expires with the watermark.  The standard
  production configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.text import md5_fingerprint


def dedup_stream(stream_df: DataFrame, text_col: str,
                 ts_col: str | None = None,
                 watermark: str = "24 hours",
                 fp_col: str = "fp") -> DataFrame:
    """First-arrival-wins exact dedup of a (batch or streaming)
    DataFrame on the normalized-text fingerprint; appends ``fp_col``.

    Emits each fingerprint's first row (append mode downstream); later
    duplicates are swallowed by the state store.  Which physical row is
    "first" follows stream arrival order — deterministic per run for a
    file source, but the *fingerprint set* is the deterministic output
    contract (it equals the batch ``dedup_exact`` groups).
    """
    out = stream_df.withColumn(fp_col, md5_fingerprint(text_col))
    if ts_col is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark([fp_col])
    return out.dropDuplicates([fp_col])
