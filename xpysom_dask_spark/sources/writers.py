"""Sinks: partitioned / bucketed parquet writers.

The reference's only sink is a pickle of the model (S7); a 100 TB
engine also needs data sinks whose LAYOUT carries performance:

* ``write_partitioned`` — directory partitioning on low-cardinality
  keys (cluster id, language, date) so downstream filters prune whole
  directories at plan time;
* ``write_bucketed`` — hash-bucketed, optionally sorted table layout so
  repeated equi-joins/aggregations on the bucket key run with NO
  exchange: both sides of a bucketed join read pre-shuffled files.
  Bucketed tables go through the catalog (``saveAsTable``) because the
  bucket metadata lives there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_by,
                      mode: str = "overwrite") -> None:
    """Directory-partitioned parquet: filters on ``partition_by`` become
    partition pruning (no file even opened)."""
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_by: str,
                   n_buckets: int = 32, sort_by=None,
                   mode: str = "overwrite") -> None:
    """Hash-bucketed (and optionally sorted) catalog table.

    Two tables bucketed the same way on the join key co-locate their
    rows: Catalyst plans a SortMergeJoin with zero Exchange on either
    side — the shuffle was paid once at write time and is reused by
    every subsequent join/aggregation on that key.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_by)
    if sort_by is not None:
        if isinstance(sort_by, str):
            sort_by = [sort_by]
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = "gzip",
                partition_by=None) -> None:
    """JSON-Lines sink — the interchange format downstream tokenizer /
    packing jobs consume.  One object per line, one file per task
    (full write parallelism); gzip by default (3-5× smaller text,
    still line-splittable per file for readers that stream).  Optional
    directory partitioning (e.g. by split or language) so consumers
    prune at plan time.
    """
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by is not None:
        if isinstance(partition_by, str):
            partition_by = [partition_by]
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by=None, compression: str = "zstd") -> None:
    """ORC sink (zstd by default) — the columnar interchange format for
    Hive/Trino-side consumers.  Same pruning/pushdown story as parquet
    (stripe-level statistics, predicate pushdown, column projection);
    optional directory partitioning composes with partition pruning.
    """
    w = df.write.mode(mode).option("compression", compression)
    if partition_by is not None:
        if isinstance(partition_by, str):
            partition_by = [partition_by]
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite",
               **options) -> None:
    """Avro sink — see ``readers.load_avro``; gated on the external
    spark-avro module with an actionable error when absent."""
    from .readers import _reraise_if_avro_missing

    w = df.write.mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    try:
        w.format("avro").save(path)
    except Exception as e:
        _reraise_if_avro_missing(e)
        raise
