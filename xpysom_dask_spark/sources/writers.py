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


_TABLE_FORMAT_HINT = (
    "the {fmt} table format needs its Spark connector on the classpath "
    "({pkg} via spark.jars.packages, plus its catalog/extension confs) "
    "— not bundled with pip pyspark and unavailable in this "
    "environment; the exactly-once batch-directory sinks in "
    "streaming/sinks.py are the format-free equivalent")


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Delta Lake sink, gated on the delta-spark connector (ACID commits,
    time travel, ``txnAppId`` idempotent writes)."""
    try:
        df.write.format("delta").mode(mode).save(path)
    except Exception as e:
        m = str(e)
        if "data source" in m.lower() and "delta" in m.lower():
            raise ImportError(_TABLE_FORMAT_HINT.format(
                fmt="delta", pkg="io.delta:delta-spark_2.13")) from e
        raise


def write_iceberg(df: DataFrame, table: str,
                  mode: str = "overwrite") -> None:
    """Apache Iceberg sink, gated on the iceberg-spark-runtime connector
    (snapshot isolation, hidden partitioning, schema evolution)."""
    try:
        w = df.writeTo(table)
        (w.createOrReplace() if mode == "overwrite" else w.append())
    except Exception as e:
        msg = str(e)
        if ("data source" in msg.lower() and "iceberg" in msg.lower()
                or "UNSUPPORTED_FEATURE.TABLE_OPERATION" in msg
                or "CATALOG_NOT_FOUND" in msg
                or "TABLE_OR_VIEW_NOT_FOUND" in msg):
            raise ImportError(_TABLE_FORMAT_HINT.format(
                fmt="iceberg",
                pkg="org.apache.iceberg:iceberg-spark-runtime")) from e
        raise
