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


def zorder_key(df: DataFrame, cols, bits_per_col: int | None = None):
    """Morton (Z-order) key expression over up to 8 numeric/timestamp
    columns, as a codegen'd Column plus the stats row it was built from.

    Each column is min-max scaled to ``bits_per_col`` bits (one
    aggregate job for all bounds — the literals then fold into the
    expression), and the bit strings interleave into one BIGINT.  Rows
    close in z-key are close in EVERY dimension, so parquet row-group
    min/max stats stay tight on all of them at once — multi-column data
    skipping from a single sort order, where a plain ``ORDER BY a, b``
    only skips on ``a``.

    Min-max scaling is the cheap standard; heavily skewed columns waste
    code space (pre-transform them, e.g. log, before z-ordering).
    Returns ``(key_column, bounds_dict)``.
    """
    from pyspark.sql import functions as F

    cols = list(cols)
    if not 1 <= len(cols) <= 8:
        raise ValueError(f"zorder_key takes 1-8 columns, got {len(cols)}")
    if bits_per_col is None:
        bits_per_col = min(16, 62 // len(cols))
    if bits_per_col * len(cols) > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits exceeds the 62-bit "
            "positive-BIGINT budget")

    num = [f"CAST({c} AS DOUBLE)" for c in cols]
    bounds = df.agg(*[e for i, n in enumerate(num) for e in
                      (F.expr(f"min({n})").alias(f"lo{i}"),
                       F.expr(f"max({n})").alias(f"hi{i}"))]).first()
    top = (1 << bits_per_col) - 1
    scaled = []
    for i, n in enumerate(num):
        lo, hi = bounds[f"lo{i}"], bounds[f"hi{i}"]
        if lo is None:               # empty input / all-NULL column
            scaled.append("CAST(0 AS BIGINT)")
            continue
        span = (hi - lo) or 1.0
        scaled.append(
            f"CAST(least({top}, greatest(0, "
            f"floor((coalesce({n}, {lo!r}) - {lo!r}) / {span!r} * {top + 1})"
            f")) AS BIGINT)")
    terms = [f"((({s} >> {b}) & 1) << {b * len(cols) + j})"
             for j, s in enumerate(scaled) for b in range(bits_per_col)]
    key = F.expr("(" + " + ".join(terms) + ")")
    return key, {c: (bounds[f"lo{i}"], bounds[f"hi{i}"])
                 for i, c in enumerate(cols)}


def write_zordered(df: DataFrame, path: str, zorder_by,
                   n_files: int | None = None, mode: str = "overwrite",
                   bits_per_col: int | None = None) -> dict:
    """Z-order-clustered parquet: range-partition + sort on the Morton
    key of ``zorder_by``, then drop the key before writing.

    The layout cost is one extra range shuffle at write time; the
    payoff is that row-group min/max statistics are simultaneously
    tight on every z-ordered column, so selective filters on ANY of
    them skip most row groups (and with file-level stats, most files)
    — the same locality trick Delta's OPTIMIZE ZORDER BY applies,
    expressed with stock Spark + parquet.  Returns the per-column
    bounds used for the key (persist them beside the data if readers
    want to reconstruct key ranges).
    """
    from pyspark.sql import functions as F

    if isinstance(zorder_by, str):
        zorder_by = [zorder_by]
    key, bounds = zorder_key(df, zorder_by, bits_per_col)
    zdf = df.withColumn("__z", key)
    zdf = (zdf.repartitionByRange(n_files, "__z") if n_files
           else zdf.repartitionByRange("__z"))
    (zdf.sortWithinPartitions("__z").drop("__z")
        .write.mode(mode).parquet(path))
    return bounds


def shard_assignments(df: DataFrame, id_col: str, bytes_col: str,
                      shard_bytes: int, seed: int = 0,
                      shard_col: str = "shard") -> DataFrame:
    """Append the shard id :func:`write_training_shards` would write
    under — exposed separately so layout can be audited (or joined)
    without a write.  ``shard = pmod(unit_hash(seed, id), n)`` with
    ``n = ceil(Σ bytes / shard_bytes)`` from one aggregate; the mod
    (not floor(u·n/2^48)) avoids BIGINT overflow past ~32 k shards
    (a 100 TB corpus at 256 MB shards is ~400 k), at a uniformity
    bias of n/2^48 — immaterial."""
    from pyspark.sql import functions as F

    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be > 0, got {shard_bytes}")
    total = df.agg(F.sum(F.col(bytes_col).cast("bigint"))
                   .alias("b")).first()["b"] or 0
    n_shards = max(1, -(-int(total) // int(shard_bytes)))
    u = (f"CAST(conv(substring(md5(concat('{seed}', ':', "
         f"CAST({id_col} AS STRING))), 1, 12), 16, 10) AS BIGINT)")
    return df.withColumn(shard_col, F.expr(f"pmod({u}, {n_shards})"))


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          bytes_col: str, shard_bytes: int = 256 << 20,
                          seed: int = 0, mode: str = "overwrite",
                          shard_col: str = "shard") -> DataFrame:
    """Export a curated corpus as ~equal-size training shards plus a
    manifest — the final-mile sink of a data pipeline (training loaders
    want fixed-size, internally-unordered shard files, not one giant
    directory).

    Sharding is the scalable hash-mod rule: ``shard = u mod n`` over
    the engine's deterministic ``(seed, id)`` 48-bit hash, where
    ``n = ceil(Σ bytes / shard_bytes)`` comes from ONE aggregate over
    ``bytes_col`` — no global sort, no cumulative window, no driver
    loop; shard sizes concentrate around ``shard_bytes`` by hash
    uniformity (CLT: ±a few % at thousands of docs per shard).  The
    hash is the stable engine-wide (seed, id) fold, so re-exporting
    the same corpus with the same ``n`` reproduces every shard
    bit-for-bit (modulo parquet row order within a shard).

    Writes directory-partitioned parquet (``shard=K/``) and RETURNS the
    manifest DataFrame — one row per shard: row count, payload bytes,
    and per-source row counts (the mixture a loader should expect) —
    which the caller typically also persists next to the data.
    """
    from pyspark.sql import functions as F

    tagged = shard_assignments(df, id_col, bytes_col, shard_bytes,
                               seed=seed, shard_col=shard_col)
    tagged.write.mode(mode).partitionBy(shard_col).parquet(path)
    source_mix = ([F.map_from_entries(F.collect_list(
        F.struct("source", "src_rows"))).alias("source_rows")]
        if "source" in df.columns else [])
    per = tagged.groupBy(shard_col, *(["source"] if source_mix else []))
    agg = per.agg(F.count(F.lit(1)).alias("src_rows"),
                  F.sum(F.col(bytes_col).cast("bigint")).alias("src_bytes"))
    if source_mix:
        manifest = (agg.groupBy(shard_col)
                    .agg(F.sum("src_rows").alias("rows"),
                         F.sum("src_bytes").alias("bytes"),
                         *source_mix))
    else:
        manifest = agg.select(shard_col,
                              F.col("src_rows").alias("rows"),
                              F.col("src_bytes").alias("bytes"))
    return manifest.orderBy(shard_col)
