"""Sink layout tests: partition pruning and exchange-free bucketed joins."""

import pyspark.sql.functions as F

from xpysom_dask_spark import SparkSom
from xpysom_dask_spark.sources import readers, writers

from conftest import SF_TINY


def _plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_write_partitioned_prunes(spark, tmp_path):
    som = SparkSom(4, 4, 8, random_seed=2)
    scored = som.transform(
        readers.lineitem_features(spark, SF_TINY, keys=True),
        ("cluster_id",)).drop("features")
    path = str(tmp_path / "scored")
    writers.write_partitioned(scored, path, "cluster_id")
    back = spark.read.parquet(path)
    assert back.count() == scored.count()
    one = back.where("cluster_id = 3")
    plan = _plan(one)
    # partition filter must be recognized (pruned at planning, not a
    # row-level PushedFilters entry)
    assert "PartitionFilters" in plan and "cluster_id" in plan.split(
        "PartitionFilters", 1)[1][:200]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is a static conf; bucketed tables land in the session
    # default warehouse — drop them (and their files) when done
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    orders = readers.load_table(spark, SF_TINY, "orders") \
        .select("o_orderkey", "o_custkey")
    li = readers.load_table(spark, SF_TINY, "lineitem") \
        .select("l_orderkey", "l_quantity")
    writers.write_bucketed(orders, "t_orders_b", "o_orderkey", 8,
                           sort_by="o_orderkey")
    writers.write_bucketed(li, "t_lineitem_b", "l_orderkey", 8,
                           sort_by="l_orderkey")
    a = spark.table("t_orders_b")
    b = spark.table("t_lineitem_b")
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey) \
            .groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the join reads pre-bucketed files, so the ONLY exchange in the
        # plan is the re-key for the o_custkey aggregation — a shuffled
        # join would add two more (one per side)
        tree = plan.split("\n\n")[0]
        n_exchanges = sum(1 for line in tree.splitlines()
                          if "Exchange" in line)
        assert n_exchanges == 1, tree
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_zorder_write_tightens_rowgroup_stats_on_both_cols(spark, tmp_path):
    """The z-ordered layout must shrink per-row-group min/max spans on
    BOTH clustered columns vs the unsorted layout (that's the entire
    point: multi-column data skipping from one sort order)."""
    import pyarrow.parquet as pq

    from xpysom_dask_spark.sources import readers, writers

    li = readers.load_table(spark, SF_TINY, "lineitem") \
        .select("l_orderkey", "l_partkey", "l_quantity")

    plain = str(tmp_path / "plain")
    li.repartition(4).write.parquet(plain)
    zpath = str(tmp_path / "zordered")
    bounds = writers.write_zordered(li, zpath,
                                    ["l_orderkey", "l_partkey"],
                                    n_files=4)
    assert set(bounds) == {"l_orderkey", "l_partkey"}

    def mean_span(path, col):
        import glob
        spans, total = [], 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics:
                        spans.append(c.statistics.max - c.statistics.min)
                        total += 1
        assert total > 1
        return sum(spans) / len(spans)

    for col in ("l_orderkey", "l_partkey"):
        sp_plain = mean_span(plain, col)
        sp_z = mean_span(zpath, col)
        assert sp_z < 0.8 * sp_plain, (col, sp_z, sp_plain)

    # rows survive the re-layout intact
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_key_validation_and_degenerate_inputs(spark):
    from pyspark.sql import functions as F

    from xpysom_dask_spark.sources import writers

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 0).alias("b"))
    key, bounds = writers.zorder_key(df, ["a", "b"])
    n_distinct = df.select(key.alias("z")).distinct().count()
    assert n_distinct > 50          # constant column wastes no ordering
    assert bounds["b"] == (0.0, 0.0)

    import pytest as _pt
    with _pt.raises(ValueError):
        writers.zorder_key(df, [])
    with _pt.raises(ValueError):
        writers.zorder_key(df, ["a"], bits_per_col=63)


def test_write_training_shards_roundtrip_and_manifest(spark, tmp_path):
    import pytest as _pt

    docs = readers.load_table(spark, SF_TINY, "documents")
    path = str(tmp_path / "shards")
    # size the budget so the tiny corpus splits into several shards
    total = docs.agg(F.sum("n_chars")).first()[0]
    manifest = writers.write_training_shards(
        docs, path, "doc_id", "n_chars", shard_bytes=total // 5)
    rows = manifest.collect()
    assert 5 <= len(rows) <= 6                      # ceil sizing
    assert sum(r["rows"] for r in rows) == docs.count()
    assert sum(r["bytes"] for r in rows) == total
    # per-shard source mixture sums to the shard's row count
    for r in rows:
        assert sum(r["source_rows"].values()) == r["rows"]

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # shard dirs exist and filters on the shard column prune to them
    assert back.where("shard = 0").count() == rows[0]["rows"]

    # deterministic: same corpus, same budget -> identical assignment
    m2 = writers.write_training_shards(
        docs, str(tmp_path / "shards2"), "doc_id", "n_chars",
        shard_bytes=total // 5)
    assert sorted(map(tuple, m2.select("shard", "rows").collect())) == \
        sorted(map(tuple, manifest.select("shard", "rows").collect()))

    with _pt.raises(ValueError):
        writers.write_training_shards(docs, path, "doc_id", "n_chars",
                                      shard_bytes=0)


def test_write_training_shards_no_source_column(spark, tmp_path):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 10).alias("nb"))
    manifest = writers.write_training_shards(
        df, str(tmp_path / "s"), "doc_id", "nb", shard_bytes=400)
    rows = manifest.collect()
    assert "source_rows" not in manifest.columns
    assert sum(r["rows"] for r in rows) == 200
