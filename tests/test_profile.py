

def test_ewma_drops_null_timestamps(spark):
    """ADVICE r6: Spark ASC sorts NULLS FIRST, DuckDB's default is
    NULLS LAST — a NULL-ts row would sit at opposite ends of each
    engine's series and diverge the whole key's EWMA.  The operator
    drops NULL timestamps exactly like NULL values."""
    from xpysom_dask_spark.operators import profile as PRF

    df = spark.createDataFrame(
        [(1, "k", 10.0, 100), (2, "k", 20.0, None), (3, "k", 30.0, 200)],
        "event_id bigint, event_type string, value double, ts bigint")
    out = {r["id"]: r["ewma"] for r in PRF.ewma(
        df, "event_type", "value", "ts", "event_id",
        alpha=0.5, lag=4).collect()}
    assert set(out) == {1, 3}
    assert out[1] == 10.0
    # id=3's frame is [10, 30] (the NULL-ts row contributes nothing):
    # (30*1 + 10*0.5) / 1.5
    assert out[3] == round(35.0 / 1.5, 6)


def test_parquet_pruning_audit_sorted_vs_random(spark, tmp_path):
    """Footer-stats pruning: a value-sorted layout must let a narrow
    range predicate skip most row groups; the same data written in
    hash-random order must skip ~none; the pruned-row count must
    equal an exact pyarrow recomputation of the skipping rule."""
    import pyarrow.parquet as pq
    import pytest
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators.profile import parquet_pruning_audit

    df = spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("pad"))
    srt = str(tmp_path / "sorted")
    rnd = str(tmp_path / "random")
    # small row groups so one file holds many prunable units
    (df.orderBy("k").coalesce(2).write
       .option("parquet.block.size", 64 * 1024).parquet(srt))
    (df.orderBy(F.md5(F.col("k").cast("string"))).coalesce(2).write
       .option("parquet.block.size", 64 * 1024).parquet(rnd))

    lo, hi = 10_000, 19_999
    a_srt = parquet_pruning_audit(spark, srt, "k", lo, hi) \
        .agg(F.sum("n_rows").alias("n"),
             F.sum("rows_pruned").alias("p"),
             F.sum("n_row_groups").alias("g"),
             F.sum("rg_pruned").alias("gp"),
             F.sum("rg_no_stats").alias("ns")).first()
    a_rnd = parquet_pruning_audit(spark, rnd, "k", lo, hi) \
        .agg(F.sum("n_rows").alias("n"),
             F.sum("rows_pruned").alias("p"),
             F.sum("rg_no_stats").alias("ns")).first()
    assert a_srt["n"] == a_rnd["n"] == 200_000
    assert a_srt["ns"] == 0 and a_rnd["ns"] == 0
    assert a_srt["g"] > 4, "row groups too coarse for the test"
    # sorted: predicate covers 5% of rows -> most groups disjoint
    assert a_srt["p"] >= 0.7 * (200_000 - (hi - lo + 1))
    assert a_srt["gp"] >= 1
    # random: every group straddles the range -> nothing prunable
    assert a_rnd["p"] == 0

    # exact recomputation of the skipping rule via pyarrow
    import glob
    expect = 0
    for f in glob.glob(srt + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        ci = md.schema.names.index("k")
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(ci).statistics
            if st.max < lo or st.min > hi:
                expect += md.row_group(i).num_rows
    assert a_srt["p"] == expect

    with pytest.raises(ValueError, match="column"):
        parquet_pruning_audit(spark, srt, "nope", 0, 1)
    # a missing path fails loudly at plan time (Spark's reader)
    with pytest.raises(Exception, match="PATH_NOT_FOUND|no files"):
        parquet_pruning_audit(spark, str(tmp_path / "missing"), "k",
                              0, 1)


def test_parquet_column_stats_nulls_and_multifile(spark, tmp_path):
    """Footer rollup across several files/row groups with NULLs: value
    and null counts are exact, min/max span all row groups, and a
    missing column fails loudly driver-side."""
    import pytest
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators.profile import parquet_column_stats

    df = spark.range(50_000).select(
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id"))
        .alias("v"),
        (F.col("id") * 2).alias("w"))
    out = str(tmp_path / "t")
    (df.repartition(3).write
       .option("parquet.block.size", 64 * 1024).parquet(out))
    got = {r["column"]: r for r in
           parquet_column_stats(spark, out, ["v", "w"]).collect()}
    n_null = 50_000 - df.where("v is not null").count()
    assert got["v"]["n_values"] == 50_000
    assert got["v"]["null_count"] == n_null
    assert got["v"]["min_val"] == 1 and got["v"]["max_val"] == 49_999
    assert got["w"]["null_count"] == 0
    assert got["w"]["min_val"] == 0 and got["w"]["max_val"] == 99_998
    assert got["v"]["n_row_groups"] >= 3  # >= one group per file
    with pytest.raises(ValueError, match="nope"):
        parquet_column_stats(spark, out, ["nope"])


def test_parquet_audits_reject_non_integer_columns(spark):
    """r11 ADVICE: a string/date column must fail driver-side with a
    clear ValueError, not an opaque executor stage error from
    int(st.min) (or a silent bytes-vs-int miscompare)."""
    import pytest

    from xpysom_dask_spark.operators.profile import (
        parquet_column_stats, parquet_pruning_audit)

    from conftest import SF_TINY

    path = f"{SF_TINY}/documents.parquet"
    with pytest.raises(ValueError, match="integer-typed"):
        parquet_pruning_audit(spark, path, "lang", lo=0, hi=10)
    with pytest.raises(ValueError, match="integer-typed"):
        parquet_column_stats(spark, path, ["doc_id", "text"])
    # integer columns still pass the check and run
    assert parquet_column_stats(spark, path, ["doc_id"]).count() == 1


def test_pruning_audit_multi_matches_single(spark):
    """parquet_pruning_audit_multi is the one-footer-walk N-column
    form; per column it must equal the single-column audit exactly."""
    from conftest import SF_TINY
    from xpysom_dask_spark.operators.profile import (
        parquet_pruning_audit, parquet_pruning_audit_multi)

    path = f"{SF_TINY}/lineitem.parquet"
    cols = ["l_orderkey", "l_linenumber"]
    multi = parquet_pruning_audit_multi(spark, path, cols,
                                        lo=0, hi=50).collect()
    for c in cols:
        single = sorted(tuple(r) for r in parquet_pruning_audit(
            spark, path, c, lo=0, hi=50).collect())
        part = sorted(tuple(v for k, v in r.asDict().items()
                            if k != "column")
                      for r in multi if r["column"] == c)
        assert part == single and len(single) >= 1
