

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
