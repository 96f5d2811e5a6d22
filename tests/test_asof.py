"""As-of join vs the pandas merge_asof oracle (backward/forward/
tolerance), plus the no-join-node plan property."""

import numpy as np
import pandas as pd
import pytest

from xpysom_dask_spark.operators.events import asof_join


@pytest.fixture(scope="module")
def asof_data(spark):
    rng = np.random.RandomState(4)
    left = pd.DataFrame({
        "k": rng.randint(0, 5, 200),
        "ts": rng.randint(0, 10_000, 200).astype("int64"),
        "lv": np.arange(200, dtype="int64"),
    }).sort_values(["ts", "lv"]).reset_index(drop=True)
    # unique (k, ts) on the right: deterministic match for both engines
    right = (pd.DataFrame({
        "k": rng.randint(0, 5, 120),
        "ts": rng.randint(0, 10_000, 120).astype("int64"),
        "rv": rng.randint(0, 1000, 120).astype("int64"),
    }).drop_duplicates(["k", "ts"]).sort_values("ts")
        .reset_index(drop=True))
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    return left, right, ldf, rdf


@pytest.mark.parametrize("direction,tolerance", [
    ("backward", None), ("forward", None), ("backward", 500),
])
def test_asof_matches_pandas(spark, asof_data, direction, tolerance):
    left, right, ldf, rdf = asof_data
    got = (asof_join(ldf, rdf, "k", "ts", "ts", ["rv"],
                     direction=direction, tolerance=tolerance)
           .toPandas().sort_values(["k", "ts", "lv"])
           .reset_index(drop=True))
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction=direction,
        tolerance=None if tolerance is None else tolerance,
        suffixes=("", "_r")).sort_values(["k", "ts", "lv"]) \
        .reset_index(drop=True)
    assert len(got) == len(exp) == len(left)
    a = got["rv_asof"].astype("float64")
    b = exp["rv"].astype("float64")
    pd.testing.assert_series_equal(a, b, check_names=False)


def test_asof_plan_has_no_join_node(spark, asof_data):
    _, _, ldf, rdf = asof_data
    out = asof_join(ldf, rdf, "k", "ts", "ts", ["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan          # union + window, no join operator
    assert plan.count("Exchange") <= 2  # one for the window (+AQE reuse)


def test_interval_join_matches_bruteforce(spark):
    """Bucketed interval join == brute-force range predicate, and the
    plan is an equi-join (SortMerge/Hash), never BNLJ/cartesian."""
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators.events import interval_join

    rng = np.random.RandomState(9)
    pts = [(int(k), int(t), i) for i, (k, t) in
           enumerate(zip(rng.randint(0, 4, 300),
                         rng.randint(0, 5000, 300)))]
    ivs = []
    for j in range(80):
        s = int(rng.randint(0, 4800))
        ivs.append((int(rng.randint(0, 4)), s, s + int(rng.randint(1, 400)),
                    j))
    pdf = spark.createDataFrame(pts, "k bigint, ts bigint, pid bigint")
    idf = spark.createDataFrame(ivs, "k bigint, start bigint, end bigint, "
                                "iid bigint")
    out = interval_join(pdf, idf, "ts", "start", "end", key_cols="k",
                        bucket_width=200)
    got = {(r.pid, r.iid) for r in out.collect()}
    brute = {(p[2], v[3]) for p in pts for v in ivs
             if p[0] == v[0] and v[1] <= p[1] <= v[2]}
    assert got == brute and len(brute) > 100

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pdf, idf, "ts", "start", "end")


def test_asof_tie_break_deterministic(spark):
    """Equal-(key, ts) right rows: tie_break picks the max tie-break row
    — stable under repartition, and row-ATOMIC (the winner's NULL value
    column must not fall back to a losing row's value)."""
    left = spark.createDataFrame(
        [(1, 100, 0), (1, 200, 1)], "k bigint, ts bigint, lv bigint")
    right = spark.createDataFrame(
        [(1, 100, 10, 1), (1, 100, 20, 3), (1, 100, None, 2)],
        "k bigint, ts bigint, rv bigint, pri bigint")
    for n_part in (1, 7):
        got = (asof_join(left.repartition(n_part),
                         right.repartition(n_part), "k", "ts", "ts",
                         ["rv"], tie_break="pri")
               .toPandas().sort_values("lv").reset_index(drop=True))
        # winner is pri=3 -> rv=20 for both left rows
        assert got["rv_asof"].tolist() == [20, 20]

    # winner pri=3 has rv=NULL -> the carried match keeps it NULL
    right2 = spark.createDataFrame(
        [(1, 100, 10, 1), (1, 100, None, 3)],
        "k bigint, ts bigint, rv bigint, pri bigint")
    got2 = asof_join(left, right2, "k", "ts", "ts", ["rv"],
                     tie_break="pri").toPandas()
    assert got2["rv_asof"].isna().all()
    assert (got2["ts_asof"] == 100).all()

    # unknown tie_break column raises
    with pytest.raises(ValueError, match="tie_break"):
        asof_join(left, right, "k", "ts", "ts", ["rv"], tie_break="nope")


def test_asof_forward_tie_break(spark):
    """Forward direction with ties: same max-tie-break winner."""
    left = spark.createDataFrame([(1, 50, 0)], "k bigint, ts bigint, lv bigint")
    right = spark.createDataFrame(
        [(1, 100, 10, 2), (1, 100, 20, 9), (1, 60, 5, 1)],
        "k bigint, ts bigint, rv bigint, pri bigint")
    got = asof_join(left, right, "k", "ts", "ts", ["rv"],
                    direction="forward", tie_break="pri").toPandas()
    # earliest at-or-after is ts=60 (no tie): rv=5
    assert got["rv_asof"].tolist() == [5]
    left2 = spark.createDataFrame([(1, 80, 0)],
                                  "k bigint, ts bigint, lv bigint")
    got2 = asof_join(left2, right, "k", "ts", "ts", ["rv"],
                     direction="forward", tie_break="pri").toPandas()
    assert got2["rv_asof"].tolist() == [20]  # pri=9 wins the ts=100 tie
