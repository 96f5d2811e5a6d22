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
