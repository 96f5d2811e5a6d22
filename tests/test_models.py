"""Linear-probe (ridge) training/scoring vs the numpy closed form."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark.operators import models


def _data(spark, n=500, d=3, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    beta = np.arange(1, d + 1, dtype=float)
    y = X @ beta + 2.5 + rng.normal(0, noise, n)
    rows = [tuple(map(float, X[i])) + (float(y[i]),) for i in range(n)]
    cols = [f"f{i}" for i in range(d)]
    return (spark.createDataFrame(rows, cols + ["y"]), X, y, cols)


def _ref_ridge(X, y, l2):
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    d = X.shape[1]
    coef = np.linalg.solve(Xc.T @ Xc + l2 * np.eye(d), Xc.T @ yc)
    return coef, y.mean() - X.mean(axis=0) @ coef


@pytest.mark.parametrize("l2", [0.0, 1e-6, 10.0])
def test_ridge_fit_matches_numpy_closed_form(spark, l2):
    df, X, y, cols = _data(spark)
    m = models.ridge_fit(df, cols, "y", l2=l2)
    coef, inter = _ref_ridge(X, y, l2)
    assert m["n"] == len(y)
    np.testing.assert_allclose(m["coef"], coef, atol=1e-8)
    assert m["intercept"] == pytest.approx(inter, abs=1e-8)


def test_ridge_fit_partitioning_stable_and_null_rows_dropped(spark):
    df, X, y, cols = _data(spark, n=300)
    withnull = df.unionByName(
        spark.createDataFrame([(None, 0.0, 0.0, 5.0)], df.schema))
    a = models.ridge_fit(withnull.coalesce(1), cols, "y")
    b = models.ridge_fit(withnull.repartition(7), cols, "y")
    assert a["n"] == b["n"] == 300
    np.testing.assert_allclose(a["coef"], b["coef"], atol=1e-9)


def test_ridge_score_is_codegen_linear_expression(spark):
    df, X, y, cols = _data(spark, n=200)
    m = models.ridge_fit(df, cols, "y", l2=1e-6)
    scored = models.ridge_score(df, m)
    got = np.array([r["probe_score"]
                    for r in scored.select("probe_score").collect()])
    want = X @ m["coef"] + m["intercept"]
    np.testing.assert_allclose(np.sort(got), np.sort(want), atol=1e-9)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_probe_filter_keeps_top_fraction(spark):
    df, X, y, cols = _data(spark, n=1000)
    m = models.ridge_fit(df, cols, "y")
    kept = models.probe_filter(df, m, keep_fraction=0.25,
                               id_col="f0").collect()
    assert 200 <= len(kept) <= 300          # sketch-approximate quartile
    scores = np.array([r["probe_score"] for r in kept])
    # kept scores dominate: their min is above the population median
    all_scores = X @ m["coef"] + m["intercept"]
    assert scores.min() >= np.median(all_scores)
    assert models.probe_filter(df, m, 1.0, "f0").count() == 1000


def test_validation_errors(spark):
    df, _, _, cols = _data(spark, n=10)
    with pytest.raises(ValueError, match="features"):
        models.ridge_fit(df, [f"f{i}" for i in range(100)], "y")
    with pytest.raises(ValueError, match="l2"):
        models.ridge_fit(df, cols, "y", l2=-1.0)
    with pytest.raises(ValueError, match="keep_fraction"):
        models.probe_filter(df, {"cols": cols, "coef": [0, 0, 0],
                                 "intercept": 0.0}, 0.0, "f0")
    with pytest.raises(ValueError, match="no rows"):
        models.ridge_fit(df.where("y > 1e18"), cols, "y")


def test_ridge_fit_exact_decimals_bit_identical_under_repartition(spark):
    rng = np.random.default_rng(11)
    n = 400
    X = np.round(rng.normal(0, 50, size=(n, 2)), 2)
    y = np.round(X @ np.array([1.5, -0.75]) + 3 +
                 rng.normal(0, 1, n), 2)
    rows = [(float(X[i, 0]), float(X[i, 1]), float(y[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows, ["a", "b", "y"])
    dec = {"a": 2, "b": 2, "y": 2}
    m1 = models.ridge_fit(df.coalesce(1), ["a", "b"], "y",
                          l2=1e-6, decimals=dec)
    m7 = models.ridge_fit(df.repartition(7), ["a", "b"], "y",
                          l2=1e-6, decimals=dec)
    # EXACT equality: integer sums make the fit a pure function of
    # the data, not the partitioning
    assert list(m1["coef"]) == list(m7["coef"])
    assert m1["intercept"] == m7["intercept"]
    coef, inter = _ref_ridge(X, y, 1e-6)
    np.testing.assert_allclose(m1["coef"], coef, rtol=1e-9)
    assert m1["intercept"] == pytest.approx(inter, abs=1e-8)
    with pytest.raises(ValueError, match="decimals must cover"):
        models.ridge_fit(df, ["a", "b"], "y", decimals={"a": 2})
