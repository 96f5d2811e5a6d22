"""Unit tests for funnel, retention, histogram, and correlation."""

import math

import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark.operators import events as EV
from xpysom_dask_spark.operators import profile as PROF

DAY = 86_400_000_000_000


@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1: view→click→buy in order; u2: view→click only; u3: click
    # before view (click must NOT count); u4: view only
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        (2, 10, "view"), (2, 40, "click"),
        (3, 5, "click"), (3, 10, "view"), (3, 6, "other"),
        (4, 10, "view"),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_type string")


def test_funnel_strict_ordering(spark, funnel_events):
    out = {r["step"]: r for r in EV.funnel(
        funnel_events, ["view", "click", "buy"]).collect()}
    assert out[1]["n_users"] == 4
    assert out[2]["n_users"] == 2          # u3's click precedes view
    assert out[3]["n_users"] == 1
    assert out[2]["step_name"] == "click"


def test_funnel_equal_ts_counts(spark):
    # step at the SAME instant as the previous completion qualifies
    df = spark.createDataFrame([(1, 10, "a"), (1, 10, "b")],
                               "user_id bigint, ts bigint, event_type string")
    out = {r["step"]: r["n_users"]
           for r in EV.funnel(df, ["a", "b"]).collect()}
    assert out == {1: 1, 2: 1}


def test_retention_curve(spark):
    rows = [
        (1, 0 * DAY), (1, 1 * DAY), (1, 3 * DAY),
        (2, 0 * DAY), (2, 0 * DAY + 5),     # same-day repeat, one count
        (3, 1 * DAY), (3, 2 * DAY),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint")
    out = {(r["cohort"], r["offset"]): r["n_users"]
           for r in EV.retention(df).collect()}
    assert out == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_histogram_edges_and_counts(spark):
    df = spark.createDataFrame([(float(v),) for v in range(10)], "x double")
    out = {r["bin"]: r for r in
           PROF.numeric_histogram(df, "x", bins=3).collect()}
    # width = 3: bins [0,3) [3,6) [6,9]; max value 9 lands in last bin
    assert {b: out[b]["n"] for b in out} == {0: 3, 1: 3, 2: 4}
    assert out[0]["bin_lo"] == 0.0 and math.isclose(out[2]["bin_hi"], 9.0)


def test_histogram_degenerate(spark):
    one = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    out = PROF.numeric_histogram(one, "x", bins=4).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2
    empty = spark.createDataFrame([(None,)], "x double")
    assert PROF.numeric_histogram(empty, "x", bins=4).count() == 0


def test_correlation_matrix_known_values(spark):
    rows = [(1, 2, 5), (2, 4, 4), (3, 6, 3), (4, 8, 1)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint")
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in
           PROF.correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0                     # exact linear
    assert out[("a", "c")] < -0.98                    # near-perfect anti
    p = df.toPandas()
    assert math.isclose(out[("a", "c")],
                        round(p["a"].corr(p["c"]), 6), abs_tol=1e-6)


def test_correlation_constant_column_is_null(spark):
    df = spark.createDataFrame([(1, 7), (2, 7)], "a bigint, k bigint")
    out = PROF.correlation_matrix(df, ["a", "k"]).collect()
    assert out[0]["corr"] is None


def test_corpus_diff_statuses(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id bigint, fp string")
    b = spark.createDataFrame(
        [(2, "y"), (3, "zz"), (4, "w")], "id bigint, fp string")
    out = {r["id"]: r["status"] for r in
           PROF.corpus_diff(a, b, "id", "fp").collect()}
    assert out == {1: "removed", 2: "same", 3: "changed", 4: "added"}
    summary = {r["status"]: r["n"] for r in
               PROF.corpus_diff_summary(a, b, "id", "fp").collect()}
    assert summary == {"removed": 1, "same": 1, "changed": 1, "added": 1}


def test_session_paths_counts_and_order(spark):
    S = 1_000_000_000
    rows = [
        # u1 session 1: a>b ; session 2 (gap): a>b
        (1, 0 * S, "a", 1), (1, 10 * S, "b", 2),
        (1, 10_000 * S, "a", 3), (1, 10_010 * S, "b", 4),
        # u2: a>b once
        (2, 0 * S, "a", 5), (2, 5 * S, "b", 6),
        # u3: equal-ts tie broken by event_id -> b first then c
        (3, 0 * S, "c", 8), (3, 0 * S, "b", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_type string, event_id bigint")
    out = [(r["path"], r["n_sessions"]) for r in
           EV.session_paths(df, gap_s=1800, top_k=5).collect()]
    assert out[0] == ("a>b", 3)
    assert ("b>c", 1) in out


def test_group_quantiles_exact_and_approx(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + \
           [("b", 5.0), ("b", 15.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["group"]: r for r in
           PROF.group_quantiles(df, "g", "v", qs=(0.5, 0.9)).collect()}
    assert out["a"]["n"] == 100
    assert out["a"]["q_50"] == 50.5     # interpolated median of 1..100
    assert out["a"]["q_90"] == 90.1
    assert out["b"]["q_50"] == 10.0
    ap = {r["group"]: r for r in
          PROF.group_quantiles(df, "g", "v", qs=(0.5,),
                               exact=False).collect()}
    assert abs(ap["a"]["q_50"] - 50.5) <= 2.0   # sketch tolerance
    with pytest.raises(ValueError, match="quantiles"):
        PROF.group_quantiles(df, "g", "v", qs=(1.5,))


def test_quantile_buckets_deciles(spark):
    from xpysom_dask_spark.operators import sampling as smp

    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "id bigint, v double")
    out = smp.quantile_buckets(df, "v", n_buckets=4).toPandas()
    sizes = out.groupby("bucket").size()
    assert list(sizes.index) == [0, 1, 2, 3]
    assert all(20 <= s <= 30 for s in sizes)
    # monotone: higher value -> same or higher bucket
    s = out.sort_values("v")
    assert (s["bucket"].diff().dropna() >= 0).all()
    with pytest.raises(ValueError, match="n_buckets"):
        smp.quantile_buckets(df, "v", n_buckets=1)


def test_quantile_buckets_degenerate_inputs(spark):
    from xpysom_dask_spark.operators import sampling as smp

    empty = spark.createDataFrame([], "id bigint, v double")
    out = smp.quantile_buckets(empty, "v", n_buckets=4)
    assert out.count() == 0
    assert dict(out.dtypes)["bucket"] == "bigint"

    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "id bigint, v double")
    rows = smp.quantile_buckets(nulls, "v", n_buckets=4).collect()
    assert [r["bucket"] for r in rows] == [0, 0]


def test_ab_report_deterministic_and_welch(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    # 2-decimal values: the operator's documented contract (it sums in
    # exact scaled BIGINT cents, like the events.value column)
    rows = [(int(u), round(float(rng.normal(10 + (u % 2), 2)), 2))
            for u in range(400) for _ in range(3)]
    df = spark.createDataFrame(rows, "user_id bigint, value double")
    r1 = {r["variant"]: r for r in EV.ab_report(df, seed=9).collect()}
    r2 = {r["variant"]: r for r in
          EV.ab_report(df.repartition(13), seed=9).collect()}
    # identical under repartitioning (hash assignment + exact algebra)
    for k in ("A", "B"):
        assert r1[k]["n"] == r2[k]["n"]
        assert r1[k]["mean_value"] == r2[k]["mean_value"]
        assert r1[k]["t_stat"] == r2[k]["t_stat"]
    assert r1["A"]["n"] + r1["B"]["n"] == len(rows)
    # cross-check Welch t against scipy-style manual computation
    import pandas as pd
    pdf = pd.DataFrame(rows, columns=["user_id", "value"])
    from xpysom_dask_spark.operators.sampling import _unit_hash  # noqa
    got_a = {r["user_id"] for r in df.where(
        EV.F.expr(
            "CAST(conv(substring(md5(concat('9', ':', "
            "CAST(user_id AS STRING))), 1, 12), 16, 10) AS BIGINT) "
            "/ 281474976710656.0 < 0.5")).select("user_id")
        .distinct().collect()}
    a = pdf[pdf.user_id.isin(got_a)]["value"]
    b = pdf[~pdf.user_id.isin(got_a)]["value"]
    import math as m
    se = m.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert abs(r1["A"]["t_stat"] - round((a.mean() - b.mean()) / se, 4)) \
        <= 2e-4


# ---------------------------------------------------------------------- #
# round-4: observation-based pipeline metrics (plans/metrics.py)


def test_observed_metrics_ride_the_action(spark):
    from pyspark.sql import functions as F

    from xpysom_dask_spark.plans.metrics import observed

    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    kept, ob = observed(df.where("v < 5"), "keep",
                        n=F.count(F.lit(1)), s=F.sum("v"))
    assert kept.count() == 715            # the action that feeds ob
    assert ob.get == {"n": 715, "s": 1430}


def test_observed_defaults_to_row_count(spark):
    from xpysom_dask_spark.plans.metrics import observed

    df, ob = observed(spark.range(42), "default")
    df.collect()
    assert ob.get == {"n_rows": 42}


def test_funnel_counts_one_action_per_pipeline(spark):
    from pyspark.sql import functions as F

    from xpysom_dask_spark.plans.metrics import funnel_counts

    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    out = funnel_counts({"all": df,
                         "v_lt_5": df.where("v < 5"),
                         "v_lt_2": df.where("v < 2")})
    assert out == [("all", 1000), ("v_lt_5", 715), ("v_lt_2", 286)]
    assert funnel_counts({}) == []


def test_check_constraints_flags_violations(spark):
    from xpysom_dask_spark.operators import profile as PROF

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "c", 50.0), (4, "d", None)],
        "id bigint, name string, v double")
    dim = spark.createDataFrame([(1,), (2,)], "id bigint")
    rep = {(r.rule, r.col): (r.n_violations, r.passed)
           for r in PROF.check_constraints(
               df, complete=["name"], unique=["id"],
               bounds={"v": (0.0, 10.0)},
               refs={"id": (dim, "id")}).collect()}
    assert rep[("complete", "name")] == (1, False)
    assert rep[("unique", "id")] == (1, False)      # id=2 twice
    assert rep[("bounds", "v")] == (2, False)       # -1 and 50
    assert rep[("ref", "id")] == (1, False)         # id=4 not in dim


def test_check_constraints_all_pass_and_single_scan(spark):
    from xpysom_dask_spark.operators import profile as PROF

    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id bigint, v double")
    rep = PROF.check_constraints(df, complete=["id"], unique=["id"],
                                 bounds={"v": (None, 10.0)})
    assert all(r.passed for r in rep.collect())
    # no rules -> empty report, no job
    assert PROF.check_constraints(df).count() == 0


def test_skew_report_surfaces_hot_keys(spark):
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators import profile as PROF

    # 1000 rows on key 0, 10 rows each on keys 1..10
    df = spark.range(1100).select(
        F.when(F.col("id") < 1000, 0).otherwise(
            ((F.col("id") - 1000) % 10) + 1).alias("k"))
    rep = PROF.skew_report(df, "k", top=3).collect()
    assert rep[0].k == 0 and rep[0].n_rows == 1000
    assert abs(rep[0].share - 1000 / 1100) < 1e-9
    assert rep[0].x_mean == 10.0          # 1000 vs mean group size 100
    assert len(rep) == 3
