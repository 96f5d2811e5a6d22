#!/usr/bin/env python
"""Analytics tour: the relational/behavioral/profiling surface added in
round 3 — TPC-H classics, conversion funnel, cohort retention, column
profiling, histogram, correlation, dataset diff, and the temperature
mixer.  Every stage is a declarative Spark plan whose shape survives a
1000-executor cluster (see PLANS.md for the per-operator notes).

Run:  python examples/analytics_suite.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import events as EV  # noqa: E402
from xpysom_dask_spark.operators import profile as PROF  # noqa: E402
from xpysom_dask_spark.operators import sampling  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir: str) -> None:
    spark = make_session("analytics-suite", master="local[4]",
                         shuffle_partitions=8)

    import __spark_entry__ as entry
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region", "part"):
        readers.load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    print("== TPC-H Q1 (pricing summary) ==")
    spark.sql(entry._TPCH_Q1_SQL).show(truncate=False)
    print("== TPC-H Q5 (revenue by nation, ASIA) ==")
    spark.sql(entry._TPCH_Q5_SQL).show(truncate=False)

    ev = readers.load_table(spark, sf_dir, "events")
    print("== conversion funnel view -> click -> purchase ==")
    EV.funnel(ev, ["view", "click", "purchase"]).show()
    print("== day-cohort retention (first 5 cohorts) ==")
    EV.retention(ev).orderBy("cohort", "offset").show(5)

    orders = readers.load_table(spark, sf_dir, "orders")
    print("== column profile ==")
    PROF.profile_columns(orders, ["o_orderkey", "o_totalprice"]).show()
    print("== o_totalprice histogram (8 bins) ==")
    PROF.numeric_histogram(orders, "o_totalprice", bins=8) \
        .orderBy("bin").show()
    print("== correlation matrix (exact BIGINT moments) ==")
    PROF.correlation_matrix(
        orders.withColumn("o_dollars", F.expr(
            "CAST(ROUND(o_totalprice, 0) AS BIGINT)")),
        ["o_orderkey", "o_custkey", "o_dollars"]).show()

    docs = readers.load_table(spark, sf_dir, "documents")
    print("== dataset diff vs a modified snapshot ==")
    a = docs.select("doc_id", T.md5_fingerprint("text").alias("fp"))
    b = a.where("doc_id % 3 != 0")
    PROF.corpus_diff_summary(a, b, "doc_id", "fp").show()

    print("== temperature mix (alpha=0.3) over a skewed stratum ==")
    d = docs.withColumn("stratum", F.expr(
        "CASE WHEN doc_id % 10 < 7 THEN 'head' "
        "WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END"))
    (sampling.temperature_mix(d, "doc_id", "stratum", alpha=0.3)
     .groupBy("stratum").agg(F.count(F.lit(1)).alias("kept"),
                             F.first("keep_rate").alias("rate")).show())

    spark.stop()
    print("analytics_suite: OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
