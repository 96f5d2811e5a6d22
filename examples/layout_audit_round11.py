#!/usr/bin/env python
"""Physical-layout audit tour, round 11: the footer-metadata tier.

A 100 TB table's scan cost is decided before any query runs — by row
group sizes (the scan-parallelism quantum), by whether the writer
stamped column statistics, and by whether values are CLUSTERED so
those statistics actually prune.  All three are visible from parquet
FOOTERS alone (kilobytes per file through pyarrow.fs, data pages never
open), so this whole audit costs seconds at any table size:

1. ``parquet_layout_report``    — row-group/size/compression shape;
2. ``parquet_column_stats``     — what the footers CLAIM (min/max/null
   counts per column), cross-checkable against the data itself: a
   writer that mis-stamps stats silently corrupts every stats-aware
   scan, the nastiest kind of wrong answer;
3. ``parquet_pruning_audit``    — the payoff measurement: for a range
   predicate, exactly how many rows/bytes a stats-aware scan SKIPS,
   compared across a hash-random layout and a value-sorted rewrite —
   the number that tells you whether a re-cluster (``write_zordered``
   / sort) is worth paying for BEFORE you pay for it.

Run:  python examples/layout_audit_round11.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators.profile import (  # noqa: E402
    parquet_column_stats, parquet_layout_report, parquet_pruning_audit)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001"
    spark = make_session("layout-audit-round11")
    li = os.path.join(sf_dir, "lineitem.parquet")

    print("== 1. layout report (row groups are the parallelism quantum)")
    parquet_layout_report(spark, li).show(5, truncate=False)

    print("== 2. footer claims per key column")
    parquet_column_stats(
        spark, li, ["l_orderkey", "l_partkey", "l_suppkey"]) \
        .orderBy("column").show(truncate=False)

    print("== 3. pruning: random vs sorted layout, same predicate")
    df = spark.read.parquet(li)
    lo, hi = df.agg(F.expr("percentile(l_orderkey, 0.45)"),
                    F.expr("percentile(l_orderkey, 0.55)")).first()
    lo, hi = int(lo), int(hi)
    base = tempfile.mkdtemp(prefix="layout_audit_")
    rnd, srt = os.path.join(base, "rnd"), os.path.join(base, "srt")
    (df.orderBy(F.md5(F.col("l_orderkey").cast("string"))).coalesce(2)
       .write.option("parquet.block.size", 64 * 1024).parquet(rnd))
    (df.orderBy("l_orderkey").coalesce(2)
       .write.option("parquet.block.size", 64 * 1024).parquet(srt))
    for tag, path in (("random", rnd), ("sorted", srt)):
        r = parquet_pruning_audit(spark, path, "l_orderkey", lo, hi) \
            .agg(F.sum("n_rows").alias("n"),
                 F.sum("rows_pruned").alias("p"),
                 F.sum("n_row_groups").alias("g"),
                 F.sum("rg_pruned").alias("gp")).first()
        pct = 100.0 * r["p"] / r["n"] if r["n"] else 0.0
        print(f"  {tag:7s}: {r['gp']}/{r['g']} row groups prunable, "
              f"{r['p']}/{r['n']} rows ({pct:.0f}%) skipped for "
              f"l_orderkey IN [{lo}, {hi}]")
    print("same bytes, same predicate — only the LAYOUT differs; "
          "clustering is what turns statistics into skipped IO.")
    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
