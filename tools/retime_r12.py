"""Round-12 isolated re-timings at sf0.1 (VERDICT r11 #3).

Adjudicates the four >0.4 s r10->r11 bench movers that shipped
without a verdict row (logreg_hashed_fit 2.21->3.08, text_novelty
0.77->1.32, ann_recall_curve 1.36->1.90, logreg_hashed_score
0.94->1.40) per the standing BASELINE.md protocol — solo box, fresh
JVM, cold run then min-of-3 warm, workload definitions identical to
bench.py's.  Prints markdown rows + one JSON line; adjudicate each
against its r7-r9 historical band and paste into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("retime-r12")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from xpysom_dask_spark.operators import models as MD
    from xpysom_dask_spark.operators import text as T
    from xpysom_dask_spark.sources import readers

    docs = readers.load_table(spark, SF, "documents")
    results = {}

    def timed(name, fn):
        runs, out = [], None
        for _ in range(4):                  # 1 cold + 3 warm
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        results[name] = round(min(runs[1:]), 3)
        print(f"| {name} | {results[name]} s | (cold {round(runs[0], 3)}"
              f" s) |", flush=True)
        return out

    _lab = docs.withColumn("y", (F.col("lang") == "en").cast("int"))
    _lrm = timed("logreg_hashed_fit", lambda: MD.logreg_fit_hashed(
        _lab, "text", "doc_id", "y", n_buckets=1024, n_iter=6,
        lr=1.0))
    timed("logreg_hashed_score", lambda: MD.logreg_score_hashed(
        docs, "text", "doc_id", _lrm)
        .agg(F.avg("quality_p")).collect())
    timed("text_novelty", lambda: T.novelty_score(
        docs, "text", "doc_id").agg(F.sum("n_unique")).collect())
    timed("ann_recall_curve", lambda: entry.queries()
          ["ann_recall_curve"](spark, SF).collect())

    print(json.dumps({"retime_r12": results}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
