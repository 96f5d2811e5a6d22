"""Round-8 isolated re-timings + BM25 pruning-quality curve at sf0.1.

Adjudicates the r6->r7 bench movers per the BASELINE.md protocol (solo
box, cold run then min-of-3 warm) and measures the retrieval-quality
trade of bm25_topk's max_df knob (recall@10 vs the exact max_df=None
ranking) — VERDICT r7 items 2, 4, 5.  Prints markdown rows + one JSON
line; paste into BASELINE.md.
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
             .appName("retime-r8")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qmap = entry.queries()
    results = {}

    def timed(name, fn):
        runs = []
        for _ in range(4):                  # 1 cold + 3 warm
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        results[name] = round(min(runs[1:]), 3)
        print(f"| {name} | {results[name]} s | (cold {round(runs[0], 3)}"
              f" s) |", flush=True)

    for name in ("dedup_paragraphs", "ann_recall_curve",
                 "graph_triangles"):
        timed(name, lambda q=qmap[name]: q(spark, SF).count())

    # ---- BM25 recall@10 vs max_df (quality curve, VERDICT r7 #4) ----
    from xpysom_dask_spark.operators.text import bm25_topk

    docs = entry._docs(spark, SF).persist()
    docs.count()
    qdocs = docs.where(entry._BM25_QDOCS).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("qtext")).persist()
    nq = qdocs.count()
    print(f"bm25 queries: {nq}", flush=True)

    def topk(max_df):
        out = bm25_topk(docs, "text", "doc_id", qdocs, "qtext",
                        "query_id", k=10, k1=entry._BM25_K1,
                        b=entry._BM25_B, max_df=max_df).collect()
        return {(r["query_id"], r["doc_id"]) for r in out}

    t0 = time.time()
    exact = topk(None)
    exact_sec = round(time.time() - t0, 3)
    curve = {}
    for cut in (5000, 2000, 1000, 500, 200, 100):
        t0 = time.time()
        got = topk(cut)
        sec = round(time.time() - t0, 3)
        rec = round(len(got & exact) / len(exact), 4)
        curve[str(cut)] = {"recall_at_10": rec, "sec": sec}
        print(f"| bm25 max_df={cut} | recall@10 {rec} | {sec} s |",
              flush=True)
    print(f"| bm25 max_df=None | recall@10 1.0 | {exact_sec} s |",
          flush=True)

    print(json.dumps({"metric": "retime_r8", "sf": SF,
                      "retimes": results, "bm25_n_queries": nq,
                      "bm25_exact_sec": exact_sec,
                      "bm25_max_df_curve": curve},
                     separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
