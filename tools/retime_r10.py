"""Round-10 isolated re-timings at sf0.1 (VERDICT r9 #8 + #5).

Adjudicates the four >=0.2 s r8->r9 bench movers (hybrid_rrf,
lsh_recall_audit, dedup_substrings, multimodal_video_fp) per the
BASELINE.md protocol — solo box, cold run then min-of-3 warm — and
confirms the round-10 shared-tokenization refactor landed hybrid_rrf
at its target.  Also times the six new round-10 gates so BASELINE.md
gets their first measured rows.  Prints markdown rows + one JSON
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

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("retime-r10")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qmap = dict(entry.queries())
    for rn in range(5, 30):
        qf = getattr(entry, f"queries_round{rn}_staged", None)
        if qf:
            qmap.update(qf())
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

    for name in (
            # the four r9 movers to adjudicate
            "hybrid_rrf", "lsh_recall_audit", "dedup_substrings",
            "multimodal_video_fp",
            # first measured rows for the round-10 gates
            "quality_score", "hll_report", "som_qe",
            "multimodal_audio", "hash_partition", "events_smoothing",
            "kmv_novelty", "calibration_report"):
        if name not in qmap:
            # retired at a later rotation (round-12 merges) — this
            # tool documents the round-10 protocol, skip gracefully
            print(f"| {name} | (retired gate, skipped) |", flush=True)
            continue
        timed(name, lambda q=qmap[name]: q(spark, SF).count())

    print(json.dumps({"retime_r10": results}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
