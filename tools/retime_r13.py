"""Optimization-round-13 isolated gate re-timer + plan capture.

Usage:
    python tools/retime_r13.py [--sf DIR] [--plans SUFFIX] name [name...]

Per name: builds the gate DataFrame exactly as bench.py's gate loop
does (`queries()[name](spark, sf_dir)`, staged registries resolve),
times cold + min-of-3 warm `.count()`, and with --plans writes
`.explain('formatted')` to plans/r12/<name>_<SUFFIX>.txt.

Fresh-JVM solo protocol (the BASELINE.md retime convention): run on an
otherwise idle box; one process per adjudication batch.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv):
    args = list(argv)
    sf = SF
    plans_suffix = None
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i:i + 2]
    names = args
    if not names:
        print("usage: retime_r13.py [--sf DIR] [--plans SUFFIX] "
              "name [name...]")
        return 2

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("retime-opt12")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     "20000")
             .config("spark.sql.execution.arrow.pyspark.enabled",
                     "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    q = dict(entry.queries())
    for rn in range(5, 30):
        qf = getattr(entry, f"queries_round{rn}_staged", None)
        if qf:
            q.update(qf())

    import json
    out = {}
    pdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(pdir, exist_ok=True)
    plans_only = os.environ.get("RETIME_PLANS_ONLY") == "1"
    for name in names:
        if plans_only:
            continue
        runs = []
        for i in range(4):
            t0 = time.time()
            df = q[name](spark, sf)
            df.count()
            runs.append(time.time() - t0)
        out[name] = {"cold": round(runs[0], 3),
                     "warm_min3": round(min(runs[1:]), 3)}
        print(f"| {name} | cold {out[name]['cold']} s "
              f"| warm {out[name]['warm_min3']} s |", flush=True)
    if plans_suffix:
        for name in names:
            df = q[name](spark, sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(
                    pdir, f"{name}_{plans_suffix}.txt"), "w") as fh:
                fh.write(txt)
    print(json.dumps({"sf": sf, "results": out},
                     separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
