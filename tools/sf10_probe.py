"""sf10 spot-probe: pin the exponent of the two sf1 outliers.

VERDICT r7 #9: ``dedup_keep_best`` (6.4×) and ``text_novelty`` (4.6×)
at 10× data are both explained as linear-in-total-chars (the renamed
corpus carries ~1.3× chars/doc and 1× fixed costs amortize), but one
more decade pins the exponent before a real cluster sees them.  Both
ops read ONLY the documents table, so the tier is documents-only:
500k docs = 100 word-RENAMED copies of the sf0.1 corpus (the
bijective per-copy suffix — sf1_smoke's replication semantics; never
interleave a salt token).

Usage: python tools/sf10_probe.py [--dir DIR]   (~2 GB in /tmp)
Prints one markdown row per (op, tier) and a final JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
DEFAULT_DIR = "/tmp/sf10"
COPIES = 100
OPS = ("dedup_keep_best", "text_novelty")


def gen(out_dir: str) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() // 2)}")
    doff = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM "
        f"read_parquet('{SF01}/documents.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + c.i * {doff} AS doc_id,
                 replace(text, ' ', 'q' || c.i || ' ') || 'q' || c.i
                   AS text,
                 lang, source,
                 CAST(length(replace(text, ' ', 'q' || c.i || ' '))
                      + 2 AS BIGINT) AS n_chars
          FROM read_parquet('{SF01}/documents.parquet'),
               range({COPIES}) c(i)
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet("
                    f"'{out_dir}/documents.parquet')").fetchone()[0]
    con.close()
    print(f"  documents: {n} rows", flush=True)


def main():
    args = sys.argv[1:]
    out_dir = args[args.index("--dir") + 1] if "--dir" in args \
        else DEFAULT_DIR
    if not os.path.exists(f"{out_dir}/documents.parquet"):
        print(f"generating {out_dir} ({COPIES}x sf0.1 documents)",
              flush=True)
        gen(out_dir)

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("sf10-probe")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qmap = entry.queries()
    results = {}
    for name in OPS:
        runs = []
        for _ in range(3):
            t0 = time.time()
            qmap[name](spark, out_dir).count()
            runs.append(time.time() - t0)
        results[name] = round(min(runs[1:]), 3)
        print(f"| {name} | {results[name]} s | (cold "
              f"{round(runs[0], 3)} s) |", flush=True)
    print(json.dumps({"metric": "sf10_probe", "unit": "sec",
                      "copies": COPIES, "queries": results},
                     separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
