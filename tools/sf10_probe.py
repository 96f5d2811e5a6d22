"""sf10 spot-probe: pin the second decade of the steepest sf1 rows.

VERDICT r7 #9: ``dedup_keep_best`` (6.4×) and ``text_novelty`` (4.6×)
at 10× data are both explained as linear-in-total-chars (the renamed
corpus carries ~1.3× chars/doc and 1× fixed costs amortize), but one
more decade pins the exponent before a real cluster sees them.

VERDICT r11 #5 extends the probe to the families most likely to
regress super-linearly: the hashed classifier pair
(``logreg_hashed_fit``/``score`` — the steepest sf0.1→sf1 decade rows
at 4.8×/8.6×) and the WARC crawl front door (``warc_ingest`` —
staged once untimed, so the warm rows time the read→extract→checksum
legs).  All ops read ONLY the documents table, so the tier is
documents-only: 500k docs = 100 word-RENAMED copies of the sf0.1
corpus (the bijective per-copy suffix — sf1_smoke's replication
semantics; never interleave a salt token).

Usage: python tools/sf10_probe.py [--dir DIR] [--ops a,b]
(~2 GB in /tmp).  Prints one markdown row per (op, tier) and a final
JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
DEFAULT_DIR = "/tmp/sf10"
COPIES = 100
OPS = ("dedup_keep_best", "text_novelty",
       # round-12 additions (VERDICT r11 #5)
       "logreg_hashed_fit", "logreg_hashed_score", "warc_ingest")


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

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from xpysom_dask_spark.operators import models as MD
    from xpysom_dask_spark.sources import readers

    ops = args[args.index("--ops") + 1].split(",") if "--ops" in args \
        else OPS
    qmap = entry.queries()
    docs = readers.load_table(spark, out_dir, "documents")
    lab = docs.withColumn("y", (F.col("lang") == "en").cast("int"))
    lrm = {}          # fit model handed to the score workload

    def _fit():
        lrm["m"] = MD.logreg_fit_hashed(
            lab, "text", "doc_id", "y", n_buckets=1024, n_iter=6,
            lr=1.0)
        return 1

    custom = {
        "logreg_hashed_fit": _fit,
        "logreg_hashed_score": lambda: MD.logreg_score_hashed(
            docs, "text", "doc_id",
            lrm.get("m") or _fit() and lrm["m"])
            .agg(F.avg("quality_p")).collect(),
    }
    results = {}
    for name in ops:
        fn = custom.get(name) or \
            (lambda q=qmap[name]: q(spark, out_dir).count())
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
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
