"""Round-11 WARC + session-2-surface scale probes (VERDICT r10 #4/#5).

A) WARC source throughput POST quadratic-fix, now including the
   .warc.gz leg and the file-count parallelism axis, plus the
   crawl_ingest end-to-end pipeline (WARC -> payload_text ->
   strip_html -> canonicalize_url -> exact dedup -> quality score).
B) sf0.1 -> sf1 decade rows for the round-10 session-2 surface:
   WARC parse, logreg_top_features, parquet_layout_report,
   ivf_occupancy + ivf_ingest_drift.

Protocol: solo box, cold run then min-of-2 warm, 16g heap,
local[$SPARK_GRAFT_CPUS].  Prints markdown rows; paste into
BASELINE.md.  Needs /tmp/sf1 (tools/sf1_smoke.py --gen-only).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

results = {}


def timed(name, fn, warm=2):
    runs = []
    for _ in range(1 + warm):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    results[name] = round(min(runs[1:]), 3)
    print(f"| {name} | {results[name]} s | (cold {round(runs[0], 3)} s) |",
          flush=True)
    return results[name]


def build_crawl(spark, sf_dir, out, n_files, compress, copies=8):
    """Synthetic crawl from the documents table: each doc replicated
    ``copies``x with a copy-tag in the URI, wrapped as an html HTTP
    response — ~5 KB/record like the round-10 measurement."""
    from pyspark.sql import functions as F

    from xpysom_dask_spark.sources import warc as W
    from xpysom_dask_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    c = spark.range(copies).select(F.col("id").alias("copy"))
    staged = docs.crossJoin(c).select(
        F.concat(F.lit("http://crawl.test/"), "copy", F.lit("/"),
                 F.col("doc_id").cast("string")).alias("target_uri"),
        F.encode(F.concat(
            F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                  "<html><body><p>"), F.col("text"),
            F.lit("</p></body></html>")), "utf-8").alias("payload"))
    man = W.write_warc(staged.repartition(n_files), out,
                       compress=compress)
    n_rec = sum(r["n_records"] for r in man)
    mb = sum(os.path.getsize(r["file"]) for r in man) / 1e6
    raw_mb = sum(r["n_bytes"] for r in man) / 1e6
    return n_rec, mb, raw_mb


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("probe-warc-r11")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from xpysom_dask_spark.operators import dedup
    from xpysom_dask_spark.operators import models as M
    from xpysom_dask_spark.operators import profile as P
    from xpysom_dask_spark.operators import similarity as S
    from xpysom_dask_spark.operators import text as T
    from xpysom_dask_spark.operators.clustering import kmeans_fit
    from xpysom_dask_spark.sources import warc as W
    from xpysom_dask_spark.sources.readers import load_table

    base = tempfile.mkdtemp(prefix="warcprobe_")

    def read_count(path):
        return W.payload_text(
            W.read_warc(spark, path)
            .where("warc_type = 'response'")).count()

    # ---- A) throughput: plain vs gz, 16 vs 2 files -------------------
    print("### A) WARC read throughput (sf0.1 docs x8 copies)")
    configs = [("plain16", 16, False), ("gz16", 16, True),
               ("gz2", 2, True)]
    for tag, nf, comp in configs:
        out = os.path.join(base, tag)
        n_rec, mb, raw_mb = build_crawl(spark, SF01, out, nf, comp)
        sec = timed(f"warc_read_{tag}", lambda o=out: read_count(o))
        print(f"    {tag}: {nf} files, {n_rec} recs, {mb:.0f} MB on "
              f"disk ({raw_mb:.0f} MB raw) -> "
              f"{raw_mb / sec:.0f} MB/s, {n_rec / sec / 1000:.0f}k rec/s")

    # crawl_ingest end-to-end on the plain16 crawl
    plain16 = os.path.join(base, "plain16")

    def crawl_ingest():
        recs = W.payload_text(W.read_warc(spark, plain16)
                              .where("warc_type = 'response'"))
        cleaned = (recs.withColumn("clean", T.strip_html("text"))
                   .withColumn("url", T.canonicalize_url("target_uri")))
        kept = dedup.dedup_exact_keep_first(cleaned, "clean", "url")
        kept.agg(F.count(F.lit(1)), F.sum(T.quality_score("clean"))) \
            .collect()

    timed("crawl_ingest_e2e", crawl_ingest)

    # ---- B) decade rows ---------------------------------------------
    print("### B) sf0.1 -> sf1 decade rows (session-2 surface)")
    # B1: WARC parse at 10x docs (1 copy each, 16 files, plain)
    for tier, sf in (("sf0.1", SF01), ("sf1", SF1)):
        out = os.path.join(base, f"parse_{tier}")
        n_rec, mb, raw_mb = build_crawl(spark, sf, out, 16, False,
                                        copies=1)
        timed(f"warc_parse_{tier}", lambda o=out: read_count(o))
        print(f"    {tier}: {n_rec} recs, {raw_mb:.0f} MB raw")

    # B2: logreg_top_features (fit untimed; the interpretability scan
    # is the measured op)
    for tier, sf in (("sf0.1", SF01), ("sf1", SF1)):
        docs = load_table(spark, sf, "documents")
        lab = docs.withColumn(
            "y", (F.crc32(F.col("doc_id").cast("string")) % 10 < 5)
            .cast("int"))
        m = M.logreg_fit_hashed(lab, "text", "doc_id", "y",
                                n_buckets=1 << 14, n_iter=4)
        timed(f"logreg_top_features_{tier}",
              lambda lab=lab, m=m: M.logreg_top_features(
                  lab, "text", m, top_k=20).count())

    # B3: parquet_layout_report (footer-only audit)
    for tier, sf in (("sf0.1", SF01), ("sf1", SF1)):
        timed(f"parquet_layout_report_{tier}",
              lambda sf=sf: P.parquet_layout_report(
                  spark, os.path.join(sf, "lineitem.parquet")).count())

    # B4: ivf_occupancy + ivf_ingest_drift (index build untimed)
    import numpy as np

    for tier, sf in (("sf0.1", SF01), ("sf1", SF1)):
        emb = load_table(spark, sf, "embeddings")
        C = kmeans_fit(emb.where("vec_id % 2 = 0"), k=16, max_iter=4)
        idx_path = os.path.join(base, f"ivf_{tier}")
        S.build_kmeans_ivf_index(C, emb.where("vec_id % 2 = 0"),
                                 idx_path)
        batch = emb.where("vec_id % 2 = 1")
        from xpysom_dask_spark.operators.clustering import kmeans_assign

        def maintenance(idx_path=idx_path, C=C, batch=batch):
            occ = S.ivf_occupancy(spark, idx_path)
            cells = kmeans_assign(batch, C)
            S.ivf_ingest_drift(occ, cells, n_cells=16).agg(
                F.sum("term_e6")).collect()

        timed(f"ivf_maintenance_{tier}", maintenance)

    print(json.dumps(results, separators=(",", ":")))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
