#!/usr/bin/env python
"""Corpus audit tour, round 9: the grouped/mergeable-sketch tier, the
LM smoothing ladder, and graph/embedding quality audits.

Per-dimension approximate distincts come from ONE combinable
aggregation whose state is groups·2^p rows (grouped HyperLogLog);
cross-set resemblance comes from k-minimum-values samples (HLL
registers can't overlap); quantiles from a fixed-grid histogram whose
cells merge by sum; and the same sketch cells double as streaming
state (the CMS twin drains bit-identically to its batch build).  The
LM ladder climbs add-1 unigram → stupid-backoff trigram →
interpolated Kneser-Ney, all exact-integer sufficient statistics.
TextRank ranks keywords by centrality of the token co-occurrence
graph; label purity audits the embedding against labels with the IVF
sizing rule n_cells = ⌊√N⌋ — the scale-safe shape (total candidate
pairs N^1.5, never a fixed-cell quadratic).

Run:  python examples/corpus_audit_round9.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import math  # noqa: E402

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import sketches as SK  # noqa: E402
from xpysom_dask_spark.operators import similarity as SIM  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir: str) -> None:
    spark = make_session("corpus-audit-r9", master="local[4]",
                         shuffle_partitions=4)
    docs = readers.load_table(spark, sf_dir, "documents")
    emb = readers.load_table(spark, sf_dir, "embeddings")
    ev = readers.load_table(spark, sf_dir, "events")

    print("== HTML extraction + fuzzy-exact dedup (crawl front door) ==")
    from xpysom_dask_spark.operators.dedup import dedup_exact_normalized
    from xpysom_dask_spark.operators.text import strip_html

    wrapped = docs.select(
        "doc_id",
        F.concat(F.lit("<div><h1>T &amp; H</h1><p>"), F.col("text"),
                 F.lit("</p><br><!-- c --></div>")).alias("html"))
    cleaned = wrapped.select("doc_id", strip_html("html").alias("text"))
    (dedup_exact_normalized(cleaned, "text", "doc_id")
     .agg(F.count(F.lit(1)).alias("normalized_groups"),
          F.sum("n_copies").alias("docs")).show())

    print("== grouped HLL: distinct users per event_type, one agg ==")
    regs = SK.hll_registers(
        ev.select("event_type",
                  F.col("user_id").cast("string").alias("k")),
        "k", p=9, group_cols=("event_type",))
    SK.hll_estimate(regs, p=9, group_cols=("event_type",)) \
        .orderBy("event_type").show()

    print("== KMV overlap: token-set Jaccard between languages ==")
    toks = docs.select(
        "lang", F.explode(T.tokens("text")).alias("term"))
    kmv = SK.kmv_sketch(toks, "term", k=64, group_cols=("lang",))
    SK.kmv_overlap(kmv, k=64, group_col="lang") \
        .orderBy(F.col("jaccard_e6").desc()).show(6)

    print("== histogram quantiles: event value p50/p95/p99 ==")
    hist = SK.histogram_sketch(ev, "value", lo=0.0, hi=500.0,
                               bins=128)
    SK.histogram_quantiles(hist, (0.5, 0.95, 0.99), lo=0.0,
                           hi=500.0, bins=128).show()

    print("== streaming CMS: drained micro-batches == batch cells ==")
    import tempfile
    import uuid

    from xpysom_dask_spark.streaming import cms_stream

    src = tempfile.mkdtemp(prefix="r9_cms_")
    half = docs.select(F.explode(T.tokens("text")).alias("term"))
    half.where(F.crc32(F.col("term")) % 2 == 0) \
        .repartition(1).write.mode("overwrite").parquet(src)
    half.where(F.crc32(F.col("term")) % 2 == 1) \
        .repartition(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(half.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = "r9_cms_" + uuid.uuid4().hex[:8]
    q = (cms_stream(stream, "term", depth=4, width=256)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    drained = spark.table(name)
    batch = SK.count_min_sketch(half, "term", depth=4, width=256)
    diff = (drained.join(batch.withColumnRenamed("count", "b"),
                         ["d", "w"], "full")
            .where("count IS DISTINCT FROM b").count())
    print(f"state cells: {drained.count()} (<= 4*256), "
          f"cells differing from batch: {diff}")

    print("== TextRank keywords: co-occurrence-graph centrality ==")
    T.textrank_keywords(docs, "text", top_k=10).show()

    print("== LM ladder: stupid-backoff trigram vs Kneser-Ney ==")
    lm = docs.where("doc_id % 2 = 0")
    held = docs.where("doc_id % 2 = 1")
    tb = T.trigram_backoff_score(held, "text", "doc_id", lm_df=lm)
    kn = T.kneser_ney_bigram_score(held, "text", "doc_id", lm_df=lm)
    (tb.agg((F.sum("sum_e6") / F.sum("n_trigrams") / 1e6)
            .alias("backoff_mean_logp"))
     .crossJoin(kn.agg((F.sum("sum_e6") / F.sum("n_bigrams") / 1e6)
                       .alias("kn_mean_logp"))).show())

    print("== KMV novelty: distinct keys the odd half adds ==")
    ta = toks.where(F.crc32("term") % 2 == 0)
    tb = toks.where(F.crc32("term") % 2 == 1)
    SK.kmv_novelty(SK.kmv_sketch(ta, "term", k=64),
                   SK.kmv_sketch(tb, "term", k=64), k=64).show()

    print("== label purity at n_cells = floor(sqrt(N)) ==")
    n_cells = max(1, math.isqrt(emb.count()))
    cents = np.stack([
        np.asarray(r["embedding"], np.float64)
        for r in emb.where(f"vec_id < {n_cells}")
        .orderBy("vec_id").collect()])
    edges = SIM.knn_graph(emb, cents, k=5) \
        .select("vec_id", "neighbor_id")
    purity = SIM.label_purity(edges, emb.select("vec_id", "label"))
    (purity.groupBy("label")
     .agg(F.count(F.lit(1)).alias("n"),
          F.avg("purity_e6").cast("bigint").alias("avg_purity_e6"))
     .orderBy("label").show())

    print("== core decomposition of the kNN graph (dense tiers) ==")
    from xpysom_dask_spark.operators.graph import coreness
    (coreness(edges, "vec_id", "neighbor_id")
     .groupBy("core").agg(F.count(F.lit(1)).alias("n_vertices"))
     .orderBy("core").show())

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
