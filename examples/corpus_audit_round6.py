#!/usr/bin/env python
"""Corpus audit tour: the round-6 quality/structure surface — intra-doc
paragraph dedup, corpus-head dictionary coverage, dense tf-idf, the JL
sign projection + Matryoshka truncation storage trades, the cell-local
kNN graph with its triangle-density audit, the per-key EWMA smoother,
and the empirical LSH recall curve.  Every stage is a declarative Spark
plan whose shape survives a 1000-executor cluster (PLANS.md notes).

Run:  python examples/corpus_audit_round6.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import dedup  # noqa: E402
from xpysom_dask_spark.operators import embeddings as EMB  # noqa: E402
from xpysom_dask_spark.operators import graph as G  # noqa: E402
from xpysom_dask_spark.operators import profile as PROF  # noqa: E402
from xpysom_dask_spark.operators import similarity as SIM  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir: str) -> None:
    spark = make_session("corpus-audit", master="local[4]",
                         shuffle_partitions=4)
    docs = readers.load_table(spark, sf_dir, "documents")
    emb = readers.load_table(spark, sf_dir, "embeddings")
    ev = readers.load_table(spark, sf_dir, "events")

    print("== intra-doc segment dedup (word-level on this corpus) ==")
    (dedup.dedup_paragraphs(docs, "text", "doc_id", sep=" ")
     .agg(F.count(F.lit(1)).alias("docs"),
          F.sum("n_paras_removed").alias("segments_removed")).show())

    print("== corpus-head dictionary coverage (low = junk suspects) ==")
    cov = T.dictionary_coverage(docs, "text", "doc_id", top_k=100)
    cov.orderBy("coverage").show(5)

    print("== dense tf-idf over the corpus-head vocabulary ==")
    T.tfidf_vectors(docs, "text", "doc_id", top_k=16).show(3)

    print("== storage trades: JL sign projection vs Matryoshka ==")
    rp = EMB.random_projection(emb, out_dim=16)
    mrl = EMB.matryoshka_truncate(emb, 16)
    print("rp rows:", rp.count(), "mrl rows:", mrl.count())

    print("== cell-local kNN graph + triangle density ==")
    cents = np.stack([np.asarray(r["embedding"], np.float64)
                      for r in emb.where("vec_id < 4")
                      .orderBy("vec_id").collect()])
    edges = SIM.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"))
    (G.triangle_counts(edges)
     .agg(F.sum("n_triangles").alias("triangle_incidences"),
          F.count(F.lit(1)).alias("vertices")).show())

    print("== per-key truncated EWMA over event values ==")
    PROF.ewma(ev.where("value IS NOT NULL"), "event_type", "value",
              "ts", "event_id", alpha=0.25, lag=16).show(5)

    print("== empirical LSH recall per exact-Jaccard decile ==")
    dedup.lsh_recall_audit(docs, "text", "doc_id",
                           max_df=dedup.DEFAULT_MAX_DF) \
        .orderBy("bucket").show()

    print("== what the df cutoff drops on this corpus ==")
    dedup.posting_prune_report(docs, "text", "doc_id").show()

    print("== asymmetric containment pairs (quote-inclusion leak) ==")
    (dedup.containment_pairs(docs, "text", "doc_id", threshold=0.9,
                             max_df=dedup.DEFAULT_MAX_DF)
     .agg(F.count(F.lit(1)).alias("pairs"),
          F.min("jaccard").alias("min_jaccard")).show())

    print("== Zipf-law fit of the frequency head ==")
    PROF.zipf_fit(docs, "text", "doc_id", top_k=100).show()

    print("== no-straddle SFT packing vs concat-and-chunk ==")
    from xpysom_dask_spark.operators import packing as PKG
    nt = docs.withColumn("n_tok", T.token_count("text"))
    bins = PKG.pack_bins_next_fit(nt, "doc_id", "n_tok", budget=256)
    (bins.groupBy("bin_id").agg(F.sum("n_tok").alias("fill"))
     .agg(F.count(F.lit(1)).alias("bins"),
          F.round(F.avg("fill") / 256, 3).alias("avg_utilization"))
     .show())

    spark.stop()
    print("corpus_audit_round6: OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
