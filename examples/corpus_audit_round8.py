#!/usr/bin/env python
"""Corpus audit tour, round 8: sketches, hybrid retrieval, graph
centrality, and cheap classifiers — the "100 TB answers from bounded
state" surface.  A count-min sketch and a HyperLogLog summarize the
corpus in <= depth*width and 2^p rows regardless of size (and both
double as streaming state); BM25 + token-Jaccard fuse by reciprocal
rank without score calibration; integer PageRank ranks the hub
documents of the kNN graph; readability and a one-pass Naive Bayes
classifier turn token counts into quality/label-noise signals.  Every
stage is a declarative Spark plan whose shape survives a
1000-executor cluster (PLANS.md notes).

Run:  python examples/corpus_audit_round8.py [sf_dir]
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
from xpysom_dask_spark.operators import graph as G  # noqa: E402
from xpysom_dask_spark.operators import sketches as SK  # noqa: E402
from xpysom_dask_spark.operators import similarity as SIM  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir: str) -> None:
    spark = make_session("corpus-audit-r8", master="local[4]",
                         shuffle_partitions=4)
    docs = readers.load_table(spark, sf_dir, "documents")
    emb = readers.load_table(spark, sf_dir, "embeddings")
    ev = readers.load_table(spark, sf_dir, "events")

    print("== count-min sketch: term heavy hitters from 4x256 cells ==")
    toks = docs.select(F.explode(T.tokens("text")).alias("term"))
    sk = SK.count_min_sketch(toks, "term", depth=4, width=256)
    exact = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact"))
    (SK.cms_estimate(sk, exact.select("term"), "term", depth=4,
                     width=256)
     .join(exact, "term")
     .orderBy(F.col("est").desc(), "term").limit(5).show())

    print("== HyperLogLog: distinct users from 512 registers ==")
    regs = SK.hll_registers(
        ev.select(F.col("user_id").cast("string").alias("k")), "k",
        p=9)
    SK.hll_estimate(regs, p=9).show()

    print("== hybrid retrieval: bm25 + jaccard fused by rank ==")
    qdocs = docs.where("doc_id % 199 = 3").select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("qtext"))
    bm = T.bm25_topk(docs, "text", "doc_id", qdocs, "qtext",
                     "query_id", k=20)
    jc = T.jaccard_topk(docs, "text", "doc_id", qdocs, "qtext",
                        "query_id", k=20)
    T.rrf_fuse([bm, jc], k=3).orderBy("query_id", "rank").show(9)

    print("== integer PageRank over the kNN graph (hub documents) ==")
    cents = np.stack([
        np.asarray(r["embedding"], np.float64)
        for r in emb.where("vec_id < 4").orderBy("vec_id").collect()])
    edges = SIM.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
    G.pagerank(edges, n_iter=5).orderBy(F.col("rank_e6").desc()) \
        .limit(5).show()

    print("== readability: complexity distribution ==")
    (T.readability_scores(docs, "text", "doc_id")
     .where("n_words > 0")
     .agg(F.min("flesch_e6").alias("min_flesch_e6"),
          F.avg("flesch_e6").cast("bigint").alias("avg_flesch_e6"),
          F.max("flesch_e6").alias("max_flesch_e6")).show())

    print("== unigram-LM tokenizer: train + budget accounting ==")
    from xpysom_dask_spark.operators import unigram as UNI
    vocab = UNI.learn_unigram(docs, "text", vocab_size=64,
                              max_piece_len=4, n_iter=2)
    (UNI.unigram_token_count(docs, "text", "doc_id", vocab,
                             max_piece_len=4)
     .agg(F.sum("n_words").alias("words"),
          F.sum("n_tokens").alias("unigram_tokens")).show())

    print("== Naive Bayes lang self-audit (disagreements = noise) ==")
    nb = T.nb_classify(docs, "text", "doc_id", "lang")
    nb.agg(F.count(F.lit(1)).alias("docs"),
           F.sum((F.col("pred") != F.col("label")).cast("int"))
           .alias("label_disagreements")).show()

    print("== LPA communities vs connected components on kNN edges ==")
    lpa = G.label_propagation(edges, "src", "dst", n_iter=4)
    cc = G.connected_components(edges, "src", "dst")
    (lpa.agg(F.countDistinct("community").alias("lpa_communities"))
     .crossJoin(cc.agg(F.countDistinct("component")
                       .alias("connected_components"))).show())
    q = (G.community_modularity(edges, lpa, "src", "dst")
         .agg((F.sum("contrib_e6") / 1e6).alias("modularity_q")))
    q.show()

    print("== WordPiece: train held-out, encode, count UNKs ==")
    from xpysom_dask_spark.operators import wordpiece as WP
    toks_wp = WP.learn_wordpiece(docs.where("doc_id % 2 = 0"),
                                 "text", num_merges=30)
    (WP.wordpiece_encode(docs, "text", set(toks_wp),
                         max_word_chars=6)
     .select(F.size("wp_tokens").alias("n_sub"),
             F.expr("size(filter(wp_tokens, t -> t = '[UNK]'))")
             .alias("n_unk"))
     .agg(F.sum("n_sub").alias("subwords"),
          F.sum("n_unk").alias("unks")).show())

    print("== drift + robust outliers: PSI terms and MAD profile ==")
    from xpysom_dask_spark.operators import profile as PRF
    psi = PRF.psi_drift(ev.where("event_id % 2 = 0"),
                        ev.where("event_id % 2 = 1"), "value",
                        lo=0.0, hi=500.0, bins=20)
    psi.agg(F.sum("term_e6").alias("psi_e6")).show()
    PRF.mad_outliers(ev, "event_type", "value").orderBy(
        "event_type").show()

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
