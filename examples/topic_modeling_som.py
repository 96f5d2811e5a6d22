#!/usr/bin/env python
"""Topic modeling with a SOM — the script equivalent of the reference's
TopicModeling notebook (reference examples/TopicModeling.ipynb:
20-newsgroups → TfidfVectorizer(max_df=.95, min_df=2, max_features=1000)
→ 2×4 MiniSom → top-10 keywords per cell from the weight vectors),
re-expressed Spark-first over the synthetic documents table.

Run:  python examples/topic_modeling_som.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)

Pipeline:

1. vocabulary: document frequencies over tokenized text, min_df/max_df
   pruned, top ``VOCAB`` terms — one narrow explode + one aggregate;
   the surviving vocab (term → index, idf) broadcasts everywhere after
2. per-doc dense tf-idf vectors: tokens → broadcast vocab join →
   per-(doc, term) counts → map_from_entries + sequence fill (the
   sparse→dense pivot runs inside one aggregate, no V-column pivot)
3. train a 2×4 SOM on the vectors (the notebook's grid), PCA init
4. topics: each cell's top-10 vocabulary terms by weight — pure
   driver-side argsort of the (8, V) codebook
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import SparkSom, make_session  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402

VOCAB = 200
GRID_X, GRID_Y = 2, 4
TOP_KEYWORDS = 10


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("topic-modeling-som-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = readers.load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    n_docs = docs.count()

    # 1. vocabulary with the notebook's pruning rules (min_df=2,
    # max_df=0.95, max_features) — df counts from one explode+agg
    toks = docs.select("doc_id",
                       F.explode(T.tokens("text")).alias("term"))
    df_counts = (toks.groupBy("term")
                 .agg(F.countDistinct("doc_id").alias("df")))
    vocab = (df_counts
             .where((F.col("df") >= 2)
                    & (F.col("df") <= int(0.95 * n_docs)))
             .orderBy(F.desc("df"), "term").limit(VOCAB)
             .select("term", "df",
                     (F.log((F.lit(float(n_docs)) + 1.0)
                            / (F.col("df") + 1.0)) + 1.0).alias("idf")))
    # index assignment must be deterministic: collect the tiny vocab
    # once, re-create with explicit ids (V rows of driver traffic)
    vrows = vocab.collect()
    v = len(vrows)
    vocab_ix = spark.createDataFrame(
        [(r["term"], i, float(r["idf"])) for i, r in enumerate(vrows)],
        "term string, ix int, idf double")
    print(f"== {n_docs} documents, vocabulary {v} terms")

    # 2. dense tf-idf vectors: counts per (doc, term-in-vocab), tf
    # normalized by doc token count, sparse→dense inside one aggregate
    doc_len = docs.select(
        "doc_id", T.token_count("text").alias("n_tok"))
    tfidf = (toks.join(F.broadcast(vocab_ix), "term")
             .groupBy("doc_id", "ix", "idf")
             .agg(F.count(F.lit(1)).alias("tf"))
             .join(doc_len, "doc_id")
             .select("doc_id", "ix",
                     (F.col("tf") / F.col("n_tok")
                      * F.col("idf")).alias("w"))
             .groupBy("doc_id")
             .agg(F.map_from_entries(F.collect_list(
                 F.struct("ix", "w"))).alias("m"))
             .select("doc_id", F.transform(
                 F.sequence(F.lit(0), F.lit(v - 1)),
                 lambda i: F.coalesce(F.element_at(F.col("m"), i),
                                      F.lit(0.0))).alias("features")))
    tfidf = tfidf.persist()
    n_vec = tfidf.count()

    # 3. the notebook's 2×4 map with PCA init (distributed covariance)
    som = SparkSom(GRID_X, GRID_Y, v, random_seed=1,
                   fuse_local_bytes=0)
    som.pca_weights_init(tfidf.select("features"))
    som.train(tfidf.select("features"), 5)

    # 4. per-cell topic keywords from the codebook (weights argsort —
    # exactly the notebook's readout)
    weights = som.get_weights()
    terms = [r["term"] for r in
             vocab_ix.orderBy("ix").select("term").collect()]
    cnt = 1
    for i in range(GRID_X):
        for j in range(GRID_Y):
            top = np.argsort(weights[i, j, :])[-TOP_KEYWORDS:][::-1]
            print(f"Topic {cnt}: {' '.join(terms[k] for k in top)}")
            cnt += 1

    # doc→topic assignment sizes (which topics dominate the corpus)
    scored = som.transform(tfidf, ("cluster_id",))
    scored.groupBy("cluster_id").count() \
        .orderBy(F.desc("count")).show(8, truncate=False)

    tfidf.unpersist()
    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:])
