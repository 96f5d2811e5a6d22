#!/usr/bin/env python
"""End-to-end training-data pipeline over the documents + embeddings
tables: curation, fuzzy dedup, mixture sampling, similarity search, and
SOM-as-IVF ANN — every stage a declarative Spark plan designed for
cluster scale (no reference counterpart; this is the engine's
beyond-the-reference surface).

Run:  python examples/data_pipeline.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import SparkSom, make_session  # noqa: E402
from xpysom_dask_spark.operators import (  # noqa: E402
    dedup,
    sampling,
    similarity,
)
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("data-pipeline-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = readers.load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"== corpus: {n0} documents from {sf_dir}")

    # 1. text analysis: tokens, quality, language id — pure SQL exprs
    stats = docs.select(
        "doc_id",
        T.token_count("text").alias("n_tok"),
        T.quality_score("text").alias("quality"),
        T.lang_id("text").alias("lang_guess"))
    stats.agg(F.avg("n_tok").alias("avg_tokens"),
              F.avg("quality").alias("avg_quality")).show()

    # 2. curation: exact dedup + quality gate + language filter.
    # Per-stage retention comes from plans.metrics.funnel_counts — ONE
    # action drives every stage's observer, instead of one full
    # re-scan per .count()
    from xpysom_dask_spark.plans.metrics import funnel_counts

    curated = dedup.curate(docs, "text", "doc_id", min_quality=0.4,
                           lang="en")
    retention = funnel_counts({
        "raw": docs,
        "exact_dedup": dedup.dedup_exact_keep_first(docs, "text",
                                                    "doc_id"),
        "curated_en_q40": curated,
    })
    print("curation funnel (one job):",
          "  ".join(f"{k}={v}" for k, v in retention))

    # 3. fuzzy dedup: MinHash-LSH pairs -> connected components -> keep
    #    one representative per near-duplicate cluster
    clusters = dedup.dedup_clusters(docs, "text", "doc_id", threshold=0.5)
    n_clustered = clusters.count()
    deduped = dedup.fuzzy_dedup_keep_first(docs, "text", "doc_id",
                                           threshold=0.5)
    print(f"fuzzy dedup: {n_clustered} docs in near-dup clusters; "
          f"{deduped.count()} survive keep-first")

    # 3b. Gopher-rule document-shape quality gate (one scan)
    gated = T.gopher_quality_flags(deduped, "text")
    n_pass = gated.where("passes_gopher").count()
    print(f"gopher quality gate: {n_pass}/{gated.count()} docs pass")

    # 4. mixture construction: stable hash splits + per-language rates
    #    + fractional epoch repetition (explicit copies)
    split = sampling.split_by_hash(
        deduped, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    split.groupBy("split").count().orderBy("split").show()
    mixed = sampling.stratified_sample(
        deduped, "doc_id", "lang", {"en": 1.0, "de": 0.5, "fr": 0.5},
        seed=3)
    sampling.mixture_report(mixed, "lang").orderBy("lang").show()
    repeated = sampling.mixture_resample(
        deduped, "doc_id", "lang", {"de": 2.0, "fr": 0.5}, seed=3)
    print(f"epoch-repetition mix (de x2, fr x0.5): "
          f"{repeated.count()} rows from {deduped.count()}")

    # 4b. token-budget packing: route to parallel pack streams, chunk
    #     every 2048 tokens
    from xpysom_dask_spark.operators import packing
    d_tok = deduped.withColumn("n_tok", T.token_count("text"))
    packed = packing.pack_sequences(d_tok, "doc_id", "n_tok", budget=2048,
                                    n_groups=8)
    packing.pack_stats(packed, "n_tok").agg(
        F.count("*").alias("n_packs"),
        F.avg("n_tokens").alias("avg_fill")).show()

    # 5. similarity search over embeddings: exact top-k, then the
    #    SOM-as-IVF approximate path (bucket by BMU, probe nearest cells)
    emb = readers.load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id % 100 = 0")
    knn = similarity.cosine_topk(emb, queries, k=3)
    print("exact cosine top-3 (first rows):")
    knn.orderBy("query_id", "rank").show(6)

    qpdf = queries.toPandas()
    qvecs = np.stack([np.asarray(v, np.float64)
                      for v in qpdf["embedding"]])
    ivf_som = SparkSom(4, 4, qvecs.shape[1], random_seed=11)
    ivf_som.train(emb.select(F.col("embedding").alias("features")), 3)
    ann = similarity.som_ivf_topk(ivf_som, emb, qvecs,
                                  qpdf["vec_id"].tolist(), k=3, nprobe=4)
    exact = {(r.query_id, r.neighbor_id) for r in knn.collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    recall = len(exact & approx) / max(len(exact), 1)
    print(f"SOM-IVF ANN nprobe=4/16 recall vs exact: {recall:.2%}")

    # 6. embedding near-duplicates via banded hyperplane LSH
    pairs = similarity.lsh_near_dup_pairs(emb, dim=qvecs.shape[1],
                                          threshold=0.95)
    print(f"embedding near-dup pairs (cos >= 0.95): {pairs.count()}")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
