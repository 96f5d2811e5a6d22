#!/usr/bin/env python
"""Embedding/ANN tour: the vector-search surface end to end — KMeans
codebook training, IVF index build with plan-time partition pruning,
binary signatures with Hamming shortlist + exact-cosine rerank, PCA
whitening, and canonical-document keep-best dedup.  Every stage is the
same plan that survives a 1000-executor cluster (PLANS.md notes).

Run:  python examples/ann_pipeline.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import numpy as np  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import clustering as CL  # noqa: E402
from xpysom_dask_spark.operators import dedup  # noqa: E402
from xpysom_dask_spark.operators import embeddings as EMB  # noqa: E402
from xpysom_dask_spark.operators import similarity as SIM  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir: str) -> None:
    spark = make_session("ann-pipeline", master="local[4]",
                         shuffle_partitions=8)
    emb = readers.load_table(spark, sf_dir, "embeddings")
    docs = readers.load_table(spark, sf_dir, "documents")

    print("== KMeans codebook (8 cells, 4 Lloyd steps) ==")
    C = CL.kmeans_fit(emb, k=8, max_iter=4)
    CL.cluster_sizes(CL.kmeans_assign(emb, C)).orderBy("cluster_id") \
        .show()

    q = emb.where("vec_id % 100 = 0").collect()
    qids = [r["vec_id"] for r in q]
    Q = np.array([r["embedding"] for r in q])

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "kivf")
        print("== persisted KMeans-IVF index (int8), nprobe=2 ==")
        SIM.build_kmeans_ivf_index(C, emb, path, quantize=True)
        SIM.kmeans_ivf_topk_from_index(
            spark, path, C, Q, qids, k=3, nprobe=2) \
            .orderBy("query_id", "rank").show(9)

        print("== index maintenance: ingest + drift audit ==")
        # a new vector batch arrives: score it with the FROZEN
        # codebook, audit drift (PSI vs the index occupancy), then
        # append — the audit is constant-time, so it runs per ingest
        from pyspark.sql import functions as F

        occ = SIM.ivf_occupancy(spark, path)
        batch = emb.where("vec_id % 3 = 0") \
            .withColumn("vec_id", F.col("vec_id") + 100000)
        cells = CL.kmeans_assign(batch, C)
        psi = sum(r["term_e6"] for r in SIM.ivf_ingest_drift(
            occ, cells, n_cells=8).collect()) / 1e6
        verdict = ("append" if psi < 0.1
                   else "investigate" if psi < 0.25 else "RETRAIN")
        print(f"ingest drift PSI = {psi:.4f} -> {verdict}")
        SIM.build_kmeans_ivf_index(C, batch, path, mode="append",
                                   quantize=True)
        n = sum(r["n"] for r in
                SIM.ivf_occupancy(spark, path).collect())
        print(f"after append: {n} vectors indexed")

    print("== binary signatures -> Hamming shortlist -> cosine rerank ==")
    b = EMB.binarize_embeddings(emb, dim=64) \
        .select("vec_id", "embedding", "bits")
    EMB.binary_rerank_topk(b, b.where("vec_id < 3"), k=3,
                           shortlist=20) \
        .orderBy("query_id", "rank").show(9)

    print("== PCA: top-2 whitened components ==")
    model = EMB.pca_fit(emb, dim=64, n_components=2)
    print("explained ratio:", np.round(model["explained_ratio"], 4))
    EMB.pca_project(emb, model, whiten=True, keep=["label"]).show(5)

    print("== product quantization: 32x codes + ADC search ==")
    from xpysom_dask_spark.operators import pq as PQ
    book = PQ.pq_fit(emb, m=8, k=16, max_iter=4)
    codes = PQ.pq_encode(emb, book, err_col="recon_err")
    codes.select("vec_id", "codes", "recon_err").show(3, truncate=60)
    PQ.pq_adc_topk(book, codes, emb.where("vec_id < 3"), k=3) \
        .orderBy("query_id", "rank").show(9)

    print("== IVF-PQ: partition-pruned cells of residual codes ==")
    with tempfile.TemporaryDirectory() as d:
        ipath = os.path.join(d, "ivfpq")
        PQ.build_ivfpq_index(C, book, emb, ipath)
        PQ.ivfpq_topk(spark, ipath, C, book,
                      emb.where("vec_id < 3"), k=3, nprobe=2) \
            .orderBy("query_id", "rank").show(9)

    print("== keep-best canonical selection over near-dup groups ==")
    kept = dedup.dedup_keep_best(
        docs, "text", "doc_id",
        key=T.min_shingle_fingerprint("text"))
    print(f"kept {kept.count()} of {docs.count()} docs: OK")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
