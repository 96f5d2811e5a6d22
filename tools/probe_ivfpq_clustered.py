"""IVF-PQ recall on a CLUSTERED corpus (VERDICT r9 #7): the bench's
i.i.d.-random embeddings are PQ's adversarial case (no cluster
structure to exploit), so BENCH_DETAIL's recall knee understates the
serving quality on real corpora.  This probe measures the SAME
pipeline (8-cell coarse + residual-trained m=16 k=64 book, recall@5
vs exact L2, ADC and +rerank50, nprobe sweep) on a synthetic corpus
with honest cluster structure — 8 well-separated Gaussian clusters in
64-d (center spread 4x the intra-cluster sigma), the non-adversarial
endpoint that brackets the recall story.

Usage: python tools/probe_ivfpq_clustered.py [n_vectors]
Prints the markdown rows for BASELINE.md.
"""
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    d, n_clusters = 64, 8

    from xpysom_dask_spark.operators import clustering as CLU
    from xpysom_dask_spark.operators import pq as PQ
    from xpysom_dask_spark.session import make_session

    spark = make_session("ivfpq-clustered-probe")

    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 1.0, (n_clusters, d)) * 4.0
    labels = rng.integers(0, n_clusters, n)
    X = centers[labels] + rng.normal(0.0, 1.0, (n, d))
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>").persist()
    emb.count()

    coarse = CLU.kmeans_init(emb, k=n_clusters)
    rbook = PQ.pq_fit(PQ.ivfpq_residuals(emb, coarse),
                      vec_col="res", m=16, k=64, max_iter=5)
    path = tempfile.mkdtemp(prefix="probe_ivfpq_clu_")
    PQ.build_ivfpq_index(coarse, rbook, emb, path)

    qmask = np.arange(n) % 50 == 0
    exact = {}
    for qi in np.where(qmask)[0]:
        dist = ((X - X[qi]) ** 2).sum(axis=1)
        dist[qi] = np.inf
        exact[int(qi)] = set(np.argsort(dist)[:5].tolist())
    queries = emb.where("vec_id % 50 = 0")

    def recall_of(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & ns) for q, ns in by_q.items())
        return round(hits / (5 * len(exact)), 3)

    print(f"| nprobe | ADC | +rerank50 |   (clustered, n={n})")
    print("|---|---|---|")
    for nprobe in (1, 2, 4, 8):
        adc = recall_of(PQ.ivfpq_topk(
            spark, path, coarse, rbook, queries, k=5,
            nprobe=nprobe).collect())
        rr = recall_of(PQ.ivfpq_rerank_topk(
            spark, path, coarse, rbook, emb, queries, k=5,
            shortlist=50, nprobe=nprobe).collect())
        print(f"| {nprobe} | {adc} | {rr} |")
    # ceiling attribution: if widening the shortlist (not the probe
    # count) recovers recall, the residual loss is ADC shortlist
    # membership under distance concentration, not cell pruning
    for sl in (200, 500):
        rr = recall_of(PQ.ivfpq_rerank_topk(
            spark, path, coarse, rbook, emb, queries, k=5,
            shortlist=sl, nprobe=1).collect())
        print(f"| 1 (shortlist={sl}) | - | {rr} |")
    spark.stop()


if __name__ == "__main__":
    main()
