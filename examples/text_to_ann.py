#!/usr/bin/env python
"""Model-free text → ANN, end to end: the continuation-session bridge.

No embedding model in the loop anywhere — every vector is a
deterministic function of the text, so the whole chain is reproducible
and SQL-auditable:

1. quality gating by Shannon entropy (junk/base64/boilerplate cut),
2. signed feature-hashing vectorizer (text → unit vectors),
3. product-quantization compression of those vectors (32× smaller),
4. IVF-PQ index + ADC top-k neighbor search over the codes,
5. pseudonymized export of the match table (keyed sha256 tags —
   joinable under the same salt, irreversible without it).

Run:  python examples/text_to_ann.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import pq  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("text-to-ann", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = readers.load_table(spark, sf_dir, "documents")

    print("== 1. entropy gate: drop the degenerate tail ==")
    ent = T.entropy_signals(docs, "text", "doc_id")
    kept_ids = ent.where("token_entropy >= 1.0 AND char_entropy >= 2.0")
    kept = docs.join(kept_ids.select(F.col("id").alias("doc_id")),
                     "doc_id")
    print(f"kept {kept.count()} / {docs.count()} docs")

    print("== 2. feature-hashing vectorizer (dim=64, unit L2) ==")
    vecs = T.hash_embedding(kept, "text", "doc_id", dim=64) \
        .withColumnRenamed("id", "vec_id") \
        .withColumnRenamed("vec", "embedding")
    vecs.cache()
    vecs.show(2, truncate=50)

    print("== 3-4. IVF-PQ over the hashed vectors ==")
    rows = vecs.orderBy("vec_id").limit(12).collect()
    M = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    coarse = M[:4]
    book = pq.pq_fit(pq.ivfpq_residuals(vecs, coarse),
                     vec_col="res", m=8, k=16, max_iter=4)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ivfpq")
        pq.build_ivfpq_index(coarse, book, vecs, path)
        qs = vecs.limit(3)
        nn = pq.ivfpq_topk(spark, path, coarse, book, qs, k=3,
                           nprobe=2)
        nn.orderBy("query_id", "rank").show(9)

        print("== 5. pseudonymized export of the match table ==")
        named = nn.join(
            docs.select(F.col("doc_id").alias("neighbor_id"),
                        "source"), "neighbor_id")
        out = T.pseudonymize(
            named.withColumn("source", F.col("source")),
            ["source"], salt="demo-export")
        out.orderBy("query_id", "rank") \
            .select("query_id", "rank", "neighbor_id", "source").show(9)

    vecs.unpersist()
    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
