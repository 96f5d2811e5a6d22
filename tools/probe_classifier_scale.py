#!/usr/bin/env python
"""Scale probe for the classifier/URL/line-squash family.

Usage: python tools/probe_classifier_scale.py <sf_dir>
(sf1 tier: python tools/sf1_smoke.py --gen-only, then /tmp/sf1)
Min of 2 warm after 1 cold, local[32], 16g; paste the rows into
BASELINE.md's scale tables.  Round-9 measured decade (5k->50k docs):
fit 4.8x, score 8.6x (linear, md5-bound), dense IRLS 1.8x,
url_canonicalize 2.6x, squash_lines 1.9x."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from xpysom_dask_spark import make_session
from xpysom_dask_spark.operators import models as MD
from xpysom_dask_spark.operators.dedup import squash_repeated_lines
from xpysom_dask_spark.operators.text import canonicalize_url
from xpysom_dask_spark.sources import readers

sf = sys.argv[1]
spark = make_session("probe-r9s3", master="local[32]",
                     shuffle_partitions=32, driver_memory="16g")
docs = readers.load_table(spark, sf, "documents")
n = docs.count()
print(f"{sf}: {n} docs")


def timed(name, fn):
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    print(f"| {name} | cold {runs[0]:.2f} | warm "
          f"{min(runs[1:]):.2f} |", flush=True)


lab = docs.withColumn("y", (F.col("lang") == "en").cast("int"))
timed("logreg_hashed_fit (1024 buckets, 6 steps)",
      lambda: MD.logreg_fit_hashed(lab, "text", "doc_id", "y",
                                   n_buckets=1024, n_iter=6))
m = MD.logreg_fit_hashed(lab, "text", "doc_id", "y",
                         n_buckets=1024, n_iter=6)
timed("logreg_hashed_score",
      lambda: MD.logreg_score_hashed(docs, "text", "doc_id", m)
      .agg(F.avg("quality_p")).collect())
uex = F.concat(F.lit("HTTP://WWW.ex"),
               (F.col("doc_id") % 97).cast("string"),
               F.lit(".com:80/p/"), F.col("doc_id").cast("string"),
               F.lit("/?utm_source=x&b=2&a=1#frag"))
timed("url_canonicalize",
      lambda: docs.select(canonicalize_url(uex).alias("u"))
      .agg(F.sum(F.length("u"))).collect())
timed("squash_lines",
      lambda: squash_repeated_lines(docs, "text", "doc_id")
      .agg(F.sum("n_lines_squashed"),
           F.sum(F.length("text"))).collect())
timed("logreg_dense_irls (3 feats)",
      lambda: MD.logreg_fit(
          docs.select((F.length("text") / 1000.0).alias("f0"),
                      (F.col("n_chars") / 1000.0).alias("f1"),
                      (F.col("lang") == "en").cast("int").alias("y")),
          ["f0", "f1"], "y", n_iter=8))
spark.stop()
