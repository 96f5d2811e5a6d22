#!/usr/bin/env python
"""Handwritten-digits-style SOM classification — the script equivalent
of the reference's HandwrittenDigits + Classification notebooks
(reference examples/HandwrittenDigits.ipynb: sklearn 8x8 digits →
30x30 MiniSom → per-cell label plot → nearest-prototype accuracy),
re-expressed Spark-first over the synthetic ``embeddings`` table —
which has exactly the digits shape: 64-dim vectors (8x8), 10 classes.

Run:  python examples/handwritten_digits.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)

Pipeline:
1. load embeddings (vec_id, 64-float vector, label 0-9)
2. deterministic hash split into train/test (no driver-side shuffle)
3. train a 10x10 SOM on the train vectors (distributed batch plan)
4. the notebook's label map: majority training label per SOM cell,
   printed as the 10x10 character grid
5. nearest-prototype classification of the held-out split — accuracy
   via one broadcast join + one aggregate (no per-row Python)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import SparkSom, make_session  # noqa: E402
from xpysom_dask_spark.operators import sampling  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("handwritten-digits-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    emb = readers.load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", F.col("embedding").alias("features"), "label")
    dim = len(emb.select("features").first()[0])
    print(f"== {emb.count()} vectors x {dim} dims, "
          f"{emb.select('label').distinct().count()} classes")

    # 2. deterministic 80/20 split on the content hash — layout-independent
    lab = sampling.split_by_hash(emb, "vec_id", {"train": 0.8, "test": 0.2},
                                 seed=42)
    train = lab.where(F.col("split") == "train").drop("split")
    test = lab.where(F.col("split") == "test").drop("split")

    # 3. train the map.  The synthetic classes separate at the MEAN
    # (centroid accuracy ≈ 0.37 vs 0.10 chance) but are locally noisy
    # (1-nn ≈ 0.07), so a COARSE map whose cells approximate class
    # regions beats the notebook's fine grid here.
    som = SparkSom(4, 4, dim, sigma=1.5, learning_rate=0.5,
                   random_seed=42, fuse_local_bytes=0)
    som.train(train, 15, verbose=True)
    print(f"QE = {som.quantization_error(train):.4f}   "
          f"TE = {som.topographic_error(train):.4f}")

    # 4. the notebook's per-cell majority-label plot, as a text grid
    cells = {(r["bmu_x"], r["bmu_y"]): r["label"]
             for r in som.cell_labels(train, "label").collect()}
    print("label map (majority training label per cell, '.' = no wins):")
    for yy in range(4):
        print(" ".join(str(cells.get((xx, yy), "."))[:1]
                       for xx in range(4)))

    # 5. held-out accuracy: classify() emits the majority cell label as
    # `label`; join the truth back on vec_id — one broadcast join + one
    # equi-join + two counts, no per-row Python
    truth = test.select("vec_id", F.col("label").alias("label_true"))
    scored = som.transform(test, ("bmu_x", "bmu_y"), keep=("vec_id",))
    cl = som.cell_labels(train, "label").select(
        "bmu_x", "bmu_y", F.col("label").alias("label_pred"))
    joined = scored.join(F.broadcast(cl), ["bmu_x", "bmu_y"], "left") \
        .join(truth, "vec_id")
    n_test = joined.count()
    n_hit = joined.where(F.col("label_pred") == F.col("label_true")).count()
    acc = n_hit / max(n_test, 1)
    print(f"held-out accuracy: {n_hit}/{n_test} = {acc:.3f} "
          f"(chance = 0.100)")

    # in-sample check (stabler than the 20 % split on this small sf):
    # the unsupervised map should beat chance by a clear margin — the
    # synthetic classes separate at the mean but are locally noisy, so
    # ~0.2 is the SOM's ceiling here (nearest-centroid reaches 0.37)
    tr_scored = som.transform(train, ("bmu_x", "bmu_y"), keep=("vec_id",))
    tr_joined = tr_scored.join(F.broadcast(cl), ["bmu_x", "bmu_y"], "left") \
        .join(train.select("vec_id", F.col("label").alias("label_true")),
              "vec_id")
    tr_n = tr_joined.count()
    tr_hit = tr_joined.where(
        F.col("label_pred") == F.col("label_true")).count()
    print(f"in-sample accuracy: {tr_hit}/{tr_n} = {tr_hit / tr_n:.3f}")
    assert tr_hit / tr_n > 0.12, "should beat 10-class chance clearly"

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
