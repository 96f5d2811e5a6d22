#!/usr/bin/env python
"""End-to-end SOM workflow — the script equivalent of the reference's
Clustering / Iris / HexagonalTopology notebooks (reference examples/),
driven by the Spark-native engine.

Run:  python examples/som_clustering.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)

Covers the full estimator surface: train (distributed plan), quality
metrics (QE/TE), per-row scoring via transform, map summaries
(distance_map, activation_response, win_map), PCA init, hexagonal
topology, and save/load round-trip.
"""

import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import SparkSom, make_session  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("som-clustering-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # 1. load features: 8 numeric lineitem columns -> array<float> column
    feats = readers.lineitem_features(spark, sf_dir, keys=False)
    n = feats.count()
    print(f"== training data: {n} rows x 8 features from {sf_dir}")

    # 2. train a 6x6 map, 10 epochs, distributed batch plan
    som = SparkSom(6, 6, 8, sigma=2.0, learning_rate=0.5, random_seed=42,
                   fuse_local_bytes=0)
    som.train(feats, 10, verbose=True)

    # 3. map quality
    print(f"quantization_error  = {som.quantization_error(feats):.6f}")
    print(f"topographic_error   = {som.topographic_error(feats):.6f}")

    # 4. per-row scoring: BMU coordinates + flat cluster id as columns
    scored = som.transform(feats, ("bmu_x", "bmu_y", "cluster_id"))
    scored.groupBy("cluster_id").count().orderBy(F.desc("count")) \
        .show(5, truncate=False)

    # 5. map summaries (U-matrix analog + win counts)
    print("distance_map (U-matrix):")
    print(np.round(som.distance_map(), 3))
    print("activation_response (win counts per cell):")
    print(som.activation_response(feats).astype(int))

    # 6. PCA weight init + hexagonal topology variant
    hexsom = SparkSom(6, 6, 8, topology="hexagonal", random_seed=7,
                      fuse_local_bytes=0)
    hexsom.pca_weights_init(feats)
    hexsom.train(feats, 5)
    print(f"hexagonal QE        = {hexsom.quantization_error(feats):.6f}")

    # 7. classification + outlier detection (the reference's
    #    Classification / OutliersDetection notebook workflows)
    li = readers.load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as _F
    labeled = li.select(
        "l_returnflag",
        _F.array(*[_F.expr(e).cast("float")
                   for _n, e in readers.LINEITEM_FEATURES])
        .alias("features"))
    pred = som.classify(labeled, labeled, "l_returnflag")
    pred.groupBy("label").count().orderBy(_F.desc("count")).show(4)
    outliers = som.anomalies(feats, quantile=0.99)
    print(f"anomalies above p99 QE: {outliers.count()} rows")

    # 8. save / load round-trip (npz file + parquet model table)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "som.npz")
        som.save(path)
        som2 = SparkSom.load(path)
        assert np.allclose(som.get_weights(), som2.get_weights())
        tpath = os.path.join(d, "som_table")
        som.save_table(spark, tpath)
        som3 = SparkSom.load_table(spark, tpath)
        assert np.allclose(som.get_weights(), som3.get_weights())
        print("save/load round-trips OK (npz + parquet model table)")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
