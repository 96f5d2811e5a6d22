#!/usr/bin/env python
"""Travelling-salesman tour via an elastic-band SOM — the script
equivalent of the reference's TravellingSalesmanProblem notebook
(reference examples/TravellingSalesmanProblem.ipynb: random cities →
1xN MiniSom → route = cities ordered by BMU index), re-expressed
Spark-first.

Adaptation notes: the notebook's cities are random points; here they
derive deterministically from the customer table (two independent
content hashes → the unit square), so the input is the driver-provided
testdata, not ad-hoc randomness.  The notebook's map is an open 1xN
strip (MiniSom has no ring topology either), so the tour is an open
path; the demo reports the path-length improvement over the naive
key-ordered visit.

Run:  python examples/tsp_som.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import SparkSom, make_session  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402

N_CITIES = 60


def _tour_length(pts: np.ndarray) -> float:
    return float(np.sqrt(((pts[1:] - pts[:-1]) ** 2).sum(axis=1)).sum())


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("tsp-som-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # 1. cities: unit-square points hashed from customer keys (pure
    # codegen — xxhash64 is the engine-wide deterministic hash)
    def unit(col, salt):
        h = F.xxhash64(F.col(col).cast("string"), F.lit(salt))
        return (F.pmod(h, F.lit(1 << 30)) / F.lit(float(1 << 30)))

    cities = (readers.load_table(spark, sf_dir, "customer")
              .orderBy("c_custkey").limit(N_CITIES)
              .select(F.col("c_custkey").alias("city"),
                      F.array(unit("c_custkey", "x").cast("float"),
                              unit("c_custkey", "y").cast("float"))
                      .alias("features")))
    n = cities.count()
    print(f"== {n} cities from {sf_dir}/customer.parquet")

    # 2. elastic band: 1 x (3n) strip, wide-then-narrow neighborhood
    som = SparkSom(1, 3 * n, 2, sigma=float(n), sigmaN=0.5,
                   learning_rate=0.6, learning_rateN=0.05,
                   neighborhood_function="gaussian", random_seed=42,
                   fuse_local_bytes=0)
    som.train(cities, 40)

    # 3. route: order cities by BMU index along the strip (tie-break by
    # key for determinism), all relational until the tiny final collect
    routed = (som.transform(cities, ("cluster_id",), keep=("city", "features"))
              .orderBy("cluster_id", "city")
              .select("city", "features").collect())
    order = np.array([r["features"] for r in routed], dtype=float)
    naive = np.array(
        [r["features"] for r in cities.orderBy("city").collect()],
        dtype=float)

    l_som, l_naive = _tour_length(order), _tour_length(naive)
    print(f"path length: SOM {l_som:.3f}  vs key-order {l_naive:.3f} "
          f"({100 * (1 - l_som / l_naive):.0f}% shorter)")
    assert l_som < l_naive, "elastic band should beat the naive visit"

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
