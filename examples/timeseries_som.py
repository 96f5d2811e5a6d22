#!/usr/bin/env python
"""Time-series clustering with a SOM — the script equivalent of the
reference's TimeSeries notebook (reference examples/TimeSeries.ipynb:
weekly sales curves → 8×8 MiniSom → per-cell min/mean/max curve plot),
re-expressed Spark-first over the synthetic star schema.

Run:  python examples/timeseries_som.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)

Pipeline (every step a DataFrame op until the tiny codebook math):

1. weekly demand curve per part: lineitem → (part, week) quantity sums
   → fixed-length dense array via a map + sequence fill (one shuffle
   on the part key; weeks pivot inside the aggregate, no second pass)
2. per-part min-max normalization — the notebook's 'Normalized i'
   columns — as codegen array math
3. train an 8×8 SOM on the 52-dim curves (distributed batch plan)
4. the notebook's GridSpec of per-cell min/mean/max curves, computed
   relationally: transform → posexplode(curve) → groupBy(cell, week)
   min/mean/max — O(parts·weeks) narrow traffic, rendered as text
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

N_WEEKS = 52
GRID_X = GRID_Y = 4


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("timeseries-som-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    li = readers.load_table(spark, sf_dir, "lineitem")

    # 1. (part, week) demand, densified to a fixed-length curve.  weekofyear
    # is 1-based and ISO-53-week years exist; fold everything into 52 bins.
    week = (F.weekofyear(F.col("l_shipdate")) - 1) % N_WEEKS
    curves = (
        li.select(F.col("l_partkey"), week.alias("__wk"),
                  F.col("l_quantity").cast("double").alias("__q"))
        .groupBy("l_partkey", "__wk")
        .agg(F.sum("__q").alias("__q"))
        .groupBy("l_partkey")
        .agg(F.map_from_entries(F.collect_list(F.struct(
            F.col("__wk"), F.col("__q")))).alias("m"))
        .select("l_partkey", F.transform(
            F.sequence(F.lit(0), F.lit(N_WEEKS - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0)))
            .alias("curve"))
    )

    # 2. per-part min-max normalization (the notebook's precomputed
    # 'Normalized i' columns), guarded for flat curves
    lo = F.array_min("curve")
    hi = F.array_max("curve")
    span = F.when(hi - lo > 0, hi - lo).otherwise(F.lit(1.0))
    feats = curves.select(
        "l_partkey",
        F.transform("curve", lambda v: (v - lo) / span).alias("features"))
    feats = feats.persist()
    n = feats.count()
    print(f"== {n} part-level weekly demand curves ({N_WEEKS} weeks)")

    # 3. train — sigma=2, gaussian, seeded, like the notebook config
    som = SparkSom(GRID_X, GRID_Y, N_WEEKS, sigma=2.0, learning_rate=0.5,
                   random_seed=10, fuse_local_bytes=0)
    som.train(feats.select("features"), 5)
    print(f"quantization_error = "
          f"{som.quantization_error(feats.select('features')):.6f}")

    # 4. per-cell curve envelopes, relationally (the notebook plots
    # min/mean/max of each cell's member curves)
    scored = som.transform(feats, ("bmu_x", "bmu_y"))
    env = (scored.select("bmu_x", "bmu_y",
                         F.posexplode("features").alias("week", "v"))
           .groupBy("bmu_x", "bmu_y", "week")
           .agg(F.min("v").alias("lo"), F.avg("v").alias("mean"),
                F.max("v").alias("hi"),
                F.count(F.lit(1)).alias("n")))
    env.persist()

    members = (scored.groupBy("bmu_x", "bmu_y")
               .agg(F.count(F.lit(1)).alias("n_parts"))
               .orderBy(F.desc("n_parts")))
    print("cell membership (top 5):")
    members.show(5, truncate=False)

    # text rendering of the busiest cell's envelope (quartile samples)
    top = members.first()
    cell = env.where((F.col("bmu_x") == top["bmu_x"])
                     & (F.col("bmu_y") == top["bmu_y"])) \
        .orderBy("week").collect()
    print(f"envelope of cell ({top['bmu_x']}, {top['bmu_y']}) "
          f"[{top['n_parts']} parts], weeks 0/13/26/39/51:")
    for w in (0, 13, 26, 39, 51):
        r = cell[w]
        print(f"  week {w:2d}: lo={r['lo']:.3f} "
              f"mean={r['mean']:.3f} hi={r['hi']:.3f}")

    feats.unpersist()
    env.unpersist()
    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:])
