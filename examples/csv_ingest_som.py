#!/usr/bin/env python
"""CSV → normalize → SOM → map summaries — the script equivalent of
the reference's Iris and DemocracyIndex notebooks (reference
examples/Iris.ipynb, DemocracyIndex.ipynb: pandas.read_csv → minmax
normalize → MiniSom → distance map + per-class scatter), re-expressed
Spark-first over the S8 CSV source.

The notebooks' CSVs (iris.csv, democracy_index.csv) aren't shipped
here, so the demo writes an equivalent labeled CSV derived from the
embeddings table (first 4 dims ≈ sepal/petal measurements, label ≈
species) and then runs the EXACT notebook workflow: load_csv →
column-wise min-max normalization (one aggregate, then codegen math)
→ features_from_columns → SOM → distance map + label map.

Run:  python examples/csv_ingest_som.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
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

DIMS = ("sepal_len", "sepal_wid", "petal_len", "petal_wid")


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("csv-ingest-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        # 0. materialize the notebook-style CSV (header + 4 floats + label)
        csv_dir = os.path.join(d, "iris_like")
        (readers.load_table(spark, sf_dir, "embeddings")
         .select(*[F.col("embedding")[i].alias(c)
                   for i, c in enumerate(DIMS)],
                 F.col("label").alias("species"))
         .coalesce(1)
         .write.option("header", True).csv(csv_dir))

        # 1. the notebook workflow starts here: CSV source with schema
        # inference; the projection below prunes to exactly 5 columns
        df = readers.load_csv(spark, csv_dir)
        print(f"== loaded {df.count()} rows from CSV, "
              f"schema: {[f.name for f in df.schema.fields]}")

        # 2. min-max normalize each measurement (ONE aggregate for all
        # bounds, folded into codegen expressions — no per-column pass)
        bounds = df.agg(*[f(c).alias(f"{c}_{t}") for c in DIMS
                          for f, t in ((F.min, "lo"), (F.max, "hi"))]) \
            .first()
        norm = df.select(
            "species",
            *[((F.col(c) - F.lit(bounds[f"{c}_lo"]))
               / F.lit(bounds[f"{c}_hi"] - bounds[f"{c}_lo"] or 1.0))
              .alias(c) for c in DIMS])
        feats = readers.features_from_columns(norm, DIMS,
                                              keep=("species",))

        # 3. train + the notebook's two plots, as text
        som = SparkSom(7, 7, len(DIMS), sigma=2.0, random_seed=42,
                       fuse_local_bytes=0)
        som.train(feats, 10)
        print(f"QE = {som.quantization_error(feats):.4f}")
        print("distance map (U-matrix):")
        print(np.round(som.distance_map(), 2))
        cells = {(r["bmu_x"], r["bmu_y"]): r["label"]
                 for r in som.cell_labels(feats, "species").collect()}
        print("species map (majority label per cell):")
        for yy in range(7):
            print(" ".join(str(cells.get((xx, yy), "."))[:1]
                           for xx in range(7)))

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
