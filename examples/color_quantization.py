#!/usr/bin/env python
"""Color quantization + color-space mapping + cover clustering with a
SOM — the script equivalent of the reference's ColorQuantization,
ColorSpaceMapping and MovieCovers notebooks (reference examples/),
re-expressed Spark-first.

Adaptation notes: the notebooks read a JPEG (tree.jpg) and a folder of
cover images; this container has no image files or decoders, so the
pixel stream derives deterministically from the events table (three
content hashes → RGB) and the "covers" are the engine's synthetic
raw bitmaps from the embeddings table (multimodal.embeddings_as_images
— the same binary-column plumbing a real decoder would feed).

Run:  python examples/color_quantization.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)

1. ColorSpaceMapping: train an 8x8 SOM on the RGB stream — the weight
   grid IS the learned color map (printed as hex swatches)
2. ColorQuantization: quantize every pixel to its BMU palette color;
   report QE (mean per-channel error) and the palette histogram
3. MovieCovers: decode raw bitmaps → 5 image features → SOM cells
   group visually-similar covers
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import SparkSom, make_session  # noqa: E402
from xpysom_dask_spark.operators import multimodal  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("color-quantization-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # 1. the pixel stream: one deterministic RGB triple per event row
    def chan(salt):
        h = F.xxhash64(F.col("event_id").cast("string"), F.lit(salt))
        return (F.pmod(h, F.lit(256)) / F.lit(255.0)).cast("float")

    pixels = (readers.load_table(spark, sf_dir, "events")
              .select(F.array(chan("r"), chan("g"), chan("b"))
                      .alias("features")))
    n = pixels.count()
    print(f"== {n} pixels derived from {sf_dir}/events.parquet")

    som = SparkSom(8, 8, 3, sigma=2.5, learning_rate=0.5, random_seed=42,
                   fuse_local_bytes=0)
    som.train(pixels, 8)

    # the learned color space, as the notebook's weight-grid image
    w = np.clip(som.get_weights(), 0, 1)
    print("learned 8x8 color map (hex):")
    for row in (w * 255).astype(int):
        print(" ".join(f"#{r:02x}{g:02x}{b:02x}" for r, g, b in row))

    # 2. quantize: every pixel → its palette id; 64-color reconstruction
    print(f"palette QE (mean distance to palette color) = "
          f"{som.quantization_error(pixels):.4f}")
    hist = (som.transform(pixels, ("cluster_id",))
            .groupBy("cluster_id").count().orderBy(F.desc("count")))
    print("top palette colors by pixel share:")
    hist.show(5, truncate=False)

    # 3. cover clustering: raw bitmaps → image features, min-max
    # normalized per dimension (the stats live on wildly different
    # scales — one aggregate over the posexploded dims, folded back as
    # literals), → SOM cells
    emb = readers.load_table(spark, sf_dir, "embeddings")
    covers = multimodal.embeddings_as_images(emb)
    raw = multimodal.image_features(covers) \
        .select(F.col("features").cast("array<double>").alias("f"))
    bounds = (raw.select(F.posexplode("f").alias("i", "v"))
              .groupBy("i").agg(F.min("v").alias("lo"),
                                F.max("v").alias("hi"))
              .orderBy("i").collect())
    lo = F.array(*[F.lit(b["lo"]) for b in bounds])
    rng = F.array(*[F.lit((b["hi"] - b["lo"]) or 1.0) for b in bounds])
    feats = raw.select(
        F.zip_with(F.zip_with(F.col("f"), lo, lambda v, l: v - l), rng,
                   lambda v, r: (v / r).cast("float")).alias("features"))
    csom = SparkSom(4, 4, 5, sigma=1.5, random_seed=7, fuse_local_bytes=0)
    csom.train(feats, 8)
    groups = csom.transform(feats, ("cluster_id",)) \
        .groupBy("cluster_id").count()
    n_cells = groups.count()
    print(f"covers grouped into {n_cells} visual cells")
    assert n_cells > 1, "covers should spread across multiple cells"

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
