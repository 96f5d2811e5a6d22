#!/usr/bin/env python
"""Round-4 training-data assembly, end to end: leakage-safe split →
exact + near-dup decontamination → domain reweighting (fractional
upsample) → weighted k-selection → trend audit → hard negatives.

The eval-safety story in one pipeline: the split is keyed on a content
fingerprint (near-identical docs can never straddle train/test), then
the train side is scrubbed of test material twice — the exact
single-n-gram rule AND whole-document MinHash near-identity — before
any mixing decision is made.

Every stage is a declarative Spark plan: hash splits and upsampling are
map-side pure functions, decontamination candidates come from broadcast
band joins, the weighted pick is one window — the shapes that hold at
100 TB.

Run:  python examples/training_data_round4.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import (  # noqa: E402
    dedup,
    profile,
    sampling,
    similarity,
)
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("training-data-round4", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = readers.load_table(spark, sf_dir, "documents")

    # 1. leakage-safe split: hash the winnowing fingerprint, not the id
    split = sampling.leakage_safe_split(
        docs, "doc_id", T.min_shingle_fingerprint("text"),
        {"train": 0.9, "test": 0.1}, seed=1)
    train = split.where("split = 'train'").drop("split")
    test = split.where("split = 'test'").drop("split")
    n_train = train.count()
    print(f"split: {n_train} train / {test.count()} test "
          "(near-dup groups never straddle)")

    # 2. decontaminate twice: exact n-gram rule, then near-identity
    clean = dedup.decontaminate(train, test, "text", "doc_id", n=5)
    clean = dedup.fuzzy_decontaminate(clean, test, "text", "doc_id",
                                      threshold=0.5, n=3)
    print(f"decontaminated: {n_train} -> {clean.count()} train docs")

    # 3. domain reweighting: fractional upsample + weighted k-pick
    mixed = sampling.upsample_by_weight(
        clean, "doc_id", "source",
        {"src0": 2.0, "src1": 0.5}, seed=3)
    picked = sampling.weighted_sample_topk(
        clean, "doc_id", "n_chars", k=5, group_col="source", seed=11)
    print(f"mixture: {mixed.count()} rows after upsample; "
          f"{picked.count()} length-weighted picks")

    # 4. trend audit: does doc length drift across the id range?
    fit = profile.regr_by_group(
        clean.withColumn("bucket", F.expr("doc_id % 4")),
        "bucket", "doc_id", "n_chars", x_decimals=0, y_decimals=0)
    fit.orderBy("bucket").show(truncate=False)

    # 4b. quality probe: fit a ridge scorer on cheap features, keep
    # the top half (the FineWeb-style classifier gate)
    from xpysom_dask_spark.operators import models

    feat = clean.select(
        "doc_id", F.col("n_chars").cast("double").alias("f_len"),
        F.size(F.split("text", " ")).cast("double").alias("f_toks"),
        T.quality_score("text").alias("y"))
    probe = models.ridge_fit(feat, ["f_len", "f_toks"], "y", l2=1e-6)
    gated = models.probe_filter(feat, probe, keep_fraction=0.5,
                                id_col="doc_id")
    print(f"probe gate: kept {gated.count()} of {feat.count()} "
          f"(coef {[round(float(c), 5) for c in probe['coef']]})")

    # 5. hard negatives for the contrastive head
    emb = readers.load_table(spark, sf_dir, "embeddings")
    negs = similarity.hard_negatives(
        emb, emb.where("vec_id % 200 = 0"), k=3)
    print("hard negatives:", negs.count(), "rows")
    negs.show(6, truncate=False)

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
