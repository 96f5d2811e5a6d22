#!/usr/bin/env python
"""Supervised quality-classifier gate, end to end — the GPT-3/CCNet
curation recipe on Spark: pick a REFERENCE slice of the corpus as
positives, the rest as negatives, train a linear classifier on cheap
text features, score every document with a codegen'd expression, and
keep the high-p(ref) tail.

Two model tiers, both deterministic by construction (per-row
gradient/Hessian terms quantized to exact DECIMAL(38,0) e9 integers —
the fit is bit-identical under repartitioning):

* ``logreg_fit`` — Newton/IRLS over d ≤ 64 NUMERIC signals (here:
  readability + entropy + stopword coverage).  One combinable
  gradient+Hessian aggregate per step; ~6 steps to convergence.
* ``logreg_fit_hashed`` — the fastText-shape TEXT model over hashed
  unigram+bigram bags.  The weight vector rides the plan as a literal
  array, so margins are map-side array work and each GD step is ONE
  job regardless of corpus size.

The front door before either model: URL canonicalization + domain
blocklist (the cheap deterministic kills come first, the model only
sees survivors).

Run:  python examples/quality_classifier.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import dedup  # noqa: E402
from xpysom_dask_spark.operators import models  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir: str) -> None:
    spark = make_session("quality-classifier")
    docs = readers.load_table(spark, sf_dir, "documents")

    # ---- stage 0: deterministic front door ---------------------------
    # synthesize a crawl-ish URL per doc (the testdata ships none),
    # canonicalize it, and drop blocklisted domains — the shape is the
    # point: pure codegen string work + a broadcast-sized semi-join
    url = F.concat(F.lit("HTTP://WWW."), F.col("source"),
                   F.lit(".example"),
                   F.when(F.col("doc_id") % 7 == 0, ".ads")
                   .otherwise(F.lit("")),
                   F.lit(".com:80/d/"),
                   F.col("doc_id").cast("string"),
                   F.lit("/?utm_source=tour&x=1#frag"))
    withurl = docs.withColumn("url", T.canonicalize_url(url)) \
                  .withColumn("host", F.regexp_extract(
                      "url", r"https?://([^/?]+)", 1))
    bl = spark.createDataFrame([("ads.com",)], ["domain"])
    gated = T.domain_blocklist_filter(withurl, "host", bl, "doc_id")
    print(f"blocklist gate: {docs.count()} -> {gated.count()} docs")

    # repeated-line squash before any token statistics
    clean = dedup.squash_repeated_lines(gated, "text", "doc_id")

    # ---- stage 1: weak labels ----------------------------------------
    # The synthetic corpus draws every doc from ONE token pool, so no
    # text signal separates lang/source labels (a classifier honestly
    # predicts the base rate).  To demo the LEARNING path we plant a
    # spam boilerplate tail in a deterministic ~30% of docs and ask
    # the model to recover the plant — the negative-mining shape of a
    # real curation run (positives = clean, negatives = spam-bearing).
    spam = F.crc32(F.col("doc_id").cast("string")) % 10 < 3
    lab = (clean.withColumn("y", (~spam).cast("int"))
           .withColumn("text", F.when(
               spam, F.concat_ws(" ", "text", F.lit(
                   "click here buy now free offer limited deal")))
               .otherwise(F.col("text"))))
    print("weak label: 1 = no planted spam tail, base rate "
          f"{lab.agg(F.avg('y')).first()[0]:.3f}")

    # ---- stage 2: dense IRLS probe over numeric signals --------------
    feats = (T.readability_scores(lab, "text", "doc_id")
             .join(lab.select(F.col("doc_id").alias("id"), "y"), "id")
             .join(T.entropy_signals(lab, "text", "doc_id")
                   .select("id", "char_entropy"), "id")
             .withColumn("fre", F.col("flesch_e6") / 1e6)
             .withColumn("fk", F.col("fkgl_e6") / 1e6))
    dense_cols = ["fre", "fk", "char_entropy"]
    m_dense = models.logreg_fit(feats, dense_cols, "y", n_iter=25,
                                l2=1e-3)
    print(f"dense IRLS: converged={m_dense['converged']} "
          f"iters={m_dense['n_iter_run']} n={m_dense['n']}")
    scored_d = models.logreg_score(feats, m_dense)
    cal = scored_d.agg(F.avg("quality_p").alias("p"),
                       F.avg("y").alias("rate")).first()
    print(f"  calibration: mean p={cal['p']:.4f} vs "
          f"base rate={cal['rate']:.4f}  (MLE property: equal)")

    # ---- stage 3: hashed-text fastText-shape model --------------------
    m_hash = models.logreg_fit_hashed(lab, "text", "doc_id", "y",
                                      n_buckets=2048, n_iter=12)
    scored = models.logreg_score_hashed(lab, "text", "doc_id", m_hash)
    joined = scored.join(
        lab.select(F.col("doc_id").alias("id"), "y"), "id")
    acc = joined.agg(F.avg(((F.col("quality_p") > 0.5).cast("int")
                            == F.col("y")).cast("double"))).first()[0]
    print(f"hashed model: n_buckets={m_hash['n_buckets']} "
          f"train-accuracy={acc:.3f}")

    # ---- stage 3b: WHY — the top-feature interpretability audit -------
    rep = models.logreg_top_features(lab, "text", m_hash,
                                     top_k=5).collect()
    for r in rep:
        if r["direction"] == "neg":
            print(f"  neg bucket {r['bucket']:5d} w={r['weight_e6']/1e6:+.3f}"
                  f" df={r['n_docs']} terms={r['terms'][:3]}")

    # ---- stage 4: calibration audit + the gate ------------------------
    rel = models.calibration_report(joined, "quality_p", "y").collect()
    ece = sum(r["n"] * abs(r["gap_e6"]) for r in rel) \
        / sum(r["n"] for r in rel) / 1e6
    print(f"reliability bins: {len(rel)}, ECE={ece:.4f}")
    kept = joined.where(F.col("quality_p") > 0.5)
    mix = kept.groupBy("y").count().orderBy("y").collect()
    print("kept mix by weak label:",
          {int(r["y"]): int(r["count"]) for r in mix})

    # ---- stage 5: persist the model (npz, no pickle) ------------------
    import tempfile

    art = os.path.join(tempfile.mkdtemp(prefix="qc_model_"),
                       "quality.npz")
    models.save_classifier(m_hash, art)
    m_loaded = models.load_classifier(art)
    assert (m_loaded["w"] == m_hash["w"]).all()
    print(f"model artifact: {art} "
          f"({os.path.getsize(art)} bytes, npz round-trip exact)")

    # ---- stage 6: stream-score new arrivals with the SAVED model ------
    # the batch scorer is already the right streaming shape (stateless
    # narrow pass, weights broadcast at query start), so classify_stream
    # IS the batch plan under Structured Streaming
    import uuid

    from xpysom_dask_spark.streaming import classify_stream

    arrivals_dir = tempfile.mkdtemp(prefix="qc_arrivals_")
    lab.select("doc_id", "text").repartition(4) \
        .write.mode("overwrite").parquet(arrivals_dir)
    stream = spark.readStream \
        .schema(lab.select("doc_id", "text").schema) \
        .parquet(arrivals_dir)
    name = "qc_stream_" + uuid.uuid4().hex[:8]
    q = (classify_stream(stream, "text", "doc_id", m_loaded)
         .writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    drained = spark.table(name)
    parity = drained.join(
        scored.withColumnRenamed("quality_p", "batch_p"), "id") \
        .agg(F.max(F.abs(F.col("quality_p") - F.col("batch_p"))))
    print(f"stream-scored {drained.count()} docs; "
          f"max |stream - batch| = {parity.first()[0]} (bit parity)")

    # ---- stage 7: the quantile gate on the final scores ---------------
    # keep the top 60% by score — ONE sketch-quantile job for the
    # cutoff, then a map-side predicate; the corpus never shuffles
    gated_final = models.filter_by_score(joined, "quality_p", 0.6)
    n_in, n_out = joined.count(), gated_final.count()
    print(f"filter_by_score(0.6): {n_in} -> {n_out} docs "
          f"({n_out / n_in:.2f} kept)")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/testdata/sf0.001")
