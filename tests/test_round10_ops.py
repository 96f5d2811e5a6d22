"""Round-10 merged-gate invariants (beyond the oracle parity the
driver gate already enforces): each merge survivor must equal the
solo operators it absorbed, bit-for-bit, and the new classifier
scoring gate must match a pure-Python scorer differentially."""

import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from conftest import SF_TINY


# --------------------------------------------------------- hll_report


def test_hll_report_all_row_is_the_register_max_merge(spark):
    """The 'ALL' rollup must equal hll_estimate over GLOBALLY-built
    registers — the merge property (max over groups == global max),
    computed via a second independent path."""
    from xpysom_dask_spark.operators import sketches as SK
    from xpysom_dask_spark.sources import readers

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = readers.load_table(spark, SF_TINY, "events")
    direct = SK.hll_estimate(
        SK.hll_registers(
            ev.select(F.col("user_id").cast("string").alias("k")),
            "k", p=entrymod._HLL_P),
        p=entrymod._HLL_P).first()
    rows = entrymod.queries()["hll_report"](spark, SF_TINY).collect()
    all_row = [r for r in rows if r["event_type"] == "ALL"]
    assert len(all_row) == 1
    assert all_row[0]["est"] == direct["est"]
    assert all_row[0]["raw_sum_scaled"] == direct["raw_sum_scaled"]
    # one row per event_type + the rollup
    types = {r["event_type"] for r in rows}
    assert "ALL" in types and len(types) == len(rows)


# ------------------------------------------------------------- som_qe


def test_som_qe_scalar_is_the_rowwise_average(spark):
    rows = entrymod.queries()["som_qe"](spark, SF_TINY).collect()
    assert rows
    corpus = {r["corpus_qe"] for r in rows}
    assert len(corpus) == 1         # one broadcast scalar, every row
    want = round(sum(r["qe"] for r in rows) / len(rows), 6)
    # rounding order differs (scalar averages UNrounded qe), so allow
    # the last-digit wobble of averaging 4dp-rounded values
    assert abs(corpus.pop() - want) < 5e-5


# --------------------------------------------------- multimodal_audio


def test_multimodal_audio_equals_solo_operators(spark):
    from xpysom_dask_spark.operators import multimodal

    emb = entrymod._emb(spark, SF_TINY)
    clips = multimodal.embeddings_as_audio(emb)
    stats = {r["audio_id"]: r for r in
             multimodal.audio_stats(clips).collect()}
    sigs = {r["audio_id"]: r["bits"] for r in
            multimodal.audio_fingerprint(clips).collect()}
    merged = entrymod.queries()["multimodal_audio"](
        spark, SF_TINY).collect()
    assert len(merged) == len(stats) > 0
    for r in merged:
        s = stats[r["audio_id"]]
        assert (r["n_samples"], r["s_sum"], r["s_sumsq"], r["s_min"],
                r["s_max"], r["zero_crossings"]) == \
               (s["n_samples"], s["s_sum"], s["s_sumsq"], s["s_min"],
                s["s_max"], s["zero_crossings"])
        assert [r["fp_w0"], r["fp_w1"]] == sigs[r["audio_id"]]


# ----------------------------------------------------- hash_partition


def test_hash_partition_equals_solo_operators(spark):
    from xpysom_dask_spark.operators import sampling

    docs = entrymod._docs(spark, SF_TINY)
    split = {r["doc_id"]: r["split"] for r in sampling.split_by_hash(
        docs, "doc_id", dict(entrymod._SPLIT_WEIGHTS),
        seed=1).collect()}
    sampled = {r["doc_id"] for r in sampling.hash_sample(
        docs, "doc_id", 0.25, seed=7).collect()}
    rows = entrymod.queries()["hash_partition"](spark,
                                                SF_TINY).collect()
    assert len(rows) == len(split) > 0
    for r in rows:
        assert r["split"] == split[r["doc_id"]]
        assert r["in_sample"] == int(r["doc_id"] in sampled)


# --------------------------------------------------- events_smoothing


def test_events_smoothing_equals_solo_operators(spark):
    from xpysom_dask_spark.operators import events as EV
    from xpysom_dask_spark.operators.profile import ewma
    from xpysom_dask_spark.sources import readers

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = readers.load_table(spark, SF_TINY, "events")
    ma = {r["event_id"]: (r["user_id"], r["ma"]) for r in
          EV.moving_average(ev).collect()}
    ew = {r["id"]: r["ewma"] for r in ewma(
        ev.where(F.col("value").isNotNull()), "event_type", "value",
        "ts", "event_id", alpha=entrymod._EWMA_ALPHA,
        lag=entrymod._EWMA_LAG).collect()}
    rows = entrymod.queries()["events_smoothing"](spark,
                                                  SF_TINY).collect()
    assert len(rows) == len(ew) > 0   # EWMA side defines the rows
    for r in rows:
        assert (r["user_id"], r["ma"]) == ma[r["event_id"]]
        assert r["ewma_e6"] == math.floor(
            ew[r["event_id"]] * 1e6 + 0.5)


# ------------------------------------------------------ quality_score


def _py_score(text, w, b, nb):
    from xpysom_dask_spark.operators.models import _doc_buckets

    bs, cs = _doc_buckets(text, nb, True)
    z = b
    if cs:
        z = b + float(np.dot(w[np.asarray(bs, np.int64)],
                             np.asarray(cs))) / float(sum(cs))
    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    e = math.exp(z)
    return e / (1.0 + e)


def test_quality_score_matches_python_reference(spark):
    """Differential: the gate's p_e6 equals a pure-Python replay of
    featurize + margin + sigmoid on every document."""
    m = entrymod._qc_model()
    docs = {r["doc_id"]: r["text"] for r in
            entrymod._docs(spark, SF_TINY).collect()}
    rows = entrymod.queries()["quality_score"](spark,
                                               SF_TINY).collect()
    assert len(rows) == len(docs) > 0
    for r in rows:
        p = _py_score(docs[r["doc_id"]], m["w"], m["intercept"],
                      m["n_buckets"])
        assert r["p_e6"] == math.floor(p * 1e6 + 0.5), r["doc_id"]


def test_quality_score_empty_text_scores_intercept(spark):
    from xpysom_dask_spark.operators.models import logreg_score_hashed

    m = entrymod._qc_model()
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "tok")],
        "doc_id bigint, text string")
    got = {r["id"]: r["quality_p"] for r in
           logreg_score_hashed(df, "text", "doc_id", m).collect()}
    p0 = 1.0 / (1.0 + math.exp(0.5))        # sigmoid(intercept=-0.5)
    for i in (1, 2, 3):
        assert abs(got[i] - p0) < 1e-12
    assert 0.0 < got[4] < 1.0


# ------------------------------------------------- round-11 staged ops


def test_kmv_novelty_identical_and_disjoint(spark):
    from xpysom_dask_spark.operators import sketches as SK

    a = spark.createDataFrame([(f"k{i}",) for i in range(40)], ["k"])
    b = spark.createDataFrame([(f"x{i}",) for i in range(40)], ["k"])
    ska = SK.kmv_sketch(a, "k", k=16)
    skb = SK.kmv_sketch(b, "k", k=16)
    same = SK.kmv_novelty(ska, ska, k=16).first()
    assert same["novelty_est"] == 0
    assert same["union_est"] == same["base_est"]
    disj = SK.kmv_novelty(ska, skb, k=16).first()
    assert disj["novelty_est"] > 0
    assert disj["union_est"] >= disj["base_est"]


def test_calibration_report_gate_shape(spark):
    rows = entrymod.queries()["calibration_report"](
        spark, SF_TINY).collect()
    n_docs = entrymod._docs(spark, SF_TINY).count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["mean_p_e6"] <= 10**6
        assert 0 <= r["rate_e6"] <= 10**6
        assert r["gap_e6"] == r["mean_p_e6"] - r["rate_e6"]


# ------------------------------------- IVF index maintenance (round 10)


def test_ivf_occupancy_and_ingest_drift(spark, tmp_path):
    """The append-or-retrain decision surface: occupancy counts every
    index row exactly; PSI of a SAME-distribution batch is near zero,
    PSI of a shifted batch (mass moved to one cell) crosses the 0.25
    retrain threshold; appending then updates occupancy."""
    from xpysom_dask_spark.operators import clustering as CL
    from xpysom_dask_spark.operators import similarity as SIM

    rng = np.random.default_rng(3)
    centers = np.eye(4, 8) * 10.0
    lab = rng.integers(0, 4, 400)
    X = centers[lab] + rng.normal(0, 0.5, (400, 8))
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(400)],
        "vec_id bigint, embedding array<double>")
    C = CL.kmeans_fit(emb, k=4, max_iter=5)
    path = str(tmp_path / "ivf_maint")
    SIM.build_kmeans_ivf_index(C, emb, path)

    occ = SIM.ivf_occupancy(spark, path)
    assert sum(r["n"] for r in occ.collect()) == 400

    # same-distribution batch: PSI ~ 0 (stable -> append)
    Y = centers[rng.integers(0, 4, 200)] + rng.normal(0, 0.5, (200, 8))
    same = spark.createDataFrame(
        [(1000 + i, Y[i].tolist()) for i in range(200)],
        "vec_id bigint, embedding array<double>")
    cells_same = CL.kmeans_assign(same, C)
    psi_same = sum(r["term_e6"] for r in SIM.ivf_ingest_drift(
        occ, cells_same, n_cells=4).collect()) / 1e6
    assert 0 <= psi_same < 0.1, psi_same

    # shifted batch: all mass in one cluster -> PSI >> 0.25 (retrain)
    Z = centers[np.zeros(200, int)] + rng.normal(0, 0.5, (200, 8))
    shifted = spark.createDataFrame(
        [(2000 + i, Z[i].tolist()) for i in range(200)],
        "vec_id bigint, embedding array<double>")
    psi_shift = sum(r["term_e6"] for r in SIM.ivf_ingest_drift(
        occ, CL.kmeans_assign(shifted, C), n_cells=4).collect()) / 1e6
    assert psi_shift > 0.25, psi_shift

    # append path keeps occupancy exact (the audit reruns per ingest)
    SIM.build_kmeans_ivf_index(C, same, path, mode="append")
    assert sum(r["n"] for r in
               SIM.ivf_occupancy(spark, path).collect()) == 600
    with pytest.raises(ValueError, match="n_cells"):
        SIM.ivf_ingest_drift(occ, cells_same, n_cells=1)


def test_ivf_drift_stream_equals_batch_audit(spark, tmp_path):
    """Drained streaming index-health monitor (spine-completed + the
    shared PSI tail) == the batch ivf_ingest_drift row-for-row."""
    import tempfile
    import uuid

    from xpysom_dask_spark.operators import clustering as CL
    from xpysom_dask_spark.operators import similarity as SIM
    from xpysom_dask_spark.operators.profile import psi_terms_from_cells
    from xpysom_dask_spark.streaming import (ivf_drift_stream,
                                             psi_complete_spine)

    rng = np.random.default_rng(11)
    centers = np.eye(4, 8) * 10.0
    X = centers[rng.integers(0, 4, 300)] + rng.normal(0, 0.5, (300, 8))
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(300)],
        "vec_id bigint, embedding array<double>")
    C = CL.kmeans_fit(emb, k=4, max_iter=5)
    path = str(tmp_path / "ivf_stream")
    SIM.build_kmeans_ivf_index(C, emb, path)
    occ = SIM.ivf_occupancy(spark, path)

    Y = centers[rng.integers(0, 3, 150)] + rng.normal(0, 0.5, (150, 8))
    batch = spark.createDataFrame(
        [(500 + i, Y[i].tolist()) for i in range(150)],
        "vec_id bigint, embedding array<double>")
    batch_cells = CL.kmeans_assign(batch, C).select("cluster_id")
    want = sorted(tuple(r) for r in
                  SIM.ivf_ingest_drift(occ, batch_cells, 4).collect())

    tmp = tempfile.mkdtemp(prefix="ivfdrift_")
    batch_cells.repartition(3).write.mode("overwrite").parquet(tmp)
    stream = spark.readStream.schema(batch_cells.schema).parquet(tmp)
    name = "q_ivf_drift_" + uuid.uuid4().hex[:8]
    q = (ivf_drift_stream(stream, occ)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    drained = spark.table(name)
    m = psi_complete_spine(
        drained,
        occ.select(F.col("cluster_id").alias("bin"),
                   F.col("n").alias("count")), 4)
    got = sorted(tuple(r) for r in psi_terms_from_cells(m, 4).collect())
    assert got == want and len(got) == 4


def test_logreg_top_features_surfaces_planted_markers(spark):
    """Interpretability audit: plant a spam tail in a deterministic
    ~30% of docs, fit the hashed model, and the negative top-features
    must surface the planted marker n-grams with their df counts —
    the 'why is the filter dropping X' answer."""
    from xpysom_dask_spark.operators import models as M

    docs = entrymod._docs(spark, SF_TINY)
    spam = F.crc32(F.col("doc_id").cast("string")) % 10 < 3
    lab = (docs.withColumn("y", (~spam).cast("int"))
           .withColumn("text", F.when(spam, F.concat_ws(
               " ", "text",
               F.lit("buyspam nowspam freespam")))
               .otherwise(F.col("text"))))
    m = M.logreg_fit_hashed(lab, "text", "doc_id", "y",
                            n_buckets=1024, n_iter=8)
    rep = M.logreg_top_features(lab, "text", m, top_k=10).collect()
    neg_terms = {t for r in rep if r["direction"] == "neg"
                 for t in r["terms"]}
    planted = {"buyspam", "nowspam", "freespam"}
    assert planted & neg_terms, sorted(neg_terms)[:12]
    n_spam = lab.where(spam).count()
    for r in rep:
        assert r["rank"] >= 1 and r["weight_e6"] != 0
        # a nonzero weight can only come from corpus features, so on
        # the TRAINING corpus every flagged bucket must resolve to at
        # least one term (unigram or bigram — both hash paths)
        assert r["n_docs"] >= 1 and r["terms"], r
        if set(r["terms"]) & planted and len(r["terms"]) == 1:
            # a clean marker bucket's df is exactly the planted count
            assert r["n_docs"] >= n_spam
    # ranks ordered by |weight| within each direction
    for d in ("pos", "neg"):
        ws = [abs(r["weight_e6"]) for r in rep if r["direction"] == d]
        assert ws == sorted(ws, reverse=True)
    with pytest.raises(ValueError, match="top_k"):
        M.logreg_top_features(lab, "text", m, top_k=0)


def test_parquet_layout_report(spark, tmp_path):
    """Footer-only layout audit: per-file rows/row-group stats exact
    against pyarrow ground truth; small row groups show up; no files
    fails loudly."""
    from xpysom_dask_spark.operators.profile import parquet_layout_report

    p = str(tmp_path / "tbl")
    df = spark.range(10000).selectExpr("id", "id % 7 AS k",
                                       "CAST(id AS STRING) AS s")
    # force several files and small row groups
    df.repartition(4).write.mode("overwrite") \
        .option("parquet.block.size", 64 * 1024).parquet(p)
    rep = parquet_layout_report(spark, p).collect()
    assert len(rep) == 4
    assert sum(r["n_rows"] for r in rep) == 10000
    for r in rep:
        assert r["n_columns"] == 3
        assert r["size_bytes"] > 0
        assert 0 < r["min_rg_rows"] <= r["max_rg_rows"] <= r["n_rows"]
        assert r["n_row_groups"] >= 1
        assert r["compressions"]
    # ground truth for one file via pyarrow directly
    import pyarrow.parquet as pq

    f0 = rep[0]["file"]
    md = pq.ParquetFile(f0[7:] if f0.startswith("file://")
                        else f0).metadata
    assert rep[0]["n_rows"] == md.num_rows
    assert rep[0]["n_row_groups"] == md.num_row_groups
    with pytest.raises(Exception, match="PATH_NOT_FOUND|no files|Path"):
        parquet_layout_report(spark, str(tmp_path / "missing")).collect()
