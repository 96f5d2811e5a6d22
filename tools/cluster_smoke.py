#!/usr/bin/env python
"""Multi-JVM correctness smoke: run representative gate queries on a
``local-cluster[2,4,2048]`` master (two REAL executor JVMs, separate
heaps and python workers) against the DuckDB oracles.

Everything else in this repo tests on ``local[n]`` — a single JVM
where closure serialization, broadcast transport, package shipping,
and executor-side python imports can silently take shortcuts.  This
smoke is the cheap stand-in for a real cluster: each query family
here exercises one executor-boundary risk class, and a hash mismatch
or crash that only shows up under local-cluster is exactly the class
of bug a 1000-executor deployment would hit on day one.

Risk classes covered:
  som_train_epoch          mapInArrow kernel + numpy broadcast + driver merge
  dedup_minhash            codegen'd text kernels + band-join shuffles
  bm25_topk                broadcast query set + integer-sum aggregation
  embedding_pca            DECIMAL moments + closed-form driver solve
  tpch_q9                  pure Catalyst SQL, multi-join shuffles
  streaming_ewma           applyInPandasWithState across executors
  pack_bins_ffd            recursive driver replay over collected groups
  multimodal_image_stats   binary Arrow kernels (PNG decode path)
  wordpiece_vocab          trained model: broadcast vocab + Arrow encode
  communities_lpa          iterative join/window loop + localCheckpoint
  mad_outliers             grouped lattice windows

Run:  python tools/cluster_smoke.py [sf_dir]   (default sf0.001)
Prints one line per query + a summary JSON; non-empty "bad" exits 1.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

DECLARED = ["som_train_epoch", "dedup_minhash", "bm25_topk",
            "embedding_pca", "tpch_q9", "streaming_ewma",
            "pack_bins_ffd", "multimodal_image_stats",
            # second batch (also all green round 8): PQ serving,
            # tokenizer trained models, streaming/mergeable sketches,
            # hashed-feature importance weights
            "ivfpq_topk", "knn_graph_full", "bpe_subwords",
            "dsir_importance", "quantile_hist",
            # round-10 additions: classifier scoring + the 5 merge
            # survivors (SURVEY.md par.8 slot ledger)
            "quality_score", "hll_report", "som_qe",
            "multimodal_audio", "hash_partition", "events_smoothing"]
STAGED = ["wordpiece_vocab", "communities_lpa", "mad_outliers",
          "streaming_cms", "unigram_segments",
          "kn_bigram_score", "streaming_psi",
          # promoted at the round-11 rotation (kept in the default
          # subset — they exercise sketches.py / models.py closures
          # that only ship via their own entry points; kmv_overlap +
          # kmv_novelty retired into the round-12 kmv_report merge)
          "calibration_report",
          # round-11 gate + the round-12 promotions
          "warc_ingest", "footer_stats", "multimodal_fp",
          "kmv_report"]

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def make_cluster_session(app="cluster-smoke"):
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local-cluster[2,4,2048]")
             .appName(app)
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "4g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run(sf_dir, names=None):
    import duckdb

    from gate_common import compare

    import __spark_entry__ as entry

    spark = make_cluster_session()
    q = dict(entry.queries())
    o = dict(entry.oracle_sql(sf_dir))
    # staged queues, whichever rounds currently exist (gate_pick idiom)
    for rn in range(5, 30):
        qf = getattr(entry, f"queries_round{rn}_staged", None)
        of = getattr(entry, f"oracle_sql_round{rn}_staged", None)
        if qf:
            q.update(qf())
        if of:
            try:
                o.update(of(sf_dir))
            except TypeError:
                o.update(of())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    bad = {}
    for nm in (names or DECLARED + STAGED):
        try:
            r = compare(q[nm](spark, sf_dir), con, o[nm])
            ok = r["hash_match"]
        except Exception as ex:  # noqa: BLE001 - report, don't mask
            ok, r = False, {"err": str(ex)[:300]}
        print(f"{nm}: {'OK' if ok else 'FAIL ' + json.dumps(r)}",
              flush=True)
        if not ok:
            bad[nm] = r
    con.close()

    # the graph gates take the small-input DRIVER-fused path at gate
    # scale (round 9), so force the DISTRIBUTED loops here — this is
    # the only place the iterative join/checkpoint rounds cross real
    # executor boundaries — and pin two-path parity on the cluster
    try:
        from xpysom_dask_spark.operators.graph import (
            label_propagation, pagerank)

        edges = spark.createDataFrame(
            [(i, (i * 7 + 3) % 60) for i in range(120) if i != (i * 7 + 3) % 60],
            "id_a bigint, id_b bigint")
        lp_f = {r["id"]: r["community"] for r in
                label_propagation(edges, n_iter=3).collect()}
        lp_d = {r["id"]: r["community"] for r in
                label_propagation(edges, n_iter=3,
                                  fuse_local_edges=0).collect()}
        pr_f = {r["id"]: r["rank_e6"] for r in
                pagerank(edges.withColumnRenamed("id_a", "src")
                         .withColumnRenamed("id_b", "dst"),
                         n_iter=3).collect()}
        pr_d = {r["id"]: r["rank_e6"] for r in
                pagerank(edges.withColumnRenamed("id_a", "src")
                         .withColumnRenamed("id_b", "dst"),
                         n_iter=3, fuse_local_edges=0).collect()}
        gok = lp_f == lp_d and pr_f == pr_d
        print(f"graph_distributed_parity: {'OK' if gok else 'FAIL'}",
              flush=True)
        if not gok:
            bad["graph_distributed_parity"] = {"err": "two-path mismatch"}
    except Exception as ex:                                # pragma: no cover
        bad["graph_distributed_parity"] = {"err": str(ex)[:300]}
        print(f"graph_distributed_parity: FAIL {ex}", flush=True)

    spark.stop()
    print("===SUMMARY===")
    print(json.dumps({"checked": len(names or DECLARED + STAGED),
                      "bad": bad}, indent=1))
    return bad


def run_streaming_soak(n_batches=10):
    """Stateful streaming across REAL executor JVMs: the
    applyInPandasWithState EWMA (exact batch parity on the drained
    rows + one state row per key) and the keyed-state dedup
    (exactly-once per fingerprint) over ``n_batches`` genuine
    micro-batches — the state-store-on-executors surface the
    single-JVM soak tests cannot exercise.  Round-8 result: 440
    drained rows bit-equal to the batch replay, state exactly
    bounded.  Returns True on success."""
    import time

    from pyspark.sql import functions as F

    spark = make_cluster_session("cluster-streaming-soak")
    from xpysom_dask_spark.operators.profile import ewma
    from xpysom_dask_spark.streaming.dedup import dedup_stream
    from xpysom_dask_spark.streaming.sources import \
        rate_micro_batch_stream
    from xpysom_dask_spark.streaming.state import ewma_stream

    def run_batches(df, name, mode):
        q = (df.writeStream.format("memory").queryName(name)
             .outputMode(mode).start())
        deadline, last = time.time() + 240, None
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None:
                last = p
                if p["batchId"] >= n_batches:
                    break
            time.sleep(0.3)
        q.stop()
        return last

    rpb, n_keys = 40, 5
    src = rate_micro_batch_stream(spark, rows_per_batch=rpb,
                                  num_partitions=2)
    stream = src.select(
        (F.col("value") % n_keys).alias("k"),
        F.col("value").alias("event_id"),
        (F.col("value") * 37 % 101).cast("double").alias("metric"),
        F.col("timestamp").alias("ts"))
    out = ewma_stream(stream, "k", "metric", "ts", "event_id",
                      alpha=0.25, lag=8)
    prog = run_batches(out, "clu_ewma", "update")
    state_rows = prog["stateOperators"][0]["numRowsTotal"]
    got = {r["id"]: r for r in spark.sql(
        "SELECT id, key, value, ewma FROM clu_ewma").collect()}
    batch_in = spark.createDataFrame(
        [(int(i), int(r["key"]), float(r["value"]))
         for i, r in got.items()],
        "event_id bigint, k bigint, metric double")
    exp = ewma(batch_in.withColumn("ts", F.col("event_id")),
               "k", "metric", "ts", "event_id",
               alpha=0.25, lag=8).collect()
    mism = sum(1 for r in exp if got[r["id"]]["ewma"] != r["ewma"])
    print(f"ewma: state={state_rows} (want {n_keys}), drained="
          f"{len(got)}, parity mismatches={mism}", flush=True)

    src2 = rate_micro_batch_stream(spark, rows_per_batch=40,
                                   num_partitions=2)
    stream2 = src2.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("doc-"), F.col("value") % 20).alias("text"))
    prog2 = run_batches(dedup_stream(stream2, "text"),
                        "clu_dedup", "append")
    n_texts = spark.sql("SELECT count(DISTINCT text) c FROM clu_dedup"
                        ).first()["c"]
    state2 = prog2["stateOperators"][0]["numRowsTotal"]
    print(f"dedup: distinct={n_texts} (want 20), state={state2}",
          flush=True)
    spark.stop()
    ok = (state_rows == n_keys and mism == 0
          and n_texts == 20 and state2 == 20)
    print("CLUSTER STREAMING SOAK:", "OK" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    if "--streaming" in sys.argv:
        sys.exit(0 if run_streaming_soak() else 1)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(1 if run(sf) else 0)
