"""Structured Streaming surface tests.

Strategy: stream a temp parquet directory with trigger=availableNow into
a memory sink, then compare against the batch twin on the same data —
the streaming plans reuse the batch scoring/training stages, so results
must match exactly (modulo row order).
"""

import numpy as np
import pandas as pd
import pytest

from xpysom_dask_spark import SparkSom
from xpysom_dask_spark.sources import readers
from xpysom_dask_spark.streaming import (
    StreamingSomTrainer,
    bmu_transitions,
    score_stream,
    windowed_activation_response,
    windowed_qe_drift,
)

from conftest import SF_TINY


@pytest.fixture(scope="module")
def feats_dir(spark, tmp_path_factory):
    """sf0.001 lineitem features written as a 2-file parquet dir."""
    path = str(tmp_path_factory.mktemp("stream") / "feats")
    df = readers.lineitem_features(spark, SF_TINY, keys=True)
    df.repartition(2).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Tiny keyed event stream with proper timestamps (3 users, 2 hours)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    rows = []
    rng = np.random.RandomState(7)
    for i in range(240):
        rows.append((
            i % 3,                                        # user
            pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
            [float(rng.rand()), float(rng.rand())],       # features
        ))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "features"])
    (spark.createDataFrame(pdf, "user_id bigint, ts timestamp, "
                           "features array<double>")
     .repartition(2).write.parquet(path))
    return path


def _read_stream(spark, path, template_path=None):
    schema = spark.read.parquet(template_path or path).schema
    return spark.readStream.schema(schema).parquet(path)


def _drain(df, spark, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete" if df.isStreaming else "append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def _drain_append(df, spark, name, mode="append"):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_score_stream_matches_batch(spark, feats_dir):
    som = SparkSom(4, 4, 8, random_seed=3)
    stream = _read_stream(spark, feats_dir)
    out = _drain_append(score_stream(som, stream), spark, "t_score")
    got = (out.select("l_orderkey", "l_linenumber", "cluster_id")
           .toPandas().sort_values(["l_orderkey", "l_linenumber",
                                    "cluster_id"]).reset_index(drop=True))
    batch = (som.transform(spark.read.parquet(feats_dir))
             .select("l_orderkey", "l_linenumber", "cluster_id")
             .toPandas().sort_values(["l_orderkey", "l_linenumber",
                                      "cluster_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, batch)


def test_windowed_activation_response(spark, events_dir):
    som = SparkSom(3, 3, 2, random_seed=5)
    stream = _read_stream(spark, events_dir)
    out = _drain_append(
        windowed_activation_response(som, stream, "ts", window="1 hour",
                                     watermark="0 seconds"),
        spark, "t_war", mode="complete")
    got = out.toPandas()
    # batch twin: score + groupBy hour
    from pyspark.sql import functions as F
    batch_df = spark.read.parquet(events_dir)
    scored = som.transform(batch_df, ("bmu_x", "bmu_y"))
    exp = (scored.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                          "bmu_x", "bmu_y")
           .agg(F.count(F.lit(1)).alias("n_wins")).toPandas())
    key = ["window_start", "bmu_x", "bmu_y"]
    got = got[key + ["n_wins"]].sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # 240 one-minute events over 2 users-hours → windows sum to 240
    assert got["n_wins"].sum() == 240


def test_windowed_qe_drift(spark, events_dir):
    som = SparkSom(3, 3, 2, random_seed=5)
    stream = _read_stream(spark, events_dir)
    out = _drain_append(
        windowed_qe_drift(som, stream, "ts", window="1 hour",
                          watermark="0 seconds"),
        spark, "t_qed", mode="complete")
    got = out.toPandas().sort_values("window_start").reset_index(drop=True)
    assert len(got) == 4  # 240 minutes = 4 hours
    assert (got["n_rows"] == 60).all()
    assert (got["mean_qe"] > 0).all()


def test_streaming_trainer_single_batch_equals_one_epoch(spark, feats_dir,
                                                         tmp_path):
    """availableNow over the dir → ONE micro-batch → identical to one
    batch epoch with the same decay params."""
    som_s = SparkSom(4, 4, 8, random_seed=11)
    som_b = SparkSom(4, 4, 8, random_seed=11)
    np.testing.assert_array_equal(som_s._weights, som_b._weights)

    stream = _read_stream(spark, feats_dir).select("features")
    trainer = StreamingSomTrainer(som_s, horizon=10)
    trainer.fit_available(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    assert trainer.batches_seen == 1

    som_b.train(spark.read.parquet(feats_dir).select("features"), 10,
                iter_beg=0, iter_end=1)
    np.testing.assert_allclose(som_s._weights, som_b._weights,
                               rtol=0, atol=1e-6)


def test_streaming_trainer_incremental_batches(spark, feats_dir, tmp_path):
    """maxFilesPerTrigger=1 → one micro-batch per file; decay advances."""
    som = SparkSom(4, 4, 8, random_seed=11)
    w0 = som.get_weights().copy()
    schema = spark.read.parquet(feats_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(feats_dir)
              .select("features"))
    trainer = StreamingSomTrainer(som, horizon=10)
    trainer.fit_available(stream, checkpoint_dir=str(tmp_path / "ckpt2"))
    assert trainer.batches_seen == 2
    assert not np.allclose(w0, som.get_weights())
    # model stays usable
    qe = som.quantization_error(spark.read.parquet(feats_dir))
    assert np.isfinite(qe)


def test_bmu_transitions_stateful(spark, events_dir):
    som = SparkSom(3, 3, 2, random_seed=5)
    stream = _read_stream(spark, events_dir)
    out = _drain_append(bmu_transitions(som, stream, "user_id", ts_col="ts"),
                        spark, "t_bmu", mode="update")
    got = (out.toPandas().sort_values("key").groupby("key").last()
           .reset_index())
    assert sorted(got["key"]) == [0, 1, 2]
    assert got["n_events"].sum() == 240

    # oracle: pandas replay of the same per-key transition logic on the
    # batch-scored rows in event-time order
    scored = (som.transform(spark.read.parquet(events_dir),
                            ("cluster_id",))
              .select("user_id", "ts", "cluster_id").toPandas()
              .sort_values(["user_id", "ts"]))
    for key, grp in scored.groupby("user_id"):
        cids = grp["cluster_id"].tolist()
        n_trans = sum(1 for a, b in zip(cids, cids[1:]) if a != b)
        row = got[got["key"] == key].iloc[0]
        assert row["n_events"] == len(cids)
        assert row["n_transitions"] == n_trans
        assert row["last_cluster"] == cids[-1]


def test_streaming_trainer_restart_resumes_from_snapshot(spark, feats_dir,
                                                         tmp_path):
    """Kill-and-restart: a new trainer with the same model_dir +
    checkpoint resumes from the persisted codebook and batch counter
    instead of the random init, and only consumes new files."""
    schema = spark.read.parquet(feats_dir).schema
    model_dir = str(tmp_path / "model")
    ckpt = str(tmp_path / "ckpt3")

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(feats_dir)
                .select("features"))

    t1 = StreamingSomTrainer(SparkSom(4, 4, 8, random_seed=21), horizon=10,
                             model_dir=model_dir)
    t1.fit_available(stream(), checkpoint_dir=ckpt)
    assert t1.batches_seen == 2
    w_trained = t1.som.get_weights().copy()

    # "restart": fresh som object, same dirs — must restore, not re-init
    t2 = StreamingSomTrainer(SparkSom(4, 4, 8, random_seed=21), horizon=10,
                             model_dir=model_dir)
    assert t2.batches_seen == 2
    np.testing.assert_array_equal(t2.som.get_weights(), w_trained)

    # nothing new to consume -> no further updates
    t2.fit_available(stream(), checkpoint_dir=ckpt)
    assert t2.batches_seen == 2
    np.testing.assert_array_equal(t2.som.get_weights(), w_trained)

def test_bmu_transitions_string_key(spark, tmp_path):
    """The output key column carries key_col's own type (ADVICE r01):
    a string user id must come back as a string, not fail/miscoerce
    against a hardcoded bigint schema."""
    path = str(tmp_path / "sevents")
    rng = np.random.RandomState(11)
    rows = [(f"user-{i % 3}",
             pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
             [float(rng.rand()), float(rng.rand())])
            for i in range(60)]
    pdf = pd.DataFrame(rows, columns=["uid", "ts", "features"])
    (spark.createDataFrame(pdf, "uid string, ts timestamp, "
                           "features array<double>")
     .repartition(2).write.parquet(path))
    som = SparkSom(3, 3, 2, random_seed=5)
    stream = _read_stream(spark, path)
    df = bmu_transitions(som, stream, "uid", ts_col="ts")
    assert df.schema["key"].dataType.simpleString() == "string"
    out = _drain_append(df, spark, "t_bmu_str", mode="update")
    got = (out.toPandas().sort_values("key").groupby("key").last()
           .reset_index())
    assert sorted(got["key"]) == ["user-0", "user-1", "user-2"]
    assert got["n_events"].sum() == 60

def test_dedup_stream_fingerprint_set(spark, tmp_path):
    """Streaming exact dedup: the emitted fingerprint set equals the
    batch dedup_exact groups; exactly one row per fingerprint."""
    from xpysom_dask_spark.operators.text import md5_fingerprint
    from xpysom_dask_spark.streaming import dedup_stream

    path = str(tmp_path / "docs")
    rows = [(i, f"document body {i % 40}") for i in range(200)]
    (spark.createDataFrame(rows, "doc_id bigint, text string")
     .repartition(3).write.parquet(path))
    batch = spark.read.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = _drain_append(dedup_stream(stream, "text"), spark, "t_dedup")
    got = out.toPandas()
    expect = {r.fp for r in
              batch.select(md5_fingerprint("text").alias("fp"))
              .distinct().collect()}
    assert set(got["fp"]) == expect
    assert len(got) == len(expect) == 40


def test_dedup_stream_within_watermark(spark, tmp_path):
    """The watermarked variant (state expires) still dedups a bounded
    replay where all duplicates fall inside the window."""
    from xpysom_dask_spark.streaming import dedup_stream

    path = str(tmp_path / "tdocs")
    rows = [(i, (pd.Timestamp("2024-01-01")
                 + pd.Timedelta(seconds=i)).to_pydatetime(),
             f"text {i % 10}") for i in range(100)]
    (spark.createDataFrame(rows, "doc_id bigint, ts timestamp, text string")
     .repartition(2).write.parquet(path))
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema).parquet(path)
    out = _drain_append(
        dedup_stream(stream, "text", ts_col="ts", watermark="1 hour"),
        spark, "t_dedup_wm")
    assert out.count() == 10


def test_narrow_pipeline_ops_work_on_streams(spark, tmp_path):
    """hash_sample + gopher quality gate are pure narrow expressions, so
    they apply to a streaming DataFrame unchanged and agree with the
    batch result on the same data."""
    from xpysom_dask_spark.operators import sampling
    from xpysom_dask_spark.operators import text as T

    path = str(tmp_path / "curate_stream")
    rows = [(i, " ".join(f"word{chr(97 + (i + j) % 26)}"
                         for j in range(60))) for i in range(300)]
    (spark.createDataFrame(rows, "doc_id bigint, text string")
     .repartition(3).write.parquet(path))
    batch = spark.read.parquet(path)

    def pipe(df):
        kept = sampling.hash_sample(df, "doc_id", 0.5, seed=2)
        return (T.gopher_quality_flags(kept, "text")
                .where("passes_gopher").select("doc_id"))

    stream = spark.readStream.schema(batch.schema).parquet(path)
    got = _drain_append(pipe(stream), spark, "t_curate")
    assert ({r.doc_id for r in got.collect()}
            == {r.doc_id for r in pipe(batch).collect()})


def test_transition_fn_vectorized_unit():
    """Direct unit check of the vectorized transition kernel across
    multiple batches with carried state (first event never counts as a
    transition; boundaries between batches do)."""
    from xpysom_dask_spark.streaming.state import _transition_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, tup):
            self.get = tup
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame({"cluster_id": [3, 3, 5, 5, 2],
                       "__ts__": range(5)})
    b2 = pd.DataFrame({"cluster_id": [2, 7], "__ts__": [5, 6]})
    out1 = list(_transition_fn(("u",), iter([b1, b2]), st))
    # 3→5, 5→2 in b1; 2→2 (no), 2→7 across/in b2 → 3 transitions
    assert st.get == (7, 3, 7)
    assert out1[0]["n_transitions"].iloc[0] == 3
    # resumed state: next batch starting on a different cluster counts
    b3 = pd.DataFrame({"cluster_id": [9], "__ts__": [7]})
    list(_transition_fn(("u",), iter([b3]), st))
    assert st.get == (8, 4, 9)
    # empty batch is a no-op on counts
    list(_transition_fn(("u",), iter([b3.iloc[:0]]), st))
    assert st.get == (8, 4, 9)


def test_session_windows_stream_equals_batch(spark, tmp_path):
    """The native session_window drain equals the same expression run
    as a plain batch aggregation — pins streaming/batch semantic
    parity for the sessions operator."""
    import uuid

    from pyspark.sql import functions as F

    from xpysom_dask_spark.sources import readers
    from xpysom_dask_spark.streaming import session_windows

    ev = readers.load_table(spark, SF_TINY, "events")
    src = ev.select(
        "user_id",
        F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")).alias("ts"))
    path = str(tmp_path / "sess_src")
    src.write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(src.schema).parquet(path)
    out = session_windows(stream, "user_id", "ts", gap="30 minutes")
    name = "t_sess_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    streamed = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table(name).collect())

    batch = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_windows(
            spark.read.parquet(path), "user_id", "ts",
            gap="30 minutes").collect())
    assert streamed == batch
    assert len(streamed) > 0


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream watermarked join drained with availableNow equals
    the same plan run as a plain batch join."""
    import uuid

    from pyspark.sql import functions as F

    from xpysom_dask_spark.sources import readers
    from xpysom_dask_spark.streaming import interval_join_stream

    ev = readers.load_table(spark, SF_TINY, "events")
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")).alias("ts"))
    cpath, ppath = str(tmp_path / "c"), str(tmp_path / "p")
    base.where("event_type = 'click'").select(
        "event_id", "user_id", "ts").write.parquet(cpath)
    base.where("event_type = 'view'").select(
        "event_id", "user_id", "ts").write.parquet(ppath)
    schema = "event_id long, user_id long, ts timestamp"

    sc = spark.readStream.schema(schema).parquet(cpath)
    sp = spark.readStream.schema(schema).parquet(ppath)
    out = interval_join_stream(sc, sp, "user_id", "ts", "ts",
                               upper="2 hours")
    name = "t_ssj_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    streamed = sorted((r["user_id"], r["l_event_id"], r["r_event_id"])
                      for r in spark.table(name).collect())

    batch = interval_join_stream(
        spark.read.parquet(cpath), spark.read.parquet(ppath),
        "user_id", "ts", "ts", upper="2 hours")
    expected = sorted((r["user_id"], r["l_event_id"], r["r_event_id"])
                      for r in batch.collect())
    assert streamed == expected
    assert len(streamed) > 0


def test_idempotent_sink_replay_self_cancels(spark, tmp_path):
    from xpysom_dask_spark.streaming import idempotent_parquet_sink

    out = str(tmp_path / "idem")
    sink = idempotent_parquet_sink(out)
    sink(spark.range(5).toDF("v"), 0)
    sink(spark.range(10, 13).toDF("v"), 1)
    # replay of batch 1 (same offsets → same rows) overwrites ONLY its
    # own partition; batch 0 untouched
    sink(spark.range(10, 13).toDF("v"), 1)
    back = spark.read.parquet(out)
    got = sorted(r["v"] for r in back.collect())
    assert got == [0, 1, 2, 3, 4, 10, 11, 12]
    assert sorted(r["batch_id"] for r in
                  back.select("batch_id").distinct().collect()) == [0, 1]


def test_transactional_sink_first_attempt_wins(spark, tmp_path):
    from xpysom_dask_spark.streaming import (read_transactional,
                                             transactional_parquet_sink)

    out = str(tmp_path / "txn")
    sink = transactional_parquet_sink(out)
    sink(spark.range(3).toDF("v"), 0)
    # replay with DIFFERENT content (non-deterministic transform
    # scenario): committed batch must win, replay is a no-op
    sink(spark.range(100, 200).toDF("v"), 0)
    got = sorted(r["v"] for r in
                 read_transactional(spark, out).collect())
    assert got == [0, 1, 2]


def test_transactional_sink_uncommitted_invisible(spark, tmp_path):
    import os

    from xpysom_dask_spark.streaming import (read_transactional,
                                             transactional_parquet_sink)

    out = str(tmp_path / "txn2")
    sink = transactional_parquet_sink(out)
    sink(spark.range(2).toDF("v"), 0)
    # simulate a crash after rename but before the marker: batch dir
    # exists, no _COMMITTED → reader must not see it...
    sink(spark.range(50, 60).toDF("v"), 1)
    os.remove(os.path.join(out, "_COMMITTED_1"))
    assert sorted(r["v"] for r in
                  read_transactional(spark, out).collect()) == [0, 1]
    # ...and the replay completes it (clears the stale dir, commits)
    sink(spark.range(50, 60).toDF("v"), 1)
    assert len(read_transactional(spark, out).collect()) == 12


def test_transactional_sink_end_to_end_stream(spark, tmp_path):
    from xpysom_dask_spark.streaming import (read_transactional,
                                             transactional_parquet_sink)

    src = str(tmp_path / "src")
    spark.range(20).toDF("v").repartition(2).write.parquet(src)
    stream = spark.readStream.schema("v bigint").parquet(src)
    out = str(tmp_path / "txn3")
    q = (stream.writeStream.foreachBatch(transactional_parquet_sink(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["v"] for r in
                 read_transactional(spark, out).collect())
    assert got == list(range(20))


def test_rate_micro_batch_deterministic(spark):
    from xpysom_dask_spark.streaming.sources import rate_micro_batch_stream

    out = _drain_append(rate_micro_batch_stream(
        spark, rows_per_batch=7, num_partitions=2),
        spark, "rate_det")
    vals = sorted(r["value"] for r in out.collect())
    # availableNow drains exactly one planned batch of the source
    assert vals == list(range(7))


def test_table_format_sinks_gated(spark, tmp_path):
    import pytest as _pt

    from xpysom_dask_spark.sources.writers import write_delta, write_iceberg

    with _pt.raises(ImportError, match="delta"):
        write_delta(spark.range(1), str(tmp_path / "d"))
    with _pt.raises(ImportError, match="iceberg"):
        write_iceberg(spark.range(1), "ice.tbl")


def test_narrow_text_ops_stream_unchanged(spark, tmp_path):
    """chunk_tokens and c4_line_filter are pure narrow expressions, so
    the SAME call works on a streaming DataFrame — batch vs stream
    results must be identical."""
    from xpysom_dask_spark.operators import text as T

    src = str(tmp_path / "docs")
    rows = [(1, "This is a fine sentence.\nshort."),
            (2, "alpha beta gamma delta epsilon zeta")]
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string") \
        .parquet(src)
    batch = spark.read.parquet(src)

    for name, fn in [
        ("chunks", lambda d: T.chunk_tokens(d, "text", "doc_id",
                                            window=3, stride=2)),
        ("c4", lambda d: T.c4_line_filter(d, "text", "doc_id")),
    ]:
        got = _drain_append(fn(stream), spark, f"narrow_{name}")
        want = fn(batch)
        cols = want.columns
        a = sorted(tuple(r[c] for c in cols) for r in got.collect())
        b = sorted(tuple(r[c] for c in cols) for r in want.collect())
        assert a == b, name


def test_quality_monitor_stream_audits_each_batch(spark, tmp_path):
    from xpysom_dask_spark.streaming.quality import quality_monitor_stream
    from xpysom_dask_spark.streaming.sources import rate_micro_batch_stream

    src = rate_micro_batch_stream(spark, rows_per_batch=50)
    stream = src.selectExpr(
        "value AS id",
        "CASE WHEN value % 10 = 0 THEN NULL ELSE value END AS v")
    q = quality_monitor_stream(
        stream, str(tmp_path / "report"), str(tmp_path / "ckpt"),
        complete=["v"], unique=["id"], bounds={"id": (0, None)})
    q.awaitTermination(60)

    rep = spark.read.parquet(str(tmp_path / "report"))
    rows = {(r.rule, r.col): r for r in rep.collect()}
    assert rows[("complete", "v")].n_violations == 5      # 50/10 nulls
    assert not rows[("complete", "v")].passed
    assert rows[("unique", "id")].passed                  # rate ids unique
    assert rows[("bounds", "id")].passed
    assert rows[("unique", "id")].batch_id == 0


def test_ewma_stream_across_batches_equals_batch(spark, tmp_path):
    """The keyed state carries the trailing lag-1 observations, so an
    event-time-ordered stream sliced into MULTIPLE micro-batches emits
    exactly the batch operator's output on the union — the cross-batch
    contract that makes the state op the ingest twin."""
    import numpy as np

    from xpysom_dask_spark.operators import profile as PRF
    from xpysom_dask_spark.streaming.state import ewma_stream

    rng = np.random.RandomState(17)
    rows = [(i, "k%d" % (i % 3), float(np.round(rng.randn() * 10, 3)),
             i) for i in range(60)]
    # NULL-ts rows INSIDE the sliced files (ADVICE r7): both twins
    # must drop them BEFORE the kernel — pandas sorts NaN last, so a
    # NULL ts reaching the state fold breaks stream == batch parity
    rows += [(100, "k0", 5.0, None), (101, "k1", -3.0, None)]
    src = str(tmp_path / "ewma_src")
    df_all = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double, ts bigint")
    # two event-time-ordered files -> two micro-batches (sliced on
    # event_id so the NULL-ts rows actually ship in the files)
    df_all.where("event_id < 30 OR event_id = 100").repartition(1) \
        .write.parquet(src)
    df_all.where("(event_id >= 30 AND event_id < 100) OR event_id = 101") \
        .repartition(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df_all.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = _drain_append(
        ewma_stream(stream, "event_type", "value", "ts", "event_id",
                    alpha=0.5, lag=4),
        spark, "t_ewma_stream", mode="update")
    got = {r["id"]: r["ewma"] for r in out.collect()}
    want = {r["id"]: r["ewma"] for r in PRF.ewma(
        df_all, "event_type", "value", "ts", "event_id",
        alpha=0.5, lag=4).collect()}
    assert len(got) == 60
    assert got == want


def test_ewma_fn_concatenates_chunks_before_sorting():
    """ADVICE r6: applyInPandasWithState can hand one key's micro-batch
    over as several Arrow chunks in arbitrary relative order.  The fold
    must sort the CONCATENATED batch, not each chunk independently —
    otherwise out-of-order rows across chunks silently break the
    drained-stream == batch contract."""
    import pandas as pd

    from xpysom_dask_spark.streaming.state import _ewma_fn_factory

    class _State:
        exists = False
        def update(self, v):
            self.saved = v

    w = [0.5 ** p for p in range(4)]          # alpha=0.5, lag=4 weights

    def run(chunks):
        st = _State()
        fn = _ewma_fn_factory(w, 4)
        return list(fn(("k",), iter(chunks), st))[0], st

    ordered = pd.DataFrame({"id": [0, 1, 2, 3],
                            "value": [1.0, 2.0, 3.0, 4.0],
                            "__ts__": [10, 20, 30, 40]})
    # later events in the FIRST chunk, earlier in the second
    out_split, st_split = run([ordered.iloc[2:], ordered.iloc[:2]])
    out_one, st_one = run([ordered])
    pd.testing.assert_frame_equal(
        out_split.reset_index(drop=True), out_one.reset_index(drop=True))
    assert st_split.saved == st_one.saved


def test_classify_stream_matches_batch(spark, tmp_path):
    from xpysom_dask_spark.operators import models
    from xpysom_dask_spark.streaming.scoring import classify_stream

    rows = [(i, " ".join(
        (f"g{(i * 7 + j) % 19}" if i % 2 else f"b{(i * 5 + j) % 17}")
        for j in range(20)), i % 2) for i in range(100)]
    batch = spark.createDataFrame(rows, "id bigint, text string, y int")
    m = models.logreg_fit_hashed(batch, "text", "id", "y",
                                 n_buckets=128, n_iter=4)
    path = str(tmp_path / "docs")
    batch.repartition(3).write.parquet(path)
    stream = _read_stream(spark, path)
    drained = _drain_append(classify_stream(stream, "text", "id", m),
                            spark, "clf_stream")
    want = {r["id"]: r["quality_p"]
            for r in models.logreg_score_hashed(
                batch, "text", "id", m).collect()}
    got = {r["id"]: r["quality_p"] for r in drained.collect()}
    assert got == want          # bit-identical, not approximately
