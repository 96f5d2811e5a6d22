"""Streaming soak: the rest of the streaming surface is parity-tested
via availableNow drains (one planned micro-batch); these tests run a
REAL multi-batch stream off the deterministic rate-micro-batch source
and assert the state store stays bounded by the watermark — the
property that decides whether an unbounded ingest stream survives at
100 TB/day, and one an availableNow drain cannot exercise.
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xpysom_dask_spark.streaming.dedup import dedup_stream
from xpysom_dask_spark.streaming.sessions import session_windows
from xpysom_dask_spark.streaming.sources import rate_micro_batch_stream

# optimization r13 (VERDICT r12 #6): heavy soak/cluster/example
# tests are deselected from the default run — see pytest.ini
pytestmark = pytest.mark.slow

N_BATCHES = 12


def _run_batches(df, name, n_batches=N_BATCHES, timeout_s=180,
                 mode="append"):
    """Start an as-fast-as-possible stream, wait for ``n_batches``
    micro-batches, return the final progress dict."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).start())
    try:
        deadline = time.time() + timeout_s
        last = None
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None:
                last = p
                if p["batchId"] >= n_batches:
                    break
            time.sleep(0.2)
        assert last is not None and last["batchId"] >= n_batches, \
            f"only reached batch {last and last['batchId']} in {timeout_s}s"
        return last
    finally:
        q.stop()


def test_streaming_dedup_state_bounded_by_watermark(spark):
    """Unique fingerprints arrive every batch (100/batch); with a
    2-second watermark over a 1 s/batch event clock, expired state must
    be evicted — total state rows stay near watermark-window size
    instead of growing with the batch count."""
    rows_per_batch = 100
    src = rate_micro_batch_stream(spark, rows_per_batch=rows_per_batch,
                                  num_partitions=2)
    # every row is a new document (value is globally unique), so an
    # unbounded dedup would accumulate 100 state rows per batch forever
    stream = src.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("doc-"), F.col("value")).alias("text"))
    out = dedup_stream(stream, "text", ts_col="ts", watermark="2 seconds")

    prog = _run_batches(out, "soak_dedup")
    state = prog["stateOperators"][0]
    total_seen = (prog["batchId"] + 1) * rows_per_batch
    # watermark holds ~3 batches of live state (delay 2 s + the open
    # second); 6 batches of slack still proves eviction vs the
    # unbounded alternative (= total_seen)
    bound = 6 * rows_per_batch
    assert state["numRowsTotal"] <= bound, \
        (state["numRowsTotal"], total_seen)
    assert state["numRowsTotal"] < total_seen / 2
    assert state.get("numRowsRemoved", 0) > 0, \
        "watermark never evicted any state"


def test_streaming_sessions_state_bounded_by_gap(spark):
    """10 keys emit events every batch; sessions close only when the
    watermark passes start+gap, so live state is O(active sessions),
    not O(events seen)."""
    rows_per_batch = 50
    src = rate_micro_batch_stream(spark, rows_per_batch=rows_per_batch,
                                  num_partitions=2)
    stream = src.select(
        (F.col("value") % 10).alias("user_id"),
        F.col("timestamp").alias("ts"))
    out = session_windows(stream, key_col="user_id", ts_col="ts",
                          gap="1 second", watermark="1 second")

    prog = _run_batches(out, "soak_sessions")
    state = prog["stateOperators"][0]
    total_seen = (prog["batchId"] + 1) * rows_per_batch
    # events arrive 1 s apart per batch with a 1 s gap, so each key
    # carries one open (possibly merged) session plus the not-yet-
    # watermarked tail — far below one state row per input event
    assert state["numRowsTotal"] < total_seen / 2, \
        (state["numRowsTotal"], total_seen)
    assert state["numRowsTotal"] <= 10 * 8


def test_streaming_ewma_soak_matches_batch_and_state_stays_flat(spark):
    """12 REAL micro-batches through the applyInPandasWithState EWMA
    (streaming/state.py ewma_stream): (a) the drained union equals the
    batch operator row-for-row — the cross-batch state-carry contract
    exercised under genuine multi-chunk micro-batches, not an
    availableNow drain; (b) stateOperators[0].numRowsTotal stays at
    exactly one state row per key however many batches run — the
    custom stateful operator's state-leak alarm (a leak would grow
    with batch count and only this progress metric sees it)."""
    from xpysom_dask_spark.operators.profile import ewma
    from xpysom_dask_spark.streaming.state import ewma_stream

    rows_per_batch = 40
    n_keys = 5
    src = rate_micro_batch_stream(spark, rows_per_batch=rows_per_batch,
                                  num_partitions=2)
    # value is globally monotone across batches, so event_id order ==
    # (batch ts, id) order — the batch replay below relies on this
    stream = src.select(
        (F.col("value") % n_keys).alias("k"),
        F.col("value").alias("event_id"),
        (F.col("value") * 37 % 101).cast("double").alias("metric"),
        F.col("timestamp").alias("ts"))
    out = ewma_stream(stream, "k", "metric", "ts", "event_id",
                      alpha=0.25, lag=8)

    prog = _run_batches(out, "soak_ewma", mode="update")
    state = prog["stateOperators"][0]
    assert state["numRowsTotal"] == n_keys, \
        f"EWMA state leaked: {state['numRowsTotal']} rows for {n_keys} keys"

    got = {r["id"]: r for r in
           spark.sql("SELECT id, key, value, ewma FROM soak_ewma")
           .collect()}
    assert len(got) >= (N_BATCHES - 1) * rows_per_batch
    # batch replay over exactly the drained events (ts := id is
    # order-equivalent to the stream's (batch-ts, id) ordering)
    batch_in = spark.createDataFrame(
        [(int(i), int(r["key"]), float(r["value"]))
         for i, r in got.items()],
        "event_id bigint, k bigint, metric double")
    exp = ewma(batch_in.withColumn("ts", F.col("event_id")),
               "k", "metric", "ts", "event_id", alpha=0.25, lag=8)
    exp_rows = exp.collect()
    assert len(exp_rows) == len(got)
    for r in exp_rows:
        assert got[r["id"]]["ewma"] == r["ewma"], \
            (r["id"], got[r["id"]]["ewma"], r["ewma"])


def test_streaming_dedup_soak_emits_exactly_once_per_fingerprint(spark):
    """Across many real micro-batches, repeated content (value % 20)
    must emit exactly the distinct-fingerprint set — no duplicate
    leaks at batch boundaries, no drops."""
    src = rate_micro_batch_stream(spark, rows_per_batch=40,
                                  num_partitions=2)
    stream = src.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("doc-"), F.col("value") % 20).alias("text"))
    # global mode (no watermark): 20 distinct docs forever — state must
    # sit at exactly 20 rows however many batches run
    out = dedup_stream(stream, "text")

    prog = _run_batches(out, "soak_dedup_global")
    got = spark.sql("SELECT text FROM soak_dedup_global").collect()
    assert sorted(r["text"] for r in got) == \
        sorted(f"doc-{i}" for i in range(20))
    assert prog["stateOperators"][0]["numRowsTotal"] == 20


def test_streaming_sketches_state_bounded_by_construction(spark):
    """The streaming sketches' claim is stronger than watermark
    eviction: state is bounded at the sketch size BY CONSTRUCTION
    (cells are order-free sums/maxes), with NO watermark at all.
    Run each twin over 12 real micro-batches of unbounded fresh keys
    and assert the state store never exceeds the sketch bound — an
    unbounded keyed aggregation would grow by rows_per_batch state
    rows per batch."""
    from xpysom_dask_spark.streaming.sketches import (cms_stream,
                                                      hist_stream,
                                                      hll_stream)

    rows_per_batch = 200
    depth, width, p, bins = 4, 64, 6, 16

    src = rate_micro_batch_stream(spark, rows_per_batch=rows_per_batch,
                                  num_partitions=2)
    keys = src.select(F.concat(F.lit("k-"), F.col("value"))
                      .alias("k"),
                      (F.col("value") % 3).alias("g"),
                      (F.col("value") % 997).cast("double").alias("v"))

    cms = cms_stream(keys, "k", depth=depth, width=width)
    prog = _run_batches(cms, "soak_cms", mode="complete")
    state = prog["stateOperators"][0]
    assert state["numRowsTotal"] <= depth * width, state["numRowsTotal"]
    cells = spark.sql(
        "SELECT d, SUM(count) AS s FROM soak_cms GROUP BY d").collect()
    sums = {r["d"]: r["s"] for r in cells}
    # every input contributes exactly 1 to every depth row
    assert len(sums) == depth and len(set(sums.values())) == 1
    assert min(sums.values()) >= N_BATCHES * rows_per_batch

    hll = hll_stream(keys, "k", p=p)
    prog = _run_batches(hll, "soak_hll", mode="complete")
    state = prog["stateOperators"][0]
    assert state["numRowsTotal"] <= 2 ** p, state["numRowsTotal"]
    regs = spark.sql("SELECT bucket, rho FROM soak_hll").collect()
    assert 0 < len(regs) <= 2 ** p
    assert all(0 <= r["bucket"] < 2 ** p
               and 1 <= r["rho"] <= 48 - p + 1 for r in regs)

    hist = hist_stream(keys, "v", 0.0, 1000.0, bins=bins,
                       group_cols=("g",))
    prog = _run_batches(hist, "soak_hist", mode="complete")
    state = prog["stateOperators"][0]
    assert state["numRowsTotal"] <= 3 * bins, state["numRowsTotal"]
    per_g = spark.sql(
        "SELECT g, SUM(count) AS s FROM soak_hist GROUP BY g").collect()
    assert len(per_g) == 3
    assert sum(r["s"] for r in per_g) >= N_BATCHES * rows_per_batch
