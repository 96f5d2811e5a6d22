"""The iterative batch-SOM training plan.

One Spark job per epoch, shaped exactly like MLlib's KMeans iteration
(SURVEY.md §3.1 "Spark lifecycle"):

    driver:    decay η, σ; hoist ‖w‖² if cacheable; broadcast (W_flat, ‖w‖²)
    executors: mapInArrow over the persisted features — per partition, one
               (cell-count, cell-feature-sum) partial pair from BMU argmin
               + bincount scatters; the neighborhood NEVER runs on workers
    exchange:  partials collected directly when the partition count is
               small; at scale, a bucketed ``groupBy().applyInPandas`` tree
               level first reduces P partials to ``agg_fanout`` rows so the
               driver never materializes O(P) tensors
    driver:    (num, den) = Gᵀ·(S, c) via SparkSom._apply_influence —
               by linearity the (K, K) influence matrix applies AFTER the
               merge, so it is never broadcast and never shipped; above a
               memory budget it evaluates in row blocks (O(block·K), VERDICT
               r03 #4), so a 100×100 grid trains without any O(K²) tensor
               leaving the driver — then W ← where(den ≠ 0, num/den, W)

Contrasts with the reference's dask path (xpysom.py:545-558), which
re-ships the codebook inside every task closure: we torrent-broadcast it
once per epoch, and the input DataFrame is persisted so epochs 2..T never
re-scan the source (SURVEY.md §4 O13).  Per-epoch traffic is
O(partitions · x·y·d) regardless of data size — the property that makes
this hold at 100 TB.
"""

from __future__ import annotations

import time

import numpy as np

from ..functions.distances import codebook_sq_norms
from .exchange import feature_matrix, ship_package

_PARTIAL_SCHEMA = "bucket int, num binary, den binary"


class ProgressPrinter:
    """Reference-parity verbose progress (xpysom.py:50-69): per-epoch
    ``[ t / T ] p% - elapsed - left`` lines with an elapsed-rate ETA,
    restructured as an object (no module globals, newline per epoch so
    driver logs stay greppable) plus a per-epoch detail suffix."""

    def __init__(self, total):
        self.total = int(total)
        self.t0 = time.time()
        self.digits = len(str(self.total))
        print(" [ %*d / %d ]   0%% - ? it/s" % (self.digits, 0, self.total))

    def step(self, t, extra=""):
        from datetime import timedelta

        done = t + 1
        elapsed = time.time() - self.t0
        left = (self.total - done) * elapsed / done
        line = " [ %*d / %d ] %3.0f%% - %s elapsed - %s left" % (
            self.digits, done, self.total, 100.0 * done / self.total,
            str(timedelta(seconds=elapsed))[:7],
            str(timedelta(seconds=left))[:7])
        if extra:
            line += " - " + extra
        print(line)


def bmu_cell_sums(X, idx, n_cells):
    """Per-cell count vector and feature-sum matrix for one batch:
    ``c[k] = #{i: idx_i = k}``, ``S[k] = Σ_{idx_i = k} X_i``.

    ``np.bincount`` per feature column — C-speed O(n·d) scatter, float64
    accumulation (more accurate than the per-sample dtype GEMM it
    replaces)."""
    c = np.bincount(idx, minlength=n_cells).astype(np.float64)
    S = np.empty((n_cells, X.shape[1]), dtype=np.float64)
    for j in range(X.shape[1]):
        S[:, j] = np.bincount(idx, weights=X[:, j], minlength=n_cells)
    return c, S


def _partial_update_factory(bc, kernel, shape, dtype, fanout):
    """Build the per-partition update for ``mapInArrow``.

    The closure carries only the tiny model plumbing (kernel, shape);
    the per-epoch codebook and its cached norms travel via the
    broadcast ``bc``.  Inside, per Arrow batch (= mini-batch,
    SURVEY.md §4 O7): BMU argmin → per-cell count/sum scatters.  The
    partial is the G-FREE per-cell statistics ``(c, S)`` in float64 —
    by linearity ``Gᵀ·ΣS_p = Σ(Gᵀ·S_p)``, so the influence matrix
    applies once on the driver after the merge (math parity with
    xpysom.py:420-443 via the factorization ``Σ_i g(bmu_i)⊗x_i =
    Gᵀ·S``); workers never see the neighborhood function, and the
    per-sample (n, x·y) influence tensor never materializes anywhere.
    """
    x, y, d = shape
    K = x * y

    def fn(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        w_flat, w_sq = bc.value
        c = np.zeros(K, dtype=np.float64)
        S = np.zeros((K, d), dtype=np.float64)
        for batch in batches:
            X = feature_matrix(batch.column(0), d, dtype)
            if len(X) == 0:
                continue
            idx = kernel(X, w_flat, w_sq).argmin(axis=1)
            cc, SS = bmu_cell_sums(X, idx, K)
            c += cc
            S += SS
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pa.RecordBatch.from_pydict(
            {
                "bucket": pa.array([pid % fanout], pa.int32()),
                "num": pa.array([S.tobytes()], pa.binary()),
                "den": pa.array([c.tobytes()], pa.binary()),
            }
        )

    return fn


def _sum_partial_rows(rows, shape):
    """Merge (S, c) float64 partial blobs → (K, d) sums + (K,) counts."""
    x, y, d = shape
    S = np.zeros((x * y, d), dtype=np.float64)
    c = np.zeros(x * y, dtype=np.float64)
    for r in rows:
        S += np.frombuffer(r["num"], dtype=np.float64).reshape(x * y, d)
        c += np.frombuffer(r["den"], dtype=np.float64)
    return S, c


def _make_bucket_reducer(shape):
    x, y, d = shape

    def reduce_bucket(pdf):
        import pandas as pd

        S = np.zeros((x * y, d), dtype=np.float64)
        c = np.zeros(x * y, dtype=np.float64)
        for blob in pdf["num"]:
            S += np.frombuffer(blob, dtype=np.float64).reshape(x * y, d)
        for blob in pdf["den"]:
            c += np.frombuffer(blob, dtype=np.float64)
        return pd.DataFrame({"num": [S.tobytes()], "den": [c.tobytes()]})

    return reduce_bucket


def run_training(som, df, num_epochs, iter_beg=0, iter_end=None, verbose=False):
    """Run the epoch loop against a DataFrame; mutates ``som._weights``."""
    from pyspark.storagelevel import StorageLevel

    if iter_end is None:
        iter_end = num_epochs
    spark = df.sparkSession
    ship_package(spark)
    sc = spark.sparkContext

    own_cache = not (df.is_cached and df.columns == [som.features_col])
    feats = df.select(df[som.features_col].alias("features"))
    if own_cache:
        # persist so epochs 2..T never re-scan the source; skip when the
        # caller already persisted exactly the features column (a second
        # cache level would double memory and re-materialize on epoch 1)
        feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    x, y, d = som._weights.shape

    # small-input epoch fusion: a batch-SOM epoch is a global reduce, so
    # T epochs are irreducibly T jobs + T driver barriers in Spark's
    # execution model.  When the whole feature matrix fits the gate
    # (som.fuse_local_bytes), collect it once through Arrow and run the
    # loop driver-side — one job instead of T, same math chunked by
    # batch_rows.  The count() also materializes the cache, so the
    # not-fused case pays nothing extra on epoch 1.
    fuse_cap = getattr(som, "fuse_local_bytes", 0)
    if fuse_cap:
        n_rows = feats.count()
        if n_rows * d * np.dtype(som.dtype).itemsize <= fuse_cap:
            X = feature_matrix(feats.toArrow().column("features"),
                               d, som.dtype)
            if own_cache:
                feats.unpersist()
            return som._train_local(X, num_epochs, iter_beg, iter_end,
                                    verbose=verbose)

    n_parts = feats.rdd.getNumPartitions()
    two_level = n_parts > som.collect_threshold
    shape = (x, y, d)
    W = som._weights.astype(som.dtype)
    kernel = som._distance

    progress = ProgressPrinter(iter_end - iter_beg) if verbose else None
    try:
        for t in range(iter_beg, iter_end):
            t0 = time.time()
            eta = float(som._decay(som._learning_rate, som._learning_rateN,
                                   t, num_epochs))
            sig = float(som._decay(som._sigma, som._sigmaN, t, num_epochs))
            w_flat = W.reshape(-1, d)
            w_sq = codebook_sq_norms(w_flat) if kernel.can_cache else None
            bc = sc.broadcast((w_flat, w_sq))

            fn = _partial_update_factory(
                bc, kernel, shape, som.dtype,
                som.agg_fanout if two_level else 1,
            )
            partials = feats.mapInArrow(fn, _PARTIAL_SCHEMA)
            if two_level:
                partials = partials.groupBy("bucket").applyInPandas(
                    _make_bucket_reducer(shape),
                    "num binary, den binary",
                )
            S, c = _sum_partial_rows(partials.collect(), shape)
            bc.unpersist(blocking=False)

            # influence applies driver-side, blockwise above the memory
            # budget — no O(K²) broadcast, no per-partition (K,K) GEMM
            num, den = som._apply_influence(S, c, sig, eta)
            den3 = den.reshape(x, y)[:, :, None]
            W = np.where(den3 != 0, num.reshape(shape) / den3,
                         W).astype(som.dtype)
            if progress is not None:
                progress.step(t - iter_beg,
                              "eta=%.4f sigma=%.4f %.2fs"
                              % (eta, sig, time.time() - t0))
    finally:
        if own_cache:
            feats.unpersist()

    som._weights = W
    return som
