"""Arrow-batch exchange helpers shared by all UDF-kernel stages.

Spark ships ``array<float>`` feature columns to Python as Arrow
``ListArray`` batches.  ``feature_matrix`` turns one into a dense
``(n, d)`` matrix without per-row Python loops (offset-checked reshape of
the flat child buffer) — this is the n_parallel/mini-batch analog of the
reference (xpysom.py:45, 560-575): one Arrow batch = one mini-batch, sized
by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

``ship_package`` makes this package importable on executors regardless of
how the SparkSession was created (it zips the source tree and registers it
via ``sc.addPyFile`` once per session) so UDF closures can be pickled by
reference.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

import numpy as np
import pyarrow as pa

_SHIPPED_SESSIONS: set[str] = set()


def ship_package(spark) -> None:
    """Zip this package and addPyFile it so executors can unpickle our
    closures, even in sessions we did not configure. Idempotent per
    SparkContext: keyed on applicationId (stable and unique per context
    lifetime — ``id()`` of the context object can be reused by a later
    context after GC and would skip the ship), and the applicationId in
    the zip name means a fresh context in the same process re-zips
    current sources."""
    key = spark.sparkContext.applicationId
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}-{key}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        # Session may disallow addPyFile (e.g. Connect); executors must then
        # already have the package on PYTHONPATH.
        pass
    _SHIPPED_SESSIONS.add(key)


def ensure_min_parallelism(df, min_parts: int | None = None):
    """Repartition tiny scans up to the cluster's parallelism.

    File-based partitioning follows bytes (``maxPartitionBytes``), so a
    small-but-CPU-expensive table (e.g. a documents table feeding
    tokenize/explode/hash chains) can arrive as ONE split and serialize
    the whole pipeline on one core.  No-op when the scan already has
    enough splits — at real scale the input is many splits and this
    adds nothing.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def feature_matrix(col: pa.Array, expected_len: int, dtype=np.float32) -> np.ndarray:
    """Convert an Arrow list<numeric> array to a dense ``(n, d)`` ndarray.

    Fails fast with the reference's width error message when any row width
    differs from ``expected_len`` (parity: xpysom.py:361-367).  Zero-copy
    when offsets are uniform and the child type already matches ``dtype``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, expected_len), dtype=dtype)
    if isinstance(col, pa.FixedSizeListArray):
        width = col.type.list_size
        if width != expected_len:
            raise ValueError(
                "Received %d features, expected %d." % (width, expected_len)
            )
        flat = col.flatten()
        return np.asarray(flat, dtype=dtype).reshape(n, width)
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    if not np.all(widths == expected_len):
        bad = int(widths[widths != expected_len][0])
        raise ValueError(
            "Received %d features, expected %d." % (bad, expected_len)
        )
    flat = np.asarray(col.values, dtype=dtype)
    # offsets may not start at 0 when the array is a slice
    start = int(offsets[0])
    return flat[start : start + n * expected_len].reshape(n, expected_len)


def matrix_to_list_array(mat: np.ndarray, value_type=pa.float32()) -> pa.ListArray:
    """Dense ``(n, d)`` ndarray → Arrow list array (for array<float> output
    columns) without per-row Python objects."""
    n, d = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    values = pa.array(np.ascontiguousarray(mat).ravel(), type=value_type)
    return pa.ListArray.from_arrays(offsets, values)
