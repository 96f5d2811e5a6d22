"""Exactly-once foreachBatch sinks.

Structured Streaming's ``foreachBatch`` gives at-least-once batch
delivery: after a crash between "user function ran" and "offsets
committed", the SAME (batch_id, data) is replayed.  Exactly-once
output therefore needs an idempotent writer — the standard pattern is
to key the physical write on ``batch_id`` so a replay either
overwrites its own partition (self-canceling) or detects the completed
batch and skips.

Two shapes, both engine-portable (plain parquet, no table format
required):

* ``idempotent_parquet_sink`` — dynamic partition overwrite on a
  ``batch_id=N`` directory: replays overwrite only their own
  partition, committed batches elsewhere are untouched.  Readers see
  the union of batch partitions; ``batch_id`` is partition-pruned on
  read.
* ``transactional_parquet_sink`` — write to ``_tmp/<batch>`` then
  atomically rename into place, with a ``_COMMITTED_<batch>`` marker
  checked before work: a replay of a committed batch becomes a no-op
  (skip, don't rewrite), which also makes the sink safe for
  non-deterministic batch contents (the FIRST completed attempt wins).

Delta/Iceberg would give the same guarantee via ``txnAppId``/snapshot
commits; those packages aren't in this environment, and the
directory-per-batch pattern is the format-free equivalent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(path: str, partition_cols: list[str] | None = None):
    """Return a ``foreachBatch`` function writing each micro-batch to
    ``{path}/batch_id=N/`` via dynamic partition overwrite.

    Replayed batches overwrite exactly their own ``batch_id``
    partition — a second delivery of batch N leaves every other batch
    intact, so the sink output equals the exactly-once output as long
    as batch contents are deterministic (Spark replays the same source
    offsets, so they are, absent non-deterministic transforms).
    """
    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        # per-write option, NOT spark.conf.set: a session-global
        # save/restore races with concurrent streaming queries on the
        # same session (another batch writing inside the restore window
        # would run under static overwrite and drop sibling partitions)
        cols = ["batch_id"] + list(partition_cols or [])
        (batch_df.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(*cols).parquet(path))

    return write


def transactional_parquet_sink(path: str):
    """Return a ``foreachBatch`` function with commit-marker semantics:
    batch N writes to ``{path}/_tmp_batch_N``, renames to
    ``{path}/batch_N``, then drops ``{path}/_COMMITTED_N``; a replay
    that finds the marker skips entirely.  First completed attempt
    wins — correct even if a retried batch would produce different
    bytes (non-deterministic transforms).

    Local-filesystem rename is atomic; on object stores substitute a
    metadata-pointer commit (or a real table format) — the marker
    protocol is the part that carries over.
    """
    def write(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(path, exist_ok=True)
        marker = os.path.join(path, f"_COMMITTED_{int(batch_id)}")
        final = os.path.join(path, f"batch_{int(batch_id)}")
        if os.path.exists(marker):
            return                       # replay of a committed batch
        tmp = os.path.join(path, f"_tmp_batch_{int(batch_id)}")
        batch_df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):        # crashed after rename: clear
            import shutil
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(marker, "w") as fh:
            fh.write("")

    return write


def read_transactional(spark, path: str) -> DataFrame:
    """Read back only the COMMITTED batches of a
    ``transactional_parquet_sink`` directory (uncommitted ``_tmp`` /
    unmarked leftovers are invisible, which is the read-side half of
    the exactly-once contract)."""
    batches = [os.path.join(path, d) for d in sorted(os.listdir(path))
               if d.startswith("batch_")
               and os.path.exists(os.path.join(
                   path, "_COMMITTED_" + d.split("_", 1)[1]))]
    if not batches:
        raise ValueError(f"no committed batches under {path}")
    return spark.read.parquet(*batches)
