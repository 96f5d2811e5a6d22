"""SparkSession factory with the engine's recommended configuration.

Users of the reference switch engines by swapping an import; this
factory hands them a session whose knobs match how the operators are
designed to run, instead of each caller rediscovering them:

* **AQE on** — runtime coalescing and join re-planning; the band joins
  and aggregates here are built assuming it.
* **Arrow batch size** — one Arrow batch is one kernel mini-batch (the
  reference's ``n_parallel`` analog, plans/exchange.py); 20k rows
  bounds the per-batch (batch, x·y) activation while keeping GEMMs
  efficient.
* **shuffle partitions ≈ cores** (local) — Spark's 200 default makes
  every small-data shuffle 200 tiny tasks; on a real cluster leave the
  default or size to 2-3× total cores.
* **nanosAsLong** — parquet TIMESTAMP(NANOS) columns (e.g. an events
  feed) read as i64 instead of erroring; the event-time operators here
  convert explicitly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def make_session(app_name: str = "xpysom-dask-spark",
                 master: str | None = None,
                 shuffle_partitions: int | None = None,
                 arrow_batch_rows: int = 20000,
                 driver_memory: str | None = None,
                 extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``master=None`` defers to the environment (spark-submit / cluster
    manager); pass ``"local[N]"`` for local runs.  ``extra_conf`` wins
    over every default.
    """
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    if driver_memory is not None:
        b = b.config("spark.driver.memory", driver_memory)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions",
                     str(int(shuffle_partitions)))
    b = (b.config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                 str(int(arrow_batch_rows)))
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         # The engine-wide epoch contract (readers.load_table converts
         # naive parquet timestamps to epoch micros/nanos) resolves
         # through the session zone — pin it to UTC so results are
         # host-timezone-independent and match the DuckDB oracle, which
         # treats naive timestamps as UTC.
         .config("spark.sql.session.timeZone", "UTC"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, str(v))
    return b.getOrCreate()
