#!/usr/bin/env python
"""Ingest drift monitoring, end to end: the exact-statistics family.

A metrics pipeline wants three alarms with different blind spots:
per-row z-scores (one reading far off its group's norm), KS
(distribution SHAPE changed even if moments didn't), and
Wasserstein-1 (HOW FAR the mass moved, in value units).  All three
here are exact-integer statistics — re-runs and re-partitions can
never flip an alert — and the z-score scorer runs identically on a
live stream against frozen reference moments.

Run:  python examples/drift_monitoring.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import profile as PRF  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402
from xpysom_dask_spark.streaming import (  # noqa: E402
    stream_zscore,
    zscore_moments,
)


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("drift-monitoring", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    ev = readers.load_table(spark, sf_dir, "events")

    print("== per-group z-score anomalies (|z| >= 2.5) ==")
    PRF.zscore_by_group(ev, "event_type", "value", "event_id",
                        threshold=2.5) \
        .orderBy(F.abs(F.col("z")).desc()).show(5)

    print("== KS + Wasserstein-1 drift: even vs odd event halves ==")
    PRF.ks_drift(ev.where("event_id % 2 = 0"),
                 ev.where("event_id % 2 = 1"), "value").show()
    print("== ... vs a genuinely shifted copy (value + 0.5) ==")
    PRF.ks_drift(ev, ev.withColumn("value", F.col("value") + 0.5),
                 "value").show()

    print("== streaming z-score: arrivals vs frozen moments ==")
    ref = ev.select("event_id", "event_type", "value")
    mom = zscore_moments(ref, "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="driftdemo_")
    ref.repartition(2).write.mode("overwrite").parquet(tmp)
    stream = spark.readStream.schema(ref.schema).parquet(tmp)
    out = stream_zscore(stream, mom, "event_type", "value",
                        threshold=2.5)
    name = "drift_demo_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    n = spark.table(name).count()
    print(f"streamed alerts: {n} (== batch: "
          f"{PRF.zscore_by_group(ev, 'event_type', 'value', 'event_id', threshold=2.5).count()})")

    print("== live PSI monitor: stream cells vs frozen reference ==")
    from xpysom_dask_spark.operators import sketches as SK
    from xpysom_dask_spark.operators.profile import psi_terms_from_cells
    from xpysom_dask_spark.streaming import (psi_complete_spine,
                                             psi_stream)
    ref_cells = SK.histogram_sketch(ev.where("event_id % 2 = 0"),
                                    "value", 0.0, 500.0, bins=20)
    live = ev.where("event_id % 2 = 1").select("value")
    tmp2 = tempfile.mkdtemp(prefix="driftpsi_")
    live.repartition(2).write.mode("overwrite").parquet(tmp2)
    stream2 = spark.readStream.schema(live.schema).parquet(tmp2)
    cells = psi_stream(stream2, "value", ref_cells, 0.0, 500.0,
                       bins=20)
    name2 = "drift_psi_" + uuid.uuid4().hex[:8]
    q2 = (cells.writeStream.format("memory").queryName(name2)
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    terms = psi_terms_from_cells(
        psi_complete_spine(spark.table(name2), ref_cells, 20), 20)
    psi = terms.agg(F.sum("term_e6").alias("psi_e6")).first()["psi_e6"]
    print(f"live PSI = {psi / 1e6:.4f} "
          f"({'alarm' if psi > 100000 else 'calm'}; bands 0.1/0.25)")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
