"""Multi-JVM executor-boundary smoke (tools/cluster_smoke.py): a
small query subset on a REAL two-executor ``local-cluster`` master,
hash-checked against the DuckDB oracle.  Everything else in the suite
runs on single-JVM ``local[n]``, which cannot catch closure/broadcast
serialization or executor-side import bugs — the day-one failure
class of a real 1000-executor deployment.  The full 11-query sweep is
``python tools/cluster_smoke.py`` (round-end checklist); this test
keeps the two riskiest classes (mapInArrow training kernel + Arrow
text kernels with band-join shuffles) in CI at ~2 min.

Runs in a subprocess: a local-cluster SparkSession cannot coexist
with the session-scoped local[n] fixture in one JVM/process.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_TINY = "/root/testdata/sf0.001"


def test_cluster_smoke_subset():
    code = (
        "import sys; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
        "from cluster_smoke import run\n"
        "bad = run(%r, names=['som_train_epoch', 'dedup_minhash'])\n"
        "sys.exit(1 if bad else 0)\n"
        % (REPO, os.path.join(REPO, "tools"), SF_TINY))
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, (proc.stdout[-1500:],
                                  proc.stderr[-1500:])
    assert "som_train_epoch: OK" in proc.stdout
    assert "dedup_minhash: OK" in proc.stdout
