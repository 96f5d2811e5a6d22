#!/usr/bin/env python
"""Gate-rotation advisor (SURVEY.md §8 policy).

The driver oracle-checks only the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so registration order decides
which queries get fresh CORRECTNESS evidence.  This tool reads the
archived ``CORRECTNESS_r*.json`` files and prints the recommended
next-round ordering:

1. queries with NO green row in any round (must take head slots);
2. then by stalest evidence (oldest most-recent green round first);
3. ties keep current registration order.

It prints the ordering — it does not rewrite code.  Apply by reordering
the ``queries()`` dict and re-running ``tests/test_gate_coverage.py``.
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_SLOTS = 50


def main():
    import __spark_entry__ as entry

    latest_green = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            rows = json.load(fh)
        for name, v in rows.items():
            if v.get("err") is None and v.get("rows_match"):
                latest_green[name] = max(latest_green.get(name, 0), rnd)

    declared = list(entry.queries())
    order = sorted(
        range(len(declared)),
        key=lambda i: (latest_green.get(declared[i], -1), i))
    print(f"# recommended queries() order ({len(declared)} queries; "
          f"head {GATE_SLOTS} get driver rows next round)")
    for rank, i in enumerate(order):
        name = declared[i]
        ev = latest_green.get(name)
        tag = "NEVER" if ev is None else f"r{ev}"
        marker = "  <-- head" if rank < GATE_SLOTS else ""
        print(f"{rank + 1:3d}. {name:32s} [{tag}]{marker}")


if __name__ == "__main__":
    main()
