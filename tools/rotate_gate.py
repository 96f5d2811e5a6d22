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


def is_green(row):
    """GREEN means the full gate passed: rows AND schema AND value hash,
    no err.  A rows-only match (the r4 tpch_q12 and r5 shard_layout
    cases) is NOT green and must keep its head slot."""
    return (row.get("err") is None and row.get("rows_match")
            and row.get("schema_match") and row.get("hash_match"))


def latest_green_rounds(paths):
    """Map query name -> most recent round with a GREEN row."""
    latest_green = {}
    for path in sorted(paths):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            rows = json.load(fh)
        for name, v in rows.items():
            if is_green(v):
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest_green


def main():
    import __spark_entry__ as entry

    latest_green = latest_green_rounds(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))

    # staged queues are never-verified by definition: the rotation
    # policy promotes them into the head verbatim
    staged = []
    for attr in sorted(dir(entry)):
        if attr.startswith("queries_round") and attr.endswith("_staged"):
            staged.extend(getattr(entry, attr)().keys())
    if staged:
        print(f"# PROMOTE first ({len(staged)} staged, never-verified "
              "-> head slots):")
        for name in staged:
            print(f"  + {name}")

    declared = list(entry.queries())
    order = sorted(
        range(len(declared)),
        key=lambda i: (latest_green.get(declared[i], -1), i))
    head_left = max(GATE_SLOTS - len(staged), 0)
    print(f"# recommended queries() order ({len(declared)} declared; "
          f"after promotion the next {head_left} fill the head)")
    for rank, i in enumerate(order):
        name = declared[i]
        ev = latest_green.get(name)
        tag = "NEVER" if ev is None else f"r{ev}"
        marker = "  <-- head" if rank < head_left else ""
        print(f"{rank + 1:3d}. {name:32s} [{tag}]{marker}")


if __name__ == "__main__":
    main()
