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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_SLOTS = 50


def committed_correctness_paths(repo=REPO):
    """CORRECTNESS_r*.json files tracked by git — the builder-visible
    archive.  The driver drops the current round's file AFTER the
    snapshot commit (untracked at judge time), so deriving the coming
    round from ALL files on disk projects one round too far and flags a
    rotation that cannot have happened yet (the r7-r9 judged-tree red).
    Falls back to the on-disk glob outside a git checkout."""
    try:
        out = subprocess.run(
            ["git", "-C", repo, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, timeout=30, check=True
        ).stdout.split()
        if out:
            return [os.path.join(repo, p) for p in out]
    except (OSError, subprocess.SubprocessError):
        pass
    return glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))


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


#: evidence-freshness policy (SURVEY.md §8): at the end of each round,
#: no declared query's newest green row may be older than this many
#: rounds.  With 50 gate slots a full cycle over N declared queries
#: takes ceil(N/50) rounds, so the bound also caps how large the
#: declared surface may grow (<= 50 * MAX_STALENESS_ROUNDS - 50 tail).
MAX_STALENESS_ROUNDS = 3


def staleness_violations(declared, latest_green, next_round,
                         gate_slots=GATE_SLOTS,
                         max_age=MAX_STALENESS_ROUNDS):
    """Queries whose evidence would be too old AFTER the coming round.

    Project the current ordering forward: the head-``gate_slots``
    entries get a fresh row at ``next_round``; everything else keeps
    its archived latest.  Returns ``[(name, age_after_round), ...]``
    for every declared query whose projected age exceeds ``max_age``
    (never-green tail queries project to infinite age).
    """
    head = set(declared[:gate_slots])
    bad = []
    for name in declared:
        ev = next_round if name in head else latest_green.get(name)
        age = float("inf") if ev is None else next_round - ev
        if age > max_age:
            bad.append((name, age))
    return bad


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

    committed = latest_green_rounds(committed_correctness_paths())
    next_round = max(committed.values(), default=0) + 1
    bad = staleness_violations(declared, latest_green, next_round)
    if bad:
        print(f"# STALENESS (policy: <= {MAX_STALENESS_ROUNDS} rounds "
              f"after r{next_round}) — the CURRENT registration order "
              "leaves these too old; reorder before the round ends:")
        for name, age in bad:
            print(f"  ! {name} (age {age})")
    else:
        print(f"# staleness OK: current order keeps every query within "
              f"{MAX_STALENESS_ROUNDS} rounds after r{next_round}")


if __name__ == "__main__":
    main()
