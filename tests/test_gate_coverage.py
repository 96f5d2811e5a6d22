"""Gate-rotation contract (SURVEY.md §8): the driver oracle-checks only
``list(queries())[:50]`` per round, so every declared query must appear
in the union of archived CORRECTNESS files plus the current head-50 —
a reorder that silently un-verifies a query fails here, not at judging.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: how many leading queries() entries the driver verifies per round
DRIVER_GATE_SLOTS = 50


def _archived_checked() -> set:
    names = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        names.update(k for k, v in rows.items()
                     if v.get("err") is None and v.get("rows_match"))
    return names


def test_every_query_verified_by_some_round_or_this_one():
    declared = list(entrymod.queries())
    covered = _archived_checked() | set(declared[:DRIVER_GATE_SLOTS])
    missing = set(declared) - covered
    assert not missing, (
        f"{len(missing)} declared queries have never had a green "
        f"CORRECTNESS row and are outside the first {DRIVER_GATE_SLOTS} "
        f"slots the driver checks this round: {sorted(missing)} — "
        "reorder queries() (SURVEY.md §8 rotation policy)")


def test_head_slots_prioritize_stalest_evidence():
    """Nothing in the head-50 should displace a never-verified query:
    if any query has NO archived green row, it must sit in the head."""
    declared = list(entrymod.queries())
    archived = _archived_checked()
    never = [q for q in declared if q not in archived]
    outside = [q for q in never if q not in declared[:DRIVER_GATE_SLOTS]]
    assert not outside, (
        f"never-verified queries outside the driver's head-"
        f"{DRIVER_GATE_SLOTS}: {outside}")


def test_oracle_exists_for_every_query():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert not o - q, f"oracles without queries: {sorted(o - q)}"
