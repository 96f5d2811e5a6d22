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
from tools.rotate_gate import is_green, latest_green_rounds

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: how many leading queries() entries the driver verifies per round
DRIVER_GATE_SLOTS = 50


def _archived_checked() -> set:
    """Queries with at least one fully GREEN archived row (rows AND
    schema AND value hash) — a rows-only match is NOT green and must
    keep its head slot (r4 tpch_q12, r5 shard_layout)."""
    names = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        names.update(k for k, v in rows.items() if is_green(v))
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


def test_red_hash_row_is_not_green():
    """The r5 shard_layout case: rows/schema matched but the value hash
    did not — rotate_gate must NOT count that as green, so a red row
    can never be rotated out of the head."""
    red = {"rows_match": True, "schema_match": True,
           "hash_match": False, "err": None}
    assert not is_green(red)
    assert is_green({"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None})
    assert not is_green({"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": "boom"})


def test_shard_layout_r5_red_row_excluded_from_green_history():
    """Pin against the real archive: CORRECTNESS_r05 recorded
    shard_layout with hash_match=false; latest_green_rounds must not
    credit round 5 for it."""
    r5 = os.path.join(REPO, "CORRECTNESS_r05.json")
    greens = latest_green_rounds([r5])
    assert greens.get("shard_layout") is None
    assert greens.get("tpch_q1") == 5


def test_gate_twin_canonicalizer_catches_hugeint():
    """The driver hashes via pandas, where DuckDB HUGEINT becomes
    float64; the twin must distinguish it from BIGINT/int64 (the r5
    shard_layout blind spot)."""
    import duckdb

    from tools.gate_common import value_hash

    con = duckdb.connect()
    huge = con.execute(
        "SELECT SUM(x) AS s FROM (VALUES (1),(2)) t(x)").fetchdf()
    big = con.execute(
        "SELECT CAST(SUM(x) AS BIGINT) AS s "
        "FROM (VALUES (1),(2)) t(x)").fetchdf()
    assert value_hash(huge) != value_hash(big)
    assert value_hash(big) == value_hash(big.copy())


def test_current_order_meets_staleness_policy():
    """VERDICT r6: evidence freshness must be enforced, not advisory.
    Project the CURRENT queries() order through the coming round (head
    slots get fresh rows, the tail keeps its archive) and fail if any
    declared query's newest green row would end the round more than
    MAX_STALENESS_ROUNDS old — e.g. the round-6 ordering frozen into
    round 8 leaves the round-3 block 5 rounds stale and trips this.

    VERDICT r9 #2: the coming round is derived from the COMMITTED
    archive (git ls-files), not the on-disk glob — the driver drops the
    current round's CORRECTNESS file after the snapshot commit, and
    counting that untracked file projects a rotation that cannot have
    happened yet (the red manufactured in every r7-r9 judged tree).
    Evidence itself still counts from all files on disk: an untracked
    green row is real evidence."""
    from tools.rotate_gate import (MAX_STALENESS_ROUNDS,
                                   committed_correctness_paths,
                                   staleness_violations)

    latest = latest_green_rounds(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    committed = latest_green_rounds(committed_correctness_paths(REPO))
    next_round = max(committed.values(), default=0) + 1
    declared = list(entrymod.queries())
    bad = staleness_violations(declared, latest, next_round)
    assert not bad, (
        f"queries() order leaves evidence > {MAX_STALENESS_ROUNDS} "
        f"rounds old after r{next_round}: {bad} — run "
        "tools/rotate_gate.py and reorder")


def test_staleness_violation_detection_catches_frozen_order():
    """The helper itself must flag a stale tail: a 3-query surface
    with 1 head slot where the tail query's last green row is 4
    rounds back."""
    from tools.rotate_gate import staleness_violations

    declared = ["a", "b", "c"]
    latest = {"a": 7, "b": 4, "c": 7}
    bad = staleness_violations(declared, latest, 8, gate_slots=1,
                               max_age=3)
    assert bad == [("b", 4)]
    # never-green tail is infinitely stale
    bad2 = staleness_violations(declared, {"a": 7, "c": 7}, 8,
                                gate_slots=1, max_age=3)
    assert ("b", float("inf")) in bad2
