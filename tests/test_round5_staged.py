"""Round-5 promoted gate queries vs their oracles at sf0.001 — same
comparison as test_oracle_parity, for the four entries promoted from
the round-4 staging area into the graded head-50 (SURVEY.md §8)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from conftest import SF_TINY

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

PROMOTED = ("streaming_decontaminate", "shard_layout", "probe_scores",
            "bpe_subwords")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_promoted_queries_head_until_green():
    # the driver checks queries()[:50]; a promoted entry must keep a
    # head slot until it has a fully GREEN archived row (rows AND
    # schema AND hash) — afterwards the rotation may move it out
    import glob

    from tools.rotate_gate import latest_green_rounds

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = latest_green_rounds(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    names = list(entrymod.queries())
    for name in PROMOTED:
        if greens.get(name) is None:
            assert names.index(name) < 50, \
                f"{name} has no green row yet but sits outside the head"
    oracles = entrymod.oracle_sql()
    for name in PROMOTED:
        assert name in oracles, f"{name} lost its oracle"


def test_bpe_subwords_compresses(spark):
    # merges compress: total subwords strictly below the
    # character+EOW count a merge-free encoding would emit
    rows = entrymod.queries()["bpe_subwords"](spark, SF_TINY).collect()
    assert len(rows) > 0
    assert sum(r["n_subwords"] for r in rows) < \
        sum(r["n_chars_eow"] for r in rows)


@pytest.mark.parametrize("name", PROMOTED)
def test_promoted_query_matches_oracle(spark, name):
    sdf = entrymod.queries()[name](spark, SF_TINY)
    srows = sdf.collect()
    oracle = entrymod.oracle_sql(ivf_sf_dir=SF_TINY)[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_TINY}/{t}.parquet')")
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    assert _multiset(sdf.columns, [tuple(r) for r in srows]) == \
        _multiset(dcols, drows)
