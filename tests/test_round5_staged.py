"""Round-5 STAGED gate queries vs their oracles at sf0.001 — same
comparison as test_oracle_parity, for entries not yet in queries()
(the round-4 head-50 is full; SURVEY.md §8 round-5 queue)."""

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

STAGED = entrymod.queries_round5_staged()
ORACLES = entrymod.oracle_sql_round5_staged(SF_TINY)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_every_staged_oracle_has_a_query():
    # every staged entry now carries a full SQL oracle (bpe_subwords
    # was reworked from rows-only: the driver has no rows-only mode,
    # it records a missing oracle as err)
    assert set(ORACLES) == set(STAGED)


def test_bpe_subwords_compresses(spark):
    # merges compress: total subwords strictly below the
    # character+EOW count a merge-free encoding would emit
    rows = STAGED["bpe_subwords"](spark, SF_TINY).collect()
    assert len(rows) > 0
    assert sum(r["n_subwords"] for r in rows) < \
        sum(r["n_chars_eow"] for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_staged_query_matches_oracle(spark, name):
    sdf = STAGED[name](spark, SF_TINY)
    srows = sdf.collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_TINY}/{t}.parquet')")
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    assert _multiset(sdf.columns, [tuple(r) for r in srows]) == \
        _multiset(dcols, drows)
