"""Round-10 PRE-STAGED gate queries vs their oracles at sf0.001 —
verified like the round-9 queue, promoted the round after
(queries_round10_staged / oracle_sql_round10_staged; SURVEY.md §8)."""

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

STAGED = entrymod.queries_round10_staged()
ORACLES = entrymod.oracle_sql_round10_staged()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_every_staged_query_has_an_oracle():
    assert set(STAGED) == set(ORACLES)
    assert not set(STAGED) & set(entrymod.queries())
    assert not set(STAGED) & set(entrymod.queries_round9_staged())


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


def test_quantile_hist_monotone_and_bounded(spark):
    """Quantile estimates must be non-decreasing in q within each
    group and land inside the sketch's [lo, hi) grid."""
    rows = STAGED["quantile_hist"](spark, SF_TINY).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["l_returnflag"], []).append(
            (r["q_e6"], r["value_e6"]))
    assert by_g
    for g, pairs in by_g.items():
        pairs.sort()
        vals = [v for _q, v in pairs]
        assert vals == sorted(vals), (g, pairs)
        assert all(0 <= v < 80000 * 10**6 for v in vals), (g, pairs)
