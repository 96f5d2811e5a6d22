"""Replicates the driver's t2 gate locally: every queries() entry vs its
oracle_sql() twin at sf0.001 (fast) — row count, column names, and
order-insensitive value multiset must match exactly."""

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


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


# ann_recall_curve's oracle embeds an IVF codebook trained on the
# oracle-side embeddings — build it for the sf this test runs at
ORACLES = entrymod.oracle_sql(ivf_sf_dir=SF_TINY)
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_TINY)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(SF_TINY)
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), \
        f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), \
        f"{name}: row count {len(srows)} vs {len(drows)}"
    sm = _rows_to_multiset([c.lower() for c in scols],
                           [tuple(r) for r in srows])
    dm = _rows_to_multiset([c.lower() for c in dcols], drows)
    mism = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={sm[mism[0]]} duck={dm[mism[0]]}")


def test_all_queries_have_oracle_or_rows_check():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["bmu_x", "bmu_y", "n_wins"]


def test_rows_only_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_TINY)
        assert df.count() >= 0, name
