"""Round-8 STAGED gate queries vs their oracles at sf0.001 — the
promotion queue awaiting a head-50 slot at the round-8 rotation
(queries_round8_staged / oracle_sql_round8_staged; SURVEY.md §8).
Same comparison as test_oracle_parity."""

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

STAGED = entrymod.queries_round8_staged()
ORACLES = entrymod.oracle_sql_round8_staged()


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
    # staged names must not collide with declared queries
    assert not set(STAGED) & set(entrymod.queries())


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


def test_knn_graph_full_probe_equals_bruteforce(spark):
    """nprobe = n_cells must reproduce exact brute-force cosine top-k
    regardless of codebook quality — here with deliberately awful
    centroids (all in one corner) so every row still probes every
    cell."""
    import numpy as np

    from xpysom_dask_spark.operators.similarity import knn_graph

    emb = entrymod._emb(spark, SF_TINY).where("vec_id < 80")
    rows = emb.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    cents = np.full((3, X.shape[1]), 9.0) + np.arange(3)[:, None]
    got = (knn_graph(emb, cents, k=3, nprobe=3)
           .orderBy("vec_id", "rank").collect())
    # brute force on the driver
    ids = np.array([r["vec_id"] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    exp = []
    for i in range(len(ids)):
        order = sorted((j for j in range(len(ids)) if j != i),
                       key=lambda j: (-round(S[i, j], 12), ids[j]))
        for rank, j in enumerate(order[:3], 1):
            exp.append((int(ids[i]), rank, int(ids[j])))
    assert [(r["vec_id"], r["rank"], r["neighbor_id"]) for r in got] == exp


def test_pack_bins_ffd_gate_is_single_group_bounded():
    """The gate config must stay replayable: ONE group, ≤64 docs —
    the recursion-depth/state bound the oracle's recursive CTE relies
    on (a config drift here silently invalidates the gate's claim)."""
    import inspect

    src = inspect.getsource(entrymod._q_pack_bins_ffd)
    assert "n_groups=1" in src
    assert entrymod._FFD_GATE_DOCS <= 64
    assert f"limit(_FFD_GATE_DOCS)" in src
