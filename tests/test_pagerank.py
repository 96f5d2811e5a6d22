"""pagerank: exact-integer power iteration vs an independent Python
reference on small graphs."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators.graph import pagerank


def _ref_pagerank(edges, n_iter=5, d_e6=850000, scale=10**6):
    verts = sorted({v for e in edges for v in e})
    out = {}
    for s, _t in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: scale for v in verts}
    base = (scale * (scale - d_e6)) // scale
    for _ in range(n_iter):
        inbound = {v: 0 for v in verts}
        for s, t in edges:
            inbound[t] += ranks[s] // out[s]
        ranks = {v: base + (d_e6 * inbound[v]) // scale
                 for v in verts}
    return ranks


@pytest.mark.parametrize("edges", [
    [(1, 2), (2, 3), (3, 1)],                         # cycle
    [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)],         # hub + dangler in
    [(i, (i * 7) % 23) for i in range(23)],           # pseudo-random
    [(1, 2), (2, 1), (3, 4)],                         # two components
])
def test_pagerank_matches_integer_reference(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["rank_e6"]
           for r in pagerank(df, n_iter=5).collect()}
    assert got == _ref_pagerank(edges)


def test_pagerank_hub_outranks_leaf(spark):
    # everyone points at 1; 1 points at 2
    edges = [(i, 1) for i in range(2, 8)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["rank_e6"] for r in pagerank(df).collect()}
    assert got[1] > got[2] > got[3]
    assert got[3] == got[4] == got[7]   # symmetric leaves tie exactly


def test_pagerank_duplicate_edges_and_validation(spark):
    df = spark.createDataFrame([(1, 2), (1, 2), (2, 1)],
                               "src bigint, dst bigint")
    got = {r["id"]: r["rank_e6"] for r in pagerank(df).collect()}
    assert got == _ref_pagerank([(1, 2), (2, 1)])
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


def test_pagerank_two_path_parity(spark):
    """The driver-fused small-graph path must equal the distributed
    iteration bit-for-bit (exact integer semantics on both)."""
    import random

    from xpysom_dask_spark.operators.graph import pagerank

    rng = random.Random(11)
    edges = sorted({(rng.randrange(30), rng.randrange(30))
                    for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fused = {r["id"]: r["rank_e6"]
             for r in pagerank(df, n_iter=5).collect()}
    dist = {r["id"]: r["rank_e6"]
            for r in pagerank(df, n_iter=5,
                              fuse_local_edges=0).collect()}
    assert fused == dist


def test_lpa_two_path_parity(spark):
    import random

    from xpysom_dask_spark.operators.graph import label_propagation

    rng = random.Random(12)
    edges = sorted({(rng.randrange(40), rng.randrange(40))
                    for _ in range(150)})
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    fused = {r["id"]: r["community"]
             for r in label_propagation(df, n_iter=4).collect()}
    dist = {r["id"]: r["community"]
            for r in label_propagation(
                df, n_iter=4, fuse_local_edges=0).collect()}
    assert fused == dist
    # weighted variant too
    wdf = spark.createDataFrame(
        [(a, b, (a + b) % 5 + 1) for a, b in edges],
        "id_a bigint, id_b bigint, w bigint")
    fw = {r["id"]: r["community"] for r in label_propagation(
        wdf, n_iter=3, weight_col="w").collect()}
    dw = {r["id"]: r["community"] for r in label_propagation(
        wdf, n_iter=3, weight_col="w", fuse_local_edges=0).collect()}
    assert fw == dw
