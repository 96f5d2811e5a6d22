"""Round-8 promoted gate queries vs their oracles at sf0.001 — same
comparison as test_oracle_parity, for the 3 entries promoted from the
round-7 staging area into the graded head-50 (SURVEY.md §8)."""

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

PROMOTED = ("pack_bins_ffd", "knn_graph_full", "bm25_topk")

STAGED = {k: v for k, v in entrymod.queries().items() if k in PROMOTED}
ORACLES = {k: v for k, v in entrymod.oracle_sql(SF_TINY).items()
           if k in PROMOTED}


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

    assert set(ORACLES) == set(STAGED) == set(PROMOTED)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = latest_green_rounds(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    names = list(entrymod.queries())
    for name in PROMOTED:
        if greens.get(name) is None:
            assert names.index(name) < 50, \
                f"{name} has no green row yet but sits outside the head"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_promoted_query_matches_oracle(spark, name):
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


def test_bm25_matches_python_reference(spark):
    """From-scratch BM25 on a tiny corpus: ranking AND scaled scores
    must match — independent of the DuckDB twin, so a mistake shared
    by both engine expressions still gets caught."""
    import math

    from xpysom_dask_spark.operators.text import bm25_topk

    corpus = [
        (0, "spark shuffles data between stages"),
        (1, "spark broadcast joins avoid the shuffle"),
        (2, "duckdb runs the oracle queries"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "broadcast the small side and shuffle the big side"),
        (5, "shuffle shuffle shuffle"),
    ]
    queries = [(100, "spark shuffle"), (101, "the broadcast side")]
    k1, b = 1.2, 0.75
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    qdf = spark.createDataFrame(queries, "query_id bigint, qtext string")
    got = [(r["query_id"], r["rank"], r["doc_id"], r["score_e6"])
           for r in bm25_topk(df, "text", "doc_id", qdf, "qtext",
                              "query_id", k=3, k1=k1, b=b)
           .orderBy("query_id", "rank").collect()]

    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {}
    for t in docs.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    exp = []
    for qid, qtext in queries:
        scores = {}
        for d, toksd in docs.items():
            s = 0
            for term in set(qtext.split()):
                if term not in dfreq:
                    continue
                tf = toksd.count(term)
                if not tf:
                    continue
                idf = math.log(1.0 + (n - dfreq[term] + 0.5)
                               / (dfreq[term] + 0.5))
                v = (idf * tf * (k1 + 1.0)
                     / (tf + k1 * (1.0 - b + b * len(toksd) / avgdl)))
                s += int(math.floor(v * 1e6 + 0.5))
            if s:
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        exp.extend((qid, r + 1, d, s) for r, (d, s) in enumerate(top))
    assert got == exp


def test_bm25_max_df_drops_stop_terms_only(spark):
    """max_df prunes high-df query terms BEFORE the candidate join:
    scores lose exactly the pruned terms' components, nothing else."""
    from xpysom_dask_spark.operators.text import bm25_topk

    corpus = [(i, f"common w{i} w{i % 3}") for i in range(9)]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    qdf = spark.createDataFrame([(7, "common w1")],
                                "query_id bigint, qtext string")
    full = {r["doc_id"]: r["score_e6"]
            for r in bm25_topk(df, "text", "doc_id", qdf, "qtext",
                               "query_id", k=9).collect()}
    pruned = {r["doc_id"]: r["score_e6"]
              for r in bm25_topk(df, "text", "doc_id", qdf, "qtext",
                                 "query_id", k=9, max_df=3).collect()}
    # "common" (df=9) is pruned; only docs matching "w1" remain
    assert set(pruned) < set(full)
    for d in pruned:
        assert pruned[d] < full[d]
