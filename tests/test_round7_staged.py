"""Round-7 promoted gate queries vs their oracles at sf0.001 — same
comparison as test_oracle_parity, for the 14 entries promoted from the
round-6 staging area into the graded head-50 (SURVEY.md §8)."""

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

PROMOTED = (
    # events_ewma was merged into the round-10 events_smoothing gate
    # (streaming_ewma still shares its oracle)
    "dedup_paragraphs", "text_dict_coverage", "embedding_rp",
    "knn_graph", "partitioned_roundtrip",
    "embedding_mrl", "graph_triangles", "lsh_recall_audit",
    "text_tfidf", "streaming_ewma", "pack_bins", "dedup_containment",
    "vocab_zipf")

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


def test_partitioned_roundtrip_scan_is_partition_pruned(spark):
    """The staged gate's read-back must open ONE lang directory: the
    literal filter lands in PartitionFilters, not post-scan."""
    import tempfile

    from pyspark.sql import functions as F

    from xpysom_dask_spark.sources import readers
    from xpysom_dask_spark.sources.writers import write_partitioned

    docs = readers.load_table(spark, SF_TINY, "documents")
    tmp = tempfile.mkdtemp(prefix="partprune_")
    write_partitioned(docs, tmp, "lang")
    back = spark.read.parquet(tmp).where(F.col("lang") == "de")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # pruning proof: the pruned scan reads strictly fewer files than
    # the full one
    n_de = back.count()
    n_all = spark.read.parquet(tmp).count()
    assert 0 < n_de < n_all


def test_knn_graph_gate_neighbors_share_cell(spark):
    """Every edge of the staged kNN-graph gate must connect two
    vectors of the SAME coarse cell (the documented candidate
    contract)."""
    import numpy as np

    from xpysom_dask_spark.operators.clustering import kmeans_assign
    from xpysom_dask_spark.sources import readers

    emb = readers.load_table(spark, SF_TINY, "embeddings")
    cents = np.stack([
        np.asarray(r["embedding"], np.float64)
        for r in emb.where("vec_id < 4").orderBy("vec_id").collect()])
    cell = {r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(emb, cents).collect()}
    edges = STAGED["knn_graph"](spark, SF_TINY).collect()
    assert len(edges) > 0
    for r in edges:
        assert cell[r["vec_id"]] == cell[r["neighbor_id"]]


def test_dedup_paragraphs_sep_is_literal_not_regex(spark):
    """ADVICE r6: a regex-special separator ('.', '|') must split on
    the literal character — un-quoted it would split on EVERY char and
    silently diverge from the DuckDB string_split oracle."""
    from xpysom_dask_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "abc.abc.xyz"), (2, "a|b|a|c")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           dedup_paragraphs(df, "text", "doc_id", sep=".").collect()}
    assert got[1]["text"] == "abc.xyz"
    assert got[1]["n_paras_removed"] == 1
    assert got[2]["text"] == "a|b|a|c"      # no '.' -> untouched
    got2 = {r["doc_id"]: r for r in
            dedup_paragraphs(df, "text", "doc_id", sep="|").collect()}
    assert got2[2]["text"] == "a|b|c"
    assert got2[2]["n_paras_removed"] == 1
