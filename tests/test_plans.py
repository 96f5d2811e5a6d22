"""Physical-plan regression tests — lock in the plan shapes the engine
is designed around (PLANS.md).  A change that silently turns a narrow
stage into a shuffle, a broadcast hash join into a nested-loop join, or
a pruned scan into a full-schema scan would pass value-based tests and
still be a 100 TB disaster; these tests fail it immediately.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark import SparkSom
from xpysom_dask_spark.operators import sampling, similarity
from xpysom_dask_spark.sources import readers

from conftest import SF_TINY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_sampling_plan_is_pruned_scan_no_exchange(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    out = sampling.hash_sample(docs, "doc_id", 0.25, seed=7) \
        .select("doc_id", "lang")
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_scoring_plan_is_single_narrow_stage(spark):
    feats = readers.lineitem_features(spark, SF_TINY, keys=False)
    som = SparkSom(4, 4, 8, random_seed=1)
    scored = som.transform(feats, ("cluster_id",))
    plan = _plan(scored)
    assert "Exchange" not in plan          # no shuffle anywhere
    assert "MapInArrow" in plan            # the one kernel stage


def test_som_ivf_join_is_broadcast_hash_not_nlj(spark):
    emb = readers.load_table(spark, SF_TINY, "embeddings")
    som = SparkSom(4, 4, 64, random_seed=3, features_col="embedding")
    som.train(emb.select("embedding"), 1)
    q = emb.where("vec_id % 100 = 0").collect()
    out = similarity.som_ivf_topk(
        som, emb, np.array([r["embedding"] for r in q]),
        [r["vec_id"] for r in q], k=3, nprobe=4)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_partition_filter_prunes_directories(spark, tmp_path):
    """Directory-partitioned sink + filter ⇒ partition pruning at plan
    time (PartitionFilters), not a data filter."""
    from xpysom_dask_spark.sources.writers import write_partitioned

    docs = readers.load_table(spark, SF_TINY, "documents")
    path = str(tmp_path / "by_lang")
    write_partitioned(docs, path, "lang")
    back = spark.read.parquet(path).where(F.col("lang") == "en") \
        .select("doc_id")
    plan = _plan(back)
    assert "PartitionFilters: [isnotnull(lang" in plan.replace("#", " #") \
        or "lang#" in plan.split("PartitionFilters")[1][:120]


def test_feature_scan_pushes_projection(spark):
    """lineitem_features reads exactly the numeric source columns — the
    scan's attribute list must NOT contain the wide text/date columns
    (ReadSchema's string form truncates, so check the attribute list)."""
    feats = readers.lineitem_features(spark, SF_TINY, keys=False)
    plan = _plan(feats)
    assert "l_quantity#" in plan            # feature columns scanned
    assert "l_comment#" not in plan         # wide column pruned
    assert "l_shipinstruct#" not in plan


def test_curation_filter_pushes_into_scan(spark):
    """The lang equality filter of a curated read reaches the parquet
    scan as a pushed filter (cheap pre-screen before the expression
    work)."""
    docs = readers.load_table(spark, SF_TINY, "documents")
    out = docs.where(F.col("lang") == "en").select("doc_id")
    plan = _plan(out)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_narrow_text_ops_have_no_exchange(spark):
    """chunk_tokens and c4_line_filter must stay entirely inside the
    scan stage — any Exchange in their plans is a regression."""
    from xpysom_dask_spark.operators import text as T

    docs = readers.load_table(spark, SF_TINY, "documents")
    for out in (T.chunk_tokens(docs, "text", "doc_id", window=16),
                T.c4_line_filter(docs, "text", "doc_id")):
        plan = _plan(out)
        assert "Exchange" not in plan, plan[:500]


def test_tpch_q5_broadcasts_dimensions_no_nlj(spark):
    """The 6-way star join must plan the dimension chain as broadcast
    hash joins and never degenerate to a nested-loop/cartesian."""
    import __spark_entry__ as entry

    out = entry.queries()["tpch_q5"](spark, SF_TINY)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q6_filters_reach_scan(spark):
    import __spark_entry__ as entry

    out = entry.queries()["tpch_q6"](spark, SF_TINY)
    plan = _plan(out)
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "l_returnflag#" not in plan      # column pruned


def test_semantic_dedup_single_cell_shuffle(spark):
    """semantic_dedup's data path: narrow Arrow scoring, ONE exchange
    on cluster_id into the per-cell Arrow task."""
    import numpy as np

    from xpysom_dask_spark.operators import similarity
    from xpysom_dask_spark.operators.som import SparkSom

    e = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    som = SparkSom(2, 2, 64, random_seed=7, features_col="embedding")
    som.train(e.select("embedding").limit(100), 1)
    out = similarity.semantic_dedup(som, e, threshold=0.4,
                                    max_cell=None)
    plan = _plan(out)
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1, plan
