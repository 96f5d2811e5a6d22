"""Streaming decontamination: stateless broadcast-probe guard — batch
parity with operators.dedup.decontaminate, stream equivalence, bounds."""

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark.operators import dedup, sampling
from xpysom_dask_spark.sources import readers
from xpysom_dask_spark.streaming import (
    decontaminate_stream,
    eval_ngram_hashes,
)

from conftest import SF_TINY


def _split(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    sp = sampling.split_by_hash(docs, "doc_id",
                                {"train": 0.9, "test": 0.1}, seed=1)
    return (sp.where("split = 'train'").drop("split"),
            sp.where("split = 'test'").drop("split"))


def test_batch_parity_with_exact_decontaminate(spark):
    train, test = _split(spark)
    ths = eval_ngram_hashes(test, "text", "doc_id", n=5)
    got = decontaminate_stream(train, "text", "doc_id", ths, n=5)
    want = dedup.decontaminate(train, test, "text", "doc_id", n=5)
    g = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    w = sorted(r["doc_id"] for r in want.select("doc_id").collect())
    assert g == w and len(g) > 0
    assert got.columns == train.columns


def test_flag_col_annotates_instead_of_filtering(spark):
    train, test = _split(spark)
    ths = eval_ngram_hashes(test, "text", "doc_id", n=5)
    flagged = decontaminate_stream(train, "text", "doc_id", ths, n=5,
                                   flag_col="contaminated")
    assert flagged.count() == train.count()
    n_bad = flagged.where("contaminated").count()
    n_kept = decontaminate_stream(train, "text", "doc_id", ths,
                                  n=5).count()
    assert n_bad + n_kept == train.count() and n_bad > 0


def test_stream_matches_batch(spark):
    train, test = _split(spark)
    ths = eval_ngram_hashes(test, "text", "doc_id", n=5)
    want = sorted(r["doc_id"] for r in decontaminate_stream(
        train, "text", "doc_id", ths, n=5).select("doc_id").collect())

    tmp = tempfile.mkdtemp(prefix="decontamstream_")
    train.repartition(4).write.mode("overwrite").parquet(tmp)
    stream = spark.readStream.schema(train.schema).parquet(tmp)
    out = decontaminate_stream(stream, "text", "doc_id", ths, n=5)
    name = "t_stream_decontam_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted(r["doc_id"] for r in
                 spark.table(name).select("doc_id").collect())
    assert got == want


def test_short_and_empty_docs_pass_through(spark):
    train = spark.createDataFrame(
        [(1, "too short"), (2, ""), (3, "one two three four five six")],
        ["doc_id", "text"])
    test = spark.createDataFrame(
        [(9, "one two three four five six")], ["doc_id", "text"])
    ths = eval_ngram_hashes(test, "text", "doc_id", n=5)
    kept = {r["doc_id"] for r in decontaminate_stream(
        train, "text", "doc_id", ths, n=5).collect()}
    assert kept == {1, 2}      # doc 3 shares a full 5-gram; shorts pass


def test_test_set_bound_enforced(spark):
    test = spark.createDataFrame(
        [(i, f"a b c d e f g h i{i} j{i} k{i}") for i in range(20)],
        ["doc_id", "text"])
    with pytest.raises(ValueError, match="distinct test"):
        eval_ngram_hashes(test, "text", "doc_id", n=5,
                          max_test_ngrams=10)


def test_batch_plan_is_pure_map_chain(spark):
    """Zero Exchange, zero state store — the property that makes the
    operator stream-safe (PLANS.md: streaming decontamination)."""
    train, test = _split(spark)
    ths = eval_ngram_hashes(test, "text", "doc_id", n=5)
    out = decontaminate_stream(train, "text", "doc_id", ths, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
