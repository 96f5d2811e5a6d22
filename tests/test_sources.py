"""Source/reader tests (SURVEY §2.1 S1-S8 on Spark)."""

import numpy as np

from xpysom_dask_spark import SparkSom
from xpysom_dask_spark.sources import readers

from conftest import SF_TINY


def test_load_csv_and_train(spark, tmp_path):
    # iris-like CSV fixture (reference S8: examples/iris.csv)
    rng = np.random.RandomState(3)
    path = str(tmp_path / "iris.csv")
    with open(path, "w") as f:
        f.write("sl,sw,pl,pw,species\n")
        for i in range(150):
            f.write(",".join(f"{v:.2f}" for v in rng.rand(4))
                    + f",sp{i % 3}\n")
    df = readers.load_csv(spark, path)
    assert df.columns == ["sl", "sw", "pl", "pw", "species"]
    assert df.count() == 150
    feats = readers.features_from_columns(
        df, ["sl", "sw", "pl", "pw"], keep=("species",))
    som = SparkSom(4, 4, 4, random_seed=1)
    som.train(feats, 3)
    labs = som.labels_map_df(feats, "species")
    assert labs.agg({"n": "sum"}).collect()[0][0] == 150


def test_features_from_columns_width(spark):
    li = readers.load_table(spark, SF_TINY, "lineitem").limit(10)
    df = readers.features_from_columns(
        li, ["l_quantity", "l_discount"], keep=("l_orderkey",))
    row = df.first()
    assert len(row["features"]) == 2
    assert df.columns == ["l_orderkey", "features"]


def test_all_tables_load(spark):
    for t in readers.TABLES:
        df = readers.load_table(spark, SF_TINY, t)
        assert df.count() > 0, t


def test_jsonl_roundtrip(spark, tmp_path):
    """write_jsonl -> load_jsonl round-trips the documents table
    (the training-data interchange path), including partitioned layout."""
    import pandas as pd

    from xpysom_dask_spark.sources.readers import load_jsonl
    from xpysom_dask_spark.sources.writers import write_jsonl

    from conftest import SF_TINY

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, partition_by="lang")
    ddl = ("doc_id bigint, text string, source string, n_chars bigint, "
           "lang string")
    back = load_jsonl(spark, path, schema=ddl)
    a = (docs.toPandas().sort_values("doc_id").reset_index(drop=True)
         .sort_index(axis=1))
    b = (back.toPandas().sort_values("doc_id").reset_index(drop=True)
         .sort_index(axis=1))
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_no_schema_warns(spark, tmp_path):
    import warnings

    from xpysom_dask_spark.sources.readers import load_jsonl
    from xpysom_dask_spark.sources.writers import write_jsonl

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "warn_jsonl")
    write_jsonl(df, path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        back = load_jsonl(spark, path)
    assert any("schema-inference" in str(x.message) for x in w)
    assert back.count() == 5


def test_som_save_table_roundtrip(spark, tmp_path):
    import numpy as np

    from xpysom_dask_spark import SparkSom

    som = SparkSom(5, 3, 4, random_seed=9, topology="hexagonal",
                   sigma=1.5, learning_rate=0.3,
                   activation_distance="norm_p_no_opt",
                   activation_distance_kwargs={"p": 2},
                   dtype=np.float64)
    X = np.random.RandomState(1).rand(100, 4)
    som.train(X, 2)
    path = str(tmp_path / "som_model")
    som.save_table(spark, path)
    back = SparkSom.load_table(spark, path)
    np.testing.assert_array_equal(som.get_weights(), back.get_weights())
    assert back.topology == "hexagonal"
    assert back._activation_distance_name == "norm_p_no_opt"
    np.testing.assert_array_equal(som.predict(X), back.predict(X))


def test_make_session_reuses_and_configures(spark):
    from xpysom_dask_spark import make_session

    s = make_session("test-app", shuffle_partitions=8,
                     extra_conf={"spark.sql.ui.retainedExecutions": "42"})
    # an active session is reused (getOrCreate contract)
    assert s is spark
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"


def test_som_load_table_rejects_partial_codebook(spark, tmp_path):
    """A filtered/partial model table must raise, not silently return
    uninitialized-memory weights (ADVICE r02)."""
    import pytest

    from xpysom_dask_spark import SparkSom

    som = SparkSom(4, 4, 3, random_seed=2)
    path = str(tmp_path / "som_partial")
    som.save_table(spark, path)
    broken = str(tmp_path / "som_broken")
    spark.read.parquet(path).where("i > 0").write.parquet(broken)
    with pytest.raises(ValueError, match="complete codebook"):
        SparkSom.load_table(spark, broken)
    # duplicated cells are rejected too, not just missing ones
    dup = str(tmp_path / "som_dup")
    full = spark.read.parquet(path)
    full.unionAll(full.limit(1)).write.parquet(dup)
    with pytest.raises(ValueError, match="complete codebook"):
        SparkSom.load_table(spark, dup)


def test_orc_roundtrip(spark, tmp_path):
    from xpysom_dask_spark.sources import readers as R, writers as W

    df = R.load_table(spark, SF_TINY, "documents")
    path = str(tmp_path / "docs_orc")
    W.write_orc(df, path, partition_by="lang")
    back = R.load_orc(spark, path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    a = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert a == b


def test_orc_scan_prunes_partitions(spark, tmp_path):
    """Filters on the partition column prune directories at plan time."""
    from xpysom_dask_spark.sources import readers as R, writers as W

    df = R.load_table(spark, SF_TINY, "documents")
    path = str(tmp_path / "docs_orc_p")
    W.write_orc(df, path, partition_by="source")
    back = R.load_orc(spark, path).where("source = 'src1'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan \
        or "source#" in plan
    assert back.count() == df.where("source = 'src1'").count()


def test_text_source_lines_and_wholefile(spark, tmp_path):
    from xpysom_dask_spark.sources import readers as R

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = R.load_text(spark, str(p))
    assert lines.columns == ["value"]
    assert sorted(r["value"] for r in lines.collect()) == \
        ["line one", "line two", "solo"]
    whole = R.load_text(spark, str(p), whole_file=True)
    assert whole.count() == 2
    assert any("line one\nline two" in r["value"]
               for r in whole.collect())


def test_avro_gate_raises_actionably(spark):
    import pytest as _pt

    from xpysom_dask_spark.sources import readers as R
    from xpysom_dask_spark.sources import writers as W

    with _pt.raises(ImportError, match="spark-avro"):
        R.load_avro(spark, "/tmp/nope.avro")
    with _pt.raises(ImportError, match="spark.jars.packages"):
        W.write_avro(spark.range(1), "/tmp/nope.avro")
