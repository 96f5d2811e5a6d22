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
