"""Table readers and feature-extraction views.

The SOM consumes any fixed-width numeric matrix (reference ingestion
dispatch, xpysom.py:484-510 — S1-S6 in SURVEY.md §2.1).  On Spark the
native form is a DataFrame with an ``array<float>`` column; these helpers
build it declaratively so Catalyst keeps column pruning + predicate
pushdown on the parquet scan (only the referenced columns are read).

``LINEITEM_FEATURES`` is the canonical 8-feature extraction over the
driver's TPC-H-ish ``lineitem`` (FIXTURES.md F7), expressed as plain SQL
strings so the DuckDB oracle can evaluate the *identical* float64
expressions.  Features are scaled to O(1) so accumulated sums stay
well-conditioned for cross-engine comparison.
"""

from __future__ import annotations

from warnings import warn

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

#: (name, sql_expr) — identical text evaluated by Spark and DuckDB.
#: Every operand is explicitly DOUBLE: Spark types bare literals like 7.0
#: as DECIMAL and would do scale-limited decimal division where DuckDB
#: promotes to double.
LINEITEM_FEATURES = (
    ("f1", "l_quantity / CAST(50 AS DOUBLE)"),
    ("f2", "l_extendedprice / CAST(100000 AS DOUBLE)"),
    ("f3", "l_discount * CAST(10 AS DOUBLE)"),
    ("f4", "l_tax * CAST(10 AS DOUBLE)"),
    ("f5", "CAST(l_linenumber AS DOUBLE) / CAST(7 AS DOUBLE)"),
    ("f6", "CAST(l_suppkey % 100 AS DOUBLE) / CAST(100 AS DOUBLE)"),
    ("f7", "CAST(l_partkey % 100 AS DOUBLE) / CAST(100 AS DOUBLE)"),
    ("f8", "CAST(l_orderkey % 1000 AS DOUBLE) / CAST(1000 AS DOUBLE)"),
)

LINEITEM_KEYS = ("l_orderkey", "l_linenumber")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table: ``{sf_dir}/{name}.parquet``.

    The engine-wide contract is ``events.ts`` = BIGINT epoch
    nanoseconds (exact integer bucketing/comparison everywhere, no
    timezone semantics in the hot path).  The physical column has
    shipped as both TIMESTAMP(NANOS) (Spark reads it as i64 nanos only
    under the legacy nanos-as-long flag) and TIMESTAMP(MICROS); accept
    either and normalize to the contract here, at the single read
    boundary.  Timestamps are wall-clock UTC on both engines (the
    DuckDB oracle's ``epoch_ns`` treats naive timestamps as UTC;
    Spark's session zone is UTC in this environment), so the
    conversion is a pure unit change.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType,
                                       (T.TimestampType, T.TimestampNTZType)):
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp"))
                   * F.lit(1000)).cast("long"))
    return df


def load_csv(spark: SparkSession, path: str, header: bool = True,
             infer_schema: bool = True, **options) -> DataFrame:
    """CSV source (reference S8 — the notebooks' iris/democracy loaders).
    Column pruning still applies; pair with ``features_from_columns`` to
    build the SOM input."""
    reader = (spark.read.option("header", header)
              .option("inferSchema", infer_schema))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def features_from_columns(df: DataFrame, cols, out="features",
                          keep=()) -> DataFrame:
    """Assemble numeric columns into an ``array<float>`` features column
    (the VectorAssembler analog for our array-typed model input)."""
    arr = F.array(*[F.col(c).cast("float") for c in cols]).alias(out)
    return df.select(*[F.col(k) for k in keep], arr)


def lineitem_features(spark: SparkSession, sf_dir: str, keys=True,
                      dtype="float") -> DataFrame:
    """The canonical SOM input view over lineitem (FIXTURES.md F7).

    Returns ``(l_orderkey, l_linenumber, features array<dtype>)``; the
    feature expressions are pushed into the scan projection, so the
    parquet reader prunes to exactly the referenced columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    feats = F.array(
        *[F.expr(expr).cast(dtype) for _name, expr in LINEITEM_FEATURES]
    ).alias("features")
    cols = [F.col(k) for k in LINEITEM_KEYS] if keys else []
    return li.select(*cols, feats)


def lineitem_features_sql_cte(table="lineitem", extra_cols=()) -> str:
    """DuckDB-side CTE body computing the identical feature columns.
    ``extra_cols`` passes additional source columns through (a join
    back on (l_orderkey, l_linenumber) would fan out — the synthetic
    key is not unique)."""
    exprs = ",\n       ".join(
        f"CAST({expr} AS DOUBLE) AS {name}" for name, expr in LINEITEM_FEATURES
    )
    extra = "".join(f"{c},\n       " for c in extra_cols)
    return (f"SELECT l_orderkey, l_linenumber,\n       {extra}{exprs}\n"
            f"FROM {table}")


def load_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read JSON-Lines — the interchange format of training-data
    pipelines (one document object per line; splittable, so a 100 TB
    directory scans with full parallelism).

    Pass ``schema`` (DDL string or StructType) in production: without it
    Spark runs a full inference pre-pass over the data — double I/O at
    scale, and a silently drifting schema when late files add fields.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        warn("load_jsonl without an explicit schema runs a full "
             "schema-inference pass over the input (double I/O at "
             "scale); pass the DDL for production reads.")
    return reader.json(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — scan-level column pruning + predicate pushdown via
    the native vectorized ORC reader (`spark.sql.orc.impl=native`, the
    default), so filters reach stripe statistics exactly as parquet
    filters reach row groups."""
    return spark.read.orc(path)


def load_text(spark: SparkSession, path: str,
              whole_file: bool = False) -> DataFrame:
    """Raw text source.  Default: one row per line (``value: string``)
    — the splittable shape for line-oriented corpora.  ``whole_file``
    reads one row per FILE (wholetext) for document-per-file layouts;
    non-splittable, so pair it with many small-ish files, not one
    100 GB blob."""
    return spark.read.text(path, wholetext=whole_file)


_AVRO_HINT = (
    "the avro data source needs the spark-avro package "
    "(org.apache.spark:spark-avro_2.13:<spark-version>); add it "
    "via spark.jars.packages — it is not bundled with pip "
    "pyspark and is unavailable in this environment")


def _reraise_if_avro_missing(e: Exception) -> None:
    """Avro ships as Spark's EXTERNAL spark-avro module (not bundled in
    the pip distribution); translate the resolver's failure into an
    actionable ImportError, pass every other failure through."""
    if "Failed to find data source: avro" in str(e):
        raise ImportError(_AVRO_HINT) from e


def load_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source (row-oriented interchange format — the common
    Kafka-ecosystem landing layout).  Column pruning applies; block
    compression makes splits parallelizable like parquet's row
    groups.  Gated on the external spark-avro module."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        _reraise_if_avro_missing(e)
        raise
