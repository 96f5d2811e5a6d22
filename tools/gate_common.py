"""Shared driver-twin canonicalization for gate_twin / gate_pick.

Goes through pandas on BOTH sides (Spark ``toPandas()``, DuckDB
``fetchdf()``) exactly like the grading driver.  The r5 ``shard_layout``
red row slipped past the previous ``fetchall()``-based twin because
DuckDB's Python API converts HUGEINT to int (hiding it) while
``fetchdf()`` converts it to float64 — which hashes differently from
Spark's int64.
"""
import hashlib
import math

import pandas as pd


def norm(v):
    # numpy scalar -> native Python, PRESERVING int-vs-float: a HUGEINT
    # column arrives from fetchdf() as float64 and must hash differently
    # from an int64 (repr "5.0" vs "5"), matching the driver.
    if hasattr(v, "item"):
        v = v.item()
    if v is None:
        return "nan"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    try:
        if pd.isna(v):
            return "nan"
    except (TypeError, ValueError):
        pass
    return v


def value_hash(pdf):
    cols = sorted(pdf.columns)
    ms = sorted(repr(tuple(norm(v) for v in row))
                for row in pdf[cols].itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in ms:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def compare(spark_df, con, oracle_sql):
    """Run both sides and return the driver-shaped result dict."""
    spdf = spark_df.toPandas()
    dpdf = con.execute(oracle_sql).fetchdf()
    rows_match = len(spdf) == len(dpdf)
    schema_match = sorted(spdf.columns) == sorted(dpdf.columns)
    hash_match = (value_hash(spdf) == value_hash(dpdf)) \
        if rows_match and schema_match else False
    return {"rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(spdf),
            "oracle_rows": len(dpdf)}
