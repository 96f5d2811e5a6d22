"""Driver-twin gate dry run: first-N queries() vs oracle_sql() at a given SF.

Mimics the driver's CORRECTNESS check: row count, sorted column names,
and an order-insensitive value hash over rounded values.

Canonicalization goes through pandas on BOTH sides (Spark `toPandas()`,
DuckDB `fetchdf()`) exactly like the driver.  The r5 `shard_layout` red
row slipped past the previous `fetchall()`-based twin because DuckDB's
Python API converts HUGEINT to int (hiding it), while `fetchdf()`
converts it to float64 — which hashes differently from Spark's int64.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

import __spark_entry__ as entrymod
from tools.gate_common import compare
from xpysom_dask_spark.session import make_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
START = int(sys.argv[3]) if len(sys.argv) > 3 else 0

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main():
    spark = make_session("gate-twin")
    oracles = entrymod.oracle_sql(ivf_sf_dir=SF_DIR)
    queries = entrymod.queries()
    names = list(queries)[START:START + N]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    results = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            if name not in oracles:
                results[name] = {"rows": sdf.count(), "oracle": "none",
                                 "sec": round(time.time() - t0, 2)}
                print(name, results[name], flush=True)
                continue
            results[name] = compare(sdf, con, oracles[name])
            results[name]["sec"] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300],
                             "sec": round(time.time() - t0, 2)}
        print(name, results[name], flush=True)

    bad = {k: v for k, v in results.items()
           if v.get("err") or not v.get("hash_match", v.get("rows") is not None)}
    print("===SUMMARY===")
    print(json.dumps({"checked": len(results), "bad": bad}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
