"""Driver-twin gate dry run: first-N queries() vs oracle_sql() at a given SF.

Mimics the driver's CORRECTNESS check: row count, sorted column names,
and an order-insensitive value hash over rounded values.
"""
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

import __spark_entry__ as entrymod
from xpysom_dask_spark.session import make_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
START = int(sys.argv[3]) if len(sys.argv) > 3 else 0

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ms = sorted(repr(tuple(_norm(r[i]) for i in order)) for r in rows)
    h = hashlib.sha256()
    for r in ms:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


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
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                results[name] = {"rows": len(srows), "oracle": "none",
                                 "sec": round(time.time() - t0, 2)}
                print(name, results[name], flush=True)
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rows_match = len(srows) == len(drows)
            schema_match = sorted(scols) == sorted(dcols)
            hash_match = (_hash(scols, [tuple(r) for r in srows])
                          == _hash(dcols, drows)) if rows_match and schema_match else False
            results[name] = {"rows_match": rows_match,
                             "schema_match": schema_match,
                             "hash_match": hash_match,
                             "spark_rows": len(srows),
                             "oracle_rows": len(drows),
                             "sec": round(time.time() - t0, 2)}
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
