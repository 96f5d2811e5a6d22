"""Driver-twin check for NAMED queries: gate_twin's compare over an
explicit query list instead of a head slice.

Usage: python tools/gate_pick.py [--sf DIR] name [name ...]
       python tools/gate_pick.py [--sf DIR] --staged
Also resolves names staged in queries_round{N}_staged(); ``--staged``
expands to EVERY staged entry (the one-command promotion pre-check
before a round's gate rotation).
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

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    staged_only = args == ["--staged"]
    names = [] if staged_only else args
    spark = make_session("gate-pick")
    queries = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql(ivf_sf_dir=sf_dir))
    for rn in range(5, 30):
        qf = getattr(entrymod, f"queries_round{rn}_staged", None)
        of = getattr(entrymod, f"oracle_sql_round{rn}_staged", None)
        if qf:
            for k, v in qf().items():
                queries.setdefault(k, v)
                if staged_only:
                    names.append(k)
        if of:
            try:
                staged_oracles = of(sf_dir)
            except TypeError:
                staged_oracles = of()
            for k, v in staged_oracles.items():
                oracles.setdefault(k, v)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            if name not in oracles:
                results[name] = {"rows": sdf.count(), "oracle": "none",
                                 "sec": round(time.time() - t0, 2)}
                print(name, results[name], flush=True)
                continue
            results[name] = compare(sdf, con, oracles[name])
            results[name]["sec"] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:400],
                             "sec": round(time.time() - t0, 2)}
        print(name, results[name], flush=True)

    bad = {k: v for k, v in results.items()
           if v.get("err") or not v.get("hash_match",
                                        v.get("rows") is not None)}
    print("===SUMMARY===")
    print(json.dumps({"checked": len(results), "bad": list(bad)},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
