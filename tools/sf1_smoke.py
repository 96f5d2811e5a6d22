"""sf1 smoke tier: 6M-row scale probe for the heaviest per-family ops.

All driver correctness evidence runs at sf0.01 and the bench at sf0.1;
this closes the last extrapolation gap (VERDICT r06 #9) with one
measured point at ~sf1: a synthetic tier built from sf0.1 by 10×-
replicating the FACT tables (lineitem 600k→6M, orders 150k→1.5M,
events 100k→1M, documents 5k→50k, embeddings 2k→20k) while keeping the
dimension tables at 1× — exactly how a real warehouse scales.

Replication is semantics-aware (the round-6 lesson, BASELINE.md):

* lineitem/orders: per-copy key OFFSET on the order key keeps the
  orders↔lineitem join 1:N and fans every copy onto the SAME 1× dims —
  join selectivities scale the way a bigger TPC-H SF does.
* documents: a per-copy SUFFIX appended to every word — a bijective
  token rename, so each copy's internal shingle/similarity structure
  is IDENTICAL to the 1× corpus while copies share nothing.  (Verbatim
  copies are adversarial by SEMANTICS for near-dup ops: k copies →
  ~k² true pairs.  A salt token INTERLEAVED between words — the first
  attempt — is adversarial the other way: `salt word salt` 3-gram
  shingles overlap for ANY two docs sharing one word, which inflated
  within-copy Jaccard and blew the LSH candidate set to 10.6M pairs.
  Renaming is the only replication that preserves near-dup workload
  shape.)
* embeddings: per-copy deterministic N(0, 0.01) jitter (identical
  vectors degenerate cosine top-k into tie-breaking).
* events: event_id offset, everything else verbatim (10× arrival
  density per user — the realistic ingest-growth axis).

Usage:
    python tools/sf1_smoke.py [--gen-only|--run-only] [--dir DIR]
                              [--all | --ops name,name,...]

Prints one markdown row per op (min of 2 warm runs after a cold run,
16g heap, local[32]) and a final JSON line; paste the table into
BASELINE.md's sf1 section.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
DEFAULT_DIR = "/tmp/sf1"
COPIES = 10
DIMS = ("region", "nation", "customer", "supplier", "part")

# the heaviest gated op per family (queries() keys), SOM train added
# separately — families per VERDICT r06: TPC-H joins, dedup/near-dup,
# text, events/profile, ANN/serving, packing, SOM
OPS = (
    "tpch_q21", "tpch_q8", "tpch_q17",            # join-heavy TPC-H
    "dedup_minhash", "dedup_keep_best", "fuzzy_join",   # dedup family
    "text_novelty", "text_quality",               # text family
    "events_ks_drift", "session_paths",           # events family
    "knn_graph", "ivfpq_topk",                    # ANN/serving family
    "pack_sequences",                             # packing family
    # round-8 additions: the r7-promoted family's blind spot (VERDICT
    # r7 #6) + the op whose O(segments²) guard landed this round
    "lsh_recall_audit", "graph_triangles", "text_tfidf",
    "dedup_containment", "dedup_paragraphs", "bm25_topk",
)


def gen(out_dir: str) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SF01}/{t}.parquet", f"{out_dir}/{t}.parquet")

    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() // 2)}")

    def rep(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{table}.parquet' "
            f"(FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM "
                        f"read_parquet('{out_dir}/{table}.parquet')"
                        ).fetchone()[0]
        print(f"  {table}: {n} rows", flush=True)

    koff = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM "
        f"read_parquet('{SF01}/orders.parquet')").fetchone()[0]
    rep(f"""
        SELECT o_orderkey + c.i * {koff} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SF01}/orders.parquet'),
             range({COPIES}) c(i)""", "orders")
    rep(f"""
        SELECT l_orderkey + c.i * {koff} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SF01}/lineitem.parquet'),
             range({COPIES}) c(i)""", "lineitem")

    eoff = con.execute(
        f"SELECT MAX(event_id) + 1 FROM "
        f"read_parquet('{SF01}/events.parquet')").fetchone()[0]
    rep(f"""
        SELECT event_id + c.i * {eoff} AS event_id, ts, user_id,
               event_type, value, props
        FROM read_parquet('{SF01}/events.parquet'),
             range({COPIES}) c(i)""", "events")

    doff = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM "
        f"read_parquet('{SF01}/documents.parquet')").fetchone()[0]
    # per-copy suffix on every word (bijective rename; copy 0 included
    # so all copies are comparable — the renamed-1× convention)
    rep(f"""
        SELECT doc_id + c.i * {doff} AS doc_id,
               replace(text, ' ', 'q' || c.i || ' ') || 'q' || c.i
                 AS text,
               lang, source,
               CAST(length(replace(text, ' ', 'q' || c.i || ' ')) + 2
                    AS BIGINT) AS n_chars
        FROM read_parquet('{SF01}/documents.parquet'),
             range({COPIES}) c(i)""", "documents")
    con.close()

    # embeddings: numpy jitter (deterministic per copy), float32 lists
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF01}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    X = np.stack([np.asarray(v, np.float32)
                  for v in t.column("embedding").to_pylist()])
    voff = int(vec_ids.max()) + 1
    out_ids, out_vecs, out_lab = [], [], []
    for c in range(COPIES):
        rng = np.random.RandomState(1000 + c)
        jit = (X + (rng.standard_normal(X.shape) * 0.01 if c else 0.0)
               ).astype(np.float32)
        out_ids.append(vec_ids + c * voff)
        out_vecs.append(jit)
        out_lab.append(labels)
    allv = np.concatenate(out_vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
        "embedding": pa.array(list(allv), pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(out_lab), pa.int32()),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")
    print(f"  embeddings: {len(tbl)} rows", flush=True)


def run(sf_dir: str, sweep_all: bool = False,
        only_ops: tuple | None = None) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("sf1-smoke")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     "20000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from xpysom_dask_spark import SparkSom
    from xpysom_dask_spark.sources import readers

    qmap = dict(entry.queries())
    # staged next-round gates resolve too (the gate_pick convention)
    for rn in range(5, 30):
        qf = getattr(entry, f"queries_round{rn}_staged", None)
        if qf:
            for k, v in qf().items():
                qmap.setdefault(k, v)
    results = {}
    n_reps = 1 if sweep_all else 3

    def timed(name, fn):
        runs = []
        for _ in range(n_reps):
            t0 = time.time()
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — the sweep reports
                results[name] = f"ERR {type(exc).__name__}"
                print(f"| {name} | ERROR {exc} |"[:300], flush=True)
                return
            runs.append(time.time() - t0)
        results[name] = round(min(runs[1:]) if len(runs) > 1
                              else runs[0], 3)
        print(f"| {name} | {results[name]} s | (cold {round(runs[0], 3)}"
              f" s) |", flush=True)

    n = 0
    if only_ops is None:
        # SOM family: the headline 10-epoch train + predict at 6M rows
        feats = readers.lineitem_features(spark, sf_dir, keys=False)
        feats = feats.repartition(cpus).persist()
        n = feats.count()
        print(f"lineitem features: {n} rows", flush=True)
        som = SparkSom(8, 8, 8, random_seed=1, fuse_local_bytes=0)
        timed("som_train_10ep_6M", lambda: som.train(feats, 10))
        timed("som_predict_6M",
              lambda: som.transform(feats, ("cluster_id",))
              .agg(F.sum("cluster_id")).collect())

    # --all: ONE cold pass over EVERY declared query — the quadratic
    # detector (run the same sweep at sf0.1 and at sf1; an op whose
    # ratio lands far above the 10x data growth hides superlinear
    # work, the way the O(len²) substring kernel did)
    for name in (only_ops if only_ops is not None
                 else (qmap if sweep_all else OPS)):
        timed(name, lambda q=qmap[name]: q(spark, sf_dir).count())

    print(json.dumps({"metric": "sf1_sweep" if sweep_all else "sf1_smoke",
                      "unit": "sec", "queries": results,
                      "rows_lineitem": n},
                     separators=(",", ":")), flush=True)
    spark.stop()


def main():
    args = sys.argv[1:]
    out_dir = DEFAULT_DIR
    if "--dir" in args:
        out_dir = args[args.index("--dir") + 1]
    if "--run-only" not in args:
        print(f"generating {out_dir} from {SF01} ({COPIES}x facts)",
              flush=True)
        gen(out_dir)
    if "--gen-only" not in args:
        only = None
        if "--ops" in args:
            only = tuple(args[args.index("--ops") + 1].split(","))
        run(out_dir, sweep_all="--all" in args, only_ops=only)


if __name__ == "__main__":
    main()
