"""Round-13 operator-level re-timer + plan capture for bench entries
that are NOT declared gates (the bench builds them inline):
exact_substring_spans / exact_substring_excise / dedup_paragraphs /
corpus_report and friends.

Usage:
    python tools/retime_ops_r13.py [--sf DIR] [--plans SUFFIX]
                                   [--rounds N] name [name...]

Builds each entry's DataFrame exactly as bench.py does, times the
bench's own action (cold + min of N-1 warm), and with --plans writes
`.explain('formatted')` to plans/r13/<name>_<SUFFIX>.txt.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv):
    args = list(argv)
    sf = SF
    plans_suffix = None
    rounds = 4
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i:i + 2]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    names = args
    if not names:
        print(__doc__)
        return 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("retime-ops-r13")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     "20000")
             .config("spark.sql.execution.arrow.pyspark.enabled",
                     "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from xpysom_dask_spark.operators import bpe as BPE
    from xpysom_dask_spark.operators import dedup
    from xpysom_dask_spark.operators import text as T
    from xpysom_dask_spark.sources import readers

    docs = readers.load_table(spark, sf, "documents")

    _merges = BPE.learn_bpe(docs, "text", num_merges=30)

    # (builder, action) per bench entry — the bench's own timed action
    entries = {
        "exact_substring_spans": (
            lambda: dedup.repeated_substring_spans(
                docs, "text", "doc_id", min_len=40, verify=False),
            lambda df: df.agg(F.sum("length"),
                              F.sum("n_windows")).collect()),
        "exact_substring_excise": (
            lambda: dedup.dedup_substrings_chars(
                docs, "text", "doc_id", min_len=40, verify=False),
            lambda df: df.agg(F.sum("n_removed"),
                              F.sum(F.length("text_clean"))).collect()),
        "dedup_substrings": (
            lambda: dedup.dedup_substrings(
                docs, "text", "doc_id", min_tokens=20),
            lambda df: df.agg(F.sum("n_removed")).collect()),
        "dedup_paragraphs": (
            lambda: dedup.dedup_paragraphs(
                docs, "text", "doc_id", sep=" "),
            lambda df: df.agg(F.sum("n_paras_removed")).collect()),
        "corpus_report": (
            lambda: T.corpus_report(docs, "text", ("lang",)),
            lambda df: df.collect()),
        "bpe_learn30": (
            lambda: None,
            lambda _df: BPE.learn_bpe(docs, "text", num_merges=30)),
        "bpe_encode": (
            lambda: BPE.bpe_encode(docs, "text", _merges).select(
                F.size("bpe_tokens").alias("n")),
            lambda df: df.agg(F.sum("n")).collect()),
        "text_lang_consistency": (
            lambda: T.language_consistency(docs, "text", "doc_id"),
            lambda df: df.agg(F.sum("n_langs")).collect()),
        "text_novelty": (
            lambda: T.novelty_score(docs, "text", "doc_id"),
            lambda df: df.agg(F.sum("n_unique")).collect()),
    }

    import json
    out = {}
    pdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(pdir, exist_ok=True)
    plans_only = os.environ.get("RETIME_PLANS_ONLY") == "1"
    for name in names:
        build, act = entries[name]
        if not plans_only:
            runs = []
            for _ in range(rounds):
                t0 = time.time()
                act(build())
                runs.append(time.time() - t0)
            out[name] = {"cold": round(runs[0], 3),
                         "warm_min": round(min(runs[1:]), 3)
                         if len(runs) > 1 else None}
            print(f"| {name} | cold {out[name]['cold']} s "
                  f"| warm {out[name]['warm_min']} s |", flush=True)
        if plans_suffix:
            df = build()
            if df is None:
                continue
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(
                    pdir, f"{name}_{plans_suffix}.txt"), "w") as fh:
                fh.write(txt)
    print(json.dumps({"sf": sf, "results": out},
                     separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
