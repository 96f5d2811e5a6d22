#!/usr/bin/env python
"""Round-5 curation additions, end to end: span-level test-set
decontamination (excise the leaked windows, keep the doc), corpus-wide
boilerplate line removal, and the decision-preserving MinHash-index
compaction that keeps the incremental near-dup index at survivors-only
size.  Every stage is a declarative Spark plan: the train corpus never
keys a shuffle on text in any of them.

Run:  python examples/curation_round5.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import dedup, sampling  # noqa: E402
from xpysom_dask_spark.sources import readers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("curation-round5-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = readers.load_table(spark, sf_dir, "documents")
    split = sampling.split_by_hash(docs, "doc_id",
                                   {"train": 0.9, "test": 0.1}, seed=1)
    train = split.where("split = 'train'").drop("split")
    test = split.where("split = 'test'").drop("split")

    # 1. span-level decontamination: excise every train token span
    # matching a test 5-gram instead of dropping the whole document —
    # compare the token cost of the two policies
    spans = dedup.decontaminate_spans(train, test, "text", "doc_id",
                                      n=5)
    span_stats = spans.agg(
        F.sum("n_removed").alias("tokens_excised"),
        F.sum((F.col("n_removed") > 0).cast("int"))
        .alias("docs_touched")).first()
    whole = dedup.decontaminate(train, test, "text", "doc_id", n=5)
    n_train = train.count()
    print(f"decontamination: whole-doc policy drops "
          f"{n_train - whole.count()} of {n_train} docs; span policy "
          f"keeps all docs and excises {span_stats['tokens_excised']} "
          f"tokens across {span_stats['docs_touched']} docs")

    # 2. corpus-wide boilerplate line removal (doc-frequency >= 2)
    cleaned = dedup.dedup_lines(spans, "text", "doc_id", min_df=2)
    line_stats = cleaned.agg(
        F.sum("n_lines_removed").alias("lines_removed")).first()
    print(f"boilerplate lines removed corpus-wide: "
          f"{line_stats['lines_removed']}")

    # 3. incremental near-dup ingest + index compaction: admit two
    # batches, then vacuum the signature index to survivors-only size
    half = docs.where("doc_id % 2 = 0")
    rest = docs.where("doc_id % 2 = 1")
    b1, idx1 = dedup.near_dedup_incremental(half, "text", "doc_id",
                                            threshold=0.5)
    b2, idx2 = dedup.near_dedup_incremental(rest, "text", "doc_id",
                                            idx1, threshold=0.5)
    before = idx2.count()
    compacted = dedup.compact_minhash_index(idx2)
    after = compacted.count()
    print(f"near-dup index: batch1 kept {b1.count()}, batch2 kept "
          f"{b2.count()}; index {before} -> {after} rows after "
          f"compaction (identical future decisions)")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
