#!/usr/bin/env python
"""Exact-substring dedup tour, round 12: from the one-shuffle
production path to the suffix-array instrument.

ExactSubstr (Lee et al., "Deduplicating Training Data Makes Language
Models Better") removes every substring of length >= L that occurs
twice anywhere in the corpus.  This engine ships the guarantee twice,
for two different jobs:

1. the WINDOWED pair — ``repeated_substring_spans`` (analysis: where
   is the duplicated content) and ``dedup_substrings_chars`` (the
   rewrite: byte-exact excision).  ONE window-shuffle over the
   corpus; this is the 100 TB production path;
2. the SUFFIX-ARRAY instrument — ``suffix_array_ranks`` (generalized
   suffix array by distributed prefix doubling), ``suffix_maxrep``
   (longest repeated prefix per position), ``repeated_substring_
   spans_sa`` (the SAME coverage derived independently — the doubling
   is paid once, then every L is a filter), and
   ``longest_repeated_substring`` (the all-lengths question: what is
   THE most-duplicated run, with no L to choose).

The two paths share no code and no formulation; their spans agreeing
byte-for-byte (step 4) is the strongest correctness statement either
can make.

Run:  python examples/exact_substring_round12.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators.dedup import (  # noqa: E402
    dedup_substrings_chars, longest_repeated_substring,
    repeated_substring_spans, repeated_substring_spans_sa,
    suffix_maxrep)
from xpysom_dask_spark.sources.readers import load_table  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001"
    spark = make_session("exact-substring-round12")
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    L = 40

    print(f"== 1. duplicated spans at L={L} (windowed production path)")
    spans = repeated_substring_spans(docs, "text", "doc_id",
                                     min_len=L, verify=False)
    spans.orderBy(F.col("length").desc()).show(5, truncate=False)

    print("== 2. the rewrite twin: byte-exact excision")
    cleaned = dedup_substrings_chars(docs, "text", "doc_id", min_len=L)
    cleaned.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("chars_in"),
        F.sum("n_removed").alias("chars_excised")).show()

    # the suffix-array instrument is round-dominated, not
    # data-dominated — a corpus slice keeps the tour brisk
    part = docs.where(F.col("doc_id") % 10 == 0)
    print("== 3. the all-lengths question: longest repeated substring")
    lrs = longest_repeated_substring(part, "text", "doc_id").collect()
    if lrs:
        r = lrs[0]
        print(f"   length={r['length']} at doc {r['id']} p={r['p']}: "
              f"{r['substring'][:60]!r}...")
    else:
        print("   corpus slice has no repeated substring")

    print("== 4. two-path parity: suffix-array spans == windowed spans")
    sa = repeated_substring_spans_sa(part, "text", "doc_id", min_len=L)
    win = repeated_substring_spans(part, "text", "doc_id", min_len=L) \
        .select("id", "start", "length")
    n_sa, n_win = sa.count(), win.count()
    n_both = sa.intersect(win).count()
    print(f"   suffix-array spans: {n_sa}  windowed spans: {n_win}  "
          f"identical: {n_both}")
    assert n_sa == n_win == n_both, "two-path parity violated"

    print("== 5. maxrep profile (how duplicated is each position?)")
    suffix_maxrep(part, "text", "doc_id").agg(
        F.count(F.lit(1)).alias("positions"),
        F.sum(F.when(F.col("maxrep") >= L, 1).otherwise(0))
        .alias(f"covered_at_L{L}"),
        F.max("maxrep").alias("max"),
        F.expr("percentile_approx(maxrep, 0.5)").alias("median")).show()

    print("done.")
    spark.stop()


if __name__ == "__main__":
    main()
