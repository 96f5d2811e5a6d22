"""Streaming test-set decontamination — drop contaminated docs ON ARRIVAL.

The batch rule (operators.dedup.decontaminate, the GPT-3 n-gram rule)
re-scans the train corpus; an ingest stream wants the same decision per
arriving micro-batch without any stream-side state.  The design:

* the TEST side is small by premise, so its distinct n-gram hash set
  (the same 48-bit md5 fold as every batch dedup operator) collects
  once to the driver — a bounded ``max_test_ngrams``-guarded int64
  array (8 B per distinct n-gram) — and broadcasts;
* each arriving doc carries its shingle-hash ARRAY computed by the
  JVM-codegen'd ``transform`` expression (md5 + conv per shingle — no
  Python hashing, no explode, one row per doc);
* a stateless Arrow kernel flattens the batch's arrays and marks docs
  via one vectorized ``np.isin`` against the sorted test set.

No watermark, no state store, no streaming aggregation: the decision is
a map-side pure function of (doc, static test set), so the operator
works identically on a batch DataFrame and a stream, and scales with
partitions.  Refreshing the test set = restart with a new broadcast
(test sets change at eval-release cadence, not per batch).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bound on the broadcast test-set size: 5M distinct n-grams = 40 MB
DEFAULT_MAX_TEST_NGRAMS = 5_000_000

_TOKS = "filter(split(lower({col}), '\\\\s+'), x -> x != '')"


def eval_ngram_hashes(test_df: DataFrame, text_col: str, id_col: str,
                      n: int = 5,
                      max_test_ngrams: int = DEFAULT_MAX_TEST_NGRAMS
                      ) -> np.ndarray:
    """Distinct 48-bit n-gram hashes of the test set, as a sorted int64
    array ready to broadcast — ONE bounded driver collect (the test set
    is small relative to train by decontamination's premise; the bound
    is enforced, not assumed)."""
    from ..operators.dedup import _HASH48_EXPR, word_shingles

    h = (word_shingles(test_df, text_col, id_col, n, distinct=False)
         .select(F.expr(_HASH48_EXPR).alias("h")).distinct())
    rows = h.limit(max_test_ngrams + 1).collect()
    if len(rows) > max_test_ngrams:
        raise ValueError(
            f"eval_ngram_hashes: > {max_test_ngrams} distinct test "
            f"n-grams; the set is broadcast to every task (8 B each). "
            "Raise max_test_ngrams if executors have the memory, or "
            "use batch bloom_decontaminate for huge test sets.")
    return np.sort(np.array([r["h"] for r in rows], dtype=np.int64))


def decontaminate_stream(df: DataFrame, text_col: str, id_col: str,
                         test_hashes: np.ndarray, n: int = 5,
                         flag_col: str | None = None) -> DataFrame:
    """Filter (or, with ``flag_col``, annotate) a batch/streaming doc
    DataFrame against a precomputed :func:`eval_ngram_hashes` array:
    a doc sharing ≥ 1 word n-gram with the test set is contaminated —
    the batch `decontaminate` rule, stateless per micro-batch.
    """
    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(test_hashes, dtype=np.int64))

    out_cols = df.columns + ([flag_col] if flag_col else [])
    hashed = df.withColumn(
        "__sh", F.expr(_shingle_hash_array_inline(text_col, n)))

    schema = hashed.schema
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in schema.fields if f.name != "__sh")
    out_schema = fields + ", __contaminated boolean"

    def fn(batches):
        ts = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["__sh"]]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                               count=len(arrs))
            flat = (np.concatenate(arrs) if lens.sum()
                    else np.empty(0, np.int64))
            hit = (np.isin(flat, ts, assume_unique=False)
                   if len(flat) else np.empty(0, bool))
            starts = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            # per-doc ANY over the flattened mask; empty docs → False
            doc_hit = np.zeros(len(arrs), dtype=bool)
            nz = lens > 0
            if nz.any():
                # reduceat over the nonempty spans only: their start
                # offsets are strictly increasing (empty docs add no
                # flat entries), which reduceat requires
                doc_hit[nz] = np.maximum.reduceat(hit, starts[nz])
            res = pdf.drop(columns=["__sh"]).copy()
            res["__contaminated"] = doc_hit
            yield res

    out = hashed.mapInPandas(fn, out_schema)
    if flag_col:
        return out.withColumnRenamed("__contaminated", flag_col) \
            .select(*out_cols)
    return out.where(~F.col("__contaminated")) \
        .drop("__contaminated").select(*df.columns)


def _shingle_hash_array_inline(col: str, n: int) -> str:
    """Codegen expr: doc text → array of 48-bit-fold shingle hashes
    (same tokenization and md5 fold as operators.dedup.word_shingles +
    _HASH48_EXPR, so stream and batch decisions agree).  The token
    array is bound through a single-element transform so it is computed
    once per row, not once per shingle position (the O(tokens²) trap
    word_shingles documents); a scalar subquery would do the same but
    is not stream-safe."""
    gram = "concat_ws(' ', " + ", ".join(
        f"element_at(t, i + {j})" for j in range(n)) + ")"
    toks = _TOKS.format(col=col)
    inner = (f"transform(sequence(1, size(t) - {n - 1}), "
             f"i -> CAST(conv(substring(md5({gram}), 1, 12), 16, 10) "
             f"AS BIGINT))")
    return (f"flatten(transform(array({toks}), t -> "
            f"CASE WHEN size(t) < {n} THEN CAST(array() AS ARRAY<BIGINT>) "
            f"ELSE {inner} END))")
