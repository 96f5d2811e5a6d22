"""Round-8 operator-level tests: dedup_paragraphs fast path +
oversize guard (VERDICT r7 items 2-3)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators import dedup


def test_dedup_paragraphs_plain_sep_not_quoted(spark):
    """VERDICT r7 #2: \\Q-quoting a plain separator defeats Spark's
    non-regex literal-split fast path (2.1x measured at sf0.1).  Plain
    seps must reach F.split verbatim; regex-special seps must still be
    quoted (round-7 parity fix preserved)."""
    df = spark.createDataFrame([(1, "a\nb\na")],
                               "doc_id bigint, text string")
    plan = (dedup.dedup_paragraphs(df, "text", "doc_id", sep="\n")
            ._jdf.queryExecution().analyzed().toString())
    assert "\\Q" not in plan, plan
    plan_dot = (dedup.dedup_paragraphs(df, "text", "doc_id", sep=".")
                ._jdf.queryExecution().analyzed().toString())
    assert "\\Q" in plan_dot, plan_dot


def test_dedup_paragraphs_results_unchanged_by_fast_path(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\nx\nx"), (3, ""), (4, "q r q")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           dedup.dedup_paragraphs(df, "text", "doc_id").collect()}
    assert out[1]["text"] == "a\nb\nc" and out[1]["n_paras_removed"] == 2
    assert out[2]["text"] == "x"
    assert out[3]["text"] == ""
    sp = {r["doc_id"]: r for r in
          dedup.dedup_paragraphs(df, "text", "doc_id", sep=" ").collect()}
    assert sp[4]["text"] == "q r" and sp[4]["n_paras_removed"] == 1


def test_dedup_paragraphs_max_segments_guard(spark):
    """VERDICT r7 #3: the O(segments^2) position test needs a bound —
    with max_segments set, an oversized document fails loudly (naming
    its id) instead of burning quadratic CPU; compliant docs pass
    through bit-identically."""
    from pyspark.errors import SparkRuntimeException

    ok = spark.createDataFrame([(7, "a\nb\na")],
                               "doc_id bigint, text string")
    got = dedup.dedup_paragraphs(ok, "text", "doc_id",
                                 max_segments=8).collect()
    assert got[0]["text"] == "a\nb" and got[0]["n_paras_removed"] == 1

    big = spark.createDataFrame(
        [(42, "\n".join(str(i) for i in range(20)))],
        "doc_id bigint, text string")
    with pytest.raises(SparkRuntimeException,
                       match="max_segments=8") as ei:
        dedup.dedup_paragraphs(big, "text", "doc_id",
                               max_segments=8).collect()
    assert "42" in str(ei.value)


def test_default_max_df_warns_once_and_explicit_is_silent(spark):
    """max_df convention (VERDICT r7 #8 / ADVICE r7): a DEFAULT df
    cutoff silently narrowing results is not allowed — first default
    use warns once; explicit max_df (any value, incl. the same 1000)
    is an opt-in and never warns."""
    import warnings

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id bigint, text string")
    dedup._warned_default_prune = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.ngram_jaccard_near_dups(df, "text", "doc_id", 0.5)
        assert len(w) == 1 and "max_df=1000" in str(w[0].message)
        dedup.containment_pairs(df, "text", "doc_id")   # once per proc
        assert len(w) == 1
    dedup._warned_default_prune = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.ngram_jaccard_near_dups(df, "text", "doc_id", 0.5,
                                      max_df=dedup.DEFAULT_MAX_DF)
        dedup.ngram_jaccard_near_dups(df, "text", "doc_id", 0.5,
                                      max_df=None)
        assert len(w) == 0
    dedup._warned_default_prune = False


def test_posting_prune_report_counts(spark):
    """The audit twin of the df cutoff: 'a b' appears in all 3 docs
    (df=3 > max_df=2 -> pruned, 3 postings dropped); every other
    shingle is rarer and kept."""
    df = spark.createDataFrame(
        [(1, "a b x"), (2, "a b y"), (3, "a b z")],
        "doc_id bigint, text string")
    r = dedup.posting_prune_report(df, "text", "doc_id", n=2,
                                   max_df=2).collect()[0]
    # 2-shingles: "a b" (df 3), "b x", "b y", "b z" (df 1 each)
    assert r["n_shingles"] == 4
    assert r["n_pruned_shingles"] == 1
    assert r["n_postings_dropped"] == 3
    assert r["max_observed_df"] == 3


def test_dedup_paragraphs_explode_equals_expression_path(spark):
    """The O(segments) escape hatch must be semantics-identical to the
    narrow expression path — differential over tricky shapes (empty
    doc, all-dup doc, regex-special sep, repeated empties)."""
    rows = [(1, "a\nb\na\nc\nb"), (2, "x\nx\nx"), (3, "solo"),
            (4, ""), (5, "\n\na\n\nb"), (6, "p\nq\np\np\nq")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = {r["doc_id"]: (r["text"], r["n_paras_removed"]) for r in
         dedup.dedup_paragraphs(df, "text", "doc_id").collect()}
    b = {r["doc_id"]: (r["text"], r["n_paras_removed"]) for r in
         dedup.dedup_paragraphs_explode(df, "text", "doc_id")
         .collect()}
    assert a == b
    df2 = spark.createDataFrame([(1, "ab.cd.ab."), (2, "..a..")],
                                "doc_id bigint, text string")
    a2 = {r["doc_id"]: (r["text"], r["n_paras_removed"]) for r in
          dedup.dedup_paragraphs(df2, "text", "doc_id", sep=".")
          .collect()}
    b2 = {r["doc_id"]: (r["text"], r["n_paras_removed"]) for r in
          dedup.dedup_paragraphs_explode(df2, "text", "doc_id",
                                         sep=".").collect()}
    assert a2 == b2
