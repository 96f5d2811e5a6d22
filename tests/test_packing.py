"""Unit tests for token-budget sequence packing and the corpus report."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark.operators import packing
from xpysom_dask_spark.operators import text as T


@pytest.fixture(scope="module")
def toy_docs(spark):
    rng = np.random.RandomState(2)
    rows = [(i, int(rng.randint(10, 400))) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")


def test_pack_offsets_are_group_cumsums(spark, toy_docs):
    out = packing.pack_sequences(toy_docs, "doc_id", "n_tok",
                                 budget=512, n_groups=4, seed=1).toPandas()
    assert len(out) == 1000
    for g, grp in out.groupby("group"):
        grp = grp.sort_values("doc_id")
        expect = grp["n_tok"].cumsum() - grp["n_tok"]
        assert (grp["start_offset"].to_numpy()
                == expect.to_numpy()).all(), f"group {g}"
        # pack assignment = chunk where the doc starts
        assert (grp["pack_id"].to_numpy()
                == g * (1 << 40) + grp["start_offset"].to_numpy()
                // 512).all()


def test_pack_layout_independent(spark, toy_docs):
    a = packing.pack_sequences(toy_docs, "doc_id", "n_tok",
                               budget=256, n_groups=8).toPandas()
    b = packing.pack_sequences(toy_docs.repartition(13), "doc_id", "n_tok",
                               budget=256, n_groups=8).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_stats_conserves_tokens(spark, toy_docs):
    out = packing.pack_sequences(toy_docs, "doc_id", "n_tok",
                                 budget=512, n_groups=4)
    stats = packing.pack_stats(out, "n_tok")
    total = stats.agg(F.sum("n_tokens"), F.sum("n_docs")).collect()[0]
    expect = toy_docs.agg(F.sum("n_tok")).collect()[0][0]
    assert total[0] == expect and total[1] == 1000
    # every pack's fill is bounded by budget + one straddling doc
    mx = stats.agg(F.max("n_tokens")).collect()[0][0]
    assert mx < 512 + 400  # budget + max doc length


def test_pack_validation(spark, toy_docs):
    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(toy_docs, "doc_id", "n_tok", budget=0)
    with pytest.raises(ValueError, match="n_groups"):
        packing.pack_sequences(toy_docs, "doc_id", "n_tok", budget=10,
                               n_groups=-1)


def test_corpus_report_matches_pandas(spark):
    rows = [(i, "word " * (10 + i % 40) + ("!" if i % 3 else ""),
             "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                               "lang string")
    rep = T.corpus_report(df, "text", ("lang",), exact_quantiles=True) \
        .toPandas().set_index("lang")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["len"] = pdf["text"].str.len().astype(float)
    pdf["ntok"] = pdf["text"].str.split().map(len)
    for lang, grp in pdf.groupby("lang"):
        assert rep.loc[lang, "n_docs"] == len(grp)
        assert rep.loc[lang, "n_tokens"] == grp["ntok"].sum()
        assert abs(rep.loc[lang, "p50_chars"]
                   - np.percentile(grp["len"], 50)) < 1e-6
        assert abs(rep.loc[lang, "p90_chars"]
                   - np.percentile(grp["len"], 90)) < 1e-6


def test_corpus_report_approx_close_to_exact(spark):
    rows = [(i, "tok " * (5 + i % 90), "en") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                               "lang string")
    exact = T.corpus_report(df, "text", ("lang",),
                            exact_quantiles=True).collect()[0]
    approx = T.corpus_report(df, "text", ("lang",),
                             exact_quantiles=False).collect()[0]
    assert approx.n_docs == exact.n_docs
    assert abs(approx.p50_chars - exact.p50_chars) / exact.p50_chars < 0.05
    assert abs(approx.p90_chars - exact.p90_chars) / exact.p90_chars < 0.05


def test_top_terms_tfidf_matches_pandas(spark):
    import math

    rows = [(1, "apple banana apple", "a"),
            (2, "banana cherry banana", "a"),
            (3, "apple apple apple date", "b"),
            (4, "cherry date cherry", "b")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                               "grp string")
    out = T.top_terms_tfidf(df, "text", "grp", "doc_id", k=2,
                            min_df=2).collect()
    got = {(r.grp, r.rank): (r.term, r.tf, r.df_docs, round(r.score, 9))
           for r in out}
    # df: apple 2 docs, banana 2, cherry 2, date 2; N=4 → idf = ln(2)
    ln2 = math.log(4 / 2)
    assert got[("a", 1)] == ("banana", 3, 2, round(3 * ln2, 9))
    assert got[("a", 2)] == ("apple", 2, 2, round(2 * ln2, 9))
    assert got[("b", 1)] == ("apple", 3, 2, round(3 * ln2, 9))
    assert got[("b", 2)] == ("cherry", 2, 2, round(2 * ln2, 9))


def test_cosine_topk_query_bound_enforced(spark):
    from xpysom_dask_spark.operators import similarity

    emb = (spark.range(50).withColumnRenamed("id", "vec_id")
           .withColumn("embedding",
                       F.array(*[F.rand(seed=i) for i in range(4)])))
    with pytest.raises(ValueError, match="som_ivf_topk"):
        similarity.cosine_topk(emb, emb, k=2, max_queries=10)


def test_gopher_flags_match_python(spark):
    def alpha_word(i):
        return "word" + "".join(chr(97 + int(d)) for d in str(i))

    rows = [
        (1, "short doc"),                                     # too few words
        (2, " ".join(alpha_word(i) for i in range(60))),      # passes
        (3, " ".join(["dup dup"] * 40)),                      # repetitive
        (4, " ".join(["9182736450"] * 60)),                   # low alpha
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in
           T.gopher_quality_flags(df, "text").collect()}
    assert got[1].passes_gopher is False and got[1].n_words == 2
    assert got[2].passes_gopher is True
    assert got[3].passes_gopher is False          # bigram repetition
    assert got[3].bigram_repetition > 0.9
    assert got[4].passes_gopher is False          # alpha ratio
    # spot-check mean word length and alpha ratio vs python
    text2 = rows[1][1]
    toks = text2.split()
    assert abs(got[2].mean_word_len
               - sum(map(len, toks)) / len(toks)) < 1e-9
    assert abs(got[2].alpha_ratio
               - sum(c.isalpha() for c in text2) / len(text2)) < 1e-9


def test_repetition_signals_gopher_family(spark):
    """Hand-computable repetition report: top-n-gram share, duplicated
    n-gram share, and duplicate-line fractions (the Gopher §A1.1
    signals gopher_quality_flags' narrow expressions can't reach)."""
    from xpysom_dask_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "the cat sat on the cat mat okay"),
         (2, "all unique words here now folks"),
         (3, "x\ny\nx\nzz")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in T.repetition_signals(
        df, "text", "doc_id", top_ns=(2,), dup_ns=(2,)).collect()}

    # doc 1: joined len 31; "the cat" appears 2x (len 7) and is the
    # lexicographic-min among count-2 grams → top share 14/31; dup
    # grams = all with count >= 2 = just "the cat" → same mass
    assert abs(out[1]["top2gram_share"] - 14 / 31) < 1e-12
    assert abs(out[1]["dup2gram_share"] - 14 / 31) < 1e-12
    assert out[1]["dup_line_frac"] == 0.0

    # doc 2: all 2-grams unique -> top share = 1*len/loined, dup 0
    assert out[2]["dup2gram_share"] == 0.0
    assert out[2]["dup_line_frac"] == 0.0

    # doc 3: 4 lines, 'x' twice -> dup_line_frac 2/4; line chars
    # total 1+1+1+2 = 5, duplicated chars 2 -> 0.4
    assert abs(out[3]["dup_line_frac"] - 0.5) < 1e-12
    assert abs(out[3]["dup_line_char_frac"] - 0.4) < 1e-12

    # degenerate self-overlap exceeds 1.0 by design (no clamp)
    deg = spark.createDataFrame([(9, "a a a a")],
                                "doc_id bigint, text string")
    r = T.repetition_signals(deg, "text", "doc_id",
                             top_ns=(2,), dup_ns=(2,)).collect()[0]
    assert r["top2gram_share"] > 1.0


def test_pack_bins_next_fit_never_straddles(spark):
    from xpysom_dask_spark.operators.packing import pack_bins_next_fit

    rows = [(i, 300 + (i * 137) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    out = pack_bins_next_fit(df, "doc_id", "n_tok", budget=1024,
                             n_groups=4).collect()
    assert len(out) == 200
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for rs in by_bin.values():
        tot = sum(r["n_tok"] for r in rs)
        if not any(r["oversize"] for r in rs):
            assert tot <= 1024                 # no bin over budget
        assert max(r["bin_fill"] for r in rs) == tot


def test_pack_bins_next_fit_local_replica(spark):
    """Exact next-fit decisions in id order per group."""
    from xpysom_dask_spark.operators.packing import pack_bins_next_fit

    rows = [(i, [700, 400, 300, 1200, 100, 900][i % 6]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    out = {r["doc_id"]: r for r in pack_bins_next_fit(
        df, "doc_id", "n_tok", budget=1024, n_groups=3,
        seed=1).collect()}
    groups = {}
    for i, t in rows:
        groups.setdefault(out[i]["group"], []).append((i, t))
    for g, docs in groups.items():
        b, fill, first = 0, 0, True
        for i, t in sorted(docs):
            if first:
                fill, first = t, False
            elif fill + t <= 1024:
                fill += t
            else:
                b, fill = b + 1, t
            assert out[i]["bin_id"] == g * (1 << 40) + b, i
            assert out[i]["bin_fill"] == fill, i
            assert out[i]["oversize"] == (t > 1024)


def test_pack_bins_validation(spark):
    from xpysom_dask_spark.operators.packing import pack_bins_next_fit

    df = spark.createDataFrame([(1, 5)], "doc_id bigint, n_tok bigint")
    import pytest as _pt
    with _pt.raises(ValueError, match="budget"):
        pack_bins_next_fit(df, "doc_id", "n_tok", budget=0)
    with _pt.raises(ValueError, match="n_groups"):
        pack_bins_next_fit(df, "doc_id", "n_tok", budget=10, n_groups=0)


def test_pack_bins_ffd_tighter_than_next_fit(spark):
    """FFD must use no more bins than next-fit on the same corpus, obey
    the budget, and assign every doc exactly once."""
    from xpysom_dask_spark.operators.packing import (pack_bins_ffd,
                                                     pack_bins_next_fit)

    rows = [(i, 100 + (i * 211) % 700) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    nf = pack_bins_next_fit(df, "doc_id", "n_tok", budget=1024,
                            n_groups=4).collect()
    ffd = pack_bins_ffd(df, "doc_id", "n_tok", budget=1024,
                        n_groups=4).collect()
    assert sorted(r["doc_id"] for r in ffd) == list(range(300))
    n_bins_nf = len({r["bin_id"] for r in nf})
    n_bins_ffd = len({r["bin_id"] for r in ffd})
    assert n_bins_ffd <= n_bins_nf
    by_bin = {}
    for r in ffd:
        by_bin.setdefault(r["bin_id"], 0)
        by_bin[r["bin_id"]] += r["n_tok"]
    assert all(v <= 1024 for v in by_bin.values())


def test_pack_bins_ffd_local_replica(spark):
    """Exact FFD decisions: sort (n_tok desc, id), first-fit over open
    bins in creation order."""
    from xpysom_dask_spark.operators.packing import pack_bins_ffd

    rows = [(i, [600, 500, 400, 300, 200, 100][i % 6])
            for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    out = {r["doc_id"]: r for r in pack_bins_ffd(
        df, "doc_id", "n_tok", budget=1000, n_groups=2,
        seed=3).collect()}
    groups = {}
    for i, t in rows:
        groups.setdefault(out[i]["group"], []).append((i, t))
    for g, docs in groups.items():
        fills = []
        for i, t in sorted(docs, key=lambda x: (-x[1], x[0])):
            placed = None
            for bi, f0 in enumerate(fills):
                if f0 + t <= 1000:
                    placed = bi
                    break
            if placed is None:
                fills.append(t)
                placed = len(fills) - 1
            else:
                fills[placed] += t
            assert out[i]["bin_id"] == g * (1 << 40) + placed, i
            assert out[i]["bin_fill"] == fills[placed], i
