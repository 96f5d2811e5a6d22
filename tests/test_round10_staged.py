"""Round-10 promoted gate queries vs their oracles at sf0.001 — same
comparison as test_oracle_parity, for the 12 entries promoted from the
round-10/11 staging areas into the graded head-50 (SURVEY.md §8)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from conftest import SF_TINY

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# kmv_overlap was merged into the round-12 kmv_report gate (its
# pairwise-Jaccard leg lives on there; the operator keeps its own
# differential tests in test_sketches.py / below)
PROMOTED = ("quantile_hist", "streaming_qhist",
            "dsir_importance", "trigram_backoff", "psi_drift",
            "streaming_hll", "communities_lpa", "wordpiece_vocab",
            "mad_outliers", "kn_bigram_score", "streaming_psi")

STAGED = {k: v for k, v in entrymod.queries().items() if k in PROMOTED}
# SF_TINY: the wordpiece_vocab oracle is data-dependent (the
# reference-learned vocabulary rides inside the SQL), so the tier
# must match the one the queries run against
ORACLES = {k: v for k, v in entrymod.oracle_sql(SF_TINY).items()
           if k in PROMOTED}


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_promoted_queries_head_until_green():
    # the driver checks queries()[:50]; a promoted entry must keep a
    # head slot until it has a fully GREEN archived row (rows AND
    # schema AND hash) — afterwards the rotation may move it out
    import glob

    from tools.rotate_gate import latest_green_rounds

    assert set(ORACLES) == set(STAGED) == set(PROMOTED)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = latest_green_rounds(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    names = list(entrymod.queries())
    for name in PROMOTED:
        if greens.get(name) is None:
            assert names.index(name) < 50, \
                f"{name} has no green row yet but sits outside the head"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_promoted_query_matches_oracle(spark, name):
    sdf = STAGED[name](spark, SF_TINY)
    srows = sdf.collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_TINY}/{t}.parquet')")
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    assert _multiset(sdf.columns, [tuple(r) for r in srows]) == \
        _multiset(dcols, drows)


def test_streaming_qhist_equals_batch_cells(spark):
    """The drained streaming histogram must equal the batch
    histogram_sketch bit-for-bit (additive integer cells)."""
    from xpysom_dask_spark.operators import sketches as SK
    from xpysom_dask_spark.sources import readers

    li = readers.load_table(spark, SF_TINY, "lineitem")
    batch = SK.histogram_sketch(
        li, "l_extendedprice", entrymod._QH_LO, entrymod._QH_HI,
        entrymod._QH_BINS, group_cols=("l_returnflag",))
    brows = sorted(tuple(r) for r in batch.collect())
    srows = sorted(tuple(r) for r in
                   STAGED["streaming_qhist"](spark, SF_TINY).collect())
    assert srows == brows and len(srows) > 0


def test_kmv_estimate_exact_when_short(spark):
    """A group with fewer than k distinct keys keeps every hash and
    the estimate IS the exact distinct count."""
    from xpysom_dask_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [("a", f"k{i % 7}") for i in range(50)]
        + [("b", f"x{i}") for i in range(30)], ["g", "key"])
    sk = SK.kmv_sketch(df, "key", k=16, group_cols=("g",))
    est = {r["g"]: r for r in
           SK.kmv_estimate(sk, 16, group_cols=("g",)).collect()}
    assert est["a"]["n_sample"] == 7 and est["a"]["est"] == 7
    assert est["b"]["n_sample"] == 16 and est["b"]["est"] > 16


def test_kmv_sketch_is_k_smallest_distinct(spark):
    """The sketch must be exactly the k smallest distinct hashes —
    differentially vs a brute-force computation of the same md5
    fold."""
    import hashlib

    from xpysom_dask_spark.operators import sketches as SK

    keys = [f"tok{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys * 3], ["key"])
    got = sorted(r["h"] for r in
                 SK.kmv_sketch(df, "key", k=24).collect())
    exp = sorted({int(hashlib.md5(f"0:{k}".encode())
                      .hexdigest()[:12], 16) for k in keys})[:24]
    assert got == exp


def test_kmv_overlap_identical_and_disjoint(spark):
    """Jaccard_e6 must be 1e6 for identical sets and 0 for disjoint
    ones, with n_sample capped at k."""
    from xpysom_dask_spark.operators import sketches as SK

    rows = ([("a", f"s{i}") for i in range(40)]
            + [("b", f"s{i}") for i in range(40)]
            + [("c", f"t{i}") for i in range(40)])
    df = spark.createDataFrame(rows, ["g", "key"])
    sk = SK.kmv_sketch(df, "key", k=16, group_cols=("g",))
    out = {(r["ga"], r["gb"]): r for r in
           SK.kmv_overlap(sk, 16, "g").collect()}
    assert out[("a", "b")]["jaccard_e6"] == 1000000
    assert out[("a", "c")]["jaccard_e6"] == 0
    assert all(r["n_sample"] == 16 for r in out.values())


def test_dsir_prefers_target_like_docs(spark):
    """Documents that ARE the target subcorpus must average a higher
    importance weight than the rest — the selection property DSIR
    exists for (weights are per-feature-occurrence log-ratios, so
    compare per-feature means)."""
    rows = STAGED["dsir_importance"](spark, SF_TINY).collect()
    import duckdb

    con = duckdb.connect()
    langs = dict(con.execute(
        f"SELECT doc_id, lang FROM read_parquet("
        f"'{SF_TINY}/documents.parquet')").fetchall())
    con.close()
    per_feat = {"en": [], "other": []}
    for r in rows:
        key = "en" if langs[r["id"]] == "en" else "other"
        per_feat[key].append(r["logw_e6"] / r["n_feats"])
    assert per_feat["en"] and per_feat["other"]
    mean = lambda v: sum(v) / len(v)  # noqa: E731
    assert mean(per_feat["en"]) > mean(per_feat["other"])


def test_trigram_backoff_within_corpus_beats_heldout(spark):
    """Within-corpus scoring (LM = scored corpus) must dominate
    held-out scoring per trigram: every position hits the trigram
    branch with counts from the doc itself included."""
    from xpysom_dask_spark.operators.text import trigram_backoff_score
    from xpysom_dask_spark.sources import readers

    docs = readers.load_table(spark, SF_TINY, "documents") \
        .where("doc_id < 40")
    selfscore = {r["id"]: r for r in trigram_backoff_score(
        docs, "text", "doc_id").collect()}
    held = {r["id"]: r for r in trigram_backoff_score(
        docs.where("doc_id % 2 = 1"), "text", "doc_id",
        lm_df=docs.where("doc_id % 2 = 0")).collect()}
    assert held and selfscore
    for i, r in held.items():
        s = selfscore[i]
        assert r["n_trigrams"] == s["n_trigrams"]
        assert r["sum_e6"] <= s["sum_e6"] + r["n_trigrams"]


def test_quantile_hist_monotone_and_bounded(spark):
    """Quantile estimates must be non-decreasing in q within each
    group and land inside the sketch's [lo, hi) grid."""
    rows = STAGED["quantile_hist"](spark, SF_TINY).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["l_returnflag"], []).append(
            (r["q_e6"], r["value_e6"]))
    assert by_g
    for g, pairs in by_g.items():
        pairs.sort()
        vals = [v for _q, v in pairs]
        assert vals == sorted(vals), (g, pairs)
        assert all(0 <= v < 80000 * 10**6 for v in vals), (g, pairs)


def test_psi_drift_identical_snapshots_all_zero(spark):
    """PSI of a snapshot against itself is exactly zero in every
    bucket (p_a == p_b term-wise)."""
    from xpysom_dask_spark.operators import profile as PRF
    from xpysom_dask_spark.sources import readers

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = readers.load_table(spark, SF_TINY, "events")
    rows = PRF.psi_drift(ev, ev, "value", 0.0, 500.0,
                         bins=10).collect()
    assert len(rows) == 10
    assert all(r["term_e6"] == 0 for r in rows)
    assert all(r["n_a"] == r["n_b"] for r in rows)


def test_psi_drift_terms_nonnegative_and_spine_complete(spark):
    """(p−q)·ln(p/q) ≥ 0 always, and the bucket spine is complete
    (one row per bin, including empty buckets)."""
    rows = STAGED["psi_drift"](spark, SF_TINY).collect()
    assert sorted(r["bin"] for r in rows) == list(
        range(entrymod._PSI_BINS))
    assert all(r["term_e6"] >= 0 for r in rows)
    n_a, n_b = rows[0]["n_a"], rows[0]["n_b"]
    assert sum(r["ca"] for r in rows) == n_a
    assert sum(r["cb"] for r in rows) == n_b


def test_streaming_hll_equals_batch_registers(spark):
    """The drained streaming HLL register relation must equal the
    batch hll_registers bit-for-bit (max cells are order-free)."""
    import pyspark.sql.functions as F

    from xpysom_dask_spark.operators import sketches as SK
    from xpysom_dask_spark.sources import readers

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = readers.load_table(spark, SF_TINY, "events") \
        .select(F.col("user_id").cast("string").alias("k"))
    batch = SK.hll_registers(ev, "k", p=entrymod._HLL_P)
    brows = sorted(tuple(r) for r in batch.collect())
    srows = sorted(tuple(r) for r in
                   STAGED["streaming_hll"](spark, SF_TINY).collect())
    assert srows == brows and len(srows) > 0


def test_label_propagation_bridged_cliques_stay_separate(spark):
    """Two triangles joined by one bridge edge are ONE connected
    component but TWO LPA communities — the property that makes LPA
    the dense-family detector components can't replace.  Hand-traced
    4-round closed-neighborhood expectation: {1,2,3}->1,
    {4,5,6}->4."""
    from xpysom_dask_spark.operators.graph import (connected_components,
                                                   label_propagation)

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        ["id_a", "id_b"])
    comm = {r["id"]: r["community"]
            for r in label_propagation(pairs, n_iter=4).collect()}
    assert comm == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert len(set(comp.values())) == 1


def test_label_propagation_isolated_self_loop_keeps_own_id(spark):
    """A node appearing only in a self-loop pair contributes no
    edge but must still be emitted with its own id."""
    from xpysom_dask_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (7, 7)], ["id_a", "id_b"])
    comm = {r["id"]: r["community"]
            for r in label_propagation(pairs, n_iter=2).collect()}
    assert comm[7] == 7 and comm[1] == comm[2]


def test_wordpiece_gate_unk_rule_fires_and_bounds_hold(spark):
    """The 6-char word cap must actually produce [UNK]s (the corpus
    has 7/8-char words), and per-doc subword counts must be at least
    the word count (a word encodes to >= 1 token, UNK included)."""
    rows = STAGED["wordpiece_vocab"](spark, SF_TINY).collect()
    assert sum(r["n_unk"] for r in rows) > 0
    import duckdb

    con = duckdb.connect()
    wc = dict(con.execute(
        f"SELECT doc_id, len(list_filter(string_split_regex("
        f"lower(text), '\\s+'), x -> x <> '')) FROM read_parquet("
        f"'{SF_TINY}/documents.parquet')").fetchall())
    con.close()
    for r in rows:
        assert r["n_subwords"] >= wc[r["doc_id"]]
        assert 0 <= r["n_unk"] <= wc[r["doc_id"]]


def test_mad_outliers_random_vs_numpy_reference(spark):
    """Random grouped values vs a driver-side numpy replay of the
    lower-median / MAD / integer-threshold definition."""
    import numpy as np

    from xpysom_dask_spark.operators.profile import mad_outliers

    rng = np.random.RandomState(7)
    rows = []
    for g in ("a", "b", "c"):
        vals = np.round(rng.normal(50, 20, 211 + ord(g)), 2)
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r["grp"]: r for r in
           mad_outliers(df, "grp", "v", decimals=2).collect()}
    for g in ("a", "b", "c"):
        vi = np.array(sorted(int(round(v * 100))
                             for gg, v in rows if gg == g))
        n = len(vi)
        med = vi[(n + 1) // 2 - 1]
        dev = np.sort(np.abs(vi - med))
        mad = dev[(n + 1) // 2 - 1]
        n_out = int((dev * 10000 > 44478 * mad).sum())
        r = got[g]
        assert (r["n"], r["med_i"], r["mad_i"], r["n_outliers"]) == \
            (n, int(med), int(mad), n_out)


def test_mad_outliers_zero_mad_degenerate(spark):
    """>= half identical values -> MAD 0 -> any deviation flags (the
    documented degenerate rule)."""
    from xpysom_dask_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [("g", 5.0)] * 10 + [("g", 7.5), ("g", 4.0)],
        "grp string, v double")
    r = mad_outliers(df, "grp", "v").collect()[0]
    assert r["mad_i"] == 0 and r["med_i"] == 500
    assert r["n_outliers"] == 2
