"""Round-7 operator units: intra-doc paragraph dedup, dictionary
coverage, JL sign random projection (+ the cell-local kNN graph and
truncated EWMA added later this round)."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xpysom_dask_spark.operators import dedup
from xpysom_dask_spark.operators import embeddings as EMB
from xpysom_dask_spark.operators import text as T


def test_dedup_paragraphs_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\nx\nx"), (3, "solo"), (4, "")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           dedup.dedup_paragraphs(df, "text", "doc_id").collect()}
    assert out[1]["text"] == "a\nb\nc"
    assert out[1]["n_paras_removed"] == 2
    assert out[2]["text"] == "x" and out[2]["n_paras_removed"] == 2
    assert out[3]["text"] == "solo" and out[3]["n_paras_removed"] == 0
    assert out[4]["text"] == "" and out[4]["n_paras_removed"] == 0


def test_dedup_paragraphs_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id bigint, text string")
    out = dedup.dedup_paragraphs(df, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole operator is one codegen'd projection: no shuffle, no
    # Python, no join
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_dictionary_coverage_known_values(spark):
    # vocab top-2 by (count desc, term asc): 'the' (4), 'cat' (3)
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ate the cat"),
         (3, "zq zz qq"), (4, "the")],
        "doc_id bigint, text string")
    out = {r["id"]: r for r in T.dictionary_coverage(
        df, "text", "doc_id", top_k=2).collect()}
    assert out[1]["n_tok"] == 3 and out[1]["n_in_vocab"] == 2
    assert out[1]["coverage"] == round(2 / 3, 6)
    # doc 2 = the cat ate the cat: 'ate' misses the top-2 vocab
    assert out[2]["n_in_vocab"] == 4 and out[2]["coverage"] == 0.8
    assert out[3]["n_in_vocab"] == 0 and out[3]["coverage"] == 0.0
    assert out[4]["coverage"] == 1.0
    with pytest.raises(ValueError, match="top_k"):
        T.dictionary_coverage(df, "text", "doc_id", top_k=0)


def test_random_projection_matches_numpy(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(20, 16).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(20)],
        "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: np.array(r["rp"]) for r in
           EMB.random_projection(df, out_dim=4).collect()}
    S = np.array(EMB.rp_signs(16, 4), dtype=np.float64)   # (4, 16)
    want = (X @ S.T) / math.sqrt(4.0)
    for i in range(20):
        np.testing.assert_allclose(out[i], np.round(want[i], 6),
                                   atol=1e-9)


def test_random_projection_preserves_distances(spark):
    # JL sanity at a friendly ratio: project 64 -> 16 and check pair
    # distance ratios stay within a loose band
    rng = np.random.RandomState(5)
    X = rng.randn(30, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(30)],
        "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: np.array(r["rp"]) for r in
           EMB.random_projection(df, out_dim=16).collect()}
    ratios = []
    for i in range(0, 30, 3):
        for j in range(i + 1, 30, 7):
            d0 = np.linalg.norm(X[i] - X[j])
            d1 = np.linalg.norm(out[i] - out[j])
            ratios.append(d1 / d0)
    assert 0.4 < min(ratios) and max(ratios) < 1.9


def test_random_projection_signs_are_md5_derived(spark):
    """The ±1 matrix must equal what an external SQL engine derives
    from the md5 formula — re-derive a few entries via DuckDB."""
    import duckdb

    S = EMB.rp_signs(8, 3)
    con = duckdb.connect()
    for j in range(3):
        for i in range(8):
            got = con.execute(
                "SELECT 1 - 2 * (strpos('0123456789abcdef', "
                f"substring(md5('{i}:{j}'), 1, 1)) - 1 & 1)").fetchone()[0]
            assert got == S[j][i], (i, j)


def test_random_projection_validation_and_empty(spark):
    df = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert EMB.random_projection(df, out_dim=4).count() == 0
    df2 = spark.createDataFrame([(1, [1.0, 2.0])],
                                "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="out_dim"):
        EMB.random_projection(df2, out_dim=0)


def test_knn_graph_matches_numpy_within_cells(spark):
    from xpysom_dask_spark.operators import similarity as SIM

    rng = np.random.RandomState(9)
    X = rng.randn(60, 8)
    cents = X[:4].copy()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id bigint, embedding array<double>")
    got = sorted((r["vec_id"], r["rank"], r["neighbor_id"])
                 for r in SIM.knn_graph(df, cents, k=3).collect())

    # local replica: same assignment rule, cosine within cell,
    # (sim desc, neighbor asc) tie-break
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = d2.argmin(axis=1)
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    want = []
    for i in range(60):
        peers = [j for j in range(60) if cell[j] == cell[i] and j != i]
        sims = np.array([Xn[i] @ Xn[j] for j in peers])
        order = np.lexsort((peers, -np.round(sims, 12)))[:3]
        for rank, oi in enumerate(order, 1):
            want.append((i, rank, peers[oi]))
    assert got == sorted(want)


def test_knn_graph_cell_bound_and_validation(spark):
    from xpysom_dask_spark.operators import similarity as SIM

    rng = np.random.RandomState(2)
    X = rng.randn(30, 4)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(30)],
        "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="k must be"):
        SIM.knn_graph(df, X[:2], k=0)
    with pytest.raises(Exception, match="max_cell_rows"):
        SIM.knn_graph(df, np.zeros((1, 4)), k=2,
                      max_cell_rows=5).collect()


def test_ewma_known_sequence(spark):
    from xpysom_dask_spark.operators import profile as PRF

    rows = [(i, "a", float(x), i) for i, x in
            enumerate([1.0, 2.0, 3.0, 4.0])]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double, ts bigint")
    out = {r["id"]: r["ewma"] for r in PRF.ewma(
        df, "event_type", "value", "ts", "event_id",
        alpha=0.5, lag=3).collect()}
    # w = [1, .5, .25]; n=0: 1; n=1: (2 + .5*1)/1.5; n=2:
    # (3 + .5*2 + .25*1)/1.75; n=3 (truncated to last 3):
    # (4 + .5*3 + .25*2)/1.75
    assert out[0] == 1.0
    assert out[1] == round(2.5 / 1.5, 6)
    assert out[2] == round(4.25 / 1.75, 6)
    assert out[3] == round(6.0 / 1.75, 6)


def test_ewma_validation_and_key_isolation(spark):
    from xpysom_dask_spark.operators import profile as PRF

    df = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "b", 99.0, 1), (3, "a", 20.0, 2)],
        "event_id bigint, event_type string, value double, ts bigint")
    out = {r["id"]: r["ewma"] for r in PRF.ewma(
        df, "event_type", "value", "ts", "event_id",
        alpha=0.5, lag=8).collect()}
    assert out[2] == 99.0                      # key b never sees key a
    assert out[3] == round((20.0 + 0.5 * 10.0) / 1.5, 6)
    with pytest.raises(ValueError, match="alpha"):
        PRF.ewma_weights(0.0, 4)
    with pytest.raises(ValueError, match="lag"):
        PRF.ewma_weights(0.5, 0)


def test_triangle_counts_known_graph(spark):
    from xpysom_dask_spark.operators import graph as G

    # clique {1,2,3,4}: each vertex in C(3,2)=3 triangles; path 5-6-7:
    # none; edge list includes a duplicate + both orientations
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (5, 6), (6, 7), (2, 1), (1, 2)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = {r["id"]: r["n_triangles"] for r in
           G.triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}


def test_triangle_counts_star_has_none(spark):
    from xpysom_dask_spark.operators import graph as G

    df = spark.createDataFrame([(0, i) for i in range(1, 8)],
                               "id_a bigint, id_b bigint")
    out = G.triangle_counts(df).collect()
    assert all(r["n_triangles"] == 0 for r in out)
    assert len(out) == 8


def test_matryoshka_truncate_prefix_and_norm(spark):
    from xpysom_dask_spark.operators import embeddings as EMB2

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 99.0]), (2, [0.0, 0.0, 5.0])],
        "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r["mrl"] for r in
           EMB2.matryoshka_truncate(df, 2).collect()}
    assert out[1] == [0.6, 0.8]           # [3,4]/5
    assert out[2] == [0.0, 0.0]           # zero prefix stays raw
    raw = {r["vec_id"]: r["mrl"] for r in
           EMB2.matryoshka_truncate(df, 2, normalize=False).collect()}
    assert raw[1] == [3.0, 4.0]
    with pytest.raises(ValueError, match="out_dim"):
        EMB2.matryoshka_truncate(df, 0)


def test_lsh_recall_audit_catches_top_bucket(spark):
    """Near-identical docs (J≈1) must be caught by the band join;
    totals must equal the exact-pair counts per bucket."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = [(1, base), (2, base + " phi"),          # near-identical
            (3, "one two three four five six seven eight nine ten"),
            (4, "one two three four five six seven eight nine ten"),
            (5, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["bucket"]: (r["n_pairs"], r["n_caught"]) for r in
           dedup.lsh_recall_audit(df, "text", "doc_id").collect()}
    # exact duplicates (3,4) and the near-identical pair (1,2) land in
    # the top bucket and MUST be caught (identical signatures collide)
    assert 9 in out
    n, caught = out[9]
    assert n >= 2 and caught == n
    assert all(c <= n for n, c in out.values())
    import pytest as _pt
    with _pt.raises(ValueError, match="buckets"):
        dedup.lsh_recall_audit(df, "text", "doc_id", buckets=0)


def test_tfidf_vectors_known_values(spark):
    import math as _m

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b b")],
        "doc_id bigint, text string")
    out = {r["id"]: r["vec"] for r in
           T.tfidf_vectors(df, "text", "doc_id", top_k=3).collect()}
    # vocab by (count desc, term asc): b(4), a(3), c(1) -> j=0,1,2
    # df: a in 2 docs, b in 2, c in 1; N=3
    idf_b = _m.log(4 / 3) + 1
    idf_a = _m.log(4 / 3) + 1
    idf_c = _m.log(4 / 2) + 1
    assert out[1] == [round(1 * idf_b, 6), round(2 * idf_a, 6), 0.0]
    assert out[2] == [0.0, round(1 * idf_a, 6), round(1 * idf_c, 6)]
    assert out[3] == [round(3 * idf_b, 6), 0.0, 0.0]
    with pytest.raises(ValueError, match="top_k"):
        T.tfidf_vectors(df, "text", "doc_id", top_k=0)


def test_ewma_null_values_excluded_not_misaligned(spark):
    from xpysom_dask_spark.operators import profile as PRF

    df = spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "a", None, 2), (3, "a", 3.0, 3)],
        "event_id bigint, event_type string, value double, ts bigint")
    out = {r["id"]: r["ewma"] for r in PRF.ewma(
        df, "event_type", "value", "ts", "event_id",
        alpha=0.5, lag=4).collect()}
    assert 2 not in out                       # null row emits no row
    # row 3 sees [1.0, 3.0] with weights [w1, w0] = [.5, 1]
    assert out[3] == round((3.0 + 0.5 * 1.0) / 1.5, 6)


def test_knn_graph_full_probe_is_exact(spark):
    """nprobe = n_cells makes every vector query every owner — the
    result must equal exact brute-force kNN."""
    from xpysom_dask_spark.operators import similarity as SIM

    rng = np.random.RandomState(21)
    X = rng.randn(40, 6)
    cents = X[:4].copy()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>")
    got = sorted((r["vec_id"], r["rank"], r["neighbor_id"])
                 for r in SIM.knn_graph(df, cents, k=3,
                                        nprobe=4).collect())
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    S = Xn @ Xn.T
    want = []
    for i in range(40):
        order = [j for j in np.lexsort(
            (np.arange(40), -np.round(S[i], 12))) if j != i][:3]
        for rank, j in enumerate(order, 1):
            want.append((i, rank, int(j)))
    assert got == sorted(want)


def test_knn_graph_nprobe_validation_and_monotone_recall(spark):
    from xpysom_dask_spark.operators import similarity as SIM

    rng = np.random.RandomState(4)
    X = rng.randn(60, 6)
    cents = X[:6].copy()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="nprobe"):
        SIM.knn_graph(df, cents, k=3, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        SIM.knn_graph(df, cents, k=3, nprobe=7)

    exact = {(r["vec_id"], r["neighbor_id"]) for r in
             SIM.knn_graph(df, cents, k=3, nprobe=6).collect()}

    def recall(np_):
        got = {(r["vec_id"], r["neighbor_id"]) for r in
               SIM.knn_graph(df, cents, k=3, nprobe=np_).collect()}
        return len(got & exact) / len(exact)

    r1, r2, r3 = recall(1), recall(2), recall(3)
    assert r1 <= r2 <= r3 <= 1.0
    assert r3 > r1 or r1 == 1.0


def test_containment_pairs_catches_quote_inclusion(spark):
    """A short doc wholly contained in a long one: containment = 1.0
    even though Jaccard is tiny — the asymmetric leak symmetric
    near-dup misses."""
    short = "alpha beta gamma delta epsilon zeta"
    longdoc = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [(1, short), (2, longdoc),
            (3, "completely different words entirely here")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup.containment_pairs(df, "text", "doc_id",
                                  threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.1                 # Jaccard would miss it
    with pytest.raises(ValueError, match="threshold"):
        dedup.containment_pairs(df, "text", "doc_id", threshold=0.0)


def test_zipf_fit_recovers_planted_slope(spark):
    """A corpus built with freq(rank) = C / rank^0.8 must fit slope
    ~-0.8 with r2 ~1."""
    from xpysom_dask_spark.operators.profile import zipf_fit

    words = []
    for r in range(1, 41):
        f = int(round(4000 / r ** 0.8))
        words += [f"w{r:03d}"] * f
    # spread over docs
    docs = [(i, " ".join(words[i::20])) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    row = zipf_fit(df, "text", "doc_id", top_k=40).first()
    assert row["k"] == 40
    assert abs(row["slope"] + 0.8) < 0.02
    assert row["r2"] > 0.999
    with pytest.raises(ValueError, match="top_k"):
        zipf_fit(df, "text", "doc_id", top_k=2)


def test_posting_list_max_df_default_bounds_hot_shingles(spark):
    """VERDICT r6: the posting-list exact-Jaccard family must be
    scale-safe BY DEFAULT — a boilerplate shingle hotter than max_df
    is pruned from candidate generation, so the self-join fanout is
    bounded by max_df² per shingle instead of df².  Exact semantics
    stay available via the explicit max_df=None opt-in."""
    from xpysom_dask_spark.operators import dedup

    assert dedup.DEFAULT_MAX_DF is not None        # the contract
    # every doc shares the hot boilerplate trigram "the same header";
    # docs 0/1 additionally share a rare trigram pair ("alpha beta
    # gamma delta" -> two shared 3-grams)
    rows = ([(0, "the same header alpha beta gamma delta"),
             (1, "the same header alpha beta gamma delta")]
            + [(i, f"the same header unique{i} word{i} tail{i}")
               for i in range(2, 10)])
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    # max_df=3 prunes "the same header" (df=10) from the postings:
    # only the rare-shingle pair 0-1 survives candidate generation
    got = dedup.ngram_jaccard_near_dups(
        df, "text", "doc_id", threshold=0.1, n=3, max_df=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 1)}

    # the explicit exact opt-in still sees every hot-shingle pair
    exact = dedup.ngram_jaccard_near_dups(
        df, "text", "doc_id", threshold=0.1, n=3, max_df=None).collect()
    assert len(exact) == 45                        # all C(10,2) pairs

    # containment_pairs shares the pruning contract
    cont = dedup.containment_pairs(
        df, "text", "doc_id", threshold=0.2, n=3, max_df=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in cont} == {(0, 1)}


def test_lsh_collision_probability_closed_form():
    from xpysom_dask_spark.operators.dedup import (
        lsh_collision_probability)

    # hand values: P = 1 - (1 - s^r)^b
    assert lsh_collision_probability(0.5, 4, 2) == 1 - (1 - 0.25) ** 4
    assert lsh_collision_probability(0.0, 8, 2) == 0.0
    assert lsh_collision_probability(1.0, 8, 2) == 1.0
    # monotone in s
    ps = [lsh_collision_probability(s / 10, 6, 3) for s in range(11)]
    assert ps == sorted(ps)


def test_lsh_plan_tracks_threshold_and_beats_naive():
    """The tuner's S-curve midpoint must track the requested
    threshold, rows_per_band must grow with it (sharper curves for
    stricter thresholds), and the chosen plan must not lose to a
    brute-force scan of ALL (b, r) with b*r <= k_max on its own
    objective (the tuner IS that scan — this pins the objective
    arithmetic against refactors)."""
    from xpysom_dask_spark.operators.dedup import (
        lsh_collision_probability, lsh_plan)

    plans = {t: lsh_plan(t, k_max=32) for t in (0.3, 0.5, 0.8)}
    for t, p in plans.items():
        assert p["bands"] * p["rows_per_band"] == p["k"] <= 32
        assert abs(p["s50"] - t) < 0.15, (t, p)
    assert (plans[0.3]["rows_per_band"] <= plans[0.5]["rows_per_band"]
            <= plans[0.8]["rows_per_band"])

    # independent objective for one config family: numeric integral
    # with a finer grid must rank the winner at least as well as any
    # same-k alternative
    t = 0.5
    win = plans[t]

    def err(b, r, n=4000):
        fp = sum(lsh_collision_probability(t * (i + 0.5) / n, b, r)
                 for i in range(n)) * t / n
        fn = sum(1 - lsh_collision_probability(
            t + (1 - t) * (i + 0.5) / n, b, r) for i in range(n)) \
            * (1 - t) / n
        return 0.5 * fp + 0.5 * fn
    w = err(win["bands"], win["rows_per_band"])
    for r in (1, 2, 4, 8, 16, 32):
        b = win["k"] // r if win["k"] % r == 0 else None
        if b:
            assert w <= err(b, r) + 1e-3, (r, b)


def test_lsh_plan_weights_shift_the_tradeoff():
    from xpysom_dask_spark.operators.dedup import lsh_plan

    import pytest as _pt
    recall = lsh_plan(0.6, k_max=32, fp_weight=0.1, fn_weight=0.9)
    precision = lsh_plan(0.6, k_max=32, fp_weight=0.9, fn_weight=0.1)
    # recall-weighted plan accepts more FP, misses fewer true pairs
    assert recall["fn"] <= precision["fn"]
    assert recall["fp"] >= precision["fp"]
    with _pt.raises(ValueError, match="threshold"):
        lsh_plan(1.5)
