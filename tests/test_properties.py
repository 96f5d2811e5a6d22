"""Property-based tests (hypothesis) for the pure-NumPy kernels, plus
set-algebra properties across the dedup family on Spark.

These complement the exhaustive-corpus and differential suites with
randomized invariants the reference never states but must hold:
argmin-invariance of the partial euclidean distance, even-p binomial
expansion ≡ generic broadcast, metric ranges, decay monotonicity,
LSH-candidate ⊆ exact-candidate containment.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from xpysom_dask_spark.functions import distances as D
from xpysom_dask_spark.functions.decays import resolve_decay

# magnitudes bounded away from float32 denormals: ||v||^2 underflow makes
# cosine blow up by design (nan_to_num of inf — reference distances.py:57)
FLOATS = st.one_of(
    st.just(0.0),
    st.floats(0.0009765625, 10, width=32),    # 2^-10, exact in float32
    st.floats(-10, -0.0009765625, width=32))


def _mats(draw, nmax=8, mmax=6, dmax=5):
    n = draw(st.integers(1, nmax))
    m = draw(st.integers(1, mmax))
    d = draw(st.integers(1, dmax))
    X = draw(arrays(np.float32, (n, d), elements=FLOATS))
    W = draw(arrays(np.float32, (m, d), elements=FLOATS))
    return X, W


@st.composite
def mats(draw):
    return _mats(draw)


@settings(max_examples=200, deadline=None)
@given(mats())
def test_partial_euclidean_is_argmin_invariant(xw):
    X, W = xw
    part = D.resolve_distance("euclidean", {})(X, W)
    # NB: 'euclidean_no_opt' is the full SQUARED distance (reference
    # registry, distances.py:163-164 — no sqrt)
    full_sq = D.resolve_distance("euclidean_no_opt", {})(X, W)
    # partial omits the row-constant ||x||^2: difference per row constant
    diff = full_sq - part
    assert np.allclose(diff, diff[:, :1], atol=1e-2)
    # the partial argmin is epsilon-optimal under the full distance
    # (exact equality can flip on sub-float32-resolution ties — both
    # kernels round, so only margins above rounding are meaningful)
    rows = np.arange(len(X))
    chosen = full_sq[rows, part.argmin(1)]
    best = full_sq.min(1)
    tol = 1e-5 * np.maximum(np.abs(full_sq).max(1), 1.0)
    assert np.all(chosen <= best + tol)


@settings(max_examples=100, deadline=None)
@given(mats(), st.sampled_from([2, 4]))
def test_even_p_expansion_equals_generic(xw, p):
    X, W = xw
    fast = D.resolve_distance("norm_p", {"p": p})(X, W)
    slow = D.resolve_distance("norm_p_no_opt", {"p": p})(X, W)
    # the binomial-expansion path cancels catastrophically in float32, so
    # tolerance must scale with the magnitude of the cancelled terms
    mag = ((np.abs(X)**p).sum(1)[:, None] + (np.abs(W)**p).sum(1)[None, :])
    assert np.all(np.abs(fast - slow) <= 1e-4 * mag + 1e-3)


@settings(max_examples=100, deadline=None)
@given(mats())
def test_cosine_distance_range(xw):
    X, W = xw
    c = D.resolve_distance("cosine", {})(X, W)
    assert np.all(c >= -1e-5)
    assert np.all(c <= 2 + 1e-5)


@settings(max_examples=100, deadline=None)
@given(mats())
def test_manhattan_triangle_inequality_vs_euclidean(xw):
    X, W = xw
    l1 = D.resolve_distance("manhattan_no_opt", {})(X, W)
    # GEMM-form squared distance dips to -epsilon for near-identical
    # vectors — the very quirk the reference guards with nan_to_num
    # (distances.py:38-43); clamp before the root
    l2 = np.sqrt(np.maximum(
        D.resolve_distance("euclidean_no_opt", {})(X, W), 0.0))
    # ||v||_2 <= ||v||_1 <= sqrt(d)*||v||_2
    d = X.shape[1]
    assert np.all(l1 >= l2 - 1e-2)
    assert np.all(l1 <= np.sqrt(d) * l2 + 1e-2)


@settings(max_examples=50, deadline=None)
@given(st.sampled_from(["asymptotic", "exponential", "linear"]),
       st.integers(2, 50))
def test_decays_monotone_and_bounded(name, T):
    fn = resolve_decay(name)
    vals = [fn(0.5, 0.01, t, T) for t in range(T)]
    assert vals[0] <= 0.5 + 1e-12
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))
    assert all(v > 0 for v in vals)


# --------------------------------------------------------------------- #
# Spark-level set properties (fixed seeds — one Spark run each)

def test_minhash_pairs_subset_of_exact_jaccard(spark):
    """LSH candidates that survive verification are exact-Jaccard pairs:
    minhash_near_dups ⊆ ngram_jaccard_near_dups at equal threshold."""
    from xpysom_dask_spark.operators import dedup
    from conftest import SF_TINY
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    mh = {(r.id_a, r.id_b) for r in
          dedup.minhash_near_dups(docs, "text", "doc_id", 0.5).collect()}
    exact = {(r.id_a, r.id_b) for r in
             dedup.ngram_jaccard_near_dups(docs, "text", "doc_id", 0.5,
                                           max_df=None).collect()}
    assert mh <= exact
    assert len(mh) > 0


def test_exact_dedup_partitions_the_corpus(spark):
    """Group sizes sum to the corpus size; keepers are unique."""
    from xpysom_dask_spark.operators import dedup
    from conftest import SF_TINY
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    groups = dedup.dedup_exact(docs, "text", "doc_id").collect()
    assert sum(g.n_copies for g in groups) == docs.count()
    keepers = [g.keeper for g in groups]
    assert len(keepers) == len(set(keepers))
    kept = dedup.dedup_exact_keep_first(docs, "text", "doc_id")
    assert kept.count() == len(groups)


def test_simhash_token_order_invariance(spark):
    """SimHash is a multiset fingerprint: shuffling token order must not
    change it (per-token votes are order-independent)."""
    import pyspark.sql.functions as F
    from xpysom_dask_spark.operators.text import simhash60
    rows = [("b a c a x", 1), ("x a a c b", 1), ("q w e", 2), ("e q w", 2)]
    df = spark.createDataFrame(rows, "text string, grp int")
    out = (df.select("grp", simhash60("text").alias("sh"))
           .groupBy("grp").agg(F.count_distinct("sh").alias("k")).collect())
    assert all(r.k == 1 for r in out)


def test_funnel_one_pass_matches_bruteforce_on_random_logs(spark):
    """Differential check of the one-pass windowFunnel fold against a
    per-user brute force of the documented semantics (earliest
    qualifying event, ``>=`` ties) — hundreds of random user sequences
    with heavy timestamp ties and repeated step types, one Spark job."""
    import numpy as np

    from xpysom_dask_spark.operators import events as EV

    steps = ["s0", "s1", "s2", "s3"]
    types = steps + ["noise"]
    rng = np.random.RandomState(20240814)
    rows = []
    for u in range(300):
        for _ in range(rng.randint(0, 13)):
            rows.append((u, int(rng.randint(0, 6)),   # tiny ts range: ties
                         types[rng.randint(0, len(types))]))
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, "
                                     "event_type string")

    def reached(evs):
        t, r = None, 0
        for s in steps:
            cand = [ts for ts, typ in evs
                    if typ == s and (t is None or ts >= t)]
            if not cand:
                break
            t = min(cand)
            r += 1
        return r

    per_user = {}
    for u, ts, typ in rows:
        per_user.setdefault(u, []).append((ts, typ))
    expect = {k + 1: sum(1 for evs in per_user.values()
                         if reached(evs) >= k + 1)
              for k in range(len(steps))}

    got = {r["step"]: r["n_users"]
           for r in EV.funnel(df, steps).collect()}
    assert got == expect


def test_token_budget_matches_bruteforce_on_random_corpora(spark):
    """token_budget_per_group's two-branch plan (broadcast bypass for
    under-budget groups + window for the rest) must equal the plain
    one-window semantics on arbitrary group/size layouts."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators import sampling

    rng = random.Random(7)
    for trial in range(3):
        rows = [(i, f"g{rng.randrange(5)}", rng.randrange(1, 40))
                for i in range(rng.randrange(1, 120))]
        budget = rng.randrange(0, 150)
        df = spark.createDataFrame(rows, "id bigint, g string, t bigint")
        got = sorted(r["id"] for r in sampling.token_budget_per_group(
            df, "id", "g", "t", budget).collect())
        w = Window.partitionBy("g").orderBy(
            sampling._unit_hash("id", 0).asc(), F.col("id").asc()) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ref = sorted(r["id"] for r in df.withColumn(
            "c", F.sum("t").over(w)).where(F.col("c") <= budget)
            .collect())
        assert got == ref, f"trial {trial} budget {budget}"


def test_keep_best_is_a_selection_of_each_group(spark):
    """dedup_keep_best keeps exactly one row per group key, and that
    row maximizes (score, -id) within its group."""
    import random

    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators import dedup

    rng = random.Random(11)
    rows = [(i, f"t{rng.randrange(8)}", round(rng.random(), 3))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, text string, s double")
    kept = dedup.dedup_keep_best(df, "text", "id",
                                 score=F.col("s")).collect()
    by_text = {}
    for i, t, s in rows:
        by_text.setdefault(t, []).append((s, -i))
    assert len(kept) == len(by_text)
    for r in kept:
        s_best, neg_id = max(by_text[r["text"]])
        assert r["id"] == -neg_id


def test_decontaminate_spans_invariants_on_random_corpora(spark):
    """Excision invariants on random word-soup corpora: the cleaned
    doc is a subsequence of the (whitespace-normalized) original,
    n_removed is exactly the token-count delta, every ORIGINAL window
    matching a test 5-gram is gone, and an empty test set is the
    identity (modulo whitespace normalization)."""
    import random

    from xpysom_dask_spark.operators import dedup

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
            for i in range(60)]
    train = spark.createDataFrame(docs, "doc_id bigint, text string")
    test = spark.createDataFrame(
        [(1000 + j, " ".join(rng.choice(vocab) for _ in range(8)))
         for j in range(5)], "doc_id bigint, text string")
    n = 5
    test_grams = set()
    for _, t in test.collect():
        tk = t.lower().split()
        for i in range(len(tk) - n + 1):
            test_grams.add(" ".join(tk[i:i + n]))

    out = {r["doc_id"]: r for r in dedup.decontaminate_spans(
        train, test, "text", "doc_id", n=n).collect()}
    orig = dict(docs)
    for did, t0 in docs:
        a = t0.split()
        b = out[did]["text"].split() if out[did]["text"] else []
        # token-count identity
        assert out[did]["n_removed"] == len(a) - len(b)
        # subsequence property
        it = iter(a)
        assert all(any(x == y for y in it) for x in b)
        # reference cover computation: every covered token gone
        low = t0.lower().split()
        cover = [False] * len(a)
        for i in range(len(a) - n + 1):
            if " ".join(low[i:i + n]) in test_grams:
                for j in range(i, i + n):
                    cover[j] = True
        assert b == [x for x, c in zip(a, cover) if not c]

    # empty test set: identity modulo whitespace normalization
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    ident = {r["doc_id"]: r for r in dedup.decontaminate_spans(
        train, empty, "text", "doc_id", n=n).collect()}
    for did, t0 in docs:
        assert ident[did]["text"] == " ".join(t0.split())
        assert ident[did]["n_removed"] == 0


def test_dedup_lines_matches_bruteforce_on_random_corpora(spark):
    """dedup_lines == a driver-side brute-force reference on random
    multi-line docs: same surviving lines, same counts, and the
    removed+kept line multisets partition the original."""
    import random
    from collections import Counter

    from xpysom_dask_spark.operators import dedup

    rng = random.Random(31)
    pool = [f"line {i}" for i in range(8)]  # small pool → collisions
    docs = [(i, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(1, 6))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for min_df in (2, 3):
        out = {r["doc_id"]: r for r in dedup.dedup_lines(
            df, "text", "doc_id", min_df=min_df).collect()}
        dfreq = Counter()
        for _, t in docs:
            for ln in set(t.split("\n")):
                dfreq[ln] += 1
        boiler = {ln for ln, c in dfreq.items() if c >= min_df}
        for did, t0 in docs:
            lines = t0.split("\n")
            keep = [ln for ln in lines if ln not in boiler]
            assert out[did]["text"] == "\n".join(keep)
            assert out[did]["n_lines_removed"] == \
                len(lines) - len(keep)


# ---- product quantization kernels (pure-NumPy, operators/pq.py) ----

@st.composite
def pq_case(draw):
    m = draw(st.integers(1, 3))
    dsub = draw(st.integers(1, 4))
    k = draw(st.integers(1, 5))
    n = draw(st.integers(1, 8))
    X = draw(arrays(np.float32, (n, m * dsub), elements=FLOATS))
    C = draw(arrays(np.float32, (m, k, dsub), elements=FLOATS))
    return X.astype(np.float64), C.astype(np.float64)


@settings(max_examples=150, deadline=None)
@given(pq_case())
def test_seq_sq_dists_matches_reference(case):
    from xpysom_dask_spark.operators import pq

    X, C = case
    m, k, dsub = C.shape
    Xs = X.reshape(len(X), m, dsub)
    for s in range(m):
        got = pq._seq_sq_dists(Xs[:, s, :], C[s])
        want = ((Xs[:, s, None, :] - C[s][None, :, :]) ** 2).sum(-1)
        assert got.shape == (len(X), k)
        assert np.allclose(got, want, atol=1e-9)
        assert (got >= 0).all()


@settings(max_examples=150, deadline=None)
@given(pq_case())
def test_pq_lut_self_distance_is_recon_error(case):
    """ADC distance from a vector to ITS OWN code == its
    reconstruction error — the identity that makes ADC an unbiased
    proxy: d_adc(q, code(q)) = sum_s min_c ||q_s - c||^2."""
    from xpysom_dask_spark.operators import pq

    X, C = case
    m, k, dsub = C.shape
    Xs = X.reshape(len(X), m, dsub)
    lut = pq.pq_lut(C, X)                      # (n, m, k)
    for i in range(len(X)):
        adc = 0.0
        recon = 0.0
        for s in range(m):
            d = pq._seq_sq_dists(Xs[i:i + 1, s, :], C[s])[0]
            code = int(d.argmin())
            adc += lut[i, s, code]
            recon += d.min()
        assert adc == pytest.approx(recon, abs=1e-12)


@settings(max_examples=100, deadline=None)
@given(pq_case(), st.integers(1, 10**9))
def test_pq_lut_integer_scale_is_floor(case, scale):
    from xpysom_dask_spark.operators import pq

    X, C = case
    f = pq.pq_lut(C, X)
    i = pq.pq_lut(C, X, lut_scale=scale)
    assert i.dtype == np.int64
    assert np.array_equal(i, np.floor(f * scale + 0.5).astype(np.int64))


# ---- text signals on Spark (hash embedding, entropy) ----

def test_hash_embedding_is_additive_over_concat(spark):
    """Unnormalized hash vectors are token-count linear:
    vec(a + ' ' + b) == vec(a) + vec(b) — the property that makes the
    signed-sum sketch inner-product-preserving in expectation."""
    import random

    from xpysom_dask_spark.operators import text as T

    rng = random.Random(7)
    words = [f"w{i}" for i in range(20)]
    docs = []
    for i in range(12):
        a = " ".join(rng.choice(words) for _ in range(rng.randint(1, 9)))
        b = " ".join(rng.choice(words) for _ in range(rng.randint(1, 9)))
        docs.append((3 * i, a))
        docs.append((3 * i + 1, b))
        docs.append((3 * i + 2, a + " " + b))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["id"]: np.asarray(r["vec"]) for r in T.hash_embedding(
        df, "text", "doc_id", dim=16, normalize=False).collect()}
    for i in range(12):
        np.testing.assert_array_equal(
            out[3 * i] + out[3 * i + 1], out[3 * i + 2])


def test_entropy_bounds_and_concat_invariance(spark):
    """0 <= H <= log2(distinct symbols), and doubling a document
    (text + ' ' + text) leaves TOKEN entropy unchanged (scale
    invariance of the distribution; char entropy shifts slightly —
    the joining space itself is a symbol)."""
    import math
    import random

    from xpysom_dask_spark.operators import text as T

    rng = random.Random(11)
    words = [f"t{i}" for i in range(6)]
    docs = []
    for i in range(10):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        docs.append((2 * i, t))
        docs.append((2 * i + 1, t + " " + t))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["id"]: r for r in T.entropy_signals(
        df, "text", "doc_id").collect()}
    for did, t in docs:
        r = out[did]
        n_tok = len(t.split())
        assert 0.0 <= r["token_entropy"] <= math.log2(max(
            len(set(t.split())), 2)) + 1e-9
        assert 0.0 <= r["char_entropy"] <= math.log2(max(
            len(set(t.lower())), 2)) + 1e-9
    for i in range(10):
        a, b = out[2 * i], out[2 * i + 1]
        assert abs(a["token_entropy"] - b["token_entropy"]) <= 2e-6
        assert abs(a["char_entropy"] - b["char_entropy"]) <= 0.05


# ---------------------------------------------------------------- #
# round-6 operator invariants


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcd"), min_size=0,
                         max_size=8), min_size=1, max_size=6))
def test_dedup_paragraphs_idempotent_and_set_preserving(spark,
                                                        docs_words):
    """Applying intra-doc dedup twice == once, the surviving segment
    SET equals the input set, and first-occurrence order is kept."""
    from xpysom_dask_spark.operators.dedup import dedup_paragraphs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    once = dedup_paragraphs(df, "text", "doc_id", sep=" ")
    twice = dedup_paragraphs(once.select("doc_id", "text"),
                             "text", "doc_id", sep=" ")
    o = {r["doc_id"]: r["text"] for r in once.collect()}
    t = {r["doc_id"]: (r["text"], r["n_paras_removed"])
         for r in twice.collect()}
    for i, ws in enumerate(rows):
        doc_id, text = ws
        assert t[doc_id] == (o[doc_id], 0)          # idempotent
        seen, want = set(), []
        for w in text.split(" "):
            if w not in seen:
                seen.add(w)
                want.append(w)
        assert o[doc_id] == " ".join(want)          # local replica


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_random_projection_is_linear(spark, seed):
    """rp(a·x + b·y) == a·rp(x) + b·rp(y) up to rounding — the defining
    property of the sign projection (checked pre-rounding via a fine
    decimals setting)."""
    from xpysom_dask_spark.operators.embeddings import random_projection

    rng = np.random.RandomState(seed % 10_000)
    x, y = rng.randn(8), rng.randn(8)
    a, b = float(rng.randn()), float(rng.randn())
    df = spark.createDataFrame(
        [(0, [float(v) for v in x]), (1, [float(v) for v in y]),
         (2, [float(v) for v in (a * x + b * y)])],
        "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: np.array(r["rp"]) for r in
           random_projection(df, out_dim=4, decimals=12).collect()}
    np.testing.assert_allclose(out[2], a * out[0] + b * out[1],
                               atol=1e-6)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=25))
def test_triangle_counts_match_bruteforce(spark, edges):
    from itertools import combinations

    from xpysom_dask_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a bigint, id_b bigint")
    got = {r["id"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in es for v in e})
    want = {v: 0 for v in verts}
    for x, y, z in combinations(verts, 3):
        if {(x, y), (x, z), (y, z)} <= es:
            want[x] += 1
            want[y] += 1
            want[z] += 1
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(1, 400), min_size=1, max_size=40),
       st.integers(2, 6))
def test_pack_bins_invariants(spark, toks, n_groups):
    """Every doc assigned exactly once; no bin exceeds the budget
    unless it holds a single oversize doc; bins are contiguous
    per group starting at 0."""
    from xpysom_dask_spark.operators.packing import pack_bins_next_fit

    budget = 256
    df = spark.createDataFrame(list(enumerate(toks)),
                               "doc_id bigint, n_tok bigint")
    out = pack_bins_next_fit(df, "doc_id", "n_tok", budget=budget,
                             n_groups=n_groups).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(toks)))
    by_bin, by_group = {}, {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
        by_group.setdefault(r["group"], set()).add(
            r["bin_id"] - r["group"] * (1 << 40))
    for rs in by_bin.values():
        tot = sum(r["n_tok"] for r in rs)
        if tot > budget:
            # over-budget bins exist ONLY as singleton oversize bins
            assert len(rs) == 1 and rs[0]["oversize"]
    for locals_ in by_group.values():
        assert locals_ == set(range(len(locals_)))


def test_canonicalize_url_idempotent_on_fuzzed_strings(spark):
    """canonicalize(canonicalize(s)) == canonicalize(s) for ANY input
    — the dedup-key property: a canonical form must be a fixed point,
    URLs and garbage alike (garbage passes through unchanged)."""
    import random

    from xpysom_dask_spark.operators.text import canonicalize_url

    rng = random.Random(29)
    alphabet = "abxyz:/?.&=#@%019-_~ "
    strs = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 60)))
            for _ in range(300)]
    strs += ["http://" + "".join(rng.choice(alphabet)
                                 for _ in range(rng.randint(0, 40)))
             for _ in range(300)]
    strs += ["HTTPS://www.a.b.co.uk:443//x//?b=&a=1&utm_x=9#f",
             "http://:80/", "http://@/", "http://?#", "http://."]
    df = spark.createDataFrame([(s,) for s in strs], ["u"])
    once = [r["c"] for r in
            df.select(canonicalize_url("u").alias("c")).collect()]
    df2 = spark.createDataFrame([(s,) for s in once], ["u"])
    twice = [r["c"] for r in
             df2.select(canonicalize_url("u").alias("c")).collect()]
    bad = [(a, b) for a, b in zip(once, twice) if a != b]
    assert not bad, bad[:5]


def test_squash_repeated_lines_is_idempotent(spark):
    """A squashed document has no intra-doc duplicate lines left, so a
    second pass must be the identity (and squash 0 lines)."""
    import random

    from xpysom_dask_spark.operators.dedup import squash_repeated_lines

    rng = random.Random(41)
    pool = ["alpha", "beta", "", "gamma delta", "x"]
    rows = [(i, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(0, 10))))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "text"])
    once = squash_repeated_lines(df, "text", "id") \
        .select("id", "text").orderBy("id").collect()
    again = squash_repeated_lines(
        spark.createDataFrame(once, ["id", "text"]), "text", "id") \
        .orderBy("id").collect()
    assert [(r["id"], r["text"]) for r in once] == \
           [(r["id"], r["text"]) for r in again]
    assert all(r["n_lines_squashed"] == 0 for r in again)


def test_domain_blocklist_block_allow_partition_corpus(spark):
    """block-mode and allow-mode are complements: together they
    partition the input rows exactly."""
    from xpysom_dask_spark.operators.text import domain_blocklist_filter

    hosts = spark.createDataFrame(
        [(i, h) for i, h in enumerate(
            ["a.com", "x.a.com", "b.org", "c.a.commm", "a.com.evil",
             "", "B.ORG", "y.b.org", "z.c.net"])], ["id", "host"])
    bl = spark.createDataFrame([("a.com",), ("b.org",)], ["domain"])
    blocked = {r["id"] for r in domain_blocklist_filter(
        hosts, "host", bl, "id", mode="block").collect()}
    allowed = {r["id"] for r in domain_blocklist_filter(
        hosts, "host", bl, "id", mode="allow").collect()}
    assert blocked | allowed == {r["id"] for r in hosts.collect()}
    assert blocked & allowed == set()
