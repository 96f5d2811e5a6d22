"""Skew hardening for LSH band self-joins (VERDICT r01 #7).

The failure mode: a duplicate-heavy corpus puts a whole duplicate
cluster into ONE band bucket (identical texts ⇒ identical signatures in
every band), and the bucket self-join emits O(B²) pairs from one task.
AQE's skew-join split cannot catch this — skew detection is
input-bytes-based, and a hot bucket is a few KB of input with quadratic
OUTPUT fanout (verified empirically: 400-row bucket → 80 k join rows,
`skew=true` never appears in the adaptive plan).

``max_bucket`` is the operator-level fix: hot buckets emit star pairs
(member ↔ min-id hub, O(B)) instead of all pairs, preserving
duplicate-cluster connectivity through exact verification.  These tests
pin: (a) the fanout bound, (b) the connectivity guarantee, (c) that
cold (non-skewed) results are unchanged vs the exact path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark.operators import dedup, similarity


HOT_N = 120          # identical docs → one hot bucket per band
HOT_TEXT = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = [(i, HOT_TEXT) for i in range(HOT_N)]
    # distinct cold docs + one genuine cold near-dup pair
    rows += [(1000 + i,
              f"completely different document {i} about topic {i * 17} "
              f"with extra words {i * 31} {i * 7} zebra quartz")
             for i in range(200)]
    rows += [(5000, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (5001, "alpha beta gamma delta epsilon zeta eta theta kappa")]
    return (spark.createDataFrame(rows, "doc_id bigint, text string")
            .repartition(8))


def _components(pairs):
    """Union-find over (id_a, id_b) rows → {id: root}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {x: find(x) for x in parent}


def test_simhash_star_pairs_bound_and_connect(spark, skewed_docs):
    capped = dedup.simhash_near_dups(skewed_docs, "text", "doc_id",
                                     max_bucket=30).collect()
    hot_ids = set(range(HOT_N))
    hot_pairs = [(r.id_a, r.id_b) for r in capped
                 if r.id_a in hot_ids or r.id_b in hot_ids]
    # fanout bound: star pairs only — B-1, not B(B-1)/2
    assert len(hot_pairs) == HOT_N - 1
    # connectivity: every hot doc in ONE component
    comp = _components(hot_pairs)
    assert len({comp[i] for i in hot_ids}) == 1
    assert set(comp) == hot_ids

    # cold pairs unchanged vs the exact (max_bucket=None) path
    exact = dedup.simhash_near_dups(skewed_docs, "text", "doc_id").collect()
    cold_capped = {(r.id_a, r.id_b, r.hamming) for r in capped
                   if r.id_a not in hot_ids and r.id_b not in hot_ids}
    cold_exact = {(r.id_a, r.id_b, r.hamming) for r in exact
                  if r.id_a not in hot_ids and r.id_b not in hot_ids}
    assert cold_capped == cold_exact


def test_minhash_star_pairs_bound_and_connect(spark, skewed_docs):
    capped = dedup.minhash_near_dups(skewed_docs, "text", "doc_id",
                                     threshold=0.5, max_bucket=30).collect()
    hot_ids = set(range(HOT_N))
    hot_pairs = [(r.id_a, r.id_b) for r in capped
                 if r.id_a in hot_ids or r.id_b in hot_ids]
    assert len(hot_pairs) == HOT_N - 1          # star, not quadratic
    comp = _components(hot_pairs)
    assert len({comp[i] for i in hot_ids}) == 1
    # identical docs: exact-verified jaccard is 1
    assert all(r.jaccard == 1.0 for r in capped
               if r.id_a in hot_ids or r.id_b in hot_ids)

    exact = dedup.minhash_near_dups(skewed_docs, "text", "doc_id",
                                    threshold=0.5).collect()
    cold_capped = {(r.id_a, r.id_b) for r in capped
                   if r.id_a not in hot_ids and r.id_b not in hot_ids}
    cold_exact = {(r.id_a, r.id_b) for r in exact
                  if r.id_a not in hot_ids and r.id_b not in hot_ids}
    assert cold_capped == cold_exact


def test_hyperplane_lsh_star_pairs(spark):
    """A positively-scaled duplicate cluster shares every band signature;
    max_bucket bounds its fanout and the GEMM verify keeps sim=1."""
    rng = np.random.RandomState(4)
    base = rng.standard_normal(16)
    rows = [(i, list(map(float, base * (1.0 + 0.5 * (i % 3)))))
            for i in range(80)]                       # scaled dups
    rows += [(1000 + i, list(map(float, rng.standard_normal(16))))
             for i in range(100)]                     # random cold vecs
    df = (spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
          .repartition(8))
    out = similarity.lsh_near_dup_pairs(df, dim=16, threshold=0.99,
                                        bits_per_band=8,
                                        max_bucket=20).collect()
    hot_ids = set(range(80))
    hot_pairs = [(r.id_a, r.id_b) for r in out
                 if r.id_a in hot_ids or r.id_b in hot_ids]
    assert len(hot_pairs) == 79                        # star bound
    comp = _components(hot_pairs)
    assert len({comp[i] for i in hot_ids}) == 1
    assert all(abs(r.sim - 1.0) < 1e-12 for r in out
               if r.id_a in hot_ids and r.id_b in hot_ids)


def test_band_self_join_exact_matches_capped_below_cap(spark):
    """With every bucket under the cap, max_bucket must be a no-op."""
    rows = [(i, f"bucket-{i % 7}") for i in range(35)]
    banded = spark.createDataFrame(rows, "id bigint, band_key string")
    exact = {(r.id_a, r.id_b)
             for r in dedup.band_self_join_pairs(banded).collect()}
    capped = {(r.id_a, r.id_b)
              for r in dedup.band_self_join_pairs(
                  banded, max_bucket=10).collect()}
    assert exact == capped and len(exact) == 7 * 5 * 4 / 2


def test_decontaminate_removes_overlapping_train_docs(spark):
    """Train docs sharing an n-gram with ANY test doc are dropped;
    clean docs survive; pair counts match a python recomputation."""
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows_train = [(1, shared + " extra words here"),
                  (2, "completely unrelated text about alpha beta gamma "
                      "delta epsilon zeta"),
                  (3, "another clean document with its very own wording "
                      "throughout entirely")]
    rows_test = [(100, "prefix words then " + shared),
                 (101, "totally different evaluation text omega psi chi "
                       "phi upsilon tau")]
    tr = spark.createDataFrame(rows_train, "doc_id bigint, text string")
    te = spark.createDataFrame(rows_test, "doc_id bigint, text string")

    pairs = dedup.cross_overlap_pairs(tr, te, "text", "doc_id", n=5)
    got = {(r.id_a, r.id_b): r.n_shared for r in pairs.collect()}
    assert set(got) == {(1, 100)}
    # python oracle: distinct shared 5-gram count
    def grams(s, n=5):
        t = s.lower().split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}
    assert got[(1, 100)] == len(grams(rows_train[0][1])
                                 & grams(rows_test[0][1]))

    kept = sorted(r.doc_id for r in
                  dedup.decontaminate(tr, te, "text", "doc_id",
                                      n=5).collect())
    assert kept == [2, 3]


def test_jaccard_verify_candidate_guard(spark, skewed_docs):
    """Over-bound candidate count raises with the knob pointers; an
    adequate bound (or None) leaves results identical to the exact
    path."""
    with pytest.raises(ValueError, match="max_bucket"):
        dedup.minhash_near_dups(skewed_docs, "text", "doc_id",
                                threshold=0.5, max_candidates=100).collect()
    # bounded candidates via star pairs fit the same guard
    got = dedup.minhash_near_dups(skewed_docs, "text", "doc_id",
                                  threshold=0.5, max_bucket=20,
                                  max_candidates=100_000)
    exact = dedup.minhash_near_dups(skewed_docs, "text", "doc_id",
                                    threshold=0.5, max_bucket=20)
    assert ({(r.id_a, r.id_b) for r in got.collect()}
            == {(r.id_a, r.id_b) for r in exact.collect()})
