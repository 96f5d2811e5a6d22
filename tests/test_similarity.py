"""Similarity-tier tests: enforced memory bounds, banded-LSH recall and
bucket sizing, and the IVF plan/state contracts (VERDICT r01 #2-#4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_TINY

from xpysom_dask_spark.operators import similarity
from xpysom_dask_spark.operators.som import SparkSom


def _emb(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet")


def test_near_dup_pairs_cap_enforced(spark):
    """Over-cap tables must fail fast with a pointer to the LSH path —
    not OOM the driver mid-toPandas (VERDICT r01 What's-wrong #1)."""
    e = _emb(spark)
    with pytest.raises(ValueError, match="lsh_near_dup_pairs"):
        similarity.near_dup_pairs(e, threshold=0.9, max_rows=10)


def test_near_dup_pairs_under_cap_still_works(spark):
    e = _emb(spark)
    out = similarity.near_dup_pairs(e, threshold=0.45)
    assert out.columns == ["id_a", "id_b", "sim"]
    assert out.count() >= 0


def test_auto_bits_per_band_scales_with_corpus():
    """Band space must grow with n so expected bucket occupancy stays
    O(target) — the fix for the fixed-2⁸-bucket quadratic blowup."""
    small = similarity.auto_bits_per_band(1_000)
    mid = similarity.auto_bits_per_band(1_000_000)
    huge = similarity.auto_bits_per_band(10**12)
    assert small == 8          # clamped floor
    assert mid > small
    assert huge == 24          # clamped ceiling
    assert similarity.auto_bits_per_band(0) == 8


def test_lsh_bucket_occupancy_bounded(spark):
    """No giant buckets on a random corpus: with corpus-sized bands the
    largest band bucket stays far below n (a fixed tiny bucket space
    would concentrate O(n/256) rows per bucket)."""
    rng = np.random.RandomState(0)
    n, d = 2000, 16
    rows = [(i, [float(v) for v in rng.standard_normal(d)])
            for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    bits = similarity.auto_bits_per_band(n)
    sig = similarity.hyperplane_lsh_signatures(
        df, dim=d, n_bands=4, bits_per_band=bits)
    occ = (sig.select(F.posexplode("bands").alias("band", "bucket"))
           .groupBy("band", "bucket").count()
           .agg(F.max("count")).collect()[0][0])
    assert occ < n / 4


def test_lsh_full_recall_equals_exact_on_scaled_dups(spark):
    """Positively-scaled copies share every hyperplane sign ⇒ collide in
    all bands ⇒ banded LSH recall 1; verified output must equal the
    exact all-pairs answer at the same threshold."""
    e = _emb(spark).select("vec_id", "embedding")
    scaled = e.select(
        (F.col("vec_id") + F.lit(10_000)).alias("vec_id"),
        F.expr("transform(embedding, v -> v * CAST(2.0 AS FLOAT))")
        .alias("embedding"))
    corpus = e.unionAll(scaled)
    exact = {(r["id_a"], r["id_b"]): r["sim"]
             for r in similarity.near_dup_pairs(
                 corpus, threshold=0.99).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["sim"]
           for r in similarity.lsh_near_dup_pairs(
               corpus, dim=64, threshold=0.99).collect()}
    assert set(lsh) == set(exact)
    assert len(lsh) == e.count()  # one pair per original vector
    for pair, sim in lsh.items():
        assert abs(sim - exact[pair]) < 1e-9


def test_lsh_candidates_subset_of_exact(spark):
    """LSH output ⊆ exact output at any threshold (verification is exact,
    so LSH can only miss, never invent)."""
    e = _emb(spark)
    exact = {(r["id_a"], r["id_b"])
             for r in similarity.near_dup_pairs(e, threshold=0.4).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in similarity.lsh_near_dup_pairs(
               e, dim=64, threshold=0.4).collect()}
    assert lsh <= exact


def test_som_ivf_no_bnlj_and_no_state_mutation(spark):
    """The probe join must be a broadcast hash equi-join (VERDICT r01
    What's-wrong #2) and the som's features_col must not be mutated
    (ADVICE r01: concurrent transforms would score the wrong column)."""
    e = _emb(spark)
    som = SparkSom(4, 4, 64, random_seed=7, features_col="features")
    som.train(e.select(F.col("embedding").alias("features")), 1)
    q = e.where("vec_id % 20 = 0").collect()
    qids = [r["vec_id"] for r in q]
    Q = np.array([r["embedding"] for r in q])
    out = similarity.som_ivf_topk(som, e, Q, qids, k=3, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert som.features_col == "features"
    assert out.count() > 0


def test_som_ivf_full_probe_equals_exact_topk(spark):
    """nprobe = x·y scans every cell ⇒ IVF output must equal brute-force
    top-k exactly (the oracle-checkable configuration)."""
    e = _emb(spark)
    som = SparkSom(4, 4, 64, random_seed=7, features_col="embedding")
    som.train(e.select("embedding"), 1)
    q = e.where("vec_id % 25 = 0")
    rows = q.collect()
    qids = [r["vec_id"] for r in rows]
    Q = np.array([r["embedding"] for r in rows])
    ivf = similarity.som_ivf_topk(som, e, Q, qids, k=5, nprobe=16)
    exact = similarity.cosine_topk(e, q, k=5)
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["sim"], 9))
           for r in ivf.collect()}
    want = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["sim"], 9))
            for r in exact.collect()}
    assert got == want


def test_som_ivf_index_matches_inmemory(spark, tmp_path):
    """Index-backed ANN == the in-memory IVF path, and the probed-cell
    filter reaches the partitioned scan as plan-time partition pruning
    (unprobed cell directories never open)."""
    import numpy as np

    from xpysom_dask_spark import SparkSom
    from xpysom_dask_spark.sources import readers

    from conftest import SF_TINY

    emb = readers.load_table(spark, SF_TINY, "embeddings")
    som = SparkSom(4, 4, 64, random_seed=3, features_col="embedding")
    som.train(emb.select("embedding"), 1)
    q = emb.where("vec_id % 100 = 0").collect()
    qv = np.array([r["embedding"] for r in q])
    qids = [r["vec_id"] for r in q]

    path = str(tmp_path / "ivf_index")
    similarity.build_som_ivf_index(som, emb, path)

    mem = similarity.som_ivf_topk(som, emb, qv, qids, k=3, nprobe=4)
    idx = similarity.som_ivf_topk_from_index(spark, path, som, qv, qids,
                                             k=3, nprobe=4)
    a = sorted(map(tuple, mem.collect()))
    b = sorted(map(tuple, idx.collect()))
    assert [t[:3] for t in a] == [t[:3] for t in b]
    for ra, rb in zip(a, b):
        assert abs(ra[3] - rb[3]) < 1e-9

    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cluster_id" in plan.split("PartitionFilters", 1)[1][:200]


def test_cosine_topk_many_matches_single(spark):
    """Hash-chunked query loop == single-broadcast plan (every query in
    exactly one chunk; per-query top-k unaffected by the split)."""
    import numpy as np

    rng = np.random.RandomState(6)
    rows = [(i, [float(v) for v in rng.standard_normal(8)])
            for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding "
                                "array<double>")
    queries = emb.where("vec_id % 4 = 0")        # 100 queries
    single = similarity.cosine_topk(emb, queries, k=3)
    chunked = similarity.cosine_topk_many(
        emb, queries, k=3, chunk_queries=30)
    assert chunked.cached_corpus is not None
    with chunked as cdf:
        a = sorted(map(tuple, single.collect()))
        b = sorted(map(tuple, cdf.collect()))
        assert [t[:3] for t in a] == [t[:3] for t in b]
        for ra, rb in zip(a, b):
            assert abs(ra[3] - rb[3]) < 1e-12
        # every query answered exactly once despite the chunk split
        assert cdf.select("query_id").distinct().count() == 100
        # the handle survives further transformation of the plan
        assert chunked.cached_corpus.is_cached
    assert chunked.cached_corpus is None        # released on exit
    # under the chunk bound: pass-through, no cache handle
    small = similarity.cosine_topk_many(
        emb, queries.limit(5), k=2, chunk_queries=1000)
    assert small.cached_corpus is None and small.df.count() > 0


def test_lsh_band_recall_formula():
    """Closed-form checks of the banded S-curve: wider bands lose
    recall at fixed L; more bands recover it; bounds are sane."""
    import math

    r16 = similarity.lsh_band_recall(0.95, 4, 16)
    r24 = similarity.lsh_band_recall(0.95, 4, 24)
    assert r24 < r16 < 1.0
    # hand-computed: p = 1 - acos(.95)/pi ≈ 0.8989
    p = 1 - math.acos(0.95) / math.pi
    assert abs(r16 - (1 - (1 - p ** 16) ** 4)) < 1e-12
    # adding bands at fixed width recovers recall monotonically
    assert (similarity.lsh_band_recall(0.95, 12, 24)
            > similarity.lsh_band_recall(0.95, 4, 24))


def test_auto_lsh_config_holds_recall():
    """Band count grows with the corpus-driven band width so recall at
    the threshold stays >= target across corpus scales."""
    for n_rows in (1_000, 1_000_000, 10**9, 10**12):
        L, bits = similarity.auto_lsh_config(n_rows, 0.95,
                                             target_recall=0.9)
        assert similarity.lsh_band_recall(0.95, L, bits) >= 0.9
    # bigger corpus -> wider bands -> more bands needed
    l_small, b_small = similarity.auto_lsh_config(1_000, 0.95)
    l_huge, b_huge = similarity.auto_lsh_config(10**12, 0.95)
    assert b_huge > b_small and l_huge > l_small


def test_lsh_near_dup_warns_on_degraded_recall(spark):
    """Explicit n_bands + corpus-sized wide bands below target recall
    warns with the estimate; n_bands=None auto-sizing does not."""
    import warnings

    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(v) for v in rng.standard_normal(16)])
            for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding "
                                "array<double>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # force wide bands via a tiny bucket target: 300/1 -> 9 bits...
        # use hi=24 with target_bucket_rows small enough to hit 24 bits
        # through the public path: monkey-free, call with a threshold
        # where 4 bands x corpus bits degrade recall
        similarity.lsh_near_dup_pairs(
            emb, dim=16, threshold=0.8, n_bands=1).collect()
    assert any("estimated recall" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        similarity.lsh_near_dup_pairs(
            emb, dim=16, threshold=0.8, n_bands=None).collect()
    assert not any("estimated recall" in str(x.message) for x in w2)


def test_som_ivf_index_df_queries_chunked(spark, tmp_path):
    """DataFrame query side against the persisted index: |Q| over the
    chunk bound splits into exact chunks and the union equals the
    single-ndarray path (VERDICT r02 #8)."""
    import numpy as np

    from xpysom_dask_spark import SparkSom
    from xpysom_dask_spark.sources import readers

    from conftest import SF_TINY

    emb = readers.load_table(spark, SF_TINY, "embeddings")
    som = SparkSom(4, 4, 64, random_seed=3, features_col="embedding")
    som.train(emb.select("embedding"), 1)
    path = str(tmp_path / "ivf_index_df")
    similarity.build_som_ivf_index(som, emb, path)

    qdf = emb.where("vec_id % 5 = 0")            # 100 queries
    rows = qdf.collect()
    qids = [r["vec_id"] for r in rows]
    qv = np.array([r["embedding"] for r in rows])

    direct = similarity.som_ivf_topk_from_index(
        spark, path, som, qv, qids, k=3, nprobe=4)
    chunked = similarity.som_ivf_topk_from_index_df(
        spark, path, som, qdf, k=3, nprobe=4, chunk_queries=30)
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, chunked.collect()))
    assert [t[:3] for t in a] == [t[:3] for t in b]
    for ra, rb in zip(a, b):
        assert abs(ra[3] - rb[3]) < 1e-9
    # every query answered despite the split
    assert chunked.select("query_id").distinct().count() == len(qids)

    # pass-through when under the bound
    small = similarity.som_ivf_topk_from_index_df(
        spark, path, som, qdf.limit(7), k=2, nprobe=2)
    assert small.select("query_id").distinct().count() == 7


def test_ann_recall_curve_monotone_and_exact_at_full_probe(spark):
    """The registered quality query: recall non-decreasing in nprobe,
    exactly 1.0 at full probe, well-formed at the tiny sf."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    got = (entry.queries()["ann_recall_curve"](spark, SF_TINY)
           .toPandas().sort_values("nprobe").reset_index(drop=True))
    assert got["nprobe"].tolist() == [1, 4, 16]
    r = got["recall"].tolist()
    assert r[0] <= r[1] <= r[2]
    assert r[2] == 1.0
    assert (got["n_queries"] > 0).all()


def test_som_ivf_index_quantized(spark, tmp_path):
    """int8-quantized index: 4x smaller rows, full-probe results within
    quantization error of the exact-index results."""
    e = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    som = SparkSom(2, 2, 64, random_seed=7, features_col="embedding")
    som.train(e.select("embedding"), 1)
    pf, pq = str(tmp_path / "ivf_f"), str(tmp_path / "ivf_q")
    similarity.build_som_ivf_index(som, e, pf)
    similarity.build_som_ivf_index(som, e, pq, quantize=True)
    qdf = spark.read.parquet(pq)
    assert "qvec" in qdf.columns and "scale" in qdf.columns
    assert dict(qdf.dtypes)["qvec"] == "array<tinyint>"

    q = e.orderBy("vec_id").limit(8).collect()
    Q = np.array([r["embedding"] for r in q])
    ids = [r["vec_id"] for r in q]
    full = 4  # nprobe = x*y -> exact within each index
    exact = similarity.som_ivf_topk_from_index(
        spark, pf, som, Q, ids, k=3, nprobe=full).collect()
    quant = similarity.som_ivf_topk_from_index(
        spark, pq, som, Q, ids, k=3, nprobe=full).collect()
    ex = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    qu = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in quant}
    # per query: at least 2 of top-3 shared, sims within quantization err
    from collections import defaultdict
    exq, quq = defaultdict(set), defaultdict(set)
    for (qid, nid) in ex:
        exq[qid].add(nid)
    for (qid, nid) in qu:
        quq[qid].add(nid)
    for qid in exq:
        assert len(exq[qid] & quq[qid]) >= 2
    for key in set(ex) & set(qu):
        assert abs(ex[key] - qu[key]) < 0.02


def test_som_ivf_index_residual_quantized(spark, tmp_path):
    """Residual (IVF-PQ-style) quantization: same int8 budget, smaller
    reconstruction error than plain int8 whenever cells are tighter
    than the global spread; full-probe results track the exact index
    at least as closely as the plain-quantized ones."""
    e = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    som = SparkSom(2, 2, 64, random_seed=7, features_col="embedding")
    som.train(e.select("embedding"), 1)
    pf = str(tmp_path / "ivf_f")
    pq = str(tmp_path / "ivf_q")
    pr = str(tmp_path / "ivf_r")
    similarity.build_som_ivf_index(som, e, pf)
    similarity.build_som_ivf_index(som, e, pq, quantize=True)
    similarity.build_som_ivf_index(som, e, pr, quantize="residual")
    rdf = spark.read.parquet(pr)
    assert "rqvec" in rdf.columns and "scale" in rdf.columns
    assert dict(rdf.dtypes)["rqvec"] == "array<tinyint>"

    # reconstruction error: residual scale = max|x - c|/127 per row,
    # plain scale = max|x|/127 — mean scale must shrink
    plain_scale = spark.read.parquet(pq).agg(F.avg("scale")).first()[0]
    resid_scale = rdf.agg(F.avg("scale")).first()[0]
    assert resid_scale < plain_scale

    q = e.orderBy("vec_id").limit(8).collect()
    Q = np.array([r["embedding"] for r in q])
    ids = [r["vec_id"] for r in q]
    exact = similarity.som_ivf_topk_from_index(
        spark, pf, som, Q, ids, k=3, nprobe=4).collect()
    resid = similarity.som_ivf_topk_from_index(
        spark, pr, som, Q, ids, k=3, nprobe=4).collect()
    ex = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    rs = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in resid}
    for key in set(ex) & set(rs):
        assert abs(ex[key] - rs[key]) < 0.02
    shared = len(set(ex) & set(rs))
    assert shared >= len(ex) * 2 // 3


def test_build_index_rejects_bad_quantize(spark, tmp_path):
    e = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    som = SparkSom(2, 2, 64, random_seed=7, features_col="embedding")
    som.train(e.select("embedding").limit(50), 1)
    with pytest.raises(ValueError, match="quantize"):
        similarity.build_som_ivf_index(som, e, str(tmp_path / "x"),
                                       quantize="pq")


def test_ivf_index_append_mode_ingests_new_batch(spark, tmp_path):
    """mode='append' scores a new vector batch against the frozen
    codebook and lands it in the matching cluster partitions — queries
    then see both batches, identically to a one-shot build."""
    import numpy as np

    from xpysom_dask_spark import SparkSom
    from xpysom_dask_spark.operators import similarity
    from xpysom_dask_spark.sources import readers

    emb = readers.load_table(spark, SF_TINY, "embeddings")
    first = emb.where("vec_id % 2 = 0")
    second = emb.where("vec_id % 2 = 1")
    som = SparkSom(3, 3, 64, random_seed=7, features_col="embedding")
    som.train(first.select("embedding"), 2)

    p_inc = str(tmp_path / "ivf_inc")
    similarity.build_som_ivf_index(som, first, p_inc)
    similarity.build_som_ivf_index(som, second, p_inc, mode="append")
    p_full = str(tmp_path / "ivf_full")
    similarity.build_som_ivf_index(som, emb, p_full)

    q = emb.where("vec_id % 100 = 0").collect()
    qids = [r["vec_id"] for r in q]
    qv = np.array([r["embedding"] for r in q])
    got = similarity.som_ivf_topk_from_index(
        spark, p_inc, som, qv, qids, k=5, nprobe=9)
    want = similarity.som_ivf_topk_from_index(
        spark, p_full, som, qv, qids, k=5, nprobe=9)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_knn_graph_full_probe_guard_errors_loudly(spark):
    """VERDICT r8 #4: knn_graph_full (nprobe = n_cells) is the
    exact-by-contract baseline — quadratic per cell by semantics.  A
    config too big for the cell bound must raise the max_cell_rows
    remedy instead of burning (rows/cell)² on an executor; the bound
    scales with nprobe so full-probe configs hit it at
    max_cell_rows x n_cells total rows."""
    import numpy as np
    import pytest

    from xpysom_dask_spark.operators.similarity import knn_graph

    rng = np.random.RandomState(5)
    X = rng.randn(40, 4)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>")
    cents = X[:2]
    with pytest.raises(Exception, match="max_cell_rows"):
        knn_graph(df, cents, k=3, nprobe=2, max_cell_rows=10).collect()
    # and the same data under the bound succeeds
    assert knn_graph(df, cents, k=3, nprobe=2,
                     max_cell_rows=50).count() == 120


def test_lsh_default_auto_sizes_to_target_recall():
    """VERDICT r10 #2 regression: the DEFAULT path is n_bands=None
    (auto-size), so the band-recall estimate meets target_recall out
    of the box at every threshold — the fixed-knob silent-under-recall
    trap (estimated recall 0.10 at threshold=0.4 with n_bands=4)
    cannot fire without an explicit override."""
    import inspect

    sig = inspect.signature(similarity.lsh_near_dup_pairs)
    assert sig.parameters["n_bands"].default is None
    for n_rows in (500, 60_000, 10_000_000):
        for thr in (0.4, 0.8, 0.95, 0.99):
            nb, bits = similarity.auto_lsh_config(n_rows, thr, 0.9)
            assert similarity.lsh_band_recall(thr, nb, bits) >= 0.9, (
                n_rows, thr, nb, bits)
