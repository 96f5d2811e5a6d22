"""Product quantization (operators/pq.py): numpy-differential fit,
partitioning-invariant codes, exact-on-codewords ADC, recall sanity,
and the no-shuffle plan shapes."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_TINY

from xpysom_dask_spark.operators import pq


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    df.cache().count()
    return df


def _np_corpus(emb):
    pdf = emb.select("vec_id", "embedding").toPandas() \
        .sort_values("vec_id")
    X = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].to_numpy(np.int64), X


def _local_pq_fit(X, init, max_iter=10, tol=1e-6):
    """Single-process replica of the pq_fit update rule (same init,
    same empty-cluster keep, same sequential-coordinate distances)."""
    C = init.copy()
    m, k, dsub = C.shape
    Xs = X.reshape(len(X), m, dsub)
    for _ in range(max_iter):
        new = C.copy()
        shift = 0.0
        for s in range(m):
            d = pq._seq_sq_dists(Xs[:, s, :], C[s])
            a = d.argmin(axis=1)
            for c in range(k):
                sel = Xs[a == c, s, :]
                if len(sel):
                    new[s, c] = sel.sum(axis=0) / len(sel)
        shift = float(((new - C) ** 2).sum(axis=2).max())
        C = new
        if shift <= tol:
            break
    return C


def test_fit_matches_local_replica(emb):
    init = pq.pq_init(emb, m=4, k=8)
    got = pq.pq_fit(emb, m=4, k=8, max_iter=5, tol=0.0, init=init)
    _, X = _np_corpus(emb)
    want = _local_pq_fit(X, init, max_iter=5, tol=0.0)
    assert np.allclose(got, want, atol=1e-9)


def test_fit_reduces_reconstruction_error(emb):
    init = pq.pq_init(emb, m=4, k=8)
    fitted = pq.pq_fit(emb, m=4, k=8, max_iter=8, init=init)
    _, X = _np_corpus(emb)

    def recon(C):
        Xs = X.reshape(len(X), C.shape[0], -1)
        tot = 0.0
        for s in range(C.shape[0]):
            tot += pq._seq_sq_dists(Xs[:, s, :], C[s]).min(axis=1).sum()
        return tot

    assert recon(fitted) < recon(init)


def test_encode_partitioning_invariant(emb):
    C = pq.pq_init(emb, m=8, k=8)

    def run(df):
        rows = pq.pq_encode(df, C, err_col="err",
                            err_int_scale=10**6).collect()
        return {r["vec_id"]: (tuple(r["codes"]), r["err"])
                for r in rows}

    a = run(emb.repartition(1))
    b = run(emb.repartition(7))
    assert a == b
    assert all(0 <= c < 8 for codes, _ in a.values() for c in codes)
    assert all(len(codes) == 8 for codes, _ in a.values())


def test_encode_matches_local_argmin(emb):
    C = pq.pq_init(emb, m=4, k=8)
    ids, X = _np_corpus(emb)
    Xs = X.reshape(len(X), 4, 16)
    want = {}
    for i, vid in enumerate(ids):
        code = tuple(
            int(pq._seq_sq_dists(Xs[i:i + 1, s, :], C[s]).argmin())
            for s in range(4))
        want[int(vid)] = code
    got = {r["vec_id"]: tuple(r["codes"])
           for r in pq.pq_encode(emb, C).collect()}
    assert got == want


def test_adc_exact_when_vectors_are_codewords(spark, emb):
    # corpus restricted to the codeword source rows: every vector IS
    # its own reconstruction, so ADC distance == exact squared L2
    C_rows = emb.where("vec_id < 8")
    C = np.stack([np.asarray(r["embedding"], np.float64) for r in
                  C_rows.orderBy("vec_id").collect()])
    m, dsub = 8, 8
    book = C.reshape(8, m, dsub).transpose(1, 0, 2).copy()
    codes = pq.pq_encode(C_rows, book, err_col="err")
    errs = [r["err"] for r in codes.collect()]
    assert max(errs) == 0.0
    out = pq.pq_adc_topk(book, codes, C_rows.limit(3), k=2,
                         exclude_self=True).collect()
    Xs = C.reshape(8, m, dsub)
    for r in out:
        q = Xs[r["query_id"]]
        n = Xs[r["neighbor_id"]]
        want = sum(float(pq._seq_sq_dists(q[s:s + 1], n[s:s + 1])[0, 0])
                   for s in range(m))
        assert r["dist"] == pytest.approx(want, abs=1e-9)


def test_adc_recall_vs_exact(spark, emb):
    # fitted m=16 k=64 codebook (96-bit codes) on 500 64-dim rows:
    # ADC top-5 must recover a solid fraction of the exact-L2 top-5.
    # i.i.d.-random embeddings are PQ's worst case (no cluster
    # structure to exploit) — measured 0.55 here; the floor has slack.
    # Deterministic data + deterministic fit → this is a fixed number.
    book = pq.pq_fit(emb, m=16, k=64, max_iter=8)
    codes = pq.pq_encode(emb, book)
    qs = emb.where("vec_id < 20")
    got = pq.pq_adc_topk(book, codes, qs, k=5).collect()
    approx = {}
    for r in got:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    ids, X = _np_corpus(emb)
    hits = total = 0
    for qid in sorted(approx):
        qi = int(np.where(ids == qid)[0][0])
        d = ((X - X[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact = set(ids[np.argsort(d)[:5]].tolist())
        hits += len(exact & approx[qid])
        total += 5
    assert total == 100
    assert hits / total >= 0.4


def test_adc_integer_lut_partitioning_invariant(emb):
    book = pq.pq_init(emb, m=8, k=8)
    qs = emb.where("vec_id < 5")

    def run(df):
        codes = pq.pq_encode(df, book)
        rows = pq.pq_adc_topk(book, codes, qs, k=5,
                              lut_scale=10**6).collect()
        return sorted((r["query_id"], r["rank"], r["neighbor_id"],
                       r["dist"]) for r in rows)

    a = run(emb.repartition(1))
    b = run(emb.repartition(7))
    assert a == b
    assert all(isinstance(d, int) for *_, d in a)


def test_adc_query_bound(emb):
    book = pq.pq_init(emb, m=8, k=8)
    codes = pq.pq_encode(emb, book)
    with pytest.raises(ValueError, match="max_queries"):
        pq.pq_adc_topk(book, codes, emb, k=5, max_queries=10)


def test_geometry_validation(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_init(emb, m=7, k=8)


def test_ivfpq_query_bound_raises_before_collect(spark, emb, tmp_path,
                                                 monkeypatch):
    """An over-bound query set must raise from the count() guard, not
    OOM inside toPandas(): the query plan poisons the embedding column
    with raise_error, which count() never evaluates (column pruning)
    but a collect would."""
    from pyspark.sql import functions as F

    coarse, book = _gate_books(emb)
    path = str(tmp_path / "ivfpq_bound")
    pq.build_ivfpq_index(coarse, book, emb, path)
    poisoned = emb.select(
        "vec_id",
        F.expr("IF(vec_id >= 0, raise_error('collected the query set'), "
               "embedding)").alias("embedding"))
    monkeypatch.setattr(pq, "PQ_TOPK_MAX_QUERIES", 10)
    with pytest.raises(ValueError, match="query rows > 10"):
        pq.ivfpq_topk(spark, path, coarse, book, poisoned, k=3)


def test_ivfpq_empty_queries(spark, emb, tmp_path):
    coarse, book = _gate_books(emb)
    path = str(tmp_path / "ivfpq_empty")
    pq.build_ivfpq_index(coarse, book, emb, path)
    out = pq.ivfpq_topk(spark, path, coarse, book,
                        emb.where("vec_id < 0"), k=3, lut_scale=10**6)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == \
        ["query_id", "rank", "neighbor_id", "dist"]
    assert out.schema["dist"].dataType.simpleString() == "bigint"


def test_ivfpq_duplicate_query_ids_raise(spark, emb, tmp_path):
    from pyspark.sql import functions as F

    coarse, book = _gate_books(emb)
    path = str(tmp_path / "ivfpq_dup")
    pq.build_ivfpq_index(coarse, book, emb, path)
    dup = emb.where("vec_id < 3").select(
        (F.col("vec_id") % 2).alias("vec_id"), "embedding")
    with pytest.raises(ValueError, match="duplicate query ids"):
        pq.ivfpq_topk(spark, path, coarse, book, dup, k=3)


def _gate_books(emb):
    """Fixed coarse (4 cells = vec_id<4 rows) + fixed residual
    codebook (8 codewords = vec_id 4..11 rows, sliced m=8)."""
    rows = emb.where("vec_id < 12").orderBy("vec_id") \
        .select("embedding").collect()
    M = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    coarse = M[:4]
    book = M[4:12].reshape(8, 8, 8).transpose(1, 0, 2).copy()
    return coarse, book


def test_ivfpq_full_probe_equals_residual_adc(spark, emb, tmp_path):
    coarse, book = _gate_books(emb)
    path = str(tmp_path / "ivfpq")
    pq.build_ivfpq_index(coarse, book, emb, path)
    qs = emb.where("vec_id < 5")
    got = pq.ivfpq_topk(spark, path, coarse, book, qs, k=5, nprobe=4,
                        lut_scale=10**6).collect()
    got = sorted((r["query_id"], r["rank"], r["neighbor_id"],
                  r["dist"]) for r in got)

    # reference: full-probe IVFPQ == ADC over residual codes with the
    # per-(query,cell) residual LUT, computed locally
    pdf = emb.select("vec_id", "embedding").toPandas() \
        .sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    cell = pq._seq_sq_dists(X, coarse).argmin(axis=1)
    R = (X - coarse[cell]).reshape(len(X), 8, 8)
    codes = np.stack([pq._seq_sq_dists(R[:, s, :], book[s])
                      .argmin(axis=1) for s in range(8)], axis=1)
    want = []
    for qid in range(5):
        qi = int(np.where(ids == qid)[0][0])
        d = np.empty(len(X), np.int64)
        for i in range(len(X)):
            lut = pq.pq_lut(book, (X[qi] - coarse[cell[i]])[None, :],
                            10**6)[0]
            d[i] = sum(lut[s, codes[i, s]] for s in range(8))
        mask = ids != qid
        order = np.lexsort((ids[mask], d[mask]))[:5]
        for rank, j in enumerate(order, 1):
            want.append((qid, rank, int(ids[mask][j]),
                         int(d[mask][j])))
    assert got == sorted(want)


def test_ivfpq_prunes_partitions(spark, emb, tmp_path):
    coarse, book = _gate_books(emb)
    path = str(tmp_path / "ivfpq")
    pq.build_ivfpq_index(coarse, book, emb, path)
    qs = emb.where("vec_id < 2")
    out = pq.ivfpq_topk(spark, path, coarse, book, qs, k=3, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(r["rank"] <= 3 for r in rows)


def test_ivfpq_partitioning_invariant(spark, emb, tmp_path):
    coarse, book = _gate_books(emb)
    qs = emb.where("vec_id < 3")

    def run(df, sub):
        path = str(tmp_path / f"ivfpq_{sub}")
        pq.build_ivfpq_index(coarse, book, df, path)
        rows = pq.ivfpq_topk(spark, path, coarse, book, qs, k=5,
                             nprobe=2, lut_scale=10**6).collect()
        return sorted((r["query_id"], r["rank"], r["neighbor_id"],
                       r["dist"]) for r in rows)

    assert run(emb.repartition(1), "a") == run(emb.repartition(7), "b")


def test_ivfpq_residuals_reconstruct(emb):
    # residual + assigned centroid == original vector, and the cell
    # choice matches build_ivfpq_index's sequential-fold argmin
    coarse, _ = _gate_books(emb)
    res = pq.ivfpq_residuals(emb, coarse)
    joined = {r["vec_id"]: np.asarray(r["res"], np.float64)
              for r in res.collect()}
    pdf = emb.select("vec_id", "embedding").toPandas()
    for vid, v in zip(pdf["vec_id"], pdf["embedding"]):
        X = np.asarray(v, np.float64)[None, :]
        cell = int(pq._seq_sq_dists(X, coarse).argmin())
        np.testing.assert_allclose(joined[int(vid)] + coarse[cell],
                                   X[0], atol=0)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:500]


def test_ivfpq_hot_cell_and_append(spark, emb, tmp_path):
    """A coarse codebook whose first centroid dominates (every vector
    lands in cell 0) must still build, prune, and search correctly —
    the hot cell spreads over the cell-0 directory's files and the
    kernel's per-batch prune keeps candidate traffic at batches·k·|Q|
    regardless of cell skew.  mode='append' ingests a second batch
    into the same layout: half-then-half must equal the one-shot
    build."""
    _, book = _gate_books(emb)
    hot = np.zeros((4, 64))
    hot[1:] += 1e6                       # cells 1-3 unreachable
    path = str(tmp_path / "hot")
    pq.build_ivfpq_index(hot, book, emb, path)
    cells = spark.read.parquet(path).select("cell").distinct().collect()
    assert {r["cell"] for r in cells} == {0}
    qs = emb.where("vec_id < 3")
    a = pq.ivfpq_topk(spark, path, hot, book, qs, k=5, nprobe=1,
                      lut_scale=10**6).collect()
    assert {r["query_id"] for r in a} == {0, 1, 2}
    assert all(len([x for x in a if x["query_id"] == q]) == 5
               for q in (0, 1, 2))
    inc = str(tmp_path / "incremental")
    pq.build_ivfpq_index(hot, book, emb.where("vec_id < 250"), inc)
    pq.build_ivfpq_index(hot, book, emb.where("vec_id >= 250"), inc,
                         mode="append")
    b = pq.ivfpq_topk(spark, inc, hot, book, qs, k=5, nprobe=1,
                      lut_scale=10**6).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"],
                               r["neighbor_id"], r["dist"])
                              for r in rows)
    assert key(a) == key(b)


def test_ivfpq_packed_codes_equal_unpacked(spark, emb, tmp_path):
    # binary m-byte codes (the 100x-compressed on-disk form) must
    # search identically to the array<int> schema
    coarse, book = _gate_books(emb)
    qs = emb.where("vec_id < 3")
    pa = str(tmp_path / "arr")
    pb = str(tmp_path / "bin")
    pq.build_ivfpq_index(coarse, book, emb, pa)
    pq.build_ivfpq_index(coarse, book, emb, pb, pack=True)
    bin_codes = spark.read.parquet(pb)
    assert all(len(r["codes"]) == 8 for r in bin_codes.limit(5)
               .collect())

    def run(path):
        rows = pq.ivfpq_topk(spark, path, coarse, book, qs, k=5,
                             nprobe=2, lut_scale=10**6).collect()
        return sorted((r["query_id"], r["rank"], r["neighbor_id"],
                       r["dist"]) for r in rows)

    assert run(pa) == run(pb)
    with pytest.raises(ValueError, match="k <= 256"):
        big = np.zeros((8, 257, 8))
        pq.build_ivfpq_index(coarse, big, emb, pb, pack=True)


def test_ivfpq_rerank_full_shortlist_is_exact(spark, emb, tmp_path):
    # shortlist = corpus size at full probe -> the rerank stage sees
    # every candidate, so the result IS exact brute-force L2 top-k
    coarse, book = _gate_books(emb)
    path = str(tmp_path / "rr")
    pq.build_ivfpq_index(coarse, book, emb, path)
    qs = emb.where("vec_id < 4")
    got = pq.ivfpq_rerank_topk(spark, path, coarse, book, emb, qs,
                               k=3, shortlist=600, nprobe=4).collect()
    pdf = emb.select("vec_id", "embedding").toPandas() \
        .sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    for qid in range(4):
        qi = int(np.where(ids == qid)[0][0])
        d = ((X - X[qi]) ** 2).sum(axis=1)
        mask = ids != qid
        order = np.lexsort((ids[mask], d[mask]))[:3]
        want = [int(ids[mask][j]) for j in order]
        mine = [r["neighbor_id"] for r in
                sorted((x for x in got if x["query_id"] == qid),
                       key=lambda r: r["rank"])]
        assert mine == want


def test_ivfpq_dim_mismatch(emb):
    coarse, book = _gate_books(emb)
    with pytest.raises(ValueError, match="coarse dim"):
        pq.build_ivfpq_index(coarse[:, :32], book, emb, "/tmp/x")


def test_encode_plan_no_exchange(emb):
    C = pq.pq_init(emb, m=8, k=8)
    plan = pq.pq_encode(emb, C)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan[:500]


def test_adc_plan_single_exchange(emb):
    # candidates shuffle ONCE for the final per-query window; the
    # codes relation itself is a scan → mapInPandas chain
    book = pq.pq_init(emb, m=8, k=8)
    codes = pq.pq_encode(emb, book)
    out = pq.pq_adc_topk(book, codes, emb.where("vec_id < 3"), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:800]
