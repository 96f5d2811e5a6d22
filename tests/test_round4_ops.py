"""Round-4 operators: fractional upsampling, leakage-safe splitting,
near-dup decontamination, per-group exact-integer OLS."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xpysom_dask_spark.operators import dedup, profile, sampling
from xpysom_dask_spark.operators import text as T


# ---------------------------------------------------------------- #
# upsample_by_weight

def _docs_df(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
            .alias("source"))


def test_upsample_integer_and_fractional_weights(spark):
    df = _docs_df(spark)
    up = sampling.upsample_by_weight(
        df, "doc_id", "source",
        {"src0": 3.0, "src1": 0.0, "src2": 1.5}, seed=0)
    by = {r["source"]: r["cnt"] for r in
          up.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert by["src0"] == 300          # exactly 3 copies each
    assert "src1" not in by           # weight 0 drops the stratum
    assert 100 < by["src2"] < 200     # 1 copy + ~half get a second
    assert by["src3"] == 100          # default weight 1.0 passes through


def test_upsample_copy_ids_unique_and_deterministic(spark):
    df = _docs_df(spark, 100)
    a = sampling.upsample_by_weight(df, "doc_id", "source",
                                    {"src0": 2.7}, seed=9)
    assert a.count() == a.select("doc_id", "copy").distinct().count()
    b = sampling.upsample_by_weight(df.repartition(7), "doc_id", "source",
                                    {"src0": 2.7}, seed=9)
    assert sorted(map(tuple, a.select("doc_id", "copy").collect())) == \
        sorted(map(tuple, b.select("doc_id", "copy").collect()))


def test_upsample_rejects_negative_weight(spark):
    df = _docs_df(spark, 10)
    with pytest.raises(ValueError, match="must be >= 0"):
        sampling.upsample_by_weight(df, "doc_id", "source", {"src0": -1})
    with pytest.raises(ValueError, match="default_weight"):
        sampling.upsample_by_weight(df, "doc_id", "source", {},
                                    default_weight=-0.5)


# ---------------------------------------------------------------- #
# leakage_safe_split

def test_leakage_safe_split_groups_never_straddle(spark):
    rows = []
    for g in range(60):
        base = f"group {g} body " + " ".join(f"w{g}t{i}" for i in range(12))
        rows.append((2 * g, base))
        rows.append((2 * g + 1, base + " "))   # near-identical copy
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sampling.leakage_safe_split(
        df, "doc_id", T.min_shingle_fingerprint("text"),
        {"train": 0.5, "val": 0.25, "test": 0.25}, seed=2)
    straddle = (out.withColumn("fp", T.min_shingle_fingerprint("text"))
                .groupBy("fp")
                .agg(F.countDistinct("split").alias("ns"))
                .where("ns > 1").count())
    assert straddle == 0
    names = {r["split"] for r in out.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"} and "train" in names


def test_leakage_safe_split_validates_weights(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        sampling.leakage_safe_split(df, "doc_id", F.col("text"), {})
    with pytest.raises(ValueError):
        sampling.leakage_safe_split(df, "doc_id", F.col("text"),
                                    {"a": -1.0, "b": 2.0})


# ---------------------------------------------------------------- #
# fuzzy_decontaminate

def test_fuzzy_decontaminate_drops_near_copy_keeps_phrase_overlap(spark):
    test_doc = "the quick brown fox jumps over the lazy dog every day"
    near_copy = "the quick brown fox jumps over the lazy dog every night"
    one_phrase = ("completely different subject matter here but "
                  "the quick brown fox appears once")
    clean = "nothing shared with any evaluation document at all"
    train = spark.createDataFrame(
        [(1, near_copy), (2, one_phrase), (3, clean)],
        ["doc_id", "text"])
    test = spark.createDataFrame([(100, test_doc)], ["doc_id", "text"])

    kept = dedup.fuzzy_decontaminate(train, test, "text", "doc_id",
                                     threshold=0.5, n=3)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 1 not in ids          # near-copy of the test doc: dropped
    assert {2, 3} <= ids         # one shared phrase / nothing: kept

    # the exact single-n-gram rule nukes doc 2 as well — the contrast
    exact = dedup.decontaminate(train, test, "text", "doc_id", n=3)
    exact_ids = {r["doc_id"] for r in exact.select("doc_id").collect()}
    assert 2 not in exact_ids and 3 in exact_ids


# ---------------------------------------------------------------- #
# regr_by_group

def test_regr_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(5)
    rows = []
    for g, (slope, inter) in enumerate([(2.0, 1.0), (-0.5, 10.0)]):
        x = rng.integers(0, 1000, 300)
        y = np.round(slope * x + inter + rng.normal(0, 3, 300), 2)
        rows += [(f"g{g}", int(xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    got = {r["grp"]: r for r in
           profile.regr_by_group(df, "grp", "x", "y",
                                 x_decimals=0, y_decimals=2).collect()}
    for g in ("g0", "g1"):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([y for gg, _, y in rows if gg == g])
        b, a = np.polyfit(xs, ys, 1)
        assert got[g]["n"] == 300
        assert got[g]["slope"] == pytest.approx(b, abs=1e-5)
        assert got[g]["intercept"] == pytest.approx(a, abs=1e-4)
        r = np.corrcoef(xs, ys)[0, 1] ** 2
        assert got[g]["r2"] == pytest.approx(r, abs=1e-5)


def test_regr_partitioning_independent_and_degenerate(spark):
    rows = [("a", 5, 1.25)] * 40 + \
           [("b", i, 0.5 * i + 2.0) for i in range(40)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    r1 = sorted(map(tuple, profile.regr_by_group(
        df.coalesce(1), "grp", "x", "y").collect()))
    r7 = sorted(map(tuple, profile.regr_by_group(
        df.repartition(7), "grp", "x", "y").collect()))
    assert r1 == r7
    by = {t[0]: t for t in r1}
    assert by["a"][2] is None and by["a"][4] is None   # constant x
    assert by["b"][2] == pytest.approx(0.5, abs=1e-6)
    assert by["b"][3] == pytest.approx(2.0, abs=1e-6)
    assert by["b"][4] == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------- #
# weighted_sample_topk

def test_weighted_sample_exact_k_and_brute_force_parity(spark):
    rows = [(i, f"g{i % 3}", float(1 + i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    out = sampling.weighted_sample_topk(df, "doc_id", "w", k=4,
                                        group_col="grp", seed=2)
    got = sorted((r["grp"], r["doc_id"]) for r in out.collect())
    assert len(got) == 12 and len(set(got)) == 12

    # brute force: recompute the ES key row-by-row with the same hash
    keyed = df.withColumn(
        "u", F.expr("CAST(conv(substring(md5(concat('2', ':', "
                    "CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"
                    ) / F.lit(float(1 << 48)))
    brute = []
    for g in ("g0", "g1", "g2"):
        rs = [(np.log(r["u"]) / r["w"], r["doc_id"]) for r in
              keyed.where(F.col("grp") == g).collect()]
        rs.sort(key=lambda t: (-t[0], t[1]))
        brute += [(g, d) for _, d in rs[:4]]
    assert got == sorted(brute)


def test_weighted_sample_global_and_validation(spark):
    rows = [(i, float(i)) for i in range(50)]    # doc 0: weight 0
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = sampling.weighted_sample_topk(df, "doc_id", "w", k=10, seed=1)
    ids = {r["doc_id"] for r in out.collect()}
    assert len(ids) == 10 and 0 not in ids
    rep = sampling.weighted_sample_topk(df.repartition(7), "doc_id",
                                        "w", k=10, seed=1)
    assert {r["doc_id"] for r in rep.collect()} == ids
    with pytest.raises(ValueError, match="k must be"):
        sampling.weighted_sample_topk(df, "doc_id", "w", k=0)


# ---------------------------------------------------------------- #
# hard_negatives

def test_hard_negatives_masks_same_label_and_matches_numpy(spark):
    from xpysom_dask_spark.operators import similarity

    rng = np.random.default_rng(3)
    V = rng.normal(size=(60, 8)).astype(np.float64)
    lab = [i % 3 for i in range(60)]
    emb = spark.createDataFrame(
        [(i, V[i].tolist(), lab[i]) for i in range(60)],
        ["vec_id", "embedding", "label"])
    q = emb.where("vec_id < 4")
    out = similarity.hard_negatives(emb, q, k=5).collect()
    assert len(out) == 20
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    sims = (V @ V.T) / (np.linalg.norm(V, axis=1)[:, None]
                        * np.linalg.norm(V, axis=1)[None, :])
    for qi in range(4):
        mask = np.array([lab[j] != lab[qi] for j in range(60)])
        order = sorted(np.nonzero(mask)[0],
                       key=lambda j: (-sims[qi, j], j))[:5]
        got = [r["neighbor_id"] for r in
               sorted(by_q[qi], key=lambda r: r["rank"])]
        assert got == order
        # no same-label neighbor ever (the defining invariant)
        assert all(lab[n] != lab[qi] for n in got)


def test_hard_negatives_duplicate_vectors_partition_invariant(spark):
    """Equal-sim candidates at the per-batch k-boundary must keep the
    lowest neighbor_id (the final window's tie-break) regardless of
    how the corpus is partitioned: duplicate vectors are common in
    these pipelines, and an argpartition on sim alone kept whichever
    duplicate its partition layout happened to scan first."""
    from xpysom_dask_spark.operators import similarity

    base = np.eye(4, dtype=np.float64)
    # 30 corpus rows: every vector a duplicate of one of 4 directions,
    # labels alternate so the mask stays active
    rows = [(i, base[i % 4].tolist(), i % 2) for i in range(30)]
    q = [(100, base[0].tolist(), 1)]  # label 1 → only even ids legal

    def run(parts):
        emb = spark.createDataFrame(
            rows, ["vec_id", "embedding", "label"]).repartition(parts)
        qdf = spark.createDataFrame(
            q, ["vec_id", "embedding", "label"])
        out = similarity.hard_negatives(emb, qdf, k=3).collect()
        return [(r["rank"], r["neighbor_id"], round(r["sim"], 9))
                for r in sorted(out, key=lambda r: r["rank"])]

    a, b = run(1), run(7)
    assert a == b
    # ties broke by lowest id: sim-1.0 duplicates of direction 0 with
    # label 0 are ids 0, 4, 8, 12, ... → top-3 = 0, 4, 8
    assert [t[1] for t in a] == [0, 4, 8]


# ---------------------------------------------------------------- #
# algebraic invariants (the split/sample family's subset-chain laws)

def test_upsample_copies_monotone_in_weight(spark):
    """n_copies(w) = floor(w) + [u < frac(w)] is monotone in w for any
    fixed (seed, id): raising a stratum's weight never removes a
    (doc, copy) pair — the upsampling analog of hash_sample's
    subset-chain property."""
    df = _docs_df(spark, 200)
    lo = sampling.upsample_by_weight(df, "doc_id", "source",
                                     {"src0": 2.7}, seed=4)
    hi = sampling.upsample_by_weight(df, "doc_id", "source",
                                     {"src0": 3.1}, seed=4)
    lo_set = set(map(tuple, lo.select("doc_id", "copy").collect()))
    hi_set = set(map(tuple, hi.select("doc_id", "copy").collect()))
    assert lo_set <= hi_set and len(hi_set) > len(lo_set)


def test_leakage_split_cutpoint_monotone(spark):
    """Raising the train share only MOVES docs into train (same
    cut-point law as split_by_hash, but over the content-group hash):
    nothing in train at 60% leaves it at 80%."""
    docs = spark.createDataFrame(
        [(i, f"doc body {i} " + " ".join(f"t{i}w{j}" for j in range(10)))
         for i in range(150)], ["doc_id", "text"])
    key = T.min_shingle_fingerprint("text")
    s60 = sampling.leakage_safe_split(docs, "doc_id", key,
                                      {"train": 0.6, "test": 0.4}, seed=3)
    s80 = sampling.leakage_safe_split(docs, "doc_id", key,
                                      {"train": 0.8, "test": 0.2}, seed=3)
    t60 = {r["doc_id"] for r in s60.where("split = 'train'").collect()}
    t80 = {r["doc_id"] for r in s80.where("split = 'train'").collect()}
    assert t60 <= t80 and len(t80) > len(t60)


def test_weighted_sample_scale_invariant(spark):
    """The ES key ln(u)/w divides uniformly under w -> c*w (c > 0), so
    the selected set is invariant to rescaling all weights — selection
    depends only on weight RATIOS, as sampling-without-replacement
    odds should."""
    rows = [(i, f"g{i % 2}", float(1 + (i * 7) % 13)) for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    a = sampling.weighted_sample_topk(df, "doc_id", "w", k=5,
                                      group_col="grp", seed=6)
    scaled = df.withColumn("w", F.col("w") * 100.0)
    b = sampling.weighted_sample_topk(scaled, "doc_id", "w", k=5,
                                      group_col="grp", seed=6)
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())


# ---------------------------------------------------------------- #
# plan-shape guards (the scale properties PLANS.md documents)

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_plans(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i + 1)) for i in range(100)],
        ["doc_id", "grp", "w"])
    grouped = sampling.weighted_sample_topk(df, "doc_id", "w", k=3,
                                            group_col="grp")
    p = _plan(grouped)
    # rank-limit pushdown: partial top-k BEFORE the exchange
    assert p.count("WindowGroupLimit") >= 2
    globl = sampling.weighted_sample_topk(df, "doc_id", "w", k=5)
    assert "TakeOrderedAndProject" in _plan(globl)


def test_upsample_and_split_plans_have_no_exchange(spark):
    df = _docs_df(spark, 50)
    up = sampling.upsample_by_weight(df, "doc_id", "source",
                                     {"src0": 2.0})
    assert "Exchange" not in _plan(up) and "Generate" in _plan(up)
    docs = df.withColumn("text", F.concat(F.lit("body of doc "),
                                          F.col("doc_id").cast("string")))
    sp = sampling.leakage_safe_split(
        docs, "doc_id", T.min_shingle_fingerprint("text"),
        {"train": 0.8, "test": 0.2})
    assert "Exchange" not in _plan(sp)


def test_regr_by_group_single_exchange(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(50)], ["grp", "x", "y"])
    p = _plan(profile.regr_by_group(df, "grp", "x", "y"))
    assert p.count("Exchange") == 1       # one shuffle, keyed by group
