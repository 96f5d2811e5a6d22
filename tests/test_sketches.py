"""Sketch relations: CM sketch and HyperLogLog vs exact Python
references (same md5 hash convention recomputed independently here)."""

import hashlib
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators import sketches as SK


def _h48(seed, s):
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:12], 16)


def _words(n):
    return [f"w{i % 97}" for i in range(n)]  # 97 distinct, skewed later


def test_cms_cells_match_reference_and_merge(spark):
    words = _words(300) + ["hot"] * 50
    df = spark.createDataFrame([(w,) for w in words], "term string")
    depth, width = 3, 64
    sk = SK.count_min_sketch(df, "term", depth=depth, width=width)
    got = {(r["d"], r["w"]): r["count"] for r in sk.collect()}
    ref = {}
    for w in words:
        for d in range(depth):
            key = (d, _h48(d, w) % width)
            ref[key] = ref.get(key, 0) + 1
    assert got == ref
    # sketch of a union == cell-sum of shard sketches (mergeability)
    half1 = spark.createDataFrame([(w,) for w in words[:100]],
                                  "term string")
    half2 = spark.createDataFrame([(w,) for w in words[100:]],
                                  "term string")
    merged = (SK.count_min_sketch(half1, "term", depth=depth,
                                  width=width)
              .unionByName(SK.count_min_sketch(half2, "term",
                                               depth=depth,
                                               width=width))
              .groupBy("d", "w").agg(
                  SK.F.sum("count").cast("bigint").alias("count")))
    assert {(r["d"], r["w"]): r["count"]
            for r in merged.collect()} == ref


def test_cms_estimate_overestimates_never_under(spark):
    words = _words(500) + ["hot"] * 200
    df = spark.createDataFrame([(w,) for w in words], "term string")
    depth, width = 4, 32          # narrow width forces collisions
    sk = SK.count_min_sketch(df, "term", depth=depth, width=width)
    keys = df.distinct()
    est = {r["term"]: r["est"] for r in
           SK.cms_estimate(sk, keys, "term", depth=depth,
                           width=width).collect()}
    exact = {}
    for w in words:
        exact[w] = exact.get(w, 0) + 1
    assert set(est) == set(exact)
    for t, e in est.items():
        assert e >= exact[t], t                     # CM never under
    assert est["hot"] >= 200
    # absent key estimates >= 0 and uses empty cells as 0
    miss = spark.createDataFrame([("nope",)], "term string")
    got = SK.cms_estimate(sk, miss, "term", depth=depth,
                          width=width).collect()[0]["est"]
    assert got >= 0


def test_hll_registers_match_reference(spark):
    vals = [f"user{i}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    p = 6
    got = {r["bucket"]: r["rho"] for r in
           SK.hll_registers(df, "k", p=p).collect()}
    rem_bits = 48 - p
    ref = {}
    for v in set(vals):
        h = _h48(0, v)
        b = h >> rem_bits
        rem = h % (1 << rem_bits)
        rho = rem_bits + 1 if rem == 0 \
            else rem_bits + 1 - rem.bit_length()
        ref[b] = max(ref.get(b, 0), rho)
    assert got == ref


@pytest.mark.parametrize("n,p", [(200, 9), (5000, 9), (300, 6)])
def test_hll_estimate_within_error_bound(spark, n, p):
    df = spark.createDataFrame([(f"id{i}",) for i in range(n)],
                               "k string")
    regs = SK.hll_registers(df, "k", p=p)
    row = SK.hll_estimate(regs, p=p).collect()[0]
    m = 1 << p
    assert row["m"] == m
    # 1.04/sqrt(m) standard error; allow 4 sigma
    tol = 4 * 1.04 / math.sqrt(m)
    assert abs(row["est"] - n) <= max(tol * n, 8), row
    # raw_sum_scaled is exact-integer (Σ 2^{49−p−M_j}, one headroom
    # bit over the 48-bit hash): full-empty sketch bound
    assert 0 < row["raw_sum_scaled"] <= m * (1 << (49 - p))


def test_hll_saturated_register_term_is_exactly_one(spark):
    """ADVICE r8 (medium): a saturated register (rho = 48−p+1, every
    remaining hash bit zero) must contribute the exact integer 1 to
    raw_sum_scaled — under the old 48−p scaling its term was 0.5,
    which Spark's BIGINT cast truncated to 0 while DuckDB's CAST
    rounded to 1 (a latent cross-engine hash break).  Feed a register
    relation containing the max rank directly and check the sum."""
    p = 9
    rem_bits = 48 - p
    m = 1 << p
    regs = spark.createDataFrame(
        [(0, rem_bits + 1), (1, 1)], "bucket int, rho int")
    row = SK.hll_estimate(regs, p=p).collect()[0]
    # bucket 0 term = 2^0 = 1 (saturated), bucket 1 term = 2^{rem_bits},
    # 510 absent buckets at 2^{rem_bits+1}
    expected = 1 + (1 << rem_bits) + (m - 2) * (1 << (rem_bits + 1))
    assert row["raw_sum_scaled"] == expected, row
    assert row["n_zero"] == m - 2


def test_hll_merge_equals_whole(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(400)],
                               "k string")
    a = df.where("substr(k, 2, 8) % 2 = 0")
    b = df.where("substr(k, 2, 8) % 2 = 1")
    p = 7
    whole = {r["bucket"]: r["rho"] for r in
             SK.hll_registers(df, "k", p=p).collect()}
    merged = {r["bucket"]: r["rho"] for r in
              SK.hll_merge(SK.hll_registers(a, "k", p=p),
                           SK.hll_registers(b, "k", p=p)).collect()}
    assert merged == whole


def test_validation():
    with pytest.raises(ValueError, match="depth"):
        SK.count_min_sketch(None, "t", depth=0)
    with pytest.raises(ValueError, match="p must"):
        SK.hll_registers(None, "k", p=3)
    with pytest.raises(ValueError, match="at least one"):
        SK.hll_merge()


def test_cms_stream_drained_equals_batch(spark, tmp_path):
    """The streaming sketch contract: cells are order-free sums, so a
    drained multi-micro-batch replay equals the batch sketch
    bit-for-bit, with state bounded at depth*width rows."""
    import uuid

    from xpysom_dask_spark.streaming import cms_stream

    words = _words(240) + ["hot"] * 40
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i bigint, term string")
    src = str(tmp_path / "cms_src")
    df.where("i % 2 = 0").repartition(1).write.parquet(src)
    df.where("i % 2 = 1").repartition(1).write.mode("append") \
        .parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = cms_stream(stream, "term", depth=3, width=64)
    name = "t_cms_stream_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["d"], r["w"]): r["count"]
           for r in spark.table(name).collect()}
    want = {(r["d"], r["w"]): r["count"]
            for r in SK.count_min_sketch(df, "term", depth=3,
                                         width=64).collect()}
    assert got == want
    assert len(got) <= 3 * 64


def test_hll_stream_drained_equals_batch(spark, tmp_path):
    import uuid

    from xpysom_dask_spark.streaming import hll_stream

    df = spark.createDataFrame([(i, f"u{i % 331}")
                                for i in range(900)],
                               "i bigint, k string")
    src = str(tmp_path / "hll_src")
    df.where("i < 450").repartition(1).write.parquet(src)
    df.where("i >= 450").repartition(1).write.mode("append") \
        .parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = hll_stream(stream, "k", p=7)
    name = "t_hll_stream_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["bucket"]: r["rho"] for r in spark.table(name).collect()}
    want = {r["bucket"]: r["rho"]
            for r in SK.hll_registers(df, "k", p=7).collect()}
    assert got == want


def test_grouped_hll_equals_per_group_sketches(spark):
    """group_cols builds INDEPENDENT per-group sketches: the grouped
    relation sliced at one group equals the sketch of that group's
    slice, and the grouped estimate matches the per-slice estimate."""
    rows = [(f"u{i % (50 + 40 * (i % 3))}", f"g{i % 3}")
            for i in range(600)]
    df = spark.createDataFrame(rows, "k string, grp string")
    p = 7
    grouped = SK.hll_registers(df, "k", p=p, group_cols=("grp",))
    for gv in ("g0", "g1", "g2"):
        whole = {r["bucket"]: r["rho"] for r in
                 SK.hll_registers(df.where(f"grp = '{gv}'"), "k",
                                  p=p).collect()}
        sliced = {r["bucket"]: r["rho"] for r in
                  grouped.where(f"grp = '{gv}'").collect()}
        assert sliced == whole, gv
    ests = {r["grp"]: r["est"] for r in
            SK.hll_estimate(grouped, p=p,
                            group_cols=("grp",)).collect()}
    for gv in ("g0", "g1", "g2"):
        solo = SK.hll_estimate(
            SK.hll_registers(df.where(f"grp = '{gv}'"), "k", p=p),
            p=p).collect()[0]["est"]
        assert ests[gv] == solo, gv


def test_grouped_cms_cells(spark):
    rows = [(f"t{i % 13}", "a" if i % 2 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "term string, grp string")
    grouped = SK.count_min_sketch(df, "term", depth=2, width=32,
                                  group_cols=("grp",))
    for gv in ("a", "b"):
        whole = {(r["d"], r["w"]): r["count"] for r in
                 SK.count_min_sketch(df.where(f"grp = '{gv}'"),
                                     "term", depth=2,
                                     width=32).collect()}
        sliced = {(r["d"], r["w"]): r["count"] for r in
                  grouped.where(f"grp = '{gv}'").collect()}
        assert sliced == whole, gv


def test_histogram_sketch_and_quantiles_match_reference(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    vals = np.round(rng.uniform(0, 100, 2000), 3).tolist() \
        + [None, -5.0, 250.0]           # NULL + under/overflow
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, bins = 0.0, 100.0, 50
    hist = SK.histogram_sketch(df, "x", lo, hi, bins)
    got = {r["bin"]: r["count"] for r in hist.collect()}
    ref = {}
    for v in vals:
        if v is None:
            continue
        b = min(max(int((v - lo) * bins / (hi - lo) // 1), 0),
                bins - 1)
        ref[b] = ref.get(b, 0) + 1
    assert got == ref
    # quantiles: lower-edge convention vs reference cumsum
    qs = (0.1, 0.5, 0.9, 1.0)
    out = {r["q_e6"]: r["value_e6"] for r in
           SK.histogram_quantiles(hist, qs, lo, hi, bins).collect()}
    n = sum(ref.values())
    width = (hi - lo) / bins
    import math as m
    for q in qs:
        need = m.ceil(n * q)
        cum = 0
        for b in sorted(ref):
            cum += ref[b]
            if cum >= need:
                exp = m.floor((lo + b * width) * 1e6 + 0.5)
                break
        assert out[int(round(q * 1e6))] == exp, q
    # merge = cell sum (shard the data, sum the sketches)
    h1 = SK.histogram_sketch(df.where("x < 50 OR x IS NULL"),
                             "x", lo, hi, bins)
    h2 = SK.histogram_sketch(df.where("x >= 50"), "x", lo, hi, bins)
    merged = {r["bin"]: r["count"] for r in
              h1.unionByName(h2).groupBy("bin")
              .agg(SK.F.sum("count").cast("bigint").alias("count"))
              .collect()}
    assert merged == ref


def test_histogram_grouped_and_validation(spark):
    df = spark.createDataFrame(
        [(float(i % 10), "g%d" % (i % 2)) for i in range(100)],
        "x double, grp string")
    hist = SK.histogram_sketch(df, "x", 0.0, 10.0, 10,
                               group_cols=("grp",))
    for gv in ("g0", "g1"):
        whole = {r["bin"]: r["count"] for r in
                 SK.histogram_sketch(df.where(f"grp = '{gv}'"),
                                     "x", 0.0, 10.0, 10).collect()}
        sliced = {r["bin"]: r["count"] for r in
                  hist.where(f"grp = '{gv}'").collect()}
        assert sliced == whole
    q = {(r["grp"], r["q_e6"]): r["value_e6"] for r in
         SK.histogram_quantiles(hist, (0.5,), 0.0, 10.0, 10,
                                group_cols=("grp",)).collect()}
    assert len(q) == 2
    with pytest.raises(ValueError, match="bins"):
        SK.histogram_sketch(df, "x", 0.0, 0.0, 10)
    with pytest.raises(ValueError, match="qs"):
        SK.histogram_quantiles(hist, (), 0.0, 10.0, 10)


def test_grouped_merge_and_estimate_guards(spark):
    """ADVICE r8 (low): hll_merge / cms_estimate must refuse a grouped
    relation passed without its group_cols — a bare groupBy("bucket")
    merge would silently max-merge every group into one combined
    sketch, and a (d, w)-only probe join would mix grouped cells."""
    rows = [(f"u{i % 37}", f"g{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "k string, grp string")
    grouped_regs = SK.hll_registers(df, "k", p=6, group_cols=("grp",))
    with pytest.raises(ValueError, match="group_cols"):
        SK.hll_merge(grouped_regs)
    grouped_cms = SK.count_min_sketch(df, "k", depth=2, width=32,
                                      group_cols=("grp",))
    with pytest.raises(ValueError, match="group_cols"):
        SK.cms_estimate(grouped_cms, df.select("k"), "k",
                        depth=2, width=32)


def test_grouped_hll_merge_equals_grouped_whole(spark):
    rows = [(i, f"u{i % 91}", f"g{i % 2}") for i in range(500)]
    df = spark.createDataFrame(rows, "i bigint, k string, grp string")
    p = 6
    a = SK.hll_registers(df.where("i < 250"), "k", p=p,
                         group_cols=("grp",))
    b = SK.hll_registers(df.where("i >= 250"), "k", p=p,
                         group_cols=("grp",))
    merged = {(r["grp"], r["bucket"]): r["rho"] for r in
              SK.hll_merge(a, b, group_cols=("grp",)).collect()}
    whole = {(r["grp"], r["bucket"]): r["rho"] for r in
             SK.hll_registers(df, "k", p=p,
                              group_cols=("grp",)).collect()}
    assert merged == whole


def test_grouped_cms_estimate_equals_per_group(spark):
    rows = [(f"t{i % 11}", f"g{i % 2}") for i in range(400)]
    df = spark.createDataFrame(rows, "term string, grp string")
    grouped = SK.count_min_sketch(df, "term", depth=2, width=64,
                                  group_cols=("grp",))
    keys = df.select("grp", "term").distinct()
    got = {(r["grp"], r["term"]): r["est"] for r in
           SK.cms_estimate(grouped, keys, "term", depth=2, width=64,
                           group_cols=("grp",)).collect()}
    for gv in ("g0", "g1"):
        solo_sk = SK.count_min_sketch(df.where(f"grp = '{gv}'"),
                                      "term", depth=2, width=64)
        solo = {r["term"]: r["est"] for r in
                SK.cms_estimate(solo_sk,
                                df.where(f"grp = '{gv}'")
                                .select("term").distinct(),
                                "term", depth=2, width=64).collect()}
        for t, e in solo.items():
            assert got[(gv, t)] == e, (gv, t)


def test_kmv_merge_equals_whole_and_guards(spark):
    """min-of-mins: shard sketches union into the combined corpus's
    sketch exactly; schema guard refuses grouped relations without
    their group_cols."""
    df = spark.createDataFrame([(i, f"v{i % 211}") for i in range(700)],
                               "i bigint, k string")
    a = SK.kmv_sketch(df.where("i < 350"), "k", k=32)
    b = SK.kmv_sketch(df.where("i >= 350"), "k", k=32)
    merged = {(r["rank"], r["h"]) for r in
              SK.kmv_merge(a, b, k=32).collect()}
    whole = {(r["rank"], r["h"]) for r in
             SK.kmv_sketch(df, "k", k=32).collect()}
    assert merged == whole
    grouped = SK.kmv_sketch(df.withColumn("g", SK.F.expr("i % 2")),
                            "k", k=16, group_cols=("g",))
    with pytest.raises(ValueError, match="group_cols"):
        SK.kmv_merge(grouped, k=16)


def test_kmv_novelty_estimates_set_difference(spark):
    """|B \\ A| = |A∪B| − |A|: disjoint incoming adds ~its distincts,
    fully-contained incoming adds ~0."""
    base = spark.createDataFrame([(f"a{i}",) for i in range(400)],
                                 "k string")
    fresh = spark.createDataFrame([(f"b{i}",) for i in range(200)],
                                  "k string")
    k = 128
    sa = SK.kmv_sketch(base, "k", k=k)
    row = SK.kmv_novelty(sa, SK.kmv_sketch(fresh, "k", k=k),
                         k=k).collect()[0]
    # ~1/sqrt(k) relative error on each estimate; allow 4 sigma on
    # the 600-distinct union
    tol = 4 * 600 / math.sqrt(k)
    assert abs(row["novelty_est"] - 200) <= tol, row
    contained = SK.kmv_sketch(base.limit(100), "k", k=k)
    row2 = SK.kmv_novelty(sa, contained, k=k).collect()[0]
    assert row2["union_est"] == row["base_est"]  # union sketch == base
    assert row2["novelty_est"] == 0


def test_kmv_pair_report_exact_below_k_and_subset_novelty(spark):
    """kmv_pair_report differential: with every group's distinct count
    below k the sketch IS the set, so jaccard/est/union/novelty are
    all exact set arithmetic; a subset group adds zero novelty over
    its superset; output agrees column-for-column with kmv_overlap on
    the shared fields."""
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators import sketches as SK

    rows = ([("a", f"t{i}") for i in range(20)]
            + [("b", f"t{i}") for i in range(10, 30)]   # |a∩b|=10
            + [("c", f"t{i}") for i in range(5)])       # c ⊂ a
    df = spark.createDataFrame(rows, "g string, term string")
    sk = SK.kmv_sketch(df, "term", k=64, group_cols=("g",))
    rep = {(r["ga"], r["gb"]): r
           for r in SK.kmv_pair_report(sk, 64, "g").collect()}
    ab = rep[("a", "b")]
    assert ab["n_sample"] == 30 and ab["n_common"] == 10
    assert ab["jaccard_e6"] == 1_000_000 * 10 // 30
    assert ab["est_a"] == 20 and ab["est_b"] == 20
    assert ab["union_est"] == 30
    assert ab["novelty_ab"] == 10 and ab["novelty_ba"] == 10
    ac = rep[("a", "c")]
    assert ac["union_est"] == 20 and ac["est_a"] == 20
    assert ac["novelty_ab"] == 0          # c adds nothing over a
    assert ac["novelty_ba"] == 15
    ov = {(r["ga"], r["gb"]): r
          for r in SK.kmv_overlap(sk, 64, "g").collect()}
    for key, r in rep.items():
        for c in ("n_sample", "n_common", "jaccard_e6"):
            assert r[c] == ov[key][c], (key, c)
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        SK.kmv_pair_report(sk, 1, "g")
